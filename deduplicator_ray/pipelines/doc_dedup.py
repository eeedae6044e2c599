"""Document-table dedup + text-analysis pipelines (training-data ops).

Generic building blocks over any Ray Dataset, demonstrated on the
``documents`` table — the text analogs of the image pipelines:

- exact dedup: hash-partition on a key + per-group first (the md5 strict-mode
  path of the reference generalized — /root/reference/dupedb.py:100-101, D2);
- MinHash+LSH near-dup over text (shingle → signature → band → bucket
  groupby → verify → connected components), sharing the image pipeline's
  banding/verify/CC stages;
- SimHash near-dup (Hamming over 64-bit token-weight hashes);
- text analysis: language-ID, quality features, token counting, rolling
  fingerprints — all vectorized per batch, all SQL-mirrorable so the DuckDB
  oracle can value-check them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.stages.candidates import make_partition_verify
from deduplicator_ray.stages.components import connected_components
from deduplicator_ray.stages.partitioned import (
    drop_duplicates,
    keep_first,
    partitioned_groupby,
)


def exact_dedup(ds: rd.Dataset, keys: list[str], order: list[str]) -> rd.Dataset:
    """Keep the first row per key group under ``order`` — the classic
    hash-partition + per-group-first exact dedup shuffle (SURVEY.md D2),
    vectorized per key-partition (stages/partitioned.py)."""
    return keep_first(ds, keys, order)


def add_content_md5(ds: rd.Dataset, col: str = "text") -> rd.Dataset:
    """Content-hash column for byte-exact dedup (md5 semantics, F1)."""
    import hashlib

    def f(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        return t.append_column(
            "content_md5", pa.array([hashlib.md5(str(v).encode()).hexdigest() for v in vals])
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# near-dup over text (MinHash LSH; reuses the image pipeline's bucket verify)


def doc_band_rows(ds: rd.Dataset, cfg: PipelineConfig, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Band rows in the shared (band, key, image_id, dhash, caption) schema:
    text rides in ``caption`` (exact-Jaccard verify), id is stringified."""

    def f(t: pa.Table) -> pa.Table:
        texts = [str(x) for x in t[text_col].to_pylist()]
        ids = [str(x) for x in t[id_col].to_pylist()]
        n = len(ids)
        sigs = textfn.minhash_batch(texts, cfg.shingle_k, cfg.num_perm)
        bkeys = textfn.band_keys(sigs, cfg.bands, cfg.rows_per_band)
        bands, keys, oid, cap = [], [], [], []
        for bi in range(cfg.bands):
            bands.append(np.full(n, 100 + bi, np.int32))
            keys.append(bkeys[:, bi].copy())
            oid.extend(ids)
            cap.extend(texts)
        return pa.Table.from_pydict(
            {
                "band": pa.array(np.concatenate(bands), pa.int32()),
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "image_id": pa.array(oid, pa.string()),
                "dhash": pa.array(np.zeros(n * cfg.bands, np.int64)),
                "caption": pa.array(cap, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=cfg.text_batch_size)


def doc_dup_pairs(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                  id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Distinct verified near-dup doc pairs (exact shingle Jaccard ≥ threshold)."""
    from deduplicator_ray.stages.candidates import VERIFY_SCHEMA

    edges = partitioned_groupby(
        doc_band_rows(ds, cfg, id_col, text_col), ["band", "key"],
        make_partition_verify(cfg, channels=("cap",)),
        out_schema=VERIFY_SCHEMA,
    )
    return drop_duplicates(
        edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], "")).select(["src", "dst"]),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    )


def doc_clusters(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """(image_id=doc_id-as-string, cluster_id) near-dup components."""
    pairs = doc_dup_pairs(ds, cfg)
    return connected_components(pairs, cfg)


def simhash_pairs(ds: rd.Dataset, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """SimHash near-dup candidate pairs: band the 64-bit simhash into
    (max_hamming+1) slices (pigeonhole-lossless), verify Hamming."""
    from deduplicator_ray.hashing import hamming_u64

    n_bands = max_hamming + 1
    width = 64 // n_bands

    def f(t: pa.Table) -> pa.Table:
        texts = [str(x) for x in t[text_col].to_pylist()]
        ids = [str(x) for x in t[id_col].to_pylist()]
        sh = textfn.simhash_batch(texts).view(np.uint64)
        n = len(ids)
        bands, keys, oid, hsh = [], [], [], []
        for bi in range(n_bands):
            shift = np.uint64(bi * width)
            w = width + (64 - width * n_bands if bi == n_bands - 1 else 0)
            key = ((sh >> shift) & np.uint64((1 << w) - 1)).view(np.int64)
            bands.append(np.full(n, bi, np.int32))
            keys.append(key)
            oid.extend(ids)
            hsh.append(sh.view(np.int64))
        return pa.Table.from_pydict(
            {
                "band": pa.array(np.concatenate(bands), pa.int32()),
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "image_id": pa.array(oid, pa.string()),
                "simhash": pa.array(np.concatenate(hsh), pa.int64()),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"src": pd.Series([], dtype=str), "dst": pd.Series([], dtype=str)})
        g = g.sort_values("image_id")
        ids = g["image_id"].tolist()
        sh = g["simhash"].to_numpy()
        src, dst = [], []
        for i in range(len(ids) - 1):
            ham = hamming_u64(np.full(len(ids) - 1 - i, sh[i], np.int64), sh[i + 1 :])
            for j in np.where(ham <= max_hamming)[0]:
                src.append(ids[i])
                dst.append(ids[i + 1 + j])
        return pd.DataFrame({"src": src, "dst": dst})

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band", "key"], sort=False)["image_id"].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            return pd.DataFrame({"src": pd.Series([], dtype=str),
                                 "dst": pd.Series([], dtype=str)})
        outs = [verify(g) for _, g in df.groupby(["band", "key"], sort=False)]
        return pd.concat(outs, ignore_index=True)

    return drop_duplicates(
        partitioned_groupby(
            ds.map_batches(f, batch_format="pyarrow", batch_size=4096),
            ["band", "key"], verify_partition,
            out_schema=pa.schema([("src", pa.string()), ("dst", pa.string())]),
        ),
        ["src", "dst"],
    )


# ---------------------------------------------------------------------------
# text analysis stages (SQL-mirrorable: single-space split, marker counts)


def text_features(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Per-doc analysis columns.  Tokenization for the SQL-checked columns is
    a literal single-space split (mirroring DuckDB string_split(text, ' '));
    ``n_tokens_ws``/BPE counts use the engine tokenizers."""

    def f(t: pa.Table) -> pa.Table:
        texts = [str(x) for x in t[text_col].to_pylist()]
        n = len(texts)
        n_tokens = np.zeros(n, np.int64)
        n_tokens_ws = np.zeros(n, np.int64)
        n_tokens_bpe = np.zeros(n, np.int64)
        punct = np.zeros(n, np.int64)
        stop = np.zeros(n, np.int64)
        langs = [""] * n
        fps = np.zeros(n, np.int64)
        for i, s in enumerate(texts):
            toks = s.split(" ")
            n_tokens[i] = len(toks)
            n_tokens_ws[i] = textfn.token_count_ws(s)
            n_tokens_bpe[i] = textfn.token_count_bpe(s)
            punct[i] = textfn.punct_count(s)
            stop[i] = sum(1 for x in toks if x in textfn.STOPWORDS)
            langs[i] = textfn.lang_id(s)
            fps[i] = textfn.rolling_fingerprint(s)
        out = t.append_column("n_tokens", pa.array(n_tokens))
        out = out.append_column("n_tokens_ws", pa.array(n_tokens_ws))
        out = out.append_column("n_tokens_bpe", pa.array(n_tokens_bpe))
        out = out.append_column("punct_cnt", pa.array(punct))
        out = out.append_column("stopword_cnt", pa.array(stop))
        out = out.append_column("lang_pred", pa.array(langs))
        out = out.append_column("fingerprint", pa.array(fps))
        return out

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)
