"""Persisted MinHash band index for incremental DOCUMENT near-dup ingest.

The text counterpart of the image band store (state/bandstore.py), closing
the persisted-index matrix's last cell: exact (bloomstore), image near-dup
(bandstore), embedding near-dup (srpstore), ANN top-k (IVF) — and doc
near-dup: "which documents in the corpus we already hold does this new
crawl near-duplicate?", answered without re-shingling or re-reading the
known corpus.

Layout (format 3 — text stored ONCE; full-width text identity):

    bands/part=N/   (band:int32, key:int64, doc_id:int64,
                    tmd5:int64, tmd5b:int64) hash-partitioned on
                    (band, key); fixed-width 36-byte rows, no text.
                    ``(tmd5, tmd5b)`` (the full 16 md5 bytes of the
                    text, split across two int64s) lets the probe
                    collapse identical-text bucket members to one
                    representative — the same unique-caption collapse
                    the in-run verify does.  Format 2 kept only the
                    first 8 bytes; at ~2^32 distinct texts the birthday
                    bound makes 64-bit collisions expected, silently
                    merging two different texts into one representative
                    and dropping the other's candidate pair — the full
                    digest keeps the collapse exact at 10^9+ docs.
    texts/tpart=M/  (doc_id:int64, text) — the verify payload, stored
                    exactly once, partitioned on doc_id for pruned reads.
    _params.json    banding config pin; a probe with drifted
                    shingle/band params fails loudly instead of silently
                    missing candidates.

Format 1 persisted the full text inside every band row (~cfg.bands× the
corpus text, self-documented as the price of a shuffle-free probe).  With
``stages/textjoin.pair_text_join`` in-tree the probe co-locates pair
texts with two keyed exchanges instead, so the index stores text once —
~bands× less index storage for the same relation.

probe (every new crawl increment)
    the increment bands identically; ONLY the ``part=N`` band directories
    its rows hash into are opened, with (band, key) membership pushed
    into the parquet fragment scan.  One (band, key) partition groupby
    emits CROSS-side candidate pairs (known collapsed per bucket to the
    min-id representative of each distinct text); the pairs then ride
    ``pair_text_join`` against the PRUNED texts/ partitions (known side)
    and the increment itself (new side) for the exact-Jaccard verify,
    and a final per-id min election yields the same
    (doc_id, matched) relation as the in-run ``cross_dup_min_match`` —
    value-checked by the shared DuckDB mirror.

append (every accepted increment)
    banding is a pure per-doc function, so folding an increment is
    append-only parquet inside the same hive partitions (bands/ AND
    texts/): build(A) + append(B) answers probes exactly like
    build(A ∪ B).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray import io as dio
from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.pipelines.doc_dedup import CROSS_MIN_SCHEMA
from deduplicator_ray.stages.partitioned import (
    _hash_cols,
    drop_duplicates,
    partitioned_groupby,
)
from deduplicator_ray.stages.textjoin import pair_text_join

_PARAMS = "_params.json"
_PIN = ("shingle_k", "num_perm", "bands", "rows_per_band")

_BAND_SCHEMA = pa.schema([
    ("band", pa.int32()), ("key", pa.int64()),
    ("doc_id", pa.int64()), ("tmd5", pa.int64()), ("tmd5b", pa.int64()),
])


def _tmd5_arr(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Full 128-bit text digest as two int64 halves (hi, lo)."""
    hi = np.empty(len(texts), np.int64)
    lo = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode()).digest()
        hi[i] = int.from_bytes(d[:8], "big", signed=True)
        lo[i] = int.from_bytes(d[8:], "big", signed=True)
    return hi, lo


def _narrow_band_rows(ds: rd.Dataset, cfg: PipelineConfig,
                      id_col: str, text_col: str) -> rd.Dataset:
    """Fixed-width band rows (band, key, doc_id, tmd5, tmd5b) — the SAME MinHash
    banding the in-run pipelines use (doc_dedup.doc_band_rows), minus the
    text payload."""

    def f(t: pa.Table) -> pa.Table:
        # NULL-text docs carry no shingles (doc_band_rows policy)
        t = t.filter(pc.is_valid(t[text_col]))
        texts = [str(x) for x in t[text_col].to_pylist()]
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = textfn.minhash_batch(texts, cfg.shingle_k, cfg.num_perm)
        bkeys = textfn.band_keys(sigs, cfg.bands, cfg.rows_per_band)
        tm_hi, tm_lo = _tmd5_arr(texts)
        bands = np.repeat(np.arange(cfg.bands, dtype=np.int32) + 100, n)
        return pa.Table.from_arrays([
            pa.array(bands),
            pa.array(bkeys.T.reshape(-1).view(np.int64)),
            pa.array(np.tile(ids, cfg.bands)),
            pa.array(np.tile(tm_hi, cfg.bands)),
            pa.array(np.tile(tm_lo, cfg.bands)),
        ], schema=_BAND_SCHEMA)

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=cfg.text_batch_size)


def _add_part(num_parts: int):
    def f(t: pa.Table) -> pa.Table:
        part = (_hash_cols(t, ["band", "key"])
                % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    return f


def _tpart_of(doc_ids: np.ndarray, text_parts: int) -> np.ndarray:
    return ((doc_ids % text_parts) + text_parts) % text_parts


def _add_tpart(text_parts: int, id_col: str, text_col: str):
    def f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        tp = _tpart_of(ids.to_numpy(zero_copy_only=False), text_parts)
        return pa.Table.from_arrays(
            [ids, pc.cast(t[text_col], pa.string()), pa.array(tp)],
            names=["doc_id", "text", "tpart"])

    return f


def _write_index(ds: rd.Dataset, cfg: PipelineConfig, index_dir: str,
                 num_parts: int, text_parts: int,
                 id_col: str, text_col: str) -> None:
    rows = (_narrow_band_rows(ds, cfg, id_col, text_col)
            .map_batches(_add_part(num_parts), batch_format="pyarrow"))
    rows.write_parquet(os.path.join(index_dir, "bands"),
                       partition_cols=["part"])
    texts = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[text_col])),
        batch_format="pyarrow").map_batches(
        _add_tpart(text_parts, id_col, text_col), batch_format="pyarrow")
    texts.write_parquet(os.path.join(index_dir, "texts"),
                        partition_cols=["tpart"])


def build_doc_band_index(known: rd.Dataset, cfg: PipelineConfig,
                         index_dir: str, num_parts: int = 64,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         text_parts: int = 64) -> dict:
    """Band the known docs (narrow rows, hash-partitioned on (band, key))
    and persist their texts ONCE (doc_id-partitioned)."""
    _write_index(known, cfg, index_dir, num_parts, text_parts,
                 id_col, text_col)
    params = {"format": 3, "num_parts": num_parts,
              "text_parts": text_parts,
              **{k: getattr(cfg, k) for k in _PIN}}
    with open(os.path.join(index_dir, _PARAMS), "w") as f:
        json.dump(params, f)
    return params


def append_doc_band_index(new: rd.Dataset, index_dir: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> int:
    """Fold an increment in append-only (existing files untouched).
    Returns the appended band-row count."""
    params = _load_params(index_dir, cfg)
    # count via a materialized narrow banding (cheap fixed-width rows)
    rows = (_narrow_band_rows(new, cfg, id_col, text_col)
            .map_batches(_add_part(params["num_parts"]),
                         batch_format="pyarrow").materialize())
    rows.write_parquet(os.path.join(index_dir, "bands"),
                       partition_cols=["part"])
    (new.map_batches(lambda t: t.filter(pc.is_valid(t[text_col])),
                     batch_format="pyarrow")
     .map_batches(_add_tpart(params["text_parts"], id_col, text_col),
                  batch_format="pyarrow")
     .write_parquet(os.path.join(index_dir, "texts"),
                    partition_cols=["tpart"]))
    return rows.count()


def _load_params(index_dir: str, cfg: PipelineConfig) -> dict:
    with open(os.path.join(index_dir, _PARAMS)) as f:
        params = json.load(f)
    if params.get("format") != 3:
        raise ValueError(
            f"doc band index at {index_dir} is format "
            f"{params.get('format', 1)}; this engine reads format 3 "
            "(text-once layout, 128-bit text digest) — rebuild with "
            "build_doc_band_index")
    for k in _PIN:
        if params[k] != getattr(cfg, k):
            raise ValueError(
                f"doc band index was built with {k}={params[k]}, probe cfg "
                f"has {getattr(cfg, k)} — candidates would be silently "
                "missed")
    return params


_CAND_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _emit_cross_cands(df: pd.DataFrame) -> pd.DataFrame:
    """Per (band, key) bucket: cross-side candidate pairs, the KNOWN side
    collapsed to one min-id representative per distinct text — keyed by
    the FULL 128-bit (tmd5, tmd5b) digest, so the collapse is exact — the
    unique-caption collapse of the in-run verify, valid because Jaccard
    is a function of the text and the final election takes the min
    matched id (group minima preserve the global min)."""
    outs_src: list[np.ndarray] = []
    outs_dst: list[np.ndarray] = []
    for _, g in df.groupby(["band", "key"], sort=False):
        known = g[g["side"] == 0]
        new = g[g["side"] == 1]
        if known.empty or new.empty:
            continue
        reps = known.groupby(["tmd5", "tmd5b"],
                             sort=False)["doc_id"].min().to_numpy()
        dsts = new["doc_id"].drop_duplicates().to_numpy()
        outs_src.append(np.repeat(reps, len(dsts)))
        outs_dst.append(np.tile(dsts, len(reps)))
    if not outs_src:
        return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                             "dst": pd.Series([], dtype="int64")})
    return pd.DataFrame({"src": np.concatenate(outs_src),
                         "dst": np.concatenate(outs_dst)})


def _make_jaccard_verify(cfg: PipelineConfig):
    """pair_text_join verify around THE shared pair predicate
    (doc_dedup.make_pair_matcher) — the probe applies the identical
    metric the in-run verifies use, single-sourced so they cannot
    drift."""
    from deduplicator_ray.pipelines.doc_dedup import make_pair_matcher

    def verify(full: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        matched: list[int] = []
        match = make_pair_matcher(cfg)
        for src, dst, ta, tb in zip(full["src"], full["dst"],
                                    full["text_a"], full["text_b"]):
            if match(ta, tb):
                ids.append(int(dst))
                matched.append(int(src))
        return pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                             "matched": np.asarray(matched, np.int64)})

    return verify


def probe_doc_band_index(new: rd.Dataset, index_dir: str,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         id_col: str = "doc_id", text_col: str = "text",
                         stats: dict | None = None) -> rd.Dataset:
    """(doc_id:int64, matched:int64) — for each new doc that near-dups the
    indexed corpus (exact cross-side Jaccard ≥ cfg.jaccard_min), the
    smallest matching known id.  ``stats`` gets parts_read/parts_total
    (band partitions) and tparts_read/tparts_total (text partitions) so
    callers can assert read pruning on BOTH stores."""
    params = _load_params(index_dir, cfg)
    num_parts = params["num_parts"]
    text_parts = params["text_parts"]

    probe = (_narrow_band_rows(new, cfg, id_col, text_col)
             .map_batches(_add_part(num_parts), batch_format="pyarrow")
             .materialize())  # the increment is the SMALL side by design

    # partition- and bucket-level read pruning (bandstore pattern)
    key_by_band: dict[int, set[int]] = {}
    nparts: set[int] = set()
    for b in probe.iter_batches(batch_size=None, batch_format="pyarrow"):
        nparts.update(b["part"].to_pylist())
        for band, key in zip(b["band"].to_pylist(), b["key"].to_pylist()):
            key_by_band.setdefault(int(band), set()).add(key)
    paths = [os.path.join(index_dir, "bands", f"part={p}")
             for p in sorted(int(p) for p in nparts)]
    paths = [p for p in paths if os.path.isdir(p)]
    if stats is not None:
        stats["parts_read"] = len(paths)
        stats["parts_total"] = num_parts

    import pyarrow.dataset as pads

    expr = None
    for band, ks in sorted(key_by_band.items()):
        e = ((pads.field("band") == band)
             & pads.field("key").isin(pa.array(sorted(ks), pa.int64())))
        expr = e if expr is None else (expr | e)

    empty = rd.from_arrow(CROSS_MIN_SCHEMA.empty_table())
    if not paths:
        if stats is not None:
            stats["tparts_read"] = 0
            stats["tparts_total"] = text_parts
        return empty

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.select(["band", "key", "doc_id", "tmd5",
                             "tmd5b"]) \
                .append_column("side",
                               pa.array(np.full(t.num_rows, side, np.int8)))

        return f

    known_rows = dio.read_parquet(paths, filter=expr).map_batches(
        tag(0), batch_format="pyarrow")
    cands = partitioned_groupby(
        known_rows.union(probe.drop_columns(["part"]).map_batches(
            tag(1), batch_format="pyarrow")),
        ["band", "key"], _emit_cross_cands, out_schema=_CAND_SCHEMA)
    # the same pair across bands is redundant verify work AND ×bands text
    # replication through the join — dedup before attaching text
    cands = drop_duplicates(cands, ["src", "dst"], num_parts=16) \
        .materialize()

    # prune the text store to the partitions candidate KNOWN ids live in
    src_ids: set[int] = set()
    for b in cands.iter_batches(batch_size=None, batch_format="pyarrow"):
        src_ids.update(int(x) for x in b["src"].to_pylist())
    tparts = sorted({int(_tpart_of(np.asarray([i]), text_parts)[0])
                     for i in src_ids})
    tpaths = [os.path.join(index_dir, "texts", f"tpart={p}")
              for p in tparts]
    tpaths = [p for p in tpaths if os.path.isdir(p)]
    if stats is not None:
        stats["tparts_read"] = len(tpaths)
        stats["tparts_total"] = text_parts
    if not tpaths or not src_ids:
        return empty
    src_arr = pa.array(sorted(src_ids), pa.int64())
    texts_a = dio.read_parquet(
        tpaths, columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=src_arr)),
        batch_format="pyarrow")
    def _new_texts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        return pa.Table.from_arrays(
            [pc.cast(t[id_col], pa.int64()),
             pc.cast(t[text_col], pa.string())],
            names=["doc_id", "text"])

    texts_b = new.map_batches(_new_texts, batch_format="pyarrow")

    matches = pair_text_join(cands, texts_a, texts_b,
                             _make_jaccard_verify(cfg), CROSS_MIN_SCHEMA)

    def minpart(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)["matched"].min()

    return partitioned_groupby(matches, ["doc_id"], minpart, num_parts=8,
                               out_schema=CROSS_MIN_SCHEMA)
