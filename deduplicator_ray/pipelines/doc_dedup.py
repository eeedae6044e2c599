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
        # md5(NULL) IS NULL (SQL semantics): a null-text doc must neither
        # weld with other nulls under a shared md5("None") nor collide
        # with a doc whose literal text is "None"
        return t.append_column(
            "content_md5", pa.array(
                [None if v is None else
                 hashlib.md5(str(v).encode()).hexdigest() for v in vals],
                pa.string())
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# near-dup over text (MinHash LSH; reuses the image pipeline's bucket verify)


def doc_band_rows(ds: rd.Dataset, cfg: PipelineConfig, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Band rows in the shared (band, key, image_id, dhash, caption) schema:
    text rides in ``caption`` (exact-Jaccard verify), id is stringified."""

    def f(t: pa.Table) -> pa.Table:
        # NULL-text docs carry no shingles: the mirrors' NULL list
        # arithmetic excludes them from every pair, so they must not band
        # at all (str(None) would weld all failed downloads — and any doc
        # whose literal text is "None" — into one fabricated cluster)
        t = t.filter(pc.is_valid(t[text_col]))
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
        out_schema=VERIFY_SCHEMA, fmt="pyarrow",
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


def doc_keep_best(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                  num_parts: int = 64) -> rd.Dataset:
    """Per-near-dup-cluster keeper election for documents — the doc-side
    analog of the image pipeline's decision table (T1/A4,
    /root/reference/dedupc.py:180,211-218): within each ``doc_clusters``
    component keep the highest-quality member, drop the rest.  Quality =
    text length in characters (the classic "keep the longest version"
    policy), tie-broken by ascending doc_id string.

    Scale shape: cluster labels (near-dup members only — a small fraction
    of the corpus) union a 2-column (doc_id, qlen) projection of the full
    corpus, then ONE hash-partitioned groupby on doc_id attaches quality
    to each label row and a second on cluster_id runs the election — both
    vectorized per partition, no broadcast of either side, no driver
    materialization.  Output: (doc_id, cluster_id, action∈{keep,drop}),
    clustered docs only (singletons are implicitly kept, as in the image
    decision table)."""
    labels = doc_clusters(ds, cfg)  # (image_id, cluster_id), both string

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "cluster_id": pa.array([""] * t.num_rows, pa.string()),
            "qlen": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    def lab(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["image_id"],
            "cluster_id": t["cluster_id"],
            "qlen": pa.array(np.full(t.num_rows, -1, np.int64)),
        })

    mid_schema = pa.schema([("doc_id", pa.string()),
                            ("cluster_id", pa.string()),
                            ("qlen", pa.int64())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        qmap = (df.loc[df["cluster_id"] == ""]
                .drop_duplicates("doc_id").set_index("doc_id")["qlen"])
        out = df.loc[df["cluster_id"] != ""].copy()
        out["qlen"] = out["doc_id"].map(qmap).fillna(0).astype(np.int64)
        return out

    out_schema = pa.schema([("doc_id", pa.string()),
                            ("cluster_id", pa.string()),
                            ("action", pa.string())])

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        q = df.sort_values(["cluster_id", "qlen", "doc_id"],
                           ascending=[True, False, True], kind="mergesort")
        q["action"] = np.where(~q["cluster_id"].duplicated(), "keep", "drop")
        return q[["doc_id", "cluster_id", "action"]]

    unioned = (ds.map_batches(proj, batch_format="pyarrow")
               .union(labels.map_batches(lab, batch_format="pyarrow")))
    joined = partitioned_groupby(unioned, ["doc_id"], attach,
                                 num_parts=num_parts, out_schema=mid_schema)
    return partitioned_groupby(joined, ["cluster_id"], elect,
                               num_parts=num_parts, out_schema=out_schema)


def doc_leakage_split(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                      train_pct: int = 90, num_parts: int = 64) -> rd.Dataset:
    """Near-dup-aware train/validation split: every document gets a split
    assignment, and all members of a ``doc_clusters`` component share it,
    so no near-duplicate pair straddles the train/val boundary (the
    benchmark-leakage failure mode of splitting a deduped-but-not-fully
    corpus by plain row hash).  Singletons key on their own id.

    The split key hashes via ``int(md5(key)[:8], 16) % 100`` — an
    engine-independent expression DuckDB computes identically
    (``('0x' || substr(md5(k),1,8))::BIGINT % 100``), so the assignment is
    value-checkable and reproducible across runs and engines.

    Scale shape: cluster labels (near-dup members only, a small fraction
    of the corpus) union a 1-column id projection of the full corpus,
    then ONE hash-partitioned groupby on doc_id resolves each row's split
    key and hashes it — no broadcast of either side, no driver
    materialization, output streamed.  md5 here is per-ROW but C-speed
    and runs on the id string, not the text payload.

    Output: (doc_id, split_key, bucket∈[0,100), split∈{train,val}).  The
    shared reducer's own projection casts/prunes, so ``ds`` passes
    through directly."""
    labels = doc_clusters(ds, cfg)
    return leakage_split_from_labels(
        ds, labels, id_col="doc_id", train_pct=train_pct,
        num_parts=num_parts)


SAMPLE_WEIGHTS_SCHEMA_TMPL = [("weight_key", pa.string()),
                              ("family_size", pa.int64()),
                              ("weight_e6", pa.int64())]


def sample_weights_from_labels(ids: rd.Dataset, labels: rd.Dataset, *,
                               id_col: str = "doc_id",
                               num_parts: int = 64) -> rd.Dataset:
    """Generic dedup-aware sampling weights shared by the doc and image
    modalities: every id weighs 1e6 // its near-dup family size (family =
    its CC component; singletons key on their own id), so each duplicate
    family contributes one unit of sampling mass and the training loader
    samples by weight instead of hard-dropping.  ``ids`` is a
    one-string-column projection; ``labels`` is ``connected_components``-
    shaped (image_id, cluster_id).

    Scale shape: labels union the id projection, ONE hash-partitioned
    groupby resolves each row's family key (the split-assignment shape),
    then ONE more groupby on the family key counts members and emits
    weights vectorized — two narrow all-string shuffles."""

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(t[id_col], pa.string()),
            "cluster_id": pa.array([""] * t.num_rows, pa.string()),
        })

    def lab(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["image_id"],
                         "cluster_id": t["cluster_id"]})

    key_schema = pa.schema([(id_col, pa.string()),
                            ("weight_key", pa.string())])

    def resolve_key(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["cluster_id"] != ""].drop_duplicates(id_col)
                .set_index(id_col)["cluster_id"])
        # drop_duplicates: fp-set modalities project one row per
        # frame/window, and the global dedupe rides THIS shuffle for free
        out = (df.loc[df["cluster_id"] == "", [id_col]]
               .drop_duplicates(id_col).copy())
        out["weight_key"] = out[id_col].map(lmap).fillna(out[id_col])
        return out

    keyed = partitioned_groupby(
        ids.map_batches(proj, batch_format="pyarrow")
        .union(labels.map_batches(lab, batch_format="pyarrow")),
        [id_col], resolve_key, num_parts=num_parts, out_schema=key_schema)

    out_schema = pa.schema([(id_col, pa.string())]
                           + SAMPLE_WEIGHTS_SCHEMA_TMPL)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["family_size"] = df.groupby("weight_key", sort=False)[
            "weight_key"].transform("size").astype(np.int64)
        df["weight_e6"] = (1_000_000 // df["family_size"]).astype(np.int64)
        return df[[id_col, "weight_key", "family_size", "weight_e6"]]

    return partitioned_groupby(keyed, ["weight_key"], weigh,
                               num_parts=num_parts, out_schema=out_schema)


def doc_sample_weights(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                       num_parts: int = 64) -> rd.Dataset:
    """Dedup-aware sampling weights for documents: family =
    ``doc_clusters`` component (exact-Jaccard-verified near-dups).  The
    shared reducer's own projection casts/prunes, so ``ds`` passes
    through directly."""
    labels = doc_clusters(ds, cfg)
    return sample_weights_from_labels(ds, labels,
                                      id_col="doc_id", num_parts=num_parts)


def leakage_split_from_labels(ids: rd.Dataset, labels: rd.Dataset, *,
                              id_col: str = "doc_id", train_pct: int = 90,
                              num_parts: int = 64) -> rd.Dataset:
    """Generic cluster-aware split assignment shared by the doc and image
    modalities: ``ids`` is a one-string-column projection of the splittable
    corpus, ``labels`` is a ``connected_components``-shaped
    (image_id, cluster_id) assignment.  Rows in a cluster key on the
    cluster label, the rest on their own id; the key hashes to a bucket
    via the engine-portable ``int(md5(key)[:8], 16) % 100``."""
    import hashlib

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(t[id_col], pa.string()),
            "cluster_id": pa.array([""] * t.num_rows, pa.string()),
        })

    def lab(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["image_id"],
                         "cluster_id": t["cluster_id"]})

    out_schema = pa.schema([(id_col, pa.string()),
                            ("split_key", pa.string()),
                            ("bucket", pa.int64()),
                            ("split", pa.string())])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["cluster_id"] != ""].drop_duplicates(id_col)
                .set_index(id_col)["cluster_id"])
        # drop_duplicates: see sample_weights_from_labels.resolve_key
        out = (df.loc[df["cluster_id"] == "", [id_col]]
               .drop_duplicates(id_col).copy())
        out["split_key"] = out[id_col].map(lmap).fillna(out[id_col])
        out["bucket"] = np.fromiter(
            (int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % 100
             for k in out["split_key"]),
            np.int64, count=len(out))
        out["split"] = np.where(out["bucket"] < train_pct, "train", "val")
        return out[[id_col, "split_key", "bucket", "split"]]

    unioned = (ids.map_batches(proj, batch_format="pyarrow")
               .union(labels.map_batches(lab, batch_format="pyarrow")))
    return partitioned_groupby(unioned, [id_col], assign,
                               num_parts=num_parts, out_schema=out_schema)


def simhash_pairs(ds: rd.Dataset, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """SimHash near-dup candidate pairs: band the 64-bit simhash into
    (max_hamming+1) slices (pigeonhole-lossless), verify Hamming."""
    from deduplicator_ray.hashing import hamming_u64

    n_bands = max_hamming + 1
    width = 64 // n_bands

    def slice_keys(sh: np.ndarray) -> np.ndarray:
        """(m, n_bands) per-band slice keys of u64 simhashes."""
        cols = []
        for bi in range(n_bands):
            shift = np.uint64(bi * width)
            w = width + (64 - width * n_bands if bi == n_bands - 1 else 0)
            cols.append(((sh >> shift)
                         & np.uint64((1 << w) - 1)).view(np.int64))
        return np.stack(cols, axis=1)

    def f(t: pa.Table) -> pa.Table:
        # NULL-text docs have no simhash (mirror: xor with NULL is NULL,
        # never ≤ ham) — filter, don't stringify into a "None" weld
        t = t.filter(pc.is_valid(t[text_col]))
        texts = [str(x) for x in t[text_col].to_pylist()]
        ids = [str(x) for x in t[id_col].to_pylist()]
        sh = textfn.simhash_batch(texts).view(np.uint64)
        n = len(ids)
        keys_m = slice_keys(sh)
        bands, keys, oid, hsh = [], [], [], []
        for bi in range(n_bands):
            bands.append(np.full(n, bi, np.int32))
            keys.append(keys_m[:, bi])
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

    def verify(g: pd.DataFrame, band: int) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"src": pd.Series([], dtype=str), "dst": pd.Series([], dtype=str)})
        g = g.sort_values("image_id")
        ids = g["image_id"].tolist()
        sh = g["simhash"].to_numpy()
        keys_m = slice_keys(sh.view(np.uint64))
        src, dst = [], []
        for i in range(len(ids) - 1):
            ham = hamming_u64(np.full(len(ids) - 1 - i, sh[i], np.int64), sh[i + 1 :])
            hits = np.where(ham <= max_hamming)[0]
            if not len(hits):
                continue
            # owner-band emission (the candidates.py policy): a pair whose
            # slices agree in several bands is emitted ONLY by the first —
            # without this, identical-simhash groups ship every pair
            # n_bands times through the shuffle just for drop_duplicates
            # to discard
            eq = keys_m[i + 1:][hits] == keys_m[i]
            owner = np.argmax(eq, axis=1)
            for j, ow in zip(hits, owner):
                if ow != band:
                    continue
                src.append(ids[i])
                dst.append(ids[i + 1 + j])
        return pd.DataFrame({"src": src, "dst": dst})

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band", "key"], sort=False)["image_id"].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            return pd.DataFrame({"src": pd.Series([], dtype=str),
                                 "dst": pd.Series([], dtype=str)})
        outs = [verify(g, int(b)) for (b, _), g
                in df.groupby(["band", "key"], sort=False)]
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
    ``n_tokens_ws``/BPE counts use the engine tokenizers.

    All counting columns are pyarrow.compute kernels over the whole batch
    (the r1 per-row Python loop measured as the stage's wall-clock);
    language-ID runs as 15 vectorized substring counts + a 5-step priority
    argmax.  Only the winnowing fingerprint stays per-row (numpy per
    string; its min-``keep`` selection has no reduceat form)."""

    def f(t: pa.Table) -> pa.Table:
        col = pc.cast(t[text_col], pa.string())
        n = t.num_rows
        # len(string_split(text, ' ')) == count(' ') + 1
        n_tokens = pc.add(pc.count_substring(col, " "), 1).cast(pa.int64())
        # Python str.split() token count == number of \S+ runs
        n_tokens_ws = pc.count_substring_regex(col, r"\S+").cast(pa.int64())
        n_tokens_bpe = pc.count_substring_regex(
            col, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]").cast(pa.int64())
        punct = pc.utf8_length(
            pc.replace_substring_regex(col, "[a-zA-Z0-9 ]", "")).cast(pa.int64())

        # stopword count over the single-space split: flatten the list
        # column once, one is_in pass, per-doc segment sums
        toks = pc.split_pattern(col, " ")
        offsets = np.asarray(toks.combine_chunks().offsets)
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=pa.array(textfn.STOPWORDS))
        stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        seg_starts = offsets[:-1].astype(np.int64)
        stop = np.zeros(n, np.int64)
        nonempty = counts > 0
        if nonempty.any() and len(stop_np):
            stop[nonempty] = np.add.reduceat(
                stop_np, seg_starts[nonempty])
        # np.add.reduceat quirk: a start index beyond the last element is
        # invalid; guard trailing empty docs (counts==0 already excluded)
        # NULL text → NULL stopword_cnt, like every other count column
        # (the mirror's list_filter(string_split(NULL)) is NULL — a zeros
        # default would make this the one column that disagrees)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        stop_arr = (pa.array(stop) if valid.all() else
                    pa.array([int(s) if v else None
                              for s, v in zip(stop, valid)], pa.int64()))

        # language-ID: marker-count matrix + the reference priority argmax.
        # fill_null(0): count_substring(NULL) is NULL → NaN → int64 cast
        # is UNDEFINED garbage; zero keeps null docs deterministically at
        # the priority default 'en' (the mirror's ELSE arm)
        scores = np.zeros((len(textfn.LANG_ORDER), n), np.int64)
        for li, lang in enumerate(textfn.LANG_ORDER):
            for m in textfn.LANG_MARKERS[lang]:
                scores[li] += pc.fill_null(
                    pc.count_substring(col, m), 0).to_numpy(
                    zero_copy_only=False).astype(np.int64)
        best = np.zeros(n, np.int64)  # index into LANG_ORDER, 0 = 'en'
        for li in range(1, len(textfn.LANG_ORDER)):
            better = scores[li] > scores[best, np.arange(n)]
            best = np.where(better, li, best)
        langs = np.asarray(textfn.LANG_ORDER, dtype=object)[best].tolist()

        texts = [str(x) for x in col.to_pylist()]
        fps = np.fromiter((textfn.rolling_fingerprint(s) for s in texts),
                          np.int64, count=n)

        out = t.append_column("n_tokens", n_tokens)
        out = out.append_column("n_tokens_ws", n_tokens_ws)
        out = out.append_column("n_tokens_bpe", n_tokens_bpe)
        out = out.append_column("punct_cnt", punct)
        out = out.append_column("stopword_cnt", stop_arr)
        out = out.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("fingerprint", pa.array(fps))
        return out

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)


# ---------------------------------------------------------------------------
# cross-corpus near-dedup: match a NEW corpus against a KNOWN corpus at
# MinHash/Jaccard level (the near-dup generalization of the reference's
# known-paths incremental skip, /root/reference/dupedb.py:190-194 — "is
# this new document a near-copy of anything we already hold?").


def cross_dup_min_match(new_ds: rd.Dataset, known_ds: rd.Dataset,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> rd.Dataset:
    """(doc_id:int64, matched:int64): for each new-side doc that near-dups
    the known corpus (exact char-shingle Jaccard ≥ ``cfg.jaccard_min``),
    the SMALLEST matching known-side id.  Non-matching new docs are absent
    (the caller left-joins them back as 'keep').

    Scale shape: both sides band their MinHash signatures (shared
    ``doc_band_rows`` stage) with a 1-byte side tag; ONE (band, key)
    partition groupby then verifies CROSS-side pairs only — known×known
    and new×new pairs are never formed.  Within a bucket each side first
    collapses to UNIQUE captions (an identical-text mega-bucket costs
    |uniq_A|×|uniq_B| = 1×1 verifies, the text analog of the image
    channel's exact-hash collapse), shingle arrays are cached per distinct
    caption, and the length-ratio bound prunes before any set
    intersection.  Duplicate emissions of the same doc across bands are
    idempotent under the final ``min`` aggregate, so no owner-band
    bookkeeping is needed — the one extra shuffle is a tiny
    (doc_id, matched) table."""

    rows = (
        doc_band_rows(known_ds, cfg, id_col, text_col)
        .map_batches(tag_side(0), batch_format="pyarrow")
        .union(doc_band_rows(new_ds, cfg, id_col, text_col)
               .map_batches(tag_side(1), batch_format="pyarrow")))
    return min_match_from_band_rows(rows, cfg)


CROSS_MIN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                              ("matched", pa.int64())])


def tag_side(side: int):
    """1-byte side tag for cross-side-only verifies (0=known, 1=new)."""
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "side", pa.array(np.full(len(t), side, np.int8)))

    return f


def make_pair_matcher(cfg: PipelineConfig):
    """THE exact char-shingle Jaccard pair predicate — single-sourced so
    the in-run verifies, the delta verify and the persisted-index probe
    (state/docbandstore.py) can never drift on the metric: identical-text
    short-circuit, both-empty convention (jac 1.0), length-ratio prune
    (jac ≤ lo/hi < threshold), per-distinct-text shingle cache.  Returns
    ``match(text_a, text_b) -> bool``; cache lifetime = the returned
    closure (create one per partition call)."""
    jmin = cfg.jaccard_min
    shingle_k = cfg.shingle_k
    sh_cache: dict[str, np.ndarray] = {}

    def sh(c: str) -> np.ndarray:
        s = sh_cache.get(c)
        if s is None:
            s = textfn.char_shingle_hashes(c, shingle_k)
            sh_cache[c] = s
        return s

    def match(ca: str, cb: str) -> bool:
        if ca == cb:
            return True
        sa, sb = sh(ca), sh(cb)
        la, lb = len(sa), len(sb)
        if la == 0 and lb == 0:
            return True
        lo, hi = (la, lb) if la < lb else (lb, la)
        if lo < jmin * hi:
            return False
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        return inter / (la + lb - inter) >= jmin

    return match


def make_cross_doc_verify(cfg: PipelineConfig):
    """Per-(band,key)-partition cross-side verify of cross_dup_min_match,
    shared with the persisted doc band index (state/docbandstore.py)."""

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        res_ids: list[int] = []
        res_match: list[int] = []
        match = make_pair_matcher(cfg)

        for _, g in df.groupby(["band", "key"], sort=False):
            a = g[g["side"] == 0]
            b = g[g["side"] == 1]
            if not len(a) or not len(b):
                continue
            amin: dict[str, int] = {}
            for i, c in zip(a["image_id"], a["caption"]):
                ii = int(i)
                if c not in amin or ii < amin[c]:
                    amin[c] = ii
            bgroups: dict[str, list[int]] = {}
            for i, c in zip(b["image_id"], b["caption"]):
                bgroups.setdefault(c, []).append(int(i))
            for cb, members in bgroups.items():
                best = -1
                for ca, mid in amin.items():
                    if best != -1 and mid >= best:
                        continue  # can't improve the min
                    if match(ca, cb):
                        best = mid
                if best != -1:
                    res_ids.extend(members)
                    res_match.extend([best] * len(members))
        return pd.DataFrame({"doc_id": np.asarray(res_ids, np.int64),
                             "matched": np.asarray(res_match, np.int64)})

    return verify


def min_match_from_band_rows(rows: rd.Dataset,
                             cfg: PipelineConfig) -> rd.Dataset:
    """Side-tagged band rows → (doc_id, matched) min-match relation: one
    (band, key) partition groupby with the cross-side verify, then a tiny
    per-id min election via the same typed partitioned groupby (Ray's
    native .groupby().min() emits schema-LESS empty reduce blocks on
    sparse partitions — the last "RefBundle with a different schema"
    warning in BENCH_r01's tail)."""
    matches = partitioned_groupby(rows, ["band", "key"],
                                  make_cross_doc_verify(cfg),
                                  out_schema=CROSS_MIN_SCHEMA)

    def minpart(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)["matched"].min()

    return partitioned_groupby(matches, ["doc_id"], minpart, num_parts=8,
                               out_schema=CROSS_MIN_SCHEMA)


# ---------------------------------------------------------------------------
# incremental cluster maintenance: fold a new increment into a persisted
# cluster assignment without re-clustering the whole corpus (the cluster-
# label counterpart of cross_dup_min_match's match lookup — together they
# are the reference's mutable on-disk index loop, dupedb.py:31-66, as pure
# checkpoint algebra).


def doc_delta_pairs(new_ds: rd.Dataset, known_ds: rd.Dataset,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """Every near-dup edge (src, dst — string ids) that TOUCHES the new
    increment: new↔new and new↔known, never known↔known (those are already
    reflected in the persisted assignment, because band keys are a pure
    per-doc function — a known×known pair co-bucketed here was co-bucketed
    when the known corpus was clustered).

    Scale shape: both sides band with a 1-byte side tag (at deployment
    scale the known side's band rows come from the persisted band index,
    state/bandstore.py, instead of re-shingling); ONE (band, key)
    partition groupby skips all-known buckets outright, collapses each
    bucket to unique captions, connects new-touched identical-caption
    groups by a min-id star, and Jaccard-verifies only the distinct-
    caption representative pairs with a new side.  Verify cost is
    proportional to new-touched buckets, not the corpus."""

    rows = (
        doc_band_rows(known_ds, cfg, id_col, text_col)
        .map_batches(tag_side(0), batch_format="pyarrow")
        .union(doc_band_rows(new_ds, cfg, id_col, text_col)
               .map_batches(tag_side(1), batch_format="pyarrow")))

    out_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_src: list[str] = []
        out_dst: list[str] = []
        match = make_pair_matcher(cfg)

        for _, g in df.groupby(["band", "key"], sort=False):
            if not (g["side"].to_numpy() == 1).any():
                continue  # all-known bucket: already in the assignment
            groups: dict[str, list[tuple[str, int]]] = {}
            for i, c, s in zip(g["image_id"], g["caption"], g["side"]):
                groups.setdefault(c, []).append((i, s))
            reps: list[tuple[str, str, bool]] = []
            for c, mem in groups.items():
                # identical captions: connect WITHOUT re-emitting the known
                # members' stars (their connectivity predates the
                # increment): new members → group min, plus ONE known→min
                # bridge when the min itself is new — O(increment) per
                # group even when the group is a known mega-clique
                ids = [m[0] for m in mem]
                mn = min(ids)
                news = {i for i, s in mem if s == 1}
                if news:
                    for i in news:
                        if i != mn:
                            out_src.append(mn)
                            out_dst.append(i)
                    if mn in news:
                        known = [i for i, s in mem if s == 0]
                        if known:
                            out_src.append(min(known))
                            out_dst.append(mn)
                reps.append((c, mn, bool(news)))
            # iterate NEW reps against all reps (not all×all with a skip):
            # loop work is O(new_reps × reps) so a known-side mega-bucket
            # costs the increment, not the corpus; a new×new pair is
            # handled once, from its smaller index
            new_rep_idx = [ri for ri, r in enumerate(reps) if r[2]]
            for x in new_rep_idx:
                cx, mx, _ = reps[x]
                for y in range(len(reps)):
                    if y == x:
                        continue
                    cy, my, ny = reps[y]
                    if ny and y < x:
                        continue  # new×new: the smaller index owns it
                    if match(cx, cy):
                        out_src.append(mx)
                        out_dst.append(my)
        return pd.DataFrame({"src": out_src, "dst": out_dst})

    return partitioned_groupby(rows, ["band", "key"], verify,
                               out_schema=out_schema)


NEW_BUCKET_THRESHOLD = 80  # md5(doc_id) % 100 >= this ⇒ increment row


def doc_cluster_update(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                       new_threshold: int = NEW_BUCKET_THRESHOLD,
                       num_parts: int = 32) -> rd.Dataset:
    """End-to-end incremental clustering demo over one table: split the
    corpus deterministically into a KNOWN part (md5-of-id bucket <
    ``new_threshold``, standing in for yesterday's corpus whose clusters
    are checkpointed) and a NEW increment, cluster the known part, derive
    the increment-touched delta edges, and fold them into the assignment
    with ``incremental_cc_update``.

    The result is row-for-row equal to ``doc_clusters`` over the full
    corpus — which is exactly how the driver value-checks it (mirror:
    DOCS_CLUSTERS_SQL) — while no stage ever re-clusters the known side."""
    import hashlib

    from deduplicator_ray.stages.components import incremental_cc_update

    def part(new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = [str(x) for x in t["doc_id"].to_pylist()]
            mask = np.fromiter(
                ((int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
                  >= new_threshold) == new for i in ids),
                bool, count=len(ids))
            return t.filter(pa.array(mask))

        return f

    known = ds.map_batches(part(False), batch_format="pyarrow")
    new = ds.map_batches(part(True), batch_format="pyarrow")
    base = doc_clusters(known, cfg)  # the "persisted" assignment
    delta = doc_delta_pairs(new, known, cfg)
    return incremental_cc_update(base, delta, cfg, num_parts)


REMOVE_BUCKET_THRESHOLD = 85  # md5(doc_id) % 100 >= this ⇒ retired row


def doc_cluster_remove(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                       threshold: int = REMOVE_BUCKET_THRESHOLD,
                       num_parts: int = 32) -> rd.Dataset:
    """End-to-end incremental DELETION demo — the prune direction of the
    maintenance pair (reference: the chunked vanished-file prune loop over
    its shelve index, /root/reference/dupedb.py:371-411): cluster the full
    corpus (stand-in for a persisted checkpoint assignment + its persisted
    verified edge set), deterministically retire the md5-of-id bucket
    ≥ ``threshold`` (stand-in for files that vanished), and shed them with
    ``incremental_cc_remove`` — re-clustering ONLY the touched components.

    The result is row-for-row equal to clustering the surviving corpus
    from scratch, which is exactly how the driver value-checks it (mirror:
    DOCS_CLUSTER_REMOVE_SQL = DOCS_CLUSTERS_SQL over the survivor set)."""
    import hashlib

    from deduplicator_ray.stages.components import incremental_cc_remove

    # ONE banding+verify pass feeds both persisted stand-ins (doc_clusters
    # is definitionally connected_components(doc_dup_pairs); two separate
    # lazy lineages would re-shingle and re-verify the corpus twice)
    edges = doc_dup_pairs(ds, cfg).materialize()
    assign = connected_components(edges, cfg)

    # the retirement increment: a deterministic md5 bucket, derived with a
    # streaming 1-column projection (the removed set is delta-sized by
    # assumption — it is the prune input, not the corpus)
    def rm_rows(t: pa.Table) -> pa.Table:
        ids = [str(x) for x in t["doc_id"].to_pylist()]
        out = [i for i in ids
               if int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
               >= threshold]
        return pa.Table.from_pydict(
            {"doc_id": out}, schema=pa.schema([("doc_id", pa.string())]))

    removed: list[str] = []
    for b in (ds.select_columns(["doc_id"])
              .map_batches(rm_rows, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        removed.extend(b["doc_id"].to_pylist())

    return incremental_cc_remove(assign, edges, removed, cfg, num_parts)


def doc_source_priority(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                        num_parts: int = 64) -> rd.Dataset:
    """Cross-source near-dup resolution — the multi-corpus merge policy of
    a training-data build: when near-duplicate documents arrive from
    DIFFERENT sources, keep the copy from the most trusted source
    (priority = the numeric rank encoded in ``source``, lower = better;
    ties break on ascending doc_id string), drop the rest.  The complement
    of ``doc_keep_best`` (longest-wins): same election shape, different
    policy key — demonstrating the election is pluggable.

    Scale shape (identical to doc_keep_best): cluster labels ∪ a 3-column
    (doc_id, source, priority) projection, ONE doc_id-partition groupby
    attaches source/priority to label rows, one cluster-partition groupby
    elects — no broadcast, no driver materialization."""
    labels = doc_clusters(ds, cfg)

    def proj(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()

        def parse(s) -> int:  # 'srcN' → N; null/odd values rank WORST
            try:
                return int(str(s)[3:])
            except (TypeError, ValueError):
                return np.iinfo(np.int64).max

        prio = np.array([parse(s) for s in src], np.int64)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "cluster_id": pa.array([""] * t.num_rows, pa.string()),
            "source": pa.array(src, pa.string()),
            "prio": pa.array(prio),
        })

    def lab(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["image_id"],
            "cluster_id": t["cluster_id"],
            "source": pa.array([""] * t.num_rows, pa.string()),
            "prio": pa.array(np.full(t.num_rows, -1, np.int64)),
        })

    mid_schema = pa.schema([("doc_id", pa.string()),
                            ("cluster_id", pa.string()),
                            ("source", pa.string()),
                            ("prio", pa.int64())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        feats = (df.loc[df["cluster_id"] == ""]
                 .drop_duplicates("doc_id").set_index("doc_id"))
        out = df.loc[df["cluster_id"] != ""].copy()
        out["source"] = out["doc_id"].map(feats["source"]).fillna("")
        # a label row with no matching feature row (checkpointed labels
        # can cover docs absent from ds) must rank WORST, not win with
        # the best rank 0
        out["prio"] = (out["doc_id"].map(feats["prio"])
                       .fillna(np.iinfo(np.int64).max).astype(np.int64))
        return out

    out_schema = pa.schema([("doc_id", pa.string()),
                            ("cluster_id", pa.string()),
                            ("source", pa.string()),
                            ("action", pa.string())])

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        q = df.sort_values(["cluster_id", "prio", "doc_id"],
                           kind="mergesort")
        q["action"] = np.where(~q["cluster_id"].duplicated(), "keep", "drop")
        return q[["doc_id", "cluster_id", "source", "action"]]

    unioned = (ds.map_batches(proj, batch_format="pyarrow")
               .union(labels.map_batches(lab, batch_format="pyarrow")))
    joined = partitioned_groupby(unioned, ["doc_id"], attach,
                                 num_parts=num_parts, out_schema=mid_schema)
    return partitioned_groupby(joined, ["cluster_id"], elect,
                               num_parts=num_parts, out_schema=out_schema)
