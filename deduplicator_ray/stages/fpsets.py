"""Generic fingerprint-SET near-dup machinery (shared by video + audio).

A modality contributes one kernel — (id, payload) → rows of (id, fp) —
and this module turns the fp rows into verified near-dup pairs and
clusters by exact Jaccard over the per-id fp sets, in THREE shuffle
rounds total:

    round 1 (partition by fp):   distinct (id, fp), stop-fp removal
                                 (document frequency > cap), live-row
                                 emission + per-fp pair emission
    round 2 (partition by va/id): per-(a,b) intersection counts AND
                                 per-id set sizes in ONE pass — pair rows
                                 are keyed by their A endpoint, live rows
                                 by their id, so size_a attaches locally;
                                 sizes re-emit for round 3
    round 3 (partition by vb/id): size_b attaches, Jaccard >= tau
                                 filters, pairs emit

Scale notes: the only full-data shuffle is round 1 (keys+ids, never
payload bytes — payloads are dropped in the modality kernel); pair
emission is bounded per bucket by the stop-fp cap (a black frame /
silence window / channel ident shared by millions of items is evidence
of NOTHING, so fps with document frequency > max_fp_df are removed from
both intersection and union — the stopword-removal convention, applied
identically in the DuckDB mirrors); rounds 2-3 shuffle pairs-only data,
orders of magnitude smaller than the corpus.  Jaccard is exact over the
capped fp sets, so there is no separate verify pass — the intersection
count IS the verification.

Joins here are reduce-side over ``partitioned_groupby`` (NOT
``Dataset.join``: Ray's hash join emits schema-LESS empty blocks on
sparse partitions that then break any downstream join/aggregate — the
partitioned_groupby primitive types every empty block via out_schema).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplicator_ray.stages.partitioned import partitioned_groupby

# internal canonical column names; callers rename at the boundary
_PAIR_SCHEMA = pa.schema([
    ("va", pa.string()),
    ("vb", pa.string()),
    ("n_shared", pa.int64()),
    ("size_a", pa.int64()),
    ("size_b", pa.int64()),
    ("jaccard_e6", pa.int64()),
])

# round-1 emission: k=0 live (id) rows for the per-id size count,
# k=1 (a, b) candidate-pair rows for the intersection count
_BAND_SCHEMA = pa.schema([
    ("k", pa.int8()),
    ("va", pa.string()),
    ("vb", pa.string()),
])

# round-2 emission: k=0 (id, size) rows re-emitted for round 3,
# k=1 (va, vb, n_shared, size_a) half-attached pair rows
_HALF_SCHEMA = pa.schema([
    ("k", pa.int8()),
    ("va", pa.string()),
    ("vb", pa.string()),
    ("n_shared", pa.int64()),
    ("size_a", pa.int64()),
])


def _band_emit(max_fp_df: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["fp", "vid"])
        sz = d.groupby("fp", sort=False)["vid"].transform("size")
        d = d[sz.to_numpy() <= max_fp_df]
        if not len(d):
            return pd.DataFrame({"k": pd.Series([], dtype=np.int8),
                                 "va": pd.Series([], dtype=object),
                                 "vb": pd.Series([], dtype=object)})
        d = d.sort_values(["fp", "vid"], kind="stable")
        vids = d["vid"].to_numpy()
        codes, counts = np.unique(d["fp"].to_numpy(), return_counts=True)
        starts = np.concatenate([[0], np.cumsum(counts[:-1])])
        n = len(vids)
        # vectorized all-pairs within each fp group (group size <= cap):
        # row at within-group position j is the 'b' side of j pairs whose
        # 'a' sides are the j rows before it in the group
        pos = np.arange(n) - np.repeat(starts, counts)
        b_idx = np.repeat(np.arange(n), pos)
        seg = np.cumsum(pos)
        total = int(seg[-1]) if n else 0
        seg_start = np.concatenate([[0], seg[:-1]])
        a_local = np.arange(total) - np.repeat(seg_start, pos)
        a_idx = np.repeat(np.repeat(starts, counts), pos) + a_local
        # orient each pair min,max so (va, vb) is canonical regardless of
        # which fp bucket emitted it
        pa_, pb_ = vids[a_idx], vids[b_idx]
        lo = np.minimum(pa_, pb_)
        hi = np.maximum(pa_, pb_)
        live = pd.DataFrame({"k": np.zeros(n, np.int8),
                             "va": vids, "vb": np.full(n, "", object)})
        pairs = pd.DataFrame({"k": np.ones(total, np.int8),
                              "va": lo, "vb": hi})
        return pd.concat([live, pairs], ignore_index=True)

    return fn


def _count_attach_a(df: pd.DataFrame) -> pd.DataFrame:
    """Round 2, partitioned on va (pair rows) / id (live rows): count
    n_shared per (va, vb), count size per id, attach size_a locally,
    re-emit (id, size) rows for round 3."""
    empty = pd.DataFrame({
        "k": pd.Series([], dtype=np.int8),
        "va": pd.Series([], dtype=object),
        "vb": pd.Series([], dtype=object),
        "n_shared": pd.Series([], dtype=np.int64),
        "size_a": pd.Series([], dtype=np.int64)})
    live = df[df["k"] == 0]
    sizes = live.groupby("va", sort=False).size()
    out = [pd.DataFrame({"k": np.zeros(len(sizes), np.int8),
                         "va": sizes.index.to_numpy(),
                         "vb": np.full(len(sizes), "", object),
                         "n_shared": np.zeros(len(sizes), np.int64),
                         "size_a": sizes.to_numpy().astype(np.int64)})]
    p = df[df["k"] == 1]
    if len(p):
        ns = (p.groupby(["va", "vb"], sort=False).size()
              .rename("n_shared").reset_index())
        # size_a lookup is partition-local: pair rows are keyed by va and
        # live rows by id, so every va's size row landed here
        sa = ns["va"].map(sizes)
        out.append(pd.DataFrame({
            "k": np.ones(len(ns), np.int8),
            "va": ns["va"].to_numpy(), "vb": ns["vb"].to_numpy(),
            "n_shared": ns["n_shared"].to_numpy().astype(np.int64),
            "size_a": sa.to_numpy().astype(np.int64)}))
    res = pd.concat(out, ignore_index=True) if out else empty
    return res if len(res) else empty


def _attach_b_fold(tau_e6: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=t.to_pandas_dtype())
                              for c, t in zip(_PAIR_SCHEMA.names,
                                              _PAIR_SCHEMA.types)})
        sizes = df[df["k"] == 0]
        szmap = dict(zip(sizes["va"], sizes["size_a"]))
        p = df[df["k"] == 1]
        if not len(p):
            return empty
        ns = p["n_shared"].to_numpy()
        sa = p["size_a"].to_numpy()
        sb = p["vb"].map(szmap).to_numpy().astype(np.int64)
        union = sa + sb - ns
        keep = ns * 1_000_000 >= tau_e6 * union
        jac = np.zeros(len(ns), np.int64)
        np.floor_divide(ns * 1_000_000, union, out=jac, where=union > 0)
        out = pd.DataFrame({
            "va": p["va"].to_numpy(), "vb": p["vb"].to_numpy(),
            "n_shared": ns.astype(np.int64),
            "size_a": sa.astype(np.int64), "size_b": sb,
            "jaccard_e6": jac})
        out = out[keep]
        return out if len(out) else empty

    return fn


def fp_dup_pairs(
    live: rd.Dataset,
    *,
    id_col: str,
    fp_col: str,
    out_a: str,
    out_b: str,
    tau_e6: int,
    max_fp_df: int,
    num_parts: int = 64,
) -> rd.Dataset:
    """(id, fp) rows → verified near-dup pair table (exact Jaccard over
    the stop-fp-capped fp sets, fixed-point e6 for hash-stable output).
    Output columns: (out_a, out_b, n_shared, size_a, size_b, jaccard_e6),
    with out_a < out_b lexicographically."""
    live = live.map_batches(
        lambda t: pa.Table.from_pydict(
            {"vid": t[id_col], "fp": t[fp_col]},
            schema=pa.schema([("vid", pa.string()), ("fp", pa.int64())])),
        batch_format="pyarrow")

    banded = partitioned_groupby(
        live, ["fp"], _band_emit(max_fp_df),
        num_parts=num_parts, out_schema=_BAND_SCHEMA)

    # round 2: ONE key space — pair rows keyed by va, live rows by their
    # id ("va" carries both) — so intersection counts, size counts and
    # the size_a attach all happen in the same partition pass
    halves = partitioned_groupby(
        banded, ["va"], _count_attach_a,
        num_parts=max(8, num_parts // 4), out_schema=_HALF_SCHEMA)

    # round 3: key by the B endpoint (size rows carry their id in "va";
    # re-key pair rows under vb so size_b attaches locally)
    def rekey(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        va = t["va"].to_pandas().to_numpy(dtype=object)
        vb = t["vb"].to_pandas().to_numpy(dtype=object)
        key = np.where(k == 1, vb, va)
        return t.append_column("bkey", pa.array(key, pa.string()))

    pairs = partitioned_groupby(
        halves.map_batches(rekey, batch_format="pyarrow"),
        ["bkey"], _attach_b_fold(tau_e6),
        num_parts=max(8, num_parts // 4), out_schema=_PAIR_SCHEMA)

    return pairs.map_batches(
        lambda t: t.rename_columns(
            [out_a if c == "va" else out_b if c == "vb" else c
             for c in t.column_names]),
        batch_format="pyarrow")


def fp_clusters_from_pairs(pairs: rd.Dataset, *, id_col: str,
                           a_col: str = "va",
                           b_col: str = "vb") -> rd.Dataset:
    """Pair table → distributed CC → (id_col, cluster_id).  Lets a job
    that already materialized its pair table derive clusters without
    re-running the 3-round pair machinery."""
    from deduplicator_ray.stages.components import connected_components

    edges = pairs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t[a_col], "dst": t[b_col]},
            schema=pa.schema([("src", pa.string()), ("dst", pa.string())])),
        batch_format="pyarrow")
    cc = connected_components(edges)
    return cc.map_batches(
        lambda t: t.rename_columns(
            [id_col if c == "image_id" else c for c in t.column_names]),
        batch_format="pyarrow")


def fp_clusters(
    live: rd.Dataset,
    *,
    id_col: str,
    fp_col: str,
    tau_e6: int,
    max_fp_df: int,
    num_parts: int = 64,
) -> rd.Dataset:
    """(id, fp) rows → near-dup pairs → distributed CC →
    (id_col, cluster_id)."""
    pairs = fp_dup_pairs(live, id_col=id_col, fp_col=fp_col,
                         out_a="va", out_b="vb", tau_e6=tau_e6,
                         max_fp_df=max_fp_df, num_parts=num_parts)
    return fp_clusters_from_pairs(pairs, id_col=id_col)


# ---------------------------------------------------------------------------
# Tiered duplicate classification for fp-SET modalities (video/audio): the
# modality-generic twin of image_dedup.img_dedup_tiers.  Tier = the
# CHEAPEST test that already catches the duplicate:
#   byte   — identical payload bytes (md5), free at ingest
#   fpset  — identical distinct-fingerprint SET (re-encode/re-mux of the
#            same content: the decode kernel ran, no pair machinery)
#   near   — Jaccard >= tau verified component (full pair machinery)
#   unique — none of the above
# dup_of = that tier's group minimum (own id when unique).  Byte groups
# nest inside fpset groups (identical bytes decode to identical frames),
# so ONE fpset_key-partitioned groupby yields BOTH identity minima; the
# near labels then union in and ONE id-partitioned groupby classifies —
# every shuffle carries short strings only.

_TIERS_MID = pa.schema([
    ("id", pa.string()),
    ("byte_min", pa.string()),
    ("fpset_min", pa.string()),
    ("cluster_id", pa.string()),
])

_TIERS_OUT = pa.schema([
    ("id", pa.string()),
    ("tier", pa.string()),
    ("dup_of", pa.string()),
])


def identity_tiers(ident: rd.Dataset, labels: rd.Dataset,
                   id_col: str, num_parts: int = 64) -> rd.Dataset:
    """``ident``: one row per live item (id_col, byte_key, fpset_key);
    ``labels``: (id_col, cluster_id) for near-dup component members.
    Returns (id_col, tier, dup_of)."""

    def norm_ident(t: pa.Table) -> pa.Table:
        return pa.table({"id": t[id_col].cast(pa.string()),
                         "byte_key": t["byte_key"],
                         "fpset_key": t["fpset_key"]})

    def minima(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["byte_min"] = df.groupby("byte_key")["id"].transform("min")
        df["fpset_min"] = df.groupby("fpset_key")["id"].transform("min")
        df["cluster_id"] = ""
        return df[["id", "byte_min", "fpset_min", "cluster_id"]]

    mins = partitioned_groupby(
        ident.map_batches(norm_ident, batch_format="pyarrow"),
        ["fpset_key"], minima, num_parts=num_parts, out_schema=_TIERS_MID)

    def norm_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([""] * n, pa.string())
        return pa.table({"id": t[id_col].cast(pa.string()),
                         "byte_min": empty, "fpset_min": empty,
                         "cluster_id": t["cluster_id"].cast(pa.string())})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["cluster_id"] != ""].drop_duplicates("id")
                .set_index("id")["cluster_id"])
        base = df.loc[df["cluster_id"] == ""].copy()
        if len(base) == 0:
            return _TIERS_OUT.empty_table().to_pandas()
        lbl = base["id"].map(lmap).fillna("")
        own = base["id"]
        is_byte = base["byte_min"] < own
        is_fpset = base["fpset_min"] < own
        is_near = (lbl != "") & (lbl < own)
        base["tier"] = np.select(
            [is_byte, is_fpset, is_near],
            ["byte", "fpset", "near"], default="unique")
        base["dup_of"] = np.select(
            [is_byte, is_fpset, is_near],
            [base["byte_min"], base["fpset_min"], lbl],
            default=own)
        return base[["id", "tier", "dup_of"]]

    unioned = mins.union(labels.map_batches(norm_labels,
                                            batch_format="pyarrow"))
    out = partitioned_groupby(unioned, ["id"], classify,
                              num_parts=num_parts, out_schema=_TIERS_OUT)
    return out.map_batches(
        lambda t: t.rename_columns(
            [id_col if c == "id" else c for c in t.column_names]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Training-loader surfaces over the fp-set near-dup relation: dedup-aware
# sampling weights and cluster-aware train/val splits (the video/audio
# twins of doc_sample_weights / img_leakage_split — same shared reducers,
# same engine-portable md5 bucket hash, so the DuckDB mirrors re-derive
# identical assignments).


def _distinct_ids(live: rd.Dataset, id_col: str) -> rd.Dataset:
    """One-string-column id projection of an fp-row dataset.  Only
    batch-LOCAL distinct — frames of one item share a read block, so this
    collapses ~n_frames× before the shuffle; the global dedupe rides the
    reducer's drop_duplicates inside the weights/split groupby."""

    def proj(t: pa.Table) -> pa.Table:
        ids = t[id_col].cast(pa.string())
        return pa.table({id_col: ids.unique() if t.num_rows else ids})

    return live.map_batches(proj, batch_format="pyarrow")


def _labels_as_cc(labels: rd.Dataset, id_col: str) -> rd.Dataset:
    """Rename (id_col, cluster_id) back to the connected_components shape
    (image_id, cluster_id) the shared label reducers consume."""
    return labels.map_batches(
        lambda t: t.rename_columns(
            ["image_id" if c == id_col else c for c in t.column_names]),
        batch_format="pyarrow")


def fp_sample_weights(
    live: rd.Dataset,
    *,
    id_col: str,
    fp_col: str,
    tau_e6: int,
    max_fp_df: int,
    num_parts: int = 64,
) -> rd.Dataset:
    """Dedup-aware sampling weights over an fp-set modality: every item
    weighs 1e6 // its exact-Jaccard near-dup family size, so each
    duplicate family contributes one unit of sampling mass."""
    from deduplicator_ray.pipelines.doc_dedup import sample_weights_from_labels

    labels = fp_clusters(live, id_col=id_col, fp_col=fp_col,
                         tau_e6=tau_e6, max_fp_df=max_fp_df,
                         num_parts=num_parts)
    return sample_weights_from_labels(
        _distinct_ids(live, id_col), _labels_as_cc(labels, id_col),
        id_col=id_col, num_parts=num_parts)


def fp_leakage_split(
    live: rd.Dataset,
    *,
    id_col: str,
    fp_col: str,
    tau_e6: int,
    max_fp_df: int,
    train_pct: int = 90,
    num_parts: int = 64,
) -> rd.Dataset:
    """Near-dup-aware train/val split over an fp-set modality: all members
    of a Jaccard component share one split assignment (no leakage across
    the boundary); singletons key on their own id."""
    from deduplicator_ray.pipelines.doc_dedup import leakage_split_from_labels

    labels = fp_clusters(live, id_col=id_col, fp_col=fp_col,
                         tau_e6=tau_e6, max_fp_df=max_fp_df,
                         num_parts=num_parts)
    return leakage_split_from_labels(
        _distinct_ids(live, id_col), _labels_as_cc(labels, id_col),
        id_col=id_col, train_pct=train_pct, num_parts=num_parts)


def fp_dedup_tiers(live_md5: rd.Dataset, *, id_col: str, fp_col: str,
                   tau_e6: int, max_fp_df: int, num_parts: int = 64,
                   labels: rd.Dataset | None = None) -> rd.Dataset:
    """Tier cascade over an fp-set modality: (id_col, fp_col, md5) live
    rows → (id_col, tier, dup_of), tier ∈ byte | fpset | near | unique,
    cheapest binding tier wins.  The fpset key is the FULL sorted distinct
    fp list (identity needs no stop-fp cap — set equality is not pair
    enumeration); the near tier reuses the capped Jaccard machinery.  Pass
    ``labels`` to reuse an already-computed cluster assignment (a job that
    materialized its pair table derives labels via fp_clusters_from_pairs
    instead of re-running the pair rounds)."""
    if labels is None:
        labels = fp_clusters(
            live_md5.select_columns([id_col, fp_col]),
            id_col=id_col, fp_col=fp_col,
            tau_e6=tau_e6, max_fp_df=max_fp_df, num_parts=num_parts)

    ident_schema = pa.schema([(id_col, pa.string()),
                              ("byte_key", pa.string()),
                              ("fpset_key", pa.string())])

    def per_item(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        d = (df.drop_duplicates([id_col, fp_col])
               .sort_values([id_col, fp_col]))
        # a null fp anywhere in a pandas block coerces the int64 fp
        # column to float64, stringifying fps as '123.0' in THAT block
        # but '123' elsewhere — identical fp sets would hash to
        # different fpset_keys (review-found).  Nulls drop (a null fp is
        # no fingerprint) and ints are pinned before stringifying.
        d = d[d[fp_col].notna()]
        d["fp_s"] = d[fp_col].astype(np.int64).astype(str)
        g = d.groupby(id_col, sort=False)
        out = g.agg(byte_key=("md5", "first"),
                    fpset_key=("fp_s", ",".join)).reset_index()
        # fixed-width digest: the raw comma-joined list is an UNBOUNDED
        # shuffle key (a 100k-frame video → a megabytes-long string
        # hash-partitioned downstream), while set equality only needs a
        # collision-resistant fingerprint — the md5 keeps the module's
        # short-string-shuffles-only claim true
        out["fpset_key"] = [hashlib.md5(s.encode()).hexdigest()
                            for s in out["fpset_key"]]
        return out[[id_col, "byte_key", "fpset_key"]]

    ident = partitioned_groupby(live_md5, [id_col], per_item,
                                num_parts=num_parts, out_schema=ident_schema)
    return identity_tiers(ident, labels, id_col, num_parts=num_parts)


def fp_tier_report(tiers: rd.Dataset, alias: str) -> pd.DataFrame:
    """Per-tier rollup (tier, <alias>): ≤ 4 partial rows per classify
    partition reach the driver — the shared rollup the modality reports
    and CLI jobs previously each re-implemented."""
    part_schema = pa.schema([("tier", pa.string()), (alias, pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        vc = t["tier"].to_pandas().value_counts()
        return pa.table({"tier": vc.index.astype(str),
                         alias: vc.to_numpy().astype(np.int64)},
                        schema=part_schema)

    parts = tiers.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return part_schema.empty_table().to_pandas()
    out = parts.groupby("tier", as_index=False)[alias].sum()
    out[alias] = out[alias].astype(np.int64)
    return out.sort_values("tier").reset_index(drop=True)
