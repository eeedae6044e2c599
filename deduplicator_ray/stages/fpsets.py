"""Generic fingerprint-SET near-dup machinery (shared by video + audio).

A modality contributes one kernel — (id, payload) → rows of (id, fp) —
and this module turns the fp rows into verified near-dup pairs and
clusters by exact Jaccard over the per-id fp sets:

    distinct (id, fp)                                   (one shuffle)
    → stop-fp removal (document frequency > cap)        (in-partition)
    → per-fp pair emission + per-id live-fp counts      (in-partition)
    → n_shared groupby, sizes groupby, two joins        (pairs-only data)
    → Jaccard >= tau filter                             (vectorized)

Scale notes: the only full-data shuffle is the fp-key groupby (keys+ids,
never payload bytes — payloads are dropped in the modality kernel); pair
emission is bounded per bucket by the stop-fp cap (a black frame /
silence window / channel ident shared by millions of items is evidence
of NOTHING, so fps with document frequency > max_fp_df are removed from
both intersection and union — the stopword-removal convention, applied
identically in the DuckDB mirrors); everything after banding is
pairs-only, orders of magnitude smaller than the corpus.  Jaccard is
exact over the capped fp sets, so there is no separate verify pass —
the intersection count IS the verification.

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

# intermediate banding emission: k=0 live (id, fp) rows for the per-id
# size count, k=1 (a, b) candidate-pair rows for the intersection count
_BAND_SCHEMA = pa.schema([
    ("k", pa.int8()),
    ("va", pa.string()),
    ("vb", pa.string()),
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
        live = pd.DataFrame({"k": np.zeros(n, np.int8),
                             "va": vids, "vb": np.full(n, "", object)})
        pairs = pd.DataFrame({"k": np.ones(total, np.int8),
                              "va": vids[a_idx], "vb": vids[b_idx]})
        return pd.concat([live, pairs], ignore_index=True)

    return fn


def _count_rows(keys: list[str], out_col: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(keys, sort=False).size()
             .rename(out_col).reset_index())
        g[out_col] = g[out_col].astype(np.int64)
        return g

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
    import pyarrow.compute as pc  # noqa: F401  (parity with callers)

    live = live.map_batches(
        lambda t: pa.Table.from_pydict(
            {"vid": t[id_col], "fp": t[fp_col]},
            schema=pa.schema([("vid", pa.string()), ("fp", pa.int64())])),
        batch_format="pyarrow")

    banded = partitioned_groupby(
        live, ["fp"], _band_emit(max_fp_df),
        num_parts=num_parts, out_schema=_BAND_SCHEMA)
    banded = banded.materialize()   # consumed twice (sizes + pairs)

    import pyarrow.compute as pc

    sizes = partitioned_groupby(
        banded.map_batches(
            lambda t: t.filter(pc.equal(t["k"], 0)).select(["va"]),
            batch_format="pyarrow"),
        ["va"], _count_rows(["va"], "sz"),
        num_parts=max(8, num_parts // 4),
        out_schema=pa.schema([("va", pa.string()), ("sz", pa.int64())]))

    n_shared = partitioned_groupby(
        banded.map_batches(
            lambda t: t.filter(pc.equal(t["k"], 1)).select(["va", "vb"]),
            batch_format="pyarrow"),
        ["va", "vb"], _count_rows(["va", "vb"], "n_shared"),
        num_parts=max(8, num_parts // 4),
        out_schema=pa.schema([("va", pa.string()), ("vb", pa.string()),
                              ("n_shared", pa.int64())]))

    # reduce-side size attachment: pass 1 keys each pair row under BOTH
    # endpoints alongside the size rows and attaches the local side's
    # size; pass 2 folds the two half-attached rows per pair.  Both
    # passes shuffle pairs-only data.
    uni = pa.schema([("v", pa.string()), ("va", pa.string()),
                     ("vb", pa.string()), ("n_shared", pa.int64()),
                     ("sz", pa.int64()), ("kind", pa.int8())])

    def explode_pairs(t: pa.Table) -> pa.Table:
        va = t["va"].to_pandas().to_numpy(dtype=object)
        vb = t["vb"].to_pandas().to_numpy(dtype=object)
        ns = t["n_shared"].to_numpy(zero_copy_only=False)
        n = len(va)
        return pa.Table.from_pydict(
            {"v": np.concatenate([va, vb]),
             "va": np.concatenate([va, va]),
             "vb": np.concatenate([vb, vb]),
             "n_shared": np.concatenate([ns, ns]).astype(np.int64),
             "sz": np.zeros(2 * n, np.int64),
             "kind": np.zeros(2 * n, np.int8)},
            schema=uni)

    def lift_sizes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict(
            {"v": t["va"], "va": pa.array([""] * n, pa.string()),
             "vb": pa.array([""] * n, pa.string()),
             "n_shared": np.zeros(n, np.int64),
             "sz": t["sz"].to_numpy(zero_copy_only=False).astype(np.int64),
             "kind": np.ones(n, np.int8)},
            schema=uni)

    tagged = n_shared.map_batches(explode_pairs, batch_format="pyarrow") \
        .union(sizes.map_batches(lift_sizes, batch_format="pyarrow"))

    half_schema = pa.schema([("va", pa.string()), ("vb", pa.string()),
                             ("n_shared", pa.int64()),
                             ("size_a", pa.int64()), ("size_b", pa.int64())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        szmap = dict(zip(df.loc[df["kind"] == 1, "v"],
                         df.loc[df["kind"] == 1, "sz"]))
        p = df[df["kind"] == 0]
        if not len(p):
            return pd.DataFrame({c: pd.Series([], dtype=t.to_pandas_dtype())
                                 for c, t in zip(half_schema.names,
                                                 half_schema.types)})
        s = p["v"].map(szmap).astype(np.int64)
        is_a = (p["v"] == p["va"]).to_numpy()
        return pd.DataFrame({
            "va": p["va"].to_numpy(), "vb": p["vb"].to_numpy(),
            "n_shared": p["n_shared"].to_numpy(),
            "size_a": np.where(is_a, s, -1).astype(np.int64),
            "size_b": np.where(is_a, -1, s).astype(np.int64)})

    halves = partitioned_groupby(tagged, ["v"], attach,
                                 num_parts=max(8, num_parts // 4),
                                 out_schema=half_schema)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["va", "vb"], sort=False)
             .agg(n_shared=("n_shared", "first"),
                  size_a=("size_a", "max"), size_b=("size_b", "max"))
             .reset_index())
        ns = g["n_shared"].to_numpy()
        sa = g["size_a"].to_numpy()
        sb = g["size_b"].to_numpy()
        union = sa + sb - ns
        keep = ns * 1_000_000 >= tau_e6 * union
        jac = np.zeros(len(ns), np.int64)
        np.floor_divide(ns * 1_000_000, union, out=jac, where=union > 0)
        out = pd.DataFrame({
            "va": g["va"].to_numpy(),
            "vb": g["vb"].to_numpy(),
            "n_shared": ns.astype(np.int64),
            "size_a": sa.astype(np.int64), "size_b": sb.astype(np.int64),
            "jaccard_e6": jac})
        return out[keep]

    pairs = partitioned_groupby(halves, ["va", "vb"], fold,
                                num_parts=max(8, num_parts // 4),
                                out_schema=_PAIR_SCHEMA)
    return pairs.map_batches(
        lambda t: t.rename_columns(
            [out_a if c == "va" else out_b if c == "vb" else c
             for c in t.column_names]),
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
    from deduplicator_ray.stages.components import connected_components

    pairs = fp_dup_pairs(live, id_col=id_col, fp_col=fp_col,
                         out_a="va", out_b="vb", tau_e6=tau_e6,
                         max_fp_df=max_fp_df, num_parts=num_parts)
    edges = pairs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t["va"], "dst": t["vb"]},
            schema=pa.schema([("src", pa.string()), ("dst", pa.string())])),
        batch_format="pyarrow")
    cc = connected_components(edges)
    return cc.map_batches(
        lambda t: t.rename_columns(
            [id_col if c == "image_id" else c for c in t.column_names]),
        batch_format="pyarrow")
