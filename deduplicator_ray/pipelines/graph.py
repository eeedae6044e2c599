"""Iterative graph analytics over the near-dup edge set.

Connected components (stages/components.py) answers "which docs are the
same"; PageRank over the same graph answers "which member is most
central" — a standard representative-quality signal when picking which
near-duplicate to keep (the highest-rank member is the one most other
variants point at).  This is the engine's second iterative-algorithm
family: a fixed number of synchronous rounds, each one hash-partitioned
shuffle + vectorized per-partition math, no driver-side per-row work.

All arithmetic is e6 FIXED-POINT INTEGER (rank starts at 1_000_000; each
round r' = 150_000 + (85 * Σ_in r//deg) // 100, i.e. damping 0.85) so the
distributed result is bit-exact against a plain chained-CTE SQL mirror —
no float summation-order drift across partitionings.

Public provenance: PageRank update rule per Page/Brin/Motwani/Winograd
1999 (synchronous power iteration, damping 0.85); triangle counting via
the wedge-check MapReduce formulation (Cohen 2009, "Graph Twiddling in a
MapReduce World").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplicator_ray.stages.partitioned import partitioned_groupby

_EWD_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string()),
                         ("dg", pa.int64()), ("r", pa.int64())])
_RANK_SCHEMA = pa.schema([("node", pa.string()), ("rank_e6", pa.int64())])


def _sym(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    u = pa.concat_arrays([pc.cast(c, pa.string()).combine_chunks()
                          for c in (t["src"], t["dst"])])
    v = pa.concat_arrays([pc.cast(c, pa.string()).combine_chunks()
                          for c in (t["dst"], t["src"])])
    return pa.table({"u": u, "v": v})


def triangle_counts(edges: rd.Dataset, num_parts: int = 64) -> rd.Dataset:
    """Per-node triangle participation over an undirected pair set —
    (node, triangles:int64) for every node in the graph, zero-filled.

    Wedge-join formulation (each triangle {a,b,c} has exactly ONE wedge
    centered at each vertex, so closed wedges centered at n == triangles
    containing n): adjacency partitions emit lexically-normalized wedge
    keys, one hash-partitioned join against the edge set marks the closed
    ones, and a final groupby counts per center.  Exact integer output.

    Scale note: wedge volume is Σ deg(v)² — near-dup graphs are unions of
    small families so this is ~linear; a hub-heavy graph needs the
    degree-orientation variant (emit wedges only from each edge's
    lower-degree endpoint) before this stage, same downstream join.

    The symmetric edge set is materialized ONCE up front: it is consumed
    by three stages (wedges, closure probes, zero-fill), and without the
    materialization each consumption would re-execute the whole upstream
    dedup pipeline.  Like the CC edge base case, the DERIVED graph is
    orders of magnitude smaller than the corpus, so this is a bounded
    small-side cache, not a corpus materialization."""
    sym_edges = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    wedge_schema = pa.schema([("x", pa.string()), ("y", pa.string()),
                              ("c", pa.string()), ("tag", pa.int64())])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        xs, ys, cs = [], [], []
        for c, g in df.groupby("u", sort=False):
            n = np.sort(g["v"].to_numpy())
            if len(n) < 2:
                continue
            i, j = np.triu_indices(len(n), 1)
            xs.append(n[i])
            ys.append(n[j])
            cs.append(np.full(i.size, c, object))
        if not xs:
            return pd.DataFrame({"x": [], "y": [], "c": [], "tag": []})
        return pd.DataFrame({
            "x": np.concatenate(xs), "y": np.concatenate(ys),
            "c": np.concatenate(cs),
            "tag": np.zeros(sum(a.size for a in xs), np.int64),
        })

    wedge_ds = partitioned_groupby(sym_edges, ["u"], wedges,
                                   num_parts=num_parts,
                                   out_schema=wedge_schema)

    # closure probes come from the (already materialized) symmetric set —
    # each undirected pair lands twice but close_wedges dedups the keys
    def edge_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lo = pc.min_element_wise(t["u"], t["v"])
        hi = pc.max_element_wise(t["u"], t["v"])
        n = t.num_rows
        return pa.table({"x": lo, "y": hi,
                         "c": pa.array([""] * n, pa.string()),
                         "tag": pa.array(np.ones(n, np.int64))})

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        ed = df.loc[df["tag"] == 1, ["x", "y"]].drop_duplicates()
        wd = df.loc[df["tag"] == 0]
        hit = wd.merge(ed, on=["x", "y"], how="inner")
        return pd.DataFrame({"node": hit["c"].to_numpy(),
                             "t": np.ones(len(hit), np.int64)})

    closed_schema = pa.schema([("node", pa.string()), ("t", pa.int64())])
    closed = partitioned_groupby(
        wedge_ds.union(sym_edges.map_batches(edge_rows,
                                             batch_format="pyarrow")),
        ["x", "y"], close_wedges, num_parts=num_parts,
        out_schema=closed_schema)

    # zero-fill: every node in the edge set appears, triangles or not
    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["u"],
                         "t": pa.array(np.zeros(t.num_rows, np.int64))})

    out_schema = pa.schema([("node", pa.string()),
                            ("triangles", pa.int64())])

    def count(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("node", sort=False)["t"].sum()
        return pd.DataFrame({"node": s.index.to_numpy(),
                             "triangles": s.to_numpy(np.int64)})

    return partitioned_groupby(
        closed.union(sym_edges.map_batches(node_rows,
                                           batch_format="pyarrow")),
        ["node"], count, num_parts=num_parts, out_schema=out_schema)


def pagerank_e6(edges: rd.Dataset, iters: int = 5,
                num_parts: int = 64,
                driver_edge_cap: int = 2_000_000) -> rd.Dataset:
    """e6 fixed-point PageRank over an undirected pair set.

    ``edges``: (src, dst) string columns, one row per unique undirected
    pair.  Returns (node, rank_e6:int64) for every node in the edge set.

    Scale shape: the graph is the DERIVED near-dup edge set — orders of
    magnitude smaller than the corpus.  Below ``driver_edge_cap`` edges
    (the CC fixpoint's driver memory bound, config.cc_driver_edge_cap:
    2M edges ≈ 200 MB) the whole fixpoint runs as one vectorized driver
    computation — ``iters`` × 2 all-to-all exchanges cost seconds of
    fixed overhead even on a 50-node graph, which dwarfs the math.
    Above the cap: materialize the degree-annotated edge table once (it
    is consumed every round), then each round is one union + two
    hash-partitioned groupbys over graph-sized rows, shuffle width scaled
    to the edge count.  Both paths use identical all-integer e6 rounds
    (c = r//deg per directed edge; r' = 150_000 + 85*Σc//100), so they
    are bit-equal — pinned by a test.
    """
    # materialized: consumed by both the degree count and the edge tagging
    # — unmaterialized, each consumption would re-execute the upstream
    # dedup pipeline that derived the edges
    sym_edges = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    # the cap is documented in RAW undirected pairs (the CC policy,
    # stages/components.py cc_driver_edge_cap); sym_edges carries each
    # pair twice, so halve before comparing — otherwise the driver
    # cutover and the shuffle-width scaling fire at half the threshold
    n_edges = sym_edges.count() // 2
    if n_edges == 0:
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    if n_edges <= driver_edge_cap:
        tbl = pa.concat_tables(
            sym_edges.iter_batches(batch_size=None, batch_format="pyarrow"))
        u = np.asarray(tbl["u"].to_pylist(), object)
        v = np.asarray(tbl["v"].to_pylist(), object)
        nodes, inv_u = np.unique(u, return_inverse=True)
        inv_v = np.searchsorted(nodes, v)  # every v is some u by symmetry
        dg = np.bincount(inv_u, minlength=len(nodes)).astype(np.int64)
        r = np.full(len(nodes), 1_000_000, np.int64)
        for _ in range(iters):
            c = r[inv_u] // dg[inv_u]
            s = np.zeros(len(nodes), np.int64)
            np.add.at(s, inv_v, c)  # int64-exact scatter-sum
            r = np.int64(150_000) + np.int64(85) * s // np.int64(100)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes.tolist(), pa.string()),
            "rank_e6": pa.array(r, pa.int64())}))

    # scale the shuffle width to the graph size (same policy as the CC
    # fixpoint, stages/components.py): a small residual graph must not pay
    # 64-partition × 2-groupby × iters fixed overhead per round
    num_parts = int(min(num_parts, max(2, n_edges // 25_000 + 1)))

    deg_schema = pa.schema([("u", pa.string()), ("dg", pa.int64())])

    def count_deg(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("u", sort=False).size().reset_index(name="dg")
        out["dg"] = out["dg"].astype(np.int64)
        return out

    deg = partitioned_groupby(sym_edges, ["u"], count_deg,
                              num_parts=num_parts, out_schema=deg_schema)

    # degree-annotated edges, materialized ONCE (re-consumed every round)
    def tag_edge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"u": t["u"], "v": t["v"],
                         "dg": pa.array(np.zeros(n, np.int64)),
                         "r": pa.array(np.full(n, -1, np.int64))})

    def tag_deg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"u": t["u"], "v": pa.array([""] * n, pa.string()),
                         "dg": t["dg"],
                         "r": pa.array(np.full(n, -2, np.int64))})

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        dmap = (df.loc[df["r"] == -2].drop_duplicates("u")
                .set_index("u")["dg"])
        out = df.loc[df["r"] == -1, ["u", "v", "r"]].copy()
        out["dg"] = out["u"].map(dmap).astype(np.int64)
        return out[["u", "v", "dg", "r"]]

    ewd = partitioned_groupby(
        sym_edges.map_batches(tag_edge, batch_format="pyarrow")
        .union(deg.map_batches(tag_deg, batch_format="pyarrow")),
        ["u"], attach_deg, num_parts=num_parts, out_schema=_EWD_SCHEMA,
    ).materialize()

    # r0 = 1e6 for every node (every node appears as some u by symmetry)
    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["u"].unique(),
                             "rank_e6": np.int64(1_000_000)})

    ranks = partitioned_groupby(ewd, ["u"], init_rank,
                                num_parts=num_parts, out_schema=_RANK_SCHEMA)

    def tag_rank(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"u": t["node"], "v": pa.array([""] * n, pa.string()),
                         "dg": pa.array(np.zeros(n, np.int64)),
                         "r": t["rank_e6"]})

    contrib_schema = pa.schema([("v", pa.string()), ("c", pa.int64())])

    def emit_contrib(df: pd.DataFrame) -> pd.DataFrame:
        rmap = (df.loc[df["r"] >= 0].drop_duplicates("u")
                .set_index("u")["r"])
        ed = df.loc[df["r"] == -1]
        c = (ed["u"].map(rmap).to_numpy(np.int64)
             // ed["dg"].to_numpy(np.int64))
        return pd.DataFrame({"v": ed["v"].to_numpy(), "c": c})

    def apply_round(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("v", sort=False)["c"].sum()
        return pd.DataFrame({
            "node": s.index.to_numpy(),
            "rank_e6": (np.int64(150_000)
                        + np.int64(85) * s.to_numpy(np.int64) // np.int64(100)),
        })

    for _ in range(iters):
        contribs = partitioned_groupby(
            ewd.union(ranks.map_batches(tag_rank, batch_format="pyarrow")),
            ["u"], emit_contrib, num_parts=num_parts,
            out_schema=contrib_schema)
        ranks = partitioned_groupby(contribs, ["v"], apply_round,
                                    num_parts=num_parts,
                                    out_schema=_RANK_SCHEMA)
    return ranks
