r"""P6 — distributed connected components via alternating star contraction.

The north-rule algorithm ("distributed union-find — iterative
hash-partitioned edge contraction").  We implement the alternating
Large-Star / Small-Star scheme of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC 2014 — public literature), which is provably
convergent in O(log² n) rounds and geometric in practice.  A first-cut
min-label *edge relabeling* (A(v)=min(v,N(v)); E'={(A(u),A(v))}) was
measured pathological on monotone chains — a 40-edge chain contracted by
only ~1 edge per level because the min label of node cᵢ is cᵢ₋₁, so the
chain re-emerges nearly intact.  Star contraction has no such case:

  Large-Star (center u, neighbors Γ(u)):
      m = min(Γ(u) ∪ {u});  emit (v, m) for every v ∈ Γ(u) with v > u
  Small-Star (center u):
      Γ⁻ = {v ∈ Γ(u) : v < u};  if Γ⁻ ≠ ∅: m = min(Γ⁻);
      emit (u, m) and (v, m) for v ∈ Γ⁻ \ {m}

Each half-round is ONE hash-partitioned shuffle (group adjacency by center
node, emit vectorized per partition — stages/partitioned.py).  Edges always
connect *original* node ids (no supernode space), so there is no label
composition phase: at the fixpoint the edge set IS the assignment — every
edge points a member at its component's lexicographic-min id.  Fixpoint is
detected by (count, order-independent checksum) equality across rounds;
residual graphs at or below ``cc_driver_edge_cap`` collapse with a
driver-side union-find (bounded memory base case, as in the paper's
final local step).

Node ids are the ``image_id`` strings themselves; cluster labels are the
lexicographic-min member id (stable and collision-free — no integer id
assignment, SURVEY.md §7.4.4).
"""

from __future__ import annotations

import os
import sys
import time as _time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions.text import hash_strings_u64
from deduplicator_ray.stages.partitioned import (
    drop_duplicates,
    partitioned_groupby,
)

_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])
_ASSIGN_SCHEMA = pa.schema([("image_id", pa.string()),
                            ("cluster_id", pa.string())])


def _pair_checksum(ds: rd.Dataset, col_a: str, col_b: str) -> int:
    """Order-independent 64-bit checksum of a two-string-column relation —
    per-batch mod-2^64 partials reduced driver-side with Python big-ints
    (no int64-overflow hazard at any scale).

    The per-batch partial ships as a SIGNED int64 (Arrow storage), so the
    driver reduction must add the ``1 << 63`` offset back per partial
    before the mod — summing the offset partials raw would make the
    checksum depend on the PARITY OF THE BATCH COUNT, not just the row
    multiset (two identical assignments with different block structure
    would checksum differently, and the CC fixpoint comparing consecutive
    rounds could miss an already-converged graph)."""

    def h(batch: pa.Table) -> pa.Table:
        a = batch[col_a].to_pylist()
        b = batch[col_b].to_pylist()
        hv = hash_strings_u64([f"{x}\x00{y}" for x, y in zip(a, b)])
        with np.errstate(over="ignore"):
            s = int(hv.sum(dtype=np.uint64))
        return pa.Table.from_pydict({"h": [s - (1 << 63)]})

    parts = ds.map_batches(h, batch_format="pyarrow").take_all()
    return sum(p["h"] + (1 << 63) for p in parts) % (1 << 64)


def _checksum(assign: rd.Dataset) -> int:
    """Order- and block-structure-independent checksum of a (node, label)
    assignment.  Used by tests and manifests."""
    return _pair_checksum(assign, "node", "label")


def _edge_checksum(edges: rd.Dataset) -> int:
    """Order- and block-structure-independent checksum over (src, dst)
    edge rows (drives the CC fixpoint detection)."""
    return _pair_checksum(edges, "src", "dst")


def _symmetrize(b: pa.Table) -> pa.Table:
    src = _one_chunk(b["src"].cast(pa.string()))
    dst = _one_chunk(b["dst"].cast(pa.string()))
    return pa.Table.from_arrays(
        [pa.concat_arrays([src, dst]), pa.concat_arrays([dst, src])],
        schema=pa.schema([("node", pa.string()), ("nbr", pa.string())]),
    )


def _runs_first(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(run-start indices, per-row run id) of a SORTED key array — the
    adjacency compare runs in Arrow C++; only the boolean bookkeeping is
    numpy."""
    n = len(arr)
    if n <= 1:
        return np.zeros(min(n, 1), np.int64), np.zeros(n, np.int64)
    change = np.r_[True, pc.not_equal(
        arr.slice(1), arr.slice(0, n - 1)).to_numpy(zero_copy_only=False)]
    return np.flatnonzero(change), np.cumsum(change) - 1


def _dedup_sorted_pairs(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Boolean keep-mask dropping adjacent duplicate (a, b) rows of a
    table already sorted on (a, b)."""
    n = len(a)
    if n <= 1:
        return np.ones(n, bool)
    same = pc.and_(
        pc.equal(a.slice(1), a.slice(0, n - 1)),
        pc.equal(b.slice(1), b.slice(0, n - 1)),
    ).to_numpy(zero_copy_only=False)
    return np.r_[True, ~same]


def _one_chunk(col: pa.ChunkedArray) -> pa.Array:
    return (col.combine_chunks() if col.num_chunks != 1 else col.chunk(0))


def _star_partition_fn(large: bool):
    """Per-partition star step over complete adjacency groups (the
    partitioned groupby guarantees every row of a center node lands in one
    partition).  Arrow-native: the string-heavy sort / compare / take /
    filter kernels all run in Arrow C++ — the pandas version paid
    object-array conversion for every edge every round, the dominant
    constant factor of multi-round CC."""

    empty = _EDGE_SCHEMA.empty_table()

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["node"], t["nbr"])))
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(
            t, sort_keys=[("node", "ascending"), ("nbr", "ascending")]))
        node = _one_chunk(t["node"])
        nbr = _one_chunk(t["nbr"])
        keep = _dedup_sorted_pairs(node, nbr)
        if not keep.all():
            km = pa.array(keep)
            node = node.filter(km)
            nbr = nbr.filter(km)
        starts, run_id = _runs_first(node)
        # sorted on (node, nbr) ⇒ first nbr of a node run is its min
        mn = nbr.take(pa.array(starts[run_id]))
        if large:
            m = pc.if_else(pc.less(mn, node), mn, node)  # min(Γ(u) ∪ {u})
            sel = pa.array(pc.greater(nbr, node))
            src, dst = nbr.filter(sel), m.filter(sel)
        else:
            sel = pa.array(pc.less(nbr, node))
            s_node = node.filter(sel)
            s_nbr = nbr.filter(sel)
            if len(s_node) == 0:
                return empty
            st2, run2 = _runs_first(s_node)
            m2 = s_nbr.take(pa.array(st2[run2]))
            centers = pa.array(st2)
            src = pa.concat_arrays([s_nbr, s_node.take(centers)])
            dst = pa.concat_arrays([m2, s_nbr.take(centers)])
        out = pa.Table.from_arrays([src, dst], schema=_EDGE_SCHEMA)
        out = out.filter(pc.invert(pc.equal(out["src"], out["dst"])))
        if out.num_rows == 0:
            return empty
        out = out.take(pc.sort_indices(
            out, sort_keys=[("src", "ascending"), ("dst", "ascending")]))
        a = _one_chunk(out["src"])
        b = _one_chunk(out["dst"])
        keep2 = _dedup_sorted_pairs(a, b)
        return out if keep2.all() else out.filter(pa.array(keep2))

    return f


def _star_half(E: rd.Dataset, num_parts: int, large: bool,
               materialize: bool = True) -> rd.Dataset:
    """One star-contraction half-round.  ``materialize=False`` for the
    large half: its output is consumed exactly once (by the small half
    immediately after), so pinning it only doubled the transient
    object-store footprint per round (review-found); the small half's
    output IS re-consumed (count / checksum / fetch) and stays pinned."""
    out = partitioned_groupby(
        E.map_batches(_symmetrize, batch_format="pyarrow"),
        ["node"], _star_partition_fn(large), num_parts,
        out_schema=_EDGE_SCHEMA, fmt="pyarrow",
    )
    return out.materialize() if materialize else out


def _local_contract(b: pa.Table) -> pa.Table:
    """Shuffle-free block-local contraction: union-find over the block's
    edges, emit one (member → local_root) star edge per non-root member.

    Verified edges arrive grouped by band bucket, so a k-member clique or
    multi-band duplicate stream is usually co-located in one block; the
    local pass collapses it to k-1 edges before the expensive global
    adjacency shuffle.  Connectivity is preserved exactly: every member
    keeps an edge to its block-local root, and a node spanning blocks
    bridges its local roots.  (Kiveris et al. §local-contraction.)"""
    src = b["src"].to_pylist()
    dst = b["dst"].to_pylist()
    parent = _driver_union_find(src, dst)
    nodes: set[str] = set()
    for a, c in zip(src, dst):
        if a != c:
            nodes.add(a)
            nodes.add(c)
    out_s, out_d = [], []
    for x in nodes:
        r = parent.get(x, x)
        if r != x:
            out_s.append(x)
            out_d.append(r)
    return pa.Table.from_pydict({"src": out_s, "dst": out_d},
                                schema=_EDGE_SCHEMA)


def _fetch_edges(E: rd.Dataset) -> tuple[list[str], list[str]]:
    """Pull an edge dataset to the driver as two flat string lists via Arrow
    batches.  NEVER ``take_all()`` here: its per-row dict conversion was
    measured at ~50 s for 88 k rows where batch iteration takes 0.04 s."""
    src: list[str] = []
    dst: list[str] = []
    for b in E.iter_batches(batch_size=None, batch_format="pyarrow"):
        src.extend(b["src"].to_pylist())
        dst.extend(b["dst"].to_pylist())
    return src, dst


def _driver_union_find(src: list[str], dst: list[str]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def _driver_assignment(src: list[str], dst: list[str]) -> rd.Dataset:
    parent = _driver_union_find(src, dst)
    nodes: set[str] = set()
    for a, b in zip(src, dst):
        if a != b:
            nodes.add(a)
            nodes.add(b)
    ids = sorted(nodes)
    return rd.from_arrow(pa.Table.from_pydict(
        {"image_id": ids, "cluster_id": [parent.get(x, x) for x in ids]},
        schema=_ASSIGN_SCHEMA,
    ))


def incremental_cc_update(
    assign: rd.Dataset,
    delta_edges: rd.Dataset,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Merge an increment's edges into a PERSISTED cluster assignment
    without re-running connected components over the whole corpus — the
    maintenance half of the reference's persistent hash-store loop
    (/root/reference/dupedb.py:31-66 holds its cluster index mutable on
    disk and folds new scans in; here the assignment is an immutable
    checkpoint table and the fold is pure).

    ``assign``: Dataset[(image_id, cluster_id)] — a prior
    ``connected_components`` output (labels are component-min member ids,
    the star invariant this function relies on).
    ``delta_edges``: Dataset[(src, dst)] — every newly discovered edge
    that touches the increment (new↔new and new↔old; old↔old pairs are
    already reflected in ``assign`` and must not be re-fed).

    Returns the updated assignment, row-for-row equal to running
    ``connected_components`` over (star edges of ``assign``) ∪
    ``delta_edges`` — i.e. to a full recompute, whenever the increment's
    edge discovery has full recall on new-touched pairs.

    Scale shape: the FULL assignment is never shuffled into the CC rounds.
    One hash-partitioned groupby over (assignment 2-col projection ∪
    delta-node probes) resolves each delta node to its persisted label;
    the delta edges are then contracted into LABEL space (a graph bounded
    by the increment size, not the corpus), clustered with the ordinary
    star-contraction CC, and the resulting label→merged-label map — small
    by the same bound — is broadcast once (``ray.put``) into a streaming
    remap of the assignment.  Cost: one shuffle of a 2-column projection
    + CC on the increment-sized label graph + one broadcast map pass."""
    import ray

    cfg = cfg or PipelineConfig()

    E = delta_edges.materialize()
    if E.count() == 0:
        return assign
    # the assignment streams through MULTIPLE passes below; pin the
    # 2-column projection once or a lazy input (e.g. a CC pipeline fed
    # straight in) re-executes its whole lineage per pass (review-found)
    assign = assign.materialize()

    # -- 1. resolve every delta-edge node to its persisted label (or itself)
    def probe_rows(b: pa.Table) -> pa.Table:
        ids = b["src"].to_pylist() + b["dst"].to_pylist()
        uniq = sorted(set(ids))
        return pa.Table.from_pydict(
            {"node": uniq, "lbl": [""] * len(uniq)},
            schema=pa.schema([("node", pa.string()), ("lbl", pa.string())]))

    def assign_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": b["image_id"].to_pylist(),
             "lbl": b["cluster_id"].to_pylist()},
            schema=pa.schema([("node", pa.string()), ("lbl", pa.string())]))

    key_schema = pa.schema([("node", pa.string()), ("key", pa.string())])

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        amap = (df.loc[df["lbl"] != ""].drop_duplicates("node")
                .set_index("node")["lbl"])
        q = df.loc[df["lbl"] == "", ["node"]].drop_duplicates("node").copy()
        q["key"] = q["node"].map(amap).fillna(q["node"])
        return q

    keymap_ds = partitioned_groupby(
        assign.map_batches(assign_rows, batch_format="pyarrow")
        .union(E.map_batches(probe_rows, batch_format="pyarrow")),
        ["node"], resolve, num_partitions, out_schema=key_schema)

    # bounded by 2×|delta| rows — a driver dict is the broadcast side
    key_of: dict[str, str] = {}
    for b in keymap_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        key_of.update(zip(b["node"].to_pylist(), b["key"].to_pylist()))
    key_ref = ray.put(key_of)

    # -- 2. contract delta edges into label space and cluster that graph
    def relabel(b: pa.Table) -> pa.Table:
        k = ray.get(key_ref)
        s = pd.Series(b["src"].to_pylist(), dtype=object)
        d = pd.Series(b["dst"].to_pylist(), dtype=object)
        src = s.map(k).fillna(s).to_numpy()
        dst = d.map(k).fillna(d).to_numpy()
        keep = src != dst
        return pa.Table.from_pydict(
            {"src": src[keep].tolist(), "dst": dst[keep].tolist()},
            schema=_EDGE_SCHEMA)

    merged = connected_components(
        E.map_batches(relabel, batch_format="pyarrow"), cfg, num_partitions
    ).materialize()

    # label→merged-label map (small: keys ⊆ delta-node keys)
    merge_map: dict[str, str] = {}
    for b in merged.iter_batches(batch_size=None, batch_format="pyarrow"):
        merge_map.update(zip(b["image_id"].to_pylist(),
                             b["cluster_id"].to_pylist()))
    merge_ref = ray.put(merge_map)

    # -- 3. stream the old assignment through the broadcast remap, and add
    # the merged rows themselves (covers nodes that had no prior label —
    # new docs and old singletons joining a cluster; keys that already had
    # assignment rows re-emit the identical row and dedup below)
    def remap(b: pa.Table) -> pa.Table:
        m = ray.get(merge_ref)
        c = pd.Series(b["cluster_id"].to_pylist(), dtype=object)
        lbl = c.map(m).fillna(c).tolist()
        return pa.Table.from_pydict(
            {"image_id": b["image_id"].to_pylist(), "cluster_id": lbl},
            schema=_ASSIGN_SCHEMA)

    return drop_duplicates(
        assign.map_batches(remap, batch_format="pyarrow").union(merged),
        ["image_id"], num_partitions)


def affected_partition(assign: rd.Dataset,
                       removed: set[str]) -> tuple[set[str], set[str]]:
    """(affected cluster labels, their full membership) for a removal set —
    the locality core shared by both deletion-maintenance paths
    (``incremental_cc_remove`` and the image pipeline's group-aware
    ``img_cluster_remove``): only clusters containing a removed node can
    change.  Two streaming passes over the 2-column assignment with the
    delta broadcast via ``ray.put``; the label set is bounded by
    ``|removed|`` and the membership by the touched clusters' total size
    (a removal inside a mega-cluster inherently costs that cluster's
    size — nothing smaller can decide a split)."""
    import ray

    rem_ref = ray.put(removed)
    lbl_schema = pa.schema([("cluster_id", pa.string())])

    def hit_labels(b: pa.Table) -> pa.Table:
        rm = ray.get(rem_ref)
        ids = pd.Series(b["image_id"].to_pylist(), dtype=object)
        lbl = pd.Series(b["cluster_id"].to_pylist(), dtype=object)
        out = sorted(set(lbl[ids.isin(rm)]))
        return pa.Table.from_pydict({"cluster_id": out}, schema=lbl_schema)

    affected: set[str] = set()
    for b in (assign.map_batches(hit_labels, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        affected.update(b["cluster_id"].to_pylist())
    if not affected:
        return set(), set()
    aff_ref = ray.put(affected)

    mem_schema = pa.schema([("image_id", pa.string())])

    def members(b: pa.Table) -> pa.Table:
        aff = ray.get(aff_ref)
        ids = pd.Series(b["image_id"].to_pylist(), dtype=object)
        lbl = pd.Series(b["cluster_id"].to_pylist(), dtype=object)
        return pa.Table.from_pydict(
            {"image_id": ids[lbl.isin(aff)].tolist()}, schema=mem_schema)

    membership: set[str] = set()
    for b in (assign.map_batches(members, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        membership.update(b["image_id"].to_pylist())
    return affected, membership


def untouched_rows(assign: rd.Dataset, affected: set[str]) -> rd.Dataset:
    """Assignment rows whose cluster is NOT affected — a streaming
    broadcast-filter pass (the pass-through side of a prune)."""
    import ray

    aff_ref = ray.put(affected)

    def f(b: pa.Table) -> pa.Table:
        aff = ray.get(aff_ref)
        lbl = pd.Series(b["cluster_id"].to_pylist(), dtype=object)
        keep = (~lbl.isin(aff)).to_numpy()
        return pa.Table.from_pydict(
            {"image_id": pd.Series(b["image_id"].to_pylist(),
                                   dtype=object)[keep].tolist(),
             "cluster_id": lbl[keep].tolist()},
            schema=_ASSIGN_SCHEMA)

    return assign.map_batches(f, batch_format="pyarrow")


def incremental_cc_remove(
    assign: rd.Dataset,
    edges: rd.Dataset,
    removed_ids,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Retire a set of nodes from a PERSISTED cluster assignment — the
    deletion half of incremental maintenance, pairing with
    ``incremental_cc_update`` (the fold half).  The reference runs this as
    its ``prune`` loop: vanished files are dropped from the mutable shelve
    index chunk by chunk (/root/reference/dupedb.py:371-411); here the
    assignment and the verified edge set are immutable checkpoint tables
    and the prune is a pure recompute of ONLY the affected components.

    Removal is strictly harder than insertion for connected components:
    deleting a cut vertex SPLITS its cluster, so the affected subgraph
    must be re-clustered from its surviving edges — no label algebra can
    patch around it.  The saving grace is locality: only clusters that
    contain a removed node can change.

    ``assign``: Dataset[(image_id, cluster_id)] — a prior
    ``connected_components`` output (labels are component-min member ids).
    ``edges``: Dataset[(src, dst)] — the persisted verified edge set the
    assignment was computed from (``state/edge_checkpoint.py`` is the
    natural source); orientation/duplication don't matter (re-CC
    symmetrizes).
    ``removed_ids``: iterable of node ids to retire (an increment —
    bounded like a delta, NOT corpus-sized).

    Returns the assignment equal row-for-row to a full recompute of
    ``connected_components`` over the surviving edge set (both endpoints
    alive).  Survivors that lose their last edge drop OUT of the
    assignment, exactly as a full recompute over edges would never emit
    them.

    Scale shape — NO corpus-wide shuffle at all (cheaper than the fold,
    which needs one keymap groupby):
      1. one streaming pass over the 2-column assignment finds the
         affected labels (bounded by |removed|), broadcast via ray.put;
      2. a second streaming pass collects the affected clusters'
         membership — bounded by the total size of touched clusters (a
         removal inside a mega-cluster inherently costs that cluster's
         size; nothing smaller can decide a split);
      3. one map-only filter over the persisted edges keeps the affected
         survivor subgraph (an edge with one endpoint in an affected
         cluster has both there — components are closed under edges);
      4. star-contraction CC on that bounded subgraph;
      5. untouched assignment rows stream through a broadcast label
         filter and union with the re-clustered rows (disjoint by
         construction — no dedup pass needed)."""
    import ray

    cfg = cfg or PipelineConfig()
    removed = {str(x) for x in removed_ids}
    if not removed:
        return assign
    rem_ref = ray.put(removed)

    # multiple streaming passes below (affected labels, membership,
    # untouched rows): pin the assignment once or a lazy input
    # re-executes its whole lineage on every pass (review-found)
    assign = assign.materialize()

    affected, membership = affected_partition(assign, removed)
    if not affected:
        # removed nodes were all unclustered — the assignment stands
        return assign
    mem_ref = ray.put(membership)

    # -- 3. surviving edges of the affected subgraph (map-only filter)
    def surv_edges(b: pa.Table) -> pa.Table:
        mem = ray.get(mem_ref)
        rm = ray.get(rem_ref)
        s = pd.Series(b["src"].to_pylist(), dtype=object)
        d = pd.Series(b["dst"].to_pylist(), dtype=object)
        keep = ((s.isin(mem) | d.isin(mem))
                & ~s.isin(rm) & ~d.isin(rm)).to_numpy()
        return pa.Table.from_pydict(
            {"src": s[keep].tolist(), "dst": d[keep].tolist()},
            schema=_EDGE_SCHEMA)

    sub = connected_components(
        edges.map_batches(surv_edges, batch_format="pyarrow"),
        cfg, num_partitions)

    # -- 5. untouched rows pass through; re-clustered rows replace the rest
    return untouched_rows(assign, affected).union(sub)


def connected_components(
    edges: rd.Dataset,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """edges: Dataset[(src: string, dst: string)] → Dataset[(image_id, cluster_id)].

    Tolerates duplicate/self edges.  Returns only nodes that appear in some
    proper edge (singletons label themselves implicitly; callers union them
    back).

    The edge set is materialized ONCE at entry — the iterative algorithm
    re-consumes it, and a lazy dataset would re-execute the entire upstream
    decode/LSH/verify lineage on every consumption.  The edge table is
    pairs-only (two string columns), orders of magnitude smaller than the
    input corpus, and lives in the object store with spill — safe at any
    scale.
    """
    cfg = cfg or PipelineConfig()
    debug = bool(os.environ.get("DEDUP_CC_DEBUG"))

    E = edges.materialize()
    n = E.count()
    if n == 0:
        return rd.from_arrow(pa.Table.from_pydict(
            {"image_id": [], "cluster_id": []}, schema=_ASSIGN_SCHEMA))
    if n <= cfg.cc_driver_edge_cap:
        # local base case (paper's final step) applied at round 0: the edge
        # set already fits the driver memory bound (2M edges ≈ 200 MB), so
        # one union-find replaces the shuffle rounds.
        return _driver_assignment(*_fetch_edges(E))

    # shuffle-free local contraction first: collapses co-located cliques /
    # duplicate streams per block (measured 5.6M → ~1M edges on the 465k-
    # image corpus) so the global rounds — or the base case — see a far
    # smaller graph
    E = E.map_batches(_local_contract, batch_format="pyarrow").materialize()
    n = E.count()
    if debug:
        print(f"[cc] local contraction: {n} edges", file=sys.stderr, flush=True)
    if n <= cfg.cc_driver_edge_cap:
        return _driver_assignment(*_fetch_edges(E))

    # scale the shuffle width to the live edge count so small residual
    # graphs don't pay fixed per-partition task overhead
    num_parts = int(min(num_partitions, max(2, n // 25_000 + 1)))

    prev_n: int | None = None
    prev_sum: int | None = None
    for rnd in range(cfg.cc_max_rounds):
        t0 = _time.time()
        E = _star_half(E, num_parts, large=True, materialize=False)
        E = _star_half(E, num_parts, large=False)
        n = E.count()
        if debug:
            print(f"[cc] round {rnd}: {n} edges ({_time.time() - t0:.1f}s)",
                  file=sys.stderr, flush=True)
        if n == 0:
            return rd.from_arrow(pa.Table.from_pydict(
                {"image_id": [], "cluster_id": []}, schema=_ASSIGN_SCHEMA))
        if n <= cfg.cc_driver_edge_cap:
            return _driver_assignment(*_fetch_edges(E))
        # count inequality alone disproves the fixpoint — the checksum
        # pass (a full extra scan) only runs on equal counts
        # (review-found: it ran every shrinking round for nothing)
        if n == prev_n:
            cur_sum = _edge_checksum(E)
            if cur_sum == prev_sum:
                break  # star fixpoint: every edge is (member, comp_min)
            prev_sum = cur_sum
        else:
            prev_n = n
            prev_sum = None
    else:
        raise RuntimeError(
            f"connected_components did not converge within {cfg.cc_max_rounds} "
            "rounds — raise cc_max_rounds or cc_driver_edge_cap"
        )

    # fixpoint edge set IS the assignment: (src → dst) ∪ (dst → dst)
    def to_assign(b: pa.Table) -> pa.Table:
        src = b["src"].to_pylist()
        dst = b["dst"].to_pylist()
        return pa.Table.from_pydict(
            {"image_id": src + dst, "cluster_id": dst + dst},
            schema=_ASSIGN_SCHEMA)

    return drop_duplicates(
        E.map_batches(to_assign, batch_format="pyarrow"),
        ["image_id"], num_parts,
    )
