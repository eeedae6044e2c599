"""P6 — distributed connected components via iterative edge contraction.

The north-rule algorithm ("distributed union-find — iterative
hash-partitioned edge contraction"; cf. the MapReduce CC family, Rastogi et
al. ICDE 2013, and the two-phase contraction scheme of Kiveris et al.
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature).  Plain min-label propagation converges in O(diameter) rounds,
which is unbounded for chain-shaped near-dup components (measured: a
caption-chained component at sf0.01 was still widening its wavefront after
16 rounds).  Contraction instead shrinks the *graph* geometrically:

  level k:
    A_k(v)   = min(v, N(v))                 # one partitioned min-reduce
    E_{k+1}  = {(A_k(u), A_k(v)) : (u,v) ∈ E_k, A_k(u) ≠ A_k(v)}
               deduplicated                  # two partitioned merges + dedup
  stop when E is empty (forest fully contracted) or ≤ cc_driver_edge_cap,
  in which case the residual graph is collapsed with a driver-side
  union-find (bounded memory by the cap — the geometric shrink makes the
  residual tiny after 2-3 levels at any input scale);
  then labels are composed back down: root(v) = R(A_1(A_2(...A_k(v)))),
  one partitioned merge per level.

Every shuffle is a partition-vectorized groupby (stages/partitioned.py) —
no per-group Python, no join actors.  Node ids are the ``image_id`` strings
themselves; cluster labels are the lexicographic-min member id (stable and
collision-free — no integer id assignment, SURVEY.md §7.4.4).
"""

from __future__ import annotations

import os
import sys
import time as _time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions.text import hash_strings_u64
from deduplicator_ray.stages.partitioned import (
    drop_duplicates,
    partitioned_groupby,
    partitioned_merge_str,
)


def _checksum(assign: rd.Dataset) -> int:
    """Order-independent 64-bit checksum of a (node, label) assignment —
    per-batch mod-2^64 partials reduced driver-side with Python big-ints
    (no int64-overflow hazard at any scale).  Used by tests and manifests."""

    def h(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_pylist()
        label = batch["label"].to_pylist()
        hv = hash_strings_u64([f"{n}\x00{l}" for n, l in zip(node, label)])
        with np.errstate(over="ignore"):
            s = int(hv.sum(dtype=np.uint64))
        return pa.Table.from_pydict({"h": [s - (1 << 63)]})

    parts = assign.map_batches(h, batch_format="pyarrow").take_all()
    return sum(p["h"] for p in parts) % (1 << 64)


def _min_label(edges: rd.Dataset, num_parts: int) -> rd.Dataset:
    """A(v) = min(v, neighbors) over symmetrized edges — (node, label)."""

    def pairs(b: pa.Table) -> pa.Table:
        src = b["src"].to_pylist()
        dst = b["dst"].to_pylist()
        return pa.Table.from_pydict(
            {"node": src + dst + src, "label": dst + src + src},
            schema=pa.schema([("node", pa.string()), ("label", pa.string())]),
        )

    def minred(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    return (
        partitioned_groupby(edges.map_batches(pairs, batch_format="pyarrow"),
                            ["node"], minred, num_parts)
        .repartition(num_parts)
        .materialize()
    )


def _relabel(edges: rd.Dataset, assign: rd.Dataset, num_parts: int) -> rd.Dataset:
    """E' = {(ℓ(src), ℓ(dst)) : ℓ(src) ≠ ℓ(dst)}, deduplicated + canonical
    (src < dst)."""
    j1 = partitioned_merge_str(
        edges, assign.map_batches(
            lambda b: pa.Table.from_pydict({"node": b["node"], "lsrc": b["label"]}),
            batch_format="pyarrow"),
        ["src", "dst"], ["node", "lsrc"], "src", "node", "inner", num_parts,
    ).map_batches(
        lambda b: pa.Table.from_pydict({"dst": b["dst"], "lsrc": b["lsrc"]}),
        batch_format="pyarrow",
    )
    j2 = partitioned_merge_str(
        j1, assign.map_batches(
            lambda b: pa.Table.from_pydict({"node": b["node"], "ldst": b["label"]}),
            batch_format="pyarrow"),
        ["dst", "lsrc"], ["node", "ldst"], "dst", "node", "inner", num_parts,
    )

    def canon(b: pa.Table) -> pa.Table:
        a = np.asarray(b["lsrc"].to_pylist(), dtype=object)
        c = np.asarray(b["ldst"].to_pylist(), dtype=object)
        keep = a != c
        a, c = a[keep], c[keep]
        lo = np.where(a < c, a, c)
        hi = np.where(a < c, c, a)
        return pa.Table.from_pydict(
            {"src": lo.tolist(), "dst": hi.tolist()},
            schema=pa.schema([("src", pa.string()), ("dst", pa.string())]),
        )

    return drop_duplicates(
        j2.map_batches(canon, batch_format="pyarrow"), ["src", "dst"], num_parts
    ).repartition(num_parts).materialize()


def _driver_union_find(edge_rows: list[dict]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for e in edge_rows:
        ra, rb = find(e["src"]), find(e["dst"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def connected_components(
    edges: rd.Dataset,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """edges: Dataset[(src: string, dst: string)] → Dataset[(image_id, cluster_id)].

    Tolerates duplicate/self edges.  Returns only nodes that appear in some
    edge (singletons label themselves implicitly; callers union them back)."""
    cfg = cfg or PipelineConfig()
    debug = bool(os.environ.get("DEDUP_CC_DEBUG"))

    levels: list[rd.Dataset] = []
    E = edges
    root_map: dict[str, str] = {}
    for level in range(cfg.cc_max_rounds):
        t0 = _time.time()
        A = _min_label(E, num_partitions)
        levels.append(A)
        E = _relabel(E, A, num_partitions)
        n_edges = E.count()
        if debug:
            print(f"[cc] level {level}: {n_edges} contracted edges "
                  f"({_time.time() - t0:.1f}s)", file=sys.stderr, flush=True)
        if n_edges == 0:
            break
        if n_edges <= cfg.cc_driver_edge_cap:
            root_map = _driver_union_find(E.take_all())
            break
    else:
        raise RuntimeError(
            f"connected_components did not contract within {cfg.cc_max_rounds} "
            "levels — raise cc_max_rounds or cc_driver_edge_cap"
        )

    # compose labels downward: root(v) = R(A_k(...A_1(v)))
    # R as a dataset over the top level's label space
    if root_map:
        R = rd.from_arrow(pa.Table.from_pydict(
            {"rnode": list(root_map), "root": list(root_map.values())},
            schema=pa.schema([("rnode", pa.string()), ("root", pa.string())]),
        ))
    else:
        R = None

    # walk levels top-down, rewriting each level's labels to final roots
    assign = levels[-1]
    if R is not None:
        assign = partitioned_merge_str(
            assign, R, ["node", "label"], ["rnode", "root"],
            "label", "rnode", "left", num_partitions,
        ).map_batches(_fill_root, batch_format="pandas")
    for A in reversed(levels[:-1]):
        assign = partitioned_merge_str(
            A, assign.map_batches(
                lambda b: pa.Table.from_pydict({"unode": b["node"], "root": b["label"]}),
                batch_format="pyarrow"),
            ["node", "label"], ["unode", "root"],
            "label", "unode", "left", num_partitions,
        ).map_batches(_fill_root, batch_format="pandas")

    return assign.map_batches(
        lambda b: pa.Table.from_pydict(
            {"image_id": b["node"], "cluster_id": b["label"]}
        ),
        batch_format="pyarrow",
    )


def _fill_root(df: pd.DataFrame) -> pd.DataFrame:
    """After a left merge of (node,label) with an upper-level root map,
    label := root where found, else keep label (it was already a root)."""
    root = df["root"] if "root" in df else pd.Series([None] * len(df))
    lab = df["label"].where(root.isna() | (root == ""), root)
    return pd.DataFrame({"node": df["node"], "label": lab})
