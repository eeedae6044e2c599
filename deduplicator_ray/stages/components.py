"""P6 — distributed connected components over verified edges.

Iterative hash-partitioned min-label propagation (the groupby-only
formulation of union-find edge contraction; cf. the MapReduce CC family —
Rastogi et al., "Finding Connected Components in Map-Reduce", ICDE 2013 —
public literature).  No driver-side union-find: every round is two
``groupby`` shuffles over (node, label) rows, so the algorithm scales with
the edge set, not with driver memory.

- node ids are the ``image_id`` strings themselves; labels are
  lexicographic-min member ids (stable, collision-free — no 64-bit id
  assignment needed, SURVEY.md §7.4.4);
- round: each node sends its current label to every neighbor, then takes the
  min of everything it received plus its own label (monotone decreasing ⇒
  convergent; rounds = O(graph diameter), and duplicate-cluster graphs are
  near-cliques with tiny diameter);
- convergence detection: a 64-bit checksum of the (node,label) assignment,
  computed as an aggregate — labels are monotone, so an unchanged checksum
  means a fixpoint.  Bounded by cfg.cc_max_rounds.

The per-round assignment table is materialized: it is O(#nodes-in-dup-
clusters), a small fraction of the corpus, and materializing prevents
re-execution of prior rounds through lazy lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min, Sum

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions.text import hash_strings_u64


def _checksum(assign: rd.Dataset) -> int:
    """Order-independent 64-bit checksum of the (node, label) assignment.

    One partial (mod-2^64 wrapped) sum row per batch; the handful of partials
    is reduced driver-side with Python big-int arithmetic — no int64-overflow
    hazard in the distributed aggregate even at 10^12 rows.
    """

    def h(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_pylist()
        label = batch["label"].to_pylist()
        hv = hash_strings_u64([f"{n}\x00{l}" for n, l in zip(node, label)])
        with np.errstate(over="ignore"):
            s = int(hv.sum(dtype=np.uint64))  # wraps mod 2^64
        return pa.Table.from_pydict({"h": [s - (1 << 63)]})  # recenter into int64

    parts = assign.map_batches(h, batch_format="pyarrow").take_all()
    return sum(p["h"] for p in parts) % (1 << 64)


def connected_components(edges: rd.Dataset, cfg: PipelineConfig | None = None) -> rd.Dataset:
    """edges: Dataset[(src: string, dst: string)] → Dataset[(image_id, cluster_id)].

    Only nodes that appear in an edge are returned (singletons keep their own
    id implicitly; callers union them back if needed).
    """
    cfg = cfg or PipelineConfig()

    # symmetric neighbor list rows: (node, other)
    def symmetrize(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_pylist()
        dst = batch["dst"].to_pylist()
        return pa.Table.from_pydict(
            {"node": src + dst, "other": dst + src},
            schema=pa.schema([("node", pa.string()), ("other", pa.string())]),
        )

    nbrs = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # initial labels: min(node, min neighbor) — one free propagation round
    def init_label(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": batch["node"].to_pylist(), "label": batch["other"].to_pylist()}
        )

    assign = (
        nbrs.map_batches(init_label, batch_format="pyarrow")
        .union(nbrs.map_batches(
            lambda b: pa.Table.from_pydict(
                {"node": b["node"].to_pylist(), "label": b["node"].to_pylist()}
            ),
            batch_format="pyarrow",
        ))
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    prev_sum = _checksum(assign)
    rounds = 0
    for rounds in range(1, cfg.cc_max_rounds + 1):
        # join labels to neighbor lists: tag-union + groupby(node)
        lab = assign.map_batches(
            lambda b: pa.Table.from_pydict(
                {"node": b["node"].to_pylist(), "label": b["label"].to_pylist(),
                 "other": [""] * b.num_rows}
            ),
            batch_format="pyarrow",
        )
        nb = nbrs.map_batches(
            lambda b: pa.Table.from_pydict(
                {"node": b["node"].to_pylist(), "label": [""] * b.num_rows,
                 "other": b["other"].to_pylist()}
            ),
            batch_format="pyarrow",
        )

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lbls = g.loc[g["label"] != "", "label"]
            node = g["node"].iloc[0]
            cur = min(lbls.min(), node) if len(lbls) else node
            targets = [o for o in g.loc[g["other"] != "", "other"].tolist()]
            targets.append(node)
            return pd.DataFrame({"node": targets, "label": [cur] * len(targets)})

        assign = (
            lab.union(nb)
            .groupby("node")
            .map_groups(propagate, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = _checksum(assign)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return assign.map_batches(
        lambda b: pa.Table.from_pydict(
            {"image_id": b["node"].to_pylist(), "cluster_id": b["label"].to_pylist()}
        ),
        batch_format="pyarrow",
    )
