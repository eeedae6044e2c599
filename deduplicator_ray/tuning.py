"""DataContext tuning applied at pipeline entry.

Ray Data's defaults target multi-node clusters with large inputs; two hurt
badly at our block sizes and were measured on the sf0.1 corpus (58k rows):

- ``read_op_min_num_blocks`` defaults to 200, so a 350 MB parquet read is
  split into 200+ tiny blocks and every downstream sort/groupby pays
  per-block fixed cost (measured: extended dedup 110 s → 15 s at 32 cpus
  after setting it to 2×cores).
- sort-based shuffle sampling cost scales with block count, not bytes.
- operator resource reservation (``op_resource_reservation_enabled``)
  starves a heavy fused map feeding an AllToAll sort: on the 18 GB sfimg
  corpus at 8 cpus the decode→signatures→banding operator held only ~3 of
  8 cores busy (699 core-s stretched over 238 s wall); disabling the
  reservation ran the identical pipeline in 91 s at 8 cpus and 40 s at 32
  (measured, round 2).  The sort is a materializing barrier anyway — there
  is no pipelined consumer to reserve cores for, and memory backpressure
  still applies through the object store.

``tune()`` is idempotent and safe to call from every pipeline entry point —
it only narrows the block floor on small sessions; on a real multi-node
cluster with hundreds of cores the formula reproduces Ray's default.
"""

from __future__ import annotations

import logging
import os

import ray


class _EmptyBundleSchemaFilter(logging.Filter):
    """Drop ONLY the ``new schema: .`` variant of the executor's
    schema-drift warning.

    An all-to-all shuffle (Sort / Aggregate / hash repartition) whose
    sampled range or hash partition receives zero rows emits a schema-LESS
    empty block from inside Ray — no user code runs for an empty range, so
    it cannot be typed from a UDF (verified against grouped_data.py's
    ``_apply_udf_to_groups``, which never calls the UDF on an empty block).
    Every drift OUR stages could cause is already eliminated by typed empty
    tables (stages/partitioned.py ``out_schema``); what remains is this one
    Ray-internal artifact, matched exactly so that REAL schema drift
    (two non-empty differing schemas) still warns."""

    def filter(self, record: logging.LogRecord) -> bool:
        return "new schema: . This may lead" not in record.getMessage()


def tune() -> None:
    # DataContext.get_current() works BEFORE ray.init, and Ray 2.49's
    # read_api captures a copy of the context at dataset creation — so an
    # auto-init driver whose first call is a read would otherwise run the
    # whole first pipeline permanently untuned (the 200-block floor and
    # reservation pathologies this module exists to fix).  Only the
    # cluster-cores lookup needs a pre-init fallback.
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    try:
        if ray.is_initialized():
            cores = int(ray.cluster_resources().get("CPU", 8))
        else:
            cores = int(os.cpu_count() or 8)
    except Exception:
        cores = 8
    ctx.read_op_min_num_blocks = max(8, min(200, 2 * cores))
    ctx.op_resource_reservation_enabled = False

    log = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptyBundleSchemaFilter) for f in log.filters):
        log.addFilter(_EmptyBundleSchemaFilter())


def actor_pool_bounds(cap: int | None = None,
                      per_actor_gb: float | None = None) -> tuple[int, int]:
    """Autoscaling ``concurrency=(min, max)`` bounds for stateful
    decode/fingerprint actor pools, derived from the CLUSTER's CPU count
    instead of a hard-coded constant (a fixed (1, 8) cap bounds the
    decode stage at 8 actors on a 32-cpu node — and on a 256-node
    cluster leaves 99% of it idle).  ``min=1`` keeps tiny inputs from
    paying multi-actor startup; ``max`` tracks total cores so the pool
    can widen to the cluster whenever the stage is the bottleneck.

    ``per_actor_gb``: MEMORY-derived bound for stages whose in-flight
    batches are large (multi-MB media payloads × batch_size) — the pool
    is additionally capped at cluster-memory / per_actor_gb so N actors
    can never out-allocate the heap regardless of core count.  ``cap``
    remains an absolute override."""
    cores = 8
    mem_gb = None
    try:
        if ray.is_initialized():
            res = ray.cluster_resources()
            cores = int(res.get("CPU", 8))
            if res.get("memory"):
                mem_gb = float(res["memory"]) / (1 << 30)
        else:
            cores = int(os.cpu_count() or 8)
    except Exception:
        pass
    hi = max(2, cores)
    if per_actor_gb:
        if mem_gb is None:
            mem_gb = 4.0 * cores  # typical provisioning fallback
        hi = max(2, min(hi, int(mem_gb / per_actor_gb)))
    if cap is not None:
        hi = max(2, min(cap, hi))
    return (1, hi)
