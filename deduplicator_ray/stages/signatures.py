"""P2 — caption signature stage (MinHash + SimHash), actor pool.

Graft axis B: the reference has no caption analog; the north star mandates
MinHash over caption shingles + SimHash over caption tokens.  This is the
canonical *stateful* stage: permutation parameters are derived once per
actor in ``__init__`` (ST1/ST2 analog — SURVEY.md §2.3) and reused across
batches, so it is a callable class run with
``map_batches(CaptionSignatures, fn_constructor_kwargs=..., concurrency=N)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn


class CaptionSignatures:
    def __init__(self, cfg: PipelineConfig | None = None,
                 with_simhash: bool = False):
        self.cfg = cfg or PipelineConfig()
        # warm per-actor state: permutation parameters once per actor —
        # priming the module-level perm_params cache so __call__'s
        # minhash_batch never re-derives them (the attrs are the cache
        # handle, not a second copy)
        self.perm_a, self.perm_b = textfn.perm_params(self.cfg.num_perm)
        # the image banding channels read ONLY minhash; SimHash costs
        # ~0.2 s / 4096 captions in the P2 hot path (BASELINE.md), so it
        # is opt-in for the consumers that actually want the column
        self.with_simhash = with_simhash

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        caps = [str(c or "") for c in batch["caption"].to_pylist()]
        # segment-min batch MinHash: num_perm vectorized passes over the
        # batch's concatenated shingles, not one Python iteration per
        # caption (the P2 hot path at 10^12 rows — see functions/text.py)
        sigs = textfn.minhash_batch(caps, cfg.shingle_k, cfg.num_perm)
        minhash_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64)), cfg.num_perm
        )
        out = batch.append_column("minhash", minhash_col)
        if self.with_simhash:
            simhash = textfn.simhash_batch(caps)
            out = out.append_column("simhash", pa.array(simhash, pa.int64()))
        return out


def minhash_from_column(batch: pa.Table) -> np.ndarray:
    """(n, num_perm) uint64 view of the fixed-size-list minhash column."""
    col = batch["minhash"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    num_perm = col.type.list_size
    flat = col.values.to_numpy(zero_copy_only=False).view(np.uint64)
    return flat.reshape(-1, num_perm)
