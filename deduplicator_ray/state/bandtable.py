"""BandTable actor index — the stateful actor-pool variant of LSH candidate
generation (SURVEY.md §7.2 / north-star "actor-pool stages hold LSH band
tables").

The default batch path is the pure-shuffle formulation
(banding → partitioned groupby → verify): simpler, resumable, and
skew-controllable.  This module provides the complementary *incremental /
streaming* shape: a sharded in-memory band index held by a pool of Ray
actors, supporting online ``add`` and ``query`` without re-shuffling the
corpus — the generalization of the reference's always-open hash→paths dict
(/root/reference/dupedb.py:104-132) to a distributed mutable index.

Sharding is BY BAND KEY (deterministic hash routing), so every band bucket
lives on exactly one actor and candidate generation is exact — each query
fans out to all shards and unions the results.
"""

from __future__ import annotations

import zlib

import numpy as np

import ray

from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.stages.banding import _IMG_SLICES, CAP_BAND_OFFSET


@ray.remote
class BandShardActor:
    """One shard of the band index: dict[(band, key) → list[image_id]]."""

    def __init__(self):
        self.table: dict[tuple[int, int], list[str]] = {}

    def add(self, rows: list[tuple[int, int, str]]) -> int:
        for band, key, image_id in rows:
            self.table.setdefault((band, key), []).append(image_id)
        return len(rows)

    def query(self, probes: list[tuple[int, int]]) -> list[str]:
        out: list[str] = []
        for band, key in probes:
            out.extend(self.table.get((band, key), ()))
        return out

    def stats(self) -> dict:
        sizes = [len(v) for v in self.table.values()]
        return {
            "n_buckets": len(self.table),
            "n_entries": int(sum(sizes)),
            "max_bucket": int(max(sizes, default=0)),
        }


def _band_rows_for(image_id: str, dhash_u64: int, caption: str,
                   cfg: PipelineConfig) -> list[tuple[int, int, str]]:
    rows = []
    # fingerprint tables carry dhash as SIGNED int64 — mask to the u64
    # keyspace here so callers can pass them verbatim (np.uint64(-x) is
    # a DeprecationWarning on numpy 1.x and an OverflowError on 2.x)
    dh = np.uint64(int(dhash_u64) & (2**64 - 1))
    for bi, (start, width) in enumerate(_IMG_SLICES):
        key = int((dh >> np.uint64(start)) & np.uint64((1 << width) - 1))
        rows.append((bi, key, image_id))
    if caption:
        sig = textfn.minhash_signature(caption, cfg.shingle_k, cfg.num_perm)
        bkeys = textfn.band_keys(sig[None, :], cfg.bands, cfg.rows_per_band)[0]
        for bi in range(cfg.bands):
            rows.append((CAP_BAND_OFFSET + bi, int(bkeys[bi]), image_id))
    return rows


class BandIndex:
    """Driver-side handle over a pool of BandShardActor shards.

    Serves the img (dHash slice) + cap (MinHash band) channels only: rows
    with no decodable hash (strict-mode md5 media) belong to the exact
    md5 band of the batch path (stages/banding.MD5_BAND) — don't feed them
    here with dhash=0 or they all collide in the zero slices."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG, num_shards: int = 4):
        if cfg.hash_size != 8:
            # the slicing here reads the int64 dhash, which is a 0
            # sentinel for wide hashes (make_banding has the wide branch;
            # this actor-pool index does not) — fail loudly instead of
            # banding every record into one key-0 mega-bucket
            raise ValueError(
                "BandIndex slices the 64-bit dhash (hash_size=8); wide "
                f"hashes (hash_size={cfg.hash_size}) must use the "
                "make_banding batch path")
        self.cfg = cfg
        self.num_shards = num_shards
        self.shards = [BandShardActor.remote() for _ in range(num_shards)]

    def _route(self, band: int, key: int) -> int:
        return zlib.crc32(f"{band}:{key}".encode()) % self.num_shards

    def add_record(self, image_id: str, dhash_u64: int, caption: str = "") -> None:
        self.add_batch([(image_id, dhash_u64, caption)])

    def add_batch(self, records: list[tuple[str, int, str]]) -> None:
        per_shard: list[list] = [[] for _ in range(self.num_shards)]
        for image_id, dh, cap in records:
            for row in _band_rows_for(image_id, dh, cap, self.cfg):
                per_shard[self._route(row[0], row[1])].append(row)
        ray.get([
            self.shards[i].add.remote(rows)
            for i, rows in enumerate(per_shard) if rows
        ])

    def candidates(self, dhash_u64: int, caption: str = "",
                   exclude: str | None = None) -> set[str]:
        """All ids sharing ≥1 band bucket with the probe (unverified)."""
        probes_per_shard: list[list] = [[] for _ in range(self.num_shards)]
        for band, key, _ in _band_rows_for("?", dhash_u64, caption, self.cfg):
            probes_per_shard[self._route(band, key)].append((band, key))
        results = ray.get([
            self.shards[i].query.remote(pr)
            for i, pr in enumerate(probes_per_shard) if pr
        ])
        out = {x for chunk in results for x in chunk}
        out.discard(exclude)
        return out

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])
