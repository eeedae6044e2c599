"""P3 — LSH banding: explode each row into band rows for candidate generation.

Two channels share one band-row schema (band:int32, key:int64, image_id,
dhash:int64, caption:string):

- **image channel** (bands 0-4): the 64-bit dHash is split into 5 disjoint
  bit slices (13,13,13,13,12 bits).  By pigeonhole, any pair within Hamming
  distance ≤ 4 agrees exactly on at least one slice, so banding is
  *lossless* for the configured ``hamming_max=4`` verify radius.  This
  generalizes the reference's only similarity mechanism — exact equality of
  the full hash (/root/reference/dupedb.py:253-257) — which is recovered as
  the degenerate 1-band case.
- **caption channel** (bands 100+): classic MinHash LSH — the signature is
  cut into ``cfg.bands`` bands of ``cfg.rows_per_band`` rows; each band is
  collapsed to one 64-bit key.  Caption text rides along so the verify step
  can compute *exact* character-shingle Jaccard on candidates.

Output is ~21 small rows per input row; the heavy payload (bytes) was
dropped in P1, so the banding shuffle moves only keys + ids + captions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.stages.signatures import minhash_from_column

# dHash bit slices: 5 bands cover hamming_max=4 by pigeonhole
_IMG_SLICES = [(0, 13), (13, 13), (26, 13), (39, 13), (52, 12)]

BAND_SCHEMA = pa.schema(
    [
        ("band", pa.int32()),
        ("key", pa.int64()),
        ("image_id", pa.string()),
        ("dhash", pa.int64()),
        ("caption", pa.string()),
    ]
)

CAP_BAND_OFFSET = 100


def make_banding(cfg: PipelineConfig, channels: tuple[str, ...] = ("img", "cap")):
    def banding(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch["image_id"].to_pylist()
        dh = batch["dhash"].to_numpy(zero_copy_only=False).view(np.uint64)

        bands_out: list[np.ndarray] = []
        keys_out: list[np.ndarray] = []
        ids_out: list[list] = []
        dh_out: list[np.ndarray] = []
        cap_out: list[list] = []

        if "img" in channels:
            for bi, (start, width) in enumerate(_IMG_SLICES):
                key = ((dh >> np.uint64(start)) & np.uint64((1 << width) - 1)).view(np.int64)
                bands_out.append(np.full(n, bi, np.int32))
                keys_out.append(key)
                ids_out.append(ids)
                dh_out.append(dh.view(np.int64))
                cap_out.append([""] * n)

        if "cap" in channels:
            caps = batch["caption"].to_pylist()
            sigs = minhash_from_column(batch)
            bkeys = textfn.band_keys(sigs, cfg.bands, cfg.rows_per_band)  # (n, bands) i64
            for bi in range(cfg.bands):
                bands_out.append(np.full(n, CAP_BAND_OFFSET + bi, np.int32))
                keys_out.append(bkeys[:, bi].copy())
                ids_out.append(ids)
                dh_out.append(dh.view(np.int64))
                cap_out.append(caps)

        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(bands_out), pa.int32()),
                pa.array(np.concatenate(keys_out), pa.int64()),
                pa.array([i for chunk in ids_out for i in chunk], pa.string()),
                pa.array(np.concatenate(dh_out), pa.int64()),
                pa.array([c for chunk in cap_out for c in chunk], pa.string()),
            ],
            schema=BAND_SCHEMA,
        )

    return banding
