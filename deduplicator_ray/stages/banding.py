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
- **md5 channel** (band 99): strict-mode media (``status == 'md5_only'`` —
  animations/videos/other files, /root/reference/dupedb.py:82-101) get ONE
  band row keyed by the first 64 bits of their content md5; the full md5 hex
  rides in the verify-payload column so the verify step is byte-exact.
  Decodable rows never enter this band (the reference keys them by dHash
  only).
- **caption channel** (bands 100+): classic MinHash LSH — the signature is
  cut into ``cfg.bands`` bands of ``cfg.rows_per_band`` rows; each band is
  collapsed to one 64-bit key.  Caption text rides along so the verify step
  can compute *exact* character-shingle Jaccard on candidates.

The ``caption`` column doubles as the per-channel verify payload: caption
text on caption bands, md5 hex on the md5 band, '' on image bands.

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

MD5_BAND = 99
CAP_BAND_OFFSET = 100


def _md5_key64(md5_hex: str) -> int:
    """First 64 bits of the md5 as int64 (bucket key only — the verify step
    compares the FULL hex, so a 64-bit collision costs a comparison, never a
    false edge)."""
    u = int(md5_hex[:16] or "0", 16)
    return u - (1 << 64) if u >= (1 << 63) else u


def make_banding(cfg: PipelineConfig, channels: tuple[str, ...] = ("img", "cap")):
    if "img" in channels and cfg.hamming_max > len(_IMG_SLICES) - 1:
        raise ValueError(
            f"hamming_max={cfg.hamming_max} exceeds the pigeonhole capacity "
            f"of {len(_IMG_SLICES)} dHash slices (max {len(_IMG_SLICES) - 1}); "
            "banding would silently miss pairs")

    def banding(batch: pa.Table) -> pa.Table:
        ids_all = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        dh_all = batch["dhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        if "status" in batch.column_names:
            ok_mask = np.asarray(batch["status"].to_pylist(), dtype=object) == "ok"
        else:
            ok_mask = np.ones(len(ids_all), bool)

        bands_out: list[np.ndarray] = []
        keys_out: list[np.ndarray] = []
        ids_out: list[list] = []
        dh_out: list[np.ndarray] = []
        cap_out: list[list] = []

        if "img" in channels:
            # decodable rows only: md5_only rows all carry dhash=0 and would
            # collapse into one mega-bucket per slice
            ids = ids_all[ok_mask].tolist()
            dh = dh_all[ok_mask]
            n = len(ids)
            for bi, (start, width) in enumerate(_IMG_SLICES):
                key = ((dh >> np.uint64(start)) & np.uint64((1 << width) - 1)).view(np.int64)
                bands_out.append(np.full(n, bi, np.int32))
                keys_out.append(key)
                ids_out.append(ids)
                dh_out.append(dh.view(np.int64))
                cap_out.append([""] * n)
            if not ok_mask.all() and "content_md5" in batch.column_names:
                md5s = [m for m, ok in
                        zip(batch["content_md5"].to_pylist(), ok_mask) if not ok]
                m_ids = ids_all[~ok_mask].tolist()
                m = len(m_ids)
                bands_out.append(np.full(m, MD5_BAND, np.int32))
                keys_out.append(np.fromiter((_md5_key64(x) for x in md5s),
                                            np.int64, count=m))
                ids_out.append(m_ids)
                dh_out.append(np.zeros(m, np.int64))
                cap_out.append(md5s)

        if "cap" in channels:
            n = len(ids_all)
            caps = batch["caption"].to_pylist()
            sigs = minhash_from_column(batch)
            bkeys = textfn.band_keys(sigs, cfg.bands, cfg.rows_per_band)  # (n, bands) i64
            for bi in range(cfg.bands):
                bands_out.append(np.full(n, CAP_BAND_OFFSET + bi, np.int32))
                keys_out.append(bkeys[:, bi].copy())
                ids_out.append(ids_all.tolist())
                dh_out.append(dh_all.view(np.int64))
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
