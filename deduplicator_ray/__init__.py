"""deduplicator_ray — a Ray-Data-native duplicate/similar-image detection engine.

A from-scratch reimplementation of the capabilities of GiovanH/deduplicator
(reference at /root/reference, cited throughout as file:line) re-expressed as
ray.data.Dataset pipelines over Arrow tables of image+caption pairs:

    (image_id: string, bytes: binary, w: int32, h: int32,
     fmt: string, caption: string, phash: int64)

Layers:

- ``codecs``     — stdlib-only image encode/decode (raw/ppm/bmp/png)
- ``resize``     — PIL-compatible separable Lanczos-3 resampling (integer
                   fixed-point, needed for dHash parity with the reference's
                   ``imagehash.dhash`` — /root/reference/dupedb.py:85-86)
- ``hashing``    — dHash / pHash / md5 / crc32 / Hamming kernels
- ``fixtures``   — deterministic synthetic corpus generator (FIXTURES.md)
- ``oracle``     — single-process numpy oracle for golden tests
- ``stages``     — map_batches / groupby building blocks (decode+hash,
                   signatures, LSH banding, candidate gen, verify, connected
                   components, keeper resolve)
- ``pipelines``  — end-to-end wiring (image dedup, doc dedup, similarity)
- ``functions``  — text analysis + vector search kernels
- ``state``      — lineage manifests / resume, band-table actor variant
"""

from deduplicator_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
