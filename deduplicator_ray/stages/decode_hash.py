"""P1 — decode + fingerprint stage (the CPU-heavy map_batches transform).

Reimplements ``getProcHash`` + ``fingerprintImage``
(/root/reference/dupedb.py:68-101, 201-259) as a stateless Arrow-batch
transform: decode the ``bytes`` payload per ``fmt``, compute the dHash
fingerprint, byte md5/crc32, and the quality-tuple inputs
(pixels/filesize/frames), with the reference's error taxonomy folded into
``status``/``error`` dead-letter columns instead of a badfiles.txt sink
(dupedb.py:223-244 → S5).

Zero-copy notes: batches arrive as pyarrow Tables straight from the object
store; per-image byte payloads are materialized via ``as_py()`` only at the
decode boundary (unavoidable — decoding is per-image), everything else stays
vectorized numpy.  Decode cost dominates, so the stage is sized with a small
``batch_size`` (cfg.decode_batch_size) and runs as stateless tasks — no
warm state is needed (codec tables are module constants).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicator_ray import codecs, hashing
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.ranking import rank_columns

MAX_IMAGE_PIXELS = 160_000_000  # decompression-bomb guard (/root/reference/dupedb.py:33)


def make_decode_hash(cfg: PipelineConfig, with_rank_columns: bool = True):
    """Build the batch fn. hash_size=8 → dhash packed as int64; wider hashes
    (e.g. the reference default 12 → 36 hex chars) land in ``dhash_hex``."""
    hash_size = cfg.hash_size
    use_u64 = hash_size == 8
    if cfg.hash_fn not in ("dhash", "phash"):
        raise ValueError(f"unknown hash_fn {cfg.hash_fn!r} (dhash|phash)")
    bits_fn = (hashing.dhash_bits if cfg.hash_fn == "dhash"
               else hashing.phash_bits)

    def decode_hash(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch["image_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        # null w/h surface as NaN through the pandas-style conversion —
        # coerce to 0 so the bomb guard and pixel count stay integer
        ws = np.nan_to_num(
            batch["w"].to_numpy(zero_copy_only=False)).astype(np.int64)
        hs = np.nan_to_num(
            batch["h"].to_numpy(zero_copy_only=False)).astype(np.int64)
        fmts = batch["fmt"].to_pylist()

        dhash = np.zeros(n, np.int64)
        dhash_hex = [""] * n
        proc_hash = [""] * n
        md5s = [""] * n
        crc32s = [""] * n
        status = ["ok"] * n
        errors = [""] * n
        filesize = np.zeros(n, np.int64)
        pixels = np.zeros(n, np.int64)
        frames = np.ones(n, np.int32)

        for i in range(n):
            data = payloads[i]
            if data is None:
                # failed-download row on a web corpus: dead-letter it (the
                # reference never sees this case — its inputs are live
                # files — so 'error' status is the honest taxonomy slot)
                status[i] = "error"
                errors[i] = "NullPayload: bytes is null"
                continue
            filesize[i] = len(data)
            pixels[i] = int(ws[i]) * int(hs[i])
            md5s[i] = hashing.md5_hex(data)
            crc32s[i] = hashing.crc32_hex(data)
            try:
                if pixels[i] > MAX_IMAGE_PIXELS:
                    raise codecs.CodecError(f"decompression bomb: {pixels[i]} px")
                if fmts[i] in codecs.CONTAINER_FMTS:
                    # multi-frame container (video / animated stand-in):
                    # the frame count is real in BOTH modes (the quality
                    # tuple always counts frames, dedupc.py:62-68); the
                    # FINGERPRINT is mode-dependent — strict animations/
                    # videos only byte-match (md5, dupedb.py:82-90),
                    # non-strict takes dHash of the first decoded frame
                    # (dupedb.py:85-86, 92-98).  A single-frame container
                    # is not an animation: dHash in both modes
                    # (framesInImage > 1 gate, dupedb.py:82).
                    img, nf = codecs.decode_container_first(data, fmts[i])
                    frames[i] = nf
                    if (ws[i] or hs[i]) and (img.shape[0] != hs[i]
                                             or img.shape[1] != ws[i]):
                        raise codecs.CodecError(
                            f"decoded frame dims {img.shape[1]}x"
                            f"{img.shape[0]} != declared {ws[i]}x{hs[i]}")
                    # strict gate mirrors the reference's class split:
                    # isVideo (vcon = mp4/webm stand-in) → md5 for EVERY
                    # video regardless of frame count (dupedb.py:88-90);
                    # animated images (gif) only byte-match when actually
                    # animated (framesInImage > 1, dupedb.py:82)
                    if cfg.strict and (fmts[i] == "vcon" or nf > 1):
                        status[i] = "md5_only"
                        errors[i] = ("strict_media: video container"
                                     if fmts[i] == "vcon"
                                     else "strict_media: multi-frame container")
                        proc_hash[i] = md5s[i]
                        continue
                else:
                    if fmts[i] in ("mp4", "webm"):
                        # REAL container metadata for actual mp4/webm
                        # files (BMFF box walk / Matroska EBML walk — no
                        # codec payload decode): the quality tuple's
                        # frames signal is real even though the
                        # fingerprint stays the md5 stub path below
                        # (decode_image raises for both).  A payload
                        # that is not well-formed keeps frames=1 —
                        # random-byte fixtures are unchanged.
                        meta_fn = (codecs.parse_mp4_meta
                                   if fmts[i] == "mp4"
                                   else codecs.parse_webm_meta)
                        try:
                            frames[i] = meta_fn(data)[0]
                        except codecs.CodecError:
                            pass
                    img = codecs.decode_image(data, fmts[i], int(ws[i]), int(hs[i]))
                bits = bits_fn(img, hash_size)
                if use_u64:
                    u = hashing.pack_bits_u64(bits)
                    dhash[i] = hashing.u64_to_i64(u)
                    dhash_hex[i] = format(u, "016x")
                else:
                    dhash_hex[i] = hashing.bits_to_hex(bits)
                    dhash[i] = 0
                proc_hash[i] = dhash_hex[i]
            except codecs.UnsupportedFormatError as e:
                # stub boundary for jpg/video/audio payloads, policy-gated
                # (codecs.CODEC_CAPABILITIES): 'md5' = byte-content
                # identity in the SAME proc_hash keyspace as the dHash hex
                # — exactly how getProcHash merges both into one
                # hash→paths index (/root/reference/dupedb.py:68-101), so
                # byte-identical media dedup alongside images;
                # 'dead_letter' = badfiles row with error=unsupported_codec
                # so nothing silently md5-matches what should have been
                # perceptually hashed (dupedb.py:223-244 taxonomy)
                if cfg.unsupported_codec_policy == "dead_letter":
                    status[i] = "error"
                    errors[i] = f"unsupported_codec: {e}"
                else:
                    status[i] = "md5_only"
                    errors[i] = str(e)
                    proc_hash[i] = md5s[i]
            except codecs.CodecError as e:
                status[i] = "error"
                errors[i] = f"{type(e).__name__}: {e}"
            except MemoryError:
                status[i] = "error"
                errors[i] = "MemoryError"

        out = batch.drop_columns(["bytes"])  # payload not needed downstream
        out = out.append_column("dhash", pa.array(dhash, pa.int64()))
        out = out.append_column("dhash_hex", pa.array(dhash_hex, pa.string()))
        out = out.append_column("proc_hash", pa.array(proc_hash, pa.string()))
        out = out.append_column("content_md5", pa.array(md5s, pa.string()))
        out = out.append_column("crc32", pa.array(crc32s, pa.string()))
        out = out.append_column("pixels", pa.array(pixels, pa.int64()))
        out = out.append_column("filesize", pa.array(filesize, pa.int64()))
        out = out.append_column("frames", pa.array(frames, pa.int32()))
        out = out.append_column("status", pa.array(status, pa.string()))
        out = out.append_column("error", pa.array(errors, pa.string()))
        if with_rank_columns:
            rk = rank_columns(
                np.array(ids, dtype=object),
                frames,
                pixels,
                filesize,
                cfg.good_words, cfg.bad_words, cfg.good_names, cfg.bad_names,
            )
            for name, arr in rk.items():
                out = out.append_column(name, pa.array(arr))
        return out

    return decode_hash
