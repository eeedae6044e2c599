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
import pyarrow.compute as pc

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.stages.signatures import minhash_from_column

# dHash bit slices: 5 bands cover hamming_max=4 by pigeonhole
_IMG_SLICES = [(0, 13), (13, 13), (26, 13), (39, 13), (52, 12)]


def img_slices(nbits: int) -> list[tuple[int, int]]:
    """5 disjoint covering bit slices of an nbits-wide perceptual hash —
    pigeonhole-lossless for Hamming ≤ 4 at ANY width (the reference's
    default --hashsize is 12 → 144 bits, /root/reference/dedupc.py:586).

    64-bit keeps the committed LSB-based layout; wide hashes slice the
    MSB-first bit matrix (see ``wide_hash_bits``) into near-equal runs.
    Each slice must fit an int64 band key → nbits ≤ 315 (hash_size ≤ 17)."""
    if nbits == 64:
        return _IMG_SLICES
    n_slices = len(_IMG_SLICES)
    base, extra = divmod(nbits, n_slices)
    if base + 1 > 63:
        raise ValueError(
            f"{nbits}-bit hash: slice width {base + 1} exceeds the int64 "
            "band key (hash_size > 17 unsupported)")
    out, start = [], 0
    for i in range(n_slices):
        w = base + (1 if i < extra else 0)
        out.append((start, w))
        start += w
    return out


def wide_hash_bits(hexes: list[str], nbits: int) -> np.ndarray:
    """(n, nbits) uint8 bit matrix, MSB-first, from fixed-width hex strings
    (``hashing.bits_to_hex`` output).  Vectorized: one bytes.fromhex over
    the concatenated batch + one unpackbits."""
    n = len(hexes)
    if n == 0:
        return np.zeros((0, nbits), np.uint8)
    width = len(hexes[0])
    pad = width % 2  # odd hex width (e.g. 81 bits → 21 chars) → byte-align
    blob = bytes.fromhex("".join(("0" + h if pad else h) for h in hexes))
    u8 = np.frombuffer(blob, np.uint8).reshape(n, (width + pad) // 2)
    return np.unpackbits(u8, axis=1)[:, -nbits:]


def wide_slice_keys(bits: np.ndarray, slices: list[tuple[int, int]]) -> np.ndarray:
    """(n, n_slices) int64 band keys from an MSB-first bit matrix."""
    n = bits.shape[0]
    keys = np.zeros((n, len(slices)), np.int64)
    for i, (start, w) in enumerate(slices):
        pw = (1 << np.arange(w - 1, -1, -1, dtype=np.uint64))
        keys[:, i] = (bits[:, start:start + w].astype(np.uint64) @ pw).view(np.int64)
    return keys

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
    from deduplicator_ray.hashing import u64_to_i64

    return u64_to_i64(int(md5_hex[:16] or "0", 16))


def make_banding(cfg: PipelineConfig, channels: tuple[str, ...] = ("img", "cap")):
    if "img" in channels and cfg.hamming_max > len(_IMG_SLICES) - 1:
        raise ValueError(
            f"hamming_max={cfg.hamming_max} exceeds the pigeonhole capacity "
            f"of {len(_IMG_SLICES)} dHash slices (max {len(_IMG_SLICES) - 1}); "
            "banding would silently miss pairs")

    def banding(batch: pa.Table) -> pa.Table:
        ids_all = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        # fill_null BEFORE numpy conversion: a nullable int64 block
        # converts via float64, and .view(np.uint64) would reinterpret the
        # FLOAT bit patterns as hashes (garbage keys; two null rows would
        # verify Hamming-0 against each other) — the _hash_cols hazard
        dh_all = (pc.fill_null(batch["dhash"], 0)
                  .to_numpy(zero_copy_only=False).view(np.uint64))
        if "status" in batch.column_names:
            ok_mask = np.asarray(batch["status"].to_pylist(), dtype=object) == "ok"
        else:
            ok_mask = np.ones(len(ids_all), bool)

        bands_out: list[np.ndarray] = []
        keys_out: list[np.ndarray] = []
        ids_out: list[list] = []
        dh_out: list[np.ndarray] = []
        cap_out: list[list] = []

        wide_nbits = 0 if cfg.hash_size == 8 else cfg.hash_size * cfg.hash_size
        if "img" in channels and not wide_nbits:
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
        elif "img" in channels:
            # WIDE hash (hash_size != 8): the int64 dhash column is a 0
            # sentinel, so slice the hex fingerprint instead and ship the
            # hex as the verify payload (same pattern as the md5 band) —
            # without this branch every wide row would land in one
            # key-0 mega-bucket and Hamming(0,0)=0 would link the corpus.
            ids = ids_all[ok_mask].tolist()
            hexes = [h for h, ok in
                     zip(batch["dhash_hex"].to_pylist(), ok_mask) if ok]
            n = len(ids)
            bits = wide_hash_bits(hexes, wide_nbits)
            keys = wide_slice_keys(bits, img_slices(wide_nbits))
            zeros = np.zeros(n, np.int64)
            for bi in range(keys.shape[1]):
                bands_out.append(np.full(n, bi, np.int32))
                keys_out.append(keys[:, bi].copy())
                ids_out.append(ids)
                dh_out.append(zeros)
                cap_out.append(hexes)
        if "img" in channels:
            # md5 band: STRICT-MODE media only (status == "md5_only").  A
            # plain not-ok mask would also scoop status == "error"
            # quarantine rows, whose content_md5 is '' — every failed
            # download in a bucket would share key 0 AND the '' verify
            # payload, welding them into one bogus byte-identical cluster
            if "status" in batch.column_names:
                md5_mask = (np.asarray(batch["status"].to_pylist(),
                                       dtype=object) == "md5_only")
            else:
                md5_mask = np.zeros(len(ids_all), bool)
            if md5_mask.any() and "content_md5" in batch.column_names:
                md5s = [m for m, sel in
                        zip(batch["content_md5"].to_pylist(), md5_mask)
                        if sel]
                m_ids = ids_all[md5_mask].tolist()
                m = len(m_ids)
                bands_out.append(np.full(m, MD5_BAND, np.int32))
                keys_out.append(np.fromiter((_md5_key64(x) for x in md5s),
                                            np.int64, count=m))
                ids_out.append(m_ids)
                dh_out.append(np.zeros(m, np.int64))
                cap_out.append(md5s)

        if "cap" in channels:
            caps_all = batch["caption"].to_pylist()
            # an EMPTY caption is "no caption", not "a caption equal to
            # every other empty one": captionless corpora (file-glob
            # ingest, io.read_image_files) would otherwise collapse into
            # one Jaccard-1.0 mega-cluster.  The oracle applies the same
            # rule (oracle.py pair verify), so engine ≡ oracle holds on
            # caption-free corpora too.
            # null captions (failed caption fetch on a web corpus) are
            # "no caption" exactly like empty ones — inert channel
            has_cap = np.fromiter(
                (c is not None and c != "" for c in caps_all), bool,
                count=len(caps_all))
            ids = ids_all[has_cap].tolist()
            caps = [c for c in caps_all if c is not None and c != ""]
            dh = dh_all[has_cap]
            n = len(ids)
            if n:
                sigs = minhash_from_column(batch)[has_cap]
                bkeys = textfn.band_keys(sigs, cfg.bands, cfg.rows_per_band)
                for bi in range(cfg.bands):
                    bands_out.append(np.full(n, CAP_BAND_OFFSET + bi, np.int32))
                    keys_out.append(bkeys[:, bi].copy())
                    ids_out.append(ids)
                    # NOTE (wide-hash limitation): the int64 dhash here is
                    # a 0 sentinel at hash_size != 8, so _verify_members'
                    # caption→image Hamming delegation goes inert on wide
                    # hashes — pairs near in BOTH channels get emitted by
                    # both (correctness unaffected: CC tolerates duplicate
                    # edges; the 5-20× owner-dedup saving applies only at
                    # the default 64-bit hash).  Shipping dhash_hex in cap
                    # rows would restore it at +36 B/row — not worth it
                    # until a wide-hash corpus is the hot path.
                    dh_out.append(dh.view(np.int64))
                    cap_out.append(caps)

        if not bands_out:  # e.g. cap-only run on a captionless batch
            return BAND_SCHEMA.empty_table()
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
