"""Perceptual + content hash kernels (pure numpy / stdlib).

Reimplements the fingerprint semantics of the reference's ``getProcHash``
(/root/reference/dupedb.py:68-101):

- images → dHash at ``hash_size`` (``imagehash.dhash`` semantics: grayscale,
  Lanczos resize to (hash_size+1, hash_size), horizontal gradient sign,
  bits packed row-major MSB-first);
- strict-mode animations / videos / other files → md5 of the raw bytes
  (/root/reference/dupedb.py:82-83, 89-90, 100-101).

Plus pHash (``imagehash.phash`` semantics: 32x32 grayscale → 2D DCT-II →
top-left hash_size x hash_size block → median threshold) as the pluggable
alternative fingerprint, and vectorized Hamming-distance kernels for the
LSH verify stage.

Hashes are carried as uint64 columns (hash_size=8) or hex strings
(hash_size>8, e.g. the reference default 12 → 144 bits → 36 hex chars,
/root/reference/dedupc.py:83).
"""

from __future__ import annotations

import hashlib
import math
import zlib
from functools import lru_cache

import numpy as np

from deduplicator_ray.resize import grayscale_u8, resize_u8


# ---------------------------------------------------------------------------
# dHash


def dhash_bits(rgb: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """Difference-hash bit matrix (hash_size, hash_size) of an RGB or gray u8 array.

    ``diff[r, c] = small[r, c+1] > small[r, c]`` on the (hash_size+1, hash_size)
    Lanczos-resized grayscale image — identical orientation to imagehash.dhash
    (width = hash_size+1, height = hash_size; compare adjacent columns).
    """
    gray = grayscale_u8(rgb) if rgb.ndim == 3 else rgb
    small = resize_u8(gray, hash_size + 1, hash_size)  # (rows=hash_size, cols=hash_size+1)
    return small[:, 1:] > small[:, :-1]


def pack_bits_u64(bits: np.ndarray) -> int:
    """Pack a bit matrix (row-major, MSB-first) into a Python int —
    np.packbits + int.from_bytes, not a per-bit Python loop (this runs
    once per image in the dHash/pHash hot path).  packbits pads the LAST
    byte's low bits with zeros, so shift the surplus off for non-multiple-
    of-8 widths to keep the MSB-first semantics bit-exact."""
    flat = np.asarray(bits).flatten()
    n = len(flat)
    v = int.from_bytes(np.packbits(flat.astype(np.uint8)).tobytes(), "big")
    pad = (-n) % 8
    return v >> pad


def bits_to_hex(bits: np.ndarray) -> str:
    """imagehash ``__str__`` rendering: zero-padded hex of width ceil(n/4)."""
    flat = bits.flatten()
    width = math.ceil(len(flat) / 4)
    return format(pack_bits_u64(bits), f"0{width}x")


def dhash_u64(rgb: np.ndarray, hash_size: int = 8) -> int:
    """64-bit dHash as an unsigned int (hash_size must be 8)."""
    assert hash_size == 8
    return pack_bits_u64(dhash_bits(rgb, 8))


def dhash_hex(rgb: np.ndarray, hash_size: int = 8) -> str:
    return bits_to_hex(dhash_bits(rgb, hash_size))


def u64_to_i64(v: int) -> int:
    """Reinterpret an unsigned 64-bit value as signed (Arrow int64 storage)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def i64_to_u64(v: int) -> int:
    return v + (1 << 64) if v < 0 else v


# ---------------------------------------------------------------------------
# pHash (DCT)


@lru_cache(maxsize=8)
def _dct2_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II matrix matching scipy.fftpack.dct(x, norm=None):
    ``y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N))``."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return 2.0 * np.cos(np.pi * k * (2 * m + 1) / (2 * n))


def phash_bits(rgb: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> np.ndarray:
    """imagehash.phash semantics: 32x32 grayscale → DCT-II both axes →
    top-left block → median threshold."""
    img_size = hash_size * highfreq_factor
    gray = grayscale_u8(rgb) if rgb.ndim == 3 else rgb
    small = resize_u8(gray, img_size, img_size).astype(np.float64)
    D = _dct2_matrix(img_size)
    dct = D @ small @ D.T  # dct(axis=0) then dct(axis=1)
    low = dct[:hash_size, :hash_size]
    med = np.median(low)
    return low > med


def phash_u64(rgb: np.ndarray, hash_size: int = 8) -> int:
    assert hash_size == 8
    return pack_bits_u64(phash_bits(rgb, 8))


# ---------------------------------------------------------------------------
# content hashes (reference strict-mode / rename decorations)


def md5_hex(data: bytes) -> str:
    """Byte-content md5, the strict-mode fingerprint for animations / videos /
    non-images (/root/reference/dupedb.py:82-83,89-90,100-101; snip.hash.md5file)."""
    return hashlib.md5(data).hexdigest()


def crc32_hex(data: bytes) -> str:
    """CRC32 rename decoration ``{hash}_{CRC32}`` (/root/reference/dedupc.py:316-320)."""
    return format(zlib.crc32(data) & 0xFFFFFFFF, "08X")


# ---------------------------------------------------------------------------
# Hamming kernels (vectorized, for LSH verify — no analog in the reference,
# which only matches on exact hash equality; SURVEY.md §1.3)

_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between two uint64/int64 arrays."""
    x = (np.asarray(a).astype(np.int64).view(np.uint64)
         ^ np.asarray(b).astype(np.int64).view(np.uint64))
    bytes_view = x.view(np.uint8).reshape(len(x), 8) if len(x) else x.view(np.uint8).reshape(0, 8)
    return _POPCOUNT_TABLE[bytes_view].sum(axis=1).astype(np.int32)


def popcount_u64(a: np.ndarray) -> np.ndarray:
    x = np.asarray(a).astype(np.int64).view(np.uint64)
    bytes_view = x.view(np.uint8).reshape(len(x), 8) if len(x) else x.view(np.uint8).reshape(0, 8)
    return _POPCOUNT_TABLE[bytes_view].sum(axis=1).astype(np.int32)
