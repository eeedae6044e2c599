"""PIL-compatible separable Lanczos-3 resampling on uint8 arrays, pure numpy.

The reference fingerprints images with ``imagehash.dhash(Image.open(p),
hash_size)`` (/root/reference/dupedb.py:85-86), whose resize step is PIL's
``Image.resize((hash_size+1, hash_size), Image.LANCZOS)``.  PIL is not
available in this environment, so this module reimplements the documented
8-bit resampling algorithm of Pillow's ``Resample.c`` (public source):

- coefficient window: Lanczos a=3, ``sinc(x) * sinc(x/3)`` for |x| < 3;
- when downscaling, the filter is stretched by ``filterscale = in/out``;
- per output pixel: ``center = (xx + 0.5) * scale``,
  ``xmin = max(0, int(center - support + 0.5))``,
  ``xmax = min(in_size, int(center + support + 0.5)) - xmin``,
  weights evaluated at ``(x + xmin - center + 0.5) / filterscale`` and
  normalized to sum 1;
- 8-bit path: weights quantized to fixed point with ``PRECISION_BITS = 22``
  (``int(w * 2^22 ± 0.5)``), accumulated in int32, then
  ``clip((acc + 2^21) >> 22, 0, 255)``;
- two passes, horizontal first, with the intermediate clipped back to uint8
  between passes.

Implemented as two dense integer matmuls, which at fingerprint sizes
((hash_size+1) x hash_size output) is a handful of microseconds per image and
fully vectorized.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

PRECISION_BITS = 32 - 8 - 2  # 22, as in Pillow's 8bpc path
_HALF = 1 << (PRECISION_BITS - 1)


def _lanczos3(x: float) -> float:
    if x <= -3.0 or x >= 3.0:
        return 0.0
    if x == 0.0:
        return 1.0
    px = math.pi * x
    return 3.0 * math.sin(px) * math.sin(px / 3.0) / (px * px)


@lru_cache(maxsize=4096)
def _coeff_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Fixed-point coefficient matrix K of shape (out_size, in_size), int32.

    ``out = clip((K @ col + 2^21) >> 22)`` reproduces one resampling pass.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 3.0 * filterscale
    K = np.zeros((out_size, in_size), dtype=np.int64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5)) - xmin
        ws = np.array(
            [_lanczos3((x + xmin - center + 0.5) / filterscale) for x in range(xmax)],
            dtype=np.float64,
        )
        ws /= ws.sum()
        fixed = np.where(
            ws < 0,
            (ws * (1 << PRECISION_BITS) - 0.5).astype(np.int64),
            (ws * (1 << PRECISION_BITS) + 0.5).astype(np.int64),
        )
        K[xx, xmin : xmin + xmax] = fixed
    return K.astype(np.int32)


def _pass(img: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Apply one fixed-point resampling pass along axis 0 of ``img`` (int64 matmul)."""
    acc = K.astype(np.int64) @ img.astype(np.int64)
    return np.clip((acc + _HALF) >> PRECISION_BITS, 0, 255).astype(np.uint8)


def resize_u8(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Resize a (h, w) or (h, w, c) uint8 array with PIL-compatible Lanczos-3.

    Horizontal pass first, intermediate clipped to uint8, then vertical —
    matching Pillow's two-pass order so fingerprints are reproducible.
    """
    if img.ndim == 2:
        h, w = img.shape
        channels = None
    else:
        h, w, c = img.shape
        channels = c

    Kh = _coeff_matrix(w, out_w)
    Kv = _coeff_matrix(h, out_h)

    if channels is None:
        tmp = _pass(img.T, Kh).T          # horizontal: operate on columns of img.T
        out = _pass(tmp, Kv)
        return out
    out_c = []
    for ci in range(channels):
        tmp = _pass(img[:, :, ci].T, Kh).T
        out_c.append(_pass(tmp, Kv))
    return np.stack(out_c, axis=-1)


def grayscale_u8(rgb: np.ndarray) -> np.ndarray:
    """PIL ``convert('L')`` ITU-R 601-2 integer luma.

    Pillow's convert.c: ``L24(rgb) >> 16`` with
    ``L24 = R*19595 + G*38470 + B*7471`` (i.e. floor, not round).
    The reference relies on this via ``Image.open(...)`` → dhash
    (/root/reference/dupedb.py:85-86).
    """
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471) >> 16).astype(np.uint8)
