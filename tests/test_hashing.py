import numpy as np
import pytest

from deduplicator_ray import hashing
from deduplicator_ray.resize import grayscale_u8, resize_u8


def test_grayscale_formula():
    # PIL convert('L'): (R*19595 + G*38470 + B*7471) >> 16
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]], np.uint8)
    g = grayscale_u8(rgb)
    assert g.tolist() == [[76, 149, 29, 255]]


def test_resize_identity():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = resize_u8(img, 8, 8)
    assert (out == img).all()  # scale 1: kernel is a centered delta


def test_resize_constant_preserved():
    img = np.full((40, 60), 137, np.uint8)
    out = resize_u8(img, 9, 8)
    assert (out == 137).all()


def test_dhash_gradient_sign():
    # A strictly increasing horizontal ramp → every gradient bit set
    img = np.tile(np.linspace(0, 255, 9, dtype=np.uint8), (8, 1))
    bits = hashing.dhash_bits(img, 8)
    assert bits.all()
    assert hashing.pack_bits_u64(bits) == (1 << 64) - 1
    # decreasing ramp → all clear → the reference's zero-hash poison bucket
    bits2 = hashing.dhash_bits(img[:, ::-1].copy(), 8)
    assert not bits2.any()


def test_hex_packing_msb_first():
    bits = np.zeros((8, 8), bool)
    bits[0, 0] = True  # first flattened bit = MSB
    assert hashing.bits_to_hex(bits) == "8" + "0" * 15
    assert hashing.pack_bits_u64(bits) == 1 << 63


def test_hash12_hex_width():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    hx = hashing.dhash_hex(img, 12)
    assert len(hx) == 36  # 144-bit → 36 hex chars (dedupc.py:83 relies on this)


def test_signed_roundtrip():
    for v in [0, 1, 2**63 - 1, 2**63, 2**64 - 1]:
        assert hashing.i64_to_u64(hashing.u64_to_i64(v)) == v


def test_hamming():
    a = np.array([0, -1, 7], np.int64)
    b = np.array([0, 0, 0], np.int64)
    assert hashing.hamming_u64(a, b).tolist() == [0, 64, 3]


def test_dhash_invariant_under_reencode():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    from deduplicator_ray import codecs

    h0 = hashing.dhash_u64(img)
    for fmt in ["raw", "ppm", "bmp", "png"]:
        out = codecs.decode_image(codecs.encode_image(img, fmt), fmt, 64, 48)
        assert hashing.dhash_u64(out) == h0


def test_phash_discriminates():
    from deduplicator_ray.fixtures import _base_image

    a = _base_image(np.random.default_rng([9, 1]))
    b = _base_image(np.random.default_rng([9, 2]))
    ha, hb = hashing.phash_u64(a), hashing.phash_u64(b)
    assert ha == hashing.phash_u64(a.copy())  # deterministic
    dist = hashing.hamming_u64(
        np.array([hashing.u64_to_i64(ha)], np.int64),
        np.array([hashing.u64_to_i64(hb)], np.int64),
    )[0]
    assert dist >= 10  # independent images are far apart


def test_md5_crc32():
    assert hashing.md5_hex(b"abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert hashing.crc32_hex(b"abc") == "352441C2"
