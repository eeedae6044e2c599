import numpy as np
import pytest

from deduplicator_ray import codecs


@pytest.fixture
def img():
    rng = np.random.default_rng(123)
    return rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "ppm", "bmp", "png"])
def test_roundtrip(img, fmt):
    data = codecs.encode_image(img, fmt)
    out = codecs.decode_image(data, fmt, 53, 37)
    assert out.shape == img.shape
    assert (out == img).all()


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png"])
def test_truncated_raises(img, fmt):
    data = codecs.encode_image(img, fmt)
    with pytest.raises(codecs.CodecError):
        codecs.decode_image(data[: len(data) // 3], fmt, 53, 37)


def test_raw_wrong_size(img):
    with pytest.raises(codecs.CodecError):
        codecs.decode_raw(codecs.encode_raw(img), 10, 10)


def test_dim_mismatch_detected(img):
    data = codecs.encode_ppm(img)
    with pytest.raises(codecs.CodecError):
        codecs.decode_image(data, "ppm", 99, 37)


def test_stub_formats_marked():
    with pytest.raises(codecs.UnsupportedFormatError):
        codecs.decode_image(b"\xff\xd8\xff\xe0", "jpg", 4, 4)


def test_garbage_is_codec_error():
    for fmt in ["ppm", "bmp", "png"]:
        with pytest.raises(codecs.CodecError):
            codecs.decode_image(b"garbage-bytes-here", fmt, 4, 4)


def test_ppm_header_with_comment(img):
    data = b"P6\n# a comment\n53 37\n255\n" + img.tobytes()
    out = codecs.decode_ppm(data)
    assert (out == img).all()


def test_bmp_row_padding():
    # width where 3*w is not a multiple of 4 exercises padding
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp(img))
    assert (out == img).all()


def test_png_header_bomb_guard():
    """Bomb guard at the CODEC layer: a payload whose IHDR declares 1.6 G
    pixels must be rejected before inflating, even when caller-side
    metadata (the table's w/h) understates the dims (spoofed rows bypass
    the decode_hash metadata guard)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 40000, 40000, 8, 2, 0, 0, 0)

    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + b"\0\0\0\0"

    bomb = (codecs._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\0" * 100))
            + chunk(b"IEND", b""))
    with pytest.raises(codecs.CodecError, match="bomb"):
        codecs.decode_png(bomb)
