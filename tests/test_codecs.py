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


def test_capability_registry_covers_dispatch():
    """Every dispatchable fmt has an explicit capability entry; unknown
    formats report 'unknown' (→ always dead-letter)."""
    for f in codecs.IMAGE_FMTS:
        assert codecs.codec_capability(f) == "native"
    for f in codecs.STUB_FMTS:
        assert codecs.codec_capability(f) == "stub"
    # round-4 stub→native flips: audio (stdlib wave + the fixture
    # container) and the multi-frame vcon container
    for f in codecs.AUDIO_FMTS | codecs.CONTAINER_FMTS:
        assert codecs.codec_capability(f) == "native"
    assert "wav" not in codecs.STUB_FMTS
    assert codecs.codec_capability("tiff") == "unknown"


def test_wav_roundtrip_and_dispatch():
    """Stdlib wave codec: encode→decode roundtrip is exact; decode_audio
    routes by magic; stereo downmixes deterministically; corrupt and
    non-16-bit payloads dead-letter as CodecError."""
    import io
    import wave as _wave

    import numpy as np

    s = np.clip(np.random.default_rng(5).standard_normal(4096) * 9000,
                -32000, 32000).astype(np.int16)
    blob = codecs.encode_wav(s, 16000)
    rate, out = codecs.decode_wav(blob)
    assert rate == 16000 and np.array_equal(out, s)
    # decode_audio dispatches wav AND acon by magic
    assert np.array_equal(codecs.decode_audio(blob)[1], s)
    acon = codecs.encode_acon(s, 16000)
    assert np.array_equal(codecs.decode_audio(acon)[1], s)
    assert blob != acon  # real re-encode class: same PCM, different bytes

    # stereo: integer-mean downmix
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        inter = np.empty(2 * len(s), np.int16)
        inter[0::2] = s
        inter[1::2] = s
        w.writeframes(inter.astype("<i2").tobytes())
    rate2, mono = codecs.decode_wav(buf.getvalue())
    assert rate2 == 8000 and np.array_equal(mono, s)

    with pytest.raises(codecs.CodecError):
        codecs.decode_wav(blob[:40])
    with pytest.raises(codecs.CodecError):
        codecs.decode_audio(b"OggS not supported")
    # 8-bit wav refused (not silently mis-decoded)
    buf8 = io.BytesIO()
    with _wave.open(buf8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 100)
    with pytest.raises(codecs.CodecError, match="width"):
        codecs.decode_wav(buf8.getvalue())


def test_unsupported_codec_policy_routes_jpg():
    """The loud stub boundary (VERDICT r2 item 4): a jpg payload either
    joins the md5 keyspace (default, reference dupedb.py:100-101 parity)
    or dead-letters with error=unsupported_codec per config — and the
    choice is part of config_hash, i.e. recorded in every manifest."""
    import pyarrow as pa

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.decode_hash import make_decode_hash

    png = codecs.encode_png(
        np.random.default_rng(7).integers(0, 256, (8, 8, 3), dtype=np.uint8))
    batch = pa.table({
        "image_id": ["a.png", "b.jpg"],
        "bytes": pa.array([png, b"\xff\xd8\xff\xe0stub"], pa.binary()),
        "w": pa.array([8, 8], pa.int32()),
        "h": pa.array([8, 8], pa.int32()),
        "fmt": ["png", "jpg"],
    })

    md5_cfg = PipelineConfig()
    out = make_decode_hash(md5_cfg, with_rank_columns=False)(batch)
    row = out.to_pylist()[1]
    assert row["status"] == "md5_only"
    assert row["proc_hash"] == row["content_md5"]

    dl_cfg = PipelineConfig(unsupported_codec_policy="dead_letter")
    out = make_decode_hash(dl_cfg, with_rank_columns=False)(batch)
    row = out.to_pylist()[1]
    assert row["status"] == "error"
    assert row["error"].startswith("unsupported_codec:")
    assert row["proc_hash"] == ""  # never enters the dedup keyspace

    # the png row is unaffected by the policy
    assert out.to_pylist()[0]["status"] == "ok"
    # manifests record the choice: the config digest must differ
    assert md5_cfg.config_hash() != dl_cfg.config_hash()


def test_unsupported_codec_policy_validated():
    from deduplicator_ray.config import PipelineConfig

    with pytest.raises(ValueError):
        PipelineConfig(unsupported_codec_policy="ignore")
