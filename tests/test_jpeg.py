"""Baseline JPEG codec (jpeg.py) — the jpg stub→native flip: roundtrip
PSNR invariance, golden structural vectors, dHash-path routing through
the fingerprint stage, and the fixture jpg-group semantics."""

import numpy as np
import pyarrow as pa
import pytest

from deduplicator_ray import codecs, fixtures, hashing, jpeg
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.fixtures import _base_image, psnr
from deduplicator_ray.stages.decode_hash import make_decode_hash


def test_roundtrip_psnr_invariance():
    """q95 4:4:4 ≥ 45 dB, q85 4:2:0 ≥ 38 dB, q60 ≥ 35 dB on the fixture
    image family; dims preserved, odd sizes included."""
    for seed in range(3):
        img = _base_image(np.random.default_rng([5, seed]))
        for q, sub, floor in ((95, False, 45.0), (85, True, 38.0),
                              (60, True, 35.0)):
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, subsample=sub))
            assert out.shape == img.shape
            assert psnr(img, out) >= floor
    odd = _base_image(np.random.default_rng([5, 9]))[:37, :53]
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(odd, 90))
    assert out.shape == odd.shape and psnr(odd, out) >= 35.0


def test_golden_structure_and_errors():
    """Structural golden vectors: SOI/EOI framing, dims probe, quality
    monotonicity; corrupt/progressive/truncated payloads dead-letter."""
    img = _base_image(np.random.default_rng([8, 0]))
    blob = jpeg.encode_jpeg(img, 85)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert jpeg.jpeg_dims(blob) == (img.shape[1], img.shape[0])
    # higher quality → larger stream on the same image
    assert len(jpeg.encode_jpeg(img, 95)) > len(jpeg.encode_jpeg(img, 40))

    with pytest.raises(codecs.CodecError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(codecs.CodecError):
        jpeg.decode_jpeg(blob[: len(blob) // 2])
    # a progressive SOF2 marker is refused, not mis-decoded
    prog = bytearray(blob)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(codecs.CodecError, match="progressive|arith"):
        jpeg.decode_jpeg(bytes(prog))
    # generic dispatch: decode_image routes jpg to this codec
    assert np.array_equal(codecs.decode_image(blob, "jpg", img.shape[1],
                                              img.shape[0]),
                          jpeg.decode_jpeg(blob))


def test_gray_single_component():
    """1-component (grayscale) streams decode with channel replication —
    crafted by re-tagging a 4:4:4 stream's luma-only variant."""
    img = _base_image(np.random.default_rng([8, 3]))
    gray = np.repeat(
        (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
         + 0.114 * img[:, :, 2]).round().clip(0, 255)
        .astype(np.uint8)[:, :, None], 3, axis=2)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, 92, subsample=False))
    assert psnr(gray, out) >= 40.0


def test_jpg_rows_flow_dhash_path():
    """A real jpg payload fingerprints through the PERCEPTUAL path: status
    ok, proc_hash is the 16-hex dHash (not the 32-hex md5), and a q-65
    re-encode of the same pixels lands within the Hamming verify radius
    of the q-90 original."""
    rng = np.random.default_rng([7, 1])
    img = _base_image(rng)
    b90 = jpeg.encode_jpeg(img, 90)
    b65 = jpeg.encode_jpeg(img, 65)
    assert b90 != b65
    h, w = img.shape[:2]
    batch = pa.table({
        "image_id": ["a/x.jpg", "a/y.jpg"],
        "bytes": pa.array([b90, b65], pa.binary()),
        "w": pa.array([w, w], pa.int32()),
        "h": pa.array([h, h], pa.int32()),
        "fmt": ["jpg", "jpg"],
        "caption": ["", ""],
        "phash": pa.array([0, 0], pa.int64()),
    })
    out = make_decode_hash(PipelineConfig())(batch).to_pylist()
    for row in out:
        assert row["status"] == "ok"
        assert len(row["proc_hash"]) == 16  # dHash hex, not md5
        assert row["proc_hash"] != row["content_md5"]
    d = bin(hashing.i64_to_u64(out[0]["dhash"])
            ^ hashing.i64_to_u64(out[1]["dhash"])).count("1")
    assert d <= 4, f"re-encode drifted {d} bits"


def test_fixture_jpg_group_semantics(sf_small):
    """The corpus jpg class end-to-end: byte copies share the exact
    proc_hash key with their base (reference-mode co-cluster), re-encodes
    decode within the perceptual band, stored phash equals the decoded
    dHash (no fabricated validate drift)."""
    import glob

    import pyarrow.parquet as pq

    tbl = pa.concat_tables([
        pq.read_table(p) for p in sorted(glob.glob(
            fixtures.images_path(sf_small) + "/*.parquet"))])
    tr = pa.concat_tables([
        pq.read_table(p) for p in sorted(glob.glob(
            fixtures.truth_path(sf_small) + "/*.parquet"))])
    kinds = dict(zip(tr["image_id"].to_pylist(), tr["kind"].to_pylist()))
    src = dict(zip(tr["image_id"].to_pylist(), tr["source_id"].to_pylist()))
    rows = {r["image_id"]: r for r in tbl.to_pylist()
            if kinds.get(r["image_id"], "").startswith("jpg_")}
    assert rows, "no jpg groups in the corpus"
    n_copy = n_re = 0
    for iid, r in rows.items():
        dec = jpeg.decode_jpeg(r["bytes"])
        assert hashing.u64_to_i64(hashing.dhash_u64(dec, 8)) == r["phash"]
        k = kinds[iid]
        if k == "jpg_copy":
            base = rows[src[iid]]
            assert r["bytes"] == base["bytes"]
            assert r["phash"] == base["phash"]
            n_copy += 1
        elif k == "jpg_reencode":
            base = rows[src[iid]]
            assert r["bytes"] != base["bytes"]
            assert psnr(jpeg.decode_jpeg(base["bytes"]), dec) >= 30.0
            n_re += 1
    assert n_copy > 0 and n_re > 0


def test_malformed_segments_dead_letter_not_crash():
    """Review-confirmed escapes: malformed segment payloads must surface
    as CodecError (the dead-letter contract), never struct.error /
    IndexError / ValueError that would kill the whole map_batches task."""
    cases = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00\xff\xd9",   # SOF seglen=4
        b"\xff\xd8\xff\xda\x00\x02\xff\xd9",           # empty SOS
        # SOF claims 3 components but the segment is short
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x10\x00\x10\x03\xff\xd9",
        b"\xff\xd8\xff\xdb\x00\x03\x00\xff\xd9",       # truncated DQT
        b"\xff\xd8\xff\xc4\x00\x04\x00\x01\xff\xd9",   # truncated DHT
    ]
    for payload in cases:
        with pytest.raises(codecs.CodecError):
            jpeg.decode_jpeg(payload)


def test_grayscale_scan_ignores_sampling_factors():
    """Spec A.2.2: a one-component scan is NON-interleaved and sampling
    factors are ignored — a grayscale stream declaring 2x2 factors must
    decode to the same image as the plain 1x1 stream, not scramble."""
    import struct as _struct

    img = _base_image(np.random.default_rng([8, 5]))[:32, :32]
    gray = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2]).round().clip(0, 255).astype(np.uint8)
    h, w = gray.shape
    qlum, _ = jpeg._quality_tables(90)
    blocks = jpeg._encode_blocks(gray.astype(np.float64),
                                 qlum.reshape(8, 8).astype(np.float64))
    dc = jpeg._huff_codes(*jpeg._DC_LUM)
    ac = jpeg._huff_codes(*jpeg._AC_LUM)

    def one_component_stream(hv: int) -> bytes:
        bw_ = jpeg._BitWriter()
        jpeg._encode_component(bw_, blocks, 0, dc, ac)  # raster order
        bw_.flush()
        out = bytearray(b"\xff\xd8")
        out += jpeg._seg(0xDB, bytes([0]) + bytes(
            qlum.reshape(-1)[jpeg.ZIGZAG].astype(np.uint8)))
        sof = bytes([8]) + _struct.pack(">HH", h, w) + bytes([1])
        sof += bytes([1, hv, 0])
        out += jpeg._seg(0xC0, sof)
        out += jpeg._seg(0xC4, bytes([0x00]) + bytes(jpeg._DC_LUM[0])
                         + bytes(jpeg._DC_LUM[1]))
        out += jpeg._seg(0xC4, bytes([0x10]) + bytes(jpeg._AC_LUM[0])
                         + bytes(jpeg._AC_LUM[1]))
        out += jpeg._seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += bw_.out
        out += b"\xff\xd9"
        return bytes(out)

    plain = jpeg.decode_jpeg(one_component_stream(0x11))
    declared22 = jpeg.decode_jpeg(one_component_stream(0x22))
    assert np.array_equal(plain, declared22)
    assert psnr(np.repeat(gray[:, :, None], 3, axis=2), plain) >= 40.0


def test_fill_bytes_and_standalone_markers_parse():
    """Spec B.1.1.2: 0xFF fill bytes before a marker and standalone
    TEM/RSTn markers between segments are legal — a stream carrying them
    must decode identically, not desync (review-found: optimizer-emitted
    jpgs do this)."""
    img = _base_image(np.random.default_rng([8, 7]))
    blob = jpeg.encode_jpeg(img, 85)
    want = jpeg.decode_jpeg(blob)
    # inject a fill-byte run + a TEM marker right after SOI
    padded = blob[:2] + b"\xff\xff\xff\x01" + blob[2:]
    assert np.array_equal(jpeg.decode_jpeg(padded), want)
    assert jpeg.jpeg_dims(padded) == (img.shape[1], img.shape[0])


def test_gif_min_code_size_over_8_dead_letters():
    """GIF's real LZW min-code-size maximum is 8: 9-11 used to build
    >255 literal table entries and raise a raw ValueError past the
    taxonomy (review-found)."""
    import numpy as np

    from deduplicator_ray import codecs, fixtures

    art = fixtures._indexed_art(np.random.default_rng(21))
    blob = bytearray(codecs.encode_gif([art]))
    # single-frame layout: header(6) + LSD(7) + global palette(768) →
    # image descriptor (10 bytes) → min-code-size byte
    desc = 6 + 7 + 768
    assert blob[desc] == 0x2C
    mcs_pos = desc + 10
    assert blob[mcs_pos] == 8
    blob[mcs_pos] = 9
    with pytest.raises(codecs.CodecError):
        codecs.decode_gif_first(bytes(blob))


def test_rst_preceded_by_fill_bytes():
    """B.1.1.2: any number of 0xFF fill bytes may precede a marker, so
    'FF FF D0' is a legal RST0 boundary — the forward scan must skip the
    fill run instead of raising (advice-found)."""
    br = jpeg._BitReader(b"\xff\xff\xff\xd0\xab", 0)
    br.align_and_expect_rst(0)
    assert br.pos == 4  # positioned right after the RST0 marker
    assert br.receive(8) == 0xAB
    # a genuinely wrong marker after the fill run must still raise
    br2 = jpeg._BitReader(b"\xff\xff\xd7", 0)
    with pytest.raises(jpeg.CodecError):
        br2.align_and_expect_rst(0)


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — round 5


def test_progressive_decodes_identical_to_baseline():
    """The progressive scan script (DC Al=1 + refine, per-component AC
    spectral Al=1 + refine) carries the SAME quantized coefficients as
    the baseline encoder — decode must be pixel-identical across shapes,
    qualities and both subsampling modes (exercises DC/AC first+refine,
    EOB runs, ZRL-in-refinement, point transforms)."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:57, 0:43]
    grad = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)
    flat = np.full((24, 33, 3), 130, np.uint8)
    imgs = [rng.integers(0, 256, (64, 80, 3), np.uint8), grad, flat,
            rng.integers(0, 256, (17, 19, 3), np.uint8),
            rng.integers(0, 256, (1, 1, 3), np.uint8),
            rng.integers(0, 256, (9, 130, 3), np.uint8)]
    for img in imgs:
        for q in (30, 85, 95):
            for sub in (True, False):
                b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, subsample=sub))
                p = jpeg.decode_jpeg(
                    jpeg.encode_jpeg_progressive(img, q, subsample=sub))
                assert np.array_equal(b, p), (img.shape, q, sub)


def test_progressive_eob_run_spanning_blocks():
    """A mostly-flat image makes consecutive all-zero AC blocks: the
    encoder accumulates EOBn runs > 1 and the decoder's eobrun path must
    skip exactly that many blocks (value check via baseline equality)."""
    img = np.full((64, 64, 3), 200, np.uint8)
    img[0, 0] = [10, 20, 30]  # one busy block so the scan isn't all-EOB
    blob = jpeg.encode_jpeg_progressive(img, 85)
    assert np.array_equal(jpeg.decode_jpeg(blob),
                          jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85)))


def test_progressive_fuzz_totality():
    """Progressive streams under mutation/truncation either decode or
    raise CodecError — never an uncaught exception or a hang."""
    img = np.random.default_rng(9).integers(0, 256, (32, 32, 3), np.uint8)
    blob = jpeg.encode_jpeg_progressive(img, 85)
    rng = np.random.default_rng(10)
    for _ in range(60):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(2, len(b)))] = int(rng.integers(256))
        try:
            out = jpeg.decode_jpeg(bytes(b))
            assert out.dtype == np.uint8 and out.ndim == 3
        except jpeg.CodecError:
            pass
    for cut in (4, len(blob) // 4, len(blob) // 2, len(blob) - 3):
        try:
            jpeg.decode_jpeg(bytes(blob[:cut]))
        except jpeg.CodecError:
            pass


def test_progressive_bad_scan_headers_dead_letter():
    """Spec-illegal progressive scan headers (AC scan naming 3
    components, Ah jumping by 2) must dead-letter with CodecError."""
    img = np.random.default_rng(2).integers(0, 256, (16, 16, 3), np.uint8)
    blob = bytearray(jpeg.encode_jpeg_progressive(img, 85))
    # find the first AC SOS (ns==1): marker FF DA with seg[2]==1
    import struct as _s
    pos = 2
    hits = []
    while pos + 4 < len(blob):
        if blob[pos] == 0xFF and blob[pos + 1] == 0xDA:
            (ln,) = _s.unpack_from(">H", blob, pos + 2)
            hits.append((pos, ln))
            pos += 2 + ln
            # skip entropy till next marker
            while pos + 1 < len(blob) and not (
                    blob[pos] == 0xFF and blob[pos + 1] not in (0x00,)
                    and not (0xD0 <= blob[pos + 1] <= 0xD7)):
                pos += 1
        else:
            pos += 1 if blob[pos] != 0xFF else 2
    ac_sos = [p for p, ln in hits if blob[p + 4] == 1]
    assert ac_sos
    p0 = ac_sos[0]
    # corrupt Ss to 0 while Se stays 63 → DC scan with Se != 0
    bad = bytearray(blob)
    bad[p0 + 7] = 0
    with pytest.raises(jpeg.CodecError):
        jpeg.decode_jpeg(bytes(bad))
    # successive approximation jumping from Ah=0 to Ah=3
    bad2 = bytearray(blob)
    bad2[p0 + 9] = (3 << 4) | 1
    with pytest.raises(jpeg.CodecError):
        jpeg.decode_jpeg(bytes(bad2))


def test_progressive_dims_and_dhash_match_baseline():
    """jpeg_dims reads SOF2 headers; the dHash of a progressive re-save
    equals its baseline sibling (the dedup property: a progressive
    re-encode of the same pixels co-clusters)."""
    from deduplicator_ray import hashing

    img = fixtures._base_image(np.random.default_rng([13, 1]))
    blob = jpeg.encode_jpeg_progressive(img, 85)
    assert jpeg.jpeg_dims(blob) == (img.shape[1], img.shape[0])
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85))
    p = jpeg.decode_jpeg(blob)
    assert hashing.dhash_u64(p, 8) == hashing.dhash_u64(b, 8)


def test_projpg_corpus_progressive_coclusters(sf_small, ray_session):
    """End-to-end: every family's baseline jpg and SOF2 re-save share one
    proc_hash bucket; truncated streams dead-letter out of the relation."""
    import __ray_entry__ as e

    out = e._img_progressive_jpeg_clusters(sf_small)
    assert len(out) > 0
    assert not out["image_id"].str.endswith("_bad.jpg").any()
    fam = out["image_id"].str.rsplit("_", n=1).str[0]
    df = out.assign(fam=fam)
    core = df[df["image_id"].str.endswith(("_base.jpg", "_prog.jpg"))]
    per = core.groupby("fam").agg(n=("image_id", "size"),
                                  h=("proc_hash", "nunique"))
    assert len(per) > 0 and (per["n"] == 2).all() and (per["h"] == 1).all()
    # quality-shifted progressive members joined their family's bucket
    p2 = df[df["image_id"].str.endswith("_prog2.jpg")]
    if len(p2):
        j = p2.merge(core, on="fam", suffixes=("_p2", "_core"))
        assert (j["proc_hash_p2"] == j["proc_hash_core"]).all()


def test_restart_interval_streams_roundtrip():
    """DRI + RSTn streams decode identically to their marker-free
    siblings across intervals and subsampling modes (covers the fast
    scan decoder's segment splitting + predictor resets); corrupt
    restart sequences dead-letter."""
    rng = np.random.default_rng(6)
    for shape in [(64, 80, 3), (37, 41, 3)]:
        img = rng.integers(0, 256, shape, np.uint8)
        for sub in (True, False):
            want = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, subsample=sub))
            for ri in (1, 3, 7):
                blob = jpeg.encode_jpeg(img, 85, subsample=sub,
                                        restart_mcus=ri)
                assert np.array_equal(jpeg.decode_jpeg(blob), want)
    # break an RST marker's sequence number → CodecError, not desync
    blob = bytearray(jpeg.encode_jpeg(
        np.random.default_rng(1).integers(0, 256, (64, 64, 3), np.uint8),
        85, restart_mcus=2))
    i = bytes(blob).find(b"\xff\xd0")
    assert i > 0
    blob[i + 1] = 0xD5
    with pytest.raises(jpeg.CodecError):
        jpeg.decode_jpeg(bytes(blob))


def test_duplicate_sof_dead_letters():
    """A second SOF segment (appending coefficient-less components) must
    raise CodecError, not escape as KeyError (review-found on
    adversarial progressive streams)."""
    img = np.random.default_rng(7).integers(0, 256, (16, 16, 3), np.uint8)
    blob = jpeg.encode_jpeg_progressive(img, 85)
    i = blob.find(b"\xff\xc2")
    import struct as _s
    (ln,) = _s.unpack_from(">H", blob, i + 2)
    sof_seg = blob[i: i + 2 + ln]
    # duplicate the SOF right before the second SOS
    j = blob.find(b"\xff\xda", blob.find(b"\xff\xda") + 2)
    bad = blob[:j] + sof_seg + blob[j:]
    with pytest.raises(jpeg.CodecError, match="duplicate"):
        jpeg.decode_jpeg(bad)
    # baseline stream with duplicate SOF0 dead-letters the same way
    b2 = jpeg.encode_jpeg(img, 85)
    i2 = b2.find(b"\xff\xc0")
    (ln2,) = _s.unpack_from(">H", b2, i2 + 2)
    bad2 = b2[:i2] + b2[i2: i2 + 2 + ln2] + b2[i2:]
    with pytest.raises(jpeg.CodecError, match="duplicate"):
        jpeg.decode_jpeg(bad2)


def test_progressive_restart_interval_streams():
    """Progressive streams with DRI + RSTn in every scan (DC interleave
    units and per-component AC block units) decode identically to the
    marker-free siblings; a wrong RSTn sequence dead-letters
    (review-found coverage gap on the fast AC restart branch)."""
    rng = np.random.default_rng(8)
    for shape in [(64, 80, 3), (37, 41, 3)]:
        img = rng.integers(0, 256, shape, np.uint8)
        for sub in (True, False):
            want = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, subsample=sub))
            for ru in (1, 3, 5):
                got = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(
                    img, 85, subsample=sub, restart_units=ru))
                assert np.array_equal(got, want), (shape, sub, ru)
    blob = bytearray(jpeg.encode_jpeg_progressive(
        np.random.default_rng(3).integers(0, 256, (64, 64, 3), np.uint8),
        85, restart_units=2))
    i = bytes(blob).find(b"\xff\xd0")
    assert i > 0
    blob[i + 1] = 0xD4
    with pytest.raises(jpeg.CodecError):
        jpeg.decode_jpeg(bytes(blob))
