"""Tier-dedup cascade for the fp-set modalities (video/audio): the engine
(stages/fpsets.identity_tiers over one decode pass) must value-match the
DuckDB mirror, and the fixture's construction pins each tier's semantics —
byte copies bind at 'byte', lossless re-encodes with the identical fp set
at 'fpset', clips/re-variants at 'near'."""

import duckdb
import pandas as pd

from deduplicator_ray import fixtures


def _check(eng, sql):
    orc = duckdb.sql(sql).df()
    assert list(eng.columns) == list(orc.columns)
    assert [str(t) for t in eng.dtypes] == [str(t) for t in orc.dtypes]
    a = eng.sort_values(list(eng.columns)).reset_index(drop=True)
    b = orc.sort_values(list(orc.columns)).reset_index(drop=True)
    assert a.equals(b)
    return eng


def test_vid_dedup_tiers_mirror_and_semantics(ray_session, sf_small):
    import __ray_entry__ as e
    from deduplicator_ray.pipelines import video_dedup as vd

    vframes = fixtures.video_frames_path(sf_small) + "/*.parquet"
    tiers_df = e._vid_dedup_tiers(sf_small)
    _check(tiers_df, e._fp_tier_sql(
        vframes, "video_id", "frame_fp",
        vd.MAX_FP_DF_DEFAULT, vd.TAU_E6_DEFAULT))
    rep = _check(e._vid_dedup_tiers_report(sf_small), e._fp_tier_sql(
        vframes, "video_id", "frame_fp",
        vd.MAX_FP_DF_DEFAULT, vd.TAU_E6_DEFAULT, report_alias="n_videos"))
    tiers = tiers_df.set_index("video_id")
    assert set(rep["tier"]) == {"byte", "fpset", "near", "unique"}
    assert rep["n_videos"].sum() == len(tiers)
    # fixture structure: every copy is byte-identical to its base; every
    # remux carries the identical frame set; re/clip variants are near
    copies = [v for v in tiers.index if v.startswith("vid/copy")]
    assert copies and all(tiers.loc[v, "tier"] == "byte" for v in copies)
    for v in copies:
        assert tiers.loc[v, "dup_of"] == v.replace("copy", "base")
    remuxes = [v for v in tiers.index if v.startswith("vid/remux")]
    assert remuxes and all(tiers.loc[v, "tier"] == "fpset" for v in remuxes)
    res = [v for v in tiers.index if v.startswith("vid/re")
           and not v.startswith("vid/remux")]
    assert res and all(tiers.loc[v, "tier"] == "near" for v in res)
    # keeper invariant: dup_of never exceeds the member id
    assert (tiers["dup_of"] <= tiers.index.to_series()).all()


def test_aud_dedup_tiers_mirror_and_semantics(ray_session, sf_small):
    import __ray_entry__ as e
    from deduplicator_ray.pipelines import audio_dedup as ad

    afps = fixtures.audio_fps_path(sf_small) + "/*.parquet"
    tiers_df = e._aud_dedup_tiers(sf_small)
    _check(tiers_df, e._fp_tier_sql(
        afps, "audio_id", "win_fp",
        ad.MAX_FP_DF_DEFAULT, ad.TAU_E6_DEFAULT))
    rep = _check(e._aud_dedup_tiers_report(sf_small), e._fp_tier_sql(
        afps, "audio_id", "win_fp",
        ad.MAX_FP_DF_DEFAULT, ad.TAU_E6_DEFAULT, report_alias="n_audios"))
    tiers = tiers_df.set_index("audio_id")
    assert set(rep["tier"]) == {"byte", "fpset", "near", "unique"}
    assert rep["n_audios"].sum() == len(tiers)
    copies = [a for a in tiers.index if a.startswith("aud/copy")]
    assert copies and all(tiers.loc[a, "tier"] == "byte" for a in copies)
    deltas = [a for a in tiers.index if a.startswith("aud/delta")]
    assert deltas and all(tiers.loc[a, "tier"] == "fpset" for a in deltas)
    res = [a for a in tiers.index if a.startswith("aud/re")]
    assert res and all(tiers.loc[a, "tier"] == "near" for a in res)
    assert (tiers["dup_of"] <= tiers.index.to_series()).all()


def test_mm_dedup_tier_matrix(sf_small):
    """Cross-modality tier matrix: one (modality, tier, n_items) table
    that must agree row-for-row with each per-modality report."""
    import __ray_entry__ as e

    q = e.queries()
    mat = q["mm_dedup_tier_matrix"](sf_small)
    assert set(mat["modality"]) == {"img", "docs", "emb", "vid", "aud"}
    assert (mat["n_items"] > 0).all()
    for modality, key, alias in (
            ("img", "img_dedup_tiers_report", "n_images"),
            ("vid", "vid_dedup_tiers_report", "n_videos"),
            ("aud", "aud_dedup_tiers_report", "n_audios")):
        rep = q[key](sf_small)
        got = dict(zip(mat.loc[mat["modality"] == modality, "tier"],
                       mat.loc[mat["modality"] == modality, "n_items"]))
        want = dict(zip(rep["tier"], rep[alias].astype(int)))
        assert got == want, modality


def test_tier_passes_survive_null_payloads(ray_session):
    """A bytes=NULL row (failed download) must dead-letter through the
    md5 tier passes, not TypeError the batch (round-3 review)."""
    import pyarrow as pa

    from deduplicator_ray.pipelines.audio_dedup import AudioSignaturesMd5
    from deduplicator_ray.pipelines.video_dedup import VideoFramesMd5

    vb = pa.table({"video_id": ["v0"], "bytes": pa.array([None], pa.binary())})
    out = VideoFramesMd5()(vb).to_pandas()
    assert len(out) == 1 and out.iloc[0]["status"].startswith("error:")
    ab = pa.table({"audio_id": ["a0"], "bytes": pa.array([None], pa.binary())})
    out = AudioSignaturesMd5()(ab).to_pandas()
    assert len(out) == 1 and out.iloc[0]["status"].startswith("error:")


def test_zero_fingerprint_media_quarantined(ray_session):
    """Decodable media with zero fingerprintable content (empty vcon /
    sub-window acon) must land in the dead-letter taxonomy, never vanish
    silently from tiers/weights/splits."""
    import numpy as np
    import pyarrow as pa

    from deduplicator_ray import codecs
    from deduplicator_ray.pipelines.audio_dedup import AudioSignatures
    from deduplicator_ray.pipelines.video_dedup import VideoFrames

    empty_vcon = codecs.encode_vcon([])
    out = VideoFrames()(pa.table({
        "video_id": ["v0"],
        "bytes": pa.array([empty_vcon], pa.binary())})).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["status"] == "error:EmptyMedia: container holds no frames"

    short = codecs.encode_acon(np.zeros(100, np.int16), 16000)
    out = AudioSignatures()(pa.table({
        "audio_id": ["a0"],
        "bytes": pa.array([short], pa.binary())})).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["status"] == "error:EmptyMedia: shorter than one window"


def test_absurd_acon_rate_dead_letters(ray_session):
    """A structurally valid container with an int32-overflowing declared
    rate must CodecError (dead-letter), not ArrowInvalid the stage."""
    import struct

    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from deduplicator_ray import codecs
    from deduplicator_ray.pipelines.multimodal import AudioFeatures

    good = codecs.encode_acon(np.zeros(4096, np.int16), 16000)
    bad = (codecs.ACON_MAGIC
           + struct.pack("<BII", codecs.ACON_CODEC_RAW, 3_000_000_000, 4096)
           + good[len(codecs.ACON_MAGIC) + 9:])
    with _pytest.raises(codecs.CodecError, match="rate"):
        codecs.decode_acon(bad)
    out = AudioFeatures(fake=False)(pa.table({
        "image_id": ["x.acon"], "fmt": ["acon"],
        "bytes": pa.array([bad], pa.binary())})).to_pandas()
    assert out.iloc[0]["status"].startswith("error:")
    # the real-acon ok path now emits the fixed-width mfcc vector
    ok = AudioFeatures(fake=False)(pa.table({
        "image_id": ["y.acon"], "fmt": ["acon"],
        "bytes": pa.array([good], pa.binary())})).to_pandas()
    assert ok.iloc[0]["status"] == "ok"
    assert len(ok.iloc[0]["mfcc"]) == AudioFeatures.N_MFCC
    # wav rides the SAME real-decode branch (decode_audio magic dispatch)
    # and produces identical features for identical PCM
    wav = codecs.encode_wav(np.zeros(4096, np.int16), 16000)
    okw = AudioFeatures(fake=False)(pa.table({
        "image_id": ["y.wav"], "fmt": ["wav"],
        "bytes": pa.array([wav], pa.binary())})).to_pandas()
    assert okw.iloc[0]["status"] == "ok"
    assert okw.iloc[0]["duration_ms"] == ok.iloc[0]["duration_ms"]
    assert list(okw.iloc[0]["mfcc"]) == list(ok.iloc[0]["mfcc"])


def test_video_hash_size_validated(ray_session):
    import pytest as _pytest

    from deduplicator_ray.pipelines.video_dedup import VideoFrames

    with _pytest.raises(ValueError, match="hash_size"):
        VideoFrames(hash_size=12)
