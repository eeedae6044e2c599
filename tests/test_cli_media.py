"""vid-dedup / aud-dedup CLI jobs: artifact layout, payload-free resume,
and equality with the direct pipeline."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from deduplicator_ray import fixtures
from deduplicator_ray.cli import run_media_dedup
from deduplicator_ray.pipelines import audio_dedup as ad


@pytest.fixture(scope="module")
def aud_job(sf_small, tmp_path_factory):
    inp = os.path.join(fixtures.audios_path(sf_small))
    out = str(tmp_path_factory.mktemp("aud_job"))
    report = run_media_dedup(inp, out, "audio")
    return inp, out, report


def test_media_job_artifacts_and_counts(sf_small, aud_job):
    inp, out, report = aud_job
    for d in ("signatures", "dead_letter", "pairs", "clusters"):
        assert os.path.isdir(os.path.join(out, d)), d
    assert os.path.exists(os.path.join(out, "report.json"))
    assert report["n_dead"] == 1          # the one corrupt container
    assert report["n_pairs"] > 0 and report["n_clustered"] > 0
    assert not report["sig_resumed"]
    # persisted signatures equal the sidecar oracle kernel
    got = pq.read_table(os.path.join(out, "signatures")).to_pandas()
    want = pq.read_table(os.path.join(
        fixtures.audio_fps_path(sf_small), "fps.parquet")).to_pandas()
    g = got[["audio_id", "win_idx", "win_fp"]].sort_values(
        ["audio_id", "win_idx"]).reset_index(drop=True)
    # the sidecar also carries the payload md5 (tier-mirror byte key);
    # the signature store persists the kernel columns only
    w = want[["audio_id", "win_idx", "win_fp"]].sort_values(
        ["audio_id", "win_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w.astype(g.dtypes.to_dict()))


def test_media_job_matches_direct_pipeline(sf_small, aud_job):
    _inp, out, _report = aud_job
    clus = pq.read_table(os.path.join(out, "clusters")).to_pandas()
    direct = ad.audio_clusters(
        ad.audio_signatures(ad.load_audios(sf_small))).to_pandas()
    assert (dict(zip(clus["audio_id"], clus["cluster_id"]))
            == dict(zip(direct["audio_id"], direct["cluster_id"])))


def test_media_job_resume_skips_kernel(sf_small, aud_job):
    inp, out, _report = aud_job
    # poison the input dir: a resumed run must not read payloads at all
    report2 = run_media_dedup("/nonexistent/never-read", out, "audio")
    assert report2["sig_resumed"]
    assert report2["wall_signatures_s"] == 0.0
    assert report2["n_pairs"] == _report["n_pairs"]
    assert report2["n_clustered"] == _report["n_clustered"]
    # --no-resume really recomputes (and therefore needs real input)
    out2 = out + "_fresh"
    shutil.copytree(out, out2)
    report3 = run_media_dedup(inp, out2, "audio", resume=False)
    assert not report3["sig_resumed"]
    assert report3["n_pairs"] == _report["n_pairs"]


def test_media_job_tier_artifacts(sf_small, aud_job):
    """The job's tiers/ table equals the direct tier pipeline and the
    report histogram reconciles with it."""
    inp, out, report = aud_job
    assert os.path.isdir(os.path.join(out, "tiers"))
    got = pq.read_table(os.path.join(out, "tiers")).to_pandas()
    got = got.sort_values("audio_id").reset_index(drop=True)
    want = ad.audio_dedup_tiers(
        ad.audio_tier_signatures(ad.load_audios(sf_small))).to_pandas()
    want = want.sort_values("audio_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    hist = report["tier_hist"]
    assert set(hist) == {"byte", "fpset", "near", "unique"}
    assert sum(hist.values()) == len(got)
    assert hist == got["tier"].value_counts().to_dict()
