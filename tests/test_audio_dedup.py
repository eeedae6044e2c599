"""Audio waveform-level near-dup: acon codec, band-energy-sign fingerprint
kernel (gain + lossless-re-encode invariance), AudioSignatures stage,
stop-fp cap semantics, pair/cluster golden checks vs a pandas recompute of
the Ray-free fps sidecar."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from deduplicator_ray import codecs, fixtures
from deduplicator_ray.pipelines import audio_dedup as ad


def _pcm(seed: int, n: int = 4 * ad.WINDOW) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.clip(rng.standard_normal(n) * 6000, -32000, 32000) \
        .astype(np.int16)


def test_acon_roundtrip_and_corruption():
    s = _pcm(3)
    for codec in (codecs.ACON_CODEC_RAW, codecs.ACON_CODEC_DELTA):
        blob = codecs.encode_acon(s, 16000, codec)
        rate, out = codecs.decode_acon(blob)
        assert rate == 16000
        assert np.array_equal(out, s)
    raw = codecs.encode_acon(s, 16000, codecs.ACON_CODEC_RAW)
    delta = codecs.encode_acon(s, 16000, codecs.ACON_CODEC_DELTA)
    assert raw != delta  # the re-encode class: different bytes, same PCM
    for bad in (None, b"", b"nope", raw[:-1], raw + b"x",
                codecs.ACON_MAGIC + b"\x00"):
        with pytest.raises(codecs.CodecError):
            codecs.decode_acon(bad)
    # int16 extremes survive the delta wraparound
    edge = np.array([32767, -32768, 0, -1, 1], np.int16)
    blob = codecs.encode_acon(edge, 8000, codecs.ACON_CODEC_DELTA)
    assert np.array_equal(codecs.decode_acon(blob)[1], edge)


def test_window_fp_kernel_properties():
    s = _pcm(7)
    fps = ad.audio_window_fps(s)
    assert len(fps) == 4
    assert np.array_equal(fps, ad.audio_window_fps(s))   # deterministic
    assert (fps >= 0).all() and (fps < (1 << ad.N_BANDS)).all()
    # tail remainder dropped, whole windows unaffected
    assert np.array_equal(ad.audio_window_fps(s[:-100]), fps[:3])
    assert len(ad.audio_window_fps(s[:10])) == 0
    # gain invariance (Haitsma-Kalker band-ORDER bits): halving every
    # sample scales every band energy by ~1/4 and flips nothing
    assert np.array_equal(ad.audio_window_fps((s // 2).astype(np.int16)),
                          fps)
    # digital silence fingerprints to 0 (the hot/stop fp)
    assert ad.audio_window_fps(np.zeros(ad.WINDOW, np.int16)).tolist() == [0]


def test_signature_stage_kernel_and_dead_letter():
    s = _pcm(10)
    batch = pa.table({
        "audio_id": ["a/x.acon", "a/bad.acon", "a/null.acon"],
        "bytes": [codecs.encode_acon(s, ad.WINDOW, codecs.ACON_CODEC_DELTA),
                  codecs.ACON_MAGIC + b"\x00\xff trunc", None],
    })
    out = ad.AudioSignatures()(batch).to_pandas()
    ok = out[out["status"] == "ok"]
    assert list(ok["win_idx"]) == [0, 1, 2, 3]
    assert ok["win_fp"].tolist() == ad.audio_window_fps(s).tolist()
    dead = out[out["status"] != "ok"]
    assert len(dead) == 2
    assert (dead["win_idx"] == -1).all()
    assert dead["status"].str.startswith("error:CodecError").all()


def _sigs_ds(rows):
    return rd.from_arrow(pa.Table.from_pydict(
        {"audio_id": [r[0] for r in rows],
         "win_idx": np.arange(len(rows), dtype=np.int32),
         "win_fp": np.asarray([r[1] for r in rows], np.int64),
         "status": ["ok"] * len(rows)},
        schema=ad.SIG_SCHEMA))


def test_stop_fp_cap_drops_hot_fp_from_intersection_and_union():
    rows = [("a1", 1), ("a1", 2), ("a1", 99),
            ("a2", 1), ("a2", 2), ("a2", 99),
            ("a3", 5), ("a3", 99), ("a4", 6), ("a4", 99)]
    got = (ad.audio_dup_pairs(_sigs_ds(rows), tau_e6=500_000, max_fp_df=3)
           .to_pandas().sort_values(["audio_id_a", "audio_id_b"])
           .reset_index(drop=True))
    assert list(got["audio_id_a"]) == ["a1"]
    assert list(got["audio_id_b"]) == ["a2"]
    assert got.iloc[0]["n_shared"] == 2
    assert got.iloc[0]["jaccard_e6"] == 1_000_000
    got2 = ad.audio_dup_pairs(_sigs_ds(rows), tau_e6=500_000,
                              max_fp_df=10).to_pandas()
    assert set(zip(got2["audio_id_a"], got2["audio_id_b"])) == {("a1", "a2")}
    assert got2.iloc[0]["n_shared"] == 3


def _sidecar_oracle(sf_small, tau_e6=ad.TAU_E6_DEFAULT,
                    cap=ad.MAX_FP_DF_DEFAULT):
    F = pq.read_table(os.path.join(
        fixtures.audio_fps_path(sf_small), "fps.parquet")).to_pandas()
    d = F.drop_duplicates(["win_fp", "audio_id"])
    live = d[d.groupby("win_fp")["audio_id"].transform("size") <= cap]
    sizes = live.groupby("audio_id").size()
    m = live.merge(live, on="win_fp")
    m = m[m.audio_id_x < m.audio_id_y]
    ns = (m.groupby(["audio_id_x", "audio_id_y"]).size()
          .rename("n_shared").reset_index())
    ns["size_a"] = ns.audio_id_x.map(sizes).astype(np.int64)
    ns["size_b"] = ns.audio_id_y.map(sizes).astype(np.int64)
    un = ns.size_a + ns.size_b - ns.n_shared
    ns["jaccard_e6"] = (ns.n_shared * 1_000_000 // un).astype(np.int64)
    out = ns[ns.n_shared * 1_000_000 >= tau_e6 * un].rename(
        columns={"audio_id_x": "audio_id_a", "audio_id_y": "audio_id_b"})
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["audio_id_a", "audio_id_b"]).reset_index(drop=True)


def test_audio_dup_pairs_matches_sidecar_oracle(sf_small):
    sigs = ad.audio_signatures(ad.load_audios(sf_small))
    got = (ad.audio_dup_pairs(sigs).to_pandas()
           .sort_values(["audio_id_a", "audio_id_b"]).reset_index(drop=True))
    want = _sidecar_oracle(sf_small)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # fixture structure: lossless re-encodes (delta codec — different
    # bytes, identical PCM) and clips match; teasers (3/10) are rejected
    both = pd.concat([got["audio_id_a"], got["audio_id_b"]])
    assert any(b.startswith("aud/re") for b in both)
    assert any(b.startswith("aud/clip") for b in both)
    assert not any(b.startswith("aud/teaser") for b in both)
    assert len(got) > 0
    # a re-encode pair is exact: jaccard 1.0
    re_rows = got[got["audio_id_b"].str.startswith("aud/re")]
    assert (re_rows["jaccard_e6"] == 1_000_000).all() and len(re_rows) > 0


def test_audio_clusters_match_union_find(sf_small):
    sigs = ad.audio_signatures(ad.load_audios(sf_small))
    got = ad.audio_clusters(sigs).to_pandas()
    pairs = _sidecar_oracle(sf_small)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["audio_id_a"], pairs["audio_id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert dict(zip(got["audio_id"], got["cluster_id"])) == want


def test_audio_sample_weights_and_leakage_split(sf_small):
    """Training-loader surfaces over the audio corpus (the audio twin of
    the video test): one row per decodable recording, family size =
    component size, shared split per component, portable bucket hash."""
    import hashlib

    sigs = ad.audio_signatures(ad.load_audios(sf_small))
    labels = ad.audio_clusters(sigs).to_pandas()
    wts = ad.audio_sample_weights(sigs).to_pandas()
    spl = ad.audio_leakage_split(sigs).to_pandas()

    live = set(pq.read_table(
        os.path.join(fixtures.audio_fps_path(sf_small), "fps.parquet"),
        columns=["audio_id"])["audio_id"].to_pylist())
    assert set(wts["audio_id"]) == live and len(wts) == len(live)
    assert set(spl["audio_id"]) == live and len(spl) == len(live)

    lmap = dict(zip(labels["audio_id"], labels["cluster_id"]))
    sizes = labels.groupby("cluster_id").size()
    for aid, key, fam, w in zip(wts["audio_id"], wts["weight_key"],
                                wts["family_size"], wts["weight_e6"]):
        assert key == lmap.get(aid, aid)
        assert fam == (sizes[key] if aid in lmap else 1)
        assert w == 1_000_000 // fam
    assert (wts["family_size"] > 1).any()

    smap = dict(zip(spl["audio_id"], spl["split"]))
    for aid, key, bucket, split in zip(spl["audio_id"], spl["split_key"],
                                       spl["bucket"], spl["split"]):
        assert key == lmap.get(aid, aid)
        want = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 100
        assert bucket == want
        assert split == ("train" if bucket < 90 else "val")
    for aid, cl in lmap.items():
        assert smap[aid] == smap[cl]


def test_wav_reencode_joins_base_cluster(sf_small):
    """The wav stub→native flip end-to-end: a RIFF/WAVE re-encode of a
    base recording (stdlib wave codec — byte-distinct container,
    identical PCM) fingerprints identically and lands in the base's
    cluster at Jaccard 1.0."""
    sigs = ad.audio_signatures(ad.load_audios(sf_small))
    pairs = (ad.audio_dup_pairs(sigs).to_pandas())
    wav_rows = pairs[
        pairs["audio_id_a"].str.endswith(".wav")
        | pairs["audio_id_b"].str.endswith(".wav")]
    assert len(wav_rows) > 0, "no wav member paired (fixture vacuous)"
    exact = wav_rows[
        (wav_rows["audio_id_a"].str.startswith("aud/base")
         & wav_rows["audio_id_b"].str.startswith("aud/wav"))
        | (wav_rows["audio_id_a"].str.startswith("aud/wav")
           & wav_rows["audio_id_b"].str.startswith("aud/base"))]
    # base i and wav i share the identical sample stream
    def _num(x: str, pre: str, suf: str) -> str:
        return x[len(pre):-len(suf)] if x.startswith(pre) else ""

    same = exact[[
        _num(a, "aud/base", ".acon") == _num(b, "aud/wav", ".wav")
        or _num(b, "aud/base", ".acon") == _num(a, "aud/wav", ".wav")
        for a, b in zip(exact["audio_id_a"], exact["audio_id_b"])]]
    assert len(same) > 0
    assert (same["jaccard_e6"] == 1_000_000).all()

    clus = ad.audio_clusters(sigs).to_pandas()
    lab = dict(zip(clus["audio_id"], clus["cluster_id"]))
    hits = 0
    for aid in lab:
        if aid.startswith("aud/wav"):
            base = aid.replace("aud/wav", "aud/base").replace(
                ".wav", ".acon")
            assert lab.get(base) == lab[aid]
            hits += 1
    assert hits > 0
