"""Video frame-level near-dup: vcon codec, VideoFrames stage, stop-frame
cap semantics, pair/cluster golden checks vs a pandas recompute of the
Ray-free frames sidecar."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from deduplicator_ray import codecs, fixtures, hashing
from deduplicator_ray.pipelines import video_dedup as vd


def _png(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return codecs.encode_png(rng.integers(0, 256, (16, 16, 3), np.uint8))


def test_vcon_roundtrip_and_corruption():
    frames = [_png(1), b"x" * 3, b""]
    blob = codecs.encode_vcon(frames)
    assert codecs.decode_vcon(blob) == frames
    for bad in (None, b"", b"nope", blob[:-1], codecs.VCON_MAGIC + b"\xff\xff\xff\xff"):
        with pytest.raises(codecs.CodecError):
            codecs.decode_vcon(bad)


def test_video_frames_stage_kernel_and_dead_letter():
    f1, f2 = _png(10), _png(11)
    batch = pa.table({
        "video_id": ["v/a.vcon", "v/bad.vcon"],
        "bytes": [codecs.encode_vcon([f1, f2]),
                  codecs.VCON_MAGIC + b"\xff\xff\xff\xff trunc"],
    })
    out = vd.VideoFrames()(batch).to_pandas()
    ok = out[out["status"] == "ok"]
    assert list(ok["frame_idx"]) == [0, 1]
    want = [hashing.dhash_u64(codecs.decode_image(f, "png", 0, 0))
            for f in (f1, f2)]
    got = ok["frame_fp"].to_numpy().view(np.uint64).tolist()
    assert got == want
    dead = out[out["video_id"] == "v/bad.vcon"]
    assert len(dead) == 1 and dead.iloc[0]["frame_idx"] == -1
    assert dead.iloc[0]["status"].startswith("error:CodecError")
    # a corrupt FRAME inside a valid container dead-letters the video too
    out2 = vd.VideoFrames()(pa.table({
        "video_id": ["v/c.vcon"],
        "bytes": [codecs.encode_vcon([f1, b"not a png"])]})).to_pandas()
    assert list(out2["status"].str.startswith("error:")) == [True]


def _frames_ds(rows):
    return rd.from_arrow(pa.Table.from_pydict(
        {"video_id": [r[0] for r in rows],
         "frame_idx": np.arange(len(rows), dtype=np.int32),
         "frame_fp": np.asarray([r[1] for r in rows], np.int64),
         "status": ["ok"] * len(rows)},
        schema=vd.FRAME_SCHEMA))


def test_stop_frame_cap_drops_hot_fp_from_intersection_and_union():
    # v1,v2 share fps {1,2}; ALL videos share hot fp 99
    rows = [("v1", 1), ("v1", 2), ("v1", 99),
            ("v2", 1), ("v2", 2), ("v2", 99),
            ("v3", 5), ("v3", 99), ("v4", 6), ("v4", 99)]
    # cap=3 < df(99)=4: fp 99 is a stop frame — v3/v4 pair with nobody,
    # and v1-v2 Jaccard counts only {1,2} in BOTH intersection and union
    got = (vd.video_dup_pairs(_frames_ds(rows), tau_e6=500_000, max_fp_df=3)
           .to_pandas().sort_values(["video_id_a", "video_id_b"])
           .reset_index(drop=True))
    assert list(got["video_id_a"]) == ["v1"]
    assert list(got["video_id_b"]) == ["v2"]
    assert got.iloc[0]["n_shared"] == 2
    assert got.iloc[0]["size_a"] == 2 and got.iloc[0]["size_b"] == 2
    assert got.iloc[0]["jaccard_e6"] == 1_000_000
    # cap lifted: hot fp counts — v3-v4 now share 1/3 (< 0.5, rejected),
    # all v1..v4 pairs via fp 99 with low jaccard except v1-v2
    got2 = (vd.video_dup_pairs(_frames_ds(rows), tau_e6=500_000,
                               max_fp_df=10).to_pandas())
    assert set(zip(got2["video_id_a"], got2["video_id_b"])) == {("v1", "v2")}
    assert got2.iloc[0]["n_shared"] == 3


def test_video_dup_pairs_empty_and_all_dead():
    empty = rd.from_arrow(pa.Table.from_pydict(
        {"video_id": [], "frame_idx": [], "frame_fp": [], "status": []},
        schema=vd.FRAME_SCHEMA))
    assert vd.video_dup_pairs(empty).count() == 0
    dead = rd.from_arrow(pa.Table.from_pydict(
        {"video_id": ["v"], "frame_idx": np.asarray([-1], np.int32),
         "frame_fp": np.asarray([0], np.int64), "status": ["error:x"]},
        schema=vd.FRAME_SCHEMA))
    assert vd.video_dup_pairs(dead).count() == 0


def _sidecar_oracle(sf_small, tau_e6=vd.TAU_E6_DEFAULT,
                    cap=vd.MAX_FP_DF_DEFAULT):
    F = pq.read_table(os.path.join(
        fixtures.video_frames_path(sf_small), "frames.parquet")).to_pandas()
    d = F.drop_duplicates(["frame_fp", "video_id"])
    live = d[d.groupby("frame_fp")["video_id"].transform("size") <= cap]
    sizes = live.groupby("video_id").size()
    m = live.merge(live, on="frame_fp")
    m = m[m.video_id_x < m.video_id_y]
    ns = (m.groupby(["video_id_x", "video_id_y"]).size()
          .rename("n_shared").reset_index())
    ns["size_a"] = ns.video_id_x.map(sizes).astype(np.int64)
    ns["size_b"] = ns.video_id_y.map(sizes).astype(np.int64)
    un = ns.size_a + ns.size_b - ns.n_shared
    ns["jaccard_e6"] = (ns.n_shared * 1_000_000 // un).astype(np.int64)
    out = ns[ns.n_shared * 1_000_000 >= tau_e6 * un].rename(
        columns={"video_id_x": "video_id_a", "video_id_y": "video_id_b"})
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["video_id_a", "video_id_b"]).reset_index(drop=True)


def test_video_dup_pairs_matches_sidecar_oracle(sf_small):
    frames = vd.video_frames(vd.load_videos(sf_small))
    got = (vd.video_dup_pairs(frames).to_pandas()
           .sort_values(["video_id_a", "video_id_b"]).reset_index(drop=True))
    want = _sidecar_oracle(sf_small)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # fixture structure: re-encodes (different bytes, same pixels) and
    # clips match; teasers (3/10 jaccard) are candidates but REJECTED
    both = pd.concat([got["video_id_a"], got["video_id_b"]])
    assert any(b.startswith("vid/re") for b in both)
    assert any(b.startswith("vid/clip") for b in both)
    assert not any(b.startswith("vid/teaser") for b in got["video_id_b"])
    assert not any(a.startswith("vid/teaser") for a in got["video_id_a"])
    assert len(got) > 0


def test_video_clusters_match_union_find(sf_small):
    frames = vd.video_frames(vd.load_videos(sf_small))
    got = vd.video_clusters(frames).to_pandas()
    pairs = _sidecar_oracle(sf_small)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["video_id_a"], pairs["video_id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    # engine labels components by min member id (same as the union-find)
    assert dict(zip(got["video_id"], got["cluster_id"])) == want


def test_video_sample_weights_and_leakage_split(sf_small):
    """Training-loader surfaces: every decodable video appears exactly
    once; family size equals its cluster size (singletons weigh 1e6);
    all members of a component share one split and the bucket is the
    engine-portable md5-prefix hash of the split key."""
    import hashlib

    frames = vd.video_frames(vd.load_videos(sf_small))
    labels = vd.video_clusters(frames).to_pandas()
    wts = vd.video_sample_weights(frames).to_pandas()
    spl = vd.video_leakage_split(frames).to_pandas()

    live = set(pq.read_table(
        os.path.join(fixtures.video_frames_path(sf_small),
                     "frames.parquet"),
        columns=["video_id"])["video_id"].to_pylist())
    assert set(wts["video_id"]) == live and len(wts) == len(live)
    assert set(spl["video_id"]) == live and len(spl) == len(live)

    lmap = dict(zip(labels["video_id"], labels["cluster_id"]))
    sizes = labels.groupby("cluster_id").size()
    for vid, key, fam, w in zip(wts["video_id"], wts["weight_key"],
                                wts["family_size"], wts["weight_e6"]):
        assert key == lmap.get(vid, vid)
        assert fam == (sizes[key] if vid in lmap else 1)
        assert w == 1_000_000 // fam
    assert (wts["family_size"] > 1).any()

    smap = dict(zip(spl["video_id"], spl["split"]))
    for vid, key, bucket, split in zip(spl["video_id"], spl["split_key"],
                                       spl["bucket"], spl["split"]):
        assert key == lmap.get(vid, vid)
        want = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 100
        assert bucket == want
        assert split == ("train" if bucket < 90 else "val")
    for vid, cl in lmap.items():
        assert smap[vid] == smap[cl]
