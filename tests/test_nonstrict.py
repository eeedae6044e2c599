"""Non-strict mode (the reference's strict switch, /root/reference/
dupedb.py:82-98): video/animated containers fingerprint by frame-0 dHash
instead of md5 byte identity, and the frames quality signal is REAL —
the animation-wins keeper rule (makeImageSortTuple -frames,
/root/reference/dedupc.py:62-68) can fire."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deduplicator_ray import codecs, fixtures, hashing, mirrors, oracle
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.decode_hash import make_decode_hash


def _vcon_table():
    rng = np.random.default_rng(7)

    def img(w, h):
        return rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)

    f0, f1, f2 = img(40, 30), img(40, 30), img(40, 30)
    v1 = codecs.encode_vcon([codecs.encode_png(x, 1) for x in (f0, f1, f2)])
    v2 = codecs.encode_vcon([codecs.encode_png(x, 6) for x in (f0, f1, f2)])
    v3 = codecs.encode_vcon([codecs.encode_png(f0, 1)])
    still = codecs.encode_png(f0, 1)
    return pa.table({
        "image_id": ["a/v1.vcon", "a/v2.vcon", "a/v3.vcon", "a/still.png"],
        "bytes": [v1, v2, v3, still],
        "w": pa.array([40] * 4, pa.int32()),
        "h": pa.array([30] * 4, pa.int32()),
        "fmt": ["vcon", "vcon", "vcon", "png"],
        "caption": [""] * 4,
        "phash": pa.array([0] * 4, pa.int64()),
    })


@pytest.mark.parametrize("strict", [True, False])
def test_vcon_decode_modes_match_oracle(strict):
    """Engine batch kernel ≡ oracle on every container branch; strict
    video (vcon) → md5 regardless of frame count (the reference's isVideo
    branch md5s EVERY video in strict mode, dupedb.py:88-90 — the
    framesInImage>1 gate belongs to animated images only), non-strict →
    frame-0 dHash (re-encode DOES match; single-frame clip ≡ still)."""
    tbl = _vcon_table()
    cfg = PipelineConfig(strict=strict)
    out = make_decode_hash(cfg)(tbl)
    d = {i: (s, p, f) for i, s, p, f in zip(
        out["image_id"].to_pylist(), out["status"].to_pylist(),
        out["proc_hash"].to_pylist(), out["frames"].to_pylist())}
    recs = {r["image_id"]: r for r in oracle.compute_rows(tbl, cfg)}
    for k, (st, ph, fr) in d.items():
        assert st == recs[k]["status"]
        assert ph == (recs[k]["proc_hash"] or "")
        assert fr == recs[k]["frames"]
    assert d["a/v1.vcon"][2] == 3 and d["a/v3.vcon"][2] == 1
    if strict:
        assert d["a/v1.vcon"][0] == "md5_only"
        assert d["a/v1.vcon"][1] != d["a/v2.vcon"][1]
        # strict treats even a single-frame clip as video → byte identity
        assert d["a/v3.vcon"][0] == "md5_only"
        assert d["a/v3.vcon"][1] != d["a/still.png"][1]
    else:
        assert d["a/v1.vcon"][0] == "ok"
        assert d["a/v1.vcon"][1] == d["a/v2.vcon"][1]
        # non-strict single-frame container ≡ its still
        assert d["a/v3.vcon"][0] == "ok"
        assert d["a/v3.vcon"][1] == d["a/still.png"][1]


def test_reencoded_video_matches_only_nonstrict(sf_small):
    """Corpus-level contrast: each family's re-encoded video (_p2.vcon)
    co-clusters with its base in NON-strict mode and never in strict."""
    import __ray_entry__ as e
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    ns = e._img_reference_clusters_nonstrict(sf_small)
    by_id_ns = dict(zip(ns["image_id"], ns["proc_hash"]))
    cfg = PipelineConfig()  # strict default
    strict_out = ip.reference_clusters(
        e._ns_union(sf_small, cfg), cfg).to_pandas()
    by_id_st = dict(zip(strict_out["image_id"], strict_out["proc_hash"]))

    ids = dio.read_parquet(fixtures.nonstrict_images_path(sf_small),
                           columns=["image_id"]).to_pandas()["image_id"]
    bases = [i for i in ids if i.endswith(".vcon")
             and not i.endswith("_p2.vcon") and "_clip" not in i
             and "_bad" not in i and " (2)" not in i]
    n_ns = n_st = 0
    for b in bases:
        re_id = b[:-5] + "_p2.vcon"
        if re_id not in set(ids):
            continue
        if (b in by_id_ns and re_id in by_id_ns
                and by_id_ns[b] == by_id_ns[re_id]):
            n_ns += 1
        if (b in by_id_st and re_id in by_id_st
                and by_id_st[b] == by_id_st[re_id]):
            n_st += 1
    assert n_ns > 0, "no re-encode pair co-clustered in non-strict mode"
    assert n_st == 0, "strict mode must not match byte-distinct re-encodes"


def test_multiframe_beats_higher_res_poster(sf_small):
    """Animation-wins keeper rule with REAL frame counts: in a non-strict
    bucket holding a 3-frame container and its 4×-pixel single-frame
    poster, the container is the keeper (frames leads the quality tuple)."""
    import __ray_entry__ as e

    dec = e._img_nonstrict_decisions(sf_small)
    hit = 0
    for cid, g in dec.groupby("cluster_id"):
        members = list(g["image_id"])
        posters = [m for m in members if m.endswith("_poster.png")]
        vcons = [m for m in members if m.endswith(".vcon")]
        if posters and vcons:
            keepers = g[g["action"] == "keep"]["image_id"].tolist()
            assert len(keepers) == 1
            assert keepers[0].endswith(".vcon"), (
                f"poster out-ranked the multi-frame member in {cid}")
            hit += 1
    assert hit > 0, "no poster+container bucket found (fixture vacuous)"


def test_nonstrict_mirrors_value_match(sf_small):
    """Engine == DuckDB for both non-strict queries at sf0.001 (the same
    rows+schema+value mechanism the driver applies at sf0.01)."""
    import __ray_entry__ as e

    cfg = PipelineConfig()
    kw = dict(
        hashes=fixtures.hashes_path(sf_small, cfg.hash_size) + "/*.parquet",
        images=fixtures.images_path(sf_small, cfg.hash_size) + "/*.parquet",
        ns_hashes=fixtures.nonstrict_hashes_path(sf_small) + "/*.parquet",
        shingle_k=cfg.shingle_k, jaccard_min=cfg.jaccard_min,
        hamming_max=cfg.hamming_max)

    eng = e._img_reference_clusters_nonstrict(sf_small)
    orc = duckdb.sql(
        mirrors.compose(mirrors.REFERENCE_CLUSTERS_SQL, **kw)).df()
    pd.testing.assert_frame_equal(
        eng.sort_values(list(eng.columns)).reset_index(drop=True),
        orc.sort_values(list(orc.columns)).reset_index(drop=True))

    eng2 = e._img_nonstrict_decisions(sf_small)
    orc2 = duckdb.sql(mirrors.compose(
        mirrors.REFERENCE_DECISIONS_SQL,
        ns_images=fixtures.nonstrict_images_path(sf_small) + "/*.parquet",
        **kw)).df()
    pd.testing.assert_frame_equal(
        eng2.sort_values(list(eng2.columns)).reset_index(drop=True),
        orc2.sort_values(list(orc2.columns)).reset_index(drop=True))


def test_animated_gif_hits_both_branches_per_mode(sf_small):
    """REAL animated-image semantics end-to-end (gif LZW native): the
    byte-distinct delay-variant sibling (identical frames) co-clusters
    with its animated base ONLY in non-strict mode; the single-frame gif
    of the same art hashes perceptually in BOTH modes (framesInImage>1
    gate) and so matches the animation in non-strict mode only."""
    import __ray_entry__ as e
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    ns = e._img_reference_clusters_nonstrict(sf_small)
    by_ns = dict(zip(ns["image_id"], ns["proc_hash"]))
    cfg = PipelineConfig()
    st = ip.reference_clusters(e._ns_union(sf_small, cfg), cfg).to_pandas()
    by_st = dict(zip(st["image_id"], st["proc_hash"]))

    ids = dio.read_parquet(fixtures.nonstrict_images_path(sf_small),
                           columns=["image_id"]).to_pandas()["image_id"]
    anims = [i for i in ids if i.endswith("_anim.gif")]
    assert anims, "no gif families in the ns corpus"
    n_pair_ns = n_pair_st = n_still_ns = 0
    for a in anims:
        sib = a.replace("_anim.gif", "_anim2.gif")
        still = a.replace("_anim.gif", "_still.gif")
        if a in by_ns and sib in by_ns and by_ns[a] == by_ns[sib]:
            n_pair_ns += 1
        if a in by_st and sib in by_st and by_st[a] == by_st[sib]:
            n_pair_st += 1
        if a in by_ns and still in by_ns and by_ns[a] == by_ns[still]:
            n_still_ns += 1
    assert n_pair_ns > 0, "delay-variant gif pair missed in non-strict"
    assert n_pair_st == 0, "strict mode matched byte-distinct gifs"
    assert n_still_ns > 0, "still gif did not join its animation's bucket"

    # frames signal is REAL for gif: decisions rank the 3-frame member
    # above its single-frame still in non-strict buckets
    dec = e._img_nonstrict_decisions(sf_small)
    checked = 0
    for cid, g in dec.groupby("cluster_id"):
        members = set(g["image_id"])
        a = [m for m in members if m.endswith("_anim.gif")
             or m.endswith("_anim2.gif")]
        s = [m for m in members if m.endswith("_still.gif")]
        if a and s:
            keeper = g[g["action"] == "keep"]["image_id"].iloc[0]
            assert not keeper.endswith("_still.gif"), cid
            checked += 1
    assert checked > 0


def test_strict_mode_diff_semantics(sf_small):
    """Mode-migration report: every multi-frame container differs
    (strict md5 vs frame-0 dHash), every vcon differs regardless of
    frame count (the video class md5s unconditionally in strict mode,
    dupedb.py:88-90), single-frame GIFs agree (dHash in both modes),
    corrupt containers are absent, and the relation value-matches the
    two-sidecar mirror join."""
    import __ray_entry__ as e
    import duckdb as _duck

    out = e._img_strict_mode_diff(sf_small)
    assert len(out) > 0
    is_vcon = out["image_id"].str.endswith(".vcon")
    multi = out[out["frames"] > 1]
    single_gif = out[(out["frames"] == 1) & ~is_vcon]
    single_vcon = out[(out["frames"] == 1) & is_vcon]
    assert len(multi) > 0 and len(single_gif) > 0 and len(single_vcon) > 0
    assert (multi["differs"] == 1).all()
    assert (single_vcon["differs"] == 1).all()
    assert (single_gif["differs"] == 0).all()
    assert (single_gif["strict_hash"] == single_gif["nonstrict_hash"]).all()
    assert not out["image_id"].str.contains("_bad").any()

    sql = f"""
        SELECT s.image_id, s.proc_hash AS strict_hash,
               n.proc_hash AS nonstrict_hash,
               CAST(n.frames AS BIGINT) AS frames,
               CAST(s.proc_hash != n.proc_hash AS BIGINT) AS differs
        FROM '{fixtures.nonstrict_hashes_path(sf_small, strict=True)}/*.parquet' s
        JOIN '{fixtures.nonstrict_hashes_path(sf_small)}/*.parquet' n
          USING (image_id)
        JOIN '{fixtures.nonstrict_images_path(sf_small)}/*.parquet' i
          USING (image_id)
        WHERE i.fmt IN ('vcon', 'gif')
          AND s.status IN ('ok', 'md5_only') AND n.status = 'ok'
        ORDER BY image_id
    """
    orc = _duck.sql(sql).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), orc.reset_index(drop=True))
