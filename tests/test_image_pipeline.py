"""Golden tests: the Ray pipelines == the single-process oracle on sf-small
(SURVEY.md §5.2), plus per-row fixture invariants (PSNR / caption / keeper)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from deduplicator_ray import codecs, fixtures, hashing, oracle
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.pipelines import image_dedup as ip

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def corpus(sf_small):
    return pq.read_table(fixtures.images_path(sf_small, CFG.hash_size))


@pytest.fixture(scope="module")
def truth(sf_small):
    return pq.read_table(fixtures.truth_path(sf_small, CFG.hash_size))


@pytest.fixture(scope="module")
def oracle_rows(corpus):
    return oracle.compute_rows(corpus, CFG)


@pytest.fixture(scope="module")
def images_ds(sf_small):
    return ip.load_images(sf_small, CFG)


def test_fixture_psnr_invariant(corpus, truth):
    """Per-row invariant (input_hint): noisy members decode within the
    recorded PSNR band of their source; exact/reencode decode identical."""
    rows = corpus.to_pylist()
    by_id = {r["image_id"]: r for r in rows}
    tr = truth.to_pylist()
    decoded = {}

    def dec(r):
        if r["image_id"] not in decoded:
            decoded[r["image_id"]] = codecs.decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        return decoded[r["image_id"]]

    checked = 0
    for t in tr:
        if t["kind"] not in ("exact", "reencode", "noisy"):
            continue
        src = by_id[t["source_id"]]
        cur = by_id[t["image_id"]]
        a, b = dec(src), dec(cur)
        p = fixtures.psnr(a, b)
        if t["kind"] in ("exact", "reencode"):
            assert p == float("inf")
        else:
            assert p >= 35.0, (t["image_id"], p)
            assert abs(p - t["psnr_db"]) < 1e-9
        checked += 1
    assert checked > 50


def test_stored_phash_matches_recompute(corpus, truth):
    stale = {t["image_id"] for t in truth.to_pylist() if t["phash_stale"]}
    corrupt = {t["image_id"] for t in truth.to_pylist() if t["kind"] == "corrupt"}
    for r in corpus.to_pylist():
        if r["image_id"] in stale or r["image_id"] in corrupt:
            continue
        img = codecs.decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        assert hashing.u64_to_i64(hashing.dhash_u64(img)) == r["phash"]


def test_reference_clusters_match_oracle(images_ds, oracle_rows):
    oc = oracle.reference_clusters(oracle_rows, CFG)
    rc = ip.reference_clusters(images_ds, CFG).to_pandas()
    ray_map = {}
    for _, r in rc.iterrows():
        ray_map.setdefault(int(r["dhash"]), []).append(r["image_id"])
    ray_map = {k: sorted(v) for k, v in ray_map.items()}
    assert ray_map == oc


def test_reference_decisions_match_oracle(images_ds, oracle_rows):
    od = oracle.reference_decisions(oracle_rows, CFG)
    dec = ip.reference_decisions(images_ds, CFG).to_pandas()
    assert set(dec.loc[dec.action == "keep", "image_id"]) == {d["keeper"] for d in od}
    assert set(dec.loc[dec.action == "delete", "image_id"]) == {
        x for d in od for x in d["deletions"]
    }


def test_keeper_matches_fixture_truth(images_ds, truth):
    """expected_keeper ground truth (computed independently at generation
    time from the reference ranking) agrees with the pipeline election for
    clusters that coincide with truth groups."""
    dec = ip.reference_decisions(images_ds, CFG).to_pandas()
    keepers = set(dec.loc[dec.action == "keep", "image_id"])
    tr = truth.to_pylist()
    by_gid = {}
    for t in tr:
        by_gid.setdefault(t["group_id"], []).append(t)
    agree = disagree = 0
    for gid, members in by_gid.items():
        expected = [t["image_id"] for t in members if t["expected_keeper"]]
        if not expected:
            continue
        # only compare when the pipeline found a cluster containing exactly
        # the non-corrupt same-dhash members (kinds exact/reencode collide)
        if expected[0] in keepers:
            agree += 1
        else:
            ids = {t["image_id"] for t in members}
            if ids & keepers:
                disagree += 1
    assert agree > 20
    assert disagree == 0


def test_dead_letter_rows(images_ds, truth):
    bad = ip.dead_letter(ip.fingerprints(images_ds, CFG)).to_pandas()
    corrupt = {t["image_id"] for t in truth.to_pylist() if t["kind"] == "corrupt"}
    assert set(bad["image_id"]) == corrupt
    assert (bad["status"] == "error").all()


def test_zero_hash_skipped(images_ds, truth, oracle_rows):
    degen = {t["image_id"] for t in truth.to_pylist() if t["kind"] == "degenerate"}
    assert degen, "fixture must contain degenerate groups"
    # degenerate constant images hash to 0 and must not appear in any cluster
    zero_rows = {r["image_id"] for r in oracle_rows if r["dhash"] == 0}
    assert degen <= zero_rows
    rc = ip.reference_clusters(images_ds, CFG).to_pandas()
    assert not (set(rc["image_id"]) & degen)


def test_extended_pairs_recall_and_precision(images_ds, oracle_rows):
    """The north-star gate: dup-pair recall ≥ 0.99 vs all-pairs oracle at the
    same signature config (BASELINE.json)."""
    op = oracle.verified_pairs(oracle_rows, CFG)
    pairs = ip.dup_pairs(images_ds, CFG).to_pandas()
    rp = set(zip(pairs["src"], pairs["dst"]))
    inter = rp & op
    recall = len(inter) / max(1, len(op))
    precision = len(inter) / max(1, len(rp))
    assert recall >= 0.99, recall
    assert precision >= 0.99, precision


def test_extended_clusters_match_oracle_cc(images_ds, oracle_rows):
    op = oracle.verified_pairs(oracle_rows, CFG)
    occ = oracle.connected_components(op)
    cl = ip.extended_clusters(images_ds, CFG).to_pandas()
    assert dict(zip(cl["image_id"], cl["cluster_id"])) == occ


def test_extended_decisions_shape(images_ds):
    dec = ip.extended_decisions(images_ds, CFG).to_pandas()
    assert len(dec) > 0
    # one keeper per cluster, rename targets formatted {hash}_{crc}.{ext}
    per = dec.groupby("cluster_id")["action"].apply(lambda s: (s == "keep").sum())
    assert (per == 1).all()
    keeps = dec[dec.action == "keep"]
    renamed = keeps[keeps.rename_to != ""]
    assert renamed["rename_to"].str.match(r"^[0-9a-f]{16}_[0-9A-F]{8}\.\w+$").all()


def test_distributed_cc_contraction_path():
    """Force the multi-level edge-contraction path (cc_driver_edge_cap=0 makes
    the driver base case unreachable) on an adversarial graph — a long chain
    (O(diameter) for plain label propagation), two cliques bridged to it,
    duplicate and self edges — and require exact agreement with the
    single-process union-find oracle."""
    import dataclasses

    import ray.data as rd
    from deduplicator_ray.stages.components import connected_components

    edges = []
    chain = [f"c{i:03d}" for i in range(40)]
    edges += list(zip(chain, chain[1:]))
    kq = [f"k{i}" for i in range(6)]
    edges += [(a, b) for i, a in enumerate(kq) for b in kq[i + 1:]]
    edges += [("k0", "c000")]                     # bridge clique→chain
    edges += [("z1", "z2"), ("z2", "z3")]         # separate small component
    edges += [("c005", "c004"), ("z3", "z3")]     # reversed dup + self edge
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])

    cfg = dataclasses.replace(PipelineConfig(), cc_driver_edge_cap=0)
    got = connected_components(ds, cfg, num_partitions=4).to_pandas()
    want = oracle.connected_components(
        {(min(a, b), max(a, b)) for a, b in edges if a != b})
    assert dict(zip(got["image_id"], got["cluster_id"])) == want


def test_cc_empty_and_driver_base_case():
    import ray.data as rd
    import pyarrow as pa
    from deduplicator_ray.stages.components import connected_components

    empty = rd.from_arrow(pa.Table.from_pydict(
        {"src": [], "dst": []},
        schema=pa.schema([("src", pa.string()), ("dst", pa.string())])))
    out = connected_components(empty, CFG).to_pandas()
    assert len(out) == 0  # ray drops column metadata on empty to_pandas

    ds = rd.from_items([{"src": "a", "dst": "b"}, {"src": "b", "dst": "c"}])
    out = connected_components(ds, CFG).to_pandas()
    assert dict(zip(out["image_id"], out["cluster_id"])) == {
        "a": "a", "b": "a", "c": "a"}


def test_montage_and_concat(images_ds):
    """S7 montage-sink analog + the GUI concat action (compare.py:493-515),
    as per-cluster map_groups stages over the engine codecs."""
    import pandas as pd

    from deduplicator_ray import codecs
    from deduplicator_ray.pipelines.multimodal import (
        ConcatImages, MontageImages, montage_pipeline)

    clusters = ip.extended_clusters(images_ds, CFG)
    out = montage_pipeline(ip.load_images("/root/testdata/sf0.001", CFG),
                           clusters).to_pandas()
    assert len(out) > 0
    ok = out[out["status"] != "error"]
    assert len(ok) > 0
    # every montage decodes to the declared grid size
    r = ok.iloc[0]
    img = codecs.decode_image(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
    assert img.shape == (r["h"], r["w"], 3)
    assert (ok["w"] % 32 == 0).all() and (ok["h"] % 32 == 0).all()

    # concat: deterministic horizontal stack of one cluster's members
    members = ip.load_images("/root/testdata/sf0.001", CFG).to_pandas()
    cl = clusters.to_pandas()
    cid = cl["cluster_id"].iloc[0]
    sub = members[members["image_id"].isin(
        cl[cl["cluster_id"] == cid]["image_id"])].copy()
    sub["cluster_id"] = cid
    cat = ConcatImages("h")(sub)
    assert len(cat) == 1 and cat.iloc[0]["status"] == "ok"
    c = cat.iloc[0]
    img = codecs.decode_image(c["bytes"], c["fmt"], int(c["w"]), int(c["h"]))
    assert img.shape[1] >= int(sub.iloc[0]["w"])  # wider than any one member
