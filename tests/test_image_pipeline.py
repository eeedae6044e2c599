"""Golden tests: the Ray pipelines == the single-process oracle on sf-small
(SURVEY.md §5.2), plus per-row fixture invariants (PSNR / caption / keeper)."""

import numpy as np
import pyarrow as pa
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
        if r["fmt"] in ("mp4", "flac"):  # stub-codec media: md5-keyed, phash 0
            assert r["phash"] == 0
            continue
        img = codecs.decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        assert hashing.u64_to_i64(hashing.dhash_u64(img)) == r["phash"]


def test_reference_clusters_match_oracle(images_ds, oracle_rows):
    oc = oracle.reference_clusters(oracle_rows, CFG)
    rc = ip.reference_clusters(images_ds, CFG).to_pandas()
    ray_map = {}
    for _, r in rc.iterrows():
        ray_map.setdefault(r["proc_hash"], []).append(r["image_id"])
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
    zero_rows = {r["image_id"] for r in oracle_rows
                 if r["status"] == "ok" and int(r["proc_hash"], 16) == 0}
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
    # 16-hex dhash for image clusters, 32-hex md5 for strict-mode media
    assert renamed["rename_to"].str.match(
        r"^[0-9a-f]{16}([0-9a-f]{16})?_[0-9A-F]{8}\.\w+$").all()


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


def test_hot_image_bucket_collapse_policy():
    """Skew policy unit test: a hot image bucket collapses by exact hash
    (stars at band 0), verifies distinct reps within the cap, and switches
    to exact-hash-only above img_rep_cap (low-information cutoff)."""
    import dataclasses

    from deduplicator_ray.stages.candidates import _collapse_verify

    cfg = dataclasses.replace(CFG, img_rep_cap=8)
    # 3 identical-hash groups of 4 + two near-dup singletons (hamming 1)
    ids, dh = [], []
    base = 0x0F0F0F0F0F0F0F0F
    for gi, h in enumerate([base, base ^ (1 << 20), base ^ (3 << 40)]):
        for m in range(4):
            ids.append(f"g{gi}_m{m}")
            dh.append(h)
    ids += ["s0", "s1"]
    dh += [base ^ 1, base ^ 3]

    edges = _collapse_verify(ids, np.array(dh, dtype=np.int64).tolist(), 0, cfg)
    # stars: every group member linked to its min member
    for gi in range(3):
        for m in range(1, 4):
            assert (f"g{gi}_m0", f"g{gi}_m{m}") in edges
    # rep cross links exist for reps within hamming<=4 owned by band 0
    rep_pairs = [e for e in edges if not e[0].split("_")[0] == e[1].split("_")[0]]
    assert rep_pairs, "expected cross-group rep links"

    # low-information cutoff: >img_rep_cap distinct hashes → stars only
    ids2 = [f"x{i}" for i in range(20)]
    dh2 = [base ^ (i << 8) for i in range(20)]  # 20 distinct hashes, cap 8
    edges2 = _collapse_verify(ids2, dh2, 0, cfg)
    assert edges2 == []  # singleton hash groups, no rep verify above cap


def test_hot_caption_bucket_collapse_policy():
    """Hot caption buckets collapse by exact caption: stars at cap band 0
    for identical captions (unless image-owned), reps re-verified."""
    import pandas as pd

    from deduplicator_ray.stages.candidates import make_partition_verify

    # 300 rows of one caption (> band_group_cap 256) + 3 of another that is
    # a near-dup of the first; dhash distinct (no image ownership)
    capA = "sunset harbor mountain forest river canyon meadow lantern window"
    capB = capA.replace("window", "shadow")
    # place the bucket at the pair's true owner band (first colliding
    # minhash band) so the cross-group rep link is owned here
    from deduplicator_ray.functions import text as textfn
    sA = textfn.minhash_signature(capA, CFG.shingle_k, CFG.num_perm)
    sB = textfn.minhash_signature(capB, CFG.shingle_k, CFG.num_perm)
    bkA = textfn.band_keys(sA[None, :], CFG.bands, CFG.rows_per_band)[0]
    bkB = textfn.band_keys(sB[None, :], CFG.bands, CFG.rows_per_band)[0]
    coll = np.nonzero(bkA == bkB)[0]
    owner = int(coll[0]) if len(coll) else 0
    n = 300
    ids = [f"a{i:03d}" for i in range(n)] + ["b0", "b1", "b2"]
    dh = np.random.default_rng(5).integers(-2**62, 2**62, n + 3).tolist()
    caps = [capA] * n + [capB] * 3
    # two hot buckets: band 0 (owns identical-caption stars) and the pair's
    # owner band (owns the cross-group rep link); same members in both,
    # mirroring real multi-band collisions
    rows = {
        "band": [100] * (n + 3) + [100 + owner] * (n + 3),
        "key": [777] * (n + 3) + [778] * (n + 3),
        "image_id": ids + ids,
        # well-separated hashes (hamming ~32) so no pair is image-owned
        "dhash": dh + dh,
        "caption": caps + caps,
    }
    out = make_partition_verify(CFG)(
        pa.Table.from_pandas(pd.DataFrame(rows))).to_pandas()
    real = out[out["src"] != ""]
    over = out[out["src"] == ""]
    assert len(over) == 2 and (over["overflow"] == n + 3).all()
    pairs = set(zip(real["src"], real["dst"]))
    # identical-caption stars to the min member
    assert ("a000", "a001") in pairs and ("a000", "a299") in pairs
    assert ("b0", "b1") in pairs and ("b0", "b2") in pairs
    # cross-group rep link iff exact jaccard >= threshold
    from deduplicator_ray.functions.text import exact_jaccard_char_shingles
    j = exact_jaccard_char_shingles(capA, capB, CFG.shingle_k)
    expect_link = j >= CFG.jaccard_min and len(coll) > 0
    assert (("a000", "b0") in pairs) == expect_link


def test_caption_pair_with_one_zero_dhash_not_delegated():
    """A caption-verified pair where exactly ONE member has dhash=0 (md5-keyed
    media, poison hash) has NO image-channel owner: Hamming against 0 is just
    popcount, so a near-black image (popcount ≤ hamming_max) used to trip the
    image-owned skip and the pair was silently dropped.  The skip may only
    delegate when BOTH dhashes are nonzero (both rows then provably co-bucket
    in a shared dHash slice band by pigeonhole)."""
    import pandas as pd

    from deduplicator_ray.stages.candidates import make_partition_verify

    cap = "sunset harbor mountain forest river canyon meadow lantern window"
    rows = {
        "band": [100, 100],          # caption band 0 (identical captions
        "key": [555, 555],           # collide in every band; 0 is the owner)
        "image_id": ["img_dark", "vid_md5"],
        "dhash": [3, 0],             # popcount(3)=2 <= hamming_max, vs zero
        "caption": [cap, cap],
    }
    out = make_partition_verify(CFG)(
        pa.Table.from_pandas(pd.DataFrame(rows))).to_pandas()
    pairs = set(zip(out[out["src"] != ""]["src"], out[out["src"] != ""]["dst"]))
    assert ("img_dark", "vid_md5") in pairs
    # control: BOTH nonzero within hamming_max stays delegated to the image
    # channel (no caption-band emission)
    rows["dhash"] = [3, 1]
    out2 = make_partition_verify(CFG)(
        pa.Table.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert (out2["src"] != "").sum() == 0


def test_md5_media_cluster_in_decisions(images_ds, truth, oracle_rows):
    """Strict-mode media (stub mp4/flac payloads) enter the SAME proc-hash
    keyspace as images (getProcHash, /root/reference/dupedb.py:68-101):
    byte-identical media must cluster, elect a keeper, and get an
    md5-formatted rename target; distinct media must not cluster."""
    tr = truth.to_pylist()
    media = {t["image_id"] for t in tr if t["kind"] == "media_exact"}
    distinct = {t["image_id"] for t in tr if t["kind"] == "media_distinct"}
    assert media, "fixture must contain byte-identical media groups"

    dec = ip.reference_decisions(images_ds, CFG).to_pandas()
    # every byte-identical media row got a decision; distinct media did not
    assert media <= set(dec["image_id"])
    assert not (distinct & set(dec["image_id"]))
    # oracle agreement on the media subset
    od = oracle.reference_decisions(oracle_rows, CFG)
    o_keep = {d["keeper"] for d in od}
    keeps = set(dec.loc[dec.action == "keep", "image_id"])
    assert (keeps & media) == (o_keep & media)
    # keeper rename target is the md5 (32 hex) + CRC32 suffix
    m_keep = dec[(dec.action == "keep") & dec.image_id.isin(media)
                 & (dec.rename_to != "")]
    assert len(m_keep) > 0
    assert m_keep["rename_to"].str.match(r"^[0-9a-f]{32}_[0-9A-F]{8}\.\w+$").all()


def test_md5_media_in_extended_clusters(images_ds, truth):
    """Byte-identical media also flow through the extended (LSH+CC) path via
    the md5 exact band."""
    tr = truth.to_pylist()
    by_gid = {}
    for t in tr:
        if t["kind"] == "media_exact":
            by_gid.setdefault(t["group_id"], []).append(t["image_id"])
    assert by_gid
    cl = ip.extended_clusters(images_ds, CFG).to_pandas()
    assign = dict(zip(cl["image_id"], cl["cluster_id"]))
    for gid, members in by_gid.items():
        labels = {assign.get(m) for m in members}
        assert None not in labels, (gid, members)
        assert len(labels) == 1, (gid, members, labels)


def test_reference_clusters_hash_size_12(sf_small):
    """The reference's DEFAULT hash size (12 → 36-hex keyspace,
    /root/reference/dedupc.py:586,598-600) must produce non-empty clusters
    matching the oracle — regression for the r1 bug where hash_size>8
    silently wiped the corpus."""
    import dataclasses

    import pyarrow.parquet as pq

    cfg = dataclasses.replace(CFG, hash_size=12)
    corpus = pq.read_table(fixtures.images_path(sf_small, cfg.hash_size))
    rows12 = oracle.compute_rows(corpus, cfg)
    oc = oracle.reference_clusters(rows12, cfg)
    assert oc, "oracle must find clusters at hash_size=12"
    rc = ip.reference_clusters(ip.load_images(sf_small, cfg), cfg).to_pandas()
    assert len(rc) > 0
    # 36-hex keys (plus 32-hex md5 media keys)
    assert rc["proc_hash"].str.match(r"^[0-9a-f]{32}([0-9a-f]{4})?$").all()
    ray_map = {}
    for _, r in rc.iterrows():
        ray_map.setdefault(r["proc_hash"], []).append(r["image_id"])
    assert {k: sorted(v) for k, v in ray_map.items()} == oc


def test_extended_mode_hash_size_12(sf_small):
    """Extended (LSH+CC) near-dup at the reference's DEFAULT hash size: the
    wide-hash img channel must band on hex-slice keys (banding.img_slices) —
    not the int64 0-sentinel, which would mega-bucket the corpus and glue
    everything at Hamming(0,0)=0 — and must reproduce the all-pairs oracle's
    connected components exactly (pairs recall AND precision 1.0 on the
    fixture: 144-bit Hamming ∪ caption Jaccard)."""
    import dataclasses

    import pyarrow.parquet as pq

    cfg = dataclasses.replace(CFG, hash_size=12)
    corpus12 = pq.read_table(fixtures.images_path(sf_small, cfg.hash_size))
    rows12 = oracle.compute_rows(corpus12, cfg)
    op = oracle.verified_pairs(rows12, cfg)
    assert op, "oracle must find near-dup pairs at hash_size=12"
    ds = ip.load_images(sf_small, cfg)

    pairs = ip.dup_pairs(ds, cfg).to_pandas()
    rp = set(zip(pairs["src"], pairs["dst"]))
    inter = rp & op
    assert len(inter) / max(1, len(op)) >= 0.99      # recall
    assert len(inter) / max(1, len(rp)) >= 0.99      # precision

    occ = oracle.connected_components(op)
    cl = ip.extended_clusters(ds, cfg).to_pandas()
    assert dict(zip(cl["image_id"], cl["cluster_id"])) == occ


def test_wide_slice_keys_pigeonhole():
    """Unit pin for the wide-hash banding kernels: slices cover all bits
    disjointly, keys match direct bit-slice arithmetic, and any two values
    within Hamming ≤ 4 share at least one slice key (pigeonhole)."""
    import random

    from deduplicator_ray.stages.banding import (img_slices, wide_hash_bits,
                                                 wide_slice_keys)

    nbits = 144  # hash_size 12
    slices = img_slices(nbits)
    assert [w for _, w in slices] == [29, 29, 29, 29, 28]
    assert sum(w for _, w in slices) == nbits
    rng = random.Random(7)
    vals = [rng.getrandbits(nbits) for _ in range(64)]
    hexes = [format(v, "036x") for v in vals]
    bits = wide_hash_bits(hexes, nbits)
    keys = wide_slice_keys(bits, slices)
    for r, v in enumerate(vals):
        for si, (start, w) in enumerate(slices):
            expect = (v >> (nbits - start - w)) & ((1 << w) - 1)
            assert int(keys[r, si]) == expect
    # pigeonhole: flip ≤4 random bits → some slice key survives
    for v in vals[:16]:
        flipped = v
        for pos in rng.sample(range(nbits), 4):
            flipped ^= 1 << pos
        kv = wide_slice_keys(wide_hash_bits([format(v, '036x')], nbits), slices)
        kf = wide_slice_keys(wide_hash_bits([format(flipped, '036x')], nbits), slices)
        assert (kv == kf).any()


def test_phash_mode_clusters(sf_small):
    """Pluggable hash_fn='phash' (SURVEY §2.10): byte/pixel-identical dups
    still cluster (same pixels → same pHash), distinct lookalikes do not,
    and the keyspace stays 16-hex at hash_size=8."""
    import dataclasses

    import pyarrow.parquet as pq

    cfg = dataclasses.replace(CFG, hash_fn="phash")
    corpus = pq.read_table(fixtures.images_path("/root/testdata/sf0.001", 8))
    rc = ip.reference_clusters(ip.load_images("/root/testdata/sf0.001", cfg),
                               cfg).to_pandas()
    assert len(rc) > 0
    assert rc["proc_hash"].str.match(r"^[0-9a-f]{16}([0-9a-f]{16})?$").all()

    # exact byte-dups must share a pHash cluster
    truth = pq.read_table(fixtures.truth_path("/root/testdata/sf0.001", 8)).to_pylist()
    exacts = [(t["source_id"], t["image_id"]) for t in truth if t["kind"] == "exact"]
    assert exacts
    assign = {}
    for _, r in rc.iterrows():
        assign[r["image_id"]] = r["proc_hash"]
    paired = sum(1 for s, d in exacts
                 if assign.get(s) is not None and assign.get(s) == assign.get(d))
    assert paired >= 0.9 * len(exacts)
    # distinct lookalikes must not co-cluster with their group's base
    looka = [(t["source_id"], t["image_id"]) for t in truth
             if t["kind"] == "distinct_lookalike"]
    bases = {t["group_id"]: t["image_id"] for t in truth if t["kind"] == "base"}
    by_gid = {t["image_id"]: t["group_id"] for t in truth}
    wrong = sum(1 for _, d in looka
                if assign.get(d) is not None
                and assign.get(d) == assign.get(bases.get(by_gid[d])))
    assert wrong == 0


def test_mega_bucket_end_to_end(corpus):
    """Skew integration test (the tools/bench_skew.py property at test
    scale): append 2,000 byte-identical clones of one image to the sf-small
    corpus and run the FULL extended pipeline — the hot proc_hash bucket
    must come out as ONE complete component (exact-hash collapse → rep
    verify → spanning-forest emission → CC absorbs the star), and every
    baseline row must still be clustered exactly as before."""
    import pyarrow as pa
    import ray.data as rd

    n_hot = 2000
    one = corpus.slice(0, 1)
    hot = fixtures.clone_rows(corpus, n_hot)
    skewed = pa.concat_tables([corpus, hot])

    base = ip.extended_clusters(rd.from_arrow(corpus), CFG).to_pandas()
    out = ip.extended_clusters(rd.from_arrow(skewed), CFG).to_pandas()

    # the CLONE cluster (resolved through a clone id — the corpus has its
    # own large media cluster, global max would test the wrong one) is
    # complete
    hot_cluster = out.loc[out["image_id"].str.startswith("hot/"),
                          "cluster_id"].iloc[0]
    assert int((out["cluster_id"] == hot_cluster).sum()) >= n_hot
    rest = out[out["cluster_id"] != hot_cluster]
    donor = one["image_id"][0].as_py()
    base_rest = base[base["cluster_id"] != base.loc[
        base["image_id"] == donor, "cluster_id"].iloc[0]] \
        if donor in set(base["image_id"]) else base
    assert len(rest) == len(base_rest)


def test_incremental_cc_update_matches_full_recompute():
    """incremental_cc_update over (persisted assignment, delta edges) must
    equal CC over the union edge set — covering: a new node merging two
    old clusters, a new node with an id SMALLER than every old label
    (relabels whole old clusters), a brand-new new↔new cluster, an old
    singleton pulled into a cluster, an untouched old cluster, and a delta
    edge that is internal to one old cluster (a no-op self-loop in label
    space)."""
    import dataclasses

    import ray.data as rd
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_update,
    )

    old_edges = [("b1", "b2"), ("b2", "b3"),      # cluster b1
                 ("d1", "d2"),                    # cluster d1
                 ("m1", "m2"),                    # cluster m1 (untouched)
                 ("x1", "x2")]                    # cluster x1
    delta = [("n5", "b2"), ("n5", "d2"),          # n5 merges b*, d*
             ("a0", "x1"),                        # a0 < x1: relabels x*
             ("n8", "n9"),                        # brand-new cluster
             ("n7", "s1"),                        # old singleton s1 joins
             ("b1", "b3")]                        # internal to cluster b1

    def ds_of(pairs):
        return rd.from_items([{"src": a, "dst": b} for a, b in pairs])

    for cap in (0, 1_000_000):  # exercise shuffle rounds AND base case
        cfg = dataclasses.replace(CFG, cc_driver_edge_cap=cap)
        assign = connected_components(ds_of(old_edges), cfg)
        got = incremental_cc_update(assign, ds_of(delta), cfg).to_pandas()
        want = oracle.connected_components(
            {(min(a, b), max(a, b)) for a, b in old_edges + delta if a != b})
        assert dict(zip(got["image_id"], got["cluster_id"])) == want


def test_incremental_cc_update_empty_delta_is_identity():
    import ray.data as rd
    import pyarrow as pa
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_update,
    )

    assign = connected_components(
        rd.from_items([{"src": "a", "dst": "b"}]), CFG)
    empty = rd.from_arrow(pa.Table.from_pydict(
        {"src": [], "dst": []},
        schema=pa.schema([("src", pa.string()), ("dst", pa.string())])))
    out = incremental_cc_update(assign, empty, CFG).to_pandas()
    assert dict(zip(out["image_id"], out["cluster_id"])) == {"a": "a", "b": "a"}


def test_incremental_cc_remove_matches_full_recompute():
    """incremental_cc_remove must equal CC over the surviving edge set —
    covering: a cut-vertex removal that SPLITS a path cluster in two, a
    removal of the component-min member (relabels the survivors), a
    survivor losing its last edge (drops out of the assignment entirely),
    an untouched cluster passing through label-stable, a removed id that
    was never clustered (no-op), and a whole cluster wiped out."""
    import dataclasses

    import ray.data as rd
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_remove,
    )

    edges = [("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"),
             # path p1..p5: removing p3 splits it into {p1,p2} and {p4,p5}
             ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
             # triangle a*: removing a1 (the min label) relabels to a2
             ("w1", "w2"),                # removing w1 orphans w2 (vanishes)
             ("m1", "m2"),                # untouched cluster
             ("g1", "g2")]                # both removed: cluster wiped
    removed = ["p3", "a1", "w1", "g1", "g2", "zz_unclustered"]

    def ds_of(pairs):
        return rd.from_items([{"src": a, "dst": b} for a, b in pairs])

    surviving = [(a, b) for a, b in edges
                 if a not in removed and b not in removed]
    want = oracle.connected_components(
        {(min(a, b), max(a, b)) for a, b in surviving})

    for cap in (0, 1_000_000):  # exercise shuffle rounds AND base case
        cfg = dataclasses.replace(CFG, cc_driver_edge_cap=cap)
        assign = connected_components(ds_of(edges), cfg)
        got = incremental_cc_remove(
            assign, ds_of(edges), removed, cfg).to_pandas()
        assert dict(zip(got["image_id"], got["cluster_id"])) == want
    # pin the interesting shapes explicitly
    assert want["p1"] == "p1" and want["p4"] == "p4"   # genuine split
    assert want["a2"] == "a2"                          # min relabeled
    assert "w2" not in want and "g1" not in want       # vanish semantics
    assert want["m1"] == "m1"                          # untouched


def test_incremental_cc_remove_noop_cases():
    """Empty removal set and unclustered-only removal both return the
    assignment unchanged (identity fast paths)."""
    import ray.data as rd
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_remove,
    )

    edges = rd.from_items([{"src": "a", "dst": "b"}])
    assign = connected_components(edges, CFG)
    for removed in ([], ["never_seen"]):
        out = incremental_cc_remove(assign, edges, removed, CFG).to_pandas()
        assert dict(zip(out["image_id"], out["cluster_id"])) == \
            {"a": "a", "b": "a"}


def test_img_cluster_remove_matches_survivor_recompute(images_ds):
    """img_cluster_remove (prune the md5 bucket ≥ threshold from a
    persisted extended-clusters assignment, re-verify only the touched
    components) must equal extended_clusters computed from scratch over
    the survivor corpus — including through exact-hash groups whose
    spanning-forest edges are not node-deletion-safe."""
    import hashlib

    import pyarrow as pa
    from deduplicator_ray.pipelines.image_dedup import (
        IMG_REMOVE_BUCKET_THRESHOLD,
        img_cluster_remove,
    )

    def survivors(t: pa.Table) -> pa.Table:
        ids = [str(x) for x in t["image_id"].to_pylist()]
        mask = [int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
                < IMG_REMOVE_BUCKET_THRESHOLD for i in ids]
        return t.filter(pa.array(mask, pa.bool_()))

    got = img_cluster_remove(images_ds, CFG).to_pandas()
    want = ip.extended_clusters(
        images_ds.map_batches(survivors, batch_format="pyarrow"), CFG
    ).to_pandas()
    full = ip.extended_clusters(images_ds, CFG).to_pandas()

    gm = dict(zip(got["image_id"], got["cluster_id"]))
    wm = dict(zip(want["image_id"], want["cluster_id"]))
    fm = dict(zip(full["image_id"], full["cluster_id"]))
    assert gm == wm
    # non-vacuity: the prune actually dropped clustered rows
    assert len(gm) < len(fm)


def test_audio_features_stage():
    """AudioFeatures actor stage: audio rows fan through with the fake
    decoder (real duration arithmetic, id-seeded loudness, 13-dim mfcc),
    non-audio rows are skipped, fake=False dead-letters with the codec
    taxonomy, and a null payload dead-letters even in fake mode."""
    import hashlib

    import pyarrow as pa

    from deduplicator_ray.pipelines.multimodal import AudioFeatures

    batch = pa.table({
        "image_id": ["a/x.mp3", "b/y.wav", "c/z.png", "d/n.mp3"],
        "bytes": [b"\0" * 32000, b"\0" * 64000, b"px", None],
        "fmt": ["mp3", "wav", "png", "mp3"],
    })
    out = AudioFeatures(fake=True)(batch).to_pandas()
    assert list(out["image_id"]) == ["a/x.mp3", "b/y.wav", "d/n.mp3"]
    ok = out[out["status"] == "ok_fake"]
    assert list(ok["duration_ms"]) == [1000, 2000]  # len*1000 // 32000
    assert (ok["sample_rate"] == 16000).all()
    h = int(hashlib.md5(b"a/x.mp3").hexdigest()[:8], 16)
    assert ok.iloc[0]["rms_e6"] == h % 1_000_000
    assert all(len(v) == 13 for v in ok["mfcc"])
    dead = out[out["image_id"] == "d/n.mp3"].iloc[0]
    assert dead["status"].startswith("error:NullPayload")

    strict = AudioFeatures(fake=False)(batch).to_pandas()
    assert (strict[strict["bytes"].notna() if "bytes" in strict else
            strict["status"].str.startswith("error:")]["status"]
            .str.startswith("error:")).all()
    assert len(strict) == 3
    assert strict.iloc[0]["status"].startswith(
        "error:UnsupportedFormatError")


def test_md5_band_excludes_error_rows(ray_session):
    """The md5 band takes STRICT-MODE media only: status='error'
    quarantine rows (content_md5='') must never enter the band keyspace —
    a not-ok mask would weld every failed download into one bogus
    byte-identical cluster."""
    import pyarrow as pa

    from deduplicator_ray.stages.banding import MD5_BAND, make_banding

    batch = pa.table({
        "image_id": ["a", "b", "c", "d"],
        "dhash": pa.array([111, 0, 0, 0], pa.int64()),
        "dhash_hex": ["%016x" % 111, "0" * 16, "0" * 16, "0" * 16],
        "status": ["ok", "md5_only", "error", "error"],
        "content_md5": ["a1" * 16, "b2" * 16, "", ""],
        "caption": ["", "", "", ""],
        "minhash": pa.array([[0] * 128] * 4, pa.list_(pa.int64(), 128)),
        "simhash": pa.array([0] * 4, pa.int64()),
    })
    out = make_banding(__import__(
        "deduplicator_ray.config", fromlist=["PipelineConfig"]
    ).PipelineConfig(), channels=("img",))(batch)
    md5_rows = out.filter(
        pa.compute.equal(out["band"], MD5_BAND)).to_pydict()
    assert md5_rows["image_id"] == ["b"]  # md5_only only, no error rows


def test_cluster_checksum_block_structure_independent(ray_session):
    """The order-independent checksum must also be BLOCK-structure
    independent: identical assignments with different partition counts
    checksum equally (the CC fixpoint compares consecutive rounds whose
    block counts can differ)."""
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.stages.components import _checksum

    rows = [{"node": f"n{i:03d}", "label": f"l{i % 7}"} for i in range(100)]
    t = pa.Table.from_pylist(rows)
    sums = {_checksum(rd.from_arrow(t)),
            _checksum(rd.from_arrow(t).repartition(2)),
            _checksum(rd.from_arrow(t).repartition(5))}
    assert len(sums) == 1


def test_audio_features_real_acon_decode():
    """The engine's own acon container decodes for REAL in AudioFeatures
    (fake=False) — only foreign formats (mp3/wav/...) stub; a corrupt
    acon payload dead-letters with the codec taxonomy."""
    import pyarrow as pa

    from deduplicator_ray import codecs
    from deduplicator_ray.pipelines.multimodal import AudioFeatures

    pcm = (np.sin(np.linspace(0, 200, 16000)) * 8000).astype(np.int16)
    blob = codecs.encode_acon(pcm, rate=16000)
    batch = pa.table({
        "image_id": ["a/x.acon", "b/bad.acon"],
        "bytes": [blob, b"not-an-acon"],
        "fmt": ["acon", "acon"],
    })
    out = AudioFeatures(fake=False)(batch).to_pandas().set_index("image_id")
    good = out.loc["a/x.acon"]
    assert good["status"] == "ok"
    assert good["duration_ms"] == 1000 and good["sample_rate"] == 16000
    assert good["rms_e6"] > 0
    assert out.loc["b/bad.acon", "status"].startswith("error:")
