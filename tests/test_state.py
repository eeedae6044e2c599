"""Checkpoint/resume manifests (state/manifests.py) and the BandIndex actor
pool (state/bandtable.py) — the north-rule resumability + stateful-stage
surfaces."""

from __future__ import annotations

import dataclasses
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduplicator_ray import fixtures
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.state import manifests
from deduplicator_ray.state.bandtable import BandIndex

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def sharded_corpus(tmp_path_factory, sf_small):
    """Three small parquet shards split off the sf0.001 fixture corpus."""
    src = pq.read_table(fixtures.images_path(sf_small, CFG.hash_size))
    d = tmp_path_factory.mktemp("corpus")
    n = src.num_rows
    cut1, cut2 = n // 3, 2 * n // 3
    for i, (lo, hi) in enumerate([(0, cut1), (cut1, cut2), (cut2, n)]):
        pq.write_table(src.slice(lo, hi - lo), os.path.join(d, f"shard-{i}.parquet"))
    return str(d)


def _all_ids(ds):
    return sorted(ds.to_pandas()["image_id"])


def test_checkpoint_resume_after_partial_run(sharded_corpus, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # simulated crash: only 1 missing shard is allowed to complete
    partial = manifests.checkpoint_fingerprints(sharded_corpus, ckpt, CFG, max_shards=1)
    assert len(manifests.completed_shards(ckpt)) == 1
    n_partial = partial.count()

    # resume: finishes the remaining shards, does NOT recompute shard 0
    man0_before = manifests.load_manifest(ckpt, "shard-0")
    full = manifests.checkpoint_fingerprints(sharded_corpus, ckpt, CFG)
    man0_after = manifests.load_manifest(ckpt, "shard-0")
    assert man0_before == man0_after  # untouched on resume (incl. wall_s)
    assert len(manifests.completed_shards(ckpt)) == 3
    assert full.count() > n_partial

    # checkpointed output == direct computation over the same corpus
    import ray.data as rd

    from deduplicator_ray.pipelines.image_dedup import fingerprints

    direct = fingerprints(rd.read_parquet(sharded_corpus), CFG)
    assert _all_ids(full) == _all_ids(direct)


def test_checkpoint_invalidation_on_config_and_input_change(sharded_corpus, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    manifests.checkpoint_fingerprints(sharded_corpus, ckpt, CFG)
    wall0 = {m["shard"]: m["wall_s"] for m in manifests.completed_shards(ckpt)}

    # config drift invalidates every shard (config_hash mismatch): with
    # max_shards=0 nothing may be reused and nothing recomputed → error
    cfg2 = dataclasses.replace(CFG, hamming_max=CFG.hamming_max + 1)
    with pytest.raises(RuntimeError, match="no shards completed"):
        manifests.checkpoint_fingerprints(sharded_corpus, ckpt, cfg2, max_shards=0)

    # mutating ONE input shard invalidates exactly that shard
    shard1 = os.path.join(sharded_corpus, "shard-1.parquet")
    t = pq.read_table(shard1)
    pq.write_table(t.slice(0, t.num_rows - 1), shard1)
    os.utime(shard1, (0, 0))
    manifests.checkpoint_fingerprints(sharded_corpus, ckpt, CFG)
    wall1 = {m["shard"]: m["wall_s"] for m in manifests.completed_shards(ckpt)}
    assert wall1["shard-0"] == wall0["shard-0"]  # untouched
    assert wall1["shard-2"] == wall0["shard-2"]  # untouched
    assert wall1["shard-1"] != wall0["shard-1"]  # recomputed


def test_checkpoint_manifest_contents(sharded_corpus, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    manifests.checkpoint_fingerprints(sharded_corpus, ckpt, CFG)
    for m in manifests.completed_shards(ckpt):
        assert m["stage"] == manifests.STAGE_FINGERPRINT
        assert m["status"] == "ok"
        assert m["config_hash"] == CFG.config_hash()
        assert m["row_count"] > 0
        assert m["n_errors"] >= 0
        assert m["wall_s"] >= 0


def test_band_index_matches_shuffle_candidates(sf_small):
    """The actor-pool band index must produce exactly the candidate set the
    batch shuffle path produces: ids sharing ≥1 band bucket."""
    import ray.data as rd

    from deduplicator_ray.pipelines.image_dedup import _live, fingerprints
    from deduplicator_ray.stages.banding import make_banding

    fp = _live(
        fingerprints(rd.read_parquet(fixtures.images_path(sf_small, CFG.hash_size)), CFG),
        CFG,
    ).to_pandas()
    # the band index serves the img+cap channels; strict-mode md5 media
    # go through the exact-dedup path (md5 band) in the batch pipeline
    fp = fp[fp["status"] == "ok"].head(200)

    idx = BandIndex(CFG, num_shards=3)
    idx.add_batch(list(zip(fp["image_id"], (int(x) & (2**64 - 1) for x in fp["dhash"]),
                           fp["caption"])))

    # shuffle-path band rows for the same records (signatures + banding)
    from deduplicator_ray.stages.signatures import CaptionSignatures

    tbl = CaptionSignatures(CFG)(pa.Table.from_pandas(fp, preserve_index=False))
    band_rows = make_banding(CFG, ("img", "cap"))(tbl).to_pandas()
    buckets: dict[tuple, set] = {}
    for _, r in band_rows.iterrows():
        buckets.setdefault((r["band"], r["key"]), set()).add(r["image_id"])

    expect: dict[str, set] = {i: set() for i in fp["image_id"]}
    for members in buckets.values():
        for a in members:
            expect[a] |= members - {a}

    for _, r in fp.head(50).iterrows():
        got = idx.candidates(int(r["dhash"]) & (2**64 - 1), r["caption"],
                             exclude=r["image_id"])
        assert got == expect[r["image_id"]], r["image_id"]

    stats = idx.stats()
    assert sum(s["n_entries"] for s in stats) > 0
    assert all(s["n_buckets"] > 0 for s in stats)  # routing spreads shards


def test_cli_job_end_to_end_and_resume(sharded_corpus, tmp_path):
    """The ray-job entry point: extended job writes clusters + manifests,
    and a re-run reuses every fingerprint shard (resume)."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray import cli

    out = str(tmp_path / "job_out")
    m1 = cli.run("extended", sharded_corpus, out)
    assert m1["total_wall_s"] > 0
    assert os.path.isdir(os.path.join(out, "clusters"))
    clusters = rd.read_parquet(os.path.join(out, "clusters")).to_pandas()
    assert len(clusters) > 0
    assert set(clusters.columns) == {"image_id", "cluster_id"}

    with open(os.path.join(out, "_job_extended_manifest.json")) as f:
        man = json.load(f)
    assert man["stage"] == "job_extended"
    assert man["config_hash"] == CFG.config_hash()

    # resume run: all 3 shards reused, fingerprints not recomputed
    wall0 = {m["shard"]: m["wall_s"]
             for m in manifests.completed_shards(os.path.join(out, "fingerprints"))}
    m2 = cli.run("extended", sharded_corpus, out)
    wall1 = {m["shard"]: m["wall_s"]
             for m in manifests.completed_shards(os.path.join(out, "fingerprints"))}
    assert wall0 == wall1

    # reference mode writes a decision table
    out2 = str(tmp_path / "job_ref")
    cli.run("reference", sharded_corpus, out2)
    dec = rd.read_parquet(os.path.join(out2, "decisions")).to_pandas()
    assert (dec.groupby("cluster_id")["action"]
            .apply(lambda s: (s == "keep").sum()) == 1).all()


def test_cli_checksum_reproducible(sharded_corpus, tmp_path):
    from deduplicator_ray import cli

    m1 = cli.run("extended", sharded_corpus, str(tmp_path / "o1"))
    m2 = cli.run("extended", sharded_corpus, str(tmp_path / "o2"))
    assert m1["cluster_checksum"] == m2["cluster_checksum"]
    assert m1["n_clustered"] == m2["n_clustered"] > 0


def test_edge_checkpoint_resume_matches_direct(sharded_corpus, tmp_path):
    """Band-bucket partition checkpointing: kill-and-resume produces the
    exact edge set of a direct run, and completed partitions are never
    recomputed (north rule: resume without recomputing completed band
    buckets)."""
    import pandas as pd
    import ray.data as rd

    from deduplicator_ray.pipelines.image_dedup import (
        _live, fingerprints, verified_edges_from_fp)
    from deduplicator_ray.state import edge_checkpoint as ec

    fp = _live(fingerprints(rd.read_parquet(sharded_corpus), CFG), CFG).materialize()
    ck = str(tmp_path / "edges_ck")
    digest = "test-digest-1"

    # simulated crash after 2 of 4 partitions: the partial view must be an
    # explicit opt-in (require_complete guards downstream CC correctness)
    with pytest.raises(RuntimeError, match="2/4 edge partitions"):
        ec.checkpoint_verified_edges(fp, ck, CFG, n_partitions=4,
                                     input_digest=digest, max_partitions=2)
    partial = ec.checkpoint_verified_edges(fp, ck, CFG, n_partitions=4,
                                           input_digest=digest, max_partitions=0,
                                           require_complete=False)
    assert partial.count() >= 0
    assert len(ec.completed_partitions(ck)) == 2
    walls0 = {m["partition"]: m["wall_s"] for m in ec.completed_partitions(ck)}

    # resume completes the rest without touching finished partitions
    full = ec.checkpoint_verified_edges(fp, ck, CFG, n_partitions=4,
                                        input_digest=digest)
    walls1 = {m["partition"]: m["wall_s"] for m in ec.completed_partitions(ck)}
    assert len(walls1) == 4
    for p, w in walls0.items():
        assert walls1[p] == w  # untouched on resume

    def pairset(ds):
        df = ds.to_pandas()
        df = df[df["src"] != ""]
        return set(zip(df["src"], df["dst"]))

    direct = verified_edges_from_fp(fp, CFG)
    assert pairset(full) == pairset(direct)

    # config drift invalidates: nothing completed under a changed config
    import dataclasses

    cfg2 = dataclasses.replace(CFG, jaccard_min=0.9)
    with pytest.raises(RuntimeError, match="no edge partitions"):
        ec.checkpoint_verified_edges(fp, ck, cfg2, n_partitions=4,
                                     input_digest=digest, max_partitions=0)


def test_band_index_probe_equals_inrun_cross_match(sf_small, tmp_path):
    """Persisted LSH band index (state/bandstore.py): the indexed probe
    must be value-identical to the in-run img_cross_min_match on the same
    sides, a tiny increment must read only a strict subset of the index
    partitions, and a config-mismatched probe must fail loudly."""
    import dataclasses
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore

    cfg = PipelineConfig()
    cols = ["image_id", "dhash", "dhash_hex", "status", "content_md5"]
    live = ip._live(ip.fingerprints(ip.load_images(sf_small, cfg), cfg),
                    cfg).materialize()

    def side(new_side):
        def f(t):
            ids = t["image_id"].to_pylist()
            isnew = np.fromiter(
                (hashlib.md5(s.encode()).hexdigest()[0] in "0123"
                 for s in ids), bool, count=len(ids))
            return t.select(cols).filter(
                pa.array(isnew if new_side else ~isnew))

        return live.map_batches(f, batch_format="pyarrow")

    idx = str(tmp_path / "bandidx")
    bandstore.build_band_index(side(False), cfg, idx, num_parts=64)

    got = (bandstore.probe_band_index(side(True), idx, cfg).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    want = (ip.img_cross_min_match(side(True), side(False), cfg).to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0

    # read pruning: a 5-image increment touches a strict partition subset
    stats = {}
    tiny = side(True).limit(5).materialize()
    bandstore.probe_band_index(tiny, idx, cfg, stats=stats).to_pandas()
    assert 0 < stats["parts_read"] < stats["parts_total"]

    # config drift guard: hash_size changes the band KEYS and must fail
    # loudly; hamming_max is a VERIFY-time threshold (band keys are
    # independent of it) — re-thresholding a built index is supported
    with pytest.raises(ValueError, match="hash_size"):
        bandstore.probe_band_index(
            tiny, idx, dataclasses.replace(cfg, hash_size=12))
    rethresh = bandstore.probe_band_index(
        tiny, idx, dataclasses.replace(cfg, hamming_max=2)).to_pandas()
    assert rethresh is not None  # accepted, not rejected


def test_cli_band_index_modes(sharded_corpus, tmp_path):
    """The band-build / band-probe job modes: build an index from the
    corpus, probe the SAME corpus (every banded image must match at least
    itself), and the summary carries the read-pruning stats."""
    from deduplicator_ray import cli

    idx = str(tmp_path / "bandidx")
    out = str(tmp_path / "probe")
    m1 = cli.run_band_build(sharded_corpus, idx, num_parts=16)
    assert m1["num_parts"] == 16 and m1["hash_size"] == 8
    m2 = cli.run_band_probe(sharded_corpus, idx, out)
    assert m2["n_matched"] > 0
    assert m2["parts_total"] == 16 and 0 < m2["parts_read"] <= 16
    # self-probe: every matched id's match is ≤ itself (min election
    # includes the image's own index entry)
    import pyarrow.parquet as pq_

    t = pq_.read_table(out)
    ids = t["image_id"].to_pylist()
    matched = t["matched"].to_pylist()
    assert all(m <= i for i, m in zip(ids, matched))

    # band-prune: retire two ids from the index; a re-probe of the full
    # corpus must no longer return them as matches for OTHER images
    victims = sorted(set(ids))[:2]
    rm = str(tmp_path / "removed")
    os.makedirs(rm)
    pq_.write_table(pa.table({"image_id": pa.array(victims, pa.string())}),
                    os.path.join(rm, "r.parquet"))
    m3 = cli.run_band_prune(idx, rm)
    assert m3["n_removed_ids"] == 2 and m3["parts_touched"] > 0
    assert m3["rows_after"] < m3["rows_before"]
    out2 = str(tmp_path / "probe2")
    m4 = cli.run_band_probe(sharded_corpus, idx, out2)
    t2 = pq_.read_table(out2)
    assert not set(t2["matched"].to_pylist()) & set(victims)
    assert m4["n_matched"] <= m2["n_matched"]

    # band-append: folding the victims back in restores the original
    # self-probe relation (append-only lifecycle closes the loop)
    victim_dir = str(tmp_path / "victims")
    os.makedirs(victim_dir)
    import pyarrow.compute as pc_
    import pyarrow.dataset as pads_

    full = pads_.dataset(sharded_corpus, format="parquet").to_table()
    back = full.filter(pc_.is_in(full["image_id"],
                                 value_set=pa.array(victims)))
    assert back.num_rows == len(victims)
    pq_.write_table(back, os.path.join(victim_dir, "v.parquet"))
    m5 = cli.run_band_append(victim_dir, idx)
    assert m5["n_appended_rows"] > 0
    out3 = str(tmp_path / "probe3")
    cli.run_band_probe(sharded_corpus, idx, out3)
    t3 = pq_.read_table(out3)
    assert (sorted(zip(t3["image_id"].to_pylist(), t3["matched"].to_pylist()))
            == sorted(zip(ids, matched)))


def test_band_index_delta_edges_fold_equals_full_recompute(sf_small, tmp_path):
    """Both-channel persisted band index → read-pruned delta-edge probe →
    incremental_cc_update: the FULL incremental loop over persisted state
    must equal a full-corpus extended-clusters recompute, and the probe
    must read only the increment's partitions."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_update,
    )
    from deduplicator_ray.state import bandstore

    cfg = PipelineConfig()
    live = ip._live(ip.fingerprints(ip.load_images(sf_small, cfg), cfg),
                    cfg).materialize()

    def side(new_side):
        def f(t):
            ids = t["image_id"].to_pylist()
            isnew = np.fromiter(
                ((int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 100
                  >= ip.IMG_NEW_BUCKET_THRESHOLD) == new_side
                 for s in ids), bool, count=len(ids))
            return t.filter(pa.array(isnew))

        return live.map_batches(f, batch_format="pyarrow")

    idx = str(tmp_path / "bandidx2")
    bandstore.build_band_index(side(False), cfg, idx, num_parts=64,
                               channels=("img", "cap"))

    # persisted checkpoint: the known side's clusters
    base_edges = ip.verified_edges_from_fp(side(False), cfg).map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], "")).select(["src", "dst"]),
        batch_format="pyarrow")
    base = connected_components(base_edges, cfg)

    stats = {}
    delta = bandstore.probe_band_delta_edges(side(True), idx, cfg,
                                             stats=stats)
    got = (incremental_cc_update(base, delta, cfg).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    want = (ip.extended_clusters(ip.load_images(sf_small, cfg), cfg)
            .to_pandas().sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert 0 < stats["parts_read"] <= stats["parts_total"]

    # an img-only probe against a both-channel index must fail loudly
    import pytest

    with pytest.raises(ValueError, match="delta"):
        bandstore.probe_band_index(side(True).limit(3), idx, cfg)


def test_band_index_append_equals_union_build(sf_small, tmp_path):
    """append_band_index: build(A) + append(B) must answer probes exactly
    like build(A∪B) — banding is stateless so the appended index holds the
    union's rows; existing files are never rewritten; drifted config fails
    loudly."""
    import dataclasses
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore

    cfg = PipelineConfig()
    cols = ["image_id", "dhash", "dhash_hex", "status", "content_md5"]
    live = ip._live(ip.fingerprints(ip.load_images(sf_small, cfg), cfg),
                    cfg).materialize()

    def slice_(digits):
        def f(t):
            ids = t["image_id"].to_pylist()
            keep = np.fromiter(
                (hashlib.md5(s.encode()).hexdigest()[0] in digits
                 for s in ids), bool, count=len(ids))
            return t.select(cols).filter(pa.array(keep))

        return live.map_batches(f, batch_format="pyarrow")

    known_a, known_b, probe = (slice_("456789ab"), slice_("cdef"),
                               slice_("0123"))
    idx = str(tmp_path / "bandidx4")
    bandstore.build_band_index(known_a, cfg, idx, num_parts=64)

    def files():
        return {os.path.join(d, f)
                for d in os.listdir(idx) if d.startswith("part=")
                for f in os.listdir(os.path.join(idx, d))}

    before = files()
    n = bandstore.append_band_index(known_b, idx, cfg)
    assert n > 0
    assert before < files()  # append-only: old files untouched, new added

    got = (bandstore.probe_band_index(probe, idx, cfg).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    want = (ip.img_cross_min_match(probe, known_a.union(known_b), cfg)
            .to_pandas().sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0

    with pytest.raises(ValueError, match="hash_size"):
        bandstore.append_band_index(
            known_b, idx, dataclasses.replace(cfg, hash_size=12))
    # hamming_max drift is legal (verify-time threshold, keys unchanged)
    n = bandstore.append_band_index(
        known_b.limit(2), idx, dataclasses.replace(cfg, hamming_max=2))
    assert n >= 0


def test_band_index_prune_retires_ids(sf_small, tmp_path):
    """prune_band_index: after retiring a set of known ids, a probe must
    equal the in-run cross-match against the surviving known side; the
    prune must rewrite ONLY partitions that actually held retired rows
    (untouched ones stay byte-identical), and re-running it is a no-op."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore

    cfg = PipelineConfig()
    cols = ["image_id", "dhash", "dhash_hex", "status", "content_md5"]
    live = ip._live(ip.fingerprints(ip.load_images(sf_small, cfg), cfg),
                    cfg).materialize()

    def side(new_side, drop=frozenset()):
        def f(t):
            ids = t["image_id"].to_pylist()
            keep = np.fromiter(
                ((hashlib.md5(s.encode()).hexdigest()[0] in "0123")
                 == new_side and s not in drop
                 for s in ids), bool, count=len(ids))
            return t.select(cols).filter(pa.array(keep))

        return live.map_batches(f, batch_format="pyarrow")

    idx = str(tmp_path / "bandidx3")
    bandstore.build_band_index(side(False), cfg, idx, num_parts=64)

    removed = set(sorted(side(False).to_pandas()["image_id"])[:25])

    def file_states():
        out = {}
        for d in sorted(os.listdir(idx)):
            p = os.path.join(idx, d)
            if d.startswith("part=") and os.path.isdir(p):
                out[d] = sorted((f, os.path.getsize(os.path.join(p, f)))
                                for f in os.listdir(p))
        return out

    before = file_states()
    stats = {}
    bandstore.prune_band_index(removed, idx, cfg, stats=stats)
    after = file_states()

    assert 0 < stats["parts_touched"] < stats["parts_total"]
    assert stats["rows_after"] < stats["rows_before"]
    untouched = [d for d in before if before[d] == after[d]]
    assert len(untouched) == stats["parts_total"] - stats["parts_touched"]

    # probe equals in-run cross-match against the SURVIVING known side
    got = (bandstore.probe_band_index(side(True), idx, cfg).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    want = (ip.img_cross_min_match(side(True), side(False, removed), cfg)
            .to_pandas().sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # idempotent: a second prune touches nothing
    stats2 = {}
    bandstore.prune_band_index(removed, idx, cfg, stats=stats2)
    assert stats2["parts_touched"] == 0
    assert stats2["rows_before"] == stats["rows_after"]
    assert file_states() == after


def test_cli_prune_mode(ray_session, tmp_path):
    """The prune job mode: persisted clusters + edges + a removed-id
    parquet in, updated assignment out — equal to CC over surviving
    edges (split exercised via a path cut vertex)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplicator_ray import cli
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.components import connected_components

    edges = [("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("m1", "m2")]
    e_ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    assign = connected_components(e_ds, PipelineConfig())

    cdir, edir, rdir, odir = (str(tmp_path / d) for d in
                              ("clusters", "edges", "removed", "out"))
    assign.write_parquet(cdir)
    e_ds.write_parquet(edir)
    pq.write_table(pa.table({"image_id": ["p2", "ghost"]}), rdir + ".parquet")
    import os
    os.makedirs(rdir)
    os.replace(rdir + ".parquet", os.path.join(rdir, "r.parquet"))

    m = cli.run_prune(cdir, edir, rdir, odir)
    assert m["n_removed_ids"] == 2 and m["n_rows_before"] == 6
    got = rd.read_parquet(odir).to_pandas()
    # p2 removed: p1 orphaned (vanishes), {p3,p4} relabel to p3; m* untouched
    assert dict(zip(got["image_id"], got["cluster_id"])) == {
        "p3": "p3", "p4": "p3", "m1": "m1", "m2": "m1"}
    assert m["n_rows_after"] == 4


def test_srp_index_probe_matches_replay_and_prunes(sf_medium, tmp_path):
    """Persisted SRP index (state/srpstore.py): a probe must equal the
    Ray-free numpy replay (cross-side co-bucketed candidates, exact float64
    cosine ≥ threshold); build(A)+append(B) must answer exactly like
    build(A∪B); a tiny probe must read a strict subset of partitions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from deduplicator_ray import io as dio
    from deduplicator_ray.functions import vector as vfn
    from deduplicator_ray.state import srpstore

    src = pq_.read_table(os.path.join(sf_medium, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    ids = np.asarray(src["vec_id"].to_pylist(), np.int64)
    x = np.stack(src["embedding"].to_pylist()).astype(np.float64)
    keys = vfn.srp_band_keys(x)

    # Ray-free replay: cross-side pairs sharing >= 1 band key, cos >= 0.35
    new_m = ids % 5 == 0
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    want = set()
    n_i, k_i = np.flatnonzero(new_m), np.flatnonzero(~new_m)
    co = (keys[n_i][:, None, :] == keys[k_i][None, :, :]).any(axis=2)
    cos = xn[n_i] @ xn[k_i].T
    for a, b in zip(*np.nonzero(co & (cos >= 0.35))):
        want.add((int(ids[n_i[a]]), int(ids[k_i[b]]),
                  int(np.floor(cos[a, b] * 1e6 + 0.5))))

    ds = dio.read_parquet(os.path.join(sf_medium, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def side(mask_fn):
        def f(t: pa.Table) -> pa.Table:
            v = t["vec_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(mask_fn(v)))

        return ds.map_batches(f, batch_format="pyarrow")

    known = side(lambda v: v % 5 != 0)
    new = side(lambda v: v % 5 == 0)

    idx = str(tmp_path / "srpidx")
    srpstore.build_srp_index(known, idx)
    stats = {}
    got = srpstore.probe_srp_index(new, idx, stats=stats).to_pandas()
    assert set(zip(got["va"], got["vb"], got["cos_e6"])) == want
    assert len(got) == len(want) > 0  # owner-band: each pair exactly once
    assert stats["parts_total"] == 64

    # append == union build: split known in two, build half, append half
    idx2 = str(tmp_path / "srpidx2")
    srpstore.build_srp_index(side(lambda v: v % 5 == 1), idx2)
    n_app = srpstore.append_srp_index(
        side(lambda v: (v % 5 != 0) & (v % 5 != 1)), idx2)
    assert n_app > 0
    got2 = srpstore.probe_srp_index(new, idx2).to_pandas()
    assert (sorted(zip(got2["va"], got2["vb"], got2["cos_e6"]))
            == sorted(zip(got["va"], got["vb"], got["cos_e6"])))

    # read pruning: a 4-vector probe (64 band rows) touches a strict
    # partition subset of the 64-way index
    stats3 = {}
    srpstore.probe_srp_index(side(lambda v: v < 4), idx,
                             stats=stats3).to_pandas()
    assert 0 < stats3["parts_read"] < stats3["parts_total"]


def test_cli_srp_index_modes(sf_small, tmp_path):
    """CLI job surface srp-build / srp-probe / srp-append: probe pairs are
    cross-side only, and appending the increment makes a re-probe also see
    increment-vs-appended matches (superset of the first probe)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from deduplicator_ray import cli

    src = pq_.read_table(os.path.join(sf_small, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    ids = np.asarray(src["vec_id"].to_pylist(), np.int64)
    known_dir, inc_dir = str(tmp_path / "known"), str(tmp_path / "inc")
    os.makedirs(known_dir)
    os.makedirs(inc_dir)
    pq_.write_table(src.filter(pa.array(ids % 5 != 0)),
                    os.path.join(known_dir, "s0.parquet"))
    pq_.write_table(src.filter(pa.array(ids % 5 == 0)),
                    os.path.join(inc_dir, "s0.parquet"))

    idx = str(tmp_path / "srpidx_cli")
    m1 = cli.run_srp_build(known_dir, idx)
    assert m1["num_parts"] == 64
    out1 = str(tmp_path / "probe1")
    m2 = cli.run_srp_probe(inc_dir, idx, out1)
    t1 = pq_.read_table(out1)
    assert m2["n_pairs"] == t1.num_rows
    assert all(v % 5 == 0 for v in t1["va"].to_pylist())
    assert all(v % 5 != 0 for v in t1["vb"].to_pylist())

    m3 = cli.run_srp_append(inc_dir, idx)
    assert m3["n_appended_rows"] > 0
    out2 = str(tmp_path / "probe2")
    m4 = cli.run_srp_probe(inc_dir, idx, out2)
    t2 = pq_.read_table(out2)
    assert m4["n_pairs"] >= m2["n_pairs"]
    p1 = set(zip(t1["va"].to_pylist(), t1["vb"].to_pylist()))
    p2 = set(zip(t2["va"].to_pylist(), t2["vb"].to_pylist()))
    assert p1 <= p2


def test_doc_band_index_probe_append_drift(sf_small, tmp_path):
    """Persisted doc band index (state/docbandstore.py): the probe must
    equal the in-run cross_dup_min_match on the same sides; a tiny probe
    reads a strict partition subset; build(A)+append(B) answers like
    build(A∪B); drifted banding config fails loudly."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines.doc_dedup import cross_dup_min_match
    from deduplicator_ray.state import docbandstore

    cfg = CFG
    docs = dio.read_parquet(os.path.join(sf_small, "documents.parquet"),
                            columns=["doc_id", "text"])

    def side(digits):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (hashlib.md5(str(i).encode()).hexdigest()[0] in digits
                 for i in ids), bool, count=len(ids))
            return t.filter(pa.array(keep))

        return docs.map_batches(f, batch_format="pyarrow")

    known, new = side("0123456789ab"), side("cdef")
    idx = str(tmp_path / "docbandidx")
    docbandstore.build_doc_band_index(known, cfg, idx)
    stats = {}
    got = (docbandstore.probe_doc_band_index(new, idx, cfg, stats=stats)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (cross_dup_min_match(new, known, cfg)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    assert stats["parts_total"] == 64

    # format-2 de-amplification: band rows are fixed-width (NO text
    # payload — format 1 stored the text once per band), and the text
    # store holds each known doc exactly once
    import glob as _glob

    bshard = _glob.glob(os.path.join(idx, "bands", "part=*", "*.parquet"))[0]
    bcols = set(pq_.read_schema(bshard).names)
    assert "text" not in bcols and "caption" not in bcols
    assert {"band", "key", "doc_id", "tmd5"} <= bcols
    tshards = _glob.glob(os.path.join(idx, "texts", "tpart=*", "*.parquet"))
    n_txt = sum(pq_.read_metadata(p).num_rows for p in tshards)
    assert n_txt == known.count()
    # text-store reads are pruned too
    assert 0 < stats["tparts_read"] <= stats["tparts_total"]

    # read pruning: a 3-doc probe touches a strict partition subset
    stats2 = {}
    docbandstore.probe_doc_band_index(new.limit(3), idx, cfg,
                                      stats=stats2).to_pandas()
    assert 0 < stats2["parts_read"] < stats2["parts_total"]

    # append == union build
    idx2 = str(tmp_path / "docbandidx2")
    docbandstore.build_doc_band_index(side("012345"), cfg, idx2)
    n = docbandstore.append_doc_band_index(side("6789ab"), idx2, cfg)
    assert n > 0
    got2 = (docbandstore.probe_doc_band_index(new, idx2, cfg)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want)

    # config drift guard
    import dataclasses

    with pytest.raises(ValueError, match="shingle_k"):
        docbandstore.probe_doc_band_index(
            new, idx, dataclasses.replace(cfg, shingle_k=7))


def test_containment_index_probe_append_pruning(sf_small, tmp_path):
    """Persisted containment prefix index (state/contstore.py): the probe
    must equal the two-sided DuckDB containment relation on the same
    sides; a tiny probe reads a strict posting-partition subset; and
    build(A)+append(B) answers like build(A∪B) even though the hot table
    stays stale (ordering is a heuristic, recall is pigeonhole-exact)."""
    import hashlib

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import queries as q
    from deduplicator_ray.state import contstore

    docs = dio.read_parquet(os.path.join(sf_small, "documents.parquet"),
                            columns=["doc_id", "text"])

    def side(digits):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (hashlib.md5(str(i).encode()).hexdigest()[0] in digits
                 for i in ids), bool, count=len(ids))
            return t.filter(pa.array(keep))

        return docs.map_batches(f, batch_format="pyarrow")

    known, new = side("01234567"), side("89abcdef")
    idx = str(tmp_path / "contidx")
    contstore.build_containment_index(known, idx, num_parts=64)
    stats = {}
    got = (contstore.probe_containment_index(new, idx, stats=stats)
           .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    want = con.execute(q.DOCS_CROSS_CONTAINMENT_SQL).df()
    pd.testing.assert_frame_equal(got, want)
    assert (got["action"] == "drop").any()   # quotes of knowns exist
    assert stats["post_parts_total"] == 64

    # read pruning: a 1-doc probe opens at most its <=floor(0.1*|text|)+1
    # probe shingles' partitions — a strict subset of 64 by the length bound
    stats2 = {}
    contstore.probe_containment_index(new.limit(1), idx, stats=stats2)
    assert 0 < stats2["post_parts_read"] < stats2["post_parts_total"]
    assert 0 < stats2["doc_parts_read"] <= stats2["doc_parts_total"]

    # append == union build (stale hot table and all)
    idx2 = str(tmp_path / "contidx2")
    contstore.build_containment_index(side("0123"), idx2, num_parts=16)
    n = contstore.append_containment_index(side("4567"), idx2)
    assert n > 0
    got2 = (contstore.probe_containment_index(new, idx2)
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, want)


def test_cli_cont_jobs(sf_small, tmp_path):
    """cli cont-build / cont-probe / cont-append: artifacts land, the
    probe decision table reconciles with the store API, and the append
    surface folds an increment."""
    import hashlib
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from deduplicator_ray import cli, io as dio

    docs = dio.read_parquet(os.path.join(sf_small, "documents.parquet"),
                            columns=["doc_id", "text"])

    def side_tbl(digits):
        t = docs.to_pandas()
        keep = t["doc_id"].map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest()[0] in digits)
        return t[keep].reset_index(drop=True)

    known_dir = str(tmp_path / "known")
    inc_dir = str(tmp_path / "inc")
    new_dir = str(tmp_path / "new")
    for d, digits in [(known_dir, "0123"), (inc_dir, "4567"),
                      (new_dir, "89abcdef")]:
        os.makedirs(d)
        pq_.write_table(pa.Table.from_pandas(side_tbl(digits),
                                             preserve_index=False),
                        os.path.join(d, "documents.parquet"))

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    m1 = cli.run_cont_build(known_dir, idx, num_parts=16)
    assert m1["num_parts"] == 16
    m2 = cli.run_cont_append(inc_dir, idx)
    assert m2["n_appended_rows"] > 0
    m3 = cli.run_cont_probe(new_dir, idx, out)
    dec = pq_.read_table(os.path.join(out, "decisions.parquet")).to_pandas()
    assert m3["n_new"] == len(dec) > 0
    assert m3["n_dropped"] == int((dec["action"] == "drop").sum()) > 0
    assert set(dec.columns) == {"doc_id", "matched_known", "action"}


def test_containment_probe_recall_on_multibyte_text(ray_session, tmp_path):
    """Pigeonhole recall must hold for NON-ASCII text: the bound counts
    CHAR windows, so postings/probes must hash char shingles — byte-window
    hashing over-fragments multi-byte text (up to 4× more byte windows
    than char windows) and could leave every probed hash novel, silently
    keeping a contained doc.  A CJK-range corpus with char containment
    just above threshold pins the fixed behavior."""
    import numpy as np
    import ray.data as rd

    from deduplicator_ray.state import contstore

    alphabet = [chr(0x4E00 + i) for i in range(64)]  # 3-byte UTF-8 chars

    def doc(n, seed):
        r = np.random.default_rng(seed)
        return "".join(r.choice(alphabet, size=n))

    # 8 byte-identical known copies make every SHARED shingle hot
    # (df=8 ≥ hot_df), so the df-ascending probe prefix is exactly the
    # NOVEL shingles — the regime where byte-window hashing had ≥ p novel
    # hashes (13 byte windows from a 2-char/6-byte edit vs p=10 probes)
    # and recall silently broke; char hashing leaves 9 novel < 10 probes
    base = doc(100, 7)
    known_texts = [base] * 8
    # new docs: the known text with its first 2 chars replaced —
    # char containment 84/93 ≈ 0.903 ≥ 0.9 at cont_k=8
    new_texts = ["两两" + base[2:] for _ in range(8)]
    known = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(known_texts)])
    new = rd.from_items(
        [{"doc_id": 100 + i, "text": t} for i, t in enumerate(new_texts)])

    idx = str(tmp_path / "contidx")
    contstore.build_containment_index(known, idx, cont_k=8, num_parts=8)
    out = contstore.probe_containment_index(new, idx, threshold=0.9)
    assert (out["action"] == "drop").all(), out
    # identical known copies: the smallest containing known id wins
    assert (out["matched_known"] == 0).all()
