"""End-to-end incremental ingest job (cli ingest-init / ingest): fold a
new-images parquet into persisted dedup state without re-clustering the
known corpus, resumable after a mid-job crash (round-2 VERDICT item 6)."""

import glob
import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduplicator_ray import fixtures
from deduplicator_ray import io as dio
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.pipelines import image_dedup as ip

CFG = PipelineConfig()


def _split_corpus(sf_dir: str, tmp: str, known_pct: int = 80):
    """Deterministic md5-of-id split of the fixture corpus into known/new
    parquet dirs (the img_cluster_update convention)."""
    src = glob.glob(fixtures.images_path(sf_dir) + "/*.parquet")
    tbl = pa.concat_tables([pq.read_table(p) for p in src])
    ids = tbl["image_id"].to_pylist()
    known_mask = [
        int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100 < known_pct
        for i in ids]
    known = tbl.filter(pa.array(known_mask))
    new = tbl.filter(pa.array([not m for m in known_mask]))
    kd, nd = os.path.join(tmp, "known"), os.path.join(tmp, "new")
    os.makedirs(kd), os.makedirs(nd)
    pq.write_table(known, os.path.join(kd, "part.parquet"))
    pq.write_table(new, os.path.join(nd, "part.parquet"))
    return kd, nd


def _full_recompute_clusters(paths) -> set:
    import pyarrow.compute as pc

    from deduplicator_ray.stages.components import connected_components

    fp = ip._live(ip.fingerprints(dio.read_parquet(paths), CFG), CFG)
    edges = ip.verified_edges_from_fp(fp, CFG).map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], "")).select(
            ["src", "dst"]), batch_format="pyarrow")
    df = connected_components(edges, CFG).to_pandas()
    return set(zip(df["image_id"], df["cluster_id"]))


@pytest.fixture(scope="module")
def split(sf_small, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ingest"))
    kd, nd = _split_corpus(sf_small, tmp)
    return {"tmp": tmp, "known": kd, "new": nd}


def test_ingest_end_to_end_equals_full_recompute(split):
    from deduplicator_ray import cli

    state = os.path.join(split["tmp"], "state")
    out = os.path.join(split["tmp"], "out")
    init = cli.run_ingest_init(split["known"], state)
    assert init["n_known"] > 0 and init["n_clustered"] > 0

    m = cli.run_ingest(split["new"], state, out)
    assert m["s2_delta_edges"]["n_edges"] > 0       # real new↔old linking
    assert m["s4_decisions"]["n_touched_clusters"] > 0
    assert m["s4_decisions"]["n_rows"] > 0

    got = dio.read_parquet(os.path.join(out, "clusters")).to_pandas()
    want = _full_recompute_clusters([split["known"], split["new"]])
    assert set(zip(got["image_id"], got["cluster_id"])) == want

    # the state fold makes build(known)+ingest(new) ≡ build(known ∪ new):
    # the swapped-in state assignment is the updated one
    st = dio.read_parquet(os.path.join(state, "clusters")).to_pandas()
    assert set(zip(st["image_id"], st["cluster_id"])) == want

    # decision refresh covers exactly the touched clusters, keeper rows
    # present and disjoint from deletions
    dec = dio.read_parquet(os.path.join(out, "decisions")).to_pandas()
    assert (dec.groupby("cluster_id")["action"]
            .apply(lambda s: (s == "keep").sum() == 1)).all()

    # next increment probes the folded state: an EMPTY increment is a
    # no-op that keeps the assignment identical
    out2 = os.path.join(split["tmp"], "out_empty")
    empty_dir = os.path.join(split["tmp"], "empty_inc")
    os.makedirs(empty_dir)
    pq.write_table(
        pq.read_table(os.path.join(split["new"], "part.parquet")).slice(0, 0),
        os.path.join(empty_dir, "part.parquet"))
    m2 = cli.run_ingest(empty_dir, state, out2, fold_state=False)
    assert m2["s2_delta_edges"]["n_edges"] == 0
    got2 = dio.read_parquet(os.path.join(out2, "clusters")).to_pandas()
    assert set(zip(got2["image_id"], got2["cluster_id"])) == want


def test_ingest_kill_and_resume(split, monkeypatch):
    """Crash in s3 (after s1+s2 completed) → rerun resumes: completed
    stages are skipped (markers untouched), the job completes, and the
    result equals an uninterrupted run."""
    from deduplicator_ray import cli
    from deduplicator_ray.stages import components

    state = os.path.join(split["tmp"], "state_kill")
    out = os.path.join(split["tmp"], "out_kill")
    cli.run_ingest_init(split["known"], state)

    def boom(*a, **k):
        raise RuntimeError("simulated mid-job crash")

    monkeypatch.setattr(components, "incremental_cc_update", boom)
    # cli imports the symbol inside run_ingest, so patch the module attr
    with pytest.raises(RuntimeError, match="simulated"):
        cli.run_ingest(split["new"], state, out)
    monkeypatch.undo()

    # s1/s2 markers exist, s3+ do not
    assert os.path.exists(cli._stage_marker(out, "new_fp"))
    assert os.path.exists(cli._stage_marker(out, "delta_edges"))
    assert not os.path.exists(cli._stage_marker(out, "clusters"))
    s1_mtime = os.path.getmtime(cli._stage_marker(out, "new_fp"))
    s2_mtime = os.path.getmtime(cli._stage_marker(out, "delta_edges"))

    m = cli.run_ingest(split["new"], state, out)
    # resumed run skipped the completed stages (markers untouched)
    assert os.path.getmtime(cli._stage_marker(out, "new_fp")) == s1_mtime
    assert os.path.getmtime(cli._stage_marker(out, "delta_edges")) == s2_mtime
    assert m["s3_clusters"]["n_rows"] > 0

    got = dio.read_parquet(os.path.join(out, "clusters")).to_pandas()
    want = _full_recompute_clusters([split["known"], split["new"]])
    assert set(zip(got["image_id"], got["cluster_id"])) == want


def test_ingest_rejects_config_drift(split):
    from deduplicator_ray import cli

    state = os.path.join(split["tmp"], "state")  # built by the e2e test
    if not os.path.exists(os.path.join(state, "_state_manifest.json")):
        pytest.skip("state not built yet (test ordering)")
    with pytest.raises(ValueError, match="config"):
        cli.run_ingest(split["new"], state,
                       os.path.join(split["tmp"], "out_drift"),
                       hash_size=12)


def test_ingest_refold_rerun_no_double_election(split):
    """A rerun of an ALREADY-FOLDED increment (--no-resume / lost markers,
    the scenario s5's refold_skipped branch supports) must not read the
    increment fingerprints twice — state/fingerprints already holds them
    after the fold, and a double read would enter every member into the
    keeper election twice (duplicate keeper row surfacing as a 'delete'
    decision for the keeper id)."""
    from deduplicator_ray import cli

    state = os.path.join(split["tmp"], "state_refold")
    out = os.path.join(split["tmp"], "out_refold")
    cli.run_ingest_init(split["known"], state)
    cli.run_ingest(split["new"], state, out)
    dec1 = dio.read_parquet(os.path.join(out, "decisions")).to_pandas()

    # rerun the same, now-folded increment from scratch (fresh output dir,
    # resume off: every stage recomputes against the folded state)
    out2 = os.path.join(split["tmp"], "out_refold2")
    cli.run_ingest(split["new"], state, out2, resume=False)
    dec2 = dio.read_parquet(os.path.join(out2, "decisions")).to_pandas()
    assert not dec2.duplicated(["cluster_id", "image_id"]).any()
    assert (dec2.groupby("cluster_id")["action"]
            .apply(lambda s: (s == "keep").sum() == 1)).all()
    cols = list(dec1.columns)
    a = dec1.sort_values(cols).reset_index(drop=True)
    b = dec2.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_ingest_fallback_attach_equals_broadcast(split, monkeypatch):
    """The over-cap s4 fallback (tag/union partitioned attach — NOT
    Dataset.join) must produce the same decision relation as the broadcast
    fast path."""
    from deduplicator_ray import cli

    state = os.path.join(split["tmp"], "state_fb")
    out_fb = os.path.join(split["tmp"], "out_fb")
    cli.run_ingest_init(split["known"], state)
    monkeypatch.setattr(cli, "_MEMBER_BCAST_CAP", 0)
    m = cli.run_ingest(split["new"], state, out_fb, fold_state=False)
    assert m["s4_decisions"]["n_rows"] > 0
    dec_fb = dio.read_parquet(os.path.join(out_fb, "decisions")).to_pandas()
    monkeypatch.undo()

    out_bc = os.path.join(split["tmp"], "out_bc")
    cli.run_ingest(split["new"], state, out_bc, fold_state=False)
    dec_bc = dio.read_parquet(os.path.join(out_bc, "decisions")).to_pandas()
    cols = list(dec_fb.columns)
    a = dec_fb.sort_values(cols).reset_index(drop=True)
    b = dec_bc.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_ingest_legacy_digest_still_guards_refold(split):
    """An increment folded under the PRE-footer-md5 digest format must
    still hit the at-most-once guard after the format change: the ledger
    lookup falls back to the legacy key, so the rerun refold-skips
    instead of re-appending the increment into persisted state."""
    import json as _json

    from deduplicator_ray import cli

    state = os.path.join(split["tmp"], "state_legacy")
    out = os.path.join(split["tmp"], "out_legacy")
    cli.run_ingest_init(split["known"], state)
    cli.run_ingest(split["new"], state, out)

    # simulate a ledger written by the OLD format: re-key the 'done'
    # entry under the legacy digest and drop the new-format key
    man_path = os.path.join(state, "_state_manifest.json")
    with open(man_path) as f:
        man = _json.load(f)
    new_key = cli._input_digest(split["new"])
    legacy_key = cli._input_digest_legacy(split["new"])
    assert man["folded_digests"].pop(new_key) == "done"
    man["folded_digests"][legacy_key] = "done"
    with open(man_path, "w") as f:
        _json.dump(man, f)

    n_fp_before = dio.read_parquet(
        os.path.join(state, "fingerprints")).count()
    out2 = os.path.join(split["tmp"], "out_legacy2")
    m = cli.run_ingest(split["new"], state, out2, resume=False)
    assert m["s5_state_fold"]["refold_skipped"] is True
    # no re-append: fingerprint state unchanged
    assert dio.read_parquet(
        os.path.join(state, "fingerprints")).count() == n_fp_before
    # and the decision refresh did not double-count the increment
    dec = dio.read_parquet(os.path.join(out2, "decisions")).to_pandas()
    assert not dec.duplicated(["cluster_id", "image_id"]).any()
    assert (dec.groupby("cluster_id")["action"]
            .apply(lambda s: (s == "keep").sum() == 1)).all()
    # the legacy hit must MIGRATE the ledger entry to the footer-md5
    # digest so the name+size-collision window closes after one run
    with open(man_path) as f:
        man2 = _json.load(f)
    assert man2["folded_digests"].get(new_key) == "done"
    assert legacy_key not in man2["folded_digests"]
