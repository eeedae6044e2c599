"""Partitioned Bloom index: incremental dedup vs a known-corpus snapshot."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from deduplicator_ray.state import bloomstore


def _mk_corpora(tmp_path, n_known=800, n_new=300, n_overlap=120, seed=7):
    rng = np.random.default_rng(seed)
    known_keys = [f"known-{i}-{rng.integers(1 << 30)}" for i in range(n_known)]
    fresh = [f"new-{i}-{rng.integers(1 << 30)}" for i in range(n_new - n_overlap)]
    overlap = list(rng.choice(known_keys, size=n_overlap, replace=False))
    new_keys = fresh + overlap
    rng.shuffle(new_keys)
    known = rd.from_pandas(pd.DataFrame({"key": known_keys}))
    new = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(new_keys)), "key": new_keys}))
    truth = {k: ("dup_known" if k in set(known_keys) else "new")
             for k in new_keys}
    idx_dir = str(tmp_path / "bloomidx")
    bloomstore.build_bloom_index(known, "key", idx_dir, num_parts=16)
    return new, idx_dir, truth


def test_probe_matches_set_membership(tmp_path):
    new, idx_dir, truth = _mk_corpora(tmp_path)
    out = bloomstore.probe_bloom_index(new, idx_dir, "key",
                                       num_parts=16).to_pandas()
    assert len(out) == len(truth) == 300
    got = dict(zip(out["key"], out["status"]))
    assert got == truth
    assert (out["status"] == "dup_known").sum() == 120


def test_shuffle_mode_identical(tmp_path):
    new, idx_dir, truth = _mk_corpora(tmp_path, seed=11)
    a = bloomstore.probe_bloom_index(
        new, idx_dir, "key", num_parts=16, shuffle=False).to_pandas()
    b = bloomstore.probe_bloom_index(
        new, idx_dir, "key", num_parts=16, shuffle=True).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "key", "status"]]
    pd.testing.assert_frame_equal(key(a), key(b))


def test_no_false_negatives_at_candidate_stage(tmp_path):
    """Every true duplicate must survive the Bloom filter (candidates are a
    superset of the dup set — the exactness guarantee of the design)."""
    new, idx_dir, truth = _mk_corpora(tmp_path, seed=23)
    flagged = bloomstore.probe_bloom_index(new, idx_dir, "key", num_parts=16)
    out = flagged.to_pandas()
    dup_known = {k for k, v in truth.items() if v == "dup_known"}
    assert set(out.loc[out["status"] == "dup_known", "key"]) == dup_known


def test_false_positive_rate_bounded(tmp_path):
    """With 16 bits/key + 4 probes the verify stage should see only a small
    candidate excess over the true dups (FP ≈ 0.24%); assert the final
    labels are exact regardless and that an all-fresh probe stays 'new'."""
    rng = np.random.default_rng(99)
    known = rd.from_pandas(
        pd.DataFrame({"key": [f"k{i}" for i in range(2000)]}))
    idx_dir = str(tmp_path / "idx2")
    bloomstore.build_bloom_index(known, "key", idx_dir, num_parts=8)
    fresh = rd.from_pandas(
        pd.DataFrame({"key": [f"fresh-{rng.integers(1 << 40)}-{i}"
                              for i in range(2000)]}))
    out = bloomstore.probe_bloom_index(fresh, idx_dir, "key",
                                       num_parts=8).to_pandas()
    assert (out["status"] == "new").all()


def test_empty_new_side(tmp_path):
    known = rd.from_pandas(pd.DataFrame({"key": ["a", "b", "c"]}))
    idx_dir = str(tmp_path / "idx3")
    bloomstore.build_bloom_index(known, "key", idx_dir, num_parts=4)
    new = rd.from_pandas(pd.DataFrame({"key": pd.Series([], dtype=str)}))
    out = bloomstore.probe_bloom_index(new, idx_dir, "key",
                                       num_parts=4).to_pandas()
    assert len(out) == 0


def test_empty_new_side_shuffle_mode(tmp_path):
    known = rd.from_pandas(pd.DataFrame({"key": ["a", "b", "c"]}))
    idx_dir = str(tmp_path / "idx5")
    bloomstore.build_bloom_index(known, "key", idx_dir, num_parts=4)
    new = rd.from_pandas(pd.DataFrame({"key": pd.Series([], dtype=str)}))
    out = bloomstore.probe_bloom_index(new, idx_dir, "key", num_parts=4,
                                       shuffle=True).to_pandas()
    assert len(out) == 0


def test_empty_known_side(tmp_path):
    known = rd.from_pandas(pd.DataFrame({"key": pd.Series([], dtype=str)}))
    idx_dir = str(tmp_path / "idx4")
    bloomstore.build_bloom_index(known, "key", idx_dir, num_parts=4)
    new = rd.from_pandas(pd.DataFrame({"key": ["x", "y"]}))
    out = bloomstore.probe_bloom_index(new, idx_dir, "key",
                                       num_parts=4).to_pandas()
    assert list(out["status"]) == ["new", "new"]
