"""Scale-contract pins for the containment family's round-3 rework: the
exact-verify stage is a partitioned two-exchange pair-text join
(stages.textjoin), replacing the round-2 ray.put broadcast of the full
corpus shingle-set table (the documented 100-TB killer).  Value equality
with the DuckDB mirror is pinned separately in test_queries_curation.py;
these tests pin the MECHANISM: no driver-side broadcast, and the join
itself behaves on crafted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from deduplicator_ray.pipelines import queries as q


class _NoPutRay:
    """Proxy for the `ray` module that forbids driver-side ray.put from
    inside pipelines.queries — everything else passes through."""

    def __getattr__(self, name):
        if name == "put":
            raise AssertionError(
                "driver ray.put inside the prefix containment path")
        return getattr(ray, name)


def test_containment_prefix_never_broadcasts(sf_small, monkeypatch):
    monkeypatch.setattr(q, "ray", _NoPutRay())
    out = q.docs_containment_pairs_prefix(sf_small)
    assert len(out) > 0  # non-vacuous: real pairs flowed through the join
    assert (out["cont_e6"] >= 900_000).all()


def test_pair_text_join_attaches_both_sides():
    from deduplicator_ray.stages.textjoin import pair_text_join

    texts = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma", "delta"]),
    }))
    cands = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 9], pa.int64()),   # 9 has no text → drop
        "dst": pa.array([2, 3, 8, 1], pa.int64()),   # 8 has no text → drop
    }))

    def verify(full: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": full["src"].to_numpy(np.int64),
            "dst": full["dst"].to_numpy(np.int64),
            "joined": (full["text_a"] + "|" + full["text_b"]).astype(object),
        })

    out = pair_text_join(
        cands, texts, texts, verify,
        out_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                              ("joined", pa.string())]),
        num_parts=4).to_pandas().sort_values(["src", "dst"])
    got = list(zip(out["src"], out["dst"], out["joined"]))
    assert got == [(1, 2, "alpha|beta"), (2, 3, "beta|gamma")]


def test_pair_text_join_empty_candidates():
    from deduplicator_ray.stages.textjoin import pair_text_join

    texts = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["alpha"]),
    }))
    cands = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))

    out = pair_text_join(
        cands, texts, texts, lambda f: f[["src", "dst"]],
        out_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        num_parts=2).to_pandas()
    assert len(out) == 0


def test_containment_verify_side_aware_cache():
    """The shingle cache must be SIDE-aware: src and dst may be
    independently numbered corpora (the persisted cross-corpus probe), so
    a same-numbered pair with DIFFERENT texts must not reuse side a's
    shingle set for side b (pre-fix: fabricated containment 1.0 →
    silent false drop)."""
    import pandas as pd

    from deduplicator_ray.pipelines.queries import _containment_verify

    verify = _containment_verify(0.9, 8)
    clash = pd.DataFrame({
        "src": [7], "dst": [7],
        "text_a": ["a b c d e f g h"],
        "text_b": ["z y x w v u t s"],
    })
    assert len(verify(clash)) == 0

    same = pd.DataFrame({
        "src": [7], "dst": [7],
        "text_a": ["a b c d e f g h"],
        "text_b": ["a b c d e f g h"],
    })
    out = verify(same)
    assert len(out) == 1 and out.iloc[0]["cont_e6"] == 1_000_000
