"""Substring dedup (pipelines/substring.py) — handcrafted ExactSubstr
semantics checks: cross-doc duplication, within-doc repetition, canonical
first occurrence, span merging, hash-collision safety via exact verify."""

import numpy as np
import pandas as pd
import ray.data as rd

from deduplicator_ray.pipelines.substring import (
    _batch_windows,
    substring_dup_spans,
)


def _spans(docs: dict[int, str], k: int) -> pd.DataFrame:
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs.items()])
    out = substring_dup_spans(ds, k=k, num_parts=4).to_pandas()
    if out.empty:  # ray drops column metadata on empty to_pandas
        return pd.DataFrame(columns=["doc_id", "span_start", "span_end", "n_windows"])
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def test_batch_windows_positions_and_boundaries():
    doc_idx, pos, wh = _batch_windows(["a b c d", "x y z"], 2)
    # doc0: 3 windows at pos 1..3; doc1: 2 windows at 1..2 — none cross docs
    got = sorted(zip(doc_idx.tolist(), pos.tolist()))
    assert got == [(0, 1), (0, 2), (0, 3), (1, 1), (1, 2)]
    # identical windows hash identically, distinct differ
    d2, p2, wh2 = _batch_windows(["a b", "a b", "b a"], 2)
    assert wh2[0] == wh2[1] != wh2[2]


def test_cross_doc_duplicate_marks_non_canonical_only():
    docs = {1: "the quick brown fox jumps over it",
            2: "prefix words the quick brown fox jumps over it",
            3: "completely unrelated sentence with other tokens"}
    out = _spans(docs, k=3)
    # doc 1 is canonical (min doc_id) — only doc 2's copy is marked
    assert set(out["doc_id"]) == {2}
    row = out.iloc[0]
    toks2 = docs[2].split(" ")
    assert toks2[row["span_start"] - 1:row["span_end"] - 1] == \
        "the quick brown fox jumps over it".split(" ")


def test_within_doc_repetition_marks_second_occurrence():
    docs = {7: "alpha beta gamma filler one two alpha beta gamma"}
    out = _spans(docs, k=3)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_id"], r["span_start"], r["span_end"]) == (7, 7, 10)


def test_overlapping_windows_merge_into_one_span():
    shared = "one two three four five six seven eight"
    docs = {1: shared + " tailA tailB",
            2: "headX headY " + shared}
    out = _spans(docs, k=3)
    # doc2's 6 duplicated windows (pos 3..8) merge into a single span
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1
    r = d2.iloc[0]
    assert (r["span_start"], r["span_end"], r["n_windows"]) == (3, 11, 6)
    assert out[out["doc_id"] == 1].empty


def test_distant_duplicates_stay_separate_spans():
    a = "red green blue"
    b = "cyan magenta yellow"
    filler = " ".join(f"f{i}" for i in range(10))
    docs = {1: a + " " + b,
            2: a + " " + filler + " " + b}
    out = _spans(docs, k=3)
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 2  # two islands separated by > k tokens
    assert d2["n_windows"].tolist() == [1, 1]


def test_no_duplicates_yields_empty():
    docs = {i: " ".join(f"w{i}_{j}" for j in range(12)) for i in range(5)}
    out = _spans(docs, k=3)
    assert len(out) == 0


def test_shuffle_strategy_matches_broadcast():
    """The no-broadcast shuffle path (for dup-sets too big to ship) must
    produce the identical span table."""
    docs = {1: "the quick brown fox jumps over it extra pad",
            2: "prefix words the quick brown fox jumps over it",
            3: "alpha beta gamma filler one two alpha beta gamma",
            4: "totally unrelated content with unique tokens here"}
    import ray.data as rd

    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs.items()])
    a = substring_dup_spans(ds, k=3, num_parts=4,
                            strategy="broadcast").to_pandas()
    b = substring_dup_spans(ds, k=3, num_parts=4,
                            strategy="shuffle").to_pandas()
    key = ["doc_id", "span_start", "span_end", "n_windows"]
    pd.testing.assert_frame_equal(
        a.sort_values(key[:2]).reset_index(drop=True)[key],
        b.sort_values(key[:2]).reset_index(drop=True)[key])
    assert len(a) > 0


def test_substring_trim_mirror_and_accounting(sf_small, ray_session):
    """docs_substring_trim: value+dtype-exact vs the token-anti-join
    mirror; token accounting closes (trimmed count == token delta vs the
    original text); non-vacuous at sf-small."""
    import duckdb
    import numpy as np
    import pandas as pd

    from deduplicator_ray.pipelines import queries as q

    eng = q.docs_substring_trim(sf_small)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')")
    orc = con.sql(q.DOCS_SUBSTRING_TRIM_SQL).df()
    assert list(eng.columns) == list(orc.columns)
    assert list(eng.dtypes) == list(orc.dtypes)
    pd.testing.assert_frame_equal(eng.reset_index(drop=True),
                                  orc.reset_index(drop=True))
    assert (eng["n_trimmed_tokens"] > 0).any()

    src = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    m = src.merge(eng, on="doc_id")
    n_orig = m["text"].str.split(" ").str.len()
    n_kept = np.where(m["trimmed_text"] == "", 0,
                      m["trimmed_text"].str.split(" ").str.len())
    assert ((n_orig - n_kept) == m["n_trimmed_tokens"]).all()


def test_auto_strategy_selects_by_measured_dup_count(ray_session):
    """'auto' must pick shuffle above the cap (pinned: broadcast flavor
    monkeypatch-poisoned, run still succeeds) and produce the identical
    span relation either side of the cap; explicit 'broadcast' REFUSES
    above the cap instead of hazarding driver memory."""
    import ray.data as rd
    from unittest import mock

    from deduplicator_ray.pipelines import substring as ss

    docs = rd.from_items([
        {"doc_id": 1,
         "text": "alpha beta gamma delta epsilon zeta eta theta iota kappa"},
        {"doc_id": 2,
         "text": "alpha beta gamma delta epsilon zeta eta theta iota kappa"},
        {"doc_id": 3,
         "text": "unrelated words only here nothing repeats in this one doc"},
    ])
    want = ss.substring_dup_spans(docs, k=8, strategy="shuffle").to_pandas()
    want = want.sort_values(list(want.columns)).reset_index(drop=True)

    # below the cap: auto == broadcast == shuffle relation
    got_auto = ss.substring_dup_spans(docs, k=8, strategy="auto").to_pandas()
    got_auto = got_auto.sort_values(list(got_auto.columns)).reset_index(drop=True)
    assert got_auto.equals(want)

    # above the cap (cap=0): auto must NEVER touch the broadcast flavor
    with mock.patch.object(
            ss, "_candidate_hits_broadcast",
            side_effect=AssertionError("auto took broadcast above cap")):
        got_big = ss.duplicated_occurrences(
            docs, k=8, strategy="auto", bcast_cap=0).to_pandas()
    assert len(got_big) > 0
    # the over-cap path reuses the materialized pass-1 dup set in the
    # shuffle flavor — the relation must be identical to plain shuffle
    occ_sh = ss.duplicated_occurrences(
        docs, k=8, strategy="shuffle").to_pandas()
    key = ["doc_id", "pos"]
    pd.testing.assert_frame_equal(
        got_big.sort_values(key).reset_index(drop=True),
        occ_sh.sort_values(key).reset_index(drop=True))

    # explicit broadcast above the cap refuses loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="shuffle"):
        ss.duplicated_occurrences(docs, k=8, strategy="broadcast",
                                  bcast_cap=0).to_pandas()
