"""Reference-behavior completion: full getSeriesInfo patterns (M12),
known-alts suppression (D4), explainSort (M10), exempt filter (S2) — each
pinned against hand-computed cases from the reference source."""

import dataclasses

import pytest

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.alts import find_base_for_path, suppress_alt_members
from deduplicator_ray.stages.ranking import series_info

CFG = PipelineConfig()


# --- M12: the full pattern set of compare.py:79-92 -------------------------

@pytest.mark.parametrize("stem,expect", [
    ("pic_3", (3, "pic_<#>")),
    ("pic-27", (27, "pic-<#>")),
    ("pic 4", (4, "pic <#>")),
    ("pic(4)", (4, "pic(<#>)")),
    ("pic_p12", (12, "pic_p<#>")),
    ("pic_img7", (7, "pic_img<#>")),
    ("pic-img2", (2, "pic-img<#>")),
    ("pic-alt", (1, "pic-alt<#>")),      # empty capture → defaults to 1
    ("pic-alt3", (3, "pic-alt<#>")),
    ("pic edit", (1, "pic edit<#>")),    # no capture group → defaults to 1
    ("picX2", (2, "picX<#>")),           # lookbehind letter+single digit
    ("pic", None),
    ("pic_2000", None),                  # i > 1000 skipped (compare.py:100)
])
def test_series_info_patterns(stem, expect):
    assert series_info(stem) == expect


def test_series_info_priority_order():
    # "_(\d+)$" outranks the single-digit lookbehind pattern
    assert series_info("a_12") == (12, "a_<#>")
    # the " (n)" form: "(\d+)$" only fires with parens; " (4)" matches
    # " (\d+)$"? No — "(4)" ends with ')' so " (\d+)$" can't match; the
    # paren pattern "\((\d+)\)$" does.
    assert series_info("a (4)") == (4, "a (<#>)")


# --- D4: suppress_alt_members (compare.py:527-548) --------------------------

def test_stub_suppression_drops_series_member():
    # "x (2)" stem is a ≤12-char extension of "x" — the quick string-stub
    # method drops it when the base stem is present
    fl = ["d/x.png", "d/x (2).png"]
    assert suppress_alt_members(fl) == ["d/x.png"]


def test_stub_suppression_respects_12_char_window():
    # extension longer than 12 chars is NOT a stub match
    fl = ["d/x.png", "d/x_aaaaaaaaaaaaaaa_long_suffix.png"]
    assert set(suppress_alt_members(fl)) == set(fl)


def test_find_base_glob_branch():
    # " otm$" is glob-only (not a series_info pattern) so the common-base
    # branch fires; the glob includes the file itself (as the reference's
    # filesystem glob does) and the first sorted hit wins
    ns = ["d/pic otm.png", "d/pic.png", "d/pica.png"]
    base = find_base_for_path("d/pic otm.png", ns)
    assert base == "d/pic otm.png"  # space sorts first → self is g[0]
    # single glob hit → no base
    assert find_base_for_path("d/pic otm.png", ["d/pic otm.png"]) is False


def test_prev_series_branch_returns_stem_never_matches():
    # reference quirk: the previous-in-series branch returns the STEM, which
    # can never equal a member path with extension → no removal through it
    ns = ["d/pic_1.jpg", "d/pic_2.jpg"]
    base = find_base_for_path("d/pic_2.jpg", ns)
    # the glob branch also fires here ([-_ ][\d+]$), taking priority is NOT
    # the case: prev-series is checked first and returns the stem
    assert base == "d/pic_1"


def test_hidealts_pipeline_matches_oracle(sf_small):
    import pyarrow.parquet as pq

    from deduplicator_ray import fixtures, oracle
    from deduplicator_ray.pipelines import image_dedup as ip

    corpus = pq.read_table(fixtures.images_path(sf_small, CFG.hash_size))
    rows = oracle.compute_rows(corpus, CFG)
    want = oracle.reference_clusters_hidealts(rows, CFG)
    got = ip.reference_clusters_hidealts(
        ip.load_images(sf_small, CFG), CFG).to_pandas()
    gmap = {}
    for _, r in got.iterrows():
        gmap.setdefault(r["proc_hash"], []).append(r["image_id"])
    assert {k: sorted(v) for k, v in gmap.items()} == want
    plain = oracle.reference_clusters(rows, CFG)
    assert len(want) <= len(plain)


def test_hidealts_oracle_suppresses_series_bucket():
    """Constructed bucket where every extra member is a series-alt of the
    base: hide-alts must drop the bucket below threshold."""
    from deduplicator_ray import oracle

    # NOTE the surviving bucket needs stems LONGER than 12 chars with
    # distinct prefixes: the reference's quick-stub check truncates the stem
    # by 12 chars (compare.py:534), so short stems produce an empty stub
    # that matches any similar-length member — reproduced bug-for-bug.
    rows = [
        {"image_id": "d/xlongenoughname.png", "status": "ok", "proc_hash": "ab" * 8},
        {"image_id": "d/xlongenoughname (2).png", "status": "ok", "proc_hash": "ab" * 8},
        {"image_id": "someplace/yellowstonepark.png", "status": "ok", "proc_hash": "cd" * 8},
        {"image_id": "otherdir/mountaintopview.png", "status": "ok", "proc_hash": "cd" * 8},
    ]
    got = oracle.reference_clusters_hidealts(rows, CFG)
    assert "ab" * 8 not in got          # alt suppressed → below threshold
    assert got["cd" * 8] == ["otherdir/mountaintopview.png",
                             "someplace/yellowstonepark.png"]


# --- M10: explainSort ------------------------------------------------------

def test_explain_column_on_keeper_rows(sf_small):
    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(CFG, explain=True)
    dec = ip.reference_decisions(ip.load_images(sf_small, cfg), cfg).to_pandas()
    assert "explain" in dec.columns
    keeps = dec[dec.action == "keep"]
    dels = dec[dec.action == "delete"]
    assert (keeps["explain"] != "").all()
    assert (dels["explain"] == "").all()
    ex = keeps["explain"].iloc[0]
    # header (dedupc.py:100) + one tuple line per bucket member
    assert ex.startswith("image(-frames, -res, -size, -density)")
    first_cluster = keeps["cluster_id"].iloc[0]
    n_members = (dec["cluster_id"] == first_cluster).sum()
    assert keeps["explain"].iloc[0].count("\t| ") == n_members


# --- S2: exempt filter -----------------------------------------------------

def test_exempt_filter(sf_small):
    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(CFG, files_exempt=("temp", "cache"))
    ds = ip.load_images(sf_small, cfg)
    ids = [x for b in ds.iter_batches(batch_format="pyarrow")
           for x in b["image_id"].to_pylist()]
    assert ids
    assert all("temp" not in i and "cache" not in i for i in ids)
    plain = ip.load_images(sf_small, CFG).count()
    assert len(ids) < plain


# --- J4: series-base self-join at corpus scale ------------------------------

def test_series_alt_pairs_matches_brute_force():
    """Every probe branch vs a per-id brute force over the same namespace:
    series across extensions (ext priority), page/img numbering, the
    trailing-digit pattern, common-base prefix families (count includes the
    alt itself; lexicographic-first base), precedence of series over
    common-base, and the negative controls (cross-dir, orphan)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.stages import alts

    ids = [
        "a/pic (1).jpg", "a/pic (1).png", "a/pic (2).png",
        "b/doc_p2.png", "b/doc_p1.gif",
        "c/img-alt.png", "c/img.png",
        "d/v_3.png", "d/v.png",
        "e/w-alt.png", "f/w.png",          # cross-dir: no pair
        "g/pagex2.png", "g/pagex1.png",
        "h/shot-img2.png", "h/shot-img1.webm",
        "i/lone (5).png",                  # orphan: no pair
    ]
    ns_set = set(ids)
    by_dir: dict[str, list[str]] = {}
    for i in ids:
        by_dir.setdefault(i[: i.rfind("/")], []).append(i)
    for d in by_dir:
        by_dir[d].sort()
    want = {}
    for iid in ids:
        eq, pre = alts.derive_probes(iid)
        d = iid[: iid.rfind("/")]
        cands = [(p, k) for p, k in eq if k in ns_set]
        for p, pref in pre:
            m = [x for x in by_dir[d] if x.startswith(pref)]
            if len(m) > 1:
                cands.append((p, m[0]))
        if cands:
            p, b = min(cands)
            want[iid] = (b, "series_prev" if p < alts._PRIO_PREFIX
                         else "common_base")
    assert len(want) == 6  # the directed families above
    out = alts.series_alt_pairs(
        rd.from_arrow(pa.table({"image_id": ids}))).to_pandas()
    got = {r.alt_id: (r.base_id, r.method) for r in out.itertuples()}
    assert got == want
    # reference quirk preserved: the sorted-glob base may be the alt itself
    assert got["c/img-alt.png"] == ("c/img-alt.png", "common_base")


# --- M13: table-pure altPathOf (compare.py:107-134) ------------------------

def _ref_alt_path_of(path: str, taken: set) -> str:
    """Per-row replica of the reference altPathOf with the isfile probe
    replaced by set membership (compare.py:107-134, absolute-path regime
    where the dirname re-join is an identity)."""
    import re as _re

    m = _re.search(r"\.[^./]*$", path)
    ext = m.group(0) if m else ""
    stem = path[: m.start()] if m else path
    si = series_info(stem)
    if si:
        i, style = si
    else:
        i, style = 1, stem + " (<#>)"
    working = style.replace("<#>", str(i)) + ext
    checks = 0
    while working == path or working in taken:
        i += 1
        checks += 1
        working = style.replace("<#>", str(i)) + ext
        assert checks < 100
    return working


def test_alt_path_of_hand_cases():
    from deduplicator_ray.stages.alts import alt_path_of

    ids = ["d1/img_1.png", "d1/img_2.png", "d1/img_4.png", "d1/photo.png",
           "d1/photo (1).png", "d1/b_007.png", "d1/cat9.gif",
           "d2/x edit.png", "d2/x edit1.png", "d2/x edit12.png",
           "d2/a-alt.png", "d2/a-alt2.png"]
    taken = set(ids)
    # next-free skips self and existing members
    assert alt_path_of("d1/img_1.png", taken) == "d1/img_3.png"
    assert alt_path_of("d1/img_4.png", taken) == "d1/img_5.png"
    # non-series default namespace "stem (<#>)"
    assert alt_path_of("d1/photo.png", taken) == "d1/photo (2).png"
    # leading zeros: formed uses the canonical number, which IS free
    assert alt_path_of("d1/b_007.png", taken) == "d1/b_7.png"
    # cross-style occupancy: "x edit12" (default-style itself) does not
    # block "x edit<#>" slots 1-2; slot 1 is taken by a real member
    assert alt_path_of("d2/x edit.png", taken) == "d2/x edit2.png"
    assert alt_path_of("d2/x edit12.png", taken) == "d2/x edit12 (1).png"
    # empty-capture alt: starts at 1, own path has no number so 1 is free
    assert alt_path_of("d2/a-alt.png", taken) == "d2/a-alt1.png"
    assert alt_path_of("d2/a-alt2.png", taken) == "d2/a-alt3.png"
    # every hand case agrees with the per-row reference replica
    for i in ids:
        assert alt_path_of(i, taken) == _ref_alt_path_of(i, taken)


def test_alt_paths_matches_reference_on_fixture_namespace(sf_small):
    """Distributed alt_paths vs the per-row reference replica over the
    corpus ∪ alt-namespace fixture id universe (the golden test the
    round-2 VERDICT asked for)."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.stages.alts import alt_paths

    ids_ds = dio.read_parquet(
        [fixtures.images_path(sf_small),
         fixtures.alt_namespace_path(sf_small)],
        columns=["image_id"])
    got = alt_paths(ids_ds).to_pandas()
    assert len(got) == ids_ds.count()          # one row per id
    assert got["image_id"].is_unique

    ids = got["image_id"].tolist()
    by_dir: dict[str, set] = {}
    for i in ids:
        d = i[: i.rfind("/")] if "/" in i else ""
        by_dir.setdefault(d, set()).add(i)
    want = {}
    for i in ids:
        d = i[: i.rfind("/")] if "/" in i else ""
        want[i] = _ref_alt_path_of(i, by_dir[d])
    mism = {i: (a, want[i]) for i, a in zip(got["image_id"], got["alt_path"])
            if a != want[i]}
    assert not mism, dict(list(mism.items())[:5])
    # non-vacuity: series members and default-namespace members both occur
    assert any(" (" in a for a in got["alt_path"])
    assert any(" (" not in a for a in got["alt_path"])
