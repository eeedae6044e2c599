"""Regression pins for the round-2 curation-surface queries: each engine
result must VALUE-match its DuckDB mirror at sf-small (the driver runs the
same comparison at sf0.01 — these keep a mirror or engine regression from
reaching it)."""

import duckdb
import pandas as pd
import pytest

from deduplicator_ray.pipelines import queries as q


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')")
    return c


def _match(eng: pd.DataFrame, orc: pd.DataFrame):
    assert sorted(eng.columns) == sorted(orc.columns)
    cols = sorted(eng.columns)
    a = eng[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for col in cols:
        assert a[col].dtype == b[col].dtype, f"{col}: {a[col].dtype} != {b[col].dtype}"
    pd.testing.assert_frame_equal(a, b)


def test_incremental_dedup_mirror(sf_small, con):
    eng = q.docs_incremental_dedup(sf_small)
    orc = con.execute(q.DOCS_INCREMENTAL_DEDUP_SQL).df()
    _match(eng, orc)
    assert (eng["status"] == "dup_known").any()  # split must be non-vacuous


def test_sample_stratified_mirror(sf_small, con):
    eng = q.docs_sample_stratified(sf_small)
    orc = con.execute(q.DOCS_SAMPLE_STRATIFIED_SQL).df()
    _match(eng, orc)
    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(eng) < total  # a real sample: non-empty, below the corpus


def test_repetition_stats_mirror(sf_small, con):
    eng = q.docs_repetition_stats(sf_small)
    orc = con.execute(q.DOCS_REPETITION_STATS_SQL).df()
    _match(eng, orc)
    assert (eng["dup_token_frac"] > 0).any()


def test_chunking_mirror(sf_small, con):
    eng = q.docs_chunking(sf_small)
    orc = con.execute(q.DOCS_CHUNKING_SQL).df()
    _match(eng, orc)
    assert (eng.groupby("doc_id")["chunk_id"].count() > 1).any()


def test_token_budget_mirror(sf_small, con):
    eng = q.docs_token_budget(sf_small)
    orc = con.execute(q.DOCS_TOKEN_BUDGET_SQL).df()
    _match(eng, orc)
    kept = eng[eng["selected"] == "keep"]
    assert 0 < len(kept) < len(eng)  # budget binds: a real prefix
    assert kept["n_tokens"].sum() <= q.TOKEN_BUDGET


def test_decontaminate_mirror(sf_small, con):
    eng = q.docs_decontaminate(sf_small)
    orc = con.execute(q.DOCS_DECONTAMINATE_SQL).df()
    _match(eng, orc)
    assert (eng["status"] == "contaminated").any()


def test_curation_mirror(sf_small, con):
    eng = q.docs_curation(sf_small)
    orc = con.execute(q.DOCS_CURATION_SQL).df()
    _match(eng, orc)
    assert set(eng["action"]) >= {"keep", "drop_lang"}


def test_curation_never_collects_labels(sf_small, monkeypatch):
    """Scale guard for the round-2 weak spot: the curation decision path
    must build AND execute without any driver-side ``Dataset.to_pandas()``
    of an intermediate table (doc_clusters / substring spans used to be
    collected and the dup-id array ray.put-broadcast — driver OOM at a
    100-TB dup fraction).  The dup set now reaches the decision via a
    doc_id-partitioned union-join, so patching to_pandas to raise must not
    fire anywhere in plan construction or streaming execution."""
    import ray.data as rd

    def boom(self, *a, **k):  # pragma: no cover - must never run
        raise AssertionError(
            "driver to_pandas() inside the curation decision path")

    monkeypatch.setattr(rd.Dataset, "to_pandas", boom)
    ds = q._curation_decisions(sf_small)
    n = sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow"))
    assert n > 0


def test_leakage_split_mirror(sf_small, con):
    """Near-dup-aware train/val split: value-matches the recursive-CTE +
    md5-bucket mirror, covers every document, and never lets a near-dup
    component straddle the split boundary."""
    import hashlib

    from deduplicator_ray import io as dio
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines.doc_dedup import doc_leakage_split

    ds = dio.read_parquet(f"{sf_small}/documents.parquet",
                          columns=["doc_id", "text"])
    eng = doc_leakage_split(ds, PipelineConfig(),
                            train_pct=q.LEAKAGE_TRAIN_PCT).to_pandas()
    orc = con.execute(q.DOCS_LEAKAGE_SPLIT_SQL).df()
    _match(eng, orc)

    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(eng) == total                       # full coverage
    assert (eng.groupby("split_key")["split"].nunique() == 1).all()
    assert eng["bucket"].between(0, 99).all()
    assert (eng["split"] == "train").mean() > 0.5  # 90/10 intent holds
    # the bucket hash is the documented portable expression
    row = eng.iloc[0]
    assert row["bucket"] == int(
        hashlib.md5(row["split_key"].encode()).hexdigest()[:8], 16) % 100


def test_cluster_update_mirror(sf_small, con):
    """Incremental maintenance == full recompute == the clusters mirror.
    Also pins that the deterministic known/new split is non-vacuous AND
    that at least one delta edge crossed the boundary (otherwise the test
    would pass with an empty increment)."""
    import hashlib

    eng = q.docs_cluster_update(sf_small)
    orc = con.execute(q.DOCS_CLUSTERS_SQL).df()
    _match(eng, orc)

    def is_new(i: str) -> bool:
        from deduplicator_ray.pipelines.doc_dedup import NEW_BUCKET_THRESHOLD
        return (int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
                >= NEW_BUCKET_THRESHOLD)

    sides = {is_new(d) for d in eng["doc_id"]}
    assert sides == {True, False}  # clustered docs on both sides
    # at least one cluster mixes known and new members
    mixed = (eng.assign(new=[is_new(d) for d in eng["doc_id"]])
             .groupby("cluster_id")["new"].nunique() > 1)
    assert mixed.any()


def test_source_priority_mirror(sf_small, con):
    """Cross-source merge election: keep the most-trusted source's copy per
    near-dup cluster; non-vacuity = at least one cluster spans sources."""
    import __ray_entry__ as e

    eng = e.queries()["docs_source_priority"](sf_small)
    orc = con.execute(q.DOCS_SOURCE_PRIORITY_SQL).df()
    _match(eng, orc)
    multi = eng.groupby("cluster_id")["source"].nunique() > 1
    assert multi.any()
    assert (eng.groupby("cluster_id")["action"]
            .apply(lambda a: (a == "keep").sum() == 1)).all()


def test_cdc_chunks_mirror(sf_small, con):
    """Block-level CDC dedup: the engine's distributed chunk-hash groupby
    must equal the SQL aggregation over the kernel-replay sidecar, and the
    result must be non-vacuous (the corpus plants cross-doc shared spans)."""
    from deduplicator_ray import fixtures

    eng = q.docs_cdc_chunks(sf_small)
    cdc = fixtures.cdc_sidecar_path(sf_small) + "/*.parquet"
    orc = con.sql(q.DOCS_CDC_CHUNKS_SQL.replace("{cdc}", cdc)).df()
    _match(eng, orc)
    assert len(eng) > 0
    assert (eng["n_docs"] >= 1).all() and (eng["bytes_saved"] > 0).all()


def test_cdc_kernel_properties():
    """cdc_chunk_spans invariants: chunks tile each doc exactly; identical
    docs yield identical chunk-hash multisets; a prefix edit re-synchronizes
    (suffix chunks shared with the original — the CDC property fixed-size
    blocking lacks); chunk lengths respect the max bound."""
    import numpy as np

    from deduplicator_ray.functions.text import cdc_chunk_spans

    rng = np.random.default_rng(11)
    words = ["w%03d" % i for i in range(200)]
    base = " ".join(rng.choice(words, size=400))
    edited = "PREFIX EDIT " + base
    texts = [base, base, edited, "", "tiny"]
    d, s, ln, h = cdc_chunk_spans(texts)
    for i, t in enumerate(texts):
        b = t.encode()
        sel = d == i
        if not len(b):
            assert sel.sum() == 0
            continue
        ss, ll = s[sel], ln[sel]
        assert ss[0] == 0
        assert (ss[1:] == (ss + ll)[:-1]).all()
        assert (ss + ll)[-1] == len(b)
    assert sorted(h[d == 0]) == sorted(h[d == 1])
    shared = set(h[d == 0]) & set(h[d == 2])
    assert len(shared) > 0, "prefix edit must re-synchronize chunking"
    assert (ln <= 4096).all()


def test_cdc_containment_mirror(sf_small, con):
    """Per-doc duplicated-block fraction must value-match the windowed SQL
    over the sidecar; sanity: fractions in [0, 1e6], and at least one doc
    has a nonzero duplicated fraction at sf-small."""
    from deduplicator_ray import fixtures

    eng = q.docs_cdc_containment(sf_small)
    cdc = fixtures.cdc_sidecar_path(sf_small) + "/*.parquet"
    orc = con.sql(q.DOCS_CDC_CONTAINMENT_SQL.replace("{cdc}", cdc)).df()
    _match(eng, orc)
    assert ((eng["dup_frac_e6"] >= 0) & (eng["dup_frac_e6"] <= 1_000_000)).all()
    assert (eng["dup_frac_e6"] > 0).any()


@pytest.fixture(scope="module")
def con_emb(sf_small):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')")
    return c


def test_emb_cluster_update_mirror(sf_small, con_emb):
    """Embedding-modality fold: known-side CC + exact delta edges through
    incremental_cc_update must equal the full-recompute min-label CTE; the
    increment must actually appear in the result (non-vacuity)."""
    eng = q.emb_cluster_update(sf_small)
    orc = con_emb.sql(q.EMB_CLUSTER_UPDATE_SQL).df()
    _match(eng, orc)
    assert len(eng) > 0
    assert (eng["vec_id"] % 5 == 0).any()  # new-side nodes folded in


def test_emb_cluster_remove_mirror(sf_small, con_emb):
    """Embedding-modality prune: retiring vec_id % 7 == 3 through
    incremental_cc_remove must equal clustering the survivor edge set from
    scratch; no retired node may survive."""
    eng = q.emb_cluster_remove(sf_small)
    orc = con_emb.sql(q.EMB_CLUSTER_REMOVE_SQL).df()
    _match(eng, orc)
    assert len(eng) > 0
    assert not (eng["vec_id"] % 7 == 3).any()


def test_curation_report_mirror(sf_small, con):
    """Doc-side dataset-card rollup: the combiner-aggregated report must
    equal the SQL aggregation of the full curation relation, and its
    totals must reconcile with the per-doc table."""
    eng = q.docs_curation_report(sf_small)
    orc = con.sql(q.DOCS_CURATION_REPORT_SQL).df()
    _match(eng, orc)
    per_doc = q.docs_curation(sf_small)
    assert eng["n_docs"].sum() == len(per_doc)
    kept = eng.loc[eng["action"] == "keep", "total_tokens_kept"].sum()
    assert kept == per_doc["n_tokens_kept"].sum()


def test_cli_curate_job(sf_small, tmp_path):
    """cli curate: decisions + trimmed + report artifacts; the report
    reconciles with the decision table, and trimmed rows == kept docs."""
    import json
    import os
    import shutil

    import pyarrow.dataset as pads

    from deduplicator_ray import cli

    ind = tmp_path / "in"
    ind.mkdir()
    shutil.copy(os.path.join(sf_small, "documents.parquet"), ind)
    out = str(tmp_path / "out")
    m = cli.run_curate(str(ind), out)
    dec = pads.dataset(os.path.join(out, "decisions"),
                       format="parquet").to_table().to_pandas()
    tr = pads.dataset(os.path.join(out, "trimmed"),
                      format="parquet").to_table().to_pandas()
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    n_keep = int((dec["action"] == "keep").sum())
    assert len(tr) == n_keep > 0
    rows = {r["action"]: r for r in rep["report"]}
    assert rows["keep"]["n_docs"] == n_keep
    assert sum(r["n_docs"] for r in rep["report"]) == len(dec)
    assert m["total_wall_s"] > 0


def test_emb_leakage_split_mirror(sf_small, con_emb):
    """Embedding-modality leakage split: assignment must value-match the
    SQL re-derivation (same padded md5 key), cover every non-null vector
    exactly once, and keep every cos-component on one side."""
    eng = q.emb_leakage_split(sf_small)
    orc = con_emb.sql(q.EMB_LEAKAGE_SPLIT_SQL).df()
    _match(eng, orc)
    assert eng["vec_id"].is_unique
    assert set(eng["split"]) == {"train", "val"}
    clustered = eng[eng["split_key"] != eng["vec_id"]]
    assert len(clustered) > 0  # the cluster channel actually fired
    g = eng.groupby("split_key")["split"].nunique()
    assert (g == 1).all()


def test_cli_img_curate_job(sf_small, tmp_path):
    """cli img-curate: decisions + kept + report artifacts; the report
    reconciles with the decision table and kept rows == keep decisions."""
    import json
    import os

    import pyarrow.dataset as pads

    from deduplicator_ray import cli, fixtures

    out = str(tmp_path / "imgout")
    m = cli.run_img_curate(fixtures.images_path(sf_small, 8), out)
    dec = pads.dataset(os.path.join(out, "decisions"),
                       format="parquet").to_table().to_pandas()
    kept = pads.dataset(os.path.join(out, "kept"),
                        format="parquet").to_table().to_pandas()
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    n_keep = int((dec["action"] == "keep").sum())
    assert len(kept) == n_keep > 0
    assert set(kept["image_id"]) == set(
        dec.loc[dec["action"] == "keep", "image_id"])
    rows = {r["action"]: r for r in rep["report"]}
    assert rows["keep"]["n_images"] == n_keep
    assert sum(r["n_images"] for r in rep["report"]) == len(dec)
    assert m["total_wall_s"] > 0


def test_containment_pairs_mirror(sf_small, con):
    """Directed shingle-containment pairs: brute force matches the mirror,
    and the prefix-filtered scale path matches the brute force exactly
    (pigeonhole recall + identical verify ⇒ identical relation)."""
    eng = q.docs_containment_pairs(sf_small)
    orc = con.execute(q.DOCS_CONTAINMENT_PAIRS_SQL).df()
    _match(eng, orc)
    px = q.docs_containment_pairs_prefix(sf_small)
    _match(px, orc)
    assert len(eng) > 0


def test_containment_catches_what_jaccard_misses(tmp_path):
    """The operator's reason to exist: a doc quoted verbatim inside a much
    longer one has C(a→b) ≥ 0.9 but Jaccard far below the symmetric 0.8 bar
    (J ≤ |Sa|/|Sb|) — the directed relation must surface the pair, in the
    quote→host direction only, where the symmetric one sees nothing.  The
    prefix-filtered scale path must find the same pair (recall check on an
    extreme size-skew the stock corpus lacks)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(11)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    quote = " ".join(rng.choice(words) for _ in range(20))
    host = (" ".join(rng.choice(words) for _ in range(150))
            + " " + quote + " "
            + " ".join(rng.choice(words) for _ in range(150)))
    other = " ".join(rng.choice(words) for _ in range(60))
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [quote, host, other]}),
        str(tmp_path / "documents.parquet"))

    cont = q.docs_containment_pairs(str(tmp_path))
    jac = q.docs_jaccard_pairs(str(tmp_path))
    pairs = set(map(tuple, cont[["src", "dst"]].to_numpy()))
    assert (1, 2) in pairs           # quote ⊂ host, directed
    assert (2, 1) not in pairs       # host ⊄ quote
    assert jac.empty                 # symmetric Jaccard sees nothing
    px = q.docs_containment_pairs_prefix(str(tmp_path))
    assert set(map(tuple, px[["src", "dst"]].to_numpy())) == pairs


def test_emb_prototypicality_mirror(sf_small, con_emb):
    """Cosine-to-own-centroid must value-match the sidecar-replay mirror,
    cover every non-null vector once, and actually spread (a constant score
    would mean the k-means degenerated to one live bucket)."""
    from deduplicator_ray import fixtures

    proto = fixtures.proto_sidecar_path(sf_small)
    eng = q.emb_prototypicality(sf_small)
    orc = con_emb.execute(
        q.EMB_PROTOTYPICALITY_SQL.replace("{proto}", proto)).df()
    _match(eng, orc)
    assert eng["vec_id"].is_unique
    assert eng["bucket"].nunique() > 1
    assert eng["proto_e6"].nunique() > 1


def test_emb_bucket_outliers_mirror(sf_small, con_emb):
    """Bottom-k per bucket: mirror-exact, ≤ k rows per bucket, and each
    bucket's outliers score no higher than that bucket's median (they are
    genuinely the tail, not arbitrary rows)."""
    from deduplicator_ray import fixtures

    proto = fixtures.proto_sidecar_path(sf_small)
    eng = q.emb_bucket_outliers(sf_small)
    orc = con_emb.execute(
        q.EMB_BUCKET_OUTLIERS_SQL.replace("{proto}", proto)).df()
    _match(eng, orc)
    assert eng.groupby("bucket")["rnk"].max().le(5).all()
    full = q.emb_prototypicality(sf_small)
    med = full.groupby("bucket")["proto_e6"].median()
    worst = eng.groupby("bucket")["proto_e6"].max()
    assert (worst <= med.loc[worst.index] + 1).all()


def test_contained_drop_mirror(sf_small, con):
    """Containment decision closure: mirror-exact; every doc decided once;
    drops are non-vacuous; no witness chain ends in a dropped doc of equal
    or smaller size (dominance keeps the maximal elements)."""
    eng = q.docs_contained_drop(sf_small)
    orc = con.execute(q.DOCS_CONTAINED_DROP_SQL).df()
    _match(eng, orc)
    assert eng["doc_id"].is_unique
    dropped = eng[eng["action"] == "drop_contained"]
    assert len(dropped) > 0
    kept = set(eng.loc[eng["action"] == "keep", "doc_id"])
    # a mutual-containment pair keeps exactly one member: every witness of
    # an equal-size drop must itself be kept
    assert (eng["contained_in"] == -1).eq(eng["action"] == "keep").all()
    # witnesses exist as docs
    assert set(dropped["contained_in"]) <= set(eng["doc_id"])
    assert kept  # not everything dropped


def test_docs_sample_weights_mirror(sf_small, con):
    """Doc-side dedup-aware sampling weights: mirror-exact; full coverage;
    each family's total mass ≤ 1e6 with floor-division slack."""
    import __ray_entry__ as e

    eng = e.queries()["docs_sample_weights"](sf_small)
    orc = con.execute(q.DOCS_SAMPLE_WEIGHTS_SQL).df()
    _match(eng, orc)
    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(eng) == total and eng["doc_id"].is_unique
    assert (eng["family_size"] > 1).any()
    mass = eng.groupby("weight_key")["weight_e6"].sum()
    n = eng.groupby("weight_key")["weight_e6"].size()
    assert ((mass <= 1_000_000) & (mass > 1_000_000 - n)).all()


def test_emb_sample_weights_mirror(sf_small, con_emb):
    """Embedding-modality sampling weights: mirror-exact; every non-null
    vector weighted once; clustered families exist; family mass ≤ 1e6."""
    eng = q.emb_sample_weights(sf_small)
    orc = con_emb.execute(q.EMB_SAMPLE_WEIGHTS_SQL).df()
    _match(eng, orc)
    assert eng["vec_id"].is_unique
    assert (eng["family_size"] > 1).any()
    mass = eng.groupby("weight_key")["weight_e6"].sum()
    n = eng.groupby("weight_key")["weight_e6"].size()
    assert ((mass <= 1_000_000) & (mass > 1_000_000 - n)).all()


def test_emb_dedup_tiers_mirror(sf_small):
    """Embedding tier cascade (exact → near → unique) closes the tier
    matrix across the three modalities; the exact tier fires via the
    deterministic %37-copy augmentation (bit-identical vectors, so the
    engine's md5-of-float32-bytes key and the mirror's list-equality
    partition agree — the corpus has no -0.0/NaN to split them)."""
    import duckdb

    from deduplicator_ray.pipelines import queries as q

    eng = q.emb_dedup_tiers(sf_small)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_small}/embeddings.parquet')")
    orc = con.execute(q.EMB_DEDUP_TIERS_SQL).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), orc.reset_index(drop=True))
    assert set(eng["tier"]) == {"exact", "near", "unique"}
    assert ((eng["dup_of"] == eng["vec_id"])
            == (eng["tier"] == "unique")).all()
    rep = q.emb_dedup_tiers_report(sf_small)
    orep = con.execute(q.EMB_DEDUP_TIERS_REPORT_SQL).df()
    pd.testing.assert_frame_equal(rep, orep)
    assert rep["n_vecs"].sum() == len(eng)


def test_cli_tiers_job(sf_small, tmp_path):
    """cli tiers: tier table + report artifacts; the report reconciles
    with the per-image table and every tier key is valid."""
    import json
    import os

    import pyarrow.dataset as pads

    from deduplicator_ray import cli, fixtures

    out = str(tmp_path / "tiersout")
    m = cli.run_tiers(fixtures.images_path(sf_small, 8), out)
    tiers = pads.dataset(os.path.join(out, "tiers"),
                         format="parquet").to_table().to_pandas()
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert set(tiers["tier"]) <= {"byte", "hash", "near", "unique"}
    assert sum(r["n_images"] for r in rep["report"]) == len(tiers) > 0
    assert m["total_wall_s"] > 0


def test_gopher_repetition_mirror_and_kernel(sf_small, con):
    """Gopher repetition filters: engine must value-match the mirror at
    sf-small, and the kernel must reproduce hand-computed fractions on
    synthetic multiline docs (the sf corpus is single-line, so the
    line/paragraph metrics are only exercised here) — including the
    CRLF/tab-padded and NULL-text cases where naive trim()/strip()
    semantics diverge between engines."""
    eng = q.docs_gopher_repetition(sf_small)
    orc = con.execute(q.DOCS_GOPHER_REPETITION_SQL).df()
    _match(eng, orc)
    assert (eng["top2gram_char_frac_e6"] > 0).any()

    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": [
            # 4 non-empty lines, 'dup line' ×2 (8 chars each of 8+6+8+3=25)
            "dup line\nunique\n\ndup line\nabc",
            # 'a b' ×3 of W=len('a b a b a b c')=13 → top2 = 3*3*1e6//13
            "A b a B a b c",
            "",                                   # empty text: all zeros
            # CRLF + tab padding: both engines strip ' \t\r' → 3 dup 'x'
            "x\r\n\tx\nx",
            # 2 duplicate paragraphs of 3
            "p q\n\np q\n\nr",
        ],
    })
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(docs, f"{td}/documents.parquet")
        st = q.docs_gopher_repetition(td).set_index("doc_id")
        c2 = duckdb.connect()
        c2.execute("CREATE VIEW documents AS SELECT * FROM "
                   f"read_parquet('{td}/documents.parquet')")
        _match(st.reset_index(), c2.execute(q.DOCS_GOPHER_REPETITION_SQL).df())
        # NULL text must agree too (engine zeros == mirror coalesce(''))
        c2.execute("CREATE VIEW documents2 AS SELECT doc_id, "
                   "CASE WHEN doc_id = 2 THEN NULL ELSE text END AS text "
                   "FROM documents")
        orc_null = c2.execute(q.DOCS_GOPHER_REPETITION_SQL.replace(
            "FROM documents", "FROM documents2")).df()
        assert orc_null.set_index("doc_id").loc[2].tolist() == [0] * 16

    assert st.loc[0, "n_lines"] == 4
    assert st.loc[0, "dup_line_frac_e6"] == 1 * 1_000_000 // 4
    assert st.loc[0, "dup_line_char_frac_e6"] == 16 * 1_000_000 // 25
    assert st.loc[1, "top2gram_char_frac_e6"] == 3 * 3 * 1_000_000 // 13
    assert st.loc[2].tolist() == [0] * 16
    assert st.loc[3, "n_lines"] == 3
    assert st.loc[3, "dup_line_frac_e6"] == 2 * 1_000_000 // 3
    assert st.loc[4, "n_paras"] == 3
    assert st.loc[4, "dup_para_frac_e6"] == 1 * 1_000_000 // 3
    assert st.loc[4, "dup_para_char_frac_e6"] == 6 * 1_000_000 // 7


def test_gopher_gate_mirror(sf_small, con):
    eng = q.docs_gopher_gate(sf_small)
    orc = con.execute(q.DOCS_GOPHER_GATE_SQL).df()
    _match(eng, orc)
    # both actions occur and every drop names the FIRST failing rule in
    # the Table-A1 order (all 13 rules, straight from GOPHER_RULES)
    assert set(eng["action"]) == {"keep", "drop"}
    st = q.docs_gopher_repetition(sf_small).set_index("doc_id")
    for _, r in eng.loc[eng["action"] == "drop"].iterrows():
        row = st.loc[r["doc_id"]]
        first = next(name for name, col, cap in q.GOPHER_RULES
                     if row[col] > cap)
        assert r["reason"] == first
