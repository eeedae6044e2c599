"""Null-tolerance over the input_hint schema: a web corpus has failed
downloads (bytes NULL), missing alt-text (caption NULL) and absent
metadata (w/h NULL).  Every pipeline must route these — null payloads
dead-letter with the NullPayload taxonomy, null captions are "no caption"
(inert caption channel, like empty strings), null dims coerce to 0 and
fall through the codec's own validation — never crash a Ray task.
The synthetic fixtures never emit nulls, so this builds its own corpus
from fixture rows with nulls punched in."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduplicator_ray import fixtures
from deduplicator_ray import io as dio
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.pipelines import image_dedup as ip

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def null_corpus(sf_small, tmp_path_factory):
    src = fixtures.images_path(sf_small, CFG.hash_size)
    t = pq.read_table(sorted(glob.glob(src + "/*.parquet"))[0]).slice(0, 60)
    cap = t["caption"].to_pylist()
    byt = t["bytes"].to_pylist()
    w = t["w"].to_pylist()
    h = t["h"].to_pylist()
    cap[3] = None
    cap[17] = None
    byt[5] = None
    w[9] = None
    h[9] = None
    cols = {c: t[c] for c in t.column_names}
    cols["caption"] = pa.array(cap, pa.string())
    cols["bytes"] = pa.array(byt, pa.binary())
    cols["w"] = pa.array(w, pa.int32())
    cols["h"] = pa.array(h, pa.int32())
    d = str(tmp_path_factory.mktemp("nullcorpus"))
    pq.write_table(pa.table(cols), os.path.join(d, "part.parquet"))
    return d


def test_null_bytes_dead_letter(ray_session, null_corpus):
    dl = ip.dead_letter(
        ip.fingerprints(dio.read_parquet(null_corpus), CFG)).to_pandas()
    assert (dl["error"] == "NullPayload: bytes is null").sum() == 1


def test_pipelines_survive_nulls(ray_session, null_corpus):
    for fn in (ip.extended_clusters, ip.reference_decisions, ip.dup_pairs,
               ip.stock_captions, ip.caption_conflicts,
               ip.cluster_size_hist, ip.pair_distance_hist):
        out = fn(dio.read_parquet(null_corpus), CFG)
        assert out.count() >= 0  # executes without a task crash


def test_null_caption_rows_still_image_dedup(ray_session, null_corpus):
    """A row whose caption is NULL must still dedup via the image channel
    (its dhash is intact) — the caption channel just goes inert for it."""
    fp = ip._live(ip.fingerprints(dio.read_parquet(null_corpus), CFG), CFG)
    df = fp.to_pandas()
    # the punched rows are alive (status ok) — nulls cost them nothing
    assert len(df) >= 50
    clusters = ip.extended_clusters(
        dio.read_parquet(null_corpus), CFG).to_pandas()
    # the null-caption rows' ids appear in the assignment if they have
    # an image-channel duplicate (fixture groups guarantee some do)
    assert len(clusters) > 0


@pytest.fixture(scope="module")
def null_tables(sf_small, tmp_path_factory):
    """documents with NULL text rows + embeddings with NULL vectors."""
    d = str(tmp_path_factory.mktemp("nulltables"))
    t = pq.read_table(os.path.join(sf_small, "documents.parquet"))
    txt = t["text"].to_pylist()
    txt[2] = None
    txt[7] = None
    cols = {c: t[c] for c in t.column_names}
    cols["text"] = pa.array(txt, pa.string())
    pq.write_table(pa.table(cols), os.path.join(d, "documents.parquet"))
    e = pq.read_table(os.path.join(sf_small, "embeddings.parquet"))
    vec = e["embedding"].to_pylist()
    vec[1] = None
    vec[10] = None
    ecols = {c: e[c] for c in e.column_names}
    ecols["embedding"] = pa.array(vec, e["embedding"].type)
    pq.write_table(pa.table(ecols), os.path.join(d, "embeddings.parquet"))
    return d


def test_doc_pipelines_survive_null_text(ray_session, null_tables):
    import __ray_entry__ as e

    q = e.queries()
    for name in ("docs_text_stats", "docs_dup_pairs", "docs_substring_dup",
                 "docs_cdc_chunks", "docs_rarity_score"):
        out = q[name](null_tables)
        n = len(out) if hasattr(out, "__len__") else out.count()
        assert n >= 0


def test_emb_pipelines_drop_null_vectors(ray_session, null_tables):
    """NULL embeddings must drop out (the mirrors' NULL-excluding
    arithmetic), never crash a matrix stack."""
    import __ray_entry__ as e

    q = e.queries()
    for name in ("ann_cosine_topk", "emb_near_dup", "emb_srp_pairs",
                 "ann_ivf_topk", "emb_knn_join", "emb_lang_centroids"):
        out = q[name](null_tables)
        n = len(out) if hasattr(out, "__len__") else out.count()
        assert n >= 0
    # the nulled vec_ids never appear as endpoints
    pairs = q["emb_near_dup"](null_tables)
    ids = pq.read_table(os.path.join(null_tables, "embeddings.parquet"))
    nulled = {ids["vec_id"][1].as_py(), ids["vec_id"][10].as_py()}
    assert not (set(pairs["va"]) | set(pairs["vb"])) & nulled


def test_multimodal_stages_route_nulls(ray_session, null_corpus):
    """Actor-pool decode stages must status-tag null payloads (and rows
    whose dims are null) through their existing error path, not crash."""
    from deduplicator_ray.pipelines import multimodal as mm

    r = mm.resize_pipeline(dio.read_parquet(null_corpus), 32, 32).to_pandas()
    assert len(r) == 60
    assert (r["resize_status"] != "ok").sum() >= 1
    f = mm.feature_pipeline(dio.read_parquet(null_corpus), CFG).to_pandas()
    assert len(f) == 60
    assert (f["feat_status"] != "ok").sum() >= 1


def test_montage_concat_survive_null_dims(ray_session, null_corpus):
    """The per-cluster merge sinks must route null-dim members through
    their CodecError path (black tile / error row), not ValueError-crash
    on int(NaN)."""
    import pandas as pd

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines import multimodal as mm

    images = dio.read_parquet(null_corpus)
    clusters = ip.extended_clusters(images, CFG)
    out = mm.montage_pipeline(dio.read_parquet(null_corpus), clusters).to_pandas()
    assert len(out) > 0


def test_rank_mirrors_exclude_null_embeddings(ray_session, null_tables):
    """ann_cosine_topk must value-match its mirror ON a null-bearing
    corpus — the rank window's IS NOT NULL mirrors the engine's drop."""
    import duckdb

    import __ray_entry__ as e

    eng = e.queries()["ann_cosine_topk"](null_tables)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{null_tables}/embeddings.parquet')")
    orc = con.execute(e.oracle_sql()["ann_cosine_topk"]).df()
    cols = sorted(eng.columns)
    a = eng[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_null_text_value_matches_mirrors(ray_session, null_tables):
    """The round-3 review's six null-handling fixes, pinned by VALUE
    equality with the mirrors on a null-bearing corpus: NULL text docs
    must neither crash a Ray task nor weld into fabricated "None" dup
    pairs — they follow SQL NULL semantics exactly (excluded from
    shingle pairs, one NULL group in bag/exact dedup, 'same' in the
    snapshot diff, ('', 0) in the trim)."""
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{null_tables}/documents.parquet')")
    q, osql = e.queries(), e.oracle_sql()
    for name in ("docs_jaccard_pairs", "docs_containment_pairs",
                 "docs_substring_trim", "docs_bow_dedup",
                 "docs_dedup_tiers", "docs_dedup_tiers_report",
                 "docs_snapshot_diff"):
        eng = q[name](null_tables)
        orc = con.execute(osql[name]).df()
        cols = sorted(eng.columns)
        a = eng[cols].sort_values(cols).reset_index(drop=True)
        b = orc[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
        assert a.equals(b), f"{name}: value mismatch on the null corpus"
