"""The DuckDB mirrors (deduplicator_ray/mirrors.py) must reproduce the
engine's image-pipeline outputs VALUE-exactly — same rows, same labels,
same dtypes — at sf-small.  The driver runs the same comparison at sf0.01;
this pins the mirror SQL itself (threshold semantics, keeper ordering,
LSH-banded candidate set, recursive-CTE CC) so a mirror regression can't
masquerade as an engine bug."""

import duckdb
import pytest

from deduplicator_ray import fixtures, mirrors
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.pipelines import image_dedup as ip

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def paths(sf_small):
    return {
        "hashes": fixtures.hashes_path(sf_small, CFG.hash_size) + "/*.parquet",
        "images": fixtures.images_path(sf_small, CFG.hash_size) + "/*.parquet",
    }


def _compose(template, paths):
    return mirrors.compose(
        template, hashes=paths["hashes"], images=paths["images"],
        shingle_k=CFG.shingle_k, jaccard_min=CFG.jaccard_min,
        hamming_max=CFG.hamming_max)


def _assert_frame_equal(eng, orc):
    assert list(eng.columns) == list(orc.columns)
    assert len(eng) == len(orc)
    cols = list(eng.columns)
    a = eng.sort_values(cols).reset_index(drop=True)
    b = orc.sort_values(cols).reset_index(drop=True)
    assert a.equals(b), "value mismatch between engine and mirror"


def test_reference_clusters_mirror(sf_small, paths):
    eng = (ip.reference_clusters(ip.load_images(sf_small, CFG), CFG)
           .to_pandas())
    orc = duckdb.sql(_compose(mirrors.REFERENCE_CLUSTERS_SQL, paths)).df()
    _assert_frame_equal(eng[["proc_hash", "image_id"]], orc)


def test_reference_decisions_mirror(sf_small, paths):
    eng = (ip.reference_decisions(ip.load_images(sf_small, CFG), CFG)
           .to_pandas())
    orc = duckdb.sql(_compose(mirrors.REFERENCE_DECISIONS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)


def test_dedup_report_mirror(sf_small, paths):
    """Per-action operational rollup over the decision relation: row,
    cluster, and byte totals must value-match the SQL aggregation of the
    SAME shared CTE chain (dtype-exact — the driver hashes dtypes too)."""
    eng = ip.dedup_report(ip.load_images(sf_small, CFG), CFG)
    orc = duckdb.sql(_compose(mirrors.DEDUP_REPORT_SQL, paths)).df()
    assert [str(t) for t in eng.dtypes] == [str(t) for t in orc.dtypes]
    _assert_frame_equal(eng, orc)
    assert set(eng["action"]) == {"keep", "delete"}
    keep = eng.set_index("action")
    # every cluster elects exactly one keeper and drops >= 1 member
    assert keep.loc["keep", "n"] == keep.loc["keep", "n_clusters"]
    assert keep.loc["delete", "n"] >= keep.loc["delete", "n_clusters"]


def test_dup_pairs_mirror(sf_small, paths):
    """Member-level verified pairs: img Hamming ∪ md5 star ∪ cap Jaccard.
    Valid while no bucket exceeds band_group_cap (hot buckets switch to
    spanning emission) — the small fixture stays under the cap."""
    eng = (ip.dup_pairs(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.DUP_PAIRS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)


def test_extended_clusters_mirror(sf_small, paths):
    """The caption candidate set in the mirror is the LSH band join (share
    ≥1 MinHash band key), NOT exact all-pairs Jaccard — banding at 16×8 has
    ≈0.947 detection probability at jac=0.8, so only the band-join mirror
    can match the engine hash-exactly."""
    eng = (ip.extended_clusters(ip.load_images(sf_small, CFG), CFG)
           .to_pandas())
    orc = duckdb.sql(_compose(mirrors.EXTENDED_CLUSTERS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)


def test_clusters_hidealts_mirror(sf_small, paths):
    """Hide-alts survival: the sequential suppression decisions ship as the
    alt_suppressed sidecar; the mirror re-derives bucketing and
    re-thresholding relationally and must equal the engine value-exactly."""
    eng = (ip.reference_clusters_hidealts(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values(["proc_hash", "image_id"])
           .reset_index(drop=True))
    sql = mirrors.compose(
        mirrors.CLUSTERS_HIDEALTS_SQL, hashes=paths["hashes"],
        supp=fixtures.alt_suppressed_path(sf_small))
    orc = duckdb.sql(sql).df()
    _assert_frame_equal(eng, orc)


def test_cross_dedup_mirror(sf_small, paths):
    """Cross-corpus image near-dedup (img_cross_min_match) — slice/md5
    banding is pigeonhole-lossless, so the engine's banded cross-match
    must equal the mirror's plain cross join EXACTLY, keep rows included."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def side(new_side):
        def f(t):
            ids = t["image_id"].to_pylist()
            isnew = np.fromiter(
                (hashlib.md5(s.encode()).hexdigest()[0] in "0123"
                 for s in ids), bool, count=len(ids))
            return t.select(["image_id", "dhash", "dhash_hex", "status",
                             "content_md5"]).filter(
                pa.array(isnew if new_side else ~isnew))

        live = ip._live(
            ip.fingerprints(ip.load_images(sf_small, CFG), CFG), CFG)
        return live.map_batches(f, batch_format="pyarrow")

    m = ip.img_cross_min_match(side(True), side(False), CFG).to_pandas()
    new_ids = (side(True).select_columns(["image_id"]).to_pandas()
               .sort_values("image_id").reset_index(drop=True))
    eng = new_ids.merge(m.rename(columns={"matched": "matched_known"}),
                        on="image_id", how="left")
    eng["action"] = ["keep" if pd_isna else "drop"
                     for pd_isna in eng["matched_known"].isna()]
    eng["matched_known"] = eng["matched_known"].fillna("")

    orc = duckdb.sql(_compose(mirrors.CROSS_DEDUP_SQL, paths)).df()
    _assert_frame_equal(
        eng[["image_id", "matched_known", "action"]]
        .sort_values("image_id").reset_index(drop=True), orc)
    # both verdicts occur and every match points at a KNOWN-side id
    assert set(eng["action"]) == {"keep", "drop"}
    drops = eng.loc[eng["action"] == "drop", "matched_known"]
    assert all(hashlib.md5(s.encode()).hexdigest()[0] not in "0123"
               for s in drops)
    # BOTH channels fire: some drops match byte-exact md5 media (band 99),
    # the rest Hamming-match decodable images (slice bands)
    status = duckdb.sql(
        f"SELECT image_id, status FROM '{paths['hashes']}'").df() \
        .set_index("image_id")["status"]
    kinds = {status.get(m) for m in drops}
    assert kinds == {"ok", "md5_only"}


def test_cross_dedup_wide_hash():
    """img_cross_min_match's wide-fingerprint path (hash_size != 8): the
    144-bit hex payload rides the band rows and Hamming runs on the parsed
    integers — a 2-bit-flipped clone must match, a far hash must not."""
    import dataclasses

    import pyarrow as pa
    import ray.data as rd

    cfg = dataclasses.replace(CFG, hash_size=12)
    nbits = 144
    base = (1 << 143) | (0xABCDEF << 40) | 0x5A5A
    near = base ^ (1 << 7) ^ (1 << 100)          # Hamming 2 → match
    far = base ^ ((1 << 60) - 1)                 # Hamming 59 → no match
    hexw = nbits // 4

    def mk(rows):
        return rd.from_arrow(pa.Table.from_pydict({
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "dhash": pa.array([0] * len(rows), pa.int64()),
            "dhash_hex": pa.array([format(r[1], f"0{hexw}x")
                                   for r in rows], pa.string()),
            "status": pa.array(["ok"] * len(rows), pa.string()),
            "content_md5": pa.array(["m"] * len(rows), pa.string()),
        }))

    from deduplicator_ray.pipelines import image_dedup as ip

    known = mk([("k9", base), ("k2", base)])     # duplicate known: min wins
    new = mk([("n1", near), ("n2", far)])
    out = (ip.img_cross_min_match(new, known, cfg).to_pandas()
           .sort_values("image_id"))
    assert list(map(tuple, out.values)) == [("n1", "k2")]


def test_phash_clusters_mirror(sf_small, paths):
    """Pluggable hash_fn='phash': the engine's reference-mode clustering
    over the pHash keyspace must value-match REFERENCE_CLUSTERS_SQL over
    the pHash oracle sidecar (fixtures.hashes_path(sf, 8, 'phash'))."""
    import dataclasses

    cfg = dataclasses.replace(CFG, hash_fn="phash")
    eng = (ip.reference_clusters(ip.load_images(sf_small, cfg), cfg)
           .to_pandas())
    ph = {"hashes": fixtures.hashes_path(sf_small, 8, "phash") + "/*.parquet",
          "images": paths["images"]}
    orc = duckdb.sql(_compose(mirrors.REFERENCE_CLUSTERS_SQL, ph)).df()
    _assert_frame_equal(eng[["proc_hash", "image_id"]], orc)


def test_phash_extended_mirror(sf_small, paths):
    """Pluggable hash_fn='phash' through the FULL approximate path
    (banding → owner-band verify → CC): extended clusters over the pHash
    keyspace must value-match EXTENDED_CLUSTERS_SQL over the pHash oracle
    sidecar."""
    import dataclasses

    cfg = dataclasses.replace(CFG, hash_fn="phash")
    eng = (ip.extended_clusters(ip.load_images(sf_small, cfg), cfg)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    ph = {"hashes": fixtures.hashes_path(sf_small, 8, "phash") + "/*.parquet",
          "images": paths["images"]}
    orc = duckdb.sql(_compose(mirrors.EXTENDED_CLUSTERS_SQL, ph)).df()
    _assert_frame_equal(eng, orc)


def test_img_pagerank_mirror(sf_small, paths):
    """Image-side e6 PageRank: the engine's shuffled integer rounds must be
    bit-equal to the chained-CTE mirror over the verified-pair relation
    (cap lifted so the edge set is relation-defined)."""
    import dataclasses

    from deduplicator_ray.pipelines.graph import pagerank_e6

    cfg = dataclasses.replace(CFG, band_group_cap=1_000_000)
    pairs = ip.dup_pairs(ip.load_images(sf_small, cfg), cfg)
    eng = (pagerank_e6(pairs).to_pandas()
           .rename(columns={"node": "image_id"})
           .sort_values("image_id").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.IMG_PAGERANK_SQL, paths)).df()
    _assert_frame_equal(eng, orc)


def test_caption_conflicts_mirror(sf_small, paths):
    """Label-noise audit: dup-image clusters with >1 distinct caption must
    value-match the SQL over the hashes sidecar ⋈ images parquet — and the
    fixture must actually CONTAIN conflicted clusters (non-vacuous)."""
    eng = (ip.caption_conflicts(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("proc_hash").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.CAPTION_CONFLICTS_SQL, paths)).df()
    assert len(eng) > 0
    _assert_frame_equal(eng, orc)
    assert (eng["n_captions"] > 1).all()


def test_stock_captions_mirror(sf_small, paths):
    """Inverse audit: one caption on >= 2 images spanning > 1 distinct
    proc_hash (stock-caption / alt-text spam) must value-match the SQL,
    and the fixture must contain such groups (non-vacuous)."""
    eng = (ip.stock_captions(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("caption_md5").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.STOCK_CAPTIONS_SQL, paths)).df()
    assert len(eng) > 0
    _assert_frame_equal(eng, orc)
    assert (eng["n_hashes"] > 1).all()


def test_pair_distance_hist_mirror(sf_small, paths):
    """Hamming histogram over the (cap-lifted, relation-defined) verified
    pair set must value-match the SQL; both the -1 channel bucket and the
    0-distance bucket must be populated (non-vacuous)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, band_group_cap=1_000_000)
    eng = (ip.pair_distance_hist(ip.load_images(sf_small, cfg), cfg)
           .to_pandas().sort_values("ham").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.PAIR_DIST_HIST_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert set(eng["ham"]) >= {-1, 0}
    assert (eng["n_pairs"] > 0).all()


def test_cluster_size_hist_mirror(sf_small, paths):
    """Dup-family size spectrum must value-match the SQL; the reconciliation
    n_images == cluster_size * n_clusters is structural, and total images
    must equal the assignment row count (no cluster lost in the combiners)."""
    eng = (ip.cluster_size_hist(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("cluster_size").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.CLUSTER_SIZE_HIST_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert (eng["n_images"] == eng["cluster_size"] * eng["n_clusters"]).all()
    n_assigned = len(ip.extended_clusters(
        ip.load_images(sf_small, CFG), CFG).to_pandas())
    assert eng["n_images"].sum() == n_assigned


def test_img_cluster_update_mirror(sf_small, paths):
    """Incremental image-cluster maintenance == full recompute == the
    extended-clusters mirror; the known/new split must be non-vacuous and
    at least one cluster must mix known and new members (i.e. delta edges
    actually crossed the boundary)."""
    import hashlib

    eng = (ip.img_cluster_update(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.EXTENDED_CLUSTERS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)

    def is_new(i: str) -> bool:
        return (int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
                >= ip.IMG_NEW_BUCKET_THRESHOLD)

    newness = eng["image_id"].map(is_new)
    assert set(newness) == {True, False}
    mixed = eng.assign(new=newness).groupby("cluster_id")["new"].nunique() > 1
    assert mixed.any()


def test_dedup_scorecard_mirror(sf_small):
    """Pair-counting precision/recall vs fixture ground truth: the engine's
    contingency-algebra sums must value-match the SQL, and the headline
    gate must hold on the fixture (dup-pair recall ≥ 0.99 of decodable
    truth pairs)."""
    from deduplicator_ray import io as dio

    truth_glob = fixtures.truth_path(sf_small) + "/*.parquet"
    truth = dio.read_parquet(fixtures.truth_path(sf_small),
                             columns=["image_id", "group_id", "kind"])
    eng = ip.dedup_scorecard(ip.load_images(sf_small, CFG), truth, CFG)
    sql = mirrors.compose(
        mirrors.IMG_SCORECARD_SQL,
        hashes=fixtures.hashes_path(sf_small, CFG.hash_size) + "/*.parquet",
        images=fixtures.images_path(sf_small, CFG.hash_size) + "/*.parquet",
        truth=truth_glob, shingle_k=CFG.shingle_k,
        jaccard_min=CFG.jaccard_min, hamming_max=CFG.hamming_max)
    orc = duckdb.sql(sql).df()
    _assert_frame_equal(eng, orc)
    # the generator's truth groups include 'noisy' members deliberately
    # beyond the verify thresholds AND the transitive CC merges across
    # groups, so this metric is not the oracle-pair recall gate (that one
    # is pinned at 1.00 in test_extended_pairs_recall_and_precision) — it
    # is the over/under-merge audit.  Structural invariants:
    row = eng.iloc[0]
    assert row["tp"] > 0 and row["fp"] >= 0 and row["fn"] >= 0
    assert 0 < row["recall_e6"] <= 1_000_000
    assert 0 < row["precision_e6"] <= 1_000_000
    assert row["recall_e6"] >= 500_000  # majority of truth pairs found


def test_caption_langid_mirror(sf_small, paths):
    """The documents lang-ID kernel applied to the caption column must
    value-match the shared SQL relation — and be non-vacuous (>1 language
    predicted on the fixture captions)."""
    import __ray_entry__ as e
    from deduplicator_ray.pipelines import queries as q

    eng = e.queries()["img_caption_langid"](sf_small)
    orc = duckdb.sql(
        q.lang_id_sql(f"'{paths['images']}'", "image_id", "caption")).df()
    _assert_frame_equal(eng, orc)
    assert eng["lang_pred"].nunique() > 1


def test_img_leakage_split_mirror(sf_small, paths):
    """Near-dup-aware image train/val split must value-match the SQL
    re-derivation (shared extended CTE + portable md5 bucket), cover every
    live image exactly once, and keep every extended-cluster component on
    ONE side of the boundary (the leakage guarantee)."""
    eng = (ip.img_leakage_split(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.LEAKAGE_SPLIT_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert eng["image_id"].is_unique
    assert set(eng["split"]) == {"train", "val"}
    lab = ip.extended_clusters(ip.load_images(sf_small, CFG), CFG).to_pandas()
    m = lab.merge(eng, on="image_id")
    assert len(m) == len(lab)  # every clustered image got an assignment
    assert (m.groupby("cluster_id")["split"].nunique() == 1).all()


def test_img_curation_mirror(sf_small, paths):
    """The curation decision table must value-match the SQL cascade +
    election, every gate must actually fire on this corpus (non-vacuity),
    and each image gets exactly one action."""
    eng = (ip.img_curation(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.IMG_CURATION_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert eng["image_id"].is_unique
    assert {"keep", "drop_dup", "drop_small", "drop_aspect",
            "drop_poison", "dead_letter"} <= set(eng["action"])


def test_img_curation_report_mirror(sf_small, paths):
    """Rollup must value-match the SQL aggregation AND reconcile with the
    per-image table (no partial lost in the combiners)."""
    eng = ip.img_curation_report(ip.load_images(sf_small, CFG), CFG)
    orc = duckdb.sql(_compose(mirrors.IMG_CURATION_REPORT_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    per_row = (ip.img_curation(ip.load_images(sf_small, CFG), CFG)
               .to_pandas())
    g = (per_row.groupby("action", as_index=False)
         .agg(n_images=("action", "size"), total_bytes=("filesize", "sum"))
         .sort_values("action").reset_index(drop=True))
    assert (g["n_images"].to_numpy() == eng["n_images"].to_numpy()).all()
    assert (g["total_bytes"].to_numpy() == eng["total_bytes"].to_numpy()).all()


def test_img_aspect_buckets_mirror(sf_small, paths):
    """Bucket assignment must value-match the SQL argmin (same float error
    term from the same exact integer products), cover every live image,
    and actually spread across >1 bucket on this corpus."""
    eng = (ip.img_aspect_buckets(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.ASPECT_BUCKETS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert eng["bucket_idx"].nunique() > 1


def test_hamming_knn_mirror(sf_small, paths):
    """Exact Hamming k-NN: partial-top-k-per-batch combine must equal the
    SQL window relation; ranks are 1..k per probe and distances
    non-decreasing within a probe."""
    eng = ip.hamming_knn(ip.load_images(sf_small, CFG), CFG)
    orc = duckdb.sql(_compose(mirrors.HAMMING_KNN_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    g = eng.groupby("query_id")
    assert (g["rank"].apply(lambda r: list(r) == list(range(1, len(r) + 1)))).all()
    assert (g["ham"].apply(lambda h: h.is_monotonic_increasing)).all()


def test_bit_stats_mirror(sf_small, paths):
    """Per-bit dHash occupancy: 64 rows, mirror-exact, constant n_rows, and
    the corpus actually exercises both bit values (no degenerate hash)."""
    eng = ip.dhash_bit_stats(ip.load_images(sf_small, CFG), CFG)
    orc = duckdb.sql(_compose(mirrors.BIT_STATS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert len(eng) == 64
    assert eng["n_rows"].nunique() == 1
    assert (eng["n_set"] > 0).any() and (eng["n_set"] < eng["n_rows"]).any()


def test_sample_weights_mirror(sf_small, paths):
    """Dedup-aware sampling weights: mirror-exact; every live image weighted
    once; each family's total mass is ~1e6 (floor division) and clustered
    families actually exist (family_size > 1 somewhere)."""
    eng = (ip.img_sample_weights(ip.load_images(sf_small, CFG), CFG)
           .to_pandas())
    orc = duckdb.sql(_compose(mirrors.SAMPLE_WEIGHTS_SQL, paths)).df()
    from deduplicator_ray.pipelines.queries import _typed
    eng = _typed(eng, ip.SAMPLE_WEIGHTS_SCHEMA)
    _assert_frame_equal(
        eng.sort_values("image_id").reset_index(drop=True), orc)
    assert eng["image_id"].is_unique
    assert (eng["family_size"] > 1).any()
    mass = eng.groupby("weight_key")["weight_e6"].sum()
    n = eng.groupby("weight_key")["weight_e6"].size()
    assert ((mass <= 1_000_000) & (mass > 1_000_000 - n)).all()


def test_dedup_tiers_mirror(sf_small, paths):
    """Tiered classification: cheapest binding tier (byte → hash → near →
    unique) and its group-minimum dup_of must match the SQL re-derivation
    value-exactly; every tier must actually fire on the fixture corpus."""
    eng = (ip.img_dedup_tiers(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    orc = duckdb.sql(_compose(mirrors.DEDUP_TIERS_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    assert set(eng["tier"]) == {"byte", "hash", "near", "unique"}
    # keeper invariant: dup_of == own id exactly for the unique tier
    keep = eng["dup_of"] == eng["image_id"]
    assert (keep == (eng["tier"] == "unique")).all()


def test_dedup_tiers_report_mirror(sf_small, paths):
    """The per-tier rollup must equal the SQL aggregation AND reconcile
    with the per-image table."""
    eng = ip.img_dedup_tiers_report(ip.load_images(sf_small, CFG), CFG)
    orc = duckdb.sql(_compose(mirrors.DEDUP_TIERS_REPORT_SQL, paths)).df()
    _assert_frame_equal(eng, orc)
    per_img = ip.img_dedup_tiers(ip.load_images(sf_small, CFG), CFG).to_pandas()
    assert eng["n_images"].sum() == len(per_img)


def test_kernel_agreement_mirror(sf_small, paths):
    """dHash-vs-pHash dup-group agreement over one decode pass must equal
    the two-sidecar SQL re-derivation; the disagreement classes must
    actually fire (the kernels genuinely group differently)."""
    eng = (ip.img_kernel_agreement(ip.load_images(sf_small, CFG), CFG)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    sql = mirrors.compose(
        mirrors.KERNEL_AGREEMENT_SQL, hashes=paths["hashes"],
        phashes=fixtures.hashes_path(sf_small, 8, "phash") + "/*.parquet")
    orc = duckdb.sql(sql).df()
    _assert_frame_equal(eng, orc)
    assert {"both", "neither"} <= set(eng["agreement"])
    assert (eng["agreement"] != "both").any()
    # flags and class label are consistent
    both = eng["agreement"] == "both"
    assert ((eng["dup_dhash"] == 1) & (eng["dup_phash"] == 1)).equals(both)


def test_review_queue_mirror(sf_small, paths):
    """S10 human loop: the ranked low-confidence bucket queue must
    value-match its mirror, and both ambiguity reasons must be
    non-vacuous on the fixture corpus."""
    import numpy as np

    from deduplicator_ray.pipelines.queries import _typed

    out = ip.img_review_queue(ip.load_images(sf_small, CFG), CFG)
    eng = _typed(out.to_pandas(), ip.REVIEW_QUEUE_SCHEMA)
    eng = eng.sort_values(["n_members", "proc_hash"],
                          ascending=[False, True]).reset_index(drop=True)
    eng["rank"] = np.arange(1, len(eng) + 1, dtype=np.int64)
    orc = duckdb.sql(_compose(mirrors.REVIEW_QUEUE_SQL, paths)).df()
    orc["rank"] = orc["rank"].astype("int64")
    _assert_frame_equal(eng, orc)
    reasons = set(eng["reason"])
    assert "caption_conflict" in reasons
    assert reasons & {"tie_election", "both"}  # exact quality ties occur
    assert (eng["keeper"] != eng["runner_up"]).all()
