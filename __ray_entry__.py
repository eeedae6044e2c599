"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library it calls) touches ``ray.init`` / ``ray.shutdown``.

- ``entry()``        — flagship pipeline (reference-mode image dedup
  decisions) on the sf0.001 synthetic corpus.
- ``queries()``      — one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data extensions); each takes ``sf_dir``.
- ``oracle_sql()``   — DuckDB mirrors for the SQL-expressible queries
  (column names match 1:1); image-pipeline and signature queries run over
  the engine-generated image corpus / non-SQL kernels, so they get the
  rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMALL = "/root/testdata/sf0.001"


def _nonnull_vec(ds, col: str = "embedding"):
    """NULL embeddings drop out before any matrix stack (web-corpus
    failed-encode rows) — single-sourced in pipelines/queries.py."""
    from deduplicator_ray.pipelines.queries import _nonnull_vec as f

    return f(ds, col)


def _cfg():
    from deduplicator_ray.config import PipelineConfig

    return PipelineConfig()


def entry() -> Any:
    """Flagship: reference-mode dedup decision table at sf0.001."""
    from deduplicator_ray.pipelines import image_dedup as ip

    images = ip.load_images(SF_SMALL, _cfg())
    return ip.reference_decisions(images, _cfg())


# ---------------------------------------------------------------------------
# image-pipeline queries (engine-generated corpus; rows-only driver check,
# golden-tested against the oracle in tests/)


def _img_reference_clusters(sf_dir: str):
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.reference_clusters(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values(["proc_hash", "image_id"]).reset_index(drop=True)


def _img_phash_clusters(sf_dir: str):
    """Reference-mode clustering under the pluggable ``hash_fn='phash'``
    kernel (imagehash.phash semantics — DCT-II median-threshold bits,
    hashing.py:98-113): same grouping/threshold orchestration, different
    64-bit perceptual keyspace.  Driver-value-checked against a pHash
    oracle sidecar recomputed Ray-free by fixtures.hashes_path."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), hash_fn="phash")
    out = ip.reference_clusters(ip.load_images(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values(["proc_hash", "image_id"]).reset_index(drop=True)


def _img_reference_clusters_h12(sf_dir: str):
    """Reference-mode clustering at the reference's DEFAULT hash size 12
    (/root/reference/dedupc.py:586) — the 144-bit hex keyspace."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), hash_size=12)
    out = ip.reference_clusters(ip.load_images(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values(["proc_hash", "image_id"]).reset_index(drop=True)


def _ns_union(sf_dir: str, cfg):
    """images ∪ the non-strict extension corpus (vcon video/animated
    stand-ins, fixtures.nonstrict_images_path) — the id universe of the
    non-strict-mode queries."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio

    return dio.read_parquet([fixtures.images_path(sf_dir, cfg.hash_size),
                             fixtures.nonstrict_images_path(sf_dir)])


def _img_reference_clusters_nonstrict(sf_dir: str):
    """Reference-mode clustering with the NON-strict getProcHash switch
    (/root/reference/dupedb.py:82-98; the GUI's default,
    compare.py:223-238): video/animated rows fingerprint by frame-0 dHash
    into the SAME unified keyspace, so a re-encoded video (byte-distinct,
    visually identical first frame) clusters with its original — the
    match strict mode misses by design."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), strict=False)
    out = ip.reference_clusters(_ns_union(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values(
        ["proc_hash", "image_id"]).reset_index(drop=True)


def _img_png_variant_clusters(sf_dir: str):
    """Reference-mode clustering over the PNG-breadth extension corpus:
    the SAME pixels re-saved through every supported PNG layout (palette
    / grayscale / gray+alpha / RGBA / 16-bit / Adam7) must land in one
    proc_hash bucket — the reference clusters whatever PIL opens
    (/root/reference/dupedb.py:85-86), and a truecolor-only decoder
    dead-letters ~half of real-web PNGs instead of clustering them.
    Mirror: REFERENCE_CLUSTERS_SQL over the pngx oracle sidecar."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    ds = dio.read_parquet(fixtures.pngx_images_path(sf_dir))
    out = ip.reference_clusters(ds, _cfg())
    return out.to_pandas().sort_values(
        ["proc_hash", "image_id"]).reset_index(drop=True)


def _img_progressive_jpeg_clusters(sf_dir: str):
    """Reference-mode clustering over the progressive-JPEG extension
    corpus: a baseline jpg and its SOF2 progressive re-save carry the
    same pixels → one proc_hash bucket (T.81 Annex G decode; the
    reference hashes whatever PIL opens, /root/reference/dupedb.py:85-86).
    Mirror: REFERENCE_CLUSTERS_SQL over the projpg oracle sidecar."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    ds = dio.read_parquet(fixtures.projpg_images_path(sf_dir))
    out = ip.reference_clusters(ds, _cfg())
    return out.to_pandas().sort_values(
        ["proc_hash", "image_id"]).reset_index(drop=True)


def _img_mp4_container_meta(sf_dir: str):
    """Distributed fingerprint pass over REAL mp4 containers: the frames
    column comes from the ISO BMFF box walk (codecs.parse_mp4_meta — the
    metadata cv2 reads for the reference, dupedb.py:92-98), the
    fingerprint stays the honest md5 stub, and malformed streams keep
    frames=1 instead of crashing.  Mirror: projection of the mp4x oracle
    sidecar (Ray-free recompute of the same kernel)."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    fp = ip.fingerprints(dio.read_parquet(fixtures.mp4x_images_path(sf_dir)),
                         _cfg())
    out = fp.select_columns(["image_id", "status", "frames"]).to_pandas()
    out["frames"] = out["frames"].astype("int64")
    return out.sort_values("image_id").reset_index(drop=True)


def _img_webm_container_meta(sf_dir: str):
    """Distributed fingerprint pass over REAL Matroska/webm containers:
    frames from the EBML SimpleBlock walk (codecs.parse_webm_meta — the
    metadata cv2 reads for the reference's other video extension,
    dupedb.py:53-65, 92-98), fingerprint stays the honest md5 stub, and
    malformed streams keep frames=1.  Mirror: projection of the webmx
    oracle sidecar."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    fp = ip.fingerprints(
        dio.read_parquet(fixtures.webmx_images_path(sf_dir)), _cfg())
    out = fp.select_columns(["image_id", "status", "frames"]).to_pandas()
    out["frames"] = out["frames"].astype("int64")
    return out.sort_values("image_id").reset_index(drop=True)


def _img_nonstrict_decisions(sf_dir: str):
    """Keeper election in non-strict mode over images ∪ the vcon corpus:
    exercises the animation-wins quality rule (makeImageSortTuple
    -frames, /root/reference/dedupc.py:62-68) with REAL frame counts — a
    multi-frame container beats a higher-resolution single-frame poster
    in its bucket."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), strict=False)
    out = ip.reference_decisions(_ns_union(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values(
        ["cluster_id", "image_id"]).reset_index(drop=True)


def _img_strict_mode_diff(sf_dir: str):
    """Mode-migration report: per container row, both modes' fingerprints
    from ONE decode pass and whether a strict↔non-strict flip would
    re-key it (map-only; containers live in the extension corpus)."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    ds = dio.read_parquet(fixtures.nonstrict_images_path(sf_dir))
    out = ip.strict_mode_diff(ds, _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_cluster_update(sf_dir: str):
    """Incremental image cluster maintenance: the known 80% of the corpus
    is clustered as a stand-in persisted checkpoint; only increment-touched
    edges are discovered and folded in (stages/components.
    incremental_cc_update).  Must equal the full-corpus extended clusters,
    so the mirror is EXTENDED_CLUSTERS_SQL itself."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.img_cluster_update(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_cluster_remove(sf_dir: str):
    """Incremental image-cluster DELETION maintenance: retire a
    deterministic md5 bucket of ids from a persisted extended-clusters
    assignment, re-verifying + re-clustering ONLY the touched components
    (persisted spanning-forest edges are not node-deletion-safe, so the
    affected survivors re-run banding→verify).  Must equal the extended
    clusters of the survivor corpus, so the mirror is
    EXTENDED_CLUSTERS_SQL over the survivor-filtered live relation."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.img_cluster_remove(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_dedup_scorecard(sf_dir: str):
    """Pair-level precision/recall of the near-dup clusters vs the fixture
    ground truth (the north rule's dup-pair-recall gate as a table) —
    contingency algebra, no pair materialization."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import image_dedup as ip

    truth = dio.read_parquet(fixtures.truth_path(sf_dir),
                             columns=["image_id", "group_id", "kind"])
    return ip.dedup_scorecard(ip.load_images(sf_dir, _cfg()), truth, _cfg())


def _img_caption_conflicts(sf_dir: str):
    """Duplicate-image clusters whose captions disagree (label-noise audit
    for paired image+caption training data)."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.caption_conflicts(ip.load_images(sf_dir, _cfg()), _cfg())
    from deduplicator_ray.pipelines.queries import _typed

    pdf = _typed(out.to_pandas(), ip.CAPTION_CONFLICT_SCHEMA)
    return pdf.sort_values("proc_hash").reset_index(drop=True)


def _img_stock_captions(sf_dir: str):
    """Stock-caption audit (inverse of caption_conflicts): one caption on
    >= 2 images spanning > 1 distinct proc_hash — alt-text spam that a
    caption-channel dedup must not treat as duplicate evidence."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.stock_captions(ip.load_images(sf_dir, _cfg()), _cfg())
    from deduplicator_ray.pipelines.queries import _typed

    pdf = _typed(out.to_pandas(), ip.STOCK_CAPTION_SCHEMA)
    return pdf.sort_values("caption_md5").reset_index(drop=True)


def _img_pair_distance_hist(sf_dir: str):
    """Hamming-distance histogram over the verified dup pairs — the
    threshold-tuning diagnostic (image-channel pairs by distance;
    md5/caption-channel pairs in the -1 bucket).  Cap-lifted config (like
    img_dup_pairs_exact) so the pair set is relation-defined and the
    histogram value-matches the SQL; the capped production path's
    spanning-forest emission would under-count hot buckets by design."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.queries import _typed

    cfg = dataclasses.replace(_cfg(), band_group_cap=1_000_000)
    out = ip.pair_distance_hist(ip.load_images(sf_dir, cfg), cfg)
    pdf = _typed(out.to_pandas(), ip.PAIR_DIST_SCHEMA)
    return pdf.sort_values("ham").reset_index(drop=True)


def _img_hamming_knn(sf_dir: str):
    """Exact dHash-Hamming k-NN for the 4 smallest live probe ids — the
    similarity-search complement of the thresholded dup pairs (partial
    top-k per batch against a broadcast probe table; no shuffle)."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.hamming_knn(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _img_bit_stats(sf_dir: str):
    """Per-bit dHash occupancy (hash-health audit): each batch collapses to
    64 partial rows; the combine is a driver-side 64-key sum."""
    from deduplicator_ray.pipelines import image_dedup as ip

    return ip.dhash_bit_stats(ip.load_images(sf_dir, _cfg()), _cfg())


def _img_sample_weights(sf_dir: str):
    """Dedup-aware sampling weights: 1e6 // extended-family size per live
    image (singleton = 1e6) — duplicate families contribute one unit of
    sampling mass each."""
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.queries import _typed

    out = ip.img_sample_weights(ip.load_images(sf_dir, _cfg()), _cfg())
    pdf = _typed(out.to_pandas(), ip.SAMPLE_WEIGHTS_SCHEMA)
    return pdf.sort_values("image_id").reset_index(drop=True)


def _img_kernel_agreement(sf_dir: str):
    """Perceptual-kernel agreement audit: dup-group membership per kernel
    keyspace (dHash vs pHash) for every image live in both."""
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.queries import _typed

    out = ip.img_kernel_agreement(ip.load_images(sf_dir, _cfg()), _cfg())
    pdf = _typed(out.to_pandas(), ip.AGREEMENT_SCHEMA)
    return pdf.sort_values("image_id").reset_index(drop=True)


def _img_dedup_tiers(sf_dir: str):
    """Tiered duplicate classification: cheapest binding tier per live
    image — byte (payload identity) → hash (proc_hash equality, the
    reference's duplicate definition) → near (extended cluster) → unique;
    dup_of = the binding tier's group minimum."""
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.queries import _typed

    out = ip.img_dedup_tiers(ip.load_images(sf_dir, _cfg()), _cfg())
    pdf = _typed(out.to_pandas(), ip.TIERS_SCHEMA)
    return pdf.sort_values("image_id").reset_index(drop=True)


def _img_dedup_tiers_report(sf_dir: str):
    """Per-tier rollup of img_dedup_tiers: marginal dedup yield of each
    successive (more expensive) tier."""
    from deduplicator_ray.pipelines import image_dedup as ip

    return ip.img_dedup_tiers_report(ip.load_images(sf_dir, _cfg()), _cfg())


def _img_cluster_size_hist(sf_dir: str):
    """Dup-family size spectrum over the extended clusters (clusters per
    size class + images they hold) — the dedup-savings rollup."""
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.queries import _typed

    out = ip.cluster_size_hist(ip.load_images(sf_dir, _cfg()), _cfg())
    pdf = _typed(out.to_pandas(), ip.CLUSTER_SIZE_SCHEMA)
    return pdf.sort_values("cluster_size").reset_index(drop=True)


def _img_leakage_split(sf_dir: str):
    """Near-dup-aware train/val split over the live image corpus — the
    image-side sibling of docs_leakage_split: every extended-cluster member
    shares its component's split key, so no verified near-dup pair
    straddles the train/val boundary; unclustered images key on their own
    id.  Same engine-portable md5 bucket expression on both sides."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.img_leakage_split(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_curation(sf_dir: str):
    """End-to-end image curation decision table (image sibling of
    docs_curation): dead-letter → poison → size → aspect gates, then a
    per-proc_hash keeper election among the survivors.  One decode pass,
    streaming classify, one survivor-only groupby — gated rows never enter
    the shuffle."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.img_curation(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_curation_report(sf_dir: str):
    """Per-action rollup of img_curation (images + bytes per action) — the
    dataset-card summary an operator reads before shipping the corpus."""
    from deduplicator_ray.pipelines import image_dedup as ip

    return ip.img_curation_report(ip.load_images(sf_dir, _cfg()), _cfg())


def _img_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucket assignment (training batch-shape planning):
    nearest fixed-ladder ratio per live image, engine-portable integer
    error term, map-only — no shuffle at any scale."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.img_aspect_buckets(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_caption_langid(sf_dir: str):
    """Language-ID over the image CAPTIONS (the text kernel applied to the
    paired-modality column — filters mixed-language caption sets before
    caption-LSH dedup)."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines.doc_dedup import text_features

    ds = dio.read_parquet(fixtures.images_path(sf_dir, _cfg().hash_size),
                          columns=["image_id", "caption"])
    out = (text_features(ds, text_col="caption")
           .select_columns(["image_id", "lang_pred"]).to_pandas())
    return out.sort_values("image_id").reset_index(drop=True)


def _img_reference_decisions(sf_dir: str):
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.reference_decisions(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values(["cluster_id", "image_id"]).reset_index(drop=True)


def _img_clusters_hidealts(sf_dir: str):
    """GUI hide-alts bucket filter (D4, compare.py:519-560).

    The reference's suppression loop mutates the bucket WHILE iterating —
    each removal changes later members' stub checks and base-membership
    tests — so the removal set is defined by sequential order, not by a
    relation.  The mirror therefore ships those removal DECISIONS as data
    (fixtures.alt_suppressed_path, a single-process replay in the same
    sorted-member order — the IVF assign/probe sidecar pattern) and
    re-derives bucketing + re-thresholding relationally
    (mirrors.CLUSTERS_HIDEALTS_SQL).  The suppression kernel itself is
    pinned by tests/test_alts.py hand-computed cases and the value-checked
    `img_series_alt_pairs` mirror covers the probe kernel relationally."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.reference_clusters_hidealts(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values(["proc_hash", "image_id"]).reset_index(drop=True)


def _img_decisions_explain(sf_dir: str):
    """explainSort output (M10, dedupc.py:99-106): keeper rows carry the
    per-bucket ranking explanation."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), explain=True)
    out = ip.reference_decisions(ip.load_images(sf_dir, cfg), cfg)
    df = out.to_pandas().sort_values(["cluster_id", "image_id"]).reset_index(drop=True)
    df["explain_lines"] = df["explain"].str.count("\n")
    return df[["cluster_id", "image_id", "action", "explain_lines"]]


def _img_series_alt_pairs(sf_dir: str):
    """J4 corpus-scale series-base self-join (findBaseFileForPath without
    broadcast or filesystem glob) — reads ONLY the id column.  The corpus's
    random directories almost never co-locate a series member with its
    base, so the id universe is corpus ∪ the deterministic alt-namespace
    fixture (directory-coherent series/alt families + negative controls) —
    the mirror reads the same union."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.stages.alts import series_alt_pairs

    ids = dio.read_parquet(
        [fixtures.images_path(sf_dir), fixtures.alt_namespace_path(sf_dir)],
        columns=["image_id"])
    out = series_alt_pairs(ids)
    return out.to_pandas().sort_values("alt_id").reset_index(drop=True)


def _img_review_queue(sf_dir: str):
    """S10's human loop as a ranked table: low-confidence buckets (keeper
    election decided only by the id tie-break, and/or conflicting
    captions)."""
    import numpy as np

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.queries import _typed

    out = ip.img_review_queue(ip.load_images(sf_dir, _cfg()), _cfg())
    pdf = _typed(out.to_pandas(), ip.REVIEW_QUEUE_SCHEMA)
    pdf = pdf.sort_values(["n_members", "proc_hash"],
                          ascending=[False, True]).reset_index(drop=True)
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
    return pdf


def _img_alt_paths(sf_dir: str):
    """M13 ``altPathOf`` (/root/reference/compare.py:107-134) as a table
    relation: per id, the next FREE series path in its directory
    namespace — same id universe as img_series_alt_pairs (corpus ∪ the
    directory-coherent alt-namespace fixture), reads ONLY the id
    column."""
    from deduplicator_ray import fixtures
    from deduplicator_ray import io as dio
    from deduplicator_ray.stages.alts import alt_paths

    ids = dio.read_parquet(
        [fixtures.images_path(sf_dir), fixtures.alt_namespace_path(sf_dir)],
        columns=["image_id"])
    out = alt_paths(ids)
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_incremental_dedup(sf_dir: str):
    """Incremental scan vs a known-corpus snapshot in the flagship image
    domain — the reference's persistent hash-store loop
    (/root/reference/dupedb.py:31-66) via the partitioned Bloom index
    (state/bloomstore.py).  Known/new split on md5(image_id) (first hex
    nibble, SQL-expressible); index over the known side's unified
    ``proc_hash`` keyspace; the new side streams through the shuffle-free
    probe + actor-pool exact verify."""
    import hashlib
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bloomstore

    cfg = _cfg()
    # ONE decode pass feeds both split sides (lazy, each call re-decoded)
    live = ip._live(ip.fingerprints(ip.load_images(sf_dir, cfg), cfg),
                    cfg).materialize()

    def live_split(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["image_id"].to_pylist()
            isnew = np.fromiter(
                (hashlib.md5(s.encode()).hexdigest()[0] in "0123"
                 for s in ids), bool, count=len(ids))
            return t.select(["image_id", "proc_hash"]).filter(
                pa.array(isnew if new_side else ~isnew))

        return live.map_batches(f, batch_format="pyarrow")

    idx_dir = tempfile.mkdtemp(prefix="imgbloom_", dir="/tmp")
    try:
        bloomstore.build_bloom_index(live_split(False), "proc_hash", idx_dir,
                                     num_parts=32)
        out = bloomstore.probe_bloom_index(live_split(True), idx_dir,
                                           "proc_hash", num_parts=32).to_pandas()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return out.sort_values("image_id").reset_index(drop=True)[
        ["image_id", "status"]]


def _img_cross_dedup(sf_dir: str):
    """Cross-corpus image near-dedup: the corpus split into a KNOWN side
    and a NEW side on the md5(image_id) nibble (the img_incremental
    convention); each new image reports the smallest known near-duplicate
    (Hamming ≤ hamming_max, or byte-exact for md5-keyed media) or 'keep'.
    Engine: image_dedup.img_cross_min_match (side-tagged slice/md5 bands,
    cross-side-only verify, distinct-hash collapse per bucket)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = _cfg()
    # materialize: three datasets derive from this fingerprint table
    # (match sides + the new-id scan) — lazy, each would re-decode the
    # corpus (the _img_cross_dedup_indexed sibling already does this)
    live = ip._live(ip.fingerprints(ip.load_images(sf_dir, cfg), cfg),
                    cfg).materialize()
    cols = ["image_id", "dhash", "dhash_hex", "status", "content_md5"]

    def side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["image_id"].to_pylist()
            isnew = np.fromiter(
                (hashlib.md5(s.encode()).hexdigest()[0] in "0123"
                 for s in ids), bool, count=len(ids))
            return t.select(cols).filter(
                pa.array(isnew if new_side else ~isnew))

        return live.map_batches(f, batch_format="pyarrow")

    m = ip.img_cross_min_match(side(True), side(False), cfg).to_pandas()
    new_ids = (side(True).select_columns(["image_id"]).to_pandas()
               .sort_values("image_id").reset_index(drop=True))
    out = new_ids.merge(m.rename(columns={"matched": "matched_known"}),
                        on="image_id", how="left")
    out["action"] = np.where(out["matched_known"].isna(), "keep", "drop")
    out["matched_known"] = out["matched_known"].fillna("")
    return out[["image_id", "matched_known", "action"]]


def _img_cross_dedup_indexed(sf_dir: str):
    """img_cross_dedup through the PERSISTED band index
    (state/bandstore.py): the known side is banded once into a
    hash-partitioned parquet index; the new side probes it reading only
    its own partitions.  Same relation, same mirror — the persisted path
    must value-match the in-run one."""
    import hashlib
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore

    cfg = _cfg()
    live = ip._live(ip.fingerprints(ip.load_images(sf_dir, cfg), cfg),
                    cfg).materialize()
    cols = ["image_id", "dhash", "dhash_hex", "status", "content_md5"]

    def side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["image_id"].to_pylist()
            isnew = np.fromiter(
                (hashlib.md5(s.encode()).hexdigest()[0] in "0123"
                 for s in ids), bool, count=len(ids))
            return t.select(cols).filter(
                pa.array(isnew if new_side else ~isnew))

        return live.map_batches(f, batch_format="pyarrow")

    work = tempfile.mkdtemp(prefix="bandidx_", dir="/tmp")
    try:
        bandstore.build_band_index(side(False), cfg, work, num_parts=64)
        m = bandstore.probe_band_index(side(True), work, cfg).to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    new_ids = (side(True).select_columns(["image_id"]).to_pandas()
               .sort_values("image_id").reset_index(drop=True))
    out = new_ids.merge(m.rename(columns={"matched": "matched_known"}),
                        on="image_id", how="left")
    out["action"] = np.where(out["matched_known"].isna(), "keep", "drop")
    out["matched_known"] = out["matched_known"].fillna("")
    return out[["image_id", "matched_known", "action"]]


def _img_dup_pairs(sf_dir: str):
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.dup_pairs(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)


def _img_dup_pairs_exact(sf_dir: str):
    """dup_pairs with the hot-bucket cap lifted: every bucket stays below
    ``band_group_cap``, so no bucket switches to spanning-forest emission
    and the verified pair set is relation-defined — value-checked against
    mirrors.DUP_PAIRS_SQL (img Hamming ∪ md5 star ∪ cap Jaccard).  The
    capped `img_dup_pairs` above is the production path; this variant
    value-checks the same verify math through the sf0.01 corpus's
    233-member identical-hash clique."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), band_group_cap=1_000_000)
    out = ip.dup_pairs(ip.load_images(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)


def _img_pagerank(sf_dir: str):
    """e6 fixed-point PageRank over the image near-dup graph: which member
    of each duplicate family is most central.  Uses the cap-lifted config
    (like img_dup_pairs_exact) so the edge set is relation-defined and the
    chained-CTE mirror is bit-exact; the capped production path feeds the
    same operator its spanning-emission edges."""
    import dataclasses

    import pyarrow as pa

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines import queries as q
    from deduplicator_ray.pipelines.graph import pagerank_e6

    cfg = dataclasses.replace(_cfg(), band_group_cap=1_000_000)
    pairs = ip.dup_pairs(ip.load_images(sf_dir, cfg), cfg)
    out = pagerank_e6(pairs).to_pandas()
    out = q._typed(out, pa.schema([("node", pa.string()),
                                   ("rank_e6", pa.int64())]))
    out = out.rename(columns={"node": "image_id"})
    return out.sort_values("image_id").reset_index(drop=True)


def _img_extended_clusters(sf_dir: str):
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.extended_clusters(ip.load_images(sf_dir, _cfg()), _cfg())
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_extended_clusters_h12(sf_dir: str):
    """Extended (LSH+CC) near-dup at the reference's DEFAULT hash size 12:
    the img channel bands hex-slice keys of the 144-bit fingerprint
    (banding.img_slices) and verifies Hamming on the unpacked bit matrix."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), hash_size=12)
    out = ip.extended_clusters(ip.load_images(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_phash_extended(sf_dir: str):
    """Extended (LSH+CC) near-dup under the pluggable ``hash_fn='phash'``
    kernel: the SAME banding/verify/CC orchestration over the DCT-II
    perceptual keyspace — demonstrates kernel pluggability through the
    full approximate path, not just the reference-mode grouping.  Mirror:
    EXTENDED_CLUSTERS_SQL over the pHash oracle sidecar."""
    import dataclasses

    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = dataclasses.replace(_cfg(), hash_fn="phash")
    out = ip.extended_clusters(ip.load_images(sf_dir, cfg), cfg)
    return out.to_pandas().sort_values("image_id").reset_index(drop=True)


def _img_dead_letter(sf_dir: str):
    """Projected to (image_id, status) so the driver can VALUE-check it
    against the fixture truth table (dead letters == the generator's
    corrupt rows); the error detail column stays on the library API."""
    from deduplicator_ray.pipelines import image_dedup as ip

    cfg = _cfg()
    out = ip.dead_letter(ip.fingerprints(ip.load_images(sf_dir, cfg), cfg))
    df = out.to_pandas().sort_values("image_id").reset_index(drop=True)
    return df[["image_id", "status"]]


def _img_validate_phash(sf_dir: str):
    """Projected to (image_id, phash): the drift set equals the truth
    table's stale-phash rows, so the mirror is SQL over images ⋈ truth;
    the recomputed dhash column stays on the library API."""
    from deduplicator_ray.pipelines import image_dedup as ip

    out = ip.validate_phash(ip.load_images(sf_dir, _cfg()), _cfg())
    df = out.to_pandas().sort_values("image_id").reset_index(drop=True)
    return df[["image_id", "phash"]]


def _docs_dup_pairs(sf_dir: str):
    import os

    import ray.data as rd

    from deduplicator_ray import io as dio

    from deduplicator_ray.pipelines.doc_dedup import doc_dup_pairs

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return doc_dup_pairs(ds, _cfg()).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)


def _docs_clusters(sf_dir: str):
    import os

    import ray.data as rd

    from deduplicator_ray import io as dio

    from deduplicator_ray.pipelines.doc_dedup import doc_clusters

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = doc_clusters(ds, _cfg()).to_pandas()
    out = out.rename(columns={"image_id": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_sample_weights(sf_dir: str):
    """Dedup-aware sampling weights over documents: 1e6 // near-dup family
    size (the doc twin of img_sample_weights)."""
    import os

    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import queries as q
    from deduplicator_ray.pipelines.doc_dedup import doc_sample_weights

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    out = q._typed(doc_sample_weights(ds, _cfg()).to_pandas(), pa.schema(
        [("doc_id", pa.string()), ("weight_key", pa.string()),
         ("family_size", pa.int64()), ("weight_e6", pa.int64())]))
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_cross_containment_indexed(sf_dir: str):
    """Cross-corpus containment probe through the PERSISTED prefix index
    (state/contstore.py): known side (md5 nibble 0-7) builds the
    hash-partitioned posting/text/hot-table index once; the new side
    probes it with df-ordered prefixes reading only its own partitions.
    The mirror is the plain two-sided containment relation."""
    import hashlib
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.state import contstore

    docs = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])

    def side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            isknown = np.fromiter(
                (hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567"
                 for i in ids), bool, count=len(ids))
            return t.filter(pa.array(~isknown if new_side else isknown))

        return docs.map_batches(f, batch_format="pyarrow")

    idx = tempfile.mkdtemp(prefix="contidx_", dir="/tmp")
    try:
        # num_parts sizes the hive fan-out: 8 at sf keeps the build from
        # drowning in tiny files; thousands at corpus scale (heap bound)
        contstore.build_containment_index(side(False), idx, num_parts=8)
        out = contstore.probe_containment_index(side(True), idx)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_keep_best(sf_dir: str):
    import os

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines.doc_dedup import doc_keep_best

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    out = doc_keep_best(ds, _cfg()).to_pandas()
    from deduplicator_ray.pipelines import queries as q
    import pyarrow as pa

    out = q._typed(out, pa.schema([("doc_id", pa.string()),
                                   ("cluster_id", pa.string()),
                                   ("action", pa.string())]))
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_source_priority(sf_dir: str):
    import os

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines.doc_dedup import doc_source_priority

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text", "source"])
    out = doc_source_priority(ds, _cfg()).to_pandas()
    from deduplicator_ray.pipelines import queries as q
    import pyarrow as pa

    out = q._typed(out, pa.schema([("doc_id", pa.string()),
                                   ("cluster_id", pa.string()),
                                   ("source", pa.string()),
                                   ("action", pa.string())]))
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_pagerank(sf_dir: str):
    """e6 fixed-point PageRank over the near-dup graph (5 exact integer
    rounds) — which member of each duplicate family is most central."""
    import os

    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import queries as q
    from deduplicator_ray.pipelines.doc_dedup import doc_dup_pairs
    from deduplicator_ray.pipelines.graph import pagerank_e6

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    out = pagerank_e6(doc_dup_pairs(ds, _cfg())).to_pandas()
    out = q._typed(out, pa.schema([("node", pa.string()),
                                   ("rank_e6", pa.int64())]))
    out = out.rename(columns={"node": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_triangles(sf_dir: str):
    """Per-node triangle participation in the near-dup graph — how tightly
    each duplicate family is interlinked (clique-ness vs chain-ness)."""
    import os

    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import queries as q
    from deduplicator_ray.pipelines.doc_dedup import doc_dup_pairs
    from deduplicator_ray.pipelines.graph import triangle_counts

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    out = triangle_counts(doc_dup_pairs(ds, _cfg())).to_pandas()
    out = q._typed(out, pa.schema([("node", pa.string()),
                                   ("triangles", pa.int64())]))
    out = out.rename(columns={"node": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs_leakage_split(sf_dir: str):
    """Near-dup-aware train/val split: every doc assigned, components share
    one split (no near-dup pair straddles the boundary), md5-bucketed so
    DuckDB re-derives the identical assignment."""
    import os

    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.pipelines import queries as q
    from deduplicator_ray.pipelines.doc_dedup import doc_leakage_split

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    out = doc_leakage_split(ds, _cfg(),
                            train_pct=q.LEAKAGE_TRAIN_PCT).to_pandas()
    out = q._typed(out, pa.schema([("doc_id", pa.string()),
                                   ("split_key", pa.string()),
                                   ("bucket", pa.int64()),
                                   ("split", pa.string())]))
    return out.sort_values("doc_id").reset_index(drop=True)


def _img_dedup_report(sf_dir: str):
    """Operational rollup of the decision table: per action, rows /
    clusters / payload bytes (delete bytes = storage reclaimed)."""
    from deduplicator_ray.pipelines import image_dedup as ip

    return ip.dedup_report(ip.load_images(sf_dir, _cfg()), _cfg())


def _docs_simhash_pairs(sf_dir: str):
    import os

    import ray.data as rd

    from deduplicator_ray import io as dio

    from deduplicator_ray.pipelines.doc_dedup import simhash_pairs

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return simhash_pairs(ds).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)


def _docs_fingerprints(sf_dir: str):
    import os

    import ray.data as rd

    from deduplicator_ray import io as dio

    from deduplicator_ray.pipelines.doc_dedup import text_features

    ds = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = text_features(ds).select_columns(["doc_id", "fingerprint", "n_tokens_bpe"])
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _mm_resize(sf_dir: str):
    """ok/error status is SQL-derivable from (fmt, truth.kind), so this
    query is value-checked; the full error taxonomy stays on the API."""
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.multimodal import resize_pipeline

    out = resize_pipeline(ip.load_images(sf_dir, _cfg()), 32, 32)
    df = out.select_columns(
        ["image_id", "w", "h", "fmt", "resize_status"]).to_pandas()
    df["status"] = df["resize_status"].str.split(":").str[0]
    df = df.drop(columns=["resize_status"])
    return df.sort_values("image_id").reset_index(drop=True)


def _mm_features(sf_dir: str):
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.multimodal import feature_pipeline

    import numpy as np

    out = feature_pipeline(ip.load_images(sf_dir, _cfg())).to_pandas()
    # hash-stable projection: micro-rounded scalars, list cols dropped
    out["edge_e3"] = np.floor(out["edge_density"].to_numpy() * 1e3 + 0.5).astype("int64")
    return out[["image_id", "edge_e3", "feat_status"]].sort_values(
        "image_id").reset_index(drop=True)


def _mm_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing over synthetic video rows (the decode
    kernel is stubbed; fake=True drives the deterministic fake decoder)."""
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray import io as dio

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.multimodal import FrameSample

    # deterministic 64-id sample (first 64 in id order — a read-order
    # limit(64) would tie the check to block arrival order)
    ids = sorted(r["image_id"] for r in ip.load_images(sf_dir, _cfg())
                 .select_columns(["image_id"]).take_all())[:64]
    vids = pa.Table.from_pydict({
        "image_id": ids,
        "bytes": [b""] * len(ids),
        "fmt": ["mp4"] * len(ids),
    })
    out = rd.from_arrow(vids).map_batches(
        FrameSample, fn_constructor_kwargs={"n_frames": 2, "fake": True},
        batch_format="pyarrow", batch_size=32, concurrency=2,
    ).to_pandas()
    return out[["image_id", "frame_idx", "w", "h", "fmt", "status"]].sort_values(
        ["image_id", "frame_idx"]).reset_index(drop=True)


def _vid_signatures(sf_dir: str):
    """Video frame-fingerprint kernel end to end: container parse → png
    decode → per-frame dHash through the VideoFrames actor pool; the mirror
    is the Ray-free sidecar recomputation of the same kernel
    (fixtures.video_frames_path), so this value-checks the DISTRIBUTED
    path — batching, fan-out, ordering — exactly like img hashing."""
    import pyarrow.compute as pc

    from deduplicator_ray.pipelines import video_dedup as vd

    out = vd.video_frames(vd.load_videos(sf_dir)).map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["video_id", "frame_idx", "frame_fp"]),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)


def _vid_dup_pairs(sf_dir: str):
    """Frame-level video near-dup: stop-frame df cap + exact Jaccard over
    frame-fp sets (re-encodes and clips match, teasers rejected).  The
    mirror re-derives cap/intersection/threshold relationally over the
    frames sidecar."""
    from deduplicator_ray.pipelines import video_dedup as vd

    out = vd.video_dup_pairs(
        vd.video_frames(vd.load_videos(sf_dir))).to_pandas()
    return out.sort_values(["video_id_a", "video_id_b"]).reset_index(drop=True)


def _vid_clusters(sf_dir: str):
    """Near-dup pairs → distributed CC → (video_id, cluster_id); mirrored
    by the same recursive min-label propagation as img_extended_clusters."""
    from deduplicator_ray.pipelines import video_dedup as vd

    out = vd.video_clusters(
        vd.video_frames(vd.load_videos(sf_dir))).to_pandas()
    return out[["video_id", "cluster_id"]].sort_values(
        "video_id").reset_index(drop=True)


def _aud_signatures(sf_dir: str):
    """Audio window-fingerprint kernel end to end: container parse → PCM
    → per-window band-energy-sign fp (Haitsma-Kalker shape) through the
    AudioSignatures actor pool; the mirror is the Ray-free sidecar
    recomputation of the same kernel (fixtures.audio_fps_path), so this
    value-checks the DISTRIBUTED path — batching, fan-out, ordering —
    exactly like vid_signatures."""
    import pyarrow.compute as pc

    from deduplicator_ray.pipelines import audio_dedup as ad

    out = ad.audio_signatures(ad.load_audios(sf_dir)).map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["audio_id", "win_idx", "win_fp"]),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["audio_id", "win_idx"]).reset_index(drop=True)


def _aud_dup_pairs(sf_dir: str):
    """Waveform-level audio near-dup: stop-fp df cap + exact Jaccard over
    window-fp sets (lossless re-encodes and clips match, teasers
    rejected).  The mirror re-derives cap/intersection/threshold
    relationally over the fps sidecar."""
    from deduplicator_ray.pipelines import audio_dedup as ad

    out = ad.audio_dup_pairs(
        ad.audio_signatures(ad.load_audios(sf_dir))).to_pandas()
    return out.sort_values(["audio_id_a", "audio_id_b"]).reset_index(drop=True)


def _aud_clusters(sf_dir: str):
    """Near-dup pairs → distributed CC → (audio_id, cluster_id); mirrored
    by the same recursive min-label propagation as vid_clusters."""
    from deduplicator_ray.pipelines import audio_dedup as ad

    out = ad.audio_clusters(
        ad.audio_signatures(ad.load_audios(sf_dir))).to_pandas()
    return out[["audio_id", "cluster_id"]].sort_values(
        "audio_id").reset_index(drop=True)


def _vid_dedup_tiers(sf_dir: str):
    """Tier-dedup cascade over videos: byte identity → frame-fp-SET
    identity → Jaccard near-dup → unique, cheapest binding tier wins
    (stages/fpsets.identity_tiers — the video twin of img_dedup_tiers)."""
    from deduplicator_ray.pipelines import video_dedup as vd

    out = vd.video_dedup_tiers(
        vd.video_tier_frames(vd.load_videos(sf_dir))).to_pandas()
    return out.sort_values("video_id").reset_index(drop=True)


def _vid_dedup_tiers_report(sf_dir: str):
    from deduplicator_ray.pipelines import video_dedup as vd

    return vd.video_dedup_tiers_report(
        vd.video_tier_frames(vd.load_videos(sf_dir)))


def _aud_dedup_tiers(sf_dir: str):
    """Tier-dedup cascade over audio: byte identity → window-fp-SET
    identity (lossless re-encode) → Jaccard near-dup → unique."""
    from deduplicator_ray.pipelines import audio_dedup as ad

    out = ad.audio_dedup_tiers(
        ad.audio_tier_signatures(ad.load_audios(sf_dir))).to_pandas()
    return out.sort_values("audio_id").reset_index(drop=True)


def _aud_dedup_tiers_report(sf_dir: str):
    from deduplicator_ray.pipelines import audio_dedup as ad

    return ad.audio_dedup_tiers_report(
        ad.audio_tier_signatures(ad.load_audios(sf_dir)))


def _mm_dedup_tier_matrix(sf_dir: str):
    """ONE table for the whole dedup-tier matrix: (modality, tier,
    n_items) across all five modalities (img/docs/emb/vid/aud) — the
    cross-modality rollup of the per-modality tier cascades, so a corpus
    operator reads the cheapest-binding-tier yield of the entire corpus
    from a single artifact.  The mirror is the UNION ALL of the five
    per-modality report mirrors, each projected onto the common shape."""
    import pandas as pd

    from deduplicator_ray.pipelines import queries as q

    specs = [
        ("aud", _aud_dedup_tiers_report, "n_audios"),
        ("docs", q.docs_dedup_tiers_report, "n_docs"),
        ("emb", q.emb_dedup_tiers_report, "n_vecs"),
        ("img", _img_dedup_tiers_report, "n_images"),
        ("vid", _vid_dedup_tiers_report, "n_videos"),
    ]
    out = []
    for modality, fn, alias in specs:
        df = fn(sf_dir)
        out.append(pd.DataFrame({
            "modality": modality,
            "tier": df["tier"].astype(str),
            "n_items": df[alias].astype("int64"),
        }))
    res = pd.concat(out, ignore_index=True)
    return res.sort_values(["modality", "tier"]).reset_index(drop=True)


def _vid_sample_weights(sf_dir: str):
    """Dedup-aware sampling weights for the VIDEO modality — closes the
    weights matrix (docs/img/emb/here): every decodable video weighs
    1e6 // its frame-Jaccard near-dup family size; the mirror re-derives
    family keys from the frames sidecar through the shared CC CTEs."""
    from deduplicator_ray.pipelines import video_dedup as vd

    out = vd.video_sample_weights(
        vd.video_frames(vd.load_videos(sf_dir))).to_pandas()
    return out.sort_values("video_id").reset_index(drop=True)


def _vid_leakage_split(sf_dir: str):
    """Near-dup-aware train/val split for the VIDEO modality — all members
    of a frame-Jaccard component share one assignment; the md5-prefix
    bucket hash is engine-portable so DuckDB re-derives it exactly."""
    from deduplicator_ray.pipelines import video_dedup as vd

    out = vd.video_leakage_split(
        vd.video_frames(vd.load_videos(sf_dir))).to_pandas()
    return out.sort_values("video_id").reset_index(drop=True)


def _aud_sample_weights(sf_dir: str):
    """Dedup-aware sampling weights for the AUDIO modality (the audio twin
    of vid_sample_weights, over window-fp Jaccard components)."""
    from deduplicator_ray.pipelines import audio_dedup as ad

    out = ad.audio_sample_weights(
        ad.audio_signatures(ad.load_audios(sf_dir))).to_pandas()
    return out.sort_values("audio_id").reset_index(drop=True)


def _aud_leakage_split(sf_dir: str):
    """Near-dup-aware train/val split for the AUDIO modality (the audio
    twin of vid_leakage_split)."""
    from deduplicator_ray.pipelines import audio_dedup as ad

    out = ad.audio_leakage_split(
        ad.audio_signatures(ad.load_audios(sf_dir))).to_pandas()
    return out.sort_values("audio_id").reset_index(drop=True)


def _mm_audio_features(sf_dir: str):
    """Audio feature-extraction plumbing over synthetic audio rows (the
    codec kernel is stubbed; fake=True drives the deterministic fake):
    duration is REAL arithmetic over the payload length at 16 kHz 16-bit
    mono PCM, loudness is the id-seeded hash — both re-derivable in SQL,
    which is what the mirror checks.  The mfcc vector is schema-tested in
    tests/ and excluded from the checked projection (list column)."""
    import hashlib

    import pyarrow as pa

    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.multimodal import audio_pipeline

    ids = sorted(r["image_id"] for r in ip.load_images(sf_dir, _cfg())
                 .select_columns(["image_id"]).take_all())[:64]
    # payload length derives from the same md5 expression the mirror
    # recomputes, so duration_ms is checkable without shipping the bytes
    lens = [1000 + int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 5000
            for i in ids]
    import ray.data as rd

    auds = pa.Table.from_pydict({
        "image_id": ids,
        "bytes": [b"\0" * n for n in lens],
        "fmt": ["mp3"] * len(ids),
    })
    out = audio_pipeline(rd.from_arrow(auds), fake=True).to_pandas()
    return (out[["image_id", "duration_ms", "sample_rate", "rms_e6",
                 "fmt", "status"]]
            .sort_values("image_id").reset_index(drop=True))


def _mm_montage(sf_dir: str):
    """S7 montage-sink analog: per-cluster thumbnail grids (sizes only in
    the check output; the bytes column is exercised by tests)."""
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.pipelines.multimodal import montage_pipeline

    images = ip.load_images(sf_dir, _cfg())
    clusters = ip.extended_clusters(images, _cfg())
    out = montage_pipeline(ip.load_images(sf_dir, _cfg()), clusters).to_pandas()
    return out[["cluster_id", "w", "h", "fmt", "n_members", "status"]].sort_values(
        "cluster_id").reset_index(drop=True)


def _ann_ivf_topk(sf_dir: str):
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from deduplicator_ray import io as dio

    from deduplicator_ray.functions.vector import ivf_topk

    from deduplicator_ray.pipelines.queries import _nonnull_vec_tbl

    qtbl = _nonnull_vec_tbl(pq.read_table(os.path.join(
        sf_dir, "embeddings.parquet"))).to_pandas()
    qdf = qtbl[qtbl["vec_id"] < 4].sort_values("vec_id")
    ds = _nonnull_vec(dio.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]))
    out = ivf_topk(ds, np.stack(qdf["embedding"].to_numpy()), qdf["vec_id"].to_numpy())
    out["cos_e6"] = np.floor(out["cos"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    return out[["query_id", "rank", "vec_id", "cos_e6"]].reset_index(drop=True)


def _ann_ivf_append(sf_dir: str):
    """Incremental ANN maintenance: IVF index built on the known 80%
    (vec_id % 5 != 0), the new 20% APPENDED without retraining
    (functions/vector.append_ivf_index), then a FULL-probe search — exact
    over known ∪ new, so the mirror is the brute-force top-k relation
    (ANN_COSINE_TOPK_SQL): the appended rows must be indistinguishable
    from an index built over the whole corpus."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_ray import io as dio
    from deduplicator_ray.functions.vector import (
        append_ivf_index,
        build_ivf_index,
        ivf_search,
    )

    from deduplicator_ray.pipelines.queries import _nonnull_vec_tbl

    qtbl = _nonnull_vec_tbl(pq.read_table(os.path.join(
        sf_dir, "embeddings.parquet"))).to_pandas()
    qdf = qtbl[qtbl["vec_id"] < 4].sort_values("vec_id")
    ds = _nonnull_vec(dio.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]))

    def side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 5 == 0) if new_side else (ids % 5 != 0)
            return t.filter(pa.array(mask))

        return ds.map_batches(f, batch_format="pyarrow")

    n_centroids = 16
    idx = tempfile.mkdtemp(prefix="ivfappend_", dir="/tmp")
    try:
        build_ivf_index(side(False), idx, n_centroids=n_centroids)
        append_ivf_index(side(True), idx)
        out = ivf_search(idx, np.stack(qdf["embedding"].to_numpy()),
                         qdf["vec_id"].to_numpy(), k=5,
                         nprobe=n_centroids)  # full probe ⇒ exact
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    out["cos_e6"] = np.floor(out["cos"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    return out[["query_id", "rank", "vec_id", "cos_e6"]].reset_index(drop=True)


def _docs_cross_dedup_indexed(sf_dir: str):
    """docs_cross_dedup through the PERSISTED doc band index
    (state/docbandstore.py): the known side is MinHash-banded once into a
    hash-partitioned parquet index; the new side probes it reading only
    its own partitions.  Same relation, same mirror — the persisted path
    must value-match the in-run one."""
    import hashlib
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.state import docbandstore

    docs = dio.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])

    def side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            isknown = np.fromiter(
                (hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567"
                 for i in ids), bool, count=len(ids))
            return t.filter(pa.array(~isknown if new_side else isknown))

        return docs.map_batches(f, batch_format="pyarrow")

    cfg = PipelineConfig()
    idx = tempfile.mkdtemp(prefix="docbandidx_", dir="/tmp")
    try:
        docbandstore.build_doc_band_index(side(False), cfg, idx)
        m = docbandstore.probe_doc_band_index(side(True), idx, cfg).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    new_ids = (side(True).select_columns(["doc_id"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    out = new_ids.merge(m.rename(columns={"matched": "matched_known"}),
                        on="doc_id", how="left")
    out["action"] = np.where(out["matched_known"].isna(), "keep", "drop")
    out["matched_known"] = out["matched_known"].fillna(-1).astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "matched_known", "action"]]


def _emb_cross_srp_indexed(sf_dir: str):
    """Cross-corpus embedding near-dup through the PERSISTED SRP index
    (state/srpstore.py): the known 80% (vec_id % 5 != 0) is banded once
    into a hash-partitioned parquet index; the new 20% probes it reading
    only its own partitions (bucket membership pushed into the fragment
    scan).  The relation must equal the sidecar-replay mirror: exact
    cosine ≥ 0.35 over CROSS-side co-bucketed candidates."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa

    from deduplicator_ray import io as dio
    from deduplicator_ray.state import srpstore

    ds = _nonnull_vec(dio.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]))

    def side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 5 == 0) if new_side else (ids % 5 != 0)
            return t.filter(pa.array(mask))

        return ds.map_batches(f, batch_format="pyarrow")

    idx = tempfile.mkdtemp(prefix="srpidx_", dir="/tmp")
    try:
        srpstore.build_srp_index(side(False), idx)
        out = srpstore.probe_srp_index(side(True), idx).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    from deduplicator_ray.pipelines.queries import _typed

    out = _typed(out, srpstore.PAIR_SCHEMA)
    return out.sort_values(["va", "vb"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from deduplicator_ray.pipelines import queries as q

    return {
        # SQL-mirrored relational / analytics operators
        "pricing_summary": q.pricing_summary,
        "top_customers": q.top_customers,
        "events_window": q.events_window,
        "exact_dedup_lineitem": q.exact_dedup_lineitem,
        "docs_dedup_bucket": q.docs_dedup_bucket,
        "docs_text_stats": q.docs_text_stats,
        "docs_lang_id": q.docs_lang_id,
        "ann_cosine_topk": q.ann_cosine_topk,
        "part_brand_revenue": q.part_brand_revenue,
        "supplier_balance": q.supplier_balance,
        "nation_revenue": q.nation_revenue,
        "orders_topk_per_group": q.orders_topk_per_group,
        "events_sessionize": q.events_sessionize,
        "lineitem_shipdate_head": q.lineitem_shipdate_head,
        "emb_near_dup": q.emb_near_dup,
        "emb_srp_pairs": q.emb_srp_pairs,
        "emb_pq_topk": q.emb_pq_topk,
        "emb_pq_rerank": q.emb_pq_rerank,
        "ann_ivfpq_topk": q.ann_ivfpq_topk,
        "emb_prototypicality": q.emb_prototypicality,
        "emb_bucket_outliers": q.emb_bucket_outliers,
        "emb_cluster_update": q.emb_cluster_update,
        "emb_leakage_split": q.emb_leakage_split,
        "emb_sample_weights": q.emb_sample_weights,
        "emb_dedup_tiers": q.emb_dedup_tiers,
        "emb_dedup_tiers_report": q.emb_dedup_tiers_report,
        "emb_cluster_remove": q.emb_cluster_remove,
        "emb_semdedup": q.emb_semdedup,
        "docs_jaccard_pairs": q.docs_jaccard_pairs,
        "docs_containment_pairs": q.docs_containment_pairs,
        "docs_containment_pairs_prefix": q.docs_containment_pairs_prefix,
        "docs_contained_drop": q.docs_contained_drop,
        "orders_without_lineitems": q.orders_without_lineitems,
        "docs_purge_semijoin": q.docs_purge_semijoin,
        "docs_substring_dup": q.docs_substring_dup,
        "docs_substring_dup_shuffle": q.docs_substring_dup_shuffle,
        "docs_substring_trim": q.docs_substring_trim,
        "docs_curation": q.docs_curation,
        "docs_curation_report": q.docs_curation_report,
        "docs_incremental_dedup": q.docs_incremental_dedup,
        "docs_cluster_update": q.docs_cluster_update,
        "docs_cluster_remove": q.docs_cluster_remove,
        "docs_sample_stratified": q.docs_sample_stratified,
        "docs_repetition_stats": q.docs_repetition_stats,
        "docs_pii_stats": q.docs_pii_stats,
        "docs_pii_redact": q.docs_pii_redact,
        "docs_line_dedup": q.docs_line_dedup,
        "docs_boilerplate_lines": q.docs_boilerplate_lines,
        "docs_cdc_chunks": q.docs_cdc_chunks,
        "docs_cdc_containment": q.docs_cdc_containment,
        "docs_chunking": q.docs_chunking,
        "docs_pack_layout": q.docs_pack_layout,
        "docs_token_budget": q.docs_token_budget,
        "docs_decontaminate": q.docs_decontaminate,
        "docs_gopher_repetition": q.docs_gopher_repetition,
        "docs_gopher_gate": q.docs_gopher_gate,
        "events_asof_orders": q.events_asof_orders,
        "events_range_join": q.events_range_join,
        "events_hopping_window": q.events_hopping_window,
        "events_distinct_users": q.events_distinct_users,
        "events_mode_type": q.events_mode_type,
        "docs_bow_dedup": q.docs_bow_dedup,
        "docs_dedup_tiers": q.docs_dedup_tiers,
        "docs_dedup_tiers_report": q.docs_dedup_tiers_report,
        "orders_price_quantiles": q.orders_price_quantiles,
        "docs_top_tokens": q.docs_top_tokens,
        "docs_rarity_score": q.docs_rarity_score,
        "docs_source_cap": q.docs_source_cap,
        "docs_lang_length_gate": q.docs_lang_length_gate,
        "events_funnel": q.events_funnel,
        "events_props_stats": q.events_props_stats,
        "events_moving_sum": q.events_moving_sum,
        "orders_median_by_priority": q.orders_median_by_priority,
        "integrity_audit": q.integrity_audit,
        "events_pivot_dow": q.events_pivot_dow,
        "orders_rollup": q.orders_rollup,
        "docs_snapshot_diff": q.docs_snapshot_diff,
        "orders_price_ntile": q.orders_price_ntile,
        "docs_cross_dedup": q.docs_cross_dedup,
        "events_user_paths": q.events_user_paths,
        "emb_lang_centroids": q.emb_lang_centroids,
        "events_debounce": q.events_debounce,
        "orders_price_minmax": q.orders_price_minmax,
        "events_retention": q.events_retention,
        "events_cooccurrence": q.events_cooccurrence,
        "docs_tfidf_top_terms": q.docs_tfidf_top_terms,
        "docs_inverted_index": q.docs_inverted_index,
        "emb_knn_join": q.emb_knn_join,
        "orders_monthly_growth": q.orders_monthly_growth,
        "events_value_outliers": q.events_value_outliers,
        "events_kmv_distinct": q.events_kmv_distinct,
        # image dedup pipelines (engine corpus; golden-tested vs oracle)
        "img_incremental_dedup": _img_incremental_dedup,
        "img_cross_dedup": _img_cross_dedup,
        "img_cross_dedup_indexed": _img_cross_dedup_indexed,
        "img_reference_clusters": _img_reference_clusters,
        "img_reference_clusters_h12": _img_reference_clusters_h12,
        "img_reference_clusters_nonstrict": _img_reference_clusters_nonstrict,
        "img_png_variant_clusters": _img_png_variant_clusters,
        "img_progressive_jpeg_clusters": _img_progressive_jpeg_clusters,
        "img_mp4_container_meta": _img_mp4_container_meta,
        "img_webm_container_meta": _img_webm_container_meta,
        "img_nonstrict_decisions": _img_nonstrict_decisions,
        "img_strict_mode_diff": _img_strict_mode_diff,
        "img_phash_clusters": _img_phash_clusters,
        "img_caption_conflicts": _img_caption_conflicts,
        "img_stock_captions": _img_stock_captions,
        "img_pair_distance_hist": _img_pair_distance_hist,
        "img_hamming_knn": _img_hamming_knn,
        "img_bit_stats": _img_bit_stats,
        "img_cluster_size_hist": _img_cluster_size_hist,
        "img_dedup_tiers": _img_dedup_tiers,
        "img_kernel_agreement": _img_kernel_agreement,
        "img_dedup_tiers_report": _img_dedup_tiers_report,
        "img_sample_weights": _img_sample_weights,
        "img_leakage_split": _img_leakage_split,
        "img_curation": _img_curation,
        "img_curation_report": _img_curation_report,
        "img_aspect_buckets": _img_aspect_buckets,
        "img_cluster_update": _img_cluster_update,
        "img_cluster_remove": _img_cluster_remove,
        "img_dedup_scorecard": _img_dedup_scorecard,
        "img_caption_langid": _img_caption_langid,
        "img_reference_decisions": _img_reference_decisions,
        "img_clusters_hidealts": _img_clusters_hidealts,
        "img_decisions_explain": _img_decisions_explain,
        "img_dup_pairs": _img_dup_pairs,
        "img_dup_pairs_exact": _img_dup_pairs_exact,
        "img_pagerank": _img_pagerank,
        "img_series_alt_pairs": _img_series_alt_pairs,
        "img_alt_paths": _img_alt_paths,
        "img_review_queue": _img_review_queue,
        "img_extended_clusters": _img_extended_clusters,
        "img_extended_clusters_h12": _img_extended_clusters_h12,
        "img_phash_extended": _img_phash_extended,
        "img_dead_letter": _img_dead_letter,
        "img_validate_phash": _img_validate_phash,
        "img_dedup_report": _img_dedup_report,
        # multimodal plumbing stages (actor pools; decode stubs documented)
        "mm_resize": _mm_resize,
        "mm_features": _mm_features,
        "mm_frame_sample": _mm_frame_sample,
        "mm_audio_features": _mm_audio_features,
        # video frame-level near-dup (vcon container → dHash per frame)
        "vid_signatures": _vid_signatures,
        "vid_dup_pairs": _vid_dup_pairs,
        "vid_clusters": _vid_clusters,
        "vid_dedup_tiers": _vid_dedup_tiers,
        "vid_dedup_tiers_report": _vid_dedup_tiers_report,
        "aud_dedup_tiers": _aud_dedup_tiers,
        "aud_dedup_tiers_report": _aud_dedup_tiers_report,
        "mm_dedup_tier_matrix": _mm_dedup_tier_matrix,
        "aud_signatures": _aud_signatures,
        "aud_dup_pairs": _aud_dup_pairs,
        "aud_clusters": _aud_clusters,
        "vid_sample_weights": _vid_sample_weights,
        "vid_leakage_split": _vid_leakage_split,
        "aud_sample_weights": _aud_sample_weights,
        "aud_leakage_split": _aud_leakage_split,
        "mm_montage": _mm_montage,
        # text near-dup + fingerprints
        "docs_dup_pairs": _docs_dup_pairs,
        "docs_clusters": _docs_clusters,
        "docs_keep_best": _docs_keep_best,
        "docs_sample_weights": _docs_sample_weights,
        "docs_cross_containment_indexed": _docs_cross_containment_indexed,
        "docs_source_priority": _docs_source_priority,
        "docs_leakage_split": _docs_leakage_split,
        "docs_pagerank": _docs_pagerank,
        "docs_triangles": _docs_triangles,
        "docs_simhash_pairs": _docs_simhash_pairs,
        "docs_fingerprints": _docs_fingerprints,
        # approximate vector search
        "ann_ivf_topk": _ann_ivf_topk,
        "ann_ivf_append": _ann_ivf_append,
        "emb_cross_srp_indexed": _emb_cross_srp_indexed,
        "docs_cross_dedup_indexed": _docs_cross_dedup_indexed,
    }


def _fp_cc_ctes(src: str, idc: str, fpc: str, cap: int, tau: int) -> str:
    """Shared CTE chain for the fp-set modality mirrors: distinct fps →
    stop-fp cap → exact-Jaccard pairs → min-label CC → ``lab``
    ({idc}, cluster_id)."""
    return f"""
        WITH RECURSIVE fps AS (
          SELECT DISTINCT {idc}, {fpc} FROM '{src}'),
        dfq AS (SELECT {fpc} FROM fps GROUP BY {fpc}
                HAVING count(*) <= {cap}),
        live AS (SELECT f.{idc}, f.{fpc}
                 FROM fps f JOIN dfq USING ({fpc})),
        sizes AS (SELECT {idc}, count(*) AS n FROM live GROUP BY {idc}),
        inter AS (SELECT a.{idc} AS va, b.{idc} AS vb, count(*) AS ns
                  FROM live a JOIN live b USING ({fpc})
                  WHERE a.{idc} < b.{idc} GROUP BY 1, 2),
        pairs AS MATERIALIZED (
          SELECT va, vb FROM inter
          JOIN sizes sa ON sa.{idc} = va
          JOIN sizes sb ON sb.{idc} = vb
          WHERE ns * 1000000 >= {tau} * (sa.n + sb.n - ns)),
        e AS MATERIALIZED (
          SELECT va AS u, vb AS v FROM pairs
          UNION SELECT vb, va FROM pairs),
        r(node, lbl) AS (
          SELECT u, u FROM e
          UNION
          SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
          WHERE r.lbl < e.u),
        lab AS (SELECT node AS {idc}, min(lbl) AS cluster_id
                FROM r GROUP BY node)
    """


def _fp_tier_sql(src: str, idc: str, fpc: str, cap: int, tau: int,
                 report_alias: str | None = None) -> str:
    """Mirror SQL for the fp-set tier cascade (vid/aud): near-dup CC over
    the capped Jaccard relation (same CTEs as the *_clusters mirrors) +
    byte/fpset identity minima + cheapest-tier-wins classification."""
    ctes = _fp_cc_ctes(src, idc, fpc, cap, tau) + f"""
        , ident AS (
          SELECT {idc}, min(md5) AS byte_key,
                 string_agg(CAST({fpc} AS VARCHAR), ',' ORDER BY {fpc})
                     AS fpset_key
          FROM (SELECT DISTINCT {idc}, {fpc}, md5 FROM '{src}')
          GROUP BY {idc}),
        mins AS (
          SELECT {idc},
                 min({idc}) OVER (PARTITION BY byte_key) AS byte_min,
                 min({idc}) OVER (PARTITION BY fpset_key) AS fpset_min
          FROM ident),
        cls AS (
          SELECT m.{idc},
                 CASE WHEN m.byte_min < m.{idc} THEN 'byte'
                      WHEN m.fpset_min < m.{idc} THEN 'fpset'
                      WHEN l.cluster_id IS NOT NULL
                           AND l.cluster_id < m.{idc} THEN 'near'
                      ELSE 'unique' END AS tier,
                 CASE WHEN m.byte_min < m.{idc} THEN m.byte_min
                      WHEN m.fpset_min < m.{idc} THEN m.fpset_min
                      WHEN l.cluster_id IS NOT NULL
                           AND l.cluster_id < m.{idc} THEN l.cluster_id
                      ELSE m.{idc} END AS dup_of
          FROM mins m LEFT JOIN lab l USING ({idc}))
    """
    if report_alias:
        return ctes + (f"SELECT tier, CAST(count(*) AS BIGINT) AS "
                       f"{report_alias} FROM cls GROUP BY tier ORDER BY tier")
    return ctes + f"SELECT {idc}, tier, dup_of FROM cls ORDER BY {idc}"


def _fp_weights_sql(src: str, idc: str, fpc: str, cap: int, tau: int) -> str:
    """Mirror SQL for fp-set dedup-aware sampling weights: near-dup CC
    (shared CTEs) → family key = cluster label else own id → weight =
    1e6 // family size (the vid/aud twin of DOCS_SAMPLE_WEIGHTS_SQL)."""
    return _fp_cc_ctes(src, idc, fpc, cap, tau) + f"""
        , base AS (SELECT DISTINCT {idc} FROM '{src}'),
        asg AS (
          SELECT b.{idc}, coalesce(l.cluster_id, b.{idc}) AS weight_key
          FROM base b LEFT JOIN lab l USING ({idc})),
        sz AS (SELECT weight_key, count(*) AS n FROM asg GROUP BY weight_key)
        SELECT {idc}, weight_key,
               CAST(n AS BIGINT) AS family_size,
               CAST(1000000 // n AS BIGINT) AS weight_e6
        FROM asg JOIN sz USING (weight_key)
        ORDER BY {idc}
    """


def _fp_split_sql(src: str, idc: str, fpc: str, cap: int, tau: int,
                  train_pct: int = 90) -> str:
    """Mirror SQL for fp-set leakage-safe splits: near-dup CC (shared
    CTEs) → split key = cluster label else own id → engine-portable
    md5-prefix bucket (the vid/aud twin of DOCS_LEAKAGE_SPLIT_SQL)."""
    return _fp_cc_ctes(src, idc, fpc, cap, tau) + f"""
        , base AS (SELECT DISTINCT {idc} FROM '{src}'),
        asg AS (
          SELECT b.{idc}, coalesce(l.cluster_id, b.{idc}) AS split_key
          FROM base b LEFT JOIN lab l USING ({idc}))
        SELECT {idc}, split_key,
               CAST(('0x' || substr(md5(split_key), 1, 8)) AS BIGINT)
                   % 100 AS bucket,
               CASE WHEN CAST(('0x' || substr(md5(split_key), 1, 8))
                             AS BIGINT) % 100 < {train_pct}
                    THEN 'train' ELSE 'val' END AS split
        FROM asg
        ORDER BY {idc}
    """


def _fixture_mirrors() -> dict[str, str]:
    """DuckDB mirrors for image-corpus queries, over the engine-generated
    fixture parquet (the driver compares at sf=0.01; the paths resolve —
    and the fixtures build if absent — at composition time).

    Two fixture families back these:

    * ``truth`` — the generator's ground truth (dead letters == corrupt
      rows, phash drift == stale-phash rows, resize ok/error ==
      decodable-format × non-corrupt).
    * ``hashes`` — a single-process Ray-free ORACLE recomputation of each
      image's fingerprint + LSH band keys (fixtures.hashes_path).  The
      clustering / decision / extended-CC mirrors re-derive the engine's
      grouping, thresholding, keeper election, rename plan and near-dup
      connected components in pure DuckDB SQL over that table — the decode
      KERNEL is the one thing SQL cannot express, so it ships as data
      (see deduplicator_ray/mirrors.py)."""
    from deduplicator_ray import fixtures, mirrors
    from deduplicator_ray.pipelines import image_dedup as ip_mod
    from deduplicator_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.01"
    images = fixtures.images_path(sf) + "/*.parquet"
    truth = fixtures.truth_path(sf) + "/*.parquet"
    hashes = fixtures.hashes_path(sf) + "/*.parquet"
    hashes12 = fixtures.hashes_path(sf, 12) + "/*.parquet"
    images12 = fixtures.images_path(sf, 12) + "/*.parquet"
    docfeat = fixtures.doc_features_path(sf) + "/*.parquet"
    altns = fixtures.alt_namespace_path(sf) + "/*.parquet"
    ivf = fixtures.ivf_sidecar_path(sf)
    proto = fixtures.proto_sidecar_path(sf)
    srp = fixtures.srp_sidecar_path(sf) + "/*.parquet"
    cdc = fixtures.cdc_sidecar_path(sf) + "/*.parquet"
    vframes = fixtures.video_frames_path(sf) + "/*.parquet"
    from deduplicator_ray.pipelines import video_dedup as _vd_mod
    _VID_TAU = _vd_mod.TAU_E6_DEFAULT
    _VID_CAP = _vd_mod.MAX_FP_DF_DEFAULT
    afps = fixtures.audio_fps_path(sf) + "/*.parquet"
    pii = fixtures.docs_pii_path(sf) + "/*.parquet"
    dlines = fixtures.docs_lines_path(sf) + "/*.parquet"
    pqsc = fixtures.pq_sidecar_path(sf)
    from deduplicator_ray.pipelines import audio_dedup as _ad_mod
    _AUD_TAU = _ad_mod.TAU_E6_DEFAULT
    _AUD_CAP = _ad_mod.MAX_FP_DF_DEFAULT
    cfg = _cfg()
    kw = dict(images=images, shingle_k=cfg.shingle_k,
              jaccard_min=cfg.jaccard_min, hamming_max=cfg.hamming_max)
    return {
        "img_incremental_dedup": mirrors.compose(
            mirrors.INCREMENTAL_DEDUP_SQL, hashes=hashes, **kw),
        "img_cross_dedup": mirrors.compose(
            mirrors.CROSS_DEDUP_SQL, hashes=hashes, **kw),
        # the persisted-index probe is the SAME relation: shared mirror
        "img_cross_dedup_indexed": mirrors.compose(
            mirrors.CROSS_DEDUP_SQL, hashes=hashes, **kw),
        "img_reference_clusters": mirrors.compose(
            mirrors.REFERENCE_CLUSTERS_SQL, hashes=hashes, **kw),
        "img_reference_clusters_h12": mirrors.compose(
            mirrors.REFERENCE_CLUSTERS_SQL, hashes=hashes12, **kw),
        # non-strict mode: the vcon extension corpus's NON-strict oracle
        # sidecar unions with the main (strict ≡ non-strict for stills
        # and stub media) sidecar — one keyspace, frame-0 dHash for
        # containers (/root/reference/dupedb.py:82-98)
        "img_reference_clusters_nonstrict": mirrors.compose(
            mirrors.REFERENCE_CLUSTERS_SQL, hashes=hashes,
            ns_hashes=fixtures.nonstrict_hashes_path(sf) + "/*.parquet",
            **kw),
        "img_png_variant_clusters": mirrors.compose(
            mirrors.REFERENCE_CLUSTERS_SQL,
            hashes=fixtures.pngx_hashes_path(sf) + "/*.parquet", **kw),
        "img_progressive_jpeg_clusters": mirrors.compose(
            mirrors.REFERENCE_CLUSTERS_SQL,
            hashes=fixtures.projpg_hashes_path(sf) + "/*.parquet", **kw),
        "img_mp4_container_meta": f"""
            SELECT image_id, status, CAST(frames AS BIGINT) AS frames
            FROM '{fixtures.mp4x_hashes_path(sf)}/*.parquet'
            ORDER BY image_id
        """,
        "img_webm_container_meta": f"""
            SELECT image_id, status, CAST(frames AS BIGINT) AS frames
            FROM '{fixtures.webmx_hashes_path(sf)}/*.parquet'
            ORDER BY image_id
        """,
        "img_nonstrict_decisions": mirrors.compose(
            mirrors.REFERENCE_DECISIONS_SQL, hashes=hashes,
            ns_hashes=fixtures.nonstrict_hashes_path(sf) + "/*.parquet",
            ns_images=fixtures.nonstrict_images_path(sf) + "/*.parquet",
            **kw),
        # the mode-migration report mirrors as a plain join of the
        # extension corpus's STRICT and NON-STRICT oracle sidecars —
        # one decode pass engine-side, two independent Ray-free
        # recomputations mirror-side
        "img_strict_mode_diff": f"""
            SELECT s.image_id, s.proc_hash AS strict_hash,
                   n.proc_hash AS nonstrict_hash,
                   CAST(n.frames AS BIGINT) AS frames,
                   CAST(s.proc_hash != n.proc_hash AS BIGINT) AS differs
            FROM '{fixtures.nonstrict_hashes_path(sf, strict=True)
                   + "/*.parquet"}' s
            JOIN '{fixtures.nonstrict_hashes_path(sf) + "/*.parquet"}' n
              USING (image_id)
            JOIN '{fixtures.nonstrict_images_path(sf) + "/*.parquet"}' i
              USING (image_id)
            WHERE i.fmt IN ('vcon', 'gif')
              AND s.status IN ('ok', 'md5_only') AND n.status = 'ok'
            ORDER BY image_id
        """,
        # pluggable perceptual-hash kernel: same relation over the pHash
        # oracle sidecar (fixtures.hashes_path(sf, 8, "phash"))
        "img_phash_extended": mirrors.compose(
            mirrors.EXTENDED_CLUSTERS_SQL,
            hashes=fixtures.hashes_path(sf, 8, "phash") + "/*.parquet", **kw),
        "img_phash_clusters": mirrors.compose(
            mirrors.REFERENCE_CLUSTERS_SQL,
            hashes=fixtures.hashes_path(sf, 8, "phash") + "/*.parquet", **kw),
        "img_caption_conflicts": mirrors.compose(
            mirrors.CAPTION_CONFLICTS_SQL, hashes=hashes, **kw),
        "img_stock_captions": mirrors.compose(
            mirrors.STOCK_CAPTIONS_SQL, hashes=hashes, **kw),
        "img_pair_distance_hist": mirrors.compose(
            mirrors.PAIR_DIST_HIST_SQL, hashes=hashes, **kw),
        "img_hamming_knn": mirrors.compose(
            mirrors.HAMMING_KNN_SQL, hashes=hashes, **kw),
        "img_bit_stats": mirrors.compose(
            mirrors.BIT_STATS_SQL, hashes=hashes, **kw),
        "img_cluster_size_hist": mirrors.compose(
            mirrors.CLUSTER_SIZE_HIST_SQL, hashes=hashes, **kw),
        "img_dedup_tiers": mirrors.compose(
            mirrors.DEDUP_TIERS_SQL, hashes=hashes, **kw),
        "img_kernel_agreement": mirrors.compose(
            mirrors.KERNEL_AGREEMENT_SQL, hashes=hashes,
            phashes=fixtures.hashes_path(sf, 8, "phash") + "/*.parquet",
            **kw),
        "img_dedup_tiers_report": mirrors.compose(
            mirrors.DEDUP_TIERS_REPORT_SQL, hashes=hashes, **kw),
        "img_sample_weights": mirrors.compose(
            mirrors.SAMPLE_WEIGHTS_SQL, hashes=hashes, **kw),
        # split assignment must re-derive identically in SQL: shared
        # extended CTE + the portable md5 bucket expression
        "img_leakage_split": mirrors.compose(
            mirrors.LEAKAGE_SPLIT_SQL, hashes=hashes, **kw),
        "img_curation": mirrors.compose(
            mirrors.IMG_CURATION_SQL, hashes=hashes, **kw),
        "img_curation_report": mirrors.compose(
            mirrors.IMG_CURATION_REPORT_SQL, hashes=hashes, **kw),
        "img_aspect_buckets": mirrors.compose(
            mirrors.ASPECT_BUCKETS_SQL, hashes=hashes, **kw),
        # incremental maintenance must equal the full recompute — the
        # extended-clusters mirror IS its oracle
        "img_cluster_update": mirrors.compose(
            mirrors.EXTENDED_CLUSTERS_SQL, hashes=hashes, **kw),
        # the prune relation: the same full recompute over the SURVIVOR set
        "img_cluster_remove": mirrors.with_survivors(
            mirrors.compose(mirrors.EXTENDED_CLUSTERS_SQL,
                            hashes=hashes, **kw),
            ip_mod.IMG_REMOVE_BUCKET_THRESHOLD),
        "img_dedup_scorecard": mirrors.compose(
            mirrors.IMG_SCORECARD_SQL, hashes=hashes, truth=truth, **kw),
        # the documents lang-ID relation applied to the caption column
        "img_caption_langid": q.lang_id_sql(f"'{images}'", "image_id",
                                            "caption"),
        "img_reference_decisions": mirrors.compose(
            mirrors.REFERENCE_DECISIONS_SQL, hashes=hashes, **kw),
        # per-action rollup over the same decision relation
        "img_dedup_report": mirrors.compose(
            mirrors.DEDUP_REPORT_SQL, hashes=hashes, **kw),
        "img_extended_clusters": mirrors.compose(
            mirrors.EXTENDED_CLUSTERS_SQL, hashes=hashes, **kw),
        # img_dup_pairs has NO sf0.01 mirror by design: this corpus holds a
        # 233-member identical-hash clique whose slice bucket tops
        # band_group_cap, so the engine switches to spanning-forest emission
        # (cluster-exact, pair-sampled) while SQL would enumerate all
        # C(233,2) pairs.  img_dup_pairs_exact lifts the cap so the pair
        # set IS relation-defined and value-checks the verify math through
        # that clique; the recall/precision gate + the extended-clusters
        # mirror cover the capped production behavior.
        "img_dup_pairs_exact": mirrors.compose(
            mirrors.DUP_PAIRS_SQL, hashes=hashes, **kw),
        "img_pagerank": mirrors.compose(
            mirrors.IMG_PAGERANK_SQL, hashes=hashes, **kw),
        # hide-alts: the sequential suppression decisions ship as a sidecar
        # (fixtures.alt_suppressed_path); SQL re-derives bucket + threshold
        "img_clusters_hidealts": mirrors.compose(
            mirrors.CLUSTERS_HIDEALTS_SQL, hashes=hashes,
            supp=fixtures.alt_suppressed_path(sf), **kw),
        # 144-bit fingerprint: Hamming as 3×48-bit chunked xor+bit_count
        "img_extended_clusters_h12": mirrors.compose(
            mirrors.EXTENDED_CLUSTERS_SQL, hashes=hashes12,
            img_ham_expr=mirrors.wide_ham_expr(36),
            **{**kw, "images": images12}),
        "img_decisions_explain": mirrors.compose(
            mirrors.DECISIONS_EXPLAIN_SQL, hashes=hashes, **kw),
        "mm_montage": mirrors.compose(mirrors.MONTAGE_SQL, hashes=hashes, **kw),
        "img_series_alt_pairs": mirrors.compose(
            mirrors.SERIES_ALT_SQL, hashes=hashes, altns=altns, **kw),
        "img_alt_paths": mirrors.compose(
            mirrors.ALT_PATHS_SQL, hashes=hashes, altns=altns, **kw),
        "img_review_queue": mirrors.compose(
            mirrors.REVIEW_QUEUE_SQL, hashes=hashes, **kw),
        # visual features: the kernel output ships in the hashes sidecar
        # (same Ray-free recomputation pattern); the mirror is a projection
        "mm_features": f"""
            SELECT image_id, edge_e3, feat_status FROM '{hashes}'
            ORDER BY image_id
        """,
        # fake-decoder frame fan-out: n_frames rows per sampled video id,
        # fixed 16×16 png frames — the mirror pins the fan-out shape
        "mm_frame_sample": f"""
            SELECT image_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
                   CAST(16 AS INTEGER) AS w, CAST(16 AS INTEGER) AS h,
                   'png' AS fmt, 'ok_fake' AS status
            FROM (SELECT image_id FROM '{images}' ORDER BY image_id LIMIT 64)
            CROSS JOIN (VALUES (0), (1)) f(frame_idx)
            ORDER BY image_id, frame_idx
        """,
        # fake audio decoder: duration = payload length at 16kHz 16-bit
        # mono PCM (the payload is SIZED by the md5 expression below, so
        # the mirror re-derives it without the bytes); loudness = the
        # id-seeded hash.  Pins the audio actor-pool plumbing end to end.
        "mm_audio_features": f"""
            SELECT image_id,
                   CAST((1000 + CAST(('0x' || substr(md5(image_id), 1, 8))
                                     AS BIGINT) % 5000) * 1000 // 32000
                        AS BIGINT) AS duration_ms,
                   CAST(16000 AS INTEGER) AS sample_rate,
                   CAST(CAST(('0x' || substr(md5(image_id), 1, 8)) AS BIGINT)
                        % 1000000 AS BIGINT) AS rms_e6,
                   'mp3' AS fmt, 'ok_fake' AS status
            FROM (SELECT image_id FROM '{images}' ORDER BY image_id LIMIT 64)
            ORDER BY image_id
        """,
        # video frame-fp kernel: the parse→decode→dHash sidecar is the
        # Ray-free recompute (hashes-sidecar policy); the pairs/clusters
        # mirrors re-derive stop-frame cap, intersection join, Jaccard
        # threshold and min-label CC relationally over it.
        "vid_signatures": f"""
            SELECT video_id, frame_idx, frame_fp FROM '{vframes}'
            ORDER BY video_id, frame_idx
        """,
        "vid_dup_pairs": f"""
            WITH fps AS (SELECT DISTINCT video_id, frame_fp FROM '{vframes}'),
            df AS (SELECT frame_fp FROM fps GROUP BY frame_fp
                   HAVING count(*) <= {_VID_CAP}),
            live AS (SELECT f.video_id, f.frame_fp
                     FROM fps f JOIN df USING (frame_fp)),
            sizes AS (SELECT video_id, count(*) AS n FROM live
                      GROUP BY video_id),
            inter AS (SELECT a.video_id AS va, b.video_id AS vb,
                             count(*) AS ns
                      FROM live a JOIN live b USING (frame_fp)
                      WHERE a.video_id < b.video_id GROUP BY 1, 2)
            SELECT va AS video_id_a, vb AS video_id_b,
                   CAST(ns AS BIGINT) AS n_shared,
                   CAST(sa.n AS BIGINT) AS size_a,
                   CAST(sb.n AS BIGINT) AS size_b,
                   CAST(ns * 1000000 // (sa.n + sb.n - ns) AS BIGINT)
                       AS jaccard_e6
            FROM inter JOIN sizes sa ON sa.video_id = va
                       JOIN sizes sb ON sb.video_id = vb
            WHERE ns * 1000000 >= {_VID_TAU} * (sa.n + sb.n - ns)
            ORDER BY video_id_a, video_id_b
        """,
        "vid_clusters": f"""
            WITH RECURSIVE fps AS (
              SELECT DISTINCT video_id, frame_fp FROM '{vframes}'),
            df AS (SELECT frame_fp FROM fps GROUP BY frame_fp
                   HAVING count(*) <= {_VID_CAP}),
            live AS (SELECT f.video_id, f.frame_fp
                     FROM fps f JOIN df USING (frame_fp)),
            sizes AS (SELECT video_id, count(*) AS n FROM live
                      GROUP BY video_id),
            inter AS (SELECT a.video_id AS va, b.video_id AS vb,
                             count(*) AS ns
                      FROM live a JOIN live b USING (frame_fp)
                      WHERE a.video_id < b.video_id GROUP BY 1, 2),
            pairs AS MATERIALIZED (
              SELECT va, vb FROM inter
              JOIN sizes sa ON sa.video_id = va
              JOIN sizes sb ON sb.video_id = vb
              WHERE ns * 1000000 >= {_VID_TAU} * (sa.n + sb.n - ns)),
            e AS MATERIALIZED (
              SELECT va AS u, vb AS v FROM pairs
              UNION SELECT vb, va FROM pairs),
            r(node, lbl) AS (
              SELECT u, u FROM e
              UNION
              SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
              WHERE r.lbl < e.u)
            SELECT node AS video_id, min(lbl) AS cluster_id
            FROM r GROUP BY node ORDER BY video_id
        """,
        # audio window-fp kernel: the parse→PCM→band-energy-sign sidecar is
        # the Ray-free recompute (hashes-sidecar policy); the pairs/clusters
        # mirrors re-derive stop-fp cap, intersection join, Jaccard
        # threshold and min-label CC relationally over it — the same
        # relational shape as the vid_* family, over the audio sidecar.
        "aud_signatures": f"""
            SELECT audio_id, win_idx, win_fp FROM '{afps}'
            ORDER BY audio_id, win_idx
        """,
        "aud_dup_pairs": f"""
            WITH fps AS (SELECT DISTINCT audio_id, win_fp FROM '{afps}'),
            df AS (SELECT win_fp FROM fps GROUP BY win_fp
                   HAVING count(*) <= {_AUD_CAP}),
            live AS (SELECT f.audio_id, f.win_fp
                     FROM fps f JOIN df USING (win_fp)),
            sizes AS (SELECT audio_id, count(*) AS n FROM live
                      GROUP BY audio_id),
            inter AS (SELECT a.audio_id AS va, b.audio_id AS vb,
                             count(*) AS ns
                      FROM live a JOIN live b USING (win_fp)
                      WHERE a.audio_id < b.audio_id GROUP BY 1, 2)
            SELECT va AS audio_id_a, vb AS audio_id_b,
                   CAST(ns AS BIGINT) AS n_shared,
                   CAST(sa.n AS BIGINT) AS size_a,
                   CAST(sb.n AS BIGINT) AS size_b,
                   CAST(ns * 1000000 // (sa.n + sb.n - ns) AS BIGINT)
                       AS jaccard_e6
            FROM inter JOIN sizes sa ON sa.audio_id = va
                       JOIN sizes sb ON sb.audio_id = vb
            WHERE ns * 1000000 >= {_AUD_TAU} * (sa.n + sb.n - ns)
            ORDER BY audio_id_a, audio_id_b
        """,
        "aud_clusters": f"""
            WITH RECURSIVE fps AS (
              SELECT DISTINCT audio_id, win_fp FROM '{afps}'),
            df AS (SELECT win_fp FROM fps GROUP BY win_fp
                   HAVING count(*) <= {_AUD_CAP}),
            live AS (SELECT f.audio_id, f.win_fp
                     FROM fps f JOIN df USING (win_fp)),
            sizes AS (SELECT audio_id, count(*) AS n FROM live
                      GROUP BY audio_id),
            inter AS (SELECT a.audio_id AS va, b.audio_id AS vb,
                             count(*) AS ns
                      FROM live a JOIN live b USING (win_fp)
                      WHERE a.audio_id < b.audio_id GROUP BY 1, 2),
            pairs AS MATERIALIZED (
              SELECT va, vb FROM inter
              JOIN sizes sa ON sa.audio_id = va
              JOIN sizes sb ON sb.audio_id = vb
              WHERE ns * 1000000 >= {_AUD_TAU} * (sa.n + sb.n - ns)),
            e AS MATERIALIZED (
              SELECT va AS u, vb AS v FROM pairs
              UNION SELECT vb, va FROM pairs),
            r(node, lbl) AS (
              SELECT u, u FROM e
              UNION
              SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
              WHERE r.lbl < e.u)
            SELECT node AS audio_id, min(lbl) AS cluster_id
            FROM r GROUP BY node ORDER BY audio_id
        """,
        # tier-dedup cascade for the fp-set modalities: the byte key
        # (payload md5 — DuckDB md5() is VARCHAR-only, so it rides the
        # kernel sidecar), the fp-SET key (ordered distinct fp list) and
        # the near-dup CC labels compose in SQL exactly as
        # stages/fpsets.identity_tiers composes them distributed
        "vid_dedup_tiers": _fp_tier_sql(
            vframes, "video_id", "frame_fp", _VID_CAP, _VID_TAU),
        "vid_dedup_tiers_report": _fp_tier_sql(
            vframes, "video_id", "frame_fp", _VID_CAP, _VID_TAU,
            report_alias="n_videos"),
        "aud_dedup_tiers": _fp_tier_sql(
            afps, "audio_id", "win_fp", _AUD_CAP, _AUD_TAU),
        "aud_dedup_tiers_report": _fp_tier_sql(
            afps, "audio_id", "win_fp", _AUD_CAP, _AUD_TAU,
            report_alias="n_audios"),
        # training-loader surfaces over the fp-set near-dup relation:
        # sampling weights + leakage-safe splits re-derived from the same
        # shared CC CTEs (family key = cluster label else own id)
        "vid_sample_weights": _fp_weights_sql(
            vframes, "video_id", "frame_fp", _VID_CAP, _VID_TAU),
        "vid_leakage_split": _fp_split_sql(
            vframes, "video_id", "frame_fp", _VID_CAP, _VID_TAU),
        "aud_sample_weights": _fp_weights_sql(
            afps, "audio_id", "win_fp", _AUD_CAP, _AUD_TAU),
        "aud_leakage_split": _fp_split_sql(
            afps, "audio_id", "win_fp", _AUD_CAP, _AUD_TAU),
        # per-doc text kernels (SimHash / winnowing / BPE-ish counts) ship
        # as a Ray-free sidecar recomputation; banding at 4×16 bits is
        # pigeonhole-LOSSLESS for Hamming ≤ 3, so the engine's banded pair
        # set equals this plain cross-join — no probabilistic caveat here
        "docs_simhash_pairs": f"""
            SELECT CAST(a.doc_id AS VARCHAR) AS src,
                   CAST(b.doc_id AS VARCHAR) AS dst
            FROM '{docfeat}' a JOIN '{docfeat}' b
              -- the engine orients pairs by STRING id order (ids pass
              -- through the generic string band/verify stage)
              ON CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR)
             AND bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY src, dst
        """,
        "docs_fingerprints": f"""
            SELECT doc_id, fingerprint, n_tokens_bpe FROM '{docfeat}'
            ORDER BY doc_id
        """,
        # SRP-LSH's discrete decisions (vec→(band, bkey) buckets) ship as a
        # sidecar replay of the same seeded hyperplanes; the mirror is then
        # exact cosine pairs restricted to co-bucketed candidates
        "emb_srp_pairs": q.EMB_SRP_PAIRS_SQL.replace("{srp}", srp),
        # the k-means model (seeded, capped-sample — an iterative algorithm
        # SQL cannot derive) ships as a sidecar replay; the mirror re-scores
        # every row's cosine-to-own-centroid relationally
        "emb_prototypicality": q.EMB_PROTOTYPICALITY_SQL.replace(
            "{proto}", proto),
        "emb_bucket_outliers": q.EMB_BUCKET_OUTLIERS_SQL.replace(
            "{proto}", proto),
        # the persisted cross-corpus probe: CROSS-side co-bucketed pairs,
        # same sidecar, portable vec_id % 5 side split
        "emb_cross_srp_indexed": q.EMB_CROSS_SRP_SQL.replace("{srp}", srp),
        "emb_pq_topk": q.EMB_PQ_TOPK_SQL.replace("{pq}", pqsc),
        "emb_pq_rerank": q.EMB_PQ_RERANK_SQL.replace("{pq}", pqsc),
        "ann_ivfpq_topk": q.ANN_IVFPQ_TOPK_SQL.replace("{pq}", pqsc)
                                              .replace("{ivf}", ivf),
        # CDC's cutpoint/content-hash kernel ships as a sidecar replay; the
        # mirror re-derives the shared-block count/election relationally
        "docs_cdc_chunks": q.DOCS_CDC_CHUNKS_SQL.replace("{cdc}", cdc),
        # the PII pass runs over the injected sidecar corpus in BOTH
        # engines (Python re vs DuckDB RE2 over the same table) — a
        # cross-engine regex-semantics check, not a sidecar replay
        "docs_pii_stats": q.DOCS_PII_STATS_SQL.replace("{pii}", pii),
        "docs_pii_redact": q.DOCS_PII_REDACT_SQL.replace("{pii}", pii),
        "docs_line_dedup": q.DOCS_LINE_DEDUP_SQL.replace("{lines}", dlines),
        "docs_boilerplate_lines": q.DOCS_BOILERPLATE_LINES_SQL.replace(
            "{lines}", dlines),
        "docs_cdc_containment": q.DOCS_CDC_CONTAINMENT_SQL.replace(
            "{cdc}", cdc),
        # IVF's discrete decisions (vec→bucket, query→probed buckets) ship
        # as a sidecar replay of the same seeded k-means; the mirror is then
        # exact cosine top-k restricted to each query's probed buckets
        "ann_ivf_topk": f"""
            SELECT query_id, rank, vec_id, cos_e6 FROM (
              SELECT p.query_id, e.vec_id,
                     CAST(floor(list_cosine_similarity(
                       q.embedding::DOUBLE[], e.embedding::DOUBLE[]) * 1e6 + 0.5)
                       AS BIGINT) AS cos_e6,
                     row_number() OVER (
                       PARTITION BY p.query_id
                       ORDER BY list_cosine_similarity(
                         q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                         e.vec_id
                     ) AS rank
              FROM '{ivf}/assign.parquet' a
              JOIN '{ivf}/probes.parquet' p USING (bucket)
              JOIN embeddings e ON e.vec_id = a.vec_id
              JOIN embeddings q ON q.vec_id = p.query_id
              WHERE e.vec_id != p.query_id
                AND e.embedding IS NOT NULL AND q.embedding IS NOT NULL)
            WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        # SemDeDup: bucket assignment replayed from the IVF sidecar; pairs
        # + components + keeper re-derived relationally (min-label CTE)
        "emb_semdedup": f"""
            WITH RECURSIVE a AS (
              SELECT s.vec_id, s.bucket, e.embedding::DOUBLE[] AS emb
              FROM '{ivf}/assign.parquet' s JOIN embeddings e USING (vec_id)
            ),
            edges AS MATERIALIZED (
              SELECT x.vec_id AS u, y.vec_id AS v
              FROM a x JOIN a y
                ON x.bucket = y.bucket AND x.vec_id < y.vec_id
              WHERE list_cosine_similarity(x.emb, y.emb) >= 0.35
            ),
            e AS MATERIALIZED (
              SELECT u, v FROM edges UNION SELECT v, u FROM edges
            ),
            r(node, lbl) AS (
              SELECT u, u FROM e
              UNION
              SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
              WHERE r.lbl < e.u
            ),
            lbl AS (
              SELECT node AS vec_id, min(lbl) AS cluster_id FROM r GROUP BY node
            )
            SELECT vec_id, cluster_id,
                   CASE WHEN vec_id = cluster_id THEN 'keep' ELSE 'drop' END AS action
            FROM lbl ORDER BY vec_id
        """,
        "img_dead_letter": f"""
            SELECT image_id, 'error' AS status
            FROM '{truth}' WHERE kind = 'corrupt'
            ORDER BY image_id
        """,
        "img_validate_phash": f"""
            SELECT i.image_id, i.phash
            FROM '{images}' i JOIN '{truth}' t USING (image_id)
            WHERE t.phash_stale AND t.kind != 'corrupt'
            ORDER BY i.image_id
        """,
        "mm_resize": f"""
            SELECT i.image_id,
                   CAST(32 AS INTEGER) AS w, CAST(32 AS INTEGER) AS h,
                   'png' AS fmt,
                   CASE WHEN t.kind = 'corrupt' OR i.fmt IN ('mp4', 'flac')
                        THEN 'error' ELSE 'ok' END AS status
            FROM '{images}' i JOIN '{truth}' t USING (image_id)
            ORDER BY i.image_id
        """,
    }


def oracle_sql() -> dict[str, str]:
    from deduplicator_ray.pipelines import queries as q

    out = _fixture_mirrors() | {
        "pricing_summary": q.PRICING_SUMMARY_SQL,
        "top_customers": q.TOP_CUSTOMERS_SQL,
        "events_window": q.EVENTS_WINDOW_SQL,
        "exact_dedup_lineitem": q.EXACT_DEDUP_LINEITEM_SQL,
        "docs_dedup_bucket": q.DOCS_DEDUP_BUCKET_SQL,
        "docs_text_stats": q.DOCS_TEXT_STATS_SQL,
        "docs_lang_id": q.DOCS_LANG_ID_SQL,
        "ann_cosine_topk": q.ANN_COSINE_TOPK_SQL,
        # append + FULL probe is exact over known ∪ new: the brute-force
        # top-k relation IS its oracle
        "ann_ivf_append": q.ANN_COSINE_TOPK_SQL,
        "part_brand_revenue": q.PART_BRAND_REVENUE_SQL,
        "supplier_balance": q.SUPPLIER_BALANCE_SQL,
        "nation_revenue": q.NATION_REVENUE_SQL,
        "orders_topk_per_group": q.ORDERS_TOPK_PER_GROUP_SQL,
        "events_sessionize": q.EVENTS_SESSIONIZE_SQL,
        "lineitem_shipdate_head": q.LINEITEM_SHIPDATE_HEAD_SQL,
        "emb_near_dup": q.EMB_NEAR_DUP_SQL,
        # incremental maintenance must equal the full recompute — the
        # clusters relation is its own oracle (docs/img pattern, third
        # modality)
        "emb_cluster_update": q.EMB_CLUSTER_UPDATE_SQL,
        "emb_leakage_split": q.EMB_LEAKAGE_SPLIT_SQL,
        "emb_sample_weights": q.EMB_SAMPLE_WEIGHTS_SQL,
        "emb_dedup_tiers": q.EMB_DEDUP_TIERS_SQL,
        "emb_dedup_tiers_report": q.EMB_DEDUP_TIERS_REPORT_SQL,
        "emb_cluster_remove": q.EMB_CLUSTER_REMOVE_SQL,
        "docs_jaccard_pairs": q.DOCS_JACCARD_PAIRS_SQL,
        "docs_containment_pairs": q.DOCS_CONTAINMENT_PAIRS_SQL,
        "docs_containment_pairs_prefix": q.DOCS_CONTAINMENT_PAIRS_SQL,
        "docs_contained_drop": q.DOCS_CONTAINED_DROP_SQL,
        "orders_without_lineitems": q.ORDERS_WITHOUT_LINEITEMS_SQL,
        "docs_purge_semijoin": q.DOCS_PURGE_SEMIJOIN_SQL,
        "docs_substring_dup": q.DOCS_SUBSTRING_DUP_SQL,
        "docs_substring_dup_shuffle": q.DOCS_SUBSTRING_DUP_SQL,
        "docs_substring_trim": q.DOCS_SUBSTRING_TRIM_SQL,
        "docs_curation": q.DOCS_CURATION_SQL,
        "docs_curation_report": q.DOCS_CURATION_REPORT_SQL,
        "docs_incremental_dedup": q.DOCS_INCREMENTAL_DEDUP_SQL,
        # incremental maintenance must equal the full recompute — the
        # clusters mirror IS its oracle (shared with docs_clusters)
        "docs_cluster_update": q.DOCS_CLUSTERS_SQL,
        # the prune relation: full recompute over the survivor set
        "docs_cluster_remove": q.DOCS_CLUSTER_REMOVE_SQL,
        "docs_sample_stratified": q.DOCS_SAMPLE_STRATIFIED_SQL,
        "docs_repetition_stats": q.DOCS_REPETITION_STATS_SQL,
        "docs_chunking": q.DOCS_CHUNKING_SQL,
        "docs_pack_layout": q.DOCS_PACK_LAYOUT_SQL,
        "docs_token_budget": q.DOCS_TOKEN_BUDGET_SQL,
        "docs_decontaminate": q.DOCS_DECONTAMINATE_SQL,
        "docs_gopher_repetition": q.DOCS_GOPHER_REPETITION_SQL,
        "docs_gopher_gate": q.DOCS_GOPHER_GATE_SQL,
        "events_asof_orders": q.EVENTS_ASOF_ORDERS_SQL,
        "events_range_join": q.EVENTS_RANGE_JOIN_SQL,
        "events_hopping_window": q.EVENTS_HOPPING_WINDOW_SQL,
        "events_distinct_users": q.EVENTS_DISTINCT_USERS_SQL,
        "events_mode_type": q.EVENTS_MODE_TYPE_SQL,
        "docs_bow_dedup": q.DOCS_BOW_DEDUP_SQL,
        "docs_dedup_tiers": q.DOCS_DEDUP_TIERS_SQL,
        "docs_dedup_tiers_report": q.DOCS_DEDUP_TIERS_REPORT_SQL,
        "orders_price_quantiles": q.ORDERS_PRICE_QUANTILES_SQL,
        "docs_top_tokens": q.DOCS_TOP_TOKENS_SQL,
        "docs_rarity_score": q.DOCS_RARITY_SCORE_SQL,
        "docs_source_cap": q.DOCS_SOURCE_CAP_SQL,
        "docs_lang_length_gate": q.DOCS_LANG_LENGTH_GATE_SQL,
        "events_funnel": q.EVENTS_FUNNEL_SQL,
        "events_props_stats": q.EVENTS_PROPS_STATS_SQL,
        "events_moving_sum": q.EVENTS_MOVING_SUM_SQL,
        "orders_median_by_priority": q.ORDERS_MEDIAN_BY_PRIORITY_SQL,
        "integrity_audit": q.INTEGRITY_AUDIT_SQL,
        "events_pivot_dow": q.EVENTS_PIVOT_DOW_SQL,
        "orders_rollup": q.ORDERS_ROLLUP_SQL,
        "docs_snapshot_diff": q.DOCS_SNAPSHOT_DIFF_SQL,
        "orders_price_ntile": q.ORDERS_PRICE_NTILE_SQL,
        "docs_cross_dedup": q.DOCS_CROSS_DEDUP_SQL,
        # the persisted-index probe is the SAME relation: shared mirror
        "docs_cross_dedup_indexed": q.DOCS_CROSS_DEDUP_SQL,
        "events_user_paths": q.EVENTS_USER_PATHS_SQL,
        "emb_lang_centroids": q.EMB_LANG_CENTROIDS_SQL,
        "events_debounce": q.EVENTS_DEBOUNCE_SQL,
        "orders_price_minmax": q.ORDERS_PRICE_MINMAX_SQL,
        "events_retention": q.EVENTS_RETENTION_SQL,
        "events_cooccurrence": q.EVENTS_COOCCURRENCE_SQL,
        "docs_tfidf_top_terms": q.DOCS_TFIDF_TOP_TERMS_SQL,
        "docs_inverted_index": q.DOCS_INVERTED_INDEX_SQL,
        "emb_knn_join": q.EMB_KNN_JOIN_SQL,
        "orders_monthly_growth": q.ORDERS_MONTHLY_GROWTH_SQL,
        "events_value_outliers": q.EVENTS_VALUE_OUTLIERS_SQL,
        "events_kmv_distinct": q.EVENTS_KMV_DISTINCT_SQL,
        "docs_dup_pairs": q.DOCS_DUP_PAIRS_SQL,
        "docs_clusters": q.DOCS_CLUSTERS_SQL,
        "docs_keep_best": q.DOCS_KEEP_BEST_SQL,
        "docs_sample_weights": q.DOCS_SAMPLE_WEIGHTS_SQL,
        "docs_cross_containment_indexed": q.DOCS_CROSS_CONTAINMENT_SQL,
        "docs_source_priority": q.DOCS_SOURCE_PRIORITY_SQL,
        "docs_leakage_split": q.DOCS_LEAKAGE_SPLIT_SQL,
        "docs_pagerank": q.DOCS_PAGERANK_SQL,
        "docs_triangles": q.DOCS_TRIANGLES_SQL,
    }
    out["mm_dedup_tier_matrix"] = " UNION ALL ".join(
        f"SELECT '{m}' AS modality, tier, {alias} AS n_items "
        f"FROM ({out[key]})"
        for m, key, alias in (
            ("aud", "aud_dedup_tiers_report", "n_audios"),
            ("docs", "docs_dedup_tiers_report", "n_docs"),
            ("emb", "emb_dedup_tiers_report", "n_vecs"),
            ("img", "img_dedup_tiers_report", "n_images"),
            ("vid", "vid_dedup_tiers_report", "n_videos"),
        )) + " ORDER BY modality, tier"
    return out
