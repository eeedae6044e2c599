"""Job entry point — the ``ray job submit`` surface (north-rule requirement).

Runs the dedup pipelines end-to-end over a corpus directory and writes
resumable, partitioned Parquet artifacts plus per-stage manifests:

    ray job submit -- python -m deduplicator_ray.cli extended \\
        --input /data/images --output /data/out [--resume]

    python -m deduplicator_ray.cli reference --input ... --output ...

Stages and artifacts (all under --output):

    fingerprints/<shard>/*.parquet   per-input-shard checkpoint (resumable:
                                     a re-run skips shards whose manifest
                                     matches config hash + input digest —
                                     state/manifests.py)
    clusters/*.parquet               (image_id, cluster_id)
    decisions/*.parquet              keeper/delete/rename decision table
    _manifests/, _<stage>_manifest.json   lineage + metrics

The script owns no Ray session when launched via ``ray job submit`` (the
job driver initializes Ray); standalone runs auto-init guarded by
``ray.is_initialized()``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import sys
from deduplicator_ray import io as dio

import ray


def _ensure_ray() -> None:
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")


def _fresh(path: str) -> str:
    """Clear an output subdirectory before write_parquet (which APPENDS):
    a rerun into the same --output must not accumulate duplicate rows
    beside a fresh report/manifest."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return path


def run(mode: str, input_dir: str, output_dir: str, resume: bool = True,
        hash_size: int = 8, files_exempt: tuple[str, ...] = (),
        threshold: int = 2, explain: bool = False,
        good_words: tuple[str, ...] = (), bad_words: tuple[str, ...] = (),
        good_names: tuple[str, ...] = (), bad_names: tuple[str, ...] = (),
        input_format: str = "table",
        codec_policy: str = "md5") -> dict:
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import manifests
    from deduplicator_ray.stages.components import connected_components

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size, files_exempt=tuple(files_exempt),
                         threshold=threshold, explain=explain,
                         good_words=tuple(good_words), bad_words=tuple(bad_words),
                         good_names=tuple(good_names), bad_names=tuple(bad_names),
                         unsupported_codec_policy=codec_policy)
    metrics: dict = {"mode": mode, "input": input_dir, "resume": resume}
    t_all = time.time()

    # stage 1 — fingerprints, checkpointed per input shard (resume surface)
    ckpt = os.path.join(output_dir, "fingerprints")
    t0 = time.time()
    if input_format == "files":
        # the reference's scan mode: a raw directory TREE of image files
        # (io.read_image_files).  Shard checkpoints are parquet-shard
        # granular, so files mode runs without them — convert the tree to
        # parquet shards (one pass) if resumable ingest is needed.
        resume = False
        metrics["resume"] = False  # the manifest must not claim checkpoints
        fp = ip.fingerprints(dio.read_image_files(input_dir), cfg)
    elif resume:
        # shard-granular parquet checkpointing; a Lance corpus would shard
        # by fragment instead (io.read_corpus) — not wired here because the
        # sandbox lacks the lance package to test it against
        fp = manifests.checkpoint_fingerprints(input_dir, ckpt, cfg)
    else:
        fp = ip.fingerprints(dio.read_corpus(input_dir), cfg)
    if cfg.files_exempt:
        # --files-exempt substring drop (S2, dedupc.py:687-691).  Applied
        # post-fingerprint so the shard CHECKPOINT stays exempt-independent
        # (changing the exempt list must not invalidate resume state);
        # the reference filters pre-scan — same decisions, cached decode.
        fp = ip.apply_exempt(fp, cfg.files_exempt)
    fp = ip._live(fp, cfg)
    metrics["fingerprint_wall_s"] = round(time.time() - t0, 3)

    if mode == "reference":
        t0 = time.time()
        dec = ip.reference_decisions_from_fp(fp, cfg)
        dec.write_parquet(_fresh(os.path.join(output_dir, "decisions")))
        metrics["decisions_wall_s"] = round(time.time() - t0, 3)
    else:
        # stage 2-4 — signatures → banding → verify → CC; when resuming,
        # the banding+verify stage checkpoints per band-bucket partition
        # (state/edge_checkpoint.py) so completed buckets never recompute
        t0 = time.time()
        if resume:
            from deduplicator_ray.state import edge_checkpoint as ec

            fp = fp.materialize()
            edges = ec.checkpoint_verified_edges(
                fp, os.path.join(output_dir, "edges"), cfg,
                input_digest=ec.fingerprint_digest(ckpt))
        else:
            # materialize: edges is consumed twice (stats + CC); lazy, the
            # second consumption re-executes the whole decode/LSH/verify
            # lineage — the edge table itself is pairs-only and small
            edges = ip.verified_edges_from_fp(fp, cfg).materialize()
        stats = edges.map_batches(
            lambda t: t.filter(pc.equal(t["src"], "")).select(["overflow"]),
            batch_format="pyarrow",
        )
        real = edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], "")).select(["src", "dst"]),
            batch_format="pyarrow",
        )
        clusters = connected_components(real, cfg).materialize()
        clusters.write_parquet(_fresh(os.path.join(output_dir, "clusters")))
        overflow = stats.to_pandas()
        metrics["cluster_wall_s"] = round(time.time() - t0, 3)
        metrics["n_overflow_buckets"] = int(len(overflow))
        metrics["max_overflow_bucket"] = int(overflow["overflow"].max()) if len(overflow) else 0
        # order-independent assignment checksum: re-runs / resumed runs of
        # the same input+config must reproduce it bit-for-bit
        from deduplicator_ray.stages.components import _checksum as _cc_sum

        renamed = clusters.map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow")
        metrics["cluster_checksum"] = str(_cc_sum(renamed))
        metrics["n_clustered"] = int(clusters.count())

    metrics["total_wall_s"] = round(time.time() - t_all, 3)
    manifests.write_stage_manifest(output_dir, f"job_{mode}", cfg, metrics)
    return metrics


def run_bloom_build(input_dir: str, index_dir: str, key_col: str,
                    num_parts: int) -> dict:
    """Build the persistent known-corpus Bloom index (the reference's
    hash-store snapshot — state/bloomstore.py)."""
    _ensure_ray()
    from deduplicator_ray.state import bloomstore

    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=[key_col])
    bloomstore.build_bloom_index(ds, key_col, index_dir, num_parts=num_parts)
    return {"mode": "bloom-build", "index": index_dir,
            "num_parts": num_parts, "wall_s": round(time.time() - t0, 3)}


def run_bloom_probe(input_dir: str, index_dir: str, key_col: str,
                    output_dir: str, shuffle: bool = False) -> dict:
    """Probe a new increment against a built index; writes the labeled
    rows (input columns + ``status``) as partitioned parquet."""
    _ensure_ray()
    import pyarrow.dataset as pads

    from deduplicator_ray.state import bloomstore

    t0 = time.time()
    ds = dio.read_parquet(input_dir)
    out = bloomstore.probe_bloom_index(ds, index_dir, key_col,
                                       shuffle=shuffle)
    out.write_parquet(_fresh(output_dir))
    import pyarrow.compute as pc

    status = pads.dataset(output_dir, format="parquet") \
        .to_table(columns=["status"])["status"]
    return {"mode": "bloom-probe", "output": output_dir,
            "n_rows": len(status),
            "n_dup_known": int(pc.sum(
                pc.equal(status, "dup_known").cast("int64")).as_py() or 0),
            "wall_s": round(time.time() - t0, 3)}


def run_prune(clusters_dir: str, edges_dir: str, removed_input: str,
              output_dir: str, id_col: str = "image_id") -> dict:
    """Retire vanished ids from a persisted cluster checkpoint — the
    reference's ``--prune`` loop (/root/reference/dedupc.py:675-676 →
    dupedb.py:371-411) as a job mode: reads the assignment parquet, the
    persisted verified edge set, and a parquet of removed ids, folds the
    removal with ``incremental_cc_remove`` (only touched components are
    re-resolved) and writes the updated assignment.

    Node-deletion safety caveat: the persisted edge set must represent
    pairwise verification (the docs pipelines' edge checkpoints do).  The
    image pipeline's spanning-forest hot-bucket edges are NOT — prune an
    image corpus with ``image_dedup.img_cluster_remove`` (re-verifies
    affected survivors) instead."""
    _ensure_ray()
    from deduplicator_ray.stages.components import incremental_cc_remove

    t0 = time.time()
    assign = dio.read_parquet(clusters_dir)
    edges = dio.read_parquet(edges_dir)
    removed: set[str] = set()
    for b in (dio.read_parquet(removed_input, columns=[id_col])
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        removed.update(str(x) for x in b[id_col].to_pylist())
    n_before = assign.count()
    out = incremental_cc_remove(assign, edges, removed).materialize()
    out.write_parquet(_fresh(output_dir))
    return {"mode": "prune", "output": output_dir,
            "n_removed_ids": len(removed),
            "n_rows_before": int(n_before), "n_rows_after": int(out.count()),
            "wall_s": round(time.time() - t0, 3)}


def run_band_build(input_dir: str, index_dir: str, num_parts: int,
                   hash_size: int = 8) -> dict:
    """Build the persistent NEAR-dup band index (state/bandstore.py):
    fingerprint the corpus, band it, persist hash-partitioned band rows."""
    _ensure_ray()
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore
    from deduplicator_ray import tuning

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    fp = ip._live(ip.fingerprints(dio.read_corpus(input_dir), cfg), cfg)
    params = bandstore.build_band_index(fp, cfg, index_dir,
                                        num_parts=num_parts)
    return {"mode": "band-build", "index": index_dir, **params,
            "wall_s": round(time.time() - t0, 3)}


def run_band_probe(input_dir: str, index_dir: str, output_dir: str,
                   hash_size: int = 8) -> dict:
    """Probe a new image increment against a built band index; writes the
    (image_id, matched) near-dup table as parquet."""
    _ensure_ray()
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore
    from deduplicator_ray import tuning

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    fp = ip._live(ip.fingerprints(dio.read_corpus(input_dir), cfg), cfg)
    stats: dict = {}
    out = bandstore.probe_band_index(fp, index_dir, cfg, stats=stats)
    out.write_parquet(_fresh(output_dir))
    n_matched = dio.read_parquet(output_dir).count()
    return {"mode": "band-probe", "output": output_dir,
            "n_matched": int(n_matched), **stats,
            "wall_s": round(time.time() - t0, 3)}


def run_band_append(input_dir: str, index_dir: str,
                    hash_size: int = 8) -> dict:
    """Fold an image increment's band rows into a built band index —
    append-only (existing files untouched); probe/prune see the union."""
    _ensure_ray()
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore
    from deduplicator_ray import tuning

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    fp = ip._live(ip.fingerprints(dio.read_corpus(input_dir), cfg), cfg)
    n = bandstore.append_band_index(fp, index_dir, cfg)
    return {"mode": "band-append", "index": index_dir,
            "n_appended_rows": int(n),
            "wall_s": round(time.time() - t0, 3)}


def run_srp_build(input_dir: str, index_dir: str,
                  num_parts: int = 64) -> dict:
    """Build the persisted SRP embedding near-dup index from parquet shards
    of (vec_id, embedding) rows."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.state import srpstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["vec_id", "embedding"])
    params = srpstore.build_srp_index(ds, index_dir, num_parts=num_parts)
    return {"mode": "srp-build", "index": index_dir, **params,
            "wall_s": round(time.time() - t0, 3)}


def run_srp_probe(input_dir: str, index_dir: str, output_dir: str,
                  threshold: float = 0.35) -> dict:
    """Probe an embedding increment against a persisted SRP index; writes
    (va=new, vb=known, cos_e6) pairs."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.state import srpstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["vec_id", "embedding"])
    stats: dict = {}
    out = srpstore.probe_srp_index(ds, index_dir, threshold=threshold,
                                   stats=stats)
    out.write_parquet(_fresh(output_dir))
    n = dio.read_parquet(output_dir).count()
    return {"mode": "srp-probe", "output": output_dir,
            "n_pairs": int(n), **stats,
            "wall_s": round(time.time() - t0, 3)}


def run_srp_append(input_dir: str, index_dir: str) -> dict:
    """Fold an embedding increment into a persisted SRP index —
    append-only; probes see the union (no trained state, no drift)."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.state import srpstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["vec_id", "embedding"])
    n = srpstore.append_srp_index(ds, index_dir)
    return {"mode": "srp-append", "index": index_dir,
            "n_appended_rows": int(n),
            "wall_s": round(time.time() - t0, 3)}


def run_docband_build(input_dir: str, index_dir: str,
                      num_parts: int = 64) -> dict:
    """Build the persisted doc MinHash band index from parquet shards of
    (doc_id, text) rows."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.state import docbandstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    params = docbandstore.build_doc_band_index(ds, PipelineConfig(),
                                               index_dir,
                                               num_parts=num_parts)
    return {"mode": "docband-build", "index": index_dir, **params,
            "wall_s": round(time.time() - t0, 3)}


def run_docband_probe(input_dir: str, index_dir: str,
                      output_dir: str) -> dict:
    """Probe a doc increment against a persisted band index; writes
    (doc_id, matched) min-match pairs."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.state import docbandstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    stats: dict = {}
    out = docbandstore.probe_doc_band_index(ds, index_dir, PipelineConfig(),
                                            stats=stats)
    out.write_parquet(_fresh(output_dir))
    n = dio.read_parquet(output_dir).count()
    return {"mode": "docband-probe", "output": output_dir,
            "n_matched": int(n), **stats,
            "wall_s": round(time.time() - t0, 3)}


def run_docband_append(input_dir: str, index_dir: str) -> dict:
    """Fold a doc increment into a persisted band index — append-only."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.state import docbandstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    n = docbandstore.append_doc_band_index(ds, index_dir, PipelineConfig())
    return {"mode": "docband-append", "index": index_dir,
            "n_appended_rows": int(n),
            "wall_s": round(time.time() - t0, 3)}


def run_cont_build(input_dir: str, index_dir: str,
                   num_parts: int = 64) -> dict:
    """Build the persisted containment prefix index (postings + keyed
    texts + hot-shingle df table) from parquet shards of (doc_id, text)."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.state import contstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    params = contstore.build_containment_index(ds, index_dir,
                                               num_parts=num_parts)
    return {"mode": "cont-build", "index": index_dir, **params,
            "wall_s": round(time.time() - t0, 3)}


def run_cont_probe(input_dir: str, index_dir: str,
                   output_dir: str) -> dict:
    """Probe a doc increment for quote-of-known containment; writes
    (doc_id, matched_known, action) decisions."""
    _ensure_ray()
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deduplicator_ray import tuning
    from deduplicator_ray.state import contstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    stats: dict = {}
    out = contstore.probe_containment_index(ds, index_dir, stats=stats)
    os.makedirs(output_dir, exist_ok=True)
    _pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                    os.path.join(output_dir, "decisions.parquet"))
    return {"mode": "cont-probe", "output": output_dir,
            "n_new": int(len(out)),
            "n_dropped": int((out["action"] == "drop").sum()), **stats,
            "wall_s": round(time.time() - t0, 3)}


def run_cont_append(input_dir: str, index_dir: str) -> dict:
    """Fold a doc increment into the containment index — append-only."""
    _ensure_ray()
    from deduplicator_ray import tuning
    from deduplicator_ray.state import contstore

    tuning.tune()
    t0 = time.time()
    ds = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    n = contstore.append_containment_index(ds, index_dir)
    return {"mode": "cont-append", "index": index_dir,
            "n_appended_rows": int(n),
            "wall_s": round(time.time() - t0, 3)}


def run_curate(input_dir: str, output_dir: str, lang: str = "en",
               min_tokens: int = 20) -> dict:
    """Text-corpus curation job: lang gate → quality gate → near-dup
    keeper → substring accounting over a parquet dir of (doc_id, text)
    rows.  Writes three artifacts under --output (the doc-side analog of
    the image reference/extended jobs):

        decisions/*.parquet   per-doc (doc_id, action, n_tokens_kept)
        trimmed/*.parquet     kept docs with duplicated spans REMOVED
        report.json           the dataset-card rollup (per action:
                              docs + surviving tokens) + wall times
    """
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from deduplicator_ray import tuning
    from deduplicator_ray.pipelines import queries as q

    tuning.tune()
    t0 = time.time()
    dec = q._curation_decisions("", lang=lang, min_tokens=min_tokens,
                                docs_path=input_dir).materialize()
    dec.write_parquet(_fresh(os.path.join(output_dir, "decisions")))
    t_dec = round(time.time() - t0, 3)

    # trimmed text for the kept docs (substring spans applied)
    t1 = time.time()
    import pyarrow.compute as pc

    from deduplicator_ray.pipelines.substring import substring_dup_spans
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    pdf = dec.to_pandas()
    docs = dio.read_parquet(input_dir, columns=["doc_id", "text"])
    keep_ids = pa.array(pdf.loc[pdf["action"] == "keep", "doc_id"].to_numpy())
    kept = docs.map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=keep_ids)),
        batch_format="pyarrow")
    trimmed = q.trim_spans(kept, substring_dup_spans(kept))
    trimmed.write_parquet(_fresh(os.path.join(output_dir, "trimmed")))
    t_trim = round(time.time() - t1, 3)

    report = (pdf.groupby("action", as_index=False)
              .agg(n_docs=("action", "size"),
                   total_tokens_kept=("n_tokens_kept", "sum")))
    metrics = {"mode": "curate", "input": input_dir,
               "report": report.to_dict("records"),
               "decisions_wall_s": t_dec, "trim_wall_s": t_trim,
               "total_wall_s": round(time.time() - t0, 3)}
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def run_img_curate(input_dir: str, output_dir: str,
                   hash_size: int = 8) -> dict:
    """Image-corpus curation job (the image sibling of ``run_curate``):
    gate cascade (dead-letter / zero-hash poison / min-pixels / aspect)
    then per-proc_hash keeper election, over a parquet dir of
    input_hint-shaped rows.  Writes three artifacts under --output:

        decisions/*.parquet   per-image (image_id, action, pixels, filesize)
        kept/*.parquet        the surviving corpus rows (original columns)
        report.json           per-action images + bytes rollup + wall times

    The kept-corpus filter broadcasts the keep-id set (same shape as
    run_curate's); at corpora where the keep set outgrows a broadcast,
    swap it for the hash-partitioned semi-join (docs_purge_semijoin's
    shape) — the decision table itself never materializes driver-side
    beyond the id column."""
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    dec = ip.img_curation(dio.read_parquet(input_dir), cfg).materialize()
    dec.write_parquet(_fresh(os.path.join(output_dir, "decisions")))
    t_dec = round(time.time() - t0, 3)

    t1 = time.time()
    keep_schema = pa.schema([("image_id", pa.string())])
    keep_batches = list(
        dec.map_batches(
            lambda t: t.filter(pc.equal(t["action"], "keep"))
                       .select(["image_id"]),
            batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    # pa.concat_tables([]) raises on a zero-row corpus — seed the schema
    keep_ids = pa.concat_tables(
        keep_batches or [keep_schema.empty_table()],
        promote_options="permissive")["image_id"]
    import ray

    # ray.put once so the keep set ships to the object store a single time
    # instead of re-serializing inside every task's closure
    keep_ref = ray.put(keep_ids.combine_chunks()
                       if isinstance(keep_ids, pa.ChunkedArray)
                       else keep_ids)

    def keep_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(
            pc.cast(t["image_id"], pa.string()), value_set=ray.get(keep_ref)))

    kept = dio.read_parquet(input_dir).map_batches(
        keep_filter, batch_format="pyarrow")
    kept.write_parquet(_fresh(os.path.join(output_dir, "kept")))
    t_kept = round(time.time() - t1, 3)

    report = ip.curation_rollup(dec)
    metrics = {"mode": "img-curate", "input": input_dir,
               "report": report.to_dict("records"),
               "decisions_wall_s": t_dec, "kept_wall_s": t_kept,
               "total_wall_s": round(time.time() - t0, 3)}
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def run_tiers(input_dir: str, output_dir: str, hash_size: int = 8) -> dict:
    """Tier-dedup job: classify every live image with the cheapest tier
    that catches it as a duplicate (byte → hash → near → unique,
    image_dedup.img_dedup_tiers) and write:

        tiers/*.parquet   per-image (image_id, tier, dup_of)
        report.json       per-tier image counts + wall time

    The per-tier report is the operational readout of the tier cascade —
    how much dedup yield each successively more expensive tier buys."""
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    tiers = ip.img_dedup_tiers(dio.read_parquet(input_dir), cfg).materialize()
    import shutil as _sh

    # write_parquet appends: a rerun into the same --output must not
    # accumulate duplicate tier rows beside a fresh report.json
    _sh.rmtree(os.path.join(output_dir, "tiers"), ignore_errors=True)
    tiers.write_parquet(os.path.join(output_dir, "tiers"))

    from deduplicator_ray.stages.fpsets import fp_tier_report

    report = fp_tier_report(tiers, "n_images")
    metrics = {"mode": "tiers", "input": input_dir,
               "report": report.to_dict("records"),
               "total_wall_s": round(time.time() - t0, 3)}
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def _input_digest(input_dir: str) -> str:
    """Cheap content digest of an input directory: sorted (name, size,
    footer-md5) of its parquet files.  Stamped into stage markers so resume
    NEVER reuses artifacts of a different increment.  The footer md5 is the
    content signal (row-group stats, row counts, column chunk offsets all
    live there): two different increments whose files happen to share names
    and byte sizes still digest differently — (name, size) alone let resume
    and the folded_digests at-most-once guard reuse/skip the WRONG
    increment's artifacts.  Footer reads are O(KB) per file, no data pages
    touched."""
    import glob as _glob
    import hashlib as _hl
    import struct as _struct

    def footer_md5(p: str, size: int) -> str:
        try:
            with open(p, "rb") as f:
                f.seek(max(0, size - 8))
                tail = f.read(8)
                if len(tail) != 8 or tail[4:] != b"PAR1":
                    return "badmagic"
                (flen,) = _struct.unpack("<I", tail[:4])
                flen = min(flen, size - 8)
                f.seek(size - 8 - flen)
                return _hl.md5(f.read(flen)).hexdigest()[:12]
        except OSError:
            return "unreadable"

    rows = sorted(
        (os.path.relpath(p, input_dir), p, os.path.getsize(p))
        for p in _glob.glob(os.path.join(input_dir, "**", "*.parquet"),
                            recursive=True))
    if not rows:
        return ""  # absent/empty input: resume-only intent, no identity
    full = [(rel, size, footer_md5(p, size)) for rel, p, size in rows]
    return _hl.sha256(repr(full).encode()).hexdigest()[:16]


def _input_digest_legacy(input_dir: str) -> str:
    """The pre-footer-md5 digest format ((basename, size) rows).  The
    fold ledger still consults it so an increment folded BEFORE the
    digest format changed isn't silently re-appended on a rerun (the
    at-most-once guard would otherwise orphan every old 'done' entry —
    review-found upgrade hazard).  New markers always record the current
    format."""
    import glob as _glob
    import hashlib as _hl

    rows = sorted(
        (os.path.basename(p), os.path.getsize(p))
        for p in _glob.glob(os.path.join(input_dir, "**", "*.parquet"),
                            recursive=True))
    if not rows:
        return ""
    return _hl.sha256(repr(rows).encode()).hexdigest()[:16]


def _stage_marker(output_dir: str, stage: str) -> str:
    return os.path.join(output_dir, f"_stage_{stage}_done.json")


def _stage_done(output_dir: str, stage: str, cfg_hash: str,
                in_digest: str = "") -> dict | None:
    """Load a completed-stage marker iff it matches the current config AND
    the current increment — a config change or a different --input
    invalidates every downstream artifact (silently reusing another
    increment's stages would report success while folding nothing)."""
    try:
        with open(_stage_marker(output_dir, stage)) as f:
            m = json.load(f)
        if m.get("config_hash") != cfg_hash:
            return None
        if in_digest and m.get("input_digest", "") != in_digest:
            return None
        return m
    except (OSError, json.JSONDecodeError):
        return None


def _stage_begin(output_dir: str, stage: str) -> str:
    """Invalidate the marker BEFORE touching the stage directory (crash
    between clear and rewrite must not leave a stale marker beside
    partial output — the run_media_dedup discipline) and clear the
    stage's output dir (write_parquet appends)."""
    p = _stage_marker(output_dir, stage)
    if os.path.exists(p):
        os.remove(p)
    return _fresh(os.path.join(output_dir, stage))


def _stage_end(output_dir: str, stage: str, cfg_hash: str, **extra) -> None:
    with open(_stage_marker(output_dir, stage), "w") as f:
        json.dump({"config_hash": cfg_hash, "stage": stage, **extra}, f)


# s4 decision-refresh broadcast cap: touched-cluster membership maps up to
# this size ship via ray.put; above it the refresh falls back to the
# partitioned union-attach exchange (module-level so tests can pin the
# fallback path)
_MEMBER_BCAST_CAP = 1 << 20


def _union_attach_labels(fp, labels, cols: list[str]):
    """Attach ``cluster_id`` to fingerprint rows by image_id — the
    tag/union + key-partitioned-groupby shape (montage_pipeline /
    _curation_decisions), inner semantics: fp rows without a label are
    dropped.  Replaces ``Dataset.join`` on this path (schema-less empty
    blocks on sparse partitions, the CORRECTNESS_r01 failure).  ``cols``
    must not carry full-range int64 values: unioned nulls route the
    column through pandas float64 (the resolve columns are small ints —
    lossless)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    sch = fp.schema()
    types = dict(zip(sch.names, sch.types))
    fp_fields = [(c, types[c]) for c in cols]
    union_schema = pa.schema([("cluster_id", pa.string()), *fp_fields,
                              ("__tag", pa.int8())])
    out_schema = pa.schema([("cluster_id", pa.string()), *fp_fields])

    def tag_fp(t: "pa.Table") -> "pa.Table":
        n = t.num_rows
        arrays = [pa.nulls(n, pa.string())]
        arrays += [pc.cast(t[c], ty) for c, ty in fp_fields]
        arrays.append(pa.array(np.zeros(n, np.int8)))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_lab(t: "pa.Table") -> "pa.Table":
        n = t.num_rows
        arrays = [pc.cast(t["cluster_id"], pa.string())]
        for c, ty in fp_fields:
            arrays.append(pc.cast(t["image_id"], ty) if c == "image_id"
                          else pa.nulls(n, ty))
        arrays.append(pa.array(np.ones(n, np.int8)))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def attach(df):
        labs = df[df["__tag"] == 1]
        fps = df[df["__tag"] == 0]
        if labs.empty or fps.empty:
            return out_schema.empty_table().to_pandas()
        lut = (labs.drop_duplicates("image_id")
               .set_index("image_id")["cluster_id"])
        cid = fps["image_id"].map(lut)
        keep = cid.notna().to_numpy()
        out = fps.loc[keep, [c for c, _ in fp_fields]].copy()
        out.insert(0, "cluster_id", cid[keep].to_numpy())
        return out

    u = fp.map_batches(tag_fp, batch_format="pyarrow").union(
        labels.map_batches(tag_lab, batch_format="pyarrow"))
    return partitioned_groupby(u, ["image_id"], attach, num_parts=16,
                               out_schema=out_schema)


def run_ingest_init(input_dir: str, state_dir: str, num_parts: int = 64,
                    hash_size: int = 8) -> dict:
    """Initialize persisted incremental-ingest state from a known corpus:
    ONE fingerprint pass feeds all three state families —

        state/band_index/    both-channel band rows (state/bandstore.py)
        state/fingerprints/  the payload-free fingerprint table
        state/clusters/      the extended-cluster assignment

    — the on-disk form of the reference's persistent hash-store
    (/root/reference/dupedb.py:31-66), against which `ingest` folds each
    new crawl."""
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore
    from deduplicator_ray.stages.components import connected_components

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    fp = ip._live(ip.fingerprints(dio.read_corpus(input_dir), cfg),
                  cfg).materialize()
    # BOTH channels: the extended pipeline links via image Hamming AND
    # caption Jaccard — an img-only index would silently miss caption
    # near-dups on every later ingest (the delta probe loads channels
    # from the persisted params)
    params = bandstore.build_band_index(
        fp, cfg, os.path.join(state_dir, "band_index"),
        num_parts=num_parts, channels=("img", "cap"))
    fp.write_parquet(_fresh(os.path.join(state_dir, "fingerprints")))
    edges = ip.verified_edges_from_fp(fp, cfg).map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], "")).select(["src", "dst"]),
        batch_format="pyarrow")
    assign = connected_components(edges, cfg).materialize()
    assign.write_parquet(_fresh(os.path.join(state_dir, "clusters")))
    man = {"mode": "ingest-init", "input": input_dir,
           "config_hash": cfg.config_hash(), "n_known": int(fp.count()),
           "n_clustered": int(assign.count()), **params,
           "wall_s": round(time.time() - t0, 3)}
    with open(os.path.join(state_dir, "_state_manifest.json"), "w") as f:
        json.dump(man, f, indent=1)
    return man


def run_ingest(input_dir: str, state_dir: str, output_dir: str,
               resume: bool = True, hash_size: int = 8,
               fold_state: bool = True) -> dict:
    """The chained end-to-end incremental ingest job (round-2 VERDICT
    item 6): fold a NEW-images parquet into persisted dedup state without
    re-clustering the known corpus —

        s1 fingerprints   decode+hash the increment → output/new_fp
        s2 delta_edges    band-probe + delta verify against the persisted
                          index (probe_band_delta_edges: only new-touched
                          buckets, partition-pruned index reads)
        s3 clusters       incremental_cc_update folds the delta edges
                          into the persisted assignment → output/clusters
        s4 decisions      keeper election refreshed for ONLY the clusters
                          containing an increment member
        s5 state fold     band-index append + fingerprint append +
                          assignment swap (tmp+rename), so the next
                          increment probes build(A ∪ B) state

    Every stage writes a config-stamped done-marker; a killed run resumes
    by skipping completed stages (tests/test_cli_ingest.py kills between
    stages and reruns).  The increment is the SMALL side by design — the
    only driver-sized structures are its id set and the touched cluster
    labels (both increment-bounded)."""
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc

    from deduplicator_ray import tuning
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines import image_dedup as ip
    from deduplicator_ray.state import bandstore
    from deduplicator_ray.stages.components import incremental_cc_update
    from deduplicator_ray.stages.partitioned import partitioned_groupby
    from deduplicator_ray.stages.resolve import (
        decision_schema,
        make_partition_resolve,
    )

    tuning.tune()
    cfg = PipelineConfig(hash_size=hash_size)
    ch = cfg.config_hash()
    with open(os.path.join(state_dir, "_state_manifest.json")) as f:
        state_man = json.load(f)
    if state_man["config_hash"] != ch:
        raise ValueError(
            f"state at {state_dir} was built with config "
            f"{state_man['config_hash']}, run requests {ch} — rebuild "
            "state (ingest-init) or match the config")
    idig = _input_digest(input_dir)
    idig_legacy = _input_digest_legacy(input_dir)

    def _fold_status() -> str | None:
        """Ledger lookup under the current digest, falling back to the
        legacy (basename,size) format for increments folded before the
        footer-md5 digest change.  A legacy hit is MIGRATED to the new
        digest immediately (manifest rewritten) and warned about loudly:
        the legacy key cannot tell a genuinely-folded increment from a
        NEW one that collides on name+size, so the fallback window must
        close after one lookup rather than persist run over run."""
        f = state_man.get("folded_digests", {})
        st = f.get(idig)
        if st is not None:
            return st
        if idig_legacy and idig_legacy in f:
            st = f.pop(idig_legacy)
            f[idig] = st
            with open(os.path.join(state_dir, "_state_manifest.json"),
                      "w") as fh:
                json.dump(state_man, fh, indent=1)
            print(
                f"WARNING: increment {input_dir} matched the fold ledger "
                f"only by the legacy (basename,size) digest {idig_legacy}; "
                f"migrated the entry to footer-md5 digest {idig}. If this "
                "increment is actually NEW content that collides on "
                "name+size with a pre-upgrade fold, rebuild state with "
                "ingest-init.", file=sys.stderr)
            return st
        return None

    metrics: dict = {"mode": "ingest", "input": input_dir,
                     "input_digest": idig,
                     "state": state_dir, "resume": resume}
    t_all = time.time()

    # s1 — increment fingerprints (payload-free from here on)
    s1_dir = os.path.join(output_dir, "new_fp")
    m = _stage_done(output_dir, "new_fp", ch, idig) if resume else None
    if m is None:
        t0 = time.time()
        _stage_begin(output_dir, "new_fp")
        fp = ip._live(ip.fingerprints(dio.read_corpus(input_dir), cfg),
                      cfg).materialize()
        fp.write_parquet(s1_dir)
        _stage_end(output_dir, "new_fp", ch, input_digest=idig, n_rows=int(fp.count()),
                   wall_s=round(time.time() - t0, 3))
        m = _stage_done(output_dir, "new_fp", ch, idig)
    metrics["s1_new_fp"] = m

    # s2 — increment-touched verified edges against the persisted index
    s2_dir = os.path.join(output_dir, "delta_edges")
    m = _stage_done(output_dir, "delta_edges", ch, idig) if resume else None
    if m is None:
        t0 = time.time()
        _stage_begin(output_dir, "delta_edges")
        stats: dict = {}
        if metrics["s1_new_fp"]["n_rows"]:
            new_fp = dio.read_parquet(s1_dir)
            edges = bandstore.probe_band_delta_edges(
                new_fp, os.path.join(state_dir, "band_index"), cfg,
                stats=stats)
            edges = edges.map_batches(
                lambda t: t.filter(pc.not_equal(t["src"], "")).select(
                    ["src", "dst"]), batch_format="pyarrow").materialize()
            edges.write_parquet(s2_dir)
            n_edges = int(edges.count())
        else:
            n_edges = 0  # empty increment: nothing to probe
        _stage_end(output_dir, "delta_edges", ch, input_digest=idig, n_edges=n_edges,
                   **stats, wall_s=round(time.time() - t0, 3))
        m = _stage_done(output_dir, "delta_edges", ch, idig)
    metrics["s2_delta_edges"] = m

    # s3 — fold into the persisted assignment (label-space contraction,
    # the full assignment never re-shuffles through CC rounds)
    s3_dir = os.path.join(output_dir, "clusters")
    m = _stage_done(output_dir, "clusters", ch, idig) if resume else None
    if m is None:
        t0 = time.time()
        _stage_begin(output_dir, "clusters")
        assign = dio.read_parquet(os.path.join(state_dir, "clusters"))
        delta = dio.read_parquet(s2_dir) \
            if _stage_done(output_dir, "delta_edges", ch, idig)["n_edges"] \
            else None
        if delta is None:
            updated = assign.materialize()
        else:
            updated = incremental_cc_update(assign, delta, cfg).materialize()
        updated.write_parquet(s3_dir)
        _stage_end(output_dir, "clusters", ch, input_digest=idig, n_rows=int(updated.count()),
                   wall_s=round(time.time() - t0, 3))
        m = _stage_done(output_dir, "clusters", ch, idig)
    metrics["s3_clusters"] = m

    # s4 — decision refresh for clusters touching the increment.  The
    # increment id set and the touched label set are the only driver-side
    # structures (both increment-bounded by construction).
    s4_dir = os.path.join(output_dir, "decisions")
    m = _stage_done(output_dir, "decisions", ch, idig) if resume else None
    if m is None:
        t0 = time.time()
        _stage_begin(output_dir, "decisions")
        new_ids: set[str] = set()
        if metrics["s1_new_fp"]["n_rows"]:
            for b in (dio.read_parquet(s1_dir, columns=["image_id"])
                      .iter_batches(batch_size=None,
                                    batch_format="pyarrow")):
                new_ids.update(str(x) for x in b["image_id"].to_pylist())
        touched: set[str] = set()
        members: dict[str, str] = {}  # touched member id → cluster label
        if new_ids:
            updated = dio.read_parquet(s3_dir).materialize()
            nid_arr = pa.array(sorted(new_ids), pa.string())
            for b in (updated.map_batches(
                    lambda t: t.filter(pc.is_in(t["image_id"],
                                                value_set=nid_arr))
                    .select(["cluster_id"]), batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow")):
                touched.update(str(x) for x in b["cluster_id"].to_pylist())
        # touched MEMBERSHIP (all rows of touched clusters) drives the
        # refresh.  It is increment-bounded in the common case, so the
        # fast path broadcasts the member→label map and the refresh is
        # ONE exchange (label attach is a map, resolve is the groupby);
        # above the cap it falls back to the tag/union partitioned
        # attach (_union_attach_labels — NOT Dataset.join, which emits
        # schema-less empty blocks on sparse partitions) — never a
        # driver blow-up, never a wrong answer.
        if touched:
            t_arr = pa.array(sorted(touched), pa.string())
            rows = updated.map_batches(
                lambda t: t.filter(pc.is_in(t["cluster_id"],
                                            value_set=t_arr)),
                batch_format="pyarrow")
            for b in rows.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
                if members is not None:
                    for i, c in zip(b["image_id"].to_pylist(),
                                    b["cluster_id"].to_pylist()):
                        members[str(i)] = str(c)
                    if len(members) > _MEMBER_BCAST_CAP:
                        members = None  # fall back to the partitioned join
            # after a COMPLETED fold, state/fingerprints already holds the
            # appended increment — on a rerun of an already-folded
            # increment (--no-resume / lost marker, the scenario s5's
            # refold_skipped branch supports) also reading s1_dir would
            # enter every increment member into the keeper election TWICE:
            # cumcount()==0 then emits the duplicate keeper row as a
            # 'delete' decision for the keeper id and inflates bucket
            # sizes / rename CRC suffixes
            fp_paths = [os.path.join(state_dir, "fingerprints")]
            if _fold_status() != "done":
                fp_paths.append(s1_dir)
            from deduplicator_ray.stages.ranking import RANK_COLUMNS
            need_cols = ["image_id", "proc_hash", "crc32", *RANK_COLUMNS]
            all_fp = dio.read_parquet(fp_paths, columns=need_cols)
            if members is not None:
                mem_ref = ray.put(members)

                def attach(t: pa.Table) -> pa.Table:
                    mm = ray.get(mem_ref)
                    ids = [str(x) for x in t["image_id"].to_pylist()]
                    keep = pa.array([i in mm for i in ids])
                    t = t.filter(keep)
                    lab = [mm[str(x)] for x in t["image_id"].to_pylist()]
                    return t.append_column("cluster_id",
                                           pa.array(lab, pa.string()))

                joined = all_fp.map_batches(attach, batch_format="pyarrow")
            else:
                # over-cap fallback: tag/union + image_id-partitioned
                # groupby attach (the montage_pipeline shape) — NOT
                # Dataset.join, which emits schema-less empty blocks on
                # sparse partitions (the CORRECTNESS_r01 failure
                # stages/fpsets.py documents).  Only the resolve-needed
                # columns ride the exchange; their values are small ints/
                # floats, so the pandas null→float64 detour is lossless.
                joined = _union_attach_labels(all_fp, rows, need_cols)
            dec = partitioned_groupby(
                joined, ["cluster_id"],
                make_partition_resolve(cfg, cluster_col="cluster_id",
                                       with_superstate=True),
                out_schema=decision_schema(cfg)).materialize()
            dec.write_parquet(s4_dir)
            n_dec = int(dec.count())
        else:
            n_dec = 0
        _stage_end(output_dir, "decisions", ch, input_digest=idig, n_rows=n_dec,
                   n_touched_clusters=len(touched),
                   wall_s=round(time.time() - t0, 3))
        m = _stage_done(output_dir, "decisions", ch, idig)
    metrics["s4_decisions"] = m

    # s5 — fold the increment into the persisted state so the NEXT
    # increment probes build(known ∪ this) state.  At-most-once per
    # increment: the state manifest leads each fold with an in_progress
    # entry keyed by the increment digest — a rerun of an already-folded
    # increment (crash after append, or --no-resume) skips the append
    # instead of duplicating band/fingerprint rows forever, and a fold
    # interrupted MID-append fails loudly (partial appends make the state
    # suspect — rebuild with ingest-init).
    if fold_state:
        man_path = os.path.join(state_dir, "_state_manifest.json")

        def write_man() -> None:
            with open(man_path, "w") as f:
                json.dump(state_man, f, indent=1)

        m = _stage_done(output_dir, "state_fold", ch, idig) if resume else None
        folded = state_man.setdefault("folded_digests", {})
        if m is None and _fold_status() == "done":
            # state already holds this increment (marker lost or
            # --no-resume): refresh the assignment swap only — it is
            # replace-not-append, so repeating it is safe
            t0 = time.time()
            p = _stage_marker(output_dir, "state_fold")
            if os.path.exists(p):
                os.remove(p)
            import shutil

            tmp = os.path.join(state_dir, "clusters.new")
            shutil.rmtree(tmp, ignore_errors=True)
            dio.read_parquet(s3_dir).write_parquet(tmp)
            old = os.path.join(state_dir, "clusters")
            shutil.rmtree(old, ignore_errors=True)
            os.rename(tmp, old)
            _stage_end(output_dir, "state_fold", ch, input_digest=idig,
                       n_band_rows_appended=0, refold_skipped=True,
                       wall_s=round(time.time() - t0, 3))
            m = _stage_done(output_dir, "state_fold", ch, idig)
        elif m is None:
            if _fold_status() == "in_progress":
                raise RuntimeError(
                    f"state fold of increment {idig} was interrupted "
                    "mid-append — the persisted band/fingerprint state "
                    "may hold partial appends; rebuild with ingest-init")
            t0 = time.time()
            p = _stage_marker(output_dir, "state_fold")
            if os.path.exists(p):
                os.remove(p)
            folded[idig] = "in_progress"
            write_man()
            if metrics["s1_new_fp"]["n_rows"]:
                new_fp = dio.read_parquet(s1_dir)
                n_app = bandstore.append_band_index(
                    new_fp, os.path.join(state_dir, "band_index"), cfg)
                new_fp.write_parquet(
                    os.path.join(state_dir, "fingerprints"))
            else:
                n_app = 0
            # assignment swap: write aside, then atomic-ish rename
            import shutil

            tmp = os.path.join(state_dir, "clusters.new")
            shutil.rmtree(tmp, ignore_errors=True)
            dio.read_parquet(s3_dir).write_parquet(tmp)
            old = os.path.join(state_dir, "clusters")
            shutil.rmtree(old, ignore_errors=True)
            os.rename(tmp, old)
            folded[idig] = "done"
            write_man()
            _stage_end(output_dir, "state_fold", ch, input_digest=idig,
                       n_band_rows_appended=int(n_app),
                       wall_s=round(time.time() - t0, 3))
            m = _stage_done(output_dir, "state_fold", ch, idig)
        metrics["s5_state_fold"] = m

    metrics["total_wall_s"] = round(time.time() - t_all, 3)
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def run_band_prune(index_dir: str, removed_input: str,
                   hash_size: int = 8, id_col: str = "image_id") -> dict:
    """Retire vanished ids from a persisted band index — the index-side
    half of the reference's prune loop (the assignment-side half is
    ``run_prune``).  Partition-granular: untouched ``part=N`` directories
    stay byte-identical, so a re-run after a crash re-touches nothing."""
    _ensure_ray()
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.state import bandstore

    cfg = PipelineConfig(hash_size=hash_size)
    t0 = time.time()
    removed: set[str] = set()
    for b in (dio.read_parquet(removed_input, columns=[id_col])
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        removed.update(str(x) for x in b[id_col].to_pylist())
    stats = bandstore.prune_band_index(removed, index_dir, cfg)
    return {"mode": "band-prune", "index": index_dir,
            "n_removed_ids": len(removed), **stats,
            "wall_s": round(time.time() - t0, 3)}




def run_media_dedup(input_dir: str, output_dir: str, modality: str,
                    tau_e6: int | None = None,
                    max_fp_df: int | None = None,
                    resume: bool = True) -> dict:
    """Modality near-dup job (video frames / audio windows): the shared
    fp-set pipeline as a resumable ray-job surface.

        signatures/*.parquet   (id, idx, fp, md5) per decodable item — the
                               EXPENSIVE kernel output, persisted first
        dead_letter/*.parquet  corrupt containers (badfiles taxonomy)
        pairs/*.parquet        verified near-dup pairs (exact Jaccard)
        clusters/*.parquet     (id, cluster_id) via distributed CC
        tiers/*.parquet        (id, tier, dup_of) — byte/fpset/near/unique
                               cascade from the same persisted signatures
        report.json            counts + tier histogram + wall times

    Resume: pairs/clusters are recomputed FROM the persisted signatures,
    so a rerun (or a tau/df re-threshold) never re-decodes payloads —
    pass a finished --output again and the kernel stage is skipped
    (the `_sigs_done.json` marker records the completed kernel pass).
    """
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from deduplicator_ray import tuning

    tuning.tune()
    if modality == "video":
        from deduplicator_ray.pipelines import video_dedup as mod

        id_col, fp_col = "video_id", "frame_fp"
        kernel = mod.video_tier_frames   # fp rows + payload md5, one pass
        tau = mod.TAU_E6_DEFAULT if tau_e6 is None else tau_e6
        cap = mod.MAX_FP_DF_DEFAULT if max_fp_df is None else max_fp_df
    elif modality == "audio":
        from deduplicator_ray.pipelines import audio_dedup as mod

        id_col, fp_col = "audio_id", "win_fp"
        kernel = mod.audio_tier_signatures
        tau = mod.TAU_E6_DEFAULT if tau_e6 is None else tau_e6
        cap = mod.MAX_FP_DF_DEFAULT if max_fp_df is None else max_fp_df
    else:
        raise ValueError(f"unknown modality {modality!r}")

    from deduplicator_ray.stages.fpsets import fp_dup_pairs

    sig_dir = os.path.join(output_dir, "signatures")
    dead_dir = os.path.join(output_dir, "dead_letter")
    marker = os.path.join(output_dir, "_sigs_done.json")
    t0 = time.time()
    idig = _input_digest(input_dir)
    sig_meta = None
    if resume and os.path.exists(marker):
        with open(marker) as f:
            sig_meta = json.load(f)
        # a marker from a DIFFERENT corpus or modality must not satisfy
        # the resume — re-threshold reuse is only valid over the same
        # persisted signatures.  An ABSENT input (idig == "") is the
        # legitimate re-threshold case: the operator reruns over the
        # persisted store with the payload corpus gone (pinned by
        # test_media_job_resume_skips_kernel)
        if (sig_meta.get("modality") != modality
                or (idig and sig_meta.get("input_digest") != idig)):
            sig_meta = None
    if sig_meta is not None:
        t_sig = 0.0
    else:
        import shutil

        # invalidate the done-marker BEFORE touching the store: a crash
        # between the rmtree and the marker rewrite would otherwise leave
        # a stale marker beside a missing/partial store, and the next
        # resume run would silently skip the kernel over truncated data
        if os.path.exists(marker):
            os.remove(marker)
        for d in (sig_dir, dead_dir):   # write_parquet appends: reruns
            shutil.rmtree(d, ignore_errors=True)   # must not accumulate
        sigs = kernel(dio.read_parquet(input_dir,
                                       columns=[id_col, "bytes"]))
        sigs = sigs.materialize()   # kernel runs once, feeds two writes
        ok = sigs.map_batches(
            lambda t: t.filter(pc.equal(t["status"], "ok")),
            batch_format="pyarrow")
        dead = sigs.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["status"], "ok"))),
            batch_format="pyarrow")
        ok.write_parquet(sig_dir)
        dead.write_parquet(dead_dir)
        sig_meta = {"n_sig_rows": ok.count(), "n_dead": dead.count(),
                    "input_digest": idig, "modality": modality}
        with open(marker, "w") as f:
            json.dump(sig_meta, f)
        t_sig = round(time.time() - t0, 3)

    # pairs + clusters from the PERSISTED signatures (narrow columns;
    # a re-threshold run re-reads these, never the payloads)
    t1 = time.time()
    import shutil as _sh

    _sh.rmtree(os.path.join(output_dir, "pairs"), ignore_errors=True)
    _sh.rmtree(os.path.join(output_dir, "clusters"), ignore_errors=True)
    live = dio.read_parquet(sig_dir, columns=[id_col, fp_col])
    pairs = fp_dup_pairs(live, id_col=id_col, fp_col=fp_col,
                         out_a=f"{id_col}_a", out_b=f"{id_col}_b",
                         tau_e6=tau, max_fp_df=cap).materialize()
    pairs.write_parquet(os.path.join(output_dir, "pairs"))
    n_pairs = pairs.count()
    t_pairs = round(time.time() - t1, 3)

    # clusters = CC over the ALREADY-materialized pair table — not a
    # second run of the 3-round pair machinery
    t2 = time.time()
    from deduplicator_ray.stages.fpsets import (
        fp_clusters_from_pairs,
        fp_dedup_tiers,
        fp_tier_report,
    )

    clusters = fp_clusters_from_pairs(
        pairs, id_col=id_col,
        a_col=f"{id_col}_a", b_col=f"{id_col}_b").materialize()
    clusters.write_parquet(_fresh(os.path.join(output_dir, "clusters")))
    n_clustered = clusters.count()
    t_cc = round(time.time() - t2, 3)

    # tier cascade from the SAME persisted signatures and the SAME cluster
    # labels (md5 rides the kernel rows, so byte/fpset/near classify
    # without re-decoding OR re-clustering; an old signature store without
    # the md5 column skips tiers gracefully)
    t3 = time.time()
    tier_hist: dict[str, int] = {}
    import glob

    import pyarrow.parquet as _pq

    sig_files = sorted(glob.glob(os.path.join(sig_dir, "*.parquet")))
    if sig_files and "md5" in _pq.read_schema(sig_files[0]).names:
        _sh.rmtree(os.path.join(output_dir, "tiers"), ignore_errors=True)
        live3 = dio.read_parquet(sig_dir, columns=[id_col, fp_col, "md5"])
        tiers = fp_dedup_tiers(live3, id_col=id_col, fp_col=fp_col,
                               tau_e6=tau, max_fp_df=cap,
                               labels=clusters).materialize()
        tiers.write_parquet(os.path.join(output_dir, "tiers"))
        rep = fp_tier_report(tiers, "n")
        tier_hist = {str(k): int(v)
                     for k, v in zip(rep["tier"], rep["n"])}
    t_tiers = round(time.time() - t3, 3)

    report = {"modality": modality, "tau_e6": tau, "max_fp_df": cap,
              **sig_meta, "n_pairs": n_pairs, "n_clustered": n_clustered,
              "tier_hist": tier_hist,
              "sig_resumed": t_sig == 0.0,
              "wall_signatures_s": t_sig, "wall_pairs_s": t_pairs,
              "wall_clusters_s": t_cc, "wall_tiers_s": t_tiers}
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="deduplicator_ray.cli")
    p.add_argument("mode", choices=["reference", "extended",
                                    "bloom-build", "bloom-probe",
                                    "band-build", "band-probe",
                                    "band-append", "band-prune",
                                    "srp-build", "srp-probe", "srp-append",
                                    "docband-build", "docband-probe",
                                    "docband-append",
                                    "cont-build", "cont-probe",
                                    "cont-append", "curate",
                                    "img-curate", "tiers", "prune",
                                    "vid-dedup", "aud-dedup",
                                    "ingest-init", "ingest"])
    p.add_argument("--input", help="directory of input parquet shards "
                   "(all modes except prune)")
    p.add_argument("--output", help="output directory for artifacts "
                   "(required for all modes except bloom-build)")
    p.add_argument("--no-resume", action="store_true",
                   help="recompute everything (skip shard checkpoints)")
    p.add_argument("--input-format", choices=["table", "files"],
                   default="table",
                   help="'table' = parquet/lance shards (default); 'files' "
                        "= a raw directory tree of image files (the "
                        "reference's --scanfiles mode; no shard resume)")
    p.add_argument("--hash-size", type=int, default=8,
                   help="dHash size (the reference default is 12; 8 packs int64)")
    p.add_argument("--files-exempt", action="append", default=[],
                   help="drop ids containing this substring (repeatable)")
    p.add_argument("--threshold", type=int, default=2,
                   help="min bucket size to report (reference threshhold)")
    p.add_argument("--explain", action="store_true",
                   help="attach explainSort ranking text to keeper rows")
    p.add_argument("--unsupported-codec-policy", default="md5",
                   choices=["md5", "dead_letter"],
                   help="stub-codec formats (jpg/video/audio): join the md5 "
                        "keyspace (reference parity) or dead-letter with "
                        "error=unsupported_codec")
    p.add_argument("--good-dirs", action="append", default=[])
    p.add_argument("--bad-dirs", action="append", default=[])
    p.add_argument("--good-names", action="append", default=[])
    p.add_argument("--bad-names", action="append", default=[])
    p.add_argument("--index", help="Bloom index directory (bloom-* modes)")
    p.add_argument("--key-col", default="proc_hash",
                   help="content-key column for bloom-* modes")
    p.add_argument("--num-parts", type=int, default=64,
                   help="index partition count (bloom-build)")
    p.add_argument("--bloom-shuffle", action="store_true",
                   help="hash-partition the probe side (oversize filters)")
    p.add_argument("--clusters", help="persisted assignment parquet (prune)")
    p.add_argument("--edges", help="persisted verified-edge parquet (prune)")
    p.add_argument("--removed-input",
                   help="parquet of retired ids (prune / band-prune; "
                        "column --id-col)")
    p.add_argument("--state", help="persisted ingest state directory "
                   "(ingest-init / ingest)")
    p.add_argument("--no-fold-state", action="store_true",
                   help="ingest: skip the final state fold (dry run)")
    p.add_argument("--id-col", default="image_id",
                   help="id column in --removed-input (prune / band-prune)")
    a = p.parse_args(argv)
    if a.mode == "prune":
        if not (a.clusters and a.edges and a.removed_input and a.output):
            p.error("prune requires --clusters --edges --removed-input --output")
        print(json.dumps(run_prune(a.clusters, a.edges, a.removed_input,
                                   a.output, id_col=a.id_col)))
        return
    if a.mode == "band-prune":
        if not (a.index and a.removed_input):
            p.error("band-prune requires --index --removed-input")
        print(json.dumps(run_band_prune(a.index, a.removed_input,
                                        hash_size=a.hash_size,
                                        id_col=a.id_col)))
        return
    if not a.input:
        p.error(f"{a.mode} requires --input")
    if a.mode in ("bloom-build", "bloom-probe", "band-build",
                  "band-probe", "band-append",
                  "srp-build", "srp-probe", "srp-append",
                  "docband-build", "docband-probe",
                  "docband-append", "cont-build", "cont-probe",
                  "cont-append") and not a.index:
        p.error(f"{a.mode} requires --index")
    if (a.mode not in ("bloom-build", "band-build", "band-append",
                       "srp-build", "srp-append",
                       "docband-build", "docband-append",
                       "cont-build", "cont-append", "ingest-init")
            and not a.output):
        p.error(f"{a.mode} requires --output")
    if a.mode == "ingest-init":
        if not (a.input and a.state):
            p.error("ingest-init requires --input --state")
        print(json.dumps(run_ingest_init(a.input, a.state, a.num_parts,
                                         hash_size=a.hash_size)))
        return
    if a.mode == "ingest":
        if not (a.input and a.state and a.output):
            p.error("ingest requires --input --state --output")
        print(json.dumps(run_ingest(a.input, a.state, a.output,
                                    resume=not a.no_resume,
                                    hash_size=a.hash_size,
                                    fold_state=not a.no_fold_state)))
        return
    if a.mode == "bloom-build":
        print(json.dumps(run_bloom_build(a.input, a.index, a.key_col,
                                         a.num_parts)))
        return
    if a.mode == "bloom-probe":
        print(json.dumps(run_bloom_probe(a.input, a.index, a.key_col,
                                         a.output, shuffle=a.bloom_shuffle)))
        return
    if a.mode == "band-build":
        print(json.dumps(run_band_build(a.input, a.index, a.num_parts,
                                        hash_size=a.hash_size)))
        return
    if a.mode == "band-probe":
        print(json.dumps(run_band_probe(a.input, a.index, a.output,
                                        hash_size=a.hash_size)))
        return
    if a.mode == "band-append":
        print(json.dumps(run_band_append(a.input, a.index,
                                         hash_size=a.hash_size)))
        return
    if a.mode == "srp-build":
        print(json.dumps(run_srp_build(a.input, a.index, a.num_parts)))
        return
    if a.mode == "srp-probe":
        print(json.dumps(run_srp_probe(a.input, a.index, a.output)))
        return
    if a.mode == "srp-append":
        print(json.dumps(run_srp_append(a.input, a.index)))
        return
    if a.mode == "docband-build":
        print(json.dumps(run_docband_build(a.input, a.index, a.num_parts)))
        return
    if a.mode == "docband-probe":
        print(json.dumps(run_docband_probe(a.input, a.index, a.output)))
        return
    if a.mode == "docband-append":
        print(json.dumps(run_docband_append(a.input, a.index)))
        return
    if a.mode == "cont-build":
        print(json.dumps(run_cont_build(a.input, a.index, a.num_parts)))
        return
    if a.mode == "cont-probe":
        print(json.dumps(run_cont_probe(a.input, a.index, a.output)))
        return
    if a.mode == "cont-append":
        print(json.dumps(run_cont_append(a.input, a.index)))
        return
    if a.mode == "curate":
        print(json.dumps(run_curate(a.input, a.output)))
        return
    if a.mode in ("vid-dedup", "aud-dedup"):
        print(json.dumps(run_media_dedup(
            a.input, a.output,
            "video" if a.mode == "vid-dedup" else "audio",
            resume=not a.no_resume)))
        return
    if a.mode == "img-curate":
        print(json.dumps(run_img_curate(a.input, a.output,
                                        hash_size=a.hash_size)))
        return
    if a.mode == "tiers":
        if not (a.input and a.output):
            p.error("tiers requires --input --output")
        print(json.dumps(run_tiers(a.input, a.output,
                                   hash_size=a.hash_size)))
        return
    m = run(a.mode, a.input, a.output, resume=not a.no_resume,
            hash_size=a.hash_size, files_exempt=tuple(a.files_exempt),
            threshold=a.threshold, explain=a.explain,
            input_format=a.input_format,
            good_words=tuple(a.good_dirs), bad_words=tuple(a.bad_dirs),
            good_names=tuple(a.good_names), bad_names=tuple(a.bad_names),
            codec_policy=a.unsupported_codec_policy)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
