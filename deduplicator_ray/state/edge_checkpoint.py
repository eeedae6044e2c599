"""Per-partition checkpointing of the banding+verify stage (north-rule:
resume "without recomputing completed band buckets").

The LSH band space is hash-partitioned into ``n_partitions`` key ranges
(the same ``hash(band, key) % P`` refinement the verify shuffle uses — a
partition holds complete band buckets, never a fragment of one).  Each
partition runs as its own small Ray Data job over the checkpointed
fingerprint dataset, writes its verified edges atomically (tmp + rename)
and records a manifest row ``(stage, partition, config_hash, input_digest,
n_edges, n_overflow, wall_s)``.  A resumed run skips partitions whose
manifest matches the current config hash and fingerprint-checkpoint digest
— completed band buckets are never recomputed.

At cluster scale the partition loop submits waves of independent jobs;
here it runs sequentially (each partition's pipeline is internally
parallel over blocks).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray import io as dio

from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.stages.banding import make_banding
from deduplicator_ray.stages.candidates import (
    VERIFY_SCHEMA,
    make_partition_verify,
)
from deduplicator_ray.stages.partitioned import _hash_cols, partitioned_groupby
from deduplicator_ray.stages.signatures import CaptionSignatures

STAGE_EDGES = "band_verify"


def _manifest_path(ckpt_dir: str, part: int) -> str:
    return os.path.join(ckpt_dir, "_manifests", f"part-{part:04d}.json")


def _load(ckpt_dir: str, part: int) -> dict | None:
    try:
        with open(_manifest_path(ckpt_dir, part)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def fingerprint_digest(fp_ckpt_dir: str) -> str:
    """Digest of the fingerprint checkpoint this edge stage consumes:
    the sorted (shard, input_digest) pairs of its manifests."""
    rows = []
    for p in sorted(glob.glob(os.path.join(fp_ckpt_dir, "_manifests", "*.json"))):
        try:
            with open(p) as f:
                m = json.load(f)
            rows.append(f"{m['shard']}:{m['input_digest']}")
        except (OSError, json.JSONDecodeError, KeyError):
            continue
    import hashlib

    return hashlib.sha256("|".join(rows).encode()).hexdigest()[:16]


def checkpoint_verified_edges(
    fp: rd.Dataset,
    ckpt_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    n_partitions: int = 8,
    input_digest: str = "",
    max_partitions: int | None = None,
    require_complete: bool = True,
) -> rd.Dataset:
    """Compute verified near-dup edges partition-by-partition with resume.

    ``fp`` must be a re-readable (checkpointed/materialized) live
    fingerprint dataset — each missing partition re-consumes it.  Returns
    the union of the COMPLETED partitions' edge datasets (including
    overflow stats rows, src == '').

    ``require_complete`` (default True): raise if fewer than
    ``n_partitions`` partitions are complete — a silently partial edge set
    fed to connected_components yields incomplete clusters with no error.
    An incremental caller (checkpoint-as-you-go waves via
    ``max_partitions``) must opt in to the partial view explicitly with
    ``require_complete=False``.
    """
    os.makedirs(os.path.join(ckpt_dir, "_manifests"), exist_ok=True)
    cfg_hash = cfg.config_hash()

    def band_rows_lazy():
        sigs = fp.map_batches(CaptionSignatures(cfg), batch_format="pyarrow",
                              batch_size=cfg.text_batch_size)
        return sigs.map_batches(make_banding(cfg, ("img", "cap")),
                                batch_format="pyarrow",
                                batch_size=cfg.text_batch_size)

    # signatures + banding run ONCE into a parquet sidecar; each missing
    # partition reads it with its bucket filter.  Without this, a fresh
    # run re-MinHashes and re-bands the full corpus once per partition
    # (n_partitions× the dominant signature cost).  The sidecar is
    # stamped (config + input) and rebuilt when either changes.
    sidecar = os.path.join(ckpt_dir, "_band_rows")
    stamp = os.path.join(ckpt_dir, "_band_rows_stamp.json")

    def band_rows():
        good = False
        try:
            with open(stamp) as f:
                st = json.load(f)
            good = (st.get("config_hash") == cfg_hash
                    and st.get("input_digest") == input_digest
                    and os.path.isdir(sidecar))
        except (OSError, json.JSONDecodeError):
            pass
        if not good:
            if os.path.exists(stamp):
                os.remove(stamp)
            shutil.rmtree(sidecar, ignore_errors=True)
            band_rows_lazy().write_parquet(sidecar)
            with open(stamp, "w") as f:
                json.dump({"config_hash": cfg_hash,
                           "input_digest": input_digest}, f)
        files = sorted(glob.glob(os.path.join(sidecar, "*.parquet")))
        if not files:  # zero-row corpus: nothing was written
            return band_rows_lazy()
        return dio.read_parquet(files)

    done_dirs: list[str] = []
    processed = 0
    for part in range(n_partitions):
        out_dir = os.path.join(ckpt_dir, f"part-{part:04d}")
        man = _load(ckpt_dir, part)
        if (man and man.get("config_hash") == cfg_hash
                and man.get("input_digest") == input_digest
                # n_partitions determines WHICH buckets a part-NNNN dir
                # holds (hash % n_partitions == p): a resume with a
                # different count would silently reuse dirs covering the
                # wrong half of the band space and still report complete
                and man.get("n_partitions") == n_partitions
                and man.get("status") == "ok" and os.path.isdir(out_dir)):
            done_dirs.append(out_dir)
            continue  # resume: this band-bucket partition is complete
        if max_partitions is not None and processed >= max_partitions:
            continue
        t0 = time.time()

        def this_part(t: pa.Table, _p=part) -> pa.Table:
            sel = (_hash_cols(t, ["band", "key"]) % np.uint64(n_partitions)
                   ).astype(np.int64) == _p
            return t.filter(pa.array(sel))

        edges = partitioned_groupby(
            band_rows().map_batches(this_part, batch_format="pyarrow"),
            ["band", "key"], make_partition_verify(cfg), num_parts=4,
            # typed empty blocks: an EMPTY band partition must checkpoint
            # as n_edges=0, not write zero parquet files and crash the
            # immediate read-back
            out_schema=VERIFY_SCHEMA, fmt="pyarrow",
        )
        tmp = out_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        edges.write_parquet(tmp)
        back = dio.read_parquet(tmp)
        n_rows = back.count()
        n_over = back.map_batches(
            lambda t: t.filter(pc.equal(t["src"], "")), batch_format="pyarrow"
        ).count()
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
        with open(_manifest_path(ckpt_dir, part), "w") as f:
            json.dump({
                "stage": STAGE_EDGES,
                "partition": part,
                "n_partitions": n_partitions,
                "config_hash": cfg_hash,
                "input_digest": input_digest,
                "n_edges": int(n_rows - n_over),
                "n_overflow": int(n_over),
                "wall_s": round(time.time() - t0, 3),
                "status": "ok",
            }, f)
        done_dirs.append(out_dir)
        processed += 1

    if not done_dirs:
        raise RuntimeError("no edge partitions completed yet (max_partitions=0?)")
    if require_complete and len(done_dirs) < n_partitions:
        raise RuntimeError(
            f"only {len(done_dirs)}/{n_partitions} edge partitions complete — "
            "pass require_complete=False to consume the partial edge set "
            "(downstream clusters would silently be incomplete)")
    files = sorted(f for d in done_dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    return dio.read_parquet(files)


def completed_partitions(ckpt_dir: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "_manifests", "*.json"))):
        try:
            with open(p) as f:
                out.append(json.load(f))
        except (OSError, json.JSONDecodeError):
            continue
    return out
