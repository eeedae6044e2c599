"""Per-partition lineage manifests + checkpoint/resume (north-rule requirement).

The reference's only resume mechanism is the known-paths anti-join — a
re-run skips files already in the JSON store (/root/reference/dupedb.py:
190-194, 271-274) at chunk granularity (dupedb.py:278-294).  This module
generalizes that to partition-granular, config-aware checkpointing:

- the expensive stage (decode+fingerprint) is checkpointed per INPUT SHARD:
  each input parquet file maps to one output directory written atomically
  (tmp + rename) plus a manifest row
  ``(stage, shard, input_digest, config_hash, row_count, n_errors, wall_s)``;
- resume = skip shards whose manifest matches the current config hash and
  input digest — a changed config or mutated input invalidates exactly the
  affected shards (the reference's ``--recheck`` flag generalized);
- downstream stages (grouping, verify, CC, resolve) read the checkpoint
  dataset and re-run — they are orders of magnitude cheaper than decode and
  re-running them keeps their logic side-effect-free and retry-safe.

At cluster scale the shard loop submits waves of independent shard jobs (a
shard's pipeline is internally parallel over blocks); the manifest directory
is the source of truth for completed work, not any in-memory state.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray import io as dio

from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.stages.decode_hash import make_decode_hash

STAGE_FINGERPRINT = "fingerprint"


def shard_digest(path: str) -> str:
    # nanosecond mtime: whole-second truncation let a same-size shard
    # rewritten within one second resume STALE (the exact staleness the
    # manifest exists to catch)
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def _manifest_path(ckpt_dir: str, shard_name: str) -> str:
    return os.path.join(ckpt_dir, "_manifests", f"{shard_name}.json")


def load_manifest(ckpt_dir: str, shard_name: str) -> dict | None:
    p = _manifest_path(ckpt_dir, shard_name)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def completed_shards(ckpt_dir: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "_manifests", "*.json"))):
        try:
            with open(p) as f:
                out.append(json.load(f))
        except (OSError, json.JSONDecodeError):
            continue
    return out


def checkpoint_fingerprints(
    images_dir: str,
    ckpt_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_shards: int | None = None,
) -> rd.Dataset:
    """Process every input shard not already checkpointed; return the full
    fingerprint dataset (completed + newly computed shards).

    ``max_shards`` limits how many *missing* shards are processed this call
    (used by the kill-and-resume test to simulate a crash mid-run)."""
    os.makedirs(os.path.join(ckpt_dir, "_manifests"), exist_ok=True)
    cfg_hash = cfg.config_hash()
    shards = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    if not shards:
        raise FileNotFoundError(f"no parquet shards under {images_dir}")

    decode = make_decode_hash(cfg)
    out_dirs: list[str] = []
    processed = 0
    for shard in shards:
        name = os.path.splitext(os.path.basename(shard))[0]
        out_dir = os.path.join(ckpt_dir, name)
        man = load_manifest(ckpt_dir, name)
        digest = shard_digest(shard)
        if (
            man
            and man.get("config_hash") == cfg_hash
            and man.get("input_digest") == digest
            and man.get("status") == "ok"
            and os.path.isdir(out_dir)
        ):
            out_dirs.append(out_dir)
            continue  # resume: shard already done under this config+input
        if max_shards is not None and processed >= max_shards:
            continue
        t0 = time.time()
        ds = dio.read_parquet(shard).map_batches(
            decode, batch_format="pyarrow", batch_size=cfg.decode_batch_size
        )
        tmp = out_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ds.write_parquet(tmp)
        n_rows = dio.read_parquet(tmp).count()
        n_err = dio.read_parquet(tmp).map_batches(
            lambda t: t.filter(pc.equal(t["status"], "error")), batch_format="pyarrow"
        ).count()
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
        with open(_manifest_path(ckpt_dir, name), "w") as f:
            json.dump(
                {
                    "stage": STAGE_FINGERPRINT,
                    "shard": name,
                    "input_digest": digest,
                    "config_hash": cfg_hash,
                    "row_count": int(n_rows),
                    "n_errors": int(n_err),
                    "wall_s": round(time.time() - t0, 3),
                    "status": "ok",
                },
                f,
            )
        out_dirs.append(out_dir)
        processed += 1

    if not out_dirs:
        raise RuntimeError("no shards completed yet (max_shards=0?)")
    # read_parquet expands a single directory but not a LIST of directories —
    # enumerate the shard files explicitly
    files = sorted(
        f for d in out_dirs for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    return dio.read_parquet(files)


def write_stage_manifest(out_dir: str, stage: str, cfg: PipelineConfig,
                         metrics: dict) -> None:
    """Stage-level metrics manifest (counts, overflow stats, wall time)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"_{stage}_manifest.json"), "w") as f:
        json.dump({"stage": stage, "config_hash": cfg.config_hash(), **metrics}, f)
