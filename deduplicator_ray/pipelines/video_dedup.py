"""Video near-duplicate detection over frame fingerprints.

The reference treats video byte-exactly (md5 into the shared hash→paths
index, /root/reference/dupedb.py:92-101).  This module is the engine's
training-data extension of that idea to FRAME-level near-dup: re-encodes,
clips and teasers of the same footage share scene frames.  The modality
kernel here is parse container → decode frames → dHash each frame (actor
pool, payload bytes never leave the stage); everything downstream —
distinct (video_id, frame_fp), stop-frame df cap, pair emission, exact
Jaccard ≥ tau, connected components — is the generic fingerprint-SET
machinery in ``stages/fpsets.py`` (shared with the audio family; scale
notes live there).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduplicator_ray import codecs, hashing, tuning
from deduplicator_ray.stages.fpsets import fp_clusters, fp_dup_pairs

TAU_E6_DEFAULT = 500_000          # Jaccard >= 0.5
MAX_FP_DF_DEFAULT = 32            # stop-frame document-frequency cap

FRAME_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("frame_idx", pa.int32()),
    ("frame_fp", pa.int64()),
    ("status", pa.string()),
])

PAIR_SCHEMA = pa.schema([
    ("video_id_a", pa.string()),
    ("video_id_b", pa.string()),
    ("n_shared", pa.int64()),
    ("size_a", pa.int64()),
    ("size_b", pa.int64()),
    ("jaccard_e6", pa.int64()),
])


class VideoFrames:
    """Actor-pool frame-fingerprint stage: (video_id, bytes) → one row per
    frame (video_id, frame_idx, frame_fp, 'ok'); a corrupt container emits
    ONE dead-letter row (frame_idx=-1, status='error:...') so the badfiles
    taxonomy matches the image decode stage.  Decoder state would load in
    __init__ in a real deployment; payload bytes never leave this stage."""

    def __init__(self, hash_size: int = 8):
        if hash_size != 8:
            # frame fps are 64-bit dHashes by schema (frame_fp:int64);
            # fail at construction with a clear error instead of an
            # AssertionError inside a Ray task
            raise ValueError(
                f"video frame hashing is 64-bit only (hash_size=8), "
                f"got {hash_size}")
        self.hash_size = hash_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, fps, sts = [], [], [], []
        for vid, blob in zip(batch["video_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            try:
                frames = codecs.decode_vcon(blob)
                row = [hashing.dhash_u64(
                    codecs.decode_image(f, "png", 0, 0), self.hash_size)
                    for f in frames]
            except codecs.CodecError as e:
                ids.append(vid)
                idxs.append(-1)
                fps.append(0)
                sts.append(f"error:{type(e).__name__}: {e}")
                continue
            if not row:
                # decodable but ZERO frames: un-fingerprintable media must
                # be VISIBLY quarantined (badfiles taxonomy), never
                # silently absent from tiers/weights/splits
                ids.append(vid)
                idxs.append(-1)
                fps.append(0)
                sts.append("error:EmptyMedia: container holds no frames")
                continue
            for j, fp in enumerate(row):
                ids.append(vid)
                idxs.append(j)
                fps.append(fp)
                sts.append("ok")
        return pa.Table.from_pydict(
            {"video_id": ids, "frame_idx": idxs,
             "frame_fp": np.asarray(fps, np.uint64).view(np.int64),
             "status": sts},
            schema=FRAME_SCHEMA)


def load_videos(sf_dir: str) -> rd.Dataset:
    from deduplicator_ray import fixtures

    return rd.read_parquet(
        os.path.join(fixtures.videos_path(sf_dir), "videos.parquet"),
        columns=["video_id", "bytes"])


def video_frames(videos: rd.Dataset, hash_size: int = 8) -> rd.Dataset:
    return videos.map_batches(
        VideoFrames,
        fn_constructor_kwargs={"hash_size": hash_size},
        batch_format="pyarrow",
        batch_size=32,               # payloads are large; keep batches small
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )


def _live_fps(frames: rd.Dataset) -> rd.Dataset:
    return frames.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["video_id", "frame_fp"]),
        batch_format="pyarrow")


def video_dup_pairs(
    frames: rd.Dataset,
    tau_e6: int = TAU_E6_DEFAULT,
    max_fp_df: int = MAX_FP_DF_DEFAULT,
    num_parts: int = 64,
) -> rd.Dataset:
    """Frame rows → verified near-dup pair table (exact Jaccard over the
    stop-frame-capped fp sets, fixed-point e6 for hash-stable output)."""
    return fp_dup_pairs(
        _live_fps(frames), id_col="video_id", fp_col="frame_fp",
        out_a="video_id_a", out_b="video_id_b",
        tau_e6=tau_e6, max_fp_df=max_fp_df, num_parts=num_parts)


def video_clusters(frames: rd.Dataset,
                   tau_e6: int = TAU_E6_DEFAULT,
                   max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Near-dup pairs → connected components → (video_id, cluster_id)."""
    return fp_clusters(
        _live_fps(frames), id_col="video_id", fp_col="frame_fp",
        tau_e6=tau_e6, max_fp_df=max_fp_df)


def video_sample_weights(frames: rd.Dataset,
                         tau_e6: int = TAU_E6_DEFAULT,
                         max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Dedup-aware sampling weights over the video corpus: every decodable
    video weighs 1e6 // its near-dup family size (the video twin of
    img_sample_weights — same shared reducers via stages/fpsets)."""
    from deduplicator_ray.stages.fpsets import fp_sample_weights

    return fp_sample_weights(
        _live_fps(frames), id_col="video_id", fp_col="frame_fp",
        tau_e6=tau_e6, max_fp_df=max_fp_df)


def video_leakage_split(frames: rd.Dataset, train_pct: int = 90,
                        tau_e6: int = TAU_E6_DEFAULT,
                        max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Near-dup-aware train/val split over the video corpus: all members
    of a frame-Jaccard component land on one side of the boundary."""
    from deduplicator_ray.stages.fpsets import fp_leakage_split

    return fp_leakage_split(
        _live_fps(frames), id_col="video_id", fp_col="frame_fp",
        tau_e6=tau_e6, max_fp_df=max_fp_df, train_pct=train_pct)


# ---------------------------------------------------------------------------
# Tiered duplicate classification (the tier-dedup cascade over videos):
# byte identity → frame-fingerprint-SET identity → Jaccard near-dup →
# unique, cheapest binding tier wins (stages/fpsets.identity_tiers; the
# video analog of image_dedup.img_dedup_tiers).  One decode pass emits
# frame rows WITH the payload md5, so byte/fpset/near all derive from a
# single scan of the payload bytes.

TIER_FRAME_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("frame_idx", pa.int32()),
    ("frame_fp", pa.int64()),
    ("status", pa.string()),
    ("md5", pa.string()),
])


class VideoFramesMd5(VideoFrames):
    """VideoFrames plus the payload md5 on every frame row — the byte-tier
    key rides the same single decode pass (payloads are read once)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduplicator_ray import hashing as _h

        base = super().__call__(
            batch.select(["video_id", "bytes"]))
        # null payload (failed download): the base pass already emitted
        # its dead-letter row — md5 of None must not kill the batch
        md5s = {vid: ("" if blob is None else _h.md5_hex(blob))
                for vid, blob in zip(batch["video_id"].to_pylist(),
                                     batch["bytes"].to_pylist())}
        col = pa.array([md5s[v] for v in base["video_id"].to_pylist()],
                       pa.string())
        return base.append_column("md5", col).cast(TIER_FRAME_SCHEMA)


def video_tier_frames(videos: rd.Dataset, hash_size: int = 8) -> rd.Dataset:
    return videos.map_batches(
        VideoFramesMd5,
        fn_constructor_kwargs={"hash_size": hash_size},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )


def video_dedup_tiers(frames_md5: rd.Dataset,
                      tau_e6: int = TAU_E6_DEFAULT,
                      max_fp_df: int = MAX_FP_DF_DEFAULT,
                      num_parts: int = 64) -> rd.Dataset:
    """(video_id, tier, dup_of) per decodable video (the generic
    stages/fpsets.fp_dedup_tiers cascade over the frame-fp relation)."""
    from deduplicator_ray.stages.fpsets import fp_dedup_tiers

    live = frames_md5.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["video_id", "frame_fp", "md5"]),
        batch_format="pyarrow")
    return fp_dedup_tiers(live, id_col="video_id", fp_col="frame_fp",
                          tau_e6=tau_e6, max_fp_df=max_fp_df,
                          num_parts=num_parts)


def video_dedup_tiers_report(frames_md5: rd.Dataset,
                             tau_e6: int = TAU_E6_DEFAULT,
                             max_fp_df: int = MAX_FP_DF_DEFAULT,
                             num_parts: int = 64):
    """Per-tier rollup: (tier, n_videos) — marginal yield of each tier."""
    from deduplicator_ray.stages.fpsets import fp_tier_report

    return fp_tier_report(
        video_dedup_tiers(frames_md5, tau_e6, max_fp_df, num_parts),
        "n_videos")
