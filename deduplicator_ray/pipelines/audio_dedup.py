"""Audio near-duplicate detection over waveform fingerprints.

The reference treats audio byte-exactly (md5 into the shared hash→paths
index alongside animations/videos, /root/reference/dupedb.py:92-101).
This module is the engine's training-data extension of that idea to
WAVEFORM-level near-dup: lossless re-encodes, clips and teasers of the
same recording share acoustic windows.

The modality kernel is the classic band-energy sign fingerprint
(Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System",
ISMIR 2002 — public literature): per window of ``WINDOW`` samples,
compute the power spectrum, sum it into ``N_BANDS + 1`` contiguous
bands, and emit one bit per adjacent-band comparison
``E[b] > E[b+1]`` — 32 bits packed into one sub-fingerprint per
window.  Band-energy ORDER is invariant under uniform gain (scaling
every sample by g scales every band energy by g²), so the fingerprint
survives loudness normalization, and it is trivially invariant under
lossless container re-encoding.  The kernel runs vectorized over all
windows of a waveform at once (one rfft + one reduceat, no per-window
Python).

Everything downstream — distinct (audio_id, win_fp), stop-fp df cap
(a silence window shared by millions of recordings is evidence of
NOTHING), pair emission, exact Jaccard ≥ tau, connected components —
is the generic fingerprint-SET machinery in ``stages/fpsets.py``
(shared with the video family; scale notes live there).  Payload bytes
never leave the signature stage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduplicator_ray import codecs, tuning
from deduplicator_ray.stages.fpsets import fp_clusters, fp_dup_pairs

TAU_E6_DEFAULT = 500_000          # Jaccard >= 0.5
MAX_FP_DF_DEFAULT = 32            # stop-fp document-frequency cap

WINDOW = 2048                     # samples per fingerprint window
N_BANDS = 32                      # bits per window fp (N_BANDS+1 bands)

SIG_SCHEMA = pa.schema([
    ("audio_id", pa.string()),
    ("win_idx", pa.int32()),
    ("win_fp", pa.int64()),
    ("status", pa.string()),
])

PAIR_SCHEMA = pa.schema([
    ("audio_id_a", pa.string()),
    ("audio_id_b", pa.string()),
    ("n_shared", pa.int64()),
    ("size_a", pa.int64()),
    ("size_b", pa.int64()),
    ("jaccard_e6", pa.int64()),
])

# band boundaries over the positive-frequency bins (DC excluded): the
# boundaries are fixed by (WINDOW, N_BANDS) alone, so engine and oracle
# recompute byte-identical fps
_BAND_EDGES = np.linspace(1, WINDOW // 2 + 1, N_BANDS + 2).astype(np.int64)
_BIT_WEIGHTS = (1 << np.arange(N_BANDS, dtype=np.uint64))


def audio_window_fps(samples: np.ndarray) -> np.ndarray:
    """int16 mono PCM → one uint32-valued fp per full WINDOW-sample
    window (tail remainder dropped), returned as int64.  Vectorized:
    one rfft over the (n_win, WINDOW) matrix, one reduceat for band
    energies, one comparison + matmul for bit packing."""
    n_win = len(samples) // WINDOW
    if n_win == 0:
        return np.empty(0, np.int64)
    w = samples[:n_win * WINDOW].astype(np.float64).reshape(n_win, WINDOW)
    spec = np.abs(np.fft.rfft(w, axis=1)) ** 2
    bands = np.add.reduceat(spec, _BAND_EDGES[:-1], axis=1)
    bits = bands[:, :-1] > bands[:, 1:]                # (n_win, N_BANDS)
    return (bits.astype(np.uint64) @ _BIT_WEIGHTS).astype(np.int64)


class AudioSignatures:
    """Actor-pool fingerprint stage: (audio_id, bytes) → one row per
    window (audio_id, win_idx, win_fp, 'ok'); a corrupt container emits
    ONE dead-letter row (win_idx=-1, status='error:...') so the badfiles
    taxonomy matches the image/video decode stages.  Decoder state would
    load in __init__ in a real deployment; payload bytes never leave
    this stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, fps, sts = [], [], [], []
        for aid, blob in zip(batch["audio_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            try:
                # magic-byte dispatch: acon fixture container or real
                # RIFF/WAVE (stdlib wave decode — codecs.decode_audio)
                _rate, pcm = codecs.decode_audio(blob)
                row = audio_window_fps(pcm)
            except codecs.CodecError as e:
                ids.append(aid)
                idxs.append(-1)
                fps.append(0)
                sts.append(f"error:{type(e).__name__}: {e}")
                continue
            if not len(row):
                # decodable but shorter than one fingerprint window:
                # quarantine visibly (badfiles taxonomy) instead of
                # silently vanishing from tiers/weights/splits
                ids.append(aid)
                idxs.append(-1)
                fps.append(0)
                sts.append("error:EmptyMedia: shorter than one window")
                continue
            ids.extend([aid] * len(row))
            idxs.extend(range(len(row)))
            fps.extend(row.tolist())
            sts.extend(["ok"] * len(row))
        return pa.Table.from_pydict(
            {"audio_id": ids, "win_idx": idxs,
             "win_fp": np.asarray(fps, np.int64),
             "status": sts},
            schema=SIG_SCHEMA)


def load_audios(sf_dir: str) -> rd.Dataset:
    from deduplicator_ray import fixtures

    return rd.read_parquet(
        os.path.join(fixtures.audios_path(sf_dir), "audios.parquet"),
        columns=["audio_id", "bytes"])


def audio_signatures(audios: rd.Dataset) -> rd.Dataset:
    return audios.map_batches(
        AudioSignatures,
        batch_format="pyarrow",
        batch_size=32,               # payloads are large; keep batches small
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )


def _live_fps(sigs: rd.Dataset) -> rd.Dataset:
    return sigs.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["audio_id", "win_fp"]),
        batch_format="pyarrow")


def audio_dup_pairs(
    sigs: rd.Dataset,
    tau_e6: int = TAU_E6_DEFAULT,
    max_fp_df: int = MAX_FP_DF_DEFAULT,
    num_parts: int = 64,
) -> rd.Dataset:
    """Signature rows → verified near-dup pair table (exact Jaccard over
    the stop-fp-capped window-fp sets, fixed-point e6)."""
    return fp_dup_pairs(
        _live_fps(sigs), id_col="audio_id", fp_col="win_fp",
        out_a="audio_id_a", out_b="audio_id_b",
        tau_e6=tau_e6, max_fp_df=max_fp_df, num_parts=num_parts)


def audio_clusters(sigs: rd.Dataset,
                   tau_e6: int = TAU_E6_DEFAULT,
                   max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Near-dup pairs → connected components → (audio_id, cluster_id)."""
    return fp_clusters(
        _live_fps(sigs), id_col="audio_id", fp_col="win_fp",
        tau_e6=tau_e6, max_fp_df=max_fp_df)


def audio_sample_weights(sigs: rd.Dataset,
                         tau_e6: int = TAU_E6_DEFAULT,
                         max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Dedup-aware sampling weights over the audio corpus: every decodable
    recording weighs 1e6 // its near-dup family size (the audio twin of
    img_sample_weights — same shared reducers via stages/fpsets)."""
    from deduplicator_ray.stages.fpsets import fp_sample_weights

    return fp_sample_weights(
        _live_fps(sigs), id_col="audio_id", fp_col="win_fp",
        tau_e6=tau_e6, max_fp_df=max_fp_df)


def audio_leakage_split(sigs: rd.Dataset, train_pct: int = 90,
                        tau_e6: int = TAU_E6_DEFAULT,
                        max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Near-dup-aware train/val split over the audio corpus: all members
    of a window-Jaccard component land on one side of the boundary."""
    from deduplicator_ray.stages.fpsets import fp_leakage_split

    return fp_leakage_split(
        _live_fps(sigs), id_col="audio_id", fp_col="win_fp",
        tau_e6=tau_e6, max_fp_df=max_fp_df, train_pct=train_pct)


# ---------------------------------------------------------------------------
# Tiered duplicate classification (the tier-dedup cascade over audio):
# byte identity → window-fingerprint-SET identity (lossless re-encode /
# gain change: the fp kernel is energy-SIGN based, so identical PCM and
# rescaled PCM share every fp) → Jaccard near-dup → unique
# (stages/fpsets.identity_tiers; the audio analog of img_dedup_tiers).

TIER_SIG_SCHEMA = pa.schema([
    ("audio_id", pa.string()),
    ("win_idx", pa.int32()),
    ("win_fp", pa.int64()),
    ("status", pa.string()),
    ("md5", pa.string()),
])


class AudioSignaturesMd5(AudioSignatures):
    """AudioSignatures plus the payload md5 on every window row — the
    byte-tier key rides the same single parse pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deduplicator_ray import hashing as _h

        base = super().__call__(batch.select(["audio_id", "bytes"]))
        # null payload: same dead-letter contract as the video tier pass
        md5s = {aid: ("" if blob is None else _h.md5_hex(blob))
                for aid, blob in zip(batch["audio_id"].to_pylist(),
                                     batch["bytes"].to_pylist())}
        col = pa.array([md5s[a] for a in base["audio_id"].to_pylist()],
                       pa.string())
        return base.append_column("md5", col).cast(TIER_SIG_SCHEMA)


def audio_tier_signatures(audios: rd.Dataset) -> rd.Dataset:
    return audios.map_batches(
        AudioSignaturesMd5,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )


def audio_dedup_tiers(sigs_md5: rd.Dataset,
                      tau_e6: int = TAU_E6_DEFAULT,
                      max_fp_df: int = MAX_FP_DF_DEFAULT,
                      num_parts: int = 64) -> rd.Dataset:
    """(audio_id, tier, dup_of) per decodable recording (the generic
    stages/fpsets.fp_dedup_tiers cascade over the window-fp relation)."""
    from deduplicator_ray.stages.fpsets import fp_dedup_tiers

    live = sigs_md5.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["audio_id", "win_fp", "md5"]),
        batch_format="pyarrow")
    return fp_dedup_tiers(live, id_col="audio_id", fp_col="win_fp",
                          tau_e6=tau_e6, max_fp_df=max_fp_df,
                          num_parts=num_parts)


def audio_dedup_tiers_report(sigs_md5: rd.Dataset,
                             tau_e6: int = TAU_E6_DEFAULT,
                             max_fp_df: int = MAX_FP_DF_DEFAULT,
                             num_parts: int = 64):
    """Per-tier rollup: (tier, n_audios)."""
    from deduplicator_ray.stages.fpsets import fp_tier_report

    return fp_tier_report(
        audio_dedup_tiers(sigs_md5, tau_e6, max_fp_df, num_parts),
        "n_audios")
