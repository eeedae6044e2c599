"""Video near-duplicate detection over frame fingerprints.

The reference treats video byte-exactly (md5 into the shared hash→paths
index, /root/reference/dupedb.py:92-101).  This module is the engine's
training-data extension of that idea to FRAME-level near-dup: re-encodes,
clips and teasers of the same footage share scene frames, so

    parse container → decode frames → dHash each frame     (actor pool)
    → distinct (video_id, frame_fp)                        (one shuffle)
    → stop-frame removal (df > max_fp_df dropped)          (in-partition)
    → per-fp pair emission + per-video live-fp counts      (in-partition)
    → n_shared groupby, sizes groupby, two joins           (pairs-only data)
    → Jaccard >= tau filter                                (vectorized)

Scale notes: the only full-data shuffle is the fp-key groupby (keys+ids,
never payload bytes — frames are dropped after hashing); pair emission is
bounded per bucket by the stop-frame cap (a black frame / channel ident
shared by millions of videos is evidence of NOTHING, so fps with document
frequency > max_fp_df are removed from both intersection and union — the
stopword-removal convention, applied identically in the DuckDB mirror);
everything after banding is pairs-only, orders of magnitude smaller than
the corpus.  Jaccard is exact over the capped fp sets, so there is no
separate verify pass — the intersection count IS the verification.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduplicator_ray import codecs, hashing
from deduplicator_ray.stages.partitioned import partitioned_groupby

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

# intermediate banding emission: k=0 live (video_id, fp) rows for the
# per-video size count, k=1 (a, b) candidate-pair rows for the
# intersection count
_BAND_SCHEMA = pa.schema([
    ("k", pa.int8()),
    ("va", pa.string()),
    ("vb", pa.string()),
])


class VideoFrames:
    """Actor-pool frame-fingerprint stage: (video_id, bytes) → one row per
    frame (video_id, frame_idx, frame_fp, 'ok'); a corrupt container emits
    ONE dead-letter row (frame_idx=-1, status='error:...') so the badfiles
    taxonomy matches the image decode stage.  Decoder state would load in
    __init__ in a real deployment; payload bytes never leave this stage."""

    def __init__(self, hash_size: int = 8):
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
        concurrency=(1, 8),
    )


def _band_emit(max_fp_df: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["frame_fp", "video_id"])
        sz = d.groupby("frame_fp", sort=False)["video_id"].transform("size")
        d = d[sz.to_numpy() <= max_fp_df]
        if not len(d):
            return pd.DataFrame({"k": pd.Series([], dtype=np.int8),
                                 "va": pd.Series([], dtype=object),
                                 "vb": pd.Series([], dtype=object)})
        d = d.sort_values(["frame_fp", "video_id"], kind="stable")
        vids = d["video_id"].to_numpy()
        codes, counts = np.unique(d["frame_fp"].to_numpy(),
                                  return_counts=True)
        starts = np.concatenate([[0], np.cumsum(counts[:-1])])
        n = len(vids)
        # vectorized all-pairs within each fp group (group size <= cap):
        # row at within-group position j is the 'b' side of j pairs whose
        # 'a' sides are the j rows before it in the group
        pos = np.arange(n) - np.repeat(starts, counts)
        b_idx = np.repeat(np.arange(n), pos)
        seg = np.cumsum(pos)
        total = int(seg[-1]) if n else 0
        seg_start = np.concatenate([[0], seg[:-1]])
        a_local = np.arange(total) - np.repeat(seg_start, pos)
        a_idx = np.repeat(np.repeat(starts, counts), pos) + a_local
        live = pd.DataFrame({"k": np.zeros(n, np.int8),
                             "va": vids, "vb": np.full(n, "", object)})
        pairs = pd.DataFrame({"k": np.ones(total, np.int8),
                              "va": vids[a_idx], "vb": vids[b_idx]})
        return pd.concat([live, pairs], ignore_index=True)

    return fn


def _count_rows(keys: list[str], out_col: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(keys, sort=False).size()
             .rename(out_col).reset_index())
        g[out_col] = g[out_col].astype(np.int64)
        return g

    return fn


def video_dup_pairs(
    frames: rd.Dataset,
    tau_e6: int = TAU_E6_DEFAULT,
    max_fp_df: int = MAX_FP_DF_DEFAULT,
    num_parts: int = 64,
) -> rd.Dataset:
    """Frame rows → verified near-dup pair table (exact Jaccard over the
    stop-frame-capped fp sets, fixed-point e6 for hash-stable output)."""
    live = frames.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok"))
                   .select(["video_id", "frame_fp"]),
        batch_format="pyarrow")

    banded = partitioned_groupby(
        live, ["frame_fp"], _band_emit(max_fp_df),
        num_parts=num_parts, out_schema=_BAND_SCHEMA)
    banded = banded.materialize()   # consumed twice (sizes + pairs)

    sizes = partitioned_groupby(
        banded.map_batches(
            lambda t: t.filter(pc.equal(t["k"], 0)).select(["va"]),
            batch_format="pyarrow"),
        ["va"], _count_rows(["va"], "sz"),
        num_parts=max(8, num_parts // 4),
        out_schema=pa.schema([("va", pa.string()), ("sz", pa.int64())]))

    n_shared = partitioned_groupby(
        banded.map_batches(
            lambda t: t.filter(pc.equal(t["k"], 1)).select(["va", "vb"]),
            batch_format="pyarrow"),
        ["va", "vb"], _count_rows(["va", "vb"], "n_shared"),
        num_parts=max(8, num_parts // 4),
        out_schema=pa.schema([("va", pa.string()), ("vb", pa.string()),
                              ("n_shared", pa.int64())]))

    # reduce-side size attachment (NOT Dataset.join: Ray's hash join emits
    # schema-LESS empty blocks on sparse partitions that then break any
    # downstream join/aggregate — the partitioned_groupby primitive types
    # every empty block via out_schema).  Pass 1 keys each pair row under
    # BOTH endpoints alongside the size rows and attaches the local side's
    # size; pass 2 folds the two half-attached rows per pair.  Both passes
    # shuffle pairs-only data.
    uni = pa.schema([("v", pa.string()), ("va", pa.string()),
                     ("vb", pa.string()), ("n_shared", pa.int64()),
                     ("sz", pa.int64()), ("kind", pa.int8())])

    def explode_pairs(t: pa.Table) -> pa.Table:
        va = t["va"].to_pandas().to_numpy(dtype=object)
        vb = t["vb"].to_pandas().to_numpy(dtype=object)
        ns = t["n_shared"].to_numpy(zero_copy_only=False)
        n = len(va)
        return pa.Table.from_pydict(
            {"v": np.concatenate([va, vb]),
             "va": np.concatenate([va, va]),
             "vb": np.concatenate([vb, vb]),
             "n_shared": np.concatenate([ns, ns]).astype(np.int64),
             "sz": np.zeros(2 * n, np.int64),
             "kind": np.zeros(2 * n, np.int8)},
            schema=uni)

    def lift_sizes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict(
            {"v": t["va"], "va": pa.array([""] * n, pa.string()),
             "vb": pa.array([""] * n, pa.string()),
             "n_shared": np.zeros(n, np.int64),
             "sz": t["sz"].to_numpy(zero_copy_only=False).astype(np.int64),
             "kind": np.ones(n, np.int8)},
            schema=uni)

    tagged = n_shared.map_batches(explode_pairs, batch_format="pyarrow") \
        .union(sizes.map_batches(lift_sizes, batch_format="pyarrow"))

    half_schema = pa.schema([("va", pa.string()), ("vb", pa.string()),
                             ("n_shared", pa.int64()),
                             ("size_a", pa.int64()), ("size_b", pa.int64())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        szmap = dict(zip(df.loc[df["kind"] == 1, "v"],
                         df.loc[df["kind"] == 1, "sz"]))
        p = df[df["kind"] == 0]
        if not len(p):
            return pd.DataFrame({c: pd.Series([], dtype=t.to_pandas_dtype())
                                 for c, t in zip(half_schema.names,
                                                 half_schema.types)})
        s = p["v"].map(szmap).astype(np.int64)
        is_a = (p["v"] == p["va"]).to_numpy()
        return pd.DataFrame({
            "va": p["va"].to_numpy(), "vb": p["vb"].to_numpy(),
            "n_shared": p["n_shared"].to_numpy(),
            "size_a": np.where(is_a, s, -1).astype(np.int64),
            "size_b": np.where(is_a, -1, s).astype(np.int64)})

    halves = partitioned_groupby(tagged, ["v"], attach,
                                 num_parts=max(8, num_parts // 4),
                                 out_schema=half_schema)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["va", "vb"], sort=False)
             .agg(n_shared=("n_shared", "first"),
                  size_a=("size_a", "max"), size_b=("size_b", "max"))
             .reset_index())
        ns = g["n_shared"].to_numpy()
        sa = g["size_a"].to_numpy()
        sb = g["size_b"].to_numpy()
        union = sa + sb - ns
        keep = ns * 1_000_000 >= tau_e6 * union
        jac = np.zeros(len(ns), np.int64)
        np.floor_divide(ns * 1_000_000, union, out=jac, where=union > 0)
        out = pd.DataFrame({
            "video_id_a": g["va"].to_numpy(),
            "video_id_b": g["vb"].to_numpy(),
            "n_shared": ns.astype(np.int64),
            "size_a": sa.astype(np.int64), "size_b": sb.astype(np.int64),
            "jaccard_e6": jac})
        return out[keep]

    return partitioned_groupby(halves, ["va", "vb"], fold,
                               num_parts=max(8, num_parts // 4),
                               out_schema=PAIR_SCHEMA)


def video_clusters(frames: rd.Dataset,
                   tau_e6: int = TAU_E6_DEFAULT,
                   max_fp_df: int = MAX_FP_DF_DEFAULT) -> rd.Dataset:
    """Near-dup pairs → connected components → (video_id, cluster_id)."""
    from deduplicator_ray.stages.components import connected_components

    edges = video_dup_pairs(frames, tau_e6, max_fp_df).map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t["video_id_a"], "dst": t["video_id_b"]},
            schema=pa.schema([("src", pa.string()), ("dst", pa.string())])),
        batch_format="pyarrow")
    cc = connected_components(edges)
    return cc.map_batches(
        lambda t: t.rename_columns(
            ["video_id" if c == "image_id" else c for c in t.column_names]),
        batch_format="pyarrow")
