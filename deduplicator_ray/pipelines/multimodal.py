"""Multimodal column stages: decode / resize / feature-extract / frame-sample.

Images/audio/video are opaque ``binary`` columns with typed metadata
(fmt, w, h).  The Ray-side plumbing — schema, actor-pool signatures, batch
sizing, output layout — is real and tested; codec kernels that need
external libraries (jpeg, mp4, audio) are the clearly-marked stubs in
``codecs.decode_image`` (UnsupportedFormatError → dead-letter row), with a
deterministic fake decoder available for plumbing tests.

These are the canonical actor-pool stages: per-actor setup happens once in
``__init__`` (resize coefficient caches warm up per actor), work per batch
in ``__call__`` — run with ``map_batches(Cls, concurrency=N, batch_size=B)``
and a SMALL batch size because rows carry pixel payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplicator_ray import codecs, tuning
from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.resize import grayscale_u8, resize_u8


def _dims_i64(batch: "pa.Table") -> tuple[np.ndarray, np.ndarray]:
    """null w/h → 0 (codec validation rejects what it must) — shared by the
    decode stages so the coercion cannot drift between them."""
    ws = np.nan_to_num(
        batch["w"].to_numpy(zero_copy_only=False)).astype(np.int64)
    hs = np.nan_to_num(
        batch["h"].to_numpy(zero_copy_only=False)).astype(np.int64)
    return ws, hs


class ResizeImages:
    """Actor-pool stage: decode → Lanczos resize → re-encode.

    Output schema mirrors the input (bytes/w/h updated, fmt preserved for
    encodable formats).  Corrupt/stub rows pass through with status='error'.
    """

    def __init__(self, out_w: int = 64, out_h: int = 64, out_fmt: str = "png"):
        self.out_w, self.out_h, self.out_fmt = out_w, out_h, out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"].to_pylist()
        # null bytes raise CodecError inside decode_image (error path)
        ws, hs = _dims_i64(batch)
        fmts = batch["fmt"].to_pylist()
        out_bytes, status = [], []
        for i in range(n):
            try:
                img = codecs.decode_image(payloads[i], fmts[i], int(ws[i]), int(hs[i]))
                small = resize_u8(img, self.out_w, self.out_h)
                out_bytes.append(codecs.encode_image(small, self.out_fmt))
                status.append("ok")
            except codecs.CodecError as e:
                out_bytes.append(b"")
                status.append(f"error:{type(e).__name__}")
        out = batch.drop_columns(["bytes", "w", "h", "fmt"])
        out = out.append_column("bytes", pa.array(out_bytes, pa.binary()))
        out = out.append_column("w", pa.array([self.out_w] * n, pa.int32()))
        out = out.append_column("h", pa.array([self.out_h] * n, pa.int32()))
        out = out.append_column("fmt", pa.array([self.out_fmt] * n, pa.string()))
        out = out.append_column("resize_status", pa.array(status, pa.string()))
        return out


class ImageFeatures:
    """Actor-pool stage: cheap visual features (mean RGB, luma histogram,
    edge density) — the shape of a model-inference stage without a model."""

    def __init__(self, hist_bins: int = 16):
        self.bins = hist_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"].to_pylist()
        # null bytes raise CodecError inside decode_image (error path)
        ws, hs = _dims_i64(batch)
        fmts = batch["fmt"].to_pylist()
        mean_rgb = np.zeros((n, 3), np.float32)
        hist = np.zeros((n, self.bins), np.float32)
        edge = np.zeros(n, np.float32)
        status = ["ok"] * n
        for i in range(n):
            try:
                img = codecs.decode_image(payloads[i], fmts[i], int(ws[i]), int(hs[i]))
                mean_rgb[i] = img.reshape(-1, 3).mean(axis=0)
                g = grayscale_u8(img).astype(np.float32)
                h, _ = np.histogram(g, bins=self.bins, range=(0, 256))
                hist[i] = h / max(g.size, 1)
                gx = np.abs(np.diff(g, axis=1)).mean() if g.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(g, axis=0)).mean() if g.shape[0] > 1 else 0.0
                edge[i] = gx + gy
            except codecs.CodecError as e:
                status[i] = f"error:{type(e).__name__}"
        out = batch.select(["image_id"])
        out = out.append_column(
            "mean_rgb", pa.FixedSizeListArray.from_arrays(pa.array(mean_rgb.reshape(-1)), 3)
        )
        out = out.append_column(
            "luma_hist", pa.FixedSizeListArray.from_arrays(pa.array(hist.reshape(-1)), self.bins)
        )
        out = out.append_column("edge_density", pa.array(edge))
        out = out.append_column("feat_status", pa.array(status, pa.string()))
        return out


class FrameSample:
    """Actor-pool stage for video frame sampling (dupedb.py:92-98 decodes
    frame 0 of videos with cv2 — unavailable here).

    Plumbing is real: emits (image_id, frame_idx, bytes, w, h, fmt) rows.
    The mp4/webm codec kernel is STUBBED — with ``fake=True`` a
    deterministic fake decoder (seeded by image_id) generates frames so the
    schema/fan-out path is testable; with ``fake=False`` video rows
    dead-letter with the UnsupportedFormatError message.
    """

    OUT_SCHEMA = pa.schema(
        [
            ("image_id", pa.string()),
            ("frame_idx", pa.int32()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("status", pa.string()),
        ]
    )

    def __init__(self, n_frames: int = 2, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("image_id", "frame_idx", "bytes", "w", "h", "fmt", "status")}
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        for i, iid in enumerate(ids):
            if fmts[i] not in ("mp4", "webm"):
                continue
            if not self.fake:
                rows["image_id"].append(iid)
                rows["frame_idx"].append(-1)
                rows["bytes"].append(b"")
                rows["w"].append(0)
                rows["h"].append(0)
                rows["fmt"].append(fmts[i])
                rows["status"].append(
                    "error:UnsupportedFormatError: video decode requires ffmpeg/cv2 "
                    "(stubbed; see codecs.STUB_FMTS)"
                )
                continue
            rng = np.random.default_rng(
                np.frombuffer(iid.encode()[:16].ljust(16, b"\0"), np.uint32)
            )
            for f in range(self.n_frames):
                img = rng.integers(0, 256, (16, 16, 3), np.uint8)
                rows["image_id"].append(iid)
                rows["frame_idx"].append(f)
                rows["bytes"].append(codecs.encode_png(img))
                rows["w"].append(16)
                rows["h"].append(16)
                rows["fmt"].append("png")
                rows["status"].append("ok_fake")
        return pa.Table.from_pydict(rows, schema=self.OUT_SCHEMA)


def resize_pipeline(ds: rd.Dataset, out_w: int, out_h: int,
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return ds.map_batches(
        ResizeImages,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=128,           # pixel payloads: small batches
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )


def feature_pipeline(ds: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )


class ConcatImages:
    """Per-cluster image concatenation (the GUI's merge action,
    /root/reference/compare.py:493-515 — cv2 h/v-stack of two images,
    here generalized to a cluster's members as a ``map_groups`` stage).

    Members are decoded, resized to the first member's height (horizontal)
    or width (vertical), stacked, and re-encoded.  Emits one row per
    cluster: (cluster_id, bytes, w, h, fmt, n_members, status).
    """

    def __init__(self, axis: str = "h", out_fmt: str = "png", max_members: int = 8):
        assert axis in ("h", "v")
        self.axis, self.out_fmt, self.max_members = axis, out_fmt, max_members

    def __call__(self, df):
        import pandas as pd

        rows = {k: [] for k in ("cluster_id", "bytes", "w", "h", "fmt",
                                "n_members", "status")}
        for cid, g in df.groupby("cluster_id", sort=False):
            g = g.sort_values("image_id").head(self.max_members)
            imgs, ok = [], True
            for _, r in g.iterrows():
                try:
                    # null dims read back as NaN through pandas — coerce to
                    # 0 so codec validation (not int()) rejects what it must
                    imgs.append(codecs.decode_image(
                        r["bytes"], r["fmt"],
                        int(np.nan_to_num(r["w"])), int(np.nan_to_num(r["h"]))))
                except codecs.CodecError:
                    ok = False
                    break
            if not ok or not imgs:
                rows["cluster_id"].append(cid)
                rows["bytes"].append(b"")
                rows["w"].append(0)
                rows["h"].append(0)
                rows["fmt"].append(self.out_fmt)
                rows["n_members"].append(len(g))
                rows["status"].append("error")
                continue
            if self.axis == "h":
                ref_h = imgs[0].shape[0]
                imgs = [im if im.shape[0] == ref_h else
                        resize_u8(im, max(1, im.shape[1] * ref_h // im.shape[0]), ref_h)
                        for im in imgs]
                out = np.concatenate(imgs, axis=1)
            else:
                ref_w = imgs[0].shape[1]
                imgs = [im if im.shape[1] == ref_w else
                        resize_u8(im, ref_w, max(1, im.shape[0] * ref_w // im.shape[1]))
                        for im in imgs]
                out = np.concatenate(imgs, axis=0)
            rows["cluster_id"].append(cid)
            rows["bytes"].append(codecs.encode_image(out, self.out_fmt))
            rows["w"].append(out.shape[1])
            rows["h"].append(out.shape[0])
            rows["fmt"].append(self.out_fmt)
            rows["n_members"].append(len(g))
            rows["status"].append("ok")
        return pd.DataFrame(rows)


class MontageImages(ConcatImages):
    """Comparison-montage sink analog (S7, /root/reference/dedupc.py:109-154
    shells out to ImageMagick ``montage``): per duplicate cluster, resize
    every member to a fixed tile and lay them out in a thumbnail grid,
    emitted as an encoded image column (no subprocess, no side files)."""

    def __init__(self, tile: int = 32, cols: int = 4, out_fmt: str = "png",
                 max_members: int = 16):
        super().__init__("h", out_fmt, max_members)
        self.tile, self.cols = tile, cols

    def __call__(self, df):
        import pandas as pd

        rows = {k: [] for k in ("cluster_id", "bytes", "w", "h", "fmt",
                                "n_members", "status")}
        t = self.tile
        for cid, g in df.groupby("cluster_id", sort=False):
            g = g.sort_values("image_id").head(self.max_members)
            tiles = []
            status = "ok"
            for _, r in g.iterrows():
                try:
                    img = codecs.decode_image(
                        r["bytes"], r["fmt"],
                        int(np.nan_to_num(r["w"])), int(np.nan_to_num(r["h"])))
                    tiles.append(resize_u8(img, t, t))
                except codecs.CodecError:
                    tiles.append(np.zeros((t, t, 3), np.uint8))
                    status = "partial"
            n = len(tiles)
            cols = min(self.cols, n)
            rows_n = (n + cols - 1) // cols
            grid = np.zeros((rows_n * t, cols * t, 3), np.uint8)
            for i, im in enumerate(tiles):
                r0, c0 = (i // cols) * t, (i % cols) * t
                grid[r0:r0 + t, c0:c0 + t] = im
            rows["cluster_id"].append(cid)
            rows["bytes"].append(codecs.encode_image(grid, self.out_fmt))
            rows["w"].append(grid.shape[1])
            rows["h"].append(grid.shape[0])
            rows["fmt"].append(self.out_fmt)
            rows["n_members"].append(n)
            rows["status"].append(status)
        return pd.DataFrame(rows)


def montage_pipeline(images: rd.Dataset, clusters: rd.Dataset,
                     tile: int = 32, cols: int = 4,
                     num_partitions: int = 8) -> rd.Dataset:
    """Attach cluster assignments to payloads and render one montage per
    cluster (partitioned groupby on cluster_id, vectorized per partition).

    The attach is the union-join shape (tag → image_id-partitioned
    groupby), NOT ``Dataset.join``: Ray's hash join emits schema-less
    empty blocks on sparse partitions (the CORRECTNESS_r01 failure
    fpsets.py documents), and this was the repo's last use of it on a
    payload path.  ``num_partitions`` sizes the payload-carrying
    exchanges: at corpus scale it must grow with data volume (each
    partition holds its clusters' FULL pixel payloads in one worker's
    heap) — a few × total cores is the working default; 8 suits the
    sandbox tiers."""
    import pandas as pd
    import pyarrow.compute as pc

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    union_schema = pa.schema([
        ("image_id", pa.string()), ("cluster_id", pa.string()),
        ("bytes", pa.binary()), ("w", pa.int64()), ("h", pa.int64()),
        ("fmt", pa.string()), ("tag", pa.int8())])

    def tag_img(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays([
            pc.cast(t["image_id"], pa.string()),
            pa.nulls(n, pa.string()),
            pc.cast(t["bytes"], pa.binary()),
            pc.cast(t["w"], pa.int64()),
            pc.cast(t["h"], pa.int64()),
            pc.cast(t["fmt"], pa.string()),
            pa.array(np.zeros(n, np.int8)),
        ], schema=union_schema)

    def tag_lab(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays([
            pc.cast(t["image_id"], pa.string()),
            pc.cast(t["cluster_id"], pa.string()),
            pa.nulls(n, pa.binary()),
            pa.nulls(n, pa.int64()),
            pa.nulls(n, pa.int64()),
            pa.nulls(n, pa.string()),
            pa.array(np.ones(n, np.int8)),
        ], schema=union_schema)

    mid_schema = pa.schema([
        ("cluster_id", pa.string()), ("image_id", pa.string()),
        ("bytes", pa.binary()), ("w", pa.int64()), ("h", pa.int64()),
        ("fmt", pa.string())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        labs = df[df["tag"] == 1]
        imgs = df[df["tag"] == 0]
        if labs.empty or imgs.empty:
            return mid_schema.empty_table().to_pandas()
        lut = (labs.drop_duplicates("image_id")
               .set_index("image_id")["cluster_id"])
        cid = imgs["image_id"].map(lut)
        keep = cid.notna().to_numpy()
        out = imgs.loc[keep, ["image_id", "bytes", "w", "h",
                              "fmt"]].copy()
        out.insert(0, "cluster_id", cid[keep].to_numpy())
        return out

    mid = partitioned_groupby(
        images.select_columns(["image_id", "bytes", "w", "h", "fmt"])
        .map_batches(tag_img, batch_format="pyarrow")
        .union(clusters.map_batches(tag_lab, batch_format="pyarrow")),
        ["image_id"], attach, num_parts=num_partitions,
        out_schema=mid_schema)
    return partitioned_groupby(
        mid, ["cluster_id"], MontageImages(tile=tile, cols=cols),
        num_parts=num_partitions,
        out_schema=pa.schema([("cluster_id", pa.string()),
                              ("bytes", pa.binary()),
                              ("w", pa.int64()), ("h", pa.int64()),
                              ("fmt", pa.string()),
                              ("n_members", pa.int64()),
                              ("status", pa.string())]),
    )


class AudioFeatures:
    """Actor-pool stage for audio feature extraction — the audio cell of
    the multimodal matrix (images: ImageFeatures; video: FrameSample).

    Plumbing is real: consumes (image_id, bytes, fmt) rows, emits one
    feature row per audio-format input with duration/sample-rate/loudness
    scalars plus a fixed-width mfcc-shaped vector, and routes non-audio
    rows AROUND the stage (skipped) and undecodable audio into the
    dead-letter taxonomy.  The codec kernel itself is STUBBED (no
    libsndfile/ffmpeg in this sandbox): ``fake=True`` derives
    deterministic features — duration from the true payload length at the
    declared PCM rate, loudness and mfcc from an image_id-seeded hash
    (the FrameSample convention) — so the schema/actor/fan-out path is
    fully testable and SQL-mirrorable; ``fake=False`` dead-letters audio
    rows with the UnsupportedFormatError message."""

    AUDIO_FMTS = ("acon", "mp3", "wav", "flac", "ogg")
    SAMPLE_RATE = 16000
    N_MFCC = 13

    OUT_SCHEMA = pa.schema([
        ("image_id", pa.string()),
        ("duration_ms", pa.int64()),
        ("sample_rate", pa.int32()),
        ("rms_e6", pa.int64()),
        ("mfcc", pa.list_(pa.float32())),
        ("fmt", pa.string()),
        ("status", pa.string()),
    ])

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        rows = {k: [] for k in ("image_id", "duration_ms", "sample_rate",
                                "rms_e6", "mfcc", "fmt", "status")}
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        for iid, fmt, blob in zip(ids, fmts, payloads):
            if fmt not in self.AUDIO_FMTS:
                continue
            if fmt in ("acon", "wav") and blob is not None and not self.fake:
                # formats with a REAL decoder (codecs.decode_audio magic
                # dispatch: the acon container AND stdlib-wave RIFF) —
                # only foreign formats (mp3/flac/ogg) stub
                from deduplicator_ray import codecs as _codecs

                try:
                    rate, pcm = _codecs.decode_audio(blob)
                    rms = float(np.sqrt(np.mean(
                        pcm.astype(np.float64) ** 2))) if len(pcm) else 0.0
                    # fixed-width mfcc-shaped vector for REAL acon too
                    # (the schema promises N_MFCC floats on every ok row):
                    # log band-energy differences over N_MFCC+1 linear
                    # bands of the clip's power spectrum — deterministic,
                    # real DSP over the decoded PCM
                    spec = (np.abs(np.fft.rfft(
                        pcm.astype(np.float64))) ** 2 if len(pcm) else
                        np.zeros(0))
                    if len(spec) > self.N_MFCC + 2:
                        edges = np.linspace(
                            1, len(spec), self.N_MFCC + 2).astype(np.int64)
                        bands = np.add.reduceat(
                            spec, edges[:-1])[: self.N_MFCC + 1]
                        logb = np.log1p(bands)
                        vec = (logb[1:] - logb[:-1]).astype(np.float32)
                    else:
                        vec = np.zeros(self.N_MFCC, np.float32)
                    rows["image_id"].append(iid)
                    rows["duration_ms"].append(
                        int(len(pcm) * 1000 // max(rate, 1)))
                    rows["sample_rate"].append(int(rate))
                    rows["rms_e6"].append(int(rms * 1_000_000 / 32768))
                    rows["mfcc"].append([float(x) for x in vec])
                    rows["fmt"].append(fmt)
                    rows["status"].append("ok")
                except _codecs.CodecError as e:
                    rows["image_id"].append(iid)
                    rows["duration_ms"].append(-1)
                    rows["sample_rate"].append(-1)
                    rows["rms_e6"].append(-1)
                    rows["mfcc"].append([])
                    rows["fmt"].append(fmt)
                    rows["status"].append(
                        f"error:{type(e).__name__}: {e}")
                continue
            if not self.fake or blob is None:
                rows["image_id"].append(iid)
                rows["duration_ms"].append(-1)
                rows["sample_rate"].append(-1)
                rows["rms_e6"].append(-1)
                rows["mfcc"].append([])
                rows["fmt"].append(fmt)
                rows["status"].append(
                    "error:UnsupportedFormatError: audio decode requires "
                    "libsndfile/ffmpeg for this format (stubbed; native: "
                    "wav/acon via codecs.decode_audio)"
                    if blob is not None else
                    "error:NullPayload: null bytes column")
                continue
            # 16-bit mono PCM at the declared rate: duration is REAL
            # arithmetic over the payload length; loudness/mfcc are
            # id-seeded fakes (FrameSample convention)
            dur = len(blob) * 1000 // (self.SAMPLE_RATE * 2)
            h = int(hashlib.md5(iid.encode()).hexdigest()[:8], 16)
            rng = np.random.default_rng(h)
            rows["image_id"].append(iid)
            rows["duration_ms"].append(int(dur))
            rows["sample_rate"].append(self.SAMPLE_RATE)
            rows["rms_e6"].append(int(h % 1_000_000))
            rows["mfcc"].append(
                rng.standard_normal(self.N_MFCC).astype(np.float32))
            rows["fmt"].append(fmt)
            rows["status"].append("ok_fake")
        return pa.Table.from_pydict(rows, schema=self.OUT_SCHEMA)


def audio_pipeline(ds: rd.Dataset, fake: bool = False) -> rd.Dataset:
    """Audio feature extraction as an actor pool: decoder state (codec
    tables, model weights in a real deployment) loads once per actor in
    __init__; batches stay small because audio payloads are large."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=tuning.actor_pool_bounds(per_actor_gb=1.0),
    )
