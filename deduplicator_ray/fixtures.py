"""Deterministic synthetic image+caption corpus (FIXTURES.md).

Generates the ``images`` table with exactly the BASELINE.json ``input_hint``
schema — (image_id, bytes, w, h, fmt, caption, phash) — plus the
``images_truth`` ground-truth table, with a fixed seed and zero external
data.  Each truth group exercises one duplicate derivation from the
reference's behavior space (exact / reencode / noisy / resized / crop_shift
/ degenerate / corrupt / distinct_lookalike — see FIXTURES.md).

Generation is pure numpy and embarrassingly parallel over groups (each group
is seeded independently with ``default_rng([SEED, group_id])``), so the
corpus is byte-identical whether built serially on the driver or sharded
through Ray — the sf0.1 bench corpus is built once and cached under /tmp.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from deduplicator_ray import codecs, hashing
from deduplicator_ray.resize import resize_u8

SEED = 42

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

TRUTH_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("group_id", pa.int64()),
        ("kind", pa.string()),
        ("source_id", pa.string()),
        ("psnr_db", pa.float64()),
        ("caption_kind", pa.string()),
        ("expected_keeper", pa.bool_()),
        ("phash_stale", pa.bool_()),
    ]
)

_WORDS = (
    "sunset harbor mountain forest river canyon meadow lantern window shadow "
    "portrait texture gradient skyline horizon crystal ember willow marble cobalt "
    "amber drift field stone cloud petal branch spiral prism dune glacier tide"
).split()

_DIRS = ["corpus", "img", "archive", "downloads", "sorted", "best", "originals", "temp", "cache", "backup"]
_GOOD_DIR_WORDS = ("best", "original")
_BAD_DIR_WORDS = ("temp", "cache")
_FMTS = ["raw", "ppm", "bmp", "png"]
# mp4/flac are the stub-codec media formats: the engine cannot decode
# them in-sandbox, so they exercise the strict-mode md5 keyspace
# (/root/reference/dupedb.py:82-101).  jpg left this set when the
# baseline JFIF codec went native (jpeg.py) — real-jpg groups now
# exercise the dHash path instead.
_EXTS = {"raw": "raw", "ppm": "ppm", "bmp": "bmp", "png": "png",
         "jpg": "jpg", "mp4": "mp4", "flac": "flac"}


def _base_image(rng: np.random.Generator, size_scale: int = 1) -> np.ndarray:
    """Low-frequency RGB image: oriented gradient + 2-3 gaussian blobs
    (stable dHash under benign perturbation, per FIXTURES.md).  The rng
    draw sequence is independent of ``size_scale`` so scaled corpora keep
    the same group structure."""
    w = int(rng.integers(16, 33)) * 2 * size_scale  # 32..64 even, × scale
    h = int(rng.integers(16, 33)) * 2 * size_scale
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ang = rng.uniform(0, 2 * np.pi)
    ramp = (np.cos(ang) * xx / w + np.sin(ang) * yy / h)
    ramp = (ramp - ramp.min()) / max(ramp.ptp(), 1e-9)
    img = np.zeros((h, w, 3), np.float64)
    base_col = rng.uniform(40, 215, size=3)
    end_col = rng.uniform(40, 215, size=3)
    for c in range(3):
        img[:, :, c] = base_col[c] + ramp * (end_col[c] - base_col[c])
    for _ in range(int(rng.integers(2, 4))):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        sig = rng.uniform(min(w, h) / 8, min(w, h) / 3)
        amp = rng.uniform(-80, 80, size=3)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig * sig))
        for c in range(3):
            img[:, :, c] += amp[c] * blob
    return np.clip(img, 0, 255).astype(np.uint8)


def _add_noise_psnr(img: np.ndarray, psnr_db: float, rng: np.random.Generator) -> np.ndarray:
    """Additive gaussian noise scaled so measured PSNR ≈ target."""
    sigma = 255.0 / (10 ** (psnr_db / 20.0))
    noisy = img.astype(np.float64) + rng.normal(0, sigma, img.shape)
    return np.clip(noisy, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 20 * np.log10(255.0 / np.sqrt(mse))


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(6, 21))
    return " ".join(rng.choice(_WORDS, size=n))


def _caption_variant(cap: str, kind: str, rng: np.random.Generator) -> str:
    toks = cap.split()
    if kind == "same":
        return cap
    if kind == "shingle_near":
        i = int(rng.integers(0, len(toks)))
        toks[i] = str(rng.choice(_WORDS))
        return " ".join(toks)
    if kind == "token_swap":
        if len(toks) >= 2:
            i, j = rng.choice(len(toks), size=2, replace=False)
            toks[i], toks[j] = toks[j], toks[i]
        return " ".join(toks)
    # unrelated
    return _caption(rng)


def _image_id(gid: int, member: int, rng: np.random.Generator, ext: str, style: str) -> str:
    depth = int(rng.integers(1, 4))
    dirs = "/".join(str(rng.choice(_DIRS)) for _ in range(depth))
    stem = f"{rng.choice(_WORDS)}_{gid:05d}"
    if style == "hex36":
        name = format(int(rng.integers(0, 2**63)) * 2**81 + gid, "036x")[:36] + f".{ext}"
    elif style == "series":
        name = f"{stem} ({member + 1}).{ext}"
    elif style == "page":
        name = f"{stem}_p{member + 1}.{ext}"
    elif style == "plain":
        name = f"{rng.choice(_WORDS)}-{stem}.{ext}"
    else:
        name = f"{stem}.{ext}"
    return f"{dirs}/{name}"


def _encode(img: np.ndarray, fmt: str, png_level: int = 1) -> bytes:
    if fmt == "png" and png_level != 1:
        return codecs.encode_png(img, png_level)
    return codecs.encode_image(img, fmt)


def generate_group(gid: int, hash_size: int = 8, size_scale: int = 1,
                   fmts: list[str] | None = None) -> tuple[list[dict], list[dict]]:
    """Generate one truth group. Returns (image_rows, truth_rows).

    ``size_scale`` multiplies linear image dimensions (the sfimg tier uses
    10 → ~320-640 px, the realistic payload shape for the scaling bench);
    ``fmts`` overrides the codec pool (sfimg weights PNG so multi-GB
    corpora stay on disk budget)."""
    _fmts = fmts if fmts is not None else _FMTS
    rng = np.random.default_rng([SEED, gid])
    rows: list[dict] = []
    truth: list[dict] = []
    roll = rng.uniform()

    def emit(img, fmt, member, style, kind, source_idx, cap_kind, cap,
             corrupt=False, stale_phash=False, png_level=1):
        data = _encode(img, fmt, png_level)
        if corrupt:
            cut = max(8, len(data) // 3)
            data = data[:cut]
        h, w = img.shape[:2]
        iid = _image_id(gid, member, rng, _EXTS[fmt], style)
        # the 'plain' style carries no member index, so two members can
        # draw identical dirs+words at the largest tiers (~O(1) expected
        # at 384k groups): re-draw on in-group collision — consumes extra
        # rng only in the colliding group, so collision-free tiers are
        # byte-identical to builds without this guard
        while any(r["image_id"] == iid for r in rows):
            iid = _image_id(gid, member, rng, _EXTS[fmt], style)
        if corrupt:
            ph = 0
        else:
            # phash:int64 is definitionally the 64-bit precomputed hash
            # (input_hint) regardless of the pipeline's hash_size config
            ph = hashing.u64_to_i64(hashing.dhash_u64(img, 8))
        if stale_phash and rows:
            ph = rows[0]["phash"]
        rows.append(
            dict(image_id=iid, bytes=data, w=w, h=h, fmt=fmt, caption=cap, phash=ph)
        )
        base_img = None if source_idx is None else _group_pixels[source_idx]
        p = float("inf") if base_img is None or corrupt else (
            psnr(base_img, img) if base_img.shape == img.shape else float("nan")
        )
        truth.append(
            dict(
                image_id=iid,
                group_id=gid,
                kind=kind,
                source_id=rows[source_idx]["image_id"] if source_idx is not None else iid,
                psnr_db=p,
                caption_kind=cap_kind,
                expected_keeper=False,  # filled in by finalize below
                phash_stale=stale_phash,
            )
        )
        _group_pixels.append(img)

    _group_pixels: list[np.ndarray] = []

    if roll < 0.02:
        # degenerate: constant-color → dhash == 0 → poison bucket
        # (/root/reference/dedupc.py:176-178)
        w = int(rng.integers(16, 33)) * 2 * size_scale
        h = int(rng.integers(16, 33)) * 2 * size_scale
        img = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        cap = _caption(rng)
        emit(img, str(rng.choice(_fmts)), 0, "plain", "degenerate", None, "same", cap)
        emit(img, str(rng.choice(_fmts)), 1, "plain", "degenerate", 0, "same", cap)
        return rows, truth

    if roll < 0.045:
        # strict-mode media: stub-codec payloads (mp4/flac) that the engine
        # cannot decode — getProcHash md5-keys them into the same index as
        # images (/root/reference/dupedb.py:82-101), so byte-identical media
        # must cluster and elect a keeper exactly like images do.
        from deduplicator_ray.stages.ranking import keeper_sort_key
        fmt = str(rng.choice(["flac", "mp4"]))
        payload = rng.integers(0, 256, int(rng.integers(512, 4096)),
                               dtype=np.uint8).tobytes()
        cap = _caption(rng)
        n_dups = int(rng.integers(2, 4))
        first = len(rows)
        for m in range(n_dups):
            iid = _image_id(gid, m, rng, _EXTS[fmt],
                            str(rng.choice(["plain", "series"])))
            rows.append(dict(image_id=iid, bytes=payload, w=0, h=0, fmt=fmt,
                             caption=cap, phash=0))
            truth.append(dict(
                image_id=iid, group_id=gid, kind="media_exact",
                source_id=rows[first]["image_id"], psnr_db=float("inf"),
                caption_kind="same", expected_keeper=False, phash_stale=False))
        if rng.uniform() < 0.4:  # distinct media payload: must NOT cluster
            other = rng.integers(0, 256, int(rng.integers(512, 4096)),
                                 dtype=np.uint8).tobytes()
            iid = _image_id(gid, n_dups, rng, _EXTS[fmt], "plain")
            rows.append(dict(image_id=iid, bytes=other, w=0, h=0, fmt=fmt,
                             caption=_caption(rng), phash=0))
            truth.append(dict(
                image_id=iid, group_id=gid, kind="media_distinct",
                source_id=iid, psnr_db=float("inf"), caption_kind="unrelated",
                expected_keeper=False, phash_stale=False))
        # keeper among the byte-identical members (equal quality → min id)
        keys = {i: keeper_sort_key(rows[i]["image_id"], 1, 0, len(payload))
                for i in range(first, first + n_dups)}
        truth[min(keys, key=keys.get)]["expected_keeper"] = True
        return rows, truth

    if roll < 0.06:
        # REAL-jpg group (baseline JFIF codec, jpeg.py): a q90 base, often
        # a byte-identical copy, and a q65 RE-ENCODE — byte-distinct,
        # perceptually identical, the class only dHash catches where the
        # old stub boundary md5-keyed everything.  Stored phash/psnr are
        # computed from the DECODED pixels (jpg is lossy), so
        # validate_phash sees no fabricated drift.
        from deduplicator_ray import jpeg as _jpeg

        base = _base_image(rng, size_scale)
        cap = _caption(rng)
        h, w = base.shape[:2]

        def jrow(member, style, kind, blob, source_idx):
            dec = _jpeg.decode_jpeg(blob)
            iid = _image_id(gid, member, rng, "jpg", style)
            while any(r["image_id"] == iid for r in rows):
                iid = _image_id(gid, member, rng, "jpg", style)
            rows.append(dict(image_id=iid, bytes=blob, w=w, h=h, fmt="jpg",
                             caption=cap,
                             phash=hashing.u64_to_i64(
                                 hashing.dhash_u64(dec, 8))))
            src = rows[source_idx]["image_id"] if source_idx is not None else iid
            truth.append(dict(
                image_id=iid, group_id=gid, kind=kind, source_id=src,
                psnr_db=psnr(base, dec), caption_kind="same",
                expected_keeper=False, phash_stale=False))

        blob_hi = _jpeg.encode_jpeg(base, 90)
        jrow(0, str(rng.choice(["stem", "plain"])), "jpg_base", blob_hi, None)
        if rng.uniform() < 0.6:  # byte-identical copy: same proc_hash key
            jrow(1, str(rng.choice(["series", "plain"])), "jpg_copy",
                 blob_hi, 0)
        jrow(2, "page", "jpg_reencode", _jpeg.encode_jpeg(base, 65), 0)
        return rows, truth

    base = _base_image(rng, size_scale)
    cap = _caption(rng)
    base_fmt = str(rng.choice(_fmts))
    emit(base, base_fmt, 0, str(rng.choice(["stem", "plain"])), "base", None, "same", cap)

    if roll < 0.17:
        # distinct lookalike: second independent image, same caption family,
        # must NOT cluster (precision guard)
        other = _base_image(np.random.default_rng([SEED, gid, 7]), size_scale)
        emit(other, str(rng.choice(_fmts)), 1, "plain", "distinct_lookalike", None,
             "unrelated", _caption_variant(cap, "unrelated", rng))
        return rows, truth

    member = 1
    if rng.uniform() < 0.5:  # exact byte-dup, different id
        iid_style = str(rng.choice(["series", "plain", "hex36"]))
        data_img = _group_pixels[0]
        emit(data_img, base_fmt, member, iid_style, "exact", 0, "same", cap)
        member += 1
    if rng.uniform() < 0.7:  # reencode: same pixels, different codec —
        # on a single-fmt tier (sfimg, png-only) "different codec" means a
        # different PNG compression level: byte-distinct, pixel-identical,
        # so the kind stays honest instead of silently collapsing into an
        # exact byte-dup (rng draw stream matches the old code on every
        # multi-fmt tier)
        pool = [f for f in _fmts if f != base_fmt]
        alt = str(rng.choice(pool or ["png"]))
        emit(_group_pixels[0], alt, member, "page", "reencode", 0,
             "shingle_near", _caption_variant(cap, "shingle_near", rng),
             png_level=1 if pool else 6)
        member += 1
    for target in rng.choice([40.0, 45.0, 50.0], size=int(rng.integers(0, 3)), replace=False):
        noisy = _add_noise_psnr(base, float(target), rng)
        emit(noisy, str(rng.choice(_fmts)), member, "series", "noisy", 0,
             "shingle_near", _caption_variant(cap, "shingle_near", rng))
        member += 1
    if rng.uniform() < 0.4:  # resized
        factor = float(rng.choice([0.5, 2.0]))
        nw, nh = max(8, int(base.shape[1] * factor)), max(8, int(base.shape[0] * factor))
        emit(resize_u8(base, nw, nh), str(rng.choice(_fmts)), member, "plain",
             "resized", 0, "same", cap)
        member += 1
    if rng.uniform() < 0.3:  # crop/shift 1-3 px
        s = int(rng.integers(1, 4))
        cropped = base[s:, s:, :]
        emit(cropped, str(rng.choice(_fmts)), member, "page", "crop_shift", 0,
             "token_swap", _caption_variant(cap, "token_swap", rng))
        member += 1
    if rng.uniform() < 0.04:  # corrupt payload → dead-letter
        emit(base, "png", member, "plain", "corrupt", 0, "same", cap,
             corrupt=True, stale_phash=True)
        member += 1
    if rng.uniform() < 0.03 and member > 1:  # stale stored phash (validate test)
        shifted = np.roll(base, base.shape[1] // 3, axis=1)
        emit(shifted, base_fmt, member, "plain", "shifted_stale", 0, "same", cap,
             stale_phash=True)
        member += 1

    return rows, truth


def _finalize_keepers(rows: list[dict], truth: list[dict]) -> None:
    """Mark expected_keeper: argmin of the reference quality tuple among the
    group's decodable members whose dhash equals the group's modal dhash —
    mirrors keeper election on the exact-dhash bucket (dedupc.py:180)."""
    from deduplicator_ray.stages.ranking import keeper_sort_key

    by_gid: dict[int, list[int]] = {}
    for i, t in enumerate(truth):
        by_gid.setdefault(t["group_id"], []).append(i)
    for gid, idxs in by_gid.items():
        # the exact-dhash bucket the base lands in: non-corrupt, non-stale
        # members sharing the base's recomputed hash (reference-mode cluster)
        base_ph = rows[idxs[0]]["phash"]
        live = [
            i for i in idxs
            if truth[i]["kind"] != "corrupt"
            and not truth[i]["phash_stale"]
            and rows[i]["phash"] == base_ph
            and base_ph != 0
        ]
        if len(live) < 2:
            continue
        keys = {}
        for i in live:
            r = rows[i]
            keys[i] = keeper_sort_key(
                r["image_id"], 1, r["w"] * r["h"], len(r["bytes"])
            )
        best = min(keys, key=keys.get)
        truth[best]["expected_keeper"] = True


def build_tables(n_groups: int, hash_size: int = 8) -> tuple[pa.Table, pa.Table]:
    all_rows: list[dict] = []
    all_truth: list[dict] = []
    for gid in range(n_groups):
        rows, truth = generate_group(gid, hash_size)
        _finalize_keepers(rows, truth)
        all_rows.extend(rows)
        all_truth.extend(truth)
    images = pa.Table.from_pylist(all_rows, schema=IMAGES_SCHEMA)
    truth = pa.Table.from_pylist(all_truth, schema=TRUTH_SCHEMA)
    return images, truth


# --- sf sizing: ~4 rows/group mean; sf keyed off the testdata dir name ------

# tier → (n_groups, size_scale, fmt_pool).  sfimg is the strong-scaling
# corpus: ~87k images at 320-640 px (PNG-weighted so ~10 GB of pixels fit
# the disk budget) — the realistic payload shape where codec+hash compute
# dominates, unlike the 50-px thumbnails of the sf tiers whose jobs are
# shuffle-latency-bound at any parallelism
SF_GROUPS = {"sf0.001": (160, 1, None), "sf0.01": (1600, 1, None),
             "sf0.1": (16000, 1, None),
             "sfscale": (128000, 1, None),
             "sfscale3": (384000, 1, None),
             "sfimg": (24000, 10, ["png"])}


def sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_GROUPS else "sf0.001"


def content_tag(sf_dir: str) -> str:
    """Cache key for sidecars DERIVED FROM the directory's own tables
    (documents.parquet → PII/lines/videos/audios).  sf_name collapses any
    unrecognized directory to 'sf0.001', which is right for the
    parameter-only synthetic corpora but would let two different custom
    corpora silently share one derived cache — so unknown dirs get a
    path-digest suffix instead."""
    import hashlib as _hl

    base = os.path.basename(os.path.normpath(sf_dir))
    if base in SF_GROUPS:
        return base
    digest = _hl.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"{base}_{digest}"


def fixture_dir(sf_dir: str, hash_size: int = 8) -> str:
    """v2: the corpus is hash_size-independent (phash is always the 64-bit
    precomputed column; wide-hash runs recompute from bytes), so all configs
    share one cached build.  The version tag invalidates v1 caches built
    before the strict-mode media groups existed."""
    root = os.environ.get("DEDUP_FIXTURE_ROOT", os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    sfn = sf_name(sf_dir)
    # r4 bump (sfimg _v4, others _v3): jpg went stub→native, so the
    # strict-media class re-keyed to mp4/flac payloads and a REAL-jpg
    # group class (q90 base / byte copy / q65 re-encode) was added
    ver = "_v4" if sfn == "sfimg" else "_v3"
    return os.path.join(root, f"{sfn}{ver}")


def ensure_fixture(sf_dir: str, hash_size: int = 8, n_groups: int | None = None) -> str:
    """Build (once) and cache the images+truth parquet for an sf tier.

    Sharded parquet: groups are generated in contiguous shards so the bench
    corpus (sf0.1, ~64k rows) parallelizes downstream reads; a _SUCCESS
    marker makes the cache crash-safe (partial builds are rebuilt).
    """
    out = fixture_dir(sf_dir, hash_size)
    cfg_groups, size_scale, fmts = SF_GROUPS[sf_name(sf_dir)]
    if n_groups and n_groups != cfg_groups:
        # a custom-sized build must not read or poison the tier's shared
        # cache — give it its own keyed directory
        out = f"{out}_g{n_groups}"
    n_groups = n_groups or cfg_groups
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    import shutil as _sh

    # a crashed earlier build leaves part files here; reusing them via
    # exist_ok would rename leftover extra shards into the "clean" corpus
    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "images"), exist_ok=True)
    os.makedirs(os.path.join(tmp, "truth"), exist_ok=True)
    shard_size = max(50, 500 // size_scale)  # big-image tiers: smaller shards
    spans = [(s0, min(s0 + shard_size, n_groups))
             for s0 in range(0, n_groups, shard_size)]
    if len(spans) > 8 and os.environ.get("DEDUP_FIXTURE_SERIAL") != "1":
        # shards are seeded independently (default_rng([SEED, gid])) so the
        # parallel build is byte-identical to the serial one
        import concurrent.futures as cf

        workers = min(24, os.cpu_count() or 4)
        with cf.ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_write_shard,
                        [(tmp, s0, s1, hash_size, size_scale, fmts)
                         for s0, s1 in spans],
                        chunksize=1))
    else:
        for s0, s1 in spans:
            _write_shard((tmp, s0, s1, hash_size, size_scale, fmts))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _write_shard(args) -> None:
    tmp, g0, g1, hash_size, size_scale, fmts = args
    imgs, truth = _build_shard(g0, g1, hash_size, size_scale, fmts)
    pq.write_table(imgs, os.path.join(tmp, "images", f"part-{g0:06d}.parquet"))
    pq.write_table(truth, os.path.join(tmp, "truth", f"part-{g0:06d}.parquet"))


def _build_shard(g0: int, g1: int, hash_size: int, size_scale: int = 1,
                 fmts: list[str] | None = None) -> tuple[pa.Table, pa.Table]:
    rows: list[dict] = []
    truth: list[dict] = []
    for gid in range(g0, g1):
        r, t = generate_group(gid, hash_size, size_scale, fmts)
        _finalize_keepers(r, t)
        rows.extend(r)
        truth.extend(t)
    return (
        pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA),
        pa.Table.from_pylist(truth, schema=TRUTH_SCHEMA),
    )


def images_path(sf_dir: str, hash_size: int = 8) -> str:
    return os.path.join(ensure_fixture(sf_dir, hash_size), "images")


def truth_path(sf_dir: str, hash_size: int = 8) -> str:
    return os.path.join(ensure_fixture(sf_dir, hash_size), "truth")


# ---------------------------------------------------------------------------
# oracle-recomputed hash table (for the driver's DuckDB mirrors)

HASHES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("status", pa.string()),
        ("proc_hash", pa.string()),
        ("dhash", pa.int64()),
        ("crc32", pa.string()),
        # real frame count (container formats; 1 for stills) — lets the
        # SQL mirrors rank the full reference quality tuple incl. the
        # animation-wins rule (makeImageSortTuple -frames, dedupc.py:62-68)
        ("frames", pa.int32()),
        # per-image MinHash LSH band keys (cfg.bands values) — lets the SQL
        # mirror reproduce the ENGINE's candidate generation exactly: a
        # caption pair is a candidate iff the two rows share ≥1 band key.
        # MinHash banding is probabilistic (P[detect jac=0.8] ≈ 0.947 at
        # 16 bands × 8 rows), so an exact all-pairs-Jaccard mirror would
        # diverge from the engine on pairs the LSH legitimately misses.
        ("cap_bands", pa.list_(pa.int64())),
        # visual-feature kernel outputs (ImageFeatures, Ray-free here) so
        # the mm_features mirror is a plain projection
        ("edge_e3", pa.int64()),
        ("feat_status", pa.string()),
    ]
)


def _write_hash_shard(args) -> None:
    src, dst, hash_size, hash_fn, *rest = args
    strict = rest[0] if rest else True
    from deduplicator_ray import oracle
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.functions import text as textfn

    cfg = PipelineConfig(hash_size=hash_size, hash_fn=hash_fn, strict=strict)
    # ONE parquet read — the bytes column is the shard's bulk (multi-MB
    # per row on the sfimg tier) and was previously deserialized three
    # times; projections off the in-memory table are cheap slices
    tbl = pq.read_table(src)
    rows = oracle.compute_rows(tbl, cfg)
    crc = {i: hashing.crc32_hex(b)
           for i, b in zip(tbl["image_id"].to_pylist(),
                           tbl["bytes"].to_pylist())}
    caps = [str(r["caption"] or "") for r in rows]
    sigs = textfn.minhash_batch(caps, cfg.shingle_k, cfg.num_perm)
    bands = textfn.band_keys(sigs, cfg.bands, cfg.rows_per_band).view(np.int64)
    from deduplicator_ray.pipelines.multimodal import ImageFeatures

    feats = ImageFeatures()(
        tbl.select(["image_id", "bytes", "w", "h", "fmt"]))
    # float32 arithmetic, same expression as the mm_features projection —
    # a float64 detour could round differently at .5 boundaries
    edge = np.floor(feats["edge_density"].to_numpy(zero_copy_only=False)
                    * 1e3 + 0.5).astype(np.int64)
    fstat = feats["feat_status"].to_pylist()
    out = pa.Table.from_pylist(
        [
            {
                "image_id": r["image_id"],
                "status": r["status"],
                "proc_hash": r["proc_hash"] or "",
                "dhash": r["dhash"] if r["dhash"] is not None else 0,
                "crc32": crc[r["image_id"]],
                "frames": r.get("frames", 1),
                "cap_bands": bands[i].tolist(),
                "edge_e3": int(edge[i]),
                "feat_status": fstat[i],
            }
            for i, r in enumerate(rows)
        ],
        schema=HASHES_SCHEMA,
    )
    pq.write_table(out, dst)


def hashes_path(sf_dir: str, hash_size: int = 8, hash_fn: str = "dhash") -> str:
    """Single-process ORACLE recomputation of every image's fingerprint
    (status, proc_hash, dhash, crc32) as a DuckDB-joinable parquet table.

    The driver's SQL mirrors for the image pipelines run over this table:
    they value-check the DISTRIBUTED engine's grouping / thresholding /
    keeper-election / pair-verification orchestration against an
    independent, Ray-free recomputation.  The hash KERNEL itself is shared
    library code (oracle.compute_rows uses the same codecs/hashing modules
    the engine does) — kernel correctness is pinned separately by the
    property and golden tests; what the mirror cannot re-derive in SQL is
    exactly the per-image decode, so that part ships as data."""
    base = ensure_fixture(sf_dir, hash_size)
    suffix = "" if hash_fn == "dhash" else f"_{hash_fn}"
    # v2: the sidecar grew a ``frames`` column — the bumped directory name
    # invalidates caches built before it existed
    out = os.path.join(base, f"hashes_h{hash_size}{suffix}_v2")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    img_dir = os.path.join(base, "images")
    shards = sorted(f for f in os.listdir(img_dir) if f.endswith(".parquet"))
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    jobs = [(os.path.join(img_dir, f), os.path.join(tmp, f), hash_size, hash_fn)
            for f in shards]
    if len(jobs) > 4 and os.environ.get("DEDUP_FIXTURE_SERIAL") != "1":
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(24, os.cpu_count() or 4)) as ex:
            list(ex.map(_write_hash_shard, jobs, chunksize=1))
    else:
        for j in jobs:
            _write_hash_shard(j)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# non-strict-mode extension corpus: video/animated stand-ins (fmt='vcon')
# for the reference's strict switch (/root/reference/dupedb.py:82-98).
# Kept SEPARATE from the main images corpus so every existing query's
# relation is untouched; the non-strict queries read images ∪ this.

NS_FAMILIES = {"sf0.001": 60, "sf0.01": 600, "sf0.1": 6000}


def _indexed_art(rng: np.random.Generator) -> np.ndarray:
    """Palette-limited RGB art for gif fixtures: an oriented ramp
    quantized onto a 32-step two-color gradient palette — smooth enough
    for a stable dHash, ≤ 32 distinct colors by construction (gif global
    palettes hold 256)."""
    w = int(rng.integers(16, 33)) * 2
    h = int(rng.integers(16, 33)) * 2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ang = rng.uniform(0, 2 * np.pi)
    ramp = np.cos(ang) * xx / w + np.sin(ang) * yy / h
    ramp = (ramp - ramp.min()) / max(ramp.ptp(), 1e-9)
    idx = np.clip((ramp * 31).astype(np.int64), 0, 31)
    c0 = rng.uniform(20, 235, 3)
    c1 = rng.uniform(20, 235, 3)
    pal = (c0[None, :] + (c1 - c0)[None, :]
           * np.linspace(0, 1, 32)[:, None]).astype(np.uint8)
    return pal[idx]


def nonstrict_images_path(sf_dir: str) -> str:
    """Deterministic vcon corpus (IMAGES_SCHEMA): per family, a base
    video, a RE-ENCODED variant (same frames at a different PNG level —
    byte-distinct, frame-0-pixel-identical: matched only by non-strict
    frame-0 dHash, the pair the reference's GUI default catches and
    strict mode misses), sometimes a byte-identical copy (matched in both
    modes), a 2×-upscaled single-frame poster still (emitted only when
    its dHash provably equals frame 0's, so the animation-wins keeper
    rule is exercised against a HIGHER-resolution single-frame member),
    a single-frame container (framesInImage>1 gate: dHash in both
    modes), and an occasional corrupt container (dead-letter parity)."""
    from deduplicator_ray import codecs, hashing

    sfn = sf_name(sf_dir)
    n_fam = NS_FAMILIES.get(sfn, 60)
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    # _v2: gif families joined when the LZW decoder went native
    out = os.path.join(root, f"nsimgs_{sfn}_v2")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    import shutil as _sh

    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    shard = 200
    for f0 in range(0, n_fam, shard):
        rows: list[dict] = []
        for fid in range(f0, min(f0 + shard, n_fam)):
            rng = np.random.default_rng([SEED, 91, fid])
            d = f"nsvid/{rng.choice(_DIRS)}"
            stem = f"{rng.choice(_WORDS)}_f{fid:05d}"
            base = _base_image(rng)
            h, w = base.shape[:2]
            # 3 scenes: frame 0 is the fingerprint carrier, the rest are
            # perturbations (real multi-frame structure)
            fr1 = np.roll(base, w // 4, axis=1)
            fr2 = _add_noise_psnr(base, 35.0, rng)
            cap = _caption(rng)
            ph = hashing.u64_to_i64(hashing.dhash_u64(base, 8))

            def vrow(iid, blob, ww, hh, phv):
                rows.append(dict(image_id=iid, bytes=blob, w=ww, h=hh,
                                 fmt="vcon", caption=cap, phash=phv))

            scenes1 = [codecs.encode_png(x, 1) for x in (base, fr1, fr2)]
            scenes6 = [codecs.encode_png(x, 6) for x in (base, fr1, fr2)]
            v_base = codecs.encode_vcon(scenes1)
            v_re = codecs.encode_vcon(scenes6)
            assert v_base != v_re  # byte-distinct re-encode by construction
            vrow(f"{d}/{stem}.vcon", v_base, w, h, ph)
            vrow(f"{d}/{stem}_p2.vcon", v_re, w, h, ph)
            if rng.uniform() < 0.5:  # byte-identical copy: both modes match
                vrow(f"{d}/{stem} (2).vcon", v_base, w, h, ph)
            if rng.uniform() < 0.35:
                # poster still: 2× block upscale of frame 0, only when the
                # dHash provably survives the upscale (deterministic gate —
                # both engines recompute from bytes, so a skipped poster is
                # simply absent from the corpus)
                up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
                if hashing.dhash_u64(up, 8) == hashing.dhash_u64(base, 8):
                    rows.append(dict(
                        image_id=f"{d}/{stem}_poster.png",
                        bytes=codecs.encode_png(up, 1), w=2 * w, h=2 * h,
                        fmt="png", caption=cap,
                        phash=hashing.u64_to_i64(hashing.dhash_u64(up, 8))))
            if rng.uniform() < 0.3:  # single-frame container (not animated)
                solo = _base_image(np.random.default_rng([SEED, 92, fid]))
                vrow(f"{d}/{stem}_clip.vcon",
                     codecs.encode_vcon([codecs.encode_png(solo, 1)]),
                     solo.shape[1], solo.shape[0],
                     hashing.u64_to_i64(hashing.dhash_u64(solo, 8)))
            if rng.uniform() < 0.05:  # corrupt container → dead letter
                vrow(f"{d}/{stem}_bad.vcon", v_base[: len(v_base) // 3],
                     w, h, 0)
            if rng.uniform() < 0.45:
                # REAL animated-image family (gif, native LZW decode):
                # an animated gif, a byte-distinct sibling with identical
                # frames (delay differs → different bytes, same pixels —
                # strict md5 misses it, non-strict frame-0 dHash matches)
                # and a single-frame gif of the same art (NOT an
                # animation: dHash in BOTH modes)
                g0 = _indexed_art(rng)
                gh, gw = g0.shape[:2]
                g1 = np.roll(g0, gw // 3, axis=1)
                g2 = g0[:, ::-1]
                gb = codecs.encode_gif([g0, g1, g2], delay_cs=10)
                gre = codecs.encode_gif([g0, g1, g2], delay_cs=25)
                assert gb != gre
                gph = hashing.u64_to_i64(hashing.dhash_u64(g0, 8))
                for iid, blob in ((f"{d}/{stem}_anim.gif", gb),
                                  (f"{d}/{stem}_anim2.gif", gre)):
                    rows.append(dict(image_id=iid, bytes=blob, w=gw, h=gh,
                                     fmt="gif", caption=cap, phash=gph))
                rows.append(dict(
                    image_id=f"{d}/{stem}_still.gif",
                    bytes=codecs.encode_gif([g0]), w=gw, h=gh,
                    fmt="gif", caption=cap, phash=gph))
        pq.write_table(pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA),
                       os.path.join(tmp, f"part-{f0:06d}.parquet"))
    if os.path.exists(out):
        _sh.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# PNG-breadth extension corpus: the SAME pixels re-saved through every PNG
# layout the decoder supports (palette / grayscale / gray+alpha / RGBA /
# 16-bit / Adam7 interlace) — byte-distinct, pixel-identical re-saves that
# the reference (PIL open → dHash, dupedb.py:85-86) clusters together and
# a truecolor-only decoder would dead-letter.  Kept SEPARATE from the main
# images corpus so every existing query's relation is untouched.

PNGX_FAMILIES = {"sf0.001": 40, "sf0.01": 400, "sf0.1": 4000}


def pngx_images_path(sf_dir: str) -> str:
    """Deterministic PNG-variant corpus (IMAGES_SCHEMA).  Per family, a
    truecolor base plus a rotating subset of variant re-saves:

    - rgb16 (color 2 / depth 16), rgba (6/8), rgba16 (6/16)
    - Adam7-interlaced truecolor (2/8/interlace 1)
    - grayscale families: (0/8), gray+alpha (4/8), 16-bit gray (0/16),
      4-bit gray (0/4, values quantized to multiples of 17)
    - palette families (``_indexed_art``, ≤32 colors): (3/8) and
      interlaced (3/8/1)
    - an occasional truncated blob (dead-letter parity)

    Every non-corrupt variant decodes to the base's exact pixels under
    the PIL conversion rules, so reference-mode clustering must put each
    family in ONE proc_hash bucket."""
    from deduplicator_ray import codecs, hashing

    sfn = sf_name(sf_dir)
    n_fam = PNGX_FAMILIES.get(sfn, 40)
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"pngx_{sfn}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    import shutil as _sh

    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    shard = 200
    for f0 in range(0, n_fam, shard):
        rows: list[dict] = []
        for fid in range(f0, min(f0 + shard, n_fam)):
            rng = np.random.default_rng([SEED, 97, fid])
            d = f"pngx/{rng.choice(_DIRS)}"
            stem = f"{rng.choice(_WORDS)}_p{fid:05d}"
            cap = _caption(rng)
            kind = fid % 3

            def prow(suffix, img, blob):
                rows.append(dict(
                    image_id=f"{d}/{stem}_{suffix}.png", bytes=blob,
                    w=img.shape[1], h=img.shape[0], fmt="png",
                    caption=cap,
                    phash=hashing.u64_to_i64(hashing.dhash_u64(img, 8))))

            if kind == 0:           # truecolor family
                base = _base_image(rng)
                prow("rgb", base, codecs.encode_png(base, 1))
                prow("rgb16", base, codecs.encode_png_ex(base, 2, 16))
                prow("rgba", base, codecs.encode_png_ex(base, 6, 8))
                if rng.uniform() < 0.5:
                    prow("rgba16", base, codecs.encode_png_ex(base, 6, 16))
                prow("adam7", base, codecs.encode_png_ex(base, 2, 8, 1))
            elif kind == 1:         # grayscale family
                b = _base_image(rng)
                g = (0.299 * b[:, :, 0] + 0.587 * b[:, :, 1]
                     + 0.114 * b[:, :, 2]).astype(np.uint8)
                gi = np.repeat(g[:, :, None], 3, axis=2)
                prow("gray", gi, codecs.encode_png_ex(gi, 0, 8))
                prow("graya", gi, codecs.encode_png_ex(gi, 4, 8))
                if rng.uniform() < 0.5:
                    prow("gray16", gi, codecs.encode_png_ex(gi, 0, 16))
                q = ((g // 17) * 17).astype(np.uint8)
                qi = np.repeat(q[:, :, None], 3, axis=2)
                prow("gray4", qi, codecs.encode_png_ex(qi, 0, 4))
                prow("gray4rgb", qi, codecs.encode_png(qi, 1))
            else:                   # palette family
                art = _indexed_art(rng)
                prow("pal", art, codecs.encode_png_ex(art, 3, 8))
                prow("pal7", art, codecs.encode_png_ex(art, 3, 8, 1))
                prow("palrgb", art, codecs.encode_png(art, 1))
            if rng.uniform() < 0.08:  # corrupt → dead-letter parity
                bad = codecs.encode_png(_base_image(rng), 1)
                rows.append(dict(
                    image_id=f"{d}/{stem}_bad.png",
                    bytes=bad[: len(bad) // 3],
                    w=0, h=0, fmt="png", caption=cap, phash=0))
        pq.write_table(pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA),
                       os.path.join(tmp, f"part-{f0:06d}.parquet"))
    if os.path.exists(out):
        _sh.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


PROJPG_FAMILIES = {"sf0.001": 30, "sf0.01": 300, "sf0.1": 3000}


def projpg_images_path(sf_dir: str) -> str:
    """Progressive-JPEG extension corpus (IMAGES_SCHEMA): per family a
    BASELINE jpg and its PROGRESSIVE (SOF2) re-save at the same quality —
    byte-distinct streams carrying identical quantized coefficients, so
    they decode pixel-identical and must co-cluster (the reference
    hashes whatever PIL opens; progressive is ~10%% of real web JPEGs
    and used to dead-letter).  Some families add a quality-shifted
    progressive near-dup (different bytes AND pixels, same dHash when
    the hash provably survives re-quantization) and an occasional
    truncated stream (dead-letter parity)."""
    from deduplicator_ray import codecs, hashing, jpeg

    sfn = sf_name(sf_dir)
    n_fam = PROJPG_FAMILIES.get(sfn, 30)
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"projpg_{sfn}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    import shutil as _sh

    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    shard = 100
    for f0 in range(0, n_fam, shard):
        rows: list[dict] = []
        for fid in range(f0, min(f0 + shard, n_fam)):
            rng = np.random.default_rng([SEED, 98, fid])
            d = f"projpg/{rng.choice(_DIRS)}"
            stem = f"{rng.choice(_WORDS)}_j{fid:05d}"
            cap = _caption(rng)
            base = _base_image(rng)
            h, w = base.shape[:2]
            q = int(rng.choice([75, 85, 92]))
            sub = bool(rng.uniform() < 0.6)
            b_blob = jpeg.encode_jpeg(base, q, subsample=sub)
            p_blob = jpeg.encode_jpeg_progressive(base, q, subsample=sub)
            assert b_blob != p_blob
            px = jpeg.decode_jpeg(b_blob)
            ph = hashing.u64_to_i64(hashing.dhash_u64(px, 8))

            def jrow(iid, blob, phv):
                rows.append(dict(image_id=iid, bytes=blob, w=w, h=h,
                                 fmt="jpg", caption=cap, phash=phv))

            jrow(f"{d}/{stem}_base.jpg", b_blob, ph)
            jrow(f"{d}/{stem}_prog.jpg", p_blob, ph)
            if rng.uniform() < 0.4:
                # quality-shifted progressive near-dup, admitted only
                # when the dHash provably survives re-quantization (both
                # engines recompute from bytes, so a skipped member is
                # simply absent — the deterministic-gate pattern the
                # nonstrict poster rows use)
                q2 = 60 if q > 70 else 90
                p2 = jpeg.encode_jpeg_progressive(base, q2, subsample=sub)
                px2 = jpeg.decode_jpeg(p2)
                if hashing.dhash_u64(px2, 8) == hashing.dhash_u64(px, 8):
                    jrow(f"{d}/{stem}_prog2.jpg", p2, ph)
            if rng.uniform() < 0.08:
                jrow(f"{d}/{stem}_bad.jpg", p_blob[: len(p_blob) // 3], 0)
        pq.write_table(pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA),
                       os.path.join(tmp, f"part-{f0:06d}.parquet"))
    if os.path.exists(out):
        _sh.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


MP4X_FAMILIES = {"sf0.001": 30, "sf0.01": 300, "sf0.1": 3000}


def _container_images_path(sf_dir: str, kind: str, encode_fn,
                           frame_hi: int, fps: int, widths: tuple,
                           seed_tag: int, junk_len: int) -> str:
    """Shared builder for the real-container metadata corpora (mp4x /
    webmx — review-found twin ~50-line copies folded): per family a
    well-formed container with real frame count/duration/dims plus a
    byte-identical copy, and occasionally random-byte or truncated
    pseudo-files (stub fallback, frames=1)."""
    sfn = sf_name(sf_dir)
    n_fam = MP4X_FAMILIES.get(sfn, 30)
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"{kind}_{sfn}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    import shutil as _sh

    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ext = kind[:-1]  # 'mp4x' → 'mp4', 'webmx' → 'webm'
    rows: list[dict] = []
    for fid in range(n_fam):
        rng = np.random.default_rng([SEED, seed_tag, fid])
        d = f"{kind}/{rng.choice(_DIRS)}"
        stem = f"{rng.choice(_WORDS)}_{kind[0]}{fid:05d}"
        cap = _caption(rng)
        nf = int(rng.integers(2, frame_hi))
        dur = int(nf * 1000 // fps)
        w = int(rng.choice(widths))
        h = int(w * 9 // 16)
        blob = encode_fn(nf, dur, w, h, seed=fid)

        def crow(iid, b):
            rows.append(dict(image_id=iid, bytes=b, w=0, h=0, fmt=ext,
                             caption=cap, phash=0))

        crow(f"{d}/{stem}.{ext}", blob)
        crow(f"{d}/{stem} (copy).{ext}", blob)
        if rng.uniform() < 0.3:
            junk = rng.integers(0, 256, junk_len, dtype=np.uint8).tobytes()
            crow(f"{d}/{stem}_junk.{ext}", junk)
        if rng.uniform() < 0.2:
            crow(f"{d}/{stem}_trunc.{ext}", blob[: len(blob) // 4])
    pq.write_table(pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA),
                   os.path.join(tmp, "part-000000.parquet"))
    if os.path.exists(out):
        _sh.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def mp4x_images_path(sf_dir: str) -> str:
    """Real-container mp4 corpus (IMAGES_SCHEMA): well-formed ISO BMFF
    streams (ftyp/moov/trak/stsz — real frame count, duration, track
    dims; filler mdat) — see ``_container_images_path``."""
    from deduplicator_ray import codecs

    return _container_images_path(
        sf_dir, "mp4x", codecs.encode_mp4_stub, 400, 30,
        (320, 640, 1280), 99, 2048)


def mp4x_hashes_path(sf_dir: str, hash_size: int = 8) -> str:
    """Ray-free oracle hash sidecar (with REAL frames) over the mp4
    container corpus."""
    return _oracle_hash_sidecar(mp4x_images_path(sf_dir), hash_size)


def projpg_hashes_path(sf_dir: str, hash_size: int = 8) -> str:
    """Ray-free oracle hash sidecar over the progressive-JPEG corpus
    (``hashes_path`` pattern)."""
    return _oracle_hash_sidecar(projpg_images_path(sf_dir), hash_size)


def webmx_images_path(sf_dir: str) -> str:
    """Real-container webm corpus (IMAGES_SCHEMA): well-formed Matroska
    EBML streams (Info/Tracks/Cluster SimpleBlocks) — see
    ``_container_images_path``."""
    from deduplicator_ray import codecs

    return _container_images_path(
        sf_dir, "webmx", codecs.encode_webm_stub, 300, 24,
        (426, 854, 1920), 100, 1536)


def webmx_hashes_path(sf_dir: str, hash_size: int = 8) -> str:
    """Ray-free oracle hash sidecar (with REAL frames) over the webm
    container corpus."""
    return _oracle_hash_sidecar(webmx_images_path(sf_dir), hash_size)


def _oracle_hash_sidecar(img_dir: str, hash_size: int = 8) -> str:
    """Shared sidecar writer for the extension corpora: Ray-free oracle
    recompute of every row's fingerprint (+frames) into
    ``{img_dir}_hashes_h{N}``, crash-safe via tmp+rename, parallel over
    shards (one implementation — review-found: three copies drifted,
    one silently dropping the parallel branch)."""
    out = f"{img_dir}_hashes_h{hash_size}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shards = sorted(f for f in os.listdir(img_dir) if f.endswith(".parquet"))
    tmp = out + ".tmp"
    import shutil as _sh

    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    jobs = [(os.path.join(img_dir, f), os.path.join(tmp, f), hash_size,
             "dhash") for f in shards]
    if len(jobs) > 4 and os.environ.get("DEDUP_FIXTURE_SERIAL") != "1":
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(24, os.cpu_count() or 4)) as ex:
            list(ex.map(_write_hash_shard, jobs, chunksize=1))
    else:
        for j in jobs:
            _write_hash_shard(j)
    if os.path.exists(out):
        _sh.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def pngx_hashes_path(sf_dir: str, hash_size: int = 8) -> str:
    """Ray-free oracle hash sidecar over the PNG-variant corpus (the
    ``hashes_path`` pattern: the per-image decode ships as data so the
    DuckDB mirror value-checks the distributed clustering)."""
    return _oracle_hash_sidecar(pngx_images_path(sf_dir), hash_size)


def nonstrict_hashes_path(sf_dir: str, strict: bool = False,
                          hash_size: int = 8) -> str:
    """Oracle hash sidecar over the non-strict extension corpus, computed
    under the requested mode (default non-strict — the mode the queries
    mirror; the strict variant exists so tests can pin the contrast:
    re-encoded videos match ONLY in non-strict mode)."""
    img_dir = nonstrict_images_path(sf_dir)
    # strict _v2: the vcon class now md5s in strict mode regardless of
    # frame count (reference isVideo branch, dupedb.py:88-90) — caches
    # built under the old nf>1-only gate are stale for single-frame clips
    mode = "strict_v2" if strict else "nonstrict"
    out = f"{img_dir}_hashes_{mode}_h{hash_size}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shards = sorted(f for f in os.listdir(img_dir) if f.endswith(".parquet"))
    tmp = out + ".tmp"
    import shutil as _sh

    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    jobs = [(os.path.join(img_dir, f), os.path.join(tmp, f), hash_size,
             "dhash", strict) for f in shards]
    if len(jobs) > 4 and os.environ.get("DEDUP_FIXTURE_SERIAL") != "1":
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(24, os.cpu_count() or 4)) as ex:
            list(ex.map(_write_hash_shard, jobs, chunksize=1))
    else:
        for j in jobs:
            _write_hash_shard(j)
    if os.path.exists(out):
        _sh.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# per-doc text-kernel sidecar (for the docs DuckDB mirrors)

DOC_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),   # matches documents.parquet's key dtype
        ("simhash", pa.int64()),
        ("fingerprint", pa.int64()),
        ("n_tokens_bpe", pa.int64()),
    ]
)


def doc_features_path(sf_dir: str) -> str:
    """Ray-free single-process recomputation of the per-doc text kernels
    (SimHash, winnowing fingerprint, BPE-ish token count) over the driver's
    ``documents.parquet`` — the non-SQL kernels ship as data so the DuckDB
    mirrors can value-check the DISTRIBUTED pipelines: ``docs_simhash_pairs``
    becomes a pure Hamming cross-join over this table, ``docs_fingerprints``
    a projection (same pattern as ``hashes_path`` for images)."""
    import pyarrow.compute as pc

    from deduplicator_ray.functions import text as textfn

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"docfeat_{os.path.basename(os.path.normpath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    texts = [str(x) for x in src["text"].to_pylist()]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pc.cast(src["doc_id"].combine_chunks(), pa.int64()),
            "simhash": pa.array(textfn.simhash_batch(texts).view(np.int64)),
            "fingerprint": pa.array(
                np.fromiter((textfn.rolling_fingerprint(s) for s in texts),
                            np.int64, count=len(texts))),
            "n_tokens_bpe": pa.array(
                np.fromiter((textfn.token_count_bpe(s) for s in texts),
                            np.int64, count=len(texts))),
        },
        schema=DOC_FEATURES_SCHEMA,
    )
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# IVF sidecar (bucket assignment + probe lists) for the ann_ivf_topk mirror


def ivf_sidecar_path(sf_dir: str, n_centroids: int = 16, nprobe: int = 4,
                     n_queries: int = 4) -> str:
    """Ray-free recomputation of the IVF index's DISCRETE decisions — which
    bucket each vector lands in, which buckets each query probes — written
    as two parquet tables (``assign``: vec_id→bucket; ``probes``:
    query_id→bucket).  k-means training and assignment reuse the engine's
    own deterministic kernels (functions.vector, seeds fixed), so the SQL
    mirror reduces ann_ivf_topk to exact cosine top-k WITHIN the probed
    buckets — checking the distributed index build + pruned search against
    a single-process replay of the same math."""
    import pyarrow.compute as pc

    from deduplicator_ray.functions import vector as vfn

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"ivf_{os.path.basename(os.path.normpath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    src = src.filter(pc.is_valid(src["embedding"]))  # null vectors drop
    ids = src["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.stack(src["embedding"].to_pylist()).astype(np.float64)
    # vec_id-sorted prefix — the engine's sample_rows_absolute sorts by id
    # before truncating, and train_centroids' seeded index choice depends
    # on row ORDER, not just the set (same policy as pq_sidecar_path)
    sample = x[np.argsort(ids, kind="stable")][:65536]
    cents = vfn.train_centroids(sample, n_centroids)
    xn = vfn._normalize(x)
    assign = np.argmax(xn @ cents.T, axis=1).astype(np.int64)
    qmask = ids < n_queries
    probes = np.argsort(-(xn[qmask] @ cents.T), axis=1)[:, :nprobe]
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"vec_id": ids, "bucket": assign}),
        os.path.join(tmp, "assign.parquet"))
    pq.write_table(
        pa.table({
            "query_id": np.repeat(ids[qmask], probes.shape[1]),
            "bucket": probes.reshape(-1).astype(np.int64),
        }),
        os.path.join(tmp, "probes.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# SRP-LSH sidecar (band-key assignment) for the emb_srp_pairs mirror


def srp_sidecar_path(sf_dir: str) -> str:
    """Ray-free replay of the SRP-LSH DISCRETE decisions — which (band, key)
    buckets each embedding lands in — as one parquet of (vec_id, band, bkey)
    rows.  The hyperplanes are derived from a fixed seed
    (functions.vector.srp_band_keys, float64 throughout), so the sidecar and
    the distributed banding stage compute bit-identical keys; the SQL mirror
    then reduces emb_srp_pairs to "exact cosine pairs RESTRICTED to
    co-bucketed candidates" — checking the engine's shuffle/verify/owner
    logic against a single-process replay of the same hash."""
    from deduplicator_ray.functions import vector as vfn

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"srp_{os.path.basename(os.path.normpath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    src = src.filter(pc.is_valid(src["embedding"]))  # null vectors drop
    ids = src["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.stack(src["embedding"].to_pylist()).astype(np.float64)
    keys = vfn.srp_band_keys(x)
    nbands = keys.shape[1]
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({
            "vec_id": np.repeat(ids, nbands),
            "band": np.tile(np.arange(nbands, dtype=np.int64), len(ids)),
            "bkey": keys.reshape(-1),
        }),
        os.path.join(tmp, "assign.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# prototypicality sidecar (k-means bucket assignment + the centroid matrix
# itself, long-form) for the emb_prototypicality / emb_bucket_outliers
# mirrors


def proto_sidecar_path(sf_dir: str, n_centroids: int = 16) -> str:
    """Ray-free replay of the prototypicality operator's MODEL — the seeded
    k-means centroids (engine kernel functions.vector.train_centroids, same
    absolute sample cap) and each vector's argmax bucket — written as two
    parquet tables (``assign``: vec_id→bucket; ``centroids``: long-form
    (bucket, dim, val)).  The centroids are what SQL cannot derive (an
    iterative algorithm), so they ship as data; the mirror then reduces
    prototypicality to plain per-row cosine against the joined centroid —
    checking the distributed train/assign/score against a single-process
    replay of the same math."""
    import pyarrow.compute as pc

    from deduplicator_ray.functions import vector as vfn

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(
        root, f"proto_{os.path.basename(os.path.normpath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    src = src.filter(pc.is_valid(src["embedding"]))  # null vectors drop
    ids = src["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.stack(src["embedding"].to_pylist()).astype(np.float64)
    # vec_id-sorted prefix — see ivf sidecar note (order-sensitive k-means)
    cents = vfn.train_centroids(
        x[np.argsort(ids, kind="stable")][:65536], n_centroids)
    xn = vfn._normalize(x)
    assign = np.argmax(xn @ cents.T, axis=1).astype(np.int64)
    nb, dim = cents.shape
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"vec_id": ids, "bucket": assign}),
        os.path.join(tmp, "assign.parquet"))
    pq.write_table(
        pa.table({
            "bucket": np.repeat(np.arange(nb, dtype=np.int64), dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), nb),
            "val": cents.reshape(-1),
        }),
        os.path.join(tmp, "centroids.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# CDC chunk sidecar (cutpoint + content-hash kernel replay) for the
# docs_cdc_chunks mirror


def cdc_sidecar_path(sf_dir: str) -> str:
    """Ray-free replay of the content-defined-chunking kernel over the
    documents table — one parquet of (doc_id, chunk_hash, chunk_len) rows.
    The rolling-hash cutpoint rule and span hash are the one thing SQL
    cannot express, so they ship as data (same policy as the image hashes
    sidecar); the mirror then re-derives the distributed
    count/distinct/min-doc election relationally."""
    from deduplicator_ray.functions import text as textfn

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"cdc_{os.path.basename(os.path.normpath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = np.asarray(src["doc_id"].to_pylist(), dtype=np.int64)
    d_idx, _s, ln, h = textfn.cdc_chunk_spans(
        [x or "" for x in src["text"].to_pylist()])
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids[d_idx]),
                  "chunk_hash": pa.array(h),
                  "chunk_len": pa.array(ln)}),
        os.path.join(tmp, "chunks.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# hide-alts suppression decisions for the img_clusters_hidealts mirror


def alt_suppressed_path(sf_dir: str) -> str:
    """The GUI hide-alts loop's sequential DECISIONS as data: which bucket
    members the suppression pass removes (compare.py:527-548 mutates the
    bucket while iterating, so the removal set is defined by sequential
    order, not by a relation — SQL cannot re-derive it, but it CAN consume
    it).  Single-process Ray-free replay of ``suppress_alt_members`` over
    the oracle hashes table, per proc-hash bucket in the same
    sorted-member order the engine uses; one parquet of
    (proc_hash, image_id) removed rows.  The driver mirror re-derives
    bucketing and re-thresholding relationally on top."""
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.alts import suppress_alt_members

    base = ensure_fixture(sf_dir, 8)
    out = os.path.join(base, "alt_suppressed.parquet")
    if os.path.exists(out):
        return out
    cfg = PipelineConfig()
    hdir = hashes_path(sf_dir)
    shards = sorted(f for f in os.listdir(hdir) if f.endswith(".parquet"))
    t = pa.concat_tables(
        pq.read_table(os.path.join(hdir, f),
                      columns=["proc_hash", "image_id", "status"])
        for f in shards)
    buckets: dict[str, list[str]] = {}
    for h, iid, st in zip(t["proc_hash"].to_pylist(), t["image_id"].to_pylist(),
                          t["status"].to_pylist()):
        if st in ("ok", "md5_only") and h.strip("0"):
            buckets.setdefault(h, []).append(iid)
    rows_h, rows_id = [], []
    for h, ids in buckets.items():
        if len(ids) < cfg.threshold:
            continue
        members = sorted(ids)
        kept = set(suppress_alt_members(members))
        for iid in members:
            if iid not in kept:
                rows_h.append(h)
                rows_id.append(iid)
    tmp = out + ".tmp"
    pq.write_table(
        pa.table({"proc_hash": pa.array(rows_h, pa.string()),
                  "image_id": pa.array(rows_id, pa.string())}), tmp)
    os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# alt-namespace table for the series-base self-join (J4)


def alt_namespace_path(sf_dir: str) -> str:
    """Deterministic id-only table exercising every probe branch of
    ``series_alt_pairs`` — the synthetic corpus's random dirs almost never
    co-locate a series member with its base, so this namespace supplies
    directory-coherent families: series runs across each numbering style,
    ``-alt``/`` edit``/`` otm``/`` otn`` variants, multi-extension bases,
    plus negative controls (orphan members, cross-directory bases, indices
    over the reference's 1000 cap).  The engine query and the DuckDB
    mirror both read corpus ∪ namespace, so the pair set is non-degenerate
    at every sf."""
    sfn = sf_name(sf_dir)
    n_fam = {"sf0.001": 120, "sf0.01": 1200, "sf0.1": 12000}.get(sfn, 120)
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"altns_{sfn}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    ids: list[str] = []
    for fid in range(n_fam):
        rng = np.random.default_rng([SEED, 77, fid])
        d = "altns/" + str(rng.choice(_DIRS))
        w = str(rng.choice(_WORDS))
        stem = f"{d}/{w}_f{fid:05d}"
        kind = fid % 10
        if kind == 0:      # " (n)" series
            ids += [f"{stem} (1).png", f"{stem} (2).png", f"{stem} (3).jpg"]
        elif kind == 1:    # "_n" series
            ids += [f"{stem}_1.png", f"{stem}_2.png"]
        elif kind == 2:    # "_pn" pages
            ids += [f"{stem}_p1.gif", f"{stem}_p2.png"]
        elif kind == 3:    # "-imgn"
            ids += [f"{stem}-img1.webm", f"{stem}-img2.png"]
        elif kind == 4:    # "-alt" + base (common-base prefix family)
            ids += [f"{stem}.png", f"{stem}-alt.png"]
        elif kind == 5:    # " edit" / " otm" variants
            ids += [f"{stem}.png", f"{stem} edit.png", f"{stem} otm.png"]
        elif kind == 6:    # trailing-digit series "x1"/"x2"
            ids += [f"{stem}x1.png", f"{stem}x2.png"]
        elif kind == 7:    # orphan: series member with no previous-in-series
            ids += [f"{stem} (5).png"]
        elif kind == 8:    # cross-dir: base exists only in ANOTHER directory
            ids += [f"{stem}-alt.png", f"altns/elsewhere/{w}_f{fid:05d}.png"]
        else:              # index over the reference's 1000 cap → no series
            ids += [f"{stem}_2000.png", f"{stem}_1999.png"]
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({"image_id": pa.array(sorted(ids), pa.string())}),
                   os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def clone_rows(one: pa.Table, n: int, id_prefix: str = "hot/clone") -> pa.Table:
    """n byte-identical clones of ``one``'s first row with fresh image_ids —
    the mega-bucket builder shared by tools/bench_skew.py and the
    end-to-end skew test (one proc_hash bucket of n members)."""
    one = one.slice(0, 1)
    cols = {}
    for name in one.schema.names:
        if name == "image_id":
            cols[name] = pa.array([f"{id_prefix}_{i:07d}.png" for i in range(n)])
        else:
            cols[name] = pa.array([one[name][0].as_py()] * n,
                                  type=one.schema.field(name).type)
    return pa.Table.from_arrays([cols[n_] for n_ in one.schema.names],
                                schema=one.schema)


# ---------------------------------------------------------------------------
# video corpus + frame-fingerprint sidecar (vid_* queries)
#
# No video table exists in the driver testdata, so the corpus is synthesized
# deterministically (same policy as the image corpus): videos are VCON1
# containers of PNG "scene" frames; duplicate structure comes from SHARED
# scene frames.  Per base video i (10 scenes at stride 8 — adjacent bases
# share 2 scenes, so cross-base Jaccard peaks at 2/18 ≈ 0.11, far below
# tau=0.5; the negative control rests on that margin, not on disjointness)
# one variant is emitted:
#   i%3==0  re-encode  — same 10 scenes re-encoded at a different
#                        compression level: different BYTES (md5 misses it),
#                        identical pixels (frame fps match → Jaccard 1.0)
#   i%3==1  clip       — last 8 of the 10 scenes (Jaccard 8/10)
#   i%3==2  teaser     — first 3 scenes (Jaccard 3/10: candidate pair that
#                        the >=0.5 verify must REJECT)
# Every even-indexed video also carries the one HOT scene (a channel ident /
# black-frame analog) to exercise the stop-frame df cap, and one corrupt
# container exercises the dead-letter path.

VID_SCENE_SEED = 771_000_003
VID_SCENES_PER_BASE = 10
VID_SCENE_STRIDE = 8
VID_HOT_SCENE = -1


def _scene_frame(scene: int, reencode: bool = False) -> bytes:
    rng = np.random.default_rng(VID_SCENE_SEED + scene)
    img = _base_image(rng)
    return codecs.encode_png(img, level=9 if reencode else 1)


def _video_rows(n_base: int) -> list[tuple[str, list[int], bool]]:
    rows: list[tuple[str, list[int], bool]] = []
    for i in range(n_base):
        scenes = [i * VID_SCENE_STRIDE + j for j in range(VID_SCENES_PER_BASE)]
        rows.append((f"vid/base{i:05d}.vcon", scenes, False))
        if i % 3 == 0:
            rows.append((f"vid/re{i:05d}.vcon", scenes, True))
        elif i % 3 == 1:
            rows.append((f"vid/clip{i:05d}.vcon", scenes[2:], False))
        else:
            rows.append((f"vid/teaser{i:05d}.vcon", scenes[:3], False))
    return rows


def videos_path(sf_dir: str) -> str:
    """Deterministic video corpus for the vid_* family — one parquet of
    (video_id, bytes, fmt, n_frames).  Size scales with the documents table
    (n_base = max(8, n_docs // 8))."""
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"videos_{content_tag(sf_dir)}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    n_base = max(8, n_docs // 8)
    scene_cache: dict[tuple[int, bool], bytes] = {}

    def frame(s: int, re_: bool) -> bytes:
        key = (s, re_)
        if key not in scene_cache:
            scene_cache[key] = _scene_frame(s, re_)
        return scene_cache[key]

    ids, blobs, nf = [], [], []
    for idx, (vid, scenes, re_) in enumerate(_video_rows(n_base)):
        sc = scenes + ([VID_HOT_SCENE] if idx % 2 == 0 else [])
        ids.append(vid)
        blobs.append(codecs.encode_vcon([frame(s, re_) for s in sc]))
        nf.append(len(sc))
    # tier-cascade surface (vid_dedup_tiers): byte-identical copies and
    # re-encoded remuxes carrying the IDENTICAL frame set (same dHashes,
    # different container bytes) — without them the byte/fpset tiers are
    # vacuous on this corpus
    blob_by_id = dict(zip(ids, blobs))
    nf_by_id = dict(zip(ids, nf))
    for i in range(n_base):
        if i % 5 == 0:
            b = f"vid/base{i:05d}.vcon"
            ids.append(f"vid/copy{i:05d}.vcon")
            blobs.append(blob_by_id[b])
            nf.append(nf_by_id[b])
        if i % 4 == 0:
            # base rows sit at even positions, so they always carry HOT
            sc = [i * VID_SCENE_STRIDE + j
                  for j in range(VID_SCENES_PER_BASE)] + [VID_HOT_SCENE]
            ids.append(f"vid/remux{i:05d}.vcon")
            blobs.append(codecs.encode_vcon([frame(s, True) for s in sc]))
            nf.append(len(sc))
    # dead-letter surface: one corrupt container
    ids.append("vid/corrupt00000.vcon")
    blobs.append(codecs.VCON_MAGIC + b"\xff\xff\xff\xff trunc")
    nf.append(0)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"video_id": pa.array(ids, pa.string()),
                  "bytes": pa.array(blobs, pa.binary()),
                  "fmt": pa.array(["vcon"] * len(ids), pa.string()),
                  "n_frames": pa.array(nf, pa.int32())}),
        os.path.join(tmp, "videos.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def video_frames_path(sf_dir: str) -> str:
    """Ray-free ORACLE recomputation of the per-frame fingerprint kernel
    over the video corpus — one parquet of (video_id, frame_idx, frame_fp)
    rows for decodable videos.  The parse→png-decode→dHash kernel is the
    one thing SQL cannot express, so it ships as data (hashes-sidecar
    policy); the vid_dup_pairs mirror re-derives the stop-frame cap,
    intersection join and Jaccard threshold relationally."""
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"vidframes_{content_tag(sf_dir)}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(videos_path(sf_dir), "videos.parquet"),
                        columns=["video_id", "bytes"])
    ids, idxs, fps, md5s = [], [], [], []
    for vid, blob in zip(src["video_id"].to_pylist(),
                         src["bytes"].to_pylist()):
        try:
            frames = codecs.decode_vcon(blob)
            row_fps = [hashing.dhash_u64(codecs.decode_image(f, "png", 0, 0))
                       for f in frames]
        except codecs.CodecError:
            continue
        # payload md5 rides the sidecar (byte-tier key for the
        # vid_dedup_tiers mirror — DuckDB's md5() is VARCHAR-only, so the
        # BLOB hash is kernel data like the fps)
        m = hashing.md5_hex(blob)
        for j, fp in enumerate(row_fps):
            ids.append(vid)
            idxs.append(j)
            fps.append(fp)
            md5s.append(m)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"video_id": pa.array(ids, pa.string()),
                  "frame_idx": pa.array(idxs, pa.int32()),
                  "frame_fp": pa.array(
                      np.asarray(fps, np.uint64).view(np.int64)),
                  "md5": pa.array(md5s, pa.string())}),
        os.path.join(tmp, "frames.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# audio corpus + window-fingerprint sidecar (aud_* queries)
#
# No audio table exists in the driver testdata, so the corpus is synthesized
# deterministically (same policy as the video corpus): recordings are ACON1
# containers of 16-bit mono PCM; duplicate structure comes from SHARED
# audio segments (each SEG = AUD_WINS_PER_SEG fingerprint windows, so clips
# stay window-aligned).  Per base recording i (10 segments at stride 8 —
# adjacent bases share 2 segments, cross-base Jaccard ≤ 2/18 ≈ 0.11, far
# below tau=0.5; the negative control rests on that margin, not on
# disjointness) one variant is emitted:
#   i%3==0  re-encode  — same samples in the delta codec: different BYTES
#                        (md5 misses it), identical PCM (fps match →
#                        Jaccard 1.0)
#   i%3==1  clip       — last 8 of the 10 segments (Jaccard 8/10)
#   i%3==2  teaser     — first 3 segments (Jaccard 3/10: candidate pair
#                        the >=0.5 verify must REJECT)
# Every even-indexed recording also appends the one HOT segment (digital
# silence — the jingle/black-frame analog, fp 0 for every window) to
# exercise the stop-fp df cap, and one corrupt container exercises the
# dead-letter path.

AUD_SEG_SEED = 881_000_007
AUD_SEGS_PER_BASE = 10
AUD_SEG_STRIDE = 8
AUD_WINS_PER_SEG = 4
AUD_HOT_SEG = -1
AUD_RATE = 16_000


def _audio_segment(seg: int) -> np.ndarray:
    from deduplicator_ray.pipelines.audio_dedup import WINDOW

    n = AUD_WINS_PER_SEG * WINDOW
    if seg == AUD_HOT_SEG:
        return np.zeros(n, np.int16)
    rng = np.random.default_rng(AUD_SEG_SEED + seg)
    return np.clip(rng.standard_normal(n) * 6000, -32000, 32000) \
        .astype(np.int16)


def _audio_rows(n_base: int) -> list[tuple[str, list[int], bool]]:
    rows: list[tuple[str, list[int], bool]] = []
    for i in range(n_base):
        segs = [i * AUD_SEG_STRIDE + j for j in range(AUD_SEGS_PER_BASE)]
        rows.append((f"aud/base{i:05d}.acon", segs, False))
        if i % 3 == 0:
            rows.append((f"aud/re{i:05d}.acon", segs, True))
        elif i % 3 == 1:
            rows.append((f"aud/clip{i:05d}.acon", segs[2:], False))
        else:
            rows.append((f"aud/teaser{i:05d}.acon", segs[:3], False))
    return rows


def audios_path(sf_dir: str) -> str:
    """Deterministic audio corpus for the aud_* family — one parquet of
    (audio_id, bytes, fmt, n_samples).  Size scales with the documents
    table (n_base = max(8, n_docs // 8))."""
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    # _v2: the corpus grew real-WAV re-encode members (stdlib wave codec)
    out = os.path.join(root, f"audios_{content_tag(sf_dir)}_v2")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    n_base = max(8, n_docs // 8)
    seg_cache: dict[int, np.ndarray] = {}

    def seg(s: int) -> np.ndarray:
        if s not in seg_cache:
            seg_cache[s] = _audio_segment(s)
        return seg_cache[s]

    ids, blobs, ns = [], [], []
    for idx, (aid, segs, re_) in enumerate(_audio_rows(n_base)):
        sc = segs + ([AUD_HOT_SEG] if idx % 2 == 0 else [])
        pcm = np.concatenate([seg(s) for s in sc])
        ids.append(aid)
        blobs.append(codecs.encode_acon(
            pcm, AUD_RATE,
            codecs.ACON_CODEC_DELTA if re_ else codecs.ACON_CODEC_RAW))
        ns.append(len(pcm))
    # tier-cascade surface (aud_dedup_tiers): byte-identical copies and
    # lossless delta re-encodes of the IDENTICAL sample stream (same
    # window fps, different container bytes)
    blob_by_id = dict(zip(ids, blobs))
    ns_by_id = dict(zip(ids, ns))
    for i in range(n_base):
        if i % 5 == 0:
            b = f"aud/base{i:05d}.acon"
            ids.append(f"aud/copy{i:05d}.acon")
            blobs.append(blob_by_id[b])
            ns.append(ns_by_id[b])
        if i % 4 == 0:
            # base rows sit at even positions, so they always carry HOT
            sc = [i * AUD_SEG_STRIDE + j
                  for j in range(AUD_SEGS_PER_BASE)] + [AUD_HOT_SEG]
            pcm = np.concatenate([seg(s) for s in sc])
            ids.append(f"aud/delta{i:05d}.acon")
            blobs.append(codecs.encode_acon(
                pcm, AUD_RATE, codecs.ACON_CODEC_DELTA))
            ns.append(len(pcm))
        if i % 6 == 0:
            # REAL-codec re-encode: the same sample stream in a RIFF/WAVE
            # container (stdlib wave encoder) — byte-distinct from every
            # acon member, PCM-identical to the base, so it must land in
            # the base's fp-set cluster (the wav stub→native flip's
            # end-to-end witness)
            sc = [i * AUD_SEG_STRIDE + j
                  for j in range(AUD_SEGS_PER_BASE)] + [AUD_HOT_SEG]
            pcm = np.concatenate([seg(s) for s in sc])  # == base i's PCM
            ids.append(f"aud/wav{i:05d}.wav")
            blobs.append(codecs.encode_wav(pcm, AUD_RATE))
            ns.append(len(pcm))
    # dead-letter surface: one corrupt container
    ids.append("aud/corrupt00000.acon")
    blobs.append(codecs.ACON_MAGIC + b"\x00\xff trunc")
    ns.append(0)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"audio_id": pa.array(ids, pa.string()),
                  "bytes": pa.array(blobs, pa.binary()),
                  "fmt": pa.array([i.rsplit(".", 1)[-1] for i in ids],
                                  pa.string()),
                  "n_samples": pa.array(ns, pa.int64())}),
        os.path.join(tmp, "audios.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def audio_fps_path(sf_dir: str) -> str:
    """Ray-free ORACLE recomputation of the per-window fingerprint kernel
    over the audio corpus — one parquet of (audio_id, win_idx, win_fp)
    rows for decodable recordings.  The parse→PCM→band-energy-sign kernel
    is the one thing SQL cannot express, so it ships as data
    (hashes-sidecar policy); the aud_dup_pairs mirror re-derives the
    stop-fp cap, intersection join and Jaccard threshold relationally."""
    from deduplicator_ray.pipelines.audio_dedup import audio_window_fps

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"audfps_{content_tag(sf_dir)}_v2")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(audios_path(sf_dir), "audios.parquet"),
                        columns=["audio_id", "bytes"])
    ids, idxs, fps, md5s = [], [], [], []
    for aid, blob in zip(src["audio_id"].to_pylist(),
                         src["bytes"].to_pylist()):
        try:
            _rate, pcm = codecs.decode_audio(blob)
        except codecs.CodecError:
            continue
        row = audio_window_fps(pcm)
        # payload md5 rides the sidecar (byte-tier key for the
        # aud_dedup_tiers mirror; DuckDB md5() is VARCHAR-only)
        m = hashing.md5_hex(blob)
        ids.extend([aid] * len(row))
        idxs.extend(range(len(row)))
        fps.extend(row.tolist())
        md5s.extend([m] * len(row))
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"audio_id": pa.array(ids, pa.string()),
                  "win_idx": pa.array(idxs, pa.int32()),
                  "win_fp": pa.array(np.asarray(fps, np.int64)),
                  "md5": pa.array(md5s, pa.string())}),
        os.path.join(tmp, "fps.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# PII-bearing document corpus (docs_pii_* queries)
#
# The driver's synthetic documents are PII-free word salad, so the PII
# scrub operators would be vacuous over them.  This sidecar injects
# deterministic PII spans (emails / IPv4s / phone numbers in rigid,
# unambiguous formats) into a doc_id-derived subset of documents — the
# engine (Python `re` kernels) and the DuckDB mirror (RE2 kernels) then
# both run over the SAME injected table, making this a genuine
# cross-engine regex-semantics check rather than a sidecar replay.

def docs_pii_path(sf_dir: str) -> str:
    """Deterministic PII-injected copy of the documents table — one
    parquet of (doc_id, text)."""
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"docspii_{content_tag(sf_dir)}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    inj = []
    for did, txt in zip(ids, texts):
        parts = [txt or ""]
        if did % 5 == 0:
            parts.append(f"contact user{did}@example.com for access")
        if did % 7 == 0:
            parts.append(f"origin host 10.{did % 256}.{(did * 3) % 256}."
                         f"{(did * 7) % 256} logged")
        if did % 11 == 0:
            parts.append(f"support line +1 {100 + did % 900:03d}-"
                         f"{100 + (did * 13) % 900:03d}-"
                         f"{1000 + did % 9000:04d}")
        if did % 35 == 0:
            parts.append(f"cc billing{did}@corp.example.org")
        inj.append(" ".join(parts))
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": src["doc_id"],
                  "text": pa.array(inj, pa.string())}),
        os.path.join(tmp, "docs_pii.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# Multi-line document corpus (docs_line_dedup / docs_boilerplate_lines)
#
# The driver's synthetic documents are single-line word salad, so
# line-level dedup (the CCNet/RefinedWeb boilerplate-removal pass:
# drop any line whose exact content recurs across >= 2 distinct
# documents) would be vacuous over them.  This sidecar re-wraps each
# document into 8-word lines and injects deterministic boilerplate lines
# (nav/footer strings shared by doc_id-derived subsets) plus occasional
# empty lines — the engine and the DuckDB mirror both run over the SAME
# table, so the check exercises real cross-document line recurrence
# (including word-salad chunk collisions, not only the injected strings).

_BOILERPLATE_LINES = [
    "subscribe to our newsletter for weekly updates",
    "all rights reserved terms of service apply",
    "click here to read the full article",
    "share this story on your favorite network",
    "sign in to continue reading this content",
    "copyright example media group contact legal",
]


def docs_lines_path(sf_dir: str) -> str:
    """Deterministic multi-line copy of the documents table — one parquet
    of (doc_id, text) where text contains newline-separated lines."""
    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"docslines_{content_tag(sf_dir)}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    docs = []
    for did, txt in zip(ids, texts):
        words = (txt or "").split()
        lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
        if not lines:
            lines = [""]
        # injected boilerplate: header for even ids, footer for ids%3==0,
        # a second footer family for ids%7 — enough overlap that most
        # boilerplate lines span many docs while some docs carry none
        if did % 2 == 0:
            lines.insert(0, _BOILERPLATE_LINES[did % 3])
        if did % 3 == 0:
            lines.append(_BOILERPLATE_LINES[3 + (did // 3) % 3])
        if did % 7 == 0:
            lines.insert(len(lines) // 2, "")  # empty lines are never removed
        docs.append("\n".join(lines))
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": src["doc_id"],
                  "text": pa.array(docs, pa.string())}),
        os.path.join(tmp, "docs_lines.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# PQ sidecar (codebook-encode + ADC lookup-table replay) for the
# emb_pq_topk mirror


def pq_sidecar_path(sf_dir: str) -> str:
    """Ray-free replay of the product-quantization DISCRETE decisions —
    each vector's per-subspace code and each query's e6 ADC lookup table —
    as two parquet tables (``codes``: (vec_id, sub, code); ``lut``:
    (query_id, sub, code, dot_e6)).  The codebooks are what SQL cannot
    derive (iterative k-means), so they ship as data through the LUT; the
    mirror then reduces emb_pq_topk to a join + grouped sum + rank —
    checking the engine's distributed encode/scan/merge against a
    single-process replay of the same math (engine kernels
    functions.vector.train_pq_codebooks / pq_encode / pq_lut_e6, same
    vec_id-sorted absolute sample cap as IVF/prototypicality)."""
    from deduplicator_ray.functions import vector as vfn

    root = os.environ.get(
        "DEDUP_FIXTURE_ROOT",
        os.path.join(tempfile.gettempdir(), "dedup_ray_fixtures"))
    out = os.path.join(root, f"pq_{os.path.basename(os.path.normpath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    src = src.filter(pc.is_valid(src["embedding"]))  # null vectors drop
    ids = src["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    x = np.stack(src["embedding"].to_pylist()).astype(np.float64)[order]
    books = vfn.train_pq_codebooks(x[:65536])
    codes = vfn.pq_encode(x, books)
    qmask = ids < 4
    lut = vfn.pq_lut_e6(x[qmask], books)
    qids = ids[qmask]
    m, k = books.shape[0], books.shape[1]
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table({
            "vec_id": np.repeat(ids, m),
            "sub": np.tile(np.arange(m, dtype=np.int64), len(ids)),
            "code": codes.reshape(-1),
        }),
        os.path.join(tmp, "codes.parquet"))
    pq.write_table(
        pa.table({
            "query_id": np.repeat(qids, m * k),
            "sub": np.tile(np.repeat(np.arange(m, dtype=np.int64), k),
                           len(qids)),
            "code": np.tile(np.arange(k, dtype=np.int64), len(qids) * m),
            "dot_e6": lut.reshape(-1),
        }),
        os.path.join(tmp, "lut.parquet"))
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out
