"""End-to-end image dedup pipelines (the flagship).

Two modes:

- **reference mode** — exactly the reference algorithm, distributed:
  decode+hash → filter (ok, nonzero hash — /root/reference/dedupc.py:176-178)
  → ``groupby(dhash)`` (the shuffle that replaces the reference's
  ``dict[hash → [paths]]`` store, dupedb.py:104-132) → per-bucket keeper
  election (dedupc.py:157-229).  Oracle-comparable bit-for-bit.

- **extended mode** (north star) — adds caption MinHash/SimHash signatures,
  LSH banding over both image-hash slices and caption bands, in-bucket
  verification (Hamming ≤ t / exact shingle Jaccard ≥ j), distributed
  connected components, then the same keeper election per component.

All stages stream; nothing materializes the input except the CC assignment
table (small — edge nodes only).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray import io as dio

from deduplicator_ray import fixtures, tuning
from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.stages.banding import make_banding
from deduplicator_ray.stages.candidates import make_partition_verify
from deduplicator_ray.stages.components import connected_components
from deduplicator_ray.stages.decode_hash import make_decode_hash
from deduplicator_ray.stages.partitioned import (
    drop_duplicates,
    filter_min_group_size,
    partitioned_groupby,
)
from deduplicator_ray.stages.resolve import make_partition_resolve, make_resolve
from deduplicator_ray.stages.signatures import CaptionSignatures


def load_images(sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Read the synthetic images corpus for this sf tier (built+cached on
    first use).  Columns are NOT pruned here: decode needs bytes; callers
    that only need metadata should read with ``columns=``.

    ``cfg.files_exempt`` substrings filter ids at the source (S2,
    /root/reference/dedupc.py:687-691: drop any path containing an exempt
    substring) — vectorized, applied before the bytes leave the read stage."""
    tuning.tune()
    ds = dio.read_parquet(fixtures.images_path(sf_dir, cfg.hash_size))
    if cfg.files_exempt:
        ds = apply_exempt(ds, cfg.files_exempt)
    return ds


def apply_exempt(ds: rd.Dataset, substrings: tuple[str, ...],
                 id_col: str = "image_id") -> rd.Dataset:
    """Exempt-substring source filter (S2): keep rows whose id contains NONE
    of the substrings — ``all(path.find(j) == -1 for j in files_exempt)``."""

    def f(t: pa.Table) -> pa.Table:
        mask = None
        for sub in substrings:
            hit = pc.match_substring(t[id_col], sub)
            mask = hit if mask is None else pc.or_(mask, hit)
        return t.filter(pc.invert(mask)) if mask is not None else t

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprints(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """P1: decode + dhash/md5/crc32 + rank-feature columns; bytes dropped."""
    return images.map_batches(
        make_decode_hash(cfg),
        batch_format="pyarrow",
        batch_size=cfg.decode_batch_size,
    )


def _live(fp: rd.Dataset, cfg: PipelineConfig) -> rd.Dataset:
    """Rows that enter the dedup keyspace: decodable images (``ok``) AND
    strict-mode md5-keyed media (``md5_only``) — ``getProcHash`` routes both
    into the same hash→paths index (/root/reference/dupedb.py:68-101); only
    hard decode errors are quarantined.  The zero-hash poison skip
    (dedupc.py:176-178, ``int(hash, 16) == 0``) applies to the hex keyspace
    uniformly, which also covers wide hashes (hash_size > 8) whose int64
    ``dhash`` column is always 0."""
    def f(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["status"], value_set=pa.array(["ok", "md5_only"]))
        if cfg.skip_zero_hash:
            nonzero = pc.invert(
                pc.match_substring_regex(t["proc_hash"], r"^0+$"))
            mask = pc.and_(mask, nonzero)
        return t.filter(mask)

    return fp.map_batches(f, batch_format="pyarrow")


def validate_phash(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """``validateHash`` analog (M11, /root/reference/dupedb.py:413-438):
    recompute the fingerprint from bytes and flag rows whose stored ``phash``
    column disagrees (stale index entries).  The reference repairs its
    mutable store in place; here recompute-before-group makes repair
    implicit, and this stage *reports* the drift.  Only meaningful with
    the default ``hash_fn='dhash'`` at hash_size 8 — the stored phash:int64
    column is definitionally the 64-bit dHash (input_hint)."""
    fp = fingerprints(images, cfg)

    def mism(t: pa.Table) -> pa.Table:
        ok = pc.equal(t["status"], "ok")
        diff = pc.not_equal(t["dhash"], t["phash"])
        return t.filter(pc.and_(ok, diff)).select(["image_id", "phash", "dhash"])

    return fp.map_batches(mism, batch_format="pyarrow")


STRICT_MODE_DIFF_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("strict_hash", pa.string()),
    ("nonstrict_hash", pa.string()),
    ("frames", pa.int64()),
    ("differs", pa.int64()),
])


def strict_mode_diff(images: rd.Dataset,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Operational mode-migration report: per CONTAINER row (the only
    rows the strict switch affects — /root/reference/dupedb.py:82-98),
    BOTH mode's fingerprints from ONE decode pass: strict = md5 byte
    identity when animated, non-strict = frame-0 perceptual hash;
    ``differs=1`` marks rows a strict↔non-strict flip would re-key (the
    "what changes if I reopen this db non-strict" question the GUI's
    default-mode mismatch raises, compare.py:223-238).

    Map-only, no shuffle at any scale: corrupt containers drop (the
    fingerprint pipelines dead-letter them; this diagnostic reports only
    rows that HAVE two keys)."""
    from deduplicator_ray import codecs as _codecs
    from deduplicator_ray import hashing as _hashing

    hash_size = cfg.hash_size
    bits_fn = (_hashing.dhash_bits if cfg.hash_fn == "dhash"
               else _hashing.phash_bits)

    def f(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["fmt"],
                        value_set=pa.array(sorted(_codecs.CONTAINER_FMTS)))
        t = t.filter(keep)
        ids, s_h, n_h, fr = [], [], [], []
        for iid, fmt, data in zip(t["image_id"].to_pylist(),
                                  t["fmt"].to_pylist(),
                                  t["bytes"].to_pylist()):
            try:
                img, nf = _codecs.decode_container_first(data, fmt)
            except _codecs.CodecError:
                continue
            dh = _hashing.bits_to_hex(bits_fn(img, hash_size))
            ids.append(iid)
            n_h.append(dh)
            # strict keyspace matches decode_hash: every vcon (video
            # class) is md5 regardless of frame count (dupedb.py:88-90);
            # gif byte-matches only when animated (nf>1, dupedb.py:82)
            s_h.append(_hashing.md5_hex(data)
                       if (fmt == "vcon" or nf > 1) else dh)
            fr.append(nf)
        differs = [int(a != b) for a, b in zip(s_h, n_h)]
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(s_h, pa.string()),
             pa.array(n_h, pa.string()), pa.array(fr, pa.int64()),
             pa.array(differs, pa.int64())],
            schema=STRICT_MODE_DIFF_SCHEMA)

    return images.map_batches(f, batch_format="pyarrow",
                              batch_size=cfg.decode_batch_size)


def dead_letter(fp: rd.Dataset) -> rd.Dataset:
    """badfiles sink analog (S5, /root/reference/dupedb.py:231-242): the
    quarantine rows as a dataset instead of an append-only text file."""
    return fp.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "error")).select(
            ["image_id", "status", "error"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# reference mode


def reference_clusters(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """(proc_hash, image_id) membership of every exact-hash bucket ≥
    threshold.  The key is the unified ``getProcHash`` keyspace — dHash hex
    for decodable images at ANY hash_size (the reference default 12 included),
    content md5 for strict-mode media — so this works bit-for-bit like the
    reference's ``db[hash] = [paths]`` index (dupedb.py:253-257).

    The bucket threshold (A2, /root/reference/dupedb.py:331) runs as a
    partitioned groupby — one vectorized Python call per key-partition, not
    one per hash value."""
    fp = _live(fingerprints(images, cfg), cfg)
    return filter_min_group_size(
        fp.select_columns(["proc_hash", "image_id"]), ["proc_hash"], cfg.threshold
    )


def reference_clusters_hidealts(images: rd.Dataset,
                                cfg: PipelineConfig = DEFAULT_CONFIG,
                                namespace: str = "bucket") -> rd.Dataset:
    """``loadDuplicates`` with hide-alts on (D4,
    /root/reference/compare.py:519-560): per bucket, series-alt members are
    suppressed and the REDUCED list is re-thresholded — but a surviving
    bucket reports its FULL membership (the reference stores ``filelist``,
    not ``filelist_no_series``, compare.py:564).  Suppression changes which
    buckets survive, not their membership.

    ``namespace``: the id universe the smart base-file probe searches —
    'bucket' (default; free) or 'corpus' (broadcast of all live ids — the
    reference globs the whole filesystem; at 10^12 rows derive a
    series_style key and self-join instead)."""
    import ray as _ray

    from deduplicator_ray.stages.alts import suppress_alt_members

    fp = _live(fingerprints(images, cfg), cfg).select_columns(
        ["proc_hash", "image_id"])
    ns_ref = None
    if namespace == "corpus":
        ids = sorted(x for b in fp.iter_batches(batch_format="pyarrow")
                     for x in b["image_id"].to_pylist())
        ns_ref = _ray.put(ids)

    def f(df):
        import pandas as pd

        ns_all = _ray.get(ns_ref) if ns_ref is not None else None
        rows_h, rows_id = [], []
        for h, g in df.groupby("proc_hash", sort=False):
            members = sorted(g["image_id"])
            if len(members) < cfg.threshold:
                continue
            kept = suppress_alt_members(members, ns_all)
            if len(kept) < cfg.threshold:
                continue
            rows_h.extend([h] * len(members))
            rows_id.extend(members)
        return pd.DataFrame({"proc_hash": rows_h, "image_id": rows_id})

    return partitioned_groupby(
        fp, ["proc_hash"], f,
        out_schema=pa.schema([("proc_hash", pa.string()),
                              ("image_id", pa.string())]))


def reference_decisions(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Decision table of the reference delete pipeline: per exact-dhash
    bucket, keeper + deletions + rename target."""
    return reference_decisions_from_fp(_live(fingerprints(images, cfg), cfg), cfg)


def reference_decisions_from_fp(fp: rd.Dataset,
                                cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Same, from an already-live fingerprint dataset (cli.py job path)."""

    def add_cluster(t: pa.Table) -> pa.Table:
        return t.append_column("cluster_id", pc.cast(t["proc_hash"], pa.string()))

    from deduplicator_ray.stages.resolve import decision_schema

    return partitioned_groupby(
        fp.map_batches(add_cluster, batch_format="pyarrow"),
        ["cluster_id"],
        make_partition_resolve(cfg, cluster_col="cluster_id", with_superstate=True),
        out_schema=decision_schema(cfg),
    )


REPORT_SCHEMA = pa.schema([("action", pa.string()), ("n", pa.int64()),
                           ("n_clusters", pa.int64()),
                           ("total_bytes", pa.int64())])


def dedup_report(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Operational rollup of the reference decision table: per action
    (keep/delete), row count, cluster count, and total payload bytes —
    'delete' total_bytes is the storage the run reclaims.  The reference
    emits these numbers only as ad-hoc progress prints
    (/root/reference/dedupc.py:182-246); here they are a first-class
    value-checked table (mirrors.DEDUP_REPORT_SQL).

    Scale shape: the decision election runs per cluster-id partition
    exactly as ``reference_decisions``; filesize attaches inside the SAME
    partition (the fingerprint rows carrying it are already co-located),
    and each partition emits ONE partial row per action.  Only those
    ≤ 2×num_parts bounded partials reach the driver for the final sum —
    the corpus itself never materializes.  Returns a pandas DataFrame
    (action, n, n_clusters, total_bytes)."""
    import numpy as np
    import pandas as pd

    fp = _live(fingerprints(images, cfg), cfg)

    def add_cluster(t: pa.Table) -> pa.Table:
        return t.append_column("cluster_id", pc.cast(t["proc_hash"], pa.string()))

    base = make_partition_resolve(cfg, cluster_col="cluster_id",
                                  with_superstate=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dec = base(df)
        if len(dec) == 0:
            return REPORT_SCHEMA.empty_table().to_pandas()
        fs = (df.drop_duplicates("image_id")
              .set_index("image_id")["filesize"])
        dec = dec.assign(filesize=dec["image_id"].map(fs).astype(np.int64))
        out = dec.groupby("action", as_index=False).agg(
            n=("image_id", "size"),
            n_clusters=("cluster_id", "nunique"),
            total_bytes=("filesize", "sum"))
        out["n"] = out["n"].astype(np.int64)
        out["n_clusters"] = out["n_clusters"].astype(np.int64)
        out["total_bytes"] = out["total_bytes"].astype(np.int64)
        return out

    partials = partitioned_groupby(
        fp.map_batches(add_cluster, batch_format="pyarrow"),
        ["cluster_id"], partial, out_schema=REPORT_SCHEMA)

    from deduplicator_ray.pipelines.queries import _typed

    pdf = _typed(partials.to_pandas(), REPORT_SCHEMA)
    out = pdf.groupby("action", as_index=False).agg(
        n=("n", "sum"), n_clusters=("n_clusters", "sum"),
        total_bytes=("total_bytes", "sum"))
    for c in ("n", "n_clusters", "total_bytes"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("action").reset_index(drop=True)


# ---------------------------------------------------------------------------
# extended mode (LSH + CC)


def _strip_overflow(t: pa.Table) -> pa.Table:
    """Drop the overflow-stats sentinel rows (src == '') and project the
    (src, dst) pair relation — the ONE definition of the sentinel
    convention (it was previously copy-pasted as a lambda at 9 sites)."""
    return t.filter(pc.not_equal(t["src"], "")).select(["src", "dst"])


def verified_edges_from_fp(fp: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                           channels: tuple[str, ...] = ("img", "cap")) -> rd.Dataset:
    """Verified near-dup edges (src < dst; may contain multi-band duplicates)
    plus overflow stats rows (src == ''), from a live fingerprint dataset."""
    if "cap" in channels:
        # A pre-constructed instance (perm params computed once, ~2 KB)
        # ships to every task — full task-pool width, unlike an actor pool
        # whose lazy scale-up was measured to serialize this stage into
        # 2 tasks.  Actor pools are reserved for genuinely heavy state
        # (state/bandtable.py, pipelines/multimodal.py).
        fp = fp.map_batches(
            CaptionSignatures(cfg),
            batch_format="pyarrow",
            batch_size=cfg.text_batch_size,
        )
    band_rows = fp.map_batches(
        make_banding(cfg, channels), batch_format="pyarrow", batch_size=cfg.text_batch_size
    )
    from deduplicator_ray.stages.candidates import VERIFY_SCHEMA

    return partitioned_groupby(band_rows, ["band", "key"],
                               make_partition_verify(cfg, channels),
                               out_schema=VERIFY_SCHEMA, fmt="pyarrow")


def verified_edges(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                   channels: tuple[str, ...] = ("img", "cap")) -> rd.Dataset:
    return verified_edges_from_fp(_live(fingerprints(images, cfg), cfg), cfg, channels)


def dup_pairs_from_fp(fp: rd.Dataset,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """The verified-pair-set definition, single-sourced: drop the
    overflow sentinel rows (src == ''), project to (src, dst), dedup."""
    return drop_duplicates(
        verified_edges_from_fp(fp, cfg).map_batches(
            _strip_overflow, batch_format="pyarrow"),
        ["src", "dst"],
    )


def dup_pairs(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Distinct verified dup pairs (the recall-gate artifact)."""
    return dup_pairs_from_fp(_live(fingerprints(images, cfg), cfg), cfg)


PAIR_DIST_SCHEMA = pa.schema([("ham", pa.int64()), ("n_pairs", pa.int64())])


def _require_i64_dhash(cfg: PipelineConfig, what: str) -> None:
    """The int64 ``dhash`` column is the real fingerprint ONLY at
    hash_size=8; wide hashes store a 0 sentinel there (decode_hash), so
    any diagnostic keyed on it would silently report garbage (every pair
    at Hamming 0 / an empty live set).  Loud beats vacuous."""
    if cfg.hash_size != 8:
        raise ValueError(
            f"{what} reads the int64 dhash column, which is a 0 sentinel "
            f"at hash_size={cfg.hash_size} — run with hash_size=8 (wide "
            "fingerprints live in dhash_hex)")


def pair_distance_hist(images: rd.Dataset,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Hamming-distance histogram over the verified dup-pair set — the
    threshold-tuning diagnostic (how near are the near-dups?  is
    hamming_max cutting a cliff or a tail?).  Image-channel pairs (both
    endpoints decodable, Hamming ≤ hamming_max) land in their distance
    bucket 0..hamming_max; md5- and caption-channel pairs land in the -1
    bucket (their verified metric is byte identity / shingle Jaccard, not
    Hamming).

    Scale shape: the pair set joins back to the narrow (image_id, dhash,
    status) projection via TWO hash-partitioned string merges — the
    endpoint map is never materialized on the driver — then a per-batch
    value-counts combiner collapses everything to ≤ hamming_max + 2
    partial rows per batch before one tiny groupby.  The fingerprint
    table is materialized once (payload-free columns only) because both
    the edge pass and the endpoint sides consume it."""
    _require_i64_dhash(cfg, "pair_distance_hist")
    import numpy as np
    import pandas as pd

    from deduplicator_ray.hashing import hamming_u64
    from deduplicator_ray.stages.partitioned import partitioned_merge_str

    fp = _live(fingerprints(images, cfg), cfg).materialize()
    edges = dup_pairs_from_fp(fp, cfg)

    def side(dh_col: str, st_col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t["image_id"], t["dhash"].cast(pa.string()),
                 t["status"]], names=["image_id", dh_col, st_col])

        return f

    proj = fp.select_columns(["image_id", "dhash", "status"])
    # inner: an edge endpoint missing from the projection (impossible
    # today — both derive from the same materialized fp) must DROP, as in
    # the mirror's JOIN, not surface as a null that kills partial_hist
    j1 = partitioned_merge_str(
        edges, proj.map_batches(side("dh_a", "st_a"), batch_format="pyarrow"),
        ["src", "dst"], ["image_id", "dh_a", "st_a"],
        left_on="src", right_on="image_id", how="inner")
    j2 = partitioned_merge_str(
        j1, proj.map_batches(side("dh_b", "st_b"), batch_format="pyarrow"),
        ["src", "dst", "dh_a", "st_a"], ["image_id", "dh_b", "st_b"],
        left_on="dst", right_on="image_id", how="inner")

    hmax = cfg.hamming_max

    def partial_hist(df: pd.DataFrame) -> pd.DataFrame:
        a = pd.to_numeric(df["dh_a"]).to_numpy(np.int64)
        b = pd.to_numeric(df["dh_b"]).to_numpy(np.int64)
        ham = hamming_u64(a, b).astype(np.int64)
        ok = (df["st_a"].to_numpy() == "ok") & (df["st_b"].to_numpy() == "ok")
        bucket = np.where(ok & (ham <= hmax), ham, -1)
        vc = pd.Series(bucket).value_counts()
        return pd.DataFrame({"ham": vc.index.to_numpy(np.int64),
                             "n_pairs": vc.to_numpy(np.int64)})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ham", as_index=False)["n_pairs"].sum()
        return g.astype({"n_pairs": np.int64})

    return partitioned_groupby(
        j2.map_batches(partial_hist, batch_format="pandas"),
        ["ham"], total, num_parts=4, out_schema=PAIR_DIST_SCHEMA)


CLUSTER_SIZE_SCHEMA = pa.schema([("cluster_size", pa.int64()),
                                 ("n_clusters", pa.int64()),
                                 ("n_images", pa.int64())])


def cluster_size_hist(images: rd.Dataset,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Dup-family size spectrum over the extended near-dup clusters: how
    many clusters of each size, and how many images they hold — the
    corpus-health rollup an operator reads before choosing thresholds and
    the dedup-savings estimate (Σ (size-1) images are removable).

    Scale shape: two combiner levels.  Per-batch value_counts collapses
    assignments to (cluster_id, partial n) rows, one cluster_id-partition
    groupby sums them to true sizes; a second per-batch value_counts over
    sizes leaves ≤ |distinct sizes| partial rows per batch, and the final
    groupby is over the tiny size domain.  No stage ever sees more than
    the assignment projection (id, cluster_id)."""
    import numpy as np
    import pandas as pd

    assign = extended_clusters(images, cfg)

    mid = pa.schema([("cluster_id", pa.string()), ("n", pa.int64())])

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = pd.Series(t["cluster_id"].to_pandas()).value_counts()
        return pa.Table.from_pydict(
            {"cluster_id": vc.index.astype(str).to_numpy(),
             "n": vc.to_numpy(np.int64)}, schema=mid)

    def sum_sizes(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id", as_index=False)["n"].sum()
        return g.astype({"n": np.int64})

    sizes = partitioned_groupby(
        assign.map_batches(partial_counts, batch_format="pyarrow"),
        ["cluster_id"], sum_sizes, num_parts=16, out_schema=mid)

    def partial_hist(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n"].value_counts()
        cs = vc.index.to_numpy(np.int64)
        nc = vc.to_numpy(np.int64)
        return pd.DataFrame({"cluster_size": cs, "n_clusters": nc,
                             "n_images": cs * nc})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_size", as_index=False).agg(
            n_clusters=("n_clusters", "sum"), n_images=("n_images", "sum"))
        return g.astype({"n_clusters": np.int64, "n_images": np.int64})

    return partitioned_groupby(
        sizes.map_batches(partial_hist, batch_format="pandas"),
        ["cluster_size"], total, num_parts=4, out_schema=CLUSTER_SIZE_SCHEMA)


def extended_clusters(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """(image_id, cluster_id) for every node in a verified near-dup component.

    Raw verified edges (multi-band duplicates included) feed CC directly:
    connected_components tolerates duplicate edges — the driver base case
    dedups implicitly in union-find, and the first star round's
    per-partition ``drop_duplicates`` removes them after the adjacency
    shuffle — so a dedicated global dedup shuffle here would only add an
    extra sort."""
    edges = verified_edges(images, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    return connected_components(edges, cfg)


def extended_decisions(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                       num_partitions: int = 16) -> rd.Dataset:
    """Keeper election per near-dup component (hash join of the cluster
    assignment back to the fingerprint features, then per-cluster resolve).

    The fingerprint table (bytes already dropped — keys + features only) is
    materialized once so edges and the join both consume it without
    recomputing the decode stage through lazy lineage.
    """
    fp = _live(fingerprints(images, cfg), cfg).materialize()
    edges = verified_edges_from_fp(fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    clusters = connected_components(edges, cfg)
    joined = clusters.join(
        fp.drop_columns(["caption"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("image_id",),
    )
    from deduplicator_ray.stages.resolve import decision_schema

    return partitioned_groupby(
        joined,
        ["cluster_id"],
        make_partition_resolve(cfg, cluster_col="cluster_id", with_superstate=True),
        out_schema=decision_schema(cfg),
    )


def img_leakage_split(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                      train_pct: int = 90, num_parts: int = 64) -> rd.Dataset:
    """Near-dup-aware train/validation split over the IMAGE corpus — the
    image-side sibling of ``doc_dedup.doc_leakage_split``, closing the
    modality matrix: every live image (decodable ``ok`` + strict-mode
    ``md5_only`` media, zero-hash poison excluded — the same keyspace the
    dedup pipelines cluster, /root/reference/dupedb.py:68-101) gets a split
    assignment, and all members of an ``extended_clusters`` component share
    it, so no verified near-duplicate pair straddles the train/val boundary.
    Unclustered images key on their own id.

    Scale shape: the fingerprint table is materialized once (bytes already
    dropped) so the cluster computation and the id projection both consume
    it without re-decoding; cluster labels union a 1-column id projection,
    then ONE hash-partitioned groupby resolves each row's split key
    (leakage_split_from_labels).  Output:
    (image_id, split_key, bucket∈[0,100), split∈{train,val})."""
    from deduplicator_ray.pipelines.doc_dedup import leakage_split_from_labels

    fp = _live(fingerprints(images, cfg), cfg).materialize()
    edges = verified_edges_from_fp(fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    labels = connected_components(edges, cfg)
    ids = fp.map_batches(lambda t: t.select(["image_id"]),
                         batch_format="pyarrow")
    return leakage_split_from_labels(ids, labels, id_col="image_id",
                                     train_pct=train_pct,
                                     num_parts=num_parts)


# image curation gate thresholds — shared by the engine and the SQL mirror
# (mirrors.IMG_CURATION_SQL hardcodes the same literals; change both together)
IMG_CURATION_MIN_PIXELS = 1024  # 32x32: below this the image is a thumbnail
# aspect gate is integer-exact in both engines: drop when
# 2*max(w,h) > 3*min(w,h), i.e. aspect ratio strictly beyond 3:2
CURATION_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("action", pa.string()),
    ("pixels", pa.int64()),
    ("filesize", pa.int64()),
])
CURATION_REPORT_SCHEMA = pa.schema([
    ("action", pa.string()),
    ("n_images", pa.int64()),
    ("total_bytes", pa.int64()),
])


def img_curation(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                 min_pixels: int = IMG_CURATION_MIN_PIXELS,
                 num_parts: int = 64) -> rd.Dataset:
    """End-to-end image curation decision table — the image-side analog of
    ``queries.docs_curation``: every corpus row gets exactly one action,
    first-hit-wins through the gate cascade, then a per-bucket keeper
    election among the survivors:

      1. ``dead_letter`` — undecodable/null payloads (the badfiles taxonomy,
         /root/reference/dupedb.py:223-244);
      2. ``drop_poison`` — zero-hash degenerate images (dedupc.py:176-178);
      3. ``drop_small``  — metadata pixel count below ``min_pixels``;
      4. ``drop_aspect`` — aspect ratio beyond 3:2 (integer-exact test
         ``2*max(w,h) > 3*min(w,h)``, no float ratio in either engine);
      5. ``drop_dup``    — non-keeper within a ``proc_hash`` bucket of the
         gate survivors, keeper elected by the reference's quality tuple
         (pixels, filesize, density — dedupc.py:62-68) with id tie-break;
      6. ``keep``.

    Scale shape: ONE decode pass, a vectorized streaming classify, and one
    proc_hash-partitioned groupby over only the gate SURVIVORS (gated rows
    bypass the shuffle entirely via union) — no broadcast of any dup set,
    unlike the doc-side composition which broadcasts its (small) dup list."""
    import numpy as np
    import pandas as pd

    fp = fingerprints(images, cfg)

    def classify(t: pa.Table) -> pa.Table:
        w = np.nan_to_num(
            t["w"].to_numpy(zero_copy_only=False)).astype(np.int64)
        h = np.nan_to_num(
            t["h"].to_numpy(zero_copy_only=False)).astype(np.int64)
        pixels = t["pixels"].to_numpy(zero_copy_only=False).astype(np.int64)
        filesize = t["filesize"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        status = np.asarray(t["status"].to_pylist(), dtype=object)
        poison = pc.match_substring_regex(
            t["proc_hash"], r"^0+$").to_numpy(zero_copy_only=False)
        hi, lo = np.maximum(w, h), np.minimum(w, h)
        action = np.where(
            status == "error", "dead_letter",
            np.where(poison, "drop_poison",
                     np.where(pixels < min_pixels, "drop_small",
                              np.where(2 * hi > 3 * lo, "drop_aspect", ""))))
        return pa.table({
            "image_id": pc.cast(t["image_id"], pa.string()),
            "proc_hash": t["proc_hash"],
            "action": pa.array(action, pa.string()),
            "pixels": pa.array(pixels, pa.int64()),
            "filesize": pa.array(filesize, pa.int64()),
        })

    cls = fp.map_batches(classify, batch_format="pyarrow")
    gated = cls.map_batches(
        lambda t: t.filter(pc.not_equal(t["action"], "")).select(
            ["image_id", "action", "pixels", "filesize"]),
        batch_format="pyarrow")
    surv = cls.map_batches(
        lambda t: t.filter(pc.equal(t["action"], "")).drop_columns(["action"]),
        batch_format="pyarrow")

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # density is a pure function of the two preceding keys, so it can
        # never break a (pixels, filesize) tie — it is carried ONLY for
        # parity with the reference's quality tuple (dedupc.py:62-68 has
        # the same order-inert 4th key); the mirror carries it identically
        df["density"] = df["filesize"] / np.maximum(df["pixels"], 1)
        df = df.sort_values(
            ["proc_hash", "pixels", "filesize", "density", "image_id"],
            ascending=[True, False, False, False, True], kind="mergesort")
        df["action"] = np.where(
            ~df["proc_hash"].duplicated(), "keep", "drop_dup")
        return df[["image_id", "action", "pixels", "filesize"]]

    elected = partitioned_groupby(surv, ["proc_hash"], elect,
                                  num_parts=num_parts,
                                  out_schema=CURATION_SCHEMA)
    return gated.union(elected)


def curation_rollup(decisions: rd.Dataset) -> "pd.DataFrame":
    """Per-action (n_images, total_bytes) rollup of a curation decision
    table — shared by ``img_curation_report`` and the ``cli img-curate``
    job so the CLI's report.json cannot drift from the query.  Per-batch
    combiner emits ≤6 partial rows per batch; final merge is driver-side."""
    import numpy as np
    import pandas as pd

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "action": t["action"].to_pylist(),
            "filesize": t["filesize"].to_numpy(zero_copy_only=False)})
        g = (df.groupby("action", as_index=False)
             .agg(n_images=("action", "size"),
                  total_bytes=("filesize", "sum")))
        return pa.table({
            "action": pa.array(g["action"].tolist(), pa.string()),
            "n_images": pa.array(g["n_images"].to_numpy(np.int64)),
            "total_bytes": pa.array(g["total_bytes"].to_numpy(np.int64)),
        })

    parts = decisions.map_batches(combine, batch_format="pyarrow").to_pandas()
    if parts.empty:  # zero-row corpus: typed empty frame, not a KeyError
        return pd.DataFrame({"action": pd.Series(dtype=object),
                             "n_images": pd.Series(dtype=np.int64),
                             "total_bytes": pd.Series(dtype=np.int64)})
    out = (parts.groupby("action", as_index=False)
           .agg(n_images=("n_images", "sum"),
                total_bytes=("total_bytes", "sum"))
           .sort_values("action").reset_index(drop=True))
    out["n_images"] = out["n_images"].astype(np.int64)
    out["total_bytes"] = out["total_bytes"].astype(np.int64)
    return out


def img_curation_report(images: rd.Dataset,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        min_pixels: int = IMG_CURATION_MIN_PIXELS) -> pd.DataFrame:
    """Dataset-card rollup of ``img_curation`` (per action: images + bytes)
    — the image sibling of ``docs_curation_report``."""
    return curation_rollup(img_curation(images, cfg, min_pixels=min_pixels))


# aspect-ratio bucket ladder for training-shape bucketing: (index, rw, rh).
# Mirrored literally in mirrors.ASPECT_BUCKETS_SQL — change both together.
ASPECT_LADDER = ((1, 1, 1), (2, 4, 3), (3, 3, 4), (4, 16, 9), (5, 9, 16),
                 (6, 3, 2), (7, 2, 3))


def img_aspect_buckets(images: rd.Dataset,
                       cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Aspect-ratio bucket assignment over the live corpus — the
    batch-shape planning step of an image training pipeline (images are
    grouped into fixed aspect buckets so a batch can share one crop/resize
    target instead of square-cropping everything).  Each image goes to the
    ladder entry minimizing |w/h − rw/rh|, ties to the lowest bucket index.

    The error term is computed as ``abs(w*rh − rw*h) / rh`` — the integer
    products are exact in float64 at any realistic dimension, so DuckDB
    and numpy round the single division identically and the argmin is
    engine-portable.  Map-only: no shuffle, no state; at 10^12 rows this
    is a pure streaming classify."""
    import numpy as np

    fp = _live(fingerprints(images, cfg), cfg)
    idx = np.array([b[0] for b in ASPECT_LADDER], np.int64)
    rw = np.array([b[1] for b in ASPECT_LADDER], np.int64)
    rh = np.array([b[2] for b in ASPECT_LADDER], np.int64)

    def classify(t: pa.Table) -> pa.Table:
        w = np.nan_to_num(
            t["w"].to_numpy(zero_copy_only=False)).astype(np.int64)
        h = np.nan_to_num(
            t["h"].to_numpy(zero_copy_only=False)).astype(np.int64)
        err = np.abs(w[:, None] * rh - rw * h[:, None]) / rh
        best = err.argmin(axis=1)  # first minimum == lowest ladder index
        return pa.table({
            "image_id": pc.cast(t["image_id"], pa.string()),
            "bucket_idx": pa.array(idx[best], pa.int64()),
            "bucket_rw": pa.array(rw[best], pa.int64()),
            "bucket_rh": pa.array(rh[best], pa.int64()),
        })

    return fp.map_batches(classify, batch_format="pyarrow")


def img_cross_min_match(new_fp: rd.Dataset, known_fp: rd.Dataset,
                        cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Cross-corpus image near-dedup — "does this new image near-duplicate
    the corpus we already hold?", the production question of an incremental
    10^12-image ingest.  Returns (image_id, matched): for each NEW-side
    live fingerprint that matches the KNOWN side — Hamming ≤
    ``cfg.hamming_max`` between decodable rows, byte-exact md5 between
    strict-mode media (the unified ``getProcHash`` keyspace,
    /root/reference/dupedb.py:68-101) — the lexicographically smallest
    matching known id.

    Scale shape (the image analog of ``doc_dedup.cross_dup_min_match``):
    both sides run the SAME slice/md5 banding (pigeonhole-lossless for the
    Hamming radius, so this is EXACT, not probabilistic) with a 1-byte side
    tag; ONE (band, key) groupby verifies CROSS-side pairs only, each
    bucket first collapsing to DISTINCT hashes (an identical-hash
    mega-bucket costs one comparison); emissions are idempotent under the
    final per-id ``min``, so no owner-band bookkeeping is needed."""
    import numpy as np

    band = make_banding(cfg, channels=("img",))

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(len(t), side, np.int8)))

        return f

    def band_rows(fp: rd.Dataset, side: int) -> rd.Dataset:
        return (fp.map_batches(band, batch_format="pyarrow",
                               batch_size=cfg.text_batch_size)
                .map_batches(tag(side), batch_format="pyarrow"))

    rows = band_rows(known_fp, 0).union(band_rows(new_fp, 1))
    return cross_min_from_band_rows(rows, cfg)


CROSS_MATCH_SCHEMA = pa.schema([("image_id", pa.string()),
                                ("matched", pa.string())])


def make_cross_verify(cfg: PipelineConfig):
    """Partition fn for side-tagged band rows: within each (band, key)
    bucket, match side-1 (new) members against side-0 (known) members —
    Hamming ≤ ``cfg.hamming_max`` on the fingerprint (int64 dhash or wide
    hex payload), byte-exact md5 on the md5 band — emitting
    (image_id, matched known id).  Each side collapses to DISTINCT
    fingerprints first, so identical-hash mega-buckets cost one
    comparison; multi-band re-emissions are idempotent under the caller's
    per-id ``min``."""
    import numpy as np
    import pandas as pd

    from deduplicator_ray.stages.banding import MD5_BAND

    hmax = cfg.hamming_max

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_ids: list[str] = []
        out_m: list[str] = []
        for (b, _), g in df.groupby(["band", "key"], sort=False):
            a = g[g["side"] == 0]
            nb = g[g["side"] == 1]
            if not len(a) or not len(nb):
                continue
            if b == MD5_BAND:
                # byte-exact: full md5 hex rides in the payload column
                amin: dict = {}
                for i, p in zip(a["image_id"], a["caption"]):
                    if p not in amin or i < amin[p]:
                        amin[p] = i
                for i, p in zip(nb["image_id"], nb["caption"]):
                    m = amin.get(p)
                    if m is not None:
                        out_ids.append(i)
                        out_m.append(m)
            else:
                # fingerprint = int64 dhash (hash_size 8) or the hex
                # payload (wide hashes) — Hamming on Python ints covers both
                def fps(gg):
                    dh = gg["dhash"].to_numpy()
                    pay = gg["caption"].to_numpy(object)
                    return [int(p, 16) if p else int(d) & 0xFFFFFFFFFFFFFFFF
                            for d, p in zip(dh, pay)]

                amin = {}
                for i, d in zip(a["image_id"], fps(a)):
                    if d not in amin or i < amin[d]:
                        amin[d] = i
                bgrp: dict = {}
                for i, d in zip(nb["image_id"], fps(nb)):
                    bgrp.setdefault(d, []).append(i)
                akeys = list(amin.items())
                for db, members in bgrp.items():
                    best = None
                    for da, mid in akeys:
                        if best is not None and mid >= best:
                            continue  # can't improve the min
                        if (da ^ db).bit_count() <= hmax:
                            best = mid
                    if best is not None:
                        out_ids.extend(members)
                        out_m.extend([best] * len(members))
        return pd.DataFrame({"image_id": np.asarray(out_ids, object),
                             "matched": np.asarray(out_m, object)})

    return verify


def cross_min_from_band_rows(rows: rd.Dataset,
                             cfg: PipelineConfig) -> rd.Dataset:
    """(image_id, matched) from side-tagged band rows: one (band, key)
    groupby cross-verify, then a per-id min election."""
    import pandas as pd

    matches = partitioned_groupby(rows, ["band", "key"],
                                  make_cross_verify(cfg),
                                  out_schema=CROSS_MATCH_SCHEMA)

    def minpart(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("image_id", as_index=False)["matched"].min()

    return partitioned_groupby(matches, ["image_id"], minpart, num_parts=8,
                               out_schema=CROSS_MATCH_SCHEMA)


CAPTION_CONFLICT_SCHEMA = pa.schema([
    ("proc_hash", pa.string()),
    ("n_members", pa.int64()),
    ("n_captions", pa.int64()),
    ("caption_min", pa.string()),
])


STOCK_CAPTION_SCHEMA = pa.schema([
    ("caption_md5", pa.string()),
    ("n_images", pa.int64()),
    ("n_hashes", pa.int64()),
    ("image_id_min", pa.string()),
])


def stock_captions(images: rd.Dataset,
                   cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """The inverse audit of ``caption_conflicts``: caption groups whose
    images are NOT duplicates — one caption attached to ≥ 2 images with
    > 1 distinct proc_hash.  On web corpora this is the stock-caption /
    alt-text-spam noise mode (the same boilerplate caption pasted on
    unrelated images), the rows a caption-channel dedup must NOT treat as
    duplicate evidence and a curation pass usually down-weights.

    Scale shape: captions are md5'd per batch BEFORE the exchange so the
    shuffle carries (caption_md5, proc_hash, image_id) — no caption text,
    no payload; one hash-partitioned groupby on caption_md5 computes the
    counts vectorized per partition and emits only offending groups."""
    import hashlib

    import numpy as np
    import pandas as pd

    fp = _live(fingerprints(images, cfg), cfg)
    proj = fp.select_columns(["proc_hash", "image_id", "caption"])

    def keyed(t: pa.Table) -> pa.Table:
        # rows without a caption cannot be caption-audited: drop them here
        # and in the mirror (WHERE caption IS NOT NULL) alike
        t = t.filter(pc.is_valid(t["caption"]))
        caps = t["caption"].to_pylist()
        md5s = pa.array([hashlib.md5(c.encode()).hexdigest() for c in caps],
                        pa.string())
        return pa.Table.from_arrays(
            [md5s, t["proc_hash"], t["image_id"]],
            names=["caption_md5", "proc_hash", "image_id"])

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("caption_md5", sort=False).agg(
            n_images=("image_id", "size"),
            n_hashes=("proc_hash", "nunique"),
            image_id_min=("image_id", "min"))
        g = g[(g["n_images"] >= 2) & (g["n_hashes"] > 1)].reset_index()
        g["n_images"] = g["n_images"].astype(np.int64)
        g["n_hashes"] = g["n_hashes"].astype(np.int64)
        return g[["caption_md5", "n_images", "n_hashes", "image_id_min"]]

    return partitioned_groupby(proj.map_batches(keyed, batch_format="pyarrow"),
                               ["caption_md5"], audit,
                               out_schema=STOCK_CAPTION_SCHEMA)


def caption_conflicts(images: rd.Dataset,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Caption↔image consistency audit over the image+caption corpus: every
    duplicate-image cluster (unified proc_hash keyspace, bucket threshold
    as in ``reference_clusters``) whose members carry MORE THAN ONE
    distinct caption.  Byte-identical / perceptually-identical images with
    conflicting captions are the classic label-noise signal in paired
    training data — one of the captions is wrong, machine-translated, or
    spam — and the reference's GUI surfaces exactly this case to the human
    reviewer side-by-side (/root/reference/compare.py:493-515); here it is
    a first-class value-checked table.

    Scale shape: the projection that shuffles is (proc_hash, image_id,
    caption) — no payload bytes; ONE hash-partitioned groupby on proc_hash
    computes size / distinct-caption count / min caption vectorized per
    partition and emits only the conflicted clusters (a tiny fraction).

    Output: (proc_hash, n_members, n_captions, caption_min) sorted by the
    caller; ``caption_min`` anchors the cluster for review tooling."""
    import numpy as np
    import pandas as pd

    fp = _live(fingerprints(images, cfg), cfg)
    proj = fp.select_columns(["proc_hash", "image_id", "caption"])

    threshold = cfg.threshold

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        # NULL captions don't count as captions (SQL count(DISTINCT)/min
        # ignore NULL; pandas object-min would crash on str+None mixes) —
        # members still count toward cluster size, like SQL count(*)
        sizes = df.groupby("proc_hash", sort=False)["image_id"].size()
        nn = df[df["caption"].notna()]
        caps = nn.groupby("proc_hash", sort=False)["caption"].agg(
            ["nunique", "min"])
        g = caps.join(sizes.rename("n_members"))
        g = g[(g["n_members"] >= threshold) & (g["nunique"] > 1)]
        g = g.reset_index().rename(
            columns={"nunique": "n_captions", "min": "caption_min"})
        g["n_members"] = g["n_members"].astype(np.int64)
        g["n_captions"] = g["n_captions"].astype(np.int64)
        return g[["proc_hash", "n_members", "n_captions", "caption_min"]]

    return partitioned_groupby(proj, ["proc_hash"], audit,
                               out_schema=CAPTION_CONFLICT_SCHEMA)


REVIEW_QUEUE_SCHEMA = pa.schema([
    ("proc_hash", pa.string()),
    ("reason", pa.string()),
    ("n_members", pa.int64()),
    ("keeper", pa.string()),
    ("runner_up", pa.string()),
    ("n_captions", pa.int64()),
])


def img_review_queue(images: rd.Dataset,
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     num_parts: int = 64) -> rd.Dataset:
    """S10's human-in-the-loop surface as a table (the idiomatic analog of
    the reference's interactive review prompt, compare.py:176-631 /
    dedupc.py:181-210): the buckets a human should look at because the
    automatic decision is LOW-CONFIDENCE —

      * ``tie_election``   — the keeper beat the runner-up on NOTHING but
        the deterministic id tie-break (quality tuple exactly equal:
        frames, pixels, filesize — density is derived — so the engine
        effectively flipped a labeled coin);
      * ``caption_conflict`` — members carry >1 distinct non-null caption
        (label noise: one of them is wrong);
      * ``both``.

    Scale shape: ONE proc_hash-partitioned groupby over the payload-free
    (proc_hash, image_id, caption, quality) projection; only the flagged
    fraction is emitted.  Ranking (global ``rank`` by n_members desc) is
    applied by the query wrapper on the collected result — the queue is
    review-sized by construction."""
    import numpy as np
    import pandas as pd

    fp = _live(fingerprints(images, cfg), cfg)
    proj = fp.select_columns(["proc_hash", "image_id", "caption",
                              "rk_frames", "rk_pixels", "rk_filesize",
                              "rk_density"])
    threshold = cfg.threshold
    qcols = ["rk_frames", "rk_pixels", "rk_filesize", "rk_density"]

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        empty = REVIEW_QUEUE_SCHEMA.empty_table().to_pandas()
        sizes = df.groupby("proc_hash", sort=False)["image_id"] \
                  .transform("size")
        df = df[sizes >= threshold]
        if df.empty:
            return empty
        q = df.sort_values(["proc_hash"] + qcols + ["image_id"],
                           ascending=[True, False, False, False, False,
                                      True], kind="mergesort")
        grp = q.groupby("proc_hash", sort=False)
        r = grp.cumcount()
        top2 = q[r <= 1].copy()
        top2["r"] = r[r <= 1].to_numpy()
        k = top2[top2["r"] == 0]
        ru = top2[top2["r"] == 1]
        m = k.merge(ru, on="proc_hash", suffixes=("_k", "_r"))
        tie = np.ones(len(m), bool)
        for c in qcols:
            tie &= (m[f"{c}_k"].to_numpy() == m[f"{c}_r"].to_numpy())
        nmem = df.groupby("proc_hash", sort=False)["image_id"].size()
        ncap = (df[df["caption"].notna()]
                .groupby("proc_hash", sort=False)["caption"].nunique())
        m["n_members"] = m["proc_hash"].map(nmem).astype(np.int64)
        m["n_captions"] = m["proc_hash"].map(ncap).fillna(0).astype(np.int64)
        conflict = m["n_captions"].to_numpy() > 1
        keep = tie | conflict
        m = m[keep]
        tie, conflict = tie[keep], conflict[keep]
        reason = np.where(tie & conflict, "both",
                          np.where(tie, "tie_election", "caption_conflict"))
        return pd.DataFrame({
            "proc_hash": m["proc_hash"].astype(str),
            "reason": reason,
            "n_members": m["n_members"].to_numpy(np.int64),
            "keeper": m["image_id_k"].astype(str),
            "runner_up": m["image_id_r"].astype(str),
            "n_captions": m["n_captions"].to_numpy(np.int64),
        })

    return partitioned_groupby(proj, ["proc_hash"], audit,
                               num_parts=num_parts,
                               out_schema=REVIEW_QUEUE_SCHEMA)


# ---------------------------------------------------------------------------
# incremental near-dup cluster maintenance for IMAGES: fold a new crawl's
# edges into a persisted extended-cluster assignment (the image counterpart
# of doc_dedup.doc_delta_pairs + stages/components.incremental_cc_update).


def make_img_delta_verify(cfg: PipelineConfig):
    """Partition fn for side-tagged band rows of BOTH channels: emit every
    verified near-dup edge that touches the NEW side, skipping known×known
    work outright (band keys are pure per-row functions, so a known pair
    co-bucketed here was co-bucketed when the known corpus was clustered —
    its connectivity already lives in the persisted assignment).

    Per (band, key) bucket: rows collapse to identical-fingerprint (image /
    md5 bands) or identical-caption (cap bands) groups; NEW-touched groups
    star every member to the group min (the new member must bridge the
    group), and only group-representative pairs with a new side are
    verified — Hamming ≤ hamming_max on image slices, byte-exact on the
    md5 band, exact shingle Jaccard ≥ jaccard_min on caption bands.  Extra
    cap edges the full pipeline would delegate to the image channel are
    harmless: they verify the same thresholds, so they connect nodes that
    are already co-clustered."""
    import numpy as np
    import pandas as pd

    from deduplicator_ray.functions import text as textfn
    from deduplicator_ray.stages.banding import CAP_BAND_OFFSET, MD5_BAND

    hmax = cfg.hamming_max
    jmin = cfg.jaccard_min
    k = cfg.shingle_k

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_s: list[str] = []
        out_d: list[str] = []
        sh_cache: dict[str, np.ndarray] = {}

        def sh(c: str) -> np.ndarray:
            s = sh_cache.get(c)
            if s is None:
                s = textfn.char_shingle_hashes(c, k)
                sh_cache[c] = s
            return s

        def stars(groups: dict) -> list:
            # connect a new-touched identical-key group WITHOUT re-emitting
            # its known members' stars (they are already connected in the
            # persisted assignment): new members → group min, plus ONE
            # known→min bridge when the min itself is new.  Bounds the
            # emission by #new members + 1 per group — a mega-group of
            # known duplicates costs O(increment), not O(group).
            reps = []
            for v, mem in groups.items():
                ids = [m[0] for m in mem]
                mn = min(ids)
                news = {i for i, s in mem if s == 1}
                if news:
                    for i in news:
                        if i != mn:
                            out_s.append(mn)
                            out_d.append(i)
                    if mn in news:
                        known = [i for i, s in mem if s == 0]
                        if known:
                            out_s.append(min(known))
                            out_d.append(mn)
                reps.append((v, mn, bool(news)))
            return reps

        for (b, _), g in df.groupby(["band", "key"], sort=False):
            sides = g["side"].to_numpy()
            if not (sides == 1).any():
                continue  # all-known bucket: persisted
            ids = g["image_id"].to_numpy(object)
            pay = g["caption"].to_numpy(object)
            if b >= CAP_BAND_OFFSET:
                groups: dict = {}
                for i, c, s in zip(ids, pay, sides):
                    groups.setdefault(c, []).append((i, s))
                reps = stars(groups)
                # outer loop over NEW reps only (not all-pairs with a
                # skip): a known-side mega-bucket (candidates.py measured
                # 54k distinct reps) costs O(new × reps) loop work, not
                # O(reps²); a new×new pair is owned by its smaller index
                new_rep_idx = [ri for ri, r in enumerate(reps) if r[2]]
                for x in new_rep_idx:
                    cx, mx, _ = reps[x]
                    shx = sh(cx)
                    lx = len(shx)
                    for y in range(len(reps)):
                        if y == x:
                            continue
                        cy, my, ny = reps[y]
                        if ny and y < x:
                            continue
                        shy = sh(cy)
                        ly = len(shy)
                        if lx == 0 and ly == 0:
                            jac = 1.0
                        else:
                            lo, hi = (lx, ly) if lx < ly else (ly, lx)
                            if lo < jmin * hi:
                                continue
                            inter = len(np.intersect1d(shx, shy,
                                                       assume_unique=True))
                            jac = inter / (lx + ly - inter)
                        if jac >= jmin:
                            out_s.append(mx)
                            out_d.append(my)
            else:
                dh = g["dhash"].to_numpy()
                vals = [int(p, 16) if p else int(d) & 0xFFFFFFFFFFFFFFFF
                        for d, p in zip(dh, pay)]
                groups = {}
                for i, v, s in zip(ids, vals, sides):
                    groups.setdefault(v, []).append((i, s))
                reps = stars(groups)
                if b != MD5_BAND:  # md5 matches are identity-only
                    new_rep_idx = [ri for ri, r in enumerate(reps) if r[2]]
                    for x in new_rep_idx:
                        vx, mx, _ = reps[x]
                        for y in range(len(reps)):
                            if y == x:
                                continue
                            vy, my, ny = reps[y]
                            if ny and y < x:
                                continue
                            if (vx ^ vy).bit_count() <= hmax:
                                out_s.append(mx)
                                out_d.append(my)
        return pd.DataFrame({"src": np.asarray(out_s, object),
                             "dst": np.asarray(out_d, object)})

    return verify


def img_delta_edges(new_fp: rd.Dataset, known_fp: rd.Dataset,
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Verified near-dup edges (src, dst) touching the NEW side, over both
    channels (image Hamming + md5 identity + caption Jaccard).  At
    deployment scale the known side's band rows come from the persisted
    band index (state/bandstore.py) instead of re-banding fingerprints."""
    import numpy as np

    band = make_banding(cfg, channels=("img", "cap"))

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(len(t), side, np.int8)))

        return f

    def band_rows(fp: rd.Dataset, side: int) -> rd.Dataset:
        sig = fp.map_batches(CaptionSignatures(cfg), batch_format="pyarrow",
                             batch_size=cfg.text_batch_size)
        return (sig.map_batches(band, batch_format="pyarrow",
                                batch_size=cfg.text_batch_size)
                .map_batches(tag(side), batch_format="pyarrow"))

    rows = band_rows(known_fp, 0).union(band_rows(new_fp, 1))
    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    return partitioned_groupby(rows, ["band", "key"],
                               make_img_delta_verify(cfg),
                               out_schema=edge_schema)


IMG_NEW_BUCKET_THRESHOLD = 80  # md5(image_id) % 100 >= this ⇒ increment


def img_cluster_update(images: rd.Dataset,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       new_threshold: int = IMG_NEW_BUCKET_THRESHOLD) -> rd.Dataset:
    """End-to-end incremental image clustering: split the corpus
    deterministically into a KNOWN part (whose extended clusters stand in
    for a persisted checkpoint) and a NEW crawl, derive only the
    increment-touched edges, and fold them in with
    ``incremental_cc_update`` — the known side is never re-clustered.
    Result must equal ``extended_clusters`` over the full corpus (mirror:
    EXTENDED_CLUSTERS_SQL)."""
    import hashlib

    import numpy as np

    from deduplicator_ray.stages.components import incremental_cc_update

    def part(new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["image_id"].to_pylist()
            mask = np.fromiter(
                ((int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
                  >= new_threshold) == new for i in ids),
                bool, count=len(ids))
            return t.filter(pa.array(mask))

        return f

    # materialize the payload-free fingerprint table ONCE so the two side
    # filters share a single decode+hash pass (each side is consumed more
    # than once downstream, so they stay materialized too — over the small
    # fp blocks, not the corpus)
    fp = _live(fingerprints(images, cfg), cfg).materialize()
    known_fp = fp.map_batches(part(False), batch_format="pyarrow").materialize()
    new_fp = fp.map_batches(part(True), batch_format="pyarrow").materialize()

    base_edges = verified_edges_from_fp(known_fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    base = connected_components(base_edges, cfg)
    delta = img_delta_edges(new_fp, known_fp, cfg)
    return incremental_cc_update(base, delta, cfg)


IMG_REMOVE_BUCKET_THRESHOLD = 85  # md5(image_id) % 100 >= this ⇒ retired


def img_cluster_remove(images: rd.Dataset,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       threshold: int = IMG_REMOVE_BUCKET_THRESHOLD) -> rd.Dataset:
    """Incremental image-cluster DELETION maintenance — the prune
    direction of the maintenance pair, the reference's vanished-file loop
    over its shelve index (/root/reference/dupedb.py:371-411): retire the
    deterministic md5-of-id bucket ≥ ``threshold`` from a persisted
    extended-clusters assignment, re-clustering ONLY the touched
    components.  Result must equal ``extended_clusters`` over the
    survivor corpus (mirror: EXTENDED_CLUSTERS_SQL over survivors).

    Unlike the generic ``incremental_cc_remove`` (which filters a
    persisted edge set), the image graph's persisted edges are NOT
    node-deletion-safe: hot exact-hash buckets ship as spanning
    forests / member→rep stars (stages/candidates.py), so deleting an
    interior tree node would falsely split a group that a full recompute
    keeps whole (the survivors still share the proc_hash).  The fix keeps
    the locality argument but re-derives edges: band+verify is PAIRWISE
    (a pair's verdict never depends on other rows), so edge discovery is
    monotone under node removal and every full-survivor-graph edge
    touching an affected component stays inside it — the affected
    subgraph is closed.  Re-running the ordinary banding→verify stage on
    ONLY the affected survivors' fingerprints therefore yields exactly
    the full-recompute connectivity there, at delta-bounded cost:
      1. `affected_partition` — two streaming 2-col passes (labels, then
         membership) with the removal set broadcast;
      2. one broadcast-filter pass keeps the affected survivors'
         fingerprint rows (bytes were already dropped at decode);
      3. banding→verify→CC on that bounded subset;
      4. untouched assignment rows stream through a label filter and
         union with the re-clustered rows (disjoint by closure)."""
    import hashlib

    import pandas as pd
    import ray

    from deduplicator_ray.stages.components import (
        affected_partition,
        untouched_rows,
    )

    fp = _live(fingerprints(images, cfg), cfg).materialize()

    # the retirement increment: deterministic md5 bucket over live ids
    def rm_rows(t: pa.Table) -> pa.Table:
        ids = [str(x) for x in t["image_id"].to_pylist()]
        out = [i for i in ids
               if int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 100
               >= threshold]
        return pa.Table.from_pydict(
            {"image_id": out}, schema=pa.schema([("image_id", pa.string())]))

    removed: set[str] = set()
    for b in (fp.select_columns(["image_id"])
              .map_batches(rm_rows, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        removed.update(b["image_id"].to_pylist())

    # persisted stand-ins: the member-level assignment (what a checkpoint
    # of extended_clusters holds)
    edges = verified_edges_from_fp(fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    assign = connected_components(edges, cfg).materialize()
    if not removed:
        return assign

    affected, membership = affected_partition(assign, removed)
    if not affected:
        return assign
    alive = membership - removed
    alive_ref = ray.put(alive)

    def keep_alive(t: pa.Table) -> pa.Table:
        # this filter streams the WHOLE fp table — C-level isin, no
        # per-row Python membership
        al = ray.get(alive_ref)
        mask = pd.Series(t["image_id"].to_pylist(), dtype=object).isin(al)
        return t.filter(pa.array(mask.to_numpy()))

    sub_fp = fp.map_batches(keep_alive, batch_format="pyarrow")
    sub_edges = verified_edges_from_fp(sub_fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    sub = connected_components(sub_edges, cfg)
    return untouched_rows(assign, affected).union(sub)


SCORECARD_SCHEMA = pa.schema([
    ("tp", pa.int64()), ("fp", pa.int64()), ("fn", pa.int64()),
    ("precision_e6", pa.int64()), ("recall_e6", pa.int64()),
])


def dedup_scorecard(images: rd.Dataset, truth: rd.Dataset,
                    cfg: PipelineConfig = DEFAULT_CONFIG):
    """Dedup quality scorecard — pair-level precision/recall of the
    extended near-dup clusters against labeled ground truth, the metric the
    north rule gates on (dup-pair recall ≥ 0.99) as a first-class table.

    NO pair set is ever materialized (a mega-cluster would explode
    quadratically): pair counts come from contingency algebra —
    TP = Σ_{(cluster,group)} C(n,2) over the cluster⋈truth cell sizes,
    predicted pairs = Σ_cluster C(n,2), truth pairs = Σ_group C(n,2) —
    three bounded-partial groupby sums, one tiny driver reduction.
    Truth groups restrict to decodable members (``kind != 'corrupt'``) so
    the metric reflects the algorithm, not the codec quarantine.

    Returns a ONE-ROW pandas DataFrame (tp, fp, fn, precision_e6,
    recall_e6) — integer micro-units so the value check is float-free."""
    import numpy as np
    import pandas as pd

    labels = extended_clusters(images, cfg)

    part_schema = pa.schema([("v", pa.int64())])

    def pair_sum(keys):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            n = df.groupby(keys, sort=False).size().to_numpy(np.int64)
            return pd.DataFrame({"v": np.asarray([int((n * (n - 1) // 2).sum())],
                                                 np.int64)})

        return f

    def total(ds: rd.Dataset, keys) -> int:
        parts = partitioned_groupby(ds, keys, pair_sum(keys), num_parts=8,
                                    out_schema=part_schema)
        s = 0
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            s += int(np.asarray(b["v"]).sum())
        return s

    tr = truth.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], "corrupt"))
        .select(["image_id", "group_id"]),
        batch_format="pyarrow")

    # attach truth group to each clustered member: union + ONE image_id
    # partition groupby (no broadcast of either side)
    def lab_rows(t: pa.Table) -> pa.Table:
        return pa.table({"image_id": t["image_id"],
                         "cluster_id": t["cluster_id"],
                         "group_id": pa.array(
                             np.full(t.num_rows, -1, np.int64))})

    def tr_rows(t: pa.Table) -> pa.Table:
        return pa.table({"image_id": t["image_id"],
                         "cluster_id": pa.array([""] * t.num_rows,
                                                pa.string()),
                         "group_id": t["group_id"].cast(pa.int64())})

    mid_schema = pa.schema([("image_id", pa.string()),
                            ("cluster_id", pa.string()),
                            ("group_id", pa.int64())])
    cell_schema = pa.schema([("cluster_id", pa.string()),
                             ("group_id", pa.int64())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        gmap = (df.loc[df["cluster_id"] == ""].drop_duplicates("image_id")
                .set_index("image_id")["group_id"])
        out = df.loc[df["cluster_id"] != ""].copy()
        out["group_id"] = (out["image_id"].map(gmap).fillna(-1)
                           .astype(np.int64))
        return out[["cluster_id", "group_id"]]

    joined = partitioned_groupby(
        labels.map_batches(lab_rows, batch_format="pyarrow")
        .union(tr.map_batches(tr_rows, batch_format="pyarrow")),
        ["image_id"], attach, num_parts=16, out_schema=cell_schema)

    tp = total(joined, ["cluster_id", "group_id"])
    cp = total(labels, ["cluster_id"])
    gp = total(tr, ["group_id"])
    return pd.DataFrame({
        "tp": np.asarray([tp], np.int64),
        "fp": np.asarray([cp - tp], np.int64),
        "fn": np.asarray([gp - tp], np.int64),
        "precision_e6": np.asarray([tp * 1_000_000 // max(cp, 1)], np.int64),
        "recall_e6": np.asarray([tp * 1_000_000 // max(gp, 1)], np.int64),
    })


# ---------------------------------------------------------------------------
# Hamming-space exact k-NN + per-bit hash statistics


HAMMING_KNN_SCHEMA = pa.schema([
    ("query_id", pa.string()), ("rank", pa.int64()),
    ("image_id", pa.string()), ("ham", pa.int64())])

BIT_STATS_SCHEMA = pa.schema([
    ("bit", pa.int64()), ("n_set", pa.int64()),
    ("n_rows", pa.int64()), ("set_frac_e6", pa.int64())])


def hamming_knn(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                k: int = 5, n_queries: int = 4) -> "pd.DataFrame":
    """Exact k-nearest-neighbours in dHash Hamming space for a probe set —
    the similarity-SEARCH complement of the dedup pipeline's thresholded
    pairs (triage: "show me what else looks like this image", no Hamming
    ceiling).  Probes are the ``n_queries`` lexicographically smallest live
    image_ids (a relation-defined, order-free choice the mirror re-derives).

    Scale shape: the probe table is KB-sized and broadcast once via
    ray.put; each batch computes a vectorized XOR-popcount matrix against
    all probes and emits only its per-probe top-k PARTIAL rows
    (≤ k·n_queries per batch), so the driver-side combine sees
    k·n_queries·n_blocks tiny rows — the corpus itself never shuffles and
    never lands on the driver."""
    _require_i64_dhash(cfg, "hamming_knn")
    import numpy as np
    import pandas as pd  # noqa: F401  (groupby combine below)
    import ray

    from deduplicator_ray.hashing import hamming_u64

    fp = fingerprints(images, cfg)

    def live_proj(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["status"], "ok"),
                       pc.not_equal(t["dhash"], 0))
        return t.filter(mask).select(["image_id", "dhash"])

    proj = fp.map_batches(live_proj, batch_format="pyarrow").materialize()

    # probe election: n smallest ids — per-batch partial min-k, tiny combine
    def partial_min(t: pa.Table) -> pa.Table:
        idx = np.argsort(np.asarray(t["image_id"].to_pylist(),
                                    dtype=object))[:n_queries]
        return t.take(pa.array(idx, pa.int64()))

    probes = proj.map_batches(partial_min, batch_format="pyarrow").to_pandas()
    if probes.empty:  # no live rows at all (empty/all-corrupt corpus)
        return HAMMING_KNN_SCHEMA.empty_table().to_pandas()
    probes = probes.sort_values("image_id").head(n_queries)
    q_ids = probes["image_id"].to_numpy()
    q_hash = probes["dhash"].to_numpy()
    q_ref = ray.put((q_ids, q_hash))

    part_schema = pa.schema([("query_id", pa.string()),
                             ("image_id", pa.string()),
                             ("ham", pa.int64())])

    def partial_topk(t: pa.Table) -> pa.Table:
        qi, qh = ray.get(q_ref)
        ids = np.asarray(t["image_id"].to_pylist(), dtype=object)
        dh = t["dhash"].to_numpy(zero_copy_only=False)
        out_q, out_i, out_h = [], [], []
        for qid, h in zip(qi, qh):
            ham = hamming_u64(dh, np.full(len(dh), h, np.int64)).astype(np.int64)
            keep = ids != qid
            cid, cham = ids[keep], ham[keep]
            if len(cid) > k:
                sel = np.lexsort((cid, cham))[:k]
            else:
                sel = np.lexsort((cid, cham))
            out_q.append(np.full(len(sel), qid, dtype=object))
            out_i.append(cid[sel])
            out_h.append(cham[sel])
        if not out_q:
            return pa.Table.from_batches([], schema=part_schema)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_q)), pa.array(np.concatenate(out_i)),
             pa.array(np.concatenate(out_h))], schema=part_schema)

    parts = proj.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return HAMMING_KNN_SCHEMA.empty_table().to_pandas()
    parts = parts.sort_values(["query_id", "ham", "image_id"],
                              kind="mergesort")
    top = parts.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id", sort=False).cumcount() + 1
    top["rank"] = top["rank"].astype(np.int64)
    return (top[["query_id", "rank", "image_id", "ham"]]
            .reset_index(drop=True))


def dhash_bit_stats(images: rd.Dataset,
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> "pd.DataFrame":
    """Per-bit occupancy of the dHash over the live corpus — the hash-health
    audit: a well-behaved perceptual hash has every bit near 50% set; a bit
    pinned at 0/1 (degenerate corpus, broken kernel, all-flat images) halves
    the effective keyspace and floods LSH buckets.  Scale shape: each batch
    collapses to exactly 64 partial rows (vectorized bit unpack + sum), so
    the combine is a driver-side sum over 64·n_blocks ints."""
    _require_i64_dhash(cfg, "dhash_bit_stats")
    import numpy as np
    import pandas as pd  # noqa: F401  (groupby combine below)

    fp = fingerprints(images, cfg)

    part_schema = pa.schema([("bit", pa.int64()), ("n_set", pa.int64()),
                             ("n_rows", pa.int64())])

    def partial_bits(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["status"], "ok"),
                       pc.not_equal(t["dhash"], 0))
        dh = t.filter(mask)["dhash"].to_numpy(zero_copy_only=False)
        h = dh.astype(np.int64).view(np.uint64)
        bits = np.arange(64, dtype=np.uint64)
        n_set = ((h[:, None] >> bits[None, :]) & np.uint64(1)).sum(
            axis=0).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(bits.astype(np.int64)), pa.array(n_set),
             pa.array(np.full(64, len(h), np.int64))], schema=part_schema)

    parts = fp.map_batches(partial_bits, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return BIT_STATS_SCHEMA.empty_table().to_pandas()
    agg = (parts.groupby("bit", as_index=False)[["n_set", "n_rows"]].sum()
           .sort_values("bit").reset_index(drop=True))
    # an all-dead corpus contributes only n_rows=0 partials; the mirror's
    # cross join over an empty live relation is the EMPTY relation
    agg = agg[agg["n_rows"] > 0]
    agg["set_frac_e6"] = (agg["n_set"] * 1_000_000
                          // agg["n_rows"]).astype(np.int64)
    return (agg[["bit", "n_set", "n_rows", "set_frac_e6"]]
            .reset_index(drop=True))


SAMPLE_WEIGHTS_SCHEMA = pa.schema([
    ("image_id", pa.string()), ("weight_key", pa.string()),
    ("family_size", pa.int64()), ("weight_e6", pa.int64())])


def img_sample_weights(images: rd.Dataset,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       num_parts: int = 64) -> rd.Dataset:
    """Dedup-aware sampling weights: every live image gets
    weight_e6 = 1e6 // family_size, where the family is its
    ``extended_clusters`` component (singletons weigh 1e6).  The standard
    alternative to hard-dropping near-dups for training: each duplicate
    FAMILY contributes one unit of sampling mass however many copies it has,
    so the loader needs no dedup logic — it just samples by weight.

    Scale shape: cluster labels union a 1-column id projection, one
    hash-partitioned groupby resolves each image's family key (exactly the
    split-assignment shape), then ONE more groupby on the family key counts
    members and emits weights vectorized — two narrow all-string shuffles,
    payload bytes never move."""
    from deduplicator_ray.pipelines.doc_dedup import sample_weights_from_labels

    fp = _live(fingerprints(images, cfg), cfg).materialize()
    edges = verified_edges_from_fp(fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    labels = connected_components(edges, cfg)
    ids = fp.map_batches(lambda t: t.select(["image_id"]),
                         batch_format="pyarrow")
    return sample_weights_from_labels(ids, labels, id_col="image_id",
                                      num_parts=num_parts)


# ---------------------------------------------------------------------------
# Tiered duplicate classification — every live image labeled with the
# CHEAPEST tier that already catches it as a duplicate.  The reference
# interleaves these levels implicitly (strict-mode md5 routes byte dups,
# dHash equality routes perceptual dups, /root/reference/dupedb.py:68-101);
# the tier table makes the cascade explicit so an operator can see how much
# of the dedup yield each successive (more expensive) tier buys:
#
#   byte   — byte-identical payload (crc32+proc_hash composite identity;
#            for strict-mode md5_only media proc_hash IS the content md5,
#            so their byte tier is exact)
#   hash   — perceptual-hash-exact (proc_hash equality at cfg.hash_size —
#            the reference's own duplicate definition, dupedb.py:253-257)
#   near   — verified near-dup component member (Hamming/caption-Jaccard
#            extended clusters) not already caught above
#   unique — none of the above (includes every group/cluster keeper:
#            the min-id member is the one the tier "keeps")
#
# dup_of = the min-id member of the binding tier's group (own id for
# 'unique'), so `action = keep iff dup_of == image_id` at every tier.

TIERS_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("tier", pa.string()),
    ("dup_of", pa.string()),
])

_TIERS_MID = pa.schema([
    ("image_id", pa.string()),
    ("byte_min", pa.string()),
    ("hash_min", pa.string()),
    ("cluster_id", pa.string()),
])


def img_dedup_tiers(images: rd.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                    num_parts: int = 64) -> rd.Dataset:
    """(image_id, tier, dup_of) per live image — tier = byte | hash | near |
    unique, first (cheapest) binding tier wins; dup_of = that tier's group
    minimum (own id when unique).

    Scale shape: the fingerprint table (bytes dropped) is materialized once
    and feeds both the near-dup machinery and the identity minima; byte
    groups nest inside hash groups (the byte key is crc32:proc_hash), so ONE
    proc_hash-partitioned groupby computes BOTH group minima; cluster labels
    then union a 3-column minima projection and ONE image_id-partitioned
    groupby classifies — all shuffles carry short strings only."""
    import numpy as np
    import pandas as pd

    fp = _live(fingerprints(images, cfg), cfg).materialize()
    edges = verified_edges_from_fp(fp, cfg).map_batches(
        _strip_overflow, batch_format="pyarrow")
    labels = connected_components(edges, cfg)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": t["image_id"],
            "proc_hash": t["proc_hash"],
            "byte_key": pc.binary_join_element_wise(
                t["crc32"], t["proc_hash"], ":"),
        })

    def minima(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["byte_min"] = df.groupby("byte_key")["image_id"].transform("min")
        df["hash_min"] = df.groupby("proc_hash")["image_id"].transform("min")
        df["cluster_id"] = ""
        return df[["image_id", "byte_min", "hash_min", "cluster_id"]]

    ident = partitioned_groupby(
        fp.map_batches(proj, batch_format="pyarrow"),
        ["proc_hash"], minima, num_parts=num_parts, out_schema=_TIERS_MID)

    def lab(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([""] * n, pa.string())
        return pa.table({"image_id": t["image_id"], "byte_min": empty,
                         "hash_min": empty, "cluster_id": t["cluster_id"]})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["cluster_id"] != ""].drop_duplicates("image_id")
                .set_index("image_id")["cluster_id"])
        base = df.loc[df["cluster_id"] == ""].copy()
        if len(base) == 0:
            return TIERS_SCHEMA.empty_table().to_pandas()
        lbl = base["image_id"].map(lmap).fillna("")
        own = base["image_id"]
        is_byte = base["byte_min"] < own
        is_hash = base["hash_min"] < own
        is_near = (lbl != "") & (lbl < own)
        base["tier"] = np.select(
            [is_byte, is_hash, is_near],
            ["byte", "hash", "near"], default="unique")
        base["dup_of"] = np.select(
            [is_byte, is_hash, is_near],
            [base["byte_min"], base["hash_min"], lbl],
            default=own)
        return base[["image_id", "tier", "dup_of"]]

    unioned = ident.union(labels.map_batches(lab, batch_format="pyarrow"))
    return partitioned_groupby(unioned, ["image_id"], classify,
                               num_parts=num_parts, out_schema=TIERS_SCHEMA)


def img_dedup_tiers_report(images: rd.Dataset,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           num_parts: int = 64):
    """Per-tier rollup of ``img_dedup_tiers``: (tier, n_images) — the
    marginal dedup yield of each successive tier (shared rollup:
    stages/fpsets.fp_tier_report).  Returns a pandas DataFrame."""
    from deduplicator_ray.stages.fpsets import fp_tier_report

    return fp_tier_report(img_dedup_tiers(images, cfg, num_parts=num_parts),
                          "n_images")


# ---------------------------------------------------------------------------
# Perceptual-kernel agreement audit: which duplicate groups each hash
# kernel (dHash vs pHash) catches on this corpus.  The reference offers
# exactly one similarity knob (hash size); an operator choosing a kernel
# for a new corpus needs the disagreement surface — images dup-grouped by
# one kernel but not the other are where the kernels' failure modes
# (gradient-sign vs DCT low-frequency) diverge.  One decode pass emits BOTH
# keys; md5_only media share the md5 key in both keyspaces by construction.

AGREEMENT_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("dup_dhash", pa.int64()),
    ("dup_phash", pa.int64()),
    ("agreement", pa.string()),
])


def img_kernel_agreement(images: rd.Dataset,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         num_parts: int = 64) -> rd.Dataset:
    """(image_id, dup_dhash, dup_phash, agreement) for every image live in
    BOTH kernel keyspaces (status ok/md5_only, zero-hash poison excluded
    per keyspace — the poison sets differ between kernels, so the audit
    universe is their intersection).

    Scale shape: ONE decode pass (the expensive stage) computes both
    64-bit fingerprints from the same pixel array; each keyspace then runs
    one narrow (key, id) groupby for its ≥2-members flag; the two flag
    streams union and ONE image_id-partitioned groupby joins them — no
    payload ever shuffles and nothing decodes twice."""
    import numpy as np
    import pandas as pd

    from deduplicator_ray import codecs, hashing
    from deduplicator_ray.stages.decode_hash import MAX_IMAGE_PIXELS

    hash_size = cfg.hash_size

    dual_schema = pa.schema([("image_id", pa.string()),
                             ("key_d", pa.string()),
                             ("key_p", pa.string()),
                             ("status", pa.string())])

    def dual(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = [str(x) for x in batch["image_id"].to_pylist()]
        payloads = batch["bytes"].to_pylist()
        ws = np.nan_to_num(
            batch["w"].to_numpy(zero_copy_only=False)).astype(np.int64)
        hs = np.nan_to_num(
            batch["h"].to_numpy(zero_copy_only=False)).astype(np.int64)
        fmts = batch["fmt"].to_pylist()
        key_d, key_p, status = [""] * n, [""] * n, ["ok"] * n
        for i in range(n):
            data = payloads[i]
            if data is None:
                status[i] = "error"
                continue
            try:
                if int(ws[i]) * int(hs[i]) > MAX_IMAGE_PIXELS:
                    raise codecs.CodecError("decompression bomb")
                img = codecs.decode_image(data, fmts[i], int(ws[i]),
                                          int(hs[i]))
                key_d[i] = hashing.bits_to_hex(
                    hashing.dhash_bits(img, hash_size))
                key_p[i] = hashing.bits_to_hex(
                    hashing.phash_bits(img, hash_size))
            except codecs.UnsupportedFormatError:
                # same policy gate as decode_hash: the agreement audit's
                # universe must match the dedup keyspace it mirrors —
                # under 'dead_letter' stub media is quarantined, not
                # md5-matched into both kernel keyspaces
                if cfg.unsupported_codec_policy == "dead_letter":
                    status[i] = "error"
                else:
                    md5 = hashing.md5_hex(data)
                    status[i] = "md5_only"
                    key_d[i] = md5
                    key_p[i] = md5
            except (codecs.CodecError, MemoryError):
                status[i] = "error"
        return pa.table({"image_id": ids, "key_d": key_d, "key_p": key_p,
                         "status": status}, schema=dual_schema)

    fp = images.map_batches(dual, batch_format="pyarrow",
                            batch_size=cfg.decode_batch_size)
    fp = fp.map_batches(
        lambda t: t.filter(pc.is_in(t["status"],
                                    value_set=pa.array(["ok", "md5_only"]))),
        batch_format="pyarrow").materialize()

    flag_schema = pa.schema([("image_id", pa.string()),
                             ("side", pa.string()),
                             ("dup", pa.int64())])

    def branch(key_col: str, side: str) -> rd.Dataset:
        def live(t: pa.Table) -> pa.Table:
            keep = pc.invert(
                pc.match_substring_regex(t[key_col], r"^0+$"))
            return pa.table({"image_id": t.filter(keep)["image_id"],
                             "key": t.filter(keep)[key_col]})

        def flags(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["dup"] = (df.groupby("key")["image_id"].transform("size")
                         >= 2).astype(np.int64)
            df["side"] = side
            return df[["image_id", "side", "dup"]]

        return partitioned_groupby(
            fp.map_batches(live, batch_format="pyarrow"),
            ["key"], flags, num_parts=num_parts, out_schema=flag_schema)

    def join(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index="image_id", columns="side",
                              values="dup", aggfunc="first")
        if "d" not in wide.columns or "p" not in wide.columns:
            return AGREEMENT_SCHEMA.empty_table().to_pandas()
        wide = wide.dropna(subset=["d", "p"]).reset_index()
        if len(wide) == 0:
            return AGREEMENT_SCHEMA.empty_table().to_pandas()
        d = wide["d"].astype(np.int64)
        p = wide["p"].astype(np.int64)
        agreement = np.select(
            [(d == 1) & (p == 1), (d == 1) & (p == 0), (d == 0) & (p == 1)],
            ["both", "dhash_only", "phash_only"], default="neither")
        return pd.DataFrame({"image_id": wide["image_id"], "dup_dhash": d,
                             "dup_phash": p, "agreement": agreement})

    unioned = branch("key_d", "d").union(branch("key_p", "p"))
    return partitioned_groupby(unioned, ["image_id"], join,
                               num_parts=num_parts,
                               out_schema=AGREEMENT_SCHEMA)
