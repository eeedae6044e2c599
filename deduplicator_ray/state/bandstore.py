"""Persisted LSH band index for incremental NEAR-dup image ingest.

The Bloom index (state/bloomstore.py) answers the EXACT form of the
reference's incremental scan — "have we already stored this exact
fingerprint?" (/root/reference/dupedb.py:31-66).  This module answers the
NEAR-dup form a 10^12-image ingest actually needs: "does this new image
near-duplicate anything in the corpus we already hold?", without
re-banding or re-reading the known corpus on every increment.

build (once per corpus snapshot)
    known fingerprints → the SAME slice/md5 banding the in-run pipelines
    use (pigeonhole-lossless for the Hamming radius, so the persisted
    relation is EXACT, not probabilistic) → hash-partition on
    (band, key) with the process-deterministic ``_hash_cols`` → one
    hive-partitioned parquet directory per partition
    (``part=N/``, ~45 bytes/row × ~6 band rows/image — keys + ids + the
    small verify payload, never pixels).  ``_params.json`` pins the
    banding config so a probe with mismatched hash_size/hamming_max fails
    loudly instead of silently missing pairs.

probe (every new increment)
    the increment bands the same way, its (small) distinct partition set
    is computed, and ONLY those ``part=N`` directories of the index are
    read — the read-pruning that makes an incremental probe cheap when
    the index holds 10^12 rows and the increment holds 10^6 (same
    pruning pattern as ``functions/vector.ivf_search``).  Probe + pruned
    index rows then flow through the ordinary cross-side verify
    (image_dedup.make_cross_verify): results are IDENTICAL to the in-run
    ``img_cross_min_match`` on the same two sides, value-checked by the
    shared DuckDB mirror.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplicator_ray import io as dio
from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.stages.banding import make_banding
from deduplicator_ray.stages.partitioned import _hash_cols

_PARAMS = "_params.json"
_BAND_COLS = ["band", "key", "image_id", "dhash", "caption"]


def _tag(side: int):
    """1-byte side tag over the band-row payload columns — shared by both
    probe paths so they cannot diverge on the payload selection."""
    def f(t: pa.Table) -> pa.Table:
        return (t.select(_BAND_COLS).append_column(
            "side", pa.array(np.full(len(t), side, np.int8))))

    return f


def _add_part(num_parts: int):
    def f(t: pa.Table) -> pa.Table:
        part = (_hash_cols(t, ["band", "key"])
                % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    return f


def _band_rows(fp: rd.Dataset, cfg: PipelineConfig,
               channels: tuple[str, ...]) -> rd.Dataset:
    """Band-row stage shared by build and probe: the cap channel needs the
    MinHash signature columns first (same order as
    image_dedup.verified_edges_from_fp)."""
    if "cap" in channels:
        from deduplicator_ray.stages.signatures import CaptionSignatures

        fp = fp.map_batches(CaptionSignatures(cfg), batch_format="pyarrow",
                            batch_size=cfg.text_batch_size)
    band = make_banding(cfg, channels)
    return fp.map_batches(band, batch_format="pyarrow",
                          batch_size=cfg.text_batch_size)


def build_band_index(known_fp: rd.Dataset, cfg: PipelineConfig,
                     index_dir: str, num_parts: int = 64,
                     channels: tuple[str, ...] = ("img",)) -> dict:
    """Band the known corpus and persist the band rows hash-partitioned on
    (band, key).  Returns the persisted params."""
    rows = (_band_rows(known_fp, cfg, channels)
            .map_batches(_add_part(num_parts), batch_format="pyarrow"))
    rows.write_parquet(index_dir, partition_cols=["part"])
    params = {"num_parts": num_parts, "hash_size": cfg.hash_size,
              "hamming_max": cfg.hamming_max,
              "channels": list(channels)}
    if "cap" in channels:
        # the caption channel's band keys depend on the MinHash params —
        # pin them too, or a probe with a drifted cfg silently misses
        # caption near-dups (the docbandstore._PIN policy)
        params.update({k: getattr(cfg, k) for k in _CAP_PIN})
    with open(os.path.join(index_dir, _PARAMS), "w") as f:
        json.dump(params, f)
    return params


def append_band_index(new_fp: rd.Dataset, index_dir: str,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """Fold an increment's band rows into the persisted index WITHOUT
    touching existing files — the ingest loop's third step (probe the
    increment, fold its clusters, append it so the NEXT increment sees
    it).  The increment bands with the params pinned at build time (same
    channels, config drift fails loudly) and its rows land as additional
    parquet files inside the same ``part=N`` hive directories (Ray's
    writer generates unique file names, so appends never clobber); probe
    and prune are oblivious to the append.  Unlike the IVF append there
    is NO drift: banding is stateless, so build(A)+append(B) holds
    exactly the rows of build(A∪B).  Returns the appended row count."""
    params = _load_params(index_dir, cfg)
    channels = tuple(params.get("channels", ["img"]))
    rows = (_band_rows(new_fp, cfg, channels)
            .map_batches(_add_part(params["num_parts"]),
                         batch_format="pyarrow")
            .materialize())
    rows.write_parquet(index_dir, partition_cols=["part"])
    return rows.count()


# caption-channel banding params: drift here changes the persisted band
# KEYS just as surely as hash_size does on the image channel (verify-time
# thresholds like jaccard_min stay unpinned — re-thresholding a built
# index is a supported workflow)
_CAP_PIN = ("shingle_k", "num_perm", "bands", "rows_per_band")


def _load_params(index_dir: str, cfg: PipelineConfig) -> dict:
    with open(os.path.join(index_dir, _PARAMS)) as f:
        params = json.load(f)
    # hash_size changes the band KEYS; hamming_max does NOT (the slice
    # count is fixed at 5 in both the 64-bit and wide paths) — it is a
    # verify-time threshold, and re-thresholding a built index is the
    # supported workflow the module comment promises
    pins = ["hash_size"]
    if "cap" in params.get("channels", []):
        pins += [k for k in _CAP_PIN if k in params]  # old indexes lack them
    for k in pins:
        if params[k] != getattr(cfg, k):
            raise ValueError(
                f"band index was built with {k}={params[k]}, probe cfg has "
                f"{getattr(cfg, k)} — matches would be silently wrong")
    return params


def _probe_prune(probe: rd.Dataset, index_dir: str, num_parts: int,
                 stats: dict | None):
    """Two-level read pruning shared by the index probes, both exact:

      1. partition level — only ``part=`` directories the probe's own
         band rows hash into (wins when the increment is minuscule);
      2. bucket level — the probe's (band, key) membership pushed down
         into the parquet fragment scan, so index rows outside probed
         buckets never enter the object store or the verify shuffle
         (wins at ANY increment size: a 2% increment touches every
         partition but ~2-15% of each band's key space).

    Returns (existing partition paths, pyarrow.dataset filter expr)."""
    key_by_band: dict[int, set[int]] = {}
    nparts: set[int] = set()
    # pruning needs ONLY the narrow key columns — pulling the whole probe
    # (band rows carry payload text/captions ×cfg.bands) to the driver
    # would OOM at exactly the increment sizes this module advertises
    for b in (probe.select_columns(["part", "band", "key"])
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        nparts.update(b["part"].to_pylist())
        for band, key in zip(b["band"].to_pylist(), b["key"].to_pylist()):
            key_by_band.setdefault(int(band), set()).add(key)
    paths = [os.path.join(index_dir, f"part={p}")
             for p in sorted(int(p) for p in nparts)]
    paths = [p for p in paths if os.path.isdir(p)]
    if stats is not None:
        stats["parts_read"] = len(paths)
        stats["parts_total"] = num_parts

    import pyarrow.dataset as pads

    expr = None
    for band, ks in sorted(key_by_band.items()):
        e = ((pads.field("band") == band)
             & pads.field("key").isin(pa.array(sorted(ks), pa.int64())))
        expr = e if expr is None else (expr | e)
    return paths, expr


def probe_band_delta_edges(new_fp: rd.Dataset, index_dir: str,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           stats: dict | None = None) -> rd.Dataset:
    """Increment-touched verified near-dup EDGES (src, dst) against a
    persisted BOTH-CHANNEL band index — the edge-emitting probe that feeds
    ``stages/components.incremental_cc_update``.  Reads ONLY the index
    partitions the increment's own band rows hash into; results equal
    ``image_dedup.img_delta_edges`` on the same two sides (buckets in
    unread partitions contain no new rows, and the delta verify skips
    all-known buckets by definition)."""
    from deduplicator_ray.pipelines.image_dedup import make_img_delta_verify
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    params = _load_params(index_dir, cfg)
    channels = tuple(params.get("channels", ["img"]))
    num_parts = params["num_parts"]

    probe = (_band_rows(new_fp, cfg, channels)
             .map_batches(_add_part(num_parts), batch_format="pyarrow")
             .materialize())  # the increment is the SMALL side by design

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    # two-level read pruning (_probe_prune), both exact here: the delta
    # verify ignores all-known buckets anyway, so dropping known rows
    # outside probe-touched buckets cannot change the result
    paths, expr = _probe_prune(probe, index_dir, num_parts, stats)

    probe_rows = probe.map_batches(_tag(1), batch_format="pyarrow")
    rows = (probe_rows if not paths else
            dio.read_parquet(paths, filter=expr).map_batches(
                _tag(0), batch_format="pyarrow").union(probe_rows))
    return partitioned_groupby(rows, ["band", "key"],
                               make_img_delta_verify(cfg),
                               out_schema=edge_schema)


def probe_band_index(new_fp: rd.Dataset, index_dir: str,
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     stats: dict | None = None) -> rd.Dataset:
    """(image_id, matched) for every new-side fingerprint that near-dups
    the indexed corpus — the persisted-index equivalent of
    ``image_dedup.img_cross_min_match``.  ``stats`` (optional dict) gets
    ``parts_read`` / ``parts_total`` so callers can assert read pruning."""
    from deduplicator_ray.pipelines.image_dedup import (
        CROSS_MATCH_SCHEMA,
        cross_min_from_band_rows,
    )

    params = _load_params(index_dir, cfg)
    if params.get("channels", ["img"]) != ["img"]:
        raise ValueError(
            "probe_band_index matches the img channel only; this index was "
            f"built with channels={params['channels']} — use "
            "probe_band_delta_edges for a both-channel index")
    num_parts = params["num_parts"]

    probe = (_band_rows(new_fp, cfg, ("img",))
             .map_batches(_add_part(num_parts), batch_format="pyarrow")
             .materialize())  # the increment is the SMALL side by design

    # same two-level pruning as the delta probe — exact here too: a match
    # can only arise in a bucket the probe itself occupies, so unprobed
    # (band, key) index rows cannot change any new row's verdict
    paths, expr = _probe_prune(probe, index_dir, num_parts, stats)
    if not paths:
        return rd.from_arrow(CROSS_MATCH_SCHEMA.empty_table())

    idx_rows = dio.read_parquet(paths, filter=expr).map_batches(
        _tag(0), batch_format="pyarrow")
    probe_rows = probe.map_batches(_tag(1), batch_format="pyarrow")
    return cross_min_from_band_rows(idx_rows.union(probe_rows), cfg)


def prune_band_index(removed_ids, index_dir: str,
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     stats: dict | None = None) -> dict:
    """Retire vanished ids from the persisted band index — the index-side
    prune the reference runs over its shelve store (a chunked full scan of
    stored keys dropping vanished files, /root/reference/dupedb.py:371-411;
    a scan is unavoidable here too: a vanished file's band keys are only
    recoverable FROM the index).  The scan is partition-granular and
    column-pruned: each ``part=N`` directory is inspected by a Ray task
    reading ONLY its ``image_id`` column; untouched partitions are left
    byte-identical (resumable: re-running the prune re-touches nothing),
    touched partitions are rewritten without the retired rows.  Crash
    safety is at-least-once: the rewritten file lands before the old files
    are deleted, and a duplicate band row merely re-emits an edge the
    verify/CC stages already tolerate.

    Returns/fills summary counts (``parts_touched``, ``rows_before``,
    ``rows_after``)."""
    import ray

    params = _load_params(index_dir, cfg)
    removed = {str(x) for x in removed_ids}
    part_dirs = sorted(
        os.path.join(index_dir, d) for d in os.listdir(index_dir)
        if d.startswith("part=")
        and os.path.isdir(os.path.join(index_dir, d)))
    if not removed or not part_dirs:
        out = {"parts_total": len(part_dirs), "parts_touched": 0,
               "rows_before": 0, "rows_after": 0}
        if stats is not None:
            stats.update(out)
        return out

    rem_ref = ray.put(pa.array(sorted(removed), pa.string()))

    @ray.remote(num_cpus=1)
    def prune_part(part_dir: str, rm: pa.Array) -> tuple[int, int, int]:
        import glob
        import uuid

        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        if not files:
            return (0, 0, 0)
        # streamed, column-pruned membership peek — untouched parts are
        # never rewritten, and no whole-partition table is ever held in
        # one task's memory (a 10^12-row index's partition exceeds any
        # worker heap — review-found)
        ds_ = pads.dataset(files, format="parquet")
        n = 0
        nhit = 0
        for b in ds_.scanner(columns=["image_id"]).to_batches():
            n += len(b)
            nhit += int(pc.sum(
                pc.is_in(b["image_id"], value_set=rm)).as_py() or 0)
        if nhit == 0:
            return (n, n, 0)
        # stale partials from a previous crash: readers glob *.parquet so
        # .tmp files are invisible to them — clear before rewriting
        for stale in glob.glob(os.path.join(part_dir, "*.parquet.tmp")):
            os.remove(stale)
        # stream the rewrite through a .tmp name and rename ATOMICALLY
        # before the old files go: a crash mid-write leaves only an
        # ignored .tmp beside intact originals, never a truncated
        # .parquet that breaks every later probe/prune (review-found)
        tmp = os.path.join(part_dir,
                           f"pruned-{uuid.uuid4().hex}.parquet.tmp")
        writer = None
        kept_rows = 0
        for b in ds_.scanner().to_batches():
            t = pa.Table.from_batches([b])
            kept = t.filter(
                pc.invert(pc.is_in(t["image_id"], value_set=rm)))
            if writer is None:
                writer = pq.ParquetWriter(tmp, kept.schema)
            if kept.num_rows:
                writer.write_table(kept)
            kept_rows += kept.num_rows
        if writer is not None:
            writer.close()
            os.rename(tmp, tmp[: -len(".tmp")])  # lands BEFORE old files go
        for f in files:
            os.remove(f)
        return (n, kept_rows, 1)

    results = ray.get([prune_part.remote(d, rem_ref) for d in part_dirs])
    out = {"parts_total": len(part_dirs),
           "parts_touched": sum(r[2] for r in results),
           "rows_before": sum(r[0] for r in results),
           "rows_after": sum(r[1] for r in results)}
    if stats is not None:
        stats.update(out)
    return out
