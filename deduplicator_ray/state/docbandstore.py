"""Persisted MinHash band index for incremental DOCUMENT near-dup ingest.

The text counterpart of the image band store (state/bandstore.py), closing
the persisted-index matrix's last cell: exact (bloomstore), image near-dup
(bandstore), embedding near-dup (srpstore), ANN top-k (IVF) — and now doc
near-dup: "which documents in the corpus we already hold does this new
crawl near-duplicate?", answered without re-shingling or re-reading the
known corpus.

build (once per corpus snapshot)
    known docs → the SAME MinHash banding the in-run pipelines use
    (doc_dedup.doc_band_rows: char-shingle MinHash, cfg.bands ×
    cfg.rows_per_band) → hash-partition on (band, key) → one hive
    ``part=N/`` parquet directory per partition.  Band rows carry the doc
    TEXT (the exact-Jaccard verify payload), so the index stores
    ~cfg.bands× the corpus text — the price of a self-contained
    shuffle-free probe; parquet dictionary/zstd compression absorbs most
    of it, and the alternative (text in a separate keyed table, joined at
    probe time) costs an extra shuffle per probe.  ``_params.json`` pins
    the banding config; a probe with drifted shingle/band params fails
    loudly instead of silently missing candidates.

probe (every new crawl increment)
    the increment bands identically; ONLY the ``part=N`` directories its
    band rows hash into are opened, with the probe's (band, key)
    membership pushed into the parquet fragment scan.  Probe + pruned
    index rows then flow through the ordinary cross-side min-match verify
    (doc_dedup.min_match_from_band_rows) — results are IDENTICAL to the
    in-run ``cross_dup_min_match`` on the same two sides, value-checked by
    the shared DuckDB mirror (exact cross-side Jaccard ≥ threshold).

append (every accepted increment)
    banding is a pure per-doc function, so folding an increment is
    append-only parquet inside the same hive partitions:
    build(A) + append(B) answers probes exactly like build(A ∪ B).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplicator_ray import io as dio
from deduplicator_ray.config import DEFAULT_CONFIG, PipelineConfig
from deduplicator_ray.pipelines.doc_dedup import (
    doc_band_rows,
    min_match_from_band_rows,
    tag_side,
)
from deduplicator_ray.stages.partitioned import _hash_cols

_PARAMS = "_params.json"
_PIN = ("shingle_k", "num_perm", "bands", "rows_per_band")


def _add_part(num_parts: int):
    def f(t: pa.Table) -> pa.Table:
        part = (_hash_cols(t, ["band", "key"])
                % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    return f


def build_doc_band_index(known: rd.Dataset, cfg: PipelineConfig,
                         index_dir: str, num_parts: int = 64,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> dict:
    """Band the known docs and persist hash-partitioned on (band, key)."""
    rows = (doc_band_rows(known, cfg, id_col, text_col)
            .map_batches(_add_part(num_parts), batch_format="pyarrow"))
    rows.write_parquet(index_dir, partition_cols=["part"])
    params = {"num_parts": num_parts,
              **{k: getattr(cfg, k) for k in _PIN}}
    with open(os.path.join(index_dir, _PARAMS), "w") as f:
        json.dump(params, f)
    return params


def append_doc_band_index(new: rd.Dataset, index_dir: str,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> int:
    """Fold an increment in append-only (existing files untouched).
    Returns the appended band-row count."""
    params = _load_params(index_dir, cfg)
    rows = (doc_band_rows(new, cfg, id_col, text_col)
            .map_batches(_add_part(params["num_parts"]),
                         batch_format="pyarrow")
            .materialize())
    rows.write_parquet(index_dir, partition_cols=["part"])
    return rows.count()


def _load_params(index_dir: str, cfg: PipelineConfig) -> dict:
    with open(os.path.join(index_dir, _PARAMS)) as f:
        params = json.load(f)
    for k in _PIN:
        if params[k] != getattr(cfg, k):
            raise ValueError(
                f"doc band index was built with {k}={params[k]}, probe cfg "
                f"has {getattr(cfg, k)} — candidates would be silently "
                "missed")
    return params


def probe_doc_band_index(new: rd.Dataset, index_dir: str,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         id_col: str = "doc_id", text_col: str = "text",
                         stats: dict | None = None) -> rd.Dataset:
    """(doc_id:int64, matched:int64) — for each new doc that near-dups the
    indexed corpus (exact cross-side Jaccard ≥ cfg.jaccard_min), the
    smallest matching known id.  ``stats`` gets parts_read/parts_total so
    callers can assert read pruning."""
    params = _load_params(index_dir, cfg)
    num_parts = params["num_parts"]

    probe = (doc_band_rows(new, cfg, id_col, text_col)
             .map_batches(_add_part(num_parts), batch_format="pyarrow")
             .materialize())  # the increment is the SMALL side by design

    # partition- and bucket-level read pruning (bandstore pattern)
    key_by_band: dict[int, set[int]] = {}
    nparts: set[int] = set()
    # narrow projection only: doc band rows carry the text payload
    # ×cfg.bands — the driver needs just the key columns
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

    cols = ["band", "key", "image_id", "dhash", "caption"]

    def select_tag(side: int):
        tagger = tag_side(side)

        def f(t: pa.Table) -> pa.Table:
            return tagger(t.select(cols))

        return f

    probe_rows = probe.map_batches(select_tag(1), batch_format="pyarrow")
    rows = (probe_rows if not paths else
            dio.read_parquet(paths, filter=expr).map_batches(
                select_tag(0), batch_format="pyarrow").union(probe_rows))
    return min_match_from_band_rows(rows, cfg)
