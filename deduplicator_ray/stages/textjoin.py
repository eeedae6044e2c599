"""Two-sided partitioned pair-text join: the scale shape for exact verify.

Candidate generation (banding / prefix filtering) emits narrow (src, dst)
pairs, but EXACT verification needs both documents' contents.  The round-2
engine broadcast a ``{doc_id: shingle_set}`` dict of the full corpus via
``ray.put`` — a driver/worker OOM at 100-TB corpus scale.  This module
replaces the broadcast with the textbook two-exchange join BASELINE.md
sketched:

  stage A — partition on ``src``: union the pair rows (keyed by src) with
      the text table (keyed by doc_id); inside each partition a vectorized
      pandas map attaches ``text_a`` to every pair row.
  stage B — partition on ``dst``: union the stage-A rows (now keyed by
      dst, carrying text_a) with the text table again; attach ``text_b``
      and run the caller's ``verify`` on the completed pairs.

Costs at scale: the text table crosses the exchange twice (hash-keyed,
streaming, spillable — the same order of bytes the shingle-row stages
already move), and a doc's text is replicated once per candidate pair it
appears in, which prefix filtering keeps proportional to the true near-dup
density.  No driver materialization, no ``ray.put`` of any corpus-sized
structure.

Reference semantics anchored: /root/reference/compare.py:342-420 verifies
candidate image pairs by loading both members; this is the same
"co-locate the pair's payloads, then verify exactly" contract expressed
as two keyed exchanges.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from deduplicator_ray.stages.partitioned import partitioned_groupby

_PTJ_SCHEMA = pa.schema([
    ("key", pa.int64()),      # partition key for the NEXT exchange
    ("src", pa.int64()),
    ("dst", pa.int64()),
    ("payload", pa.string()),  # tag=0: the doc's text; tag=1: text_a
    ("tag", pa.int8()),        # 0 = text row, 1 = pair row
])


def _tag_text(t: pa.Table) -> pa.Table:
    n = t.num_rows
    return pa.Table.from_arrays([
        pc.cast(t["doc_id"], pa.int64()),
        pa.array(np.full(n, -1, np.int64)),
        pa.array(np.full(n, -1, np.int64)),
        pc.cast(t["text"], pa.string()),
        pa.array(np.zeros(n, np.int8)),
    ], schema=_PTJ_SCHEMA)


def _tag_pairs(t: pa.Table) -> pa.Table:
    n = t.num_rows
    return pa.Table.from_arrays([
        pc.cast(t["src"], pa.int64()),
        pc.cast(t["src"], pa.int64()),
        pc.cast(t["dst"], pa.int64()),
        pa.nulls(n, pa.string()),
        pa.array(np.ones(n, np.int8)),
    ], schema=_PTJ_SCHEMA)


def _attach_a(df: pd.DataFrame) -> pd.DataFrame:
    """Stage-A partition fn: key == src here; attach text_a, re-key by dst.
    Pairs whose src has no text row are dropped (same contract as the old
    dict lookup's ``sa is None: continue``)."""
    texts = df[df["tag"] == 0]
    pairs = df[df["tag"] == 1]
    if pairs.empty:
        return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                             "src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64),
                             "payload": pd.Series([], dtype=object),
                             "tag": pd.Series([], dtype=np.int8)})
    # duplicate text rows for one key (possible after append-mode stores
    # accumulate) resolve to the MIN payload — deterministic across runs,
    # unlike keep='first' over the shuffle's arbitrary row order
    lut = (pd.Series(texts["payload"].to_numpy(),
                     index=texts["key"].to_numpy())
           .groupby(level=0).min())
    text_a = pairs["key"].map(lut)
    keep = text_a.notna().to_numpy()
    out = pd.DataFrame({
        "key": pairs["dst"].to_numpy(dtype=np.int64)[keep],
        "src": pairs["src"].to_numpy(dtype=np.int64)[keep],
        "dst": pairs["dst"].to_numpy(dtype=np.int64)[keep],
        "payload": text_a.to_numpy(dtype=object)[keep],
    })
    out["tag"] = np.int8(1)
    return out


def pair_text_join(
    cands: rd.Dataset,
    texts_a: rd.Dataset,
    texts_b: rd.Dataset,
    verify: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: pa.Schema,
    num_parts: int = 64,
) -> rd.Dataset:
    """Attach both sides' text to every (src, dst) candidate pair through
    two key-partitioned exchanges, then apply ``verify`` per partition.

    ``cands``: (src:int64, dst:int64) rows.  ``texts_a`` / ``texts_b``:
    (doc_id, text) rows for the src / dst side (pass the same dataset twice
    for a self-join).  ``verify`` receives a pandas frame with columns
    (src, dst, text_a, text_b) — complete pairs only, any pair missing a
    side is dropped — and returns the output rows for ``out_schema``.
    """
    stage_a = partitioned_groupby(
        texts_a.map_batches(_tag_text, batch_format="pyarrow")
        .union(cands.map_batches(_tag_pairs, batch_format="pyarrow")),
        ["key"], _attach_a, num_parts=num_parts, out_schema=_PTJ_SCHEMA)

    def verify_part(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[df["tag"] == 0]
        pairs = df[df["tag"] == 1]
        if pairs.empty:
            return out_schema.empty_table().to_pandas()
        lut = (pd.Series(texts["payload"].to_numpy(),
                         index=texts["key"].to_numpy())
               .groupby(level=0).min())  # deterministic dup-key resolve
        text_b = pairs["key"].map(lut)
        keep = text_b.notna().to_numpy()
        full = pd.DataFrame({
            "src": pairs["src"].to_numpy(dtype=np.int64)[keep],
            "dst": pairs["dst"].to_numpy(dtype=np.int64)[keep],
            "text_a": pairs["payload"].to_numpy(dtype=object)[keep],
            "text_b": text_b.to_numpy(dtype=object)[keep],
        })
        if full.empty:
            return out_schema.empty_table().to_pandas()
        return verify(full)

    return partitioned_groupby(
        texts_b.map_batches(_tag_text, batch_format="pyarrow")
        .union(stage_a),
        ["key"], verify_part, num_parts=num_parts, out_schema=out_schema)
