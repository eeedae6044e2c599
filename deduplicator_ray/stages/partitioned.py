"""Partitioned-groupby: the scale pattern for high-cardinality keys.

``Dataset.groupby(key).map_groups(fn)`` invokes Python once per GROUP.  For
keys with millions of tiny groups (LSH buckets, pair dedup, exact dedup)
that per-group overhead dominates wall-clock.  The fix: group by a
*partition* of the key space — ``part = hash(key) % P`` — so the shuffle
still co-locates every row of a key, but Python runs once per PARTITION and
the per-key logic inside is vectorized pandas/numpy.

P is a knob: at sandbox scale a few × cores; at cluster scale thousands
(each partition must fit in a worker's heap).  Correctness is independent
of P because the hash partition is a refinement-preserving map: key-equal
rows always share a partition.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_cols(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Vectorized 64-bit hash of the key columns.

    MUST be process-deterministic: Python's builtin ``hash()`` is salted per
    interpreter (PYTHONHASHSEED), so using it would scatter the same key
    into different partitions from different workers and silently break
    every partitioned groupby.  Strings use pandas' C-level siphash with a
    FIXED key (process-deterministic, unlike builtin hash); only partition
    spread is needed here, not 64-bit collision resistance.

    Integer columns are null-filled BEFORE numpy conversion: a nullable
    int64 block converts via float64, where large keys lose low bits —
    the same key would hash differently depending on whether its block
    happened to contain a null, breaking the key-equal-rows-share-a-
    partition invariant every partitioned op relies on (nulls simply
    co-partition with the fill value, which is harmless)."""
    import zlib

    acc = np.zeros(t.num_rows, np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = t[k]
            if pa.types.is_integer(col.type):
                v = (pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
                     .astype(np.int64).view(np.uint64))
            elif pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                s = pc.fill_null(col, "").to_pandas()
                v = pd.util.hash_array(s.to_numpy(dtype=object),
                                       hash_key="dedup_ray_part16",
                                       categorize=False).view(np.uint64)
            else:
                v = np.fromiter(
                    (zlib.crc32(str(x).encode()) for x in col.to_pylist()),
                    dtype=np.uint64, count=t.num_rows,
                )
            acc = (acc ^ v) * _MIX
    return acc


def _group_codes(t: pa.Table, keys: list[str]) -> np.ndarray:
    """EXACT per-row group codes for the key tuple, Arrow-native.

    Unlike ``_hash_cols`` (a 64-bit partition spreader where collisions
    only cost skew), these codes must be collision-free within the
    table: they drive dedup/first/size logic.  Single integer keys code
    via ``np.unique`` on the raw values; everything else goes through
    the string form joined with an \\x1f separator and dictionary
    encoding (exact — the dictionary compares full strings).  Nulls get
    a sentinel so null-keyed rows form one real group, matching the
    pandas helpers' nulls-equal semantics."""
    if all(pa.types.is_integer(t[k].type) for k in keys):
        try:
            # cast to int64 FIRST: fill_null's int64-min sentinel cannot
            # be represented in narrower columns and pyarrow refuses it
            # even on null-free data (review-found crash on int32 keys);
            # a uint64 value past int63 fails the safe cast and falls
            # back to the exact string path below
            cols = [(pc.fill_null(pc.cast(t[k], pa.int64()),
                                  np.iinfo(np.int64).min + 1)
                     .to_numpy(zero_copy_only=False).astype(np.int64))
                    for k in keys]
        except (pa.ArrowInvalid, OverflowError):
            cols = None
        if cols is not None:
            if len(cols) == 1:
                return np.unique(cols[0], return_inverse=True)[1]
            # exact multi-int codes without string materialization: view
            # the row-contiguous stack as fixed-width void records and
            # unique those (C-level lexsort — the string join path built
            # ~40 B of garbage per row on int64 pair dedups)
            packed = np.ascontiguousarray(np.stack(cols, axis=1))
            recs = packed.view([("", np.int64)] * len(cols)).reshape(-1)
            return np.unique(recs, return_inverse=True)[1]
    parts = [pc.fill_null(pc.cast(t[k], pa.string()), "\x00null")
             for k in keys]
    joined = (parts[0] if len(parts) == 1
              else pc.binary_join_element_wise(*parts, "\x1f"))
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return pc.dictionary_encode(joined).indices.to_numpy(
        zero_copy_only=False)


def partitioned_groupby(
    ds: rd.Dataset,
    keys: list[str],
    fn: Callable,
    num_parts: int = 64,
    out_schema: pa.Schema | None = None,
    fmt: str = "pandas",
) -> rd.Dataset:
    """Apply ``fn`` to each key-partition (a pandas DataFrame containing
    complete key groups, possibly many).  ``fn`` must do its own per-key
    logic vectorized (e.g. ``df.groupby(keys, sort=False)`` / sort + mask).

    ``fmt="pyarrow"``: the Arrow-native apply path — ``fn`` receives and
    returns ``pa.Table`` and the exchange never converts to pandas.  The
    sorted block's ``__part`` runs are zero-copy slices, so string-heavy
    columns skip the Arrow→object-array→Arrow round trip entirely (the
    constant-factor cost of the pandas path on this engine's most-used
    primitive).  Prefer it for new UDFs; the pandas path remains for
    UDFs that genuinely need pandas kernels.

    ``out_schema``: pass it when ``fn`` can return EMPTY frames whose
    dtypes are ambiguous (object-dtype string columns) — empty pandas
    blocks otherwise infer null types and downstream operators see a
    drifting schema per partition ("RefBundle with a different schema"
    warnings, CORRECTNESS_r01).  With a schema, every partition emits an
    Arrow table of the exact same schema, empty or not.

    The partition id is refined ×16 beyond ``num_parts``: Ray's sort-based
    groupby range-partitions on sampled key boundaries, and a LOW-cardinality
    key (e.g. 64 distinct ids over ~200 sort ranges) samples duplicate
    boundaries → empty ranges → schema-less empty blocks (the "new schema:
    ." executor warnings).  Refinement preserves correctness (key-equal rows
    still share a partition — it's a finer refinement of the same hash
    partition) while making the key cardinality comfortably exceed any sort
    fan-out; ``fn`` just runs on 16× smaller, still fully-vectorized
    partitions."""
    fine_parts = num_parts * 16

    def add_part(t: pa.Table) -> pa.Table:
        part = (_hash_cols(t, keys) % np.uint64(fine_parts)).astype(np.int32)
        return t.append_column("__part", pa.array(part))

    # sort + whole-block map_batches is exactly what Dataset.map_groups is
    # built from (grouped_data.py sorts, then slices group runs per block
    # with batch_size=None), re-expressed here for two reasons:
    #   1. an EMPTY sort range never calls the UDF, so Ray emits a
    #      schema-LESS empty block ("RefBundle with a different schema ...
    #      new schema: ." executor warnings, CORRECTNESS_r01) — here empty
    #      input yields a TYPED empty table when out_schema is known;
    #   2. one pandas groupby per BLOCK (usually many partitions) replaces
    #      one Python call per group slice.
    # Ray's own map_groups already relies on sort never splitting key-equal
    # rows across range boundaries, so this co-location contract is the
    # same one the stock API uses.
    empty_out = (pa.Table.from_batches([], schema=out_schema)
                 if out_schema is not None else None)

    if fmt == "pyarrow":

        def apply_blocks_arrow(t: pa.Table):
            outs = []
            if t.num_rows:
                part = t["__part"].to_numpy(zero_copy_only=False)
                body = t.drop_columns(["__part"])
                # the block arrives sorted on __part: partition runs are
                # contiguous, so boundaries are one diff away and every
                # sub-table is a zero-copy slice
                bounds = np.flatnonzero(np.diff(part)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(part)]))
                for s, e in zip(starts, ends):
                    out = fn(body.slice(s, int(e - s)))
                    if out.num_rows:
                        outs.append(out)
            if not outs:
                if empty_out is not None:
                    yield empty_out
                return
            res = pa.concat_tables(outs) if len(outs) > 1 else outs[0]
            if out_schema is not None and res.schema != out_schema:
                res = res.cast(out_schema)
            yield res.replace_schema_metadata(None)

        return (
            ds.map_batches(add_part, batch_format="pyarrow")
            .sort("__part")
            .map_batches(apply_blocks_arrow, batch_size=None,
                         batch_format="pyarrow")
        )

    def apply_blocks(df: pd.DataFrame):
        outs = []
        if len(df):
            for _, g in df.groupby("__part", sort=False):
                out = fn(g.drop(columns="__part"))
                if len(out):
                    outs.append(out)
        if not outs:
            if empty_out is not None:
                yield empty_out
            return
        res = pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]
        if out_schema is not None:
            yield pa.Table.from_pandas(
                res, schema=out_schema, preserve_index=False
            ).replace_schema_metadata(None)
        else:
            # metadata stripped: a schema carrying the b'pandas' blob is
            # unhashable (pyarrow hashes the metadata dict) and trips
            # Ray's schema-dedup on every concat
            yield pa.Table.from_pandas(
                res.reset_index(drop=True), preserve_index=False
            ).replace_schema_metadata(None)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .sort("__part")
        .map_batches(apply_blocks, batch_size=None, batch_format="pandas")
    )


def partitioned_merge_str(
    left: rd.Dataset,
    right: rd.Dataset,
    left_cols: list[str],
    right_cols: list[str],
    left_on: str,
    right_on: str,
    how: str = "left",
    num_parts: int = 64,
) -> rd.Dataset:
    """Hash-partitioned equi-join for ALL-STRING frames via the partition
    pattern: both sides get ``part = hash(key) % P`` and a side tag, the
    union (schema-aligned by ''-padding the other side's columns) is grouped
    by partition, and each partition does one vectorized ``pandas.merge``.
    No join-actor pool, no per-group Python.  Non-key column names must be
    disjoint between sides."""

    all_cols = list(dict.fromkeys(left_cols + right_cols))
    fine_parts = num_parts * 16  # see partitioned_groupby on sort-range cardinality
    out_cols = list(dict.fromkeys(left_cols + [c for c in right_cols if c != right_on]))
    out_schema = pa.schema([(c, pa.string()) for c in out_cols])

    def tag(side: str, key: str, own_cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays, names = [], []
            cast_cols = {}
            for c in all_cols:
                names.append(c)
                if c in own_cols:
                    col = (t[c].cast(pa.string())
                           if t[c].type != pa.string() else t[c])
                    cast_cols[c] = col
                    arrays.append(col)
                else:
                    arrays.append(pa.array([""] * n, pa.string()))
            # hash the STRING form of the key (the merge compares strings):
            # hashing the pre-cast column would route int 5 and "5" to
            # different partitions and silently drop their matches
            kt = pa.table({key: cast_cols[key]})
            part = (_hash_cols(kt, [key]) % np.uint64(fine_parts)).astype(np.int32)
            names += ["__part", "__side"]
            arrays += [pa.array(part), pa.array([side] * n, pa.string())]
            return pa.Table.from_arrays(arrays, names=names)

        return f

    empty_out = pa.Table.from_batches([], schema=out_schema)

    def merge_blocks(df: pd.DataFrame):
        # see partitioned_groupby: sort + block map with typed empties
        outs = []
        if len(df):
            for _, g in df.groupby("__part", sort=False):
                l = g.loc[g["__side"] == "l", left_cols]
                r = g.loc[g["__side"] == "r", right_cols]
                out = l.merge(r, how=how, left_on=left_on, right_on=right_on)
                if len(out):
                    if not set(out_cols) <= set(out.columns):
                        # non-disjoint side columns got suffixed — fail at
                        # the cause, not in a downstream concat/from_pandas
                        raise ValueError(
                            "partitioned_merge_str: non-key columns must "
                            f"be disjoint; merge produced {list(out.columns)}"
                            f" but expected {out_cols}")
                    if how != "inner":
                        # unmatched right side: the module's missing-string
                        # sentinel is '', not null
                        out = out.fillna("")
                    outs.append(out[out_cols])
        if not outs:
            yield empty_out
            return
        res = pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]
        yield pa.Table.from_pandas(
            res, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    u = left.map_batches(tag("l", left_on, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag("r", right_on, right_cols), batch_format="pyarrow")
    )
    return u.sort("__part").map_batches(
        merge_blocks, batch_size=None, batch_format="pandas")


def drop_duplicates(ds: rd.Dataset, keys: list[str], num_parts: int = 64) -> rd.Dataset:
    """Global distinct-on-keys via the partition pattern — Arrow-native:
    exact group codes + first-occurrence take, no pandas round trip."""

    def f(t: pa.Table) -> pa.Table:
        codes = _group_codes(t, keys)
        first = np.unique(codes, return_index=True)[1]
        first.sort()
        return t.take(pa.array(first))

    return partitioned_groupby(ds, keys, f, num_parts, fmt="pyarrow")


def keep_first(ds: rd.Dataset, keys: list[str], order: list[str],
               num_parts: int = 64) -> rd.Dataset:
    """Exact dedup: first row per key group under ``order`` — Arrow-native
    stable sort + first-occurrence take (replaces per-group map_groups).
    Arrow's ``sort_indices`` is stable and orders UTF-8 strings by byte
    (== codepoint) order with nulls last, matching the pandas
    ``sort_values(kind='mergesort')`` semantics this replaces."""

    def f(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[(o, "ascending") for o in order])
        t2 = t.take(idx)
        codes = _group_codes(t2, keys)
        first = np.unique(codes, return_index=True)[1]
        first.sort()
        return t2.take(pa.array(first))

    return partitioned_groupby(ds, keys, f, num_parts, fmt="pyarrow")


def filter_min_group_size(ds: rd.Dataset, keys: list[str], min_size: int,
                          num_parts: int = 64) -> rd.Dataset:
    """Keep only rows whose key group has ≥ min_size members (bucket
    threshold, /root/reference/dupedb.py:331) — Arrow-native bincount
    over exact group codes.  Null-keyed rows form a real group
    (the ``_group_codes`` sentinel), consistent with drop_duplicates/
    keep_first treating null keys as equal."""

    def f(t: pa.Table) -> pa.Table:
        codes = _group_codes(t, keys)
        cnt = np.bincount(codes)
        return t.filter(pa.array(cnt[codes] >= min_size))

    return partitioned_groupby(ds, keys, f, num_parts, fmt="pyarrow")
