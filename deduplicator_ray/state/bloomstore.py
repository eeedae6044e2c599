"""Incremental content-dedup against a persisted known-corpus Bloom index.

The reference's scan loop is incremental: every run consults a persistent
hash→paths store so already-seen content is recognized without re-reading
the old corpus (/root/reference/dupedb.py:31-66 — the shelve-backed Db that
``getProcHash`` results land in).  At 10^12-row scale that store cannot be
a driver-side dict; this module re-expresses it Ray-Data-first as a
*partitioned Bloom index* persisted to parquet:

build (once per corpus snapshot)
    known rows → md5 of the content key → hash-partition on the top 64
    digest bits (ONLY the compact 8-byte hash halves cross the shuffle,
    never the payload) → one parquet row per partition holding the
    partition's Bloom bitmap (``bits_per_key`` bits/key, ``k_hashes``
    probes, Kirsch–Mitzenmacher double hashing) plus the sorted exact
    digest list in two binary blobs.

probe (every new increment)
    the index is read COLUMN-PRUNED — bitmaps only, the exact digest
    blobs stay on disk — and published as one ``ray.put`` ObjectRef per
    partition.  New rows stream through ``map_batches``; a task fetches
    only the bitmaps its rows touch (a ref fetch is node-local plasma
    after first use, so a node pulls each bitmap at most once).  The
    vectorized k-probe test yields candidates with ZERO false negatives.
    Candidates are then verified EXACTLY by an actor-pool stage: each
    actor lazily loads the digest blobs of just the partitions whose
    candidates it actually sees (parquet row filter + column projection —
    read-pruned like the IVF search path) and caches them across batches
    in ``self`` state; candidate rows binary-search the sorted digests.

Scale modes: the default probe is shuffle-free (right when the filter set
fits one node's plasma — bitmaps total ``n_keys × bits_per_key / 8``
bytes).  With ``shuffle=True`` the new side is hash-partitioned on the
same key first so each partition task touches exactly ONE bitmap and each
verify actor's cache holds a disjoint partition slice — the mode for
filters too large to replicate per node; same results, tested equal.
``num_parts`` is the granularity knob for both (thousands at cluster
scale so one partition's bitmap+digests fit a worker heap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from deduplicator_ray.stages.partitioned import partitioned_groupby

_INDEX_SCHEMA = pa.schema(
    [
        ("partition", pa.int64()),
        ("n_keys", pa.int64()),
        ("m_bits", pa.int64()),
        ("bitmap", pa.binary()),
        ("key_hi", pa.binary()),
        ("key_lo", pa.binary()),
    ]
)

_AUX = ("__bpart", "__hi", "__lo", "__cand")


def _digest_halves(keys: list) -> tuple[np.ndarray, np.ndarray]:
    """md5 digest of each key string, split into two uint64 halves
    (big-endian).  hi doubles as the partition/probe hash; (hi, lo)
    together are the exact 128-bit identity used by the verify step."""
    n = len(keys)
    buf = np.empty((max(n, 1), 16), np.uint8)
    for i, k in enumerate(keys):
        # null/empty keys carry no identity: digest a reserved marker that
        # no real string key produces, so a failed-download row can never
        # match a corpus row whose key is literally "None" (the index
        # build filters nulls out entirely — these rows always probe 'new')
        data = (b"\x00\x00dedup-ray-null-key\x00" if k is None or k == ""
                else str(k).encode())
        buf[i] = np.frombuffer(hashlib.md5(data).digest(), np.uint8)
    halves = buf[:n].view(">u8").astype(np.uint64)  # (n, 2) big-endian decode
    return np.ascontiguousarray(halves[:, 0]), np.ascontiguousarray(halves[:, 1])


def _probe_positions(hi: np.ndarray, lo: np.ndarray, m_bits: int,
                     k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: g_j = hi + j·(lo|1)."""
    odd_lo = lo | np.uint64(1)  # odd step so probes never collapse onto one bit
    j = np.arange(k_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (hi[:, None] + j[None, :] * odd_lo[:, None]) % np.uint64(m_bits)


def _bitmap_test(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k probed bits are set (vectorized)."""
    byte = (pos >> np.uint64(3)).astype(np.int64)
    bit = (pos & np.uint64(7)).astype(np.uint8)
    return ((bitmap[byte] >> bit) & 1).all(axis=1)


def build_bloom_index(
    known: rd.Dataset,
    key_col: str,
    out_dir: str,
    num_parts: int = 64,
    bits_per_key: int = 16,
    k_hashes: int = 4,
) -> None:
    """Build + persist the partitioned Bloom index for ``known[key_col]``.

    Only (partition, hi, lo) — 24 bytes/row — cross the shuffle; payload
    columns never leave the read tasks."""

    def to_hashes(t: pa.Table) -> pa.Table:
        # null/empty keys carry no identity: str(None) would weld every
        # failed-download row (and any row whose key is literally "None")
        # into one digest — the exact hazard doc_band_rows/banding.py
        # guard against.  They simply don't enter the index.
        import pyarrow.compute as _pc

        t = t.filter(_pc.and_(_pc.is_valid(t[key_col]),
                              _pc.not_equal(_pc.cast(t[key_col],
                                                     pa.string()), "")))
        hi, lo = _digest_halves(t[key_col].to_pylist())
        part = (hi % np.uint64(num_parts)).astype(np.int64)
        return pa.Table.from_pydict(
            {"partition": part, "hi": hi, "lo": lo},
            schema=pa.schema([("partition", pa.int64()),
                              ("hi", pa.uint64()), ("lo", pa.uint64())]),
        )

    def build_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for part, g in df.groupby("partition", sort=False):
            hi = g["hi"].to_numpy(dtype=np.uint64)
            lo = g["lo"].to_numpy(dtype=np.uint64)
            order = np.lexsort((lo, hi))
            hi, lo = hi[order], lo[order]
            keep = np.ones(len(hi), bool)
            keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
            hi, lo = hi[keep], lo[keep]
            n = len(hi)
            m_bits = max(64, int(np.ceil(n * bits_per_key / 8.0)) * 8)
            bitmap = np.zeros(m_bits // 8, np.uint8)
            pos = _probe_positions(hi, lo, m_bits, k_hashes)
            np.bitwise_or.at(
                bitmap,
                (pos >> np.uint64(3)).astype(np.int64).ravel(),
                np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                ).ravel(),
            )
            # digests stored SORTED by (hi, lo) — the verify binary search
            # depends on this ordering
            rows.append((int(part), n, m_bits, bitmap.tobytes(),
                         hi.astype(">u8").tobytes(), lo.astype(">u8").tobytes()))
        return pd.DataFrame(
            rows, columns=["partition", "n_keys", "m_bits", "bitmap",
                           "key_hi", "key_lo"])

    hashes = known.map_batches(to_hashes, batch_format="pyarrow")
    index = partitioned_groupby(hashes, ["partition"], build_part,
                                num_parts=max(1, num_parts // 8),
                                out_schema=_INDEX_SCHEMA)
    # a build is a SNAPSHOT: write_parquet appends, so building into a
    # non-empty dir would leave two index rows per partition — the probe
    # reads bitmaps last-row-wins but verify digests first-row-wins,
    # silently missing duplicates across the mixed snapshots
    import shutil as _sh

    _sh.rmtree(out_dir, ignore_errors=True)
    index.write_parquet(out_dir)
    # build params travel WITH the index — a probe with a different
    # num_parts would route keys to the wrong bitmaps and silently lose
    # every duplicate
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_bloom_meta.json"), "w") as f:
        json.dump({"num_parts": num_parts, "bits_per_key": bits_per_key,
                   "k_hashes": k_hashes}, f)


def read_bloom_meta(index_dir: str) -> dict:
    import json
    import os

    path = os.path.join(index_dir, "_bloom_meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _load_index_columns(index_dir: str, columns: list[str],
                        parts: list[int] | None = None) -> pa.Table:
    """Column-pruned (and optionally partition-filtered) index read."""
    import os

    import pyarrow.dataset as pads

    if not os.path.isdir(index_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(index_dir)
    ):
        # an empty known corpus writes no files — an empty index
        return _INDEX_SCHEMA.empty_table().select(columns)
    dset = pads.dataset(index_dir, format="parquet")
    filt = pads.field("partition").isin(parts) if parts is not None else None
    return dset.to_table(columns=columns, filter=filt)


class _VerifyExact:
    """Actor-pool exact verify: per-actor lazy cache of digest partitions.

    Bloom candidates in a batch trigger a read of ONLY their partitions'
    (key_hi, key_lo) blobs — cached in ``self`` across batches, so each
    actor reads a given partition at most once.  Non-candidate rows are
    'new' with no I/O at all (zero false negatives by Bloom construction)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.cache: dict[int, tuple[np.ndarray, np.ndarray] | None] = {}

    def _digests(self, part: int):
        if part not in self.cache:
            tbl = _load_index_columns(
                self.index_dir, ["partition", "key_hi", "key_lo"], parts=[part])
            if tbl.num_rows == 0:
                self.cache[part] = None
            else:
                self.cache[part] = (
                    np.frombuffer(tbl["key_hi"][0].as_py(), ">u8").astype(np.uint64),
                    np.frombuffer(tbl["key_lo"][0].as_py(), ">u8").astype(np.uint64),
                )
        return self.cache[part]

    def __call__(self, t: pa.Table) -> pa.Table:
        cand = t["__cand"].to_numpy(zero_copy_only=False)
        part = t["__bpart"].to_numpy(zero_copy_only=False)
        hi = t["__hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = t["__lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dup = np.zeros(len(cand), bool)
        for p in np.unique(part[cand]):
            known = self._digests(int(p))
            if known is None:
                continue
            khi, klo = known
            mask = cand & (part == p)
            mhi, mlo = hi[mask], lo[mask]
            left = np.searchsorted(khi, mhi, side="left")
            right = np.searchsorted(khi, mhi, side="right")
            ok = np.zeros(len(mhi), bool)
            for i in np.nonzero(right > left)[0]:  # hi-tie runs: O(1) expected
                ok[i] = mlo[i] in klo[left[i]:right[i]]
            dup[mask] = ok
        status = np.where(dup, "dup_known", "new")
        # drop aux cols AND any pre-existing 'status' (fingerprint rows
        # carry one) — appending unconditionally would emit a duplicate
        # column name that breaks downstream column selection
        keep = [i for i, n in enumerate(t.schema.names)
                if n not in _AUX and n != "status"]
        return pa.Table.from_arrays(
            [t.column(i) for i in keep] + [pa.array(status, pa.string())],
            names=[t.schema.names[i] for i in keep] + ["status"],
        )


def probe_bloom_index(
    new: rd.Dataset,
    index_dir: str,
    key_col: str,
    num_parts: int | None = None,
    k_hashes: int | None = None,
    shuffle: bool = False,
    verify_concurrency: int = 4,
) -> rd.Dataset:
    """Append ``status`` ∈ {'dup_known', 'new'} to every row of ``new``.

    Both labels are EXACT: Bloom candidates are re-verified against the
    stored digests, and a Bloom miss has no false negatives.  Single
    streaming pass — no driver-side materialization of the new side.

    ``num_parts``/``k_hashes`` default to the values persisted at build
    time (``_bloom_meta.json``); passing mismatched ones would silently
    route keys to the wrong bitmaps."""
    meta = read_bloom_meta(index_dir)
    if num_parts is None:
        num_parts = int(meta.get("num_parts", 64))
    if k_hashes is None:
        k_hashes = int(meta.get("k_hashes", 4))
    bitmaps = _load_index_columns(index_dir, ["partition", "m_bits", "bitmap"])
    refs = {
        int(p): ray.put((int(m), np.frombuffer(b, np.uint8)))
        for p, m, b in zip(bitmaps["partition"].to_pylist(),
                           bitmaps["m_bits"].to_pylist(),
                           bitmaps["bitmap"].to_pylist())
    }

    def _keyed_schema(base: pa.Schema) -> pa.Schema:
        s = base
        for name, typ in (("__bpart", pa.int64()), ("__hi", pa.uint64()),
                          ("__lo", pa.uint64())):
            s = s.append(pa.field(name, typ))
        return s

    def probe_arrays(part: np.ndarray, hi: np.ndarray,
                     lo: np.ndarray) -> np.ndarray:
        cand = np.zeros(len(part), bool)
        for p in np.unique(part):
            ref = refs.get(int(p))
            if ref is None:
                continue  # partition absent from the index → definitely new
            m_bits, bitmap = ray.get(ref)
            mask = part == p
            pos = _probe_positions(hi[mask], lo[mask], m_bits, k_hashes)
            cand[mask] = _bitmap_test(bitmap, pos)
        return cand

    if shuffle:
        # the partitioned-groupby needs a driver-side output schema so empty
        # partitions stay typed; derive it from one sample batch (the input
        # may be pandas-backed, in which case Dataset.schema() has no Arrow
        # types to offer).  take_batch runs a bounded limit-execution — an
        # abandoned iter_batches iterator would deadlock the sort that
        # follows on the same lineage.
        try:
            sample = new.take_batch(1, batch_format="pyarrow")
            aug_schema = _keyed_schema(
                pa.schema([f.remove_metadata() for f in sample.schema])
            ).append(pa.field("__cand", pa.bool_()))
        except (ValueError, StopIteration):  # empty input
            aug_schema = None

        def add_keyed(t: pa.Table) -> pa.Table:
            hi, lo = _digest_halves(t[key_col].to_pylist())
            part = (hi % np.uint64(num_parts)).astype(np.int64)
            return pa.Table.from_arrays(
                list(t.columns) + [pa.array(part), pa.array(hi, pa.uint64()),
                                   pa.array(lo, pa.uint64())],
                schema=_keyed_schema(t.schema),
            )

        def probe_part(df: pd.DataFrame) -> pd.DataFrame:
            cand = probe_arrays(df["__bpart"].to_numpy(dtype=np.int64),
                                df["__hi"].to_numpy(dtype=np.uint64),
                                df["__lo"].to_numpy(dtype=np.uint64))
            out = df.copy()
            out["__cand"] = cand
            return out

        flagged = partitioned_groupby(
            new.map_batches(add_keyed, batch_format="pyarrow"),
            ["__bpart"], probe_part, num_parts=max(1, num_parts // 8),
            out_schema=aug_schema)
    else:
        def probe_batch(t: pa.Table) -> pa.Table:
            hi, lo = _digest_halves(t[key_col].to_pylist())
            part = (hi % np.uint64(num_parts)).astype(np.int64)
            cand = probe_arrays(part, hi, lo)
            return pa.Table.from_arrays(
                list(t.columns)
                + [pa.array(part), pa.array(hi, pa.uint64()),
                   pa.array(lo, pa.uint64()), pa.array(cand)],
                schema=_keyed_schema(t.schema).append(
                    pa.field("__cand", pa.bool_())),
            )

        flagged = new.map_batches(probe_batch, batch_format="pyarrow")

    # (1, N) pool: start ONE verify actor and scale with load — a fixed
    # min-actor count would pin every CPU of a small session while the
    # upstream shuffle still needs them (deadlock with op resource
    # reservation disabled, see tuning.py)
    return flagged.map_batches(
        _VerifyExact, fn_constructor_args=(index_dir,),
        batch_format="pyarrow", concurrency=(1, verify_concurrency))
