"""Substring-level dedup — the suffix-array leg of the north-rule triple
(MinHash / SimHash / suffix-array substring).

Semantics follow the ExactSubstr shape of "Deduplicating Training Data Makes
Language Models Better" (Lee et al., ACL 2022 — public): any k-token window
that occurs more than once in the corpus is a duplicated substring; every
occurrence except the canonical first (lexicographic min (doc_id, pos)) is
marked, and marked positions merge into maximal spans per document — the
trim/filter decision table a training-data pipeline consumes.

A monolithic suffix array needs corpus-global sorted state (the reference
paper builds one per shard and merges); the Ray-Data-native equivalent is
**windowed fingerprinting**, which detects exactly the same matches of
length ≥ k tokens while shuffling 8 bytes per window instead of the text:

P1  window hashes   map_batches: per-batch token crc32 → one concatenated
                    array → sliding-window polynomial hash (vectorized
                    numpy, no per-window Python) → (whash, doc_id, pos),
                    locally pre-aggregated to (whash, cnt) partials.
P2  dup-hash set    partitioned groupby on whash, sum counts, keep cnt>1.
                    The surviving set is the *duplicated* fraction only.
                    Strategy selection is MEASURED (default 'auto'): the
                    set's count decides — ≤ AUTO_BCAST_CAP → one ray.put
                    broadcast; above it → the shuffle flavor that never
                    materializes the set anywhere (P3 co-partitions hits
                    with texts instead).
P3  exact verify    re-emit only windows whose hash is in the dup set, NOW
                    carrying the window text; group by (whash, win) so hash
                    collisions can never mark a unique substring; drop the
                    canonical first occurrence per exact window.
P4  span merge      partitioned groupby on doc_id: sort positions, merge
                    windows closer than k tokens into maximal spans
                    (vectorized gaps-and-islands) → (doc_id, span_start,
                    span_end, n_windows).

Positions are 1-based token indices; a span covers tokens
[span_start, span_end).  Tokenization is a literal single-space split so the
DuckDB mirror (pipelines/queries.DOCS_SUBSTRING_DUP_SQL) is value-exact.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from deduplicator_ray.stages.partitioned import partitioned_groupby



def _batch_windows(texts: list[str], k: int):
    """All k-token windows of a batch: (doc_idx, pos, whash) numpy arrays.

    Token hashing and the window polynomial reuse functions/text.py's
    kernels (``hash_tokens``: one numpy pass over the concatenated token
    bytes; ``_poly_hash_windows``: the O(n) prefix-sum form of the B-base
    polynomial — its docstring records the measured 3.2× over the (n, k)
    windowed multiply-sum this used to do, on top of replacing a
    per-token Python crc32 loop).  Hash quality only affects candidate
    volume — the exact string verify (P3) decides — but sharing ONE
    polynomial keeps the two hashing paths from drifting."""
    from deduplicator_ray.functions.text import _poly_hash_windows, hash_tokens

    tok_lists = [t.split(" ") for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), np.int64, count=len(tok_lists))
    h = hash_tokens([tok for toks in tok_lists for tok in toks])
    n = len(h)
    if n < k:
        z = np.zeros(0, np.int64)
        return z, z, z.view(np.int64)
    whash = _poly_hash_windows(h, k)
    # valid window starts: fully inside one document
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[: n - k + 1]
    pos_in_doc = np.arange(n - k + 1, dtype=np.int64) - starts[doc_of]
    valid = pos_in_doc <= lens[doc_of] - k
    return doc_of[valid], pos_in_doc[valid] + 1, whash[valid].view(np.int64)


def _dup_hash_ds(ds: rd.Dataset, k: int, text_col: str,
                 num_parts: int) -> rd.Dataset:
    """P1+P2 as a Dataset: one (whash) row per window hash occurring > 1
    time (per-batch (whash, cnt) combiner → one whash-partitioned sum)."""

    def partials(t: pa.Table) -> pa.Table:
        texts = [str(x) for x in t[text_col].to_pylist()]
        _, _, wh = _batch_windows(texts, k)
        uniq, cnt = np.unique(wh, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()), pa.array(cnt.astype(np.int64))],
            names=["whash", "cnt"])

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("whash", as_index=False)["cnt"].sum()
        out = g[g["cnt"] > 1][["whash"]]
        return out if len(out) else pd.DataFrame({"whash": pd.Series([], dtype="int64")})

    return partitioned_groupby(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=4096),
        ["whash"], reduce_part, num_parts=num_parts,
        out_schema=pa.schema([("whash", pa.int64())]))


def _collect_dup_hashes(dup: rd.Dataset) -> np.ndarray:
    chunks = [b["whash"].to_numpy(zero_copy_only=False)
              for b in dup.iter_batches(batch_format="pyarrow")]
    return np.sort(np.concatenate(chunks)) if chunks else np.zeros(0, np.int64)


def _dup_window_hashes(ds: rd.Dataset, k: int, text_col: str,
                       num_parts: int) -> np.ndarray:
    """P1+P2: sorted int64 array of window hashes occurring > 1 time."""
    return _collect_dup_hashes(_dup_hash_ds(ds, k, text_col, num_parts))


_HIT_SCHEMA = pa.schema([
    ("whash", pa.int64()), ("win", pa.string()),
    ("doc_id", pa.int64()), ("pos", pa.int64()),
])


def _mark_non_canonical(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "pos": pd.Series([], dtype="int64")})
    df = df.sort_values(["whash", "win", "doc_id", "pos"], kind="mergesort")
    grp = df.groupby(["whash", "win"], sort=False)
    sizes = grp["pos"].transform("size")
    first = grp.cumcount() == 0
    out = df.loc[(sizes > 1) & ~first, ["doc_id", "pos"]]
    return out if len(out) else pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "pos": pd.Series([], dtype="int64")})


def _candidate_hits_broadcast(ds: rd.Dataset, k: int, id_col: str,
                              text_col: str, num_parts: int,
                              dup_sorted: np.ndarray | None = None
                              ) -> rd.Dataset:
    """Pass 2, broadcast flavor: ship the dup-hash array once (ray.put),
    re-emit only matching windows WITH their text."""
    if dup_sorted is None:
        dup_sorted = _dup_window_hashes(ds, k, text_col, num_parts)
    dup_ref = ray.put(dup_sorted)

    def emit_hits(t: pa.Table) -> pa.Table:
        dup_sorted = ray.get(dup_ref)
        ids = t[id_col].to_pylist()
        texts = [str(x) for x in t[text_col].to_pylist()]
        doc_idx, pos, wh = _batch_windows(texts, k)
        if len(dup_sorted):
            i = np.searchsorted(dup_sorted, wh)
            i[i == len(dup_sorted)] = 0
            hit = dup_sorted[i] == wh
        else:
            hit = np.zeros(len(wh), bool)
        doc_idx, pos, wh = doc_idx[hit], pos[hit], wh[hit]
        # split each hit-bearing doc ONCE (hits >> docs on boilerplate
        # corpora — a per-hit split is O(hits × doc_len))
        tok_cache = {int(d): texts[d].split(" ")
                     for d in np.unique(doc_idx)}
        wins = [" ".join(tok_cache[int(d)][p - 1:p - 1 + k])
                for d, p in zip(doc_idx, pos)]
        return pa.Table.from_arrays(
            [pa.array(wh, pa.int64()), pa.array(wins, pa.string()),
             pa.array([ids[d] for d in doc_idx], pa.int64()),
             pa.array(pos, pa.int64())],
            schema=_HIT_SCHEMA)

    return ds.map_batches(emit_hits, batch_format="pyarrow", batch_size=4096)


def _candidate_hits_shuffle(ds: rd.Dataset, k: int, id_col: str,
                            text_col: str, num_parts: int,
                            dup: rd.Dataset | None = None) -> rd.Dataset:
    """Pass 2, shuffle flavor (NO driver-side dup set — the 10^12-row path
    where the duplicated-hash set itself may not fit one node):

    1. every window as a 24-byte (whash, doc_id, pos) row;
    2. groupby whash → keep occurrences of multi-member hashes —
       OR, when the caller already holds the pass-1 dup-hash dataset
       (``dup``, e.g. strategy='auto' counted it before rejecting the
       broadcast), co-partition the window rows WITH it and keep marked
       hashes instead of re-deriving multi-membership from scratch;
    3. co-partition those (doc_id, pos) hits with the document TEXTS on
       doc_id; slice each hit's window text locally.

    Two extra shuffles of fixed-width rows buy unbounded dup-set size."""

    def emit_all(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = [str(x) for x in t[text_col].to_pylist()]
        doc_idx, pos, wh = _batch_windows(texts, k)
        return pa.Table.from_arrays(
            [pa.array(wh, pa.int64()),
             pa.array(np.asarray([ids[d] for d in doc_idx], np.int64)),
             pa.array(pos, pa.int64())],
            names=["whash", "doc_id", "pos"])

    def keep_multi(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("whash", sort=False)["pos"].transform("size")
        out = df[sizes > 1]
        return out if len(out) else pd.DataFrame(
            {"whash": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64"),
             "pos": pd.Series([], dtype="int64")})

    windows = ds.map_batches(emit_all, batch_format="pyarrow",
                             batch_size=4096)
    hit_schema = pa.schema([("whash", pa.int64()), ("doc_id", pa.int64()),
                            ("pos", pa.int64())])
    if dup is None:
        cand = partitioned_groupby(windows, ["whash"], keep_multi,
                                   num_parts=num_parts,
                                   out_schema=hit_schema)
    else:
        # pass-1 reuse: dup-marker rows (doc_id=-1, a value no corpus id
        # takes) ride the same whash exchange as the window rows; the
        # per-partition filter is a vectorized isin against the marked
        # hashes instead of a full multi-membership recount
        def mark(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.Table.from_arrays(
                [t["whash"], pa.array(np.full(n, -1, np.int64)),
                 pa.array(np.full(n, -1, np.int64))],
                names=["whash", "doc_id", "pos"])

        def keep_marked(df: pd.DataFrame) -> pd.DataFrame:
            mk = df["doc_id"].to_numpy() < 0
            dup_wh = np.unique(df["whash"].to_numpy()[mk])
            out = df[~mk & df["whash"].isin(dup_wh)]
            return out if len(out) else pd.DataFrame(
                {"whash": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64")})

        cand = partitioned_groupby(
            windows.union(dup.map_batches(mark, batch_format="pyarrow")),
            ["whash"], keep_marked, num_parts=num_parts,
            out_schema=hit_schema)

    # co-partition candidates with texts on doc_id; extract window strings
    def tag_cand(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["whash"], t["doc_id"], t["pos"],
             pa.array([""] * t.num_rows, pa.string())],
            names=["whash", "doc_id", "pos", "text"])

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [pa.array(np.zeros(n, np.int64)),
             t[id_col].cast(pa.int64()),
             pa.array(np.full(n, -1, np.int64)),
             t[text_col].cast(pa.string())],
            names=["whash", "doc_id", "pos", "text"])

    u = cand.map_batches(tag_cand, batch_format="pyarrow").union(
        ds.map_batches(tag_docs, batch_format="pyarrow"))

    def slice_wins(df: pd.DataFrame) -> pd.DataFrame:
        hits = df[df["pos"] >= 0]
        docs = df[df["pos"] < 0]
        if hits.empty:
            return pd.DataFrame({
                "whash": pd.Series([], dtype="int64"),
                "win": pd.Series([], dtype=str),
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64")})
        toks = {int(d): str(t).split(" ")
                for d, t in zip(docs["doc_id"], docs["text"])}
        wins = [" ".join(toks[int(d)][p - 1:p - 1 + k])
                for d, p in zip(hits["doc_id"], hits["pos"])]
        return pd.DataFrame({"whash": hits["whash"].to_numpy(),
                             "win": wins,
                             "doc_id": hits["doc_id"].to_numpy(),
                             "pos": hits["pos"].to_numpy()})

    return partitioned_groupby(u, ["doc_id"], slice_wins,
                               num_parts=num_parts, out_schema=_HIT_SCHEMA)


# auto-selection cap: dup-hash COUNT above which the broadcast flavor is
# refused (the measured pass-1 signal, not a guess).  8M hashes ≈ 64 MB
# as a sorted int64 array — comfortably a node's broadcast budget; a
# 100-TB boilerplate corpus blows far past it and must take the shuffle
# path that never materializes the set anywhere.
AUTO_BCAST_CAP = 1 << 23


def duplicated_occurrences(ds: rd.Dataset, k: int = 8, id_col: str = "doc_id",
                           text_col: str = "text", num_parts: int = 64,
                           strategy: str = "auto",
                           bcast_cap: int = AUTO_BCAST_CAP) -> rd.Dataset:
    """(doc_id, pos) of every non-canonical occurrence of a duplicated
    k-token window (exact-string verified).

    ``strategy``:
      'auto' (default) — run the cheap pass-1 dup-hash reduction, COUNT
      the surviving set, and pick: ≤ ``bcast_cap`` hashes → broadcast
      (one ray.put, no extra shuffle); above it → the shuffle flavor.
      The selection signal is measured, never assumed — the scale-unsafe
      default this replaces shipped the array unconditionally.
      'broadcast' — explicit; REFUSES above the cap instead of silently
      hazarding driver/worker memory (pass strategy='shuffle' or 'auto').
      'shuffle' — never materializes the dup set (see
      ``_candidate_hits_shuffle``)."""
    if strategy == "shuffle":
        hits = _candidate_hits_shuffle(ds, k, id_col, text_col, num_parts)
    elif strategy == "auto":
        dup = _dup_hash_ds(ds, k, text_col, num_parts).materialize()
        if int(dup.count()) <= bcast_cap:
            hits = _candidate_hits_broadcast(
                ds, k, id_col, text_col, num_parts,
                dup_sorted=_collect_dup_hashes(dup))
        else:
            # over the cap: hand the already-materialized dup set to the
            # shuffle flavor so pass-1 runs once, not twice
            hits = _candidate_hits_shuffle(ds, k, id_col, text_col,
                                           num_parts, dup=dup)
    elif strategy == "broadcast":
        dup = _dup_hash_ds(ds, k, text_col, num_parts).materialize()
        n = int(dup.count())
        if n > bcast_cap:
            raise ValueError(
                f"substring strategy='broadcast': dup-hash set has {n} "
                f"entries (> cap {bcast_cap}) — use strategy='shuffle' "
                "or 'auto'")
        hits = _candidate_hits_broadcast(
            ds, k, id_col, text_col, num_parts,
            dup_sorted=_collect_dup_hashes(dup))
    else:
        raise ValueError(f"unknown substring strategy {strategy!r}")
    return partitioned_groupby(
        hits, ["whash"], _mark_non_canonical, num_parts=num_parts,
        out_schema=pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]))


def substring_dup_spans(ds: rd.Dataset, k: int = 8, id_col: str = "doc_id",
                        text_col: str = "text", num_parts: int = 64,
                        strategy: str = "auto") -> rd.Dataset:
    """Trim decision table: maximal duplicated spans per document.

    (doc_id, span_start, span_end, n_windows) — tokens
    [span_start, span_end) duplicate earlier corpus content; ``n_windows``
    is how many duplicated windows merged into the span."""
    occ = duplicated_occurrences(ds, k, id_col, text_col, num_parts, strategy)

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "span_start": pd.Series([], dtype="int64"),
            "span_end": pd.Series([], dtype="int64"),
            "n_windows": pd.Series([], dtype="int64")})
        if df.empty:
            return empty
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        doc = df["doc_id"].to_numpy()
        pos = df["pos"].to_numpy()
        new_doc = np.empty(len(df), bool)
        new_doc[:1] = True
        new_doc[1:] = doc[1:] != doc[:-1]
        gap = np.empty(len(df), bool)
        gap[:1] = True
        gap[1:] = (pos[1:] - pos[:-1]) > k
        island = np.cumsum(new_doc | gap)
        out = pd.DataFrame({"doc_id": doc, "pos": pos, "isl": island})
        g = out.groupby("isl", as_index=False).agg(
            doc_id=("doc_id", "first"), span_start=("pos", "min"),
            span_end=("pos", "max"), n_windows=("pos", "size"))
        g["span_end"] = g["span_end"] + k
        g["n_windows"] = g["n_windows"].astype("int64")
        return g[["doc_id", "span_start", "span_end", "n_windows"]]

    return partitioned_groupby(
        occ, ["doc_id"], merge_spans, num_parts=num_parts,
        out_schema=pa.schema([
            ("doc_id", pa.int64()), ("span_start", pa.int64()),
            ("span_end", pa.int64()), ("n_windows", pa.int64())]))
