"""Persisted containment prefix index for incremental quote-of-known probes.

Completes the persisted-index matrix's containment cell: exact
(bloomstore), image near-dup (bandstore), doc near-dup (docbandstore),
embedding near-dup (srpstore), ANN top-k (IVF) — and now DIRECTED
shingle containment: "is this new document mostly a quote/subset of
something the corpus already holds?" (decontamination against a known
benchmark set, ingest-time quote suppression), answered without
re-shingling the known corpus.

build (once per corpus snapshot)
    known docs → one posting row per distinct CONT_K-shingle hash
    (sh:int64, doc_id) → hash-partition on sh → hive ``part=N/`` parquet.
    Unlike the doc band store, postings do NOT carry text (a doc has
    ~|text| shingle postings — carrying text would blow the index up
    ~300×); the text lives ONCE per doc in a second keyed table
    (``docs/dpart=N/``, hash-partitioned by doc_id) that the verify stage
    reads by pruned lookup.  A third artifact, ``hot.parquet``, stores the
    document frequency of every shingle with df ≥ ``hot_df`` (bounded by
    ``hot_cap`` hottest) — KB-to-MB scale because hot shingles are by
    definition few distinct values.

probe (every new increment)
    the new side marks each doc's ⌊(1-t)·n_windows⌋+1 RAREST shingles as
    probes, ordering by the broadcast hot table (absent ⇒ df 1, ties by
    hash) — the df-ascending PPJoin order WITHOUT a df join at probe time:
    the hot table rides ray.put, so probe marking is a local per-batch
    operation.  Recall does not depend on the ordering (the pigeonhole
    bound holds under ANY global order — property-tested in
    tests/test_properties.py), so a stale hot table after appends degrades
    only candidate volume, never correctness.  Only the ``part=N``
    posting directories the probe shingles hash into are opened, with an
    sh-membership filter pushed into the fragment scan; candidates then
    verify by exact shingle containment against the pruned ``docs/``
    lookup.

append (every accepted increment)
    postings and docs are pure per-doc functions → append-only parquet in
    the same hive partitions; build(A) + append(B) probes exactly like
    build(A ∪ B).  The hot table is deliberately NOT rebuilt on append
    (ordering heuristic only); rebuild it on the next snapshot build.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from deduplicator_ray import io as dio
from deduplicator_ray.stages.partitioned import (
    _hash_cols,
    drop_duplicates,
    partitioned_groupby,
)

_PARAMS = "_params.json"


def _shingle_rows(cont_k: int):
    # CHAR-shingle hashes: n_windows below counts CHAR windows and the
    # verify stage intersects CHAR shingle sets, so the hashed postings
    # space must match (byte-window hashing breaks the pigeonhole recall
    # bound on multi-byte text — see char_shingle_hashes_chars)
    from deduplicator_ray.functions.text import char_shingle_hashes_chars

    schema = pa.schema([("sh", pa.int64()), ("doc_id", pa.int64()),
                        ("n_windows", pa.int64())])

    def f(t: pa.Table) -> pa.Table:
        sh, did, nw = [], [], []
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            txt = str(txt or "")
            h = char_shingle_hashes_chars(txt, k=cont_k).view(np.int64)
            sh.append(h)
            did.append(np.full(len(h), int(d), np.int64))
            nw.append(np.full(len(h), max(len(txt) - (cont_k - 1), 1),
                              np.int64))
        if not sh:
            return pa.Table.from_batches([], schema=schema)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(sh)), pa.array(np.concatenate(did)),
             pa.array(np.concatenate(nw))], schema=schema)

    return f


def _add_part(key: str, num_parts: int, out: str = "part"):
    def f(t: pa.Table) -> pa.Table:
        part = (_hash_cols(t, [key]) % np.uint64(num_parts)).astype(np.int64)
        return t.append_column(out, pa.array(part))

    return f


def build_containment_index(known: rd.Dataset, index_dir: str,
                            cont_k: int = 8, num_parts: int = 64,
                            hot_df: int = 4,
                            hot_cap: int = 1 << 20) -> dict:
    """Persist postings + keyed texts + the hot-shingle df table."""
    # materialized ONCE: the shingle rows feed BOTH the postings write and
    # the hot-df groupby — unmaterialized, the full corpus re-shingles for
    # each consumer (review-found double build cost)
    rows = known.map_batches(_shingle_rows(cont_k),
                             batch_format="pyarrow").materialize()
    (rows.map_batches(_add_part("sh", num_parts), batch_format="pyarrow")
     .drop_columns(["n_windows"])
     .write_parquet(os.path.join(index_dir, "postings"),
                    partition_cols=["part"]))
    (known.map_batches(_add_part("doc_id", num_parts, "dpart"),
                       batch_format="pyarrow")
     .write_parquet(os.path.join(index_dir, "docs"),
                    partition_cols=["dpart"]))

    # hot table: distributed df count, driver keeps only the ≥hot_df tail
    df_schema = pa.schema([("sh", pa.int64()), ("df", pa.int64())])

    def count_df(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("sh", sort=False, as_index=False)["doc_id"]
               .nunique().rename(columns={"doc_id": "df"}))
        return out[out["df"] >= hot_df]

    hot = (partitioned_groupby(rows, ["sh"], count_df, out_schema=df_schema)
           .to_pandas())
    if len(hot) > hot_cap:
        hot = hot.sort_values(["df", "sh"],
                              ascending=[False, True]).head(hot_cap)
    if hot.empty:
        hot = df_schema.empty_table().to_pandas()
    pq.write_table(pa.Table.from_pandas(hot, preserve_index=False),
                           os.path.join(index_dir, "hot.parquet"))

    params = {"num_parts": num_parts, "cont_k": cont_k, "hot_df": hot_df}
    with open(os.path.join(index_dir, _PARAMS), "w") as f:
        json.dump(params, f)
    return params


def append_containment_index(new: rd.Dataset, index_dir: str) -> int:
    """Fold an increment append-only (postings + docs; hot table untouched —
    ordering heuristic, not correctness).  Returns appended posting rows."""
    params = _load_params(index_dir)
    rows = (new.map_batches(_shingle_rows(params["cont_k"]),
                            batch_format="pyarrow")
            .map_batches(_add_part("sh", params["num_parts"]),
                         batch_format="pyarrow")
            .drop_columns(["n_windows"])
            .materialize())
    rows.write_parquet(os.path.join(index_dir, "postings"),
                       partition_cols=["part"])
    (new.map_batches(_add_part("doc_id", params["num_parts"], "dpart"),
                     batch_format="pyarrow")
     .write_parquet(os.path.join(index_dir, "docs"),
                    partition_cols=["dpart"]))
    return rows.count()


def _load_params(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _PARAMS)) as f:
        return json.load(f)


def probe_containment_index(new: rd.Dataset, index_dir: str,
                            threshold: float = 0.9,
                            stats: dict | None = None) -> pd.DataFrame:
    """(doc_id, matched_known, action) — for each NEW doc, the smallest
    known doc that CONTAINS it (C(new→known) ≥ threshold), else -1/keep.
    ``stats`` gets posting/doc partition read counts for pruning asserts."""
    import pyarrow.dataset as pads

    params = _load_params(index_dir)
    num_parts, cont_k = params["num_parts"], params["cont_k"]

    # materialized ONCE: the probe consumes `new` three times (probe
    # marking, the id scan, the candidate-text pull) — unmaterialized,
    # each consumption re-executes the upstream lineage
    new = new.materialize()

    hot_tbl = pq.read_table(os.path.join(index_dir, "hot.parquet"))
    hot = dict(zip(hot_tbl["sh"].to_pylist(), hot_tbl["df"].to_pylist()))
    hot_ref = ray.put(hot)

    probe_schema = pa.schema([("sh", pa.int64()), ("doc_id", pa.int64())])

    def mark_probes(t: pa.Table) -> pa.Table:
        h = ray.get(hot_ref)
        rows = _shingle_rows(cont_k)(t)
        if rows.num_rows == 0:
            return pa.Table.from_batches([], schema=probe_schema)
        df = rows.to_pandas()
        # dict-map rides pandas' C hash-table path; the per-element
        # Python lambda it replaces ran per window of the increment
        df["df"] = df["sh"].map(h).fillna(1).astype(np.int64)
        df = df.sort_values(["doc_id", "df", "sh"], kind="mergesort")
        rank = df.groupby("doc_id", sort=False).cumcount()
        p = np.floor((1.0 - threshold) * df["n_windows"].to_numpy()) + 1
        keep = df[(rank < p).to_numpy()]
        return pa.Table.from_arrays(
            [pa.array(keep["sh"].to_numpy()),
             pa.array(keep["doc_id"].to_numpy())], schema=probe_schema)

    probes = (new.map_batches(mark_probes, batch_format="pyarrow")
              .map_batches(_add_part("sh", num_parts),
                           batch_format="pyarrow")
              .materialize())  # the increment is the SMALL side by design

    # partition- and shingle-level read pruning over the postings.  The
    # shingle-level isin set is CAPPED like the known-id filter below: a
    # huge increment's probe-shingle set must not balloon the driver (or
    # every fragment scan's filter) — above the cap the pruned part=N
    # dirs are read whole and the sh-partitioned candidate groupby
    # discards non-probed shingles (emit's probe side is empty for them)
    PROBE_SH_CAP = 1 << 20
    parts: set[int] = set()
    probe_sh: set[int] | None = set()
    for b in probes.iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.update(b["part"].to_pylist())
        if probe_sh is not None:
            probe_sh.update(b["sh"].to_pylist())
            if len(probe_sh) > PROBE_SH_CAP:
                probe_sh = None
    post_root = os.path.join(index_dir, "postings")
    paths = [os.path.join(post_root, f"part={p}")
             for p in sorted(parts)]
    paths = [p for p in paths if os.path.isdir(p)]
    if stats is not None:
        stats["post_parts_read"] = len(paths)
        stats["post_parts_total"] = num_parts

    ntp = new.select_columns(["doc_id"]).to_pandas()
    # an ALL-EMPTY dataset loses its schema at to_pandas (Ray 2.49)
    new_ids = (ntp["doc_id"].astype(np.int64) if "doc_id" in ntp.columns
               else pd.Series([], dtype=np.int64))
    empty = pd.DataFrame({
        "doc_id": new_ids.sort_values().to_numpy(),
        "matched_known": np.full(len(new_ids), -1, np.int64),
        "action": np.full(len(new_ids), "keep", object)})

    if not paths or (probe_sh is not None and not probe_sh):
        return empty.reset_index(drop=True)

    expr = (pads.field("sh").isin(pa.array(sorted(probe_sh), pa.int64()))
            if probe_sh is not None else None)
    idx = dio.read_parquet(paths, filter=expr).map_batches(
        lambda t: t.select(["sh", "doc_id"]).rename_columns(
            ["sh", "known_id"]),
        batch_format="pyarrow")

    # candidates: probes × pruned postings, co-partitioned on sh
    cand_schema = pa.schema([("doc_id", pa.int64()),
                             ("known_id", pa.int64())])

    def tag(side: str, t: pa.Table) -> pa.Table:
        n = t.num_rows
        did = t["doc_id"] if side == "p" else pa.array(
            np.full(n, -1, np.int64))
        kid = t["known_id"] if side == "i" else pa.array(
            np.full(n, -1, np.int64))
        return pa.Table.from_arrays(
            [t["sh"], did, kid],
            names=["sh", "doc_id", "known_id"])

    unioned = (probes.map_batches(lambda t: tag("p", t),
                                  batch_format="pyarrow")
               .union(idx.map_batches(lambda t: tag("i", t),
                                      batch_format="pyarrow")))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        p = df.loc[df["doc_id"] != -1, ["sh", "doc_id"]]
        i = df.loc[df["known_id"] != -1, ["sh", "known_id"]]
        if p.empty or i.empty:
            return cand_schema.empty_table().to_pandas()
        m = p.merge(i, on="sh")
        return m[["doc_id", "known_id"]].drop_duplicates()

    cands = drop_duplicates(
        partitioned_groupby(unioned, ["sh"], emit, out_schema=cand_schema),
        ["doc_id", "known_id"]).materialize()

    # read pruning for the keyed-text lookup: partition-level always (the
    # dpart dirs candidate known ids hash into); ROW-level isin only while
    # the candidate id set stays driver-sized — beyond the cap the pruned
    # partitions are read whole and the keyed exchange of the verify join
    # discards non-candidates (so driver memory stays bounded no matter
    # the candidate volume)
    KID_FILTER_CAP = 1 << 17
    dparts: set[int] = set()
    kids: set[int] | None = set()
    for b in cands.select_columns(["known_id"]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        kt = pa.table({"doc_id": b["known_id"]})
        dparts.update(
            (_hash_cols(kt, ["doc_id"]) % np.uint64(num_parts)).tolist())
        if kids is not None:
            kids.update(b["known_id"].to_pylist())
            if len(kids) > KID_FILTER_CAP:
                kids = None
    if not dparts:
        return empty.reset_index(drop=True)
    droot = os.path.join(index_dir, "docs")
    dpaths = [os.path.join(droot, f"dpart={p}") for p in sorted(dparts)]
    dpaths = [p for p in dpaths if os.path.isdir(p)]
    if stats is not None:
        stats["doc_parts_read"] = len(dpaths)
        stats["doc_parts_total"] = num_parts
    if not dpaths:
        return empty.reset_index(drop=True)
    kfilter = (pads.field("doc_id").isin(
        pa.array(sorted(kids), pa.int64())) if kids is not None else None)
    ktext = dio.read_parquet(dpaths, filter=kfilter).map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")

    # verify: a partitioned two-exchange pair-text join (no driver text
    # pull, no shingle-dict broadcast — the round-2 scale shortcut); only
    # the PASSING pairs come back to the driver, and those are bounded by
    # the true quote-of-known density of the increment
    from deduplicator_ray.stages.textjoin import pair_text_join

    pairs = cands.map_batches(
        lambda t: pa.table({"src": pc.cast(t["doc_id"], pa.int64()),
                            "dst": pc.cast(t["known_id"], pa.int64())}),
        batch_format="pyarrow")

    # THE containment predicate lives in queries._containment_verify
    # (side-aware shingle cache: new and known corpora are independently
    # numbered here, so a bare-id cache would conflate same-numbered docs
    # across sides — review-found); this wrapper only projects away the
    # cont_e6 column the probe relation doesn't carry
    from deduplicator_ray.pipelines.queries import _containment_verify

    base_verify = _containment_verify(threshold, cont_k)

    def verify(full: pd.DataFrame) -> pd.DataFrame:
        return base_verify(full)[["src", "dst"]]

    passed = pair_text_join(
        pairs, new.select_columns(["doc_id", "text"]), ktext, verify,
        out_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        num_parts=num_parts).to_pandas()

    out = empty.copy()
    if len(passed) and len(passed.columns):
        best = (passed.groupby("src", as_index=False)["dst"].min()
                .rename(columns={"src": "doc_id", "dst": "matched_known"}))
        mk = out["doc_id"].map(
            pd.Series(best["matched_known"].to_numpy(),
                      index=best["doc_id"].to_numpy()))
        out["matched_known"] = mk.fillna(-1).astype(np.int64)
        out["action"] = np.where(mk.isna(), "keep", "drop")
    return out.reset_index(drop=True)
