"""Persisted SRP-LSH index for incremental EMBEDDING near-dup ingest.

Completes the persisted-index matrix across modalities and dedup forms:
exact (state/bloomstore.py), image near-dup (state/bandstore.py), ANN
top-k (functions/vector.build_ivf_index) — and now embedding near-dup
PAIRS: "which vectors in the corpus we already hold does this new batch
near-duplicate?", answered without re-banding or re-reading the known
corpus.

build (once per corpus snapshot)
    known embeddings → the SAME seeded sign-random-projection banding the
    in-run query uses (queries.emb_srp_pairs / vector.srp_band_rows) →
    hash-partition on (band, bkey) → one hive ``part=N/`` parquet
    directory per partition.  ``_params.json`` pins (nbands, rbits, seed)
    so a probe against a drifted config fails loudly.

probe (every new increment)
    the increment bands identically, ONLY the ``part=N`` directories its
    own band rows hash into are opened, and the probe's (band, bkey)
    membership is pushed down into the parquet fragment scan — index rows
    outside probed buckets never enter the object store.  Probe + pruned
    index rows flow through ONE (band, bkey)-partitioned groupby whose
    per-bucket verify computes exact float64 cosine for CROSS-side pairs
    only, with owner-band emission (first band where the two key lists
    agree), so each pair appears exactly once with no second dedup
    shuffle.

append (every accepted increment)
    banding is stateless (no trained centroids — the SRP advantage over
    IVF), so folding an increment is append-only parquet inside the same
    hive partitions: build(A) + append(B) answers probes exactly like
    build(A ∪ B).  Unlike ``append_ivf_index`` there is no drift to
    rebuild away.  Vanished-id retirement follows the partition-granular
    rewrite pattern of ``bandstore.prune_band_index`` verbatim.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplicator_ray import io as dio
from deduplicator_ray.functions import vector as vfn
from deduplicator_ray.stages.partitioned import _hash_cols, partitioned_groupby

_PARAMS = "_params.json"

PAIR_SCHEMA = pa.schema([("va", pa.int64()), ("vb", pa.int64()),
                         ("cos_e6", pa.int64())])


def _add_part(num_parts: int):
    def f(t: pa.Table) -> pa.Table:
        part = (_hash_cols(t, ["band", "bkey"])
                % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    return f


def _band_rows(ds: rd.Dataset, params: dict) -> rd.Dataset:
    nbands, rbits, seed = params["nbands"], params["rbits"], params["seed"]

    def f(t: pa.Table) -> pa.Table:
        return vfn.srp_band_rows(t, nbands, rbits, seed)

    return ds.map_batches(f, batch_format="pyarrow")


def build_srp_index(known: rd.Dataset, index_dir: str,
                    num_parts: int = 64, nbands: int = vfn.SRP_BANDS,
                    rbits: int = vfn.SRP_BITS,
                    seed: int = vfn.SRP_SEED) -> dict:
    """Band the known embeddings and persist hash-partitioned on
    (band, bkey).  Returns the pinned params."""
    params = {"num_parts": num_parts, "nbands": nbands, "rbits": rbits,
              "seed": seed}
    rows = (_band_rows(known, params)
            .map_batches(_add_part(num_parts), batch_format="pyarrow"))
    rows.write_parquet(index_dir, partition_cols=["part"])
    with open(os.path.join(index_dir, _PARAMS), "w") as f:
        json.dump(params, f)
    return params


def append_srp_index(new: rd.Dataset, index_dir: str) -> int:
    """Fold an increment in append-only (existing files untouched; Ray's
    writer generates unique file names).  Banding is stateless, so the
    appended index answers probes exactly like a from-scratch build over
    the union.  Returns the appended row count."""
    params = _load_params(index_dir)
    rows = (_band_rows(new, params)
            .map_batches(_add_part(params["num_parts"]),
                         batch_format="pyarrow")
            .materialize())
    rows.write_parquet(index_dir, partition_cols=["part"])
    return rows.count()


def _load_params(index_dir: str) -> dict:
    """Probe/append banding derives ENTIRELY from the persisted params, so
    config drift is impossible by construction (unlike bandstore, where the
    caller's PipelineConfig must be checked against the pin)."""
    with open(os.path.join(index_dir, _PARAMS)) as f:
        return json.load(f)


def _make_cross_verify(threshold: float):
    """Per-(band,bkey)-partition verify: exact float64 cosine for pairs
    with DIFFERENT side tags, owner-band emission.  Same chunked-upper-
    triangle shape as queries.emb_srp_pairs, restricted to cross pairs
    (va = new side, vb = known side)."""
    empty = pd.DataFrame({"va": pd.Series([], dtype=np.int64),
                          "vb": pd.Series([], dtype=np.int64),
                          "cos_e6": pd.Series([], dtype=np.int64)})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return empty
        band = df["band"].to_numpy()
        bkey = df["bkey"].to_numpy()
        ids = df["vec_id"].to_numpy()
        side = df["side"].to_numpy()
        keys = np.stack(df["allkeys"].to_numpy())
        emb = np.stack(df["emb"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        order = np.lexsort((bkey, band))
        band, bkey, ids, side = (band[order], bkey[order], ids[order],
                                 side[order])
        keys, emb = keys[order], emb[order]
        starts = np.flatnonzero(
            np.r_[True, (band[1:] != band[:-1]) | (bkey[1:] != bkey[:-1])])
        bounds = np.r_[starts, len(band)]
        va, vb, ce6 = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            gsd = side[s:e]
            new_m = gsd == 1
            if not new_m.any() or new_m.all():
                continue  # a bucket with one side only has no cross pairs
            b_here = band[s]
            gn_i, gk_i = ids[s:e][new_m], keys[s:e][new_m]
            ge_n = emb[s:e][new_m]
            gn_k, gk_k = ids[s:e][~new_m], keys[s:e][~new_m]
            ge_k = emb[s:e][~new_m]
            for cs in range(0, len(gn_i), 1024):
                ce = min(cs + 1024, len(gn_i))
                cos = ge_n[cs:ce] @ ge_k.T                  # (c, n_known)
                ii, jj = np.nonzero(cos >= threshold)
                if len(ii) == 0:
                    continue
                vals = cos[ii, jj]
                owner = np.argmax(gk_i[ii + cs] == gk_k[jj], axis=1)
                own = owner == b_here
                if not own.any():
                    continue
                ii, jj, vals = ii[own], jj[own], vals[own]
                va.append(gn_i[ii + cs])
                vb.append(gn_k[jj])
                ce6.append(np.floor(vals * 1e6 + 0.5).astype(np.int64))
        if not va:
            return empty
        return pd.DataFrame({"va": np.concatenate(va),
                             "vb": np.concatenate(vb),
                             "cos_e6": np.concatenate(ce6)})

    return verify


def probe_srp_index(new: rd.Dataset, index_dir: str,
                    threshold: float = 0.35,
                    stats: dict | None = None) -> rd.Dataset:
    """(va=new vec_id, vb=known vec_id, cos_e6) for every cross-side pair
    at exact cosine ≥ threshold whose bucket the increment touches.
    ``stats`` (optional dict) gets ``parts_read`` / ``parts_total`` so
    callers can assert read pruning."""
    params = _load_params(index_dir)
    num_parts = params["num_parts"]

    probe = (_band_rows(new, params)
             .map_batches(_add_part(num_parts), batch_format="pyarrow")
             .materialize())  # the increment is the SMALL side by design

    # two exact levels of read pruning (bandstore.probe_band_delta_edges
    # pattern): partition directories the probe hashes into, then the
    # probe's (band, bkey) membership pushed into the fragment scan
    key_by_band: dict[int, set[int]] = {}
    nparts: set[int] = set()
    # narrow projection only: the probe's band rows carry the embedding
    # payload — the driver needs just the key columns
    for b in (probe.select_columns(["part", "band", "bkey"])
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        nparts.update(b["part"].to_pylist())
        for band, key in zip(b["band"].to_pylist(), b["bkey"].to_pylist()):
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
             & pads.field("bkey").isin(pa.array(sorted(ks), pa.int64())))
        expr = e if expr is None else (expr | e)

    cols = ["band", "bkey", "vec_id", "allkeys", "emb"]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return (t.select(cols).append_column(
                "side", pa.array(np.full(len(t), side, np.int8))))

        return f

    probe_rows = probe.map_batches(tag(1), batch_format="pyarrow")
    rows = (probe_rows if not paths else
            dio.read_parquet(paths, filter=expr).map_batches(
                tag(0), batch_format="pyarrow").union(probe_rows))
    return partitioned_groupby(rows, ["band", "bkey"],
                               _make_cross_verify(threshold),
                               out_schema=PAIR_SCHEMA)
