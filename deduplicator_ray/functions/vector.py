"""Vector similarity kernels: brute-force cosine top-k + IVF-bucketed ANN.

Scale design (SURVEY.md build mandate — similarity search over an embedding
column):

- **brute force**: the query matrix is broadcast ONCE via ``ray.put`` and
  every ``map_batches`` task computes a numpy matmul of its batch against
  it, emitting per-batch partial top-k; a final tiny driver-side reduce
  merges partials.  Cost O(N·Q·d) streaming over N, never materializing the
  corpus.
- **IVF**: coarse centroids are trained on a driver-side sample (k-means,
  a few Lloyd iterations), broadcast, and each vector is assigned its
  nearest-centroid bucket in a vectorized stage.  Queries probe only
  ``nprobe`` buckets — the scale path that avoids touching every row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def embeddings_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column, zero-copy-ish."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    if isinstance(arr, pa.ListArray):
        d = len(arr[0])
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(-1, d).astype(np.float32)
    # FixedSizeListArray
    d = arr.type.list_size
    return arr.values.to_numpy(zero_copy_only=False).reshape(-1, d).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> "pd.DataFrame":
    """Exact cosine top-k of each query against the dataset.

    Returns a pandas DataFrame (query_id, rank, vec_id, cos) — small result.
    The query matrix is broadcast once (ray.put) and read per task, not
    re-shipped per batch.
    """
    import pandas as pd

    qn = _normalize(np.asarray(queries, np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def partial(batch: pa.Table) -> pa.Table:
        qmat, qids = ray.get(q_ref)
        m = embeddings_matrix(batch, vec_col).astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = qmat @ _normalize(m).T  # (Q, n)
        out_q, out_id, out_cos = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_q.extend([int(qids[qi])] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_cos.extend(sims[qi][idx].tolist())
        return pa.Table.from_pydict(
            {"query_id": out_q, "vec_id": out_id, "cos": out_cos}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["vec_id"]]
    # deterministic global merge: cos desc, vec_id asc
    parts = parts.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "vec_id", "cos"]]


# ---------------------------------------------------------------------------
# IVF


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8,
                    seed: int = 11) -> np.ndarray:
    """Plain Lloyd k-means on a normalized sample (driver-side, small)."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float64))
    idx = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    c = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def assign_buckets(ds: rd.Dataset, centroids: np.ndarray,
                   vec_col: str = "embedding") -> rd.Dataset:
    """Add an ``ivf_bucket`` column = nearest centroid (broadcast lookup)."""
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(embeddings_matrix(batch, vec_col).astype(np.float64))
        b = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(b, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_fraction: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "pd.DataFrame":
    """Approximate cosine top-k: probe only the ``nprobe`` nearest IVF
    buckets per query.  Recall vs brute force depends on nprobe/n_centroids
    (measured in tests, not assumed)."""
    sample = np.concatenate(
        [embeddings_matrix(b, vec_col)
         for b in ds.random_sample(sample_fraction, seed=3).iter_batches(
             batch_size=8192, batch_format="pyarrow")]
    )
    cents = train_centroids(sample, n_centroids)
    bucketed = assign_buckets(ds, cents, vec_col)

    qn = _normalize(np.asarray(queries, np.float64))
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    # per query, keep only rows in probed buckets; evaluated per batch
    q_ref = ray.put((qn, np.asarray(query_ids), probes))

    def partial(batch: pa.Table) -> pa.Table:
        qmat, qids, prb = ray.get(q_ref)
        m = _normalize(embeddings_matrix(batch, vec_col).astype(np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bks = batch["ivf_bucket"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_cos = [], [], []
        for qi in range(len(qmat)):
            mask = np.isin(bks, prb[qi])
            if not mask.any():
                continue
            sims = m[mask] @ qmat[qi]
            sel_ids = ids[mask]
            kk = min(k + 1, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qids[qi])] * len(idx))
            out_id.extend(sel_ids[idx].tolist())
            out_cos.extend(sims[idx].tolist())
        return pa.Table.from_pydict({"query_id": out_q, "vec_id": out_id, "cos": out_cos})

    import pandas as pd

    parts = bucketed.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    parts = parts[parts["query_id"] != parts["vec_id"]]
    parts = parts.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "vec_id", "cos"]]
