"""Vector similarity kernels: brute-force cosine top-k + IVF-bucketed ANN.

Scale design (SURVEY.md build mandate — similarity search over an embedding
column):

- **brute force**: the query matrix is broadcast ONCE via ``ray.put`` and
  every ``map_batches`` task computes a numpy matmul of its batch against
  it, emitting per-batch partial top-k; a final tiny driver-side reduce
  merges partials.  Cost O(N·Q·d) streaming over N, never materializing the
  corpus.
- **IVF**: coarse centroids are trained on an ABSOLUTE-size sample (never a
  fraction — a fraction of 10^12 rows is a driver OOM), broadcast, and each
  vector is assigned its nearest-centroid bucket in a vectorized stage.  The
  bucketed table is written as parquet PARTITIONED BY bucket
  (``build_ivf_index``), and a search reads ONLY the probed buckets'
  files — I/O pruning, not just compute masking.  Queries probe ``nprobe``
  buckets each; the scan touches the union of probed buckets across the
  query batch.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from deduplicator_ray import io as dio


def embeddings_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column, zero-copy-ish.

    Empty batches yield a (0, 0) matrix instead of indexing arr[0]; a
    variable-length list column must be rectangular and non-null (callers
    pre-filter with _nonnull_vec) — ragged rows fail loudly here rather
    than silently mis-rowing the reshape."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    if isinstance(arr, pa.ListArray):
        if len(arr) == 0:
            return np.zeros((0, 0), np.float32)
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        d = int(widths[0])
        if arr.null_count or (widths != d).any():
            raise ValueError(
                "embedding column has null or ragged rows — filter with "
                "_nonnull_vec before vector kernels")
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(-1, d).astype(np.float32)
    # FixedSizeListArray
    d = arr.type.list_size
    return arr.values.to_numpy(zero_copy_only=False).reshape(-1, d).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def topk_boundary(scores: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Deterministic per-batch top-``kk`` candidate indices under the
    global (score DESC, id ASC) order.  ``np.argpartition`` alone leaves
    boundary TIES in unspecified order, which breaks the mirrors'
    ``row_number()`` determinism whenever equal scores straddle the
    cutoff — routine for integer ADC scores, and real for float cosine
    too (planted duplicate embeddings give bit-equal similarities).

    Cost stays near-linear: O(n) argpartition to the cutoff score, widen
    to every row tied with it, then lexsort only that candidate set —
    a full-batch lexsort would pay O(n log n) per query in the hot ANN
    scan loops for ties that touch a handful of rows."""
    n = len(scores)
    if kk >= n:
        order = np.lexsort((ids, -scores))
        return order[:kk]
    part = np.argpartition(-scores, kk - 1)
    cut = scores[part[kk - 1]]
    cand = np.flatnonzero(scores >= cut)
    order = cand[np.lexsort((ids[cand], -scores[cand]))]
    return order[:kk]


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
            idx = topk_boundary(sims[qi], ids, kk)
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


def sample_rows_absolute(ds: rd.Dataset, n_rows: int,
                         vec_col: str = "embedding",
                         seed: int = 3,
                         id_col: str = "vec_id") -> np.ndarray:
    """Bounded training sample: an ABSOLUTE row cap, never a fraction of the
    corpus.  ``ds.count()`` on parquet answers from footer metadata; the
    sample fraction is sized so the expected draw is ~2× the cap and the
    driver-side slice enforces the hard bound; the FULL sampled stream is
    consumed before sorting (an early row-budget break would truncate at
    whatever blocks arrived first under the streaming executor's
    nondeterministic order, making the sampled SET itself run-dependent).

    The collected rows are SORTED by ``id_col`` before truncation: Ray's
    streaming executor delivers blocks in nondeterministic arrival order, so
    without the sort two runs of the same job train on permuted samples and
    k-means (seeded index choice) lands on different centroids — which broke
    the sidecar-replay mirrors intermittently.  Below the cap (every sidecar
    scale) the sorted sample is exactly the file-order prefix the sidecar
    replays; above it, the seeded random_sample fixes the SET and the
    sort fixes the order."""
    total = ds.count()
    frac = min(1.0, (2.0 * n_rows) / max(total, 1))
    sampled = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    chunks: list[np.ndarray] = []
    id_chunks: list[np.ndarray] = []
    for b in sampled.iter_batches(batch_size=8192, batch_format="pyarrow"):
        m = embeddings_matrix(b, vec_col)
        chunks.append(m)
        id_chunks.append(b[id_col].to_numpy(zero_copy_only=False))
    if not chunks:
        return np.zeros((0, 1), np.float32)
    out = np.concatenate(chunks)
    order = np.argsort(np.concatenate(id_chunks), kind="stable")
    return out[order][:n_rows]


def build_ivf_index(
    ds: rd.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    sample_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Write the corpus as parquet PARTITIONED BY ivf_bucket and persist the
    centroids next to it.  Returns the centroid matrix.

    The bucket id is stored BOTH as the hive partition (directory name —
    what read pruning keys on) and as a regular ``bucket`` column (so
    per-row masking inside a probed file needs no path parsing)."""
    cents = train_centroids(
        sample_rows_absolute(ds, sample_rows, vec_col, id_col=id_col),
        n_centroids)
    bucketed = assign_buckets(ds, cents, vec_col)

    def dup_col(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", t["ivf_bucket"])

    bucketed.map_batches(dup_col, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ivf_bucket"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return cents


def probed_files(index_dir: str, buckets: np.ndarray) -> tuple[list[str], int]:
    """(files belonging to the probed buckets, total file count) — the
    pruning evidence tests assert on."""
    all_files = glob.glob(os.path.join(index_dir, "ivf_bucket=*", "*.parquet"))
    want = {int(b) for b in buckets}
    hit = [f for f in all_files
           if int(os.path.basename(os.path.dirname(f)).split("=", 1)[1]) in want]
    return hit, len(all_files)


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> "pd.DataFrame":
    """Search a persisted IVF index, reading ONLY the probed buckets' files.

    ``exclude_self``: drop hits whose corpus id equals the query id — right
    for self-join dedup queries (the default), wrong for EXTERNAL query
    vectors whose ids merely collide with corpus ids (pass False there,
    as brute_force_topk does).

    I/O cost is proportional to the probed fraction (nprobe / n_centroids of
    the corpus for balanced buckets) — the previous implementation scanned
    every batch and masked, which pruned compute but not I/O (VERDICT r1)."""
    import pandas as pd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(np.asarray(queries, np.float64))
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    files, _total = probed_files(index_dir, np.unique(probes))
    if not files:
        return pd.DataFrame({"query_id": [], "rank": [], "vec_id": [], "cos": []})
    ds = dio.read_parquet(files, columns=[id_col, vec_col, "bucket"])
    q_ref = ray.put((qn, np.asarray(query_ids), probes))

    def partial(batch: pa.Table) -> pa.Table:
        qmat, qids, prb = ray.get(q_ref)
        m = _normalize(embeddings_matrix(batch, vec_col).astype(np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bks = batch["bucket"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_cos = [], [], []
        for qi in range(len(qmat)):
            mask = np.isin(bks, prb[qi])
            if not mask.any():
                continue
            sims = m[mask] @ qmat[qi]
            sel_ids = ids[mask]
            kk = min(k + 1, len(sims))
            idx = topk_boundary(sims, sel_ids, kk)
            out_q.extend([int(qids[qi])] * len(idx))
            out_id.extend(sel_ids[idx].tolist())
            out_cos.extend(sims[idx].tolist())
        return pa.Table.from_pydict(
            {"query_id": out_q, "vec_id": out_id, "cos": out_cos},
            schema=pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                              ("cos", pa.float64())]))

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["vec_id"]]
    parts = parts.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "vec_id", "cos"]]


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_rows: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_dir: str | None = None,
) -> "pd.DataFrame":
    """Convenience: build (or reuse) the partitioned index, then search it.
    Recall vs brute force depends on nprobe/n_centroids (measured in tests,
    not assumed)."""
    import shutil
    import tempfile

    # default path is a PER-CALL temp dir (not a fixed shared one): two
    # concurrent callers on one host must not rmtree each other's index
    # mid-search, and the scratch index must not outlive the call
    scratch = None
    if index_dir is None:
        scratch = tempfile.mkdtemp(prefix="dedup_ray_ivf_",
                                   dir=tempfile.gettempdir())
        index_dir = os.path.join(scratch, "index")
    try:
        if not os.path.exists(os.path.join(index_dir, "centroids.npy")):
            build_ivf_index(ds, index_dir, n_centroids, sample_rows,
                            vec_col, id_col)
        return ivf_search(index_dir, queries, query_ids, k, nprobe,
                          id_col, vec_col)
    finally:
        if scratch is not None:
            shutil.rmtree(scratch, ignore_errors=True)


def append_ivf_index(new_ds: rd.Dataset, index_dir: str,
                     vec_col: str = "embedding") -> int:
    """Fold an increment into a persisted IVF index WITHOUT retraining or
    rewriting — the ANN leg of the incremental-maintenance family (exact
    Bloom store, near-dup band index, cluster fold): new vectors are
    assigned to the EXISTING coarse centroids (one broadcast lookup) and
    written as additional parquet files inside the same hive bucket
    partitions (Ray's writer generates unique file names, so appends never
    clobber).  Search — ``ivf_search`` — is oblivious to the append: it
    reads probed bucket directories, old and new files alike.

    Returns the number of appended rows.  Centroid drift accrues with
    appends (new vectors can only join existing buckets); rebuild cadence
    is an operator decision, exactly as with the reference's periodic
    prune/rebuild of its shelve store (/root/reference/dupedb.py:371-411).
    """
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    bucketed = assign_buckets(new_ds, cents, vec_col)

    def dup_col(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", t["ivf_bucket"])

    out = bucketed.map_batches(dup_col, batch_format="pyarrow").materialize()
    out.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    return out.count()


# ---------------------------------------------------------------------------
# Sign-random-projection (SRP) LSH — the LSH-bucketed embedding near-dup
# scale path (Charikar, STOC 2002: "Similarity estimation techniques from
# rounding algorithms" — public literature).  Each vector is hashed by the
# SIGNS of its dot products with a fixed seeded Gaussian hyperplane matrix;
# two vectors agree on one hyperplane bit with probability 1 - θ/π (θ the
# angle between them), so banding r bits × b bands gives high-cosine pairs
# a high chance of sharing at least one band key while the corpus-wide
# candidate set stays near-linear.  This complements IVF (bucket the SPACE
# around trained centroids) with a data-independent bucketing of DIRECTION —
# no training pass, append-trivial, and the discrete decisions are exactly
# replayable from the seed (which is what the DuckDB mirror consumes).

SRP_SEED = 20260818
SRP_BANDS = 16
SRP_BITS = 8

_SRP_H: dict[tuple[int, int, int, int], np.ndarray] = {}


def srp_hyperplanes(dim: int, nbands: int = SRP_BANDS, rbits: int = SRP_BITS,
                    seed: int = SRP_SEED) -> np.ndarray:
    """(dim, nbands·rbits) float64 Gaussian hyperplane matrix, derived
    deterministically from the seed and memoized per process (each worker
    re-derives it once — nothing is shipped)."""
    k = (dim, nbands, rbits, seed)
    h = _SRP_H.get(k)
    if h is None:
        h = np.random.default_rng(seed).standard_normal((dim, nbands * rbits))
        _SRP_H[k] = h
    return h


def srp_band_keys(x: np.ndarray, nbands: int = SRP_BANDS,
                  rbits: int = SRP_BITS, seed: int = SRP_SEED) -> np.ndarray:
    """(n, nbands) int64 band keys: sign bits of x·H, packed rbits per band.

    Float64 throughout so the engine stages and the Ray-free sidecar replay
    (fixtures.srp_sidecar_path) compute bit-identical keys from the same
    float32 source column."""
    x = np.asarray(x, np.float64)
    h = srp_hyperplanes(x.shape[1], nbands, rbits, seed)
    bits = (x @ h) > 0.0
    w = np.int64(1) << np.arange(rbits, dtype=np.int64)
    return bits.reshape(len(x), nbands, rbits).astype(np.int64) @ w


def srp_band_rows(t: pa.Table, nbands: int = SRP_BANDS,
                  rbits: int = SRP_BITS, seed: int = SRP_SEED) -> pa.Table:
    """SRP band rows for one Arrow batch of (vec_id, embedding): one row per
    (vector, band) carrying the band key, the vector's FULL key list (the
    owner-band dedup needs it at verify time) and the float32 embedding
    (the verify payload — nbands·dim·4 B per vector through the shuffle).
    Shared by the in-run pair query (queries.emb_srp_pairs) and the
    persisted index (state/srpstore.py), so both band identically."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x32 = embeddings_matrix(t)
    keys = srp_band_keys(x32, nbands, rbits, seed)
    n, dim = x32.shape
    rep = np.repeat(np.arange(n), nbands)
    return pa.Table.from_arrays(
        [pa.array(np.tile(np.arange(nbands, dtype=np.int64), n)),
         pa.array(keys.reshape(-1)),
         pa.array(ids[rep]),
         pa.FixedSizeListArray.from_arrays(
             pa.array(keys[rep].reshape(-1)), nbands),
         pa.FixedSizeListArray.from_arrays(
             pa.array(x32[rep].reshape(-1)), dim)],
        names=["band", "bkey", "vec_id", "allkeys", "emb"])


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search" — public literature): the COMPRESSED-domain ANN
# member beside brute force (exact), IVF (trained partitioning) and
# SRP-LSH (training-free banding).  Vectors are split into PQ_M subspaces;
# each subvector is replaced by the index of its nearest per-subspace
# k-means codeword (PQ_K codes → one byte each), and a query scans codes
# with an additive lookup table (ADC) instead of touching floats — at
# 100 TB the scan reads M bytes per vector instead of 4·d.
#
# Determinism: codebooks train on the same vec_id-sorted absolute-cap
# sample as IVF/prototypicality (sample_rows_absolute); encode ties break
# to the lowest code via np.argmin; ADC contributions are e6-quantized
# int64 per (query, subspace, code), so the total score is integer-exact
# under any batch split and the sidecar replay is bit-identical.

PQ_M = 8
PQ_K = 16
PQ_SEED = 29


def train_pq_codebooks(sample: np.ndarray, m: int = PQ_M, k: int = PQ_K,
                       iters: int = 8, seed: int = PQ_SEED) -> np.ndarray:
    """(m, k, d/m) float64 codebooks: per-subspace Lloyd k-means (L2) on
    the NORMALIZED sample — cosine on unit vectors is inner product, which
    ADC reconstructs additively across subspaces."""
    x = _normalize(np.asarray(sample, np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by PQ_M={m}")
    dsub = d // m
    books = np.zeros((m, k, dsub))
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        idx = rng.choice(len(sub), size=min(k, len(sub)), replace=False)
        c = sub[idx].copy()
        for _ in range(iters):
            d2 = ((sub ** 2).sum(1, keepdims=True)
                  - 2.0 * (sub @ c.T) + (c ** 2).sum(1))
            a = np.argmin(d2, axis=1)
            for t in range(len(c)):
                mem = sub[a == t]
                if len(mem):
                    c[t] = mem.mean(axis=0)
        books[j] = np.vstack([c, np.zeros((k - len(c), dsub))]) \
            if len(c) < k else c
    return books


def pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) int64 codes: nearest codeword per subspace of the NORMALIZED
    input (ties → lowest code)."""
    xn = _normalize(np.asarray(x, np.float64))
    m, k, dsub = books.shape
    codes = np.empty((len(xn), m), np.int64)
    for j in range(m):
        sub = xn[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub ** 2).sum(1, keepdims=True)
              - 2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(1))
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_lut_e6(queries: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(Q, m, k) int64 ADC lookup table: e6-quantized inner product of each
    normalized query subvector with each codeword.  The e6 rounding happens
    PER CELL, so summing over subspaces is integer-exact everywhere."""
    qn = _normalize(np.asarray(queries, np.float64))
    m, k, dsub = books.shape
    lut = np.empty((len(qn), m, k), np.int64)
    for j in range(m):
        qsub = qn[:, j * dsub:(j + 1) * dsub]
        lut[:, j, :] = np.floor(qsub @ books[j].T * 1e6 + 0.5).astype(np.int64)
    return lut


def pq_adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(Q, n) int64 ADC scores: additive lookup over the code matrix."""
    nq, m, _ = lut.shape
    out = np.zeros((nq, len(codes)), np.int64)
    for j in range(m):
        out += lut[:, j, :][:, codes[:, j]]
    return out


# ---------------------------------------------------------------------------
# IVFADC (Jégou et al. 2011 §III — the classic combination): IVF buckets
# prune WHICH files are read (I/O ∝ nprobe/n_centroids of the corpus),
# PQ codes compress WHAT is read (M int8 codes per vector instead of 4·d
# float bytes), and the scan is additive lookups.  This is the production
# scale path for embedding ANN at 100 TB: the float embeddings are
# touched exactly once (at build), every search reads a few pruned
# partitions of byte codes.  Codebooks are trained on the FULL vectors
# (not residuals) so the ADC table composes with the standalone PQ sidecar
# replay — recall rides the same nprobe/rerank knobs measured in tests.

def build_ivfpq_index(
    ds: rd.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    sample_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, np.ndarray]:
    """Write (id, bucket, codes int8[M]) parquet PARTITIONED BY ivf_bucket;
    persist centroids + codebooks next to it.  One streaming pass over the
    floats; the index holds no float payload at all."""
    sample = sample_rows_absolute(ds, sample_rows, vec_col, id_col=id_col)
    cents = train_centroids(sample, n_centroids)
    books = train_pq_codebooks(sample)
    ref = ray.put((cents, books))

    def enc(t: pa.Table) -> pa.Table:
        c, b = ray.get(ref)
        m = embeddings_matrix(t, vec_col).astype(np.float64)
        xn = _normalize(m)
        bks = np.argmax(xn @ c.T, axis=1).astype(np.int32)
        codes = pq_encode(m, b).astype(np.int8)
        return pa.table({
            id_col: t[id_col],
            "ivf_bucket": pa.array(bks, pa.int32()),
            "bucket": pa.array(bks, pa.int32()),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.int8()), codes.shape[1]),
        })

    ds.map_batches(enc, batch_format="pyarrow", batch_size=8192) \
        .write_parquet(index_dir, partition_cols=["ivf_bucket"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    np.save(os.path.join(index_dir, "pq_books.npy"), books)
    return cents, books


def ivfpq_search(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> "pd.DataFrame":
    """ADC search over a persisted IVFPQ index: read ONLY the probed
    buckets' code files, score by e6-integer lookup sums (deterministic
    under any batch split), merge partial top-k.

    ``exclude_self`` as in ivf_search: default drops corpus rows whose id
    equals the query id (self-join dedup); pass False for external query
    vectors whose ids merely collide with corpus ids."""
    import pandas as pd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "pq_books.npy"))
    qn = _normalize(np.asarray(queries, np.float64))
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    lut = pq_lut_e6(qn, books)
    files, _total = probed_files(index_dir, np.unique(probes))
    cols = ["query_id", "rank", "vec_id", "score_e6"]
    if not files:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    ds = dio.read_parquet(files, columns=[id_col, "bucket", "codes"])
    q_ref = ray.put((lut, np.asarray(query_ids, np.int64), probes))
    m_subs = books.shape[0]

    def partial(t: pa.Table) -> pa.Table:
        lt, qids, prb = ray.get(q_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bks = t["bucket"].to_numpy(zero_copy_only=False)
        arr = t["codes"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0)
        codes = arr.values.to_numpy(zero_copy_only=False).astype(
            np.int64).reshape(-1, m_subs)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(bks, prb[qi])
            if not mask.any():
                continue
            sc = pq_adc_scores(codes[mask], lt[qi:qi + 1])[0]
            sel = ids[mask]
            kk = min(k + 1, len(sc))
            idx = topk_boundary(sc, sel, kk)
            out_q.extend([int(qids[qi])] * len(idx))
            out_id.extend(sel[idx].tolist())
            out_s.extend(sc[idx].tolist())
        return pa.Table.from_pydict(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score_e6": pa.array(out_s, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["vec_id"]]
    parts = parts.sort_values(["query_id", "score_e6", "vec_id"],
                              ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    return out[cols]
