"""P4+P5 fused — candidate generation + verification inside each LSH bucket.

Runs as a *partitioned groupby* (stages/partitioned.py): band rows are
hash-partitioned on (band, key), and each partition — containing complete
buckets, most of them singletons — is processed by ONE vectorized Python
call.  Per-bucket Python only runs for the multi-member buckets that
actually need pairing (a ``Dataset.groupby.map_groups`` per bucket would pay
Python overhead per singleton, which at 10^12 rows × 21 bands is the whole
runtime).

Verification emits only verified edges (src < dst), so no unverified
candidate pair ever crosses a second shuffle:

- image bands (band < 100): vectorized Hamming(dhash) ≤ cfg.hamming_max;
- caption bands: exact character-shingle Jaccard ≥ cfg.jaccard_min, with a
  per-partition shingle cache keyed by caption (MinHash banding only
  *proposes*; the verify metric is exact).

Skew policy (north-rule requirement — hot buckets handled explicitly, never
silently): a bucket larger than ``cfg.band_group_cap`` is deterministically
split (sorted by id) into cap-sized sub-buckets verified internally, plus a
*representative* bucket (first member of each sub-bucket) that re-links the
sub-buckets — preserving cluster connectivity for near-clique hot buckets
via union-find transitivity.  Every overflow is emitted as a stats row
(src == '', overflow = bucket size) routed to the run manifest.  Duplicate
edges across bands are left to CC (idempotent) / the distinct-pairs view.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.hashing import hamming_u64

_EMPTY = pd.DataFrame(
    {"src": pd.Series([], dtype=str), "dst": pd.Series([], dtype=str),
     "overflow": pd.Series([], dtype="int64")}
)


def _verify_members(ids, dh, caps, is_img, cfg, shingle_cache) -> list[tuple[str, str]]:
    """All-pairs verify within one (sub-)bucket; k bounded by the cap."""
    k = len(ids)
    edges = []
    if is_img:
        dh_u = np.asarray(dh, np.int64)
        for i in range(k - 1):
            ham = hamming_u64(np.full(k - 1 - i, dh_u[i], np.int64), dh_u[i + 1 :])
            for j in np.where(ham <= cfg.hamming_max)[0]:
                a, b = ids[i], ids[i + 1 + j]
                edges.append((a, b) if a < b else (b, a))
    else:
        sh = []
        for c in caps:
            s = shingle_cache.get(c)
            if s is None:
                s = textfn.char_shingle_hashes(c, cfg.shingle_k)
                shingle_cache[c] = s
            sh.append(s)
        for i in range(k - 1):
            si = sh[i]
            for j in range(i + 1, k):
                sj = sh[j]
                if len(si) == 0 and len(sj) == 0:
                    jac = 1.0
                else:
                    inter = len(np.intersect1d(si, sj, assume_unique=True))
                    jac = inter / (len(si) + len(sj) - inter)
                if jac >= cfg.jaccard_min:
                    a, b = ids[i], ids[j]
                    edges.append((a, b) if a < b else (b, a))
    return edges


def make_partition_verify(cfg: PipelineConfig):
    """Partition-level fn for ``partitioned_groupby(band_rows, ["band","key"], fn)``."""

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY
        # drop singleton buckets vectorized — the overwhelming majority
        sizes = df.groupby(["band", "key"], sort=False)["image_id"].transform("size")
        df = df[sizes >= 2]
        if df.empty:
            return _EMPTY
        df = df.sort_values(["band", "key", "image_id"], kind="mergesort")

        src_out: list[str] = []
        dst_out: list[str] = []
        overflow: list[int] = []
        shingle_cache: dict[str, np.ndarray] = {}
        cap_n = cfg.band_group_cap

        for (band, _key), g in df.groupby(["band", "key"], sort=False):
            ids = g["image_id"].tolist()
            dh = g["dhash"].to_numpy()
            caps = g["caption"].tolist() if "caption" in g else [""] * len(ids)
            is_img = band < 100
            k = len(ids)
            if k <= cap_n:
                edges = _verify_members(ids, dh, caps, is_img, cfg, shingle_cache)
            else:
                overflow.append(k)
                edges = []
                reps = []
                for s in range(0, k, cap_n):
                    sub = slice(s, min(s + cap_n, k))
                    edges += _verify_members(ids[sub], dh[sub], caps[sub], is_img,
                                             cfg, shingle_cache)
                    reps.append(s)
                reps = reps[:cap_n]
                edges += _verify_members(
                    [ids[i] for i in reps], dh[reps],
                    [caps[i] for i in reps], is_img, cfg, shingle_cache,
                )
            for a, b in edges:
                src_out.append(a)
                dst_out.append(b)

        n_edges = len(src_out)
        src_out += [""] * len(overflow)
        dst_out += [""] * len(overflow)
        over = [0] * n_edges + overflow
        return pd.DataFrame(
            {"src": src_out, "dst": dst_out, "overflow": np.asarray(over, np.int64)}
        )

    return verify_partition
