"""P4+P5 fused — candidate generation + verification inside each LSH bucket.

``groupby(band, key).map_groups(verify_bucket)`` emits only *verified*
edges (src < dst), so no unverified candidate pair ever crosses a second
shuffle and no per-pair signature payload is carried:

- image bands verify with vectorized Hamming(dhash) ≤ cfg.hamming_max;
- caption bands verify with exact character-shingle Jaccard ≥ cfg.jaccard_min
  (the MinHash banding only proposes; the verify metric is exact).

Skew policy (north-rule requirement — hot-band handling must be explicit,
never silent): a bucket larger than ``cfg.band_group_cap`` is deterministically
split (sorted by image_id) into sub-buckets of cap size that are verified
internally, plus one *representative* bucket (first member of each
sub-bucket) that re-links the sub-buckets, preserving cluster connectivity
for near-clique hot buckets.  Every overflow event is emitted as a stats row
(src == "", overflow = bucket size) that the pipeline routes to the run
manifest instead of dropping.  Pair-level recall within pathological
non-clique hot buckets may be reduced; cluster connectivity is preserved via
the representative bucket + union-find transitivity.

Duplicate edges across bands are NOT deduped here — connected components is
idempotent under duplicate edges, and the distinct-pairs view dedups with
one groupby where needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.hashing import hamming_u64


def _verify_members(ids, dh, caps, is_img, cfg) -> list[tuple[str, str]]:
    """All-pairs verify within one (sub-)bucket; k is bounded by the cap."""
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
        shingles = [textfn.char_shingle_hashes(c, cfg.shingle_k) for c in caps]
        for i in range(k - 1):
            si = shingles[i]
            for j in range(i + 1, k):
                sj = shingles[j]
                if len(si) == 0 and len(sj) == 0:
                    jac = 1.0
                else:
                    inter = len(np.intersect1d(si, sj, assume_unique=True))
                    jac = inter / (len(si) + len(sj) - inter)
                if jac >= cfg.jaccard_min:
                    a, b = ids[i], ids[j]
                    edges.append((a, b) if a < b else (b, a))
    return edges


def make_verify_bucket(cfg: PipelineConfig):
    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        k = len(group)
        if k < 2:
            return pd.DataFrame({"src": [], "dst": [], "overflow": []}).astype(
                {"src": str, "dst": str, "overflow": "int64"}
            )
        band = int(group["band"].iloc[0])
        is_img = band < 100
        group = group.sort_values("image_id")
        ids = group["image_id"].tolist()
        dh = group["dhash"].to_numpy()
        caps = group["caption"].tolist()

        edges: list[tuple[str, str]] = []
        overflow_rows: list[int] = []
        cap_n = cfg.band_group_cap
        if k <= cap_n:
            edges = _verify_members(ids, dh, caps, is_img, cfg)
        else:
            overflow_rows.append(k)
            reps_idx = []
            for s in range(0, k, cap_n):
                sub = slice(s, min(s + cap_n, k))
                edges += _verify_members(ids[sub], dh[sub], caps[sub], is_img, cfg)
                reps_idx.append(s)
            # representative bucket re-links sub-buckets (bounded: k/cap reps,
            # itself capped by recursion-free single level — log if still hot)
            reps = reps_idx[: cap_n]
            edges += _verify_members(
                [ids[i] for i in reps], dh[reps], [caps[i] for i in reps], is_img, cfg
            )

        src = [e[0] for e in edges] + [""] * len(overflow_rows)
        dst = [e[1] for e in edges] + [""] * len(overflow_rows)
        over = [0] * len(edges) + overflow_rows
        return pd.DataFrame({"src": src, "dst": dst, "overflow": np.array(over, np.int64)})

    return verify_bucket
