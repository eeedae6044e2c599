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

**Owner-band emission (global dedup with zero extra shuffle bytes).**  A
near-dup pair collides in several bands, so naive emission duplicates each
edge ~5-20× (measured 25.6M raw vs ~3.5M distinct edges on the 465k-image
corpus — the duplicate stream dominated the downstream CC shuffle).  Every
bucket instead emits a pair only if THIS band is the pair's *owner*:

- Hamming-verified pairs are owned by the lowest image-band slice on which
  the two hashes agree (pigeonhole guarantees one exists when
  hamming ≤ cfg.hamming_max, so exactly one image band emits);
- caption bands own only Jaccard-verified pairs that FAIL the Hamming test
  (otherwise the image channel already owns them), and among the caption
  bands the lowest colliding band index wins; band keys are recomputed from
  the per-partition signature cache, not shipped.

Ownership is decided from data already present in the bucket (dhash,
caption), so the dedup is exact and local — no global distinct shuffle.
Known gap, logged not hidden: if a pair's owner bucket overflows
``band_group_cap`` and sub-bucket splitting separates the pair, that pair
is emitted by no band; overflow stats rows record every such bucket, and
the representative relinking preserves cluster connectivity.

Skew policy (north-rule requirement — hot buckets handled explicitly, never
silently): a bucket larger than ``cfg.band_group_cap`` is deterministically
split (sorted by id) into cap-sized sub-buckets verified internally, plus a
*representative* bucket (first member of each sub-bucket) that re-links the
sub-buckets — preserving cluster connectivity for near-clique hot buckets
via union-find transitivity.  Every overflow is emitted as a stats row
(src == '', overflow = bucket size) routed to the run manifest.
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


def _img_slice_keys(dh: np.ndarray) -> np.ndarray:
    """(k, n_slices) int64 matrix of dHash band-slice keys."""
    from deduplicator_ray.stages.banding import _IMG_SLICES

    u = dh.astype(np.int64).view(np.uint64)
    cols = [((u >> np.uint64(s)) & np.uint64((1 << w) - 1)).view(np.int64)
            for s, w in _IMG_SLICES]
    return np.stack(cols, axis=1)


class _SigCache:
    """Per-partition caches keyed by caption text: shingle hash arrays and
    MinHash band keys (recomputed once per distinct caption, never shipped)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.shingles: dict[str, np.ndarray] = {}
        self.bandkeys: dict[str, np.ndarray] = {}

    def sh(self, cap: str) -> np.ndarray:
        s = self.shingles.get(cap)
        if s is None:
            s = textfn.char_shingle_hashes(cap, self.cfg.shingle_k)
            self.shingles[cap] = s
        return s

    def bk(self, cap: str) -> np.ndarray:
        b = self.bandkeys.get(cap)
        if b is None:
            cfg = self.cfg
            sig = textfn.minhash_signature(cap, cfg.shingle_k, cfg.num_perm)
            b = textfn.band_keys(sig[None, :], cfg.bands, cfg.rows_per_band)[0]
            self.bandkeys[cap] = b
        return b


def _verify_members(ids, dh, caps, band_idx, is_img, cfg,
                    cache: _SigCache) -> list[tuple[str, str]]:
    """All-pairs verify within one (sub-)bucket; emits only owner-band pairs.
    k bounded by the cap."""
    k = len(ids)
    edges = []
    dh_u = np.asarray(dh, np.int64)
    if is_img:
        keys = _img_slice_keys(dh_u)
        for i in range(k - 1):
            ham = hamming_u64(np.full(k - 1 - i, dh_u[i], np.int64), dh_u[i + 1:])
            hits = np.where(ham <= cfg.hamming_max)[0]
            if len(hits) == 0:
                continue
            eq = keys[i + 1:, :] == keys[i][None, :]          # (k-1-i, n_slices)
            owner = np.argmax(eq, axis=1)                      # first equal slice
            for j in hits:
                if owner[j] != band_idx:
                    continue  # a lower image band owns this pair
                a, b = ids[i], ids[i + 1 + j]
                edges.append((a, b) if a < b else (b, a))
    else:
        # Verify order matters: exact Jaccard runs first and band keys
        # (MinHash recompute) are derived LAZILY only for pairs that pass —
        # the eager variant (owner check first) recomputes signatures for
        # every multi-bucket member in every partition it lands in, which
        # measured SLOWER (68 s vs 37 s wall at 465k images).  The length-
        # ratio bound jac ≤ min(|A|,|B|)/max(|A|,|B|) rejects chance
        # collisions before any set intersection.
        sh = [cache.sh(c) for c in caps]
        jmin = cfg.jaccard_min
        for i in range(k - 1):
            si = sh[i]
            for j in range(i + 1, k):
                sj = sh[j]
                la, lb = len(si), len(sj)
                if la == 0 and lb == 0:
                    jac = 1.0
                else:
                    lo, hi = (la, lb) if la < lb else (lb, la)
                    if lo < jmin * hi:
                        continue  # length bound: jac ≤ lo/hi < threshold
                    inter = len(np.intersect1d(si, sj, assume_unique=True))
                    jac = inter / (la + lb - inter)
                if jac < jmin:
                    continue
                # image channel owns Hamming-verified pairs — but only when
                # an image channel exists: dhash==0 rows are either filtered
                # out of the image pipeline (poison hash) or text-only docs
                # (doc_dedup sets dhash=0), so a 0-0 pair has no image owner
                if (dh_u[i] != 0 or dh_u[j] != 0) and \
                        int(hamming_u64(dh_u[i:i + 1], dh_u[j:j + 1])[0]) <= cfg.hamming_max:
                    continue
                bk_i, bk_j = cache.bk(caps[i]), cache.bk(caps[j])
                colliding = np.nonzero(bk_i == bk_j)[0]
                if len(colliding) and colliding[0] != band_idx:
                    continue  # a lower caption band owns this pair
                a, b = ids[i], ids[j]
                edges.append((a, b) if a < b else (b, a))
    return edges


def _collapse_verify(ids, dh, band_idx: int, cfg: PipelineConfig,
                     cap_n: int) -> list[tuple[str, str]]:
    """Hot image bucket: exact-dhash collapse + representative verify.

    Identical-hash groups (Hamming 0, all slices equal → owner slice 0)
    emit star edges to the group's lexicographic-min member from band 0
    only.  Cross-group similarity is verified between one representative
    per distinct hash; rep counts above the cap fall back to deterministic
    sub-splits with rep-of-rep relinking."""
    dh_u = np.asarray(dh, np.int64)
    groups: dict[int, list[str]] = {}
    for idx, h in enumerate(dh_u.tolist()):
        groups.setdefault(h, []).append(ids[idx])
    edges: list[tuple[str, str]] = []
    rep_ids: list[str] = []
    rep_hash: list[int] = []
    for h, members in groups.items():
        members.sort()
        rep_ids.append(members[0])
        rep_hash.append(h)
        if band_idx == 0:
            edges.extend((members[0], m) for m in members[1:])
    order = sorted(range(len(rep_ids)), key=lambda i: rep_ids[i])
    rep_ids = [rep_ids[i] for i in order]
    rep_h = np.asarray([rep_hash[i] for i in order], np.int64)
    cache = _SigCache(cfg)
    blanks = [""] * len(rep_ids)
    cap_n = max(cap_n, cfg.img_rep_cap)   # rep verify is vectorized Hamming
    if len(rep_ids) <= cap_n:
        edges += _verify_members(rep_ids, rep_h, blanks, band_idx, True, cfg, cache)
    else:
        reps2 = []
        for s in range(0, len(rep_ids), cap_n):
            sub = slice(s, min(s + cap_n, len(rep_ids)))
            edges += _verify_members(rep_ids[sub], rep_h[sub], blanks[sub],
                                     band_idx, True, cfg, cache)
            reps2.append(s)
        reps2 = reps2[:cap_n]
        edges += _verify_members(
            [rep_ids[i] for i in reps2], rep_h[reps2],
            [""] * len(reps2), band_idx, True, cfg, cache,
        )
    return edges


def make_partition_verify(cfg: PipelineConfig):
    """Partition-level fn for ``partitioned_groupby(band_rows, ["band","key"], fn)``."""
    from deduplicator_ray.stages.banding import CAP_BAND_OFFSET

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
        cache = _SigCache(cfg)
        cap_n = cfg.band_group_cap

        for (band, _key), g in df.groupby(["band", "key"], sort=False):
            ids = g["image_id"].tolist()
            dh = g["dhash"].to_numpy()
            caps = g["caption"].tolist() if "caption" in g else [""] * len(ids)
            is_img = band < CAP_BAND_OFFSET
            band_idx = int(band) if is_img else int(band) - CAP_BAND_OFFSET
            k = len(ids)
            if k <= cap_n:
                edges = _verify_members(ids, dh, caps, band_idx, is_img, cfg, cache)
            elif is_img:
                # hot image bucket: exact-hash collapse (the reference's own
                # grouping semantics, dupedb.py:253-257).  Measured skew at
                # 465k images: slice buckets up to 76k members, dominated by
                # identical full hashes.  Identical-hash groups are mutual
                # dups (Hamming 0) → star edges to the group min preserve
                # their cluster exactly; cross-group similarity is verified
                # on one representative per distinct hash (k_distinct ≪ k),
                # emitting one linking edge per verified rep pair —
                # cluster-exact, pair-sampled (logged as overflow).
                overflow.append(k)
                edges = _collapse_verify(ids, dh, band_idx, cfg, cap_n)
            else:
                overflow.append(k)
                edges = []
                reps = []
                for s in range(0, k, cap_n):
                    sub = slice(s, min(s + cap_n, k))
                    edges += _verify_members(ids[sub], dh[sub], caps[sub],
                                             band_idx, is_img, cfg, cache)
                    reps.append(s)
                reps = reps[:cap_n]
                edges += _verify_members(
                    [ids[i] for i in reps], dh[reps],
                    [caps[i] for i in reps], band_idx, is_img, cfg, cache,
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
