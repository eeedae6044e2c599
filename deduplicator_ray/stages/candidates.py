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

On salting (the classical hot-band treatment, cfg.salt_buckets): we
evaluated salted band keys — ``key' = (key, hash(id) % S)`` — and chose
exact-hash collapse instead.  Salting splits a hot bucket's CANDIDATE
PAIRS across S² sub-buckets, so recovering them needs either duplicate row
fan-out (each row in every salt slot of one side — S× shuffle volume) or a
second linking pass; collapse bounds the same work in one pass while
keeping pair emission exact up to the documented low-information cutoff.
Salted routing remains available for the actor-pool band index
(state/bandtable.py routes whole buckets by key hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.hashing import hamming_u64

import pyarrow as pa

# callers pass this as partitioned_groupby's out_schema so empty partitions
# emit the exact same Arrow schema as full ones
VERIFY_SCHEMA = pa.schema([
    ("src", pa.string()), ("dst", pa.string()), ("overflow", pa.int64()),
])

_EMPTY = VERIFY_SCHEMA.empty_table()


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
                    cache: _SigCache, img_active: bool = True,
                    wide_nbits: int = 0) -> list[tuple[str, str]]:
    """All-pairs verify within one (sub-)bucket; emits only owner-band pairs.
    k bounded by the cap.  ``img_active``: whether the image channel is
    banding this dataset — the caption channel may only delegate
    Hamming-verified pairs to the image channel when it actually exists,
    else those pairs would be silently dropped.  ``wide_nbits``: nonzero for
    hash_size != 8 — img-bucket members then carry the hex fingerprint in
    the payload (``caps``) column and Hamming/owner-slice run on the
    unpacked bit matrix instead of the int64 ``dh``."""
    k = len(ids)
    edges = []
    dh_u = np.asarray(dh, np.int64)
    if is_img:
        from deduplicator_ray.stages.banding import (img_slices,
                                                     wide_hash_bits,
                                                     wide_slice_keys)

        if wide_nbits:
            bits = wide_hash_bits(list(caps), wide_nbits)      # (k, nbits)
            keys = wide_slice_keys(bits, img_slices(wide_nbits))
        else:
            keys = _img_slice_keys(dh_u)
        for i in range(k - 1):
            if wide_nbits:
                ham = (bits[i + 1:] != bits[i][None, :]).sum(axis=1)
            else:
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
        # Check order tuned from cProfile: the scalar Hamming image-owned
        # test runs FIRST (most caption collisions are between image
        # near-dups the image channel already owns — skipping them avoids
        # ever computing their shingles), then lazy shingles + length
        # bound, then the set intersection, then lazy owner-band keys.
        jmin = cfg.jaccard_min
        hmax = cfg.hamming_max
        dh_py = [int(x) for x in dh_u.view(np.uint64).tolist()]
        sh = [None] * k
        for i in range(k - 1):
            di = dh_py[i]
            for j in range(i + 1, k):
                dj = dh_py[j]
                if img_active and di and dj and (di ^ dj).bit_count() <= hmax:
                    continue  # image channel owns Hamming-verified pairs:
                    # both dhashes nonzero ⇒ both rows are in the image
                    # banding keyspace, and ham ≤ hmax ≤ slices-1 pigeonholes
                    # them into a shared slice band.  Pairs with ANY zero
                    # dhash (md5-keyed media, poison hash, text-only docs)
                    # have no image owner — Hamming against 0 is just
                    # popcount, which can be ≤ hmax for near-black images —
                    # so those must be Jaccard-verified here, not delegated.
                si = sh[i]
                if si is None:
                    si = sh[i] = cache.sh(caps[i])
                sj = sh[j]
                if sj is None:
                    sj = sh[j] = cache.sh(caps[j])
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
                bk_i, bk_j = cache.bk(caps[i]), cache.bk(caps[j])
                colliding = np.nonzero(bk_i == bk_j)[0]
                if len(colliding) and colliding[0] != band_idx:
                    continue  # a lower caption band owns this pair
                a, b = ids[i], ids[j]
                edges.append((a, b) if a < b else (b, a))
    return edges


class _LocalUF:
    """Union-find for spanning-forest emission inside hot buckets: a dense
    mutual-near-dup region has O(m²) verified pairs, but connected
    components downstream only need a spanning subgraph — emitting one
    tree edge per union keeps hot-bucket output linear while preserving
    every cluster exactly.  Deterministic given deterministic pair order."""

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo
        return True


def _collapse_verify(ids, dh, band_idx: int, cfg: PipelineConfig,
                     caps=None, wide_nbits: int = 0) -> list[tuple[str, str]]:
    """Hot image bucket: exact-dhash collapse + capped representative verify.

    Identical-hash groups (Hamming 0, all slices equal → owner slice 0)
    emit star edges to the group's lexicographic-min member from band 0
    only.  Cross-group similarity is verified between one representative
    per distinct hash (spanning-forest emission); above ``img_rep_cap``
    distinct hashes the region is low-information and clusters by exact
    hash only (see inline note)."""
    if wide_nbits:
        hash_keys = list(caps)  # hex payload IS the exact-hash group key
    else:
        hash_keys = np.asarray(dh, np.int64).tolist()
    groups: dict[object, list[str]] = {}
    for idx, h in enumerate(hash_keys):
        groups.setdefault(h, []).append(ids[idx])
    edges: list[tuple[str, str]] = []
    rep_ids: list[str] = []
    rep_hash: list = []
    for h, members in groups.items():
        members.sort()
        rep_ids.append(members[0])
        rep_hash.append(h)
        if band_idx == 0:
            edges.extend((members[0], m) for m in members[1:])
    order = sorted(range(len(rep_ids)), key=lambda i: rep_ids[i])
    rep_ids = [rep_ids[i] for i in order]
    rep_hash = [rep_hash[i] for i in order]
    rep_h = (np.zeros(len(rep_ids), np.int64) if wide_nbits
             else np.asarray(rep_hash, np.int64))

    m = len(rep_ids)
    if m > cfg.img_rep_cap:
        # Low-information hash region (the generalized zero-hash poison
        # bucket, /root/reference/dedupc.py:176-178): >8k DISTINCT hashes
        # share one 13-bit slice only when the hash carries almost no
        # gradient signal (measured: smooth-image buckets with 54k distinct
        # reps where 1.9% of rep pairs sit within Hamming 4 — a quadratic
        # pair mass whose transitive closure glues unrelated smooth images).
        # Policy: cluster these by EXACT hash only (the reference's own
        # semantics); the overflow row records the skip — never silent.
        return edges
    # cross-group rep verify with spanning-forest emission: dense regions
    # have O(m²) verified pairs but CC only needs a spanning subgraph
    cache = _SigCache(cfg)
    uf = _LocalUF()
    rep_payload = rep_hash if wide_nbits else [""] * m
    for a, b in sorted(_verify_members(rep_ids, rep_h, rep_payload, band_idx,
                                       True, cfg, cache,
                                       wide_nbits=wide_nbits)):
        if uf.union(a, b):
            edges.append((a, b))
    return edges


def make_partition_verify(cfg: PipelineConfig,
                          channels: tuple[str, ...] = ("img", "cap")):
    """Partition-level fn for ``partitioned_groupby(band_rows, ["band","key"], fn)``.

    ``channels`` must match what ``make_banding`` emitted: the caption
    channel's owner logic delegates Hamming-verified pairs to the image
    channel only when that channel is active (a caption-only run would
    otherwise silently drop them)."""
    from deduplicator_ray.stages.banding import _IMG_SLICES, CAP_BAND_OFFSET, MD5_BAND

    img_active = "img" in channels
    if img_active and cfg.hamming_max > len(_IMG_SLICES) - 1:
        raise ValueError(
            f"hamming_max={cfg.hamming_max} exceeds the pigeonhole capacity "
            f"of {len(_IMG_SLICES)} dHash slices (max {len(_IMG_SLICES) - 1})")
    # hash_size != 8: img-band rows carry the hex fingerprint as payload
    # and Hamming runs on the unpacked bit matrix (see banding.img_slices)
    wide_nbits = 0 if cfg.hash_size == 8 else cfg.hash_size * cfg.hash_size

    def verify_partition(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _EMPTY
        # numpy bucket iteration: lexsort once, walk (band,key) span
        # boundaries, slice flat arrays per bucket.  The pandas
        # groupby-iterator version spent ~40% of partition wall in
        # DataFrame per-bucket chopping (cProfile, 824k-row partition);
        # the Arrow-native exchange (partitioned_groupby fmt="pyarrow")
        # additionally skips the whole-block Arrow→pandas round trip —
        # int columns below are zero-copy views.
        band_a = t["band"].to_numpy(zero_copy_only=False)
        key_a = t["key"].to_numpy(zero_copy_only=False)
        ids_a = t["image_id"].to_numpy(zero_copy_only=False)
        dh_a = t["dhash"].to_numpy(zero_copy_only=False)
        caps_a = (t["caption"].to_numpy(zero_copy_only=False)
                  if "caption" in t.schema.names else None)
        order = np.lexsort((ids_a, key_a, band_a))
        band_a, key_a, ids_a, dh_a = (band_a[order], key_a[order],
                                      ids_a[order], dh_a[order])
        if caps_a is not None:
            caps_a = caps_a[order]
        change = np.flatnonzero((band_a[1:] != band_a[:-1])
                                | (key_a[1:] != key_a[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(band_a)]))
        multi = ends - starts >= 2

        src_out: list[str] = []
        dst_out: list[str] = []
        overflow: list[int] = []
        cache = _SigCache(cfg)
        cap_n = cfg.band_group_cap

        for s0, s1 in zip(starts[multi].tolist(), ends[multi].tolist()):
            band = int(band_a[s0])
            ids = ids_a[s0:s1].tolist()
            dh = dh_a[s0:s1]
            caps = caps_a[s0:s1].tolist() if caps_a is not None else [""] * len(ids)
            if band == MD5_BAND:
                # strict-mode media: byte-exact dedup.  The payload column
                # carries the FULL md5 hex; identical-md5 groups are mutual
                # dups → star edges to the lexicographic-min member (linear
                # in bucket size, hot buckets included).  Differing md5s in
                # one bucket are 64-bit key collisions — no edge.
                mgroups: dict[str, list[str]] = {}
                for iid, m in zip(ids, caps):
                    mgroups.setdefault(m, []).append(iid)
                for members in mgroups.values():
                    members.sort()
                    for other in members[1:]:
                        src_out.append(members[0])
                        dst_out.append(other)
                continue
            is_img = band < CAP_BAND_OFFSET
            band_idx = band if is_img else band - CAP_BAND_OFFSET
            k = len(ids)
            if k <= cap_n:
                edges = _verify_members(ids, dh, caps, band_idx, is_img, cfg,
                                        cache, img_active,
                                        wide_nbits=wide_nbits if is_img else 0)
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
                edges = _collapse_verify(ids, dh, band_idx, cfg,
                                         caps=caps, wide_nbits=wide_nbits)
            else:
                # hot caption bucket: exact-caption collapse.  Identical
                # captions are Jaccard-1 groups → star edges to the group
                # min (owner: caption band 0, unless the image channel owns
                # the pair); cross-group reps get the normal verify, with
                # destructive sub-split (logged) only beyond the cap.
                overflow.append(k)
                edges = []
                cgroups: dict[str, list[int]] = {}
                for idx in range(k):
                    cgroups.setdefault(caps[idx], []).append(idx)
                rep_idx: list[int] = []
                dh_arr = np.asarray(dh, np.int64)
                for members in cgroups.values():
                    members.sort(key=lambda i: ids[i])
                    r = members[0]
                    rep_idx.append(r)
                    if band_idx == 0:
                        for m in members[1:]:
                            if img_active and \
                                    (dh_arr[r] != 0 or dh_arr[m] != 0) and \
                                    int(hamming_u64(dh_arr[r:r + 1],
                                                    dh_arr[m:m + 1])[0]) \
                                    <= cfg.hamming_max:
                                continue  # image channel owns this pair
                            a, b = ids[r], ids[m]
                            edges.append((a, b) if a < b else (b, a))
                rep_idx.sort(key=lambda i: ids[i])
                r_ids = [ids[i] for i in rep_idx]
                r_dh = dh_arr[rep_idx]
                r_caps = [caps[i] for i in rep_idx]
                kr = len(rep_idx)
                if kr <= cap_n:
                    edges += _verify_members(r_ids, r_dh, r_caps, band_idx,
                                             False, cfg, cache, img_active)
                else:
                    reps2 = []
                    for s in range(0, kr, cap_n):
                        sub = slice(s, min(s + cap_n, kr))
                        edges += _verify_members(r_ids[sub], r_dh[sub],
                                                 r_caps[sub], band_idx,
                                                 False, cfg, cache, img_active)
                        reps2.append(s)
                    reps2 = reps2[:cap_n]
                    edges += _verify_members(
                        [r_ids[i] for i in reps2], r_dh[reps2],
                        [r_caps[i] for i in reps2], band_idx, False, cfg,
                        cache, img_active,
                    )
            for a, b in edges:
                src_out.append(a)
                dst_out.append(b)

        n_edges = len(src_out)
        src_out += [""] * len(overflow)
        dst_out += [""] * len(overflow)
        over = [0] * n_edges + overflow
        return pa.Table.from_arrays(
            [pa.array(src_out, pa.string()), pa.array(dst_out, pa.string()),
             pa.array(over, pa.int64())], schema=VERIFY_SCHEMA)

    return verify_partition
