"""Single-process numpy oracle for golden tests (SURVEY.md §5.2).

Recomputes, without Ray, exactly what the reference computes:

- fingerprints: dHash per image (md5 is the strict-mode path for
  non-decodable media — /root/reference/dupedb.py:68-101);
- reference-mode clusters: buckets of *exact* dhash equality with
  ``threshold``, skipping the zero hash (dupedb.py:296-369 +
  dedupc.py:176-178);
- keeper decisions: argmin of the quality tuple per bucket
  (dedupc.py:180, 211-218);
- extended-mode (north star): all-pairs verification
  (Hamming(dhash) ≤ t  OR  MinHash-Jaccard(caption) ≥ j) and the transitive
  closure (union-find) — the ground truth the distributed LSH pipeline's
  recall ≥ 0.99 is measured against.

Everything here is O(n²)-tolerant driver-side code for fixture scales; the
Ray pipeline must match it, not the other way around.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicator_ray import codecs, hashing
from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.functions import text as textfn
from deduplicator_ray.stages.ranking import keeper_sort_key


def compute_rows(images: pa.Table, cfg: PipelineConfig) -> list[dict]:
    """Decode + fingerprint every row; corrupt rows get status='error'."""
    out = []
    cols = images.to_pydict()
    for i in range(images.num_rows):
        row = {k: cols[k][i] for k in images.column_names}
        # null-tolerant like the engine (decode_hash null-coerces w/h and
        # dead-letters null payloads) — the oracle must survive the same
        # web-dirty rows or the dead-letter path can never be golden-tested
        data = row["bytes"] if row["bytes"] is not None else b""
        w = int(row["w"] or 0)
        h = int(row["h"] or 0)
        rec = {
            "image_id": row["image_id"],
            "caption": row["caption"],
            "pixels": w * h,
            "filesize": len(data),
            "md5": hashing.md5_hex(data),
            "stored_phash": row["phash"],
            "frames": 1,
        }
        try:
            if row["bytes"] is None:
                raise codecs.CodecError("NullPayload: bytes is null")
            if row["fmt"] in codecs.CONTAINER_FMTS:
                # video/animated container: real frame count in both
                # modes; strict multi-frame → md5 byte identity,
                # non-strict (or single-frame) → frame-0 perceptual hash
                # (/root/reference/dupedb.py:82-98)
                img, nf = codecs.decode_container_first(data, row["fmt"])
                rec["frames"] = nf
                if (w or h) and (img.shape[0] != h or img.shape[1] != w):
                    raise codecs.CodecError(
                        f"decoded frame dims {img.shape[1]}x{img.shape[0]}"
                        f" != declared {w}x{h}")
                # strict split mirrors decode_hash: every vcon (video
                # class, dupedb.py:88-90) → md5 regardless of frame
                # count; gif needs nf > 1 (dupedb.py:82)
                if cfg.strict and (row["fmt"] == "vcon" or nf > 1):
                    rec["proc_hash"] = rec["md5"]
                    rec["dhash"] = 0
                    rec["status"] = "md5_only"
                    rec["error"] = ("strict_media: video container"
                                    if row["fmt"] == "vcon"
                                    else "strict_media: multi-frame container")
                    out.append(rec)
                    continue
            else:
                img = codecs.decode_image(data, row["fmt"], w, h)
            bits_fn = (hashing.dhash_bits if cfg.hash_fn == "dhash"
                       else hashing.phash_bits)
            bits = bits_fn(img, cfg.hash_size)
            rec["proc_hash"] = hashing.bits_to_hex(bits)
            rec["dhash"] = (hashing.u64_to_i64(hashing.pack_bits_u64(bits))
                            if cfg.hash_size == 8 else 0)
            rec["status"] = "ok"
        except codecs.UnsupportedFormatError as e:
            # strict-mode media: md5 joins the same keyspace
            # (/root/reference/dupedb.py:82-101)
            rec["proc_hash"] = rec["md5"]
            rec["dhash"] = 0
            rec["status"] = "md5_only"
            rec["error"] = str(e)
            if row["fmt"] in ("mp4", "webm"):
                # mirror decode_hash: real frame count from the BMFF /
                # EBML walk when the payload parses; stub path otherwise
                meta_fn = (codecs.parse_mp4_meta if row["fmt"] == "mp4"
                           else codecs.parse_webm_meta)
                try:
                    rec["frames"] = meta_fn(data)[0]
                except codecs.CodecError:
                    pass
        except codecs.CodecError as e:
            rec["proc_hash"] = None
            rec["dhash"] = None
            rec["status"] = "error"
            rec["error"] = f"{type(e).__name__}: {e}"
        out.append(rec)
    return out


def _live_rows(rows: list[dict], cfg: PipelineConfig) -> list[dict]:
    """Rows in the dedup keyspace: decodable + md5-keyed media, minus the
    zero-hash poison bucket (int(hash, 16) == 0, dedupc.py:176-178)."""
    return [
        r for r in rows
        if r["status"] in ("ok", "md5_only")
        and not (cfg.skip_zero_hash and int(r["proc_hash"], 16) == 0)
    ]


def reference_clusters(rows: list[dict], cfg: PipelineConfig) -> dict[str, list[str]]:
    """Exact proc-hash buckets ≥ threshold, zero hash skipped.
    Key = the unified getProcHash keyspace (dHash hex | md5 hex)."""
    buckets: dict[str, list[str]] = {}
    for r in _live_rows(rows, cfg):
        buckets.setdefault(r["proc_hash"], []).append(r["image_id"])
    return {h: sorted(ids) for h, ids in buckets.items() if len(ids) >= cfg.threshold}


def reference_decisions(rows: list[dict], cfg: PipelineConfig) -> list[dict]:
    """Per bucket: keeper + deletions under the reference quality ranking."""
    by_id = {r["image_id"]: r for r in rows}
    out = []
    for h, ids in sorted(reference_clusters(rows, cfg).items()):
        ranked = sorted(
            ids,
            key=lambda i: keeper_sort_key(
                i, by_id[i].get("frames", 1), by_id[i]["pixels"],
                by_id[i]["filesize"]),
        )
        out.append({"proc_hash": h, "keeper": ranked[0], "deletions": ranked[1:]})
    return out


def verified_pairs(rows: list[dict], cfg: PipelineConfig) -> set[tuple[str, str]]:
    """All-pairs ground truth for the extended (LSH) mode: a pair is a dup if
    image Hamming ≤ hamming_max OR exact caption character-shingle Jaccard ≥
    jaccard_min — the same verify metric the pipeline applies to LSH
    candidates (MinHash banding only *proposes*; verification is exact).
    md5-keyed media pair by byte identity (equal md5) or caption Jaccard —
    never by the dhash channel (their dhash is 0)."""
    ok = _live_rows(rows, cfg)
    n = len(ok)
    ids = [r["image_id"] for r in ok]
    decodable = np.array([r["status"] == "ok" for r in ok], dtype=bool)
    md5s = [r["md5"] for r in ok]
    wide = cfg.hash_size != 8
    if wide:
        # hash_size != 8: the int64 dhash is a 0 sentinel; Hamming runs on
        # the hex fingerprint as an arbitrary-precision int (oracle scale)
        hv = [int(r["proc_hash"], 16) if r["status"] == "ok" else 0
              for r in ok]
    else:
        dh = np.array([hashing.i64_to_u64(r["dhash"]) for r in ok], dtype=np.uint64)
    shingles = [textfn.char_shingle_hashes(str(r["caption"] or ""), cfg.shingle_k) for r in ok]
    pairs: set[tuple[str, str]] = set()
    for i in range(n):
        if decodable[i] and wide:
            cand = {j for j in range(i + 1, n) if decodable[j]
                    and (hv[i] ^ hv[j]).bit_count() <= cfg.hamming_max}
        elif decodable[i]:
            ham = hashing.hamming_u64(
                np.full(n - i - 1, dh[i], dtype=np.uint64).view(np.int64),
                dh[i + 1 :].view(np.int64),
            )
            cand = set((np.where((ham <= cfg.hamming_max)
                                 & decodable[i + 1:])[0] + i + 1).tolist())
        else:
            cand = {j for j in range(i + 1, n)
                    if not decodable[j] and md5s[j] == md5s[i]}
        si = shingles[i]
        # an EMPTY caption is "no caption", never "equal to other empty
        # captions" — the caption channel is inert for it (same rule as
        # stages/banding.py, so captionless corpora don't mega-cluster)
        if str(ok[i]["caption"] or "") != "":
            for j in range(i + 1, n):
                if j in cand or str(ok[j]["caption"] or "") == "":
                    continue
                sj = shingles[j]
                # shingle arrays are never empty (char_shingle_hashes pads
                # short texts to one window), so plain Jaccard suffices
                inter = len(np.intersect1d(si, sj, assume_unique=True))
                jac = inter / (len(si) + len(sj) - inter)
                if jac >= cfg.jaccard_min:
                    cand.add(j)
        for j in cand:
            a, b = ids[i], ids[j]
            pairs.add((a, b) if a < b else (b, a))
    return pairs


def connected_components(pairs: set[tuple[str, str]]) -> dict[str, str]:
    """Union-find transitive closure; label = lexicographic min member."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in {n for p in pairs for n in p}}


def reference_clusters_hidealts(rows: list[dict], cfg: PipelineConfig) -> dict[str, list[str]]:
    """loadDuplicates with hide-alts (compare.py:519-560): a bucket survives
    iff its alt-suppressed member list still meets the threshold; surviving
    buckets keep FULL membership (the reference stores ``filelist``).

    Namespace scope: this golden uses the BUCKET as the smart-method
    search namespace (suppress_alt_members' default), matching the
    engine's default mode.  The reference globs the LIVE FILESYSTEM, so
    a series base outside the bucket can change a verdict — the engine
    surfaces that mode as ``namespace='corpus'``
    (pipelines/image_dedup.py); goldens for it must pass the full id
    universe here explicitly."""
    from deduplicator_ray.stages.alts import suppress_alt_members

    out = {}
    for h, ids in reference_clusters(rows, cfg).items():
        if len(suppress_alt_members(ids)) >= cfg.threshold:
            out[h] = ids
    return out
