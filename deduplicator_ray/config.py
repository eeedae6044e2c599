"""Pipeline configuration.

The reference threads its config through CLI flags and encodes the one
load-bearing parameter (hash size) in the database *filename*
(``name.s12`` — /root/reference/dupedb.py:120-128, dedupc.py:670).  Here the
config is an explicit dataclass whose digest is recorded in every lineage
manifest so resume can detect config drift (SURVEY.md §7.4.5).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- image hashing (reference: --hashsize, /root/reference/dedupc.py:586,598-600)
    hash_size: int = 8              # 8 → 64-bit dHash packed into the phash:int64 column
    hash_fn: str = "dhash"          # pluggable perceptual hash: dhash | phash
                                    # (the reference is dHash-only via imagehash;
                                    # pHash is the engine's pluggable alternative,
                                    # SURVEY.md §2.10)
    strict: bool = True             # strict mode: animations/videos md5-matched (dupedb.py:82-90)
    # stubbed-codec policy (codecs.CODEC_CAPABILITIES): 'md5' = stub
    # formats join the md5 proc_hash keyspace (reference non-image branch,
    # dupedb.py:100-101 — the default, byte-identical media still dedup);
    # 'dead_letter' = they land in the badfiles table with
    # error=unsupported_codec so nothing is hashed a human didn't opt
    # into.  Recorded in every manifest via config_hash.
    unsupported_codec_policy: str = "md5"

    # --- duplicate grouping
    threshold: int = 2              # min bucket size to report (dupedb.py:331; dedupc.py:175)
    skip_zero_hash: bool = True     # poison bucket int(hash)==0 skipped (dedupc.py:176-178)

    # --- caption signatures (graft axis B; config recorded for the recall gate)
    shingle_k: int = 5              # character shingle width
    num_perm: int = 128             # MinHash permutations
    bands: int = 16                 # LSH bands
    rows_per_band: int = 8          # num_perm == bands * rows_per_band
    simhash_bits: int = 64

    # --- verification thresholds
    hamming_max: int = 4            # image dHash Hamming radius for near-dup verify
    jaccard_min: float = 0.8        # caption MinHash Jaccard threshold

    # --- skew / scale controls (SURVEY.md §7.4)
    band_group_cap: int = 256       # max members considered per LSH bucket; extras
                                    # deterministically sampled + logged, never silent
    img_rep_cap: int = 8192         # rep-verify width for hot image buckets after
                                    # exact-hash collapse (Hamming verify is a
                                    # vectorized popcount — 8k² ≈ 67M ops ≈ cheap)
    salt_buckets: int = 8           # sub-buckets for salted hot bands

    # --- connected components (iterative edge contraction, stages/components.py)
    cc_max_rounds: int = 16         # max contraction levels (node count ≥ halves per level)
    cc_driver_edge_cap: int = 2_000_000  # residual graph ≤ this → driver union-find base case

    # --- source filtering (reference --files-exempt, dedupc.py:687-691)
    files_exempt: tuple[str, ...] = ()  # drop ids containing any substring

    # --- decision-table explain output (explainSort, dedupc.py:99-106)
    explain: bool = False           # attach per-bucket ranking explanation

    # --- keeper ranking word lists (reference criteria dict, dedupc.py:663-668)
    good_words: tuple[str, ...] = ()
    bad_words: tuple[str, ...] = ()
    good_names: tuple[str, ...] = ()
    bad_names: tuple[str, ...] = ()

    # --- execution knobs
    # batch_size None = per-block batches: an explicit batch_size BREAKS
    # Ray's read→map operator fusion, forcing the multi-GB bytes column
    # through an extra object-store materialization (measured 131 s vs
    # 46 s fused on the 14 GB sfimg corpus).  Block size (target_max_block
    # _size) bounds per-task memory instead.
    decode_batch_size: int | None = None
    text_batch_size: int | None = None

    def config_hash(self) -> str:
        """Stable digest of all semantic parameters, stamped into manifests."""
        blob = json.dumps(asdict(self), sort_keys=True, default=list)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if self.unsupported_codec_policy not in ("md5", "dead_letter"):
            raise ValueError(
                "unsupported_codec_policy must be 'md5' or 'dead_letter', "
                f"got {self.unsupported_codec_policy!r}"
            )


DEFAULT_CONFIG = PipelineConfig()
