"""P7 — per-cluster resolution: keeper election + action/decision table.

Reproduces the non-interactive resolution of the reference:

- keeper = first member under the quality sort
  (``getDuplicatesToDelete``, /root/reference/dedupc.py:180, 211-218);
- every other member → ``delete`` (the reference moves to Trash — S8; we
  emit a decision row, materializing deletions is the caller's job);
- rename target ``{hash}[_{CRC32}].{ext}`` (``renameFilesFromDb``,
  /root/reference/dedupc.py:316-320: the CRC32 suffix is added when the
  bucket has >1 member); rows whose id contains ``"!"`` are exempt from
  rename (dedupc.py:310-311 → M15);
- full SuperState best-dir/best-name election (``getSuperState``,
  dedupc.py:475-568): best image keeps its pixels, but its *destination
  path* is composed from the independently-elected best dir + best name,
  with the reference's tie-break overrides.

Clusters are small (duplicate buckets), so per-group work is a pandas
lexsort inside ``map_groups`` — no global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.ranking import split_path

# lexicographic order of the reference tuples, expressed as (column, ascending)
_IMAGE_ORDER = [
    ("rk_frames", False),   # -frames
    ("rk_pixels", False),   # -pixels
    ("rk_filesize", False), # -filesize
    ("rk_density", False),  # -density
    ("image_id", True),     # deterministic tie-break (documented divergence)
]
_DIR_ORDER = [
    ("rk_dir_good", False),
    ("rk_dir_bad", True),
    ("rk_dir_len", False),
    ("image_id", True),
]
_NAME_ORDER = [
    ("rk_name_hex", True),
    ("rk_name_good", False),
    ("rk_name_bad", True),
    ("rk_name_punct", False),
    ("rk_name_series", True),
    ("image_id", True),
]


def _argsort(g: pd.DataFrame, order) -> pd.DataFrame:
    cols = [c for c, _ in order]
    asc = [a for _, a in order]
    return g.sort_values(cols, ascending=asc, kind="mergesort")


def make_partition_resolve(cfg: PipelineConfig, cluster_col: str = "cluster_id",
                           with_superstate: bool = False):
    """Partition-level wrapper: one Python call per key-partition, looping
    the per-cluster election over the (pre-threshold-filtered) clusters in
    the partition — avoids Ray map_groups' per-group overhead when the
    cluster count is large (see stages/partitioned.py)."""
    resolve = make_resolve(cfg, cluster_col, with_superstate)

    def resolve_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs = [resolve(g) for _, g in df.groupby(cluster_col, sort=False)]
        if not outs:
            return resolve(df.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return resolve_partition


def make_resolve(cfg: PipelineConfig, cluster_col: str = "cluster_id",
                 with_superstate: bool = False):
    """Group fn for ``groupby(cluster_col).map_groups``.

    Input rows need: image_id, proc_hash, crc32, rk_* columns.
    Output decision rows: (cluster_id, image_id, action, rename_to, dest_path).
    """

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            "cluster_id": [], "image_id": [], "action": [],
            "rename_to": [], "dest_path": [],
        }
        if len(g) < cfg.threshold:
            return pd.DataFrame(out_cols).astype(
                {"cluster_id": str, "image_id": str, "action": str,
                 "rename_to": str, "dest_path": str})
        cid = str(g[cluster_col].iloc[0])
        by_quality = _argsort(g, _IMAGE_ORDER)
        keeper = by_quality.iloc[0]
        bucket_size = len(g)

        dest = ""
        if with_superstate:
            best_dir_row = _argsort(g, _DIR_ORDER).iloc[0]
            best_name_row = _argsort(g, _NAME_ORDER).iloc[0]
            # tie-break overrides toward the keeper (dedupc.py:502-515)
            k_name_key = tuple(keeper[c] for c, _ in _NAME_ORDER[:-1])
            b_name_key = tuple(best_name_row[c] for c, _ in _NAME_ORDER[:-1])
            if (split_path(keeper["image_id"])[1] != split_path(best_name_row["image_id"])[1]
                    and k_name_key == b_name_key):
                best_name_row = keeper
            k_dir_key = tuple(keeper[c] for c, _ in _DIR_ORDER[:-1])
            b_dir_key = tuple(best_dir_row[c] for c, _ in _DIR_ORDER[:-1])
            if (split_path(keeper["image_id"])[0] != split_path(best_dir_row["image_id"])[0]
                    and k_dir_key == b_dir_key):
                best_dir_row = keeper
            best_dir = split_path(best_dir_row["image_id"])[0]
            best_name = split_path(best_name_row["image_id"])[1]
            stem = best_name.rsplit(".", 1)[0]
            keeper_ext = keeper["image_id"].rsplit(".", 1)[-1]
            dest = (best_dir + "/" if best_dir else "") + stem + "." + keeper_ext

        for idx, (_, row) in enumerate(by_quality.iterrows()):
            iid = row["image_id"]
            action = "keep" if idx == 0 else "delete"
            rename_to = ""
            if idx == 0 and "!" not in iid:
                ext = iid.rsplit(".", 1)[-1] if "." in iid else ""
                suffix = f"_{row['crc32']}" if bucket_size > 1 else ""
                # rename target uses the proc hash — md5 for strict-mode
                # media, dHash hex for images (dedupc.py:316-320 formats
                # whatever getProcHash returned)
                rename_to = f"{row['proc_hash']}{suffix}.{ext}"
            out_cols["cluster_id"].append(cid)
            out_cols["image_id"].append(iid)
            out_cols["action"].append(action)
            out_cols["rename_to"].append(rename_to)
            out_cols["dest_path"].append(dest if idx == 0 else "")
        return pd.DataFrame(out_cols)

    return resolve
