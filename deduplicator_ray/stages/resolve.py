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

import pyarrow as pa

from deduplicator_ray.config import PipelineConfig
from deduplicator_ray.stages.ranking import split_path

# out_schema for partitioned_groupby: empty partitions keep the decision
# table's exact Arrow schema
DECISION_SCHEMA = pa.schema([
    ("cluster_id", pa.string()), ("image_id", pa.string()),
    ("action", pa.string()), ("rename_to", pa.string()),
    ("dest_path", pa.string()),
])

_EXPLAIN_HEADER = ("image(-frames, -res, -size, -density), "
                   "path(-good, +bad, -depth), "
                   "name(-hash, -good, +bad, -punctuation, +number, )")


def decision_schema(cfg: PipelineConfig) -> pa.Schema:
    if cfg.explain:
        return DECISION_SCHEMA.append(pa.field("explain", pa.string()))
    return DECISION_SCHEMA


def _explain_sort(g: pd.DataFrame) -> str:
    """``explainSort`` (M10, /root/reference/dedupc.py:99-106): the ranking
    header plus one '{sort_tuple}\\t| {path}' line per member, in quality
    order — answers "why was X deleted?" from the decision table alone."""
    lines = [_EXPLAIN_HEADER]
    for _, row in g.iterrows():
        tup = ((-int(row["rk_frames"]), -int(row["rk_pixels"]),
                -int(row["rk_filesize"]), -float(row["rk_density"])),
               (-int(row["rk_dir_good"]), int(row["rk_dir_bad"]),
                -int(row["rk_dir_len"])),
               (int(row["rk_name_hex"]), -int(row["rk_name_good"]),
                int(row["rk_name_bad"]), -int(row["rk_name_punct"]),
                int(row["rk_name_series"])))
        lines.append(f"{tup}\t| {row['image_id']} ")
    return "\n".join(lines)

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


def _split_cols(ids: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized split_path: (dir, name) on the last '/'."""
    parts = ids.str.rpartition("/")
    return parts[0], parts[2]


def make_partition_resolve(cfg: PipelineConfig, cluster_col: str = "cluster_id",
                           with_superstate: bool = False):
    """Partition-level wrapper: one Python call per key-partition, the
    whole election VECTORIZED across every cluster in the partition (no
    per-cluster Python, no iterrows — a mega-cluster costs sorts, not row
    loops).  ``cfg.explain`` falls back to the per-cluster loop (debug
    output is per-row string formatting by nature)."""
    resolve = make_resolve(cfg, cluster_col, with_superstate)

    def loop_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs = [resolve(g) for _, g in df.groupby(cluster_col, sort=False)]
        if not outs:
            return resolve(df.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    if cfg.explain:
        return loop_partition

    def resolve_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=str) for c in
                              ("cluster_id", "image_id", "action",
                               "rename_to", "dest_path")})
        if df.empty:
            return empty
        sizes = df.groupby(cluster_col, sort=False)[cluster_col].transform("size")
        df = df[sizes >= cfg.threshold]
        if df.empty:
            return empty

        cols = [c for c, _ in _IMAGE_ORDER]
        asc = [a for _, a in _IMAGE_ORDER]
        q = df.sort_values([cluster_col] + cols, ascending=[True] + asc,
                           kind="mergesort").reset_index(drop=True)
        grp = q.groupby(cluster_col, sort=False)
        is_keeper = grp.cumcount() == 0
        bucket_size = grp[cluster_col].transform("size")
        ids = q["image_id"].astype(str)

        # rename target (keeper only, '!'-exempt — dedupc.py:310-320)
        has_dot = ids.str.contains(".", regex=False)
        ext = ids.str.rsplit(".", n=1).str[-1].where(has_dot, "")
        rename = q["proc_hash"].astype(str) + \
            ("_" + q["crc32"].astype(str)).where(bucket_size > 1, "") + \
            "." + ext
        exempt = ids.str.contains("!", regex=False)
        rename_to = rename.where(is_keeper & ~exempt, "")

        dest = pd.Series("", index=q.index)
        if with_superstate:
            dirs, names = _split_cols(ids)
            keep = q[is_keeper.to_numpy()]
            k_ids = keep["image_id"].astype(str)
            k_dir, k_name = _split_cols(k_ids)
            per = keep[[cluster_col]].copy().reset_index(drop=True)
            per["k_dir"], per["k_name"] = k_dir.to_numpy(), k_name.to_numpy()
            per["k_ext"] = k_ids.str.rsplit(".", n=1).str[-1].to_numpy()

            for order, which in ((_DIR_ORDER, "dir"), (_NAME_ORDER, "name")):
                ocols = [c for c, _ in order]
                oasc = [a for _, a in order]
                s = q.sort_values([cluster_col] + ocols,
                                  ascending=[True] + oasc, kind="mergesort")
                first = s.groupby(cluster_col, sort=False).head(1)
                b_ids = first["image_id"].astype(str)
                b_dir, b_name = _split_cols(b_ids)
                per[f"b_{which}_dir"] = b_dir.to_numpy()
                per[f"b_{which}_name"] = b_name.to_numpy()
                # tie-break override toward the keeper (dedupc.py:502-515):
                # identical sort key (all order cols except the id
                # tie-break) → the keeper's own dir/name wins
                kk = keep[ocols[:-1]].reset_index(drop=True)
                bb = first[ocols[:-1]].reset_index(drop=True)
                per[f"tie_{which}"] = (kk.to_numpy() == bb.to_numpy()).all(axis=1)

            b_dir = per["b_dir_dir"].where(
                ~(per["tie_dir"] & (per["k_dir"] != per["b_dir_dir"])), per["k_dir"])
            b_name = per["b_name_name"].where(
                ~(per["tie_name"] & (per["k_name"] != per["b_name_name"])), per["k_name"])
            stem = b_name.str.rsplit(".", n=1).str[0]
            dest_per = (b_dir + "/").where(b_dir != "", "") + stem + "." + per["k_ext"]
            dest_map = dict(zip(per[cluster_col], dest_per))
            dest = q[cluster_col].map(dest_map).where(is_keeper, "")

        return pd.DataFrame({
            "cluster_id": q[cluster_col].astype(str),
            "image_id": ids,
            "action": pd.Series(np.where(is_keeper, "keep", "delete"), index=q.index),
            "rename_to": rename_to,
            "dest_path": dest,
        })

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
        if cfg.explain:
            out_cols["explain"] = []
        if len(g) < cfg.threshold:
            return pd.DataFrame(out_cols).astype(
                {c: str for c in out_cols})
        cid = str(g[cluster_col].iloc[0])
        by_quality = _argsort(g, _IMAGE_ORDER)
        explain_text = _explain_sort(by_quality) if cfg.explain else None
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
            if cfg.explain:
                # keeper row carries the bucket's full ranking explanation
                # (the reference prints it per bucket, dedupc.py:182-184)
                out_cols["explain"].append(explain_text if idx == 0 else "")
        return pd.DataFrame(out_cols)

    return resolve
