"""Keeper-election ranking: the reference's quality/dir/name sort tuples.

Reproduces, as pure functions of table columns, the reference's ranking
(/root/reference/dedupc.py:62-96):

- ``image_sort_tuple``  — ``makeImageSortTuple``: (-frames, -pixels,
  -filesize, -filesize/pixels); more frames / higher res / bigger file /
  denser file wins (dedupc.py:62-68).
- ``dir_sort_tuple``    — ``makeDirSortTuple``: (-Σ good-word counts,
  +Σ bad-word counts, -len(path up to last '/')) over the lowercased
  dirname (dedupc.py:70-77).  NOTE the reference's third element is the
  *string length* of ``x[:x.rfind(sep)]`` — when there is no separator this
  is ``len(x)-1``; reproduced bug-for-bug.
- ``name_sort_tuple``   — ``makeNameSortTuple``: (+is_36hex_hash_name,
  -Σ good, +Σ bad, -Σ counts of chars '-','_',' ','+', +is_series_suffix
  " (n).") over the lowercased basename (dedupc.py:79-88).

The reference breaks ties by list order (Python sort stability over db
insertion order); this engine breaks ties deterministically by ``image_id``
— the one documented divergence (distributed execution has no stable
insertion order).

Keeper = argmin of (image_tuple, dir_tuple, name_tuple, image_id), exactly
the non-interactive branch of ``getDuplicatesToDelete``
(/root/reference/dedupc.py:211-218: keep first under makeImageSortTuple).
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np

_HEX36_RE = re.compile(r"^[0-9a-f]{36}\.")  # dedupc.py:83
_SERIES_RE = re.compile(r" \(\d+\)\.")      # dedupc.py:87
_PUNCT = "-_ +"                             # dedupc.py:86

# The FULL series-pattern set of getSeriesInfo
# (/root/reference/compare.py:79-92), in the reference's priority order.
# Applied to the filename STEM (no extension).  This is the M12 operator —
# distinct from the narrow " (n)." flag that feeds makeNameSortTuple (M8).
_SERIES_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"_(\d+)$"), "_<#>"),
    (re.compile(r"-(\d+)$"), "-<#>"),
    (re.compile(r" (\d+)$"), " <#>"),
    (re.compile(r"\((\d+)\)$"), "(<#>)"),
    (re.compile(r"_p(\d+)$"), "_p<#>"),
    (re.compile(r"_img(\d+)$"), "_img<#>"),
    (re.compile(r"-img(\d+)$"), "-img<#>"),
    (re.compile(r"-alt(\d*)$"), "-alt<#>"),
    (re.compile(r" edit$"), " edit<#>"),
    (re.compile(r"(?<=[a-zA-Z])(\d)$"), "<#>"),
]


def series_info(stem: str) -> tuple[int, str] | None:
    """``getSeriesInfo`` (compare.py:77-105): first matching pattern wins;
    the captured number (default 1 when the group is empty/absent, e.g.
    ``-alt``/`` edit``) must be ≤ 1000; returns (no, style) where style has
    the number replaced by ``<#>``."""
    for pat, stylem in _SERIES_PATTERNS:
        m = pat.search(stem)
        if m:
            try:
                i = int(m.groups()[0])
            except (IndexError, ValueError, TypeError):
                i = 1
            if i > 1000:
                continue
            return i, pat.sub(stylem, stem)
    return None


def split_path(image_id: str) -> tuple[str, str]:
    """os.path.split with '/' separator (image_id is path-shaped by fixture design)."""
    idx = image_id.rfind("/")
    if idx < 0:
        return "", image_id
    return image_id[:idx], image_id[idx + 1 :]


def image_sort_tuple(frames: int, pixels: int, filesize: int) -> tuple:
    pixels = max(pixels, 1)
    return (-frames, -pixels, -filesize, -(filesize / pixels))


def dir_sort_tuple(image_id: str, good_words: Sequence[str] = (), bad_words: Sequence[str] = ()) -> tuple:
    dirs = split_path(image_id)[0].lower()
    return (
        -sum(dirs.count(w.lower()) for w in good_words),
        +sum(dirs.count(w.lower()) for w in bad_words),
        -len(image_id[: image_id.rfind("/")]),  # reference quirk: len(x)-1 when no sep
    )


def name_sort_tuple(image_id: str, good_words: Sequence[str] = (), bad_words: Sequence[str] = ()) -> tuple:
    name = split_path(image_id)[1].lower()
    return (
        +int(bool(_HEX36_RE.match(name))),
        -sum(name.count(w.lower()) for w in good_words),
        +sum(name.count(w.lower()) for w in bad_words),
        -sum(name.count(c) for c in _PUNCT),
        +int(bool(_SERIES_RE.search(name))),
    )


def full_sort_key(
    image_id: str,
    frames: int,
    pixels: int,
    filesize: int,
    good_dirs: Sequence[str] = (),
    bad_dirs: Sequence[str] = (),
    good_names: Sequence[str] = (),
    bad_names: Sequence[str] = (),
) -> tuple:
    """makeSortTupleAll (dedupc.py:91-96) + deterministic image_id tie-break."""
    return (
        image_sort_tuple(frames, pixels, filesize),
        dir_sort_tuple(image_id, good_dirs, bad_dirs),
        name_sort_tuple(image_id, good_names, bad_names),
        image_id,
    )


def keeper_sort_key(image_id: str, frames: int, pixels: int, filesize: int) -> tuple:
    """The delete-pipeline keeper order: image quality tuple only, as in
    getDuplicatesToDelete (dedupc.py:180), with image_id tie-break."""
    return (*image_sort_tuple(frames, pixels, filesize), image_id)


# ---------------------------------------------------------------------------
# vectorized column derivations (used inside map_batches projections)


def rank_columns(
    image_ids: np.ndarray,
    frames: np.ndarray,
    pixels: np.ndarray,
    filesizes: np.ndarray,
    good_dirs: Sequence[str] = (),
    bad_dirs: Sequence[str] = (),
    good_names: Sequence[str] = (),
    bad_names: Sequence[str] = (),
) -> dict[str, np.ndarray]:
    """Derive the rank-feature columns for a batch.

    String features use a Python loop over ids (ids are short; regex+count is
    C-speed) — the numeric features are pure numpy.  Emitted as columns so
    the per-cluster argmin in resolve() is a vectorized lexsort.
    """
    n = len(image_ids)
    pixels = np.maximum(np.asarray(pixels, dtype=np.int64), 1)
    filesizes = np.asarray(filesizes, dtype=np.int64)
    density = filesizes.astype(np.float64) / pixels

    dir_good = np.zeros(n, np.int32)
    dir_bad = np.zeros(n, np.int32)
    dir_len = np.zeros(n, np.int32)
    name_hex = np.zeros(n, np.int8)
    name_good = np.zeros(n, np.int32)
    name_bad = np.zeros(n, np.int32)
    name_punct = np.zeros(n, np.int32)
    name_series = np.zeros(n, np.int8)

    gd = [w.lower() for w in good_dirs]
    bd = [w.lower() for w in bad_dirs]
    gn = [w.lower() for w in good_names]
    bn = [w.lower() for w in bad_names]

    for i, iid in enumerate(image_ids):
        iid = str(iid)
        d, nm = split_path(iid)
        dl, nl = d.lower(), nm.lower()
        dir_good[i] = sum(dl.count(w) for w in gd)
        dir_bad[i] = sum(dl.count(w) for w in bd)
        dir_len[i] = len(iid[: iid.rfind("/")])
        name_hex[i] = 1 if _HEX36_RE.match(nl) else 0
        name_good[i] = sum(nl.count(w) for w in gn)
        name_bad[i] = sum(nl.count(w) for w in bn)
        name_punct[i] = sum(nl.count(c) for c in _PUNCT)
        name_series[i] = 1 if _SERIES_RE.search(nl) else 0

    return {
        "rk_frames": np.asarray(frames, np.int32),
        "rk_pixels": pixels.astype(np.int64),
        "rk_filesize": filesizes,
        "rk_density": density,
        "rk_dir_good": dir_good,
        "rk_dir_bad": dir_bad,
        "rk_dir_len": dir_len,
        "rk_name_hex": name_hex,
        "rk_name_good": name_good,
        "rk_name_bad": name_bad,
        "rk_name_punct": name_punct,
        "rk_name_series": name_series,
    }


RANK_COLUMNS = [
    "rk_frames", "rk_pixels", "rk_filesize", "rk_density",
    "rk_dir_good", "rk_dir_bad", "rk_dir_len",
    "rk_name_hex", "rk_name_good", "rk_name_bad", "rk_name_punct", "rk_name_series",
]
