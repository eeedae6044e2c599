"""Known-alts suppression (D4) — the GUI's hide-alts bucket filter.

Reproduces ``MainWindow.loadDuplicates``'s alt-member removal
(/root/reference/compare.py:527-560): before a bucket is shown/thresholded,
members that are series-alternates of another member are dropped —

1. **string-stub method**: member is dropped when another member's stem is a
   prefix-truncation of its stem within 12 trailing characters (the quick
   heuristic, compare.py:531-540);
2. **smart method**: ``findBaseFileForPath`` (compare.py:136-173) — a
   previous-in-series probe (``style.replace('<#>', i-1)`` + known image
   extension) and a common-base glob over a candidate namespace; the member
   is dropped iff the found base is still in the bucket.

then the bucket is re-thresholded (compare.py:550,559).

Faithfulness notes (bug-for-bug):
- the previous-in-series branch returns the base *stem* (no extension),
  which the reference then membership-tests against full paths WITH
  extensions — so that branch never removes anything; reproduced as-is;
- the first common-base glob pattern is ``[-_ ][\\d+]$`` — a character
  CLASS of digit-or-plus matching exactly one character, not ``\\d+``;
  reproduced as-is;
- glob runs over the live filesystem in the reference.  Here the namespace
  is the table: callers pass the bucket's own ids (default) or a corpus id
  list (broadcast at sandbox scale; the 10^12-row path derives a
  ``series_style`` key column and self-joins instead — same decision,
  shuffle-shaped).  Ordering of "glob" results is sorted-id (the reference
  inherits filesystem order — documented divergence).
"""

from __future__ import annotations

import fnmatch
import os
import re

from deduplicator_ray.stages.ranking import series_info

MATCH_EXTS = [".jpg", ".gif", ".webm", ".png"]  # compare.py:30

_COMMON_BASE_PATTERNS = [
    (r"[-_ ][\d+]$", r"*"),
    (r"[-_ ]alt$", r"*"),
    (r"[-_ ]edit$", r"*"),
    (r" otm$", r"*"),
    (r" otn$", r"*"),
    (r"(\\\w+\-pn_\d+_)[^\\]+$", r"\g<1>*"),
]  # compare.py:155-162


def find_base_for_path(path: str, namespace: list[str]) -> str | bool:
    """``findBaseFileForPath`` over a table namespace instead of the live
    filesystem.  Returns the base id (or stem — see module notes) or False."""
    name = os.path.splitext(path)[0]
    ns_set = set(namespace)

    info = series_info(name)
    if info:
        i, style = info
        prev_base_name = style.replace("<#>", str(i - 1))
        if prev_base_name != name:
            for ext in MATCH_EXTS:
                if prev_base_name + ext in ns_set:
                    return prev_base_name  # stem, not a path — see notes

    for pattern, sub in _COMMON_BASE_PATTERNS:
        if re.search(pattern, name):
            pat = re.sub(pattern, sub, name)
            g = sorted(x for x in namespace if fnmatch.fnmatchcase(x, pat))
            if len(g) > 1:
                return g[0]
    return False


def suppress_alt_members(filelist: list[str],
                         namespace: list[str] | None = None) -> list[str]:
    """Drop series-alt members from one bucket (compare.py:527-548).
    ``namespace`` is the id universe the smart method searches (defaults to
    the bucket itself).  Returns the surviving members in input order."""
    ns = namespace if namespace is not None else filelist
    base_names = {os.path.splitext(p)[0] for p in filelist}
    out = list(filelist)
    for filename in filelist:
        stem = os.path.splitext(filename)[0]
        stub = stem[:-12]
        L = len(stem)
        if any(n.startswith(stub) and len(n) <= L and len(n) > L - 12
               for n in base_names.difference({stem})):
            out.remove(filename)
            base_names.remove(stem)
            continue
        base = find_base_for_path(filename, ns)
        if base in out:
            out.remove(filename)
    return out
