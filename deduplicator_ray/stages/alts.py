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

import os
import re

from deduplicator_ray.stages.ranking import series_info, split_path

MATCH_EXTS = [".jpg", ".gif", ".webm", ".png"]  # compare.py:30

_COMMON_BASE_PATTERNS = [
    (r"[-_ ][\d+]$", r"*"),
    (r"[-_ ]alt$", r"*"),
    (r"[-_ ]edit$", r"*"),
    (r" otm$", r"*"),
    (r" otn$", r"*"),
    (r"(\\\w+\-pn_\d+_)[^\\]+$", r"\g<1>*"),
]  # compare.py:155-162


from functools import lru_cache


@lru_cache(maxsize=4096)
def _glob_like(pat: str) -> "re.Pattern[str]":
    """Compile a common-base pattern with filesystem-glob semantics:
    every non-* char literal (incl. brackets), * confined to one path
    segment.  lru-bounded — the patterns embed each member's own stem, so
    an unbounded dict would grow one entry per series family for the
    worker's lifetime."""
    return re.compile("[^/]*".join(re.escape(p) for p in pat.split("*"))
                      + r"\Z")


def find_base_for_path(path: str, namespace: list[str],
                       ns_set: "set[str] | None" = None,
                       ns_sorted=None) -> str | bool:
    """``findBaseFileForPath`` over a table namespace instead of the live
    filesystem.  Returns the base id (or stem — see module notes) or False.

    ``ns_set`` / ``ns_sorted``: optional precomputed views of
    ``namespace`` (a membership set and a sorted numpy array) so a caller
    iterating a whole bucket against a corpus-sized namespace builds them
    ONCE instead of per member — every common-base pattern reduces to a
    prefix range over the sorted view (glob's ``*`` is the pattern tail),
    an O(log n) searchsorted instead of an O(n) scan."""
    import numpy as np

    name = os.path.splitext(path)[0]
    if ns_set is None:
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
            # GLOB semantics, not fnmatch: the reference escapes [ ] before
            # glob.glob (compare.py:164) so brackets are LITERAL, and
            # glob's * never crosses '/' — fnmatch would interpret
            # brackets as character classes (missing literal-bracket ids)
            # and let * match into subdirectories (spurious suppressions),
            # making this broadcast path disagree with the self-join path
            # (derive_probes), which already matches glob semantics.
            if (ns_sorted is not None and pat.endswith("*")
                    and "*" not in pat[:-1]):
                # prefix form (every _COMMON_BASE_PATTERNS sub is a tail
                # *): sorted-range lookup, then the no-'/'-in-suffix test
                # that [^/]*\Z encodes
                pre = pat[:-1]
                lo = np.searchsorted(ns_sorted, pre, "left")
                hi = np.searchsorted(ns_sorted, pre + "\U0010ffff", "left")
                g = [x for x in ns_sorted[lo:hi]
                     if "/" not in x[len(pre):]]
            else:
                rx = _glob_like(pat)
                g = sorted(x for x in namespace if rx.match(x))
            if len(g) > 1:
                return g[0]
    return False


def suppress_alt_members(filelist: list[str],
                         namespace: list[str] | None = None) -> list[str]:
    """Drop series-alt members from one bucket (compare.py:527-548).
    ``namespace`` is the id universe the smart method searches (defaults to
    the bucket itself).  Returns the surviving members in input order."""
    import numpy as np

    ns = namespace if namespace is not None else filelist
    ns_set = set(ns)
    ns_sorted = np.sort(np.asarray(ns, dtype=str)) if len(ns) > 64 else None
    base_names = {os.path.splitext(p)[0] for p in filelist}
    out = list(filelist)
    for filename in filelist:
        stem = os.path.splitext(filename)[0]
        stub = stem[:-12]
        L = len(stem)
        if any(n.startswith(stub) and len(n) <= L and len(n) > L - 12
               for n in base_names.difference({stem})):
            out.remove(filename)
            base_names.discard(stem)  # two members can share a stem
            continue
        base = find_base_for_path(filename, ns, ns_set=ns_set,
                                  ns_sorted=ns_sorted)
        if base in out:
            out.remove(filename)
    return out


# ---------------------------------------------------------------------------
# J4 — the corpus-scale series-base SELF-JOIN (the 10^12-row path promised in
# the module notes above: no broadcast, no live-filesystem glob)

_PRIO_SERIES = 1    # + MATCH_EXTS index        (series_prev probes)
_PRIO_PREFIX = 10   # + _COMMON_BASE_PATTERNS index (common-base probes)


def derive_probes(image_id: str) -> tuple[list[tuple[int, str]],
                                          list[tuple[int, str]]]:
    """Per-id probe derivation for ``series_alt_pairs`` — the pure string
    kernel of ``findBaseFileForPath`` (/root/reference/compare.py:136-173),
    restated as join keys:

    * eq probes: the previous-in-series id ``style.replace('<#>', i-1)`` +
      each known extension — an EQUALITY join key against the corpus.
      (Intended semantics: the probe matches a full id.  The reference's
      stem-vs-path bug that makes this branch a no-op is preserved verbatim
      in ``find_base_for_path`` above; this operator implements the lookup
      the reference meant to do.)
    * prefix probes: each common-base glob pattern's prefix (every sub ends
      with ``*``) — a PREFIX match against ids in the same directory (the
      reference globs the filesystem, and glob's ``*`` does not cross /).

    Returns ([(prio, full_id_key)], [(prio, prefix)]); lower prio wins,
    mirroring the reference's first-success-wins probe order.
    """
    stem = os.path.splitext(image_id)[0]
    eq: list[tuple[int, str]] = []
    pre: list[tuple[int, str]] = []
    info = series_info(stem)
    if info:
        i, style = info
        prev = style.replace("<#>", str(i - 1))
        if prev != stem:
            for e_idx, ext in enumerate(MATCH_EXTS):
                eq.append((_PRIO_SERIES + e_idx, prev + ext))
    for p_idx, (pattern, sub) in enumerate(_COMMON_BASE_PATTERNS):
        if re.search(pattern, stem):
            pat = re.sub(pattern, sub, stem)
            if pat.endswith("*"):
                pre.append((_PRIO_PREFIX + p_idx, pat[:-1]))
    return eq, pre


_EXT_RE = re.compile(r"\.[^./]*$")


def alt_path_of(image_id: str, taken: "set[str]") -> str:
    """Single-row ``altPathOf`` (M13, /root/reference/compare.py:107-134)
    against a table namespace instead of the live filesystem: the next
    FREE series path for ``image_id`` given the set of ids in its
    directory.  Semantics reproduced:

      * stem/ext split on the last dot of the final segment (the
        mirrors.py regex convention — matches os.path.splitext everywhere
        the fixtures reach);
      * series style via ``series_info`` (the full getSeriesInfo pattern
        set); non-series ids get the reference default ``stem + " (<#>)"``;
      * the candidate index starts at the member's own series number and
        bumps while the formed path is the member itself or an EXISTING id
        — existence is exact string membership (the isfile probe), NOT
        same-style membership: ``"x edit12.png"`` occupies style
        ``"x edit<#>"`` slot 12 even though it parses to a different
        style itself.

    Documented divergences: the reference asserts after 100 occupied
    probes (a live-FS pathology guard) — a table namespace is finite so
    the search always terminates and no cap is needed; and its
    ``os.path.join(dirname, style...)`` re-join is an identity for the
    absolute paths it walks, so the formed path here is simply
    ``style.replace('<#>', i) + ext``."""
    m = _EXT_RE.search(image_id)
    ext = m.group(0) if m else ""
    stem = image_id[: m.start()] if m else image_id
    si = series_info(stem)
    if si:
        i, style = si
    else:
        i, style = 1, stem + " (<#>)"
    formed = style.replace("<#>", str(i)) + ext
    while formed == image_id or formed in taken:
        i += 1
        formed = style.replace("<#>", str(i)) + ext
    return formed


def alt_paths(ids_ds, num_partitions: int = 64):
    """(image_id, alt_path) for EVERY id — the distributed ``altPathOf``
    (closes M13).  One dirname-partitioned groupby: a directory's ids are
    co-located (the same partitioning assumption as the series/glob
    channels of ``series_alt_pairs`` — formed paths never leave the
    member's directory because the style embeds it), so existence probes
    are an in-partition set lookup and the sequential next-free search is
    a tiny per-member loop bounded by the directory's population."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    key_schema = pa.schema([("dir", pa.string()),
                            ("image_id", pa.string())])

    def add_dir(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        return pa.Table.from_pydict(
            {"dir": [split_path(i)[0] for i in ids], "image_id": ids},
            schema=key_schema)

    out_schema = pa.schema([("image_id", pa.string()),
                            ("alt_path", pa.string())])

    def per_dir(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_alt = [], []
        for _, g in df.groupby("dir", sort=False):
            ids = g["image_id"].tolist()
            taken = set(ids)
            for iid in ids:
                out_id.append(iid)
                out_alt.append(alt_path_of(iid, taken))
        return pd.DataFrame({"image_id": pd.Series(out_id, dtype=str),
                             "alt_path": pd.Series(out_alt, dtype=str)})

    return partitioned_groupby(
        ids_ds.map_batches(add_dir, batch_format="pyarrow"),
        ["dir"], per_dir, num_parts=num_partitions, out_schema=out_schema)


def series_alt_pairs(ids_ds, num_partitions: int = 64):
    """(alt_id, base_id, method) for every id whose series base EXISTS in
    the corpus — ``findBaseFileForPath`` as a distributed self-join.

    Shape (all stages shuffle on ONE key each, no broadcast state):
      P1 map_batches: derive eq/prefix probe rows (pure string kernel).
      P2 eq channel:  probes ∪ ids hash-partitioned on the PROBED id —
                      a partitioned semi-join (probe hits where the probed
                      previous-in-series id exists).
      P3 prefix channel: probes ∪ ids hash-partitioned on DIRNAME — within
                      a directory partition, sorted-array prefix ranges
                      (np.searchsorted) find glob matches; >1 match ⇒ base
                      is the lexicographic first (the reference's sorted
                      glob pick; count includes the alt itself).
      P4 resolve:     hash-partition on alt_id, keep the min-prio probe.

    Partitioning assumption (documented per the graft brief): common-base
    matches share the alt's directory — glob ``*`` does not cross ``/`` —
    so dirname is a complete co-location key for the prefix channel; a
    directory's listing must fit one partition (same skew envelope as the
    reference's per-directory glob).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    probe_schema = pa.schema([
        ("key", pa.string()), ("dir", pa.string()), ("alt_id", pa.string()),
        ("prio", pa.int32()), ("role", pa.string()),
    ])

    def emit_probes(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        key, dirc, alt, prio, role = [], [], [], [], []
        for iid in ids:
            d = split_path(iid)[0]
            eq, pre = derive_probes(iid)
            for p, k in eq:
                key.append(k); dirc.append(d); alt.append(iid)
                prio.append(p); role.append("eq")
            for p, pref in pre:
                key.append(pref); dirc.append(d); alt.append(iid)
                prio.append(p); role.append("pre")
            # every id is also namespace for both channels
            key.append(iid); dirc.append(d); alt.append("")
            prio.append(0); role.append("ns")
        return pa.Table.from_pydict(
            {"key": key, "dir": dirc, "alt_id": alt,
             "prio": np.asarray(prio, np.int32), "role": role},
            schema=probe_schema)

    probes = ids_ds.map_batches(
        emit_probes, batch_format="pyarrow").materialize()

    hit_schema = pa.schema([
        ("alt_id", pa.string()), ("base_id", pa.string()),
        ("prio", pa.int32()),
    ])

    def eq_match(df: pd.DataFrame) -> pd.DataFrame:
        ns = df.loc[df["role"] == "ns", "key"].unique()
        pr = df[df["role"] == "eq"]
        hit = pr[pr["key"].isin(ns)]
        return pd.DataFrame({
            "alt_id": hit["alt_id"].astype(str),
            "base_id": hit["key"].astype(str),
            "prio": hit["prio"].astype("int32"),
        })

    eq_hits = partitioned_groupby(
        probes.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t["role"], value_set=pa.array(["ns", "eq"]))),
            batch_format="pyarrow"),
        ["key"], eq_match, num_parts=num_partitions, out_schema=hit_schema)

    def prefix_match(df: pd.DataFrame) -> pd.DataFrame:
        out_alt, out_base, out_prio = [], [], []
        for _, g in df.groupby("dir", sort=False):
            ns = np.sort(g.loc[g["role"] == "ns", "key"].to_numpy(str))
            pr = g[g["role"] == "pre"]
            if not len(pr) or not len(ns):
                continue
            lo = np.searchsorted(ns, pr["key"].to_numpy(str), "left")
            hi = np.searchsorted(
                ns, (pr["key"] + "\U0010ffff").to_numpy(str), "left")
            ok = (hi - lo) > 1
            out_alt.extend(pr.loc[ok, "alt_id"].tolist())
            out_base.extend(ns[lo[ok]].tolist())
            out_prio.extend(pr.loc[ok, "prio"].tolist())
        return pd.DataFrame({
            "alt_id": pd.Series(out_alt, dtype=str),
            "base_id": pd.Series(out_base, dtype=str),
            "prio": pd.Series(out_prio, dtype="int32"),
        })

    pre_hits = partitioned_groupby(
        probes.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t["role"], value_set=pa.array(["ns", "pre"]))),
            batch_format="pyarrow"),
        ["dir"], prefix_match, num_parts=num_partitions, out_schema=hit_schema)

    out_schema = pa.schema([
        ("alt_id", pa.string()), ("base_id", pa.string()),
        ("method", pa.string()),
    ])

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        best = (df.sort_values(["alt_id", "prio", "base_id"], kind="mergesort")
                  .drop_duplicates("alt_id"))
        return pd.DataFrame({
            "alt_id": best["alt_id"].astype(str),
            "base_id": best["base_id"].astype(str),
            "method": np.where(best["prio"] < _PRIO_PREFIX,
                               "series_prev", "common_base"),
        })

    return partitioned_groupby(eq_hits.union(pre_hits), ["alt_id"], resolve,
                               num_parts=num_partitions,
                               out_schema=out_schema)
