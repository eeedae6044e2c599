"""DuckDB SQL mirrors for the IMAGE-corpus pipelines.

Each template is ANSI-ish DuckDB SQL over two fixture parquet tables:

* ``images``  — the deterministic synthetic corpus (fixtures.images_path)
* ``hashes``  — a single-process ORACLE recomputation of every image's
  fingerprint: status, unified ``getProcHash`` key, packed dHash, crc32 and
  the MinHash LSH band keys (fixtures.hashes_path)

What these mirrors value-check is the DISTRIBUTED engine's orchestration —
banding shuffle, bucket thresholding, owner-band edge dedup, connected
components, keeper election, rename formatting — against an independent
Ray-free recomputation in a different engine (DuckDB).  The per-image
decode/hash KERNEL is shared library code (oracle.compute_rows), pinned
separately by golden and property tests; SQL cannot decode pixels, so that
one stage ships as data.

Semantics mirrored (reference files cited for parity):

* live set: status ∈ {ok, md5_only} — strict-mode media join the same
  keyspace by content md5 (/root/reference/dupedb.py:82-101) — minus the
  all-zero poison hash (/root/reference/dupedb.py:96-99).
* reference clusters: proc_hash buckets of size ≥ threshold
  (/root/reference/dupedb.py:253-257,331).
* decisions: quality/dir/name sort-tuple keeper election and the
  ``{hash}[_{CRC32}].{ext}`` rename plan (/root/reference/dedupc.py:61-106,
  169-246).
* extended clusters: image channel = Hamming ≤ hamming_max between
  decodable rows; caption channel = LSH-co-banded pairs (share ≥ 1 MinHash
  band key — the PROBABILISTIC candidate set the engine itself uses, which
  is why band keys ship in the hashes table) verified by exact
  character-shingle Jaccard ≥ jaccard_min; hash-exact groups contracted to
  one representative before the recursive-CTE connected components (the
  same contraction the engine's star rounds perform on proc_hash groups).
"""

from __future__ import annotations

# bucket membership, unified keyspace, threshold ≥ 2
REFERENCE_CLUSTERS_SQL = """
SELECT proc_hash, image_id FROM '{HASHES}'
WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')
QUALIFY count(*) OVER (PARTITION BY proc_hash) >= 2
ORDER BY proc_hash, image_id
"""

# incremental scan vs a known snapshot (the persistent hash-store loop,
# dupedb.py:31-66): the engine's Bloom index + exact verify must agree with
# the plain relational anti-join on the unified proc_hash keyspace.  The
# known/new split (first md5(image_id) nibble) matches
# __ray_entry__._img_incremental_dedup.
INCREMENTAL_DEDUP_SQL = """
WITH live AS (
  SELECT image_id, proc_hash FROM '{HASHES}'
  WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')),
newside AS (
  SELECT image_id, proc_hash FROM live
  WHERE substr(md5(image_id), 1, 1) IN ('0','1','2','3')),
known AS (
  SELECT DISTINCT proc_hash FROM live
  WHERE substr(md5(image_id), 1, 1) NOT IN ('0','1','2','3'))
SELECT n.image_id,
       CASE WHEN k.proc_hash IS NOT NULL THEN 'dup_known' ELSE 'new' END
         AS status
FROM newside n LEFT JOIN known k USING (proc_hash)
ORDER BY n.image_id
"""

# cross-corpus image near-dedup: new side (md5(id) nibble 0-3) matched
# against the known side over the unified proc_hash keyspace — Hamming ≤
# HAMMING_MAX between decodable rows, byte-exact proc_hash between
# strict-mode media (proc_hash IS the content md5 for md5_only rows,
# dupedb.py:82-101).  The engine's slice banding is pigeonhole-lossless at
# this radius, so this plain cross join is the exact same relation.
CROSS_DEDUP_SQL = """
WITH live AS (
  SELECT image_id, status, proc_hash, dhash,
         substr(md5(image_id), 1, 1) AS nb
  FROM '{HASHES}'
  WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')),
known AS (SELECT * FROM live WHERE nb NOT IN ('0','1','2','3')),
newd AS (SELECT * FROM live WHERE nb IN ('0','1','2','3')),
m AS (
  SELECT n.image_id, min(k.image_id) AS matched_known
  FROM newd n JOIN known k
    ON (n.status = 'ok' AND k.status = 'ok'
        AND bit_count(xor(n.dhash, k.dhash)) <= {HAMMING_MAX})
    OR (n.status = 'md5_only' AND k.status = 'md5_only'
        AND n.proc_hash = k.proc_hash)
  GROUP BY n.image_id)
SELECT n.image_id,
       COALESCE(m.matched_known, '') AS matched_known,
       CASE WHEN m.matched_known IS NULL THEN 'keep' ELSE 'drop' END AS action
FROM newd n LEFT JOIN m USING (image_id)
ORDER BY n.image_id
"""

# hide-alts clustering (compare.py:519-560): a bucket survives iff its
# alt-SUPPRESSED member list still meets the threshold, but a surviving
# bucket reports FULL membership (the reference stores ``filelist``).  The
# suppression loop mutates the bucket while iterating, so its removal set
# is sequential, not relational — it ships as data
# (fixtures.alt_suppressed_path, same sidecar pattern as the IVF
# assign/probe tables); bucketing and re-thresholding are re-derived here.
CLUSTERS_HIDEALTS_SQL = """
WITH mem AS (
  SELECT proc_hash, image_id FROM '{HASHES}'
  WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')
  QUALIFY count(*) OVER (PARTITION BY proc_hash) >= 2
),
surv AS (
  SELECT m.proc_hash, count(*) AS n_surv
  FROM mem m
  WHERE NOT EXISTS (SELECT 1 FROM '{SUPP}' s
                    WHERE s.proc_hash = m.proc_hash
                      AND s.image_id = m.image_id)
  GROUP BY m.proc_hash
)
SELECT m.proc_hash, m.image_id
FROM mem m JOIN surv USING (proc_hash)
WHERE n_surv >= 2
ORDER BY proc_hash, image_id
"""

# keeper election + rename/dest plan per bucket.  The CTE chain is shared
# with DEDUP_REPORT_SQL (the per-action operational rollup over the same
# decision relation), so the two can never drift apart.
_DECISIONS_CTES = """
WITH live AS (
  SELECT h.image_id, h.proc_hash, h.crc32, h.frames,
         i.w * i.h AS pixels, octet_length(i.bytes) AS filesize
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only') AND NOT regexp_matches(h.proc_hash, '^0+$')
),
feat AS (
  SELECT *,
    CASE WHEN strpos(image_id, '/') > 0
         THEN length(regexp_replace(image_id, '/[^/]*$', ''))
         ELSE length(image_id) - 1 END AS dir_len,
    CASE WHEN strpos(image_id, '/') > 0
         THEN regexp_replace(image_id, '/[^/]*$', '') ELSE '' END AS dirp,
    lower(regexp_extract(image_id, '[^/]*$')) AS name,
    regexp_extract(image_id, '[^/]*$') AS name_raw,
    CAST(filesize AS DOUBLE) / greatest(pixels, 1) AS density
  FROM live
),
feat2 AS (
  SELECT *,
    CASE WHEN regexp_matches(name, '^[0-9a-f]{36}\\.') THEN 1 ELSE 0 END AS name_hex,
    length(name) - length(regexp_replace(name, '[-_ +]', '', 'g')) AS name_punct,
    CASE WHEN regexp_matches(name, ' \\(\\d+\\)\\.') THEN 1 ELSE 0 END AS name_series
  FROM feat
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY proc_hash) AS bsize FROM feat2
  QUALIFY bsize >= 2
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY proc_hash
      ORDER BY frames DESC, pixels DESC, filesize DESC, density DESC, image_id) AS q_rank,
    row_number() OVER (PARTITION BY proc_hash
      ORDER BY dir_len DESC, image_id) AS d_rank,
    row_number() OVER (PARTITION BY proc_hash
      ORDER BY name_hex ASC, name_punct DESC, name_series ASC, image_id) AS n_rank
  FROM sized
),
per AS (
  SELECT k.proc_hash,
         k.dirp AS k_dir, k.name_raw AS k_name,
         regexp_extract(k.image_id, '[^.]*$') AS k_ext,
         k.dir_len AS k_dir_len,
         k.name_hex AS k_nh, k.name_punct AS k_np, k.name_series AS k_ns,
         d.dirp AS b_dir0, d.dir_len AS b_dir_len,
         n.name_raw AS b_name0,
         n.name_hex AS b_nh, n.name_punct AS b_np, n.name_series AS b_ns
  FROM ranked k
  JOIN ranked d ON d.proc_hash = k.proc_hash AND d.d_rank = 1
  JOIN ranked n ON n.proc_hash = k.proc_hash AND n.n_rank = 1
  WHERE k.q_rank = 1
),
dest AS (
  SELECT proc_hash,
    CASE WHEN k_dir_len = b_dir_len AND k_dir != b_dir0 THEN k_dir ELSE b_dir0 END AS b_dir,
    CASE WHEN (k_nh, k_np, k_ns) = (b_nh, b_np, b_ns) AND k_name != b_name0
         THEN k_name ELSE b_name0 END AS b_name,
    k_ext
  FROM per
),
destf AS (
  SELECT proc_hash,
    (CASE WHEN b_dir != '' THEN b_dir || '/' ELSE '' END)
      || regexp_replace(b_name, '\\.[^.]*$', '') || '.' || k_ext AS dest_path
  FROM dest
),
dec AS (
  SELECT r.proc_hash AS cluster_id,
         r.image_id,
         r.filesize,
         CASE WHEN r.q_rank = 1 THEN 'keep' ELSE 'delete' END AS action,
         CASE WHEN r.q_rank = 1 AND strpos(r.image_id, '!') = 0
              THEN r.proc_hash
                   || CASE WHEN r.bsize > 1 THEN '_' || r.crc32 ELSE '' END
                   || '.'
                   || CASE WHEN strpos(r.image_id, '.') > 0
                           THEN regexp_extract(r.image_id, '[^.]*$') ELSE '' END
              ELSE '' END AS rename_to,
         CASE WHEN r.q_rank = 1 THEN df.dest_path ELSE '' END AS dest_path
  FROM ranked r JOIN destf df USING (proc_hash)
)
"""

REFERENCE_DECISIONS_SQL = _DECISIONS_CTES + """
SELECT cluster_id, image_id, action, rename_to, dest_path
FROM dec
ORDER BY cluster_id, image_id
"""

# operational dedup report over the SAME decision relation: per action,
# how many rows, how many clusters, how many payload bytes — 'delete'
# total_bytes is the storage the dedup run reclaims.  The reference
# prints these as ad-hoc log lines (/root/reference/dedupc.py:182-246);
# here they are a first-class value-checked table.
DEDUP_REPORT_SQL = _DECISIONS_CTES + """
SELECT action,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(sum(filesize) AS BIGINT) AS total_bytes
FROM dec
GROUP BY action
ORDER BY action
"""

# explainSort projection: the keeper row carries the bucket's ranking
# explanation — one header line + one line per member, so the driver-checked
# ``explain_lines`` ("\n" count) is exactly the bucket size on keeper rows
# and 0 on deletions (/root/reference/dedupc.py:99-106,182-184)
DECISIONS_EXPLAIN_SQL = """
WITH live AS (
  SELECT h.image_id, h.proc_hash, h.frames,
         i.w * i.h AS pixels, octet_length(i.bytes) AS filesize,
         CAST(octet_length(i.bytes) AS DOUBLE) / greatest(i.w * i.h, 1) AS density
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only') AND NOT regexp_matches(h.proc_hash, '^0+$')
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY proc_hash) AS bsize FROM live
  QUALIFY bsize >= 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY proc_hash
      ORDER BY frames DESC, pixels DESC, filesize DESC, density DESC, image_id) AS q_rank
  FROM sized
)
SELECT proc_hash AS cluster_id, image_id,
       CASE WHEN q_rank = 1 THEN 'keep' ELSE 'delete' END AS action,
       CAST(CASE WHEN q_rank = 1 THEN bsize ELSE 0 END AS BIGINT) AS explain_lines
FROM ranked
ORDER BY cluster_id, image_id
"""

# near-dup components: img Hamming channel ∪ LSH-banded caption channel,
# hash-group contraction, recursive-CTE min-label CC.  The CTE body is
# shared by EXTENDED_CLUSTERS_SQL and MONTAGE_SQL (montage = per-cluster
# layout stats over the same component assignment).
_EXTENDED_CTE = """
WITH RECURSIVE live AS (
  SELECT h.image_id, h.status, h.proc_hash, h.dhash, h.cap_bands, i.caption
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only') AND NOT regexp_matches(h.proc_hash, '^0+$')
),
grp AS (
  SELECT proc_hash, min(image_id) AS rep, any_value(dhash) AS dh,
         any_value(status) AS status, count(*) AS gsize
  FROM live GROUP BY proc_hash
),
member AS MATERIALIZED (
  SELECT l.image_id, g.rep, g.gsize FROM live l JOIN grp g USING (proc_hash)
),
banded AS (
  SELECT image_id, generate_subscripts(cap_bands, 1) AS bi, unnest(cap_bands) AS bk
  FROM live
),
cand AS (
  SELECT DISTINCT a.image_id AS src, b.image_id AS dst
  FROM banded a JOIN banded b
    ON a.bi = b.bi AND a.bk = b.bk AND a.image_id < b.image_id
),
sets AS (
  SELECT image_id, list_distinct([substr(caption, j, {SHINGLE_K})
          FOR j IN range(1, greatest(len(caption) - {SHINGLE_K} + 2, 2))]) AS sh
  FROM live
),
cap_pairs AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT c.src, c.dst,
           len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
    FROM cand c JOIN sets a ON a.image_id = c.src
                JOIN sets b ON b.image_id = c.dst
  ) WHERE (na = 0 AND nb = 0) OR i::DOUBLE / (na + nb - i) >= {JACCARD_MIN}
),
rep_edges AS MATERIALIZED (
  SELECT a.rep AS u, b.rep AS v
  FROM grp a JOIN grp b
    ON a.rep < b.rep AND a.status = 'ok' AND b.status = 'ok'
   AND {IMG_HAM_EXPR} <= {HAMMING_MAX}
  UNION
  SELECT least(ma.rep, mb.rep), greatest(ma.rep, mb.rep)
  FROM cap_pairs p
  JOIN member ma ON ma.image_id = p.src
  JOIN member mb ON mb.image_id = p.dst
  WHERE ma.rep != mb.rep
),
e AS MATERIALIZED (
  SELECT u, v FROM rep_edges UNION SELECT v, u FROM rep_edges
),
r(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node WHERE r.lbl < e.u
),
rep_lbl AS (
  SELECT node AS rep, min(lbl) AS lbl FROM r GROUP BY node
),
assigned AS (
  SELECT m.image_id, coalesce(rl.lbl, m.rep) AS cluster_id
  FROM member m LEFT JOIN rep_lbl rl USING (rep)
  WHERE rl.rep IS NOT NULL OR m.gsize >= 2
)
"""

EXTENDED_CLUSTERS_SQL = _EXTENDED_CTE + """
SELECT image_id, cluster_id FROM assigned ORDER BY image_id
"""


# dup-family size spectrum: clusters per size class + images they hold
CLUSTER_SIZE_HIST_SQL = _EXTENDED_CTE + """
, sizes AS (SELECT cluster_id, count(*) AS n FROM assigned GROUP BY cluster_id)
SELECT CAST(n AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(n * count(*) AS BIGINT) AS n_images
FROM sizes GROUP BY n ORDER BY n
"""


# near-dup-aware train/val split over the live image corpus: clustered
# images key on their component label, the rest on their own id; the same
# engine-portable md5 bucket expression as DOCS_LEAKAGE_SPLIT_SQL
LEAKAGE_SPLIT_SQL = _EXTENDED_CTE + """
, asg AS (
  SELECT l.image_id, coalesce(a.cluster_id, l.image_id) AS split_key
  FROM live l LEFT JOIN assigned a USING (image_id))
SELECT image_id, split_key,
       CAST(('0x' || substr(md5(split_key), 1, 8)) AS BIGINT) % 100 AS bucket,
       CASE WHEN CAST(('0x' || substr(md5(split_key), 1, 8)) AS BIGINT) % 100
                 < 90
            THEN 'train' ELSE 'val' END AS split
FROM asg
ORDER BY image_id
"""

# end-to-end image curation decision table (image_dedup.img_curation):
# first-hit-wins gate cascade, then the reference quality-tuple keeper
# election among survivors per proc_hash bucket.  pixels/filesize reproduce
# the engine's decode-stage columns exactly, including the null-payload row
# (engine never reaches the size fields: both 0) and null w/h (coerced 0).
# Gate literals (1024 px, 3:2 aspect) are pinned to
# image_dedup.IMG_CURATION_MIN_PIXELS — change both together.
IMG_CURATION_SQL = """
WITH fp AS (
  SELECT h.image_id, h.proc_hash, h.status,
         coalesce(i.w, 0) AS w, coalesce(i.h, 0) AS h,
         CASE WHEN i.bytes IS NULL THEN 0
              ELSE coalesce(i.w, 0) * coalesce(i.h, 0) END AS pixels,
         coalesce(octet_length(i.bytes), 0) AS filesize
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)),
gated AS (
  SELECT *, CASE
      WHEN status = 'error' THEN 'dead_letter'
      WHEN regexp_matches(proc_hash, '^0+$') THEN 'drop_poison'
      WHEN pixels < 1024 THEN 'drop_small'
      WHEN 2 * greatest(w, h) > 3 * least(w, h) THEN 'drop_aspect'
      ELSE '' END AS gate
  FROM fp),
ranked AS (
  SELECT image_id, pixels, filesize,
         row_number() OVER (PARTITION BY proc_hash
             ORDER BY pixels DESC, filesize DESC,
                      CAST(filesize AS DOUBLE) / greatest(pixels, 1) DESC,
                      image_id) AS q_rank
  FROM gated WHERE gate = '')
SELECT * FROM (
  SELECT image_id,
         CASE WHEN q_rank = 1 THEN 'keep' ELSE 'drop_dup' END AS action,
         CAST(pixels AS BIGINT) AS pixels,
         CAST(filesize AS BIGINT) AS filesize
  FROM ranked
  UNION ALL
  SELECT image_id, gate AS action,
         CAST(pixels AS BIGINT), CAST(filesize AS BIGINT)
  FROM gated WHERE gate <> '')
ORDER BY image_id
"""

# per-action rollup over the same curation relation (dataset card)
IMG_CURATION_REPORT_SQL = (
    "SELECT action, CAST(count(*) AS BIGINT) AS n_images, "
    "CAST(sum(filesize) AS BIGINT) AS total_bytes FROM ("
    + IMG_CURATION_SQL + ") GROUP BY action ORDER BY action")

# aspect-ratio bucket assignment (image_dedup.img_aspect_buckets): nearest
# ladder ratio by |w/h - rw/rh|, ties to the lowest bucket index.  The
# error expression mirrors the engine bit-for-bit: exact integer products,
# ONE float division, so both engines rank identically.
ASPECT_BUCKETS_SQL = """
WITH live AS (
  SELECT h.image_id, coalesce(i.w, 0) AS w, coalesce(i.h, 0) AS h
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only')
    AND NOT regexp_matches(h.proc_hash, '^0+$')),
ladder(bucket_idx, rw, rh) AS (
  VALUES (1,1,1),(2,4,3),(3,3,4),(4,16,9),(5,9,16),(6,3,2),(7,2,3)),
scored AS (
  SELECT l.image_id, b.bucket_idx, b.rw, b.rh,
         row_number() OVER (PARTITION BY l.image_id
             ORDER BY CAST(abs(l.w * b.rh - b.rw * l.h) AS DOUBLE) / b.rh,
                      b.bucket_idx) AS rn
  FROM live l CROSS JOIN ladder b)
SELECT image_id, CAST(bucket_idx AS BIGINT) AS bucket_idx,
       CAST(rw AS BIGINT) AS bucket_rw, CAST(rh AS BIGINT) AS bucket_rh
FROM scored WHERE rn = 1 ORDER BY image_id
"""

# montage-sink layout stats (S7, /root/reference/dedupc.py:109-154): per
# near-dup cluster, the first ≤16 members (string id order) tile into a
# 4-wide 32-px grid; an undecodable member (strict-mode md5 media) leaves a
# black tile and flags the montage 'partial'
MONTAGE_SQL = _EXTENDED_CTE + """,
mem AS (
  SELECT a.cluster_id, a.image_id, l.status,
         row_number() OVER (PARTITION BY a.cluster_id ORDER BY a.image_id) AS rn
  FROM assigned a JOIN live l USING (image_id)
),
agg AS (
  SELECT cluster_id, count(*) AS n,
         max(CASE WHEN status != 'ok' THEN 1 ELSE 0 END) AS any_bad
  FROM mem WHERE rn <= 16 GROUP BY cluster_id
)
SELECT cluster_id,
       CAST(least(4, n) * 32 AS BIGINT) AS w,
       CAST(CAST(ceil(n / least(4, n)::DOUBLE) AS BIGINT) * 32 AS BIGINT) AS h,
       'png' AS fmt,
       CAST(n AS BIGINT) AS n_members,
       CASE WHEN any_bad = 1 THEN 'partial' ELSE 'ok' END AS status
FROM agg ORDER BY cluster_id
"""


# member-level verified dup pairs (the recall-gate artifact of
# pipelines/image_dedup.dup_pairs).  Union of the three verify channels,
# exactly as candidates._verify_members emits them in non-hot buckets:
#
# * img: ALL decodable pairs at Hamming ≤ hamming_max — the 5-slice
#   pigeonhole makes banding's candidate set complete at ≤ 4, so the
#   engine's owner-band dedup changes WHICH band emits, never the set;
# * md5: strict-mode media star edges, lexicographic-min member per
#   identical full-md5 group (candidates.py MD5_BAND branch);
# * cap: LSH-co-banded pairs at exact Jaccard ≥ jaccard_min.  The engine
#   skips pairs the img channel owns (both dhashes nonzero, ham ≤ max) —
#   invisible under the channel UNION, so no delegation filter here.
#
# Valid while no bucket exceeds band_group_cap (hot buckets switch to
# spanning-forest emission, a deliberate subset) — so this mirror is pinned
# at sf-small (tests/test_mirrors.py) and NOT registered for the sf0.01
# driver check, where a 233-member identical-hash clique tops the cap.
# verified-pair derivation (img Hamming ∪ md5 star ∪ cap Jaccard), shared
# by the pair listing and the image-side PageRank mirror
_PAIR_CTES = """
WITH live AS (
  SELECT h.image_id, h.status, h.proc_hash, h.dhash, h.cap_bands, i.caption
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only') AND NOT regexp_matches(h.proc_hash, '^0+$')
),
img_pairs AS (
  SELECT a.image_id AS src, b.image_id AS dst
  FROM live a JOIN live b
    ON a.image_id < b.image_id AND a.status = 'ok' AND b.status = 'ok'
   AND bit_count(xor(a.dhash, b.dhash)) <= {HAMMING_MAX}
),
md5_pairs AS (
  SELECT src, dst FROM (
    SELECT min(image_id) OVER (PARTITION BY proc_hash) AS src,
           image_id AS dst
    FROM live WHERE status = 'md5_only')
  WHERE src != dst
),
banded AS (
  SELECT image_id, generate_subscripts(cap_bands, 1) AS bi, unnest(cap_bands) AS bk
  FROM live
),
cand AS (
  SELECT DISTINCT a.image_id AS src, b.image_id AS dst
  FROM banded a JOIN banded b
    ON a.bi = b.bi AND a.bk = b.bk AND a.image_id < b.image_id
),
sets AS (
  SELECT image_id, list_distinct([substr(caption, j, {SHINGLE_K})
          FOR j IN range(1, greatest(len(caption) - {SHINGLE_K} + 2, 2))]) AS sh
  FROM live
),
cap_pairs AS (
  SELECT src, dst FROM (
    SELECT c.src, c.dst,
           len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS na, len(b.sh) AS nb
    FROM cand c JOIN sets a ON a.image_id = c.src
                JOIN sets b ON b.image_id = c.dst
  ) WHERE (na = 0 AND nb = 0) OR i::DOUBLE / (na + nb - i) >= {JACCARD_MIN}
)
, pairs AS (
  SELECT DISTINCT src, dst FROM (
    SELECT * FROM img_pairs
    UNION ALL SELECT * FROM md5_pairs
    UNION ALL SELECT * FROM cap_pairs)
)
"""

DUP_PAIRS_SQL = _PAIR_CTES + """
SELECT src, dst FROM pairs ORDER BY src, dst
"""


# Hamming-distance histogram over the verified pair set: image-channel
# pairs bucket by distance, md5/caption-channel pairs (not
# Hamming-verified) collapse into the -1 bucket.
PAIR_DIST_HIST_SQL = _PAIR_CTES + """
, d AS (
  SELECT CASE WHEN a.status = 'ok' AND b.status = 'ok'
              AND bit_count(xor(a.dhash, b.dhash)) <= {HAMMING_MAX}
         THEN bit_count(xor(a.dhash, b.dhash)) ELSE -1 END AS ham
  FROM pairs p JOIN live a ON a.image_id = p.src
               JOIN live b ON b.image_id = p.dst)
SELECT CAST(ham AS BIGINT) AS ham, CAST(count(*) AS BIGINT) AS n_pairs
FROM d GROUP BY ham ORDER BY ham
"""


def _pagerank_rounds(n: int = 5) -> str:
    """Chained e6 integer PageRank rounds (same arithmetic as
    queries.DOCS_PAGERANK_SQL: r' = 150000 + (85·Σ r//deg)//100; the
    inner CAST collapses DuckDB's DECIMAL(38,0) sum back to BIGINT)."""
    round_t = """
, p{t} AS (
  SELECT e.v AS node,
         CAST(150000 + (85 * CAST(sum(p.r // dg.dg) AS BIGINT)) // 100
              AS BIGINT) AS r
  FROM e JOIN p{prev} p ON e.u = p.node JOIN dg ON dg.u = e.u
  GROUP BY e.v)
"""
    return "".join(round_t.format(t=t, prev=t - 1) for t in range(1, n + 1))


IMG_PAGERANK_SQL = _PAIR_CTES + """
, e AS (SELECT src AS u, dst AS v FROM pairs
        UNION ALL SELECT dst, src FROM pairs)
, dg AS (SELECT u, count(*) AS dg FROM e GROUP BY u)
, p0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM dg)
""" + _pagerank_rounds(5) + """
SELECT node AS image_id, r AS rank_e6 FROM p5 ORDER BY image_id
"""


def wide_ham_expr(n_hex: int, a: str = "a.proc_hash", b: str = "b.proc_hash") -> str:
    """Hamming distance over an n_hex-char hex fingerprint as DuckDB SQL:
    the hex splits into ≤12-char (48-bit) chunks, each cast via the '0x'
    string form to BIGINT, xor'd and bit_counted — 144-bit wide hashes
    (the reference's default hash_size 12) need no 128-bit types."""
    terms = []
    for s in range(0, n_hex, 12):
        w = min(12, n_hex - s)
        # bit_count returns TINYINT — cast before summing or 3×48-bit
        # chunks overflow at distance > 127
        terms.append(
            f"CAST(bit_count(xor(CAST(concat('0x', substr({a}, {s + 1}, {w})) AS BIGINT), "
            f"CAST(concat('0x', substr({b}, {s + 1}, {w})) AS BIGINT))) AS INTEGER)")
    return "(" + " + ".join(terms) + ")"


# dedup quality scorecard: pair-level precision/recall of the extended
# clusters vs labeled ground truth via contingency algebra (Σ C(n,2) over
# cluster⋈truth cells / clusters / truth groups) — no pair enumeration.
# Integer micro-units; // is truncating division, values non-negative.
IMG_SCORECARD_SQL = _EXTENDED_CTE + """
, tr AS (SELECT image_id, group_id FROM '{TRUTH}' WHERE kind != 'corrupt')
, j AS (SELECT a.cluster_id, t.group_id
        FROM assigned a JOIN tr t USING (image_id))
, tp AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
         FROM (SELECT count(*) AS n FROM j GROUP BY cluster_id, group_id))
, cp AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
         FROM (SELECT count(*) AS n FROM assigned GROUP BY cluster_id))
, gp AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS v
         FROM (SELECT count(*) AS n FROM tr GROUP BY group_id))
SELECT tp.v AS tp, cp.v - tp.v AS fp, gp.v - tp.v AS fn,
       CAST(tp.v * 1000000 // greatest(cp.v, 1) AS BIGINT) AS precision_e6,
       CAST(tp.v * 1000000 // greatest(gp.v, 1) AS BIGINT) AS recall_e6
FROM tp, cp, gp
"""


# caption↔image consistency audit: duplicate-image clusters (unified
# proc_hash keyspace, threshold 2 as in REFERENCE_CLUSTERS_SQL) whose
# members carry more than one distinct caption — the label-noise signal
# the reference GUI shows a human side-by-side (compare.py:493-515).
# Captions live in the images parquet; proc_hash in the oracle sidecar.
CAPTION_CONFLICTS_SQL = """
WITH live AS (
  SELECT h.proc_hash, h.image_id, i.caption
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only')
    AND NOT regexp_matches(h.proc_hash, '^0+$'))
SELECT proc_hash,
       count(*) AS n_members,
       count(DISTINCT caption) AS n_captions,
       min(caption) AS caption_min
FROM live
GROUP BY proc_hash
HAVING count(*) >= 2 AND count(DISTINCT caption) > 1
ORDER BY proc_hash
"""


# the inverse audit: one caption on ≥ 2 images spanning > 1 distinct
# proc_hash — the stock-caption / alt-text-spam noise mode a
# caption-channel dedup must not treat as duplicate evidence.
STOCK_CAPTIONS_SQL = """
WITH live AS (
  SELECT md5(i.caption) AS caption_md5, h.proc_hash, h.image_id
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only')
    AND NOT regexp_matches(h.proc_hash, '^0+$')
    AND i.caption IS NOT NULL)
SELECT caption_md5,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(DISTINCT proc_hash) AS BIGINT) AS n_hashes,
       min(image_id) AS image_id_min
FROM live
GROUP BY caption_md5
HAVING count(*) >= 2 AND count(DISTINCT proc_hash) > 1
ORDER BY caption_md5
"""


# tiered duplicate classification (image_dedup.img_dedup_tiers): cheapest
# binding tier wins — byte (crc32:proc_hash composite byte identity; exact
# for md5_only rows whose proc_hash IS the content md5) → hash (proc_hash
# equality, the reference's duplicate definition, dupedb.py:253-257) →
# near (extended-cluster member below its label) → unique.  Byte groups
# nest inside hash groups, so both minima come from window functions over
# the same live relation; the near channel reuses the shared extended CTE.
_DEDUP_TIERS_CTE = _EXTENDED_CTE + """
, ident AS (
  SELECT image_id,
         min(image_id) OVER (PARTITION BY crc32 || ':' || proc_hash)
           AS byte_min,
         min(image_id) OVER (PARTITION BY proc_hash) AS hash_min
  FROM '{HASHES}'
  WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')
),
cls AS (
  SELECT i.image_id,
         CASE WHEN i.byte_min < i.image_id THEN 'byte'
              WHEN i.hash_min < i.image_id THEN 'hash'
              WHEN a.cluster_id IS NOT NULL AND a.cluster_id < i.image_id
                THEN 'near'
              ELSE 'unique' END AS tier,
         CASE WHEN i.byte_min < i.image_id THEN i.byte_min
              WHEN i.hash_min < i.image_id THEN i.hash_min
              WHEN a.cluster_id IS NOT NULL AND a.cluster_id < i.image_id
                THEN a.cluster_id
              ELSE i.image_id END AS dup_of
  FROM ident i LEFT JOIN assigned a USING (image_id)
)
"""

DEDUP_TIERS_SQL = _DEDUP_TIERS_CTE + """
SELECT image_id, tier, dup_of FROM cls ORDER BY image_id
"""

DEDUP_TIERS_REPORT_SQL = _DEDUP_TIERS_CTE + """
SELECT tier, CAST(count(*) AS BIGINT) AS n_images
FROM cls GROUP BY tier ORDER BY tier
"""


# perceptual-kernel agreement audit (image_dedup.img_kernel_agreement):
# dup-group membership per kernel keyspace over the two oracle sidecars
# (dHash = {HASHES}, pHash = {PHASHES}); universe = images live in BOTH
# keyspaces (the zero-hash poison sets differ between kernels).
KERNEL_AGREEMENT_SQL = """
WITH ld AS (
  SELECT image_id, proc_hash FROM '{HASHES}'
  WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')),
lp AS (
  SELECT image_id, proc_hash FROM '{PHASHES}'
  WHERE status IN ('ok','md5_only') AND NOT regexp_matches(proc_hash, '^0+$')),
dd AS (
  SELECT image_id,
         CASE WHEN count(*) OVER (PARTITION BY proc_hash) >= 2
              THEN 1 ELSE 0 END AS dup_dhash
  FROM ld),
pp AS (
  SELECT image_id,
         CASE WHEN count(*) OVER (PARTITION BY proc_hash) >= 2
              THEN 1 ELSE 0 END AS dup_phash
  FROM lp)
SELECT d.image_id,
       CAST(d.dup_dhash AS BIGINT) AS dup_dhash,
       CAST(p.dup_phash AS BIGINT) AS dup_phash,
       CASE WHEN d.dup_dhash = 1 AND p.dup_phash = 1 THEN 'both'
            WHEN d.dup_dhash = 1 THEN 'dhash_only'
            WHEN p.dup_phash = 1 THEN 'phash_only'
            ELSE 'neither' END AS agreement
FROM dd d JOIN pp p USING (image_id)
ORDER BY d.image_id
"""


def compose(template: str, *, hashes: str, images: str = "", altns: str = "",
            supp: str = "", truth: str = "", phashes: str = "",
            shingle_k: int = 5,
            jaccard_min: float = 0.8, hamming_max: int = 4,
            threshold: int = 2,
            ns_hashes: str = "", ns_images: str = "",
            img_ham_expr: str = "bit_count(xor(a.dh, b.dh))") -> str:
    """Fill a mirror template.  Plain ``str.replace`` — the templates
    contain regex braces (``{36}``) that ``str.format`` would eat.

    ``ns_hashes`` / ``ns_images``: when given, the quoted '{HASHES}' /
    '{IMAGES}' relations become two-path ``read_parquet([...])`` unions —
    how the non-strict queries mirror over images ∪ the vcon extension
    corpus without touching any template."""
    if ns_hashes:
        template = template.replace(
            "'{HASHES}'", f"read_parquet(['{hashes}', '{ns_hashes}'])")
    if ns_images:
        template = template.replace(
            "'{IMAGES}'", f"read_parquet(['{images}', '{ns_images}'])")
    return (template
            .replace("{PHASHES}", phashes)
            .replace("{HASHES}", hashes)
            .replace("{IMAGES}", images)
            .replace("{ALTNS}", altns)
            .replace("{SUPP}", supp)
            .replace("{TRUTH}", truth)
            .replace("{SHINGLE_K}", str(shingle_k))
            .replace("{JACCARD_MIN}", repr(jaccard_min))
            .replace("{IMG_HAM_EXPR}", img_ham_expr)
            .replace("{THRESHOLD}", str(threshold))
            .replace("{HAMMING_MAX}", str(hamming_max)))


def with_survivors(sql: str, threshold: int) -> str:
    """Pre-filter a composed image mirror's live relation to the prune
    survivors (md5-of-id bucket < ``threshold``, the same portable
    ``int(md5(id)[:8], 16) % 100`` both engines compute) — the
    deletion-maintenance mirrors are the ordinary relations over the
    survivor set."""
    out = sql
    hit = 0
    # rewrite EVERY live-relation spelling — a mirror whose ident CTE
    # writes the filter without the h. prefix must not end up with only
    # its near channel filtered (an inconsistent survivor relation)
    for qual in ("h.", ""):
        anchor = f"WHERE {qual}status IN ('ok','md5_only')"
        if anchor in out:
            hit += out.count(anchor)
            idc = f"{qual}image_id" if qual else "image_id"
            pred = (f"CAST(('0x' || substr(md5({idc}), 1, 8)) AS BIGINT) "
                    f"% 100 < {threshold} AND ")
            out = out.replace(anchor, "WHERE " + pred +
                              f"{qual}status IN ('ok','md5_only')")
    assert hit, "live-relation anchor missing from mirror"
    return out


# J4 series-base self-join (findBaseFileForPath as relational algebra,
# /root/reference/compare.py:77-105,136-173): eq channel = previous-in-series
# id existence; prefix channel = same-directory glob-prefix groups (>1 match,
# lexicographic-first base — count includes the alt itself).  Pattern
# priority and the i<=1000 fall-through reproduce getSeriesInfo's
# first-valid-wins loop.  The reference's final common-base pattern
# (backslash-delimited '-pn_' Windows paths) cannot match '/'-keyed ids and
# is omitted here (the engine carries it at prio 15).  The lookbehind
# (?<=[a-zA-Z])(\d)$ is rewritten RE2-safe as ([a-zA-Z])(\d)$ with a \1
# backreference in the replacement.
SERIES_ALT_SQL = r"""
WITH ids AS (
  SELECT image_id,
         CASE WHEN strpos(image_id, '/') > 0
              THEN regexp_replace(image_id, '/[^/]*$', '') ELSE '' END AS dir,
         regexp_replace(image_id, '\.[^./]*$', '') AS stem
  FROM (SELECT image_id FROM '{IMAGES}'
        UNION ALL SELECT image_id FROM '{ALTNS}')
),
ser AS (
  SELECT image_id, dir, stem,
    list_filter([
      CASE WHEN regexp_matches(stem, '_(\d+)$')
                AND CAST(regexp_extract(stem, '_(\d+)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, '_(\d+)$', '') || '_'
                || CAST(CAST(regexp_extract(stem, '_(\d+)$', 1) AS BIGINT) - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, '-(\d+)$')
                AND CAST(regexp_extract(stem, '-(\d+)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, '-(\d+)$', '') || '-'
                || CAST(CAST(regexp_extract(stem, '-(\d+)$', 1) AS BIGINT) - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, ' (\d+)$')
                AND CAST(regexp_extract(stem, ' (\d+)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, ' (\d+)$', '') || ' '
                || CAST(CAST(regexp_extract(stem, ' (\d+)$', 1) AS BIGINT) - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, '\((\d+)\)$')
                AND CAST(regexp_extract(stem, '\((\d+)\)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, '\((\d+)\)$', '') || '('
                || CAST(CAST(regexp_extract(stem, '\((\d+)\)$', 1) AS BIGINT) - 1 AS VARCHAR) || ')' END,
      CASE WHEN regexp_matches(stem, '_p(\d+)$')
                AND CAST(regexp_extract(stem, '_p(\d+)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, '_p(\d+)$', '') || '_p'
                || CAST(CAST(regexp_extract(stem, '_p(\d+)$', 1) AS BIGINT) - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, '_img(\d+)$')
                AND CAST(regexp_extract(stem, '_img(\d+)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, '_img(\d+)$', '') || '_img'
                || CAST(CAST(regexp_extract(stem, '_img(\d+)$', 1) AS BIGINT) - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, '-img(\d+)$')
                AND CAST(regexp_extract(stem, '-img(\d+)$', 1) AS BIGINT) <= 1000
           THEN regexp_replace(stem, '-img(\d+)$', '') || '-img'
                || CAST(CAST(regexp_extract(stem, '-img(\d+)$', 1) AS BIGINT) - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, '-alt(\d*)$')
                AND (regexp_extract(stem, '-alt(\d*)$', 1) = ''
                     OR CAST(regexp_extract(stem, '-alt(\d*)$', 1) AS BIGINT) <= 1000)
           THEN regexp_replace(stem, '-alt(\d*)$', '') || '-alt'
                || CAST(CASE WHEN regexp_extract(stem, '-alt(\d*)$', 1) = ''
                             THEN 1 ELSE CAST(regexp_extract(stem, '-alt(\d*)$', 1) AS BIGINT) END - 1 AS VARCHAR) END,
      CASE WHEN regexp_matches(stem, ' edit$') THEN stem || '0' END,
      CASE WHEN regexp_matches(stem, '[a-zA-Z]\d$')
           THEN regexp_replace(stem, '([a-zA-Z])(\d)$', '\1')
                || CAST(CAST(regexp_extract(stem, '([a-zA-Z])(\d)$', 2) AS BIGINT) - 1 AS VARCHAR) END
    ], x -> x IS NOT NULL) AS prevs
  FROM ids
),
eq_hits AS (
  SELECT s.image_id AS alt_id, e.prio, i.image_id AS base_id
  FROM ser s
  CROSS JOIN (VALUES (1, '.jpg'), (2, '.gif'), (3, '.webm'), (4, '.png')) e(prio, ext)
  JOIN ids i ON i.image_id = s.prevs[1] || e.ext
  WHERE len(s.prevs) >= 1 AND s.prevs[1] != s.stem
),
prep AS (
  SELECT image_id AS alt_id, dir, u.prio, u.pre
  FROM (
    SELECT image_id, dir, unnest(list_filter([
        CASE WHEN regexp_matches(stem, '[-_ ][0-9+]$')
             THEN {'prio': 10, 'pre': regexp_replace(stem, '[-_ ][0-9+]$', '')} END,
        CASE WHEN regexp_matches(stem, '[-_ ]alt$')
             THEN {'prio': 11, 'pre': regexp_replace(stem, '[-_ ]alt$', '')} END,
        CASE WHEN regexp_matches(stem, '[-_ ]edit$')
             THEN {'prio': 12, 'pre': regexp_replace(stem, '[-_ ]edit$', '')} END,
        CASE WHEN regexp_matches(stem, ' otm$')
             THEN {'prio': 13, 'pre': regexp_replace(stem, ' otm$', '')} END,
        CASE WHEN regexp_matches(stem, ' otn$')
             THEN {'prio': 14, 'pre': regexp_replace(stem, ' otn$', '')} END
      ], x -> x IS NOT NULL)) AS u
    FROM ids)
),
pre_hits AS (
  SELECT p.alt_id, p.prio, min(i.image_id) AS base_id
  FROM prep p
  JOIN ids i ON i.dir = p.dir AND starts_with(i.image_id, p.pre)
  GROUP BY p.alt_id, p.prio, p.pre
  HAVING count(*) > 1
),
best AS (
  SELECT alt_id, prio, base_id,
         row_number() OVER (PARTITION BY alt_id ORDER BY prio, base_id) AS rn
  FROM (SELECT * FROM eq_hits UNION ALL SELECT * FROM pre_hits)
)
SELECT alt_id, base_id,
       CASE WHEN prio < 10 THEN 'series_prev' ELSE 'common_base' END AS method
FROM best WHERE rn = 1
ORDER BY alt_id
"""


# review queue (S10's human loop as a table): buckets whose keeper
# election was decided ONLY by the id tie-break (frames+pixels+filesize
# equal ⇒ the whole reference quality tuple is equal: density is
# filesize/pixels) and/or whose members carry >1 distinct non-null
# caption.  Ordering matches the decisions mirror's q_rank; global rank =
# n_members desc, proc_hash asc.
REVIEW_QUEUE_SQL = """
WITH live AS (
  SELECT h.image_id, h.proc_hash, h.frames, i.caption,
         i.w * i.h AS pixels, octet_length(i.bytes) AS filesize,
         CAST(octet_length(i.bytes) AS DOUBLE) / greatest(i.w * i.h, 1) AS density
  FROM '{HASHES}' h JOIN '{IMAGES}' i USING (image_id)
  WHERE h.status IN ('ok','md5_only') AND NOT regexp_matches(h.proc_hash, '^0+$')
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY proc_hash) AS n_members
  FROM live QUALIFY n_members >= {THRESHOLD}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY proc_hash
             ORDER BY frames DESC, pixels DESC, filesize DESC, density DESC,
                      image_id) AS q_rank
  FROM sized
),
caps AS (
  SELECT proc_hash, count(DISTINCT caption) AS n_captions
  FROM sized GROUP BY proc_hash
),
top2 AS (
  SELECT k.proc_hash, k.n_members,
         k.image_id AS keeper, r.image_id AS runner_up,
         (k.frames = r.frames AND k.pixels = r.pixels
          AND k.filesize = r.filesize) AS tie
  FROM ranked k
  JOIN ranked r ON r.proc_hash = k.proc_hash AND r.q_rank = 2
  WHERE k.q_rank = 1
)
SELECT t.proc_hash,
       CASE WHEN t.tie AND c.n_captions > 1 THEN 'both'
            WHEN t.tie THEN 'tie_election'
            ELSE 'caption_conflict' END AS reason,
       CAST(t.n_members AS BIGINT) AS n_members,
       t.keeper, t.runner_up,
       CAST(c.n_captions AS BIGINT) AS n_captions,
       CAST(row_number() OVER (ORDER BY t.n_members DESC, t.proc_hash)
            AS BIGINT) AS rank
FROM top2 t JOIN caps c USING (proc_hash)
WHERE t.tie OR c.n_captions > 1
ORDER BY rank
"""


# table-pure altPathOf (M13, compare.py:107-134): per id, the next FREE
# series path.  Style/number via the same first-matching-pattern CASE
# chain as SERIES_ALT_SQL (priority = COALESCE order; >1000 numbers fall
# through to the next pattern, reference `continue`); non-series ids get
# the default `stem || ' (<#>)'`.  Candidates = generate_series from the
# member's own number, bounded by dir population + 2 (the namespace is
# finite, so at least one candidate in that window is free); a candidate
# is taken iff the formed string IS a corpus id (exact membership — the
# isfile probe — NOT same-style membership: 'x edit12.png' occupies
# style 'x edit<#>' slot 12 while parsing to a different style).  The
# formed==self case needs no special arm: self is a corpus id.
ALT_PATHS_SQL = r"""
WITH ids AS (
  SELECT image_id,
         CASE WHEN strpos(image_id, '/') > 0
              THEN regexp_replace(image_id, '/[^/]*$', '') ELSE '' END AS dir,
         regexp_replace(image_id, '\.[^./]*$', '') AS stem,
         COALESCE(regexp_extract(image_id, '(\.[^./]*)$', 1), '') AS ext
  FROM (SELECT image_id FROM '{IMAGES}'
        UNION ALL SELECT image_id FROM '{ALTNS}')
),
ser AS (
  SELECT image_id, dir, ext,
         count(*) OVER (PARTITION BY dir) AS dirn,
         COALESCE(
           CASE WHEN regexp_matches(stem, '_(\d+)$')
                     AND CAST(regexp_extract(stem, '_(\d+)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, '_(\d+)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, '_(\d+)$', '_<#>')} END,
           CASE WHEN regexp_matches(stem, '-(\d+)$')
                     AND CAST(regexp_extract(stem, '-(\d+)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, '-(\d+)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, '-(\d+)$', '-<#>')} END,
           CASE WHEN regexp_matches(stem, ' (\d+)$')
                     AND CAST(regexp_extract(stem, ' (\d+)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, ' (\d+)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, ' (\d+)$', ' <#>')} END,
           CASE WHEN regexp_matches(stem, '\((\d+)\)$')
                     AND CAST(regexp_extract(stem, '\((\d+)\)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, '\((\d+)\)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, '\((\d+)\)$', '(<#>)')} END,
           CASE WHEN regexp_matches(stem, '_p(\d+)$')
                     AND CAST(regexp_extract(stem, '_p(\d+)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, '_p(\d+)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, '_p(\d+)$', '_p<#>')} END,
           CASE WHEN regexp_matches(stem, '_img(\d+)$')
                     AND CAST(regexp_extract(stem, '_img(\d+)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, '_img(\d+)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, '_img(\d+)$', '_img<#>')} END,
           CASE WHEN regexp_matches(stem, '-img(\d+)$')
                     AND CAST(regexp_extract(stem, '-img(\d+)$', 1) AS BIGINT) <= 1000
                THEN {'n': CAST(regexp_extract(stem, '-img(\d+)$', 1) AS BIGINT),
                      'style': regexp_replace(stem, '-img(\d+)$', '-img<#>')} END,
           CASE WHEN regexp_matches(stem, '-alt(\d*)$')
                     AND (regexp_extract(stem, '-alt(\d*)$', 1) = ''
                          OR CAST(regexp_extract(stem, '-alt(\d*)$', 1) AS BIGINT) <= 1000)
                THEN {'n': CASE WHEN regexp_extract(stem, '-alt(\d*)$', 1) = ''
                                THEN 1 ELSE CAST(regexp_extract(stem, '-alt(\d*)$', 1) AS BIGINT) END,
                      'style': regexp_replace(stem, '-alt(\d*)$', '-alt<#>')} END,
           CASE WHEN regexp_matches(stem, ' edit$')
                THEN {'n': 1, 'style': stem || '<#>'} END,
           CASE WHEN regexp_matches(stem, '[a-zA-Z]\d$')
                THEN {'n': CAST(regexp_extract(stem, '([a-zA-Z])(\d)$', 2) AS BIGINT),
                      'style': regexp_replace(stem, '([a-zA-Z])(\d)$', '\1<#>')} END,
           {'n': 1, 'style': stem || ' (<#>)'}
         ) AS s
  FROM ids
),
cand AS (
  SELECT r.image_id,
         g.i,
         replace(r.s['style'], '<#>', CAST(g.i AS VARCHAR)) || r.ext AS formed
  FROM ser r, unnest(generate_series(r.s['n'], r.s['n'] + r.dirn + 1)) AS g(i)
),
free AS (
  SELECT c.image_id, c.i, c.formed,
         row_number() OVER (PARTITION BY c.image_id ORDER BY c.i) AS rn
  FROM cand c
  LEFT JOIN ids o ON o.image_id = c.formed
  WHERE o.image_id IS NULL
)
SELECT image_id, formed AS alt_path
FROM free WHERE rn = 1
ORDER BY image_id
"""


# exact Hamming-space k-NN: probes = 4 lexicographically smallest live ids
# (relation-defined, no orchestration freedom), neighbours ranked by
# (XOR popcount, image_id) with no Hamming ceiling — the search complement
# of the thresholded dup-pair relation
HAMMING_KNN_SQL = """
WITH live AS (
  SELECT image_id, dhash FROM '{HASHES}'
  WHERE status = 'ok' AND dhash <> 0
), probes AS (
  SELECT image_id AS query_id, dhash AS qh
  FROM live ORDER BY image_id LIMIT 4
)
SELECT query_id, rank, image_id, ham FROM (
  SELECT p.query_id, e.image_id,
         CAST(bit_count(xor(p.qh, e.dhash)) AS BIGINT) AS ham,
         CAST(row_number() OVER (
              PARTITION BY p.query_id
              ORDER BY bit_count(xor(p.qh, e.dhash)), e.image_id)
           AS BIGINT) AS rank
  FROM probes p JOIN live e ON e.image_id <> p.query_id)
WHERE rank <= 5
ORDER BY query_id, rank
"""

# per-bit dHash occupancy (hash-health audit): arithmetic >> keeps bit b at
# position 0 after the mask, sign replication notwithstanding, so the same
# expression covers negative int64 hashes
BIT_STATS_SQL = """
WITH live AS (
  SELECT dhash FROM '{HASHES}' WHERE status = 'ok' AND dhash <> 0
)
SELECT bit,
       CAST(sum((dhash >> bit) & 1) AS BIGINT) AS n_set,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum((dhash >> bit) & 1) * 1000000 // count(*) AS BIGINT)
         AS set_frac_e6
FROM live CROSS JOIN (SELECT unnest(range(64)) AS bit)
GROUP BY bit
ORDER BY bit
"""


# dedup-aware sampling weights: every live image weighs 1e6 // its
# extended-component family size (singletons key on their own id) — each
# duplicate family contributes one unit of sampling mass
SAMPLE_WEIGHTS_SQL = _EXTENDED_CTE + """
, asg AS (
  SELECT l.image_id, coalesce(a.cluster_id, l.image_id) AS weight_key
  FROM live l LEFT JOIN assigned a USING (image_id)),
sz AS (SELECT weight_key, count(*) AS n FROM asg GROUP BY weight_key)
SELECT image_id, weight_key,
       CAST(n AS BIGINT) AS family_size,
       CAST(1000000 // n AS BIGINT) AS weight_e6
FROM asg JOIN sz USING (weight_key)
ORDER BY image_id
"""
