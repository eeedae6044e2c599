"""Relational / analytics pipelines over the driver's testdata tables.

These exercise the engine's general query surface — vectorized projections,
grouped aggregates with partial pre-aggregation, broadcast joins, windowed
aggregates, top-k, dedup — each with an exact DuckDB-SQL mirror registered in
``__ray_entry__.oracle_sql`` (column names matched 1:1).

Scale notes are per function; the common rules: prune columns at
``read_parquet``, pre-aggregate inside ``map_batches`` before any
``groupby`` (combiner pattern), broadcast small dimension tables with
``ray.put`` instead of shuffle-joining them.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from deduplicator_ray import io as dio

from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _t(sf_dir: str, name: str) -> str:
    from deduplicator_ray import tuning

    tuning.tune()
    return os.path.join(sf_dir, f"{name}.parquet")


def _typed(df: pd.DataFrame, schema: pa.Schema) -> pd.DataFrame:
    """Re-type a materialized result against its Arrow schema.  A fully
    EMPTY dataset materializes as a zero-COLUMN frame (no blocks survive,
    so even ``out_schema``-typed stages lose their columns at
    ``to_pandas``); downstream sorts/projections then KeyError.  Returns
    the typed empty frame in that case, the input otherwise."""
    if len(df.columns) == 0:
        return schema.empty_table().to_pandas()
    return df


# ---------------------------------------------------------------------------
# q_pricing_summary — TPC-H Q1 shape: grouped aggregate with partial
# pre-aggregation inside map_batches (combiner), tiny final groupby.


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Money is carried as exact integer cents (the testdata values are
    2-decimal) so distributed summation order can't perturb the value hash
    — floating sums are NOT order-stable across partitionings."""
    ds = dio.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.floor(df["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        disc_pct = np.floor(df["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
        df["qty"] = df["l_quantity"].astype(np.int64)
        df["base_c"] = cents
        df["disc_e4"] = cents * (100 - disc_pct)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price_c=("base_c", "sum"),
            sum_disc_price_e4=("disc_e4", "sum"),
            count_order=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price_c", alias_name="sum_base_price_c"),
            Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty_e6"] = (out["sum_qty"] * 1_000_000) // out["count_order"]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# DuckDB sum(BIGINT) yields DECIMAL(38,0); the engine emits int64, so every
# aggregate in the mirrors is CAST back to BIGINT *outside* the sum or the
# driver's dtype-sensitive value hash diverges (CORRECTNESS_r01
# hash_match=false on exactly the 7 queries with uncast sums).
PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
       count(*) AS count_order,
       CAST((CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) * 1000000) // count(*) AS BIGINT) AS avg_qty_e6
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q_top_customers — broadcast hash join (customer is the small side, shipped
# once via ray.put; no shuffle join) + grouped revenue + global top-k.


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    import pyarrow.parquet as pq

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    lookup_ref = ray.put((cust["c_custkey"].combine_chunks(),
                          cust["c_name"].combine_chunks()))

    orders = dio.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["revenue_c"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        g = df.groupby("o_custkey", as_index=False).agg(
            revenue_c=("revenue_c", "sum"), n_orders=("revenue_c", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("o_custkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"),
                   Sum("n_orders", alias_name="n_orders"))
    )

    def attach_name(t: pa.Table) -> pa.Table:
        # vectorized broadcast lookup: index_in + take (no per-row dict)
        keys, names = ray.get(lookup_ref)
        idx = pc.index_in(t["o_custkey"].cast(keys.type), value_set=keys)
        vals = pc.fill_null(pc.take(names, idx), "")
        return t.append_column("c_name", vals)

    df = (
        agg.map_batches(attach_name, batch_format="pyarrow")
        .sort(["revenue_c", "o_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    df = df.rename(columns={"o_custkey": "c_custkey"})
    return df[["c_custkey", "c_name", "revenue_c", "n_orders"]]


TOP_CUSTOMERS_SQL = """
SELECT o_custkey AS c_custkey,
       any_value(c_name) AS c_name,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
ORDER BY revenue_c DESC, o_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q_events_window — tumbling 1-hour windowed aggregate per event_type
# (streaming-shaped workload: window key derived vectorized, then grouped).


def events_window(sf_dir: str) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        hour = pc.multiply(pc.divide(us, 3_600_000_000), 3_600_000_000)
        vc = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        out = t.append_column("window_start", hour.cast(pa.timestamp("us")))
        return out.append_column("value_c", pa.array(vc))

    out = (
        ds.map_batches(add_window, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_c", alias_name="sum_value_c"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    # pin the timestamp unit: DuckDB time_bucket emits timestamp[us] and the
    # driver value hash is dtype-sensitive
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


EVENTS_WINDOW_SQL = """
SELECT event_type,
       time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c,
       max(value) AS max_value
FROM events
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


# ---------------------------------------------------------------------------
# q_exact_dedup_lineitem — hash-partition exact dedup: first row per
# l_orderkey under l_linenumber order (per-group first, SURVEY.md D2 shape).


def exact_dedup_lineitem(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.pipelines.doc_dedup import exact_dedup

    ds = dio.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    # the testdata lineitem has duplicate (orderkey, linenumber) keys, so the
    # keep-first order must be fully deterministic over the output columns
    out = exact_dedup(ds, ["l_orderkey"], ["l_linenumber", "l_quantity"]).to_pandas()
    return out.sort_values("l_orderkey").reset_index(drop=True)


EXACT_DEDUP_LINEITEM_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM (SELECT l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_quantity) AS rn
      FROM lineitem)
WHERE rn = 1
ORDER BY l_orderkey
"""


# ---------------------------------------------------------------------------
# q_docs_dedup_bucket — dedup documents on a derived bucket key
# (lang, n_chars): keep min doc_id per bucket.


def docs_dedup_bucket(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.pipelines.doc_dedup import exact_dedup

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
    out = exact_dedup(ds, ["lang", "n_chars"], ["doc_id"]).to_pandas()
    return out.sort_values(["lang", "n_chars"]).reset_index(drop=True)[
        ["lang", "n_chars", "doc_id"]
    ]


DOCS_DEDUP_BUCKET_SQL = """
SELECT lang, n_chars, min(doc_id) AS doc_id
FROM documents
GROUP BY lang, n_chars
ORDER BY lang, n_chars
"""


# ---------------------------------------------------------------------------
# q_docs_text_stats — vectorized text-analysis projection, SQL-mirrored.


def docs_text_stats(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.pipelines.doc_dedup import text_features

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = text_features(ds).select_columns(
        ["doc_id", "n_tokens", "punct_cnt", "stopword_cnt"]
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_TEXT_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS punct_cnt,
       len(list_filter(string_split(text, ' '),
           x -> x IN ('the','and','of','a','to','in','is','on','for','with'))) AS stopword_cnt
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_lang_id — deterministic marker-count language heuristic, mirrored as
# a CASE chain in SQL (priority order en,de,fr,es,zh on strict >).


def docs_lang_id(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.pipelines.doc_dedup import text_features

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = text_features(ds).select_columns(["doc_id", "lang_pred"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _lang_score_sql(lang: str, col: str = "text") -> str:
    from deduplicator_ray.functions.text import LANG_MARKERS

    terms = [
        f"(length({col}) - length(replace({col}, '{m}', ''))) / {len(m)}"
        for m in LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(terms) + ")"


def lang_id_sql(table: str, id_col: str, col: str) -> str:
    """The marker-count language-ID relation over any (id, text) table —
    shared by the documents mirror and the image-caption mirror (the
    priority argmax CASE matches text_features' strict/loose comparison
    order exactly)."""
    return f"""
WITH scores AS (
  SELECT {id_col},
         {_lang_score_sql('en', col)} AS s_en,
         {_lang_score_sql('de', col)} AS s_de,
         {_lang_score_sql('fr', col)} AS s_fr,
         {_lang_score_sql('es', col)} AS s_es,
         {_lang_score_sql('zh', col)} AS s_zh
  FROM {table})
SELECT {id_col},
       CASE
         WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         WHEN s_fr > s_en AND s_fr > s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         WHEN s_es > s_en AND s_es > s_de AND s_es > s_fr AND s_es >= s_zh THEN 'es'
         WHEN s_zh > s_en AND s_zh > s_de AND s_zh > s_fr AND s_zh > s_es THEN 'zh'
         ELSE 'en'
       END AS lang_pred
FROM scores
ORDER BY {id_col}
"""


DOCS_LANG_ID_SQL = lang_id_sql("documents", "doc_id", "text")


# ---------------------------------------------------------------------------
# q_ann_cosine_topk — brute-force cosine top-5 for query vectors vec_id 0-3,
# DuckDB list_cosine_similarity (cast to DOUBLE — its float32 default would
# diverge from numpy float64) as the oracle.  cos is emitted as integer
# micro-cosine ``cos_e6 = floor(cos*1e6 + 0.5)`` on BOTH sides so the
# driver's exact value hash can't be tripped by float representation.


def _nonnull_vec_tbl(tbl: pa.Table, col: str = "embedding") -> pa.Table:
    """NULL embeddings (failed encode on a web corpus) drop out before any
    matrix stack — the mirrors' arithmetic over a NULL list yields NULL and
    excludes the row the same way."""
    return tbl.filter(pc.is_valid(tbl[col]))


def _nonnull_vec(ds: rd.Dataset, col: str = "embedding") -> rd.Dataset:
    return ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[col])), batch_format="pyarrow")


def _cos_e6(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5).astype(np.int64)


def ann_cosine_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from deduplicator_ray.functions.vector import brute_force_topk

    qtbl = _nonnull_vec_tbl(pq.read_table(_t(sf_dir, "embeddings")))
    qdf = qtbl.to_pandas()
    qdf = qdf[qdf["vec_id"] < 4].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy())
    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    out = brute_force_topk(ds, queries, qdf["vec_id"].to_numpy(), k=k)
    out["cos_e6"] = _cos_e6(out["cos"].to_numpy())
    return out[["query_id", "rank", "vec_id", "cos_e6"]].reset_index(drop=True)


ANN_COSINE_TOPK_SQL = """
SELECT query_id, rank, vec_id, cos_e6 FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         CAST(floor(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) * 1e6 + 0.5) AS BIGINT) AS cos_e6,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id
         ) AS rank
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id < 4 AND e.vec_id != q.vec_id
    AND q.embedding IS NOT NULL AND e.embedding IS NOT NULL)
WHERE rank <= 5
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# q_part_brand_revenue — partitioned hash join both-sides-large shape
# (lineitem ⋈ part on partkey via Dataset.join), grouped by brand.


def part_brand_revenue(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    li = dio.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def rev(t: pa.Table) -> pa.Table:
        cents = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        disc = np.floor(t["l_discount"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.Table.from_pydict(
            {"l_partkey": t["l_partkey"], "revenue_e4": pa.array(cents * (100 - disc))}
        )

    li = li.map_batches(rev, batch_format="pyarrow", batch_size=65536)
    part = dio.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    joined = li.join(
        part, join_type="inner", num_partitions=num_partitions,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    out = (
        joined.groupby("p_brand")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"), Count(alias_name="n_items"))
        .to_pandas()
    )
    return out.sort_values("p_brand").reset_index(drop=True)


PART_BRAND_REVENUE_SQL = """
SELECT p_brand,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_e4,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# q_supplier_balance — per-nation supplier account stats (small-table
# aggregate + broadcast name lookup).


def supplier_balance(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    nat = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    lookup_ref = ray.put((nat["n_nationkey"].combine_chunks(),
                          nat["n_name"].combine_chunks()))
    ds = dio.read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        c = np.floor(t["s_acctbal"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return t.append_column("bal_c", pa.array(c))

    agg = (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(Sum("bal_c", alias_name="total_bal_c"), Count(alias_name="n_suppliers"))
    )

    def attach(t: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        idx = pc.index_in(t["s_nationkey"].cast(keys.type), value_set=keys)
        vals = pc.fill_null(pc.take(names, idx), "")
        return t.append_column("n_name", vals)

    out = agg.map_batches(attach, batch_format="pyarrow").to_pandas()
    # DuckDB's // truncates toward zero (unlike Python's floor) — match it
    # with INTEGER arithmetic: float64 division loses low bits once the
    # cent total crosses 2^53 (plausible national aggregates at corpus
    # scale), so trunc-toward-zero is floor-div on the magnitudes with the
    # sign reapplied; balances can be negative
    num = (out["total_bal_c"].to_numpy(np.int64) * 100)
    den = out["n_suppliers"].to_numpy(np.int64)
    out["avg_bal_e4"] = np.sign(num) * (np.abs(num) // den)
    return out.sort_values("s_nationkey").reset_index(drop=True)[
        ["s_nationkey", "n_name", "total_bal_c", "avg_bal_e4", "n_suppliers"]
    ]


SUPPLIER_BALANCE_SQL = """
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       any_value(n_name) AS n_name,
       CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_bal_c,
       CAST((CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) * 100) // count(*) AS BIGINT) AS avg_bal_e4,
       count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


# ---------------------------------------------------------------------------
# q_nation_revenue — multi-way join (TPC-H Q5 shape): big⋈big partitioned
# hash join lineitem⋈orders on orderkey, then two broadcast dimension hops
# (customer→nationkey, nation→name) via ray.put lookups instead of shuffles.
# Scale note: customer is broadcast here because the testdata dimension is
# small; at 10^12-fact scale with a large customer dim, swap the broadcast
# for a second partitioned join on o_custkey — the aggregate stays the same.


def nation_revenue(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    import pyarrow.parquet as pq

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust_ref = ray.put((cust["c_custkey"].combine_chunks(),
                        cust["c_nationkey"].combine_chunks()))
    nation_name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))

    li = dio.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5)
        disc = np.floor(t["l_discount"].to_numpy(zero_copy_only=False) * 100 + 0.5)
        rev = (cents * (100 - disc)).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                           "rev_e4": rev})
        g = df.groupby("l_orderkey", as_index=False)["rev_e4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    li_agg = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("l_orderkey").aggregate(Sum("rev_e4", alias_name="rev_e4"))

    orders = dio.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    joined = li_agg.join(orders, join_type="inner", num_partitions=num_partitions,
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def to_nation(t: pa.Table) -> pa.Table:
        keys, nks = ray.get(cust_ref)
        idx = pc.index_in(t["o_custkey"].cast(keys.type), value_set=keys)
        nk = pc.fill_null(pc.take(nks, idx), -1).cast(pa.int64())
        df = pd.DataFrame({"n_nationkey": nk.to_numpy(zero_copy_only=False),
                           "rev_e4": t["rev_e4"].to_numpy(zero_copy_only=False)})
        g = df.groupby("n_nationkey", as_index=False)["rev_e4"].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = joined.map_batches(to_nation, batch_format="pyarrow") \
        .groupby("n_nationkey").aggregate(Sum("rev_e4", alias_name="revenue_e4"))
    df = agg.to_pandas()
    df["n_name"] = [nation_name.get(k, "") for k in df["n_nationkey"]]
    df = df.sort_values("n_nationkey").reset_index(drop=True)
    return df[["n_nationkey", "n_name", "revenue_e4"]]


NATION_REVENUE_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey,
       any_value(n_name) AS n_name,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q_orders_topk_per_group — grouped top-k (window-rank shape): top 3 orders
# by totalprice within each o_orderpriority.  The key cardinality is tiny
# (5 priorities) so a partitioned groupby would skew; instead each batch
# emits its local top-3 per priority (combiner) and the surviving ≤ 3·B rows
# collapse in one final per-group pass.


def orders_topk_per_group(sf_dir: str, k: int = 3) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["price_c"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = df.sort_values(["o_orderpriority", "price_c", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("o_orderpriority", sort=False).head(k)
        return pa.Table.from_pandas(
            out[["o_orderpriority", "o_orderkey", "price_c"]],
            preserve_index=False).replace_schema_metadata(None)

    reduced = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=65536)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderpriority", "price_c", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("o_orderpriority", sort=False).head(k).copy()
        out["rank"] = out.groupby("o_orderpriority", sort=False).cumcount() + 1
        return out

    # the combiner leaves ≤ k rows per priority per batch — tiny; one
    # single-partition pass finishes it deterministically
    out = reduced.repartition(1).map_batches(final_topk, batch_format="pandas").to_pandas()
    return out.sort_values(["o_orderpriority", "rank"]).reset_index(drop=True)[
        ["o_orderpriority", "rank", "o_orderkey", "price_c"]]


ORDERS_TOPK_PER_GROUP_SQL = """
SELECT o_orderpriority, rank, o_orderkey, price_c
FROM (SELECT o_orderpriority, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                                         o_orderkey) AS rank
      FROM orders)
WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""


# ---------------------------------------------------------------------------
# q_events_sessionize — stateful streaming-window analog: per-user session
# assignment with a 30-minute inactivity gap.  Partitioned groupby on
# user_id; inside each partition the gap/cumsum logic is fully vectorized
# (sort by (user, ts) → diff → break mask → cumsum).  SQL mirror uses
# lag()/sum() windows.


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = gap_minutes * 60_000_000

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        ts = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        new_user = np.empty(len(df), bool)
        new_user[0:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.empty(len(df), bool)
        gap_break[0:1] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = new_user | gap_break
        out = pd.DataFrame({"user_id": uid, "start": starts})
        g = out.groupby("user_id", as_index=False).agg(
            n_sessions=("start", "sum"), n_events=("start", "size"))
        g["n_sessions"] = g["n_sessions"].astype(np.int64)
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    out = partitioned_groupby(ds, ["user_id"], sessions, num_parts=16).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id,
       CAST(sum(is_start) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM marked
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q_lineitem_shipdate_head — global sort + limit: the earliest 100 shipments
# under a fully deterministic key.


def lineitem_shipdate_head(sf_dir: str, n: int = 100) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_orderkey", "l_linenumber"])
    out = ds.sort(["l_shipdate", "l_orderkey", "l_linenumber"]).limit(n).to_pandas()
    return out[["l_shipdate", "l_orderkey", "l_linenumber"]]


LINEITEM_SHIPDATE_HEAD_SQL = """
SELECT l_shipdate, l_orderkey, l_linenumber
FROM lineitem
ORDER BY l_shipdate, l_orderkey, l_linenumber
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q_emb_near_dup — embedding-cosine near-duplicate pairs.  The baseline
# scale path: normalize once per batch, matmul against the broadcast
# normalized matrix (ray.put once, read per task — NOT re-shipped per
# batch), emit pairs (a < b) above threshold.  O(n²/P) flops distributed
# over batches; the IVF-bucketed variant for larger n lives in
# functions/vector.py (ann_ivf_topk).  cos is emitted as integer
# micro-cosine on both sides so the driver value-hash is float-stable.


# ENFORCED scale limit for the exact-cosine oracle shapes: the broadcast
# matrix may hold at most this many float64 elements (2 GiB — a node's
# comfortable ray.put budget).  Above it the exact paths REFUSE with a
# pointer at the production alternatives (SRP-LSH banding, IVFPQ) rather
# than silently hazarding every worker's heap — same policy as
# _RARITY_BROADCAST_CAP for the vocab broadcast.
_EMB_BROADCAST_CAP_F64 = 1 << 28


def _emb_broadcast_guard(n_rows: int, dim: int, caller: str) -> None:
    if n_rows * max(dim, 1) > _EMB_BROADCAST_CAP_F64:
        raise ValueError(
            f"{caller}: exact-cosine broadcast matrix would hold "
            f"{n_rows}x{dim} float64 (> cap {_EMB_BROADCAST_CAP_F64} "
            "elements) — this oracle shape is for bounded corpora; use "
            "the scale paths (emb_srp_pairs SRP-LSH banding or "
            "ann_ivfpq_topk) instead")


def emb_near_dup(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    import pyarrow.parquet as pq

    tbl = _nonnull_vec_tbl(pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    ids_all = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()])
    _emb_broadcast_guard(*mat.shape, caller="emb_near_dup")
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids_all, mat))

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))

    def pairs(t: pa.Table) -> pa.Table:
        all_ids, m = ray.get(mat_ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        vecs = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = vecs @ m.T
        mask = (sims >= threshold) & (all_ids[None, :] > ids[:, None])
        ii, jj = np.nonzero(mask)
        return pa.Table.from_pydict(
            {"va": ids[ii],
             "vb": all_ids[jj],
             "cos_e6": np.floor(sims[ii, jj] * 1e6 + 0.5).astype(np.int64)},
            schema=pa.schema([("va", pa.int64()), ("vb", pa.int64()),
                              ("cos_e6", pa.int64())]))

    out = ds.map_batches(pairs, batch_format="pyarrow", batch_size=1024).to_pandas()
    return out.sort_values(["va", "vb"]).reset_index(drop=True)


EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS va, b.vec_id AS vb,
       CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1e6 + 0.5)
            AS BIGINT) AS cos_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
ORDER BY va, vb
"""


# ---------------------------------------------------------------------------
# q_emb_srp_pairs — SRP-LSH bucketed embedding near-dup: the LSH scale path
# for emb_near_dup (which is the O(n²) broadcast oracle shape).  Sign-random-
# projection banding (Charikar 2002; functions/vector.srp_band_keys) buckets
# vectors by DIRECTION with zero training, so the candidate set is
# near-linear and the index is append-trivial — the cosine complement of the
# image channel's dHash-slice banding.  Stage shape mirrors that channel:
# band rows (band, bkey, vec_id, all-band keys, float32 embedding) → ONE
# (band, bkey)-partitioned groupby → per-bucket exact float64 cosine verify
# with OWNER-BAND emission (a pair is emitted only by the first band where
# its keys agree), so no second dedup shuffle.  Scale notes: shuffle payload
# is nbands·dim·4 B per vector (the float32 embedding rides each band row);
# per-bucket verify is chunked so a hot bucket costs bounded memory; unlike
# IVF there is no trained state to drift on appends.  The DuckDB mirror
# replays the discrete bucket assignment from the seed as a sidecar
# (fixtures.srp_sidecar_path) and reduces the query to "exact cosine pairs
# restricted to co-bucketed candidates" — the engine's banded relation must
# equal it EXACTLY (verification is exact; only candidate generation is
# approximate, which the mirror reproduces bit-for-bit).


def emb_srp_pairs(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    from deduplicator_ray.functions import vector as vfn
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    nbands = vfn.SRP_BANDS
    out_schema = pa.schema([("va", pa.int64()), ("vb", pa.int64()),
                            ("cos_e6", pa.int64())])
    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))

    band_rows = vfn.srp_band_rows              # shared with state/srpstore

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"va": pd.Series([], dtype=np.int64),
                                 "vb": pd.Series([], dtype=np.int64),
                                 "cos_e6": pd.Series([], dtype=np.int64)})
        band = df["band"].to_numpy()
        bkey = df["bkey"].to_numpy()
        ids = df["vec_id"].to_numpy()
        keys = np.stack(df["allkeys"].to_numpy())
        emb = np.stack(df["emb"].to_numpy()).astype(np.float64)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        order = np.lexsort((bkey, band))
        band, bkey, ids = band[order], bkey[order], ids[order]
        keys, emb = keys[order], emb[order]
        starts = np.flatnonzero(
            np.r_[True, (band[1:] != band[:-1]) | (bkey[1:] != bkey[:-1])])
        bounds = np.r_[starts, len(band)]
        va, vb, ce6 = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            b_here = band[s]
            gi, gk, ge = ids[s:e], keys[s:e], emb[s:e]
            # chunked upper-triangle verify: a hot bucket costs bounded
            # memory (CH×k cosine block per step), flops stay exact
            for cs in range(0, k - 1, 1024):
                ciE = min(cs + 1024, k - 1)
                cos = ge[cs:ciE] @ ge.T                       # (c, k)
                ii, jj = np.nonzero(cos >= threshold)
                keep = jj > ii + cs                           # upper triangle
                ii, jj = ii[keep], jj[keep]
                if len(ii) == 0:
                    continue
                owner = np.argmax(gk[ii + cs] == gk[jj], axis=1)
                own = owner == b_here
                if not own.any():
                    continue
                ii, jj = ii[own], jj[own]
                a, b = gi[ii + cs], gi[jj]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                va.append(lo)
                vb.append(hi)
                ce6.append(np.floor(
                    cos[ii, jj] * 1e6 + 0.5).astype(np.int64))
        if not va:
            return pd.DataFrame({"va": pd.Series([], dtype=np.int64),
                                 "vb": pd.Series([], dtype=np.int64),
                                 "cos_e6": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"va": np.concatenate(va),
                             "vb": np.concatenate(vb),
                             "cos_e6": np.concatenate(ce6)})

    banded = ds.map_batches(band_rows, batch_format="pyarrow")
    pairs = partitioned_groupby(banded, ["band", "bkey"], verify,
                                out_schema=out_schema)
    out = _typed(pairs.to_pandas(), out_schema)
    return out.sort_values(["va", "vb"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# q_emb_cluster_update / q_emb_cluster_remove — incremental cluster
# maintenance for the EMBEDDING modality (the third modality of the fold/
# prune matrix beside docs and images).  The cluster relation is exact
# connected components over the cos ≥ 0.35 pair graph (emb_near_dup's
# edges); the engine never re-clusters the persisted side:
#   update — known 80% (vec_id % 5 != 0) clusters once (the persisted
#     checkpoint stand-in), the increment's EXACT delta edges (new↔new ∪
#     new↔known, streaming batch × broadcast-matrix matmul) fold in with
#     stages/components.incremental_cc_update;
#   remove — a deterministic bucket (vec_id % 7 == 3) retires from the
#     full assignment + edge set with incremental_cc_remove (re-clustering
#     only the affected components from their surviving edges).
# Node ids are zero-padded strings inside the CC machinery (so string
# min-label order == numeric order) and stripped back to int64 at the
# edge, making the mirror a plain numeric min-label recursive CTE.


def _emb_pad(v: np.ndarray) -> list[str]:
    return [f"{int(x):012d}" for x in v]


def _emb_aug_tbl(t: pa.Table, copies_only: bool = False) -> pa.Table:
    """Deterministic augmentation making the exact tier non-vacuous: verbatim
    copies of every vec_id % 37 == 0 row re-keyed to vec_id + 1_000_000
    (bit-identical embeddings — the copies ARE exact duplicates).  The SQL
    mirror derives the identical relation from the same parquet."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    sub = t.filter(pa.array(ids % 37 == 0))
    sub = sub.set_column(sub.schema.get_field_index("vec_id"), "vec_id",
                         pc.add(sub["vec_id"], 1_000_000))
    return sub if copies_only else pa.concat_tables([t, sub])


def _emb_exact_edges(sf_dir: str, keep_vec, pair_keep,
                     threshold: float = 0.35, aug: bool = False) -> rd.Dataset:
    """Dataset[(src, dst)] (zero-padded strings, src < dst numerically) of
    exact cosine pairs ≥ threshold.  ``keep_vec(ids) -> mask`` restricts
    the node universe; ``pair_keep(ids_rows, ids_cols) -> mask`` restricts
    emitted pairs (e.g. 'at least one endpoint new').  ``aug`` adds the
    deterministic %37-copy augmentation (emb_dedup_tiers) to both the
    broadcast matrix and the streamed side.  Broadcast-matrix matmul per
    batch — the documented oracle shape (emb_near_dup); the LSH/IVF paths
    are the approximate production alternatives."""
    import pyarrow.parquet as pq

    tbl = _nonnull_vec_tbl(pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    if aug:
        tbl = _emb_aug_tbl(tbl)
    ids_all = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, np.float64)
                    for v in tbl["embedding"].to_pylist()])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    keep = keep_vec(ids_all)
    ids_all, mat = ids_all[keep], mat[keep]
    _emb_broadcast_guard(*mat.shape, caller="_emb_exact_edges")
    ref = ray.put((ids_all, mat))

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    if aug:
        ds = ds.union(ds.map_batches(
            lambda t: _emb_aug_tbl(t, copies_only=True),
            batch_format="pyarrow"))
    schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def edges(t: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        bkeep = keep_vec(ids)
        ids = ids[bkeep]
        if not len(ids):
            return schema.empty_table()
        vecs = np.stack([np.asarray(v, np.float64)
                         for v in t["embedding"].to_pylist()])[bkeep]
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-12)
        sims = vecs @ m.T
        mask = ((sims >= threshold) & (all_ids[None, :] > ids[:, None])
                & pair_keep(ids[:, None], all_ids[None, :]))
        ii, jj = np.nonzero(mask)
        return pa.Table.from_pydict(
            {"src": _emb_pad(ids[ii]), "dst": _emb_pad(all_ids[jj])},
            schema=schema)

    return ds.map_batches(edges, batch_format="pyarrow", batch_size=1024)


_EMB_CLUSTER_SCHEMA = pa.schema([("vec_id", pa.int64()),
                                 ("cluster_id", pa.int64())])


def _emb_unpad(ds: rd.Dataset) -> pd.DataFrame:
    df = ds.to_pandas()
    if df.empty:
        return _typed(df, _EMB_CLUSTER_SCHEMA)
    node_col = "image_id" if "image_id" in df.columns else "vec_id"
    out = pd.DataFrame({
        "vec_id": df[node_col].astype(np.int64),
        "cluster_id": df["cluster_id"].astype(np.int64)})
    return out.sort_values("vec_id").reset_index(drop=True)


def emb_cluster_update(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_update,
    )

    cfg = PipelineConfig()
    known = _emb_exact_edges(
        sf_dir, lambda v: v % 5 != 0, lambda a, b: np.ones_like(a & b, bool))
    assign = connected_components(known, cfg)
    delta = _emb_exact_edges(
        sf_dir, lambda v: np.ones_like(v, bool),
        lambda a, b: (a % 5 == 0) | (b % 5 == 0))
    merged = incremental_cc_update(assign, delta, cfg)
    return _emb_unpad(merged)


def emb_cluster_remove(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.components import (
        connected_components,
        incremental_cc_remove,
    )
    import pyarrow.parquet as pq

    cfg = PipelineConfig()
    edges = _emb_exact_edges(
        sf_dir, lambda v: np.ones_like(v, bool),
        lambda a, b: np.ones_like(a & b, bool)).materialize()
    assign = connected_components(edges, cfg)
    ids = np.asarray(pq.read_table(_t(sf_dir, "embeddings"),
                                   columns=["vec_id"])["vec_id"].to_pylist(),
                     dtype=np.int64)
    removed = _emb_pad(ids[ids % 7 == 3])
    out = incremental_cc_remove(assign, edges, removed, cfg)
    return _emb_unpad(out)


def _emb_cc_labels(sf_dir: str):
    """Shared preamble of the emb training-loader surfaces: exact
    cos ≥ 0.35 edges → CC labels, plus the padded-string id projection of
    every non-null vector — extracted so emb_leakage_split and
    emb_sample_weights cannot drift apart in threshold or padding."""
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.components import connected_components

    cfg = PipelineConfig()
    edges = _emb_exact_edges(sf_dir, lambda v: np.ones_like(v, bool),
                             lambda a, b: np.ones_like(a & b, bool))
    labels = connected_components(edges, cfg)
    ids = _nonnull_vec(dio.read_parquet(_t(sf_dir, "embeddings"),
                                        columns=["vec_id", "embedding"]))

    def proj(t: pa.Table) -> pa.Table:
        v = np.asarray(t["vec_id"].to_pylist(), np.int64)
        return pa.table({"vec_id": pa.array(_emb_pad(v), pa.string())})

    return ids.map_batches(proj, batch_format="pyarrow"), labels


def emb_leakage_split(sf_dir: str, train_pct: int = 90) -> pd.DataFrame:
    """Near-dup-aware train/val split for the EMBEDDING modality — closes
    the leakage-split matrix (docs_leakage_split / img_leakage_split /
    here): every non-null vector gets a split assignment and all members
    of an exact cos ≥ 0.35 component share it.  The component machinery is
    the same padded-string CC the emb maintenance queries use (string
    min-label == numeric min), and the md5 bucket hashes the SAME
    zero-padded 12-digit key in both engines so DuckDB re-derives the
    identical assignment."""
    from deduplicator_ray.pipelines.doc_dedup import leakage_split_from_labels

    ids, labels = _emb_cc_labels(sf_dir)
    out = leakage_split_from_labels(
        ids, labels, id_col="vec_id", train_pct=train_pct).to_pandas()
    res = pd.DataFrame({
        "vec_id": out["vec_id"].astype(np.int64),
        "split_key": out["split_key"].astype(np.int64),
        "bucket": out["bucket"].astype(np.int64),
        "split": out["split"],
    })
    return res.sort_values("vec_id").reset_index(drop=True)


def emb_sample_weights(sf_dir: str) -> pd.DataFrame:
    """Dedup-aware sampling weights for the EMBEDDING modality — closes the
    weights matrix (docs_sample_weights / img_sample_weights / here):
    every non-null vector weighs 1e6 // its exact cos ≥ 0.35 component
    size.  Same padded-string CC machinery as emb_leakage_split (shared
    via _emb_cc_labels); keys cast back to int64 at the edge."""
    from deduplicator_ray.pipelines.doc_dedup import sample_weights_from_labels

    ids, labels = _emb_cc_labels(sf_dir)
    out = sample_weights_from_labels(ids, labels, id_col="vec_id").to_pandas()
    out = _typed(out, pa.schema([
        ("vec_id", pa.string()), ("weight_key", pa.string()),
        ("family_size", pa.int64()), ("weight_e6", pa.int64())]))
    res = pd.DataFrame({
        "vec_id": out["vec_id"].astype(np.int64),
        "weight_key": out["weight_key"].astype(np.int64),
        "family_size": out["family_size"].astype(np.int64),
        "weight_e6": out["weight_e6"].astype(np.int64),
    })
    return res.sort_values("vec_id").reset_index(drop=True)


_EMB_EDGES_CTE = """
  emb AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings{filt}
  ),
  edges AS MATERIALIZED (
    SELECT a.vec_id AS u, b.vec_id AS v
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.35
  ),
  e AS MATERIALIZED (
    SELECT u, v FROM edges UNION SELECT v, u FROM edges
  ),
  r(node, lbl) AS (
    SELECT u, u FROM e
    UNION
    SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
    WHERE r.lbl < e.u
  )
"""

# the fold must equal the full recompute — the clusters relation IS the
# oracle (same policy as docs_cluster_update / img_cluster_update)
EMB_CLUSTER_UPDATE_SQL = ("WITH RECURSIVE " + _EMB_EDGES_CTE.format(filt="")
                          + """
SELECT node AS vec_id, min(lbl) AS cluster_id FROM r
GROUP BY node ORDER BY vec_id
""")

# the prune relation: the full recompute over the SURVIVOR set
EMB_CLUSTER_REMOVE_SQL = ("WITH RECURSIVE "
                          + _EMB_EDGES_CTE.format(
                              filt=" WHERE vec_id % 7 != 3")
                          + """
SELECT node AS vec_id, min(lbl) AS cluster_id FROM r
GROUP BY node ORDER BY vec_id
""")


# cross-corpus form (persisted index, state/srpstore.py): new side =
# vec_id % 5 == 0, candidates are CROSS-side co-bucketed pairs only —
# the same portable split both engines can derive
EMB_CROSS_SRP_SQL = """
WITH cand AS (
  SELECT DISTINCT n.vec_id AS va, k.vec_id AS vb
  FROM '{srp}' n JOIN '{srp}' k
    ON n.band = k.band AND n.bkey = k.bkey
  WHERE n.vec_id % 5 = 0 AND k.vec_id % 5 != 0
)
SELECT c.va, c.vb,
       CAST(floor(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                         CAST(y.embedding AS DOUBLE[])) * 1e6 + 0.5)
            AS BIGINT) AS cos_e6
FROM cand c
JOIN embeddings x ON x.vec_id = c.va
JOIN embeddings y ON y.vec_id = c.vb
WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= 0.35
ORDER BY va, vb
"""


# mirror template: {srp} is the sidecar replay of the seeded bucket
# assignment (fixtures.srp_sidecar_path); candidates = DISTINCT co-bucketed
# pairs, verification identical to EMB_NEAR_DUP_SQL
EMB_SRP_PAIRS_SQL = """
WITH cand AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM '{srp}' a JOIN '{srp}' b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
)
SELECT c.va, c.vb,
       CAST(floor(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                         CAST(y.embedding AS DOUBLE[])) * 1e6 + 0.5)
            AS BIGINT) AS cos_e6
FROM cand c
JOIN embeddings x ON x.vec_id = c.va
JOIN embeddings y ON y.vec_id = c.vb
WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= 0.35
ORDER BY va, vb
"""


# ---------------------------------------------------------------------------
# q_emb_prototypicality — per-vector prototypicality score: cosine to the
# vector's own k-means bucket centroid.  The curation signal behind
# SemDeDup-style density pruning and noise triage: LOW scores are bucket
# outliers (mislabeled / noisy / off-distribution rows — prune or audit
# first), HIGH scores are redundant prototypes (downsample candidates).
# Scale shape: centroid training is a bounded-absolute-size sample on the
# driver (the same capped-sample kernel as the IVF index,
# functions/vector.py:138-157); the centroid matrix (n_centroids × dim,
# KB-scale) is broadcast once via ray.put; scoring is ONE streaming
# map_batches pass — no shuffle at all.  The mirror joins the sidecar
# replay of the model (fixtures.proto_sidecar_path: the seeded k-means is
# the one thing SQL cannot derive) and re-scores every row relationally.


def _proto_scores(sf_dir: str, n_centroids: int = 16):
    """(Dataset of (vec_id, bucket, proto_e6), schema) — shared by
    emb_prototypicality and emb_bucket_outliers."""
    from deduplicator_ray.functions import vector as vfn

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    out_schema = pa.schema([("vec_id", pa.int64()), ("bucket", pa.int64()),
                            ("proto_e6", pa.int64())])
    sample = vfn.sample_rows_absolute(ds, 65536)
    if len(sample) == 0:  # no decodable vectors at all → empty relation
        return rd.from_arrow(out_schema.empty_table()), out_schema
    cents = vfn.train_centroids(sample, n_centroids)
    c_ref = ray.put(cents)

    def score(t: pa.Table) -> pa.Table:
        from deduplicator_ray.functions import vector as vf

        c = ray.get(c_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xn = vf._normalize(vf.embeddings_matrix(t).astype(np.float64))
        sim = xn @ c.T
        b = np.argmax(sim, axis=1)
        # true cosine (the mirror's list_cosine_similarity includes the
        # centroid norm, which is 1 only up to float error)
        cn = np.linalg.norm(c, axis=1)
        proto = sim[np.arange(len(b)), b] / cn[b]
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(b.astype(np.int64)),
             pa.array(_cos_e6(proto))],
            schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=8192), out_schema


def emb_prototypicality(sf_dir: str, n_centroids: int = 16) -> pd.DataFrame:
    scored, schema = _proto_scores(sf_dir, n_centroids)
    out = _ds_to_pandas(scored, schema)
    return out.sort_values("vec_id").reset_index(drop=True)


EMB_PROTOTYPICALITY_SQL = """
WITH c AS (
  SELECT bucket, list(val ORDER BY dim) AS cvec
  FROM '{proto}/centroids.parquet' GROUP BY bucket
)
SELECT a.vec_id, a.bucket,
       CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                         c.cvec) * 1e6 + 0.5)
            AS BIGINT) AS proto_e6
FROM '{proto}/assign.parquet' a
JOIN embeddings e ON e.vec_id = a.vec_id
JOIN c ON c.bucket = a.bucket
ORDER BY a.vec_id
"""


def emb_bucket_outliers(sf_dir: str, n_centroids: int = 16,
                        bottom_k: int = 5) -> pd.DataFrame:
    """Bottom-k LEAST prototypical vectors per bucket — the audit-first
    queue (likely noise/mislabels).  Distributed shape: one
    bucket-partitioned groupby over the 3-int score rows (embeddings never
    move); rank = dense order by (proto_e6, vec_id) within bucket."""
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    scored, _ = _proto_scores(sf_dir, n_centroids)
    out_schema = pa.schema([("bucket", pa.int64()), ("vec_id", pa.int64()),
                            ("proto_e6", pa.int64()), ("rnk", pa.int64())])

    def bottom(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["bucket", "proto_e6", "vec_id"],
                            kind="mergesort")
        df["rnk"] = df.groupby("bucket", sort=False).cumcount() + 1
        return df.loc[df["rnk"] <= bottom_k,
                      ["bucket", "vec_id", "proto_e6", "rnk"]]

    out = _ds_to_pandas(
        partitioned_groupby(scored, ["bucket"], bottom,
                            out_schema=out_schema),
        out_schema)
    return out.sort_values(["bucket", "rnk"]).reset_index(drop=True)


EMB_BUCKET_OUTLIERS_SQL = """
WITH c AS (
  SELECT bucket, list(val ORDER BY dim) AS cvec
  FROM '{proto}/centroids.parquet' GROUP BY bucket
), scored AS (
  SELECT a.vec_id, a.bucket,
         CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) * 1e6 + 0.5)
              AS BIGINT) AS proto_e6
  FROM '{proto}/assign.parquet' a
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN c ON c.bucket = a.bucket
)
SELECT bucket, vec_id, proto_e6, rnk
FROM (
  SELECT *, CAST(row_number() OVER (
              PARTITION BY bucket ORDER BY proto_e6, vec_id)
            AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 5
ORDER BY bucket, rnk
"""


# ---------------------------------------------------------------------------
# q_docs_jaccard_pairs — exact n-gram (character 5-shingle) Jaccard near-dup
# pairs, brute force: every pair with J ≥ 0.8 over DISTINCT raw substrings
# (the un-hashed form of the LSH verify metric, value-checked against a
# DuckDB list-comprehension mirror).  Scale note: brute force is the oracle
# shape — at corpus scale the LSH path (doc_dup_pairs) produces the same
# pairs without the O(n²) compare; this query exists to value-check that
# claim (at sf0.01 both emit the identical 25 pairs).


def _ds_to_pandas(ds, schema: pa.Schema) -> pd.DataFrame:
    """Dataset.to_pandas that survives an ALL-EMPTY result: Ray 2.49 drops
    the (typed) schema when every block is empty, returning a 0-column
    frame — rebuild the typed empty from the known output schema so
    downstream sort/select never KeyErrors on a legitimately empty
    relation."""
    df = ds.to_pandas()
    if df.empty and list(df.columns) != list(schema.names):
        df = schema.empty_table().to_pandas()
    return df


def _shingle_set(text: str, k: int = 5) -> frozenset:
    if len(text) < k:
        return frozenset([text])
    return frozenset(text[i:i + k] for i in range(len(text) - k + 1))


def docs_jaccard_pairs(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    import pyarrow.parquet as pq

    tbl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    # NULL-text docs (failed downloads) carry no shingle set — the mirror's
    # list ops yield NULL for them, excluding them from every pair; a
    # str(None) here would weld all of them into fabricated "None" dups
    all_ids = np.asarray(
        [int(i) for i, t in zip(tbl["doc_id"].to_pylist(),
                                tbl["text"].to_pylist()) if t is not None],
        dtype=np.int64)
    all_sh = [_shingle_set(str(t)) for t in tbl["text"].to_pylist()
              if t is not None]
    ref = ray.put((all_ids, all_sh))

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    jac_schema = pa.schema([("va", pa.int64()), ("vb", pa.int64()),
                            ("jac_e6", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        ids_all, sh_all = ray.get(ref)
        pos = {int(i): p for p, i in enumerate(ids_all)}
        va, vb, je = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            p_a = pos.get(int(did))
            if p_a is None:  # null-text doc: no shingles, no pairs
                continue
            sa = sh_all[p_a]
            for p, other in enumerate(ids_all):
                if other <= did:
                    continue
                sb = sh_all[p]
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= threshold:
                    va.append(int(did))
                    vb.append(int(other))
                    je.append(int(np.floor(jac * 1e6 + 0.5)))
        return pa.Table.from_pydict(
            {"va": va, "vb": vb, "jac_e6": je}, schema=jac_schema)

    out = _ds_to_pandas(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=256),
        jac_schema)
    return out.sort_values(["va", "vb"]).reset_index(drop=True)


DOCS_JACCARD_PAIRS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        FOR i IN range(1, greatest(len(text) - 3, 2))]) AS sh
  FROM documents
)
SELECT va, vb,
       CAST(floor(i::DOUBLE / (la + lb - i) * 1e6 + 0.5) AS BIGINT) AS jac_e6
FROM (
  SELECT a.doc_id AS va, b.doc_id AS vb,
         len(list_intersect(a.sh, b.sh)) AS i,
         len(a.sh) AS la, len(b.sh) AS lb
  FROM d a JOIN d b ON a.doc_id < b.doc_id)
WHERE i::DOUBLE / (la + lb - i) >= 0.8
ORDER BY va, vb
"""


# ---------------------------------------------------------------------------
# q_docs_containment_pairs — DIRECTED shingle-containment near-dup pairs:
# C(a→b) = |Sa ∩ Sb| / |Sa| ≥ 0.9 over distinct character CONT_K=8-shingles
# (LARGER than Jaccard's 5: quote detection wants shingles long enough to be
# corpus-rare — at k=5 this synthetic word-salad corpus is pathologically
# dense, nearly every doc pair shares a shingle and prefix filtering drowns
# in 14M candidates at sf0.1; at k=8 candidates track true dup density).  The
# asymmetric complement of Jaccard: a short document quoted verbatim inside
# a long one has high containment but low Jaccard (the size ratio caps J at
# |Sa|/|Sb|), so symmetric MinHash-LSH dedup structurally misses
# quote/subset duplication — a real gap for training-data curation
# (contained docs add no information but inflate the symmetric-dedup-clean
# corpus).  Two engine paths share one mirror:
#   * docs_containment_pairs — brute force over a broadcast shingle table
#     (the oracle shape, like docs_jaccard_pairs);
#   * docs_containment_pairs_prefix — the SCALE shape: prefix-filtered
#     candidate join (Chaudhuri/Bayardo prefix filtering).  If C(a→b) ≥ t
#     then at most (1-t)·|Sa| of a's shingles are absent from b, so ANY
#     ⌊(1-t)·|Sa|⌋+1 of them must hit b — emit only that many PROBE rows per
#     doc (by ascending shingle hash, an arbitrary-but-global order), join
#     them against the full shingle index by hash partition, and verify the
#     survivors exactly.  100% recall by pigeonhole; hash collisions only
#     ADD candidates.  Production refinement (documented, not needed at sf):
#     order prefixes by ascending global shingle frequency so hot shingles
#     ("&nbsp;", " the ") stay out of probe prefixes, and cap+log hot index
#     buckets.
# Shingle hashes are byte-window polynomial hashes (functions.text); byte
# and character shingles coincide on this corpus (ASCII; verified) and the
# exact verify uses true character shingles, matching the SQL mirror.


CONT_K = 8  # containment shingle width (see block comment above)


def _containment_verify(threshold: float, k: int = CONT_K):
    """Per-partition exact containment verify for ``pair_text_join``:
    receives (src, dst, text_a, text_b) pairs, emits (src, dst, cont_e6)
    where C(a→b) = |Sa ∩ Sb| / |Sa| ≥ threshold.  Shingle sets are cached
    per (SIDE, doc id) within the partition: the src and dst sides may be
    INDEPENDENTLY numbered corpora (the persisted cross-corpus probe,
    state/contstore.py), where a bare-id cache would hand side a's text
    to a same-numbered side-b doc and fabricate containment 1.0
    (review-found silent data loss).  This is THE single home of the
    containment predicate — contstore wraps it rather than copying it."""
    def verify(full: pd.DataFrame) -> pd.DataFrame:
        cache: dict[tuple[str, int], frozenset] = {}

        def sh(side: str, doc: int, txt) -> frozenset:
            key = (side, doc)
            s = cache.get(key)
            if s is None:
                s = _shingle_set(str(txt), k=k)
                cache[key] = s
            return s

        src, dst, ce = [], [], []
        for a, b, ta, tb in zip(full["src"], full["dst"],
                                full["text_a"], full["text_b"]):
            sa = sh("a", int(a), ta)
            cont = len(sa & sh("b", int(b), tb)) / len(sa)
            if cont >= threshold:
                src.append(int(a))
                dst.append(int(b))
                ce.append(int(np.floor(cont * 1e6 + 0.5)))
        return pd.DataFrame({"src": np.asarray(src, np.int64),
                             "dst": np.asarray(dst, np.int64),
                             "cont_e6": np.asarray(ce, np.int64)})

    return verify


def docs_containment_pairs(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    import pyarrow.parquet as pq

    tbl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    # NULL-text docs excluded, matching the mirror's NULL list semantics
    # and the prefix path's null-drop (see docs_jaccard_pairs note)
    all_ids = np.asarray(
        [int(i) for i, t in zip(tbl["doc_id"].to_pylist(),
                                tbl["text"].to_pylist()) if t is not None],
        dtype=np.int64)
    all_sh = [_shingle_set(str(t), k=CONT_K) for t in tbl["text"].to_pylist()
              if t is not None]
    ref = ray.put((all_ids, all_sh))

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    cont_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                             ("cont_e6", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        ids_all, sh_all = ray.get(ref)
        pos = {int(i): p for p, i in enumerate(ids_all)}
        src, dst, ce = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            p_a = pos.get(int(did))
            if p_a is None:
                continue
            sa = sh_all[p_a]
            for p, other in enumerate(ids_all):
                if int(other) == int(did):
                    continue
                cont = len(sa & sh_all[p]) / len(sa)
                if cont >= threshold:
                    src.append(int(did))
                    dst.append(int(other))
                    ce.append(int(np.floor(cont * 1e6 + 0.5)))
        return pa.Table.from_pydict(
            {"src": src, "dst": dst, "cont_e6": ce}, schema=cont_schema)

    out = _ds_to_pandas(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=256),
        cont_schema)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def docs_containment_pairs_prefix(sf_dir: str,
                                  threshold: float = 0.9) -> pd.DataFrame:
    """Prefix-filtered containment join (see block comment above), with
    FREQUENCY-ORDERED prefixes (the canonical PPJoin ordering): probe
    shingles are each doc's rarest-by-global-document-frequency, so a hot
    shingle (" the ") almost never probes and candidate volume tracks the
    true near-dup density instead of the hottest posting list.  Measured
    at sf0.1: 88 s → single-digit seconds vs the hash-ordered prefix.

    Stages (all narrow int rows): shingle rows → ONE sh-partitioned groupby
    annotates global df → ONE doc-partitioned groupby marks each doc's
    ⌊(1-t)·|Sa|⌋+1 rarest shingles as probes → ONE sh-partitioned groupby
    joins probes×index → pair dedup → exact verify.  Recall is pigeonhole-
    exact under ANY global shingle order; (df, sh) is one.  The exact
    verify is a partitioned two-sided text join (stages.textjoin): both
    documents' texts are pulled onto the pair's partition through two
    keyed exchanges — no ray.put of any corpus-sized structure
    (tests/test_queries_containment.py pins the no-broadcast contract)."""
    from deduplicator_ray.functions import text as textfn
    from deduplicator_ray.stages.partitioned import (
        drop_duplicates,
        partitioned_groupby,
    )
    from deduplicator_ray.stages.textjoin import pair_text_join

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    row_schema = pa.schema([("sh", pa.int64()), ("doc_id", pa.int64()),
                            ("p", pa.int64())])

    def shingle_rows(t: pa.Table) -> pa.Table:
        sh, did, pb = [], [], []
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            txt = str(txt or "")
            # CHAR-shingle hashes: the pigeonhole bound below counts CHAR
            # windows, so the hashed space must match (byte-window hashing
            # breaks recall on multi-byte text — see
            # char_shingle_hashes_chars)
            h = textfn.char_shingle_hashes_chars(
                txt, k=CONT_K).view(np.int64)
            # prefix bound from the TOTAL window count (≥ distinct |Sa|):
            # safe upper bound, immune to hash-collision undercounting
            n_windows = max(len(txt) - (CONT_K - 1), 1)
            p = min(int(np.floor((1.0 - threshold) * n_windows)) + 1, len(h))
            sh.append(h)
            did.append(np.full(len(h), int(d), np.int64))
            pb.append(np.full(len(h), p, np.int64))
        if not sh:
            return pa.Table.from_batches([], schema=row_schema)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(sh)), pa.array(np.concatenate(did)),
             pa.array(np.concatenate(pb))],
            schema=row_schema)

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")

    df_schema = pa.schema([("sh", pa.int64()), ("doc_id", pa.int64()),
                           ("p", pa.int64()), ("df", pa.int64())])

    def annotate_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["df"] = df.groupby("sh", sort=False)["sh"].transform(
            "size").astype(np.int64)
        return df

    probe_schema = pa.schema([("sh", pa.int64()), ("doc_id", pa.int64()),
                              ("probe", pa.int8())])

    def mark_probes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "df", "sh"], kind="mergesort")
        rank = df.groupby("doc_id", sort=False).cumcount()
        out = df[["sh", "doc_id"]].copy()
        out["probe"] = (rank < df["p"]).to_numpy().astype(np.int8)
        return out

    marked = partitioned_groupby(
        partitioned_groupby(rows, ["sh"], annotate_df, out_schema=df_schema),
        ["doc_id"], mark_probes, out_schema=probe_schema)

    cand_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        probes = df.loc[df["probe"] == 1, ["sh", "doc_id"]]
        if probes.empty:
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64)})
        m = probes.merge(df[["sh", "doc_id"]], on="sh",
                         suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] != m["doc_id_b"]]
        out = m[["doc_id_a", "doc_id_b"]].drop_duplicates()
        out.columns = ["src", "dst"]
        return out

    cands = partitioned_groupby(marked, ["sh"], emit_pairs,
                                out_schema=cand_schema)
    cands = drop_duplicates(cands, ["src", "dst"])

    # exact verify (character shingles — the mirror's metric) as a
    # partitioned two-exchange join: texts meet their pairs per partition
    out_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                            ("cont_e6", pa.int64())])

    out = _ds_to_pandas(
        pair_text_join(cands, ds, ds,
                       _containment_verify(threshold), out_schema),
        out_schema)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


DOCS_CONTAINMENT_PAIRS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 8)
                        FOR i IN range(1, greatest(len(text) - 6, 2))]) AS sh
  FROM documents
)
SELECT src, dst,
       CAST(floor(i::DOUBLE / la * 1e6 + 0.5) AS BIGINT) AS cont_e6
FROM (
  SELECT a.doc_id AS src, b.doc_id AS dst,
         len(list_intersect(a.sh, b.sh)) AS i,
         len(a.sh) AS la
  FROM d a JOIN d b ON a.doc_id <> b.doc_id)
WHERE i::DOUBLE / la >= 0.9
ORDER BY src, dst
"""


def docs_contained_drop(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """The ACTIONABLE closure of the containment relation: per-doc
    keep/drop decision table.  A doc drops when it is shingle-contained
    (C ≥ t) in a DOMINATING doc — strictly more shingles, or equal
    shingles with a smaller id (the deterministic tie-break that keeps
    exactly one member of a mutual-containment pair).  No iteration
    needed: dominance is a strict partial order, so the maximal elements
    of every containment chain survive in one pass.

    Scale shape: the pair relation is tiny next to the corpus (near-dup
    sparsity), so the dominated→witness map broadcasts via ray.put and the
    decision pass is one streaming map_batches over (doc_id) — text never
    moves.  Witness = the dominating doc with most shingles, tie-broken by
    smallest id."""
    import pyarrow.parquet as pq

    pairs = docs_containment_pairs_prefix(sf_dir, threshold)

    tbl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    sizes = {int(i): len(_shingle_set(str(t), k=CONT_K))
             for i, t in zip(tbl["doc_id"].to_pylist(),
                             tbl["text"].to_pylist())}
    dom: dict[int, tuple[int, int]] = {}  # src -> (lb, -dst) best witness
    for a, b in zip(pairs["src"].to_numpy(), pairs["dst"].to_numpy()):
        a, b = int(a), int(b)
        la, lb = sizes[a], sizes[b]
        if la < lb or (la == lb and a > b):
            best = dom.get(a)
            if best is None or (lb, -b) > best:
                dom[a] = (lb, -b)
    witness = {a: -nb for a, (_lb, nb) in dom.items()}
    w_ref = ray.put(witness)

    out_schema = pa.schema([("doc_id", pa.int64()), ("action", pa.string()),
                            ("contained_in", pa.int64())])
    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def decide(t: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        act = np.where(np.fromiter((int(i) in w for i in ids), bool,
                                   count=len(ids)),
                       "drop_contained", "keep")
        cin = np.fromiter((w.get(int(i), -1) for i in ids), np.int64,
                          count=len(ids))
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(act.astype(object)), pa.array(cin)],
            schema=out_schema)

    out = _ds_to_pandas(ds.map_batches(decide, batch_format="pyarrow"),
                        out_schema)
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_CONTAINED_DROP_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 8)
                        FOR i IN range(1, greatest(len(text) - 6, 2))]) AS sh
  FROM documents
), p AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, len(b.sh) AS lb
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) >= 0.9
    AND (len(a.sh) < len(b.sh)
         OR (len(a.sh) = len(b.sh) AND a.doc_id > b.doc_id))
), w AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY lb DESC, dst) AS rn
    FROM p)
  WHERE rn = 1
)
SELECT doc_id,
       CASE WHEN w.src IS NOT NULL THEN 'drop_contained' ELSE 'keep' END
         AS action,
       COALESCE(w.dst, -1) AS contained_in
FROM documents LEFT JOIN w ON w.src = doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_orders_without_lineitems — ANTI-join (the reference's known-paths skip,
# J1/dupedb.py:190-194, as a relational op): orders with no lineitem.  The
# key set of the smaller side is broadcast once via ray.put and applied as a
# vectorized membership filter — no shuffle.  At big-big scale swap for the
# partitioned merge with how="left_anti".


def orders_without_lineitems(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    li_keys = pq.read_table(_t(sf_dir, "lineitem"), columns=["l_orderkey"])
    keys_ref = ray.put(li_keys["l_orderkey"].unique())

    orders = dio.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderstatus"])

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pc.invert(pc.is_in(t["o_orderkey"].cast(keys.type),
                                  value_set=keys))
        return t.filter(mask)

    out = orders.map_batches(anti, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


ORDERS_WITHOUT_LINEITEMS_SQL = """
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# q_docs_purge_semijoin — SEMI-join (the reference's --purge whitelist,
# J2/dupedb.py:159-173): keep only documents whose id appears in a derived
# whitelist (here: doc ids referenced by en-language rows of the same
# table — a stand-in for "the current scan's glob").


def docs_purge_semijoin(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    wl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    keep_ref = ray.put(
        wl.filter(pc.equal(wl["lang"], "en"))["doc_id"].unique())

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "source", "n_chars"])

    def semi(t: pa.Table) -> pa.Table:
        keys = ray.get(keep_ref)
        mask = pc.is_in(t["doc_id"].cast(keys.type), value_set=keys)
        return t.filter(mask)

    out = docs.map_batches(semi, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_PURGE_SEMIJOIN_SQL = """
SELECT doc_id, source, n_chars
FROM documents
WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_substring_dup — suffix-array-style substring dedup (ExactSubstr
# semantics, Lee et al. ACL 2022): maximal spans of ≥8-token windows that
# duplicate earlier corpus content.  The Ray side is the windowed-fingerprint
# pipeline (pipelines/substring.py: hash pass → dup-set → exact verify →
# span merge); the mirror recomputes the identical semantics with window
# strings directly — value-exact because the engine verifies hash candidates
# against exact window text before marking.

SUBSTRING_K = 8


def docs_substring_dup(sf_dir: str, k: int = SUBSTRING_K) -> pd.DataFrame:
    from deduplicator_ray.pipelines.substring import substring_dup_spans

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = substring_dup_spans(ds, k=k).to_pandas()
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def docs_substring_dup_shuffle(sf_dir: str, k: int = SUBSTRING_K) -> pd.DataFrame:
    """Same spans via the NO-BROADCAST strategy (substring.py P2-shuffle):
    the dup-hash set never materializes on any single node — the 10^12-row
    path — so the driver value-checks both strategies against one mirror."""
    from deduplicator_ray.pipelines.substring import substring_dup_spans

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = substring_dup_spans(ds, k=k, strategy="shuffle").to_pandas()
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


DOCS_SUBSTRING_DUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
wins AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         array_to_string(t[u.i:u.i + {SUBSTRING_K - 1}], ' ') AS win
  FROM toks, UNNEST(range(1, greatest(len(t) - {SUBSTRING_K} + 2, 1))) u(i)
),
dup AS (
  SELECT win FROM wins GROUP BY win HAVING count(*) > 1
),
occ AS (
  SELECT w.doc_id, w.pos,
         row_number() OVER (PARTITION BY w.win ORDER BY w.doc_id, w.pos) AS rn
  FROM wins w JOIN dup USING (win)
),
dup_occ AS (SELECT doc_id, pos FROM occ WHERE rn > 1),
gaps AS (
  SELECT doc_id, pos,
         lag(pos, 1, -1000000) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
  FROM dup_occ
),
islands AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN pos - prev_pos <= {SUBSTRING_K} THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM gaps
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {SUBSTRING_K} AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM islands
GROUP BY doc_id, isl
ORDER BY doc_id, span_start
"""


def docs_substring_trim(sf_dir: str, k: int = SUBSTRING_K) -> pd.DataFrame:
    """The ACTIONABLE output of substring dedup: each document with its
    duplicated spans REMOVED (ExactSubstr keep-first-occurrence semantics —
    tokens [span_start, span_end) delete, the rest re-join) plus the
    trimmed-token count.  docs_substring_dup is the decision table; this
    applies it.

    Scale shape: the span table (bounded by duplicated content) unions
    with the docs projection, ONE doc_id-partitioned groupby co-locates
    each doc with its spans, and the trim is applied per partition
    (string surgery is inherently per-doc; everything around it —
    span discovery, the union, the shuffle — stays vectorized/1-pass).
    Docs without spans pass through untrimmed."""
    from deduplicator_ray.pipelines.substring import substring_dup_spans

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = _typed(trim_spans(ds, substring_dup_spans(ds, k=k)).to_pandas(),
                 TRIM_SCHEMA)
    return out.sort_values("doc_id").reset_index(drop=True)


TRIM_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("trimmed_text", pa.string()),
                         ("n_trimmed_tokens", pa.int64())])


def trim_spans(ds: rd.Dataset, spans: rd.Dataset) -> rd.Dataset:
    """Apply a (doc_id, span_start, span_end) token-span table to a
    (doc_id, text) dataset: spans delete, the rest re-joins — shared by
    docs_substring_trim and the `cli curate` job."""
    out_schema = TRIM_SCHEMA  # one schema for query typing AND groupby out
    union_schema = pa.schema([("doc_id", pa.int64()),
                              ("span_start", pa.int64()),
                              ("span_end", pa.int64()),
                              ("text", pa.string())])

    def tag_docs(t: pa.Table) -> pa.Table:
        n = len(t)
        # NULL text (failed download) → "" so the doc keeps its trim row
        # as (doc_id, '', 0) like the mirror, instead of crashing trim()
        return pa.Table.from_arrays(
            [t["doc_id"].cast(pa.int64()),
             pa.array(np.full(n, -1, np.int64)),
             pa.array(np.full(n, -1, np.int64)),
             pc.fill_null(t["text"].cast(pa.string()), "")],
            schema=union_schema)

    def tag_spans(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.Table.from_arrays(
            [t["doc_id"].cast(pa.int64()),
             t["span_start"].cast(pa.int64()),
             t["span_end"].cast(pa.int64()),
             pa.array([""] * n, pa.string())],
            schema=union_schema)

    rows = (ds.map_batches(tag_docs, batch_format="pyarrow")
            .union(spans.map_batches(tag_spans, batch_format="pyarrow")))

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "trimmed_text": pd.Series([], dtype=str),
                "n_trimmed_tokens": pd.Series([], dtype=np.int64)})
        is_doc = df["span_start"].to_numpy() == -1
        spans_by_doc: dict[int, list[tuple[int, int]]] = {}
        for d, s, e in zip(df["doc_id"].to_numpy()[~is_doc],
                           df["span_start"].to_numpy()[~is_doc],
                           df["span_end"].to_numpy()[~is_doc]):
            spans_by_doc.setdefault(int(d), []).append((int(s), int(e)))
        out_id, out_txt, out_n = [], [], []
        for d, txt in zip(df["doc_id"].to_numpy()[is_doc],
                          df["text"].to_numpy()[is_doc]):
            toks = txt.split(" ")
            cuts = spans_by_doc.get(int(d))
            if not cuts:
                out_id.append(int(d))
                out_txt.append(txt)
                out_n.append(0)
                continue
            keep = np.ones(len(toks), bool)
            for s, e in cuts:  # 1-based [s, e) token interval
                keep[s - 1:min(e - 1, len(toks))] = False
            kept = [t for t, m in zip(toks, keep) if m]
            out_id.append(int(d))
            out_txt.append(" ".join(kept))
            out_n.append(int((~keep).sum()))
        return pd.DataFrame({"doc_id": np.asarray(out_id, np.int64),
                             "trimmed_text": out_txt,
                             "n_trimmed_tokens": np.asarray(out_n, np.int64)})

    return partitioned_groupby(rows, ["doc_id"], trim,
                               out_schema=out_schema)


_SUBSTRING_SPANS_CTE = DOCS_SUBSTRING_DUP_SQL[
    DOCS_SUBSTRING_DUP_SQL.index("WITH"):DOCS_SUBSTRING_DUP_SQL.rindex(
        "SELECT doc_id,")]

DOCS_SUBSTRING_TRIM_SQL = (_SUBSTRING_SPANS_CTE + f"""
, spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {SUBSTRING_K} AS span_end
  FROM islands GROUP BY doc_id, isl
),
tok_idx AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i, t[u.i] AS tok
  FROM toks, UNNEST(range(1, len(t) + 1)) u(i)
),
covered AS (
  SELECT DISTINCT ti.doc_id, ti.i
  FROM tok_idx ti JOIN spans s
    ON s.doc_id = ti.doc_id AND ti.i >= s.span_start AND ti.i < s.span_end
),
kept AS (
  SELECT ti.doc_id, ti.i, ti.tok
  FROM tok_idx ti LEFT JOIN covered c ON c.doc_id = ti.doc_id AND c.i = ti.i
  WHERE c.i IS NULL
)
SELECT d.doc_id,
       COALESCE(k.txt, '') AS trimmed_text,
       CAST(COALESCE(cv.n, 0) AS BIGINT) AS n_trimmed_tokens
FROM documents d
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt
           FROM kept GROUP BY doc_id) k USING (doc_id)
LEFT JOIN (SELECT doc_id, count(*) AS n FROM covered GROUP BY doc_id) cv
  USING (doc_id)
ORDER BY d.doc_id
""")


# ---------------------------------------------------------------------------
# Mirrors for the LSH doc pipelines.  The LSH path must recover EXACTLY the
# brute-force pair set (banding proposes, exact Jaccard verifies, and at
# 16 bands × 8 rows the measured recall on this corpus is 1.0 — golden
# tested), so exact SQL is a legitimate oracle: any LSH miss becomes a
# driver value-hash failure, which is precisely what we want watched.

DOCS_DUP_PAIRS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        FOR i IN range(1, greatest(len(text) - 3, 2))]) AS sh
  FROM documents
)
SELECT src, dst FROM (
  SELECT CAST(a.doc_id AS VARCHAR) AS src, CAST(b.doc_id AS VARCHAR) AS dst,
         len(list_intersect(a.sh, b.sh)) AS i,
         len(a.sh) AS la, len(b.sh) AS lb
  FROM d a JOIN d b
    ON CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR))
WHERE i::DOUBLE / (la + lb - i) >= 0.8
ORDER BY src, dst
"""

# shared CC-label CTE chain (5-gram shingles, exact Jaccard >= 0.8,
# min-label recursive components) — the relational re-derivation of
# doc_clusters, reused by the keeper-election mirror below
# shared near-dup EDGE derivation (5-gram shingles, exact Jaccard >= 0.8,
# symmetric closure) — used by the CC/keeper mirrors (with the recursive
# label CTE appended) and by the PageRank mirror (plain chained rounds)
_DOCS_EDGE_CTES = """
WITH RECURSIVE d AS MATERIALIZED (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        FOR i IN range(1, greatest(len(text) - 3, 2))]) AS sh
  FROM documents
),
e0 AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: without it DuckDB re-evaluates this
  -- O(n²) list_intersect join on EVERY recursion round (measured 240 s
  -- vs ~25 s at sf0.01); '<' halves the pair count and the projected
  -- subquery evaluates the intersect once per pair
  SELECT u, v FROM (
    SELECT CAST(a.doc_id AS VARCHAR) AS u, CAST(b.doc_id AS VARCHAR) AS v,
           len(list_intersect(a.sh, b.sh)) AS i,
           len(a.sh) AS la, len(b.sh) AS lb
    FROM d a JOIN d b ON a.doc_id < b.doc_id)
  WHERE i::DOUBLE / (la + lb - i) >= 0.8
),
e AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
)
"""

_DOCS_CC_CTES = _DOCS_EDGE_CTES + """
, r(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
  WHERE r.lbl < e.u
)
"""

DOCS_CLUSTERS_SQL = _DOCS_CC_CTES + """
SELECT node AS doc_id, min(lbl) AS cluster_id
FROM r GROUP BY node ORDER BY doc_id
"""

# per-cluster keeper election (doc-side T1/A4 analog): keep the longest
# member, tie-break ascending doc_id STRING (both sides order the same
# VARCHAR-cast key, so '10' < '9' lexical order is shared)
DOCS_KEEP_BEST_SQL = _DOCS_CC_CTES + """
, lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node)
SELECT l.doc_id, l.cluster_id,
       CASE WHEN row_number() OVER (
              PARTITION BY l.cluster_id
              ORDER BY len(dd.text) DESC, l.doc_id) = 1
            THEN 'keep' ELSE 'drop' END AS action
FROM lab l JOIN documents dd ON CAST(dd.doc_id AS VARCHAR) = l.doc_id
ORDER BY l.doc_id
"""

# dedup-aware sampling weights (doc modality): every document weighs
# 1e6 // its near-dup family size; singletons key on their own id — the
# relational twin of mirrors.SAMPLE_WEIGHTS_SQL on the image side
DOCS_SAMPLE_WEIGHTS_SQL = _DOCS_CC_CTES + """
, lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node),
asg AS (
  SELECT CAST(dd.doc_id AS VARCHAR) AS doc_id,
         coalesce(l.cluster_id, CAST(dd.doc_id AS VARCHAR)) AS weight_key
  FROM documents dd
  LEFT JOIN lab l ON l.doc_id = CAST(dd.doc_id AS VARCHAR)),
sz AS (SELECT weight_key, count(*) AS n FROM asg GROUP BY weight_key)
SELECT doc_id, weight_key,
       CAST(n AS BIGINT) AS family_size,
       CAST(1000000 // n AS BIGINT) AS weight_e6
FROM asg JOIN sz USING (weight_key)
ORDER BY doc_id
"""


# cross-source near-dup resolution: within each near-dup component keep
# the member from the most trusted source (numeric rank in 'srcN', lower
# wins; ties on ascending doc_id string) — the multi-corpus merge policy,
# same election shape as keep-best with a pluggable policy key
DOCS_SOURCE_PRIORITY_SQL = _DOCS_CC_CTES + """
, lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node)
SELECT l.doc_id, l.cluster_id, dd.source,
       CASE WHEN row_number() OVER (
              PARTITION BY l.cluster_id
              ORDER BY CAST(substr(dd.source, 4) AS BIGINT), l.doc_id) = 1
            THEN 'keep' ELSE 'drop' END AS action
FROM lab l JOIN documents dd ON CAST(dd.doc_id AS VARCHAR) = l.doc_id
ORDER BY l.doc_id
"""

# near-dup-aware train/val split: the whole component shares one split
# (split key = min-label cluster id; singletons key on their own id), so
# no near-dup pair straddles the boundary.  Bucket = first 32 md5 bits of
# the key mod 100 — DuckDB's hex-literal BIGINT cast computes the exact
# same value as Python's int(md5(k)[:8], 16), so the assignment is
# engine-independent.
LEAKAGE_TRAIN_PCT = 90

# embedding-modality split assignment re-derived relationally: same
# component labels as the emb maintenance mirrors, same zero-padded md5
# key both engines hash
EMB_LEAKAGE_SPLIT_SQL = (
    "WITH RECURSIVE " + _EMB_EDGES_CTE.format(filt="") + f"""
, lab AS (SELECT node AS vec_id, min(lbl) AS cluster_id FROM r GROUP BY node),
base AS (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL),
asg AS (
  SELECT b.vec_id, coalesce(l.cluster_id, b.vec_id) AS split_key
  FROM base b LEFT JOIN lab l USING (vec_id))
SELECT vec_id, CAST(split_key AS BIGINT) AS split_key,
       CAST(('0x' || substr(md5(lpad(CAST(split_key AS VARCHAR), 12, '0')),
                            1, 8)) AS BIGINT) % 100 AS bucket,
       CASE WHEN CAST(('0x' || substr(md5(lpad(CAST(split_key AS VARCHAR),
                                              12, '0')), 1, 8)) AS BIGINT)
                 % 100 < {LEAKAGE_TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split
FROM asg ORDER BY vec_id
""")


EMB_SAMPLE_WEIGHTS_SQL = (
    "WITH RECURSIVE " + _EMB_EDGES_CTE.format(filt="") + """
, lab AS (SELECT node AS vec_id, min(lbl) AS cluster_id FROM r GROUP BY node),
base AS (SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL),
asg AS (
  SELECT b.vec_id,
         CAST(coalesce(l.cluster_id, b.vec_id) AS BIGINT) AS weight_key
  FROM base b LEFT JOIN lab l USING (vec_id)),
sz AS (SELECT weight_key, count(*) AS n FROM asg GROUP BY weight_key)
SELECT vec_id, weight_key,
       CAST(n AS BIGINT) AS family_size,
       CAST(1000000 // n AS BIGINT) AS weight_e6
FROM asg JOIN sz USING (weight_key)
ORDER BY vec_id
""")


DOCS_LEAKAGE_SPLIT_SQL = _DOCS_CC_CTES + f"""
, lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node),
assigned AS (
  SELECT CAST(dd.doc_id AS VARCHAR) AS doc_id,
         coalesce(l.cluster_id, CAST(dd.doc_id AS VARCHAR)) AS split_key
  FROM documents dd
  LEFT JOIN lab l ON CAST(dd.doc_id AS VARCHAR) = l.doc_id)
SELECT doc_id, split_key,
       CAST(('0x' || substr(md5(split_key), 1, 8)) AS BIGINT) % 100 AS bucket,
       CASE WHEN CAST(('0x' || substr(md5(split_key), 1, 8)) AS BIGINT) % 100
                 < {LEAKAGE_TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split
FROM assigned
ORDER BY doc_id
"""

# e6 fixed-point PageRank over the near-dup graph: 5 synchronous rounds,
# ALL-INTEGER arithmetic (r0=1e6; r' = 150000 + (85·Σ r//deg)//100), so the
# engine's hash-partitioned rounds and these chained CTEs are bit-equal —
# no float summation-order drift.  sum(BIGINT) is DECIMAL(38,0) in DuckDB,
# hence the inner CAST before the damping multiply (BASELINE.md, r1 lesson).
_PR_ROUND = """
, p{t} AS (
  SELECT e.v AS node,
         CAST(150000 + (85 * CAST(sum(p.r // dg.dg) AS BIGINT)) // 100
              AS BIGINT) AS r
  FROM e JOIN p{prev} p ON e.u = p.node JOIN dg ON dg.u = e.u
  GROUP BY e.v)
"""

DOCS_PAGERANK_SQL = _DOCS_EDGE_CTES + """
, dg AS (SELECT u, count(*) AS dg FROM e GROUP BY u)
, p0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM dg)
""" + "".join(_PR_ROUND.format(t=t, prev=t - 1) for t in range(1, 6)) + """
SELECT node AS doc_id, r AS rank_e6 FROM p5 ORDER BY doc_id
"""

# per-node triangle participation: each triangle has exactly one wedge
# centered at each vertex, so closed wedges at n == triangles containing n.
# least/greatest give the same lexical VARCHAR wedge-key normalization the
# engine uses; counts are exact integers.
DOCS_TRIANGLES_SQL = _DOCS_EDGE_CTES + """
, dg AS (SELECT u, count(*) AS dg FROM e GROUP BY u)
, wed AS (SELECT a.u AS c, a.v AS x, b.v AS y
          FROM e a JOIN e b ON a.u = b.u AND a.v < b.v)
, closed AS (
  SELECT w.c, count(*) AS t
  FROM wed w JOIN (SELECT least(u, v) AS x, greatest(u, v) AS y FROM e0) ed
    ON ed.x = w.x AND ed.y = w.y
  GROUP BY w.c)
SELECT dg.u AS doc_id, CAST(coalesce(closed.t, 0) AS BIGINT) AS triangles
FROM dg LEFT JOIN closed ON closed.c = dg.u
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_emb_semdedup — SemDeDup-shaped embedding dedup (Abbas et al. 2023,
# arXiv:2303.09540 — public): k-means buckets scope the pairwise cosine to
# WITHIN-bucket (the semantic approximation SemDeDup itself makes), in-bucket
# pairs ≥ threshold feed the distributed CC, and each component keeps its
# min-id member.  Scale shape: the bucket assignment is the same
# deterministic kernel the IVF index uses (broadcast centroids, one
# map_batches); pair generation shuffles (bucket, vec_id, embedding) rows
# once via partitioned_groupby — no O(n²) across buckets; at 10^12 rows
# n_centroids grows to keep per-bucket membership bounded, and hot buckets
# are the same skew problem the LSH band stages already cap.  The mirror
# replays the assignment from the IVF sidecar (fixtures.ivf_sidecar_path)
# and re-derives pairs + components relationally (recursive min-label CTE).


def emb_semdedup(sf_dir: str, threshold: float = 0.35,
                 n_centroids: int = 16) -> pd.DataFrame:
    from deduplicator_ray.functions import vector as vfn
    from deduplicator_ray.stages.components import connected_components
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    sample = vfn.sample_rows_absolute(ds, 65536)
    cents = vfn.train_centroids(sample, n_centroids)
    assigned = vfn.assign_buckets(ds, cents)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype=str),
                              "dst": pd.Series([], dtype=str)})
        srcs: list[str] = []
        dsts: list[str] = []
        for _, g in df.groupby("ivf_bucket", sort=False):
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            iu, ju = np.nonzero(np.triu(m @ m.T >= threshold, 1))
            a = np.minimum(ids[iu], ids[ju])
            b = np.maximum(ids[iu], ids[ju])
            srcs.extend(f"{v:012d}" for v in a)
            dsts.extend(f"{v:012d}" for v in b)
        if not srcs:
            return empty
        return pd.DataFrame({"src": srcs, "dst": dsts})

    edges = partitioned_groupby(
        assigned, ["ivf_bucket"], bucket_pairs,
        out_schema=pa.schema([("src", pa.string()), ("dst", pa.string())]))
    cc = connected_components(edges).to_pandas()
    if cc.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64"),
                             "action": pd.Series([], dtype=str)})
    out = pd.DataFrame({
        "vec_id": cc["image_id"].astype("int64"),
        "cluster_id": cc["cluster_id"].astype("int64"),
    })
    out["action"] = np.where(out["vec_id"] == out["cluster_id"], "keep", "drop")
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# q_docs_curation — the composed end-to-end training-data curation decision
# table, the pipeline a corpus owner actually runs: language gate → quality
# gate → near-dup keeper election → substring-trim accounting.  Every stage
# is an already-value-checked operator (docs_lang_id, docs_text_stats,
# docs_clusters, docs_substring_dup); this query exercises their COMPOSITION
# end-to-end under one driver value hash.  Scale shape: the per-doc feature
# pass streams; the dup-cluster labels and dup-span partials are UNIONED
# with the feature rows and joined by ONE doc_id-partitioned groupby —
# the dup set is never collected to the driver and never broadcast, so a
# 100-TB corpus with a 30-50% dup fraction costs one keyed exchange of
# (doc_id, tag) rows, not a billions-of-ids ray.put (the shape
# img_curation already uses for its gate-row union).


_CURATION_JOIN_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("src", pa.int8()),          # 0=feature row, 1=dup label, 2=span partial
    ("lang_pred", pa.string()),
    ("n_tokens", pa.int64()),
    ("stopword_cnt", pa.int64()),
    ("dup_toks", pa.int64()),
])


def _curation_decisions(sf_dir: str, lang: str = "en",
                        min_tokens: int = 20,
                        docs_path: str | None = None) -> rd.Dataset:
    """The per-doc curation decision Dataset shared by docs_curation (the
    per-row relation), docs_curation_report (the rollup) and the `cli
    curate` job (``docs_path`` overrides the sf-dir convention with any
    parquet path/dir of (doc_id, text) rows).

    Join shape (no driver materialization of the label table —
    tests/test_doc_pipeline.py::test_curation_never_collects_labels): the
    three per-doc attribute sources are tagged, padded to one schema,
    unioned, and resolved by a single doc_id-partitioned groupby:

      src=0  feature rows   (lang_pred, n_tokens, stopword_cnt) — one per doc
      src=1  dup labels     doc_clusters rows with image_id != cluster_id
      src=2  span partials  per-batch SUM(span_end-span_start) by doc_id

    Inside a partition every doc's rows are co-located, so `decide` is a
    vectorized merge: is_dup = membership of src=1, dup_toks = sum of
    src=2, gates evaluated first-hit-wins exactly as before."""
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines.doc_dedup import doc_clusters, text_features
    from deduplicator_ray.pipelines.substring import substring_dup_spans
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    cfg = PipelineConfig()
    docs = dio.read_parquet(docs_path or _t(sf_dir, "documents"),
                            columns=["doc_id", "text"])

    nulls = {  # typed null pads so union schemas align exactly
        "lang_pred": lambda n: pa.nulls(n, pa.string()),
        "n_tokens": lambda n: pa.nulls(n, pa.int64()),
        "stopword_cnt": lambda n: pa.nulls(n, pa.int64()),
        "dup_toks": lambda n: pa.nulls(n, pa.int64()),
    }

    def pad(cols: dict, n: int, src: int) -> pa.Table:
        arrays = [pa.array(cols["doc_id"], pa.int64()),
                  pa.array(np.full(n, src, np.int8))]
        for name in ("lang_pred", "n_tokens", "stopword_cnt", "dup_toks"):
            arrays.append(cols[name] if name in cols else nulls[name](n))
        return pa.Table.from_arrays(arrays,
                                    schema=_CURATION_JOIN_SCHEMA)

    feats = text_features(docs).select_columns(
        ["doc_id", "lang_pred", "n_tokens", "stopword_cnt"])

    def tag_feat(t: pa.Table) -> pa.Table:
        return pad({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "lang_pred": pc.cast(t["lang_pred"], pa.string()),
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "stopword_cnt": pc.cast(t["stopword_cnt"], pa.int64()),
        }, t.num_rows, 0)

    def tag_dup(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["image_id"], t["cluster_id"]))
        return pad({"doc_id": pc.cast(t["image_id"], pa.int64())
                    .to_numpy(zero_copy_only=False)}, t.num_rows, 1)

    def tag_span(t: pa.Table) -> pa.Table:
        # per-batch partial: many span rows per doc collapse to one
        # (doc_id, sum) row before the shuffle — a combiner, not a copy
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = (t["span_end"].to_numpy(zero_copy_only=False)
               - t["span_start"].to_numpy(zero_copy_only=False)).astype(
                   np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, tok)
        return pad({"doc_id": uniq,
                    "dup_toks": pa.array(sums, pa.int64())}, len(uniq), 2)

    tagged = (
        feats.map_batches(tag_feat, batch_format="pyarrow")
        .union(doc_clusters(docs, cfg)
               .map_batches(tag_dup, batch_format="pyarrow"))
        .union(substring_dup_spans(docs, k=SUBSTRING_K)
               .map_batches(tag_span, batch_format="pyarrow"))
    )

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        feat = df[df["src"] == 0]
        ids = feat["doc_id"].to_numpy(dtype=np.int64)
        dup_ids = np.unique(
            df.loc[df["src"] == 1, "doc_id"].to_numpy(dtype=np.int64))
        sp = df[df["src"] == 2]
        if len(sp):
            st = sp.groupby("doc_id", as_index=False)["dup_toks"].sum()
            sids = st["doc_id"].to_numpy(dtype=np.int64)
            stok = st["dup_toks"].to_numpy(dtype=np.int64)
            order = np.argsort(sids)
            sids, stok = sids[order], stok[order]
        else:
            sids = np.zeros(0, np.int64)
            stok = np.zeros(0, np.int64)
        lp = feat["lang_pred"].to_numpy(dtype=object)
        # null text → null counts (text_features mirrors SQL NULL); the
        # gate reads them as 0 so failed downloads land in drop_quality
        ntok = (feat["n_tokens"].fillna(0).to_numpy(dtype=np.int64))
        stop = (feat["stopword_cnt"].fillna(0).to_numpy(dtype=np.int64))
        is_dup = np.isin(ids, dup_ids, assume_unique=False)
        action = np.where(
            lp != lang, "drop_lang",
            np.where((ntok < min_tokens) | (stop == 0), "drop_quality",
                     np.where(is_dup, "drop_dup", "keep")))
        if len(sids):
            pos = np.searchsorted(sids, ids)
            pos[pos == len(sids)] = 0
            dup_toks = np.where(sids[pos] == ids, stok[pos], 0)
        else:
            dup_toks = np.zeros(len(ids), np.int64)
        kept = np.where(action == "keep",
                        np.maximum(ntok - dup_toks, 0), 0).astype(np.int64)
        return pd.DataFrame({"doc_id": ids, "action": action,
                             "n_tokens_kept": kept})

    return partitioned_groupby(
        tagged, ["doc_id"], decide,
        out_schema=pa.schema([("doc_id", pa.int64()),
                              ("action", pa.string()),
                              ("n_tokens_kept", pa.int64())]))


def docs_curation(sf_dir: str, lang: str = "en",
                  min_tokens: int = 20) -> pd.DataFrame:
    out = _curation_decisions(sf_dir, lang, min_tokens).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_curation_report(sf_dir: str, lang: str = "en",
                         min_tokens: int = 20) -> pd.DataFrame:
    """Operational rollup of the curation decision table — the doc-side
    analog of img_dedup_report (a dataset card: per action, how many docs
    and how many training tokens survive).  Per-batch combiner emits one
    partial row per action per batch (≤4 rows), so the shuffle is a few
    hundred bytes regardless of corpus size; the final merge is
    driver-side over ≤ 4×batches partials."""
    ds = _curation_decisions(sf_dir, lang, min_tokens)

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "action": t["action"].to_pylist(),
            "n_tokens_kept": t["n_tokens_kept"].to_numpy(
                zero_copy_only=False)})
        g = (df.groupby("action", as_index=False)
             .agg(n_docs=("action", "size"),
                  total_tokens_kept=("n_tokens_kept", "sum")))
        return pa.Table.from_pydict(
            {"action": g["action"].tolist(),
             "n_docs": g["n_docs"].to_numpy(np.int64),
             "total_tokens_kept": g["total_tokens_kept"].to_numpy(np.int64)})

    parts = ds.map_batches(combine, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("action", as_index=False)
           .agg(n_docs=("n_docs", "sum"),
                total_tokens_kept=("total_tokens_kept", "sum")))
    out = _typed(out, pa.schema([("action", pa.string()),
                                 ("n_docs", pa.int64()),
                                 ("total_tokens_kept", pa.int64())]))
    return out.sort_values("action").reset_index(drop=True)


DOCS_CURATION_SQL = f"""
WITH RECURSIVE feats AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','and','of','a','to','in','is','on','for','with'))) AS stopword_cnt
  FROM documents
),
scores AS (
  SELECT doc_id,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('fr')} AS s_fr,
         {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('zh')} AS s_zh
  FROM documents),
lang AS (
  SELECT doc_id,
       CASE
         WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         WHEN s_fr > s_en AND s_fr > s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         WHEN s_es > s_en AND s_es > s_de AND s_es > s_fr AND s_es >= s_zh THEN 'es'
         WHEN s_zh > s_en AND s_zh > s_de AND s_zh > s_fr AND s_zh > s_es THEN 'zh'
         ELSE 'en'
       END AS lang_pred
  FROM scores),
d AS MATERIALIZED (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        FOR i IN range(1, greatest(len(text) - 3, 2))]) AS sh
  FROM documents
),
e0 AS MATERIALIZED (
  -- MATERIALIZED + the lbl < u recursion guard below: without them DuckDB
  -- re-evaluates the O(n²) join per recursion round; '<' halves the pair
  -- count and the projected subquery evaluates the intersect once
  SELECT u, v FROM (
    SELECT CAST(a.doc_id AS VARCHAR) AS u, CAST(b.doc_id AS VARCHAR) AS v,
           len(list_intersect(a.sh, b.sh)) AS i,
           len(a.sh) AS la, len(b.sh) AS lb
    FROM d a JOIN d b ON a.doc_id < b.doc_id)
  WHERE i::DOUBLE / (la + lb - i) >= 0.8
),
e AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
),
r(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
  WHERE r.lbl < e.u
),
dupdrop AS (
  SELECT CAST(node AS BIGINT) AS doc_id
  FROM (SELECT node, min(lbl) AS cluster_id FROM r GROUP BY node)
  WHERE node != cluster_id
),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
wins AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         array_to_string(t[u.i:u.i + {SUBSTRING_K - 1}], ' ') AS win
  FROM toks, UNNEST(range(1, greatest(len(t) - {SUBSTRING_K} + 2, 1))) u(i)
),
dup AS (
  SELECT win FROM wins GROUP BY win HAVING count(*) > 1
),
occ AS (
  SELECT w.doc_id, w.pos,
         row_number() OVER (PARTITION BY w.win ORDER BY w.doc_id, w.pos) AS rn
  FROM wins w JOIN dup USING (win)
),
dup_occ AS (SELECT doc_id, pos FROM occ WHERE rn > 1),
gaps AS (
  SELECT doc_id, pos,
         lag(pos, 1, -1000000) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
  FROM dup_occ
),
islands AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN pos - prev_pos <= {SUBSTRING_K} THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM gaps
),
spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {SUBSTRING_K} AS span_end
  FROM islands GROUP BY doc_id, isl
),
span_tok AS (
  SELECT doc_id, sum(span_end - span_start) AS dup_toks
  FROM spans GROUP BY doc_id
)
SELECT f.doc_id,
       CASE WHEN l.lang_pred != 'en' THEN 'drop_lang'
            WHEN f.n_tokens < 20 OR f.stopword_cnt = 0 THEN 'drop_quality'
            WHEN dd.doc_id IS NOT NULL THEN 'drop_dup'
            ELSE 'keep' END AS action,
       CAST(CASE WHEN l.lang_pred = 'en' AND f.n_tokens >= 20
                  AND f.stopword_cnt > 0 AND dd.doc_id IS NULL
                 THEN greatest(f.n_tokens - coalesce(st.dup_toks, 0), 0)
                 ELSE 0 END AS BIGINT) AS n_tokens_kept
FROM feats f
JOIN lang l USING (doc_id)
LEFT JOIN dupdrop dd ON dd.doc_id = f.doc_id
LEFT JOIN span_tok st ON st.doc_id = f.doc_id
ORDER BY f.doc_id
"""

DOCS_CURATION_REPORT_SQL = (
    "SELECT action, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_tokens_kept) AS BIGINT) AS total_tokens_kept FROM ("
    + DOCS_CURATION_SQL + ") GROUP BY action ORDER BY action")



# ---------------------------------------------------------------------------
# q_docs_incremental_dedup — incremental dedup of a "new crawl" against a
# persisted known-corpus snapshot via the partitioned Bloom index
# (state/bloomstore.py — the scale analog of the reference's persistent
# hash→paths store, /root/reference/dupedb.py:31-66).  The known side is
# read ONCE to build compact per-partition filters; the new side streams
# through a shuffle-free probe (per-partition bitmap ObjectRefs, node-local
# after first fetch) and an actor-pool exact verify that loads digest blobs
# only for partitions that produced candidates.  Content key here is the
# dedup bucket key (lang|n_chars — the docs_dedup_bucket keyspace, which
# actually collides across the split); the same machinery takes md5(text)
# for byte-exact incremental dedup.


def docs_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    import shutil
    import tempfile

    from deduplicator_ray.state import bloomstore

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                            columns=["doc_id", "lang", "n_chars"])

    def add_key(t: pa.Table) -> pa.Table:
        key = pa.array([f"{l}|{c}" for l, c in
                        zip(t["lang"].to_pylist(), t["n_chars"].to_pylist())])
        return pa.Table.from_arrays([t["doc_id"], key], names=["doc_id", "key"])

    def split(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 5 == 0) if new_side else (ids % 5 != 0)
            return t.filter(pa.array(mask))
        return f

    keyed = docs.map_batches(add_key, batch_format="pyarrow")
    idx_dir = tempfile.mkdtemp(prefix="bloomidx_", dir="/tmp")
    try:
        bloomstore.build_bloom_index(
            keyed.map_batches(split(False), batch_format="pyarrow"),
            "key", idx_dir, num_parts=32)
        out = bloomstore.probe_bloom_index(
            keyed.map_batches(split(True), batch_format="pyarrow"),
            idx_dir, "key", num_parts=32).to_pandas()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "status"]]


def docs_cluster_update(sf_dir: str) -> pd.DataFrame:
    """Incremental cluster maintenance: cluster the 'known' 80% of the
    corpus (stand-in for a persisted checkpoint assignment), discover only
    the increment-touched near-dup edges, and fold them in with
    ``incremental_cc_update`` — never re-clustering the known side.  The
    result must equal a full-corpus recompute, so the mirror is simply
    DOCS_CLUSTERS_SQL (shared with the ``docs_clusters`` query)."""
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines.doc_dedup import doc_cluster_update

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                            columns=["doc_id", "text"])
    out = doc_cluster_update(docs, PipelineConfig()).to_pandas()
    out = out.rename(columns={"image_id": "doc_id"})
    out = _typed(out, pa.schema([("doc_id", pa.string()),
                                 ("cluster_id", pa.string())]))
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_cluster_remove(sf_dir: str) -> pd.DataFrame:
    """Incremental cluster DELETION maintenance: retire a deterministic
    md5 bucket of docs from a persisted assignment + edge set with
    ``incremental_cc_remove`` — re-clustering ONLY the components a
    removed doc touched (a cut-vertex removal SPLITS its cluster, so the
    affected subgraph is re-run; everything else streams through).  The
    result must equal clustering the survivor corpus from scratch, so the
    mirror is DOCS_CLUSTERS_SQL with ``documents`` pre-filtered to
    survivors (DOCS_CLUSTER_REMOVE_SQL)."""
    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines.doc_dedup import doc_cluster_remove

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                            columns=["doc_id", "text"])
    out = doc_cluster_remove(docs, PipelineConfig()).to_pandas()
    out = out.rename(columns={"image_id": "doc_id"})
    out = _typed(out, pa.schema([("doc_id", pa.string()),
                                 ("cluster_id", pa.string())]))
    return out.sort_values("doc_id").reset_index(drop=True)


# the prune mirror: the full-recompute clusters relation over the SURVIVOR
# set — same portable md5 bucket as the engine (int(md5(id)[:8],16) % 100,
# DuckDB's hex cast matches Python's int(...,16))
from deduplicator_ray.pipelines.doc_dedup import (  # noqa: E402
    REMOVE_BUCKET_THRESHOLD as _RM_T,
)

DOCS_CLUSTER_REMOVE_SQL = DOCS_CLUSTERS_SQL.replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE "
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
    f"% 100 < {_RM_T}) documents",
)


DOCS_INCREMENTAL_DEDUP_SQL = """
WITH newdocs AS (
  SELECT doc_id, md5(concat(lang, '|', CAST(n_chars AS VARCHAR))) AS h
  FROM documents WHERE doc_id % 5 = 0),
known AS (
  SELECT DISTINCT md5(concat(lang, '|', CAST(n_chars AS VARCHAR))) AS h
  FROM documents WHERE doc_id % 5 != 0)
SELECT n.doc_id,
       CASE WHEN k.h IS NOT NULL THEN 'dup_known' ELSE 'new' END AS status
FROM newdocs n LEFT JOIN known k USING (h)
ORDER BY n.doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_sample_stratified — deterministic stratified sampling / corpus
# mixing: per-language keep rates applied via a content-derived uniform
# (first 4 hex chars of md5(doc_id) compared against a hex threshold — hex
# string order IS numeric order for fixed-length lowercase hex, so no int
# parsing is needed on either engine).  Scale shape: a pure map_batches
# filter — no shuffle, no state, reproducible across runs and engines;
# the standard way to hit a target language mix when assembling a
# training corpus from a larger pool.

_STRAT_RATES = {  # lang -> keep threshold on the md5 nibble-4 uniform
    "en": "c000",  # 0.75
    "de": "8000",  # 0.50
    "fr": "8000",  # 0.50
    "es": "4000",  # 0.25
    "zh": "4000",  # 0.25
}
_STRAT_DEFAULT = "2000"  # 0.125 for any unlisted language


def docs_sample_stratified(sf_dir: str) -> pd.DataFrame:
    import hashlib

    docs = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        keep = [
            hashlib.md5(str(i).encode()).hexdigest()[:4]
            < _STRAT_RATES.get(l, _STRAT_DEFAULT)
            for i, l in zip(ids, langs)
        ]
        return t.filter(pa.array(keep))

    out = docs.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_SAMPLE_STRATIFIED_SQL = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE lang WHEN 'en' THEN 'c000'
                WHEN 'de' THEN '8000'
                WHEN 'fr' THEN '8000'
                WHEN 'es' THEN '4000'
                WHEN 'zh' THEN '4000'
                ELSE '2000' END
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_repetition_stats — Gopher-style repetition quality signals (Rae et
# al. 2021 §A1.1): duplicate-token fraction and the most-common-bigram mass
# per document.  Vectorized: one Arrow split per batch, tokens exploded to
# a flat frame, pandas C-level groupbys for the distinct/top counts — no
# per-document Python loop.


def docs_cdc_chunks(sf_dir: str, window: int = 16, modulus: int = 64,
                    min_chunk: int = 16, max_chunk: int = 4096) -> pd.DataFrame:
    """Block-level exact dedup via content-defined chunking (Rabin
    fingerprint cutpoints — functions/text.cdc_chunk_spans): the storage-
    dedup member of the dedup family (doc-level = exact md5, span-level =
    substring, block-level = CDC).  Chunk boundaries follow content, so a
    shared paragraph is found as equal chunk hashes no matter where it sits
    in each document.

    Scale shape: the map stage emits one (chunk_hash, doc_id, chunk_len)
    row per chunk (~corpus_bytes / 80 rows of ~30 B — text itself never
    crosses the wire), then ONE chunk_hash-partitioned groupby counts
    copies / distinct docs and elects a min-doc representative; output is
    bounded to shared chunks (n_copies ≥ 2).  No combiner: chunk hashes
    are near-unique by construction, so per-batch pre-aggregation would
    save almost nothing while doubling hash-table work."""
    from deduplicator_ray.functions import text as textfn
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    out_schema = pa.schema([
        ("chunk_hash", pa.int64()), ("n_copies", pa.int64()),
        ("n_docs", pa.int64()), ("chunk_len", pa.int64()),
        ("bytes_saved", pa.int64()), ("min_doc", pa.int64())])
    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        d_idx, _s, ln, h = textfn.cdc_chunk_spans(
            [x or "" for x in t["text"].to_pylist()],
            window=window, modulus=modulus,
            min_chunk=min_chunk, max_chunk=max_chunk)
        return pa.Table.from_arrays(
            [pa.array(h), pa.array(ids[d_idx]), pa.array(ln)],
            names=["chunk_hash", "doc_id", "chunk_len"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "chunk_hash": pd.Series([], dtype=np.int64),
                "n_copies": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
                "chunk_len": pd.Series([], dtype=np.int64),
                "bytes_saved": pd.Series([], dtype=np.int64),
                "min_doc": pd.Series([], dtype=np.int64)})
        g = df.groupby("chunk_hash", sort=False)
        out = g.agg(n_copies=("doc_id", "size"), n_docs=("doc_id", "nunique"),
                    chunk_len=("chunk_len", "min"),
                    min_doc=("doc_id", "min")).reset_index()
        out = out[out["n_copies"] >= 2]
        out["bytes_saved"] = (out["n_copies"] - 1) * out["chunk_len"]
        return out[["chunk_hash", "n_copies", "n_docs", "chunk_len",
                    "bytes_saved", "min_doc"]]

    rows = ds.map_batches(chunk_rows, batch_format="pyarrow")
    shared = partitioned_groupby(rows, ["chunk_hash"], agg,
                                 out_schema=out_schema)
    out = _typed(shared.to_pandas(), out_schema)
    return out.sort_values("chunk_hash").reset_index(drop=True)


def docs_cdc_containment(sf_dir: str) -> pd.DataFrame:
    """Per-doc duplicated-BLOCK fraction — the actionable curation view of
    CDC (docs_cdc_chunks finds the shared blocks; this scores each document
    by how much of it is made of them, the block-level analog of the
    substring-trim accounting in docs_curation).  dup_frac_e6 is integer
    micro-units (floor), so the value hash is float-free.

    Scale shape: chunk rows → ONE chunk_hash-partitioned groupby annotates
    each row with its hash's global copy count (vectorized transform per
    partition) → ONE doc_id-partitioned groupby sums total vs duplicated
    bytes per doc.  Two shuffles of 3-column rows; text never moves."""
    from deduplicator_ray.functions import text as textfn
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("total_bytes", pa.int64()),
        ("dup_bytes", pa.int64()), ("dup_frac_e6", pa.int64())])
    ann_schema = pa.schema([
        ("doc_id", pa.int64()), ("chunk_len", pa.int64()),
        ("n_copies", pa.int64())])
    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        d_idx, _s, ln, h = textfn.cdc_chunk_spans(
            [x or "" for x in t["text"].to_pylist()])
        return pa.Table.from_arrays(
            [pa.array(h), pa.array(ids[d_idx]), pa.array(ln)],
            names=["chunk_hash", "doc_id", "chunk_len"])

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "chunk_len": pd.Series([], dtype=np.int64),
                "n_copies": pd.Series([], dtype=np.int64)})
        df = df.copy()
        df["n_copies"] = df.groupby("chunk_hash", sort=False)[
            "chunk_hash"].transform("size").astype(np.int64)
        return df[["doc_id", "chunk_len", "n_copies"]]

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "total_bytes": pd.Series([], dtype=np.int64),
                "dup_bytes": pd.Series([], dtype=np.int64),
                "dup_frac_e6": pd.Series([], dtype=np.int64)})
        df = df.copy()
        df["dup_len"] = np.where(df["n_copies"] >= 2, df["chunk_len"], 0)
        g = (df.groupby("doc_id", sort=False)
             .agg(total_bytes=("chunk_len", "sum"),
                  dup_bytes=("dup_len", "sum")).reset_index())
        g["dup_frac_e6"] = (g["dup_bytes"] * 1_000_000) // g["total_bytes"]
        return g.astype(np.int64)

    rows = ds.map_batches(chunk_rows, batch_format="pyarrow")
    ann = partitioned_groupby(rows, ["chunk_hash"], annotate,
                              out_schema=ann_schema)
    per = partitioned_groupby(ann, ["doc_id"], per_doc,
                              out_schema=out_schema)
    out = _typed(per.to_pandas(), out_schema)
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_CDC_CONTAINMENT_SQL = """
WITH ann AS (
  SELECT doc_id, chunk_len,
         count(*) OVER (PARTITION BY chunk_hash) AS n_copies
  FROM '{cdc}'
)
SELECT doc_id,
       CAST(sum(chunk_len) AS BIGINT) AS total_bytes,
       CAST(sum(CASE WHEN n_copies >= 2 THEN chunk_len ELSE 0 END)
            AS BIGINT) AS dup_bytes,
       CAST(sum(CASE WHEN n_copies >= 2 THEN chunk_len ELSE 0 END)
            * 1000000 // sum(chunk_len) AS BIGINT) AS dup_frac_e6
FROM ann
GROUP BY doc_id
ORDER BY doc_id
"""


# mirror template: {cdc} is the sidecar replay of the chunking kernel
# (fixtures.cdc_sidecar_path) — the cutpoint/hash KERNEL is what SQL cannot
# express, so it ships as data (same policy as the image hashes sidecar);
# the mirror re-derives the distributed count/distinct/election relationally
DOCS_CDC_CHUNKS_SQL = """
SELECT chunk_hash,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(chunk_len) AS chunk_len,
       CAST((count(*) - 1) * min(chunk_len) AS BIGINT) AS bytes_saved,
       min(doc_id) AS min_doc
FROM '{cdc}'
GROUP BY chunk_hash
HAVING count(*) >= 2
ORDER BY chunk_hash
"""


def docs_repetition_stats(sf_dir: str) -> pd.DataFrame:
    docs = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        toks = pc.split_pattern(pc.cast(t["text"], pa.string()), " ")
        cc = toks.combine_chunks()
        offsets = np.asarray(cc.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        doc_idx = np.repeat(np.arange(n), counts)
        df = pd.DataFrame({"d": doc_idx, "tok": flat})
        n_distinct = (
            df.groupby("d")["tok"].nunique()
            .reindex(range(n), fill_value=0).to_numpy(dtype=np.int64))
        # bigram (tok, next-tok-in-same-doc): mask out each doc's last token
        last = np.zeros(len(flat), bool)
        if len(flat):
            last[offsets[1:][counts > 0] - 1] = True
            nxt = np.empty_like(flat)
            nxt[:-1] = flat[1:]
            nxt[-1] = ""
        top_c = np.zeros(n, np.int64)
        tot_c = np.zeros(n, np.int64)
        if len(flat) and (~last).any():
            bg = pd.DataFrame({"d": doc_idx[~last], "a": flat[~last],
                               "b": nxt[~last]})
            per = bg.groupby(["d", "a", "b"], sort=False).size()
            agg = per.groupby(level=0).agg(["max", "sum"])
            top_c[agg.index.to_numpy()] = agg["max"].to_numpy()
            tot_c[agg.index.to_numpy()] = agg["sum"].to_numpy()
        n_tokens = counts.astype(np.int64)
        dup_frac = (n_tokens - n_distinct) / np.maximum(n_tokens, 1)
        top_frac = np.where(tot_c > 0, top_c / np.maximum(tot_c, 1), 0.0)
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(n_tokens), pa.array(dup_frac, pa.float64()),
             pa.array(top_frac, pa.float64())],
            names=["doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac"])

    out = docs.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_REPETITION_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (
  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
  FROM toks),
bg AS (
  SELECT doc_id, t[u.i] AS a, t[u.i + 1] AS b
  FROM toks, UNNEST(range(1, len(t))) u(i)),
bgc AS (SELECT doc_id, a, b, count(*) AS c FROM bg GROUP BY doc_id, a, b),
top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot FROM bgc GROUP BY doc_id)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens
         AS dup_token_frac,
       coalesce(CAST(t.top_c AS DOUBLE) / t.tot, 0.0) AS top_bigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
ORDER BY b.doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_chunking — context-window packing: split every document into
# fixed-token chunks (window C, stride C) — the standard pre-tokenization
# step before sequence packing.  A pure per-row flat expansion inside
# map_batches (rows out ≥ rows in, no shuffle, no state): at 100 TB this
# streams block-by-block and the output is written partitioned like any
# other map stage.

CHUNK_TOKENS = 32


def docs_chunking(sf_dir: str) -> pd.DataFrame:
    docs = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(t["text"], pa.string()), " ")
        cc = toks.combine_chunks()
        offsets = np.asarray(cc.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        flat = pc.list_flatten(toks).to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_chunks = np.maximum((counts + CHUNK_TOKENS - 1) // CHUNK_TOKENS, 1)
        out_ids, out_cids, out_ntok, out_text = [], [], [], []
        for d in range(t.num_rows):
            base = offsets[d]
            for c in range(int(n_chunks[d])):
                lo = c * CHUNK_TOKENS
                hi = min(lo + CHUNK_TOKENS, int(counts[d]))
                out_ids.append(int(ids[d]))
                out_cids.append(c)
                out_ntok.append(hi - lo)
                out_text.append(" ".join(flat[base + lo:base + hi]))
        return pa.Table.from_arrays(
            [pa.array(out_ids, pa.int64()), pa.array(out_cids, pa.int64()),
             pa.array(out_ntok, pa.int64()), pa.array(out_text, pa.string())],
            names=["doc_id", "chunk_id", "n_tokens_chunk", "chunk_text"])

    out = docs.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


DOCS_CHUNKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id,
         CAST(u.c AS BIGINT) AS chunk_id,
         array_to_string(
           t[u.c * {CHUNK_TOKENS} + 1 :
             least((u.c + 1) * {CHUNK_TOKENS}, len(t))], ' ') AS chunk_text,
         least((u.c + 1) * {CHUNK_TOKENS}, len(t)) - u.c * {CHUNK_TOKENS}
           AS n_tokens_chunk
  FROM toks,
       UNNEST(range(0, greatest((len(t) + {CHUNK_TOKENS} - 1)
                                 // {CHUNK_TOKENS}, 1))) u(c))
SELECT doc_id, chunk_id, CAST(n_tokens_chunk AS BIGINT) AS n_tokens_chunk,
       chunk_text
FROM chunks
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# q_docs_pack_layout — GPT-style sequence-packing layout: per language
# stream, documents are concatenated in doc_id order and the token stream is
# split every PACK_TOKENS tokens (documents STRADDLE context boundaries —
# that is how pretraining packing actually works, unlike per-doc chunking
# above).  The layout table answers, per doc: where in the packed stream it
# starts, which context windows it occupies, and whether it straddles a
# boundary (the attention-masking / doc-boundary-loss bookkeeping signal).
# Scale shape: token counts are one vectorized Arrow pass; the running
# offset needs per-lang ordered cumsum, i.e. key co-location — ONE
# lang-partitioned groupby, vectorized grouped cumsum per partition.  Both
# engines floor non-negative divisions, so `//` agrees.

PACK_TOKENS = 32


def docs_pack_layout(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                            columns=["doc_id", "lang", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(pc.cast(t["text"], pa.string()), " "))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "lang": pc.cast(t["lang"], pa.string()),
            "n_tokens": pc.cast(n, pa.int64()),
        })

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("lang", pa.string()),
        ("n_tokens", pa.int64()), ("first_chunk", pa.int64()),
        ("last_chunk", pa.int64()), ("straddles", pa.int64()),
    ])

    def layout(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        start = df.groupby("lang")["n_tokens"].cumsum() - df["n_tokens"]
        df["first_chunk"] = start // PACK_TOKENS
        df["last_chunk"] = (start + df["n_tokens"] - 1) // PACK_TOKENS
        df["straddles"] = (df["first_chunk"] != df["last_chunk"]).astype("int64")
        return df

    out = partitioned_groupby(
        docs.map_batches(tok_counts, batch_format="pyarrow"),
        ["lang"], layout, out_schema=out_schema,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_PACK_LAYOUT_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents),
w AS (
  SELECT doc_id, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM t)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start // {PACK_TOKENS} AS BIGINT) AS first_chunk,
       CAST((start + n_tokens - 1) // {PACK_TOKENS} AS BIGINT) AS last_chunk,
       CAST(CASE WHEN start // {PACK_TOKENS}
                      != (start + n_tokens - 1) // {PACK_TOKENS}
                 THEN 1 ELSE 0 END AS BIGINT) AS straddles
FROM w
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_token_budget — quality-ranked corpus selection under a global token
# budget: keep the best documents (by stopword ratio, doc_id tiebreak) whose
# INCLUSIVE running token total stays within budget — "fill 1T tokens with
# the best of the pool".  Scale shape: NOT a global sort + scan.  A
# per-batch combiner pre-aggregates (quality → token-sum) inside
# map_batches, a small groupby merges the histogram, the driver walks the
# sorted histogram to find the boundary quality (bounded by DISTINCT
# quality values — quantize the score to bound it at petabyte scale), and
# only the boundary group's docs are pulled for the exact in-group
# doc_id-order cumsum.  The final pass is a broadcast-lookup map_batches —
# two streaming passes over the narrow feature table (plus one boundary-
# group filter pass when the budget splits a group), zero all-to-all.

TOKEN_BUDGET = 20_000


def docs_token_budget(sf_dir: str, budget: int = TOKEN_BUDGET) -> pd.DataFrame:
    from deduplicator_ray.pipelines.doc_dedup import text_features

    docs = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    feats = text_features(docs).select_columns(
        ["doc_id", "n_tokens", "stopword_cnt"])

    def with_q(t: pa.Table) -> pa.Table:
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        stop = t["stopword_cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        q_ = stop / np.maximum(ntok, 1.0)
        return pa.Table.from_arrays(
            [t["doc_id"], t["n_tokens"], pa.array(q_, pa.float64())],
            names=["doc_id", "n_tokens", "q"])

    scored = feats.map_batches(with_q, batch_format="pyarrow")

    # pass 1 — histogram: per-batch combiner, then a tiny global groupby
    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"q": t["q"].to_numpy(zero_copy_only=False),
                           "tok": t["n_tokens"].to_numpy(zero_copy_only=False)})
        g = df.groupby("q", as_index=False)["tok"].sum()
        return pa.Table.from_pydict(
            {"q": g["q"].to_numpy(np.float64), "tok": g["tok"].to_numpy(np.int64)},
            schema=pa.schema([("q", pa.float64()), ("tok", pa.int64())]))

    hist = (scored.map_batches(combine, batch_format="pyarrow")
            .groupby("q").sum("tok").to_pandas())
    tok_col = [c for c in hist.columns if c != "q"][0]
    hist = hist.sort_values("q", ascending=False).reset_index(drop=True)
    cum = hist[tok_col].cumsum()
    full = cum <= budget
    q_floor = hist.loc[full, "q"].min() if full.any() else np.inf
    spent = int(cum[full].max()) if full.any() else 0
    boundary_q = None
    overflow = hist[~full]
    if len(overflow) and spent < budget:
        boundary_q = float(overflow.iloc[0]["q"])

    # boundary refinement: exact doc_id-order cumsum WITHIN the one
    # overflowing quality group (pulled to the driver — one group, not the
    # corpus; at extreme skew quantization keeps it bounded)
    boundary_ids = np.zeros(0, np.int64)
    if boundary_q is not None:
        bq = boundary_q

        def only_boundary(t: pa.Table) -> pa.Table:
            m = t["q"].to_numpy(zero_copy_only=False) == bq
            return t.filter(pa.array(m))

        bdf = (scored.map_batches(only_boundary, batch_format="pyarrow")
               .to_pandas().sort_values("doc_id"))
        bcum = bdf["n_tokens"].cumsum()
        boundary_ids = bdf.loc[bcum <= budget - spent, "doc_id"] \
            .to_numpy(np.int64)
    bref = ray.put(np.sort(boundary_ids))
    floor = q_floor if np.isfinite(q_floor) else np.inf

    # pass 2 — broadcast-lookup decide
    def decide(t: pa.Table) -> pa.Table:
        bids = ray.get(bref)
        q_ = t["q"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (q_ >= floor) if np.isfinite(floor) else np.zeros(len(q_), bool)
        keep |= np.isin(ids, bids)
        sel = np.where(keep, "keep", "skip")
        return pa.Table.from_arrays(
            [t["doc_id"], t["n_tokens"], pa.array(sel, pa.string())],
            names=["doc_id", "n_tokens", "selected"])

    out = scored.map_batches(decide, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_TOKEN_BUDGET_SQL = f"""
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ('the','and','of','a','to','in','is','on','for','with')))
              AS DOUBLE)
           / greatest(len(string_split(text, ' ')), 1) AS q
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY q DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM f)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN cum <= {TOKEN_BUDGET} THEN 'keep' ELSE 'skip' END AS selected
FROM c
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_decontaminate — benchmark decontamination: flag corpus documents
# that share ANY k-token window with an eval/benchmark set (the standard
# n-gram-overlap contamination check run before training).  Scale shape:
# the benchmark side is small by definition (an eval set, not a corpus) —
# its distinct windows are collected once and broadcast via ray.put; the
# corpus side streams through one map_batches pass where windows are built
# by vectorized shifted-concat over the flattened token stream and matched
# with a C-level hash-table isin.  No shuffle, no state.

DECON_K = 8          # window length (tokens)
DECON_BENCH_MOD = 10  # doc_id % MOD == 0 → benchmark split


def _window_strings(texts: pa.ChunkedArray | pa.Array,
                    k: int) -> tuple[pd.Series, np.ndarray, np.ndarray]:
    """All k-token windows over a batch: returns (windows, doc_index,
    valid_mask) where windows[i] spans positions i..i+k-1 of the flattened
    token stream and valid_mask marks windows fully inside one doc."""
    toks = pc.split_pattern(pc.cast(texts, pa.string()), " ")
    cc = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = np.asarray(cc.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    flat = pd.Series(pc.list_flatten(toks).to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    w = flat.copy()
    for j in range(1, k):
        w = w + " " + flat.shift(-j)
    pos_in_doc = np.arange(len(flat)) - np.repeat(offsets[:-1], counts)
    valid = pos_in_doc + k <= np.repeat(counts, counts)
    return w, doc_idx, valid


def docs_decontaminate(sf_dir: str) -> pd.DataFrame:
    docs = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % DECON_BENCH_MOD == 0)
            return t.filter(pa.array(m if bench else ~m))
        return f

    # benchmark windows: small by definition — one bounded driver collect
    bench_df = docs.map_batches(split(True), batch_format="pyarrow").to_pandas()
    if len(bench_df):
        bw, _, bv = _window_strings(pa.array(bench_df["text"]), DECON_K)
        bench_windows = pd.unique(bw[bv])
    else:
        bench_windows = np.array([], dtype=object)
    bref = ray.put(bench_windows)

    def decide(t: pa.Table) -> pa.Table:
        bws = ray.get(bref)
        w, doc_idx, valid = _window_strings(t["text"], DECON_K)
        hit = w.isin(bws).to_numpy() & valid
        n_hits = np.zeros(t.num_rows, np.int64)
        if hit.any():
            np.add.at(n_hits, doc_idx[hit], 1)
        status = np.where(n_hits > 0, "contaminated", "clean")
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(n_hits),
             pa.array(status, pa.string())],
            names=["doc_id", "n_contaminated_windows", "status"])

    out = (docs.map_batches(split(False), batch_format="pyarrow")
           .map_batches(decide, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_DECONTAMINATE_SQL = f"""
WITH b AS (
  SELECT string_split(text, ' ') AS t FROM documents
  WHERE doc_id % {DECON_BENCH_MOD} = 0),
bw AS (
  SELECT DISTINCT array_to_string(t[u.i:u.i + {DECON_K - 1}], ' ') AS w
  FROM b, UNNEST(range(1, greatest(len(t) - {DECON_K - 2}, 1))) u(i)),
corpus AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id % {DECON_BENCH_MOD} != 0),
cw AS (
  SELECT doc_id, array_to_string(t[u.i:u.i + {DECON_K - 1}], ' ') AS w
  FROM corpus, UNNEST(range(1, greatest(len(t) - {DECON_K - 2}, 1))) u(i)),
hits AS (
  SELECT doc_id, count(*) AS n FROM cw JOIN bw USING (w) GROUP BY doc_id)
SELECT c.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_windows,
       CASE WHEN h.doc_id IS NOT NULL THEN 'contaminated' ELSE 'clean' END
         AS status
FROM corpus c LEFT JOIN hits h USING (doc_id)
ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# q_events_asof_orders — AS-OF JOIN, the classic operator Ray Data lacks
# natively: for every event, the latest order of the same customer at or
# before the event time.  Composition (per the partitioning playbook): both
# sides are normalized to one (key, side, ts, ...) schema and UNIONed, one
# hash-partition-on-key groupby co-locates each key's events AND orders,
# and inside every partition a C-level ``pd.merge_asof(by=key)`` does the
# backward time match.  Only the pruned join columns cross the shuffle.
# Partitioning assumption: all rows of one key fit one partition (knob:
# num_parts); time-ordering is local to the partition, never global.


def events_asof_orders(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ev = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_id", "ts", "user_id"])
    od = dio.read_parquet(_t(sf_dir, "orders"),
                          columns=["o_orderkey", "o_custkey", "o_orderdate"])

    union_schema = pa.schema([
        ("key", pa.int64()), ("side", pa.int8()), ("ts", pa.timestamp("us")),
        ("event_id", pa.int64()), ("o_orderkey", pa.int64()),
    ])

    def norm_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t["user_id"].cast(pa.int64()),
             pa.array(np.ones(n, np.int8)),
             t["ts"].cast(pa.timestamp("us")),
             t["event_id"].cast(pa.int64()),
             pa.nulls(n, pa.int64())],
            schema=union_schema)

    def norm_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t["o_custkey"].cast(pa.int64()),
             pa.array(np.zeros(n, np.int8)),
             t["o_orderdate"].cast(pa.timestamp("us")),
             pa.nulls(n, pa.int64()),
             t["o_orderkey"].cast(pa.int64())],
            schema=union_schema)

    u = ev.map_batches(norm_events, batch_format="pyarrow").union(
        od.map_batches(norm_orders, batch_format="pyarrow"))

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("asof_orderkey", pa.int64()),
        ("asof_orderdate", pa.timestamp("us")),
    ])

    def asof_part(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 1]
        right = df[df["side"] == 0]
        if not len(left) or not len(right):
            return pd.DataFrame(columns=[f.name for f in out_schema])
        # merge_asof keeps the LAST right row at equal (ts): sorting by
        # (ts, o_orderkey) makes the tie-break = max orderkey, matching the
        # mirror's ORDER BY o_orderdate DESC, o_orderkey DESC
        left = left.sort_values(["ts", "event_id"])
        right = right.sort_values(["ts", "o_orderkey"])
        right = right.assign(asof_orderdate=right["ts"])
        m = pd.merge_asof(left[["key", "ts", "event_id"]],
                          right[["key", "ts", "o_orderkey", "asof_orderdate"]],
                          on="ts", by="key", direction="backward")
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame({
            "event_id": m["event_id"].astype(np.int64),
            "user_id": m["key"].astype(np.int64),
            "ts": m["ts"],
            "asof_orderkey": m["o_orderkey"].astype(np.int64),
            "asof_orderdate": m["asof_orderdate"],
        })

    out = partitioned_groupby(u, ["key"], asof_part, num_parts=32,
                              out_schema=out_schema).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_ASOF_ORDERS_SQL = """
WITH j AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
           AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT event_id, user_id, ts,
       o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
FROM j WHERE rn = 1
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q_events_range_join — RANGE (interval-containment) JOIN, the second
# operator family Ray Data lacks natively: assign every event to the
# session interval [s_start, s_end] of the same user that contains its
# timestamp.  The interval table is derived first (sessionize semantics:
# >30 min gap opens a session), then the two tables are normalized, UNIONed
# and co-located per user by ONE hash-partition groupby; inside each
# partition the intervals are sorted by start and each event binary-searches
# its candidate (np.searchsorted) with an end-bound check — per-key interval
# join without any all-pairs expansion.  Partitioning assumption: one key's
# events+intervals fit one partition; intervals per key are disjoint.


def events_range_join(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ev = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_id", "user_id", "ts"])
    gap_us = gap_minutes * 60_000_000

    # stage 1 — derive the interval table (user_id, session_id, s_start,
    # s_end) in int64 microseconds
    iv_schema = pa.schema([
        ("user_id", pa.int64()), ("session_id", pa.int64()),
        ("s_start", pa.int64()), ("s_end", pa.int64()),
    ])

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        ts = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        starts = np.empty(len(df), bool)
        starts[0:1] = True
        starts[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(starts) - 1  # global ordinal within partition
        out = pd.DataFrame({"user_id": uid, "sid": sid, "ts": ts})
        g = out.groupby(["user_id", "sid"], as_index=False).agg(
            s_start=("ts", "min"), s_end=("ts", "max"))
        # per-user ordinal session id (0-based, in time order)
        g["session_id"] = g.groupby("user_id").cumcount().astype(np.int64)
        return g[["user_id", "session_id", "s_start", "s_end"]]

    iv = partitioned_groupby(
        ev.map_batches(lambda t: t.select(["user_id", "ts"]),
                       batch_format="pyarrow"),
        ["user_id"], intervals, num_parts=16, out_schema=iv_schema)

    # stage 2 — normalize, union, partition by key, per-key binary search
    union_schema = pa.schema([
        ("user_id", pa.int64()), ("side", pa.int8()), ("t0", pa.int64()),
        ("t1", pa.int64()), ("event_id", pa.int64()),
        ("session_id", pa.int64()),
    ])

    def norm_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts_us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"].cast(pa.int64()),
             pa.array(np.ones(n, np.int8)), ts_us, pa.nulls(n, pa.int64()),
             t["event_id"].cast(pa.int64()), pa.nulls(n, pa.int64())],
            schema=union_schema)

    def norm_intervals(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t["user_id"], pa.array(np.zeros(n, np.int8)), t["s_start"],
             t["s_end"], pa.nulls(n, pa.int64()), t["session_id"]],
            schema=union_schema)

    u = ev.map_batches(norm_events, batch_format="pyarrow").union(
        iv.map_batches(norm_intervals, batch_format="pyarrow"))

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("session_id", pa.int64()),
    ])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid_val, g in df.groupby("user_id", sort=False):
            evg = g[g["side"] == 1]
            ivg = g[g["side"] == 0].sort_values("t0")
            if not len(evg) or not len(ivg):
                continue
            s0 = ivg["t0"].to_numpy(np.int64)
            s1 = ivg["t1"].to_numpy(np.int64)
            sid = ivg["session_id"].to_numpy(np.int64)
            ts = evg["t0"].to_numpy(np.int64)
            idx = np.searchsorted(s0, ts, side="right") - 1
            ok = (idx >= 0) & (ts <= s1[np.maximum(idx, 0)])
            if not ok.any():
                continue
            outs.append(pd.DataFrame({
                "event_id": evg["event_id"].to_numpy(np.int64)[ok],
                "user_id": np.full(int(ok.sum()), uid_val, np.int64),
                "session_id": sid[idx[ok]],
            }))
        if not outs:
            return pd.DataFrame(columns=[f.name for f in out_schema])
        return pd.concat(outs, ignore_index=True)

    out = partitioned_groupby(u, ["user_id"], assign, num_parts=16,
                              out_schema=out_schema).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_RANGE_JOIN_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM marked),
intervals AS (
  SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
  FROM sess GROUP BY user_id, session_id)
SELECT e.event_id, e.user_id, CAST(i.session_id AS BIGINT) AS session_id
FROM events e
JOIN intervals i
  ON i.user_id = e.user_id AND e.ts BETWEEN i.s_start AND i.s_end
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# q_events_hopping_window — HOPPING (sliding) window aggregate: 1-hour
# windows advancing every 30 minutes, so every event lands in exactly
# window/hop = 2 windows.  Streaming-only concept in the reference survey
# (§2.9); the batch shape is a vectorized flat-expansion inside map_batches
# (np.repeat by the constant fan-out — NO per-row loop, NO self-join)
# followed by ONE groupby on (event_type, window_start).  At 100 TB the
# expansion multiplies rows by window/hop before the shuffle — the combiner
# (groupby inside the same batch) collapses them back to one partial row
# per (type, window) per batch, so only aggregates cross the wire.

_HOP_US = 1_800_000_000          # 30 min
_WINDOW_HOPS = 2                 # 1-hour window = 2 hops


def events_hopping_window(sf_dir: str) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["ts", "event_type", "value"])

    def expand_partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = us // _HOP_US
        vc = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
                      ).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        n = len(us)
        # window starts: bucket*hop and (bucket-1)*hop — both contain ts
        starts = np.concatenate(
            [bucket * _HOP_US, (bucket - 1) * _HOP_US])
        df = pd.DataFrame({
            "event_type": np.tile(et, _WINDOW_HOPS),
            "window_us": starts,
            "n_events": np.ones(n * _WINDOW_HOPS, np.int64),
            "sum_value_c": np.tile(vc, _WINDOW_HOPS),
        })
        g = df.groupby(["event_type", "window_us"], as_index=False).sum()
        return pa.Table.from_pydict(
            {"event_type": g["event_type"].astype(str).to_numpy(),
             "window_us": g["window_us"].to_numpy(np.int64),
             "n_events": g["n_events"].to_numpy(np.int64),
             "sum_value_c": g["sum_value_c"].to_numpy(np.int64)},
            schema=pa.schema([
                ("event_type", pa.string()), ("window_us", pa.int64()),
                ("n_events", pa.int64()), ("sum_value_c", pa.int64())]))

    out = (ds.map_batches(expand_partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby(["event_type", "window_us"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value_c", alias_name="sum_value_c"))
           .to_pandas())
    out["window_start"] = pd.to_datetime(out["window_us"], unit="us") \
        .astype("datetime64[us]")
    out = out[["event_type", "window_start", "n_events", "sum_value_c"]]
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value_c"] = out["sum_value_c"].astype(np.int64)
    return out.sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)


EVENTS_HOPPING_WINDOW_SQL = """
SELECT event_type,
       time_bucket(INTERVAL 30 MINUTE, ts) - o.k * INTERVAL 30 MINUTE
         AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_c
FROM events CROSS JOIN (VALUES (0), (1)) o(k)
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


# ---------------------------------------------------------------------------
# q_events_distinct_users — exact COUNT(DISTINCT) per group, the canonical
# "combiner before the shuffle" aggregate: a per-batch (day, type, user)
# drop_duplicates combiner collapses repeat actives BEFORE anything crosses
# the wire, then ONE hash-partition groupby on (day, type) counts uniques
# per partition group vectorized (pandas nunique over complete key groups).
# At 100 TB the combiner bounds shuffle volume by (distinct triples per
# batch), not raw rows — the standard exact-distinct shape; an approximate
# HLL sketch would replace the partition fn, nothing else.


def events_distinct_users(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["ts", "event_type", "user_id"])

    def combine(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day_us = (us // 86_400_000_000) * 86_400_000_000
        df = pd.DataFrame({
            "day_us": day_us,
            "event_type": np.asarray(t["event_type"].to_pylist(), object),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        }).drop_duplicates()
        return pa.Table.from_pydict(
            {"day_us": df["day_us"].to_numpy(np.int64),
             "event_type": df["event_type"].astype(str).to_numpy(),
             "user_id": df["user_id"].to_numpy(np.int64)},
            schema=pa.schema([("day_us", pa.int64()),
                              ("event_type", pa.string()),
                              ("user_id", pa.int64())]))

    out_schema = pa.schema([
        ("day_us", pa.int64()), ("event_type", pa.string()),
        ("n_users", pa.int64())])

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["day_us", "event_type"], as_index=False)["user_id"]
             .nunique().rename(columns={"user_id": "n_users"}))
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    out = partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["day_us", "event_type"], per_group, num_parts=16,
        out_schema=out_schema).to_pandas()
    out["day"] = pd.to_datetime(out["day_us"], unit="us") \
        .astype("datetime64[us]")
    out = out[["day", "event_type", "n_users"]]
    return out.sort_values(["day", "event_type"]).reset_index(drop=True)


EVENTS_DISTINCT_USERS_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
"""


# ---------------------------------------------------------------------------
# q_orders_price_quantiles — EXACT global quantiles without a global sort:
# pass 1 builds a coarse fixed-width histogram ($100 bins) via per-batch
# value-count combiner + tiny groupby; the driver walks the cumulative
# histogram to find each target rank's bin; pass 2 re-scans with a filter
# that keeps ONLY rows in those boundary bins (a vanishing fraction — the
# only rows ever pulled to the driver) and resolves the exact rank value
# inside each bin.  Same two-pass histogram-refinement shape as
# docs_token_budget; rank definition rn = ceil(p·n), 1-indexed, over
# ascending price — pinned identically in the mirror.

_QUANTILES = (0.5, 0.9, 0.99)
_QBIN_C = 10_000  # $100 bins over integer cents


def _exact_price_quantiles(sf_dir: str, qs: tuple[float, ...]) -> np.ndarray:
    """Exact rank-``ceil(q·n)`` order-statistic values of integer-cent
    o_totalprice, via the two-pass histogram refinement described above.
    Returns one int64 cent value per q."""
    ds = dio.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def bin_counts(t: pa.Table) -> pa.Table:
        pc_ = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                       * 100 + 0.5).astype(np.int64)
        bins, cnts = np.unique(pc_ // _QBIN_C, return_counts=True)
        return pa.Table.from_pydict(
            {"bin": bins, "cnt": cnts.astype(np.int64)},
            schema=pa.schema([("bin", pa.int64()), ("cnt", pa.int64())]))

    hist = (ds.map_batches(bin_counts, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("bin").sum("cnt").to_pandas())
    cnt_col = [c for c in hist.columns if c != "bin"][0]
    hist = hist.sort_values("bin").reset_index(drop=True)
    cum = hist[cnt_col].cumsum().to_numpy(np.int64)
    n = int(cum[-1])
    ranks = np.array([int(np.ceil(p * n)) for p in qs], np.int64)
    bin_idx = np.searchsorted(cum, ranks, side="left")
    target_bins = hist["bin"].to_numpy(np.int64)[bin_idx]
    # rank offset within each target bin (1-indexed)
    below = np.where(bin_idx > 0, cum[bin_idx - 1], 0)
    offsets = ranks - below
    tb = np.unique(target_bins)

    def only_target(t: pa.Table) -> pa.Table:
        pc_ = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                       * 100 + 0.5).astype(np.int64)
        m = np.isin(pc_ // _QBIN_C, tb)
        return pa.Table.from_pydict(
            {"price_c": pc_[m]},
            schema=pa.schema([("price_c", pa.int64())]))

    boundary = (ds.map_batches(only_target, batch_format="pyarrow",
                               batch_size=65536).to_pandas())
    vals = np.sort(boundary["price_c"].to_numpy(np.int64))
    vbins = vals // _QBIN_C
    out_vals = []
    for b, off in zip(target_bins, offsets):
        inbin = vals[vbins == b]
        out_vals.append(int(inbin[off - 1]))
    return np.asarray(out_vals, np.int64)


def orders_price_quantiles(sf_dir: str) -> pd.DataFrame:
    return pd.DataFrame({
        "q": np.asarray(_QUANTILES, np.float64),
        "price_c": _exact_price_quantiles(sf_dir, _QUANTILES)})


ORDERS_PRICE_QUANTILES_SQL = """
WITH s AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders),
r AS (
  SELECT price_c, row_number() OVER (ORDER BY price_c) AS rn,
         count(*) OVER () AS n
  FROM s)
SELECT CAST(v.q AS DOUBLE) AS q, r.price_c
FROM (VALUES (0.5), (0.9), (0.99)) v(q)
JOIN r ON r.rn = CAST(ceil(v.q * r.n) AS BIGINT)
ORDER BY q
"""


# ---------------------------------------------------------------------------
# q_docs_top_tokens — exact distributed heavy hitters (top-k frequent
# tokens).  Canonical map-reduce: per-batch value_counts combiner (the only
# thing that crosses the wire is one (token, cnt) partial per DISTINCT
# token per batch), ONE hash-partition groupby on token, per-partition
# local top-k, driver merges the ≤ k×P candidates.  Exact because each
# token's total count lives entirely in one partition — the global top-k is
# a subset of the union of per-partition top-ks.  Tie-break pinned to
# (cnt DESC, token ASC) in both engine and mirror so the rank-k boundary
# is deterministic.

_TOPK_TOKENS = 20


def docs_top_tokens(sf_dir: str, k: int = _TOPK_TOKENS) -> pd.DataFrame:
    # the static mirror DOCS_TOP_TOKENS_SQL is pinned to the default k —
    # callers overriding k get a correct engine result but must build
    # their own mirror
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def combine(t: pa.Table) -> pa.Table:
        # split semantics pinned to DuckDB string_split(text, ' '):
        # consecutive separators yield empty strings, filtered on both sides
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pd.Series(toks.to_pandas()).value_counts()
        return pa.Table.from_pydict(
            {"token": vc.index.astype(str).to_numpy(),
             "cnt": vc.to_numpy(np.int64)},
            schema=pa.schema([("token", pa.string()), ("cnt", pa.int64())]))

    out_schema = pa.schema([("token", pa.string()), ("cnt", pa.int64())])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "token"], ascending=[False, True])
        return g.head(k).astype({"cnt": np.int64})

    cand = partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["token"], local_topk, num_parts=16, out_schema=out_schema
    ).to_pandas()
    cand = cand.sort_values(["cnt", "token"], ascending=[False, True])
    return cand.head(k).reset_index(drop=True)


DOCS_TOP_TOKENS_SQL = f"""
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM t WHERE token != '' GROUP BY token)
SELECT token, cnt FROM c
ORDER BY cnt DESC, token
LIMIT {_TOPK_TOKENS}
"""


# ---------------------------------------------------------------------------
# q_events_funnel — ordered sequence match (funnel analysis): per user, how
# far through view → click → purchase did they get, each stage strictly
# AFTER the previous one?  Scale shape: ONE hash-partition groupby on
# user_id (only (user_id, ts, event_type) cross the shuffle, rows
# pre-filtered to the funnel's event types); inside each partition the
# three stage times resolve as vectorized groupby-mins — t1 = min view
# time, t2 = min click time > t1, t3 = min purchase time > t2 — no per-user
# Python loop, no self-join.

_FUNNEL = ("view", "click", "purchase")


def events_funnel(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["user_id", "ts", "event_type"])

    def prefilter(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(list(_FUNNEL)))
        t = t.filter(m)
        return pa.Table.from_arrays(
            [t["user_id"].cast(pa.int64()),
             t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
             t["event_type"]],
            names=["user_id", "ts_us", "event_type"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("funnel_stage", pa.int64())])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": df["user_id"].unique()})
        t1 = (df[df["event_type"] == _FUNNEL[0]]
              .groupby("user_id")["ts_us"].min().rename("t1"))
        out = users.merge(t1, on="user_id", how="left")
        d2 = df[df["event_type"] == _FUNNEL[1]].merge(
            out[["user_id", "t1"]], on="user_id")
        t2 = (d2[d2["ts_us"] > d2["t1"]]
              .groupby("user_id")["ts_us"].min().rename("t2"))
        out = out.merge(t2, on="user_id", how="left")
        d3 = df[df["event_type"] == _FUNNEL[2]].merge(
            out[["user_id", "t2"]], on="user_id")
        t3 = (d3[d3["ts_us"] > d3["t2"]]
              .groupby("user_id")["ts_us"].min().rename("t3"))
        out = out.merge(t3, on="user_id", how="left")
        stage = (out["t1"].notna().astype(np.int64)
                 + out["t2"].notna().astype(np.int64)
                 + out["t3"].notna().astype(np.int64))
        return pd.DataFrame({"user_id": out["user_id"].to_numpy(np.int64),
                             "funnel_stage": stage.to_numpy(np.int64)})

    out = partitioned_groupby(
        ds.map_batches(prefilter, batch_format="pyarrow", batch_size=65536),
        ["user_id"], per_user, num_parts=16, out_schema=out_schema
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_FUNNEL_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')),
s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q_events_props_stats — semi-structured (JSON) column extraction + rollup,
# the parser/extractor family (SURVEY §2.2) over the events.props payload.
# Extraction is one C-level compiled-regex pass per batch
# (pd.Series.str.extract — no per-row json.loads; the mirror pins the
# semantics to DuckDB's json_extract), then the usual combiner-style
# groupby.  Rows whose props lack the key fall out as NULL on both sides
# (sum skips, n_with_k counts non-null).

# NB: regex-vs-json_extract parity holds for FLAT one-level objects (the
# fixture shape, verified non-vacuously in tests) — a nested payload or a
# '"k":' inside a string value would diverge; swap in a real JSON kernel
# at the map_batches boundary if the corpus ever grows such rows.
_PROPS_K_RE = r'"k"\s*:\s*(-?\d+)'


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_type", "props"])

    def extract_partial(t: pa.Table) -> pa.Table:
        props = pd.Series(t["props"].to_pylist(), dtype=str)
        k = props.str.extract(_PROPS_K_RE, expand=False).astype("Int64")
        df = pd.DataFrame({
            "event_type": np.asarray(t["event_type"].to_pylist(), object),
            "k": k,
        })
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), n_with_k=("k", "count"),
            sum_k=("k", "sum"))
        return pa.Table.from_pydict(
            {"event_type": g["event_type"].astype(str).to_numpy(),
             "n_events": g["n_events"].to_numpy(np.int64),
             "n_with_k": g["n_with_k"].to_numpy(np.int64),
             "sum_k": g["sum_k"].astype(np.int64).to_numpy()},
            schema=pa.schema([
                ("event_type", pa.string()), ("n_events", pa.int64()),
                ("n_with_k", pa.int64()), ("sum_k", pa.int64())]))

    out = (ds.map_batches(extract_partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("event_type")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("n_with_k", alias_name="n_with_k"),
                      Sum("sum_k", alias_name="sum_k"))
           .to_pandas())
    for c in ("n_events", "n_with_k", "sum_k"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS n_with_k,
       CAST(coalesce(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)), 0)
         AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q_events_moving_sum — ordered per-key window function (ROWS 2 PRECEDING):
# for every event, the sum of value over the user's last 3 events in time
# order.  Unlike the tumbling/hopping buckets above, this is an ORDER-
# dependent running aggregate — the family that needs each key's full
# ordered history co-located.  Scale shape: ONE hash-partition groupby on
# user_id; inside the partition the rolling sum is a cumsum-difference over
# the (user, ts)-sorted frame with group-boundary masking — no per-user
# loop, no pandas .rolling.  Ordering pinned to (ts, event_id) on both
# sides so ties are deterministic.

_MOVWIN = 3


def events_moving_sum(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_id", "user_id", "ts", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        vc = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
                      ).astype(np.int64)
        return pa.Table.from_arrays(
            [t["event_id"].cast(pa.int64()), t["user_id"].cast(pa.int64()),
             t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
             pa.array(vc)],
            names=["event_id", "user_id", "ts_us", "value_c"])

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("moving_sum_c", pa.int64())])

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        v = df["value_c"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        cs = np.concatenate([[0], np.cumsum(v)])
        n = len(v)
        idx = np.arange(n)
        # first row index of each user's run (runs are contiguous)
        run_start = np.zeros(n, np.int64)
        new_run = np.empty(n, bool)
        new_run[0:1] = True
        new_run[1:] = uid[1:] != uid[:-1]
        run_start[new_run] = idx[new_run]
        run_start = np.maximum.accumulate(run_start)
        lo = np.maximum(idx - (_MOVWIN - 1), run_start)
        mov = cs[idx + 1] - cs[lo]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "moving_sum_c": mov})

    out = partitioned_groupby(
        ds.map_batches(to_cents, batch_format="pyarrow", batch_size=65536),
        ["user_id"], per_key, num_parts=16, out_schema=out_schema
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_MOVING_SUM_SQL = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {_MOVWIN - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS moving_sum_c
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q_orders_median_by_priority — exact per-GROUP order statistic (lower
# median), the complement of the global-histogram quantiles above: when the
# quantile is per group, hash-partitioning on the group key co-locates each
# group's full value set, and the median is a direct vectorized order
# statistic inside the partition (sort once, pick rank ceil(n/2) per group
# via group-offset arithmetic — no histogram, no second pass, no per-group
# loop).  Rank definition pinned identically in the mirror.


def orders_median_by_priority(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "orders"),
                          columns=["o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        vc = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                      * 100 + 0.5).astype(np.int64)
        return pa.Table.from_arrays(
            [t["o_orderpriority"], pa.array(vc)],
            names=["o_orderpriority", "price_c"])

    out_schema = pa.schema([
        ("o_orderpriority", pa.string()), ("median_price_c", pa.int64()),
        ("n_orders", pa.int64())])

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["o_orderpriority", "price_c"],
                           kind="mergesort").reset_index(drop=True)
        grp = s.groupby("o_orderpriority", sort=False)["price_c"]
        sizes = grp.size()
        starts = np.concatenate([[0], np.cumsum(sizes.to_numpy())[:-1]])
        ranks = starts + np.ceil(sizes.to_numpy() / 2).astype(np.int64) - 1
        return pd.DataFrame({
            "o_orderpriority": sizes.index.to_numpy(object),
            "median_price_c": s["price_c"].to_numpy(np.int64)[ranks],
            "n_orders": sizes.to_numpy(np.int64)})

    out = partitioned_groupby(
        ds.map_batches(to_cents, batch_format="pyarrow", batch_size=65536),
        ["o_orderpriority"], per_group, num_parts=8, out_schema=out_schema
    ).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


ORDERS_MEDIAN_BY_PRIORITY_SQL = """
WITH s AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders),
r AS (
  SELECT o_orderpriority, price_c,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY price_c) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM s)
SELECT o_orderpriority, price_c AS median_price_c,
       CAST(n AS BIGINT) AS n_orders
FROM r WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q_integrity_audit — referential-integrity audit over every FK edge of the
# corpus star schema, the data-quality gate a 100-TB ingest runs before
# anything else: for each child→parent edge, count child rows and orphans
# (child keys with no parent).  Scale shape per edge: the PARENT key set is
# the small side (dimensions, or a pre-aggregated key column) — broadcast
# once via ray.put as a sorted int64 array — and the child streams through
# one map_batches doing a vectorized np.isin partial count; a tiny
# one-row-per-batch groupby sums the partials.  No shuffle touches child
# rows.  For a child whose parent is NOT small (lineitem→orders), the
# parent key column alone (int64, ~1.5 MB per 190k keys at sf0.01, still
# broadcastable orders of magnitude beyond this corpus) is what ships —
# the full-table join is never materialized.

_FK_EDGES = (
    # child table, child key, parent table, parent key
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def integrity_audit(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for child, ck, parent, pk in _FK_EDGES:
        pkeys = np.unique(
            pq.read_table(_t(sf_dir, parent), columns=[pk])[pk]
            .to_numpy(zero_copy_only=False).astype(np.int64))
        pref = ray.put(pkeys)
        ds = dio.read_parquet(_t(sf_dir, child), columns=[ck])

        def partial(t: pa.Table, _ck=ck) -> pa.Table:
            keys = ray.get(pref)
            cv = t[_ck].to_numpy(zero_copy_only=False).astype(np.int64)
            n_orph = int((~np.isin(cv, keys)).sum())
            return pa.Table.from_pydict(
                {"n_rows": [len(cv)], "n_orphans": [n_orph]},
                schema=pa.schema([("n_rows", pa.int64()),
                                  ("n_orphans", pa.int64())]))

        agg = (ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
               .sum(["n_rows", "n_orphans"]))
        rows.append({
            "edge": f"{child}.{ck}->{parent}.{pk}",
            "n_rows": int(agg["sum(n_rows)"]),
            "n_orphans": int(agg["sum(n_orphans)"]),
        })
    out = pd.DataFrame(rows)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_orphans"] = out["n_orphans"].astype(np.int64)
    return out.sort_values("edge").reset_index(drop=True)


INTEGRITY_AUDIT_SQL = """
WITH e AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS edge,
         count(*) AS n_rows,
         sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey', count(*),
         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'customer.c_nationkey->nation.n_nationkey', count(*),
         sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'supplier.s_nationkey->nation.n_nationkey', count(*),
         sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'nation.n_regionkey->region.r_regionkey', count(*),
         sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
  FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT edge, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_orphans AS BIGINT) AS n_orphans
FROM e ORDER BY edge
"""


# ---------------------------------------------------------------------------
# q_events_pivot_dow — pivot / crosstab reshape: event_type × day-of-week
# counts as a WIDE table (one n_dow{0..6} column per weekday).  Scale
# shape: the heavy side stays LONG — per-batch (type, dow) count partials →
# one tiny groupby — and only the aggregated (|types| × 7)-cell result is
# reshaped wide on the driver; a pivot that widened before aggregating
# would ship one sparse column per category through the shuffle.  Weekday
# convention pinned to DuckDB's dayofweek (0 = Sunday): epoch day 0
# (1970-01-01) was a Thursday → dow = (days + 4) % 7.

_DOW_COLS = [f"n_dow{d}" for d in range(7)]


def events_pivot_dow(sf_dir: str) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000) + 4) % 7
        df = pd.DataFrame({
            "event_type": np.asarray(t["event_type"].to_pylist(), object),
            "dow": dow.astype(np.int64)})
        g = df.groupby(["event_type", "dow"], as_index=False).size()
        return pa.Table.from_pydict(
            {"event_type": g["event_type"].astype(str).to_numpy(),
             "dow": g["dow"].to_numpy(np.int64),
             "n": g["size"].to_numpy(np.int64)},
            schema=pa.schema([("event_type", pa.string()),
                              ("dow", pa.int64()), ("n", pa.int64())]))

    long = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["event_type", "dow"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    wide = long.pivot_table(index="event_type", columns="dow", values="n",
                            aggfunc="sum", fill_value=0)
    wide = wide.reindex(columns=range(7), fill_value=0)
    wide.columns = _DOW_COLS
    wide = wide.reset_index().astype({c: np.int64 for c in _DOW_COLS})
    wide["event_type"] = wide["event_type"].astype(str)
    return wide.sort_values("event_type").reset_index(drop=True)


EVENTS_PIVOT_DOW_SQL = """
SELECT event_type,
       CAST(count(*) FILTER (dayofweek(ts) = 0) AS BIGINT) AS n_dow0,
       CAST(count(*) FILTER (dayofweek(ts) = 1) AS BIGINT) AS n_dow1,
       CAST(count(*) FILTER (dayofweek(ts) = 2) AS BIGINT) AS n_dow2,
       CAST(count(*) FILTER (dayofweek(ts) = 3) AS BIGINT) AS n_dow3,
       CAST(count(*) FILTER (dayofweek(ts) = 4) AS BIGINT) AS n_dow4,
       CAST(count(*) FILTER (dayofweek(ts) = 5) AS BIGINT) AS n_dow5,
       CAST(count(*) FILTER (dayofweek(ts) = 6) AS BIGINT) AS n_dow6
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q_orders_rollup — hierarchical aggregate (GROUP BY ROLLUP shape): order
# count + revenue at three grains — (priority, status), (priority), grand
# total — from ONE pass over the fact table.  Scale shape: the per-batch
# combiner aggregates at the FINEST grain only; one tiny groupby merges the
# partials; the coarser levels are rolled up on the driver from the
# finest-grain result (≤ |priorities|×|statuses| rows) — rollup levels
# never re-scan the big table and never widen the shuffle.  Rolled-up key
# columns carry the sentinel 'ALL' (COALESCE'd identically in the mirror)
# so the driver's value-hash sees no NULLs.


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    ds = dio.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    out_schema = pa.schema([
        ("o_orderpriority", pa.string()), ("o_orderstatus", pa.string()),
        ("n_orders", pa.int64()), ("sum_price_c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        price_c = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                           * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "o_orderpriority": np.asarray(
                t["o_orderpriority"].to_pylist(), object),
            "o_orderstatus": np.asarray(
                t["o_orderstatus"].to_pylist(), object),
            "price_c": price_c})
        g = df.groupby(["o_orderpriority", "o_orderstatus"],
                       as_index=False, sort=False).agg(
            n_orders=("price_c", "size"), sum_price_c=("price_c", "sum"))
        return pa.Table.from_pandas(
            g, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    fine = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["o_orderpriority", "o_orderstatus"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("sum_price_c", alias_name="sum_price_c"))
            .to_pandas())
    lvl1 = fine.groupby("o_orderpriority", as_index=False)[
        ["n_orders", "sum_price_c"]].sum()
    lvl1["o_orderstatus"] = "ALL"
    lvl0 = pd.DataFrame({
        "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
        "n_orders": [fine["n_orders"].sum()],
        "sum_price_c": [fine["sum_price_c"].sum()]})
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["sum_price_c"] = out["sum_price_c"].astype(np.int64)
    return (out[["o_orderpriority", "o_orderstatus", "n_orders",
                 "sum_price_c"]]
            .sort_values(["o_orderpriority", "o_orderstatus"])
            .reset_index(drop=True))


ORDERS_ROLLUP_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price_c
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# q_docs_snapshot_diff — snapshot diff (dataset-versioning audit): classify
# every key across two corpus versions as added / removed / changed.  The
# v2 snapshot is derived deterministically from documents via the md5(id)
# nibble (nibble 0/1 rows dropped, nibble 2 rows edited, nibble f rows
# cloned as brand-new ids) so engine and mirror see the same two tables
# without external data.  Scale shape: each side maps to (key, 16-hex
# payload digest, side) — the TEXT never crosses the wire — then union +
# ONE hash-partition groupby on the key classifies each group vectorized.
# The same diff would run over two 100-TB snapshots moving 24 bytes/row.

_DIFF_ADD_OFFSET = 10_000_000


def docs_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    import hashlib

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                            columns=["doc_id", "text"])

    def digest_side(t: pa.Table, side: int, as_v2: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        if as_v2:
            nib = np.fromiter(
                (hashlib.md5(str(i).encode()).hexdigest()[0] for i in ids),
                dtype="U1", count=len(ids))
            keep = ~np.isin(nib, ("0", "1"))
            # NULL text stays NULL under the mirror's || concatenations
            # (NULL || x IS NULL), so the edit/prefix must not apply —
            # both sides then digest the same sentinel and the row
            # classifies 'same', exactly like SQL's NULL != NULL
            edited = [tx + " [edited]" if nb == "2" and tx is not None
                      else tx for tx, nb in zip(texts, nib)]
            out_ids = ids[keep]
            out_tx = [tx for tx, k in zip(edited, keep) if k]
            newm = nib == "f"
            out_ids = np.concatenate(
                [out_ids, ids[newm] + _DIFF_ADD_OFFSET])
            out_tx += ["new: " + tx if tx is not None else None
                       for tx, m in zip(texts, newm) if m]
        else:
            out_ids, out_tx = ids, texts
        dig = [hashlib.md5(
            (tx if tx is not None else "\x00null\x00").encode()
        ).hexdigest()[:16] for tx in out_tx]
        return pa.Table.from_pydict(
            {"doc_id": out_ids, "dig": dig,
             "side": np.full(len(out_ids), side, np.int64)},
            schema=pa.schema([("doc_id", pa.int64()), ("dig", pa.string()),
                              ("side", pa.int64())]))

    old = docs.map_batches(lambda t: digest_side(t, 0, False),
                           batch_format="pyarrow", batch_size=8192)
    new = docs.map_batches(lambda t: digest_side(t, 1, True),
                           batch_format="pyarrow", batch_size=8192)

    out_schema = pa.schema([("doc_id", pa.int64()), ("change", pa.string())])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        d0 = df[df["side"] == 0].set_index("doc_id")["dig"]
        d1 = df[df["side"] == 1].set_index("doc_id")["dig"]
        j = d0.to_frame("d0").join(d1.to_frame("d1"), how="outer")
        change = np.where(
            j["d0"].isna(), "added",
            np.where(j["d1"].isna(), "removed",
                     np.where(j["d0"] != j["d1"], "changed", "same")))
        out = pd.DataFrame({"doc_id": j.index.to_numpy(np.int64),
                            "change": change})
        return out[out["change"] != "same"]

    out = _typed(partitioned_groupby(old.union(new), ["doc_id"], classify,
                                     num_parts=16,
                                     out_schema=out_schema).to_pandas(),
                 out_schema)
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_SNAPSHOT_DIFF_SQL = f"""
WITH nib AS (
  SELECT doc_id, text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nb
  FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN nb = '2' THEN text || ' [edited]' ELSE text END AS text
  FROM nib WHERE nb NOT IN ('0', '1')
  UNION ALL
  SELECT doc_id + {_DIFF_ADD_OFFSET}, 'new: ' || text
  FROM nib WHERE nb = 'f')
SELECT CAST(COALESCE(o.doc_id, n.doc_id) AS BIGINT) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text != n.text
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_orders_price_ntile — decile assignment over the whole fact table (the
# per-row complement of orders_price_quantiles): compute the 9 exact decile
# boundary values with the two-pass histogram refinement, broadcast them
# (9 ints), and classify every row in one streaming map_batches — a global
# NTILE without a global sort.  Value-defined (decile = 1 + #boundaries
# strictly below the row's price, boundaries at rank ceil(k·n/10)) so ties
# share a decile deterministically — unlike SQL NTILE's arbitrary-order
# tie-split, which cannot be value-matched across engines.

_NTILE_QS = tuple(k / 10 for k in range(1, 10))


def orders_price_ntile(sf_dir: str) -> pd.DataFrame:
    bounds = _exact_price_quantiles(sf_dir, _NTILE_QS)
    ds = dio.read_parquet(_t(sf_dir, "orders"),
                          columns=["o_orderkey", "o_totalprice"])

    def assign(t: pa.Table) -> pa.Table:
        price_c = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                           * 100 + 0.5).astype(np.int64)
        dec = 1 + np.searchsorted(bounds, price_c, side="left").astype(np.int64)
        return pa.Table.from_pydict(
            {"o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False)
             .astype(np.int64),
             "price_c": price_c, "decile": dec},
            schema=pa.schema([("o_orderkey", pa.int64()),
                              ("price_c", pa.int64()),
                              ("decile", pa.int64())]))

    out = ds.map_batches(assign, batch_format="pyarrow",
                         batch_size=65536).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# q_events_cooccurrence — association / market-basket mining: how often
# does each PAIR of event types co-occur within the same user-day basket?
# Scale shape: per-batch distinct-(user, day, type) combiner shrinks the
# stream to basket membership rows; ONE user-partition groupby co-locates
# every user's baskets, where pair expansion is a vectorized self-merge on
# (user, day) — per-basket cost is C(k,2) with k bounded by the type
# vocabulary, never by event volume — and per-partition (a, b) count
# partials merge through a tiny final groupby.


def events_cooccurrence(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["user_id", "ts", "event_type"])
    day_us = np.int64(86_400) * 1_000_000

    def distinct_udt(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "day": us // day_us,
            "event_type": np.asarray(t["event_type"].to_pylist(), object),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=pa.schema([
                                        ("user_id", pa.int64()),
                                        ("day", pa.int64()),
                                        ("event_type", pa.string())]))

    out_schema = pa.schema([("type_a", pa.string()), ("type_b", pa.string()),
                            ("n", pa.int64())])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day", "event_type"])
        m = d.merge(d, on=["user_id", "day"])
        m = m[m["event_type_x"] < m["event_type_y"]]
        g = (m.groupby(["event_type_x", "event_type_y"], as_index=False)
             .size().rename(columns={"event_type_x": "type_a",
                                     "event_type_y": "type_b",
                                     "size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = (partitioned_groupby(
        ds.map_batches(distinct_udt, batch_format="pyarrow",
                       batch_size=65536),
        ["user_id"], per_part, num_parts=8, out_schema=out_schema)
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_baskets")).to_pandas())
    agg["n_baskets"] = agg["n_baskets"].astype(np.int64)
    return (agg.sort_values(["type_a", "type_b"]).reset_index(drop=True))


EVENTS_COOCCURRENCE_SQL = """
WITH udt AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type
  FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_baskets
FROM udt a JOIN udt b
  ON a.user_id = b.user_id AND a.day = b.day
 AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_events_retention — cohort retention analysis: users grouped by their
# first-activity week (the cohort), counted per week offset they return.
# Scale shape: per-batch distinct-(user, week) combiner shrinks the stream
# to at most one row per user-week per batch; ONE user-partition groupby
# co-locates each user's weeks so cohort (min week) and offsets derive
# exactly in-partition; per-partition (cohort, offset) count partials then
# merge through a tiny final groupby.  Week index pinned to
# floor(epoch_seconds / 604800) in both engine and mirror.


def events_retention(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    wk_us = np.int64(604_800) * 1_000_000

    def distinct_uw(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "wk": us // wk_us}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=pa.schema([
                                        ("user_id", pa.int64()),
                                        ("wk", pa.int64())]))

    out_schema = pa.schema([("cohort_week", pa.int64()),
                            ("week_offset", pa.int64()),
                            ("n", pa.int64())])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "wk"])
        cohort = d.groupby("user_id")["wk"].transform("min")
        g = (pd.DataFrame({"cohort_week": cohort.to_numpy(np.int64),
                           "week_offset": (d["wk"] - cohort)
                           .to_numpy(np.int64)})
             .groupby(["cohort_week", "week_offset"], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = (partitioned_groupby(
        ds.map_batches(distinct_uw, batch_format="pyarrow",
                       batch_size=65536),
        ["user_id"], per_part, num_parts=8, out_schema=out_schema)
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users")).to_pandas())
    agg["n_users"] = agg["n_users"].astype(np.int64)
    return (agg.sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))


EVENTS_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
  FROM events),
c AS (
  SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
SELECT c.cohort AS cohort_week,
       uw.wk - c.cohort AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_orders_price_minmax — grouped feature normalization (the ML-prep
# min-max scaling transform): each order's price rescaled to [0, 1] within
# its priority group.  Two-pass shape shared with ntile: pass 1 is a
# per-batch grouped min/max combiner + one tiny groupby (|groups| rows);
# pass 2 broadcasts the bounds and rescales every row in one streaming
# map_batches.  Exactness: bounds are integer cents and the scale is one
# double division of two int64s — identical IEEE result in numpy and
# DuckDB, so the e6 rounding can't diverge.


def orders_price_minmax(sf_dir: str) -> pd.DataFrame:
    ds = dio.read_parquet(_t(sf_dir, "orders"),
                          columns=["o_orderkey", "o_orderpriority",
                                   "o_totalprice"])

    def bounds_partial(t: pa.Table) -> pa.Table:
        price_c = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                           * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "o_orderpriority": np.asarray(
                t["o_orderpriority"].to_pylist(), object),
            "price_c": price_c})
        g = df.groupby("o_orderpriority", as_index=False)["price_c"].agg(
            ["min", "max"])
        return pa.Table.from_pydict(
            {"o_orderpriority": g["o_orderpriority"].to_numpy(object),
             "lo": g["min"].to_numpy(np.int64),
             "hi": g["max"].to_numpy(np.int64)},
            schema=pa.schema([("o_orderpriority", pa.string()),
                              ("lo", pa.int64()), ("hi", pa.int64())]))

    bounds = (ds.map_batches(bounds_partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby("o_orderpriority")
              .aggregate(Min("lo", alias_name="lo"),
                         Max("hi", alias_name="hi")).to_pandas())
    lo = dict(zip(bounds["o_orderpriority"], bounds["lo"].astype(np.int64)))
    hi = dict(zip(bounds["o_orderpriority"], bounds["hi"].astype(np.int64)))
    lo_ref, hi_ref = ray.put(lo), ray.put(hi)

    def rescale(t: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(lo_ref), ray.get(hi_ref)
        prio = t["o_orderpriority"].to_pylist()
        price_c = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                           * 100 + 0.5).astype(np.int64)
        lo_v = np.fromiter((lo_m[p] for p in prio), np.int64,
                           count=len(prio))
        hi_v = np.fromiter((hi_m[p] for p in prio), np.int64,
                           count=len(prio))
        span = hi_v - lo_v
        scaled = np.where(
            span == 0, 0.0,
            (price_c - lo_v).astype(np.float64)
            / np.where(span == 0, 1, span).astype(np.float64))
        return pa.Table.from_pydict(
            {"o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False)
             .astype(np.int64),
             "o_orderpriority": pa.array(prio, pa.string()),
             "scaled_e6": np.floor(scaled * 1e6 + 0.5).astype(np.int64)},
            schema=pa.schema([("o_orderkey", pa.int64()),
                              ("o_orderpriority", pa.string()),
                              ("scaled_e6", pa.int64())]))

    out = ds.map_batches(rescale, batch_format="pyarrow",
                         batch_size=65536).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


ORDERS_PRICE_MINMAX_SQL = """
WITH s AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders),
b AS (
  SELECT o_orderpriority, min(price_c) AS lo, max(price_c) AS hi
  FROM s GROUP BY o_orderpriority)
SELECT s.o_orderkey, s.o_orderpriority,
       CAST(floor(CASE WHEN b.hi = b.lo THEN 0.0
                       ELSE (s.price_c - b.lo)::DOUBLE / (b.hi - b.lo)
                  END * 1e6 + 0.5) AS BIGINT) AS scaled_e6
FROM s JOIN b USING (o_orderpriority)
ORDER BY s.o_orderkey
"""


# ---------------------------------------------------------------------------
# q_events_debounce — stream-style per-key duplicate suppression (the
# event-log analog of exact dedup): keep an event only if the SAME
# (user_id, event_type) did not fire within the last DEBOUNCE_MIN minutes
# (lag semantics — measured against the previous event, pinned identically
# in the mirror's lag() window).  Scale shape: prune to 4 columns, ONE
# user-partition groupby co-locates each key, then a vectorized
# sort + shift + run-boundary mask decides every row — no per-key loop,
# no second shuffle.

DEBOUNCE_MIN = 10


def events_debounce(sf_dir: str, minutes: int = DEBOUNCE_MIN) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_id", "ts", "user_id", "event_type"])

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("event_type", pa.string())])
    gap_us = np.int64(minutes) * 60_000_000

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                           kind="mergesort").reset_index(drop=True)
        ts = s["ts"].to_numpy("datetime64[us]").view(np.int64)
        run_start = np.ones(len(s), bool)
        if len(s) > 1:
            same = ((s["user_id"].to_numpy()[1:]
                     == s["user_id"].to_numpy()[:-1])
                    & (s["event_type"].to_numpy()[1:]
                       == s["event_type"].to_numpy()[:-1]))
            run_start[1:] = ~same
        gap_ok = np.ones(len(s), bool)
        if len(s) > 1:
            gap_ok[1:] = (ts[1:] - ts[:-1]) > gap_us
        keep = run_start | gap_ok
        k = s[keep]
        return pd.DataFrame({
            "event_id": k["event_id"].to_numpy(np.int64),
            "user_id": k["user_id"].to_numpy(np.int64),
            "event_type": k["event_type"].to_numpy(object)})

    out = _typed(partitioned_groupby(ds, ["user_id"], per_part, num_parts=8,
                                     out_schema=out_schema).to_pandas(),
                 out_schema)
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_DEBOUNCE_SQL = f"""
WITH r AS (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pts
  FROM events)
SELECT event_id, user_id, event_type
FROM r WHERE pts IS NULL OR ts - pts > INTERVAL {DEBOUNCE_MIN} MINUTE
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q_emb_lang_centroids — grouped dense-vector mean (the reduction behind
# k-means assignment / class prototypes / SemDeDup centroids): per-language
# centroid of the document embeddings, emitted LONG (lang, dim,
# centroid_e6) so the mirror stays relational.  Scale shape: per-batch
# combiner sums fixed-point vectors per group (only |langs|×64 partial
# rows leave each batch), one tiny groupby merges partials, the driver
# divides.  Exactness: embedding components quantize to e6 fixed-point
# PER ROW before any sum, so the reduction is integer — float sum order
# (Ray's arbitrary partial order vs DuckDB's scan order) can never flip a
# rounded digit.  The doc_id→lang side is a broadcast dimension lookup
# here; at a scale where documents outgrow broadcast, swap for a
# partitioned join on the id — the combiner is unchanged.


def emb_lang_centroids(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    langs_tbl = pq.read_table(_t(sf_dir, "documents"),
                              columns=["doc_id", "lang"])
    lang_ref = ray.put((langs_tbl["doc_id"].combine_chunks(),
                        langs_tbl["lang"].combine_chunks()))

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))

    def partial(t: pa.Table) -> pa.Table:
        keys, langs = ray.get(lang_ref)
        idx = pc.index_in(t["vec_id"].cast(keys.type), value_set=keys)
        lg = np.asarray(pc.take(langs, idx).to_pylist(), object)
        # float32 storage must quantize through float64 exactly as the
        # mirror does (DuckDB promotes to DOUBLE before the arithmetic)
        emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)
                       ).astype(np.float64)
        matched = np.asarray([v is not None for v in lg], bool)
        if not matched.all():  # inner-join semantics: drop unmatched ids
            lg, emb = lg[matched], emb[matched]
        e6 = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        ndim = e6.shape[1]
        out_lang, out_dim, out_s, out_n = [], [], [], []
        for lv in np.unique(lg):
            m = lg == lv
            out_lang.extend([lv] * ndim)
            out_dim.extend(range(ndim))
            out_s.extend(e6[m].sum(axis=0).tolist())
            out_n.extend([int(m.sum())] * ndim)
        return pa.Table.from_pydict(
            {"lang": out_lang, "dim": np.asarray(out_dim, np.int64),
             "s_e6": np.asarray(out_s, np.int64),
             "n_vecs": np.asarray(out_n, np.int64)},
            schema=pa.schema([("lang", pa.string()), ("dim", pa.int64()),
                              ("s_e6", pa.int64()), ("n_vecs", pa.int64())]))

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
           .groupby(["lang", "dim"])
           .aggregate(Sum("s_e6", alias_name="s_e6"),
                      Sum("n_vecs", alias_name="n_vecs"))
           .to_pandas())
    agg["centroid_e6"] = np.floor(
        agg["s_e6"].to_numpy(np.int64).astype(np.float64)
        / agg["n_vecs"].to_numpy(np.int64) + 0.5).astype(np.int64)
    agg["n_vecs"] = agg["n_vecs"].astype(np.int64)
    return (agg[["lang", "dim", "centroid_e6", "n_vecs"]]
            .sort_values(["lang", "dim"]).reset_index(drop=True))


EMB_LANG_CENTROIDS_SQL = """
WITH j AS (
  SELECT d.lang, e.embedding
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
u AS (
  SELECT lang, CAST(t.i - 1 AS BIGINT) AS dim,
         CAST(floor(embedding[t.i] * 1e6 + 0.5) AS BIGINT) AS xe6
  FROM j, range(1, 65) t(i))
SELECT lang, dim,
       CAST(floor(sum(xe6)::DOUBLE / count(*) + 0.5) AS BIGINT)
         AS centroid_e6,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM u GROUP BY lang, dim
ORDER BY lang, dim
"""


# ---------------------------------------------------------------------------
# q_events_user_paths — ordered per-key collect (the string_agg /
# array_agg ORDER BY family): each user's event-type journey as a
# '>'-joined string, capped to the first PATH_PREFIX_K events by
# (ts, event_id) so the output row stays bounded no matter how active the
# user — an UNCAPPED ordered collect is an unbounded-row hazard at 100 TB.
# Scale shape: prune to 4 columns at the read, co-locate each user with
# ONE key-partition groupby, in-partition vectorized sort + cumcount mask,
# one Python join per GROUP (not per row).

PATH_PREFIX_K = 12


def events_user_paths(sf_dir: str, k: int = PATH_PREFIX_K) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["user_id", "ts", "event_id", "event_type"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_events", pa.int64()),
        ("path_prefix", pa.string())])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort").reset_index(drop=True)
        g = s.groupby("user_id", sort=False)
        sizes = g.size()
        rn = g.cumcount()
        paths = (s[rn < k].groupby("user_id", sort=False)["event_type"]
                 .agg(">".join))
        return pd.DataFrame({
            "user_id": paths.index.to_numpy(np.int64),
            "n_events": sizes.loc[paths.index].to_numpy(np.int64),
            "path_prefix": paths.to_numpy(object)})

    out = _typed(partitioned_groupby(ds, ["user_id"], per_part, num_parts=8,
                                     out_schema=out_schema).to_pandas(),
                 out_schema)
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_USER_PATHS_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id, CAST(any_value(n) AS BIGINT) AS n_events,
       string_agg(event_type, '>' ORDER BY rn) AS path_prefix
FROM r WHERE rn <= {PATH_PREFIX_K}
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q_docs_cross_dedup — cross-corpus near-dedup: dedup a NEW crawl against a
# KNOWN corpus at MinHash/Jaccard level (the near-dup generalization of the
# incremental exact scan `docs_incremental_dedup`).  Sides derive
# deterministically from the md5(id) nibble.  Scale shape: both sides band
# signatures with a side tag, ONE (band, key) groupby verifies CROSS-side
# pairs only with per-bucket unique-caption collapse (see
# doc_dedup.cross_dup_min_match); the per-doc verdict re-attaches via a
# broadcast of the (small) matched table — swap for a partitioned left
# join when the match table outgrows broadcast.


def docs_cross_dedup(sf_dir: str) -> pd.DataFrame:
    import hashlib

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines.doc_dedup import cross_dup_min_match

    docs = dio.read_parquet(_t(sf_dir, "documents"),
                            columns=["doc_id", "text"])

    def side_filter(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            isknown = np.fromiter(
                (hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567"
                 for i in ids), bool, count=len(ids))
            return t.filter(pa.array(~isknown if new_side else isknown))

        return docs.map_batches(f, batch_format="pyarrow")

    m = cross_dup_min_match(side_filter(True), side_filter(False),
                            PipelineConfig()).to_pandas()
    mcol = [c for c in m.columns if c != "doc_id"][0]
    new_ids = (side_filter(True).select_columns(["doc_id"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    out = new_ids.merge(m.rename(columns={mcol: "matched_known"}),
                        on="doc_id", how="left")
    out["action"] = np.where(out["matched_known"].isna(), "keep", "drop")
    out["matched_known"] = (out["matched_known"].fillna(-1)
                            .astype(np.int64))
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "matched_known", "action"]]


DOCS_CROSS_DEDUP_SQL = """
WITH nib AS (
  SELECT doc_id, text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nb
  FROM documents),
d AS (
  SELECT doc_id, nb,
         list_distinct([substr(text, i, 5)
                        FOR i IN range(1, greatest(len(text) - 3, 2))]) AS sh
  FROM nib),
known AS (SELECT * FROM d
          WHERE nb IN ('0','1','2','3','4','5','6','7')),
newd AS (SELECT * FROM d
         WHERE nb NOT IN ('0','1','2','3','4','5','6','7')),
m AS (
  SELECT n.doc_id, min(k.doc_id) AS matched_known
  FROM newd n JOIN known k
    ON len(list_intersect(n.sh, k.sh))::DOUBLE /
       (len(n.sh) + len(k.sh) - len(list_intersect(n.sh, k.sh))) >= 0.8
  GROUP BY n.doc_id)
SELECT n.doc_id,
       CAST(COALESCE(m.matched_known, -1) AS BIGINT) AS matched_known,
       CASE WHEN m.matched_known IS NULL THEN 'keep' ELSE 'drop' END AS action
FROM newd n LEFT JOIN m USING (doc_id)
ORDER BY n.doc_id
"""


# cross-corpus CONTAINMENT probe (quote-of-known decontamination): for each
# NEW-side doc (md5(id) nibble 8-f, the docs_cross_dedup split), the smallest
# KNOWN doc that contains it at C(new→known) ≥ 0.9 over CONT_K=8 shingles.
# The engine path runs through the PERSISTED prefix index
# (state/contstore.py: hash-partitioned postings + keyed texts + broadcast
# hot-shingle ordering); this mirror is the plain two-sided relation.
DOCS_CROSS_CONTAINMENT_SQL = """
WITH nib AS (
  SELECT doc_id, text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nb
  FROM documents),
d AS (
  SELECT doc_id, nb,
         list_distinct([substr(text, i, 8)
                        FOR i IN range(1, greatest(len(text) - 6, 2))]) AS sh
  FROM nib),
known AS (SELECT * FROM d
          WHERE nb IN ('0','1','2','3','4','5','6','7')),
newd AS (SELECT * FROM d
         WHERE nb NOT IN ('0','1','2','3','4','5','6','7')),
m AS (
  SELECT n.doc_id, min(k.doc_id) AS matched_known
  FROM newd n JOIN known k
    ON len(list_intersect(n.sh, k.sh))::DOUBLE / len(n.sh) >= 0.9
  GROUP BY n.doc_id)
SELECT n.doc_id,
       CAST(COALESCE(m.matched_known, -1) AS BIGINT) AS matched_known,
       CASE WHEN m.matched_known IS NULL THEN 'keep' ELSE 'drop' END AS action
FROM newd n LEFT JOIN m USING (doc_id)
ORDER BY n.doc_id
"""


ORDERS_PRICE_NTILE_SQL = """
WITH s AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders),
r AS (
  SELECT price_c, row_number() OVER (ORDER BY price_c) AS rn,
         count(*) OVER () AS n
  FROM s),
b AS (
  SELECT r.price_c AS bnd
  FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8), (9)) v(k)
  JOIN r ON r.rn = CAST(ceil(v.k * r.n / 10.0) AS BIGINT))
SELECT s.o_orderkey, s.price_c,
       CAST(1 + (SELECT count(*) FROM b WHERE b.bnd < s.price_c) AS BIGINT)
         AS decile
FROM s
ORDER BY s.o_orderkey
"""


# ---------------------------------------------------------------------------
# q_docs_tfidf_top_terms — per-document top-k TF-IDF terms (classic IR
# relevance projection over the corpus).  Two passes: (1) document
# frequency — per-batch DISTINCT (doc, token) collapse, then ONE
# token-partition groupby, so only (token, partial_df) rows cross the
# wire; (2) the vocabulary-sized df map is broadcast ONCE (ray.put, read
# per task) and each batch scores its own docs vectorized and emits its
# local top-k — docs never span batches, so no second shuffle.  The score
# is the LINEAR-idf variant tf·(N/df) quantized integer-exact as
# tf·N·1e6 // df (always positive, so DuckDB's truncating // equals
# Python's flooring //); log-idf would rank identically for df spans
# under one decade but costs float determinism across engines.  Ties are
# pinned (tfidf_e6 DESC, term ASC).  Scale note: the df map is
# vocab-sized, orders of magnitude smaller than the corpus — the standard
# TF-IDF broadcast assumption; a trillion-row corpus with an oversized
# vocab would move pass 2 into a token-partition join instead.

_TFIDF_K = 3


def docs_tfidf_top_terms(sf_dir: str, k: int = _TFIDF_K) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = int(ds.count())

    def _exploded(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"doc_id": np.repeat(ids, n),
                          "term": pc.list_flatten(toks).to_pandas()})
        return d[d["term"] != ""]

    df_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])

    def df_combine(t: pa.Table) -> pa.Table:
        vc = _exploded(t).drop_duplicates()["term"].value_counts()
        return pa.Table.from_pydict(
            {"term": vc.index.astype(str).to_numpy(),
             "df": vc.to_numpy(np.int64)}, schema=df_schema)

    def df_sum(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("term", as_index=False)["df"].sum()
        return g.astype({"df": np.int64})

    df_tbl = partitioned_groupby(
        ds.map_batches(df_combine, batch_format="pyarrow", batch_size=65536),
        ["term"], df_sum, num_parts=16, out_schema=df_schema).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["term"],
                              df_tbl["df"].to_numpy(np.int64))))

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
        ("df", pa.int64()), ("tfidf_e6", pa.int64())])

    def topk(t: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        d = _exploded(t)
        tf = (d.groupby(["doc_id", "term"], sort=False, as_index=False)
              .size().rename(columns={"size": "tf"}))
        dfv = tf["term"].map(dfm).to_numpy(np.int64)
        tf["df"] = dfv
        tf["tfidf_e6"] = (tf["tf"].to_numpy(np.int64) * n_docs
                          * 1_000_000) // dfv
        tf = tf.sort_values(["doc_id", "tfidf_e6", "term"],
                            ascending=[True, False, True], kind="mergesort")
        out = tf.groupby("doc_id", sort=False).head(k)
        return pa.Table.from_pandas(out.astype(
            {"doc_id": np.int64, "tf": np.int64}), schema=out_schema,
            preserve_index=False)

    out = _typed(ds.map_batches(topk, batch_format="pyarrow",
                                batch_size=65536).to_pandas(), out_schema)
    return (out.sort_values(["doc_id", "tfidf_e6", "term"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


DOCS_TFIDF_TOP_TERMS_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM t WHERE term != '' GROUP BY doc_id, term),
dft AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM t WHERE term != '' GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
         CAST(tf.tf * n.n_docs * 1000000 // dft.df AS BIGINT) AS tfidf_e6
  FROM tf JOIN dft USING (term) CROSS JOIN n),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_e6 DESC, term) AS rn
  FROM s)
SELECT doc_id, term, tf, df, tfidf_e6
FROM r WHERE rn <= {_TFIDF_K}
ORDER BY doc_id, tfidf_e6 DESC, term
"""


# ---------------------------------------------------------------------------
# q_docs_inverted_index — posting-list build (the search-index sink): for
# every token, its document frequency and the first-K member doc_ids as a
# CSV string.  Per-batch DISTINCT (term, doc_id) combiner, ONE
# token-partition groupby; inside each partition df is a vectorized group
# size and the postings string is built only over the ≤K capped survivors
# (same bounded-output policy as events_user_paths — a stop-word token
# with a billion postings must not produce a billion-element row).

_POSTINGS_K = 8


def docs_inverted_index(sf_dir: str, k: int = _POSTINGS_K) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    pair_schema = pa.schema([("term", pa.string()), ("doc_id", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"term": pc.list_flatten(toks).to_pandas(),
                          "doc_id": np.repeat(ids, n)})
        d = d[d["term"] != ""].drop_duplicates()
        return pa.Table.from_pandas(d.astype({"doc_id": np.int64}),
                                    schema=pair_schema, preserve_index=False)

    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("postings", pa.string())])

    def build(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates().sort_values(["term", "doc_id"],
                                            kind="mergesort")
        g = d.groupby("term", sort=False)
        sizes = g.size()
        capped = d[g.cumcount() < k]
        posts = (capped.groupby("term", sort=False)["doc_id"]
                 .agg(lambda s: ",".join(map(str, s))))
        return pd.DataFrame({"term": posts.index.to_numpy(object),
                             "df": sizes.loc[posts.index].to_numpy(np.int64),
                             "postings": posts.to_numpy(object)})

    out = _typed(partitioned_groupby(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=65536),
        ["term"], build, num_parts=16, out_schema=out_schema).to_pandas(),
        out_schema)
    return out.sort_values("term").reset_index(drop=True)


DOCS_INVERTED_INDEX_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
d AS (
  SELECT DISTINCT term, doc_id FROM t WHERE term != ''),
r AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM d)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= {_POSTINGS_K}
                       THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM r GROUP BY term
ORDER BY term
"""


# ---------------------------------------------------------------------------
# q_emb_knn_join — exact k-NN self-join over the embedding table: for every
# vector, its k nearest neighbors by cosine (self excluded).  Baseline
# scale shape, same as emb_near_dup: the normalized corpus matrix is
# broadcast ONCE (ray.put), each batch does one matmul and a stable
# argsort on the INTEGER micro-cosine (so ranking ties are broken
# identically in both engines: cos_e6 DESC, then nn_id ASC via the
# id-sorted column order + stable sort).  O(n²/P) flops streamed over
# batches; at corpus scale the IVF index (functions/vector.py) replaces
# the broadcast with bucket-pruned reads — this query is the exact
# reference shape the approximate path is measured against.

_KNN_K = 3


def emb_knn_join(sf_dir: str, k: int = _KNN_K) -> pd.DataFrame:
    import pyarrow.parquet as pq

    tbl = _nonnull_vec_tbl(pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    ids_all = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, np.float64)
                    for v in tbl["embedding"].to_pylist()])
    order = np.argsort(ids_all, kind="mergesort")  # id-asc column order ⇒
    ids_all, mat = ids_all[order], mat[order]      # stable sort = id tiebreak
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    _emb_broadcast_guard(*mat.shape, caller="emb_knn_join")
    mat_ref = ray.put((ids_all, mat))

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    out_schema = pa.schema([
        ("vec_id", pa.int64()), ("nn_rank", pa.int64()),
        ("nn_id", pa.int64()), ("cos_e6", pa.int64())])

    def knn(t: pa.Table) -> pa.Table:
        all_ids, m = ray.get(mat_ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        vecs = np.stack([np.asarray(v, np.float64)
                         for v in t["embedding"].to_pylist()])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        e6 = np.floor(vecs @ m.T * 1e6 + 0.5).astype(np.int64)
        # top (k+1) then drop self: stable argsort on -cos_e6 keeps the
        # id-ascending column order for equal scores
        nn = np.argsort(-e6, axis=1, kind="stable")[:, :k + 1]
        rows_v, rows_r, rows_n, rows_c = [], [], [], []
        for i in range(len(ids)):
            cand = nn[i][all_ids[nn[i]] != ids[i]][:k]
            rows_v.append(np.full(len(cand), ids[i], np.int64))
            rows_r.append(np.arange(1, len(cand) + 1, dtype=np.int64))
            rows_n.append(all_ids[cand])
            rows_c.append(e6[i, cand])
        return pa.Table.from_pydict(
            {"vec_id": np.concatenate(rows_v), "nn_rank": np.concatenate(rows_r),
             "nn_id": np.concatenate(rows_n), "cos_e6": np.concatenate(rows_c)},
            schema=out_schema)

    out = _typed(ds.map_batches(knn, batch_format="pyarrow",
                                batch_size=1024).to_pandas(), out_schema)
    return out.sort_values(["vec_id", "nn_rank"]).reset_index(drop=True)


EMB_KNN_JOIN_SQL = f"""
WITH s AS (
  SELECT a.vec_id, b.vec_id AS nn_id,
         CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    * 1e6 + 0.5) AS BIGINT) AS cos_e6
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
  WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos_e6 DESC, nn_id) AS rn
  FROM s)
SELECT vec_id, CAST(rn AS BIGINT) AS nn_rank, nn_id, cos_e6
FROM r WHERE rn <= {_KNN_K}
ORDER BY vec_id, nn_rank
"""


# ---------------------------------------------------------------------------
# q_orders_monthly_growth — time-series rollup with month-over-month delta.
# Per-batch (month, revenue-cents) combiner, ONE tiny month groupby
# (month cardinality is bounded by the calendar, not the data), then the
# lag/delta resolves driver-side on the ≤hundreds-row result — the classic
# "aggregate small, window on the driver" shape.  No integer division in
# the output (growth deltas go negative, and DuckDB's // truncates where
# Python floors) — the delta is emitted as exact cents.

def orders_monthly_growth(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "orders"),
                          columns=["o_orderdate", "o_totalprice"])

    m_schema = pa.schema([("month", pa.string()), ("rev_c", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        month = pc.strftime(t["o_orderdate"], format="%Y-%m").to_pandas()
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        g = (pd.DataFrame({"month": month, "rev_c": cents})
             .groupby("month", as_index=False)["rev_c"].sum())
        return pa.Table.from_pandas(g.astype({"rev_c": np.int64}),
                                    schema=m_schema, preserve_index=False)

    def msum(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("month", as_index=False)["rev_c"].sum()
        return g.astype({"rev_c": np.int64})

    out = _typed(partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["month"], msum, num_parts=4, out_schema=m_schema).to_pandas(),
        m_schema)
    out = out.sort_values("month").reset_index(drop=True)
    prev = out["rev_c"].shift(1).fillna(0).astype(np.int64)
    out["prev_rev_c"] = prev
    out["delta_c"] = out["rev_c"] - prev
    return out[["month", "rev_c", "prev_rev_c", "delta_c"]]


ORDERS_MONTHLY_GROWTH_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY month)
SELECT month, rev_c,
       CAST(COALESCE(lag(rev_c) OVER (ORDER BY month), 0) AS BIGINT)
         AS prev_rev_c,
       CAST(rev_c - COALESCE(lag(rev_c) OVER (ORDER BY month), 0)
            AS BIGINT) AS delta_c
FROM m
ORDER BY month
"""


# ---------------------------------------------------------------------------
# q_events_value_outliers — grouped anomaly gate: events whose value
# exceeds 3× their event-type's mean.  Integer-exact formulation — the
# test v > 3·mean is evaluated as v_c·n > 3·S over cents, counts and sums
# (no float mean, no division), so the engine and the mirror agree
# bit-for-bit at the boundary.  Per-batch (type, n, S) combiner, tiny
# type groupby, stats broadcast once, one streaming filter pass — the
# same two-pass broadcast shape as the curation gates.

def events_value_outliers(sf_dir: str) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_id", "event_type", "value"])

    s_schema = pa.schema([("event_type", pa.string()),
                          ("n", pa.int64()), ("s_c", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        g = (pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "v": cents})
             .groupby("event_type").agg(n=("v", "size"), s_c=("v", "sum"))
             .reset_index())
        return pa.Table.from_pandas(
            g.astype({"n": np.int64, "s_c": np.int64}),
            schema=s_schema, preserve_index=False)

    def ssum(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("event_type", as_index=False)[["n", "s_c"]].sum()
        return g.astype({"n": np.int64, "s_c": np.int64})

    stats = _typed(partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["event_type"], ssum, num_parts=4, out_schema=s_schema).to_pandas(),
        s_schema)
    stats_ref = ray.put({r.event_type: (int(r.n), int(r.s_c))
                         for r in stats.itertuples()})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("value_c", pa.int64())])

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        types = t["event_type"].to_pandas()
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        n = types.map(lambda x: st[x][0]).to_numpy(np.int64)
        s = types.map(lambda x: st[x][1]).to_numpy(np.int64)
        keep = cents * n > 3 * s
        return pa.Table.from_pydict(
            {"event_id": t["event_id"].to_numpy(zero_copy_only=False)[keep],
             "event_type": types.to_numpy(object)[keep],
             "value_c": cents[keep]}, schema=out_schema)

    out = _typed(ds.map_batches(flag, batch_format="pyarrow",
                                batch_size=65536).to_pandas(), out_schema)
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_VALUE_OUTLIERS_SQL = """
WITH s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s_c
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS value_c
FROM events e JOIN s USING (event_type)
WHERE CAST(floor(e.value * 100 + 0.5) AS BIGINT) * s.n > 3 * s.s_c
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# q_events_kmv_distinct — approximate COUNT(DISTINCT) via a K-minimum-values
# sketch (Bar-Yossef et al. 2002): per event_type, keep the k smallest
# distinct 48-bit hashes of user_id; estimate = (k-1)·2^48 // h_k where
# h_k is the k-th minimum.  The sketch is MERGEABLE — per-batch combiners
# emit at most k (type, hash) rows each, the ONE type-partition groupby
# merges by re-taking the k smallest distinct — so shuffle volume is
# k·|types|·|batches| regardless of corpus size (the scale story exact
# distinct-count can't have).  Everything is integer: the hash is the
# first 12 hex chars of md5(str(user_id)) (identical on both engines —
# collisions, if any, collide identically), and the estimator's division
# is positive so DuckDB's truncating // equals Python's flooring //.
# Exact below k (estimate = distinct count when the sketch isn't full),
# and value-checked — the point of KMV over HyperLogLog here is that the
# whole sketch state is SQL-expressible, so the driver hash-checks the
# APPROXIMATE path itself, not a weaker rows-only shadow.

_KMV_K = 8
_KMV_SPACE = 1 << 48  # 12 hex chars


def _kmv_hash(user_ids: np.ndarray) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:12], 16)
         for u in user_ids), np.int64, count=len(user_ids))


def events_kmv_distinct(sf_dir: str, k: int = _KMV_K) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["event_type", "user_id"])

    sk_schema = pa.schema([("event_type", pa.string()), ("hv", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        d = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        d["hv"] = _kmv_hash(d["user_id"].to_numpy(np.int64))
        d = d.drop_duplicates(["event_type", "hv"])  # hash space, not ids
        d = d.sort_values(["event_type", "hv"], kind="mergesort")
        d = d[d.groupby("event_type", sort=False).cumcount() < k]
        return pa.Table.from_pandas(d[["event_type", "hv"]],
                                    schema=sk_schema, preserve_index=False)

    out_schema = pa.schema([
        ("event_type", pa.string()), ("n_sketch", pa.int64()),
        ("kth_min", pa.int64()), ("est_distinct", pa.int64())])

    def merge(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates(["event_type", "hv"]).sort_values(
            ["event_type", "hv"], kind="mergesort")
        d = d[d.groupby("event_type", sort=False).cumcount() < k]
        g = d.groupby("event_type", sort=False)["hv"]
        n = g.size()
        kth = g.max()  # after the cap, max == k-th minimum (or the last)
        full = n >= k
        est = np.where(full, (k - 1) * _KMV_SPACE // np.maximum(kth, 1),
                       n).astype(np.int64)
        return pd.DataFrame({
            "event_type": n.index.to_numpy(object),
            "n_sketch": n.to_numpy(np.int64),
            "kth_min": kth.to_numpy(np.int64),
            "est_distinct": est})

    out = _typed(partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["event_type"], merge, num_parts=4, out_schema=out_schema
    ).to_pandas(), out_schema)
    return out.sort_values("event_type").reset_index(drop=True)


EVENTS_KMV_DISTINCT_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS hv
  FROM events),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sketch,
         CAST(max(hv) AS BIGINT) AS kth_min
  FROM r WHERE rn <= {_KMV_K} GROUP BY event_type)
SELECT event_type, n_sketch, kth_min,
       CAST(CASE WHEN n_sketch >= {_KMV_K}
                 THEN ({_KMV_K} - 1) * {_KMV_SPACE} // kth_min
                 ELSE n_sketch END AS BIGINT) AS est_distinct
FROM s
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# per-group mode (most frequent value per key) — the grouped counterpart of
# the global heavy-hitters operator, with a combiner so the shuffle carries
# (user, type) partials, never event rows


def events_mode_type(sf_dir: str) -> pd.DataFrame:
    """Per-user modal event type (count desc, type asc tiebreak).  Per-batch
    (user, type) count combiner caps shuffle traffic at |users|×|types| per
    batch; ONE user-partition groupby sums partials and picks the mode
    vectorized (sort + duplicated mask, no per-user loop)."""
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "events"),
                          columns=["user_id", "event_type"])

    mid_schema = pa.schema([("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("n", pa.int64())])

    def combine(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "event_type": np.asarray(t["event_type"].to_pylist(), object),
        }).groupby(["user_id", "event_type"], as_index=False).size()
            .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(df, schema=mid_schema,
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("mode_type", pa.string()),
                            ("n", pa.int64())])

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = g[~g["user_id"].duplicated()].rename(
            columns={"event_type": "mode_type"})
        top["n"] = top["n"].astype(np.int64)
        return top[["user_id", "mode_type", "n"]]

    out = partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["user_id"], per_group, num_parts=16,
        out_schema=out_schema).to_pandas()
    out = _typed(out, out_schema)
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_MODE_TYPE_SQL = """
SELECT user_id, event_type AS mode_type, n FROM (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# canonicalization-keyed dedup: the bag-of-words (sorted unique tokens)
# canonical form catches duplicates that exact hashing misses — shuffled /
# re-ordered copies of the same content (62 of this corpus's 500 docs share
# a bag with another doc while NO two share exact text).  The classic
# "normalize, THEN dedup" pipeline stage, value-checked end to end.


def docs_bow_dedup(sf_dir: str) -> pd.DataFrame:
    """Per doc: canonical bag-of-words key (whitespace-collapsed, case-
    folded, tokens sorted unique), emitted as md5 so no payload leaves the
    map stage, plus the bag-group size and keep/drop under min-doc_id-wins.
    One map_batches (compiled regex, no shuffle of text) then ONE
    md5-partition groupby for size + election."""
    import hashlib
    import re

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "documents"),
                          columns=["doc_id", "text"])
    ws = re.compile(r"[ \t\r\n]+")

    mid_schema = pa.schema([("doc_id", pa.int64()),
                            ("bag_md5", pa.string()),
                            ("bag_tokens", pa.int64())])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        # NULL text → NULL bag, exactly like the mirror's regexp_replace
        # chain (NULL in → NULL out): md5/tokens stay NULL and all
        # null-text docs share ONE group (SQL window partitions group
        # NULLs together)
        bags = [None if x is None else
                sorted(set(ws.sub(" ", x).strip().lower().split(" ")))
                for x in texts]
        return pa.Table.from_pydict({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "bag_md5": pa.array(
                [None if b is None else
                 hashlib.md5(" ".join(b).encode()).hexdigest()
                 for b in bags], pa.string()),
            "bag_tokens": pa.array(
                [None if b is None else len(b) for b in bags], pa.int64()),
        }, schema=mid_schema)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("bag_md5", pa.string()),
                            ("bag_tokens", pa.int64()),
                            ("group_n", pa.int64()),
                            ("action", pa.string())])

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: the NULL-bag group (failed downloads) must still
        # be counted and elected, like SQL's NULL window partition
        df = df.sort_values(["bag_md5", "doc_id"], kind="mergesort").copy()
        df["group_n"] = (df.groupby("bag_md5", sort=False, dropna=False)
                         ["doc_id"].transform("size").astype(np.int64))
        df["action"] = np.where(~df["bag_md5"].duplicated(), "keep", "drop")
        return df[["doc_id", "bag_md5", "bag_tokens", "group_n", "action"]]

    out = partitioned_groupby(
        ds.map_batches(f, batch_format="pyarrow"),
        ["bag_md5"], elect, num_parts=16, out_schema=out_schema).to_pandas()
    out = _typed(out, out_schema)
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_BOW_DEDUP_SQL = r"""
WITH b AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(
           lower(trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'))),
           ' '))), ' ') AS bag
  FROM documents)
SELECT doc_id, md5(bag) AS bag_md5,
       CAST(len(string_split(bag, ' ')) AS BIGINT) AS bag_tokens,
       CAST(count(*) OVER (PARTITION BY bag) AS BIGINT) AS group_n,
       CASE WHEN row_number() OVER (PARTITION BY bag ORDER BY doc_id) = 1
            THEN 'keep' ELSE 'drop' END AS action
FROM b
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_rarity_score — corpus-frequency quality signal (the integer-exact
# shape of a CCNet-style LM filter: docs made of globally-common tokens
# score high sum_freq, docs with rare/garbage tokens score low min_freq).
# Two engine strategies share the mirror:
#   * 'exchange' (default, the scale path): ONE token-partitioned groupby
#     over per-doc (token, doc_id, tf) rows computes the global unigram
#     count AND each doc's partial (n, Σ tf·cnt, min cnt) in the same
#     partition — every row of a token is co-located, so cnt(token) is
#     just the partition-local Σ tf.  A second doc_id-partitioned groupby
#     folds the per-token-partition partials.  Nothing collects to the
#     driver, nothing is broadcast, at any vocabulary size.
#   * 'broadcast': pass 1 builds the unigram table ((token,cnt) partials
#     only cross the shuffle), pass 2 ray.puts it once and scores per
#     batch with index_in + segment sums.  Fewer exchanges — right while
#     the vocab fits a node — but REFUSED above _RARITY_BROADCAST_CAP
#     rows (falls through to 'exchange'): the zipf tail of a 10^12-doc
#     corpus is exactly the thing you must not ray.put.


_RARITY_BROADCAST_CAP = 5_000_000  # vocab rows; above this never ray.put


def docs_rarity_score(sf_dir: str, strategy: str = "exchange") -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                            ("sum_freq", pa.int64()), ("min_freq", pa.int64())])

    if strategy == "broadcast":
        out = _rarity_broadcast(ds, out_schema, partitioned_groupby)
        if out is None:  # vocab over cap: the scale path takes over
            out = _rarity_exchange(ds, out_schema, partitioned_groupby)
    else:
        out = _rarity_exchange(ds, out_schema, partitioned_groupby)
    if out.empty:
        return out_schema.empty_table().to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _rarity_exchange(ds: rd.Dataset, out_schema: pa.Schema,
                     partitioned_groupby) -> pd.DataFrame:
    tok_schema = pa.schema([("token", pa.string()), ("doc_id", pa.int64()),
                            ("tf", pa.int64())])

    def tok_rows(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(lists)
        reps = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            reps)
        toks = flat.to_pandas().to_numpy(dtype=object)
        mask = toks != ""
        if not mask.any():
            return tok_schema.empty_table()
        df = pd.DataFrame({"token": toks[mask], "doc_id": ids[mask]})
        g = (df.groupby(["token", "doc_id"], as_index=False, sort=False)
             .size().rename(columns={"size": "tf"}))
        return pa.Table.from_pandas(
            g.astype({"tf": np.int64}), schema=tok_schema,
            preserve_index=False).replace_schema_metadata(None)

    rows = ds.map_batches(tok_rows, batch_format="pyarrow",
                          batch_size=65536)

    part_schema = pa.schema([("doc_id", pa.int64()), ("n_part", pa.int64()),
                             ("sum_part", pa.int64()),
                             ("min_part", pa.int64())])

    def token_stats(df: pd.DataFrame) -> pd.DataFrame:
        # every row of a token is in this partition → the global count is
        # the partition-local sum; per-doc partials fold in exchange 2
        df = df.copy()
        df["c"] = df.groupby("token", sort=False)["tf"].transform("sum")
        df["prod"] = df["tf"] * df["c"]
        g = df.groupby("doc_id", as_index=False).agg(
            n_part=("tf", "sum"), sum_part=("prod", "sum"),
            min_part=("c", "min"))
        return g.astype({"n_part": np.int64, "sum_part": np.int64,
                         "min_part": np.int64})

    partials = partitioned_groupby(rows, ["token"], token_stats,
                                   out_schema=part_schema)

    def doc_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_tokens=("n_part", "sum"), sum_freq=("sum_part", "sum"),
            min_freq=("min_part", "min"))
        return g.astype({"n_tokens": np.int64, "sum_freq": np.int64,
                         "min_freq": np.int64})

    return partitioned_groupby(partials, ["doc_id"], doc_final,
                               out_schema=out_schema).to_pandas()


def _rarity_broadcast(ds: rd.Dataset, out_schema: pa.Schema,
                      partitioned_groupby) -> pd.DataFrame | None:
    """The small-vocab fast path; returns None (refusing to ray.put) when
    the vocabulary exceeds _RARITY_BROADCAST_CAP rows."""

    def combine(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pd.Series(toks.to_pandas()).value_counts()
        return pa.Table.from_pydict(
            {"token": vc.index.astype(str).to_numpy(),
             "cnt": vc.to_numpy(np.int64)},
            schema=pa.schema([("token", pa.string()), ("cnt", pa.int64())]))

    freq_schema = pa.schema([("token", pa.string()), ("cnt", pa.int64())])

    def local_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["cnt"].sum()
        return g.astype({"cnt": np.int64})

    freq_ds = partitioned_groupby(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536),
        ["token"], local_sum, num_parts=16, out_schema=freq_schema
    ).materialize()
    if freq_ds.count() > _RARITY_BROADCAST_CAP:
        return None
    freq = freq_ds.to_pandas()
    if freq.empty:  # empty corpus: to_pandas() loses the typed columns
        freq = pd.DataFrame({"token": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype=np.int64)})
    freq_ref = ray.put((pa.array(freq["token"].to_numpy(), pa.string()),
                        freq["cnt"].to_numpy(np.int64)))

    def score(t: pa.Table) -> pa.Table:
        from deduplicator_ray.functions.text import rarity_batch

        vocab, counts = ray.get(freq_ref)
        n_tok, sum_f, min_f = rarity_batch(t["text"], vocab, counts)
        out = pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "n_tokens": pa.array(n_tok, pa.int64()),
             "sum_freq": pa.array(sum_f, pa.int64()),
             "min_freq": pa.array(min_f, pa.int64())}, schema=out_schema)
        # inner-join semantics of the mirror: all-empty docs drop out
        return out.filter(pa.array(n_tok > 0))

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=65536).to_pandas()


DOCS_RARITY_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE token != '' GROUP BY token)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(f.c) AS BIGINT) AS sum_freq,
       CAST(min(f.c) AS BIGINT) AS min_freq
FROM toks t JOIN freq f USING (token)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_source_cap — per-source quota (domain balancing): keep at most k
# docs per source, preferring longer docs (n_chars desc, doc_id asc as the
# deterministic tiebreak).  Same two-level top-k shape as
# orders_topk_per_group: the per-batch combiner leaves ≤ k rows per source
# per batch, so the exchange carries O(sources × k), never the corpus.


_SOURCE_CAP_K = 10


def docs_source_cap(sf_dir: str, k: int = _SOURCE_CAP_K) -> pd.DataFrame:
    # the static mirror DOCS_SOURCE_CAP_SQL is pinned to the default k —
    # callers overriding k get a correct engine result but must build
    # their own mirror (same convention as docs_top_tokens)
    ds = dio.read_parquet(_t(sf_dir, "documents"),
                          columns=["doc_id", "source", "n_chars"])

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        out = df.groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(
            out[["source", "doc_id", "n_chars"]],
            preserve_index=False).replace_schema_metadata(None)

    reduced = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=65536)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        out = df.groupby("source", sort=False).head(k).copy()
        out["rank"] = (out.groupby("source", sort=False).cumcount() + 1).astype(np.int64)
        return out

    out = reduced.repartition(1).map_batches(final_topk, batch_format="pandas").to_pandas()
    if out.empty:
        return pa.schema(
            [("source", pa.string()), ("rank", pa.int64()),
             ("doc_id", pa.int64()), ("n_chars", pa.int64())]
        ).empty_table().to_pandas()
    return out.sort_values(["source", "rank"]).reset_index(drop=True)[
        ["source", "rank", "doc_id", "n_chars"]]


DOCS_SOURCE_CAP_SQL = f"""
SELECT source, rank, doc_id, n_chars
FROM (SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
      FROM documents)
WHERE rank <= {_SOURCE_CAP_K}
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# q_docs_lang_length_gate — per-language bottom-decile length gate (the
# CCNet-style per-lang quality cut, rank-exact): within each lang, the 10%
# of docs with the smallest (n_tokens, doc_id) are 'drop'.  Distributed
# shape: a (lang, n_tokens) count-histogram combiner bounds the exchange by
# langs × distinct lengths; the driver resolves each lang's boundary value
# from cumulative counts, and only BOUNDARY-VALUE ties (the one
# data-dependent set, logged if large) ship their doc_ids to pick the
# k-th-smallest exactly.  The corpus itself is never ranked globally.


def docs_lang_length_gate(sf_dir: str, pct: int = 10) -> pd.DataFrame:
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    ds = dio.read_parquet(_t(sf_dir, "documents"),
                          columns=["doc_id", "lang", "text"])

    mid = pa.schema([("lang", pa.string()), ("n_tokens", pa.int64()),
                     ("cnt", pa.int64())])

    def featurize(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " "))
        # NULL text maps to the 2**62 sentinel (max rank); the SQL mirror
        # coalesces to the SAME literal so the emitted n_tokens agrees too
        n_tok = pc.fill_null(n_tok.cast(pa.int64()), 2**62)
        # NULL lang becomes an internal sentinel partition: pandas groupby
        # silently DROPS NaN keys, which would exempt null-lang docs from
        # the gate while the mirror's PARTITION BY lang gates them as
        # their own partition; decide() restores the null at the output
        lang = pc.fill_null(t["lang"], "\x00")
        return pa.Table.from_arrays(
            [t["doc_id"], lang, n_tok],
            names=["doc_id", "lang", "n_tokens"])

    feats = ds.map_batches(featurize, batch_format="pyarrow",
                           batch_size=65536).materialize()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_tokens"], as_index=False).size()
        return g.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})

    def hist_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_tokens"], as_index=False)["cnt"].sum()
        return g.astype({"cnt": np.int64})

    hist = partitioned_groupby(
        feats.map_batches(hist_partial, batch_format="pandas"),
        ["lang"], hist_sum, num_parts=4, out_schema=mid).to_pandas()

    # per-lang boundary: k = n // (100/pct); docs ranked (n_tokens, doc_id)
    # asc with rank <= k drop.  below[v] docs are strictly shorter than the
    # boundary value; (k - below) more drop among boundary-value ties.
    bounds: dict[str, tuple[int, int]] = {}  # lang -> (boundary_value, n_tie_drop)
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_tokens")
        n = int(g["cnt"].sum())
        k = n * pct // 100
        if k == 0:
            continue
        cum = g["cnt"].cumsum()
        idx = int(np.searchsorted(cum.to_numpy(), k, side="left"))
        v = int(g["n_tokens"].iloc[idx])
        below = int(cum.iloc[idx - 1]) if idx else 0
        bounds[lang] = (v, k - below)

    # boundary ties: the only data-dependent collect, bounded by tie mass
    tie_ids: dict[str, set] = {}
    if bounds:
        blist = {l: v for l, (v, _) in bounds.items()}

        def boundary(t: pa.Table) -> pa.Table:
            langs = t["lang"].to_pylist()
            nt = t["n_tokens"].to_pylist()
            keep = pa.array([blist.get(l) == n for l, n in zip(langs, nt)])
            return t.filter(keep).select(["doc_id", "lang"])

        ties = feats.map_batches(boundary, batch_format="pyarrow").to_pandas()
        for lang, g in ties.groupby("lang"):
            _, n_drop = bounds[lang]
            tie_ids[lang] = set(g["doc_id"].sort_values().head(n_drop))

    bounds_ref = ray.put((bounds, tie_ids))

    out_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                            ("n_tokens", pa.int64()), ("action", pa.string())])

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        bnds, tids = ray.get(bounds_ref)
        vs = df["lang"].map(lambda l: bnds.get(l, (np.int64(-1), 0))[0])
        in_ties = np.fromiter(
            (d in tids.get(l, ()) for l, d in zip(df["lang"], df["doc_id"])),
            bool, count=len(df))
        drop = (df["n_tokens"] < vs) | ((df["n_tokens"] == vs) & in_ties)
        out = df[["doc_id", "lang", "n_tokens"]].copy()
        out["lang"] = out["lang"].where(out["lang"] != "\x00", other=None)
        out["action"] = np.where(drop, "drop", "keep")
        return out

    out = feats.map_batches(decide, batch_format="pandas").to_pandas()
    if out.empty:
        return out_schema.empty_table().to_pandas()
    out = _typed(out, out_schema)
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_LANG_LENGTH_GATE_SQL = """
WITH t AS (
  SELECT doc_id, lang,
         coalesce(CAST(len(string_split(text, ' ')) AS BIGINT),
                  4611686018427387904) AS n_tokens
  FROM documents),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM t)
SELECT doc_id, lang, n_tokens,
       CASE WHEN rn <= n * 10 // 100 THEN 'drop' ELSE 'keep' END AS action
FROM r ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q_docs_pii_stats / q_docs_pii_redact — PII scrub, the standard
# pre-training privacy pass (the reference has no text ops at all; this is
# engine extension surface like lang-ID/quality).  Both run over the
# PII-injected sidecar corpus (fixtures.docs_pii_path — the driver's
# synthetic documents are PII-free word salad, so the operators would be
# vacuous over them) and are mirrored by DuckDB's RE2 regex kernels over
# the SAME table: a genuine cross-engine regex-semantics check, not a
# sidecar replay.
#
# Scale shape: a pure per-row map over streamed batches — no shuffle, no
# state; the regexes compile once at module import and pandas' str kernels
# run them in C over each batch.  At 100 TB this is the cheapest class of
# operator in the engine.  Patterns are deliberately RE2-safe (no
# lookaround/backrefs) so Python `re` and DuckDB agree by construction.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"


def _pii_docs(sf_dir: str):
    import os as _os

    from deduplicator_ray import fixtures

    return dio.read_parquet(
        _os.path.join(fixtures.docs_pii_path(sf_dir), "docs_pii.parquet"),
        columns=["doc_id", "text"])


def docs_pii_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document PII hit counts (emails / IPv4s / phone numbers)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        ne = s.str.count(PII_EMAIL_RE).astype(np.int64)
        ni = s.str.count(PII_IPV4_RE).astype(np.int64)
        np_ = s.str.count(PII_PHONE_RE).astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_email": ne, "n_ipv4": ni, "n_phone": np_,
            "n_pii": (ne + ni + np_).astype(np.int64)})

    out = _pii_docs(sf_dir).map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_PII_STATS_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT)
           AS n_email,
       CAST(len(regexp_extract_all(text, '{PII_IPV4_RE}')) AS BIGINT)
           AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT)
           AS n_phone,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(text, '{PII_IPV4_RE}'))
            + len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT)
           AS n_pii
FROM '{{pii}}'
ORDER BY doc_id
"""


def docs_pii_redact(sf_dir: str) -> pd.DataFrame:
    """Redacted corpus: every PII span replaced by a typed placeholder
    (<EMAIL>/<IPV4>/<PHONE>, applied in that fixed order in both engines);
    n_redacted counts the replacements so downstream token accounting can
    reconcile."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        n = (s.str.count(PII_EMAIL_RE) + s.str.count(PII_IPV4_RE)
             + s.str.count(PII_PHONE_RE)).astype(np.int64)
        red = (s.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
                .str.replace(PII_IPV4_RE, "<IPV4>", regex=True)
                .str.replace(PII_PHONE_RE, "<PHONE>", regex=True))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "text_redacted": red,
            "n_redacted": n})

    out = _pii_docs(sf_dir).map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_PII_REDACT_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_IPV4_RE}', '<IPV4>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g') AS text_redacted,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}'))
            + len(regexp_extract_all(text, '{PII_IPV4_RE}'))
            + len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT)
           AS n_redacted
FROM '{{pii}}'
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Tiered duplicate classification over DOCUMENTS — the doc-side twin of
# image_dedup.img_dedup_tiers, making the tier-dedup cascade explicit:
# every doc labeled with the CHEAPEST tier that already catches it as a
# duplicate (exact → reordered → near → unique), dup_of = the binding
# tier's group minimum (own id when unique; VARCHAR order throughout, the
# same key convention every doc mirror uses).
#
#   exact     — byte-identical text (md5 equality)
#   reordered — same canonical bag-of-words (the docs_bow_dedup key) but
#               not byte-identical: shuffled/re-ordered copies
#   near      — member of a 5-gram-Jaccard ≥ 0.8 near-dup component below
#               its min-label, not already caught above
#   unique    — none of the above (every group/component keeper lands here)
#
# This corpus has no byte-identical doc pair (its bow-dedup docstring pins
# that), so the exact tier is exercised over a deterministic AUGMENTED
# relation both engines derive from the same parquet: documents ∪ verbatim
# copies of every doc_id % 37 == 0 row re-keyed to doc_id + 1_000_000.  No
# external data — the augmentation is a pure relational expression.

DOCS_TIERS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tier", pa.string()),
    ("dup_of", pa.string()),
    ("n_chars", pa.int64()),
])

_DOCS_TIERS_MID = pa.schema([
    ("doc_id", pa.string()),
    ("exact_min", pa.string()),
    ("bag_min", pa.string()),
    ("cluster_id", pa.string()),
    ("n_chars", pa.int64()),
])


def _docs_aug(sf_dir: str) -> rd.Dataset:
    """documents ∪ exact copies of the doc_id % 37 == 0 rows (re-keyed to
    doc_id + 1_000_000) — the deterministic augmentation that makes the
    exact tier non-vacuous; the SQL mirror derives the identical relation."""
    ds = dio.read_parquet(_t(sf_dir, "documents"),
                          columns=["doc_id", "text", "n_chars"])

    def copies(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 37 == 0))
        return sub.set_column(
            sub.schema.get_field_index("doc_id"), "doc_id",
            pc.add(sub["doc_id"], 1_000_000))

    return ds.union(ds.map_batches(copies, batch_format="pyarrow"))


def docs_dedup_tiers(sf_dir: str) -> pd.DataFrame:
    """(doc_id, tier, dup_of, n_chars) per augmented doc — cheapest binding
    tier wins.

    Scale shape: one map stage emits (id, md5(text), bag_md5, n_chars) so
    text never shuffles; exact groups nest inside bag groups (equal text ⇒
    equal canonical bag), so ONE bag_md5-partitioned groupby computes BOTH
    identity minima; near labels come from the shared doc_clusters
    machinery; labels union the minima projection and ONE doc_id-partitioned
    groupby classifies — all exchanges carry short strings + one int."""
    import hashlib
    import re

    from deduplicator_ray.pipelines.doc_dedup import doc_clusters
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    aug = _docs_aug(sf_dir)
    ws = re.compile(r"[ \t\r\n]+")

    def proj(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        # NULL text → NULL keys: the mirror's md5(NULL) IS NULL, and its
        # window PARTITION groups the NULLs together — all failed
        # downloads form one exact group and one bag group
        bags = [None if x is None else
                " ".join(sorted(set(ws.sub(" ", x).strip().lower()
                                    .split(" "))))
                for x in texts]
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "exact_md5": pa.array(
                [None if x is None else
                 hashlib.md5(x.encode()).hexdigest() for x in texts],
                pa.string()),
            "bag_md5": pa.array(
                [None if b is None else
                 hashlib.md5(b.encode()).hexdigest() for b in bags],
                pa.string()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        })

    def minima(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["exact_min"] = (df.groupby("exact_md5", dropna=False)["doc_id"]
                           .transform("min"))
        df["bag_min"] = (df.groupby("bag_md5", dropna=False)["doc_id"]
                         .transform("min"))
        df["cluster_id"] = ""
        return df[["doc_id", "exact_min", "bag_min", "cluster_id", "n_chars"]]

    ident = partitioned_groupby(
        aug.map_batches(proj, batch_format="pyarrow"),
        ["bag_md5"], minima, num_parts=16, out_schema=_DOCS_TIERS_MID)

    from deduplicator_ray.config import PipelineConfig

    labels = doc_clusters(aug, PipelineConfig())

    def lab(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([""] * n, pa.string())
        return pa.table({"doc_id": t["image_id"], "exact_min": empty,
                         "bag_min": empty, "cluster_id": t["cluster_id"],
                         "n_chars": pa.array([0] * n, pa.int64())})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["cluster_id"] != ""].drop_duplicates("doc_id")
                .set_index("doc_id")["cluster_id"])
        base = df.loc[df["cluster_id"] == ""].copy()
        if len(base) == 0:
            return DOCS_TIERS_SCHEMA.empty_table().to_pandas()
        lbl = base["doc_id"].map(lmap).fillna("")
        own = base["doc_id"]
        is_exact = base["exact_min"] < own
        is_bag = base["bag_min"] < own
        is_near = (lbl != "") & (lbl < own)
        base["tier"] = np.select(
            [is_exact, is_bag, is_near],
            ["exact", "reordered", "near"], default="unique")
        base["dup_of"] = np.select(
            [is_exact, is_bag, is_near],
            [base["exact_min"], base["bag_min"], lbl], default=own)
        base["n_chars"] = base["n_chars"].astype(np.int64)
        return base[["doc_id", "tier", "dup_of", "n_chars"]]

    unioned = ident.union(labels.map_batches(lab, batch_format="pyarrow"))
    out = partitioned_groupby(unioned, ["doc_id"], classify,
                              num_parts=16,
                              out_schema=DOCS_TIERS_SCHEMA).to_pandas()
    out = _typed(out, DOCS_TIERS_SCHEMA)
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_dedup_tiers_report(sf_dir: str) -> pd.DataFrame:
    """Per-tier rollup: (tier, n_docs, n_chars) — the marginal dedup yield
    (docs caught, chars reclaimable) of each successively more expensive
    tier.  Bounded partials (≤4 rows per batch) reach the driver."""
    full = docs_dedup_tiers(sf_dir)
    out = (full.groupby("tier", as_index=False)
           .agg(n_docs=("doc_id", "size"), n_chars=("n_chars", "sum")))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out.sort_values("tier").reset_index(drop=True)


_DOCS_AUG_SQL = """
docs_aug AS MATERIALIZED (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, n_chars FROM documents
  UNION ALL
  SELECT CAST(doc_id + 1000000 AS VARCHAR) AS doc_id, text, n_chars
  FROM documents WHERE doc_id % 37 = 0
)
"""

_DOCS_TIERS_CTES = "WITH RECURSIVE " + _DOCS_AUG_SQL + r""",
ident AS (
  SELECT doc_id, n_chars,
         min(doc_id) OVER (PARTITION BY md5(text)) AS exact_min,
         min(doc_id) OVER (PARTITION BY md5(array_to_string(list_sort(
             list_distinct(string_split(lower(trim(regexp_replace(
               text, '[ \t\r\n]+', ' ', 'g'))), ' '))), ' '))) AS bag_min
  FROM docs_aug),
d AS MATERIALIZED (
  SELECT doc_id,
         list_distinct([substr(text, i, 5)
                        FOR i IN range(1, greatest(len(text) - 3, 2))]) AS sh
  FROM docs_aug),
e0 AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT a.doc_id AS u, b.doc_id AS v,
           len(list_intersect(a.sh, b.sh)) AS i,
           len(a.sh) AS la, len(b.sh) AS lb
    FROM d a JOIN d b ON a.doc_id < b.doc_id)
  WHERE i::DOUBLE / (la + lb - i) >= 0.8
),
e AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
),
r(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
  WHERE r.lbl < e.u
),
lab AS (SELECT node AS doc_id, min(lbl) AS lbl FROM r GROUP BY node),
cls AS (
  SELECT i.doc_id,
         CASE WHEN i.exact_min < i.doc_id THEN 'exact'
              WHEN i.bag_min < i.doc_id THEN 'reordered'
              WHEN l.lbl IS NOT NULL AND l.lbl < i.doc_id THEN 'near'
              ELSE 'unique' END AS tier,
         CASE WHEN i.exact_min < i.doc_id THEN i.exact_min
              WHEN i.bag_min < i.doc_id THEN i.bag_min
              WHEN l.lbl IS NOT NULL AND l.lbl < i.doc_id THEN l.lbl
              ELSE i.doc_id END AS dup_of,
         CAST(i.n_chars AS BIGINT) AS n_chars
  FROM ident i LEFT JOIN lab l USING (doc_id)
)
"""

DOCS_DEDUP_TIERS_SQL = _DOCS_TIERS_CTES + """
SELECT doc_id, tier, dup_of, n_chars FROM cls ORDER BY doc_id
"""

DOCS_DEDUP_TIERS_REPORT_SQL = _DOCS_TIERS_CTES + """
SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM cls GROUP BY tier ORDER BY tier
"""


# ---------------------------------------------------------------------------
# Tiered duplicate classification for the EMBEDDING modality — closes the
# tier matrix (img_dedup_tiers / docs_dedup_tiers / here): every non-null
# vector labeled with the cheapest binding tier.
#
#   exact  — bit-identical vector (group key = the float32 payload itself;
#            the corpus has no -0.0/NaN so value- and bit-equality agree,
#            pinned by test) — exercised via the deterministic %37-copy
#            augmentation (no two natural vectors collide)
#   near   — exact-cosine ≥ 0.35 component below its min label
#   unique — none of the above

EMB_TIERS_SCHEMA = pa.schema([
    ("vec_id", pa.int64()),
    ("tier", pa.string()),
    ("dup_of", pa.int64()),
])

_EMB_TIERS_MID = pa.schema([
    ("vec_id", pa.string()),
    ("exact_min", pa.string()),
    ("cluster_id", pa.string()),
])


def emb_dedup_tiers(sf_dir: str) -> pd.DataFrame:
    """(vec_id, tier, dup_of) per augmented non-null vector.

    Scale shape: a map stage reduces each vector to its md5 byte key so no
    payload shuffles; ONE key-partitioned groupby yields the exact-group
    minima; near labels come from the shared padded-string CC machinery;
    labels union the minima projection and ONE vec_id-partitioned groupby
    classifies.  Padded 12-digit keys keep string order == numeric order;
    ids cast back to int64 at the edge."""
    import hashlib

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.stages.components import connected_components
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    cfg = PipelineConfig()
    edges = _emb_exact_edges(sf_dir, lambda v: np.ones_like(v, bool),
                             lambda a, b: np.ones_like(a & b, bool),
                             aug=True)
    labels = connected_components(edges, cfg)

    ds = _nonnull_vec(dio.read_parquet(_t(sf_dir, "embeddings"),
                                       columns=["vec_id", "embedding"]))
    aug = ds.union(ds.map_batches(
        lambda t: _emb_aug_tbl(t, copies_only=True), batch_format="pyarrow"))

    def proj(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
        keys = [hashlib.md5(np.asarray(v, np.float32).tobytes()).hexdigest()
                for v in t["embedding"].to_pylist()]
        return pa.table({"vec_id": pa.array(_emb_pad(ids), pa.string()),
                         "vec_key": pa.array(keys, pa.string())})

    def minima(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["exact_min"] = df.groupby("vec_key")["vec_id"].transform("min")
        df["cluster_id"] = ""
        return df[["vec_id", "exact_min", "cluster_id"]]

    ident = partitioned_groupby(
        aug.map_batches(proj, batch_format="pyarrow"),
        ["vec_key"], minima, num_parts=16, out_schema=_EMB_TIERS_MID)

    def lab(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"vec_id": t["image_id"],
                         "exact_min": pa.array([""] * n, pa.string()),
                         "cluster_id": t["cluster_id"]})

    mid_out = pa.schema([("vec_id", pa.string()), ("tier", pa.string()),
                         ("dup_of", pa.string())])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lmap = (df.loc[df["cluster_id"] != ""].drop_duplicates("vec_id")
                .set_index("vec_id")["cluster_id"])
        base = df.loc[df["cluster_id"] == ""].copy()
        if len(base) == 0:
            return mid_out.empty_table().to_pandas()
        lbl = base["vec_id"].map(lmap).fillna("")
        own = base["vec_id"]
        is_exact = base["exact_min"] < own
        is_near = (lbl != "") & (lbl < own)
        base["tier"] = np.select([is_exact, is_near], ["exact", "near"],
                                 default="unique")
        base["dup_of"] = np.select([is_exact, is_near],
                                   [base["exact_min"], lbl], default=own)
        return base[["vec_id", "tier", "dup_of"]]

    unioned = ident.union(labels.map_batches(lab, batch_format="pyarrow"))
    out = partitioned_groupby(unioned, ["vec_id"], classify,
                              num_parts=16, out_schema=mid_out).to_pandas()
    out = _typed(out, mid_out)
    res = pd.DataFrame({
        "vec_id": out["vec_id"].astype(np.int64),
        "tier": out["tier"],
        "dup_of": out["dup_of"].astype(np.int64),
    })
    return res.sort_values("vec_id").reset_index(drop=True)


def emb_dedup_tiers_report(sf_dir: str) -> pd.DataFrame:
    """Per-tier rollup: (tier, n_vecs)."""
    full = emb_dedup_tiers(sf_dir)
    out = (full.groupby("tier", as_index=False)
           .agg(n_vecs=("vec_id", "size")))
    out["n_vecs"] = out["n_vecs"].astype(np.int64)
    return out.sort_values("tier").reset_index(drop=True)


_EMB_TIERS_CTES = """
WITH RECURSIVE emb_aug AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND vec_id % 37 = 0
),
ident AS (
  SELECT vec_id,
         min(vec_id) OVER (PARTITION BY embedding) AS exact_min
  FROM emb_aug),
emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM emb_aug
),
edges AS MATERIALIZED (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.e, b.e) >= 0.35
),
e AS MATERIALIZED (
  SELECT u, v FROM edges UNION SELECT v, u FROM edges
),
r(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.lbl FROM e JOIN r ON e.v = r.node
  WHERE r.lbl < e.u
),
lab AS (SELECT node AS vec_id, min(lbl) AS lbl FROM r GROUP BY node),
cls AS (
  SELECT i.vec_id,
         CASE WHEN i.exact_min < i.vec_id THEN 'exact'
              WHEN l.lbl IS NOT NULL AND l.lbl < i.vec_id THEN 'near'
              ELSE 'unique' END AS tier,
         CASE WHEN i.exact_min < i.vec_id THEN i.exact_min
              WHEN l.lbl IS NOT NULL AND l.lbl < i.vec_id THEN l.lbl
              ELSE i.vec_id END AS dup_of
  FROM ident i LEFT JOIN lab l USING (vec_id)
)
"""

EMB_DEDUP_TIERS_SQL = _EMB_TIERS_CTES + """
SELECT vec_id, tier, CAST(dup_of AS BIGINT) AS dup_of
FROM cls ORDER BY vec_id
"""

EMB_DEDUP_TIERS_REPORT_SQL = _EMB_TIERS_CTES + """
SELECT tier, CAST(count(*) AS BIGINT) AS n_vecs
FROM cls GROUP BY tier ORDER BY tier
"""


# ---------------------------------------------------------------------------
# q_docs_line_dedup / q_docs_boilerplate_lines — CCNet-style cross-document
# LINE-level dedup (Wenzek et al. 2020 dedup the corpus by hashed line;
# RefinedWeb/Gopher use the same pass for nav/footer boilerplate).  A line
# is removed iff its exact content occurs in >= 2 DISTINCT documents and is
# non-empty; within-doc repeats alone never qualify.  Runs over the
# multi-line sidecar corpus (fixtures.docs_lines_path — the driver's
# synthetic documents are single-line, so the pass would be vacuous over
# them); the DuckDB mirror computes the same relation over the SAME table.
#
# Scale shape: two hash-partitioned exchanges of the narrow line table —
# (1) partition by LINE CONTENT: every copy of a line is co-located, so the
# distinct-doc count and the removal flag are decided locally per
# partition (no global dup-line set is ever collected or broadcast — the
# boilerplate set of a web corpus is itself huge); (2) partition by doc_id:
# reassemble each document from its kept lines in line_idx order.  Line
# text crosses the wire twice; nothing is materialized on the driver.
# At 100 TB both exchanges stream block-by-block and the per-partition
# kernels are vectorized pandas (one groupby-transform, one sort + join).

def _lines_docs(sf_dir: str):
    import os as _os

    from deduplicator_ray import fixtures

    return dio.read_parquet(
        _os.path.join(fixtures.docs_lines_path(sf_dir), "docs_lines.parquet"),
        columns=["doc_id", "text"])


def _explode_lines(t: pa.Table) -> pa.Table:
    """(doc_id, text) -> flat (doc_id, line_idx, line) — vectorized Arrow
    split + offset arithmetic, no per-row Python."""
    lines = pc.split_pattern(t["text"], "\n")
    lens = pc.list_value_length(lines).to_numpy().astype(np.int64)
    doc_ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
    # per-list 0-based index: global arange minus each row's start offset
    starts = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    idx = np.arange(int(lens.sum()), dtype=np.int64) - starts
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "line_idx": pa.array(idx, pa.int64()),
        "line": pc.list_flatten(lines),
    })


_LINE_FLAG_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("line_idx", pa.int64()),
    ("line", pa.string()), ("removed", pa.bool_())])
_LINE_DEDUP_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_lines", pa.int64()),
    ("n_removed", pa.int64()), ("clean_text", pa.string())])


def _flag_dup_lines(df: pd.DataFrame) -> pd.DataFrame:
    nd = df.groupby("line", sort=False)["doc_id"].transform("nunique")
    df = df.copy()
    df["removed"] = (nd >= 2) & (df["line"].str.len() > 0)
    return df


def _rebuild_docs(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["doc_id", "line_idx"], kind="mergesort")
    g = df.groupby("doc_id", sort=False)
    stats = g.agg(n_lines=("line", "size"), n_removed=("removed", "sum"))
    kept = df[~df["removed"]]
    joined = kept.groupby("doc_id", sort=False)["line"].agg("\n".join)
    out = stats.join(joined.rename("clean_text")).reset_index()
    out["clean_text"] = out["clean_text"].fillna("")
    out["n_removed"] = out["n_removed"].astype(np.int64)
    return out[["doc_id", "n_lines", "n_removed", "clean_text"]]


def docs_line_dedup(sf_dir: str) -> pd.DataFrame:
    """Per-document line-dedup result: line counts, removed-line counts and
    the cleaned text with cross-document duplicate lines dropped."""
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    lines = _lines_docs(sf_dir).map_batches(
        _explode_lines, batch_format="pyarrow")
    flagged = partitioned_groupby(
        lines, ["line"], _flag_dup_lines, out_schema=_LINE_FLAG_SCHEMA)
    out = partitioned_groupby(
        flagged, ["doc_id"], _rebuild_docs, out_schema=_LINE_DEDUP_SCHEMA)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


DOCS_LINE_DEDUP_SQL = """
WITH l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(0, len(string_split(text, chr(10))))) AS line_idx
  FROM '{lines}'
), dup AS (
  SELECT line FROM l WHERE length(line) > 0
  GROUP BY line HAVING count(DISTINCT doc_id) >= 2
)
SELECT l.doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN d.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
       coalesce(string_agg(CASE WHEN d.line IS NULL THEN l.line END,
                           chr(10) ORDER BY l.line_idx), '') AS clean_text
FROM l LEFT JOIN dup d USING (line)
GROUP BY l.doc_id
ORDER BY l.doc_id
"""


def docs_boilerplate_lines(sf_dir: str) -> pd.DataFrame:
    """The duplicated-line table itself (the corpus's boilerplate
    dictionary): each removed line with how many distinct documents and
    total copies carry it — the threshold-tuning diagnostic for the
    line-dedup pass.  Same content-partitioned exchange as
    docs_line_dedup, with a per-batch (line, doc_id)-distinct combiner so
    only one row per (line, doc) reaches the shuffle."""
    from deduplicator_ray.stages.partitioned import partitioned_groupby

    lines = _lines_docs(sf_dir).map_batches(
        _explode_lines, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "line"]).to_pandas()
        df = df[df["line"].str.len() > 0]
        g = (df.groupby(["line", "doc_id"], sort=False)
               .size().rename("n_copies").reset_index())
        # metadata stripped — the b'pandas' schema blob is unhashable and
        # trips Ray's schema dedup (partitioned.py has the same note)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    def per_line(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("line", sort=False).agg(
            n_docs=("doc_id", "nunique"), n_copies=("n_copies", "sum"))
        g = g[g["n_docs"] >= 2].reset_index()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_copies"] = g["n_copies"].astype(np.int64)
        return g[["line", "n_docs", "n_copies"]]

    schema = pa.schema([("line", pa.string()), ("n_docs", pa.int64()),
                        ("n_copies", pa.int64())])
    out = partitioned_groupby(
        lines.map_batches(combine, batch_format="pyarrow"),
        ["line"], per_line, out_schema=schema)
    return out.to_pandas().sort_values("line").reset_index(drop=True)


DOCS_BOILERPLATE_LINES_SQL = """
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM '{lines}'
)
SELECT line,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_copies
FROM l WHERE length(line) > 0
GROUP BY line HAVING count(DISTINCT doc_id) >= 2
ORDER BY line
"""


# ---------------------------------------------------------------------------
# q_emb_pq_topk — product-quantization ANN (Jégou et al. 2011), the
# compressed-domain member of the ANN family: brute force (exact oracle
# shape), IVF (trained partition pruning), SRP-LSH (training-free
# banding), PQ (byte-codes + additive lookup scan).  Codebooks train on
# the same vec_id-sorted absolute-cap sample as IVF/prototypicality;
# queries ship as an e6-quantized (Q, m, k) lookup table via one ray.put;
# the scan is ONE streaming pass — encode the batch, add M table lookups,
# keep a per-batch partial top-k — no shuffle, no float payload beyond
# the batch itself.  At 100 TB the codes would persist as an index (M
# bytes/vector; the kernel admits the same build/probe/append split as
# state/srpstore.py) and the scan reads codes only.
#
# The mirror replays the DISCRETE decisions (codes + LUT, sidecar
# fixtures.pq_sidecar_path) and re-derives the scan as join + grouped sum
# + rank in SQL — integer-exact because every ADC contribution is e6 per
# (query, subspace, code) cell.

def emb_pq_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    import pyarrow.parquet as _pq

    from deduplicator_ray.functions import vector as vfn

    cols = ["query_id", "rank", "vec_id", "score_e6"]
    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    sample = vfn.sample_rows_absolute(ds, 65536)
    if len(sample) == 0:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    books = vfn.train_pq_codebooks(sample)
    qtbl = _nonnull_vec_tbl(_pq.read_table(_t(sf_dir, "embeddings")))
    qdf = qtbl.to_pandas()
    qdf = qdf[qdf["vec_id"] < 4].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy())
    lut = vfn.pq_lut_e6(queries, books)
    ref = ray.put((books, lut, qdf["vec_id"].to_numpy().astype(np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        from deduplicator_ray.functions import vector as vf

        bks, lt, qids = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = vf.pq_encode(vf.embeddings_matrix(t), bks)
        scores = vf.pq_adc_scores(codes, lt)  # (Q, n) int64
        kk = min(k + 1, scores.shape[1])  # +1 absorbs the self hit
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[0]):
            idx = vf.topk_boundary(scores[qi], ids, kk)
            out_q.extend([int(qids[qi])] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(scores[qi][idx].tolist())
        return pa.Table.from_pydict(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "score_e6": pa.array(out_s, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    parts = parts[parts["query_id"] != parts["vec_id"]]
    parts = parts.sort_values(["query_id", "score_e6", "vec_id"],
                              ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    return out[cols]


EMB_PQ_TOPK_SQL = """
WITH s AS (
  SELECT l.query_id, c.vec_id, CAST(sum(l.dot_e6) AS BIGINT) AS score_e6
  FROM '{pq}/codes.parquet' c
  JOIN '{pq}/lut.parquet' l ON l.sub = c.sub AND l.code = c.code
  WHERE l.query_id != c.vec_id
  GROUP BY l.query_id, c.vec_id
), r AS (
  SELECT query_id, vec_id, score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY score_e6 DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score_e6
FROM r WHERE rank <= 5 ORDER BY query_id, rank
"""


# q_emb_pq_rerank — the production PQ search shape (ADC shortlist →
# EXACT re-rank, Jégou et al. 2011 §V): pass 1 is the compressed-domain
# scan above taking the top-R candidates per query (R·Q rows, tiny); pass
# 2 streams the corpus again, touches ONLY shortlisted vectors (broadcast
# id set, ~R/n of the data), computes exact float64 cosine and re-ranks.
# Measured at sf0.01: recall@5 0.30 (pure ADC) → 0.85 (R=100 re-rank)
# while reading exact floats for 5% of the corpus.  Ordering is by the
# e6-quantized cosine with vec_id tie-break in BOTH engines, so the
# relation is deterministic at the rounding boundary.

def emb_pq_rerank(sf_dir: str, k: int = 5, shortlist: int = 100) -> pd.DataFrame:
    import pyarrow.parquet as _pq

    from deduplicator_ray.functions import vector as vfn

    cols = ["query_id", "rank", "vec_id", "cos_e6"]
    adc = emb_pq_topk(sf_dir, k=shortlist)
    if not len(adc):
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    qtbl = _nonnull_vec_tbl(_pq.read_table(_t(sf_dir, "embeddings")))
    qdf = qtbl.to_pandas()
    qdf = qdf[qdf["vec_id"] < 4].sort_values("vec_id")
    qn = vfn._normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qids = qdf["vec_id"].to_numpy().astype(np.int64)
    want = set(map(tuple, adc[["query_id", "vec_id"]].values.tolist()))
    ref = ray.put((qn, qids, want))

    def exact(t: pa.Table) -> pa.Table:
        from deduplicator_ray.functions import vector as vf

        qmat, qid_a, pairs = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xn = vf._normalize(vf.embeddings_matrix(t).astype(np.float64))
        out_q, out_id, out_c = [], [], []
        sims = qmat @ xn.T  # Q × n — Q is tiny by definition
        for qi, qid in enumerate(qid_a):
            m = np.fromiter(((int(qid), int(v)) in pairs for v in ids),
                            bool, len(ids))
            if m.any():
                out_q.extend([int(qid)] * int(m.sum()))
                out_id.extend(ids[m].tolist())
                out_c.extend(_cos_e6(sims[qi][m]).tolist())
        return pa.Table.from_pydict(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "cos_e6": pa.array(out_c, pa.int64())})

    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    parts = ds.map_batches(exact, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    parts = parts.sort_values(["query_id", "cos_e6", "vec_id"],
                              ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    return out[cols]


EMB_PQ_RERANK_SQL = """
WITH s AS (
  SELECT l.query_id, c.vec_id, CAST(sum(l.dot_e6) AS BIGINT) AS score_e6
  FROM '{pq}/codes.parquet' c
  JOIN '{pq}/lut.parquet' l ON l.sub = c.sub AND l.code = c.code
  WHERE l.query_id != c.vec_id
  GROUP BY l.query_id, c.vec_id
), short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_e6 DESC, vec_id) AS rnk
    FROM s) WHERE rnk <= 100
), ex AS (
  SELECT sh.query_id, sh.vec_id,
         CAST(floor(list_cosine_similarity(
             CAST(q.embedding AS DOUBLE[]),
             CAST(e.embedding AS DOUBLE[])) * 1e6 + 0.5) AS BIGINT) AS cos_e6
  FROM short sh
  JOIN embeddings q ON q.vec_id = sh.query_id
  JOIN embeddings e ON e.vec_id = sh.vec_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_e6 FROM (
  SELECT query_id, vec_id, cos_e6,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos_e6 DESC, vec_id) AS rank
  FROM ex)
WHERE rank <= 5 ORDER BY query_id, rank
"""


# q_ann_ivfpq_topk — IVFADC, the classic IVF × PQ combination (Jégou et
# al. 2011 §III): the persisted index holds NO floats (M int8 codes per
# vector, hive-partitioned by ivf_bucket), search reads ONLY the probed
# buckets' code files and scores by additive e6 lookups.  I/O is pruned
# by IVF AND compressed by PQ — the production embedding-ANN scale path.
# The mirror composes the two existing sidecar replays: probed-bucket
# membership from the IVF sidecar, code/LUT scoring from the PQ sidecar.

def ann_ivfpq_topk(sf_dir: str, k: int = 5, nprobe: int = 4) -> pd.DataFrame:
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    import pyarrow.parquet as _pq

    from deduplicator_ray.functions import vector as vfn

    cols = ["query_id", "rank", "vec_id", "score_e6"]
    ds = _nonnull_vec(dio.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]))
    # per-call temp dir (docs_incremental_dedup pattern): a fixed shared
    # path races concurrent invocations — one caller's rmtree deletes
    # bucket codes mid-search of another — and leaks the index after
    work = _tf.mkdtemp(prefix="dedup_ray_ivfpq_", dir=_tf.gettempdir())
    try:
        idx = _os.path.join(work, "index")
        vfn.build_ivfpq_index(ds, idx)
        qtbl = _nonnull_vec_tbl(_pq.read_table(_t(sf_dir, "embeddings")))
        qdf = qtbl.to_pandas()
        qdf = qdf[qdf["vec_id"] < 4].sort_values("vec_id")
        if not len(qdf):
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in cols})
        return vfn.ivfpq_search(
            idx, np.stack(qdf["embedding"].to_numpy()),
            qdf["vec_id"].to_numpy(), k=k, nprobe=nprobe)
    finally:
        _sh.rmtree(work, ignore_errors=True)


ANN_IVFPQ_TOPK_SQL = """
WITH s AS (
  SELECT l.query_id, c.vec_id, CAST(sum(l.dot_e6) AS BIGINT) AS score_e6
  FROM '{pq}/codes.parquet' c
  JOIN '{ivf}/assign.parquet' a USING (vec_id)
  JOIN '{ivf}/probes.parquet' p
    ON p.bucket = a.bucket AND p.query_id != c.vec_id
  JOIN '{pq}/lut.parquet' l
    ON l.query_id = p.query_id AND l.sub = c.sub AND l.code = c.code
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score_e6 FROM (
  SELECT query_id, vec_id, score_e6,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_e6 DESC, vec_id) AS rank
  FROM s)
WHERE rank <= 5 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# q_docs_gopher_repetition / q_docs_gopher_gate — the FULL Gopher repetition
# filter set (Rae et al. 2021 arXiv:2112.11446 Table A1: 13 signals) and the
# keep/drop quality gate at the published thresholds — the standard
# pre-training text hygiene pass alongside dedup/decontamination.  All
# fractions are e6 fixed-point integers with the SAME formulas on both
# engines so the DuckDB mirror is value-exact:
#   dup_{line|para}_frac_e6      = (n - n_distinct) * 1e6 // n
#   dup_{line|para}_char_frac_e6 = chars in segments whose text repeats
#                                  * 1e6 // total segment chars
#   top{2,3,4}gram_char_frac_e6  = count(top n-gram) * len(top) * 1e6 // W
#   dup{5..10}gram_char_frac_e6  = Σ count*len over repeated n-grams
#                                  * 1e6 // W
# where W = len(' '.join(lowercased whitespace tokens)); segments are lines
# (split on \n) / paragraphs (split on \n\n), each stripped of ' \t\r' and
# dropped when empty — the SQL mirror trims the IDENTICAL charset (plain
# trim() would diverge on CRLF/tab-padded corpora); NULL text is '' on both
# sides; the top n-gram is max count with ties to the lexicographically
# smallest gram; the dup-n-gram sums count overlapping occurrences
# (documented over-count — deterministic and relationally expressible,
# unlike Gopher's unspecified overlap handling).  Scale shape: map-only —
# one shifted-concat window build per batch extended incrementally to
# n=10 (the decontamination kernel's trick) + C-level pandas groupbys;
# no shuffle.

GOPHER_SEG_STRIP = " \t\r"
GOPHER_TOP_NS = (2, 3, 4)
GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)
# (rule name, stats column, threshold) in Gopher Table-A1 order — the gate's
# reason is the FIRST failing rule in this order
GOPHER_RULES = (
    ("dup_line_frac", "dup_line_frac_e6", 300_000),
    ("dup_para_frac", "dup_para_frac_e6", 300_000),
    ("dup_line_char_frac", "dup_line_char_frac_e6", 200_000),
    ("dup_para_char_frac", "dup_para_char_frac_e6", 200_000),
    ("top2gram_char_frac", "top2gram_char_frac_e6", 200_000),
    ("top3gram_char_frac", "top3gram_char_frac_e6", 180_000),
    ("top4gram_char_frac", "top4gram_char_frac_e6", 160_000),
    ("dup5gram_char_frac", "dup5gram_char_frac_e6", 150_000),
    ("dup6gram_char_frac", "dup6gram_char_frac_e6", 140_000),
    ("dup7gram_char_frac", "dup7gram_char_frac_e6", 130_000),
    ("dup8gram_char_frac", "dup8gram_char_frac_e6", 120_000),
    ("dup9gram_char_frac", "dup9gram_char_frac_e6", 110_000),
    ("dup10gram_char_frac", "dup10gram_char_frac_e6", 100_000),
)
GOPHER_COLUMNS = (["doc_id", "n_words", "n_lines", "n_paras",
                   "dup_line_frac_e6", "dup_line_char_frac_e6",
                   "dup_para_frac_e6", "dup_para_char_frac_e6"]
                  + [f"top{n}gram_char_frac_e6" for n in GOPHER_TOP_NS]
                  + [f"dup{n}gram_char_frac_e6" for n in GOPHER_DUP_NS])


def _doc_tokens(texts) -> tuple[pd.Series, np.ndarray, np.ndarray]:
    """Lowercased whitespace tokens of a batch: (flat token Series,
    doc_idx per token, token counts per doc); empty tokens dropped,
    NULL text treated as ''."""
    low = pc.utf8_lower(pc.fill_null(pc.cast(texts, pa.string()), ""))
    toks = pc.split_pattern_regex(low, r"\s+")
    cc = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    counts0 = np.diff(np.asarray(cc.offsets, np.int64))
    flat = pd.Series(pc.list_flatten(toks).to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(len(counts0)), counts0)
    keep = flat.to_numpy() != ""
    flat = flat[keep].reset_index(drop=True)
    doc_idx = doc_idx[keep]
    counts = np.bincount(doc_idx, minlength=len(counts0)).astype(np.int64)
    return flat, doc_idx, counts


def _ngram_counts_multi(flat: pd.Series, doc_idx: np.ndarray,
                        counts: np.ndarray,
                        ns: tuple[int, ...]) -> dict[int, pd.DataFrame]:
    """Per-doc n-gram count frames (doc, g, c, cov=c*len(g)) for every n
    in ``ns``, sharing ONE incrementally extended shifted-concat window
    (windows crossing a doc boundary masked out)."""
    offsets = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(len(flat)) - np.repeat(offsets[:-1], counts)
    rep_counts = np.repeat(counts, counts)
    out: dict[int, pd.DataFrame] = {}
    w = flat.copy()
    for j in range(1, max(ns)):
        w = w + " " + flat.shift(-j)
        n = j + 1
        if n not in ns:
            continue
        valid = pos + n <= rep_counts
        df = pd.DataFrame({"doc": doc_idx[valid], "g": w.to_numpy()[valid]})
        cnt = df.groupby(["doc", "g"], sort=False).size().reset_index(name="c")
        cnt["cov"] = cnt["c"] * cnt["g"].str.len()
        out[n] = cnt
    return out


def _top_frac_e6(cnt: pd.DataFrame, W: np.ndarray, n_docs: int) -> np.ndarray:
    """Per-doc most-frequent-n-gram char coverage fraction (ties to the
    lexicographically smallest gram), e6 floor division."""
    out = np.zeros(n_docs, np.int64)
    if not len(cnt):
        return out
    top = (cnt.sort_values(["doc", "c", "g"], ascending=[True, False, True])
           .drop_duplicates("doc"))
    d = top["doc"].to_numpy()
    ok = W[d] > 0
    out[d[ok]] = top["cov"].to_numpy()[ok] * 1_000_000 // W[d[ok]]
    return out


def _dup_frac_e6(cnt: pd.DataFrame, W: np.ndarray, n_docs: int) -> np.ndarray:
    """Per-doc repeated-n-gram char coverage fraction, e6 floor division."""
    out = np.zeros(n_docs, np.int64)
    if not len(cnt):
        return out
    d = cnt.loc[cnt["c"] > 1].groupby("doc")["cov"].sum()
    idx = d.index.to_numpy()
    ok = W[idx] > 0
    out[idx[ok]] = d.to_numpy()[ok] * 1_000_000 // W[idx[ok]]
    return out


def _segment_fracs(texts, sep: str, n_docs: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n_segments, dup_frac_e6, dup_char_frac_e6) per doc for segments of
    ``texts`` split on ``sep``, stripped of GOPHER_SEG_STRIP, empties
    dropped — the shared line/paragraph metric kernel."""
    col = pc.fill_null(pc.cast(texts, pa.string()), "")
    ls = pc.split_pattern(col, sep)
    lcc = ls.combine_chunks() if isinstance(ls, pa.ChunkedArray) else ls
    counts0 = np.diff(np.asarray(lcc.offsets, np.int64))
    flat = pd.Series(pc.list_flatten(ls).to_pylist(),
                     dtype=object).str.strip(GOPHER_SEG_STRIP)
    doc = np.repeat(np.arange(len(counts0)), counts0)
    keep = flat.to_numpy() != ""
    flat, doc = flat[keep].reset_index(drop=True), doc[keep]
    n_seg = np.bincount(doc, minlength=n_docs).astype(np.int64)
    dup_frac = np.zeros(n_docs, np.int64)
    dup_char = np.zeros(n_docs, np.int64)
    if len(flat):
        lc = (pd.DataFrame({"doc": doc, "seg": flat.to_numpy()})
              .groupby(["doc", "seg"], sort=False).size()
              .reset_index(name="c"))
        lc["len"] = lc["seg"].str.len()
        nd = lc.groupby("doc").size()
        di = nd.index.to_numpy()
        dup_frac[di] = n_seg[di] - nd.to_numpy()
        tot = np.zeros(n_docs, np.int64)
        np.add.at(tot, lc["doc"].to_numpy(), (lc["c"] * lc["len"]).to_numpy())
        dupc = lc.loc[lc["c"] > 1]
        dchars = np.zeros(n_docs, np.int64)
        if len(dupc):
            np.add.at(dchars, dupc["doc"].to_numpy(),
                      (dupc["c"] * dupc["len"]).to_numpy())
        ok = tot > 0
        dup_char[ok] = dchars[ok] * 1_000_000 // tot[ok]
    ok = n_seg > 0
    out_frac = np.zeros(n_docs, np.int64)
    out_frac[ok] = dup_frac[ok] * 1_000_000 // n_seg[ok]
    return n_seg, out_frac, dup_char


def gopher_repetition_batch(t: pa.Table) -> pa.Table:
    """The per-batch Gopher repetition kernel (module-level so tests can
    drive it Ray-free); formulas in the block comment above."""
    n = t.num_rows
    flat, doc_idx, counts = _doc_tokens(t["text"])
    tok_chars = np.zeros(n, np.int64)
    if len(flat):
        np.add.at(tok_chars, doc_idx, flat.str.len().to_numpy(np.int64))
    W = tok_chars + np.maximum(counts - 1, 0)

    grams = _ngram_counts_multi(flat, doc_idx, counts,
                                GOPHER_TOP_NS + GOPHER_DUP_NS)
    tops = [_top_frac_e6(grams[g], W, n) for g in GOPHER_TOP_NS]
    dups = [_dup_frac_e6(grams[g], W, n) for g in GOPHER_DUP_NS]

    n_lines, dupl_frac, dupl_char = _segment_fracs(t["text"], "\n", n)
    n_paras, dupp_frac, dupp_char = _segment_fracs(t["text"], "\n\n", n)

    return pa.Table.from_arrays(
        [t["doc_id"], pa.array(counts), pa.array(n_lines),
         pa.array(n_paras), pa.array(dupl_frac), pa.array(dupl_char),
         pa.array(dupp_frac), pa.array(dupp_char)]
        + [pa.array(x) for x in tops] + [pa.array(x) for x in dups],
        names=GOPHER_COLUMNS)


def docs_gopher_repetition(sf_dir: str) -> pd.DataFrame:
    docs = dio.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = docs.map_batches(gopher_repetition_batch,
                           batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_gopher_gate(sf_dir: str) -> pd.DataFrame:
    """keep/drop per document by the 13 Gopher repetition thresholds;
    reason is the FIRST failing rule in Table-A1 order, '' for keepers."""
    st = docs_gopher_repetition(sf_dir)
    reason = pd.Series([""] * len(st), dtype=object)
    for name, col, cap in reversed(GOPHER_RULES):
        reason = reason.where(~(st[col] > cap), name)
    return pd.DataFrame({
        "doc_id": st["doc_id"],
        "action": np.where(reason == "", "keep", "drop"),
        "reason": reason,
    }).sort_values("doc_id").reset_index(drop=True)


def _gopher_ngram_cte(n: int) -> str:
    cat = " || ' ' || ".join(f"ws[i+{j}]" if j else "ws[i]"
                             for j in range(n))
    return f"""
g{n} AS (
  SELECT doc_id, W, unnest([{cat} FOR i IN range(1, len(ws) - {n - 2})]) AS g
  FROM wl),
c{n} AS (SELECT doc_id, W, g, count(*) AS c FROM g{n} GROUP BY ALL)"""


def _gopher_top_cte(n: int) -> str:
    return f"""
t{n} AS (SELECT doc_id, c * length(g) * 1000000 // W AS f,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY c DESC, g) AS rn
       FROM c{n} WHERE W > 0)"""


def _gopher_dup_cte(n: int) -> str:
    return f"""
d{n} AS (SELECT doc_id,
              coalesce(sum(CASE WHEN c > 1 THEN c * length(g) END), 0)
                  * 1000000 // any_value(W) AS f
       FROM c{n} WHERE W > 0 GROUP BY doc_id)"""


def _gopher_seg_cte(tag: str, sep_sql: str) -> str:
    """Line/paragraph segment CTEs: split on ``sep_sql``, trim the SAME
    ' \\t\\r' charset the engine strips, drop empties."""
    return f"""
{tag}raw AS (SELECT doc_id, trim(x, ' ' || chr(9) || chr(13)) AS seg
       FROM b, unnest(string_split(coalesce(text, ''), {sep_sql})) AS u(x)),
{tag}c AS (SELECT doc_id, seg, count(*) AS c, length(seg) AS len
       FROM {tag}raw WHERE seg <> '' GROUP BY ALL),
{tag}a AS (SELECT doc_id, sum(c) AS n_seg,
              (sum(c) - count(*)) * 1000000 // sum(c) AS dup_frac,
              coalesce(sum(CASE WHEN c > 1 THEN c * len END), 0)
                  * 1000000 // sum(c * len) AS dup_char_frac
       FROM {tag}c GROUP BY doc_id)"""


def _gopher_repetition_sql() -> str:
    ns = GOPHER_TOP_NS + GOPHER_DUP_NS
    ctes = "".join("," + _gopher_ngram_cte(n) for n in ns)
    ctes += "".join("," + _gopher_top_cte(n) for n in GOPHER_TOP_NS)
    ctes += "".join("," + _gopher_dup_cte(n) for n in GOPHER_DUP_NS)
    ctes += "," + _gopher_seg_cte("ln", "chr(10)")
    ctes += "," + _gopher_seg_cte("pp", "chr(10) || chr(10)")
    top_cols = "".join(
        f",\n       CAST(coalesce(t{n}.f, 0) AS BIGINT)"
        f" AS top{n}gram_char_frac_e6" for n in GOPHER_TOP_NS)
    dup_cols = "".join(
        f",\n       CAST(coalesce(d{n}.f, 0) AS BIGINT)"
        f" AS dup{n}gram_char_frac_e6" for n in GOPHER_DUP_NS)
    top_joins = "".join(
        f"\nLEFT JOIN (SELECT doc_id, f FROM t{n} WHERE rn = 1) t{n}"
        f" USING (doc_id)" for n in GOPHER_TOP_NS)
    dup_joins = "".join(f"\nLEFT JOIN d{n} USING (doc_id)"
                        for n in GOPHER_DUP_NS)
    return f"""
WITH b AS (SELECT doc_id, text FROM documents),
w AS (SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '\\s+'),
                         x -> x <> '') AS ws
      FROM b),
wl AS (SELECT doc_id, ws, len(ws) AS n_words,
              CASE WHEN len(ws) = 0 THEN 0
                   ELSE length(array_to_string(ws, ' ')) END AS W
       FROM w){ctes}
SELECT b.doc_id,
       CAST(wl.n_words AS BIGINT) AS n_words,
       CAST(coalesce(lna.n_seg, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(ppa.n_seg, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(lna.dup_frac, 0) AS BIGINT) AS dup_line_frac_e6,
       CAST(coalesce(lna.dup_char_frac, 0) AS BIGINT)
           AS dup_line_char_frac_e6,
       CAST(coalesce(ppa.dup_frac, 0) AS BIGINT) AS dup_para_frac_e6,
       CAST(coalesce(ppa.dup_char_frac, 0) AS BIGINT)
           AS dup_para_char_frac_e6{top_cols}{dup_cols}
FROM b
JOIN wl USING (doc_id)
LEFT JOIN lna USING (doc_id)
LEFT JOIN ppa USING (doc_id){top_joins}{dup_joins}
ORDER BY b.doc_id
"""


DOCS_GOPHER_REPETITION_SQL = _gopher_repetition_sql()


def _gopher_gate_sql() -> str:
    whens = "\n".join(
        f"                  WHEN {col} > {cap} THEN '{name}'"
        for name, col, cap in GOPHER_RULES)
    return f"""
WITH st AS ({DOCS_GOPHER_REPETITION_SQL.replace("ORDER BY b.doc_id", "")}),
r AS (SELECT doc_id,
             CASE
{whens}
                  ELSE '' END AS reason
      FROM st)
SELECT doc_id, CASE WHEN reason = '' THEN 'keep' ELSE 'drop' END AS action,
       reason
FROM r ORDER BY doc_id
"""


DOCS_GOPHER_GATE_SQL = _gopher_gate_sql()
