"""Mirror pins for the two join operators Ray Data lacks natively — the
as-of join (latest order at-or-before each event) and the range /
interval-containment join (event → containing session interval).  Both are
built as union + ONE hash-partition groupby + per-key vectorized match
(queries.events_asof_orders / events_range_join); each must VALUE-match
its DuckDB mirror at sf-small, the same comparison the driver runs at
sf0.01."""

import duckdb
import pandas as pd
import pytest

from deduplicator_ray.pipelines import queries as q


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{sf_small}/{t}.parquet')")
    return c


def _match(eng: pd.DataFrame, orc: pd.DataFrame):
    assert sorted(eng.columns) == sorted(orc.columns)
    cols = sorted(eng.columns)
    a = eng[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for col in cols:
        assert a[col].dtype == b[col].dtype, \
            f"{col}: {a[col].dtype} != {b[col].dtype}"
    pd.testing.assert_frame_equal(a, b)


def test_asof_join_mirror(sf_small, con):
    eng = q.events_asof_orders(sf_small)
    orc = con.execute(q.EVENTS_ASOF_ORDERS_SQL).df()
    _match(eng, orc)
    # non-vacuous: every matched event's order precedes-or-equals its ts
    assert (eng["asof_orderdate"] <= eng["ts"]).all()
    assert len(eng) > 0


def test_range_join_mirror(sf_small, con):
    eng = q.events_range_join(sf_small)
    orc = con.execute(q.EVENTS_RANGE_JOIN_SQL).df()
    _match(eng, orc)
    # every event lands in exactly one session (intervals are disjoint and
    # cover every event timestamp by construction)
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert len(eng) == n_events
    assert eng["event_id"].is_unique
    # multi-session users exist, else the interval search is vacuous
    assert (eng.groupby("user_id")["session_id"].max() > 0).any()


# --- windowed / aggregate scale patterns (same events/orders fixtures) ---


def test_hopping_window_mirror(sf_small, con):
    eng = q.events_hopping_window(sf_small)
    orc = con.execute(q.EVENTS_HOPPING_WINDOW_SQL).df()
    _match(eng, orc)
    # every event contributes to exactly 2 windows
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert int(eng["n_events"].sum()) == 2 * n_events


def test_distinct_users_mirror(sf_small, con):
    eng = q.events_distinct_users(sf_small)
    orc = con.execute(q.EVENTS_DISTINCT_USERS_SQL).df()
    _match(eng, orc)
    # distinct < raw activity somewhere, else the combiner is vacuous
    raw = con.execute(
        "SELECT count(*) FROM (SELECT date_trunc('day', ts) d, event_type, "
        "user_id FROM events)").fetchone()[0]
    assert int(eng["n_users"].sum()) < raw


def test_price_quantiles_mirror(sf_small, con):
    eng = q.orders_price_quantiles(sf_small)
    orc = con.execute(q.ORDERS_PRICE_QUANTILES_SQL).df()
    _match(eng, orc)
    assert list(eng["q"]) == [0.5, 0.9, 0.99]
    assert eng["price_c"].is_monotonic_increasing


@pytest.fixture(scope="module")
def con_docs(sf_small):
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf_small}/documents.parquet')")
    return c


def test_top_tokens_mirror(sf_small, con_docs):
    eng = q.docs_top_tokens(sf_small)
    orc = con_docs.execute(q.DOCS_TOP_TOKENS_SQL).df()
    _match(eng, orc)
    # engine output is already rank-ordered (cnt DESC, token ASC)
    assert eng["cnt"].is_monotonic_decreasing or (
        eng.sort_values(["cnt", "token"], ascending=[False, True])
        .reset_index(drop=True).equals(eng))


def test_funnel_mirror(sf_small, con):
    eng = q.events_funnel(sf_small)
    orc = con.execute(q.EVENTS_FUNNEL_SQL).df()
    _match(eng, orc)
    # non-vacuous: at least one user reaches each of stages 1..3
    assert set(eng["funnel_stage"]) >= {1, 2, 3} or len(eng) < 20


def test_props_stats_mirror(sf_small, con):
    eng = q.events_props_stats(sf_small)
    orc = con.execute(q.EVENTS_PROPS_STATS_SQL).df()
    _match(eng, orc)
    assert (eng["n_with_k"] > 0).all()  # extraction actually hit


def test_moving_sum_mirror(sf_small, con):
    eng = q.events_moving_sum(sf_small)
    orc = con.execute(q.EVENTS_MOVING_SUM_SQL).df()
    _match(eng, orc)
    # window actually accumulates: some rows exceed their own value
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert len(eng) == n_events


@pytest.fixture(scope="module")
def con_orders(sf_small):
    c = duckdb.connect()
    c.execute("CREATE VIEW orders AS SELECT * FROM "
              f"read_parquet('{sf_small}/orders.parquet')")
    return c


def test_median_by_priority_mirror(sf_small, con_orders):
    eng = q.orders_median_by_priority(sf_small)
    orc = con_orders.execute(q.ORDERS_MEDIAN_BY_PRIORITY_SQL).df()
    _match(eng, orc)
    assert len(eng) == 5  # one row per priority class


def test_integrity_audit_mirror(sf_small, tmp_path):
    """The testdata is referentially clean (all-zero orphans would leave the
    detection path untested), so audit a CORRUPTED copy: drop half the
    customer rows so orders gain orphan custkeys — engine and mirror must
    agree on the non-zero counts."""
    import shutil

    import pyarrow.parquet as pq_

    work = tmp_path / "corrupt"
    work.mkdir()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region"):
        shutil.copy(f"{sf_small}/{t}.parquet", work / f"{t}.parquet")
    cust = pq_.read_table(work / "customer.parquet")
    pq_.write_table(cust.slice(0, cust.num_rows // 2),
                    work / "customer.parquet")

    eng = q.integrity_audit(str(work))
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{work}/{t}.parquet')")
    orc = c.execute(q.INTEGRITY_AUDIT_SQL).df()
    _match(eng, orc)
    edge = "orders.o_custkey->customer.c_custkey"
    assert int(eng.loc[eng["edge"] == edge, "n_orphans"].iloc[0]) > 0
    assert int(eng.loc[eng["edge"] != edge, "n_orphans"].sum()) == 0


def test_pivot_dow_mirror(sf_small, con):
    eng = q.events_pivot_dow(sf_small)
    orc = con.execute(q.EVENTS_PIVOT_DOW_SQL).df()
    _match(eng, orc)
    # the wide cells account for every event
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert int(eng[[c for c in eng.columns if c.startswith("n_dow")]]
               .to_numpy().sum()) == n_events


def test_orders_rollup_mirror(sf_small, con_orders):
    eng = q.orders_rollup(sf_small)
    orc = con_orders.execute(q.ORDERS_ROLLUP_SQL).df()
    _match(eng, orc)
    # 5 priorities × statuses + 5 priority subtotals + 1 grand total; each
    # level's totals reconcile to the grand total
    gt = eng[(eng["o_orderpriority"] == "ALL")]
    assert len(gt) == 1
    fine = eng[(eng["o_orderpriority"] != "ALL")
               & (eng["o_orderstatus"] != "ALL")]
    sub = eng[(eng["o_orderpriority"] != "ALL")
              & (eng["o_orderstatus"] == "ALL")]
    for col in ("n_orders", "sum_price_c"):
        assert int(fine[col].sum()) == int(gt[col].iloc[0])
        assert int(sub[col].sum()) == int(gt[col].iloc[0])


def test_snapshot_diff_mirror(sf_small, con_docs):
    eng = q.docs_snapshot_diff(sf_small)
    orc = con_docs.execute(q.DOCS_SNAPSHOT_DIFF_SQL).df()
    _match(eng, orc)
    # all three change classes occur, and no key is classified twice
    assert set(eng["change"]) == {"added", "removed", "changed"}
    assert eng["doc_id"].is_unique
    # added keys live in the offset namespace, removed/changed in the base
    assert (eng.loc[eng["change"] == "added", "doc_id"]
            >= q._DIFF_ADD_OFFSET).all()
    assert (eng.loc[eng["change"] != "added", "doc_id"]
            < q._DIFF_ADD_OFFSET).all()


def test_price_ntile_mirror(sf_small, con_orders):
    eng = q.orders_price_ntile(sf_small)
    orc = con_orders.execute(q.ORDERS_PRICE_NTILE_SQL).df()
    _match(eng, orc)
    # every order is assigned, deciles span 1..10 and are value-monotone
    n = con_orders.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert len(eng) == n
    assert eng["decile"].min() == 1 and eng["decile"].max() == 10
    s = eng.sort_values("price_c")
    assert s["decile"].is_monotonic_increasing


def test_cross_dedup_mirror(sf_small, con_docs):
    eng = q.docs_cross_dedup(sf_small)
    orc = con_docs.execute(q.DOCS_CROSS_DEDUP_SQL).df()
    _match(eng, orc)
    # non-vacuous: both verdicts occur; drops point at a known-side id
    assert set(eng["action"]) == {"keep", "drop"}
    drops = eng[eng["action"] == "drop"]
    assert (drops["matched_known"] >= 0).all()
    assert (eng.loc[eng["action"] == "keep", "matched_known"] == -1).all()
    # matched ids really are known-side (md5 nibble 0-7), never new-side
    import hashlib
    assert all(hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567"
               for i in drops["matched_known"])


def test_cross_dedup_matches_bruteforce():
    """cross_dup_min_match == single-process brute-force min-match on a
    constructed corpus: exact copies, near-identical edits (Jaccard ≈ 1,
    so LSH banding collides deterministically-in-practice), and unrelated
    docs on both sides."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.functions import text as textfn
    from deduplicator_ray.pipelines.doc_dedup import cross_dup_min_match

    rng = np.random.default_rng(7)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]

    def mk(n_words):
        return " ".join(rng.choice(vocab, n_words))

    known_ids, known_tx = [], []
    for i in range(20):
        known_ids.append(100 + i)
        known_tx.append(mk(60))
    new_ids, new_tx = [], []
    # exact copies of known docs (including two new docs copying the SAME
    # known doc — both must match it)
    new_ids += [500, 501, 502]
    new_tx += [known_tx[3], known_tx[3], known_tx[7]]
    # near-identical edit (append one word)
    new_ids += [510]
    new_tx += [known_tx[5] + " zulu"]
    # unrelated
    for i in range(10):
        new_ids.append(600 + i)
        new_tx.append(mk(55))
    # duplicate texts WITHIN known: min id must win
    known_ids.append(90)
    known_tx.append(known_tx[3])

    cfg = PipelineConfig()
    known = rd.from_arrow(pa.Table.from_pydict(
        {"doc_id": pa.array(known_ids, pa.int64()),
         "text": pa.array(known_tx, pa.string())}))
    new = rd.from_arrow(pa.Table.from_pydict(
        {"doc_id": pa.array(new_ids, pa.int64()),
         "text": pa.array(new_tx, pa.string())}))
    eng = (cross_dup_min_match(new, known, cfg).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    mcol = [c for c in eng.columns if c != "doc_id"][0]

    # brute force over exact shingle Jaccard
    def jac(a, b):
        sa = textfn.char_shingle_hashes(a, cfg.shingle_k)
        sb = textfn.char_shingle_hashes(b, cfg.shingle_k)
        if len(sa) == 0 and len(sb) == 0:
            return 1.0
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        return inter / (len(sa) + len(sb) - inter)

    want = {}
    for ni, nt in zip(new_ids, new_tx):
        ms = [ki for ki, kt in zip(known_ids, known_tx)
              if jac(nt, kt) >= cfg.jaccard_min]
        if ms:
            want[ni] = min(ms)
    got = dict(zip(eng["doc_id"], eng[mcol]))
    assert got == want
    # the intended structure actually occurred
    assert want[500] == 90 and want[501] == 90  # min-id known copy wins
    assert 510 in want  # near-identical edit found


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_snapshot_diff_classify_fuzz(seed):
    """The distributed diff classification equals set logic on randomized
    two-sided tables (keys only in old → removed, only in new → added,
    digest drift → changed, identical → absent)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.stages.partitioned import partitioned_groupby

    rng = np.random.default_rng(seed)
    keys = rng.choice(10_000, size=200, replace=False)
    old_keys = keys[:150]
    new_keys = np.concatenate([keys[50:150], keys[150:]])  # 100 shared
    digs = {int(k): f"d{k}" for k in keys}
    # drift ~30% of the shared keys
    shared = set(map(int, old_keys)) & set(map(int, new_keys))
    drifted = {k for k in shared if rng.random() < 0.3}

    def tbl(ks, side):
        return pa.Table.from_pydict({
            "doc_id": pa.array(np.asarray(ks, np.int64)),
            "dig": pa.array([digs[int(k)] + ("'" if side == 1 and int(k) in drifted
                                             else "") for k in ks]),
            "side": pa.array(np.full(len(ks), side, np.int64))})

    ds = rd.from_arrow(tbl(old_keys, 0)).union(rd.from_arrow(tbl(new_keys, 1)))

    import pandas as pd

    def classify(df):
        d0 = df[df["side"] == 0].set_index("doc_id")["dig"]
        d1 = df[df["side"] == 1].set_index("doc_id")["dig"]
        j = d0.to_frame("d0").join(d1.to_frame("d1"), how="outer")
        ch = np.where(j["d0"].isna(), "added",
                      np.where(j["d1"].isna(), "removed",
                               np.where(j["d0"] != j["d1"], "changed", "same")))
        out = pd.DataFrame({"doc_id": j.index.to_numpy(np.int64), "change": ch})
        return out[out["change"] != "same"]

    out_schema = pa.schema([("doc_id", pa.int64()), ("change", pa.string())])
    got = partitioned_groupby(ds, ["doc_id"], classify, num_parts=8,
                              out_schema=out_schema).to_pandas()
    got = dict(zip(got["doc_id"], got["change"]))

    old_set, new_set = set(map(int, old_keys)), set(map(int, new_keys))
    want = {k: "removed" for k in old_set - new_set}
    want |= {k: "added" for k in new_set - old_set}
    want |= {k: "changed" for k in drifted}
    assert got == want


def test_user_paths_mirror(sf_small, con):
    eng = q.events_user_paths(sf_small)
    orc = con.execute(q.EVENTS_USER_PATHS_SQL).df()
    _match(eng, orc)
    # prefix cap binds: active users exist whose path stops at K events
    import re
    seg = eng["path_prefix"].str.count(">") + 1
    assert (seg <= q.PATH_PREFIX_K).all()
    assert ((eng["n_events"] > q.PATH_PREFIX_K) & (seg == q.PATH_PREFIX_K)).any()
    # every user appears exactly once
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert len(eng) == n_users and eng["user_id"].is_unique


def test_lang_centroids_mirror(sf_small):
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{sf_small}/{t}.parquet')")
    eng = q.emb_lang_centroids(sf_small)
    orc = c.execute(q.EMB_LANG_CENTROIDS_SQL).df()
    _match(eng, orc)
    # one row per (lang, dim); counts are constant across a lang's dims
    # and account for every embedding
    assert not eng.duplicated(["lang", "dim"]).any()
    per_lang = eng.groupby("lang")["n_vecs"].nunique()
    assert (per_lang == 1).all()
    n_emb = c.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert int(eng.drop_duplicates("lang")["n_vecs"].sum()) == n_emb


def test_debounce_mirror(sf_small, con):
    eng = q.events_debounce(sf_small)
    orc = con.execute(q.EVENTS_DEBOUNCE_SQL).df()
    _match(eng, orc)
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    # something was actually debounced, and kept ids are unique
    assert 0 < len(eng) < n_events
    assert eng["event_id"].is_unique
    # every dropped event has a same-key predecessor within the window
    dropped = con.execute(f"""
        WITH r AS (
          SELECT event_id, lag(ts) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id) AS pts, ts
          FROM events)
        SELECT count(*) FROM r
        WHERE pts IS NOT NULL AND ts - pts <= INTERVAL {q.DEBOUNCE_MIN} MINUTE
    """).fetchone()[0]
    assert len(eng) == n_events - dropped


def test_price_minmax_mirror(sf_small, con_orders):
    eng = q.orders_price_minmax(sf_small)
    orc = con_orders.execute(q.ORDERS_PRICE_MINMAX_SQL).df()
    _match(eng, orc)
    n = con_orders.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert len(eng) == n
    # each group's scale actually spans [0, 1e6]
    g = eng.groupby("o_orderpriority")["scaled_e6"]
    assert (g.min() == 0).all() and (g.max() == 1_000_000).all()


def test_retention_mirror(sf_small, con, tmp_path):
    # driver table (degenerate: one dense cohort) must still value-match
    eng = q.events_retention(sf_small)
    orc = con.execute(q.EVENTS_RETENTION_SQL).df()
    _match(eng, orc)

    # crafted non-degenerate cohorts: staggered starts, churn, a returner
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rows = []
    wk = 7 * 86_400_000_000  # a week in microseconds
    for uid, weeks in enumerate(
            [(0, 1, 2), (0, 2), (0,), (1, 2, 5), (1,), (2, 3), (2,)]):
        for w in weeks:
            rows.append((uid, w * wk + uid * 1_000_000))
    t = pa.Table.from_pydict({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
    })
    work = tmp_path / "ret"
    work.mkdir()
    pq_.write_table(t, work / "events.parquet")
    eng2 = q.events_retention(str(work))
    c2 = duckdb.connect()
    c2.execute(f"CREATE VIEW events AS SELECT * FROM "
               f"read_parquet('{work}/events.parquet')")
    orc2 = c2.execute(q.EVENTS_RETENTION_SQL).df()
    _match(eng2, orc2)
    assert eng2["cohort_week"].nunique() == 3          # staggered cohorts
    base = eng2[eng2["week_offset"] == 0].set_index("cohort_week")["n_users"]
    later = eng2[eng2["week_offset"] > 0]
    # churn: every later offset retains fewer-or-equal users than its base
    assert (later["n_users"].to_numpy()
            <= base.loc[later["cohort_week"]].to_numpy()).all()
    # the gap-returner shows up at offset 4 for cohort week 1's cohort
    ck = sorted(eng2["cohort_week"].unique())[1]
    assert ((later["cohort_week"] == ck) & (later["week_offset"] == 4)).any()


def test_cooccurrence_mirror(sf_small, con):
    eng = q.events_cooccurrence(sf_small)
    orc = con.execute(q.EVENTS_COOCCURRENCE_SQL).df()
    _match(eng, orc)
    # pairs are canonical (a < b) and unique; counts bounded by basket count
    assert (eng["type_a"] < eng["type_b"]).all()
    assert not eng.duplicated(["type_a", "type_b"]).any()
    n_baskets = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id, "
        "CAST(floor(epoch(ts)/86400) AS BIGINT) FROM events)").fetchone()[0]
    assert (eng["n_baskets"] <= n_baskets).all() and len(eng) > 0


# --- IR / time-series / anomaly / kNN operator mirrors -------------------

def test_tfidf_top_terms_mirror(sf_small):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf_small}/documents.parquet')")
    eng = q.docs_tfidf_top_terms(sf_small)
    orc = c.execute(q.DOCS_TFIDF_TOP_TERMS_SQL).df()
    _match(eng, orc)
    # ≤ k rows per doc, every doc with nonempty text represented
    per_doc = eng.groupby("doc_id").size()
    assert (per_doc <= q._TFIDF_K).all()
    n_docs = c.execute(
        "SELECT count(*) FROM documents WHERE text != ''").fetchone()[0]
    assert len(per_doc) == n_docs
    # scores are positive and the score formula holds exactly
    assert (eng["tfidf_e6"]
            == eng["tf"] * n_docs * 1_000_000 // eng["df"]).all()


def test_inverted_index_mirror(sf_small):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf_small}/documents.parquet')")
    eng = q.docs_inverted_index(sf_small)
    orc = c.execute(q.DOCS_INVERTED_INDEX_SQL).df()
    _match(eng, orc)
    # postings are capped, ascending, and consistent with df
    for r in eng.itertuples():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids) and len(ids) == min(r.df, q._POSTINGS_K)
    # cap must actually bind somewhere, else the bounded-output path is
    # untested
    assert (eng["df"] > q._POSTINGS_K).any()


def test_emb_knn_join_mirror(sf_small):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{sf_small}/embeddings.parquet')")
    eng = q.emb_knn_join(sf_small)
    orc = c.execute(q.EMB_KNN_JOIN_SQL).df()
    _match(eng, orc)
    n = c.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(eng) == n * q._KNN_K
    # within a vec, ranks are 1..k and cosines are non-increasing
    g = eng.groupby("vec_id")
    assert (g["nn_rank"].apply(lambda s: list(s) == [1, 2, 3])).all()
    assert (g["cos_e6"].apply(lambda s: s.is_monotonic_decreasing)).all()
    assert (eng["vec_id"] != eng["nn_id"]).all()


def test_monthly_growth_mirror(sf_small):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW orders AS SELECT * FROM "
              f"read_parquet('{sf_small}/orders.parquet')")
    eng = q.orders_monthly_growth(sf_small)
    orc = c.execute(q.ORDERS_MONTHLY_GROWTH_SQL).df()
    _match(eng, orc)
    # delta telescopes: sum of deltas = last month's revenue... no — sum of
    # deltas = last rev_c since prev of first is 0
    assert int(eng["delta_c"].sum()) == int(eng["rev_c"].iloc[-1])
    # revenue both grows and shrinks somewhere (non-vacuous signs)
    assert (eng["delta_c"] > 0).any() and (eng["delta_c"] < 0).any()


def test_value_outliers_mirror(sf_small):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{sf_small}/events.parquet')")
    eng = q.events_value_outliers(sf_small)
    orc = c.execute(q.EVENTS_VALUE_OUTLIERS_SQL).df()
    _match(eng, orc)
    assert len(eng) > 0
    # every flagged value strictly exceeds 3× its type mean (recomputed
    # independently here in cents)
    st = c.execute("""
        SELECT event_type, count(*) n,
               sum(CAST(floor(value*100+0.5) AS BIGINT)) s
        FROM events GROUP BY event_type""").df().set_index("event_type")
    for r in eng.itertuples():
        n, s = int(st.loc[r.event_type, "n"]), int(st.loc[r.event_type, "s"])
        assert r.value_c * n > 3 * s


def test_kmv_distinct_mirror(sf_small):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{sf_small}/events.parquet')")
    eng = q.events_kmv_distinct(sf_small)
    orc = c.execute(q.EVENTS_KMV_DISTINCT_SQL).df()
    _match(eng, orc)
    # the estimate is within the sketch's expected error envelope of the
    # exact distinct count (std err ≈ 1/sqrt(k-2); assert a loose 5σ)
    exact = c.execute("""
        SELECT event_type, count(DISTINCT user_id) AS nd
        FROM events GROUP BY event_type""").df().set_index("event_type")
    import math
    tol = 5.0 / math.sqrt(q._KMV_K - 2)
    for r in eng.itertuples():
        nd = int(exact.loc[r.event_type, "nd"])
        if r.n_sketch < q._KMV_K:
            assert r.est_distinct == nd  # exact below k
        else:
            assert abs(r.est_distinct - nd) <= tol * nd
    # at least one type must exercise the FULL-sketch estimator path
    assert (eng["n_sketch"] == q._KMV_K).any()


def test_kmv_sketch_is_mergeable(sf_small):
    """Split the events table in two, sketch each half through the engine,
    merge the halves' (type, hv) rows by re-taking the k smallest — the
    merged sketch must equal the whole-table sketch (the property that
    makes the combiner-shuffle shape correct at any partitioning)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_small}/events.parquet",
                      columns=["event_type", "user_id"]).to_pandas()
    whole = q.events_kmv_distinct(sf_small)

    def sketch(df):
        d = df.drop_duplicates().copy()
        d["hv"] = [int(hashlib.md5(str(int(u)).encode()).hexdigest()[:12], 16)
                   for u in d["user_id"]]
        d = d.drop_duplicates(["event_type", "hv"]).sort_values(
            ["event_type", "hv"])
        return d[d.groupby("event_type").cumcount() < q._KMV_K]

    halves = pd.concat([sketch(t.iloc[::2]), sketch(t.iloc[1::2])])
    merged = halves.drop_duplicates(["event_type", "hv"]).sort_values(
        ["event_type", "hv"])
    merged = merged[merged.groupby("event_type").cumcount() < q._KMV_K]
    g = merged.groupby("event_type")["hv"]
    ref = pd.DataFrame({"n_sketch": g.size(), "kth_min": g.max()})
    got = whole.set_index("event_type")[["n_sketch", "kth_min"]]
    pd.testing.assert_frame_equal(
        got.sort_index(), ref.sort_index().astype(np.int64),
        check_names=False)


def test_doc_keep_best_election(ray_session):
    """doc_keep_best: within each near-dup component the LONGEST text wins;
    equal lengths tie-break by ascending doc_id STRING (lexical, matching
    the mirror's VARCHAR order)."""
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.config import PipelineConfig
    from deduplicator_ray.pipelines.doc_dedup import doc_keep_best

    base = "abcdefghij" * 20
    docs = pa.table({
        "doc_id": pa.array([9, 10, 3, 4, 77], pa.int64()),
        "text": pa.array([base, base + "abcde",     # longer member wins
                          "zyxwv" * 40, "zyxwv" * 40,  # tie → min id string
                          "unique text with no twin anywhere"], pa.string()),
    })
    out = (doc_keep_best(rd.from_arrow(docs), PipelineConfig())
           .to_pandas().set_index("doc_id"))
    assert out.loc["10", "action"] == "keep"
    assert out.loc["9", "action"] == "drop"
    assert out.loc["3", "action"] == "keep"
    assert out.loc["4", "action"] == "drop"
    assert "77" not in out.index          # singleton: implicitly kept
    assert out.loc["9", "cluster_id"] == out.loc["10", "cluster_id"]


def test_pagerank_e6_exact(ray_session):
    """pagerank_e6 equals a driver-side integer reference on a small graph
    (path + triangle): all-integer e6 rounds make the check bit-exact."""
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.pipelines.graph import pagerank_e6

    pairs = [("a", "b"), ("b", "c"),            # path
             ("x", "y"), ("y", "z"), ("x", "z")]  # triangle
    edges = rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string()),
    }))
    got = (pagerank_e6(edges, iters=5).to_pandas()
           .set_index("node")["rank_e6"].to_dict())

    adj = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    r = {n: 1_000_000 for n in adj}
    for _ in range(5):
        r = {n: 150_000 + 85 * sum(r[m] // len(adj[m]) for m in adj[n]) // 100
             for n in adj}
    assert got == r
    # triangle is symmetric; path endpoints symmetric
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] == got["c"] != got["b"]


def test_pagerank_driver_equals_distributed(ray_session):
    """The driver base case and the distributed shuffle rounds are
    bit-equal on a seeded random graph (driver_edge_cap=0 forces the
    distributed path; the default routes this tiny graph driver-side)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.pipelines.graph import pagerank_e6

    rng = np.random.default_rng(7)
    pairs = {tuple(sorted((f"n{a}", f"n{b}")))
             for a, b in rng.integers(0, 40, size=(120, 2)) if a != b}
    edges = pa.table({
        "src": pa.array([p[0] for p in sorted(pairs)], pa.string()),
        "dst": pa.array([p[1] for p in sorted(pairs)], pa.string()),
    })
    drv = (pagerank_e6(rd.from_arrow(edges), iters=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    dist = (pagerank_e6(rd.from_arrow(edges), iters=4, driver_edge_cap=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert drv.equals(dist)
    assert len(drv) == len({n for p in pairs for n in p})


def test_triangle_counts_exact(ray_session):
    """triangle_counts: K4 nodes sit in C(3,2)=3 triangles each, a pure
    triangle's nodes in 1, path nodes in 0; zero-filled for all nodes."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.pipelines.graph import triangle_counts

    pairs = ([("a", "b"), ("b", "c")]                       # path: 0 each
             + [("x", "y"), ("y", "z"), ("x", "z")]         # triangle: 1
             + list(itertools.combinations("pqrs", 2)))     # K4: 3 each
    edges = rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string()),
    }))
    got = (triangle_counts(edges).to_pandas()
           .set_index("node")["triangles"].to_dict())
    want = {"a": 0, "b": 0, "c": 0, "x": 1, "y": 1, "z": 1,
            "p": 3, "q": 3, "r": 3, "s": 3}
    assert got == want


def test_events_mode_type_mirror(sf_small):
    import duckdb

    from deduplicator_ray.pipelines import queries as q

    eng = q.events_mode_type(sf_small)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_small}/events.parquet')")
    orc = con.execute(q.EVENTS_MODE_TYPE_SQL).df()
    cols = list(eng.columns)
    assert cols == list(orc.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        eng.sort_values(cols).reset_index(drop=True),
        orc.sort_values(cols).reset_index(drop=True))
    assert (eng["n"] >= 1).all()


def test_docs_bow_dedup_mirror(sf_small):
    import duckdb

    from deduplicator_ray.pipelines import queries as q

    eng = q.docs_bow_dedup(sf_small)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    orc = con.execute(q.DOCS_BOW_DEDUP_SQL).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), orc.reset_index(drop=True))
    # the canonical key must catch re-ordered duplicates exact text misses
    assert (eng["group_n"] > 1).any()
    assert (eng["action"] == "drop").any()


def test_pack_layout_mirror(sf_small, con_docs):
    """GPT-style sequence-packing layout: per-lang concat order, split
    every PACK_TOKENS — docs straddle context boundaries."""
    eng = q.docs_pack_layout(sf_small)
    orc = con_docs.execute(q.DOCS_PACK_LAYOUT_SQL).df()
    _match(eng, orc)
    # non-vacuity: both straddling and non-straddling docs occur
    assert set(eng["straddles"]) == {0, 1}
    # chaining invariant: docs tile the packed stream, so the next doc's
    # first_chunk is the previous doc's last_chunk (prev ends mid-window)
    # or last_chunk+1 (prev ends exactly on a window boundary)
    s = eng.sort_values(["lang", "doc_id"])
    prev_last = s.groupby("lang")["last_chunk"].shift()
    delta = s["first_chunk"] - prev_last
    assert delta.dropna().isin([0, 1]).all()


def test_rarity_score_mirror(sf_small, con_docs):
    """Corpus-frequency quality signal: per-doc Σ/min of global unigram
    counts must value-match the unnest+join mirror (integer-exact)."""
    eng = q.docs_rarity_score(sf_small)
    orc = con_docs.execute(q.DOCS_RARITY_SCORE_SQL).df()
    _match(eng, orc)
    # non-vacuity: the fixture exercises varying token frequencies
    assert len(eng) > 0
    assert eng["min_freq"].nunique() >= 2
    assert (eng["min_freq"] * eng["n_tokens"] <= eng["sum_freq"]).all()


def test_rarity_strategies_agree(sf_small):
    """The token-co-location exchange (scale path, default) and the
    vocab-broadcast fast path must be value-identical."""
    import pandas as pd

    a = q.docs_rarity_score(sf_small, strategy="exchange")
    b = q.docs_rarity_score(sf_small, strategy="broadcast")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_rarity_broadcast_refuses_big_vocab(sf_small, con_docs, monkeypatch):
    """Above the cap the broadcast path must never ray.put the vocab —
    it falls through to the exchange and stays mirror-correct."""
    import ray as _ray

    class _NoPut:
        def __getattr__(self, name):
            if name == "put":
                raise AssertionError("ray.put of an over-cap vocabulary")
            return getattr(_ray, name)

    monkeypatch.setattr(q, "_RARITY_BROADCAST_CAP", 1)
    monkeypatch.setattr(q, "ray", _NoPut())
    eng = q.docs_rarity_score(sf_small, strategy="broadcast")
    orc = con_docs.execute(q.DOCS_RARITY_SCORE_SQL).df()
    _match(eng, orc)


def test_source_cap_mirror(sf_small, con_docs):
    """Per-source quota: ≤ k rows per source, ranked n_chars desc."""
    eng = q.docs_source_cap(sf_small)
    orc = con_docs.execute(q.DOCS_SOURCE_CAP_SQL).df()
    _match(eng, orc)
    assert (eng.groupby("source")["rank"].max() <= 10).all()
    per = eng.groupby("source")["n_chars"]
    assert all(g.is_monotonic_decreasing for _, g in per)


def test_lang_length_gate_mirror(sf_small, con_docs):
    """Per-lang bottom-decile length gate must value-match the rank-window
    mirror, including boundary-value tie resolution by doc_id."""
    eng = q.docs_lang_length_gate(sf_small)
    orc = con_docs.execute(q.DOCS_LANG_LENGTH_GATE_SQL).df()
    _match(eng, orc)
    # non-vacuity: both actions occur, and per lang the drop count is
    # exactly n // 10
    assert set(eng["action"]) == {"keep", "drop"}
    per = eng.groupby("lang").agg(n=("doc_id", "size"),
                                  d=("action", lambda s: (s == "drop").sum()))
    assert (per["d"] == per["n"] * 10 // 100).all()


def test_lang_length_gate_null_lang_partition(sf_small):
    """NULL-lang docs form their own gated partition exactly like the
    mirror's PARTITION BY lang (a pandas dropna groupby would silently
    exempt them — the review-confirmed divergence this pins)."""
    import tempfile

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "lang": pa.array(["en"] * 10 + [None] * 10, pa.string()),
        "text": [" ".join(["w"] * (i + 1)) for i in range(20)],
    })
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(t, f"{td}/documents.parquet")
        eng = q.docs_lang_length_gate(td)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{td}/documents.parquet')")
        orc = con.execute(q.DOCS_LANG_LENGTH_GATE_SQL).df()
    _match(eng, orc)
    nulls = eng[eng["lang"].isna()]
    assert len(nulls) == 10 and (nulls["action"] == "drop").sum() == 1


def test_docs_dedup_tiers_mirror(sf_small, con_docs):
    """Tiered dedup cascade over the augmented doc relation: cheapest
    binding tier (exact → reordered → near → unique) and its group-minimum
    dup_of value-match the SQL re-derivation; every tier fires (exact via
    the deterministic %37 copies, reordered via bag-equal shuffles, near
    via Jaccard components)."""
    eng = q.docs_dedup_tiers(sf_small)
    orc = con_docs.execute(q.DOCS_DEDUP_TIERS_SQL).df()
    _match(eng, orc)
    assert set(eng["tier"]) == {"exact", "reordered", "near", "unique"}
    # keeper invariant: dup_of == own id exactly for the unique tier
    assert ((eng["dup_of"] == eng["doc_id"])
            == (eng["tier"] == "unique")).all()
    # every injected copy resolves: its original (or a smaller group member)
    # is its dup_of at the exact tier
    copies = eng[eng["doc_id"].astype(int) >= 1_000_000]
    assert len(copies) > 0 and (copies["tier"] != "unique").any()


def test_docs_dedup_tiers_report_mirror(sf_small, con_docs):
    eng = q.docs_dedup_tiers_report(sf_small)
    orc = con_docs.execute(q.DOCS_DEDUP_TIERS_REPORT_SQL).df()
    _match(eng, orc)
    full = q.docs_dedup_tiers(sf_small)
    assert eng["n_docs"].sum() == len(full)
    assert eng["n_chars"].sum() == full["n_chars"].sum()


def test_group_codes_narrow_and_unsigned_int_keys(ray_session):
    """drop_duplicates on (int32, int32) and (int64, uint64) key tuples
    must group exactly — the int fast path casts safely and falls back
    to the string path for values it cannot represent (review-found
    ArrowInvalid crash on narrow int keys)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicator_ray.stages.partitioned import drop_duplicates

    t32 = pa.table({
        "a": pa.array([1, 1, 2, 2, 1], pa.int32()),
        "b": pa.array([7, 7, 8, 8, 9], pa.int32()),
        "v": pa.array(list(range(5)), pa.int64()),
    })
    out = drop_duplicates(rd.from_arrow(t32), ["a", "b"]).to_pandas()
    assert sorted(map(tuple, out[["a", "b"]].itertuples(index=False))) == \
        [(1, 7), (1, 9), (2, 8)]
    big = (1 << 63) + 5  # unrepresentable in int64 → string-path fallback
    tu = pa.table({
        "a": pa.array([1, 1, 2], pa.int64()),
        "b": pa.array([big, big, big], pa.uint64()),
    })
    out2 = drop_duplicates(rd.from_arrow(tu), ["a", "b"]).to_pandas()
    assert len(out2) == 2
