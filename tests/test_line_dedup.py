"""CCNet-style cross-document line dedup: engine-vs-DuckDB value check
(the driver runs the same comparison at sf0.01) plus semantic invariants —
a line is removed iff its exact content spans >= 2 distinct docs and is
non-empty; within-doc repeats alone never qualify; reconstruction
preserves kept-line order."""

import duckdb
import numpy as np
import pandas as pd

from deduplicator_ray import fixtures
from deduplicator_ray.pipelines import queries as q


def _mirror(sql: str, sf_dir: str) -> pd.DataFrame:
    lines = fixtures.docs_lines_path(sf_dir) + "/*.parquet"
    return duckdb.sql(sql.replace("{lines}", lines)).df()


def _assert_value_equal(eng: pd.DataFrame, orc: pd.DataFrame):
    assert list(eng.columns) == list(orc.columns)
    assert [str(t) for t in eng.dtypes] == [str(t) for t in orc.dtypes]
    cols = list(eng.columns)
    a = eng.sort_values(cols).reset_index(drop=True)
    b = orc.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_line_dedup_mirror(sf_small):
    eng = q.docs_line_dedup(sf_small)
    orc = _mirror(q.DOCS_LINE_DEDUP_SQL, sf_small)
    _assert_value_equal(eng, orc)
    # non-vacuous in both directions: some lines removed, some kept
    assert eng["n_removed"].sum() > 0
    assert (eng["n_lines"] - eng["n_removed"]).sum() > 0


def test_boilerplate_lines_mirror(sf_small):
    eng = q.docs_boilerplate_lines(sf_small)
    orc = _mirror(q.DOCS_BOILERPLATE_LINES_SQL, sf_small)
    _assert_value_equal(eng, orc)
    # the injected boilerplate dictionary is fully recovered
    boiler = set(fixtures._BOILERPLATE_LINES)
    assert boiler <= set(eng["line"])
    assert (eng["n_docs"] >= 2).all()
    assert (eng["n_copies"] >= eng["n_docs"]).all()


def test_line_dedup_semantics(sf_small):
    """Clean text of every doc contains no cross-doc duplicated line, and
    every removed count reconciles with the boilerplate relation."""
    dedup = q.docs_line_dedup(sf_small).set_index("doc_id")
    dup_lines = set(q.docs_boilerplate_lines(sf_small)["line"])
    src = pd.read_parquet(
        fixtures.docs_lines_path(sf_small) + "/docs_lines.parquet")
    for _, row in src.sample(50, random_state=7).iterrows():
        lines = row["text"].split("\n")
        kept = [l for l in lines if not (l and l in dup_lines)]
        got = dedup.loc[row["doc_id"]]
        assert got["n_lines"] == len(lines)
        assert got["n_removed"] == len(lines) - len(kept)
        assert got["clean_text"] == "\n".join(kept)
    # empty lines survive (never counted as duplicates)
    has_empty = src[src["text"].str.contains("\n\n", regex=False)]
    assert len(has_empty) > 0
    did = int(has_empty["doc_id"].iloc[0])
    assert "" in dedup.loc[did, "clean_text"].split("\n")
