"""Local pre-validation of the driver's correctness gate: run every
queries() entry and, where an oracle_sql() mirror exists, compare
row-count + schema + order-insensitive values against DuckDB at sf0.01.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col], b[col]
            # the driver's value hash is dtype-sensitive (int64 vs DuckDB
            # decimal128 object columns hash differently even when values
            # print the same) — flag any dtype divergence, don't paper over
            # it with astype(str)
            if av.dtype != bv.dtype:
                problems.append(
                    f"col {col}: dtype mismatch ray={av.dtype} sql={bv.dtype}")
                continue
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                if not np.allclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                    bad = np.where(~np.isclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9))[0][:3]
                    problems.append(f"col {col}: float mismatch at rows {bad.tolist()} ray={av.iloc[bad].tolist()} sql={bv.iloc[bad].tolist()}")
            else:
                if not (av.astype(str).values == bv.astype(str).values).all():
                    bad = np.where(av.astype(str).values != bv.astype(str).values)[0][:3]
                    problems.append(f"col {col}: mismatch at rows {bad.tolist()} ray={av.iloc[bad].tolist()} sql={bv.iloc[bad].tolist()}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in sqls:
            sql_df = con.sql(sqls[name]).df()
            problems = compare(name, ray_df, sql_df)
            if problems:
                failures += 1
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            else:
                print(f"OK   {name} ({dt:.1f}s): {len(ray_df)} rows match oracle")
        else:
            print(f"OK*  {name} ({dt:.1f}s): {len(ray_df)} rows (rows-only)")
    print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
