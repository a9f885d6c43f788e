"""Self-check: run every __spark_entry__ query against its DuckDB oracle
at sf0.01 (mirrors the driver's CORRECTNESS gate).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
Compares row count, column names/dtypes, and order-insensitive values.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from montecarlopagerank_spark.session import get_spark

    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    # 32 threads makes DuckDB's unrolled-CTE oracles OOM on tiny (260KB)
    # block allocations on this host even with 100G free; 8-16 is stable
    con.execute("SET threads=8")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows (rows-only, no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        a, b = canon(spdf), canon(odf)
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: cols {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=True
            )
            print(f"OK    {name}: {len(a)} rows")
        except AssertionError as ex:
            print(f"FAIL  {name}: values differ: {str(ex)[:400]}")
            n_fail += 1
    spark.stop()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
