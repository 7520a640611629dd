"""Simulate the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
schema (column names) and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [--only name1,name2]
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(6).astype("float64")
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main():
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from auctus_spark.session import get_spark

    spark = get_spark("check_entry", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if only is None:
        print("== entry() smoke ==")
        df = entry.entry(spark)
        n = df.count()
        print(f"entry rows={n} schema={df.columns}")
        assert n >= 0

    oracles = entry.oracle_sql()
    failed = []
    for name, fn in entry.queries().items():
        if only is not None and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            sql = oracles.get(name)
            if sql is None:
                print(f"  {name:28} rows-only rows={len(got)}")
                continue
            want = con.sql(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(
                    f"schema mismatch {list(g.columns)} vs {list(w.columns)}")
            if len(g) != len(w):
                raise AssertionError(f"row count {len(g)} vs {len(w)}")
            if not g.equals(w):
                diff = (g != w)
                bad = diff.any(axis=1)
                raise AssertionError(
                    "value mismatch, first diffs:\n"
                    f"spark:\n{g[bad].head(3)}\nduckdb:\n{w[bad].head(3)}")
            print(f"  {name:28} OK rows={len(g)}")
        except Exception as e:
            failed.append(name)
            print(f"  {name:28} FAIL: {e}")
    if failed:
        print(f"\nFAILED: {failed}")
        sys.exit(1)
    print("\nALL QUERIES MATCH ORACLE")


if __name__ == "__main__":
    main()
