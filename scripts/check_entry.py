"""Simulate the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
schema (column names) and order-insensitive values.

With ``--json PATH`` it also writes a driver-format artifact (one row
per query: rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err, ``err="no_oracle"`` for rows-only entries) so every
gate has a committed correctness row even when the driver's own
CORRECTNESS file lists a frozen subset of the queries.

Usage: python scripts/check_entry.py [sf_dir] [--only name1,name2]
                                     [--json CORRECTNESS_LOCAL_rN.json]
"""

import json
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
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
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
    rows = {}
    for name, fn in entry.queries().items():
        if only is not None and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            sql = oracles.get(name)
            if sql is None:
                rows[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": len(got),
                              "oracle_rows": None, "err": "no_oracle"}
                print(f"  {name:28} rows-only rows={len(got)}")
                continue
            want = con.sql(sql).df()
            g, w = normalize(got), normalize(want)
            rows[name] = {
                "rows_match": len(g) == len(w),
                "schema_match": list(g.columns) == list(w.columns),
                "hash_match": (list(g.columns) == list(w.columns)
                               and g.equals(w)),
                "spark_rows": len(g), "oracle_rows": len(w), "err": None}
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
            rows.setdefault(name, {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": None})
            rows[name]["err"] = rows[name]["err"] or str(e)[:300]
            print(f"  {name:28} FAIL: {e}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {json_out} ({len(rows)} rows)")
    if failed:
        print(f"\nFAILED: {failed}")
        sys.exit(1)
    print("\nALL QUERIES MATCH ORACLE")


if __name__ == "__main__":
    main()
