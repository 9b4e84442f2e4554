#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential check.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same tables,
sorts columns by name, and compares shape, dtypes and values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = norm(pd.read_parquet(f"{outdir}/{name}"))
            duck_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        problems = []
        if spark_df.shape != duck_df.shape:
            problems.append(f"shape {spark_df.shape} != {duck_df.shape}")
        elif list(spark_df.columns) != list(duck_df.columns):
            problems.append(f"cols {list(spark_df.columns)} != {list(duck_df.columns)}")
        else:
            for c in spark_df.columns:
                if str(spark_df[c].dtype) != str(duck_df[c].dtype):
                    problems.append(f"dtype[{c}] {spark_df[c].dtype} != {duck_df[c].dtype}")
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df,
                                              check_dtype=False, check_exact=True)
            except AssertionError as e:
                # check order-insensitive too, to localize the issue
                s2 = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
                d2 = duck_df.sort_values(list(duck_df.columns)).reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(s2, d2, check_dtype=False,
                                                  check_exact=True)
                    problems.append("values match only after row sort (ORDER mismatch)")
                except AssertionError:
                    problems.append("value mismatch: " + str(e).splitlines()[-1][:200])
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} oracle queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
