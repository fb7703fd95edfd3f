#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <name> parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views over the
same sfDir), sorts columns by name and rows by all columns, and compares
cell values (exact for non-floats, tiny epsilon report for floats).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA col-names spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xe, ye = x, y
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return (f"VALUE col={c} row={i}: spark={x!r} oracle={y!r} "
                            f"diff={abs(x-y)!r}")
            else:
                xs, ys = str(x), str(y)
                if xs != ys:
                    return f"VALUE col={c} row={i}: spark={x!r} oracle={y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail, noracle = [], [], []
    import glob, os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    for name in names:
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in
                 sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            fail.append((name, f"READ {e}"))
            continue
        if name not in oracle_sql:
            noracle.append((name, len(spark_df)))
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            fail.append((name, f"ORACLE-SQL {e}"))
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            fail.append((name, err))
        else:
            ok.append(name)
    print(f"== OK ({len(ok)}): {' '.join(ok)}")
    for name, rows in noracle:
        print(f"== ROWS-ONLY {name}: {rows} rows")
    for name, err in fail:
        print(f"== FAIL {name}: {err}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
