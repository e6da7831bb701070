#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from `outDir/oracle_sql.json` in DuckDB over the testdata
parquet tables, loads the Spark result parquet written by graft.Verify, and
compares: column names, row counts, and exact value sets (columns sorted by
name, rows sorted by all columns). Dev tool only — not part of the library.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys
import glob

import duckdb


def normalize(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            # not dumped (SPARK_GRAFT_VERIFY_ONLY subset run) — skip quietly
            n_skip += 1
            continue
        try:
            got = normalize(con.sql(f"SELECT * FROM '{spark_glob}'"))
            want = normalize(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        dt_g, dt_w = list(map(str, got.dtypes)), list(map(str, want.dtypes))
        if dt_g != dt_w:
            print(f"FAIL {name}: dtypes {dt_g} != {dt_w}")
            n_fail += 1
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print(got[bad].head(3))
            print(want[bad].head(3))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    skipped = f", {n_skip} skipped (not dumped)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
