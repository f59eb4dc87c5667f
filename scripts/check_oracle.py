#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness pass (dev tool only — the
shipped library has no Python dependency).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
and compares row count, sorted-by-name schema, and value hashes.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to us precision
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def connect(sf_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        # fresh connection per oracle: one shared connection accumulates
        # buffer-pool state across 270+ queries, and after a heavy sf0.1
        # CTE every later query dies on kilobyte allocations ("Out of
        # Memory Error: Failed to allocate block") with >100 GB free --
        # the view setup is microseconds, the isolation is what matters
        con = connect(sf_dir)
        spark_dir = os.path.join(out_dir, name)
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(
                glob.glob(os.path.join(spark_dir, "*.parquet")))],
                ignore_index=True))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        finally:
            con.close()
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: schema {list(got.columns)} != "
                  f"{list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # Driver parity: the driver's hash is dtype-sensitive, so the
        # local replica must be at least as strict (the q_heavy r11
        # HUGEINT->float64 lesson). Fail on any dtype divergence.
        dmis = [(c, str(got[c].dtype), str(want[c].dtype))
                for c in got.columns
                if str(got[c].dtype) != str(want[c].dtype)]
        if dmis:
            print(f"FAIL {name}: dtypes differ (spark vs oracle) {dmis}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                          check_exact=True)
            print(f"OK   {name}: {len(got)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:2000]}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
