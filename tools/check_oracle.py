#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (written by graft.Verify):
  - load the Spark result parquet
  - run oracleSql[name] (from verifyOutDir/oracle_sql.json) in DuckDB with
    views over the same sfDir parquet tables
  - sort columns by name, sort rows, compare cell-by-cell (exact; floats
    reported with max abs diff)

Dev tool only — not part of the library (driver-side python env).
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes that differ only in representation
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, spark_df, duck_df):
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        return f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"FAIL {name}: rows spark={len(s)} duck={len(d)}"
    worst = 0.0
    for c in s.columns:
        a, b = s[c], d[c]
        # the driver hashes values with their dtypes: int64 vs float64 is a
        # mismatch even when values are numerically equal (bit us in r2 on
        # DuckDB sum(BIGINT)->HUGEINT->float64) — flag it here too
        if pd.api.types.is_integer_dtype(a) != pd.api.types.is_integer_dtype(b):
            return (f"FAIL {name}: col {c} dtype mismatch "
                    f"spark={a.dtype} duck={b.dtype} (driver hash-compares dtypes)")
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa = a.astype(float).to_numpy()
            bb = b.astype(float).to_numpy()
            bad = [(x, y) for x, y in zip(aa, bb)
                   if not (x == y or (math.isnan(x) and math.isnan(y)))]
            if bad:
                diff = max(abs(x - y) for x, y in bad)
                worst = max(worst, diff)
                if diff > 0:
                    return (f"FAIL {name}: col {c} {len(bad)} float mismatches, "
                            f"max abs diff {diff:.3e}; first: {bad[0]}")
        else:
            neq = (a.astype(str) != b.astype(str))
            if neq.any():
                i = neq.idxmax()
                return (f"FAIL {name}: col {c} {int(neq.sum())} mismatches; "
                        f"first at row {i}: spark={a[i]!r} duck={b[i]!r}")
    return f"OK   {name}: {len(s)} rows, {len(s.columns)} cols exact-match"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        msg = compare(name, spark_df, duck_df)
        print(msg)
        if msg.startswith("FAIL"):
            failures += 1
    extra = [q for q in glob.glob(f"{out_dir}/*/") if
             q.rstrip("/").rsplit("/", 1)[-1] not in oracle]
    for q in extra:
        print(f"NOTE {q}: spark output without oracle (rows-only check)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
