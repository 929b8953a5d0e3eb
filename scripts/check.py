#!/usr/bin/env python3
"""Local pre-verification of SparkEntry oracles, mirroring the driver's
t2 gate: run graft.Verify output against DuckDB on the same parquet.

Usage: python3 scripts/check.py [sfDir] [outDir]
(Dev tool only — uses driver-side python/duckdb, NOT part of the library.)
"""
import glob, json, sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        fails += 1
        continue
    # The driver's hash is DTYPE-SENSITIVE (pandas values are hashed as
    # materialized: int64 1 != float64 1.0). A DuckDB HUGEINT aggregate
    # materializing as float64 against Spark's int64 must FAIL here like
    # it fails in the driver gate (the r5 q_gaps/q_profile escape).
    dtype_mismatch = [c for c in got.columns
                      if got[c].dtype.kind != want[c].dtype.kind]
    if dtype_mismatch:
        print(f"FAIL {name}: dtype mismatch in "
              f"{[(c, str(got[c].dtype), str(want[c].dtype)) for c in dtype_mismatch]}")
        fails += 1
        continue
    diff_cols = []
    for c in got.columns:
        g, w = got[c], want[c]
        try:
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                ok = ((g.isna() & w.isna()) | (g == w)).all()
            else:
                ok = g.astype(str).equals(w.astype(str))
        except Exception:
            ok = g.astype(str).equals(w.astype(str))
        if not ok:
            diff_cols.append(c)
    if diff_cols:
        print(f"FAIL {name}: value mismatch in {diff_cols}")
        for c in diff_cols[:2]:
            m = (got[c].astype(str) != want[c].astype(str))
            print(pd.concat([got[m].head(3).add_suffix("_spark"),
                             want[m].head(3).add_suffix("_duck")], axis=1)
                  .to_string())
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")

uncovered = [d.split("/")[-1] for d in glob.glob(f"{OUT}/*")
             if "/oracle_sql" not in d and d.split("/")[-1] not in oracle]
if uncovered:
    print(f"rows-only (no oracle): {sorted(uncovered)}")
print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
