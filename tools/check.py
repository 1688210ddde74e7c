#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Runs each oracle SQL from <outDir>/oracle_sql.json against DuckDB views over
the sf parquet tables, reads the Spark result parquet from <outDir>/<name>/,
sorts columns by name, and compares row counts, schemas (loosely), and values
(exactly). Usage: tools/check.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.astype(object).where(pd.notna(a), None) ==
                      b.astype(object).where(pd.notna(b), None)) | (pd.isna(a) & pd.isna(b))
            except Exception as e:
                bad = (c, f"compare error {e}"); break
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, f"row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} "
                          f"({int((~eq).sum())}/{len(a)} mismatched)")
                break
        if bad:
            print(f"FAIL {name}: col {bad[0]} {bad[1]}"); n_fail += 1
        else:
            # note dtype drift (driver may be stricter)
            dd = [f"{c}:{got[c].dtype}!={want[c].dtype}" for c in got.columns
                  if str(got[c].dtype) != str(want[c].dtype)]
            note = f"  [dtype drift: {', '.join(dd)}]" if dd else ""
            print(f"PASS {name} ({len(got)} rows){note}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
