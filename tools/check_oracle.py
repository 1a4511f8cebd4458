#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify parquet
dumps against DuckDB oracle SQL on the same sf dir. Not shipped code — a
dev tool (driver-side python/duckdb are available in this container)."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if "." not in d.split("/")[-1])

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form per cell
    return df.astype(str)

n_ok = n_bad = 0
for name in names:
    try:
        mine = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: cannot read my output: {e}"); n_bad += 1; continue
    if name not in oracle:
        print(f"ROWS-ONLY {name}: rows={len(mine)}" + (" (EMPTY!)" if len(mine) == 0 else ""))
        continue
    try:
        ref = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:160]}"); n_bad += 1; continue
    a, b = canon(mine), canon(ref)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_bad += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_bad += 1; continue
    eq_ordered = a.reset_index(drop=True).equals(b.reset_index(drop=True))
    if eq_ordered:
        print(f"OK   {name}: {len(a)} rows (ordered match)"); n_ok += 1
    else:
        a2 = a.sort_values(list(a.columns)).reset_index(drop=True)
        b2 = b.sort_values(list(b.columns)).reset_index(drop=True)
        if a2.equals(b2):
            print(f"WARN {name}: {len(a)} rows match only after row sort"); n_ok += 1
        else:
            diff = (a2 != b2).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, e.g.:")
            for i in idx:
                print(f"  mine: {a2.loc[i].to_dict()}")
                print(f"  ref : {b2.loc[i].to_dict()}")
            n_bad += 1
print(f"\n{n_ok} ok, {n_bad} bad, {len(names)} total dumps, {len(oracle)} oracles")
