#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name + rows by value, and compare exactly (hash-equivalent).
Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    # driver semantics: sort columns by name, then hash values
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"{name}: SCHEMA NAMES {scols} vs {ocols}"); fails += 1; continue
    sdf, odf = sdf[scols], odf[ocols]
    if len(sdf) != len(odf):
        print(f"{name}: ROWS {len(sdf)} vs {len(odf)}"); fails += 1; continue
    stypes, otypes = [str(t) for t in sdf.dtypes], [str(t) for t in odf.dtypes]
    sdf = sdf.sort_values(scols, kind="mergesort").reset_index(drop=True)
    odf = odf.sort_values(ocols, kind="mergesort").reset_index(drop=True)
    try:
        eq = sdf.equals(odf)
        if not eq:
            # detailed diff
            for c in scols:
                if not sdf[c].equals(odf[c]):
                    mask = ~(sdf[c].eq(odf[c]) | (sdf[c].isna() & odf[c].isna()))
                    n = int(mask.sum())
                    if n:
                        i = mask.idxmax()
                        print(f"{name}: COL {c} differs in {n} rows "
                              f"(e.g. {sdf[c][i]!r} vs {odf[c][i]!r}; "
                              f"dtypes {sdf[c].dtype} vs {odf[c].dtype})")
            if stypes != otypes:
                print(f"{name}: DTYPES {list(zip(scols, stypes, otypes))}")
            fails += 1
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    except Exception as e:
        print(f"{name}: COMPARE ERROR {e}"); fails += 1
print(f"\n{'FAIL' if fails else 'PASS'}: {len(oracle) - fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
