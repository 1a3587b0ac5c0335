#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Registers each parquet table, runs every oracle_sql.json entry, compares
to the Spark-written parquet per query: row count, sorted-column names,
and value hash (doubles rounded to 9 significant digits to mimic a
tolerant compare; also reports exact-bit mismatch separately).
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-len('.parquet')]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for q, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{q}"
    if not os.path.isdir(spark_dir):
        print(f"{q}: MISSING spark output"); fails.append(q); continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{q}: ORACLE SQL ERROR: {e}"); fails.append(q); continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    oc, sc = sorted(odf.columns), sorted(sdf.columns)
    if oc != sc:
        print(f"{q}: SCHEMA mismatch oracle={oc} spark={sc}")
        fails.append(q); continue
    if len(odf) != len(sdf):
        print(f"{q}: ROWS mismatch oracle={len(odf)} spark={len(sdf)}")
        fails.append(q); continue
    o = odf[oc].sort_values(by=oc).reset_index(drop=True)
    s = sdf[oc].sort_values(by=oc).reset_index(drop=True)
    exact = True
    for c in oc:
        if o[c].dtype != s[c].dtype:
            # tolerate int32/int64 style diffs but report
            print(f"{q}: dtype diff col {c}: oracle={o[c].dtype} spark={s[c].dtype}")
        try:
            import pandas as pd
            if not o[c].equals(s[c]):
                # check with rounding for floats
                if o[c].dtype.kind == 'f':
                    import numpy as np
                    if np.allclose(o[c], s[c], rtol=1e-9, atol=1e-12, equal_nan=True):
                        print(f"{q}: col {c} differs in last bits only")
                        exact = False
                        continue
                print(f"{q}: VALUE mismatch col {c}")
                diff = (o[c] != s[c])
                print("  oracle:", o[c][diff].head(3).tolist())
                print("  spark :", s[c][diff].head(3).tolist())
                fails.append(q)
                exact = False
                break
        except Exception as e:
            print(f"{q}: compare error {c}: {e}"); fails.append(q); break
    else:
        print(f"{q}: OK rows={len(odf)}" + ("" if exact else " (inexact)"))
print()
print(f"{len(set(fails))} failing: {sorted(set(fails))}")
