#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>
For each <name>.parquet dir in verifyOutDir with an entry in oracle_sql.json:
run the SQL in DuckDB against the sfDir tables, canonicalize both frames
(sort columns by name, sort rows, round floats), and compare hashes.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

sfdir, outdir = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == float:
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).values.tolist())
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()

fails = 0
for name in sorted(oracles):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"{name}: MISSING spark result"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"{name}: SCHEMA MISMATCH spark={sc} duck={dc}"); fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"{name}: ROWCOUNT {len(spark_df)} vs {len(duck_df)}"); fails += 1; continue
    hs, hd = canon(spark_df), canon(duck_df)
    if hs != hd:
        print(f"{name}: HASH MISMATCH ({len(spark_df)} rows)"); fails += 1
        m = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        print("  spark head:", m.sort_values(list(m.columns)).head(3).values.tolist())
        print("  duck  head:", d.sort_values(list(d.columns)).head(3).values.tolist())
    else:
        print(f"{name}: OK ({len(spark_df)} rows)")
sys.exit(1 if fails else 0)
