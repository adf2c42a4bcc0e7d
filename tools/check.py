#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the same parquet tables,
compares against the Spark result parquet: row count, column names
(sorted), and a hash of all values (rows sorted, columns sorted by name).
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify values deterministically
    def cell(v):
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    s = df.apply(lambda col: col.map(cell))
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

def digest(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()[:16]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            import time
            t0 = time.time()
            duck_df = con.execute(oracles[name]).fetchdf()
            dt = time.time() - t0
            a, b = norm(spark_df), norm(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1
            elif digest(a) != digest(b):
                print(f"FAIL {name}: hash mismatch ({len(a)} rows)")
                merged = a.merge(b, how="outer", indicator=True)
                diff = merged[merged._merge != "both"]
                print(diff.head(6).to_string())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows, duckdb {dt:.1f}s)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
