#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB (tables =
views over the sf parquet dir), loads the Spark result parquet written by
graft.Verify, sorts columns by name and rows by all columns, and compares.

Usage: python3 tools/localcheck.py <sfdir> <outdir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # an in-memory connection cannot spill without a temp dir, so a
    # big-fixture check dies on OOM instead of honestly spilling
    con.execute("SET temp_directory = '/tmp/duck_spill'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            oracle_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}"); n_fail += 1; continue
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(oracle_df)}")
            n_fail += 1; continue
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], oracle_df[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    aa, bb = a.astype(float), b.astype(float)
                    mism = ~(np.isclose(aa, bb, rtol=0, atol=1e-9) | (aa.isna() & bb.isna()))
                else:
                    mism = ~((a == b) | (a.isna() & b.isna()))
            except Exception as e:
                bad = (c, f"compare error {e}"); break
            if mism.any():
                i = mism.idxmax()
                bad = (c, f"row {i}: spark={a[i]!r} oracle={b[i]!r} ({int(mism.sum())} mismatches)")
                break
        if bad:
            print(f"FAIL {name}: col {bad[0]} {bad[1]}"); n_fail += 1
        else:
            # exact-hash style check too: stringify and hash
            exact = (spark_df.astype(str).values == oracle_df.astype(str).values).all()
            tag = "PASS" if exact else "PASS~"  # PASS~ = tolerance-only match
            print(f"{tag} {name}: {len(spark_df)} rows")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
