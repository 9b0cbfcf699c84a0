#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: run Verify's parquet dumps against
DuckDB oracle SQL on the same test tables and diff value-for-value.

Usage: python3 tools/oracle_diff.py <sfDir> <verifyOutDir> [key ...]

Dev tooling only — NOT part of the shipped library (the driver has its own
copy of this logic; this exists so parity breaks surface before handing off).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        qdir = os.path.join(out_dir, key)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"[MISS] {key}: no spark output");  n_bad += 1;  continue
        try:
            spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {key}: {e}");  n_bad += 1;  continue
        # driver semantics: sort columns by name, then compare values
        spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
        duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1)
        for c in spark_df.columns:
            if c in duck_df.columns and str(spark_df[c].dtype) != str(duck_df[c].dtype):
                print(f"[TYPE] {key}.{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"[COLS] {key}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1;  continue
        if len(spark_df) != len(duck_df):
            print(f"[ROWS] {key}: spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1;  continue
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            def cell_eq(x, y):
                import pandas as pd
                try:
                    if pd.isna(x) and pd.isna(y):
                        return True
                except (ValueError, TypeError):
                    pass
                try:
                    r = (x == y)
                    if hasattr(x, "__len__"):  # arrays/lists: elementwise
                        return len(x) == len(y) and bool(getattr(r, "all", lambda: r)())
                    return bool(r)  # scalars: trust == (0.0 == -0.0 is True)
                except Exception:
                    pass
                return str(x) == str(y)
            bad = [i for i in range(len(a)) if not cell_eq(a.iloc[i], b.iloc[i])]
            if bad:
                i = bad[0]
                mismatch = (c, f"row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r} ({len(bad)} diffs)")
                break
        if mismatch:
            print(f"[DIFF] {key}: col {mismatch[0]} {mismatch[1]}");  n_bad += 1
        else:
            print(f"[ OK ] {key}: {len(spark_df)} rows");  n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
