#!/usr/bin/env python3
"""Byte-level determinism diff of two graft.Verify output dirs.

Usage:
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/v1 2>/dev/null
  SPARK_GRAFT_CPUS=2 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/v2 2>/dev/null
  python3 tools/det_diff.py /tmp/v1 /tmp/v2

Compares every per-key parquet output as a multiset (EXCEPT ALL both ways in
DuckDB), so a key whose result depends on master/core count, partitioning, or
shuffle order shows up as a DIFF. Exit code 1 if any key differs.
"""
import os
import sys

import duckdb


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = sys.argv[1], sys.argv[2]

    def dirs(root):
        return {d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))}

    # union of both sides: a run that crashed midway (or an older build
    # missing a key) must surface as DIFF, not be silently skipped
    ka, kb = dirs(a), dirs(b)
    keys = sorted(ka | kb)
    con = duckdb.connect()
    bad = []
    for k in keys:
        if k not in ka or k not in kb:
            bad.append((k, f"present only in {'B' if k not in ka else 'A'}"))
            continue
        try:
            n = con.execute(f"""
              SELECT count(*) FROM (
                (SELECT * FROM '{a}/{k}/*.parquet' EXCEPT ALL
                 SELECT * FROM '{b}/{k}/*.parquet')
                UNION ALL
                (SELECT * FROM '{b}/{k}/*.parquet' EXCEPT ALL
                 SELECT * FROM '{a}/{k}/*.parquet'))""").fetchone()[0]
            if n:
                bad.append((k, f"{n} differing rows"))
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            bad.append((k, str(e).splitlines()[0][:120]))
    print(f"{len(keys)} keys compared, {len(bad)} differ")
    for k, msg in bad:
        print(f" DIFF {k}: {msg}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
