#!/usr/bin/env python3
"""Compare two Verify output dirs for VALUE identity (determinism proof).

Usage: dualrun.py DIR_A DIR_B
For every query present in both dirs, loads both parquet results and
diffs them with DuckDB EXCEPT ALL in both directions (order-free,
duplicate-sensitive). Exit code = number of divergent queries.
"""
import sys
import duckdb


def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    import os
    names = sorted(
        n for n in os.listdir(a)
        if os.path.isdir(os.path.join(a, n)) and os.path.isdir(os.path.join(b, n))
    )
    con = duckdb.connect()
    bad = 0
    for n in names:
        pa, pb = f"{a}/{n}/*.parquet", f"{b}/{n}/*.parquet"
        try:
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{pb}'))").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{pa}'))").fetchone()[0]
        except Exception as e:  # schema mismatch etc. is also a divergence
            print(f"DIVERGED {n}: {e}")
            bad += 1
            continue
        if d1 or d2:
            print(f"DIVERGED {n}: {d1} rows only in A, {d2} only in B")
            bad += 1
    print(f"{len(names)} queries compared, {bad} divergent")
    return bad


if __name__ == "__main__":
    sys.exit(main())
