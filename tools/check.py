#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check.py <verify_out_dir> <sf_dir> [query ...]

Reads oracle_sql.json from the verify output dir, registers the 10
parquet tables as DuckDB views (bare table names, as in the driver's
contract example), runs each oracle SQL, and compares against the
Spark-written parquet for that query: same row count, same column-name
set, and exact value equality with columns sorted by name (mimicking
the driver's sorted-column hash). Exit code = number of failing queries.
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def atype(t: pa.DataType) -> str:
    """Normalized Arrow type label. Timestamp unit and small/large string
    and list variants are equivalences the driver tolerates; everything
    else (notably decimal128 vs int64 — the DuckDB HUGEINT sum trap)
    must match exactly."""
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # the driver's hash normalizes temporal values (date32 vs
        # timestamp pass it — CORRECTNESS_r04 join_theta_range et al.)
        return "datetime"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{atype(t.value_type)}>"
    return str(t)


def atypes(tbl: pa.Table) -> dict:
    return {f.name: atype(f.type) for f in tbl.schema}


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime as _dt
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            sample = next((v for v in df[c] if v is not None), None)
            if isinstance(sample, _dt.date) and not isinstance(sample, _dt.datetime):
                # arrow date32 -> pandas object of datetime.date; align
                # with the datetime64 the timestamp side produces
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(lambda v: repr(list(v)) if isinstance(v, (list, np.ndarray)) else v)
    return df


def cmp(name: str, exp: pd.DataFrame, got: pd.DataFrame,
        exp_types: dict = None, got_types: dict = None) -> bool:
    if sorted(exp.columns) != sorted(got.columns):
        print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
        return False
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        return False
    if exp_types and got_types:
        tbad = [f"col {c}: oracle={exp_types[c]} spark={got_types.get(c)}"
                for c in sorted(exp_types) if exp_types[c] != got_types.get(c)]
        if tbad:
            print(f"FAIL {name}: dtype mismatch (driver hash is type-sensitive): "
                  + "; ".join(tbad[:4]))
            return False
    exp, got = norm(exp), norm(got)
    bad = []
    for c in exp.columns:
        e, g = exp[c].to_numpy(), got[c].to_numpy()
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            eq = (e == g) | (pd.isna(e) & pd.isna(g))
        else:
            eq = np.array([(x == y) or (pd.isna(x) is True and pd.isna(y) is True)
                           for x, y in zip(e, g)])
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f"col {c} (dtype exp={e.dtype} got={g.dtype}) first diff row {i}: "
                       f"exp={e[i]!r} got={g[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:4]))
        return False
    print(f"ok   {name} ({len(exp)} rows, {len(exp.columns)} cols)")
    return True


def main() -> int:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output written")
            fails += 1
            continue
        try:
            exp_a = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        got_a = con.sql(f"SELECT * FROM read_parquet({files!r})").arrow()
        if not cmp(name, exp_a.to_pandas(), got_a.to_pandas(),
                   atypes(exp_a), atypes(got_a)):
            fails += 1
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return fails


if __name__ == "__main__":
    sys.exit(main())
