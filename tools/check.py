#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>
  1. registers every <sfDir>/*.parquet as a DuckDB view,
  2. runs each SQL in <verifyOutDir>/oracle_sql.json,
  3. compares against the Spark parquet at <verifyOutDir>/<name>/,
     column-name-sorted, row-sorted, exact values.

Dev-only tooling (not shipped in the library jar).
"""
import duckdb
import glob
import numpy as np
import pandas as pd
import json
import os
import sys


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    spark_dirs = {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
    for name in sorted(spark_dirs | set(oracle)):
        if name not in spark_dirs:
            print(f"NOSPARK {name}: oracle declared but no Spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL    {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"{'ROWSOK ' if ok else 'EMPTY  '} {name}: rows={len(spark_df)} (no oracle)")
            n_fail += 0 if ok else 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL    {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL    {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL    {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        mismatch = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                eq = (sv == dv) | (sv.isna() & dv.isna())
                if not eq.all() and (sv.dtype.kind == "f" or dv.dtype.kind == "f"):
                    # the REAL driver gate hash-compares exactly, and the
                    # engine's float outputs are designed to be bit-identical
                    # (portable geodesy DAG, identical-division quotients) —
                    # so exact compare stays primary and bit drift stays
                    # visible locally. The tolerance path only reclassifies
                    # last-ulp summation-order differences, loudly.
                    close = pd.Series(
                        np.isclose(sv.astype(float), dv.astype(float),
                                   rtol=1e-9, atol=1e-12, equal_nan=True))
                    if close.all():
                        print(f"WARN    {name}: col {c} differs in last-ulp "
                              f"only ({int((~eq).sum())} rows) — the exact "
                              f"driver gate may still reject this")
                        eq = close
            except Exception:
                eq = sv.astype(str) == dv.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                mismatch = (c, sv[i], dv[i], int((~eq).sum()))
                break
        if mismatch:
            c, sv, dv, n = mismatch
            print(f"FAIL    {name}: col {c}: {n} diffs, first spark={sv!r} duck={dv!r}")
            n_fail += 1
        else:
            # dtype check (loose: both numeric kinds equal)
            dt_mism = [c for c in s.columns if s[c].dtype.kind != d[c].dtype.kind]
            tag = "PASS   " if not dt_mism else "PASS~dt"
            if dt_mism:
                tag_info = " dtypes differ: " + ", ".join(
                    f"{c}({s[c].dtype}!={d[c].dtype})" for c in dt_mism)
            else:
                tag_info = ""
            print(f"{tag} {name}: rows={len(s)}{tag_info}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
