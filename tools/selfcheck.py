#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL (oracle_sql.json) in DuckDB over the raw testdata parquet, then
compares: schema (column names, sorted), row count, and a hash of all
values after sorting columns by name and rows by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: ints -> int64, floats -> rounded float64, rest -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(6)
        else:
            out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Expected set = manifest dumped by graft.Verify (plus oracle keys as a
    # safety net). A query that crashed at runtime writes no output dir —
    # that must FAIL here, not be silently skipped (ADVICE r1).
    expected = set(oracle)
    manifest_path = f"{out_dir}/queries.json"
    if os.path.exists(manifest_path):
        expected |= set(json.load(open(manifest_path)))
    else:
        print(f"WARN: {manifest_path} missing; checking oracle keys only")
    n_pass = n_fail = 0
    for qname in sorted(expected):
        qdir = f"{out_dir}/{qname}"
        got_files = glob.glob(f"{qdir}/*.parquet")
        if not got_files:
            print(f"FAIL {qname}: no spark output parquet"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in got_files]))
        if qname not in oracle:
            # Mirror the driver's weaker rows>0 gate for oracle-less queries.
            if len(got) == 0:
                print(f"FAIL {qname}: no oracle and 0 rows"); n_fail += 1
            else:
                print(f"PASS {qname} (rows-only check: {len(got)} rows)"); n_pass += 1
            continue
        try:
            exp = canon(con.execute(oracle[qname]).df())
        except Exception as e:
            print(f"FAIL {qname}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {qname}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {qname}: rows spark={len(got)} oracle={len(exp)}"); n_fail += 1; continue
        eq = got.equals(exp)
        if not eq:
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {qname}: {bad.sum()} mismatched rows; first:")
            print(pd.concat([got[bad].head(3).add_suffix("_spark"),
                             exp[bad].head(3).add_suffix("_oracle")], axis=1))
            n_fail += 1
        else:
            print(f"PASS {qname} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
