#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle_sql.json query in DuckDB over <sfDir>/*.parquet views, and
compares: schema (sorted column names), row count, and exact cell values
after sorting columns by name and rows by all columns.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonicalization: sort the RAW frame first (unhashable
    cells, e.g. numpy arrays, crash here exactly like at the driver), then
    stringify with str() — so Decimal('38139.20') != float 38139.2, matching
    the driver's hash compare (the round-1 local checker float-normalized
    Decimals and missed 5 driver hash-fails)."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return df.map(cell)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(d)])
    n_pass = n_fail = n_noracle = 0
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"  [rows-only] {name}: rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: column mismatch spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: row count spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        if not g.equals(e):
            neq = (g != e)
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"✗ {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"    {c}[{i}]: spark={g[c][i]!r} duck={e[c][i]!r}")
            n_fail += 1
            continue
        print(f"✓ {name} ({len(g)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
