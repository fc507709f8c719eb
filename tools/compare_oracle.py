#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped by
`graft.Verify <sfDir> <outDir>`, run its oracle SQL in DuckDB over the same
parquet tables, sort columns by name + rows by all columns, and compare.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import json, os, sys
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting/compare works
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "toordinal") and not hasattr(v, "hour")).any():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    dumped = {n for n in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, n))}
    # a query that crashed in Verify has an oracle but no dump — surface it
    for name in sorted(set(oracles) - dumped):
        results[name] = "MISSING_DUMP (query failed in Verify?)"
    for name in sorted(dumped):
        qdir = os.path.join(out_dir, name)
        try:
            got = canon(pd.read_parquet(qdir))
        except Exception as e:
            results[name] = f"READ_FAIL {e}"
            continue
        if name not in oracles:
            # rows-only by design: passes when it produced rows
            results[name] = (f"OK ROWS_ONLY rows={len(got)}" if len(got) > 0
                             else "ROWS_ONLY_EMPTY")
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            results[name] = f"ORACLE_FAIL {str(e)[:160]}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS got={len(got)} want={len(want)}"
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = (a.isna() & b.isna()) | (a == b)
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
            except Exception as e:
                bad = f"CMP_ERR col={c} {e}"
                break
            if not eq.all():
                i = int(np.argmin(eq.values))
                bad = f"VAL col={c} row={i} got={a.iloc[i]!r} want={b.iloc[i]!r}"
                break
        results[name] = bad or f"OK rows={len(got)}"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(("PASS " if v.startswith("OK") else "FAIL ") + k + "  " + v)
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
