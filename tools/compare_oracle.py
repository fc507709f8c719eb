#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped by
`graft.Verify <sfDir> <outDir>`, run its oracle SQL in DuckDB over the same
parquet tables, sort columns by name + rows by all columns, and compare.

Deliberately mirrors the DRIVER's comparator, not a friendlier one: no
timezone normalization (a tz-aware Spark dump vs a naive DuckDB timestamp is
a schema FAIL) and no array-to-tuple conversion (an ARRAY output column
crashes pandas row sorting exactly like it does driver-side). Round 2 proved
a lenient local gate reports 70/70 while the driver sees 47/70.

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
    # Only resolution widening for NAIVE datetimes (ns vs us storage detail);
    # tz-aware stays tz-aware so the LTZ-vs-naive mismatch is caught.
    for c in df.columns:
        if (pd.api.types.is_datetime64_any_dtype(df[c])
                and not isinstance(df[c].dtype, pd.DatetimeTZDtype)):
            df[c] = df[c].astype("datetime64[us]")
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
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    skip = (sys.argv[4].split(",") if len(sys.argv) > 4 and sys.argv[4]
            else [])
    # a query that crashed in Verify has an oracle but no dump — surface it
    for name in sorted(set(oracles) - dumped):
        if only is not None and not any(name.startswith(o) for o in only):
            continue
        results[name] = "MISSING_DUMP (query failed in Verify?)"
    for name in sorted(dumped):
        if only is not None and not any(name.startswith(o) for o in only):
            continue
        if any(name.startswith(o) for o in skip):
            print(f"SKIP {name}  (excluded by arg)", flush=True)
            continue
        t0 = __import__("time").time()
        qdir = os.path.join(out_dir, name)
        try:
            got = canon(pd.read_parquet(qdir))
        except Exception as e:
            results[name] = f"SORT_OR_READ_FAIL (driver would err) {type(e).__name__}: {e}"
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
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt_bad:
            results[name] = f"SCHEMA_DTYPE {dt_bad}"
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
        print(("PASS " if results[name].startswith("OK") else "FAIL ")
              + name + "  " + results[name]
              + f"  [{__import__('time').time() - t0:.1f}s]", flush=True)
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(("PASS " if v.startswith("OK") else "FAIL ") + k + "  " + v)
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
