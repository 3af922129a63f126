#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the raw sf tables, load the engine's parquet dump, sort columns
by name + rows by value, and compare. Usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p))
fails, passes, rows_only = [], [], []
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no result files")); continue
    got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    if name not in oracle:
        rows_only.append((name, len(got))); continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"schema: got {gc} vs oracle {ec}")); continue
    # The driver's hash is dtype-sensitive for int-vs-float (e.g. DuckDB
    # sum(int) -> HUGEINT -> pandas float64 vs Spark bigint -> int64
    # hashed q14's counts as "920.0" vs "920" in round 1). Fail loudly.
    for c in gc:
        a_k, b_k = got[c].dtype.kind, exp[c].dtype.kind
        if {a_k, b_k} == {"i", "f"}:
            fails.append((name, f"dtype: col {c} got {got[c].dtype} vs oracle {exp[c].dtype}"
                          " (int-vs-float hashes differently in the driver; CAST the oracle)"))
    if fails and fails[-1][0] == name:
        continue
    # list/array columns are unhashable for pandas sort -> stringify first
    # (round 1: p_dedup_embedding crashed the checker)
    import numpy as np
    for df_ in (got, exp):
        for c in gc:
            if len(df_) and isinstance(df_[c].iloc[0], (list, np.ndarray)):
                df_[c] = df_[c].map(lambda v: str(list(v)))
    g = got[gc].sort_values(by=gc, na_position="first").reset_index(drop=True)
    e = exp[ec].sort_values(by=ec, na_position="first").reset_index(drop=True)
    if len(g) != len(e):
        fails.append((name, f"rows: got {len(g)} vs oracle {len(e)}")); continue
    mismatch = None
    for c in gc:
        a, b = g[c], e[c]
        try:
            import pandas as pd
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                ok = np.allclose(a.astype(float).fillna(-1e308), b.astype(float).fillna(-1e308),
                                 rtol=0, atol=1e-9)
            else:
                ok = a.astype(str).fillna("\0").equals(b.astype(str).fillna("\0"))
        except Exception as ex:
            ok = False; mismatch = f"{c}: compare error {ex}"
        if not ok:
            diff = (a.astype(str) != b.astype(str))
            idx = diff[diff].index[:3].tolist()
            mismatch = f"col {c} differs at rows {idx}: got {[a.iloc[i] for i in idx]} vs {[b.iloc[i] for i in idx]}"
            break
    if mismatch: fails.append((name, mismatch))
    else: passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(rows_only)}: {' '.join(n for n,_ in rows_only)}")
print(f"FAIL {len(fails)}:")
for n, why in fails: print(f"  {n}: {why}")
sys.exit(1 if fails else 0)
