#!/usr/bin/env python3
"""Per-query subprocess oracle compare with a wall-clock guard —
used for the optional sf0.1 hardening sweep where a few oracles
(recursive-CTE tokenizer chains) are known to be DuckDB-expensive."""
import json, subprocess, sys, os
from concurrent.futures import ThreadPoolExecutor

out_dir, sf_dir, timeout_s = sys.argv[1], sys.argv[2], int(sys.argv[3])
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# Explicit allowlist of oracles DuckDB is known to evaluate slowly at
# sf0.1 (recursive-CTE tokenizer chains). ONLY these may time out and
# be reported SKIP; a timeout on any other query is a regression and
# reports FAIL (a newly hung or quadratic oracle must surface, not be
# silently classified as known-expensive). Extend via argv[4] as a
# comma-separated list when diagnosing a new slow oracle on purpose.
KNOWN_EXPENSIVE = set(filter(None, (sys.argv[4].split(",") if len(sys.argv) > 4 else [])))

WORKER = r'''
import json, sys, math
import duckdb
out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
ours = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
theirs = con.sql(sql).df()
ours = ours.reindex(sorted(ours.columns), axis=1)
theirs = theirs.reindex(sorted(theirs.columns), axis=1)
if list(ours.columns) != list(theirs.columns):
    print(f"FAIL {name}: columns"); sys.exit(1)
if len(ours) != len(theirs):
    print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}"); sys.exit(1)
import pandas as pd
for c in ours.columns:
    for i, (x, y) in enumerate(zip(ours[c].tolist(), theirs[c].tolist())):
        try:
            if pd.isna(x) and pd.isna(y): continue
        except (TypeError, ValueError): pass
        same = (x == y) or (x is None and y is None)
        if not same and isinstance(x, float) and isinstance(y, float):
            same = (math.isnan(x) and math.isnan(y)) or \
                (math.copysign(1, x) == math.copysign(1, y) and x == y)
        if not same:
            print(f"FAIL {name}: col={c} row={i} ours={x!r} oracle={y!r}"); sys.exit(1)
kinds = [(c, ours[c].dtype.kind, theirs[c].dtype.kind) for c in ours.columns
         if ours[c].dtype.kind != theirs[c].dtype.kind]
if kinds:
    print(f"FAIL {name}: dtypes {kinds}"); sys.exit(1)
print(f"PASS {name} ({len(ours)} rows)")
'''

def run(name):
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, out_dir, sf_dir, name],
                           capture_output=True, text=True, timeout=timeout_s)
        out = (r.stdout + r.stderr).strip().splitlines()
        return out[-1] if out else f"FAIL {name}: no output"
    except subprocess.TimeoutExpired:
        if name in KNOWN_EXPENSIVE:
            return f"SKIP {name}: oracle exceeded {timeout_s}s (allowlisted known-expensive)"
        return f"FAIL {name}: oracle exceeded {timeout_s}s (NOT allowlisted — regression)"

names = sorted(oracle.keys())
with ThreadPoolExecutor(max_workers=6) as ex:
    results = list(ex.map(run, names))
fails = [r for r in results if r.startswith("FAIL")]
skips = [r for r in results if r.startswith("SKIP")]
for r in results:
    if not r.startswith("PASS"):
        print(r)
print(f"{len(results)} queries: {len(results)-len(fails)-len(skips)} pass, "
      f"{len(skips)} skipped (timeout), {len(fails)} FAIL")
