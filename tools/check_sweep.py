#!/usr/bin/env python3
"""Per-query oracle sweep with subprocess isolation — the big-SF variant
of check.py: each query's DuckDB oracle runs in its own child process
under a timeout and memory cap, so one quadratic oracle can't stall or
OOM the whole sweep. Records pass/fail/oracle_timeout/oracle_error per
query as JSON.

Usage: python3 tools/check_sweep.py <sfDir> <verifyOutDir> <resultJson>
         [timeoutSec] [qname...]
Env: GRAFT_ORACLE_MEM_GB (default 64) — per-child DuckDB memory_limit,
     with RLIMIT_DATA at 2x as the hard backstop.
     GRAFT_STAGED=1 — for queries listed in the Verify dump's
     oracle_sql_staged.json, run the STAGED replay: every query dump in
     verifyOutDir is registered as a DuckDB view named after its query,
     so the staged SQL can read a stage another query has already
     hash-verified in the same sweep (e.g. q67/q263 read the q22 pair
     set instead of re-deriving it — the one stage DuckDB cannot afford
     at sf1). The driver's sf0.01 gate never uses staged oracles.

Developer tooling only (not part of the Scala build).
"""
import json
import os
import re
import subprocess
import sys
import time

CHILD = r"""
import json, math, os, sys
import duckdb, pandas as pd
sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "full"
# Memory cap, two layers: DuckDB's own memory_limit (graceful — spills or
# errors the query) plus RLIMIT_DATA at 2x as a hard backstop so a
# quadratic oracle fails in-child instead of OOMing the host.
mem_gb = int(os.environ.get("GRAFT_ORACLE_MEM_GB", "64"))
try:
    import resource
    lim = mem_gb * 2 * (1 << 30)
    resource.setrlimit(resource.RLIMIT_DATA, (lim, lim))
except (ImportError, ValueError, OSError):
    pass
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

con = duckdb.connect()
con.execute(f"SET memory_limit='{mem_gb}GB'")
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
if mode == "staged":
    # Register every query dump as a view named after its query, so the
    # staged SQL can consume a Spark-verified upstream stage.
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d.replace("_", "").isalnum() and d[0].isalpha():
            try:
                con.execute(f"CREATE VIEW {d} AS SELECT * "
                            f"FROM read_parquet('{p}/*.parquet')")
            except Exception as e:
                # A dump the staged SQL needs that fails to register would
                # otherwise surface as a confusing "table not found" later.
                print(f"WARNING: staged view {d} failed to register: {e}",
                      file=sys.stderr)
    sql = json.load(open(f"{out_dir}/oracle_sql_staged.json"))[name]
else:
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
got = canon(pd.read_parquet(f"{out_dir}/{name}"))
want = canon(con.execute(sql).fetchdf())
if list(got.columns) != list(want.columns):
    print(f"FAIL cols {list(got.columns)} != {list(want.columns)}"); sys.exit(1)
if len(got) != len(want):
    print(f"FAIL rows {len(got)} != {len(want)}"); sys.exit(1)
for c in got.columns:
    gv, wv = got[c].tolist(), want[c].tolist()
    for i, (x, y) in enumerate(zip(gv, wv)):
        if not values_equal(x, y):
            print(f"FAIL col {c} row {i}: spark={x!r} oracle={y!r}"); sys.exit(1)
kind_bad = [c for c, gk, wk in zip(got.columns,
            [d.kind for d in got.dtypes], [d.kind for d in want.dtypes])
            if {gk, wk} == {"i", "f"}]
if kind_bad:
    print(f"FAIL dtype int-vs-float in {kind_bad}"); sys.exit(1)
print(f"PASS {len(got)} rows")
"""


def main() -> int:
    sf_dir, out_dir, result_json = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 600
    only = set(sys.argv[5:]) if len(sys.argv) > 5 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    staged = {}
    staged_path = f"{out_dir}/oracle_sql_staged.json"
    if os.environ.get("GRAFT_STAGED", "") not in ("", "0") \
            and os.path.exists(staged_path):
        staged = json.load(open(staged_path))
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        mode = "staged" if name in staged else "full"
        if mode == "staged":
            # A staged oracle reads sibling query dumps as views; those
            # upstream stages must be hash-verified by THIS sweep before
            # the staged replay can claim anything. Dependencies are the
            # query names the staged SQL references.
            deps = sorted(set(re.findall(r"\bq\d+\w*", staged[name]))
                          & set(oracle) - {name})
            unverified = [d for d in deps if results.get(d, {}).get(
                "status") != "pass"]
            hard_bad = [d for d in unverified
                        if d in results  # ran and did not pass
                        or not os.path.isdir(os.path.join(out_dir, d))]
            if hard_bad:
                results[name] = {
                    "status": "fail", "sec": 0.0,
                    "note": ("staged upstream not verified in this run: "
                             + ", ".join(hard_bad))}
                print(f"FAIL {name}: staged upstream not verified: "
                      + ", ".join(hard_bad))
                json.dump(results, open(result_json, "w"), indent=1)
                continue
            for d in unverified:  # dump exists but excluded by qname filter
                print(f"WARNING: {name} staged upstream {d} not verified "
                      f"in this filtered run — dump exists but is "
                      f"UNVERIFIED", file=sys.stderr)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, sf_dir, out_dir, name, mode],
                capture_output=True, text=True, timeout=timeout)
            dt = round(time.time() - t0, 1)
            out = (p.stdout or "").strip().splitlines()
            msg = out[-1] if out else (p.stderr or "").strip().splitlines()[-1:]
            if p.returncode == 0 and out and out[-1].startswith("PASS"):
                note = out[-1] + (" [staged oracle: one Spark-verified "
                                  "upstream stage read from the sweep's own "
                                  "dump]" if mode == "staged" else "")
                results[name] = {"status": "pass", "sec": dt, "note": note}
                print(f"PASS {name} ({dt}s)" +
                      (" [staged]" if mode == "staged" else ""))
            else:
                err = msg if isinstance(msg, str) else " ".join(msg)
                results[name] = {"status": "fail", "sec": dt, "note": str(err)[:400]}
                print(f"FAIL {name} ({dt}s): {str(err)[:200]}")
        except subprocess.TimeoutExpired:
            results[name] = {"status": "oracle_timeout", "sec": timeout}
            print(f"TIMEOUT {name} (>{timeout}s oracle-side)")
        json.dump(results, open(result_json, "w"), indent=1)
    n = {"pass": 0, "fail": 0, "oracle_timeout": 0}
    for r in results.values():
        n[r["status"]] = n.get(r["status"], 0) + 1
    print(f"== {n['pass']} pass / {n['fail']} fail / "
          f"{n['oracle_timeout']} oracle-timeout ==")
    return 1 if n["fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
