#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables,
sorts columns by name and rows by all columns, and compares values.
Not used by the Scala build — developer tooling only.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
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


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}")
            n_fail += 1
            continue
        # The driver's hash is value-repr-sensitive: int 99111 vs float
        # 99111.0 mismatch (r1 q11), while int32 vs int64 or datetime
        # ns vs us are fine. Fail on cross-kind (int vs float) columns.
        kind_bad = [
            c for c, gk, wk in zip(got.columns,
                                   [d.kind for d in got.dtypes],
                                   [d.kind for d in want.dtypes])
            if {gk, wk} == {"i", "f"}
        ]
        if kind_bad:
            print(f"FAIL {name}: int-vs-float dtype mismatch in cols {kind_bad} "
                  f"(driver hash would differ even with equal values)")
            n_fail += 1
        else:
            schema_g = [str(t) for t in got.dtypes]
            schema_w = [str(t) for t in want.dtypes]
            note = "" if schema_g == schema_w else f"  [dtype diff: {schema_g} vs {schema_w}]"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
