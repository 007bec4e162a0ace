#!/usr/bin/env python3
"""Rebuild /tmp/sf1ci — the ten-replica sf1 decade dataset.

Construction (BASELINE.md rounds 8/11): TEN byte-identical replicas of
sf0.1 per table, with only the key/id columns offset by k*10**7 per
replica k in 0..9. text/embedding payloads stay byte-identical so
per-row operator cost is content-invariant; within-replica dup/cluster
structure is preserved and cross-replica joins are impossible by
construction (disjoint key ranges), keeping expected scaling linear.

Usage: python3 tools/build_sf1ci.py [srcDir] [outDir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1ci

Developer tooling only (not part of the Scala build). Reuses pyarrow
(driver-side python) — the repo's Scala code never reads /tmp/sf1ci
except through the same generic parquet reader as /root/testdata.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1ci"
REPLICAS = 10
OFFSET = 10**7

# Key columns offset per replica so each replica is a disjoint,
# join-consistent universe. Non-key payload columns are byte-identical.
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    import os

    os.makedirs(OUT, exist_ok=True)
    for table, keys in KEYS.items():
        src = pq.read_table(f"{SRC}/{table}.parquet")
        chunks = []
        for k in range(REPLICAS):
            t = src
            if k > 0:
                for col in keys:
                    idx = t.schema.get_field_index(col)
                    typ = t.schema.field(idx).type
                    shifted = pc.add(t.column(col), pa.scalar(k * OFFSET, type=typ))
                    t = t.set_column(idx, t.schema.field(idx), shifted.cast(typ))
            chunks.append(t)
        out = pa.concat_tables(chunks)
        # Small row groups — Spark parallelizes a single parquet file by
        # row group, and pyarrow's default (1 Mi rows/group) caps a 6M-row
        # lineitem at 6-way scans on a 32-thread executor (measured 7×
        # slowdown on scan-bound queries). 64 Ki rows/group ≈ the
        # task-per-core granularity a Spark-written multi-file table gets.
        rgs = min(65536, max(1024, len(out) // 32))
        pq.write_table(out, f"{OUT}/{table}.parquet", row_group_size=rgs)
        rg = pq.ParquetFile(f"{OUT}/{table}.parquet").num_row_groups
        print(f"{table}: {len(src)} -> {len(out)} rows, {rg} row groups")


if __name__ == "__main__":
    main()
