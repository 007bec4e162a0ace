#!/usr/bin/env python3
"""Rebuild /tmp/sf1ci — the ten-replica PERTURBED sf1 decade dataset.

Construction (BASELINE.md rounds 8/11, perturbed round 14): TEN replicas
of sf0.1 per table with the key/id columns offset by k*10**7 per replica
k in 0..9 (disjoint key ranges — cross-replica joins impossible by
construction). Round-14 change: replica k>0 CONTENT is perturbed
deterministically —

 - documents.text: ~5% of tokens substituted with a same-length
   hash-derived pseudo-token (n_chars and token structure invariant),
   plus one forced substitution so short docs cannot survive intact;
 - embeddings.embedding: one SIGNED PERMUTATION of the components per
   replica (orthogonal — within-replica cosines/norms exactly
   invariant, cross-replica cosines drop to the random level).

Byte-identical replicas manufactured ~100x true near-dup pairs across
replicas (replica doc X was an exact dup of nine twins), making
q296+q46 alone 29% of the r13 sf1 bench — the measurement then graded
constructed output volume, not plan cost. Perturbation breaks
cross-replica identity so true-pair growth is ~LINEAR in corpus size.

Seeding is by CONTENT fingerprint (crc32 of the payload) + replica k +
position, NOT by row id: two byte-identical documents WITHIN a replica
perturb identically and stay byte-identical, so within-replica
dup/cluster structure is preserved exactly; across replicas the seed
differs in k, so twins diverge. Everything is replayable — Spark and
the DuckDB oracle read the same perturbed parquet, so no oracle forks.

Usage: python3 tools/build_sf1ci.py [srcDir] [outDir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1ci

Developer tooling only (not part of the Scala build). Reuses pyarrow
(driver-side python) — the repo's Scala code never reads /tmp/sf1ci
except through the same generic parquet reader as /root/testdata.
"""
import sys
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MASK64 = (1 << 64) - 1
SUB_ONE_IN = 20  # ~5% of tokens / components perturbed per replica


def mix64(fp, k, i):
    """splitmix64 over (content fp, replica, position) — cheap, stable."""
    z = (fp * 0x9E3779B97F4A7C15 + k * 0xBF58476D1CE4E5B9 + i * 0x94D049BB133111EB) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


def subst_token(h, length):
    """Same-length lowercase pseudo-token from a BOUNDED vocabulary:
    256 variants per length class (the variant index is the only
    hash-dependent part). Unbounded per-position-unique tokens inflate
    the corpus's distinct-type vocabulary ~20x at sf1, which turns
    every vocabulary-shaped operator (edit-distance linkage, SymSpell)
    into a constructed quadratic — measured 672x on the edit-distance
    decade. A bounded pool keeps the type vocabulary +<=~8k while
    still breaking cross-replica shingle identity (substitution
    POSITIONS differ per replica; a shingle match needs all three
    token slots equal)."""
    out = []
    v = (h % 256) * 2654435761 + length  # variant seed, 256 per length
    for _ in range(length):
        v = (v * 6364136223846793005 + 1442695040888963407) & MASK64
        out.append(chr(97 + ((v >> 33) % 26)))
    return "".join(out)


def perturb_documents(table, k):
    if k == 0:
        return table
    idx = table.schema.get_field_index("text")
    out = []
    for txt in table.column("text").to_pylist():
        fp = zlib.crc32(txt.encode("utf-8"))
        toks = txt.split(" ")
        changed = False
        # forced substitution: without it, P(no hit) on a short doc is
        # high (0.95^16 ~ 0.44) and those docs stay byte-identical
        # across replicas — exactly the twin structure being removed
        nonempty = [i for i, tok in enumerate(toks) if tok]
        forced = (nonempty[mix64(fp, k, 1 << 33) % len(nonempty)]
                  if nonempty else -1)
        for i, tok in enumerate(toks):
            if tok and (i == forced or mix64(fp, k, i) % SUB_ONE_IN == 0):
                toks[i] = subst_token(mix64(fp, k, i + (1 << 32)), len(tok))
                changed = True
        out.append(" ".join(toks) if changed else txt)
    return table.set_column(idx, table.schema.field(idx),
                            pa.array(out, table.schema.field(idx).type))


def perturb_embeddings(table, k):
    """Per-replica SIGNED PERMUTATION of the embedding components — an
    orthogonal transform applied uniformly to every vector of replica k,
    so every WITHIN-replica cosine (and norm) is preserved EXACTLY
    (replica k's near-dup/ANN pair structure is bit-for-bit replica 0's
    geometry) while CROSS-replica cosines between differently-rotated
    copies fall to the random level (~1/sqrt(dim)). Component-level
    noise cannot do this: the cosine thresholds in play (0.45 for the
    embed near-dup) would need ~30% of the vector mass flipped, which
    would also destroy within-replica structure."""
    if k == 0:
        return table
    idx = table.schema.get_field_index("embedding")
    typ = table.schema.field(idx).type
    perms = {}

    def signed_perm(dim):
        if dim not in perms:
            perm = list(range(dim))
            for i in range(dim - 1, 0, -1):  # Fisher-Yates, replica-seeded
                j = mix64(dim, k, i) % (i + 1)
                perm[i], perm[j] = perm[j], perm[i]
            signs = [1.0 if mix64(dim, k, (1 << 32) + i) % 2 == 0 else -1.0
                     for i in range(dim)]
            perms[dim] = (perm, signs)
        return perms[dim]

    out = []
    for vec in table.column("embedding").to_pylist():
        if vec is None:
            out.append(None)
            continue
        perm, signs = signed_perm(len(vec))
        out.append([None if vec[perm[i]] is None else signs[i] * vec[perm[i]]
                    for i in range(len(vec))])
    return table.set_column(idx, table.schema.field(idx), pa.array(out, typ))


PERTURB = {"documents": perturb_documents, "embeddings": perturb_embeddings}

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
            if table in PERTURB:
                t = PERTURB[table](t, k)
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
