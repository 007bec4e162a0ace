#!/usr/bin/env bash
# Regenerate every per-round record at the CURRENT query surface.
# Run ONLY after the surface is frozen for the round (the round-13
# lesson: records regenerated mid-round go stale when the surface
# grows). Takes ~2.5-3 h end-to-end on local[32]; steps are ordered so
# the timing-sensitive benches never overlap other work.
#
# Usage: bash tools/run_records.sh
# Developer tooling only (not part of the Scala build).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/5] full sf0.01 verify + oracle gate =="
rm -rf /tmp/verify_full
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_full" \
  > /tmp/records_verify001.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_full \
  | tail -1 | tee /tmp/records_gate.txt
grep -q " 0 fail" /tmp/records_gate.txt || { echo "GATE RED"; exit 1; }

echo "== [2/5] official sf0.1 bench -> BENCH_FULL.json =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > /tmp/records_bench01.log 2>&1
python3 -c "import json; d=json.load(open('BENCH_FULL.json')); \
  print('BENCH_FULL:', len(d['queries']), 'queries', d['value'], 's', \
  'failed:', d['failed'])"

echo "== [3/5] sf1ci dataset (rebuild if absent) =="
[ -f /tmp/sf1ci/lineitem.parquet ] || python3 tools/build_sf1ci.py

echo "== [4/5] sf1 verify + staged sweep -> CHECK_sf1.json =="
rm -rf /tmp/verify_sf1
sbt -batch "runMain graft.Verify /tmp/sf1ci /tmp/verify_sf1" \
  > /tmp/records_verifysf1.log 2>&1
GRAFT_STAGED=1 python3 tools/check_sweep.py /tmp/sf1ci /tmp/verify_sf1 \
  CHECK_sf1.json 1800 | tail -1

echo "== [5/5] sf1 bench -> BENCH_sf1.json (single pass, no warmup) =="
SPARK_GRAFT_SF_DIR=/tmp/sf1ci SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/records_benchsf1.log 2>&1
python3 -c "import json; d=json.load(open('BENCH_sf1.json')); \
  print('BENCH_sf1:', len(d['queries']), 'queries', d['value'], 's', \
  'failed:', d['failed'])"

echo "== records done — run the gate canary, then commit =="
