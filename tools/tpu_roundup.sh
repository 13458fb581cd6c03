#!/bin/bash
# One-shot on-chip validation + measurement queue for when the axon
# tunnel is reachable.  Run from the repo root:  bash tools/tpu_roundup.sh
# Logs land in /tmp/roundup/.  Order: correctness first, then the
# headline bench, then the measurement fills (Pareto, sustained).
set -u
mkdir -p /tmp/roundup
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name (timeout ${to}s) ==="
  timeout "$to" "$@" > "/tmp/roundup/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc; tail:"; tail -5 "/tmp/roundup/$name.log"
}

run verify_drive 1800 python -u tools/verify_drive.py
run device_suite 2400 env OZ_TEST_PLATFORM=tpu python -m pytest tests/test_device_engine.py -q
run bench_16384 2400 python -u bench.py
run pareto_8192_timing 5400 python -u tools/pareto_sweep.py 8192 3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18 --no-oracle
run pareto_2048_acc 3600 python -u tools/pareto_sweep.py 2048 3,4,5,6,7,8,9,10,11,12,14,16,18
run pareto_z4096_timing 5400 python -u tools/pareto_sweep.py 4096 8,9,10,12,16 --complex --no-oracle
run pareto_z512_acc 1800 python -u tools/pareto_sweep.py 512 8,9,10,12,16 --complex
run sustained_4096 900 python -m ozimmu_tpu.bench_cli power dgemm fp64_int8_9 4096 --min-seconds 60
echo "ALL DONE"
