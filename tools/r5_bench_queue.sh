#!/bin/bash
# Round-5 serial benchmark queue — one job at a time on the single chip.
# Usage: nohup bash tools/r5_bench_queue.sh <pid-to-wait-for> &
cd /root/repo
if [ -n "$1" ]; then
  echo "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

echo "=== fold experiment: baseline (exact triple fold) @8192^3 ns=9 ==="
OZ_BENCH_M=8192 OZ_BENCH_SKIP_NATIVE=1 OZ_BENCH_ITERS=6 \
  timeout 3600 python bench.py 2>&1 | grep -v WARNING

echo "=== fold experiment: double2 (inexact 2-comp fold) @8192^3 ns=9 ==="
OZIMMU_FOLD_EXPERIMENT=double2 OZ_BENCH_M=8192 OZ_BENCH_SKIP_NATIVE=1 \
  OZ_BENCH_ITERS=6 timeout 3600 python bench.py 2>&1 | grep -v WARNING

echo "=== zgemm headline @8192^3 ns=9 ==="
OZ_ZBENCH_M=8192 timeout 5400 python tools/bench_zgemm.py 2>&1 | grep -v WARNING

echo "=== hpl n=16384 block=2048 (warmup + timed) ==="
timeout 21600 python -m ozimmu_tpu.bench_cli hpl fp64_int8_9 16384 \
  --block 2048 --warmup 2>&1 | grep -v WARNING

echo "=== queue done ==="
