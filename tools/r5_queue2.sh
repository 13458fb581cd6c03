#!/bin/bash
# Round-5 queue #2: runs after the HPL-16384 process exits.
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== zgemm 16384^3 ns=9 (x4 accounting) ==="
OZ_ZBENCH_M=16384 timeout 10800 python tools/bench_zgemm.py 2>&1 | grep -v WARNING
echo "=== native LU baseline on chip (f64 unsupported -> f32) ==="
timeout 3600 python tools/bench_native_lu.py 8192 2>&1 | grep -v WARNING
echo "=== queue2 done ==="
