#!/bin/bash
# Round-5 queue #3: wait for the wedged terminal to recover, then run
# the remaining chip benchmarks serially.
cd /root/repo
probe() {
  timeout 90 python -u -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128), jnp.float32))
print('probe ok:', float(y), flush=True)" 2>/dev/null
}
echo "$(date +%T) waiting for terminal recovery"
until probe; do sleep 120; done
echo "$(date +%T) terminal recovered"

echo "=== zhpl n=8192 block=1024 (complex LU, warmed) ==="
timeout 10800 python -m ozimmu_tpu.bench_cli hpl fp64_int8_9 8192 \
  --block 1024 --warmup --dtype z 2>&1 | grep -v WARNING

echo "$(date +%T) probing between jobs"
until probe; do sleep 120; done

echo "=== hpl retry n=16384 block=1024 (warmed) ==="
timeout 10800 python -m ozimmu_tpu.bench_cli hpl fp64_int8_9 16384 \
  --block 1024 --warmup 2>&1 | grep -v WARNING

echo "=== queue3 done $(date +%T) ==="
