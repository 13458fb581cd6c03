"""Bench CLI smoke tests (CPU): CSV schema, timing helper, ci_test slice."""

import io
import sys

import numpy as np

from ozimmu_tpu import bench_cli
from ozimmu_tpu.testing import effective_tflops, generate_input


class TestBenchCli:
    def _capture(self, fn, *args, **kw):
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            rc = fn(*args, **kw)
        finally:
            sys.stdout = old
        return rc, buf.getvalue()

    def test_sweep_csv_schema(self):
        rc, out = self._capture(
            bench_cli.main,
            ["urand01", "dgemm", "fp64_int8_8", "seq", "128", "128", "128",
             "--test-count", "2"],
        )
        assert rc == 0
        lines = [l for l in out.strip().splitlines() if l]
        header = lines[0].split(",")
        assert header == ["device", "gemm", "input", "mode", "opA", "opB",
                          "m", "n", "k", "residual", "max_relative", "tflops"]
        row = lines[1].split(",")
        assert float(row[9]) < 1e-15  # residual
        assert float(row[11]) > 0  # tflops measured

    def test_effective_tflops_modes(self):
        a = generate_input("urand01", (64, 64), seed=0)
        b = generate_input("urand01", (64, 64), seed=1)
        assert effective_tflops(a, b, "fp64_int8_9", 2) > 0
        assert effective_tflops(a, b, "dgemm", 2) > 0
        az = generate_input("urand01", (64, 64), seed=2, complex_=True)
        bz = generate_input("urand01", (64, 64), seed=3, complex_=True)
        assert effective_tflops(az, bz, "fp64_int8_8", 2) > 0
