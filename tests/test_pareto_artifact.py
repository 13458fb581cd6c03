"""Audit the committed Pareto-sweep artifacts (BASELINE.md north star:
"Split sweep int8_3..18 @ 4096^3" — accuracy-vs-throughput curve).

Like the CI-matrix digest, the evidence is committed so a fresh clone can
check the claims without a TPU: tests/artifacts/pareto_{real,complex}_4096.csv
are the verbatim `tools/pareto_sweep.py 4096 3..18 [--complex]` outputs from
the chip (reference sweep surface: test/main_test.cu:616-663).  This test
asserts the structural claims DESIGN.md §10 makes about them.
"""

import csv
import math
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "artifacts")
MODES = [f"fp64_int8_{ns}" for ns in range(3, 19)]


def _load(name):
    path = os.path.join(ART, name)
    with open(path) as f:
        rows = {r["mode"]: r for r in csv.DictReader(f)}
    return rows


@pytest.mark.parametrize("name,kind", [
    ("pareto_real_4096.csv", "D"),
    ("pareto_complex_4096.csv", "Z"),
])
def test_pareto_artifact(name, kind):
    rows = _load(name)
    # every mode 3..18 present, plus both fallbacks — no holes
    for mode in MODES + ["dgemm", "sgemm"]:
        assert mode in rows, f"{name}: missing {mode}"
    for mode, r in rows.items():
        assert r["gemm"] == kind and r["m"] == r["n"] == r["k"] == "4096"
        assert float(r["tflops"]) > 0, f"{name}: {mode} not timed"
        assert float(r["residual"]) == pytest.approx(
            float(r["residual"])
        ) and math.isfinite(float(r["residual"]))

    res = [float(rows[m]["residual"]) for m in MODES]
    # accuracy staircase: ~100x per added slice until the f64 floor
    for i in range(5):  # ns=3..8 are clearly above the floor
        assert res[i + 1] < res[i] * 0.1, (
            f"{name}: residual not decaying at ns={i + 3}->{i + 4}"
        )
    # ns>=9 sits at the f64 rounding floor, inside the reference CI gate
    for i, mode in enumerate(MODES):
        if int(mode.rsplit("_", 1)[1]) >= 8:
            assert res[i] < 1e-15, f"{name}: {mode} residual {res[i]}"
    # the engine's accuracy envelope beats the library's own dgemm
    # fallback from the knee on.  For D the fallback is XLA's on-device
    # double-float emulation (ns=8 already beats it); for Z it is a host
    # true-f64 matmul (core/api.py complex DGEMM branch), which only the
    # f64-floor modes ns>=9 beat.
    knee = "fp64_int8_8" if kind == "D" else "fp64_int8_9"
    assert res[MODES.index(knee)] < float(rows["dgemm"]["residual"])

    # throughput decreases with pair count in the compute-bound regime
    # (ns>=8; shallower splits are DMA/launch-shaped) and every int8 mode
    # from the knee down beats the native-f64 baseline
    tf = {m: float(rows[m]["tflops"]) for m in MODES}
    native = float(rows["dgemm"]["tflops"])
    for ns in range(8, 18):
        assert tf[f"fp64_int8_{ns + 1}"] < tf[f"fp64_int8_{ns}"] * 1.05
    assert tf["fp64_int8_9"] > 2 * native, (
        f"{name}: knee mode {tf['fp64_int8_9']} vs native {native}"
    )
