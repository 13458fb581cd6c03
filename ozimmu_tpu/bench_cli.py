"""Benchmark/evaluation CLI — the reference ``main.test`` harness surface.

Reproduces the reference CLI semantics (test/main_test.cu:550-568) and its
CSV schema (main_test.cu:143-151)::

    python -m ozimmu_tpu.bench_cli urand01 dgemm fp64_int8_9 seq 1024 4096 1024
    python -m ozimmu_tpu.bench_cli exp_rand-2 zgemm fp64_int8_8,fp64_int8_12 \
        exp2 1024 8192 2 --test-count 10
    python -m ozimmu_tpu.bench_cli ci_test

CSV columns: device,gemm,input,mode,opA,opB,m,n,k,residual,max_relative,tflops
(``gpu`` column renamed ``device``; TFLOPS is effective 2mnk/t, x4 complex
— main_test.cu:134-141.)
"""

from __future__ import annotations

import argparse
import itertools
import sys

import numpy as np


def _device_name() -> str:
    import jax

    d = jax.devices()[0]
    return str(d).replace(",", ";")


def _run_case(
    gemm_kind: str,
    input_mode: str,
    mode: str,
    op_a: str,
    op_b: str,
    m: int,
    n: int,
    k: int,
    test_count: int,
    error_threshold: float = 0.0,
) -> int:
    import ozimmu_tpu as oz
    from ozimmu_tpu.testing import effective_tflops, error_metrics, generate_input

    complex_ = gemm_kind == "zgemm"
    a = generate_input(input_mode, (m, k) if op_a == "N" else (k, m), seed=0, complex_=complex_)
    b = generate_input(input_mode, (k, n) if op_b == "N" else (n, k), seed=1, complex_=complex_)

    c = oz.gemm(a, b, mode=mode, op_a=op_a, op_b=op_b)
    ae = np.ascontiguousarray(a if op_a == "N" else a.T)
    be = np.ascontiguousarray(b if op_b == "N" else b.T)
    err = error_metrics(c, ae, be)

    if test_count > 0:
        tflops = effective_tflops(ae, be, mode, test_count)
    else:
        tflops = float("nan")

    print(
        f"{_device_name()},{'Z' if complex_ else 'D'},{input_mode},{mode},"
        f"{op_a},{op_b},{m},{n},{k},{err['relative_residual']:e},"
        f"{err['max_relative_error']:e},{tflops:e}",
        flush=True,
    )
    if error_threshold and err["relative_residual"] >= error_threshold:
        print("^^^ FAILED ^^^^", flush=True)
        return 1
    return 0


def _size_list(kind: str, start: int, end: int, interval: int):
    if kind == "seq":
        return list(range(start, end + 1, interval))
    if kind == "exp2":
        out = []
        v = start
        while v <= end:
            out.append(v)
            v *= interval if interval > 1 else 2
        return out
    raise ValueError(f"unknown size mode {kind}")


def run_ci_test(sizes=(1023, 1024, 1025)) -> int:
    """The reference 1944-case gate (main_test.cu:702-746).

    One long-double oracle accumulation scores all nine modes per operand
    set (native.error_metrics_multi_native) — 9x less oracle work than
    the naive per-case loop, same per-case CSV rows and gate.
    """
    import ozimmu_tpu as oz
    from ozimmu_tpu import native
    from ozimmu_tpu.testing import error_metrics, generate_input

    modes = [f"fp64_int8_{ns}" for ns in range(8, 17)]
    num_errors = 0
    total = 0
    dev = _device_name()
    for kind in ("dgemm", "zgemm"):
        complex_ = kind == "zgemm"
        for op_a, op_b in itertools.product("NT", "NT"):
            for m in sizes:
                for n in sizes:
                    for k in sizes:
                        a = generate_input(
                            "urand01", (m, k) if op_a == "N" else (k, m),
                            seed=0, complex_=complex_,
                        )
                        b = generate_input(
                            "urand01", (k, n) if op_b == "N" else (n, k),
                            seed=1, complex_=complex_,
                        )
                        cs = [
                            oz.gemm(a, b, mode=mode, op_a=op_a, op_b=op_b)
                            for mode in modes
                        ]
                        ae = np.ascontiguousarray(a if op_a == "N" else a.T)
                        be = np.ascontiguousarray(b if op_b == "N" else b.T)
                        errs = native.error_metrics_multi_native(cs, ae, be)
                        if errs is None:  # no native oracle: numpy fallback
                            errs = [error_metrics(c, ae, be) for c in cs]
                        for mode, err in zip(modes, errs):
                            total += 1
                            print(
                                f"{dev},{'Z' if complex_ else 'D'},urand01,"
                                f"{mode},{op_a},{op_b},{m},{n},{k},"
                                f"{err['relative_residual']:e},"
                                f"{err['max_relative_error']:e},nan",
                                flush=True,
                            )
                            if err["relative_residual"] >= 1e-15:
                                print("^^^ FAILED ^^^^", flush=True)
                                num_errors += 1
    print(f"{total - num_errors:5d} / {total:5d} PASSED", flush=True)
    return 1 if num_errors else 0


def run_matfile(path_a: str, path_b: str, modes, test_count: int) -> int:
    """Real-matrix replay (reference matfile mode, main_test.cu:273-406):
    load A and B from .npy files and evaluate each mode."""
    import ozimmu_tpu as oz
    from ozimmu_tpu.testing import error_metrics

    a = np.load(path_a)
    b = np.load(path_b)
    m, k = a.shape
    n = b.shape[1]
    complex_ = np.iscomplexobj(a)
    from ozimmu_tpu.testing import effective_tflops

    print("device,gemm,input,mode,opA,opB,m,n,k,residual,max_relative,tflops")
    for mode in modes:
        c = oz.gemm(a, b, mode=mode)
        err = error_metrics(c, a, b)
        tflops = effective_tflops(a, b, mode, test_count)
        print(
            f"{_device_name()},{'Z' if complex_ else 'D'},matfile,{mode},N,N,"
            f"{m},{n},{k},{err['relative_residual']:e},"
            f"{err['max_relative_error']:e},{tflops:e}",
            flush=True,
        )
    return 0


_RAW_DTYPES = {
    "fp32": np.float32,
    "fp64": np.float64,
    # x86-64 long double: 80-bit extended in 16 bytes — the same layout
    # the reference's fp128 matfiles hold (main_test.cu:273-302 loads
    # long double)
    "fp128": np.longdouble,
}


def load_raw_matrix(path: str, m: int, n: int, dtype: str, order: str = "F") -> np.ndarray:
    """Raw binary matrix loader (reference matfile replay parity,
    main_test.cu:273-302: fp32/fp64/fp128 dense files).

    Documented deviation: the reference's ``mtk::matfile`` self-describing
    header comes from a submodule that is not checked out in the
    reference snapshot, so this loader takes dtype/shape explicitly
    (column-major by default, the BLAS convention the reference uses).
    ``.npy`` files (run_matfile) remain the self-describing path.
    """
    if dtype not in _RAW_DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_RAW_DTYPES)}, got {dtype!r}")
    raw = np.fromfile(path, dtype=_RAW_DTYPES[dtype])
    if raw.size != m * n:
        raise ValueError(
            f"{path}: expected {m}x{n} = {m*n} elements of {dtype}, found {raw.size}"
        )
    return np.asarray(raw.reshape((m, n), order=order), dtype=np.float64)


def run_matfile_raw(
    path_a: str, path_b: str, m: int, k: int, n: int, dtype: str, modes, test_count: int
) -> int:
    """Evaluate modes on raw-binary operand dumps (fp32/fp64/fp128)."""
    import ozimmu_tpu as oz
    from ozimmu_tpu.testing import effective_tflops, error_metrics

    a = load_raw_matrix(path_a, m, k, dtype)
    b = load_raw_matrix(path_b, k, n, dtype)
    print("device,gemm,input,mode,opA,opB,m,n,k,residual,max_relative,tflops")
    for mode in modes:
        c = oz.gemm(a, b, mode=mode)
        err = error_metrics(c, a, b)
        tflops = effective_tflops(a, b, mode, test_count)
        print(
            f"{_device_name()},D,matfile-{dtype},{mode},N,N,"
            f"{m},{n},{k},{err['relative_residual']:e},"
            f"{err['max_relative_error']:e},{tflops:e}",
            flush=True,
        )
    return 0


class _PowerSampler:
    """Load-window power measurement; ``average_watts`` is None if no
    probe works.

    The reference samples NVML *during* its run loops
    (test/main_test.cu:473-498).  TPU equivalents probed here: (1) hwmon/
    sysfs cumulative ENERGY counters (microjoules) — read once at start
    and once at stop, average watts = delta / elapsed; (2) instantaneous
    POWER counters (microwatts; TPU-VM ``accel`` driver or generic hwmon)
    — sampled every 200 ms on a thread while the load runs and
    time-averaged; (3) the libtpu metrics API, sampled the same way.  On
    this platform the chip sits behind a remote axon tunnel, so all local
    probes are expected to miss — but they are real probes, and each
    yields a load-average (never a single idle-time sample).
    """

    _ENERGY_PATS = ("/sys/class/hwmon/hwmon*/energy1_input",)
    _POWER_PATS = (
        "/sys/class/accel/accel*/device/power_usage",
        "/sys/class/hwmon/hwmon*/power1_input",
    )

    def __init__(self):
        import glob

        self._energy_path = next(
            (p for pat in self._ENERGY_PATS for p in glob.glob(pat)), None
        )
        self._power_path = next(
            (p for pat in self._POWER_PATS for p in glob.glob(pat)), None
        )
        self._samples = []
        self._thread = None
        self._stop = None
        self._e0 = self._t0 = None

    @staticmethod
    def _read_uf(path):
        with open(path) as f:
            return float(f.read().strip())

    def _read_power_w(self):
        if self._power_path is not None:
            try:
                return self._read_uf(self._power_path) / 1e6  # uW -> W
            except (OSError, ValueError):
                return None
        try:  # libtpu metrics (local TPU VMs only, not over tunnels)
            from tpu_info import metrics  # type: ignore

            return float(metrics.get_chip_power()[0])
        except Exception:
            return None

    def start(self):
        import threading
        import time

        self._t0 = time.perf_counter()
        if self._energy_path is not None:
            try:
                self._e0 = self._read_uf(self._energy_path)
            except (OSError, ValueError):
                self._e0 = None
        if self._read_power_w() is None:
            return  # no instantaneous probe: skip the sampler thread
        self._stop = threading.Event()

        def loop():
            while not self._stop.wait(0.2):
                w = self._read_power_w()
                if w is not None:
                    self._samples.append(w)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        """Returns average watts over the start..stop window, or None."""
        import time

        elapsed = time.perf_counter() - self._t0
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=2.0)
        if self._energy_path is not None and self._e0 is not None and elapsed > 0:
            try:
                e1 = self._read_uf(self._energy_path)
                if e1 >= self._e0:
                    return (e1 - self._e0) / 1e6 / elapsed  # uJ -> J -> W
            except (OSError, ValueError):
                pass
        if self._samples:
            return sum(self._samples) / len(self._samples)
        return None


def run_power(gemm_kind: str, mode: str, size: int, min_seconds: float) -> int:
    """Sustained-throughput loop (reference power mode,
    main_test.cu:408-512: >=10 s NVML-sampled loops reporting TFLOPS, avg
    W and GFLOPS/W).  All reported fields are measured: ``iters`` counts
    engine iterations actually executed and ``avg_time`` is elapsed/iters
    (testing.sustained_run).  Watts are sampled DURING the load window by
    _PowerSampler; 'n/a' means every probe came back empty on this
    platform."""
    from ozimmu_tpu.testing import generate_input, sustained_run

    complex_ = gemm_kind == "zgemm"
    a = generate_input("urand01", (size, size), seed=0, complex_=complex_)
    b = generate_input("urand01", (size, size), seed=1, complex_=complex_)
    sampler = _PowerSampler()
    # sampler.start fires at measured-window open — AFTER compiles and
    # warmup — so the energy/power average covers only the load window
    # (the reference samples NVML only during its run loops)
    tflops, n_iter, avg_time = sustained_run(
        a, b, mode, min_seconds=min_seconds, on_measure_start=sampler.start
    )
    watts = sampler.stop()
    if watts is not None:
        w_s = f"{watts:.1f}"
        eff_s = f"{tflops * 1e3 / watts:.2f}"
    else:
        w_s = eff_s = "n/a"
    print(
        f"power,{_device_name()},{mode},m=n=k={size},iters={n_iter},"
        f"avg_time={avg_time:.4e}s,tflops={tflops:.4g},watts={w_s},"
        f"gflops_per_w={eff_s}",
        flush=True,
    )
    return 0


def run_hpl(
    mode: str,
    size: int,
    block: int,
    refine: int,
    device: str = "auto",
    warmup: bool = False,
    profile: bool = False,
    panel: str = "auto",
    seed: int = 0,
    dtype: str = "d",
) -> int:
    """HPL-class solver benchmark: blocked LU factor + solve on the engine
    (the reference's motivating workload — its shim exists to accelerate
    HPL's dgemm calls, src/cublas.cu:280-295).  Reports factorization
    wall time, effective FP64 GFLOPS at the LU operation count
    (2/3 n^3), and the final solve residual (scaled, HPL-style).

    ``device`` = on|off|auto selects the device-resident factorization
    (linalg.lu_factor(device=True): trailing matrix stays on device as
    F64X; auto = on for non-CPU backends).  On the device path the test
    matrix is generated on device (exact f32->f64 widening, diagonal set
    to n for a refinement-friendly condition number) and the residual
    matvecs run through the engine — the matrix never crosses the host
    boundary.  ``warmup`` runs the factorization once untimed first
    (pays per-step XLA compiles; the persistent cache keeps them across
    processes).  ``profile`` adds a per-phase breakdown (syncs at phase
    boundaries — wall time is then pessimistic; the headline time is
    always measured unprofiled).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from ozimmu_tpu import linalg
    from ozimmu_tpu.testing import generate_input

    device_resident = device == "on" or (
        device == "auto" and jax.default_backend() != "cpu"
    )
    if panel == "auto":
        # over a remote tunnel the host-panel traffic is the wall; the
        # fully resident variant (device panels in platform f64) is the
        # production configuration on an accelerator backend
        panel = "device" if (
            device_resident and jax.default_backend() != "cpu"
        ) else "host"
    rng_b = np.random.default_rng(99 + seed)
    x_true = rng_b.standard_normal(size)

    if dtype == "z":
        # ZHPL: complex LU through the 4-pass engine (round-5 complex
        # device-resident factorization).  A is host-built (the complex
        # device path takes numpy complex128 and carries (re, im) F64X
        # plane pairs internally); b and the residual are host matVECs —
        # O(n^2), exact enough at f64 for the HPL gate.  FLOP accounting
        # is x4 the real count ((8/3) n^3), matching the harness's x4
        # complex-GEMM convention (reference test/main_test.cu:140-141).
        x_true = x_true + 1j * rng_b.standard_normal(size)
        import os as _os

        gen_device = device_resident and (
            jax.default_backend() != "cpu"
            or _os.environ.get("OZ_HPL_DEVICE_GEN") == "1"  # test hook
        )
        if gen_device:
            # ON-DEVICE operand generation: over a remote tunnel the
            # O(n^2 * 16 B) complex-operand upload dominates (and has
            # been observed to wedge the terminal); exact f32->f64
            # widening on device, diagonal set to n (real) for a
            # refinement-friendly condition number.
            from ozimmu_tpu.core.api import _f64x_to_f32
            from ozimmu_tpu.core.f64x import F64X, from_f32
            from ozimmu_tpu.core.gemm import zgemm_f64x
            from ozimmu_tpu.linalg import (
                _resolve_int8_num_split,
                _zlu_factor_device,
            )

            ns_z = _resolve_int8_num_split(mode, None)
            idx = jnp.arange(size)

            def genz(key):
                kr, ki = jax.random.split(key)
                ur = jax.random.uniform(kr, (size, size), dtype=jnp.float32)
                ur = ur.at[idx, idx].set(jnp.float32(size))
                ui = jax.random.uniform(
                    ki, (size, size), dtype=jnp.float32
                ) - jnp.float32(0.5)
                ui = ui.at[idx, idx].set(jnp.float32(0))
                xr, xi = from_f32(ur), from_f32(ui)
                return xr.hi, xr.lo, xi.hi, xi.lo

            planes_in = jax.jit(genz)(jax.random.PRNGKey(seed))
            float(jax.device_get(planes_in[0][0, 0]))  # true barrier
            ar32 = _f64x_to_f32(F64X(planes_in[0], planes_in[1]))
            ai32 = _f64x_to_f32(F64X(planes_in[2], planes_in[3]))
            norm_a = float(
                jnp.sqrt(
                    jnp.linalg.norm(ar32) ** 2 + jnp.linalg.norm(ai32) ** 2
                )
            )

            def zmatvec(v, alpha=1.0, beta=0.0, c=None):
                # engine complex matvec in row blocks (cf. the real
                # path's matvec: split-A working set capped ~1 GiB)
                vr = F64X.from_numpy(np.ascontiguousarray(v.real[:, None]))
                vi = F64X.from_numpy(np.ascontiguousarray(v.imag[:, None]))
                rows = max(
                    256, min(size, (1 << 30) // (24 * size)) // 256 * 256
                )
                out = np.empty(size, dtype=np.complex128)
                for r0 in range(0, size, rows):
                    r1 = min(r0 + rows, size)
                    cr = ci = None
                    if c is not None:
                        cr = F64X.from_numpy(
                            np.ascontiguousarray(c.real[r0:r1, None])
                        )
                        ci = F64X.from_numpy(
                            np.ascontiguousarray(c.imag[r0:r1, None])
                        )
                    o_re, o_im = zgemm_f64x(
                        F64X(planes_in[0][r0:r1], planes_in[1][r0:r1]),
                        F64X(planes_in[2][r0:r1], planes_in[3][r0:r1]),
                        vr, vi, 12, complex(alpha), complex(beta), cr, ci,
                    )
                    out[r0:r1] = (
                        o_re.to_numpy() + 1j * o_im.to_numpy()
                    ).reshape(-1)
                return out

            b = zmatvec(x_true)

            def factor(prof=None):
                # timed to a device_get of one element of the final
                # plane (true barrier over the tunnel), NOT the O(n^2)
                # LU pull
                planes, piv = _zlu_factor_device(
                    tuple(planes_in), ns_z, block, profile=prof,
                    panel=panel, return_planes=True,
                )
                float(jax.device_get(planes[0][0, 0]))
                return planes, piv

        else:
            rng_z = np.random.default_rng(7 + seed)
            a = (
                rng_z.uniform(size=(size, size))
                + 1j * (rng_z.uniform(size=(size, size)) - 0.5)
            )
            a[np.arange(size), np.arange(size)] = size  # diag dominant
            norm_a = np.linalg.norm(a)
            b = a @ x_true

            if device_resident:
                from ozimmu_tpu.core.f64x import F64X
                from ozimmu_tpu.linalg import (
                    _resolve_int8_num_split,
                    _zlu_factor_device,
                )

                ns_z = _resolve_int8_num_split(mode, None)

                def factor(prof=None):
                    planes, piv = _zlu_factor_device(
                        a, ns_z, block, profile=prof, panel=panel,
                        return_planes=True,
                    )
                    float(jax.device_get(planes[0][0, 0]))
                    return planes, piv
            else:

                def factor(prof=None):
                    return linalg.lu_factor(
                        a, mode=mode, block=block, profile=prof,
                    )

        if warmup:
            fac = factor()
            del fac
        t0 = _time.perf_counter()
        fac = factor()
        t_factor = _time.perf_counter() - t0
        if device_resident:
            from ozimmu_tpu.core.f64x import F64X

            planes, piv = fac
            lu_np = (
                F64X(planes[0], planes[1]).to_numpy()
                + 1j * F64X(planes[2], planes[3]).to_numpy()
            ).reshape(size, size)
            fac = (lu_np, piv)
        if gen_device:
            # A never exists on host: plain substitution solve (refine
            # would need host-A residuals; the z device benchmark runs
            # refine=0 — the factorization is already exact-grade)
            x = linalg.lu_solve(fac, b)
            r_vec = zmatvec(x, alpha=-1.0, beta=1.0, c=b)  # b - A @ x
        else:
            x = linalg.solve(a, b, factor=fac, refine=refine)
            r_vec = b - a @ x
        resid = np.linalg.norm(r_vec) / (
            norm_a * np.linalg.norm(x) + np.linalg.norm(b)
        )
        gflops = (8.0 / 3.0) * size**3 / t_factor / 1e9
        print(
            f"zhpl,{_device_name()},{mode},n={size},block={block},"
            f"factor_time={t_factor:.4e}s,gflops_x4={gflops:.4g},"
            f"refine={refine},residual={resid:.4e},"
            f"resident={'device' if device_resident else 'host'},"
            f"panel={panel if device_resident else 'host'}",
            flush=True,
        )
        return 0 if resid < 1e-14 else 1

    if device_resident:
        from ozimmu_tpu.core.api import _f64x_to_f32
        from ozimmu_tpu.core.f64x import F64X, from_f32

        def gen(key):
            u = jax.random.uniform(key, (size, size), dtype=jnp.float32)
            idx = jnp.arange(size)
            # diagonally dominant (refinement-friendly), like the host path
            u = u.at[idx, idx].set(jnp.float32(size))
            return from_f32(u)

        ax = jax.jit(gen)(jax.random.PRNGKey(seed))
        jax.block_until_ready(ax.hi)
        norm_a = float(jnp.linalg.norm(_f64x_to_f32(ax)))
        import ozimmu_tpu as oz

        def matvec(v, alpha=1.0, beta=0.0, c=None):
            # engine matvec in row blocks: column-panel chunking cannot
            # help an n x 1 B, and the unchunked setup gemm's ns=12
            # split planes (12 * n^2 int8) + temps OOM 16 GB at
            # n=16384 — cap the split-A working set at ~1 GiB instead.
            # Row blocking is bitwise-exact (each output row's full-k
            # contraction stays within one engine call).
            vX = F64X.from_numpy(np.ascontiguousarray(v[:, None]))
            rows = max(256, min(size, (1 << 30) // (12 * size)) // 256 * 256)
            out = np.empty(size)
            for r0 in range(0, size, rows):
                r1 = min(r0 + rows, size)
                cX = None
                if c is not None:
                    cX = F64X.from_numpy(
                        np.ascontiguousarray(c[r0:r1, None])
                    )
                blk = F64X(ax.hi[r0:r1], ax.lo[r0:r1])
                out[r0:r1] = oz.gemm(
                    blk, vX, mode="fp64_int8_12",
                    alpha=alpha, beta=beta, c=cX,
                ).to_numpy().reshape(-1)
            return out

        # b = A @ x_true through the engine (exact to one f64 rounding)
        b = matvec(x_true)

        def factor(prof=None):
            return linalg.lu_factor(
                ax, mode=mode, block=block, profile=prof, panel=panel
            )

        a_for_solve = ax
    else:
        a = generate_input("urand01", (size, size), seed=seed)
        a = a + size * np.eye(size)  # diagonally dominant
        norm_a = np.linalg.norm(a)
        b = a @ x_true

        def factor(prof=None):
            return linalg.lu_factor(a, mode=mode, block=block)

        a_for_solve = a

    if warmup:
        fac = factor()
        del fac
    phases = {}
    t0 = _time.perf_counter()
    fac = factor()
    if device_resident:
        # device_get of one element of the final plane: a TRUE barrier
        # (block_until_ready can return early over the axon tunnel on
        # re-dispatched computations)
        float(jax.device_get(fac[0].hi[0, 0]))
    t_factor = _time.perf_counter() - t0
    if profile and device_resident:
        factor(phases)  # second, instrumented pass (syncs per phase)

    x = linalg.solve(a_for_solve, b, factor=fac, refine=refine)
    if device_resident:
        r_vec = matvec(x, alpha=-1.0, beta=1.0, c=b)  # b - A @ x
    else:
        r_vec = b - a_for_solve @ x
    resid = np.linalg.norm(r_vec) / (
        norm_a * np.linalg.norm(x) + np.linalg.norm(b)
    )
    gflops = (2.0 / 3.0) * size**3 / t_factor / 1e9
    extra = "".join(
        f",{k}={v:.4e}s" for k, v in sorted(phases.items())
    )
    print(
        f"hpl,{_device_name()},{mode},n={size},block={block},"
        f"factor_time={t_factor:.4e}s,gflops={gflops:.4g},"
        f"refine={refine},residual={resid:.4e},"
        f"resident={'device' if device_resident else 'host'},"
        f"panel={panel if device_resident else 'host'}{extra}",
        flush=True,
    )
    return 0 if resid < 1e-14 else 1


def main(argv=None) -> int:
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon remote-TPU plugin hooks get_backend and only honors
        # the config setting — the env var alone still dials the tunnel
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: hpl factorizations compile one large
    # engine program per (j, jb) outer step — cache them across runs
    # (same setup as bench.py / tools/*).  OZ_NO_COMPILE_CACHE=1 opts
    # out, for cold-compile measurements or when diagnosing tunnel
    # stalls (note: apparent client "hangs" over the axon tunnel are
    # usually the remote compile queue serving a request tens of
    # minutes late — judge liveness over 30-60 min via /proc/<pid>/io
    # and CPU time before giving up on a run).
    if os.environ.get("OZ_NO_COMPILE_CACHE") != "1":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/ozimmu_jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "matfile":
        q = argparse.ArgumentParser()
        q.add_argument("cmd")
        q.add_argument("a_npy")
        q.add_argument("b_npy")
        q.add_argument("modes", nargs="?", default="fp64_int8_9")
        q.add_argument("--test-count", type=int, default=1)
        ar = q.parse_args(argv)
        return run_matfile(ar.a_npy, ar.b_npy, ar.modes.split(","), ar.test_count)
    if argv and argv[0] == "matfile_raw":
        q = argparse.ArgumentParser()
        q.add_argument("cmd")
        q.add_argument("a_bin")
        q.add_argument("b_bin")
        q.add_argument("m", type=int)
        q.add_argument("k", type=int)
        q.add_argument("n", type=int)
        q.add_argument("--dtype", default="fp64", choices=sorted(_RAW_DTYPES))
        q.add_argument("modes", nargs="?", default="fp64_int8_9")
        q.add_argument("--test-count", type=int, default=1)
        ar = q.parse_args(argv)
        return run_matfile_raw(
            ar.a_bin, ar.b_bin, ar.m, ar.k, ar.n, ar.dtype,
            ar.modes.split(","), ar.test_count,
        )
    if argv and argv[0] == "hpl":
        q = argparse.ArgumentParser()
        q.add_argument("cmd")
        q.add_argument("mode", nargs="?", default="fp64_int8_9")
        q.add_argument("size", nargs="?", type=int, default=4096)
        q.add_argument("--block", type=int, default=1024)
        q.add_argument("--refine", type=int, default=0)
        q.add_argument("--device", default="auto", choices=["auto", "on", "off"])
        q.add_argument("--panel", default="auto", choices=["auto", "host", "device"])
        q.add_argument("--warmup", action="store_true")
        q.add_argument("--profile", action="store_true")
        q.add_argument("--seed", type=int, default=0)
        q.add_argument("--dtype", default="d", choices=["d", "z"])
        ar = q.parse_args(argv)
        return run_hpl(
            ar.mode, ar.size, ar.block, ar.refine,
            device=ar.device, warmup=ar.warmup, profile=ar.profile,
            panel=ar.panel, seed=ar.seed, dtype=ar.dtype,
        )
    if argv and argv[0] == "power":
        q = argparse.ArgumentParser()
        q.add_argument("cmd")
        q.add_argument("gemm", nargs="?", default="dgemm", choices=["dgemm", "zgemm"])
        q.add_argument("mode", nargs="?", default="fp64_int8_9")
        q.add_argument("size", nargs="?", type=int, default=4096)
        q.add_argument("--min-seconds", type=float, default=10.0)
        ar = q.parse_args(argv)
        return run_power(ar.gemm, ar.mode, ar.size, ar.min_seconds)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="urand01|normal01|exp_rand-<phi>|ci_test")
    p.add_argument("gemm", nargs="?", default="dgemm", choices=["dgemm", "zgemm"])
    p.add_argument("modes", nargs="?", default="fp64_int8_9",
                   help="comma-separated compute modes")
    p.add_argument("size_mode", nargs="?", default="seq", choices=["seq", "exp2"])
    p.add_argument("start", nargs="?", type=int, default=1024)
    p.add_argument("end", nargs="?", type=int, default=1024)
    p.add_argument("interval", nargs="?", type=int, default=1024)
    p.add_argument("--test-count", type=int, default=10)
    p.add_argument("--ops", default="NN", help="pairs like NN,NT,TN,TT")
    p.add_argument("--ci-sizes", default="1023,1024,1025")
    args = p.parse_args(argv)

    if args.input == "ci_test":
        sizes = tuple(int(s) for s in args.ci_sizes.split(","))
        return run_ci_test(sizes)

    print("device,gemm,input,mode,opA,opB,m,n,k,residual,max_relative,tflops")
    rc = 0
    for size in _size_list(args.size_mode, args.start, args.end, args.interval):
        for mode in args.modes.split(","):
            for ops in args.ops.split(","):
                rc |= _run_case(
                    args.gemm, args.input, mode, ops[0], ops[1],
                    size, size, size, args.test_count,
                )
    return rc


if __name__ == "__main__":
    sys.exit(main())
