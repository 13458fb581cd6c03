"""Native (C++/OpenMP) host components, loaded via ctypes.

Builds ``liboz_oracle.so`` from ``oracle.cpp`` on first use (cached next
to the source; rebuilds when the source is newer).  Falls back cleanly to
numpy implementations when no C++ toolchain is available — every entry
point here has a pure-Python twin in :mod:`ozimmu_tpu.testing` /
:mod:`ozimmu_tpu.hostref`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.cpp")
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _so_path() -> str:
    # The source hash is part of the filename so a stale cached build (e.g.
    # under OZIMMU_NATIVE_CACHE with a fresher mtime than a changed
    # oracle.cpp) can never be loaded against newer symbol expectations.
    import hashlib

    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    cache = os.environ.get("OZIMMU_NATIVE_CACHE", _HERE)
    return os.path.join(cache, f"liboz_oracle-{tag}.so")


def _build() -> Optional[str]:
    so = _so_path()
    try:
        if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
            return so
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            "-std=c++17", _SRC, "-o", so,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return so
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _LOCK:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
            i64, i32, f64p, i8p, i32p = (
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_int32),
            )
            lib.oz_error_metrics_d.argtypes = [i64, i64, i64, f64p, f64p, f64p, f64p]
            lib.oz_error_metrics_z.argtypes = [i64, i64, i64, f64p, f64p, f64p, f64p]
            lib.oz_ref_gemm_d.argtypes = [i64, i64, i64, f64p, f64p, f64p]
            lib.oz_split_fp64.argtypes = [i64, i64, f64p, i32, i32, i8p, i32p]
            pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_double))
            lib.oz_error_metrics_d_multi.argtypes = [i64, i64, i64, f64p, f64p, pp, i64, f64p]
            lib.oz_error_metrics_z_multi.argtypes = [i64, i64, i64, f64p, f64p, pp, i64, f64p]
        except (OSError, AttributeError):
            # load or symbol lookup failed (e.g. corrupt cached .so):
            # documented clean fallback is numpy, not an exception
            _build_failed = True
            return None
        _lib = lib
        return _lib


def _f64p(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def error_metrics_native(
    c: np.ndarray, a: np.ndarray, b: np.ndarray
) -> Optional[Dict[str, float]]:
    """Streamed long-double error metrics; None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    m, k = a.shape
    n = b.shape[1]
    out = np.zeros(2, dtype=np.float64)
    if np.iscomplexobj(a):
        ac = np.ascontiguousarray(a, dtype=np.complex128).view(np.float64)
        bc = np.ascontiguousarray(b, dtype=np.complex128).view(np.float64)
        cc = np.ascontiguousarray(c, dtype=np.complex128).view(np.float64)
        lib.oz_error_metrics_z(m, n, k, _f64p(ac), _f64p(bc), _f64p(cc), _f64p(out))
    else:
        ac = np.ascontiguousarray(a, dtype=np.float64)
        bc = np.ascontiguousarray(b, dtype=np.float64)
        cc = np.ascontiguousarray(c, dtype=np.float64)
        lib.oz_error_metrics_d(m, n, k, _f64p(ac), _f64p(bc), _f64p(cc), _f64p(out))
    return {"relative_residual": float(out[0]), "max_relative_error": float(out[1])}


def error_metrics_multi_native(cs, a: np.ndarray, b: np.ndarray):
    """Metrics for MANY candidate C matrices against one long-double
    reference accumulation (9x less oracle work when sweeping modes over
    the same operands).  Returns a list of metric dicts, or None."""
    lib = get_lib()
    if lib is None or len(cs) > 32:
        return None
    m, k = a.shape
    n = b.shape[1]
    nc = len(cs)
    out = np.zeros(2 * nc, dtype=np.float64)
    if np.iscomplexobj(a):
        ac = np.ascontiguousarray(a, dtype=np.complex128).view(np.float64)
        bc = np.ascontiguousarray(b, dtype=np.complex128).view(np.float64)
        ccs = [np.ascontiguousarray(c, dtype=np.complex128).view(np.float64) for c in cs]
        fn = lib.oz_error_metrics_z_multi
    else:
        ac = np.ascontiguousarray(a, dtype=np.float64)
        bc = np.ascontiguousarray(b, dtype=np.float64)
        ccs = [np.ascontiguousarray(c, dtype=np.float64) for c in cs]
        fn = lib.oz_error_metrics_d_multi
    ptrs = (ctypes.POINTER(ctypes.c_double) * nc)(*[_f64p(c) for c in ccs])
    fn(m, n, k, _f64p(ac), _f64p(bc), ptrs, nc, _f64p(out))
    return [
        {"relative_residual": float(out[2 * i]), "max_relative_error": float(out[2 * i + 1])}
        for i in range(nc)
    ]


def ref_gemm_native(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    if np.iscomplexobj(a) or np.iscomplexobj(b):
        # only the real-product symbol exists; silently viewing complex
        # as f64 would drop the imaginary parts — let callers fall back
        # to testing.reference_gemm (clongdouble)
        return None
    lib = get_lib()
    if lib is None:
        return None
    m, k = a.shape
    n = b.shape[1]
    c = np.zeros((m, n), dtype=np.float64)
    lib.oz_ref_gemm_d(
        m, n, k,
        _f64p(np.ascontiguousarray(a, np.float64)),
        _f64p(np.ascontiguousarray(b, np.float64)),
        _f64p(c),
    )
    return c


def split_fp64_native(x: np.ndarray, ns: int, b: int):
    lib = get_lib()
    if lib is None:
        return None
    rows, k = x.shape
    digits = np.empty((ns, rows, k), dtype=np.int8)
    pexp = np.empty(rows, dtype=np.int32)
    xc = np.ascontiguousarray(x, np.float64)
    lib.oz_split_fp64(
        rows, k, _f64p(xc), ns, b,
        digits.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        pexp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return digits, pexp
