"""ctypes bindings for the native setup-kernel library (csrc/).

The AMG setup phase is irregular host-side graph work — the part hypre
implements in C (strength/coarsening/interpolation/RAP). ``csrc/
hypre_tpu_native.cpp`` provides C++/OpenMP kernels over plain CSR arrays;
this module builds the shared library on first use (g++ is baked into the
image; there is no pybind11, so plain ctypes) and exposes numpy-level
wrappers. Everything degrades gracefully: ``available()`` is False if no
compiler is present and callers fall back to the jax implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC = os.path.join(_HERE, "csrc")
_SO = os.path.join(_CSRC, "libhypre_tpu_native.so")

_lib = None
_lock = threading.Lock()

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32 = ctypes.c_int32
_f64 = ctypes.c_double


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "-s"], check=True, capture_output=True
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_CSRC, "hypre_tpu_native.cpp")
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.strength_mask.argtypes = [_i32, _i32p, _i32p, _f64p, _f64, _f64, _u8p]
        lib.pmis_coarsen.argtypes = [_i32, _i32p, _i32p, _u8p, _i32, _i32p]
        lib.rs_coarsen.argtypes = [_i32, _i32p, _i32p, _u8p, _i32p]
        lib.spgemm_symbolic.argtypes = [_i32, _i32, _i32p, _i32p, _i32p, _i32p, _i32p]
        lib.spgemm_numeric.argtypes = [
            _i32, _i32, _i32p, _i32p, _f64p, _i32p, _i32p, _f64p, _i32p, _i32p, _f64p,
        ]
        lib.csr_transpose.argtypes = [_i32, _i32, _i32p, _i32p, _f64p, _i32p, _i32p, _f64p]
        lib.extpi_symbolic.argtypes = [_i32, _i32p, _i32p, _u8p, _i32p, _i32p]
        lib.extpi_numeric.argtypes = [
            _i32, _i32p, _i32p, _f64p, _u8p, _i32p, _i32p, _i32p, _i32p, _f64p,
        ]
        lib.interp_truncate.argtypes = [_i32, _i32p, _i32p, _f64p, _i32, _f64]
        lib.interp_truncate.restype = _i32
        lib.csr_matvec.argtypes = [_i32, _i32p, _i32p, _f64p, _f64p, _f64p]
        lib.direct_symbolic.argtypes = [_i32, _i32p, _i32p, _u8p, _i32p, _i32p]
        lib.direct_numeric.argtypes = [
            _i32, _i32p, _i32p, _f64p, _u8p, _i32p, _i32p, _i32p, _i32p, _f64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# -- numpy-level wrappers (CSR = (indptr i32, indices i32, data f64)) ---------


def strength(n, Ap, Aj, Ax, theta: float, max_row_sum: float = 1.0) -> np.ndarray:
    lib = _load()
    S = np.zeros(len(Aj), np.uint8)
    lib.strength_mask(n, Ap, Aj, Ax, theta, max_row_sum, S)
    return S


def pmis(n, Ap, Aj, S, row_offset: int = 0) -> np.ndarray:
    lib = _load()
    cf = np.zeros(n, np.int32)
    lib.pmis_coarsen(n, Ap, Aj, S, row_offset, cf)
    return cf


def rs(n, Ap, Aj, S) -> np.ndarray:
    lib = _load()
    cf = np.zeros(n, np.int32)
    lib.rs_coarsen(n, Ap, Aj, S, cf)
    return cf


def spgemm(n, m, Ap, Aj, Ax, Bp, Bj, Bx):
    lib = _load()
    Cp = np.zeros(n + 1, np.int32)
    lib.spgemm_symbolic(n, m, Ap, Aj, Bp, Bj, Cp)
    nnz = int(Cp[-1])
    Cj = np.zeros(nnz, np.int32)
    Cx = np.zeros(nnz, np.float64)
    lib.spgemm_numeric(n, m, Ap, Aj, Ax, Bp, Bj, Bx, Cp, Cj, Cx)
    return Cp, Cj, Cx


def transpose(n, m, Ap, Aj, Ax):
    lib = _load()
    nnz = int(Ap[-1])
    Tp = np.zeros(m + 1, np.int32)
    Tj = np.zeros(nnz, np.int32)
    Tx = np.zeros(nnz, np.float64)
    lib.csr_transpose(n, m, Ap, Aj, Ax, Tp, Tj, Tx)
    return Tp, Tj, Tx


def extpi_interp(n, Ap, Aj, Ax, S, cf, cmap):
    lib = _load()
    Pp = np.zeros(n + 1, np.int32)
    lib.extpi_symbolic(n, Ap, Aj, S, cf, Pp)
    nnz = int(Pp[-1])
    Pj = np.zeros(nnz, np.int32)
    Px = np.zeros(nnz, np.float64)
    lib.extpi_numeric(n, Ap, Aj, Ax, S, cf, cmap, Pp, Pj, Px)
    # drop sentinel (-1) slots: rows with positive strong off-diagonals get
    # fewer numeric entries than the symbolic bound (see extpi_numeric)
    keep = Pj >= 0
    if not keep.all():
        rows = np.repeat(np.arange(n), np.diff(Pp))
        counts = np.bincount(rows[keep], minlength=n).astype(np.int32)
        Pp = np.zeros(n + 1, np.int32)
        np.cumsum(counts, out=Pp[1:])
        Pj, Px = Pj[keep], Px[keep]
    return Pp, Pj, Px


def truncate(n, Pp, Pj, Px, max_elmts: int, trunc_factor: float):
    lib = _load()
    nnz = int(lib.interp_truncate(n, Pp, Pj, Px, max_elmts, trunc_factor))
    return Pp, Pj[:nnz], Px[:nnz]


def matvec(n, Ap, Aj, Ax, x) -> np.ndarray:
    lib = _load()
    y = np.zeros(n, np.float64)
    lib.csr_matvec(n, Ap, Aj, Ax, np.ascontiguousarray(x, np.float64), y)
    return y


def direct_interp(n, Ap, Aj, Ax, S, cf, cmap):
    lib = _load()
    Pp = np.zeros(n + 1, np.int32)
    lib.direct_symbolic(n, Ap, Aj, S, cf, Pp)
    nnz = int(Pp[-1])
    Pj = np.zeros(nnz, np.int32)
    Px = np.zeros(nnz, np.float64)
    lib.direct_numeric(n, Ap, Aj, Ax, S, cf, cmap, Pp, Pj, Px)
    return Pp, Pj, Px
