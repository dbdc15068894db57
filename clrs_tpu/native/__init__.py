"""ctypes bindings for the native host dd library (builds on first use).

Provides double-double Gram/Cholesky/QR/matmul/polyval for the setup path;
callers fall back to mpmath when the shared library is unavailable or a
higher precision is requested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libddhost.so")
_SRC = os.path.join(_HERE, "ddhost.cpp")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                [
                    "g++",
                    "-O2",
                    "-march=native",
                    "-ffp-contract=off",  # explicit fma only; EFTs need it
                    "-shared",
                    "-fPIC",
                    _SRC,
                    "-o",
                    _SO,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        I64 = ctypes.c_int64
        DP = ctypes.POINTER(ctypes.c_double)
        lib.dd_matmul.argtypes = [DP, DP, DP, I64, I64, I64]
        lib.dd_gram.argtypes = [DP, DP, I64, I64]
        lib.dd_cholesky.argtypes = [DP, I64]
        lib.dd_cholesky.restype = ctypes.c_int
        lib.dd_solve_tril.argtypes = [DP, DP, I64, I64, ctypes.c_int]
        lib.dd_qr.argtypes = [DP, DP, DP, I64, I64]
        lib.dd_qr.restype = ctypes.c_int
        lib.dd_polyval.argtypes = [DP, I64, DP, DP, I64]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def to_dd(a) -> np.ndarray:
    """mpmath/float array -> interleaved dd (..., 2) float64."""
    arr = np.asarray(a, dtype=object)
    out = np.zeros(arr.shape + (2,), dtype=np.float64)
    it = np.nditer(arr, flags=["multi_index", "refs_ok"])
    for v in it:
        val = v.item()
        hi = float(val)
        lo = float(val - hi) if not isinstance(val, float) else 0.0
        out[it.multi_index] = (hi, lo)
    return out


def from_dd(a: np.ndarray):
    """interleaved dd -> mpmath object array (exact)."""
    import mpmath

    hi = a[..., 0]
    lo = a[..., 1]
    out = np.empty(hi.shape, dtype=object)
    it = np.nditer(hi, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        out[idx] = mpmath.mpf(float(hi[idx])) + mpmath.mpf(float(lo[idx]))
    return out


def dd_matmul(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    lib = get_lib()
    n, m = A.shape[:2]
    m2, p = B.shape[:2]
    assert m == m2
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    C = np.zeros((n, p, 2), dtype=np.float64)
    lib.dd_matmul(_dp(A), _dp(B), _dp(C), n, m, p)
    return C


def dd_gram(V: np.ndarray) -> np.ndarray:
    lib = get_lib()
    n, m = V.shape[:2]
    V = np.ascontiguousarray(V, dtype=np.float64)
    G = np.zeros((n, n, 2), dtype=np.float64)
    lib.dd_gram(_dp(V), _dp(G), n, m)
    return G


def dd_cholesky(G: np.ndarray) -> Tuple[np.ndarray, bool]:
    lib = get_lib()
    n = G.shape[0]
    L = np.ascontiguousarray(G.copy(), dtype=np.float64)
    rc = lib.dd_cholesky(_dp(L), n)
    # zero the strict upper triangle
    for i in range(n):
        L[i, i + 1 :, :] = 0.0
    return L, rc == 0


def dd_solve_tril(L: np.ndarray, B: np.ndarray, unit_diag: bool = False) -> np.ndarray:
    lib = get_lib()
    n = L.shape[0]
    m = B.shape[1]
    L = np.ascontiguousarray(L, dtype=np.float64)
    X = np.ascontiguousarray(B.copy(), dtype=np.float64)
    lib.dd_solve_tril(_dp(L), _dp(X), n, m, 1 if unit_diag else 0)
    return X


def dd_qr(A: np.ndarray) -> Tuple[np.ndarray, np.ndarray, bool]:
    lib = get_lib()
    n, m = A.shape[:2]
    A = np.ascontiguousarray(A, dtype=np.float64)
    Q = np.zeros((n, m, 2), dtype=np.float64)
    R = np.zeros((m, m, 2), dtype=np.float64)
    rc = lib.dd_qr(_dp(A), _dp(Q), _dp(R), n, m)
    return Q, R, rc == 0


def dd_polyval(coeffs: np.ndarray, pts: np.ndarray) -> np.ndarray:
    lib = get_lib()
    deg = coeffs.shape[0] - 1
    coeffs = np.ascontiguousarray(coeffs, dtype=np.float64)
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.zeros((pts.shape[0], 2), dtype=np.float64)
    lib.dd_polyval(_dp(coeffs), deg, _dp(pts), _dp(out), pts.shape[0])
    return out
