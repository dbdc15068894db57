"""Host-side k-limb expansion arrays over the native kernel library.

``HXF`` mirrors ops/xfloat.py's ``XF`` (limb-major numpy arrays of shape
(k, *shape), float64 limbs) but executes on the host through
native/xfkern.cpp — no XLA in the loop, so limb counts the XLA compiler
cannot handle (k >= 9, the reference's 512-bit regime: k=10 f64 limbs
~ 530 bits vs setprecision(512), examples/SpherePacking.jl:29-31) run at
full speed.  The algorithms are the same QD/CAMPARY cascades as XF;
tests/test_hostxf.py checks them limb-for-limb against mpmath.

This is the numerical substrate of core/host_solver.py, the native-path
analogue of the reference's Arb matrix layer (SURVEY.md §2.9).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE = os.path.join(os.path.dirname(_HERE), "native")
_SO = os.path.join(_NATIVE, "libxfkern.so")
_SRC = os.path.join(_NATIVE, "xfkern.cpp")

_lib: Optional[ctypes.CDLL] = None

I64 = ctypes.c_int64
DP = ctypes.POINTER(ctypes.c_double)
IP = ctypes.POINTER(ctypes.c_int64)


def _build() -> ctypes.CDLL:
    # Idle OpenMP workers must SLEEP, not spin: the host solver runs a
    # Python thread pool over clusters (host_solver._JPool) whose workers
    # can each enter gated OpenMP regions — with the default active wait
    # policy the spinning would oversubscribe the box (the CLAUDE.md
    # co-load hazard).  Must be set before the library's first omp call.
    os.environ.setdefault("OMP_WAIT_POLICY", "PASSIVE")
    if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(
        _SRC
    ):
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-ffp-contract=off",  # EFTs need exact IEEE ops; FMA is
                # explicit (std::fma), never by contraction
                "-fopenmp",
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
    lib.xk_add.argtypes = [ctypes.c_int, I64, DP, DP, DP]
    lib.xk_sub.argtypes = [ctypes.c_int, I64, DP, DP, DP]
    lib.xk_mul.argtypes = [ctypes.c_int, I64, DP, DP, DP]
    lib.xk_div.argtypes = [ctypes.c_int, I64, DP, DP, DP]
    lib.xk_sqrt.argtypes = [ctypes.c_int, I64, DP, DP]
    lib.xk_scale.argtypes = [ctypes.c_int, I64, DP, DP, DP]
    lib.xk_sum.argtypes = [ctypes.c_int, I64, DP, DP]
    lib.xk_dot.argtypes = [ctypes.c_int, I64, DP, DP, DP]
    lib.xk_max_abs.argtypes = [ctypes.c_int, I64, DP]
    lib.xk_max_abs.restype = ctypes.c_double
    lib.xk_gemm.argtypes = [
        ctypes.c_int, I64, I64, I64, DP, DP, DP, ctypes.c_int, ctypes.c_int,
    ]
    lib.xk_syrk.argtypes = [ctypes.c_int, I64, I64, DP, DP]
    lib.xk_cholesky.argtypes = [ctypes.c_int, I64, DP, DP]
    lib.xk_cholesky.restype = ctypes.c_int
    lib.xk_trsm_lower.argtypes = [
        ctypes.c_int, I64, I64, DP, DP, DP, ctypes.c_int, ctypes.c_int,
    ]
    lib.xk_trsm_upper.argtypes = [
        ctypes.c_int, I64, I64, DP, DP, DP, ctypes.c_int,
    ]
    lib.xk_lu.argtypes = [ctypes.c_int, I64, DP, DP, IP]
    lib.xk_lu.restype = ctypes.c_int
    lib.xk_lu_solve.argtypes = [ctypes.c_int, I64, I64, DP, IP, DP, DP]
    return lib


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(DP)


def _c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


class HXF:
    """k-limb float expansion over a numpy array of shape (k, *shape)."""

    __slots__ = ("limbs",)

    def __init__(self, limbs: np.ndarray):
        self.limbs = np.asarray(limbs, dtype=np.float64)

    # -- metadata --
    @property
    def k(self) -> int:
        return self.limbs.shape[0]

    @property
    def shape(self):
        return self.limbs.shape[1:]

    @property
    def ndim(self) -> int:
        return self.limbs.ndim - 1

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    # -- construction --
    @staticmethod
    def zeros(shape=(), k: int = 2) -> "HXF":
        return HXF(np.zeros((k,) + tuple(shape), dtype=np.float64))

    @staticmethod
    def eye(n: int, k: int = 2) -> "HXF":
        limbs = np.zeros((k, n, n), dtype=np.float64)
        limbs[0] = np.eye(n)
        return HXF(limbs)

    @staticmethod
    def from_float(x, k: int = 2) -> "HXF":
        x = np.asarray(x, dtype=np.float64)
        limbs = np.zeros((k,) + x.shape, dtype=np.float64)
        limbs[0] = x
        return HXF(limbs)

    @staticmethod
    def from_mp(values, k: int = 2) -> "HXF":
        """mpmath scalars / nested lists -> HXF (correctly rounded limbs)."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        limbs = np.zeros((k, flat.size), dtype=np.float64)
        for idx, v in enumerate(flat):
            rem = v
            for i in range(k):
                li = float(rem)
                limbs[i, idx] = li
                rem = rem - li
        return HXF(limbs.reshape((k,) + arr.shape))

    def to_mp(self):
        import mpmath

        flat = self.limbs.reshape(self.k, -1)
        out = np.empty(flat.shape[1], dtype=object)
        for idx in range(flat.shape[1]):
            s = mpmath.mpf(0)
            for i in range(self.k):
                s += mpmath.mpf(float(flat[i, idx]))
            out[idx] = s
        return out.reshape(self.shape)

    def to_float64(self) -> np.ndarray:
        return self.limbs[0].copy()

    def copy(self) -> "HXF":
        return HXF(self.limbs.copy())

    # -- structural ops (exact, limb-wise numpy) --
    def reshape(self, *shape) -> "HXF":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return HXF(self.limbs.reshape((self.k,) + tuple(shape)))

    @property
    def T(self) -> "HXF":
        return self.transpose()

    def transpose(self, *axes) -> "HXF":
        if not axes:
            axes = tuple(range(self.ndim - 1, -1, -1))
        elif len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        return HXF(
            np.ascontiguousarray(
                np.transpose(self.limbs, (0,) + tuple(a + 1 for a in axes))
            )
        )

    def __getitem__(self, idx) -> "HXF":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return HXF(np.ascontiguousarray(self.limbs[(slice(None),) + idx]))

    def set(self, idx, value: "HXF") -> None:
        if not isinstance(idx, tuple):
            idx = (idx,)
        self.limbs[(slice(None),) + idx] = value.limbs

    # -- arithmetic (through the native kernels) --
    def _bin(self, other, fn) -> "HXF":
        other = _lift(other, self)
        a, b = _bcast(self, other)
        out = np.empty(a.limbs.shape, dtype=np.float64)
        al, bl = _c(a.limbs), _c(b.limbs)  # bind: keep temps alive
        fn(a.k, a.size, _dp(al), _dp(bl), _dp(out))
        return HXF(out)

    def __add__(self, other) -> "HXF":
        return self._bin(other, get_lib().xk_add)

    def __sub__(self, other) -> "HXF":
        return self._bin(other, get_lib().xk_sub)

    def __mul__(self, other) -> "HXF":
        return self._bin(other, get_lib().xk_mul)

    def __truediv__(self, other) -> "HXF":
        return self._bin(other, get_lib().xk_div)

    def __neg__(self) -> "HXF":
        return HXF(-self.limbs)

    def __radd__(self, other) -> "HXF":
        return _lift(other, self) + self

    def __rsub__(self, other) -> "HXF":
        return _lift(other, self) - self

    def __rmul__(self, other) -> "HXF":
        return _lift(other, self) * self

    def __rtruediv__(self, other) -> "HXF":
        return _lift(other, self) / self

    def scale2(self, f: float) -> "HXF":
        """Exact scaling by a power of two (or any float whose products
        with every limb are exact, e.g. +-0.5, +-1, 2)."""
        return HXF(self.limbs * f)

    def sqrt(self) -> "HXF":
        out = np.empty(self.limbs.shape, dtype=np.float64)
        al = _c(self.limbs)
        get_lib().xk_sqrt(self.k, self.size, _dp(al), _dp(out))
        return HXF(out)

    # -- comparisons / sign (leading nonzero limb decides) --
    def sign(self) -> np.ndarray:
        s = np.zeros(self.shape, dtype=np.int32)
        for i in range(self.k - 1, -1, -1):
            l = self.limbs[i]
            s = np.where(l != 0, np.where(l < 0, -1, 1), s)
        return s

    def __lt__(self, other):
        return (self - _lift(other, self)).sign() < 0

    def __gt__(self, other):
        return (_lift(other, self) - self).sign() < 0

    def abs(self) -> "HXF":
        neg = self.sign() < 0
        return HXF(np.where(neg[None], -self.limbs, self.limbs))

    def max_abs(self) -> float:
        al = _c(self.limbs)
        return float(get_lib().xk_max_abs(self.k, self.size, _dp(al)))


def _lift(x, like: HXF) -> HXF:
    if isinstance(x, HXF):
        return x
    return HXF.from_float(np.asarray(x, dtype=np.float64), k=like.k)


def _bcast(a: HXF, b: HXF) -> Tuple[HXF, HXF]:
    if a.shape == b.shape:
        return a, b
    shape = np.broadcast_shapes(a.shape, b.shape)
    al = np.broadcast_to(
        a.limbs.reshape((a.k,) + (1,) * (len(shape) - a.ndim) + a.shape),
        (a.k,) + shape,
    )
    bl = np.broadcast_to(
        b.limbs.reshape((b.k,) + (1,) * (len(shape) - b.ndim) + b.shape),
        (b.k,) + shape,
    )
    return HXF(np.ascontiguousarray(al)), HXF(np.ascontiguousarray(bl))


# ---------------------------------------------------------------------------
# Linear algebra
# ---------------------------------------------------------------------------


def hxf_matmul(a: HXF, b: HXF, ta: bool = False, tb: bool = False) -> HXF:
    """C = op(a) @ op(b) in k-limb arithmetic (native gemm)."""
    assert a.ndim == 2 and b.ndim == 2, (a.shape, b.shape)
    am, ap = a.shape if not ta else a.shape[::-1]
    bp, bn = b.shape if not tb else b.shape[::-1]
    assert ap == bp, (a.shape, b.shape, ta, tb)
    out = np.empty((a.k, am, bn), dtype=np.float64)
    al, bl = _c(a.limbs), _c(b.limbs)
    get_lib().xk_gemm(
        a.k, am, ap, bn, _dp(al), _dp(bl), _dp(out),
        1 if ta else 0, 1 if tb else 0,
    )
    return HXF(out)


def hxf_syrk(a: HXF) -> HXF:
    """C = a^T @ a for a (p, n): ~2x fewer cascade ops than hxf_matmul
    (only j >= i computed, lower mirrored) and EXACTLY symmetric output;
    computed entries bit-identical to hxf_matmul(a, a, ta=True)."""
    assert a.ndim == 2, a.shape
    p, n = a.shape
    out = np.empty((a.k, n, n), dtype=np.float64)
    al = _c(a.limbs)
    get_lib().xk_syrk(a.k, p, n, _dp(al), _dp(out))
    return HXF(out)


def hxf_dot(a: HXF, b: HXF) -> HXF:
    a2, b2 = _bcast(a, b)
    out = np.empty((a2.k,), dtype=np.float64)
    al, bl = _c(a2.limbs), _c(b2.limbs)
    get_lib().xk_dot(a2.k, a2.size, _dp(al), _dp(bl), _dp(out))
    return HXF(out)


def hxf_sum(a: HXF) -> HXF:
    out = np.empty((a.k,), dtype=np.float64)
    al = _c(a.limbs)
    get_lib().xk_sum(a.k, a.size, _dp(al), _dp(out))
    return HXF(out)


def hxf_cholesky(a: HXF) -> Tuple[HXF, bool]:
    n = a.shape[0]
    L = np.empty((a.k, n, n), dtype=np.float64)
    al = _c(a.limbs)
    ok = get_lib().xk_cholesky(a.k, n, _dp(al), _dp(L))
    return HXF(L), bool(ok)


def hxf_solve_tril(L: HXF, b: HXF, trans: bool = False,
                   unit_diag: bool = False) -> HXF:
    n, m = b.shape
    X = np.empty((b.k, n, m), dtype=np.float64)
    Ll, bl = _c(L.limbs), _c(b.limbs)
    get_lib().xk_trsm_lower(
        L.k, n, m, _dp(Ll), _dp(bl), _dp(X),
        1 if trans else 0, 1 if unit_diag else 0,
    )
    return HXF(X)


def hxf_solve_triu(U: HXF, b: HXF, unit_diag: bool = False) -> HXF:
    n, m = b.shape
    X = np.empty((b.k, n, m), dtype=np.float64)
    Ul, bl = _c(U.limbs), _c(b.limbs)
    get_lib().xk_trsm_upper(
        U.k, n, m, _dp(Ul), _dp(bl), _dp(X),
        1 if unit_diag else 0,
    )
    return HXF(X)


def hxf_lu(a: HXF) -> Tuple[HXF, np.ndarray, bool]:
    n = a.shape[0]
    LU = np.empty((a.k, n, n), dtype=np.float64)
    perm = np.empty((n,), dtype=np.int64)
    al = _c(a.limbs)
    ok = get_lib().xk_lu(a.k, n, _dp(al), _dp(LU), perm.ctypes.data_as(IP))
    return HXF(LU), perm, bool(ok)


def hxf_lu_solve(LU: HXF, perm: np.ndarray, b: HXF) -> HXF:
    n, m = b.shape
    X = np.empty((b.k, n, m), dtype=np.float64)
    LUl, bl = _c(LU.limbs), _c(b.limbs)
    get_lib().xk_lu_solve(
        LU.k, n, m, _dp(LUl), perm.ctypes.data_as(IP), _dp(bl), _dp(X),
    )
    return HXF(X)


def hxf_spd_inverse(a: HXF) -> Tuple[HXF, bool]:
    """SPD inverse via Cholesky (Arblib.spd_inv!, MPMP.jl:766)."""
    n = a.shape[0]
    L, ok = hxf_cholesky(a)
    if not ok:
        return HXF.zeros((n, n), k=a.k), False
    w = hxf_solve_tril(L, HXF.eye(n, k=a.k))
    return hxf_solve_tril(L, w, trans=True), True


def hxf_inverse_lu(a: HXF) -> Tuple[HXF, bool]:
    """General inverse via LU (Arblib.approx_inv!, MPMP.jl:781-788)."""
    n = a.shape[0]
    LU, perm, ok = hxf_lu(a)
    if not ok:
        return HXF.zeros((n, n), k=a.k), False
    return hxf_lu_solve(LU, perm, HXF.eye(n, k=a.k)), True


def hxf_sym(a: HXF) -> HXF:
    """(A + A^T)/2 (exact halving)."""
    return (a + a.T).scale2(0.5)


def hxf_min_eig_sym(m: HXF, dm: HXF) -> Tuple[float, bool]:
    """lambda_min of L^-1 dM L^-T where m = L L^T (step-length oracle,
    MPMP.jl:1842-1880): k-limb Cholesky + two triangular solves, then f64
    eigenvalues of the hi limbs (only lambda_min with a gamma safety slack
    is consumed, :1893-1897)."""
    L, ok = hxf_cholesky(m)
    if not ok:
        return 0.0, False
    w = hxf_solve_tril(L, dm)
    lml = hxf_solve_tril(L, w.T)
    sym64 = lml.to_float64()
    sym64 = (sym64 + sym64.T) * 0.5
    return float(np.min(np.linalg.eigvalsh(sym64))), True


# ---------------------------------------------------------------------------
# XF <-> HXF bridges
# ---------------------------------------------------------------------------


def hxf_from_xf(x) -> HXF:
    return HXF(np.asarray(x.limbs, dtype=np.float64))


def xf_from_hxf(h: HXF):
    import jax.numpy as jnp

    from clrs_tpu.ops.xfloat import XF

    return XF(jnp.asarray(h.limbs))
