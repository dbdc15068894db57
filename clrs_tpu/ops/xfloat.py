"""Extended-precision float-expansion arithmetic for JAX (TPU-first).

An ``XF`` value is an unevaluated sum of K floating-point "limbs"
x = l_0 + l_1 + ... + l_{K-1}, with |l_{i+1}| <~ ulp(|l_i|) (nonoverlapping,
decreasing).  K=1 is plain float, K=2 is double-double (~106-bit significand
with f64 limbs), K=4 is quad-double (~212 bits).  All operations are built
from error-free transforms (TwoSum / Fast2Sum / TwoProd with Dekker
splitting) and are elementwise-vectorized: an XF wraps a single stacked
array of shape (K, *shape), so arbitrary tensor shapes, vmap, scan and jit
all work transparently.

This layer replaces the reference solver's Arb/MPFR ball-arithmetic kernel
set (reference: MPMP.jl:5-17 imports; §2.9 of SURVEY.md — approx_mul!,
add!/sub!/mul!/div!, addmul!, abs!/max!/min!, get_mid! etc.).  Ball error
bounds are not tracked — the reference strips them anyway after every hot op
via Arblib.get_mid! (13 call sites, e.g. MPMP.jl:883, 1119), so its effective
model is fixed-precision approximate arithmetic, which is exactly what an
expansion provides.

Algorithms follow the QD library (Hida-Li-Bailey) for K=2 and the CAMPARY
generalization (Joldes-Muller-Popescu) for K>2: renormalization is
VecSum + VecSumErrBranch, with the data-dependent branch realized as
elementwise selects (one-hot writes) so everything stays SIMD.

Notes on dtypes: with float64 limbs this is exact on CPU.  The TPU backend
emulates f64 (non-IEEE), so TPU kernels use float32 limbs (f32 is native and
correctly rounded on the VPU); K doubles to reach the same precision.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Any

# ---------------------------------------------------------------------------
# Error-free transforms
# ---------------------------------------------------------------------------


import os as _os

# EFT barrier policy.  Barriers block fusion, so every dd op round-trips
# HBM on TPU; scripts/tpu_eft_barrier_probe.py verifies that XLA:TPU
# preserves the EFT algebra bare (elementwise chains, scan bodies, matmul
# contractions, cancelling dots — all bit-identical with barriers on/off,
# measured on v5e), so the TPU backend defaults to NO barriers and whole
# iteration bodies fuse.  XLA:CPU is kept ON: its simplifier/fusion stack
# has three documented EFT-breaking rewrites (see module docstring of
# clrs_tpu/__init__.py).  Override with CLRS_XF_NO_BARRIERS=1/0.
_NO_BARRIERS_ENV = _os.environ.get("CLRS_XF_NO_BARRIERS", "")
_NO_BARRIERS: Any = None  # resolved lazily (backend not known at import)


def _barriers_off() -> bool:
    global _NO_BARRIERS
    if _NO_BARRIERS is None:
        if _NO_BARRIERS_ENV != "":
            _NO_BARRIERS = _NO_BARRIERS_ENV != "0"
        else:
            _NO_BARRIERS = jax.default_backend() == "tpu"
    if _SCALE_BITS and _NO_BARRIERS_ENV != "1":
        # SCALED mode keeps barriers even on TPU: XLA:TPU's simplifier
        # does break EFTs in the scaled series graphs (measured round 4:
        # the Horner 1 + (-t*y) chain collapses the small operand —
        # div/sqrt drop to seed precision 2^-26 bare, full 24k-bit with
        # barriers).  The r3 "TPU preserves EFTs" probe covered the
        # plain-cascade graph shapes only.  Hot scaled ops belong in the
        # Pallas kernels (Mosaic lowers arithmetic as written); the
        # XLA-side leftovers take the fusion hit for correctness.
        return False
    return _NO_BARRIERS


def _opaque(x):
    """Hide a value's defining expression from XLA's algebraic simplifier.

    XLA (with its default allow_excess_precision) may rewrite patterns like
    (a+b)-a -> b, which is real-arithmetic-valid but destroys the rounding
    error that error-free transforms exist to capture.  An optimization
    barrier keeps the EFT algebra intact; it costs nothing at runtime
    (but blocks fusion — see _barriers_off for the per-backend policy).
    """
    if _barriers_off():
        return x
    return jax.lax.optimization_barrier(x)


def two_sum(a: Array, b: Array):
    """s + e == a + b exactly, s = fl(a+b).  (Knuth, 6 flops.)

    s and bb are barriered: XLA's algebraic simplifier applies the
    real-arithmetic identities (a+b)-a -> b and s-(s-a) -> a, each of which
    silently destroys the rounding error this transform exists to capture.
    s opaque blocks the first (also inside bb); bb opaque blocks the second.
    Verified empirically on both the CPU and TPU backends.
    """
    s = _opaque(a + b)
    bb = _opaque(s - a)
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a: Array, b: Array):
    """s + e == a + b exactly, assuming |a| >= |b|.  (Dekker, 3 flops.)

    s is barriered so (s - a) cannot be simplified to b.
    """
    s = _opaque(a + b)
    e = b - (s - a)
    return s, e


def _split_const(dtype) -> float:
    # 2^ceil(p/2) + 1 : 2^27+1 for f64 (p=53), 2^12+1 for f32 (p=24)
    if dtype == jnp.float64:
        return 134217729.0
    if dtype == jnp.float32:
        return 4097.0
    raise ValueError(f"unsupported limb dtype {dtype}")


def split(a: Array):
    """a == hi + lo with hi, lo having ~p/2-bit significands (Dekker).

    The inner (t - a) is barriered so t - (t - a) cannot collapse to a.
    """
    c = jnp.asarray(_split_const(a.dtype), dtype=a.dtype)
    t = c * a
    u = _opaque(t - a)
    hi = t - u
    lo = a - hi
    return hi, lo


def two_prod(a: Array, b: Array):
    """p + e == a * b exactly, p = fl(a*b).  (Dekker splitting, ~17 flops.)

    No barrier needed beyond split's: fma contraction of ahi*bhi - p is
    exact here (ahi*bhi fits in one product), and XLA does not factor
    floating-point sums of products.
    """
    p = a * b
    ahi, alo = split(a)
    bhi, blo = split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# Renormalization
# ---------------------------------------------------------------------------


def _vec_sum(terms):
    """Exact transform: returns same-sum list with leading approx first.

    VecSum of Ogita-Rump-Oishi / CAMPARY: chain of two_sums from the last
    term up.  terms[0] of the result is fl(sum of inputs).
    """
    n = len(terms)
    out = [None] * n
    s = terms[n - 1]
    for i in range(n - 2, -1, -1):
        s, e = two_sum(terms[i], s)
        out[i + 1] = e
    out[0] = s
    return out


def _vec_sum_err_branch(terms, k: int):
    """Compress a VecSum output into k nonoverlapping limbs.

    CAMPARY's VecSumErrBranch with the data-dependent output index j
    realized as one-hot selects, so it vectorizes elementwise.
    """
    n = len(terms)
    zero = jnp.zeros_like(terms[0])
    out = [zero] * k
    j = jnp.zeros(terms[0].shape, dtype=jnp.int32)
    eps = terms[0]
    for i in range(n - 1):
        r, new_eps = two_sum(eps, terms[i + 1])
        advance = new_eps != 0.0
        # out[j] = r where advancing; otherwise keep accumulating into eps
        for slot in range(k):
            out[slot] = jnp.where(advance & (j == slot), r, out[slot])
        eps = jnp.where(advance, new_eps, r)
        j = jnp.where(advance & (j < k), j + 1, j)
    for slot in range(k):
        out[slot] = jnp.where(j == slot, eps, out[slot])
    return out


def _bitonic_sort_desc(terms):
    """Sort a term list by descending magnitude with a static bitonic
    network — an exact, elementwise permutation (each compare-exchange is
    two selects), so it is EFT-safe and keeps the HLO small and static
    (jnp.argsort lowers to a general key-value sort whose compile cost
    dwarfs the arithmetic at k>=5)."""
    m = len(terms)
    M = 1
    while M < m:
        M *= 2
    arr = list(terms) + [jnp.zeros_like(terms[0])] * (M - m)
    size = 2
    while size <= M:
        half = size // 2
        gap = half
        while gap >= 1:
            for i in range(M):
                l = i ^ gap
                if l > i:
                    desc = (i & size) == 0  # block direction
                    a, b = arr[i], arr[l]
                    swap = jnp.abs(a) < jnp.abs(b)
                    if not desc:
                        swap = ~swap
                    arr[i] = jnp.where(swap, b, a)
                    arr[l] = jnp.where(swap, a, b)
            gap //= 2
        size *= 2
    return arr[:m]


def _renorm(terms, k: int, passes: int = 2, sort: bool = False):
    """Exact-sum compression of arbitrary terms into k limbs.

    VecSum passes handle unordered inputs (each pass is exact); the branch
    pass then extracts nonoverlapping limbs.  Two passes suffice when
    terms are roughly magnitude-ordered (as in the structured products of
    xf_mul); for ARBITRARY inputs a displaced element migrates only one
    position per pass, so e.g. `x + tiny` at k>=5 (Newton refinement
    steps: tiny's limbs interleave below x's last limbs) silently loses
    the last limb with any fixed pass count.  sort=True first orders the
    terms by magnitude (an exact bitonic permutation network), after
    which the VecSum passes are provably sufficient.
    """
    terms = [t for t in terms]
    if len(terms) == 1:
        return terms + [jnp.zeros_like(terms[0])] * (k - 1)
    if sort:
        terms = _bitonic_sort_desc(terms)
    for _ in range(passes):
        terms = _vec_sum(terms)
    out = _vec_sum_err_branch(terms, k)
    return out


# ---------------------------------------------------------------------------
# Scaled expansions (exponent-extended limbs)
# ---------------------------------------------------------------------------
#
# Plain f32 expansions hit an EXPONENT-RANGE wall, not a significand one:
# limb i of a value v sits at |v|*2^(-24 i), so for O(1) values limbs
# beyond i~6 fall under f32's smallest subnormal (2^-149) and vanish —
# measured round 4: representation error plateaus at 2^-152 and a single
# multiply at 2^-127 for O(1) operands REGARDLESS of k (the round-1/3
# empirical "k=6 f32 is the healthy ceiling").  The reference's 512-bit
# regime (MPMP.jl:17) is therefore unreachable with plain f32 limbs.
#
# Scaled expansions fix the range, not the arithmetic: limb i is STORED
# multiplied by 2^(S*i) (S = _SCALE_BITS, 24 for f32), so every stored
# limb sits near the value's own magnitude and never underflows.  All the
# cascade algorithms are unchanged except that moving a quantity between
# adjacent limb levels multiplies by the exact power of two 2^(+-S) —
# every rescale is single-level and exact, so the scaled ops compute
# bit-for-bit what the plain expansion ops WOULD compute on hardware with
# 24k-bit exponent range.  Effective semantics: fixed-precision floating
# point with a 24k-bit significand over the f32 value range — the same
# model as the reference's Arb/MPFR at fixed prec.
#
# The flag is TRACE-TIME state: solver builders wrap their jitted phases
# in scaled_mode(cfg.scale_bits) so every (re)trace sees the right value;
# ad-hoc users (tests, conversions) use the context manager explicitly.

_SCALE_BITS = 0


def scale_bits() -> int:
    return _SCALE_BITS


class scaled_mode:
    """Context manager: run xfloat ops in scaled-expansion mode with the
    given per-limb scale S (0 = plain expansions)."""

    def __init__(self, s: int):
        self.s = int(s)
        self.prev = None

    def __enter__(self):
        global _SCALE_BITS
        self.prev = _SCALE_BITS
        _SCALE_BITS = self.s
        return self

    def __exit__(self, *exc):
        global _SCALE_BITS
        _SCALE_BITS = self.prev
        return False


def _sc_consts(dtype):
    up = jnp.asarray(2.0 ** _SCALE_BITS, dtype=dtype)
    down = jnp.asarray(2.0 ** -_SCALE_BITS, dtype=dtype)
    return up, down


# Sparse-limb residual-deposit fix, PARTIAL (round-5 finding, BASELINE
# round-5): the down-scale chains below squash content carried through
# RUNS OF ZERO LIMBS into the f32 subnormal zone, costing ~72 bits
# (3 limbs) at k >= 12 on sparse expansions (dense content is
# unaffected).  This gate deposits the down-scale residual
# r = s2 - (s2*down)*up — exact by Sterbenz (the operands are within
# one rounding step) — into the deeper output limb.  Measured: add
# tightens 2^-456 -> 2^-485 at k=22 (29 bits); mul is unchanged,
# because the deposit `e + r` itself ROUNDS r away whenever the
# existing error limb e is non-tiny — a complete fix must chain the
# deposit through two_sum (d, r2 = two_sum(e, r)) and route r2 into an
# already-finalized deeper limb, i.e. a second accumulation pass; the
# mul cascade's group accumulation needs the same audit.  GATED
# DEFAULT-OFF (CLRS_XF_SPARSE_FIX=1) both for that incompleteness and
# because the Pallas _XOps and native sc_* mirrors must carry the same
# sequence before it can default on (the cross-substrate bit-identity
# tests compare limb streams).  tests/test_xfloat_sparse_limb.py pins
# the default behavior.
_SPARSE_FIX = int(_os.environ.get("CLRS_XF_SPARSE_FIX", "0"))


def _vec_sum_sc(terms, up, down):
    """VecSum chain over level-stored terms (terms[i] at level i).

    Each pairwise two_sum runs at the DEEPER operand's level: up-scaling
    the shallow operand is always exact (can only overflow, bounding the
    representable range at ~2^(103) for f32/S=24), whereas down-scaling a
    deeply-cancelled tiny carry to a shallow level squashes it into the
    subnormal zone and loses its bits (found while validating Newton
    division: b*(1/b) deposits a 2^-135 residual that a shallow-level
    store rounds to 14 bits).  down() is applied only to the big hi
    output, which is level-appropriate by construction — EXCEPT when a
    run of zero limbs passes deep content through undeposited (the
    sparse-limb floor; see _SPARSE_FIX above)."""
    n = len(terms)
    out = [None] * n
    s = terms[n - 1]  # at level n-1
    for i in range(n - 2, -1, -1):
        s2, e = two_sum(terms[i] * up, s)  # at level i+1
        if _SPARSE_FIX:
            s_dn = _opaque(s2 * down)  # opaque: (s2*down)*up must not fold
            out[i + 1] = e + (s2 - s_dn * up)  # deposit the squash residual
            s = s_dn
        else:
            out[i + 1] = e
            s = s2 * down  # to level i
    out[0] = s
    return out


def _renorm_chain_sc(vals, k: int, up, down):
    """The cascade kernels' final renormalization (two_sum chain +
    VecSum pull-up), level-stored; same deeper-level pairing rule as
    _vec_sum_sc."""
    r = []
    hi, err = two_sum(vals[0] * up, vals[1])  # at level 1
    if _SPARSE_FIX:
        hi_dn = _opaque(hi * down)
        err = err + (hi - hi_dn * up)
        r.append(hi_dn)  # r[0] at level 0
    else:
        r.append(hi * down)  # r[0] at level 0
    for i in range(2, k):
        hi, err = two_sum(err * up, vals[i])  # at level i
        if _SPARSE_FIX:
            hi_dn = _opaque(hi * down)
            err = err + (hi - hi_dn * up)
            r.append(hi_dn)  # r[i-1] at level i-1
        else:
            r.append(hi * down)  # r[i-1] at level i-1
    r.append(err)  # level k-1
    return _vec_sum_sc(r, up, down)


def _cascade_add_sc(al, bl, k: int) -> "XF":
    """_cascade_add with level-stored limbs (see the scaled-expansions
    note above): identical exact transforms, single-level rescales at
    each level crossing."""
    up, down = _sc_consts(al[0].dtype)
    s, e = [], []
    for i in range(k - 1):
        si, ei = two_sum(al[i], bl[i])
        s.append(si)
        e.append(ei * up)
    vals = [s[0]]
    carry = [e[0]]
    for i in range(1, k - 1):
        v = s[i]
        nxt = []
        for c in carry:
            v, g = two_sum(v, c)
            nxt.append(g * up)
        vals.append(v)
        nxt.append(e[i])
        carry = nxt
    top = al[k - 1] + bl[k - 1]
    for c in carry:
        top = top + c
    vals.append(top)
    return XF.from_limb_list(_renorm_chain_sc(vals, k, up, down))


def _exp2_of(x):
    """floor(log2|x|) per element by exponent-bit extraction (0 for
    zeros/subnormals — values already below the normalization floor).
    jnp.frexp lowers through 64-bit bitcasts the TPU x64 rewriter
    rejects, hence the bit trick (see pow2)."""
    if x.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(x, jnp.int32)
        e = ((bits >> 23) & 0xFF) - 127
        return jnp.where(e > -127, e, 0)
    bits = jax.lax.bitcast_convert_type(x, jnp.int64)
    e = ((bits >> 52) & 0x7FF) - 1023
    return jnp.where(e > -1023, e, jnp.int64(0))


def _mul_sc_normalized(al, bl, k: int) -> "XF":
    """Scaled multiply with per-element operand normalization.

    Stored limbs are anchored at each VALUE's magnitude, so the products
    a_st*b_st sit at |a*b|: when that falls below ~2^-102 (f32), the
    two_prod error terms are inexact subnormals and the multiply
    collapses to ~1 limb of accuracy (found while validating Newton
    division: the x*e residual product at 2^-108).  Normalizing both
    operands to O(1) with EXACT power-of-two scalings (limbs[0]'s
    exponent, applied limbwise) keeps every EFT in the normal range; the
    two scale-backs are applied separately so each factor's exponent
    stays in range (transient over/underflow then matches the true
    product's own representability)."""
    dtype = al[0].dtype
    ea = _exp2_of(al[0])
    eb = _exp2_of(bl[0])
    sa = pow2(-ea, dtype)
    sb = pow2(-eb, dtype)
    out = _cascade_mul_sc([x * sa for x in al], [x * sb for x in bl], k)
    limbs = out.limbs * pow2(ea, dtype)[None]
    return XF(limbs * pow2(eb, dtype)[None])


def _cascade_mul_sc(al, bl, k: int) -> "XF":
    """_cascade_mul with level-stored limbs.  A product of level-i and
    level-j operands is NATURALLY at level i+j storage (the scales
    multiply), so only the two_prod/two_sum error terms rescale.
    Callers use _mul_sc_normalized (operand normalization) — this core
    assumes both operands are O(1)-anchored."""
    up, down = _sc_consts(al[0].dtype)
    ka, kb = len(al), len(bl)
    groups: list = [[] for _ in range(k)]
    for o in range(k - 1):
        for i in range(o + 1):
            j = o - i
            if i < ka and j < kb:
                p, e = two_prod(al[i], bl[j])
                groups[o].append(p)
                if o + 1 < k:
                    groups[o + 1].append(e * up)
    cheap = None
    for o in (k - 1, k):
        for i in range(o + 1):
            j = o - i
            if i < ka and j < kb:
                t = al[i] * bl[j]
                if o == k:
                    t = t * down  # fold one level up, exactly
                cheap = t if cheap is None else cheap + t
    if cheap is not None:
        groups[k - 1].append(cheap)
    vals = []
    for o in range(k):
        terms = groups[o]
        if not terms:
            vals.append(jnp.zeros_like(al[0]))
            continue
        v = terms[0]
        for t in terms[1:]:
            if o == k - 1:
                v = v + t
            else:
                v, g = two_sum(v, t)
                groups[o + 1].append(g * up)
        vals.append(v)
    return XF.from_limb_list(_renorm_chain_sc(vals, k, up, down))


# ---------------------------------------------------------------------------
# The XF type
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class XF:
    """K-limb float expansion over a stacked array of shape (K, *shape)."""

    __slots__ = ("limbs",)

    def __init__(self, limbs: Array):
        self.limbs = limbs

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.limbs,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

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
    def dtype(self):
        return self.limbs.dtype

    def __len__(self):
        return self.shape[0]

    # -- construction --
    @staticmethod
    def from_limb_list(limbs: Sequence[Array]) -> "XF":
        return XF(jnp.stack([jnp.asarray(l) for l in limbs], axis=0))

    @property
    def limb_list(self):
        return [self.limbs[i] for i in range(self.k)]

    @staticmethod
    def zeros(shape=(), k: int = 2, dtype=jnp.float64) -> "XF":
        return XF(jnp.zeros((k,) + tuple(shape), dtype=dtype))

    @staticmethod
    def ones(shape=(), k: int = 2, dtype=jnp.float64) -> "XF":
        limbs = jnp.zeros((k,) + tuple(shape), dtype=dtype)
        return XF(limbs.at[0].set(1.0))

    @staticmethod
    def eye(n: int, k: int = 2, dtype=jnp.float64) -> "XF":
        limbs = jnp.zeros((k, n, n), dtype=dtype)
        return XF(limbs.at[0].set(jnp.eye(n, dtype=dtype)))

    @staticmethod
    def from_float(x, k: int = 2, dtype=None, shape=()) -> "XF":
        """Lift a float/array (already exactly representable) to XF.

        dtype defaults to the input's float dtype for arrays (no silent
        up/down-casting), float64 for Python scalars.
        """
        if dtype is None:
            xd = getattr(x, "dtype", None)
            dtype = xd if xd is not None and jnp.issubdtype(xd, jnp.floating) else jnp.float64
        x = jnp.broadcast_to(jnp.asarray(x, dtype=dtype), shape) if shape else jnp.asarray(x, dtype=dtype)
        limbs = jnp.zeros((k,) + x.shape, dtype=dtype)
        return XF(limbs.at[0].set(x))

    # -- conversion --
    def to_float(self) -> Array:
        """Round to a single limb (the leading limb is fl(value))."""
        return self.limbs[0]

    def to_float64(self) -> Array:
        if self.dtype == jnp.float64 or self.k == 1:
            return self.limbs[0].astype(jnp.float64)
        # f32 limbs: sum the first few limbs in f64 (descale if in scaled
        # mode — each limb i is stored multiplied by 2^(S*i))
        acc = self.limbs[0].astype(jnp.float64)
        for i in range(1, min(self.k, 3)):
            li = self.limbs[i].astype(jnp.float64)
            if _SCALE_BITS:
                li = li * (2.0 ** (-_SCALE_BITS * i))
            acc = acc + li
        return acc

    # -- indexing --
    def __getitem__(self, idx) -> "XF":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return XF(self.limbs[(slice(None),) + idx])

    def at_set(self, idx, value: "XF") -> "XF":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return XF(self.limbs.at[(slice(None),) + idx].set(value.limbs))

    def at_add(self, idx, value: "XF") -> "XF":
        cur = self[idx]
        return self.at_set(idx, xf_add(cur, value))

    def reshape(self, *shape) -> "XF":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return XF(self.limbs.reshape((self.k,) + tuple(shape)))

    def broadcast_to(self, shape) -> "XF":
        shape = tuple(shape)
        limbs = self.limbs.reshape(
            (self.k,) + (1,) * (len(shape) - self.ndim) + self.shape
        )
        return XF(jnp.broadcast_to(limbs, (self.k,) + shape))

    @property
    def T(self) -> "XF":
        return self.transpose()

    def transpose(self, *axes) -> "XF":
        if not axes:
            axes = tuple(range(self.ndim - 1, -1, -1))
        elif len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        return XF(jnp.transpose(self.limbs, (0,) + tuple(a + 1 for a in axes)))

    # -- operators --
    def __neg__(self):
        return XF(-self.limbs)

    def __add__(self, other):
        return xf_add(self, _lift(other, self))

    def __radd__(self, other):
        return xf_add(_lift(other, self), self)

    def __sub__(self, other):
        return xf_add(self, -_lift(other, self))

    def __rsub__(self, other):
        return xf_add(_lift(other, self), -self)

    def __mul__(self, other):
        return xf_mul(self, _lift(other, self))

    def __rmul__(self, other):
        return xf_mul(_lift(other, self), self)

    def __truediv__(self, other):
        return xf_div(self, _lift(other, self))

    def __rtruediv__(self, other):
        return xf_div(_lift(other, self), self)

    def __matmul__(self, other):
        return xf_matmul(self, other)

    # -- comparisons (return bool arrays) --
    def __lt__(self, other):
        return xf_lt(self, _lift(other, self))

    def __le__(self, other):
        return ~xf_lt(_lift(other, self), self)

    def __gt__(self, other):
        return xf_lt(_lift(other, self), self)

    def __ge__(self, other):
        return ~xf_lt(self, _lift(other, self))

    def __repr__(self):
        return f"XF(k={self.k}, shape={self.shape}, dtype={self.dtype})"


def _lift(x, like: XF) -> XF:
    if isinstance(x, XF):
        return x
    return XF.from_float(x, k=like.k, dtype=like.dtype)


# ---------------------------------------------------------------------------
# Arithmetic
# ---------------------------------------------------------------------------


def _bshape(a: XF, b: XF):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return shape


def _lift2(a, b):
    if not isinstance(a, XF):
        a = _lift(a, b)
    if not isinstance(b, XF):
        b = _lift(b, a)
    return a, b


# Elementwise add/mul through ONE Pallas custom-call per op site on TPU
# at k >= this threshold (0/unset = off): the unrolled cascade HLO of
# elementwise sites is the remaining compile-size driver of the high-k
# phase graphs after matmul/Schur/inverse/steplength became kernels.
# Off by default until measured (flip with
# CLRS_XF_ELEMWISE_PALLAS_MIN_K=10).
_ELEMWISE_PALLAS_MIN_K = int(
    _os.environ.get("CLRS_XF_ELEMWISE_PALLAS_MIN_K", "0"))


def _elemwise_pallas_ok(k: int, shape, dtype) -> bool:
    if not _ELEMWISE_PALLAS_MIN_K or k < _ELEMWISE_PALLAS_MIN_K:
        return False
    if dtype != jnp.float32:
        return False
    n = 1
    for d in shape:
        n *= int(d)
    if n < 64:
        return False
    import jax

    return jax.default_backend() == "tpu"


def _elemwise_pallas(op: str, al, bl, k: int, shape, dtype) -> "XF":
    from clrs_tpu.ops.pallas_xf import xf_elemwise_pallas

    zero = jnp.zeros(shape, dtype)
    al = list(al) + [zero] * (k - len(al))
    bl = list(bl) + [zero] * (k - len(bl))
    return xf_elemwise_pallas(op, al, bl, k)


def xf_add(a: XF, b: XF) -> XF:
    a, b = _lift2(a, b)
    k = max(a.k, b.k)
    shape = _bshape(a, b)
    al = [jnp.broadcast_to(x, shape) for x in a.limb_list]
    bl = [jnp.broadcast_to(x, shape) for x in b.limb_list]
    if k == 1:
        return XF.from_limb_list([al[0] + bl[0]])
    if _elemwise_pallas_ok(k, shape, al[0].dtype):
        return _elemwise_pallas("add", al, bl, k, shape, al[0].dtype)
    if _SCALE_BITS:
        zero = jnp.zeros(shape, al[0].dtype)
        al = al + [zero] * (k - len(al))
        bl = bl + [zero] * (k - len(bl))
        return _cascade_add_sc(al, bl, k)
    if a.k == 2 and b.k == 2:
        return _dd_add(al, bl)
    if a.k == 3 and b.k == 3:
        return _td_add(al, bl)
    if a.k == 4 and b.k == 4:
        return _qw_add(al, bl)
    if k >= _LOOP_MIN_K:
        return _loop_add(al, bl, k)
    if k <= 12:
        # mixed-k operands: pad the shorter limb list with exact zeros
        zero = jnp.zeros(shape, al[0].dtype)
        al = al + [zero] * (k - len(al))
        bl = bl + [zero] * (k - len(bl))
        return _cascade_add(al, bl, k)
    # fallback: interleave and renormalize (exact-sum, faithful rounding)
    terms = []
    for i in range(max(a.k, b.k)):
        if i < a.k:
            terms.append(al[i])
        if i < b.k:
            terms.append(bl[i])
    return XF.from_limb_list(_renorm(terms, k, sort=True))


# Loop-ified kernels: HLO size O(1) in k (lax.fori_loop over a stacked
# bucket array) at O(k^3)-ish runtime, vs the unrolled cascades' O(k^2)
# HLO / O(k^2) runtime.  The unrolled cascades win at runtime but their
# per-op-site HLO makes XLA/LLVM compile cost explode at high k (the k=10
# phase-split solver compile exceeded 114 GB compiler RSS).  Threshold
# overridable for experiments (e.g. CLRS_XF_LOOP_KERNELS_MIN_K=5).
_LOOP_MIN_K = int(_os.environ.get("CLRS_XF_LOOP_KERNELS_MIN_K", "13"))


def _bucket_accumulate(C, v, o):
    """Exactly add v into the stacked bucket expansion C at order o.

    C is (kb + 1, *shape): slots 0..kb-1 are buckets, slot kb is the loop
    carry (kept stacked in ONE array — XLA:CPU value-changes fori_loop
    bodies with tuple-of-array carries, see CLAUDE.md).  Chain of exact
    two_sums from slot o upward (Shewchuk grow-expansion); the leftover,
    below the last bucket's ulp, folds plain into the top bucket.  o may
    be a traced scalar; o >= kb-1 degenerates to a plain add into the top
    bucket (used for the order-k products whose rounding error is slack).
    """
    kb = C.shape[0] - 1
    C = C.at[kb].set(v)

    def step(t, C):
        slot = jnp.squeeze(jax.lax.dynamic_slice_in_dim(C, t, 1, axis=0), 0)
        vv = C[kb]
        s, e = two_sum(slot, vv)
        active = t >= o
        s = jnp.where(active, s, slot)
        e = jnp.where(active, e, vv)
        C = jax.lax.dynamic_update_slice_in_dim(C, s[None], t, axis=0)
        return C.at[kb].set(e)

    C = jax.lax.fori_loop(0, kb - 1, step, C)
    return C.at[kb - 1].add(C[kb])


def _loop_mul(al, bl, k: int) -> XF:
    """k-limb multiply with O(1) HLO in k: fori_loop over the (i, j) limb
    pairs of order i+j <= k, exact two_prod per pair, products and their
    errors cascade-accumulated into k+1 order buckets, final faithful
    renormalization (sorted VecSum)."""
    ka, kb_ops = len(al), len(bl)
    pairs = [(i, j) for i in range(ka) for j in range(kb_ops) if i + j <= k]
    I = jnp.asarray([p[0] for p in pairs], dtype=jnp.int32)
    J = jnp.asarray([p[1] for p in pairs], dtype=jnp.int32)
    a_st = jnp.stack(al, axis=0)
    b_st = jnp.stack(bl, axis=0)
    C0 = jnp.zeros((k + 2,) + al[0].shape, al[0].dtype)

    def body(t, C):
        i = I[t]
        j = J[t]
        a = jnp.squeeze(jax.lax.dynamic_slice_in_dim(a_st, i, 1, axis=0), 0)
        b = jnp.squeeze(jax.lax.dynamic_slice_in_dim(b_st, j, 1, axis=0), 0)
        p, e = two_prod(a, b)
        C = _bucket_accumulate(C, p, i + j)
        return _bucket_accumulate(C, e, i + j + 1)

    C = jax.lax.fori_loop(0, len(pairs), body, C0)
    terms = [C[t] for t in range(k + 1)]
    return XF.from_limb_list(_renorm(terms, k, passes=2, sort=True))


def _loop_add(al, bl, k: int) -> XF:
    """k-limb add with O(1) HLO in k: buckets start as a, each limb of b
    cascade-accumulated at its order, faithful renormalization."""
    a_pad = list(al) + [jnp.zeros_like(al[0])] * (k + 1 - len(al))
    C0 = jnp.stack(a_pad[: k + 1] + [jnp.zeros_like(al[0])], axis=0)
    b_st = jnp.stack(bl, axis=0)

    def body(i, C):
        v = jnp.squeeze(jax.lax.dynamic_slice_in_dim(b_st, i, 1, axis=0), 0)
        return _bucket_accumulate(C, v, i)

    C = jax.lax.fori_loop(0, len(bl), body, C0)
    terms = [C[t] for t in range(k + 1)]
    return XF.from_limb_list(_renorm(terms, k, passes=2, sort=True))


def _cascade_add(al, bl, k: int) -> XF:
    """k-limb add by per-order error cascades — the _td/_qw pattern for
    any k (exact two_sum per order, errors pushed one order down, plain
    folds only at the top order where they sit below the last limb's
    ulp).  Small static HLO: O(k^2/2) two_sums, no data-dependent
    branching — the sort+VecSumErrBranch generic path, applied per
    scalar op, made k=5 solver graphs explode LLVM (tens of GB of
    compiler RSS at any optimization level)."""
    s, e = [], []
    for i in range(k - 1):
        si, ei = two_sum(al[i], bl[i])
        s.append(si)
        e.append(ei)
    # per-order folds: order i absorbs the errors destined to it exactly
    vals = [s[0]]
    carry = [e[0]]  # errors destined for order i
    for i in range(1, k - 1):
        v = s[i]
        nxt = []
        for c in carry:
            v, g = two_sum(v, c)
            nxt.append(g)
        vals.append(v)
        nxt.append(e[i])
        carry = nxt
    top = al[k - 1] + bl[k - 1]
    for c in carry:
        top = top + c
    vals.append(top)
    # renormalization chain (as _qw_add) + VecSum pull-up for canonical
    # leading limbs after cancellation
    r = []
    hi, err = two_sum(vals[0], vals[1])
    r.append(hi)
    for i in range(2, k):
        hi, err = two_sum(err, vals[i])
        r.append(hi)
    r.append(err)
    return XF.from_limb_list(_vec_sum(r))


def _dd_add(al, bl) -> XF:
    """Accurate double-double add (QD library's ieee_add, ~20 flops)."""
    s1, s2 = two_sum(al[0], bl[0])
    t1, t2 = two_sum(al[1], bl[1])
    s2 = s2 + t1
    s1, s2 = fast_two_sum(s1, s2)
    s2 = s2 + t2
    hi, lo = fast_two_sum(s1, s2)
    return XF.from_limb_list([hi, lo])


def _td_add(al, bl) -> XF:
    """Triple-word add (branchless, Fabiano-Muller-Picot style, ~45 flops).

    Exact transforms per order, low-order terms folded with plain adds
    whose errors sit at ~2^-3p relative — below the last limb's ulp.
    """
    s0, e0 = two_sum(al[0], bl[0])
    s1, e1 = two_sum(al[1], bl[1])
    s2 = al[2] + bl[2]
    t1, t2 = two_sum(s1, e0)
    o2 = (s2 + e1) + t2
    r0, u = two_sum(s0, t1)
    r1, r2 = two_sum(u, o2)
    return XF.from_limb_list(_vec_sum([r0, r1, r2]))


def _td_mul(al, bl) -> XF:
    """Triple-word multiply (3 two_prods + folds, ~110 flops)."""
    p00, e00 = two_prod(al[0], bl[0])
    p01, e01 = two_prod(al[0], bl[1])
    p10, e10 = two_prod(al[1], bl[0])
    o2 = ((al[0] * bl[2] + al[2] * bl[0]) + al[1] * bl[1]) + (e01 + e10)
    t1, t2 = two_sum(p01, p10)
    t1, t3 = two_sum(t1, e00)
    o2t = o2 + (t2 + t3)
    r0, u = two_sum(p00, t1)
    r1, r2 = two_sum(u, o2t)
    return XF.from_limb_list(_vec_sum([r0, r1, r2]))


def _qw_add(al, bl) -> XF:
    """Quad-word add: exact transforms per order with cascaded combine."""
    s0, e0 = two_sum(al[0], bl[0])
    s1, e1 = two_sum(al[1], bl[1])
    s2, e2 = two_sum(al[2], bl[2])
    s3 = al[3] + bl[3]
    # fold order-1
    t1, f1 = two_sum(s1, e0)
    # fold order-2
    u2, f2 = two_sum(s2, e1)
    u2, f3 = two_sum(u2, f1)
    # fold order-3 (plain)
    o3 = ((s3 + e2) + f2) + f3
    # renormalize
    r0, a1 = two_sum(s0, t1)
    r1, a2 = two_sum(a1, u2)
    r2, r3 = two_sum(a2, o3)
    return XF.from_limb_list(_vec_sum([r0, r1, r2, r3]))


def _qw_mul(al, bl) -> XF:
    """Quad-word multiply: exact products to order 2, folds above."""
    p00, q00 = two_prod(al[0], bl[0])
    p01, q01 = two_prod(al[0], bl[1])
    p10, q10 = two_prod(al[1], bl[0])
    p02, q02 = two_prod(al[0], bl[2])
    p11, q11 = two_prod(al[1], bl[1])
    p20, q20 = two_prod(al[2], bl[0])
    o3 = (
        (al[0] * bl[3] + al[3] * bl[0])
        + (al[1] * bl[2] + al[2] * bl[1])
        + ((q02 + q11) + q20)
    )
    # order-1 combine
    t1, f1 = two_sum(p01, p10)
    t1, f2 = two_sum(t1, q00)
    # order-2 combine
    u2, g1 = two_sum(p02, p11)
    u2, g2 = two_sum(u2, p20)
    u2, g3 = two_sum(u2, q01)
    u2, g4 = two_sum(u2, q10)
    u2, g5 = two_sum(u2, f1)
    u2, g6 = two_sum(u2, f2)
    o3 = o3 + (((g1 + g2) + (g3 + g4)) + (g5 + g6))
    # renormalize
    r0, a1 = two_sum(p00, t1)
    r1, a2 = two_sum(a1, u2)
    r2, r3 = two_sum(a2, o3)
    return XF.from_limb_list(_vec_sum([r0, r1, r2, r3]))


def xf_mul(a: XF, b: XF) -> XF:
    a, b = _lift2(a, b)
    k = max(a.k, b.k)
    shape = _bshape(a, b)
    al = [jnp.broadcast_to(x, shape) for x in a.limb_list]
    bl = [jnp.broadcast_to(x, shape) for x in b.limb_list]
    if k == 1:
        return XF.from_limb_list([al[0] * bl[0]])
    if _elemwise_pallas_ok(k, shape, al[0].dtype):
        return _elemwise_pallas("mul", al, bl, k, shape, al[0].dtype)
    if _SCALE_BITS:
        return _mul_sc_normalized(al, bl, k)
    if a.k == 2 and b.k == 2:
        return _dd_mul(al, bl)
    if a.k == 3 and b.k == 3:
        return _td_mul(al, bl)
    if a.k == 4 and b.k == 4:
        return _qw_mul(al, bl)
    if k >= _LOOP_MIN_K:
        return _loop_mul(al, bl, k)
    if k <= 12:
        return _cascade_mul(al, bl, k)
    # generic truncated multiplication: exact products (with error terms)
    # for orders i+j <= k-2; plain products for orders k-1 and k, whose
    # rounding errors sit at/below the ulp of the last kept limb.
    terms = []
    for o in range(k - 1):  # order = i + j
        for i in range(o + 1):
            j = o - i
            if i < a.k and j < b.k:
                p, e = two_prod(al[i], bl[j])
                terms.append(p)
                terms.append(e)
    cheap = None
    for o in (k - 1, k):
        for i in range(o + 1):
            j = o - i
            if i < a.k and j < b.k:
                t = al[i] * bl[j]
                cheap = t if cheap is None else cheap + t
    if cheap is not None:
        terms.append(cheap)
    return XF.from_limb_list(_renorm(terms, k, passes=2, sort=True))


def _cascade_mul(al, bl, k: int) -> XF:
    """k-limb multiply by per-order error cascades (the _td/_qw pattern
    for any k): exact two_prods for output orders 0..k-2 with their
    errors pushed one order down, plain products folded at orders
    k-1/k, per-order two_sum combines.  Same static-HLO rationale as
    _cascade_add."""
    ka, kb = len(al), len(bl)
    groups: list = [[] for _ in range(k)]
    for o in range(k - 1):
        for i in range(o + 1):
            j = o - i
            if i < ka and j < kb:
                p, e = two_prod(al[i], bl[j])
                groups[o].append(p)
                if o + 1 < k:
                    groups[o + 1].append(e)
    cheap = None
    for o in (k - 1, k):
        for i in range(o + 1):
            j = o - i
            if i < ka and j < kb:
                t = al[i] * bl[j]
                cheap = t if cheap is None else cheap + t
    if cheap is not None:
        groups[k - 1].append(cheap)
    vals = []
    for o in range(k):
        terms = groups[o]
        if not terms:
            vals.append(jnp.zeros_like(al[0]))
            continue
        v = terms[0]
        for t in terms[1:]:
            if o == k - 1:
                v = v + t  # below last-limb ulp
            else:
                v, g = two_sum(v, t)
                groups[o + 1].append(g)
        vals.append(v)
    r = []
    hi, err = two_sum(vals[0], vals[1])
    r.append(hi)
    for i in range(2, k):
        hi, err = two_sum(err, vals[i])
        r.append(hi)
    r.append(err)
    return XF.from_limb_list(_vec_sum(r))


def _dd_mul(al, bl) -> XF:
    """Double-double multiply (QD library, ~25 flops)."""
    p, e = two_prod(al[0], bl[0])
    e = e + (al[0] * bl[1] + al[1] * bl[0])
    hi, lo = fast_two_sum(p, e)
    return XF.from_limb_list([hi, lo])


def xf_div(a: XF, b: XF) -> XF:
    a, b = _lift2(a, b)
    k = max(a.k, b.k)
    if k == 1:
        shape = _bshape(a, b)
        return XF.from_limb_list(
            [jnp.broadcast_to(a.limbs[0], shape) / jnp.broadcast_to(b.limbs[0], shape)]
        )
    r = xf_reciprocal(b)
    q = xf_mul(a, r)
    if _SCALE_BITS:
        # the refinement residual a - b*q cancels ~24k bits deep — below
        # the scaled value floor it flushes to 0 (no-op); the series
        # reciprocal is already full-precision, so skip the wasted ops
        return q
    # one refinement step: q += (a - b*q) * r
    rres = xf_add(a, -xf_mul(b, q))
    return xf_add(q, xf_mul(rres, r))


def _recip_series_sc(b: XF) -> XF:
    """1/b for scaled mode via the shifted-space series.

    Newton's residual e = 1 - b*x collapses below the scaled
    representation's value floor (~2^-126 for f32) once x passes ~126
    correct bits — XLA flushes subnormals, so e rounds to 0 and the
    iteration stalls at ~210 bits (measured round 4).  Instead factor
    1/b = r0 / (b*r0) with r0 = fl(1/b0): u = b*r0 = 1 + t with
    |t| <~ 2^-22, and 1/(1+t) by Horner — every intermediate is O(1) or
    O(t)-anchored, nothing ever approaches the floor.  k+3 terms give
    (k+4)*22 > 24k+60 bits for all practical k."""
    k = b.k
    safe = jnp.where(b.limbs[0] != 0, b.limbs[0], jnp.ones_like(b.limbs[0]))
    r0 = XF.from_float(1.0 / safe, k=k, dtype=b.dtype)
    u = xf_mul(b, r0)
    ones = XF.ones(u.shape, k=k, dtype=b.dtype)
    t = xf_add(u, -ones)
    y = ones
    for _ in range(k + 3):
        y = xf_add(ones, -xf_mul(t, y))
    return xf_mul(y, r0)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _rsqrt_coeff_np(k: int, m: int, dtype_name: str, S: int):
    """Exact dyadic binomial coefficients binom(-1/2, i), i = 0..m, as
    k-limb scaled constants in a NUMPY (k, m+1) array: c_i =
    (-1)^i * C(2i, i) / 4^i (numerators fit f64 exactly for all
    practical m; k limbs store them exactly).  Numpy-only so it is safe
    to call (and cache) inside traced Pallas kernel bodies."""
    import mpmath

    from fractions import Fraction

    dtype = np.dtype(dtype_name).type
    min_normal = 2.0 ** -126 if dtype == np.float32 else 2.0 ** -1022
    limbs = np.zeros((k, m + 1), dtype=dtype)
    for i in range(m + 1):
        c = Fraction(math.comb(2 * i, i), 4 ** i)
        if i % 2 == 1:
            c = -c
        rem = mpmath.mpf(c.numerator) / mpmath.mpf(c.denominator)
        for q in range(k):
            scaled = rem * mpmath.mpf(2) ** (S * q) if S else rem
            li = dtype(float(scaled))
            if abs(float(li)) < min_normal:
                li = dtype(0.0)
            limbs[q, i] = li
            true_li = (
                mpmath.mpf(float(li)) * mpmath.mpf(2) ** (-S * q)
                if S
                else mpmath.mpf(float(li))
            )
            rem = rem - true_li
    return limbs


def _rsqrt_coeff_cache(k: int, m: int, dtype_name: str, S: int):
    return XF(jnp.asarray(_rsqrt_coeff_np(k, m, dtype_name, S)))


def _rsqrt_series_sc(a: XF) -> XF:
    """rsqrt for scaled mode: a^(-1/2) = s0 * (1+t)^(-1/2) with
    s0 = fl(rsqrt(a0)), u = a*s0*s0 = 1+t, |t| <~ 2^-21, and the
    binomial series by Horner (exact dyadic coefficients).  Same
    floor-avoidance rationale as _recip_series_sc.  a0 > 0 assumed
    (callers mask)."""
    k = a.k
    safe = jnp.where(a.limbs[0] > 0, a.limbs[0], jnp.ones_like(a.limbs[0]))
    s0 = XF.from_float(jax.lax.rsqrt(safe), k=k, dtype=a.dtype)
    u = xf_mul(xf_mul(a, s0), s0)
    ones = XF.ones(u.shape, k=k, dtype=a.dtype)
    t = xf_add(u, -ones)
    m = (24 * k) // 21 + 2
    C = _rsqrt_coeff_cache(k, m, np.dtype(a.dtype).name, _SCALE_BITS)
    y = C[m].broadcast_to(t.shape)
    for i in range(m - 1, -1, -1):
        y = xf_add(C[i].broadcast_to(t.shape), xf_mul(t, y))
    return xf_mul(y, s0)


def xf_reciprocal(b: XF) -> XF:
    """Newton iteration for 1/b, doubling correct bits each step (plain
    mode); shifted-space series in scaled mode (see _recip_series_sc)."""
    k = b.k
    if _SCALE_BITS:
        return _recip_series_sc(b)
    x = XF.from_float(1.0 / b.limbs[0], k=k, dtype=b.dtype)
    n_iter = max(1, math.ceil(math.log2(k)) + 1)
    for _ in range(n_iter):
        # x <- x + x*(1 - b*x)
        e = xf_add(XF.ones(x.shape, k=k, dtype=b.dtype), -xf_mul(b, x))
        x = xf_add(x, xf_mul(x, e))
    return x


def xf_sqrt(a: XF) -> XF:
    """sqrt via Newton on rsqrt; a must be >= 0 (0 allowed).  Scaled mode
    uses the floor-safe binomial series (_rsqrt_series_sc)."""
    k = a.k
    if k == 1:
        return XF.from_limb_list([jnp.sqrt(a.limbs[0])])
    if _SCALE_BITS:
        s = xf_mul(a, _rsqrt_series_sc(a))
        is_zero = a.limbs[0] <= 0
        return xf_where(is_zero, XF.zeros(s.shape, k=k, dtype=a.dtype), s)
    safe_hi = jnp.where(a.limbs[0] > 0, a.limbs[0], 1.0)
    x = XF.from_float(1.0 / jnp.sqrt(safe_hi), k=k, dtype=a.dtype)
    n_iter = max(1, math.ceil(math.log2(k)) + 1)
    half = XF.from_float(0.5, k=k, dtype=a.dtype)
    for _ in range(n_iter):
        # x <- x + 0.5*x*(1 - a*x*x)
        e = xf_add(XF.ones(x.shape, k=k, dtype=a.dtype), -xf_mul(a, xf_mul(x, x)))
        x = xf_add(x, xf_mul(half, xf_mul(x, e)))
    s = xf_mul(a, x)
    # refinement: s += (a - s*s) * x / 2
    e = xf_add(a, -xf_mul(s, s))
    s = xf_add(s, xf_mul(half, xf_mul(e, x)))
    is_zero = a.limbs[0] <= 0
    return xf_where(is_zero, XF.zeros(s.shape, k=k, dtype=a.dtype), s)


def xf_abs(a: XF) -> XF:
    neg = xf_is_neg(a)
    return xf_where(neg, -a, a)


def xf_is_neg(a: XF) -> Array:
    """Sign from the leading nonzero limb (limbs are nonoverlapping)."""
    sign = jnp.zeros(a.shape, dtype=jnp.int32)
    for i in range(a.k - 1, -1, -1):
        l = a.limbs[i]
        sign = jnp.where(l != 0, jnp.where(l < 0, -1, 1), sign)
    return sign < 0


def xf_lt(a: XF, b: XF) -> Array:
    return xf_is_neg(xf_add(a, -b))


def xf_where(cond: Array, a: XF, b: XF) -> XF:
    shape = jnp.broadcast_shapes(jnp.shape(cond), a.shape, b.shape)
    al = _lift(a, b).broadcast_to(shape).limbs
    bl = _lift(b, a).broadcast_to(shape).limbs
    return XF(jnp.where(jnp.broadcast_to(cond, shape)[None], al, bl))


def xf_max(a: XF, b: XF) -> XF:
    return xf_where(xf_lt(a, b), b, a)


def xf_min(a: XF, b: XF) -> XF:
    return xf_where(xf_lt(a, b), a, b)


def pow2(e, dtype):
    """Exact 2^e for int array e by exponent-bit construction.

    jnp.ldexp/frexp lower through 64-bit bitcasts the TPU x64 rewriter
    rejects, so build the float directly.  e must lie in the normal
    exponent range (clamped: [-126, 127] for f32, [-1022, 1023] for f64).
    """
    e = jnp.asarray(e)
    if dtype == jnp.float32:
        ec = jnp.clip(e.astype(jnp.int32), -126, 127)
        bits = (ec + 127) << 23
        return jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)
    ec = jnp.clip(e.astype(jnp.int64), -1022, 1023)
    bits = (ec + 1023) << 52
    return jax.lax.bitcast_convert_type(bits, jnp.float64)


def xf_ldexp(a: XF, e) -> XF:
    """Exact scaling by 2^e (e int, scalar or broadcastable array)."""
    return XF(a.limbs * pow2(e, a.dtype))


# ---------------------------------------------------------------------------
# Reductions and contractions
# ---------------------------------------------------------------------------


def xf_sum(a: XF, axis: int = -1) -> XF:
    """Sum along an axis via a binary tree of xf_adds (log depth, accurate)."""
    if axis < 0:
        axis = a.ndim + axis
    n = a.shape[axis]
    if n == 0:
        shape = a.shape[:axis] + a.shape[axis + 1 :]
        return XF.zeros(shape, k=a.k, dtype=a.dtype)
    x = a
    laxis = axis + 1  # axis in limb space
    while n > 1:
        half = n // 2
        if n % 2 == 1:
            # fold the last element into the first
            first = XF(jax.lax.dynamic_slice_in_dim(x.limbs, 0, 1, laxis))
            last = XF(jax.lax.dynamic_slice_in_dim(x.limbs, n - 1, 1, laxis))
            rest = XF(jax.lax.dynamic_slice_in_dim(x.limbs, 1, n - 2, laxis))
            folded = xf_add(first, last)
            x = XF(jnp.concatenate([folded.limbs, rest.limbs], axis=laxis))
            n = n - 1
            half = n // 2
        lo = XF(jax.lax.dynamic_slice_in_dim(x.limbs, 0, half, laxis))
        hi = XF(jax.lax.dynamic_slice_in_dim(x.limbs, half, half, laxis))
        x = xf_add(lo, hi)
        n = half
    return XF(jnp.squeeze(x.limbs, axis=laxis))


def xf_dot(a: XF, b: XF) -> XF:
    """Inner product of flat vectors (or elementwise-matching tensors)."""
    p = xf_mul(a, b)
    p = p.reshape((-1,))
    return xf_sum(p, axis=0)


def xf_matmul(a: XF, b: XF, chunk: int = 0) -> XF:
    """Matrix product in expansion arithmetic.

    C[i,j] = sum_k a[i,k] b[k,j], products in full precision, tree-summed.
    Materializes an (n, K, m) product tensor; for large problems pass
    `chunk` to split the contraction dimension.

    This replaces the reference's Arblib.approx_mul! (18 call sites,
    e.g. MPMP.jl:1291-1311).  TODO(perf): Ozaki-scheme int8 MXU splitting.
    """
    assert a.ndim >= 2 and b.ndim >= 2, (a.shape, b.shape)
    # shapes: (..., n, kk) x (..., kk, m)
    pa = XF(a.limbs[..., :, :, None])  # (..., n, kk, 1)
    pb = XF(b.limbs[..., None, :, :])  # (..., 1, kk, m)
    prod = xf_mul(pa, pb)  # (..., n, kk, m)
    return xf_sum(prod, axis=-2)


def xf_norm_max(a: XF) -> XF:
    """max(abs(entries)) — reference's compute_error (MPMP.jl:1044-1055)."""
    ab = xf_abs(a)
    flat = ab.reshape((-1,))
    n = flat.shape[0]
    x = flat
    while n > 1:
        half = n // 2
        if n % 2 == 1:
            first = x[0:1]
            last = x[n - 1 : n]
            rest = x[1 : n - 1]
            x = XF(jnp.concatenate([xf_max(first, last).limbs, rest.limbs], axis=1))
            n -= 1
            half = n // 2
        x = xf_max(x[0:half], x[half : 2 * half])
        n = half
    return x[0]


# ---------------------------------------------------------------------------
# Host conversion (mpmath interop for setup & tests)
# ---------------------------------------------------------------------------


def xf_from_mp(values, k: int = 2, dtype=np.float64, scale_bits=None) -> XF:
    """Convert mpmath mpf scalars / nested lists / numpy object arrays to XF.

    Rounds to the nearest K-limb expansion (each limb is the correctly
    rounded remainder), which is how the 512-bit sampled data of the
    reference's prepareabc (MPMP.jl:225-407) enters the solver.

    scale_bits (default: the ambient scaled_mode setting) stores limb i
    multiplied by 2^(scale_bits*i) — the scaled-expansion representation;
    the residual at each level is rounded AT that level's scale so every
    stored limb is a correctly rounded f32/f64 near the value's own
    magnitude (no subnormal loss).
    """
    import mpmath

    S = _SCALE_BITS if scale_bits is None else int(scale_bits)
    arr = np.asarray(values, dtype=object)
    shape = arr.shape
    flat = arr.reshape(-1)
    limbs = np.zeros((k, flat.size), dtype=dtype)
    # XLA (CPU and TPU) flushes subnormals to zero (measured round 4:
    # f32 1e-39 + 1e-39 == 0 under jit), so a stored limb below the min
    # NORMAL would silently vanish on first device use.  Flush it here
    # instead: the residual loop re-absorbs the value at the next level,
    # whose storage is 2^S larger — in scaled mode accuracy self-heals
    # (at most one slack limb per gap); in plain mode this matches what
    # the device arithmetic would have computed anyway.
    min_normal = 2.0 ** -126 if dtype == np.float32 else 2.0 ** -1022
    for idx, v in enumerate(flat):
        rem = v
        for i in range(k):
            scaled = rem * mpmath.mpf(2) ** (S * i) if S else rem
            li = (
                dtype(float(scaled))
                if dtype == np.float64
                else dtype(np.float32(float(scaled)))
            )
            if abs(float(li)) < min_normal:
                li = dtype(0.0)
            limbs[i, idx] = li
            true_li = (
                mpmath.mpf(float(li)) * mpmath.mpf(2) ** (-S * i)
                if S
                else float(li)
            )
            rem = rem - true_li
    return XF(jnp.asarray(limbs.reshape((k,) + shape)))


def xf_to_mp(a: XF, scale_bits=None):
    """Convert to nested mpmath mpf (for oracles in tests)."""
    import mpmath

    S = _SCALE_BITS if scale_bits is None else int(scale_bits)
    limbs = np.asarray(a.limbs)
    flat = limbs.reshape(a.k, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for idx in range(flat.shape[1]):
        s = mpmath.mpf(0)
        for i in range(a.k):
            t = mpmath.mpf(float(flat[i, idx]))
            if S:
                t *= mpmath.mpf(2) ** (-S * i)
            s += t
        out[idx] = s
    return out.reshape(a.shape)
