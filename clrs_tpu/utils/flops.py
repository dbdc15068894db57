"""Flop model + MFU accounting for the expansion-arithmetic hot phases.

The reference prints wall-clock phase tables (MPMP.jl:976-1013) but has no
utilization model; BASELINE.json's north star is "Schur build + Cholesky
at HBM/MXU speed-of-light", which needs achieved-FLOP/s vs peak.  This
module counts the f32/f64 hardware flops the expansion kernels actually
execute (EFT sequences included — that IS the executed work) and converts
phase wall-times into VPU MFU.

Per-scalar-op costs are counted by mirroring the exact loop structure of
ops/xfloat.py's cascades (two_sum = 6 flops, fast_two_sum = 3,
two_prod = 17 with Dekker splitting, as the docstrings there state), so
the model tracks the implementation rather than an idealized textbook
count.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict

TS = 6  # two_sum
FTS = 3  # fast_two_sum
TP = 17  # two_prod (incl. two Dekker splits)


@lru_cache(maxsize=None)
def add_flops(k: int) -> int:
    """Hardware flops of one k-limb expansion add (xfloat.xf_add path)."""
    if k <= 1:
        return 1
    if k == 2:  # _dd_add: 2 two_sum + 2 adds + 2 fast_two_sum
        return 2 * TS + 2 + 2 * FTS  # = 20
    if k == 3:  # _td_add, op-by-op: 5 two_sum + 3 adds + vec_sum(3)
        return 45
    if k == 4:  # _qw_add: 6 two_sum + 4 adds + renorm + vec_sum(4)
        return 76
    # generic _cascade_add, counted by mirroring its loops
    f = (k - 1) * TS  # per-order two_sums
    carry = 1
    for i in range(1, k - 1):
        f += carry * TS
        carry += 1
    f += 1 + carry  # top-order plain folds
    f += (k - 1) * TS  # renorm chain
    f += k * TS  # _vec_sum(k+1)
    return f


@lru_cache(maxsize=None)
def mul_flops(k: int) -> int:
    """Hardware flops of one k-limb expansion multiply (xf_mul path)."""
    if k <= 1:
        return 1
    if k == 2:  # _dd_mul: two_prod + 3 flops + fast_two_sum
        return TP + 3 + FTS  # = 23
    if k == 3:  # _td_mul, op-by-op (3 two_prod + folds + vec_sum)
        return 110
    if k == 4:  # _qw_mul, op-by-op (6 two_prod + folds + vec_sum)
        return 201
    # generic _cascade_mul, counted by mirroring the loops with
    # group-size counters (reproduces the 110 of _td_mul at k=3)
    f = 0
    groups = [0] * (k + 1)
    for o in range(k - 1):
        for i in range(o + 1):
            j = o - i
            if i < k and j < k:
                f += TP
                groups[o] += 1
                if o + 1 < k:
                    groups[o + 1] += 1
    cheap = 0
    for o in (k - 1, k):
        for i in range(o + 1):
            j = o - i
            if i < k and j < k:
                f += 1  # plain product
                if cheap:
                    f += 1  # plain add
                cheap += 1
    if cheap:
        groups[k - 1] += 1
    for o in range(k):
        extra = max(0, groups[o] - 1)
        if o == k - 1:
            f += extra
        else:
            f += extra * TS
            groups[o + 1] += extra
    f += (k - 1) * TS  # renorm chain
    f += k * TS  # _vec_sum
    return f


def matmul_flops(n: int, K: int, m: int, k: int) -> int:
    """xf_matmul / Pallas kernel: n*m*K expansion muls + tree-sum adds."""
    return n * m * (K * mul_flops(k) + max(0, K - 1) * add_flops(k))


def spd_inverse_flops(n: int, k: int) -> int:
    """Cholesky (n^3/3 mul+add pairs) + L^-1 forward solve (n^3/2) +
    W^T W (n^3/2), expansion-op counts; div/sqrt are lower order."""
    pairs = mul_flops(k) + add_flops(k)
    return int((n**3 / 3 + n**3 / 2 + n**3 / 2) * pairs)


def decomp_flops(info, k: int) -> int:
    """Schur build + factorization phase (compute_decomposition /
    MPMP.jl:1218-1514): pairings, S-entry assembly, per-cluster S^-1,
    Q = B^T S^-1 B, Q^-1."""
    total = 0
    for j in range(info.J):
        m = info.m[j]
        K = info.n_samples[j]
        dim = info.dim_S[j]
        npairs = m * (m + 1) // 2
        for l in range(info.L[j]):
            delta = info.Y_blocksizes[j][l] // m
            T = K * info.rmax[j][l]
            # two pairing tensors (X^-1 and Y), two matmuls each
            per_pairing = matmul_flops(m * delta * m, delta, T, k) + \
                matmul_flops(T, delta, m * m * T, k)
            total += 2 * per_pairing
            # S-entry assembly: npairs^2 pair-blocks, each 4 muls + 3 adds
            # + 1 HH mul over (T, T), plus rank segment-sums
            total += npairs * npairs * T * T * (5 * mul_flops(k)
                                                + 4 * add_flops(k))
            total += T * T * mul_flops(k)  # HH outer product
        # S_j^-1 and S_inv @ B, B^T @ (S^-1 B)
        total += spd_inverse_flops(dim, k)
        total += matmul_flops(dim, dim, info.n_y, k)
        total += matmul_flops(info.n_y, dim, info.n_y, k)
    total += spd_inverse_flops(info.n_y, k)
    return total


def direction_flops(info, k: int) -> int:
    """One compute_search_direction (MPMP.jl:1682-1824): Z, generic trace,
    saddle solves (+1 refinement), weighted-A, dX, dY."""
    pairs = mul_flops(k) + add_flops(k)
    total = 0
    for j in range(info.J):
        m = info.m[j]
        K = info.n_samples[j]
        dim = info.dim_S[j]
        npairs = m * (m + 1) // 2
        for l in range(info.L[j]):
            bs = info.Y_blocksizes[j][l]
            delta = bs // m
            T = K * info.rmax[j][l]
            # Z = X^-1 (P Y - R): two bs^3 matmuls; dY: two more
            total += 4 * matmul_flops(bs, bs, bs, k)
            # generic trace: per (r, s) pair Z_rs @ V + hadamard
            total += npairs * (matmul_flops(delta, delta, T, k)
                               + T * delta * pairs)
            # weighted-A (P and dX): per pair V diag(w) V^T
            total += 2 * npairs * (delta * T * mul_flops(k)
                                   + matmul_flops(delta, T, delta, k))
        # saddle: S^-1 rx (x2 for refinement), S_inv_B dy, B^T products
        total += 2 * (matmul_flops(dim, dim, 1, k)
                      + 2 * matmul_flops(info.n_y, dim, 1, k)
                      + matmul_flops(dim, info.n_y, 1, k))
    total += 2 * matmul_flops(info.n_y, info.n_y, 1, k)  # Q^-1 ry
    return total


def steplength_flops(info, k: int) -> int:
    """One compute_step_length pass over X or Y (MPMP.jl:1829-1898):
    Cholesky + two triangular solves + eig bound per block."""
    pairs = mul_flops(k) + add_flops(k)
    total = 0
    for j in range(info.J):
        for l in range(info.L[j]):
            bs = info.Y_blocksizes[j][l]
            total += int((bs**3 / 3 + bs**3) * pairs)  # chol + 2 trisolve
            total += int(6 * bs**3 * 2)  # f32/f64 Jacobi sweeps (plain)
    return total


def iteration_flops(info, k: int) -> int:
    """One full IPM iteration (predictor + corrector)."""
    pairs = mul_flops(k) + add_flops(k)
    total = decomp_flops(info, k)
    total += 2 * direction_flops(info, k)  # predictor + corrector
    total += 2 * steplength_flops(info, k)  # X and Y passes
    elem = 0
    for j in range(info.J):
        for l in range(info.L[j]):
            bs = info.Y_blocksizes[j][l]
            # R (x2), X^-1, residual P, updates: a few bs^3 matmuls + bs^2
            elem += 3 * matmul_flops(bs, bs, bs, k) + 6 * bs * bs * pairs
            elem += spd_inverse_flops(bs, k)
    total += elem
    return total


# Peak throughputs by device kind.  The VPU figure is the 8x128-lane
# vector unit at ~0.94 GHz with FMA (2 flops/lane/cycle) — the unit the
# expansion cascades run on (they are elementwise adds/muls, not MXU
# contractions).  MXU bf16 shown for reference (the int8-sliced matmul
# path would be measured against it).
PEAKS: Dict[str, Dict[str, float]] = {
    "TPU v5 lite": {"vpu_f32": 8 * 128 * 2 * 0.94e9,   # ~1.93 TFLOP/s
                    "mxu_bf16": 197e12},
}


def vpu_peak_flops(device_kind: str) -> float:
    for key, v in PEAKS.items():
        if key in device_kind or device_kind in key:
            return v["vpu_f32"]
    return 8 * 128 * 2 * 0.94e9  # default to the v5e-class figure


def decomp_mfu(info, k: int, decomp_seconds: float,
               device_kind: str = "TPU v5 lite") -> float:
    """Achieved fraction of VPU f32 peak for one decomposition phase."""
    if decomp_seconds <= 0:
        return float("nan")
    return decomp_flops(info, k) / decomp_seconds / vpu_peak_flops(device_kind)
