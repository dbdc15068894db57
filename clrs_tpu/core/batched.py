"""Shape-grouped batched execution of per-block / per-cluster kernels.

The reference iterates its (j, l) blocks with threads (MPMP.jl:764 etc.);
a direct transcription unrolls one copy of every kernel per block into the
jitted graph, making trace size (and XLA's superlinear compile time) scale
with the number of clusters.  Here blocks/clusters with identical shape
signatures are stacked on a batch axis and processed by ONE vmapped kernel
instance per shape group — the SURVEY.md §7 "bucketed block-diagonal"
design.  For the reference's sphere-packing example (J=7: one NxN pair,
three identical 1x1 clusters, two identical 1x1 clusters) this shrinks the
decomposition trace by ~2.5x.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.ops.xfloat import XF


def stack_xf(xs: Sequence[XF]) -> XF:
    """Stack XF leaves on a new value-axis 0 (limb axis 1)."""
    return XF(jnp.stack([x.limbs for x in xs], axis=1))


def unstack_xf(x: XF, n: int) -> List[XF]:
    return [XF(x.limbs[:, i]) for i in range(n)]


def block_groups(info: BlockInfo) -> Dict[int, List[Tuple[int, int]]]:
    """(j, l) PSD blocks grouped by block size."""
    groups: Dict[int, List[Tuple[int, int]]] = defaultdict(list)
    for j in range(info.J):
        for l in range(info.L[j]):
            groups[info.Y_blocksizes[j][l]].append((j, l))
    return dict(groups)


def cluster_signature(info: BlockInfo, j: int):
    return (
        info.m[j],
        info.n_samples[j],
        info.L[j],
        info.delta[j],
        info.rmax[j],
        info.dim_S[j],
    )


def cluster_groups(info: BlockInfo) -> List[List[int]]:
    """Clusters grouped by identical shape signature (order-preserving)."""
    seen: Dict[tuple, List[int]] = {}
    order: List[tuple] = []
    for j in range(info.J):
        sig = cluster_signature(info, j)
        if sig not in seen:
            seen[sig] = []
            order.append(sig)
        seen[sig].append(j)
    return [seen[sig] for sig in order]


def map_blocks(fn: Callable, info: BlockInfo, *block_lists, out_has_flag=False):
    """Apply a per-block kernel over all (j, l) blocks, one vmapped
    instance per block-size group.

    block_lists: nested [j][l] lists of XF.  Returns nested [j][l] outputs;
    with out_has_flag, fn returns (XF, bool) and the conjunction of flags
    is returned separately.
    """
    groups = block_groups(info)
    out = [[None] * info.L[j] for j in range(info.J)]
    ok = jnp.bool_(True)
    for size, jls in groups.items():
        stacked = [stack_xf([bl[j][l] for (j, l) in jls]) for bl in block_lists]
        if len(jls) == 1:
            res = fn(*(s[0] for s in stacked))
            if out_has_flag:
                val, okb = res
                ok = ok & okb
                out[jls[0][0]][jls[0][1]] = val
            else:
                out[jls[0][0]][jls[0][1]] = res
            continue
        if out_has_flag:
            vals, oks = jax.vmap(fn, in_axes=1, out_axes=(1, 0))(*stacked)
            ok = ok & jnp.all(oks)
        else:
            vals = jax.vmap(fn, in_axes=1, out_axes=1)(*stacked)
        for i, (j, l) in enumerate(jls):
            out[j][l] = vals[i]
    if out_has_flag:
        return out, ok
    return out


def map_block_scalar(fn: Callable, info: BlockInfo, *block_lists):
    """Per-block kernel returning (scalar, flag); reduced with min/all."""
    groups = block_groups(info)
    val = jnp.inf
    ok = jnp.bool_(True)
    for size, jls in groups.items():
        stacked = [stack_xf([bl[j][l] for (j, l) in jls]) for bl in block_lists]
        if len(jls) == 1:
            v, okb = fn(*(s[0] for s in stacked))
            val = jnp.minimum(val, v)
            ok = ok & okb
        else:
            vs, oks = jax.vmap(fn, in_axes=1, out_axes=(0, 0))(*stacked)
            val = jnp.minimum(val, jnp.min(vs))
            ok = ok & jnp.all(oks)
    return val, ok
