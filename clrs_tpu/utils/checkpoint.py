"""Checkpoint / warm-restart of solver state (SURVEY.md §5.4).

The reference supports warm starts only in memory (initial_solutions kwarg,
MPMP.jl:613-614, 687-690) and never serializes solver state.  Here the
iterate pytree (x, y, X, Y limbs) plus the precision configuration is
persisted to a single .npz, so long solves can resume across processes and
across precision escalations (state is re-rounded to the new limb count).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.ops.xfloat import XF


def save_state(path: str, state, info: BlockInfo, meta: dict | None = None) -> None:
    """Persist (x, y, X, Y) to `path` (.npz)."""
    x, y, X, Y = state
    arrays = {
        "x": np.asarray(x.limbs),
        "y": np.asarray(y.limbs),
    }
    for j, row in enumerate(X):
        for l, blk in enumerate(row):
            arrays[f"X_{j}_{l}"] = np.asarray(blk.limbs)
    for j, row in enumerate(Y):
        for l, blk in enumerate(row):
            arrays[f"Y_{j}_{l}"] = np.asarray(blk.limbs)
    arrays["_meta"] = np.frombuffer(
        json.dumps(
            dict(
                J=info.J,
                L=list(info.L),
                k=int(x.k),
                **(meta or {}),
            )
        ).encode(),
        dtype=np.uint8,
    )
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(path: str, info: BlockInfo, k: int | None = None, dtype=None):
    """Load a state saved by save_state; optionally re-round to `k` limbs
    (the warm start of a precision-escalated restart, SURVEY.md §5.3)."""
    data = np.load(path)
    meta = json.loads(bytes(data["_meta"]).decode())

    def conv(a: np.ndarray) -> XF:
        x = XF(jnp.asarray(a))
        if k is not None and k != x.k:
            limbs = np.asarray(a)
            if k > limbs.shape[0]:
                pad = np.zeros((k - limbs.shape[0],) + limbs.shape[1:], limbs.dtype)
                limbs = np.concatenate([limbs, pad], axis=0)
            else:
                limbs = limbs[:k]
            x = XF(jnp.asarray(limbs))
        if dtype is not None and x.dtype != dtype:
            x = XF(x.limbs.astype(dtype))
        return x

    x = conv(data["x"])
    y = conv(data["y"])
    X = [
        [conv(data[f"X_{j}_{l}"]) for l in range(info.L[j])] for j in range(info.J)
    ]
    Y = [
        [conv(data[f"Y_{j}_{l}"]) for l in range(info.L[j])] for j in range(info.J)
    ]
    return (x, y, X, Y), meta
