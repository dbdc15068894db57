"""Measure the panel-parallel blocked Cholesky (parallel/intra.py,
SURVEY §5.7 / VERDICT r3 item 6) on a synthetic huge-cluster block.

Times three variants on the current backend:
  seq       ops/linalg.xf_cholesky (sequential column fori_loop — what
            GSPMD cannot partition)
  panel-1   xf_cholesky_panel, single device (blocked right-looking:
            the trailing updates become big matmuls even unsharded)
  panel-N   xf_cholesky_panel inside shard_map over an N-device mesh
            (trailing update row bands per device + tiled all_gather)

On the 2-core CPU box, virtual devices beyond 2 share cores — the honest
scaling claim tops out at 2 devices there; the N-device run still
validates the collective path.  On real multi-chip TPU the same code
shards over ICI.

Usage: [CLRS_FORCE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python scripts/bench_panel_chol.py [n] [k] [panel] [reps] [ndev ...]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
panel = int(sys.argv[3]) if len(sys.argv) > 3 else 64
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
ndevs = [int(x) for x in sys.argv[5:]] or [2, 8]

import jax
import jax.numpy as jnp
import numpy as np

import clrs_tpu  # noqa: F401
from clrs_tpu.ops.linalg import xf_cholesky
from clrs_tpu.ops.xfloat import XF
from clrs_tpu.parallel.intra import make_chip_mesh, xf_cholesky_panel
from clrs_tpu.utils import flops as FL

platform = jax.default_backend()
dtype = np.float32 if platform == "tpu" else np.float64
avail = len(jax.devices())
print(f"platform={platform} devices={avail} n={n} k={k} panel={panel} "
      f"reps={reps}", flush=True)

rng = np.random.default_rng(0)
M = rng.standard_normal((n, n))
A = (M @ M.T) / n + np.eye(n) * n
limbs = np.zeros((k, n, n))
limbs[0] = A
a = XF(jnp.asarray(limbs, dtype))

pairs = FL.mul_flops(k) + FL.add_flops(k)
chol_fl = n**3 / 3 * pairs


def timeit(name, jf, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(jf(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:10s} med {med*1e3:9.1f} ms  {chol_fl/med/1e9:7.1f} GFLOP/s"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return out, med


def run_seq(limbs):
    L, ok = xf_cholesky(XF(limbs))
    return L.limbs, ok


def run_panel1(limbs):
    L, ok = xf_cholesky_panel(XF(limbs), panel=panel)
    return L.limbs, ok


(_, _), t_seq = timeit("seq", jax.jit(run_seq), a.limbs)
(L1, ok1), t_p1 = timeit("panel-1", jax.jit(run_panel1), a.limbs)
assert bool(np.asarray(ok1)), "panel-1 not SPD?"
base = min(t_seq, t_p1)

for nd in ndevs:
    if nd > avail or n % nd:
        print(f"panel-{nd}  skipped (devices={avail}, n%nd={n % nd})")
        continue
    mesh = make_chip_mesh(nd)
    axis = mesh.axis_names[0]
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
             check_rep=False)
    def run_sharded(limbs):
        L, ok = xf_cholesky_panel(XF(limbs), panel=panel, axis=axis,
                                  n_dev=nd)
        return L.limbs, ok[None]

    (LN, okN), t_pn = timeit(f"panel-{nd}", jax.jit(run_sharded), a.limbs)
    assert bool(np.asarray(okN).all())
    hi1 = np.asarray(L1)[0]
    hiN = np.asarray(LN)[0]
    scale = np.max(np.abs(hi1)) or 1.0
    err = np.max(np.abs(hi1 - hiN)) / scale
    print(f"  -> speedup vs best-1dev {base/t_pn:5.2f}x; hi-limb rel "
          f"agreement {err:.1e}", flush=True)
