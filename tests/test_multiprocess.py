"""REAL multi-process multihost run (SURVEY.md §5.8): two OS processes,
each a "host" with 4 virtual CPU devices, coordinated via jax.distributed —
the closest this single-machine environment gets to a 2-host TPU pod.

Asserts (a) both processes complete and agree, and (b) the 2-process
global-mesh result is BITWISE identical to the single-process 8-device run
of the same problem (the cross-cluster reductions are canonical-order
extended-precision tree sums, so device/process count must not change a
single bit — the test strategy SURVEY.md §4 calls for)."""

import hashlib
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

import clrs_tpu  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "mp_hetero_worker.py")
ITERS = 12


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_result():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["CLRS_MP_ITERS"] = str(ITERS)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    return outs


def _parse(out: str):
    m = re.search(
        r"MPRESULT pid=(\d+) gap=(\S+) iters=(\d+) md5=([0-9a-f]+)", out
    )
    assert m, out[-4000:]
    return dict(
        pid=int(m.group(1)),
        gap=float(m.group(2)),
        iters=int(m.group(3)),
        md5=m.group(4),
    )


def test_two_process_agree(two_process_result):
    r0, r1 = (_parse(o) for o in two_process_result)
    assert {r0["pid"], r1["pid"]} == {0, 1}
    assert r0["md5"] == r1["md5"]
    assert r0["gap"] == r1["gap"]
    assert r0["iters"] == r1["iters"] == ITERS


def test_two_process_matches_single_process(two_process_result):
    """2x4-device distributed == 1x8-device local, bit for bit."""
    import bench
    import clrs_tpu.core.solver as S
    from clrs_tpu.parallel.multihost import (
        global_cluster_mesh,
        solve_hetero_multihost,
    )

    assert len(jax.devices()) == 8  # conftest's virtual mesh
    problem, info = bench.build_problem(d=2, dtype=np.float64, k=2)
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    res = solve_hetero_multihost(problem, maxiterations=ITERS, cfg=cfg)
    (_bstates, y) = res.raw_state
    md5 = hashlib.md5(np.asarray(jax.device_get(y.limbs)).tobytes()).hexdigest()

    r0 = _parse(two_process_result[0])
    assert r0["md5"] == md5
    assert r0["gap"] == res.dual_gap
