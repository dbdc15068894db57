"""Multivariate polynomial minimization on the simplex (apps/polymin.py)
— end-to-end through the multivariate solvempmp path with analytic
known answers."""

import mpmath
import numpy as np
import pytest

import clrs_tpu  # noqa: F401
from clrs_tpu.apps.polymin import polymin_simplex
from clrs_tpu.models.poly import MPoly


def test_polymin_quadratic_2d():
    """f(x,y) = x^2 + y^2 - xy - x - y on the 2-simplex: minimum -3/4
    attained at (1/2, 1/2) (the edge x+y=1 restriction 3x^2-3x)."""
    x, y = MPoly.gens(2)
    f = x * x + y * y - x * y - x - y
    bound, res = polymin_simplex(f, 2, d=1)
    assert res.converged or res.status == "stalled", res.status
    # lower-bound property is unconditional
    assert bound <= -0.75 + 1e-8, bound
    # the degree-1 Handelman level is tight for this f
    assert abs(bound - (-0.75)) < 1e-6, bound


def test_polymin_interior_min_3d():
    """f = sum (x_i - 1/4)^2 on the 3-simplex: min 0 at the interior
    point (1/4, 1/4, 1/4); f is itself SOS so d=1 is exact."""
    x0, x1, x2 = MPoly.gens(3)
    q = mpmath.mpf(1) / 4
    parts = [(v - MPoly.constant(q, 3)) for v in (x0, x1, x2)]
    f = parts[0] * parts[0] + parts[1] * parts[1] + parts[2] * parts[2]
    bound, res = polymin_simplex(f, 3, d=1)
    assert bound <= 1e-8, bound
    assert abs(bound) < 1e-6, bound


def test_polymin_levels_monotone():
    """Hierarchy levels are monotone lower bounds: d=2 >= d=1 - tol on a
    boundary-zero problem (f = x0*x1, min 0 on the simplex boundary;
    finite-degree certificates are not exact here, only increasing)."""
    x0, x1 = MPoly.gens(2)
    f = x0 * x1
    b1, _ = polymin_simplex(f, 2, d=1)
    b2, _ = polymin_simplex(f, 2, d=2)
    assert b1 <= 1e-8 and b2 <= 1e-8, (b1, b2)
    assert b2 >= b1 - 1e-8, (b1, b2)
