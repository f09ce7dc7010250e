"""Numerical engines: IBM spread/interp, Lanczos sqrt(M)v.

Reference analogs: test/misc/ibm (adjointness + moments),
test/misc/lanczos (vs dense sqrtm).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.solvers.ibm import (
    BMKernel,
    GaussianKernel,
    Peskin3pt,
    Peskin4pt,
    interpolate,
    spread,
)
from uammd_tpu.solvers.lanczos import lanczos_sqrt_apply


@pytest.mark.parametrize(
    "kern",
    [Peskin3pt(), Peskin4pt(), GaussianKernel(sigma=1.2, support=10)],
    ids=["peskin3", "peskin4", "gauss"],
)
def test_ibm_adjointness(kern):
    """<S q, u> dV == <q, J u> — the defining property (reference:
    test/misc/ibm)."""
    rng = np.random.default_rng(0)
    n, L, m = 40, 16.0, 24
    b = box(L, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = jnp.asarray(rng.normal(size=n))
    u = jnp.asarray(rng.normal(size=(m, m, m)))
    Sq = spread(kern, pos, q, (m, m, m), b)
    Ju = interpolate(kern, pos, u, b)
    dV = (L / m) ** 3
    lhs = float(jnp.sum(Sq * u) * dV)
    rhs = float(jnp.sum(q * Ju))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize(
    "kern", [Peskin3pt(), Peskin4pt()], ids=["peskin3", "peskin4"]
)
def test_peskin_moment_conditions(kern):
    """Peskin kernels: sum_g phi(g - x) = 1 for any shift x (zeroth moment)
    and sum_g (g - x) phi = 0 (first moment) — IBM_kernels.cuh design
    conditions."""
    for shift in (0.0, 0.25, 0.49, 0.7):
        g = jnp.arange(-4, 5, dtype=jnp.float64)
        w = kern.phi(g - shift)
        np.testing.assert_allclose(float(w.sum()), 1.0, atol=1e-12)
        np.testing.assert_allclose(float((w * (g - shift)).sum()), 0.0, atol=1e-12)


def test_spread_conserves_total():
    """Total spread density integrates to the total charge."""
    rng = np.random.default_rng(1)
    n, L, m = 20, 12.0, 18
    b = box(L, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = jnp.asarray(rng.normal(size=n))
    field = spread(Peskin3pt(), pos, q, (m, m, m), b)
    dV = (L / m) ** 3
    np.testing.assert_allclose(float(field.sum() * dV), float(q.sum()), rtol=1e-12)


def test_lanczos_matches_dense_sqrtm():
    """sqrt(M) v vs eigendecomposition (reference: test/misc/lanczos)."""
    rng = np.random.default_rng(3)
    k = 60
    A = rng.normal(size=(k, k))
    M = A @ A.T + k * np.eye(k)
    v = rng.normal(size=k)
    evals, evecs = np.linalg.eigh(M)
    want = evecs @ (np.sqrt(evals) * (evecs.T @ v))
    got, res = lanczos_sqrt_apply(lambda x: jnp.asarray(M) @ x, jnp.asarray(v), m=40)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8)
    assert float(res) < 1e-8


def test_lanczos_few_iterations_converges_monotonically():
    rng = np.random.default_rng(4)
    k = 80
    A = rng.normal(size=(k, k))
    M = A @ A.T + 5 * np.eye(k)
    v = rng.normal(size=k)
    evals, evecs = np.linalg.eigh(M)
    want = evecs @ (np.sqrt(evals) * (evecs.T @ v))
    errs = []
    for m in (8, 16, 32):
        got, _ = lanczos_sqrt_apply(lambda x: jnp.asarray(M) @ x, jnp.asarray(v), m=m)
        errs.append(np.linalg.norm(np.asarray(got) - want) / np.linalg.norm(want))
    assert errs[2] < errs[0]
    assert errs[2] < 1e-6
