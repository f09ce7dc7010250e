"""PSE: split invariance + agreement with periodic RPY theory.

Reference analogs: test/BDHI/PSE (psi-independence of the mobility) and
fcm_test.cu's Hashimoto ladder applied to the RPY kernel.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.integrators.bdhi.pse import PSE, _blob_fg


def test_blob_fg_oseen_limit():
    """sigma small vs r: f, g -> Oseen 1/(8 pi eta r)."""
    r = 6.0
    f, g = _blob_fg(np.array([r]), 0.15, 1.0, kmax_factor=14, nk=60000)
    np.testing.assert_allclose(f[0] * 8 * math.pi * r, 1.0, rtol=3e-3)
    np.testing.assert_allclose(g[0] * 8 * math.pi * r, 1.0, rtol=3e-3)


def test_pse_split_invariance_and_hashimoto():
    L, eta, a = 32.0, 1.0, 1.0
    b = box(L, dtype=jnp.float64)
    r = 5.0
    pos = jnp.asarray([[0.0, 0, 0], [r, 0, 0]], jnp.float64)
    f_unit = jnp.asarray([[1.0, 0, 0], [0, 0, 0]], jnp.float64)
    selfs, pairs = [], []
    for xi in (0.3, 0.5, 1.0):
        pse = PSE.create(b, viscosity=eta, radius=a, xi=xi, tolerance=1e-5)
        v = pse.compute_mf(pos, f_unit)
        selfs.append(float(v[0, 0]))
        pairs.append(float(v[1, 0]))
    m0 = 1.0 / (6.0 * math.pi * eta * a)
    want_self = m0 * (
        1.0 - 2.83729748 * (a / L) + (4.0 * math.pi / 3.0) * (a / L) ** 3
    )
    for s in selfs:
        np.testing.assert_allclose(s, want_self, rtol=2e-3)
    assert max(pairs) - min(pairs) < 2e-3 * abs(np.mean(pairs)) * 10


def test_pse_fluctuation_dissipation():
    L, eta, a = 16.0, 1.0, 1.0
    b = box(L, dtype=jnp.float64)
    pse = PSE.create(b, viscosity=eta, radius=a, xi=0.5, tolerance=1e-4)
    pos = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]], jnp.float64)
    cols = []
    for i in range(2):
        for d in range(3):
            f = jnp.zeros((2, 3), jnp.float64).at[i, d].set(1.0)
            cols.append(np.asarray(pse.compute_mf(pos, f)).ravel())
    M = np.stack(cols, axis=1)
    # mobility must be symmetric positive definite
    np.testing.assert_allclose(M, M.T, atol=1e-6)
    assert np.linalg.eigvalsh(M).min() > 0
    ns = 500
    keys = jax.random.split(jax.random.key(2), ns)
    from uammd_tpu.neighbors.neighbor_list import build_neighbor_list

    nl = build_neighbor_list(pos, b, pse.rcut)
    bs = jax.lax.map(
        lambda k: pse.compute_bdw(pos, k, nl).reshape(-1), keys, batch_size=50
    )
    cov = np.cov(np.asarray(bs).T, bias=True)
    scale = np.abs(M).max()
    np.testing.assert_allclose(cov / scale, M / scale, atol=0.25)
