"""Tiled scatter-free spread/interpolate vs the direct implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.solvers.ibm import GaussianKernel, Peskin3pt, interpolate, spread
from uammd_tpu.solvers.tiled_ibm import interpolate_tiled, spread_tiled


@pytest.mark.parametrize("m", [36, 40], ids=["padded", "exact-tiles"])
@pytest.mark.parametrize(
    "kern",
    [GaussianKernel(sigma=1.2, support=8), Peskin3pt()],
    ids=["gauss", "peskin3"],
)
def test_tiled_matches_direct(m, kern):
    rng = np.random.default_rng(0)
    n, L = 500, float(m) * 0.61
    b = box(L, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = jnp.asarray(rng.normal(size=(n, 3)))
    f_ref = spread(kern, pos, q, (m, m, m), b)
    f_tile, ovf = spread_tiled(kern, pos, q, (m, m, m), b)
    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(f_tile), np.asarray(f_ref), atol=1e-12
    )
    u = jnp.asarray(rng.normal(size=(m, m, m, 3)))
    v_ref = interpolate(kern, pos, u, b)
    v_tile, _ = interpolate_tiled(kern, pos, u, b)
    np.testing.assert_allclose(
        np.asarray(v_tile), np.asarray(v_ref), atol=1e-12
    )


def test_tiled_overflow_flag():
    b = box(30.0, dtype=jnp.float64)
    pos = jnp.zeros((200, 3), jnp.float64)  # all in one tile
    q = jnp.ones((200, 1), jnp.float64)
    _, ovf = spread_tiled(Peskin3pt(), pos, q, (32, 32, 32), b, cap=8)
    assert bool(ovf)


def test_tiled_boundary_particles():
    """Particles exactly at box edges and tile seams."""
    m, L = 40, 20.0
    b = box(L, dtype=jnp.float64)
    pos = jnp.asarray(
        [
            [-10.0, -10.0, -10.0],
            [9.999, 9.999, 9.999],
            [0.0, 0.0, 0.0],
            [-10.0 + 4.0, 0.0, 0.0],  # tile seam (8 points * h=0.5 = 4.0)
        ]
    )
    q = jnp.ones((4,), jnp.float64)
    kern = Peskin3pt()
    f_ref = spread(kern, pos, q, (m, m, m), b)
    f_tile, _ = spread_tiled(kern, pos, q, (m, m, m), b)
    np.testing.assert_allclose(np.asarray(f_tile), np.asarray(f_ref), atol=1e-13)
    np.testing.assert_allclose(float(f_tile.sum() * (L / m) ** 3), 4.0, rtol=1e-12)
