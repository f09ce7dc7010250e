"""Tiled scatter-free spread/interpolate vs the direct implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.solvers.ibm import (
    GaussianKernel,
    Peskin3pt,
    interpolate,
    interpolate_auto,
    spread,
    spread_auto,
)
from uammd_tpu.solvers.tiled_ibm import (
    interpolate_tiled,
    spread_tiled,
    tile_shape_ok,
)


@pytest.mark.parametrize("tile", [4, 8], ids=["tile4", "tile8"])
@pytest.mark.parametrize("m", [36, 40], ids=["padded", "exact-tiles"])
@pytest.mark.parametrize(
    "kern",
    [GaussianKernel(sigma=1.2, support=8), Peskin3pt()],
    ids=["gauss", "peskin3"],
)
def test_tiled_matches_direct(m, kern, tile):
    rng = np.random.default_rng(0)
    n, L = 500, float(m) * 0.61
    b = box(L, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = jnp.asarray(rng.normal(size=(n, 3)))
    f_ref = spread(kern, pos, q, (m, m, m), b)
    f_tile, ovf = spread_tiled(kern, pos, q, (m, m, m), b, tile=tile)
    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(f_tile), np.asarray(f_ref), atol=1e-12
    )
    u = jnp.asarray(rng.normal(size=(m, m, m, 3)))
    v_ref = interpolate(kern, pos, u, b)
    v_tile, _ = interpolate_tiled(kern, pos, u, b, tile=tile)
    np.testing.assert_allclose(
        np.asarray(v_tile), np.asarray(v_ref), atol=1e-12
    )


def test_tile_shape_ok_predicate():
    # support 6: partial width >= 3 required (w in {1,2} unsafe)
    assert tile_shape_ok((40, 40, 40), 6)
    assert tile_shape_ok((35, 40, 40), 6)  # w=3 safe
    assert not tile_shape_ok((26, 40, 40), 6)  # w=2 drops wrap terms
    assert not tile_shape_ok((25, 40, 40), 6)
    # support 8 needs w >= 4
    assert tile_shape_ok((36, 40, 40), 8)
    assert not tile_shape_ok((35, 40, 40), 8)
    # fewer than 3 tiles per axis is never ok
    assert not tile_shape_ok((16, 40, 40), 6)


def test_tiled_rejects_unsafe_shape():
    b = box(26.0, dtype=jnp.float64)
    pos = jnp.zeros((10, 3), jnp.float64)
    q = jnp.ones((10, 1), jnp.float64)
    with pytest.raises(AssertionError, match="partial trailing tile"):
        spread_tiled(GaussianKernel(sigma=1.0, support=6), pos, q,
                     (26, 26, 26), b)


def test_auto_falls_back_on_unsafe_shape():
    """The advisor's repro: a 26-node axis with a support-6 kernel loses
    wrap contributions on the tiled path; spread_auto must fall back to the
    direct path and agree with it exactly."""
    rng = np.random.default_rng(3)
    m, n = 26, 4500  # n above the tiled-path threshold
    L = float(m) * 0.7
    b = box(L, dtype=jnp.float64)
    kern = GaussianKernel(sigma=1.1, support=6)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = jnp.asarray(rng.normal(size=(n, 3)))
    f_auto = spread_auto(kern, pos, q, (m, m, m), b)
    f_ref = spread(kern, pos, q, (m, m, m), b)
    np.testing.assert_allclose(np.asarray(f_auto), np.asarray(f_ref),
                               atol=1e-12)
    u = jnp.asarray(rng.normal(size=(m, m, m)))
    v_auto = interpolate_auto(kern, pos, u, b)
    v_ref = interpolate(kern, pos, u, b)
    np.testing.assert_allclose(np.asarray(v_auto), np.asarray(v_ref),
                               atol=1e-12)


def test_auto_nan_poisons_on_overflow():
    """Tile-capacity overflow must not silently drop particles: the auto
    wrappers poison the result with NaN so downstream checks trip."""
    m = 40
    b = box(40.0, dtype=jnp.float64)
    # everyone clustered into one tile -> cap blown
    pos = jnp.zeros((5000, 3), jnp.float64) + 0.1
    q = jnp.ones((5000, 3), jnp.float64)
    kern = Peskin3pt()
    f = spread_auto(kern, pos, q, (m, m, m), b, cap=8)
    assert bool(jnp.any(jnp.isnan(f)))
    u = jnp.ones((m, m, m, 3), jnp.float64)
    v = interpolate_auto(kern, pos, u, b, cap=8)
    assert bool(jnp.any(jnp.isnan(v)))


def test_tiled_partial_tile_safe_shape():
    """w=3 partial tiles with a support-6 kernel are exactly correct."""
    rng = np.random.default_rng(5)
    m, n = 35, 600
    L = float(m) * 0.61
    b = box(L, dtype=jnp.float64)
    kern = GaussianKernel(sigma=1.0, support=6)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = jnp.asarray(rng.normal(size=(n, 2)))
    # explicit cap: with partial tiles the mean-density default undersizes
    # the (bigger) interior tiles
    f_ref = spread(kern, pos, q, (m, m, m), b)
    f_tile, ovf = spread_tiled(kern, pos, q, (m, m, m), b, cap=24)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(f_tile), np.asarray(f_ref),
                               atol=1e-12)
    u = jnp.asarray(rng.normal(size=(m, m, m, 2)))
    v_ref = interpolate(kern, pos, u, b)
    v_tile, _ = interpolate_tiled(kern, pos, u, b, cap=24)
    np.testing.assert_allclose(np.asarray(v_tile), np.asarray(v_ref),
                               atol=1e-12)


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
