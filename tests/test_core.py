"""Core: box, grid, state, rng (reference analog: src/utils tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.grid import Grid, next_fft_size
from uammd_tpu.core.rng import pair_normal, pair_uniform
from uammd_tpu.core.state import make_state, next_key


def test_box_wrap_minimum_image():
    b = box([10.0, 20.0, 30.0])
    dr = jnp.array([[6.0, -11.0, 16.0]])
    w = b.wrap(dr)
    np.testing.assert_allclose(np.asarray(w), [[-4.0, 9.0, -14.0]], atol=1e-12)


def test_box_aperiodic_axis():
    b = box([10.0, 10.0, 10.0], periodic=(True, True, False))
    dr = jnp.array([[6.0, 6.0, 6.0]])
    w = b.wrap(dr)
    np.testing.assert_allclose(np.asarray(w), [[-4.0, -4.0, 6.0]], atol=1e-12)


def test_grid_cell_roundtrip():
    b = box(12.0)
    g = Grid(box=b, shape=(4, 4, 4))
    pos = jnp.array([[-5.9, 0.0, 5.9], [0.1, 0.1, 0.1]])
    cells = g.cell_of(pos)
    assert cells.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(cells[0]), [0, 2, 3])
    flat = g.cell_index(cells)
    assert int(flat[0]) == 0 + 4 * (2 + 4 * 3)


def test_next_fft_size():
    assert next_fft_size(17) == 18  # 2*3^2
    assert next_fft_size(128) == 128
    assert next_fft_size(65, prefer_pow2=True) == 128


def test_state_key_threading():
    st = make_state(np.zeros((4, 3)), seed=7)
    st2, k = next_key(st)
    assert not jnp.array_equal(
        jax.random.key_data(st.key), jax.random.key_data(st2.key)
    )


def test_pair_rng_symmetry_and_stats():
    i = jnp.arange(0, 1000)
    j = jnp.arange(1000, 2000)
    u_ij = pair_uniform(i, j, 5)
    u_ji = pair_uniform(j, i, 5)
    np.testing.assert_array_equal(np.asarray(u_ij), np.asarray(u_ji))
    # different counter -> different stream
    assert not np.allclose(np.asarray(u_ij), np.asarray(pair_uniform(i, j, 6)))
    n = pair_normal(i, j, 3, dtype=jnp.float64)
    assert abs(float(jnp.mean(n))) < 0.15
    assert abs(float(jnp.std(n)) - 1.0) < 0.15


def test_state_pytree_roundtrip():
    st = make_state(np.random.randn(8, 3), vel=np.zeros((8, 3)), seed=0)
    leaves, treedef = jax.tree_util.tree_flatten(st)
    st2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
