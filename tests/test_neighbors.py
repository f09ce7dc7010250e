"""Neighbour search correctness vs brute force.

Reference analog: test/utils/ParticleSorter.cu and the neighbour-list
contract of docs/NeighbourList.rst — every pair within the cutoff must be
found, no pair outside the padded cutoff reported.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.grid import Grid
from uammd_tpu.neighbors.cell_list import build_cell_list
from uammd_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    ensure_capacity,
    maybe_rebuild,
    rebuild_neighbor_list,
)


def brute_pairs(pos, L, rc):
    n = len(pos)
    dr = pos[None] - pos[:, None]
    dr -= L * np.round(dr / L)
    r2 = (dr**2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    return {(i, j) for i in range(n) for j in range(n) if r2[i, j] <= rc * rc}


def nlist_pairs(nl):
    idx = np.asarray(nl.idx)
    n = idx.shape[0]
    return {(i, j) for i in range(n) for j in idx[i] if j < n}


@pytest.mark.parametrize("n,L", [(200, 8.0), (400, 10.0)])
def test_neighbor_list_matches_bruteforce(n, L):
    rng = np.random.default_rng(42)
    pos = (rng.random((n, 3)) - 0.5) * L
    rc = 2.0
    b = box(L)
    nl = build_neighbor_list(jnp.asarray(pos), b, rc, skin_multiplier=1.0)
    nl = ensure_capacity(nl, jnp.asarray(pos))
    got = nlist_pairs(nl)
    want = brute_pairs(pos, L, rc)
    assert want <= got  # everything in cutoff found
    # nothing beyond padded cutoff
    extra = got - want
    for i, j in extra:
        dr = pos[i] - pos[j]
        dr -= L * np.round(dr / L)
        assert (dr**2).sum() <= (rc * 1.0 + 1e-9) ** 2


def test_cell_list_counts():
    rng = np.random.default_rng(0)
    n, L = 300, 9.0
    pos = (rng.random((n, 3)) - 0.5) * L
    b = box(L)
    g = Grid(box=b, shape=(3, 3, 3))
    cl = build_cell_list(jnp.asarray(pos), g, capacity=64)
    assert not bool(cl.overflow)
    assert int(cl.cell_count.sum()) == n
    # every particle appears exactly once
    grid = np.asarray(cl.cell_grid).ravel()
    found = sorted(grid[grid < n])
    assert found == list(range(n))


def test_cell_list_overflow_flag():
    pos = jnp.zeros((50, 3))  # all in one cell
    b = box(9.0)
    g = Grid(box=b, shape=(3, 3, 3))
    cl = build_cell_list(pos, g, capacity=16)
    assert bool(cl.overflow)


def test_verlet_skin_rebuild_logic():
    rng = np.random.default_rng(3)
    n, L, rc = 100, 10.0, 2.0
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    b = box(L)
    nl = build_neighbor_list(pos, b, rc, skin_multiplier=1.5)
    assert not bool(nl.needs_rebuild(pos))
    # move one particle less than half the skin: no rebuild
    skin_half = 0.5 * (1.5 - 1.0) * rc
    pos2 = pos.at[0, 0].add(skin_half * 0.9)
    assert not bool(nl.needs_rebuild(pos2))
    pos3 = pos.at[0, 0].add(skin_half * 1.1)
    assert bool(nl.needs_rebuild(pos3))
    nl3 = maybe_rebuild(nl, pos3)
    np.testing.assert_allclose(np.asarray(nl3.ref_pos), np.asarray(pos3))


def test_rebuild_preserves_correctness_after_motion():
    rng = np.random.default_rng(9)
    n, L, rc = 150, 8.0, 1.8
    pos = (rng.random((n, 3)) - 0.5) * L
    b = box(L)
    nl = build_neighbor_list(jnp.asarray(pos), b, rc, skin_multiplier=1.1)
    pos2 = pos + rng.normal(0, 0.5, (n, 3))
    nl2 = rebuild_neighbor_list(nl, jnp.asarray(pos2))
    nl2 = ensure_capacity(nl2, jnp.asarray(pos2))
    want = brute_pairs(pos2, L, rc)
    assert want <= nlist_pairs(nl2)
