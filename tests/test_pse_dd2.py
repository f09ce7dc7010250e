"""Composed multi-chip PSE v2 (parallel/pse_dd2.py): persistent sharded
state, straggler near grid, all-to-all far redistribution — vs the
single-chip PSE EM step at non-toy N.

Reference shape: src/Integrator/BDHI/BDHI_EulerMaruyama.cu:125-166; the
sharding layer is the TPU build's own obligation (SURVEY 2.6).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from uammd_tpu.core.box import box
from uammd_tpu.engine.md import lj_g_fused
from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
from uammd_tpu.parallel.pse_dd2 import (
    gather_positions,
    make_sharded_pse_em_step2,
)


def _system(n, L, seed=0):
    """fcc sites + dimer partners (pairs inside the WCA cutoff) + one
    dense-but-non-overlapping clump (2.6 > rc spacing, so zero WCA force)
    that overfills its near cells past the bulk-quantile CAP — the
    straggler side lists must be exercised (VERDICT r4 missing #2)."""
    from uammd_tpu.utils.lattices import lattice

    n_clump = 27
    gx, gy, gz = np.meshgrid(*[np.arange(3) * 2.6] * 3)
    clump = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    clump = clump + np.array([6.0, 6.0, 6.0])
    m = n - n_clump
    sites = np.asarray(lattice((n + 1) // 2, L, "fcc"))
    pos = np.concatenate([sites, sites + np.array([1.5, 0.0, 0.0])])
    # clear a hole around the clump so nothing comes inside the cutoff
    lo, hi = clump.min(0) - 2.4, clump.max(0) + 2.4
    inside = np.all((pos > lo) & (pos < hi), axis=1)
    pos = pos[~inside][:m]
    assert pos.shape[0] == m
    pos = np.concatenate([pos, clump])
    pos -= L * np.round(pos / L)
    return jnp.asarray(pos, jnp.float32)


def _build(n_dev, n=8192, tolerance=1e-2, far_grid=64, S=96):
    phi, radius = 0.05, 1.0
    L = (n * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    pos = _system(n, L)
    be = PSEGrid.create(
        b, n, viscosity=1.0, radius=radius, far_grid=far_grid,
        tolerance=tolerance, lanczos_iterations=4, pos=pos,
        n_strag=S, nz_multiple=n_dev,
    )
    assert be.spec.shape[2] % n_dev == 0
    assert be.spec.shape[2] // n_dev >= 2
    sigma = 2.0 * radius
    rc = 2.0 ** (1.0 / 6.0) * sigma
    # approx=False: pl.reciprocal is Pallas-only, and both the eager
    # single-chip reference loop and ss_apply evaluate g outside kernels
    g = lj_g_fused(1.0, sigma, rc2=rc * rc, approx=False)
    return b, be, g, pos, n


# D=4 exercises the generic ring (both neighbors distinct);
# D=2 the aliased-neighbor dedup branches. D=8 would need
# nz >= 16, i.e. box/cutoff geometry this N cannot give
# (near rcut ~6.2 at tolerance 1e-2); the dryrun covers D=8
# at a finer far grid (__graft_entry__ strategy 8).
@pytest.mark.parametrize("n_dev", [4, 2])
def test_composed_pse2_matches_single_chip(n_dev):
    """T=0 EM trajectory at N=8192 through a FORCED near-grid rebin: the
    fully sharded persistent step must match the single-chip step."""
    b, be, g, pos, n = _build(n_dev)
    dt = 0.05
    steps = 3

    force_slots = be.make_pair_force_slots(g)
    p_ref = pos
    key = jax.random.key(0)
    for _ in range(2 * steps):
        dx, _f, ovf = be.displacement_with_pair_force(
            force_slots, p_ref, key, dt, 0.0
        )
        assert not bool(np.asarray(ovf))
        p_ref = b.wrap_position(p_ref + dx)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    step, make_state = make_sharded_pse_em_step2(
        mesh, be, g_pair=g, dt=dt, temperature=0.0, n=n, axis="d",
    )
    st = make_state(pos)
    assert int((np.asarray(st[8]) > 0.5).sum()) > 0, "want stragglers"
    for _ in range(steps):
        st = step(st, key)
    # force a shard-local rebin (shift the drift references), then finish
    st = list(st)
    st[4] = st[4] + 10.0 * be.spec.drift_threshold
    st = tuple(st)
    for _ in range(steps):
        st = step(st, key)
    assert float(np.asarray(st[10]).max()) == 0.0, "overflow/lost"
    assert int(np.asarray(st[11]).max()) >= 1, "rebin never fired"
    p_dd = gather_positions(st, be.spec, n)
    p_ref_np = np.asarray(jax.device_get(p_ref))
    # compare modulo the box wrap
    L = float(jax.device_get(b.size)[0])
    d = p_dd - p_ref_np
    d -= L * np.round(d / L)
    assert np.abs(d).max() < 1e-4, np.abs(d).max()


def test_composed_pse2_finite_temperature_step():
    """One noisy step on the 4-mesh: distributed Lanczos over slot +
    straggler rows, fused far noise; finite, no overflow, moves."""
    n_dev = 4
    b, be, g, pos, n = _build(n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    step, make_state = make_sharded_pse_em_step2(
        mesh, be, g_pair=g, dt=0.01, temperature=1.0, n=n, axis="d",
    )
    st = make_state(pos)
    st2 = step(st, jax.random.key(7))
    assert float(np.asarray(st2[10]).max()) == 0.0
    p0 = gather_positions(st, be.spec, n)
    p1 = gather_positions(st2, be.spec, n)
    assert np.isfinite(p1).all()
    assert np.abs(p1 - p0).max() > 0.0


def test_far_bucket_overflow_latches():
    """Deliberately undersized all-to-all bucket capacity must latch ovf
    (the far redistribution's error-flag idiom, CellListBase.cuh:82-85)."""
    n_dev = 4
    b, be, g, pos, n = _build(n_dev, n=2048, far_grid=48, S=16)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("d",))
    step, make_state = make_sharded_pse_em_step2(
        mesh, be, g_pair=g, dt=0.01, temperature=0.0, n=n, axis="d",
        far_m2=8,  # ~2048/16 = 128 needed per bucket on average
    )
    st = make_state(pos)
    st = step(st, jax.random.key(1))
    assert float(np.asarray(st[10]).max()) > 0.0, "ovf should have latched"
