"""SPH on the grid-resident fast engine vs the generic neighbour-list path
(reference runs SPH through the same fast transverser as LJ:
src/Interactor/SPH.cuh:44 over a VerletList)."""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.core.box import box
from uammd_tpu.engine import layout
from uammd_tpu.engine.sph import GridSPH
from uammd_tpu.interactors.sph import SPHParams, sph_density, sph_forces
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list
from uammd_tpu.utils.lattices import lattice


def _setup(n=320, L=10.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.asarray(lattice(n, L, "fcc"))
    pos = pos + 0.05 * rng.standard_normal(pos.shape)
    vel = 0.3 * rng.standard_normal((n, 3))
    return jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32)


def _as_channel_grid(gs):
    class _CG:
        pid = gs.pid
        n = gs.n
        spid = gs.spid

    return _CG()


def test_engine_sph_matches_generic():
    """Density and force must match the gathered [N, K] path (same math,
    different executor)."""
    n, L = 320, 10.0
    pos, vel = _setup(n, L)
    params = SPHParams(support=1.0, viscosity=10.0, gas_stiffness=30.0,
                       rest_density=0.3)
    b = box(L)
    nl = build_neighbor_list(pos, b, params.max_cutoff)
    mass = jnp.ones((n,), jnp.float32)
    rho_ref = sph_density(params, pos, mass, nl, box=b)
    f_ref = sph_forces(params, pos, vel, mass, nl, box=b).force

    md = GridSPH.create(L, n, params, dt=0.005, interpret=True)
    gs = md.init(pos, vel=vel)
    cg = _as_channel_grid(gs)

    rho_slots = md.density(gs)
    rho_out = layout.unpack_values(cg, (rho_slots,))[:, 0]
    np.testing.assert_allclose(
        np.asarray(rho_out), np.asarray(rho_ref), rtol=2e-5, atol=1e-6
    )

    fx, fy, fz = md.compute_forces(gs, gs.vx, gs.vy, gs.vz)
    f_out = layout.unpack_values(cg, (fx, fy, fz))
    err = np.abs(np.asarray(f_out) - np.asarray(f_ref)).max()
    scale = np.abs(np.asarray(f_ref)).max()
    assert err / scale < 1e-4, err / scale


def test_engine_sph_momentum_conserved():
    n, L = 320, 10.0
    pos, vel = _setup(n, L, seed=1)
    vel = vel - vel.mean(axis=0, keepdims=True)
    params = SPHParams(support=1.0, viscosity=10.0, gas_stiffness=30.0,
                       rest_density=0.3)
    md = GridSPH.create(L, n, params, dt=0.002, interpret=True)
    gs = md.init(pos, vel=vel)
    gs = md.run(gs, 5)
    assert not bool(jax.device_get(gs.overflow))
    for comp in (gs.vx, gs.vy, gs.vz):
        assert abs(float(jnp.sum(comp))) < 5e-3
