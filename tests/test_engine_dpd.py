"""DPD on the grid-resident fast engine vs the generic neighbour-list path
(reference runs DPD through the same fast transverser as LJ:
PairForces.cuh:23 + Potential/DPD.cuh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.engine import layout
from uammd_tpu.engine.dpd import GridDPD
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list
from uammd_tpu.potentials.dpd import DPD, dpd_forces
from uammd_tpu.utils.lattices import lattice


def _setup(n=320, L=8.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.asarray(lattice(n, L, "fcc"))
    pos = pos + 0.05 * rng.standard_normal(pos.shape)
    vel = rng.standard_normal((n, 3))
    return jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32)


def test_deterministic_part_matches_generic():
    """T = 0: conservative + dissipative forces must match the gathered
    [N, K] path exactly (same math, different executor)."""
    n, L = 320, 8.0
    pos, vel = _setup(n, L)
    params = DPD(cutoff=1.0, A=25.0, gamma=4.5, temperature=0.0, dt=0.01)
    b = box(L)
    nl = build_neighbor_list(pos, b, params.cutoff)
    ref = dpd_forces(params, pos, vel, nl, jnp.int32(3)).force

    md = GridDPD.create(L, n, rc=1.0, A=25.0, gamma=4.5, temperature=0.0,
                        dt=0.01, interpret=True)
    gs = md.init(pos, vel=vel)
    fx, fy, fz = md.compute_forces(gs, gs.vx, gs.vy, gs.vz)
    out = layout.unpack_values(
        _as_channel_grid(gs), (fx, fy, fz)
    )
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err / scale < 1e-5, err / scale


def _as_channel_grid(gs):
    """Adapter: reuse unpack_values' (pid, n) interface for a GridState."""
    import dataclasses as _dc

    class _CG:
        pid = gs.pid
        n = gs.n
        spid = gs.spid

    return _CG()


def test_momentum_conserved_with_noise():
    n, L = 320, 8.0
    pos, vel = _setup(n, L, seed=1)
    vel = vel - vel.mean(axis=0, keepdims=True)
    md = GridDPD.create(L, n, rc=1.0, A=10.0, gamma=4.5, temperature=1.0,
                        dt=0.01, interpret=True)
    gs = md.init(pos, vel=vel)
    gs = md.run(gs, 5)
    assert not bool(jax.device_get(gs.overflow))
    px = float(jnp.sum(gs.vx))
    py = float(jnp.sum(gs.vy))
    pz = float(jnp.sum(gs.vz))
    # pairwise forces (noise included) conserve momentum to the bit-ish
    assert abs(px) < 5e-3 and abs(py) < 5e-3 and abs(pz) < 5e-3, (px, py, pz)


@pytest.mark.slow
def test_dpd_thermostat_temperature():
    """The DPD pair thermostat holds kT (Groot-Warren); engine path."""
    n, L, T = 320, 8.0, 1.0
    pos, vel = _setup(n, L, seed=2)
    md = GridDPD.create(L, n, rc=1.0, A=25.0, gamma=4.5, temperature=T,
                        dt=0.01, interpret=True)
    gs = md.init(pos, seed=3)
    gs = md.run(gs, 300)
    Ts = []
    for _ in range(10):
        gs = md.run(gs, 30)
        Ts.append(float(md.temperature_of(gs)))
    assert not bool(jax.device_get(gs.overflow))
    Tm = float(np.mean(Ts))
    assert abs(Tm - T) < 0.12 * T, Tm
