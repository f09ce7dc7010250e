"""Multi-chip: domain-decomposed engine vs single-device reference.

No reference analog (the reference is single-GPU, SURVEY 2.6); this
validates the TPU-native scaling layer on the 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uammd_tpu.engine.md import make_lj_md
from uammd_tpu.engine.layout import unpack
from uammd_tpu.parallel.atom import (
    initial_sharded_arrays,
    make_mesh,
    sharded_lj_langevin_step,
)
from uammd_tpu.parallel.domain import make_domain_md_step, shard_grid_state
from uammd_tpu.core.box import box


def test_domain_decomposition_matches_single_device():
    """T=0, friction=0: the z-sharded halo-exchange step must reproduce the
    single-device NVE step exactly."""
    from uammd_tpu.utils.lattices import lattice

    rng = np.random.default_rng(0)
    n, L = 1200, 24.0  # 8^3 cells -> nz=8 divisible by 8 devices
    pos = lattice(n, L, "fcc") + rng.normal(0, 0.05, (n, 3))
    md = make_lj_md(L, n, dt=0.004, temperature=0.0)
    assert md.spec.shape[2] % 8 == 0
    gs = md.init(pos, seed=0)
    # give particles velocities
    key = jax.random.key(5)
    m = gs.mask
    dt_ = gs.x.dtype
    gs = gs.replace(
        vx=0.3 * jax.random.normal(key, gs.x.shape, dt_) * m,
        vy=0.3 * jax.random.normal(jax.random.fold_in(key, 1), gs.x.shape, dt_) * m,
        vz=0.3 * jax.random.normal(jax.random.fold_in(key, 2), gs.x.shape, dt_) * m,
    )
    gs = md.compute_forces(gs)

    # single-device trajectory (no rebin: few steps, small drift)
    g1 = gs
    for _ in range(3):
        g1 = md.step_nve(g1)
    p1, v1, f1 = (np.asarray(t) for t in unpack(g1))

    # domain-decomposed trajectory
    mesh = make_mesh(8, axis="z")
    step, sharding = make_domain_md_step(
        mesh, md.spec, dt=0.004, temperature=0.0, friction=0.0
    )
    arrays, keys = shard_grid_state(gs, mesh)
    out = step(*arrays, keys)
    for _ in range(2):
        out = step(*out[:9], out[9])
    g2 = gs.replace(
        x=out[0], y=out[1], z=out[2], vx=out[3], vy=out[4], vz=out[5],
        fx=out[6], fy=out[7], fz=out[8],
    )
    p2, v2, f2 = (np.asarray(t) for t in unpack(g2))
    np.testing.assert_allclose(p2, p1, atol=1e-5)
    np.testing.assert_allclose(v2, v1, atol=1e-5)


def test_atom_decomposition_runs_and_conserves_momentum():
    mesh = make_mesh(8, axis="p")
    b = box(12.0)
    step = sharded_lj_langevin_step(mesh, b, dt=0.002, temperature=0.0,
                                    friction=0.0)
    pos, vel, force, keys = initial_sharded_arrays(mesh, 8 * 32, b, seed=1)
    for _ in range(3):
        pos, vel, force, keys = step(pos, vel, force, keys)
    # Newton's third law: net momentum stays zero relative to the motion
    # scale (random overlaps make |F| huge, so the bound is relative)
    ptot = np.abs(np.asarray(jnp.sum(vel, axis=0))).max()
    vscale = float(jnp.sum(jnp.abs(vel)))
    assert ptot < 1e-5 * vscale, (ptot, vscale)
    assert bool(jnp.all(jnp.isfinite(pos)))
