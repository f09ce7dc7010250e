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


def test_domain_rebin_matches_single_device_rebin():
    """Cross-shard migration: after a drift, the DD local rebin (halo pull +
    two-sort binning) must produce the same particle->cell assignment as the
    single-device layout.rebin."""
    from uammd_tpu.engine import layout
    from uammd_tpu.parallel.domain import (
        make_domain_md_step2, shard_grid_state2,
    )
    from uammd_tpu.utils.lattices import lattice

    rng = np.random.default_rng(1)
    n, L = 1200, 24.0
    pos = lattice(n, L, "fcc") + rng.normal(0, 0.05, (n, 3))
    md = make_lj_md(L, n, dt=0.004, temperature=0.0)
    gs = md.init(pos, seed=0)
    # drift everything by strictly less than one cell (the DD migration
    # contract: a particle moves at most one cell between rebins)
    key = jax.random.key(9)
    d = [
        jnp.clip(
            1.2 * jax.random.normal(jax.random.fold_in(key, i),
                                    gs.x.shape, gs.x.dtype),
            -1.4, 1.4,
        ) * gs.mask
        for i in range(3)
    ]
    vel = [
        0.5 * jax.random.normal(jax.random.fold_in(key, 10 + i),
                                gs.x.shape, gs.x.dtype) * gs.mask
        for i in range(3)
    ]
    moved = gs.replace(x=gs.x + d[0], y=gs.y + d[1], z=gs.z + d[2],
                       vx=vel[0], vy=vel[1], vz=vel[2])

    ref = layout.rebin(moved)
    pr, vr, _ = (np.asarray(t) for t in unpack(ref))

    # dt = 0: the step is a pure rebin (positions/velocities untouched by
    # the integrator), so the comparison against layout.rebin is exact
    mesh = make_mesh(8, axis="z")
    step, _ = make_domain_md_step2(
        mesh, md.spec, dt=0.0, temperature=0.0, friction=0.0, n_total=n
    )
    # one step with dt ~ 0: positions unchanged, but ref = init positions
    # pre-drift forces a rebin through the drift criterion
    st = list(shard_grid_state2(moved, mesh))
    st[9], st[10], st[11] = (jax.device_put(a, None) for a in (gs.x, gs.y, gs.z))
    out = step(*st)
    g2 = moved.replace(
        x=out[0], y=out[1], z=out[2], vx=out[3], vy=out[4], vz=out[5],
        pid=out[12].astype(jnp.int32) - 1,
    )
    assert float(np.asarray(out[13]).max()) == 0.0, "overflow/lost particles"
    p2, v2, _ = (np.asarray(t) for t in unpack(g2))
    np.testing.assert_allclose(p2, pr, atol=1e-5)
    np.testing.assert_allclose(v2, vr, atol=1e-6)


def test_domain_long_run_with_migrations():
    """100+ steps at finite T on the 8-device mesh: multiple rebins, no
    particle loss, finite fields, temperature in a sane band."""
    from uammd_tpu.parallel.domain import (
        make_domain_md_step2, shard_grid_state2,
    )
    from uammd_tpu.utils.lattices import lattice

    n, L = 1200, 24.0
    pos = lattice(n, L, "fcc")
    md = make_lj_md(L, n, dt=0.005, temperature=1.0)
    gs = md.init(pos, seed=3)
    mesh = make_mesh(8, axis="z")
    step, _ = make_domain_md_step2(
        mesh, md.spec, dt=0.005, temperature=1.0, friction=1.0, n_total=n
    )
    st = shard_grid_state2(gs, mesh)

    @jax.jit
    def run(st):
        def body(c, _):
            return step(*c), None
        return jax.lax.scan(body, st, None, length=120)[0]

    out = run(st)
    assert float(np.asarray(out[13]).max()) == 0.0, "overflow/lost particles"
    pidf = np.asarray(out[12])
    assert int((pidf > 0.5).sum()) == n
    # rebins actually happened: reference positions moved from the originals
    assert float(np.abs(np.asarray(out[9]) - np.asarray(st[9])).max()) > 0
    vx, vy, vz = (np.asarray(out[i]) for i in (3, 4, 5))
    mask = pidf > 0.5
    T = float((vx[mask] ** 2 + vy[mask] ** 2 + vz[mask] ** 2).sum() / (3 * n))
    assert np.isfinite(T) and 0.5 < T < 1.6, T
