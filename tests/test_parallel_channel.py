"""Domain-decomposed DPD and SPH engines vs the single-chip engines.

The reference runs every pair potential through one fast machinery
(reference: src/Interactor/PairForces.cuh:23); the TPU DD layer is likewise
potential-agnostic — these tests pin the channel-kernel engines (DPD, SPH)
to their single-chip counterparts on the 8-device CPU mesh, including
drift-triggered cross-shard migration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.engine.dpd import GridDPD
from uammd_tpu.engine.layout import unpack
from uammd_tpu.engine.sph import GridSPH
from uammd_tpu.interactors.sph import SPHParams
from uammd_tpu.parallel.atom import make_mesh
from uammd_tpu.parallel.domain import (
    make_domain_dpd_step,
    make_domain_sph_step,
    shard_channel_state,
)
from uammd_tpu.utils.lattices import lattice


def _dpd_system(n=1200, L=24.0, temperature=1.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.asarray(lattice(n, L, "fcc")) + 0.03 * rng.standard_normal((n, 3))
    vel = 0.5 * rng.standard_normal((n, 3))
    # rc 2.5 x skin 1.1 = 2.75 -> nz = int(24 / 2.75) = 8 cells (divisible
    # by the 8-device mesh)
    md = GridDPD.create(L, n, rc=2.5, A=10.0, gamma=2.0,
                        temperature=temperature, dt=0.01, interpret=True)
    assert md.spec.shape[2] % 8 == 0, md.spec.shape
    gs = md.init(jnp.asarray(pos, jnp.float32),
                 vel=jnp.asarray(vel, jnp.float32))
    return md, gs


def test_domain_dpd_matches_single_chip():
    """A few steps without rebins: the DD DPD trajectory (halo exchange +
    local channel kernel + identical counter RNG) must reproduce the
    single-chip engine."""
    md, gs = _dpd_system(temperature=1.0)
    g1 = gs
    for _ in range(3):
        g1 = md.step(g1)
    p1, v1, f1 = (np.asarray(t) for t in unpack(g1))

    mesh = make_mesh(8, axis="z")
    step, _ = make_domain_dpd_step(
        mesh, md.spec, rc=2.5, A=10.0, gamma=2.0, temperature=1.0,
        dt=0.01, n_total=gs.n,
    )
    st = shard_channel_state(gs, mesh)
    out = st
    for _ in range(3):
        out = step(*out)
    assert float(np.asarray(out[13]).max()) == 0.0, "overflow/lost particles"
    g2 = gs.replace(
        x=out[0], y=out[1], z=out[2], vx=out[3], vy=out[4], vz=out[5],
        fx=out[6], fy=out[7], fz=out[8],
        pid=out[12].astype(jnp.int32) - 1,
    )
    p2, v2, f2 = (np.asarray(t) for t in unpack(g2))
    np.testing.assert_allclose(p2, p1, atol=1e-5)
    np.testing.assert_allclose(v2, v1, atol=1e-5)
    np.testing.assert_allclose(f2, f1, atol=1e-4)


def test_domain_dpd_long_run_migrations_and_momentum():
    """40 steps at finite T: multiple cross-shard rebins, no particle loss,
    and momentum conservation (the DPD pair force — random part included —
    is exactly antisymmetric under the symmetric counter hash)."""
    md, gs = _dpd_system(temperature=1.0, seed=3)
    mesh = make_mesh(8, axis="z")
    step, _ = make_domain_dpd_step(
        mesh, md.spec, rc=2.5, A=10.0, gamma=2.0, temperature=1.0,
        dt=0.02, n_total=gs.n,
    )
    st = shard_channel_state(gs, mesh)
    p0 = np.asarray(jax.device_get(
        jnp.stack([jnp.sum(st[3]), jnp.sum(st[4]), jnp.sum(st[5])])
    ))
    out = st
    for _ in range(40):
        out = step(*out)
        # block per step: queueing many async collective steps on the
        # 1-core/8-virtual-device CPU emulation trips XLA's in-process
        # collective stuck-detector (AwaitAndLogIfStuck abort)
        jax.block_until_ready(out[0])
    assert float(np.asarray(out[13]).max()) == 0.0, "overflow/lost particles"
    pidf = np.asarray(out[12])
    assert int((pidf > 0.5).sum()) == gs.n
    # at least one rebin happened (reference positions moved)
    assert float(np.abs(np.asarray(out[9]) - np.asarray(st[9])).max()) > 0
    p1 = np.asarray(jax.device_get(
        jnp.stack([jnp.sum(out[3]), jnp.sum(out[4]), jnp.sum(out[5])])
    ))
    vscale = float(jnp.sum(jnp.abs(out[3])) + jnp.sum(jnp.abs(out[4]))
                   + jnp.sum(jnp.abs(out[5])))
    assert np.abs(p1 - p0).max() < 1e-4 * vscale, (p0, p1, vscale)
    assert bool(jnp.all(jnp.isfinite(out[0])))


def _sph_system(n=1024, L=24.0, seed=1):
    rng = np.random.default_rng(seed)
    pos = np.asarray(lattice(n, L, "sc")) + 0.02 * rng.standard_normal((n, 3))
    vel = 0.1 * rng.standard_normal((n, 3))
    params = SPHParams(support=1.5, viscosity=5.0, gas_stiffness=10.0,
                       rest_density=0.08)
    md = GridSPH.create(L, n, params, dt=0.005, skin=1.0, interpret=True)
    assert md.spec.shape[2] % 8 == 0, md.spec.shape
    gs = md.init(jnp.asarray(pos, jnp.float32),
                 vel=jnp.asarray(vel, jnp.float32))
    return md, params, gs


def test_domain_sph_matches_single_chip():
    """DD SPH (two halo rounds per step: density, then exchanged P/rho^2)
    must reproduce the single-chip two-sweep engine."""
    md, params, gs = _sph_system()
    g1 = gs
    for _ in range(3):
        g1 = md.step(g1)
    p1, v1, f1 = (np.asarray(t) for t in unpack(g1))

    mesh = make_mesh(8, axis="z")
    step, _ = make_domain_sph_step(
        mesh, md.spec, params, dt=0.005, n_total=gs.n,
    )
    st = shard_channel_state(gs, mesh)
    out = st
    for _ in range(3):
        out = step(*out)
    assert float(np.asarray(out[13]).max()) == 0.0, "overflow/lost particles"
    g2 = gs.replace(
        x=out[0], y=out[1], z=out[2], vx=out[3], vy=out[4], vz=out[5],
        fx=out[6], fy=out[7], fz=out[8],
        pid=out[12].astype(jnp.int32) - 1,
    )
    p2, v2, f2 = (np.asarray(t) for t in unpack(g2))
    np.testing.assert_allclose(p2, p1, atol=1e-5)
    np.testing.assert_allclose(v2, v1, atol=1e-5)
    np.testing.assert_allclose(f2, f1, atol=1e-4)


def test_domain_sph_run_with_migrations():
    """Longer DD SPH run across rebins: particles conserved, fields finite."""
    md, params, gs = _sph_system(seed=4)
    mesh = make_mesh(8, axis="z")
    step, _ = make_domain_sph_step(
        mesh, md.spec, params, dt=0.01, n_total=gs.n,
    )
    out = shard_channel_state(gs, mesh)
    for _ in range(30):
        out = step(*out)
        jax.block_until_ready(out[0])  # see momentum test: stuck-detector
    assert float(np.asarray(out[13]).max()) == 0.0, "overflow/lost particles"
    pidf = np.asarray(out[12])
    assert int((pidf > 0.5).sum()) == gs.n
    assert bool(jnp.all(jnp.isfinite(out[0])))
    assert bool(jnp.all(jnp.isfinite(out[3])))
