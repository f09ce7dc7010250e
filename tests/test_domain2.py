"""DD v2: the production Newton/straggler engine over the z-slab mesh
(parallel/domain2.py) vs the single-chip v2 engine (engine/md2.py).

No reference analog (the reference is single-GPU, SURVEY 2.6); the parity
bar is the repo's own production engine: forces AND trajectory must match
through forced cross-shard migrations, with straggler side lists active
(reference workload shape: examples/misc/benchmark.cu:172-181).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from uammd_tpu.engine.layout import choose_spec, unpack
from uammd_tpu.parallel.domain2 import (
    _single_chip_md2,
    gather_md2_state,
    make_domain_md2_step,
    shard_md2_state,
)


def _system(n=2400, L=48.0, seed=0):
    """Jittered lattice + one dense clump (forces straggler traffic)."""
    from uammd_tpu.utils.lattices import lattice

    rng = np.random.default_rng(seed)
    n_clump = 48
    # clump: 4x4x3 lattice at 1.1 sigma spacing inside ~2 cells
    gx, gy, gz = np.meshgrid(*[np.arange(4) * 1.1] * 2, np.arange(3) * 1.1)
    clump = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    clump = (clump + np.array([5.0, 5.0, 5.0]))[:n_clump]
    base = lattice(n, L * 0.98, "fcc")
    base = base + rng.normal(0.0, 0.05, base.shape)
    # clear a hole around the clump so nothing overlaps it
    margin = 1.0
    lo = clump.min(axis=0) - margin
    hi = clump.max(axis=0) + margin
    inside = np.all((base > lo) & (base < hi), axis=1)
    base = base[~inside][: n - n_clump]
    assert base.shape[0] == n - n_clump
    pos = np.concatenate([base, clump], axis=0)
    vel = rng.normal(0.0, 0.3, (n, 3))
    return pos.astype(np.float32), vel.astype(np.float32)


def _setup(n_dev, n=2400, L=48.0, dt=0.05, temperature=0.0):
    pos, vel = _system(n, L)
    spec = choose_spec(
        (L, L, L), n, 2.5, skin=1.2, pos=pos, n_strag=24,
        nz_multiple=n_dev,
    )
    assert spec.shape[2] % n_dev == 0 and spec.shape[2] // n_dev >= 2
    md = _single_chip_md2(
        spec, 1.0, 1.0, dt, temperature, 1.0, 1.0, False, True
    )
    gs = md.init(jnp.asarray(pos), vel=jnp.asarray(vel))
    return md, gs, spec, pos, vel


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [8, 2])
def test_dd2_exact_match_with_migration(n_dev):
    """T=0 trajectory through >= 1 drift-triggered cross-shard rebin must
    match the single-chip v2 engine (stragglers active on both sides).

    Tolerance note: per-step agreement is ~1e-6; the clump makes the
    system chaotic (measured float-noise amplification ~1.3x/step from
    benign boundary expression-order differences), so a 30-step window
    gets a 1e-4 position bar with ~10x cushion."""
    n, dt, steps = 2400, 0.05, 30
    md, gs, spec, pos, vel = _setup(n_dev, n=n, dt=dt)
    assert int(np.asarray((gs.spid >= 0).sum())) > 0, "want stragglers"

    g1 = gs
    for _ in range(steps):
        g1 = md.step(g1)
    p1, v1, f1 = (np.asarray(t) for t in unpack(g1))
    assert not bool(np.asarray(g1.overflow))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("z",))
    step, _ = make_domain_md2_step(
        mesh, spec, dt=dt, temperature=0.0, friction=1.0, n_total=n,
    )
    state = shard_md2_state(md, gs, mesh)
    for _ in range(steps):
        state = step(*state)
    assert float(np.asarray(state[18]).max()) == 0.0, "overflow/lost"
    p2, v2 = gather_md2_state(state, spec, n)

    np.testing.assert_allclose(p2, p1, atol=1e-4)
    np.testing.assert_allclose(v2, v1, atol=5e-4)
    # the run must actually have crossed a rebin for this test to mean
    # anything (drift threshold ~0.25, v~0.3, dt 0.05 -> ~17 steps)
    d = np.abs(p2 - pos).max()
    assert d > spec.drift_threshold, "no migration happened; weak test"


def test_dd2_two_steps_match_quick():
    """Fast smoke: two steps on 4 shards (boundary forces + straggler
    routing, no rebin) vs single chip."""
    n, dt = 2400, 0.05
    md, gs, spec, pos, vel = _setup(4, dt=dt)
    g1 = md.step(md.step(gs))
    p1, v1, _ = (np.asarray(t) for t in unpack(g1))
    mesh = Mesh(np.array(jax.devices()[:4]), ("z",))
    step, _ = make_domain_md2_step(
        mesh, spec, dt=dt, temperature=0.0, friction=1.0, n_total=n,
    )
    state = shard_md2_state(md, gs, mesh)
    state = step(*step(*state))
    p2, v2 = gather_md2_state(state, spec, n)
    np.testing.assert_allclose(p2, p1, atol=1e-5)
    np.testing.assert_allclose(v2, v1, atol=1e-5)


def test_dd2_thermal_run_conserves_particles():
    """Finite-T run on 4 shards: particle count conserved across rebins,
    temperature in a sane band, per-shard noise decorrelated."""
    n_dev = 4
    n = 2400
    dt = 0.02
    md, gs, spec, pos, vel = _setup(n_dev, dt=dt, temperature=1.0)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("z",))
    step, _ = make_domain_md2_step(
        mesh, spec, dt=dt, temperature=1.0, friction=1.0, n_total=n,
    )
    state = shard_md2_state(md, gs, mesh)
    for _ in range(40):
        state = step(*state)
    assert float(np.asarray(state[18]).max()) == 0.0
    p2, v2 = gather_md2_state(state, spec, n)
    assert np.isfinite(p2).all() and np.isfinite(v2).all()
    # count via pidf
    pidf = np.asarray(state[12])
    spidf = np.asarray(state[16])
    total = int((pidf > 0.5).sum()) + int((spidf > 0.5).sum())
    assert total == n
    # w-velocities ~ thermal: equipartition within a loose band
    T_est = float((v2 ** 2).mean())
    assert 0.4 < T_est < 2.5, T_est
