"""v2 engine (Newton pair kernel + stragglers + deferred half-kick) vs the
v1 engine on identical configurations. CPU interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.engine import layout
from uammd_tpu.engine.md import GridMD, lj_g, make_lj_md
from uammd_tpu.engine.md2 import GridMD2, make_lj_md2
from uammd_tpu.engine.rebin_kernel import rebin_fast2, rebin_fast3
from uammd_tpu.utils.lattices import lattice


def liquidish(n, L, seed=0, jitter=0.3):
    rng = np.random.default_rng(seed)
    pos = np.asarray(lattice(n, L, "fcc"))
    return jnp.asarray(pos + jitter * rng.standard_normal(pos.shape),
                       jnp.float32)


@pytest.fixture(scope="module")
def system():
    n, L = 600, 12.0  # rho ~ 0.35, 4x4x4 cells of edge 3
    return n, L, liquidish(n, L)


def _force_of(md, gs, n):
    _, _, f = layout.unpack(md.compute_forces(gs) if hasattr(md, "g_fn")
                            else md.compute_forces(gs))
    return np.asarray(f[:n])


def test_newton_forces_match_v1(system):
    """v2 (Newton + reaction fold + straggler rows) == v1 27-offset kernel."""
    n, L, pos = system
    md1 = make_lj_md(L, n, dt=0.004, temperature=0.0, pos=pos)
    gs1 = md1.init(pos, seed=0)
    f1 = np.asarray(layout.unpack(gs1)[2])

    # force straggler usage: cap below the max occupancy
    spec1 = md1.spec
    md2 = make_lj_md2(L, n, dt=0.004, temperature=0.0, cap=8, n_strag=128,
                      pos=pos)
    assert md2.spec.shape == spec1.shape
    gs2 = md2.init(pos, seed=0)
    assert int(jax.device_get(jnp.sum(gs2.spid >= 0))) > 0, (
        "test must exercise the straggler path"
    )
    assert not bool(jax.device_get(gs2.overflow))
    f2 = np.asarray(layout.unpack(gs2)[2])

    scale = np.abs(f1).max()
    assert np.abs(f2 - f1).max() / scale < 5e-6, (
        np.abs(f2 - f1).max() / scale
    )


@pytest.mark.slow
def test_nve_trajectory_matches_v1(system):
    """Velocity-Verlet limit: v2 (T=0) follows v1 step_nve trajectories.

    Gentle configuration (small jitter, small dt) so f32 summation-order
    differences don't get amplified chaotically within the window."""
    n, L, _ = system
    pos = liquidish(n, L, seed=3, jitter=0.08)
    md1 = make_lj_md(L, n, dt=5e-4, temperature=0.0, pos=pos)
    gs1 = md1.init(pos, seed=0)
    md2 = make_lj_md2(L, n, dt=5e-4, temperature=0.0, cap=8, n_strag=128,
                      pos=pos)
    gs2 = md2.init(pos, seed=0)

    for _ in range(6):
        gs1 = md1.step_nve(gs1)
        gs2 = md2.step(gs2)
    p1 = np.asarray(layout.unpack(gs1)[0])
    p2 = np.asarray(layout.unpack(gs2)[0])
    # wrap-insensitive comparison
    d = p1 - p2
    d -= L * np.round(d / L)
    assert np.abs(d).max() < 2e-4, np.abs(d).max()
    assert not bool(jax.device_get(gs2.overflow))


@pytest.mark.slow
def test_rebin2_matches_sort_rebin(system):
    """Pallas straggler rebin == sort-based straggler rebin after drift."""
    n, L, pos = system
    md2 = make_lj_md2(L, n, dt=0.002, temperature=1.0, cap=8, n_strag=128,
                      pos=pos)
    gs = md2.init(pos, seed=1)
    # drift everything by less than one cell and rebin both ways; small
    # amplitude keeps every post-drift cell within CAP + OCAP (the Pallas
    # rebin's per-cell overflow mini-grid depth)
    key = jax.random.key(7)
    dx = jnp.clip(0.35 * jax.random.normal(key, gs.x.shape, jnp.float32),
                  -1.0, 1.0) * gs.mask
    sdx = 0.35 * jax.random.normal(key, gs.spos.shape, jnp.float32)
    sdx = sdx * (gs.spid >= 0)[:, None]
    moved = gs.replace(x=gs.x + dx, y=gs.y + 0.5 * dx, z=gs.z - 0.3 * dx,
                       spos=gs.spos + sdx)

    a = rebin_fast2(moved)
    b = layout.rebin(moved)
    c = rebin_fast3(moved)
    assert not bool(jax.device_get(a.overflow))
    assert not bool(jax.device_get(b.overflow))
    assert not bool(jax.device_get(c.overflow))
    pc, vc, _ = (np.asarray(u) for u in layout.unpack(c))

    pa, va, _ = (np.asarray(u) for u in layout.unpack(a))
    pb, vb, _ = (np.asarray(u) for u in layout.unpack(b))
    np.testing.assert_allclose(pa, pb, atol=1e-5)
    np.testing.assert_allclose(va, vb, atol=1e-6)
    np.testing.assert_allclose(pc, pb, atol=1e-5)
    np.testing.assert_allclose(vc, vb, atol=1e-6)
    assert int((c.pid >= 0).sum()) + int((c.spid >= 0).sum()) == n
    # both assign the same number of particles to the overflow list (WHICH
    # ranks >= CAP within an overfull cell differs by enumeration order —
    # both assignments are valid; the unpack equality above is the real
    # correctness statement)
    assert int((a.spid >= 0).sum()) == int((b.spid >= 0).sum())
    # every straggler's cell is genuinely at capacity in the grid
    assert int((a.pid >= 0).sum()) + int((a.spid >= 0).sum()) == n


def test_langevin_equipartition_v2(system):
    """G-J thermostat on the v2 engine reaches the target temperature
    (gentle start: a strongly jittered lattice has overlaps whose clamped
    LJ forces blow up any dt ~ 5e-3 integrator — physics, not engine)."""
    n, L, _ = system
    pos = liquidish(n, L, seed=5, jitter=0.05)
    md2 = make_lj_md2(L, n, dt=0.005, temperature=1.3, friction=1.0,
                      cap=16, n_strag=128, pos=pos)
    gs = md2.init(pos, seed=2)
    gs = md2.run(gs, 200)
    T = float(jax.device_get(md2.temperature_of(gs)))
    assert not bool(jax.device_get(gs.overflow))
    assert int(jax.device_get((gs.pid >= 0).sum() + (gs.spid >= 0).sum())) == n
    assert abs(T - 1.3) < 0.15, T


def test_straggler_overflow_latches():
    """More coincident particles than CAP + OCAP + S can hold -> flag."""
    n, L = 256, 9.0
    pos = jnp.zeros((n, 3), jnp.float32)  # everyone in one cell
    md2 = make_lj_md2(L, n, dt=0.001, temperature=0.0, cap=8, n_strag=16,
                      pos=None)
    gs = md2.init(pos, seed=0)
    assert bool(jax.device_get(gs.overflow))
