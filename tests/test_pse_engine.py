"""Grid-resident PSE (pse_engine) vs the reference-path PSE (pse.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list
from uammd_tpu.integrators.bdhi.pse import PSE
from uammd_tpu.engine.pair_kernel import broadcast_strag_channels
from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(0)
    n, L = 300, 32.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return b, pos, F


def test_near_matvec_matches_reference_path(system):
    """The Pallas channel kernel + polynomial radial functions reproduce the
    neighbour-list + table near field to ~1e-5 (poly fit error ~1e-6)."""
    b, pos, F = system
    ref = PSE.create(b, viscosity=1.0, radius=1.0, tolerance=1e-4)
    fast = PSEGrid.create(b, pos.shape[0], viscosity=1.0, radius=1.0,
                          tolerance=1e-4)
    assert fast.fit_error < 1e-5
    nl = build_neighbor_list(pos, b, ref.rcut)
    v_ref = np.asarray(ref.near_matvec(pos, F, nl))
    v_fast = np.asarray(fast.near_matvec(pos, F))
    err = np.abs(v_fast - v_ref).max() / np.abs(v_ref).max()
    assert err < 2e-5, err


def test_compute_mf_cross_backend(system):
    """Full split mobility agrees with the reference-path PSE (different far
    grids/supports -> per-mille level agreement)."""
    b, pos, F = system
    ref = PSE.create(b, viscosity=1.0, radius=1.0, tolerance=1e-4)
    fast = PSEGrid.create(b, pos.shape[0], viscosity=1.0, radius=1.0,
                          tolerance=1e-4)
    mf_ref = np.asarray(ref.compute_mf(pos, F))
    mf_fast = np.asarray(fast.compute_mf(pos, F))
    err = np.abs(mf_fast - mf_ref).max() / np.abs(mf_ref).max()
    assert err < 1e-2, err


def test_split_invariance_grid(system):
    """M F must be (nearly) independent of the splitting parameter xi —
    the PSE defining property (reference: test/BDHI/PSE). RMS metric: the
    per-pair split error is ~1e-3 (dominated by far-field Gaussian
    truncation, present in the reference path at the same level — see
    docs/PERF.md accuracy notes); with N=300 contributions per row the
    max-entry metric accumulates coherently while the RMS stays ~1e-3."""
    b, pos, F = system
    a = PSEGrid.create(b, pos.shape[0], radius=1.0, xi=0.5, tolerance=1e-4)
    c = PSEGrid.create(b, pos.shape[0], radius=1.0, xi=0.35, tolerance=1e-4)
    va = np.asarray(a.compute_mf(pos, F))
    vc = np.asarray(c.compute_mf(pos, F))
    err = np.sqrt(((va - vc) ** 2).mean() / (va ** 2).mean())
    assert err < 1e-2, err


def test_displacement_fused_consistent(system):
    """The fused EM displacement equals dt*(MF) at T=0 and stays finite with
    noise on."""
    b, pos, F = system
    fast = PSEGrid.create(b, pos.shape[0], radius=1.0, tolerance=1e-4)
    d0, ovf = fast.displacement(pos, F, jax.random.key(0), 0.01, 0.0)
    mf = fast.compute_mf(pos, F)
    np.testing.assert_allclose(
        np.asarray(d0), 0.01 * np.asarray(mf), rtol=2e-4, atol=1e-9
    )
    assert not bool(ovf)
    d1, _ = fast.displacement(pos, F, jax.random.key(1), 0.01, 1.0)
    assert bool(jnp.all(jnp.isfinite(d1)))
    # noise actually present and O(sqrt(2 T dt) * sqrt(m0))
    rms = float(jnp.sqrt(jnp.mean((d1 - d0) ** 2)))
    assert 1e-3 < rms < 1.0, rms


def test_near_noise_sqrt_identity():
    """Slot-space Lanczos sqrt: ||sqrt(M_near) z||^2 == z^T M_near z (the
    defining identity, checked deterministically per noise draw — the
    statistical fluctuation-dissipation version lives in test_pse.py for the
    reference path)."""
    from uammd_tpu.engine.layout import pack_channels

    rng = np.random.default_rng(3)
    n, L = 64, 20.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    fast = PSEGrid.create(b, n, radius=1.0, tolerance=1e-3,
                          lanczos_iterations=24)
    cg = pack_channels(fast.spec, pos, jnp.zeros((n, 3), jnp.float32))
    for seed in (0, 1, 2):
        key = jax.random.key(seed)
        bx, by, bz, _, res = fast._near_noise_slots(cg, key)
        lhs = float(jnp.sum(bx * bx + by * by + bz * bz))
        # reconstruct the exact z drawn inside _near_noise_slots
        mask = (cg.pid >= 0).astype(jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)
        z = [jax.random.normal(k, cg.x.shape, jnp.float32) * mask
             for k in (k1, k2, k3)]
        mz = fast.near_matvec_slots(cg, *z)
        rhs = float(sum(jnp.sum(a * c) for a, c in zip(z, mz)))
        assert rhs > 0
        np.testing.assert_allclose(lhs, rhs, rtol=5e-3)


def test_straggler_split_matvec_exact():
    """The straggler occupancy split (spec.n_strag > 0: smaller CAP + a
    dense [S] side list through the channel kernel's broadcast block) is an
    exact reorganisation: M_near F matches the no-straggler grid to float32
    roundoff, including the straggler rows (reference parity: the CUDA cell
    list has no occupancy cap at all — NeighbourList/CellList.cuh)."""
    rng = np.random.default_rng(7)
    n, L = 600, 26.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    ref = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4, pos=pos)
    small_cap = max(8, ref.spec.cap - 16)
    fast = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4,
                          pos=pos, cap=small_cap, n_strag=64)

    from uammd_tpu.engine.layout import pack_channels
    cg = pack_channels(fast.spec, pos, F)
    assert int(jnp.sum(cg.spid >= 0)) > 0, "config must overflow small CAP"
    assert not bool(cg.overflow)

    v_ref = np.asarray(ref.near_matvec(pos, F))
    v_fast = np.asarray(fast.near_matvec(pos, F))
    err = np.abs(v_fast - v_ref).max() / np.abs(v_ref).max()
    assert err < 1e-5, err


def test_straggler_noise_sqrt_identity():
    """Lanczos sqrt identity on the EXTENDED (grid + straggler rows)
    operator: ||sqrt(M) z||^2 == z^T M z with stragglers in flight."""
    from uammd_tpu.engine.layout import pack_channels

    rng = np.random.default_rng(11)
    n, L = 200, 18.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    fast = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-3,
                          lanczos_iterations=24, pos=pos, cap=8, n_strag=64)
    cg = pack_channels(fast.spec, pos, jnp.zeros((n, 3), jnp.float32))
    assert int(jnp.sum(cg.spid >= 0)) > 0
    key = jax.random.key(5)
    bx, by, bz, s3, res = fast._near_noise_slots(cg, key)
    lhs = float(jnp.sum(bx * bx + by * by + bz * bz) + jnp.sum(s3 * s3))
    # reconstruct the exact start vector drawn inside _near_noise_slots
    mask = (cg.pid >= 0).astype(jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    z = [jax.random.normal(k, cg.x.shape, jnp.float32) * mask
         for k in (k1, k2, k3)]
    smask = (cg.spid >= 0).astype(jnp.float32)
    zs = jax.random.normal(
        jax.random.fold_in(key, 7), (3, fast.spec.n_strag), jnp.float32
    ) * smask
    vx, vy, vz, sv3 = fast.near_matvec_slots(
        cg, *z, sf3=(zs[0], zs[1], zs[2])
    )
    rhs = float(
        sum(jnp.sum(a * c) for a, c in zip(z, (vx, vy, vz)))
        + sum(jnp.sum(a * c) for a, c in zip(zs, sv3))
    )
    assert rhs > 0
    np.testing.assert_allclose(lhs, rhs, rtol=5e-3)


def test_straggler_displacement_consistent():
    """Fused EM displacement with stragglers: T=0 equals dt*MF of the
    no-straggler backend; with noise the step stays finite."""
    rng = np.random.default_rng(13)
    n, L = 600, 26.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ref = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4, pos=pos)
    fast = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4,
                          pos=pos, cap=max(8, ref.spec.cap - 16), n_strag=64)
    d_ref, _ = ref.displacement(pos, F, jax.random.key(0), 0.01, 0.0)
    d_fast, ovf = fast.displacement(pos, F, jax.random.key(0), 0.01, 0.0)
    assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(d_fast), np.asarray(d_ref), rtol=2e-4, atol=1e-8
    )
    d1, _ = fast.displacement(pos, F, jax.random.key(1), 0.01, 1.0)
    assert bool(jnp.all(jnp.isfinite(d1)))


def _brute_wca(pos, L, sigma=2.0, eps=1.0, clamp_lo=4e-3):
    """O(N^2) minimum-image truncated-LJ (WCA) forces, f64 numpy."""
    p = np.asarray(pos, np.float64)
    rc2 = (2.0 ** (1.0 / 6.0) * sigma) ** 2
    d = p[None, :, :] - p[:, None, :]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, np.inf)
    t = np.where((r2 < rc2) & (r2 > clamp_lo), 1.0 / r2, 0.0)
    s6 = sigma**6
    g = t**4 * ((-48.0 * eps * s6 * s6) * t**3 + 24.0 * eps * s6)
    return (g[:, :, None] * d).sum(axis=1)


@pytest.mark.parametrize("n_strag", [0, 256])
def test_slot_pair_force_matches_brute(n_strag):
    """make_pair_force_slots evaluates a short-range WCA pair force on the
    near-field grid pack; unpacked [N]-order forces match the O(N^2)
    minimum-image reference (the reference pairs PairForces with BDHI
    integrators the same way, e.g. examples/generic_md advanced configs)."""
    from uammd_tpu.engine.layout import pack_channels
    from uammd_tpu.engine.md import lj_g_fused

    rng = np.random.default_rng(21)
    n, L = 500, 26.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    kw = {}
    if n_strag:
        ref = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4,
                             pos=pos)
        kw = dict(cap=max(8, ref.spec.cap - 16), n_strag=n_strag)
    be = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4,
                        pos=pos, **kw)
    sigma = 2.0
    rc = 2.0 ** (1.0 / 6.0) * sigma
    assert rc <= be.rcut  # grid stencil covers the pair cutoff
    g_fn = lj_g_fused(1.0, sigma, rc2=rc * rc, approx=False)
    force_slots = be.make_pair_force_slots(g_fn)
    cg = pack_channels(be.spec, pos, jnp.zeros((n, 3), jnp.float32))
    assert not bool(cg.overflow)
    if n_strag:
        assert int(jnp.sum(cg.spid >= 0)) > 0, "want stragglers in flight"
    from uammd_tpu.engine.layout import unpack_values
    (fx, fy, fz), sf3 = force_slots(cg)
    f = np.asarray(unpack_values(cg, (fx, fy, fz), svalues=sf3))
    f_ref = _brute_wca(pos, L)
    scale = np.abs(f_ref).max() + 1.0
    np.testing.assert_allclose(f / scale, f_ref / scale, atol=2e-5)


def test_displacement_with_pair_force_consistent():
    """Fused EM step with the in-grid pair force: T=0 displacement equals
    dt * M F_wca computed through the independent [N]-order path, and the
    returned forces match the brute-force WCA evaluation."""
    from uammd_tpu.engine.md import lj_g_fused

    rng = np.random.default_rng(23)
    n, L = 500, 26.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    ref = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4, pos=pos)
    be = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-4,
                        pos=pos, cap=max(8, ref.spec.cap - 16), n_strag=256)
    sigma = 2.0
    rc = 2.0 ** (1.0 / 6.0) * sigma
    g_fn = lj_g_fused(1.0, sigma, rc2=rc * rc, approx=False)
    force_slots = be.make_pair_force_slots(g_fn)
    dx, forces, ovf = be.displacement_with_pair_force(
        force_slots, pos, jax.random.key(0), 0.01, 0.0
    )
    assert not bool(ovf)
    f_ref = _brute_wca(pos, L)
    scale = np.abs(f_ref).max() + 1.0
    np.testing.assert_allclose(
        np.asarray(forces) / scale, f_ref / scale, atol=2e-5
    )
    mf = be.compute_mf(pos, jnp.asarray(f_ref, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(dx), 0.01 * np.asarray(mf), rtol=2e-3, atol=1e-6
    )
    # noisy step stays finite
    dx1, _, ovf1 = be.displacement_with_pair_force(
        force_slots, pos, jax.random.key(1), 0.01, 1.0
    )
    assert bool(jnp.all(jnp.isfinite(dx1))) and not bool(ovf1)


def test_tuned_lanczos_iteration_count():
    """tuned_lanczos picks the smallest static iteration count meeting the
    successive-approximation tolerance (reference: LanczosAlgorithm.cuh:
    40-56); tighter tolerance never picks fewer iterations, and the tuned
    count still satisfies the Lanczos sqrt identity to the same order."""
    from uammd_tpu.engine.layout import pack_channels

    rng = np.random.default_rng(31)
    n, L = 200, 18.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    be = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-3,
                        lanczos_iterations=24, pos=pos)
    loose = be.tuned_lanczos(pos, tol=3e-2)
    tight = be.tuned_lanczos(pos, tol=1e-4)
    assert 3 <= loose.lanczos_iterations <= tight.lanczos_iterations <= 16
    # the tuned (loose) backend's noise is a usable sqrt: identity to ~5%
    cg = pack_channels(loose.spec, pos, jnp.zeros((n, 3), jnp.float32))
    key = jax.random.key(3)
    bx, by, bz, _s3, _res = loose._near_noise_slots(cg, key)
    lhs = float(jnp.sum(bx * bx + by * by + bz * bz))
    mask = (cg.pid >= 0).astype(jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    z = [jax.random.normal(k, cg.x.shape, jnp.float32) * mask
         for k in (k1, k2, k3)]
    vx, vy, vz = loose.near_matvec_slots(cg, *z)
    rhs = float(sum(jnp.sum(a * c) for a, c in zip(z, (vx, vy, vz))))
    np.testing.assert_allclose(lhs, rhs, rtol=7e-2)


def test_persistent_em_state_matches_fresh():
    """The slot-resident EM step (persistent near pid layout + far pencil
    bins, gather-refresh between drift rebins) produces the same
    deterministic displacement as the per-step-binned path while particles
    drift far enough to cross cells and trip both rebin criteria."""
    from uammd_tpu.engine.md import lj_g_fused

    rng = np.random.default_rng(5)
    n, L = 4096, 64.0
    b = box(L)
    # lattice start: random insertion would put particles deep inside the
    # WCA core (forces ~1e8) and drown the comparison in f32 sum-order noise
    from uammd_tpu.utils.lattices import lattice

    pos = jnp.asarray(lattice(n, L, "fcc"), jnp.float32)
    be = PSEGrid.create(b, n, viscosity=1.0, radius=1.0, far_grid=24,
                        tolerance=1e-3, lanczos_iterations=4, pos=pos,
                        n_strag=64)
    sigma = 2.0
    rc = 2.0 ** (1.0 / 6.0) * sigma
    force_slots = be.make_pair_force_slots(
        lj_g_fused(1.0, sigma, rc2=rc * rc, approx=False)
    )
    st = be.em_state(pos)
    key = jax.random.key(0)
    drift = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    p = pos
    crossed = False
    for step in range(6):
        dx_p, f_p, st = be.displacement_with_pair_force_persistent(
            force_slots, p, key, 0.01, 0.0, st
        )
        dx_f, f_f, ovf = be.displacement_with_pair_force(
            force_slots, p, key, 0.01, 0.0
        )
        scale = float(jnp.max(jnp.abs(dx_f))) + 1e-12
        # f32 tolerance: the two paths bin (and therefore sum) in different
        # orders, and the far solve amplifies low-k rounding noise by 1/k^2
        # — exactness of stale-bin spreading is proven in f64 at the pencil
        # level (test_pencil_ibm.test_pencil_slack_staleness_exact)
        np.testing.assert_allclose(
            np.asarray(dx_p), np.asarray(dx_f), atol=5e-3 * scale + 1e-7
        )
        np.testing.assert_allclose(
            np.asarray(f_p), np.asarray(f_f), atol=1e-4, rtol=1e-4
        )
        # march particles with a fixed random flow large enough to force
        # cell crossings (and therefore both rebins) within a few steps
        p = b.wrap_position(p + 0.2 * drift)
        crossed = crossed or float(jnp.max(jnp.abs(0.2 * drift))) > 0
    assert not bool(jax.device_get(st.overflow))


def test_persistent_em_rebins_on_drift():
    """Drift past the near threshold must flip the persistent state's pid
    layout (the rebin actually fires rather than silently keeping stale
    bins)."""
    rng = np.random.default_rng(6)
    n, L = 4096, 64.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    be = PSEGrid.create(b, n, viscosity=1.0, radius=1.0, far_grid=24,
                        tolerance=1e-3, lanczos_iterations=2, pos=pos)
    st0 = be.em_state(pos)
    # move everything by more than a cell: both criteria must trip
    p2 = b.wrap_position(pos + jnp.asarray([5.0, 5.0, 5.0], jnp.float32))
    _cg, _bins, st1 = be._refresh(st0, p2)
    assert not np.array_equal(np.asarray(st1.ref), np.asarray(st0.ref))
    assert not np.array_equal(np.asarray(st1.far_ref),
                              np.asarray(st0.far_ref))
    # no movement: state untouched
    _cg, _bins, st2 = be._refresh(st0, pos)
    assert np.array_equal(np.asarray(st2.pid), np.asarray(st0.pid))


@pytest.mark.slow
def test_tolerance_driven_far_support(system):
    """support=None derives the far Gaussian support from tolerance (the
    reference's tolerance-driven spreading support); tighter tolerance ->
    wider support -> tighter split invariance."""
    b, pos, F = system
    loose = PSEGrid.create(b, pos.shape[0], radius=1.0, xi=0.5,
                           tolerance=1e-3, support=None)
    tight = PSEGrid.create(b, pos.shape[0], radius=1.0, xi=0.5,
                           tolerance=1e-6, support=None)
    assert tight.far.support > loose.far.support, (
        loose.far.support, tight.far.support,
    )
    # split invariance (the PSE defining property) must improve with the
    # tolerance-driven support: compare xi=0.5 vs xi=0.35 at both settings
    def split_err(tol):
        a = PSEGrid.create(b, pos.shape[0], radius=1.0, xi=0.5,
                           tolerance=tol, support=None)
        c = PSEGrid.create(b, pos.shape[0], radius=1.0, xi=0.35,
                           tolerance=tol, support=None)
        va = np.asarray(a.compute_mf(pos, F))
        vc = np.asarray(c.compute_mf(pos, F))
        return np.sqrt(((va - vc) ** 2).mean() / (va ** 2).mean())

    e_loose = split_err(1e-3)
    e_tight = split_err(1e-6)
    assert e_tight < e_loose
    assert e_tight < 2e-3, (e_loose, e_tight)


def test_persistent_overflow_attribution():
    """The persistent step state latches overflow PER STRUCTURE so a
    tripped bench run names the culprit knob (near pack: straggler rows S
    / CAP; far: pencil cap) instead of one combined flag — the round-3
    overflow note's attribution fix (docs/PERF.md)."""
    rng = np.random.default_rng(7)
    n, L = 4096, 64.0
    b = box(L)
    uniform = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)

    # (a) near-only: CAP + S sized for a uniform liquid, then bin a thin
    # z-slab — the xy distribution stays uniform (far pencils under their
    # capacity) but the slab's 3D cells hold ~3x CAP, exhausting the
    # straggler rows.
    be = PSEGrid.create(b, n, radius=1.0, far_grid=24, tolerance=1e-3,
                        lanczos_iterations=2, pos=uniform, n_strag=16)
    slab = uniform.at[:, 2].set(
        jnp.asarray(rng.random(n) * 2.0 - 1.0, jnp.float32))
    st = be.em_state(slab)
    assert bool(jax.device_get(st.ovf_near))
    assert not bool(jax.device_get(st.ovf_far))
    assert bool(jax.device_get(st.overflow))  # combined latch (old contract)

    # (b) far-only: near CAP is sized for the clustered start (n_strag=0
    # -> CAP covers the max cell exactly) but every particle shares one
    # 8x8 xy patch, overflowing that pencil's capacity (which is sized
    # for a uniform xy spread).
    column = jnp.stack([
        jnp.asarray(rng.random(n) * 2.0 - 1.0, jnp.float32),
        jnp.asarray(rng.random(n) * 2.0 - 1.0, jnp.float32),
        jnp.asarray((rng.random(n) - 0.5) * L, jnp.float32),
    ], axis=-1)
    be2 = PSEGrid.create(b, n, radius=1.0, far_grid=24, tolerance=1e-3,
                         lanczos_iterations=2, pos=column, n_strag=0)
    st2 = be2.em_state(column)
    assert bool(jax.device_get(st2.ovf_far))
    assert not bool(jax.device_get(st2.ovf_near))
    assert bool(jax.device_get(st2.overflow))


@pytest.mark.parametrize("n_strag", [0, 64])
def test_fused_mf_and_noise_matches_separate(n_strag):
    """The fused near-field pass (_near_mf_and_noise: M F batched with the
    first Lanczos noise matvec through ONE 6-channel kernel, plus the
    peeled-w0 Lanczos) must reproduce the separate near_matvec_slots +
    _near_noise_slots results (identical RNG keys and operator)."""
    from uammd_tpu.engine.layout import pack_channels

    rng = np.random.default_rng(5)
    n, L = 200, 26.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    kw = dict(cap=8) if n_strag else {}
    be = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-3,
                        lanczos_iterations=6, pos=pos, n_strag=n_strag,
                        **kw)
    cg = pack_channels(be.spec, pos, F)
    key = jax.random.key(11)
    sf3 = cg.schannels if n_strag else None
    v3, sv3, b3, b3s, _ = be._near_mf_and_noise(cg, *cg.channels, sf3, key)
    if n_strag:
        assert int(jax.device_get((cg.spid >= 0).sum())) > 0
        rvx, rvy, rvz, rsv3 = be.near_matvec_slots(
            cg, *cg.channels, sf3=sf3)
    else:
        rvx, rvy, rvz = be.near_matvec_slots(cg, *cg.channels)
    rbx, rby, rbz, rb3s, _ = be._near_noise_slots(cg, key)
    scale = float(jnp.max(jnp.abs(rvx)))
    for got, ref in zip(v3 + b3, (rvx, rvy, rvz, rbx, rby, rbz)):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(got)), np.asarray(jax.device_get(ref)),
            rtol=2e-5, atol=2e-5 * scale)
    if n_strag:
        for got, ref in zip(tuple(sv3) + tuple(b3s),
                            tuple(rsv3) + tuple(rb3s)):
            np.testing.assert_allclose(
                np.asarray(jax.device_get(got)),
                np.asarray(jax.device_get(ref)),
                rtol=2e-5, atol=2e-5 * scale)


def test_vmem_fallback_unfused_path():
    """When the fused 6-channel pass is ruled out (VMEM probe failure on
    hardware; forced here via the cache), _near_mf_and_noise must route
    through the unfused near_matvec + noise passes and reproduce them
    bitwise (same RNG stream)."""
    from uammd_tpu.engine.layout import pack_channels

    rng = np.random.default_rng(7)
    n, L = 160, 24.0
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    be = PSEGrid.create(b, n, radius=1.0, xi=0.4, tolerance=1e-3,
                        lanczos_iterations=4, pos=pos, n_strag=32, cap=8)
    assert be._fused_near_ok() is True  # CPU: no VMEM constraint
    object.__setattr__(be, "_fused_near_ok_cache", False)
    cg = pack_channels(be.spec, pos, F)
    key = jax.random.key(3)
    sf3 = cg.schannels
    v3, sv3, b3, b3s, _ = be._near_mf_and_noise(cg, *cg.channels, sf3, key)
    rvx, rvy, rvz, rsv3 = be.near_matvec_slots(cg, *cg.channels, sf3=sf3)
    rbx, rby, rbz, rb3s, _ = be._near_noise_slots(cg, key)
    for got, ref in zip(v3 + b3 + tuple(sv3) + tuple(b3s),
                        (rvx, rvy, rvz, rbx, rby, rbz) + tuple(rsv3)
                        + tuple(rb3s)):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(got)), np.asarray(jax.device_get(ref)))


@pytest.mark.parametrize("nvec", [1, 2])
def test_newton_channel_kernel_matches_27stencil(nvec):
    """The Newton-halved channel kernel (kernel2.make_newton_channel_kernel,
    the TPU production matvec path) must reproduce the 27-stencil kernel's
    near matvec on the same pack — straggler rows included — to float
    round-off (each pair is summed in a different order)."""
    import math

    from uammd_tpu.core.box import box as mkbox
    from uammd_tpu.engine.layout import pack_channels
    from uammd_tpu.utils.lattices import lattice

    n = 512
    phi, radius = 0.08, 1.0
    L = (n * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    rng = np.random.default_rng(3)
    base = np.asarray(lattice(n - 20, L, "fcc"))
    # a 20-row clump in one region forces straggler rows
    clump = rng.uniform(-2.0, 2.0, (20, 3)) + 3.0
    pos = jnp.asarray(np.concatenate([base, clump]), jnp.float32)
    be = PSEGrid.create(
        mkbox(L), n, viscosity=1.0, radius=radius, far_grid=32,
        tolerance=1e-3, lanczos_iterations=3, pos=pos, n_strag=48,
    )
    cg = pack_channels(
        be.spec, pos,
        jnp.asarray(rng.normal(size=(n, 3 * nvec)), jnp.float32),
    )
    assert int(np.asarray((cg.spid >= 0).sum())) > 0, "want stragglers"
    chans = [cg.channels[c] for c in range(3 * nvec)]
    schans = [cg.schannels[c] for c in range(3 * nvec)]
    blk = broadcast_strag_channels(be.spec, cg.spos, tuple(schans), cg.spid)

    k27 = be._kernel(nvec, newton=False)
    knt = be._kernel(nvec, newton=True)
    o27 = k27(cg.x, cg.y, cg.z, *chans, strag=blk)
    ont = knt(cg.x, cg.y, cg.z, *chans, strag=blk)
    scale = float(jnp.max(jnp.abs(jnp.stack(o27[: 3 * nvec]))))
    for c in range(3 * nvec):
        np.testing.assert_allclose(
            np.asarray(ont[c]), np.asarray(o27[c]),
            atol=2e-5 * scale, rtol=0,
        )
    # straggler partials: compare the reduced totals
    for c in range(3 * nvec):
        a = np.asarray(jnp.sum(o27[3 * nvec + c], axis=(0, 1, 3)))
        bvec = np.asarray(jnp.sum(ont[3 * nvec + c], axis=(0, 1, 3)))
        np.testing.assert_allclose(bvec, a, atol=2e-5 * scale, rtol=0)


def test_noise_radial_within_lanczos_tolerance():
    """The shorter noise Horner (create(noise_deg=10)) must keep
    sqrt(M_near) z within the Lanczos residual tolerance class of the
    full-degree operator (the accuracy budget that licenses it —
    reference: LanczosAlgorithm.cuh:40-56 residual loop)."""
    import math

    from uammd_tpu.core.box import box as mkbox
    from uammd_tpu.engine.layout import pack_channels
    from uammd_tpu.utils.lattices import lattice

    n = 512
    phi = 0.08
    L = (n * (4.0 / 3.0) * math.pi / phi) ** (1.0 / 3.0)
    pos = jnp.asarray(lattice(n, L, "fcc"), jnp.float32)
    kw = dict(viscosity=1.0, radius=1.0, far_grid=32, tolerance=1e-3,
              lanczos_iterations=8, pos=pos)
    be10 = PSEGrid.create(mkbox(L), n, noise_deg=10, **kw)
    be12 = PSEGrid.create(mkbox(L), n, noise_deg=12, **kw)
    assert be10.fit_error_noise < 1e-3, be10.fit_error_noise
    cg = pack_channels(be10.spec, pos, jnp.zeros((n, 0), jnp.float32))
    key = jax.random.key(5)
    b10 = jnp.stack(be10._near_noise_slots(cg, key)[0:3])
    b12 = jnp.stack(be12._near_noise_slots(cg, key)[0:3])
    rel = float(jnp.linalg.norm(b10 - b12) / jnp.linalg.norm(b12))
    assert rel < 1e-3, rel
