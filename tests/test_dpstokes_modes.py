"""DPStokes wall modes (slit / bottom / open) and torque coupling
(reference: DPStokesSlab.cuh:141 WallMode + StokesSlab/Correction.cuh;
test/BDHI/DPStokes).

Validation notes (why the comparisons look the way they do):

- Chebyshev-Lobatto nodes cluster at the walls; the mid-slab spacing is
  ~ pi H / (2 nz), which must resolve the Gaussian kernel width
  sigma = a/sqrt(pi) ~ 0.56 a — hence small H and nz >= 64 here.
- The k = 0 (xy-mean) mode carries the periodic-array backflow, which is
  *mode-dependent physics* (walls absorb momentum; the open solver zeroes
  k = 0 like the triply periodic convention). Quantitative wall tests
  therefore either test the k = 0 profile itself or subtract its analytic
  linear-in-height contribution before comparing to single-wall (Lorentz)
  theory.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.integrators.bdhi.dpstokes import DPStokes
from uammd_tpu.solvers.chebyshev import lobatto_points


ETA, A = 1.0, 1.0
M0 = 1.0 / (6.0 * math.pi * ETA * A)
L, H, NZ = 24.0, 16.0, 120  # mid-slab node spacing ~0.21 < sigma_tau


@pytest.fixture(scope="module")
def solvers():
    return {
        mode: DPStokes.create(
            box([L, L, H]), viscosity=ETA, radius=A, nz=NZ, mode=mode,
            points_per_radius=1.6,
        )
        for mode in ("slit", "bottom", "open")
    }


def mob_parallel(dps, z):
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    p = jnp.asarray([[0.0, 0.0, z]], jnp.float64)
    return float(dps.compute_mf(p, f)[0, 0])


def test_k0_backflow_profile_bottom(solvers):
    """xy-mean flow from a point force at height h over the bottom wall,
    open top: u(z) = (f/(eta A)) * (min(z, h) + H/2) — exact solution of
    the k = 0 operator. Tests the open-top Robin k=0 rows directly."""
    dps = solvers["bottom"]
    h = -H / 2 + 5.0
    p = jnp.asarray([[0.0, 0.0, h]], jnp.float64)
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    u = dps.solve_grid(dps.spread(p, f))
    ux_mean = np.asarray(u[..., 0]).mean(axis=(0, 1))
    z = lobatto_points(dps.nz, H / 2)
    area = L * L
    want = (np.minimum(z, h) + H / 2) / (ETA * area)
    # away from the Gaussian smearing zone around z = h
    m = np.abs(z - h) > 1.5
    np.testing.assert_allclose(ux_mean[m], want[m], rtol=2e-3,
                               atol=1e-6 / area)


def test_bottom_wall_lorentz_hindrance(solvers):
    """Parallel mobility near a single wall follows Lorentz
    1 - (9/16)(a/h) after subtracting the k = 0 backflow (linear in h)."""
    dps = solvers["bottom"]
    area = L * L

    def mob_nok0(h):
        m = mob_parallel(dps, -H / 2 + h)
        return m - h / (ETA * area)  # k0 term: u(h) = (h + 0)/..; wall at 0

    def lorentz(h):
        # parallel wall correction through (a/h)^3 (Lorentz / Faxen)
        return 1.0 - (9.0 / 16.0) * (A / h) + 0.125 * (A / h) ** 3

    m6 = mob_nok0(6.0)
    for h in (3.0, 4.5):
        ratio = mob_nok0(h) / m6
        want = lorentz(h) / lorentz(6.0)
        # residual ~3% at h=3: the lateral image lattice (spacing L = 24 a)
        # of particle+wall-image differs from the isolated pair by
        # O((2h/L)^3) — systematic physics of the periodic system, not a
        # solver error (scales away with L)
        assert abs(ratio - want) < 0.05, (h, ratio, want)
    # monotone hindrance toward the wall
    assert mob_nok0(2.0) < mob_nok0(4.0) < mob_nok0(7.0)


def test_open_mode_translation_invariance(solvers):
    """Open-open: no walls, so mobility is independent of z."""
    dps = solvers["open"]
    ms = [mob_parallel(dps, z) for z in (-4.0, 0.0, 4.0)]
    assert max(ms) - min(ms) < 5e-3 * M0, ms
    # and within the xy-periodic image correction of bulk Stokes
    assert abs(ms[1] - M0) / M0 < 0.2, (ms[1], M0)


def test_slit_walls_hinder_more_than_single_wall(solvers):
    """At the slab center, two walls hinder more than one, which hinders
    more than none (k = 0 removed from all three for comparability)."""
    area = L * L

    def nok0(mode, z):
        m = mob_parallel(solvers[mode], z)
        if mode == "bottom":
            return m - (z + H / 2) / (ETA * area)
        if mode == "slit":
            # k0 slit profile: u = (f/(eta A)) * parabola-free piecewise
            # linear with u(+-H/2) = 0: at the source height h = z = 0:
            # u(0) = H/4 / (eta A) * ... simpler: subtract measured k0
            # directly via the solver's own mean profile
            p = jnp.asarray([[0.0, 0.0, z]], jnp.float64)
            f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
            u = solvers[mode].solve_grid(solvers[mode].spread(p, f))
            ux_mean = np.asarray(u[..., 0]).mean(axis=(0, 1))
            zs = lobatto_points(solvers[mode].nz, H / 2)
            k0_at_h = np.interp(z, zs[::-1], ux_mean[::-1])
            return m - k0_at_h
        return m
    m_slit = nok0("slit", 0.0)
    m_bot = nok0("bottom", 0.0)
    m_open = nok0("open", 0.0)
    assert m_slit < m_bot < m_open, (m_slit, m_bot, m_open)


def test_rotational_self_mobility_open(solvers):
    """M_rr(self) = 1/(8 pi eta a^3) in the bulk (rotlet-width kernel;
    k = 0 does not contribute to the rotlet)."""
    dps = solvers["open"]
    p = jnp.zeros((1, 3), jnp.float64)
    T = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    F = jnp.zeros((1, 3), jnp.float64)
    v, w = dps.compute_mf(p, F, T)
    expected = 1.0 / (8.0 * math.pi * ETA * A**3)
    assert abs(float(w[0, 2]) - expected) / expected < 0.05, (
        float(w[0, 2]), expected
    )


def test_grand_mobility_symmetry(solvers):
    """<T_1, omega_1(F_2)> == <F_2, v_2(T_1)> (adjoint spreading; complex64
    operator inverses bound the match at f32 level)."""
    dps = solvers["slit"]
    pos = jnp.asarray([[0.0, 0.0, -2.0], [2.5, 1.0, 1.0]], jnp.float64)
    F = jnp.asarray([[0, 0, 0], [0.7, -0.2, 0.4]], jnp.float64)
    T = jnp.asarray([[0.3, 1.0, -0.5], [0, 0, 0]], jnp.float64)
    zero = jnp.zeros_like(F)
    _, w_from_F = dps.compute_mf(pos, F, zero)
    v_from_T = dps.compute_mf(pos, zero, T)[0]
    lhs = float(jnp.sum(T[0] * w_from_F[0]))
    rhs = float(jnp.sum(F[1] * v_from_T[1]))
    assert abs(lhs) > 0
    assert abs(lhs - rhs) < 2e-4 * abs(lhs), (lhs, rhs)


def test_wall_spin_translation_coupling(solvers):
    """A sphere spinning about y next to the bottom wall translates along x
    (rotlet image flow); the coupling dies off far from the wall."""
    dps = solvers["bottom"]
    T = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float64)
    F = jnp.zeros((1, 3), jnp.float64)
    h = 1.5
    near = jnp.asarray([[0.0, 0.0, -H / 2 + h]], jnp.float64)
    far = jnp.asarray([[0.0, 0.0, H / 2 - 5.0]], jnp.float64)
    v_near = float(dps.compute_mf(near, F, T)[0][0, 0])
    v_far = float(dps.compute_mf(far, F, T)[0][0, 0])
    # leading-order single-wall coupling: U = (3/32)(a/h)^4 T/(8 pi eta a^2)
    want = (3.0 / 32.0) * (A / h) ** 4 / (8.0 * math.pi * ETA * A**2)
    assert 0.5 * want < abs(v_near) < 2.0 * want, (v_near, want)
    # far from the wall only the (much weaker) lateral periodic-image
    # coupling remains
    assert abs(v_near) > 2 * abs(v_far), (v_near, v_far)
