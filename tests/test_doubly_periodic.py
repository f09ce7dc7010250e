"""Doubly periodic solvers: Chebyshev/BVP engines, DPStokes, DPPoissonSlab.

Reference analogs: test/misc/chebyshev, test/misc/bvp, test/BDHI/DPStokes,
and the slab electrostatics checks of test/Potentials/Poisson (DP mode).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.electrostatics.dpslab import DPPoissonSlab
from uammd_tpu.integrators.bdhi.dpstokes import DPStokes
from uammd_tpu.solvers.bvp import solve_single
from uammd_tpu.solvers.chebyshev import (
    cheb_derivative_matrix,
    clenshaw_curtis_weights,
    fct,
    ifct,
    lobatto_points,
)


def test_chebyshev_roundtrip_and_derivative():
    n, H = 49, 4.0
    z = lobatto_points(n, H / 2)
    f = np.exp(np.sin(2 * z))
    c = fct(jnp.asarray(f))
    f2 = ifct(c)
    np.testing.assert_allclose(np.asarray(f2), f, rtol=1e-12)
    D = cheb_derivative_matrix(n, H / 2)
    dfdz = D @ f
    want = 2 * np.cos(2 * z) * f
    np.testing.assert_allclose(dfdz, want, atol=1e-8)


def test_clenshaw_curtis_quadrature():
    n, H = 33, 3.0
    z = lobatto_points(n, H / 2)
    w = clenshaw_curtis_weights(n, H / 2)
    f = np.cos(z) ** 2
    # integral of cos^2 over [-H/2, H/2] = H/2 + sin(H)/2
    exact = H / 2 + math.sin(H) / 2
    np.testing.assert_allclose(float(w @ f), exact, rtol=1e-12)


def test_bvp_analytic_solution():
    """y'' - k^2 y = f with Dirichlet BCs vs closed form (reference:
    test/misc/bvp)."""
    n, H, k = 40, 2.0, 3.0
    z = lobatto_points(n, H / 2)
    # choose y = sin(pi z): f = -(pi^2 + k^2) sin(pi z), y(+-1)=0 for H=2
    f = -(math.pi**2 + k * k) * np.sin(math.pi * z)
    y = solve_single(k * k, n, H / 2, f)
    np.testing.assert_allclose(np.asarray(y), np.sin(math.pi * z), atol=1e-9)


def test_bvp_robin_bc():
    """y'' = 0 with Robin conditions: y = a + b z recovered exactly."""
    n, H = 24, 2.0
    z = lobatto_points(n, H / 2)
    # BCs: y'(top) + y(top) = 3 ; y(-1) = 1 -> y = 1 + z satisfies
    # y' + y at top = 1 + (1+1) = ... choose y = 1 + z: y'=1; top: 1+2=3 OK
    y = solve_single(
        0.0, n, H / 2, np.zeros(n),
        alpha_top=1.0, beta_top=1.0, alpha_bot=1.0, beta_bot=0.0,
    )
    # solve with rhs boundary values g_top=3, g_bot... use BatchedBVP directly
    from uammd_tpu.solvers.bvp import make_batched_bvp

    bvp = make_batched_bvp(
        np.array([0.0]), n, H / 2,
        alpha_top=1.0, beta_top=1.0, alpha_bot=1.0, beta_bot=0.0,
    )
    y = bvp.solve(jnp.zeros((1, n)), g_top=jnp.asarray([3.0]),
                  g_bot=jnp.asarray([0.0]))[0]
    np.testing.assert_allclose(np.asarray(y), 1.0 + z, atol=1e-10)


def test_dpstokes_poiseuille():
    """Uniform body force between no-slip walls -> parabolic profile."""
    L, H, eta = 16.0, 8.0, 1.3
    b = box([L, L, H])
    dps = DPStokes.create(b, viscosity=eta, radius=1.0, nz=32)
    f_grid = jnp.zeros((dps.shape[0], dps.shape[1], dps.nz, 3)).at[..., 0].set(1.0)
    u = dps.solve_grid(f_grid)
    z = lobatto_points(dps.nz, H / 2)
    want = (1.0 / (2 * eta)) * ((H / 2) ** 2 - z**2)
    np.testing.assert_allclose(np.asarray(u[0, 0, :, 0]), want, rtol=1e-5,
                               atol=1e-9)
    assert float(jnp.abs(u[..., 1]).max()) < 1e-10
    assert float(jnp.abs(u[..., 2]).max()) < 1e-10


def test_dpstokes_wall_hindrance_and_symmetry():
    L, H, eta = 16.0, 8.0, 1.0
    b = box([L, L, H])
    dps = DPStokes.create(b, viscosity=eta, radius=1.0, nz=32)
    f = jnp.asarray([[1.0, 0.0, 0.0]])
    m_c = float(dps.compute_mf(jnp.asarray([[0.0, 0, 0.0]]), f)[0, 0])
    m_w = float(dps.compute_mf(jnp.asarray([[0.0, 0, H / 2 - 1.2]]), f)[0, 0])
    m0 = 1 / (6 * math.pi * eta)
    assert 0 < m_w < m_c < m0
    pos2 = jnp.asarray([[0.0, 0, 0], [3.0, 0, 1.0]])
    c1 = dps.compute_mf(pos2, jnp.asarray([[0, 0, 1.0], [0, 0, 0]]))
    c2 = dps.compute_mf(pos2, jnp.asarray([[0, 0, 0], [0, 0, 1.0]]))
    np.testing.assert_allclose(float(c1[1, 2]), float(c2[0, 2]), rtol=1e-6)


def test_dpslab_poisson_matches_free_space():
    """Two charges far from the boundaries of a wide slab interact like free
    Gaussian charges: E = q1 q2 erf(r/(2 gw))/(4 pi eps r) difference between
    two separations (in-plane image effects are weak at r << L)."""
    from uammd_tpu.electrostatics.poisson import pair_potential_theory

    L, H, gw = 40.0, 20.0, 1.0
    b = box([L, L, H])
    p = DPPoissonSlab.create(b, epsilon=1.0, gw=gw)
    q = jnp.asarray([1.0, -1.0])

    def pair_e(r):
        pos = jnp.asarray([[0.0, 0, 0], [r, 0, 0]])
        from uammd_tpu.core.types import Computables

        fev = p.sum(pos, q, Computables(False, True))
        return float(fev.energy.sum())

    diff = pair_e(4.0) - pair_e(8.0)
    want = float(
        -pair_potential_theory(jnp.float64(4.0), gw)
        + pair_potential_theory(jnp.float64(8.0), gw)
    )
    np.testing.assert_allclose(diff, want, rtol=0.05)


def test_dpslab_z_force_decays_outside_range():
    """A charge near the middle feels ~no z-force (symmetry); displaced, it
    is pushed consistently with its pair partner."""
    from uammd_tpu.core.types import Computables

    L, H, gw = 24.0, 16.0, 1.0
    b = box([L, L, H])
    p = DPPoissonSlab.create(b, epsilon=1.0, gw=gw)
    pos = jnp.asarray([[0.0, 0, -2.0], [0.0, 0, 2.0]])
    q = jnp.asarray([1.0, -1.0])
    fev = p.sum(pos, q, Computables(True, True))
    # opposite charges attract: particle 0 pushed +z, particle 1 -z
    assert float(fev.force[0, 2]) > 0
    assert float(fev.force[1, 2]) < 0
    np.testing.assert_allclose(
        float(fev.force[0, 2]), -float(fev.force[1, 2]), rtol=1e-4
    )


def test_dpstokes_pencil_spread_matches_direct():
    """The xy-pencil MXU spread/interp path (engaged at N >= 4096 on
    pencil-safe grids, Chebyshev z_weights) matches the direct scatter to
    the xy-Gaussian truncation tail."""
    import numpy as np

    from uammd_tpu.integrators.bdhi.dpstokes import DPStokes

    n, L, H = 4300, 32.0, 10.0
    b = box([L, L, H])
    rng = np.random.default_rng(11)
    pos = jnp.asarray(np.column_stack([
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * 0.7 * H,
    ]), jnp.float64)
    F = jnp.asarray(rng.normal(size=(n, 3)))
    dps = DPStokes.create(b, viscosity=1.0, radius=0.8,
                          points_per_radius=2.0, nz=20, mode="slit")
    ctx = dps._pencil_ctx(pos)
    assert ctx is not None, (dps.shape, dps.support)

    f_fast = np.asarray(dps.spread(pos, F))
    f_ref = np.asarray(dps.spread(pos, F, ctx=False))
    scale = np.abs(f_ref).max()
    # bound = summed xy-Gaussian truncation tail (exp(-(s/2)^2/2 sigma_g^2)
    # per term ~ 5e-5 of peak; a few contributions add coherently)
    assert np.abs(f_fast - f_ref).max() / scale < 5e-4

    u = jnp.asarray(rng.normal(size=f_ref.shape))
    v_fast = np.asarray(dps.interpolate(pos, u))
    v_ref = np.asarray(dps.interpolate(pos, u, ctx=False))
    vs = np.abs(v_ref).max()
    assert np.abs(v_fast - v_ref).max() / vs < 5e-4

    mf_fast = np.asarray(dps.compute_mf(pos, F))
    mf_ref = np.asarray(dps.compute_mf(pos, F, ctx=False))
    ms = np.abs(mf_ref).max()
    assert np.abs(mf_fast - mf_ref).max() / ms < 5e-4


def test_slab_grid_pencil_matches_direct():
    """SlabGrid's xy-pencil path (DPPoissonSlab's spreading) matches the
    direct scatter to the truncation tail."""
    import numpy as np

    from uammd_tpu.solvers.slab_grid import SlabGrid

    n, L, H = 4300, 24.0, 8.0
    rng = np.random.default_rng(13)
    pos = jnp.asarray(np.column_stack([
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * 0.6 * H,
    ]), jnp.float64)
    q = jnp.asarray(rng.normal(size=(n,)))
    sg = SlabGrid(shape=(48, 48), nz=20, box_size=(L, L, H), sigma=0.5,
                  support=10)
    ctx = sg.pencil_ctx(pos)
    assert ctx is not None

    f_fast = np.asarray(sg.spread(pos, q))
    f_ref = np.asarray(sg.spread(pos, q, ctx=False))
    assert np.abs(f_fast - f_ref).max() / np.abs(f_ref).max() < 5e-4

    u = jnp.asarray(rng.normal(size=(48, 48, 20)))
    v_fast = np.asarray(sg.interpolate(pos, u))
    v_ref = np.asarray(sg.interpolate(pos, u, ctx=False))
    assert np.abs(v_fast - v_ref).max() / np.abs(v_ref).max() < 5e-4
