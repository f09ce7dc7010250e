"""FCM kernel accuracy ladder: self-mobility error vs grid resolution /
Gaussian truncation, mirroring the reference's documented ladder
(reference: test/BDHI/FCM/fcm_test.cu:19-28 — Gaussian kernel reaches
<= 1e-8, Peskin 3pt ~3 digits). Double precision, CPU.

The truncated-Gaussian spreading error decays like exp(-s^2/(2 w^2)) with
s the support in cells and w = sigma/h the kernel width in cells; the
ladder walks points_per_radius/support together and must show monotone
convergence through 1e-6."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.integrators.bdhi.fcm import FCM


ETA, A = 1.0, 2.0


def want(L):
    """Hashimoto 1959 periodic self-mobility through (a/L)^6 (the same
    series the reference validates against, fcm_test.cu:64-80)."""
    a = A / L
    b = 0.19457
    a6 = 16.0 * math.pi**2 / 45.0 + 630.0 * b * b
    return (1.0 / (6.0 * math.pi * ETA * A)) * (
        1.0 - 2.83729747948062 * a + (4.0 * math.pi / 3.0) * a**3
        - a6 * a**6
    )


def self_mobility(ppr, support, L):
    b = box(L, dtype=jnp.float64)
    fcm = FCM.create(b, viscosity=ETA, radius=A, points_per_radius=ppr,
                     support=support)
    pos = jnp.zeros((1, 3), jnp.float64)
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    return float(fcm.compute_mf(pos, f)[0, 0])


# Absolute rungs: the truncated-Gaussian extent (support/ppr, units of a)
# sets the kernel error; beyond that the *series itself* has a measured
# ~0.225 (a/L)^3 residual for Gaussian blobs (the reference's own comment
# reports the same ~7e-7 floor at L = 64 rh, fcm_test.cu:66-70 — "probably
# the correction below missing something"), so the absolute bars track
# max(kernel truncation, series floor):
LADDER = [
    # (ppr, support, L, bar): extent 2a -> trunc ~2e-3; the engine tier
    (3.0, 12, 24.0, 3e-3),
    # extent 3a -> trunc ~7e-7; series floor 0.225/12^3 ~ 1.3e-4
    (4.0, 24, 24.0, 2e-4),
    # same kernel, bigger box: floor 0.225/24^3 ~ 1.6e-5
    (4.0, 24, 48.0, 3e-5),
]


@pytest.mark.parametrize("ppr,support,L,bar", LADDER)
def test_ladder_rung(ppr, support, L, bar):
    m = self_mobility(ppr, support, L)
    err = abs(m - want(L)) / want(L)
    assert err < bar, (ppr, support, L, err, bar)


def test_ladder_monotone():
    errs = [
        abs(self_mobility(p, s, L) - want(L)) / want(L)
        for (p, s, L, _) in LADDER
    ]
    assert errs[0] > errs[1] > errs[2], errs


def test_translational_invariance_1e6():
    """The reference's actual 1e-8-class criterion (fcm_test.cu:82 "self
    mobility stays below tolerance at a series of random positions"):
    grid-position dependence of the self-mobility. The box-series error is
    position-independent and drops out; what remains is pure kernel
    accuracy. Gaussian extent 3a at 4 points per radius -> <= 1e-6."""
    import numpy as onp

    L = 24.0
    b = box(L, dtype=jnp.float64)
    fcm = FCM.create(b, viscosity=ETA, radius=A, points_per_radius=4.0,
                     support=24)
    rng = onp.random.default_rng(0)
    ms = []
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    for _ in range(6):
        pos = jnp.asarray(rng.uniform(-L / 2, L / 2, (1, 3)), jnp.float64)
        ms.append(float(fcm.compute_mf(pos, f)[0, 0]))
    ms = onp.asarray(ms)
    assert (ms.max() - ms.min()) / ms.mean() < 1e-6, ms


@pytest.mark.slow
def test_reference_1e8_rung():
    """The reference's own headline rung (fcm_test.cu:24,83-100): Gaussian
    kernel, tolerance-driven settings (upsampling factor 1.377 at tol 1e-8
    -> h = a/(sqrt(pi)*1.377) ~ a/2.44, support ~ 17-18 cells, L ~ 128 a),
    asserting the ABSOLUTE displacement error <= 1e-8 against Hashimoto
    O(a^6) theory with unit force/viscosity (the reference's DoubleNear
    criterion; the ~0.23 (a/L)^3 series floor sits just below at this L)."""
    import numpy as onp

    a, eta = 1.0, 1.0
    L = 128.0 * a
    # h = 0.4 a -> 320^3 grid (2^6 * 5, FFT-friendly); extent = support*h/2
    # = 3.6 a = 6.3 sigma  (sigma = a/sqrt(pi)) -> truncation ~ 1e-9
    ppr, support = 2.5, 18
    b = box(L, dtype=jnp.float64)
    fcm = FCM.create(b, viscosity=eta, radius=a, points_per_radius=ppr,
                     support=support)
    rng = onp.random.default_rng(12)
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    m_theory = want_for(a, eta, L)
    for _ in range(2):
        pos = jnp.asarray(rng.uniform(-L / 2, L / 2, (1, 3)), jnp.float64)
        disp = fcm.compute_mf(pos, f)
        err = abs(float(disp[0, 0]) - m_theory)
        assert err < 1.0e-8, err
        # off-diagonal components must vanish to the same accuracy
        assert abs(float(disp[0, 1])) < 1.0e-8
        assert abs(float(disp[0, 2])) < 1.0e-8


def want_for(a, eta, L):
    al = a / L
    b_ = 0.19457
    a6 = 16.0 * math.pi**2 / 45.0 + 630.0 * b_ * b_
    return (1.0 / (6.0 * math.pi * eta * a)) * (
        1.0 - 2.83729747948062 * al + (4.0 * math.pi / 3.0) * al**3
        - a6 * al**6
    )


@pytest.mark.parametrize("kern,aph,pos_spread", [
    # a_eff/h calibrated on THIS (collocated spectral) solver; the
    # reference's 0.91/1.255 are staggered-grid constants (FIB.cuh:27-33).
    # pos_spread is the grid-position dependence band — the '~3 digits'
    # class the reference ladder quotes for Peskin kernels
    # (fcm_test.cu:19-28).
    ("peskin3pt", 0.990, 0.03),
    ("peskin4pt", 1.311, 0.02),
])
def test_peskin_rung(kern, aph, pos_spread):
    """Kernel-selectable FCM (reference: FCM_kernels.cuh, FCM_impl.cuh:36):
    h-locked Peskin kernels reproduce the calibrated a_eff = c*h self-
    mobility (mean over grid positions, 1%) with bounded position spread."""
    import numpy as onp

    L = 32.0
    b = box(L, dtype=jnp.float64)
    fcm = FCM.create(b, viscosity=ETA, radius=2.0, kernel=kern)
    assert fcm.support == (3 if kern == "peskin3pt" else 4)
    h = L / fcm.shape[0]
    a_eff = aph * h
    rng = onp.random.default_rng(3)
    f = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    ms = [
        float(fcm.compute_mf(
            jnp.asarray(rng.uniform(-L / 2, L / 2, (1, 3)), jnp.float64), f
        )[0, 0])
        for _ in range(6)
    ]
    ms = onp.asarray(ms)
    m_th = want_for(a_eff, ETA, L)
    assert abs(ms.mean() - m_th) / m_th < 0.01, (ms.mean(), m_th)
    assert (ms.max() - ms.min()) / ms.mean() < pos_spread, ms


def test_bm_kernel_far_field_matches_gaussian():
    """The ES/BM kernel plugs into FCM; at separations >> a the pair
    mobility is kernel-independent, so BM and Gaussian FCM must agree."""
    L = 32.0
    b = box(L, dtype=jnp.float64)
    pos = jnp.asarray([[-8.0, 0.0, 0.0], [8.0, 0.0, 0.0]], jnp.float64)
    f = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float64)
    g = FCM.create(b, viscosity=ETA, radius=1.0, points_per_radius=3.0,
                   support=12)
    bm = FCM.create(b, viscosity=ETA, radius=1.0, points_per_radius=3.0,
                    kernel="bm", support=8)
    ug = g.compute_mf(pos, f)
    ub = bm.compute_mf(pos, f)
    # cross-mobility (velocity of the force-free particle)
    np.testing.assert_allclose(
        np.asarray(ub[1]), np.asarray(ug[1]), rtol=0.02, atol=1e-6
    )
    assert np.isfinite(np.asarray(ub)).all()


def test_torque_requires_gaussian():
    b = box(16.0, dtype=jnp.float64)
    fcm = FCM.create(b, radius=1.5, kernel="peskin3pt")
    pos = jnp.zeros((1, 3), jnp.float64)
    f = jnp.ones((1, 3), jnp.float64)
    with pytest.raises(NotImplementedError):
        fcm.compute_hydrodynamic_displacements(pos, f, torques=f)
