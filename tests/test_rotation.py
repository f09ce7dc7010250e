"""Rigid-body rotation: quaternion algebra, FCM rotational mobility, and the
torque-driven orientation integrator (reference: utils/quaternion.cuh,
BDHI_FCM.cuh with torques)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core import quaternion as quat
from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.bdhi.fcm import FCM
from uammd_tpu.integrators.bdhi.rotational import bdhi_fcm_rotational


def test_quaternion_algebra():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(5, 3)))
    q = quat.from_rotation_vector(v)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0,
                               atol=1e-6)
    # rotation about z by pi/2 maps x -> y
    qz = quat.from_rotation_vector(jnp.asarray([[0.0, 0.0, math.pi / 2]]))
    r = quat.rotate(qz, jnp.asarray([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(r), [[0.0, 1.0, 0.0]], atol=1e-6)
    # composition: exp(a) * exp(b) == exp(a + b) for parallel axes
    a = quat.from_rotation_vector(jnp.asarray([[0.3, 0.0, 0.0]]))
    b = quat.from_rotation_vector(jnp.asarray([[0.5, 0.0, 0.0]]))
    ab = quat.multiply(a, b)
    np.testing.assert_allclose(
        np.asarray(ab),
        np.asarray(quat.from_rotation_vector(jnp.asarray([[0.8, 0.0, 0.0]]))),
        atol=1e-6,
    )
    # inverse rotation via conjugate axis
    back = quat.rotate(quat.from_rotation_vector(-v), quat.rotate(
        quat.from_rotation_vector(v), jnp.asarray([[1.0, 2.0, 3.0]])
    ))
    np.testing.assert_allclose(np.asarray(back),
                               np.broadcast_to([1.0, 2.0, 3.0], (5, 3)),
                               atol=1e-5)


@pytest.fixture(scope="module")
def fcm_sys():
    L, a, eta = 32.0, 1.0, 1.3
    b = box(L)
    f = FCM.create(b, viscosity=eta, radius=a, points_per_radius=3.0)
    return b, f, L, a, eta


def test_rotational_self_mobility(fcm_sys):
    """Unit torque -> omega = 1/(8 pi eta a^3) (rotlet-width Gaussian;
    periodic image corrections decay ~ (a/L)^3)."""
    b, f, L, a, eta = fcm_sys
    pos = jnp.zeros((1, 3), jnp.float64)
    T = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float64)
    F = jnp.zeros((1, 3), jnp.float64)
    v, w = f.compute_hydrodynamic_displacements(pos, F, T)
    w = np.asarray(w)[0]
    expected = 1.0 / (8.0 * math.pi * eta * a**3)
    assert abs(w[2] - expected) / expected < 2e-2, (w[2], expected)
    assert abs(w[0]) < 1e-6 * expected and abs(w[1]) < 1e-6 * expected
    np.testing.assert_allclose(np.asarray(v)[0], 0.0, atol=1e-12)


def test_rotation_translation_coupling_antisymmetry(fcm_sys):
    """Grand mobility symmetry: omega(i) from force(j) equals v(j) from
    torque(i) (M_rt = M_tr^T for the grid operator)."""
    b, f, L, a, eta = fcm_sys
    pos = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 1.0, 0.5]], jnp.float64)
    F = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float64)
    Tq = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], jnp.float64)
    zero = jnp.zeros_like(F)
    _, w_from_F = f.compute_hydrodynamic_displacements(pos, F, zero)
    v_from_T, _ = f.compute_hydrodynamic_displacements(pos, zero, Tq)
    # <T_1, w_1(F_2)> == <F_2, v_2(T_1)>
    lhs = float(jnp.sum(Tq[0] * w_from_F[0]))
    rhs = float(jnp.sum(F[1] * v_from_T[1]))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1e-30), (lhs, rhs)
    assert abs(lhs) > 0  # coupling actually nonzero


def test_torque_driven_spin(fcm_sys):
    """Constant torque spins the quaternion at omega = T/(8 pi eta a^3)."""
    b, f, L, a, eta = fcm_sys
    n = 1
    st = make_state(jnp.zeros((n, 3), jnp.float64), seed=0)
    T0 = 2.0

    def ft(state, aux):
        return (
            jnp.zeros_like(state.pos),
            jnp.asarray([[0.0, 0.0, T0]], state.dtype),
            aux,
        )

    dt, steps = 0.05, 40
    integ = bdhi_fcm_rotational(ft, f, dt=dt, temperature=0.0)
    st, _, _ = run(integ, st, None, steps)
    omega = T0 / (8.0 * math.pi * eta * a**3)
    angle = omega * dt * steps
    expected = np.asarray(
        quat.from_rotation_vector(jnp.asarray([[0.0, 0.0, angle]]))
    )
    got = np.asarray(st.dir)
    assert np.abs(got - expected).max() < 2e-2 * max(angle, 1.0), (
        got, expected
    )
    # positions unmoved (no force, no coupling for a single particle)
    np.testing.assert_allclose(np.asarray(st.pos), 0.0, atol=1e-7)


def test_rotational_fluctuation_dissipation(fcm_sys):
    """Var(dPhi) = 2 kT M_rr dt for the fused noise path (loose, stochastic).
    """
    b, f, L, a, eta = fcm_sys
    pos = jnp.zeros((1, 3), jnp.float64)
    zero = jnp.zeros((1, 3), jnp.float64)
    kT, dt = 1.7, 0.01
    amp = math.sqrt(2.0 * kT / dt)

    @jax.jit
    def sample(key):
        _, w = f.compute_mf_bdw_torques(pos, zero, zero, key, amp)
        return w[0]

    keys = jax.random.split(jax.random.key(3), 300)
    ws = np.asarray(jax.vmap(sample)(keys))  # omega = dPhi/dt
    var = (ws * dt).var(axis=0) / dt  # per-component Var(dPhi)/dt
    expected = 2.0 * kT / (8.0 * math.pi * eta * a**3)
    assert np.allclose(var, expected, rtol=0.25), (var, expected)
