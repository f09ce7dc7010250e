"""Fluctuating hydrodynamics: ICM fluid + quasi2D BDHI.

Reference analogs: test/Hydro/ICM_Compressible structure-factor and
diffusion checks (applied here to the incompressible ICM), and the quasi2D
module's fluctuation-dissipation consistency.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.core.types import ForceEnergyVirial
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.bdhi.quasi2d import BDHI2D, Quasi2D, True2D
from uammd_tpu.integrators.hydro.icm import ICM, icm_integrator


def no_force(state, aux):
    return ForceEnergyVirial(force=jnp.zeros_like(state.pos)), aux


def test_icm_fluid_equipartition():
    """Incompressible fluid at temperature T: <v_a^2> = (2/3) kT/(rho dV)
    (2 of 3 dof per mode survive the projection)."""
    T, rho, eta = 1.0, 1.0, 0.5
    b = box(8.0, dtype=jnp.float64)
    icm = ICM.create(b, 8, viscosity=eta, density=rho, temperature=T,
                     dt=0.05, include_advection=False)
    st = make_state(np.zeros((1, 3)), seed=0, dtype=jnp.float64)
    integ = icm_integrator(no_force, icm)
    st, (fluid, _) = integ.init(st, None)
    # measure the thermalized initial field
    var0 = float(jnp.mean(fluid.v**2))
    want = (2.0 / 3.0) * T / (rho * icm.dV)
    np.testing.assert_allclose(var0, want, rtol=0.1)
    # evolve and confirm the dynamics preserve equipartition
    samples = []
    carry = (st, (fluid, None))
    for _ in range(6):
        st2, aux2, _ = run(
            type(integ)(init=integ.init, step=integ.step), carry[0], carry[1],
            10, initialize=False,
        )
        carry = (st2, aux2)
        samples.append(float(jnp.mean(aux2[0].v ** 2)))
    np.testing.assert_allclose(np.mean(samples), want, rtol=0.15)


def test_icm_momentum_conservation_deterministic():
    """T=0 fluid with a forced particle: total fluid momentum grows by
    F dt / dV each step (the spread force is the only source)."""
    b = box(8.0, dtype=jnp.float64)
    icm = ICM.create(b, 8, viscosity=1.0, density=1.0, temperature=0.0,
                     dt=0.01)
    st = make_state(np.array([[0.3, -0.2, 0.1]]), seed=0, dtype=jnp.float64)

    def pull(state, aux):
        return ForceEnergyVirial(
            force=jnp.ones_like(state.pos) * jnp.asarray([1.0, 0.0, 0.0])
        ), aux

    integ = icm_integrator(pull, icm)
    st, carry = integ.init(st, None)
    st, carry, _ = run(integ, st, carry, 10, initialize=False)
    fluid = carry[0]
    # projection removes the k=0 mode, so net momentum stays 0; but the
    # particle must move in +x dragged by the local flow it creates
    assert float(st.pos[0, 0]) > 0.3
    assert bool(jnp.all(jnp.isfinite(fluid.v)))


def test_icm_tracer_diffusion():
    """Tracer diffusion D ~ kT/(6 pi eta a_h) with a_h ~ 0.91 h
    (reference: FIB.cuh:33 kernel-fixed radius; same Peskin family)."""
    T, eta = 1.0, 1.0
    b = box(12.0, dtype=jnp.float64)
    icm = ICM.create(b, 12, viscosity=eta, density=1.0, temperature=T,
                     dt=0.02, include_advection=False)
    n = 27
    g = np.stack(np.meshgrid(*[np.arange(3)] * 3, indexing="ij"), -1)
    pos0 = (g.reshape(-1, 3) - 1.0) * 4.0
    st = make_state(pos0, seed=3, dtype=jnp.float64)
    integ = icm_integrator(no_force, icm)
    st, carry = integ.init(st, None)
    steps = 300
    st2, carry, _ = run(integ, st, carry, steps, initialize=False)
    msd = float(jnp.mean(jnp.sum((st2.pos - jnp.asarray(pos0)) ** 2, -1)))
    a_h = icm.hydrodynamic_radius
    d0 = T / (6 * math.pi * eta * a_h)
    # finite box (2.837 a/L) and kernel corrections: generous window
    want = 6 * d0 * steps * icm.dt
    assert 0.4 * want < msd < 1.3 * want, (msd, want)


@pytest.mark.parametrize("kern", [True2D(), Quasi2D()], ids=["true2d", "q2d"])
def test_quasi2d_mobility_sane(kern):
    L = 32.0
    b = box(L, dtype=jnp.float64)
    solver = BDHI2D.create(b, kernel=kern, viscosity=1.0, radius=1.0)
    pos = jnp.asarray([[0.0, 0, 0], [4.0, 0, 0]], jnp.float64)
    f = jnp.asarray([[1.0, 0.0], [0.0, 0.0]], jnp.float64)
    v = solver.compute_mf(pos, f)
    assert float(v[0, 0]) > 0  # self-mobility positive
    assert abs(float(v[0, 1])) < 1e-8  # no transverse response
    assert float(v[1, 0]) != 0  # pair coupling present
    # symmetric under exchange
    f2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]], jnp.float64)
    v2 = solver.compute_mf(pos, f2)
    np.testing.assert_allclose(float(v[1, 0]), float(v2[0, 0]), rtol=1e-10)


@pytest.mark.parametrize("kern", [True2D(), Quasi2D()], ids=["true2d", "q2d"])
def test_quasi2d_fluctuation_dissipation(kern):
    L = 16.0
    b = box(L, dtype=jnp.float64)
    solver = BDHI2D.create(b, kernel=kern, viscosity=1.0, radius=1.0)
    pos = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]], jnp.float64)
    cols = []
    for i in range(2):
        for d in range(2):
            f = jnp.zeros((2, 2), jnp.float64).at[i, d].set(1.0)
            cols.append(np.asarray(solver.compute_mf(pos, f)).ravel())
    M = np.stack(cols, axis=1)
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    ns = 600
    keys = jax.random.split(jax.random.key(0), ns)
    bs = jax.lax.map(
        lambda k: solver.compute_bdw(pos, k).reshape(-1), keys, batch_size=100
    )
    cov = np.cov(np.asarray(bs).T, bias=True)
    scale = np.abs(M).max()
    np.testing.assert_allclose(cov / scale, M / scale, atol=0.15)
