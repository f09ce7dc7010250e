"""FIB, compressible ICM, and LBM validation."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.core.types import ForceEnergyVirial
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.bdhi.fib import FIB, fib_integrator
from uammd_tpu.integrators.hydro.icm_compressible import (
    ICMCompressible,
    icm_compressible_integrator,
)
from uammd_tpu.integrators.hydro.lbm import D3Q19


def no_force(state, aux):
    return ForceEnergyVirial(force=jnp.zeros_like(state.pos)), aux


def test_fib_deterministic_mobility():
    """Dragged particle moves with ~1/(6 pi eta rh) (kernel-fixed radius,
    reference: FIB.cuh:33)."""
    eta = 1.0
    b = box(16.0, dtype=jnp.float64)
    fib = FIB.create(b, 16, viscosity=eta, temperature=0.0, dt=0.05)
    pos = jnp.zeros((1, 3), jnp.float64)
    v = fib.velocities(pos, jnp.asarray([[1.0, 0, 0]], jnp.float64))
    rh = fib.hydrodynamic_radius
    L = 16.0
    # Hashimoto periodic correction applies on top of the kernel radius
    m0 = (1.0 / (6 * math.pi * eta * rh)) * (1.0 - 2.83729748 * rh / L)
    np.testing.assert_allclose(float(v[0, 0]), m0, rtol=0.1)
    assert abs(float(v[0, 1])) < 1e-12


def test_fib_diffusion():
    T, eta = 1.0, 1.0
    b = box(12.0, dtype=jnp.float64)
    fib = FIB.create(b, 12, viscosity=eta, temperature=T, dt=0.02)
    g = np.stack(np.meshgrid(*[np.arange(3)] * 3, indexing="ij"), -1)
    pos0 = (g.reshape(-1, 3) - 1.0) * 4.0
    st = make_state(pos0, seed=1, dtype=jnp.float64)
    integ = fib_integrator(no_force, fib)
    st, aux = integ.init(st, None)
    steps = 250
    st2, _, _ = run(integ, st, aux, steps, initialize=False)
    msd = float(jnp.mean(jnp.sum((st2.pos - jnp.asarray(pos0)) ** 2, -1)))
    d0 = T / (6 * math.pi * eta * fib.hydrodynamic_radius)
    want = 6 * d0 * steps * fib.dt
    assert 0.4 * want < msd < 1.4 * want, (msd, want)


def test_icm_compressible_equilibrium_fluctuations():
    """<drho^2> = rho kT / (c^2 dV) and <g_a^2> = rho kT/dV at equilibrium
    (reference: test/Hydro/ICM_Compressible structure-factor checks)."""
    T, rho0, c = 1.0, 1.0, 4.0
    b = box(8.0, dtype=jnp.float64)
    icm = ICMCompressible.create(
        b, 8, shear_viscosity=1.0, bulk_viscosity=1.0, speed_of_sound=c,
        density=rho0, temperature=T, dt=0.005,
    )
    st = make_state(np.zeros((1, 3)), seed=0, dtype=jnp.float64)
    integ = icm_compressible_integrator(no_force, icm)
    st, carry = integ.init(st, None)
    var_r0 = float(jnp.var(carry[0].rho))
    want_r = rho0 * T / (c**2 * icm.dV)
    np.testing.assert_allclose(var_r0, want_r, rtol=0.15)
    # evolve: fluctuations should stay at equilibrium level
    samples_r, samples_g = [], []
    for _ in range(5):
        st, carry, _ = run(integ, st, carry, 20, initialize=False)
        samples_r.append(float(jnp.var(carry[0].rho)))
        samples_g.append(float(jnp.mean(carry[0].g ** 2)))
    want_g = rho0 * T / icm.dV
    np.testing.assert_allclose(np.mean(samples_r), want_r, rtol=0.3)
    np.testing.assert_allclose(np.mean(samples_g), want_g, rtol=0.3)
    assert bool(jnp.all(jnp.isfinite(carry[0].rho)))


def test_icm_compressible_mass_conservation():
    b = box(8.0, dtype=jnp.float64)
    icm = ICMCompressible.create(b, 8, temperature=0.5, dt=0.005)
    st = make_state(np.zeros((1, 3)), seed=2, dtype=jnp.float64)
    integ = icm_compressible_integrator(no_force, icm)
    st, carry = integ.init(st, None)
    m0 = float(jnp.sum(carry[0].rho))
    st, carry, _ = run(integ, st, carry, 50, initialize=False)
    np.testing.assert_allclose(float(jnp.sum(carry[0].rho)), m0, rtol=1e-10)


def test_lbm_poiseuille():
    """Body-forced channel flow between bounce-back walls reaches the
    parabolic profile (the standard LBM validation; reference LBM is WIP)."""
    nx, ny, nz = 4, 4, 33
    lbm = D3Q19(shape=(nx, ny, nz), tau=0.9, dtype=jnp.float64)
    solid = jnp.zeros((nx, ny, nz), bool).at[:, :, 0].set(True).at[:, :, -1].set(True)
    g = 1e-6
    state = lbm.init_state()
    state = lbm.run(state, 3000, solid=solid, body_force=(g, 0.0, 0.0))
    rho, u = lbm.moments(state.f)
    ux = np.asarray(u[0, 0, :, 0])
    z = np.arange(nz)
    # fluid region between walls (half-way bounce back: walls at 0.5, nz-1.5)
    zf = z[1:-1]
    H = nz - 2
    zz = zf - 0.5 - H / 2.0 + 0.0
    want = g / (2 * lbm.viscosity) * ((H / 2) ** 2 - (zz) ** 2)
    got = ux[1:-1]
    err = np.abs(got - want).max() / want.max()
    # bounce-back wall location carries an O(h) tau-dependent slip
    assert err < 0.08, err


def test_lbm_mass_momentum_conservation():
    lbm = D3Q19(shape=(8, 8, 8), dtype=jnp.float64)
    state = lbm.init_state(u0=(0.02, -0.01, 0.005))
    m0 = float(jnp.sum(state.f))
    state = lbm.run(state, 100)
    np.testing.assert_allclose(float(jnp.sum(state.f)), m0, rtol=1e-12)
    rho, u = lbm.moments(state.f)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(u, axis=(0, 1, 2))), [0.02, -0.01, 0.005],
        atol=1e-10,
    )
