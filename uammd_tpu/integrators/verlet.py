"""Velocity-Verlet integrators: NVE and Langevin NVT.

TPU-native redesign of the reference MD integrators:
- VerletNVE (reference: src/Integrator/VerletNVE.cu:174-189) — two half-kicks
  around a drift, optional velocity initialization to a target energy.
- VerletNVT::Basic (reference: src/Integrator/VerletNVT/Basic.cu:87-115) —
  velocity Verlet with friction -gamma*v and per-half-step noise of std
  sqrt(dt*gamma*T/m) folded into each half kick.
- VerletNVT::GronbechJensen (reference: src/Integrator/VerletNVT/
  GronbechJensen.cu:20-62; Gronbech-Jensen & Farago, Mol. Phys. 2013) — the
  exact discretization with a=(1-gdt/2)/(1+gdt/2), b=1/(1+gdt/2).

All three are pure ``step(state, aux) -> (state, aux)`` functions; forces come
from a user ``force_fn(state, aux) -> (fev, aux)`` so any interactor stack and
neighbour-list caching plugs in (see integrators.base).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import SimState, next_key
from .base import Integrator, advance_time


def _zero_z(arr, is2D):
    if not is2D:
        return arr
    return arr * jnp.asarray([1.0, 1.0, 0.0], arr.dtype)


def initialize_velocities(state: SimState, temperature, is2D=False) -> SimState:
    """Draw Maxwell-Boltzmann velocities at the target temperature and remove
    net momentum (reference: Basic.cu initialVelocities; VerletNVE.cu offers
    the energy-targeted variant)."""
    state, k = next_key(state)
    m = state.get_mass()
    sigma = jnp.sqrt(jnp.asarray(temperature, state.dtype) / m)[:, None]
    v = sigma * jax.random.normal(k, (state.n, 3), state.dtype)
    v = v - jnp.mean(v * m[:, None], axis=0) / jnp.mean(m)
    return state.replace(vel=_zero_z(v, is2D))


def nve(
    force_fn, dt: float, *, is2D: bool = False, initial_energy: float | None = None,
) -> Integrator:
    """Velocity Verlet NVE (reference: VerletNVE.cu:174-189).

    ``initial_energy``: if given and the state has no velocities, draw them
    and rescale so the TOTAL energy matches (the reference's
    initVelocities-to-target-energy option, VerletNVE.cuh:38)."""

    def init(state, aux):
        if state.vel is None:
            if initial_energy is not None:
                state = initialize_velocities(state, 1.0, is2D)
                fev_e, aux = force_fn(state, aux)
                pot_e = (
                    jnp.sum(fev_e.energy) if fev_e.energy is not None else 0.0
                )
                from .base import kinetic_energy

                ke = kinetic_energy(state)
                target_ke = jnp.maximum(initial_energy - pot_e, 1e-12)
                state = state.replace(
                    vel=state.vel * jnp.sqrt(target_ke / jnp.maximum(ke, 1e-30))
                )
            else:
                state = state.replace(vel=jnp.zeros_like(state.pos))
        fev, aux = force_fn(state, aux)
        return state.replace(force=fev.force), aux

    def step(state, aux):
        m = state.get_mass()[:, None]
        h = jnp.asarray(dt, state.dtype)
        v = state.vel + 0.5 * h * state.force / m
        x = state.pos + h * _zero_z(v, is2D)
        state = state.replace(pos=x)
        fev, aux = force_fn(state, aux)
        v = v + 0.5 * h * fev.force / m
        state = state.replace(vel=_zero_z(v, is2D), force=fev.force)
        return advance_time(state, dt), aux

    return Integrator(init=init, step=step)


def nvt_basic(
    force_fn, dt: float, temperature: float, friction: float = 1.0,
    *, is2D: bool = False,
) -> Integrator:
    """Langevin velocity Verlet, the reference's VerletNVT::Basic
    (Basic.cu:87-115): each half-kick applies (f/m - gamma*v)*dt/2 plus noise
    of std sqrt(dt*gamma*T/m) per component."""

    def half_kick(state, key):
        m = state.get_mass()[:, None]
        h = jnp.asarray(dt, state.dtype)
        amp = jnp.sqrt(jnp.asarray(dt * friction * temperature, state.dtype) / m)
        noise = amp * jax.random.normal(key, (state.n, 3), state.dtype)
        v = state.vel + (state.force / m - friction * state.vel) * (0.5 * h) + noise
        return _zero_z(v, is2D)

    def init(state, aux):
        if state.vel is None:
            state = initialize_velocities(state, temperature, is2D)
        fev, aux = force_fn(state, aux)
        return state.replace(force=fev.force), aux

    def step(state, aux):
        h = jnp.asarray(dt, state.dtype)
        state, k1 = next_key(state)
        v = half_kick(state, k1)
        x = state.pos + h * v
        state = state.replace(pos=x, vel=v)
        fev, aux = force_fn(state, aux)
        state = state.replace(force=fev.force)
        state, k2 = next_key(state)
        v = half_kick(state, k2)
        state = state.replace(vel=v)
        return advance_time(state, dt), aux

    return Integrator(init=init, step=step)


def nvt_gronbech_jensen(
    force_fn, dt: float, temperature: float, friction: float = 1.0,
    *, is2D: bool = False,
) -> Integrator:
    """Gronbech-Jensen & Farago 2013 Langevin Verlet (reference:
    GronbechJensen.cu:20-62). ``friction`` is a rate; gamma = friction*m."""

    def init(state, aux):
        if state.vel is None:
            state = initialize_velocities(state, temperature, is2D)
        fev, aux = force_fn(state, aux)
        return state.replace(force=fev.force), aux

    def step(state, aux):
        m = state.get_mass()[:, None]
        h = jnp.asarray(dt, state.dtype)
        state, k = next_key(state)
        # noise std: sqrt(2*T*m*friction*dt) per component
        amp = jnp.sqrt(jnp.asarray(2.0 * temperature * friction * dt, state.dtype) * m)
        noise = _zero_z(amp * jax.random.normal(k, (state.n, 3), state.dtype), is2D)
        gdt = 0.5 * friction * dt
        b = 1.0 / (1.0 + gdt)
        a = (1.0 - gdt) * b
        f0 = state.force
        x = state.pos + b * h * state.vel + (0.5 * b * h / m) * (h * f0 + noise)
        v = a * state.vel + (0.5 * h / m) * a * f0 + (b / m) * noise
        state = state.replace(pos=x, vel=_zero_z(v, is2D))
        fev, aux = force_fn(state, aux)
        v = state.vel + (0.5 * h / m) * fev.force
        state = state.replace(vel=_zero_z(v, is2D), force=fev.force)
        return advance_time(state, dt), aux

    return Integrator(init=init, step=step)
