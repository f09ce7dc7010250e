"""Overdamped Langevin (Brownian dynamics) integrators.

TPU-native redesign of the reference BD module (reference:
src/Integrator/BrownianDynamics.cu): dX = (K X + M F) dt + sqrt(2 T M dt) dW
with per-particle mobility M = 1/(6 pi eta a) (a = hydrodynamic radius, per
particle if ``state.radius`` is set — BrownianDynamics.cu:132) and optional
3x3 shear matrix K (BrownianDynamics.cuh K arguments). Four schemes:

- euler_maruyama  (BrownianDynamics.cu:119-144)
- midpoint        (:190-232) — half-drift to the midpoint with noise B*dW1,
  recompute forces, full drift from the initial point with B*(dW1+dW2),
  B = sqrt(T M dt).
- adams_bashforth (:276-301) — drift with 1.5 F_n - 0.5 F_{n-1}.
- leimkuhler      (:331-356) — noise sqrt(T M dt / 2) * (xi_n + xi_{n-1}),
  reusing the previous step's counter-based draw; here the previous draw is
  carried explicitly in ``aux`` (functional states beat RNG replay).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core.state import SimState, next_key
from .base import Integrator, advance_time


def self_mobility(state: SimState, viscosity: float, hydrodynamic_radius=None):
    """Per-particle scalar mobility (reference: BrownianDynamics.cu:19-46)."""
    m0 = 1.0 / (6.0 * math.pi * viscosity)
    if hydrodynamic_radius is not None:
        return jnp.asarray(m0 / hydrodynamic_radius, state.dtype) * jnp.ones(
            state.n, state.dtype
        )
    if state.radius is not None:
        return m0 / state.radius
    return jnp.full(state.n, m0, state.dtype)


def _shear(K, pos):
    if K is None:
        return 0.0
    return pos @ jnp.asarray(K, pos.dtype).T


def _common(state, viscosity, hydrodynamic_radius):
    M = self_mobility(state, viscosity, hydrodynamic_radius)[:, None]
    return M


def _z_mask(is2D, dtype):
    return jnp.asarray([1.0, 1.0, 0.0] if is2D else [1.0, 1.0, 1.0], dtype)


def _ensure_force(state):
    """Materialize the force field so scan carries keep a stable pytree
    structure (the step stores the last force in the state)."""
    if state.force is None:
        return state.replace(force=jnp.zeros_like(state.pos))
    return state


def euler_maruyama(
    force_fn, dt: float, temperature: float = 0.0, viscosity: float = 1.0,
    hydrodynamic_radius=None, K=None, *, is2D: bool = False,
) -> Integrator:
    def init(state, aux):
        return _ensure_force(state), aux

    def step(state, aux):
        h = jnp.asarray(dt, state.dtype)
        M = _common(state, viscosity, hydrodynamic_radius)
        fev, aux = force_fn(state, aux)
        dx = h * (_shear(K, state.pos) + M * fev.force)
        if temperature > 0:
            state, k = next_key(state)
            B = jnp.sqrt(2.0 * temperature * M * h)
            dx = dx + B * jax.random.normal(k, state.pos.shape, state.dtype)
        x = state.pos + dx * _z_mask(is2D, state.dtype)
        return advance_time(state.replace(pos=x, force=fev.force), dt), aux

    return Integrator(init=init, step=step)


def midpoint(
    force_fn, dt: float, temperature: float = 0.0, viscosity: float = 1.0,
    hydrodynamic_radius=None, K=None, *, is2D: bool = False,
) -> Integrator:
    """Stochastic midpoint scheme (reference: BrownianDynamics.cu:190-232)."""

    def init(state, aux):
        return _ensure_force(state), aux

    def step(state, aux):
        h = jnp.asarray(dt, state.dtype)
        zm = _z_mask(is2D, state.dtype)
        M = _common(state, viscosity, hydrodynamic_radius)
        x0 = state.pos
        fev, aux = force_fn(state, aux)
        dx = h * (0.5 * _shear(K, x0) + 0.5 * M * fev.force)
        if temperature > 0:
            state, k1 = next_key(state)
            B = jnp.sqrt(temperature * M * h)
            dW1 = B * jax.random.normal(k1, x0.shape, state.dtype)
            dx = dx + dW1
        x_mid = x0 + dx * zm
        state_mid = state.replace(pos=x_mid)
        fev2, aux = force_fn(state_mid, aux)
        dx = h * (_shear(K, x_mid) + M * fev2.force)
        if temperature > 0:
            state, k2 = next_key(state)
            dW2 = B * jax.random.normal(k2, x0.shape, state.dtype)
            dx = dx + dW1 + dW2
        x = x0 + dx * zm
        return advance_time(state.replace(pos=x, force=fev2.force), dt), aux

    return Integrator(init=init, step=step)


def adams_bashforth(
    force_fn, dt: float, temperature: float = 0.0, viscosity: float = 1.0,
    hydrodynamic_radius=None, K=None, *, is2D: bool = False,
) -> Integrator:
    """AB2 drift (reference: BrownianDynamics.cu:276-301). aux carries the
    previous forces as aux = (prev_force, user_aux)."""

    def init(state, aux):
        fev, aux = force_fn(state, aux)
        return state.replace(force=fev.force), (fev.force, aux)

    def step(state, carry):
        prev_force, aux = carry
        h = jnp.asarray(dt, state.dtype)
        M = _common(state, viscosity, hydrodynamic_radius)
        fev, aux = force_fn(state, aux)
        dx = h * (_shear(K, state.pos) + M * (1.5 * fev.force - 0.5 * prev_force))
        if temperature > 0:
            state, k = next_key(state)
            B = jnp.sqrt(2.0 * temperature * M * h)
            dx = dx + B * jax.random.normal(k, state.pos.shape, state.dtype)
        x = state.pos + dx * _z_mask(is2D, state.dtype)
        return (
            advance_time(state.replace(pos=x, force=fev.force), dt),
            (fev.force, aux),
        )

    return Integrator(init=init, step=step)


def leimkuhler(
    force_fn, dt: float, temperature: float = 0.0, viscosity: float = 1.0,
    hydrodynamic_radius=None, K=None, *, is2D: bool = False,
) -> Integrator:
    """Leimkuhler-Matthews BAOAB-limit scheme (reference:
    BrownianDynamics.cu:331-356): noise = sqrt(T M dt / 2)(xi_n + xi_{n-1}).
    aux = (prev_noise, user_aux)."""

    def init(state, aux):
        state, k = next_key(state)
        xi = jax.random.normal(k, state.pos.shape, state.dtype)
        return _ensure_force(state), (xi, aux)

    def step(state, carry):
        xi_prev, aux = carry
        h = jnp.asarray(dt, state.dtype)
        M = _common(state, viscosity, hydrodynamic_radius)
        fev, aux = force_fn(state, aux)
        dx = h * (_shear(K, state.pos) + M * fev.force)
        state, k = next_key(state)
        xi = jax.random.normal(k, state.pos.shape, state.dtype)
        if temperature > 0:
            B = jnp.sqrt(0.5 * temperature * M * h)
            dx = dx + B * (xi + xi_prev)
        x = state.pos + dx * _z_mask(is2D, state.dtype)
        return advance_time(state.replace(pos=x, force=fev.force), dt), (xi, aux)

    return Integrator(init=init, step=step)
