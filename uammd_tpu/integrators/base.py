"""Integrator base: pure step functions composed into XLA programs.

The reference Integrator is a stateful object whose ``forwardTime()`` the user
calls per step from a host loop (reference: src/Integrator/Integrator.cuh:33-125;
examples/generic_md/generic_simulation.cu:582-588). TPU-native inversion: an
integrator here is a pair of pure functions

    init(state, aux) -> (state, aux)     # first-step special casing
    step(state, aux) -> (state, aux)     # one dt

where ``aux`` is any pytree of cached acceleration structures (neighbour
lists, previous forces, ...). ``run`` rolls ``step`` into ``lax.scan`` so an
entire trajectory compiles into ONE XLA program — the host never intervenes,
removing the per-step launch overhead the reference pays on every kernel.

Interactors are represented by a ``force_fn(state, aux) -> (fev, aux)``
closure; composing several interactors is summing their ForceEnergyVirial
outputs (the reference's ``for interactor: sum(...)`` loop,
Integrator.cuh:109-124). ParameterUpdatable broadcasts dissolve into plain
function arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.state import SimState
from ..core.types import Computables, ForceEnergyVirial


@dataclasses.dataclass(frozen=True)
class Integrator:
    init: Callable  # (state, aux) -> (state, aux)
    step: Callable  # (state, aux) -> (state, aux)


def combine_interactors(*force_fns):
    """Sum several force_fn(state, aux) -> (fev, aux). aux is shared and
    threaded through in order (reference: Integrator::addInteractor)."""

    def combined(state, aux):
        total = ForceEnergyVirial()
        for fn in force_fns:
            fev, aux = fn(state, aux)
            total = total + fev
        return total, aux

    return combined


def run(
    integrator: Integrator,
    state: SimState,
    aux: Any,
    n_steps: int,
    *,
    observe: Callable | None = None,
    observe_every: int = 1,
    initialize: bool = True,
    guard: bool = False,
):
    """Advance ``n_steps`` under one jitted ``lax.scan``.

    ``observe(state) -> pytree`` is recorded every ``observe_every`` steps;
    the stacked observations are returned (or None).

    ``guard=True`` checks the final state for non-finite values on the host
    and raises SimulationError — the release-mode NaN canary (the reference
    keeps NaN checks even outside UAMMD_DEBUG, CellListBase.cuh:258; a
    non-finite force inside a compiled scan would otherwise poison the whole
    chunk silently). Cost: one device fetch after the scan.
    """
    if initialize:
        state, aux = integrator.init(state, aux)

    if observe is None:
        def body(carry, _):
            s, a = integrator.step(*carry)
            return (s, a), None

        (state, aux), _ = jax.lax.scan(body, (state, aux), None, length=n_steps)
        if guard:
            _guard_finite(state)
        return state, aux, None

    assert n_steps % observe_every == 0

    def inner(carry, _):
        s, a = integrator.step(*carry)
        return (s, a), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=observe_every)
        return carry, observe(carry[0])

    (state, aux), obs = jax.lax.scan(
        outer, (state, aux), None, length=n_steps // observe_every
    )
    if guard:
        _guard_finite(state)
    return state, aux, obs


def _guard_finite(state: SimState) -> None:
    import numpy as _np

    from ..core.logging import SimulationError

    for name in ("pos", "vel", "force"):
        v = getattr(state, name, None)
        if v is not None and not bool(_np.all(_np.isfinite(jax.device_get(v)))):
            raise SimulationError(
                f"non-finite values in state.{name} after run()"
            )


def advance_time(state: SimState, dt) -> SimState:
    upd = {}
    if state.time is not None:
        upd["time"] = state.time + jnp.asarray(dt, state.time.dtype)
    if state.step is not None:
        upd["step"] = state.step + 1
    return state.replace(**upd) if upd else state


def kinetic_energy(state: SimState) -> jax.Array:
    """Total kinetic energy (reference: VerletNVT Basic.cu sumKineticEnergy)."""
    v = state.get_vel()
    return 0.5 * jnp.sum(state.get_mass() * jnp.sum(v * v, axis=-1))


def temperature(state: SimState, dim: int = 3) -> jax.Array:
    return 2.0 * kinetic_energy(state) / (dim * state.n)
