"""Particle groups: subsets selected by rule, stable across reordering.

TPU-native analog of the reference ParticleGroup + selectors (reference:
src/ParticleData/ParticleGroup.cuh:66-166, selectors All/None/IDRange/Domain/
Type). Under functional state a group is simply a boolean mask over the
canonical particle order (ids are stable, so masks survive any spatial
resorting by construction — the reference needs a reorder-signal web for
this, ParticleGroup.cuh:140).

Interactors accept masks by multiplying per-particle outputs; integrators
can restrict updates with ``apply_masked``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .box import Box
from .state import SimState


def all_particles(state: SimState) -> jax.Array:
    return jnp.ones(state.n, bool)


def none(state: SimState) -> jax.Array:
    return jnp.zeros(state.n, bool)


def id_range(state: SimState, first: int, last: int) -> jax.Array:
    ids = state.get_id()
    return (ids >= first) & (ids <= last)


def id_list(state: SimState, ids) -> jax.Array:
    sel = jnp.zeros(state.n, bool)
    return sel.at[jnp.asarray(ids)].set(True)


def by_type(state: SimState, type_id: int) -> jax.Array:
    return state.get_type() == type_id


def domain(state: SimState, box: Box, lo, hi) -> jax.Array:
    """Particles inside an axis-aligned region (Domain selector)."""
    p = box.wrap_position(state.pos)
    lo = jnp.asarray(lo, p.dtype)
    hi = jnp.asarray(hi, p.dtype)
    return jnp.all((p >= lo) & (p <= hi), axis=-1)


def apply_masked(state_new: SimState, state_old: SimState, mask) -> SimState:
    """Keep updates only for masked particles (group-restricted integration,
    the reference's per-group Integrator semantics)."""
    m = mask[:, None]

    def pick(new, old):
        if new is None or old is None:
            return new
        if new.ndim == 2:
            return jnp.where(m, new, old)
        if new.ndim == 1 and new.shape[0] == mask.shape[0]:
            return jnp.where(mask, new, old)
        return new

    return state_new.replace(
        pos=pick(state_new.pos, state_old.pos),
        vel=pick(state_new.vel, state_old.vel),
        force=pick(state_new.force, state_old.force),
    )
