"""External (single-particle) potentials.

TPU-native analog of the reference ExternalForces (reference:
src/Interactor/ExternalForces.cuh:84): a per-particle functor over whatever
properties it declares via getArrays. Under JAX this is simply a vectorized
energy (or force) function of the SimState fields; forces come from autodiff
when only an energy is given.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import SimState
from ..core.types import Computables, ForceEnergyVirial


def external_forces(
    state: SimState,
    energy_fn=None,
    force_fn=None,
    computables: Computables = Computables(),
) -> ForceEnergyVirial:
    """``energy_fn(pos, state) -> [N]``; force = -grad if force_fn not given."""
    assert energy_fn is not None or force_fn is not None
    force = energy = None
    if computables.force:
        if force_fn is not None:
            force = force_fn(state.pos, state)
        else:
            force = -jax.grad(lambda p: jnp.sum(energy_fn(p, state)))(state.pos)
    if computables.energy and energy_fn is not None:
        energy = energy_fn(state.pos, state)
    return ForceEnergyVirial(force=force, energy=energy)


def gravity(g=(0.0, 0.0, -1.0)):
    """Constant force field (the reference's canonical ExternalForces example,
    ExternalForces.cuh:20-40)."""

    def force_fn(pos, state):
        m = state.get_mass()[:, None]
        return m * jnp.asarray(g, pos.dtype)

    def energy_fn(pos, state):
        m = state.get_mass()
        return -m * (pos @ jnp.asarray(g, pos.dtype))

    return energy_fn, force_fn


def harmonic_trap(k=1.0, center=(0.0, 0.0, 0.0)):
    def energy_fn(pos, state):
        d = pos - jnp.asarray(center, pos.dtype)
        return 0.5 * k * jnp.sum(d * d, axis=-1)

    return energy_fn, None


def wall_lj93(z0=0.0, epsilon=1.0, sigma=1.0, side=+1):
    """9-3 LJ wall at z = z0 (standard confinement external potential)."""

    def energy_fn(pos, state):
        d = jnp.maximum(side * (pos[:, 2] - z0), 1e-3)
        s3 = (sigma / d) ** 3
        return epsilon * ((2.0 / 15.0) * s3**3 - s3)

    return energy_fn, None
