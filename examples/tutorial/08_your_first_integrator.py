"""Your first Integrator — the functional recipe.

Mirrors reference basic_concepts/12-your-first-integrator.cu: there, a
custom Integrator subclasses ``Integrator``, overrides ``forwardTime()``
(reset forces -> ask every added Interactor to sum -> update positions) and
broadcasts parameter changes through the ParameterUpdatable list.

The TPU-native translation (integrators/base.py): an Integrator is a pair
of PURE functions ``init(state, aux)`` / ``step(state, aux)``. "Adding an
interactor" is composing force closures with ``combine_interactors``; the
ParameterUpdatable broadcast dissolves into plain function arguments; and
the host loop becomes ``run()``'s single jitted ``lax.scan``.

This tutorial writes the same simple Euler Brownian update rule the
reference example hardcodes, shows a per-particle user field riding along
in ``SimState.extra`` (the EXTRA_PARTICLE_PROPERTIES analog,
ParticleData.cuh:29-95) — here an accumulated path length — and composes
the result with ``run()`` and a stock interactor, exactly like a built-in.
"""

import jax
import jax.numpy as jnp

from uammd_tpu import box, make_state
from uammd_tpu.core.state import next_key
from uammd_tpu.integrators.base import (
    Integrator,
    combine_interactors,
    run,
)
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    maybe_rebuild,
)
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice

n, L = 512, 16.0
b = box(L)
dt, temperature, mobility = 5e-4, 1.0, 1.0  # Euler BD needs M F dt well under the core scale

# --- interactors: any force_fn(state, aux) -> (fev, aux) ------------------
pot = lj(cutoff=2.5)


def lj_interactor(state, aux):
    nbrs = maybe_rebuild(aux, state.pos)
    return pair_forces(pot, state.pos, nbrs), nbrs


force_fn = combine_interactors(lj_interactor)  # add more closures here


# --- the custom integrator ------------------------------------------------
def my_init(state, aux):
    # first-step special casing (the reference does this lazily inside the
    # first forwardTime): compute initial forces, zero the path-length
    # accumulator in state.extra
    fev, aux = force_fn(state, aux)
    state = state.replace(
        force=fev.force,
        extra={**state.extra,
               "path_length": jnp.zeros(state.pos.shape[0], state.pos.dtype)},
    )
    return state, aux


def my_step(state, aux):
    # Euler-Maruyama Brownian rule, as in the reference tutorial:
    #   x += M F dt + sqrt(2 M kT dt) W
    state, sub = next_key(state)
    noise = jnp.sqrt(2.0 * mobility * temperature * dt) * jax.random.normal(
        sub, state.pos.shape, state.pos.dtype
    )
    dx = mobility * state.force * dt + noise
    pos = b.wrap_position(state.pos + dx)
    # the user field updates like any other property — it lives in the
    # state pytree, survives jit/scan and spatial resorts
    path = state.extra["path_length"] + jnp.linalg.norm(dx, axis=-1)
    state = state.replace(
        pos=pos, extra={**state.extra, "path_length": path},
        time=state.time + dt, step=state.step + 1,
    )
    # recompute forces for the next step (the reference's interactor loop)
    fev, aux = force_fn(state, aux)
    return state.replace(force=fev.force), aux


integ = Integrator(init=my_init, step=my_step)

st = make_state(lattice(n, L, "fcc"), seed=0)
nl = build_neighbor_list(st.pos, b, pot.max_cutoff, skin_multiplier=1.2)
st, nl, _ = run(integ, st, nl, 200, guard=True)

mean_path = float(st.extra["path_length"].mean())
print("my first integrator: 200 BD steps, <path length> =",
      round(mean_path, 3))
# diffusive sanity: each step contributes ~sqrt(6 M kT dt) of path
expect = 200 * float(jnp.sqrt(6.0 * mobility * temperature * dt))
assert 0.3 * expect < mean_path < 1.5 * expect, (mean_path, expect)
assert bool(jnp.all(jnp.isfinite(st.pos)))
print("OK")
