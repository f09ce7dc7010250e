"""Your first Interactor — a custom force that plugs into any integrator.

Mirrors reference basic_concepts/13-your-first-interactor.cu: there, a
custom Interactor subclasses ``Interactor``, overrides
``sum(Computables, stream)`` (always SUMMING into the particle arrays),
throws on Computables it cannot satisfy, and reacts to
``updateSimulationTime`` to switch itself off after a while.

TPU-native translation: an interactor is any closure
``force_fn(state, aux) -> (ForceEnergyVirial, aux)``. Computables become
the fev fields you fill (leave ``virial=None`` if you cannot provide it);
"summing, never overwriting" is the ``+`` on ForceEnergyVirial pytrees
(combine_interactors); and time-dependence reads ``state.time`` directly —
no ParameterUpdatable plumbing needed, the state carries the clock.

The interaction itself is the reference example's: a constant +x force and
linear energy on particle 0, active only before a turn-off time. We then
add it to a stock Langevin integrator next to the LJ interactor, exactly
as the reference adds its custom Interactor to a BDHI integrator.
"""

import jax.numpy as jnp

from uammd_tpu import box, make_state
from uammd_tpu.core.types import ForceEnergyVirial
from uammd_tpu.integrators.verlet import (
    initialize_velocities,
    nvt_gronbech_jensen,
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
turn_off_time = 0.5
pull = 12.0


def my_interactor(state, aux):
    """Constant +x pull on particle 0 until ``turn_off_time``.

    The reference reads the clock via updateSimulationTime; here the state
    IS the clock. Returns force AND energy (E = -F.x for a constant
    force); a Computable we could not provide would simply stay None and
    combine_interactors would propagate the others.
    """
    active = (state.time < turn_off_time).astype(state.pos.dtype)
    f = jnp.zeros_like(state.pos)
    f = f.at[0, 0].set(pull * active)
    e = jnp.zeros(state.pos.shape[0], state.pos.dtype)
    e = e.at[0].set(-pull * active * state.pos[0, 0])
    return ForceEnergyVirial(force=f, energy=e), aux


# --- plug it into a stock integrator next to a stock interactor -----------
pot = lj(cutoff=2.5)


def force_fn(state, nbrs):
    nbrs = maybe_rebuild(nbrs, state.pos)
    fev = pair_forces(pot, state.pos, nbrs)
    mine, _ = my_interactor(state, None)
    return fev + mine, nbrs


integ = nvt_gronbech_jensen(force_fn, dt=0.002, temperature=0.5,
                            friction=1.0)

from uammd_tpu.integrators.base import run

st = make_state(lattice(n, L, "fcc"), seed=0)
st = initialize_velocities(st, 0.5)
nl = build_neighbor_list(st.pos, b, pot.max_cutoff, skin_multiplier=1.2)
st, nl = integ.init(st, nl)

x0 = float(st.pos[0, 0])
# phase 1: pull active (t: 0 -> 0.5); phase 2: pull off (t: 0.5 -> 0.8)
st, nl, _ = run(integ, st, nl, 250, initialize=False)
drift_on = float(st.pos[0, 0]) - x0
st, nl, _ = run(integ, st, nl, 150, initialize=False, guard=True)

print("pulled particle drifted", round(drift_on, 3),
      "while active; force off after t =", turn_off_time)
assert drift_on > 0.05, drift_on  # the pull visibly moved particle 0
assert bool(jnp.all(jnp.isfinite(st.pos)))
print("OK")
