"""Measuring things: energies, temperature, RDF, S(k), MSD.

Mirrors reference basic_concepts/11-measuring_things.cu and
misc/hydroGridAnalysis: observables are computed either inside the scan
(via `run(observe=)`) or on recorded trajectories; the HydroGrid role
(structure factors) is played by `uammd_tpu.utils.observables`.
"""

import jax.numpy as jnp
import numpy as np

from uammd_tpu import Computables, box, make_state
from uammd_tpu.integrators.base import kinetic_energy, run, temperature
from uammd_tpu.integrators.verlet import nvt_gronbech_jensen
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    ensure_capacity,
    maybe_rebuild,
)
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice
from uammd_tpu.utils.observables import (
    mean_squared_displacement,
    radial_distribution,
    static_structure_factor,
)

n, rho, T = 500, 0.6, 2.0
L = (n / rho) ** (1 / 3)
b = box(L)
st = make_state(lattice(n, L, "fcc"), seed=3)
pot = lj(cutoff=2.5, shift=True)
nl = ensure_capacity(build_neighbor_list(st.pos, b, pot.max_cutoff,
                                         skin_multiplier=1.2), st.pos)


def force_fn(state, nbrs, computables=Computables(force=True)):
    nbrs = maybe_rebuild(nbrs, state.pos)
    return pair_forces(pot, state.pos, nbrs, computables=computables), nbrs


# in-scan observation: temperature + unwrapped positions every 25 steps
# (the reference computes energy via Interactor::sum({energy=true}))
def observe(state):
    return temperature(state), state.pos


integ = nvt_gronbech_jensen(force_fn, dt=0.005, temperature=T, friction=1.0)
st, nl, (Ts, traj) = run(integ, st, nl, 500, observe=observe,
                         observe_every=25)
print("T =", round(float(Ts[-1]), 3))

# potential energy + virial pressure at the final state
fev, _ = force_fn(st, nl, Computables(force=True, energy=True, virial=True))
U = float(fev.energy.sum())
P = rho * float(Ts[-1]) + float(fev.virial.sum()) / (3.0 * L**3)
print(f"U/N = {U / n:.3f}   P = {P:.3f}  (LJ rho=0.6 T=2: both O(1))")

# pair structure: g(r) and S(k)
r, gr = radial_distribution(st.pos, b, n_bins=64, r_max=L / 2)
k, sk = static_structure_factor(st.pos, b, n_max=6)
print("g(r) peak:", round(float(gr.max()), 2), "at r =",
      round(float(r[int(jnp.argmax(gr))]), 2), "(LJ first shell ~ 1.1)")
print("S(k) first point:", round(float(np.asarray(sk).ravel()[0]), 3))
assert 0.9 < float(r[int(jnp.argmax(gr))]) < 1.4

# dynamics: MSD over the recorded trajectory
msd = mean_squared_displacement(traj)
print("MSD[1:4] =", [round(float(m), 3) for m in msd[1:4]])
print("OK")
