"""Interacting particles: an LJ liquid with a Langevin thermostat.

Mirrors reference basic_concepts/8-interacting_particles.cu,
12-your-first-integrator.cu, 13-your-first-interactor.cu and misc/LJ.cu:
fcc start -> LJ pair forces through a Verlet-skin neighbour list ->
Gronbech-Jensen NVT -> equipartition check. The whole trajectory runs
inside one compiled `lax.scan` (the reference's per-step host loop,
generic_simulation.cu:582, dissolves into the program).
"""

from uammd_tpu import Computables, box, make_state
from uammd_tpu.integrators.base import run, temperature
from uammd_tpu.integrators.verlet import nvt_gronbech_jensen
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    ensure_capacity,
    maybe_rebuild,
)
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice

n, rho, T = 512, 0.5, 1.5
L = (n / rho) ** (1 / 3)
b = box(L)
st = make_state(lattice(n, L, "fcc"), seed=0)
pot = lj(cutoff=2.5)

# fixed-capacity [N, K] list + half-skin drift criterion (VerletList
# analog, VerletListBase.cuh:56-70); `ensure_capacity` regrows K outside
# jit, `maybe_rebuild` refreshes it inside the scan when drift demands
nl = ensure_capacity(build_neighbor_list(st.pos, b, pot.max_cutoff,
                                         skin_multiplier=1.2), st.pos)


def force_fn(state, nbrs):
    nbrs = maybe_rebuild(nbrs, state.pos)
    return pair_forces(pot, state.pos, nbrs,
                       computables=Computables(force=True)), nbrs


integ = nvt_gronbech_jensen(force_fn, dt=0.005, temperature=T, friction=1.0)
st, nl, Ts = run(integ, st, nl, 600, observe=temperature, observe_every=100)

print("T trajectory:", [round(float(t), 3) for t in Ts])
assert not bool(nl.overflow)
assert abs(float(Ts[-1]) - T) < 0.15 * T
print(f"OK: thermostat holds T ~ {T}")
