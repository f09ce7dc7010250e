"""Multiple species: per-type-pair LJ parameter tables.

Mirrors reference misc/LJMultipleTypes.cu (Potential::LJ with
`setPotParameters(i, j, {epsilon, sigma, rc})`): here the [T, T] tables
are passed directly to `lj(...)` and looked up per pair inside the kernel
(reference: Potential/ParameterHandler.cuh). A binary soft/hard mixture
demixes its energies exactly as the tables say.
"""

import jax.numpy as jnp
import numpy as np

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

n, rho, T = 512, 0.4, 1.5
L = (n / rho) ** (1 / 3)
b = box(L)

# species 0 (A) and 1 (B): AA strongly attractive, BB weak, AB in between
epsilon = np.array([[2.0, 0.5],
                    [0.5, 0.2]], np.float32)
sigma = np.array([[1.0, 1.05],
                  [1.05, 1.1]], np.float32)
cutoff = 2.5 * sigma
pot = lj(epsilon=epsilon, sigma=sigma, cutoff=cutoff, shift=True)

pos = lattice(n, L, "fcc")
types = (np.arange(n) % 2).astype(np.int32)  # alternating A/B
st = make_state(pos, seed=0).replace(type_id=jnp.asarray(types))
nl = ensure_capacity(build_neighbor_list(st.pos, b, pot.max_cutoff,
                                         skin_multiplier=1.2), st.pos)


def force_fn(state, nbrs, computables=Computables(force=True)):
    nbrs = maybe_rebuild(nbrs, state.pos)
    return pair_forces(pot, state.pos, nbrs, computables=computables,
                       type_id=state.type_id), nbrs


integ = nvt_gronbech_jensen(force_fn, dt=0.004, temperature=T, friction=1.0)
st, nl, _ = run(integ, st, nl, 400)
print("T =", round(float(temperature(st)), 3), " overflow =", bool(nl.overflow))

# per-species potential energies: the A-rich environment must be deeper
fev, _ = force_fn(st, nl, Computables(energy=True))
eA = float(fev.energy[types == 0].mean())
eB = float(fev.energy[types == 1].mean())
print(f"per-particle energy: A = {eA:.3f}, B = {eB:.3f}")
assert eA < eB, "A (eps_AA = 2.0) must sit deeper than B (eps_BB = 0.2)"
print("OK: parameter tables differentiate the species")
