"""Custom interactions: your own radial potential and your own bond type.

Mirrors reference advanced/customPotentials.cu. The reference's Potential
concept (getCutOff + transverser factories) collapses to a small duck-typed
object: anything with `max_cutoff`, `cutoff2(ti, tj)`, `energy(r2, ti, tj)`
and `force_div_r(r2, ti, tj)` runs through `pair_forces` — and through the
grid-resident Pallas engine, which takes the same radial callbacks
(engine/pair_kernel.py g(r2)/e(r2) split).

Custom bonds are plain functions `(r, params, box) -> energy`; forces come
from autodiff (the reference writes analytic force+energy+virial by hand,
BondedForces.cuh:82).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu import Computables, box, make_state
from uammd_tpu.interactors.bonded import bonded_forces, bonds
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list, ensure_capacity
from uammd_tpu.utils.lattices import lattice


# --- a custom radial potential: Gaussian-core soft repulsion --------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianCore:
    epsilon: jax.Array
    width: jax.Array
    rc: float = dataclasses.field(metadata={"static": True})

    @property
    def max_cutoff(self):
        return self.rc

    def cutoff2(self, ti, tj):
        return jnp.asarray(self.rc * self.rc, self.epsilon.dtype)

    def energy(self, r2, ti, tj):
        return self.epsilon * jnp.exp(-r2 / (2.0 * self.width**2))

    def force_div_r(self, r2, ti, tj):
        # dE/dr / r  (negative gradient convention handled by pair_forces)
        return -self.epsilon / self.width**2 * jnp.exp(-r2 / (2.0 * self.width**2))


n, L = 256, 12.0
b = box(L)
pos0 = lattice(n, L, "fcc")
pos0 = pos0 + 0.1 * jax.random.normal(jax.random.key(1), pos0.shape)
st = make_state(pos0, seed=0)  # jittered: a perfect lattice has F = 0
pot = GaussianCore(epsilon=jnp.float32(2.0), width=jnp.float32(0.8), rc=3.0)
nl = ensure_capacity(build_neighbor_list(st.pos, b, pot.max_cutoff), st.pos)
fev = pair_forces(pot, st.pos, nl,
                  computables=Computables(force=True, energy=True))
print("Gaussian-core: U/N =", round(float(fev.energy.sum()) / n, 4),
      " |F|max =", round(float(jnp.abs(fev.force).max()), 4))

# consistency: force = -dU/dx by finite difference on particle 0
eps = 1e-2
for axis in range(1):
    dp = jnp.zeros_like(st.pos).at[0, axis].set(eps)
    e_plus = pair_forces(pot, st.pos + dp, nl,
                         computables=Computables(energy=True)).energy.sum()
    e_minus = pair_forces(pot, st.pos - dp, nl,
                          computables=Computables(energy=True)).energy.sum()
    f_fd = -(float(e_plus) - float(e_minus)) / (2 * eps)
    assert abs(f_fd - float(fev.force[0, axis])) < 2e-2 * max(1.0, abs(f_fd))
print("finite-difference force check OK")


# --- a custom bond type: quartic double-well ------------------------------
def double_well(r, params, box=None):
    """E(d) = k ((d - r0)^2 - w^2)^2 with d = |r1 - r0|; r is [M, 2, 3]."""
    d = jnp.linalg.norm(r[:, 1] - r[:, 0], axis=-1)
    x = (d - params["r0"]) ** 2 - params["w"] ** 2
    return params["k"] * x * x


blist = bonds(np.array([[0, 1], [2, 3]], np.int32),
              k=np.float32([1.0, 1.0]), r0=np.float32([1.0, 1.0]),
              w=np.float32([0.2, 0.2]))
fev_b = bonded_forces(double_well, blist, st.pos, b,
                      Computables(force=True, energy=True))
print("double-well bonds: E =", round(float(fev_b.energy.sum()), 4))
print("OK")
