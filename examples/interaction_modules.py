"""A tour of the interaction modules.

Mirrors reference examples/interaction_modules/{Bonds.cu, external.cu,
Poisson.cu, DoublyPeriodicPoisson.cu} plus the Deserno membrane
(misc/Deserno): every bond type, external potentials, triply periodic
spectral electrostatics (both no-split and Ewald-split modes) and the
doubly periodic slab solver.
"""

import jax.numpy as jnp
import numpy as np

from uammd_tpu import Computables, box, make_state
from uammd_tpu.utils.lattices import lattice

C = Computables(force=True, energy=True)

# --- bonded forces: pair/angle/dihedral/fixed-point ------------------------
from uammd_tpu.interactors.bonded import (  # noqa: E402
    angular, bonded_forces, bonds, fene, harmonic, harmonic_fixed_point,
    torsional_fourier, torsional_harmonic,
)

b = box(20.0)
pos = jnp.asarray(
    [[0.0, 0, 0], [1.1, 0, 0], [2.0, 0.8, 0], [2.5, 0.8, 1.0]], jnp.float32)
st = make_state(pos, seed=0)

pair2 = bonds(np.array([[0, 1], [1, 2]], np.int32),
              k=np.float32([10.0, 10.0]), r0=np.float32([1.0, 1.0]))
print("harmonic:", float(bonded_forces(harmonic, pair2, st.pos, b, C)
                         .energy.sum()))
fene_b = bonds(np.array([[0, 1]], np.int32), k=np.float32([30.0]),
               r0=np.float32([1.5]))
print("FENE:", float(bonded_forces(fene, fene_b, st.pos, b, C).energy.sum()))
ang = bonds(np.array([[0, 1, 2]], np.int32), k=np.float32([5.0]),
            theta0=np.float32([np.pi * 2 / 3]))
print("angular:", float(bonded_forces(angular, ang, st.pos, b, C)
                        .energy.sum()))
tor = bonds(np.array([[0, 1, 2, 3]], np.int32), k=np.float32([2.0]),
            phi0=np.float32([0.0]))
print("torsional (harmonic):",
      float(bonded_forces(torsional_harmonic, tor, st.pos, b, C)
            .energy.sum()))
tor4 = bonds(np.array([[0, 1, 2, 3]], np.int32), k=np.float32([2.0]),
             phi0=np.float32([0.0]))
print("torsional (Fourier):",
      float(bonded_forces(torsional_fourier, tor4, st.pos, b, C)
            .energy.sum()))
anchor = bonds(np.array([[0]], np.int32), k=np.float32([4.0]),
               r0=np.float32([0.0]),
               point=np.float32([[0.0, 0.0, 2.0]]))
print("fixed-point:",
      float(bonded_forces(harmonic_fixed_point, anchor, st.pos, b, C)
            .energy.sum()))

# --- triply periodic Poisson: no-split vs Ewald-split must agree -----------
from uammd_tpu.electrostatics.poisson import Poisson, PoissonSplit  # noqa: E402

n, L, gw = 32, 12.0, 0.4
b3 = box(L)
rng = np.random.default_rng(0)
qpos = jnp.asarray(rng.uniform(-L / 2, L / 2, (n, 3)), jnp.float32)
charge = jnp.asarray(np.where(np.arange(n) % 2 == 0, 1.0, -1.0), jnp.float32)

psolv = Poisson.create(b3, epsilon=1.0, gw=gw)
fev_ns = psolv.sum(qpos, charge, C)
psplit = PoissonSplit.create(b3, n, epsilon=1.0, gw=gw, split=0.25)
fev_sp = psplit.sum(qpos, charge, C)
e_ns, e_sp = float(fev_ns.energy.sum()), float(fev_sp.energy.sum())
print(f"Poisson energy: no-split {e_ns:.5f}  Ewald-split {e_sp:.5f}")
assert abs(e_ns - e_sp) < 2e-2 * max(1.0, abs(e_ns)), "split invariance"

# --- doubly periodic slab (DPPoissonSlab): dielectric mismatch -------------
from uammd_tpu.electrostatics.dpslab import DPPoissonSlab  # noqa: E402

H = 6.0
bslab = box([10.0, 10.0, H], periodic=(True, True, False))
slab = DPPoissonSlab.create(bslab, epsilon=1.0, gw=0.5,
                            eps_top=0.05, eps_bottom=1.0)
zq = jnp.asarray([[0.0, 0.0, 1.0], [1.5, 0.0, -1.0]], jnp.float32)
qq = jnp.asarray([1.0, -1.0], jnp.float32)
fev_slab = slab.sum(zq, qq, C)
print("DP slab: E =", round(float(fev_slab.energy.sum()), 5),
      " Fz[0] =", round(float(fev_slab.force[0, 2]), 5))
# a charge near the low-permittivity top wall is pushed away (image charge)
assert jnp.all(jnp.isfinite(fev_slab.force))

# --- Deserno coarse-grained membrane ---------------------------------------
from uammd_tpu.interactors.deserno import (  # noqa: E402
    DesernoParams, build_bilayer, deserno_forces,
)

from uammd_tpu.neighbors.neighbor_list import (  # noqa: E402
    build_neighbor_list, ensure_capacity,
)

params = DesernoParams()
mem_pos, mem_types, lipid_bonds, straight, Lmem = build_bilayer(6, params)
bm = box([Lmem, Lmem, 6 * Lmem])
stm = make_state(mem_pos, type_id=mem_types, seed=1)
nlm = ensure_capacity(
    build_neighbor_list(stm.pos, bm, params.max_cutoff), stm.pos)
fev_m = deserno_forces(stm.pos, stm.type_id, lipid_bonds, straight, params,
                       nlm, box=bm, computables=C)
print("Deserno bilayer:", mem_pos.shape[0], "beads, E =",
      round(float(fev_m.energy.sum()), 3))
print("OK: all interaction modules ran")
