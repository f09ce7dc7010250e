"""Basics: state, box, precision, groups.

Mirrors reference basic_concepts/1-system.cu ... 6-particle_data2.cu:
what UAMMD spreads over System/ParticleData/ParticleGroup is here a
functional `SimState` pytree plus plain helper functions — there is no
global runtime object to initialize or tear down (JAX owns the device).
"""

import jax.numpy as jnp

from uammd_tpu import box, make_state
from uammd_tpu.core import groups
from uammd_tpu.utils.lattices import lattice

# --- a periodic box (per-axis periodicity, like Box.cuh:32-40) ----------
b = box([16.0, 16.0, 16.0])
print("box:", b.size, "periodic:", b.periodic)

# --- particles: SoA pytree with lazy (None) optional fields -------------
n = 512
pos = lattice(n, 16.0, "fcc")           # InitialConditions analog
st = make_state(pos, seed=1234)          # pos + ids + RNG key
print("state: n =", st.n, "dtype =", st.dtype, "vel is", st.vel)

# properties appear when a module needs them (ParticleData lazy alloc):
st = st.replace(vel=jnp.zeros_like(st.pos))
print("after replace: vel shape", st.vel.shape)

# species ids live in `type_id` (reference packs them in pos.w)
st = st.replace(type_id=(st.get_id() % 2).astype(jnp.int32))

# --- groups are boolean masks (ParticleGroup + selectors) ----------------
half = groups.id_range(st, 0, n // 2)
type1 = groups.by_type(st, 1)
left = groups.domain(st, b, lo=(-8.0, -8.0, -8.0), hi=(0.0, 8.0, 8.0))
print("group sizes:", int(half.sum()), int(type1.sum()), int(left.sum()))

# minimum-image displacement (Box::apply_pbc)
dr = b.wrap(st.pos[1] - st.pos[0])
print("min-image |dr01| =", float(jnp.linalg.norm(dr)))
