"""Moving particles: Brownian dynamics under external potentials.

Mirrors reference basic_concepts/7-moving_particles.cu and
interaction_modules/external.cu: an ideal gas of Brownian walkers in
gravity plus a harmonic trap, integrated with the Euler-Maruyama scheme
(reference BrownianDynamics.cuh:111) entirely inside one `lax.scan`.
Forces come from the energy by autodiff — the reference writes both by
hand (ExternalForces.cuh:20-40).
"""

import jax.numpy as jnp

from uammd_tpu import Computables, box, make_state
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.brownian import euler_maruyama
from uammd_tpu.interactors.external import external_forces, gravity, harmonic_trap
from uammd_tpu.utils.lattices import lattice

n, L, T = 1024, 32.0, 1.0
b = box(L)
st = make_state(lattice(n, L, "sc"), seed=7)

grav_energy, _ = gravity(g=(0.0, 0.0, -1.0))
trap_energy, _ = harmonic_trap(k=0.2)


def energy_fn(pos, state):
    return grav_energy(pos, state) + trap_energy(pos, state)


def force_fn(state, aux):
    fev = external_forces(state, energy_fn=energy_fn,
                          computables=Computables(force=True))
    return fev, aux


integ = euler_maruyama(force_fn, dt=0.05, temperature=T,
                       viscosity=1.0, hydrodynamic_radius=1.0)
st, _, zs = run(integ, st, None, 8000,
                observe=lambda s: jnp.mean(s.pos[:, 2]), observe_every=400)

# the trap+gravity equilibrium is a Gaussian displaced by F_g/k = -5
print("mean z trajectory:", [round(float(z), 2) for z in zs])
assert abs(float(zs[-1]) - (-5.0)) < 1.0
print("OK: settled at the gravity/trap balance point")
