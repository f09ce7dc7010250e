"""A tour of every integrator family, in one file.

Mirrors reference examples/integration_schemes/{integrators.cu, icm.cu,
others/{BDHI,FCM,MCNVT,SPH_test,q2D}.cu}: the same tiny LJ/WCA system is
pushed through MD, Langevin, Brownian, DPD, SPH, BDHI (dense / matrix-free
/ spectral), quasi-2D, fluctuating hydrodynamics (FIB, ICM, compressible
ICM), lattice-Boltzmann, and both Monte Carlo samplers. Run on CPU in a
couple of minutes; every section is independent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu import Computables, box, make_state
from uammd_tpu.integrators.base import run, temperature
from uammd_tpu.utils.lattices import lattice


def fresh(n=128, rho=0.3, seed=0):
    L = (n / rho) ** (1 / 3)
    b = box(L)
    return b, L, make_state(lattice(n, L, "fcc"), seed=seed)


def lj_setup(b, st, cutoff=2.5, computables=Computables(force=True)):
    from uammd_tpu.interactors.pair import pair_forces
    from uammd_tpu.neighbors.neighbor_list import (
        build_neighbor_list, ensure_capacity, maybe_rebuild,
    )
    from uammd_tpu.potentials.radial import lj

    pot = lj(cutoff=cutoff, shift=True)
    nl = ensure_capacity(
        build_neighbor_list(st.pos, b, pot.max_cutoff, skin_multiplier=1.2),
        st.pos)

    def force_fn(state, nbrs, c=computables):
        nbrs = maybe_rebuild(nbrs, state.pos)
        return pair_forces(pot, state.pos, nbrs, computables=c), nbrs

    return pot, nl, force_fn


def check(name, st):
    assert bool(jnp.all(jnp.isfinite(st.pos))), name
    print(f"{name:28s} OK   (T = {float(temperature(st)):.3f})")


# --- MD: velocity Verlet NVE + two Langevin thermostats -------------------
from uammd_tpu.integrators.verlet import (  # noqa: E402
    initialize_velocities, nve, nvt_basic, nvt_gronbech_jensen,
)

b, L, st = fresh()
_, nl, force_fn = lj_setup(b, st)
st = initialize_velocities(st, 1.0)
s, nl, _ = run(nve(force_fn, dt=0.002), st, nl, 100)
check("VerletNVE", s)
s, nl, _ = run(nvt_basic(force_fn, dt=0.002, temperature=1.0, friction=1.0),
               st, nl, 100)
check("VerletNVT (basic)", s)
s, nl, _ = run(nvt_gronbech_jensen(force_fn, dt=0.002, temperature=1.0,
                                   friction=1.0), st, nl, 100)
check("VerletNVT (Gronbech-J)", s)

# --- Brownian dynamics: the four schemes ----------------------------------
from uammd_tpu.integrators import brownian  # noqa: E402

for name, mk in [("BD EulerMaruyama", brownian.euler_maruyama),
                 ("BD MidPoint", brownian.midpoint),
                 ("BD AdamsBashforth", brownian.adams_bashforth),
                 ("BD Leimkuhler", brownian.leimkuhler)]:
    b, L, st = fresh()
    _, nl, force_fn = lj_setup(b, st)
    integ = mk(force_fn, dt=0.001, temperature=1.0, viscosity=1.0,
               hydrodynamic_radius=0.5)
    s, nl, _ = run(integ, st, nl, 100)
    check(name, s)

# --- DPD (reference: runs under VerletNVE, Potential/DPD.cuh) --------------
from uammd_tpu.potentials.dpd import DPD, make_dpd_force_fn  # noqa: E402

b, L, st = fresh()
st = initialize_velocities(st, 1.0)
params = DPD(cutoff=1.0, A=25.0, gamma=4.0, temperature=1.0, dt=0.01)
from uammd_tpu.neighbors.neighbor_list import (  # noqa: E402
    build_neighbor_list, ensure_capacity,
)

nl = ensure_capacity(build_neighbor_list(st.pos, b, 1.0, skin_multiplier=1.3),
                     st.pos)
s, nl, _ = run(nve(make_dpd_force_fn(params), dt=0.01), st, nl, 100)
check("DPD (VerletNVE)", s)

# --- SPH -------------------------------------------------------------------
from uammd_tpu.interactors.sph import SPHParams, make_sph_force_fn  # noqa: E402

b, L, st = fresh(rho=0.3)
sph = SPHParams(support=1.2, viscosity=10.0, gas_stiffness=30.0,
                rest_density=0.3)
nl = ensure_capacity(
    build_neighbor_list(st.pos, b, sph.max_cutoff, skin_multiplier=1.2),
    st.pos)
st = initialize_velocities(st, 0.1)
s, nl, _ = run(nve(make_sph_force_fn(sph), dt=0.002), st, nl, 50)
check("SPH (VerletNVE)", s)

# --- BDHI: dense Cholesky, matrix-free Lanczos, spectral FCM ---------------
from uammd_tpu.integrators.bdhi.euler_maruyama import (  # noqa: E402
    CholeskyBDHI, LanczosBDHI, bdhi_euler_maruyama, fcm_em,
)
from uammd_tpu.integrators.bdhi.fcm import FCM  # noqa: E402

b, L, st = fresh(n=64, rho=0.1)
_, nl, force_fn = lj_setup(b, st)
for name, backend in [
    ("BDHI Cholesky", CholeskyBDHI(viscosity=1.0, radius=0.5, box=b)),
    ("BDHI Lanczos", LanczosBDHI(viscosity=1.0, radius=0.5, box=b,
                                 iterations=12)),
]:
    integ = bdhi_euler_maruyama(force_fn, backend, dt=0.001, temperature=1.0)
    s, nl, _ = run(integ, st, nl, 20)
    check(name, s)

fcm = FCM.create(b, viscosity=1.0, radius=0.5, points_per_radius=1.5)
s, nl, _ = run(fcm_em(force_fn, fcm, dt=0.001, temperature=1.0), st, nl, 20)
check("BDHI FCM (fused EM)", s)

# --- quasi-2D hydrodynamics (reference: others/q2D.cu) ----------------------
from uammd_tpu.integrators.bdhi.quasi2d import (  # noqa: E402
    BDHI2D, Quasi2D, bdhi2d_euler_maruyama,
)

b2 = box([32.0, 32.0, float("inf")], periodic=(True, True, False))
pos2 = lattice(64, 32.0, "sq")
st2 = make_state(pos2, seed=1)
q2d = BDHI2D.create(b2, kernel=Quasi2D(), viscosity=1.0, radius=1.0,
                    points_per_radius=1.0)


def no_force(state, aux):
    from uammd_tpu import ForceEnergyVirial
    return ForceEnergyVirial(force=jnp.zeros_like(state.pos)), aux


s, _, _ = run(bdhi2d_euler_maruyama(no_force, q2d, dt=0.01, temperature=1.0),
              st2, None, 50)
check("BDHI quasi2D", s)

# --- fluctuating hydrodynamics: FIB, ICM, compressible ICM -----------------
from uammd_tpu.integrators.bdhi.fib import FIB, fib_integrator  # noqa: E402
from uammd_tpu.integrators.hydro.icm import ICM, icm_integrator  # noqa: E402
from uammd_tpu.integrators.hydro.icm_compressible import (  # noqa: E402
    ICMCompressible, icm_compressible_integrator,
)

b, L, st = fresh(n=64, rho=0.2)
_, nl, force_fn = lj_setup(b, st)
fib = FIB.create(b, 16, viscosity=1.0, temperature=1.0, dt=0.005)
s, nl, _ = run(fib_integrator(force_fn, fib), st, nl, 20)
check("FIB", s)

icm = ICM.create(b, 16, viscosity=1.0, density=1.0, temperature=1.0,
                 dt=0.005)
s, _, _ = run(icm_integrator(force_fn, icm), st, nl, 20)
check("ICM (incompressible)", s)

# grid fluctuations scale as rho kT / (c^2 dV): keep dV moderate
icmc = ICMCompressible.create(b, 8, shear_viscosity=1.0, density=1.0,
                              temperature=0.2, dt=0.002)
s, _, _ = run(icm_compressible_integrator(force_fn, icmc), st, nl, 20)
check("ICM (compressible)", s)

# --- lattice Boltzmann (reference: Hydro/LBM.cuh, WIP there) ----------------
from uammd_tpu.integrators.hydro.lbm import D3Q19  # noqa: E402

lbm = D3Q19(shape=(16, 16, 16), tau=0.9)
fs = lbm.init_state(rho0=1.0)
body_force = jnp.zeros((16, 16, 16, 3)).at[..., 0].set(1e-4)
step = jax.jit(lambda f: lbm.step(f, body_force=body_force))
for _ in range(20):
    fs = step(fs)
rho, u = lbm.moments(fs.f)
assert bool(jnp.all(jnp.isfinite(u)))
print(f"{'LBM D3Q19':28s} OK   (mean ux = {float(u[..., 0].mean()):.2e})")

# --- Monte Carlo: MALA (ForceBiased) + Anderson checkerboard ---------------
from uammd_tpu.integrators.mc import AndersonMC, force_biased  # noqa: E402

b, L, st = fresh()
pot, nl, _ = lj_setup(b, st)
from uammd_tpu.interactors.pair import pair_forces  # noqa: E402
from uammd_tpu.neighbors.neighbor_list import maybe_rebuild  # noqa: E402


def energy_force_fn(state, nbrs):
    nbrs = maybe_rebuild(nbrs, state.pos)
    fev = pair_forces(pot, state.pos, nbrs,
                      computables=Computables(force=True, energy=True))
    return fev.energy.sum(), fev.force, nbrs


s, _, _ = run(force_biased(energy_force_fn, dt=0.01, temperature=1.0),
              st, nl, 50)
check("MC ForceBiased (MALA)", s)

mc = AndersonMC.create(b, pot, temperature=1.0, n=st.n, tries_per_cell=2)
s = mc.sweep(st, 5)
assert bool(jnp.all(jnp.isfinite(s.pos)))
print(f"{'MC Anderson':28s} OK")

print("\nall integrator families ran")
