"""generic_md: a data.main-driven simulation engine.

TPU-native analog of the reference generic_md example (reference:
examples/generic_md/generic_simulation.cu:398-620 — "the closest thing to a
CLI" in the reference, SURVEY 1 layer 8): reads an InputFile, assembles the
requested integrator + interactors, runs, and writes snapshots.

Usage:  python -m uammd_tpu.cli.generic_md data.main

Recognized options (a subset mirroring generic_simulation.cu's auto-generated
data.main; unknown options raise):

  boxSize Lx Ly Lz           numberParticles N
  integrator name            # verletNVE | verletNVT | brownian | dpd | sph
                             # | bdhiCholesky | bdhiLanczos | bdhiFCM | bdhiPSE
                             # | fib | icm | icmCompressible | dpstokes
                             # | bdhiQuasi2D | bdhiTrue2D | bdhiSaffman
                             # | mcForceBiased | mcAnderson
  temperature T   friction g   viscosity eta   hydrodynamicRadius a
  density rho                # icm/icmCompressible fluid density
  speedOfSound c             # icmCompressible equation of state p = c^2 rho
  wallMode slit|bottom|open  # dpstokes boundary configuration
  saffmanLength L            # bdhiSaffman membrane SD length
  dt X            numberSteps M    printSteps K    relaxSteps R
  epsilon e  sigma s  cutOff rc  shiftLJ 0|1      # LJ pair forces
  noPairForces
  bondFile path              # harmonic bonds: first line nbonds, then
                             # "i j k r0" per line (reference BondedForces
                             # file format, BondedForces.cuh:8-11)
  angularBondFile path       # "i j k K theta0" per line, central particle j
                             # (reference AngularBondedForces.cuh:8-17)
  torsionalBondFile path     # "i j k l K phi0" per line (reference
                             # TorsionalBondedForces.cuh:60-102)
  externalForce fx fy fz     # constant per-particle force (gravity-like)
  useElectrostatics          # triply periodic Poisson; Ewald split picked
  permittivity eps           # by the reference's heuristic (maxL/gw >= 128
  gaussianWidth gw           # -> split = 0.07/gw, generic_simulation.cu:479)
  chargeReadFile path        # one charge per line; default all +1
  initialPositions fcc|sc|bcc|random
  outfile path    readFile path                   # xyz-like text I/O
  seed S          triesPerCell t                  # mcAnderson

  mcForceBiased is MALA (needs LJ energies); mcAnderson is the
  checkerboard cell sweep with jump autotuned toward 50% acceptance.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..core import logging as log
from ..core.box import box
from ..core.state import make_state
from ..core.types import Computables, ForceEnergyVirial
from ..integrators import brownian, verlet
from ..integrators.base import run, temperature as measure_T
from ..interactors.pair import pair_forces
from ..neighbors.neighbor_list import build_neighbor_list, ensure_capacity, maybe_rebuild
from ..potentials.radial import lj
from ..utils.input_file import InputFile
from ..utils.lattices import lattice, random_positions


def build_simulation(inp: InputFile):
    n = inp.get("numberParticles", int)
    bs = inp.get("boxSize", float, float, float)
    b = box(list(bs))
    seed = inp.get("seed", int, default=1234)

    init = inp.get("initialPositions", str, default="fcc")
    if inp.has("readFile"):
        pos = np.loadtxt(inp.get("readFile", str))[:, :3]
    elif init == "random":
        pos = random_positions(n, bs, seed)
    else:
        pos = lattice(n, bs, init)
    st = make_state(pos, seed=seed)

    name = inp.get("integrator", str)
    force_fns = []
    pot = None
    if not inp.has("noPairForces"):
        pot = lj(
            epsilon=inp.get("epsilon", float, default=1.0),
            sigma=inp.get("sigma", float, default=1.0),
            cutoff=inp.get("cutOff", float, default=2.5),
            shift=bool(inp.get("shiftLJ", int, default=0)),
        )
        nl = ensure_capacity(
            build_neighbor_list(st.pos, b, pot.max_cutoff), st.pos
        )
        # MALA needs real energies in the Metropolis test (reference:
        # MonteCarlo/ForceBiased.cuh:24-36 sums energy through the same
        # interactors); everything else only needs forces.
        pair_comp = Computables(force=True, energy=(name == "mcForceBiased"))

        def pair_fn(state, nbrs):
            nbrs = maybe_rebuild(nbrs, state.pos)
            return pair_forces(pot, state.pos, nbrs,
                               computables=pair_comp), nbrs

        force_fn, aux = pair_fn, nl
    else:
        def force_fn(state, aux):
            return ForceEnergyVirial(force=jnp.zeros_like(state.pos)), aux

        aux = None

    # optional bonded forces from a reference-format bond file
    if inp.has("bondFile"):
        from ..interactors.bonded import bonded_forces, bonds, harmonic

        rows = np.loadtxt(inp.get("bondFile", str), skiprows=1,
                          ndmin=2).astype(st.dtype)
        blist = bonds(rows[:, :2].astype(np.int32),
                      k=rows[:, 2], r0=rows[:, 3])
        prev_fn = force_fn

        def force_fn(state, aux, _prev=prev_fn, _b=blist):
            fev, aux = _prev(state, aux)
            fev = fev + bonded_forces(harmonic, _b, state.pos, b,
                                      Computables(force=True, energy=True))
            return fev, aux

    if inp.has("angularBondFile"):
        from ..interactors.bonded import angular, bonded_forces, bonds

        rows = np.loadtxt(inp.get("angularBondFile", str), skiprows=1,
                          ndmin=2).astype(st.dtype)
        alist = bonds(rows[:, :3].astype(np.int32),
                      k=rows[:, 3], theta0=rows[:, 4])
        prev_ang = force_fn

        def force_fn(state, aux, _prev=prev_ang, _b=alist):
            fev, aux = _prev(state, aux)
            fev = fev + bonded_forces(angular, _b, state.pos, b,
                                      Computables(force=True, energy=True))
            return fev, aux

    if inp.has("torsionalBondFile"):
        from ..interactors.bonded import (
            bonded_forces, bonds, torsional_harmonic,
        )

        rows = np.loadtxt(inp.get("torsionalBondFile", str), skiprows=1,
                          ndmin=2).astype(st.dtype)
        tlist = bonds(rows[:, :4].astype(np.int32),
                      k=rows[:, 4], phi0=rows[:, 5])
        prev_tor = force_fn

        def force_fn(state, aux, _prev=prev_tor, _b=tlist):
            fev, aux = _prev(state, aux)
            fev = fev + bonded_forces(torsional_harmonic, _b, state.pos, b,
                                      Computables(force=True, energy=True))
            return fev, aux

    if inp.has("externalForce"):
        fext = jnp.asarray(
            list(inp.get("externalForce", float, float, float)), jnp.float32
        )
        prev_fn2 = force_fn

        def force_fn(state, aux, _prev=prev_fn2, _f=fext):
            fev, aux = _prev(state, aux)
            return fev + ForceEnergyVirial(
                force=jnp.broadcast_to(_f, state.pos.shape)
            ), aux

    if inp.has("useElectrostatics"):
        # reference: generic_simulation.cu:464-487 — one Poisson module,
        # Ewald splitting auto-selected by the system-size heuristic
        from ..electrostatics.poisson import Poisson, PoissonSplit

        eps = inp.get("permittivity", float, default=1.0)
        gw = inp.get("gaussianWidth", float)
        if inp.has("chargeReadFile"):
            charge = jnp.asarray(
                np.loadtxt(inp.get("chargeReadFile", str)).ravel()[:n],
                st.dtype,
            )
        else:
            charge = jnp.ones((n,), st.dtype)
        maxcells = max(bs) / gw
        if maxcells >= 128:
            elec = PoissonSplit.create(b, n, epsilon=eps, gw=gw,
                                       split=0.07 / gw)
        else:
            elec = Poisson.create(b, epsilon=eps, gw=gw)
        prev_el = force_fn

        def force_fn(state, aux, _prev=prev_el, _e=elec, _q=charge):
            fev, aux = _prev(state, aux)
            return fev + _e.sum(
                state.pos, _q, Computables(force=True, energy=True)
            ), aux

    dt = inp.get("dt", float)
    T = inp.get("temperature", float, default=0.0)
    if name == "verletNVE":
        integ = verlet.nve(force_fn, dt)
        if st.vel is None:
            st = verlet.initialize_velocities(st, max(T, 1e-6))
    elif name == "verletNVT":
        integ = verlet.nvt_gronbech_jensen(
            force_fn, dt, T, inp.get("friction", float, default=1.0)
        )
    elif name == "brownian":
        integ = brownian.euler_maruyama(
            force_fn, dt, T,
            viscosity=inp.get("viscosity", float, default=1.0),
            hydrodynamic_radius=inp.get("hydrodynamicRadius", float, default=1.0),
        )
    elif name == "dpd":
        from ..potentials.dpd import DPD, make_dpd_force_fn

        params = DPD(
            cutoff=inp.get("cutOff", float, default=1.0),
            A=inp.get("epsilon", float, default=25.0),
            gamma=inp.get("friction", float, default=4.0),
            temperature=T, dt=dt,
        )
        nl = build_neighbor_list(st.pos, b, params.cutoff)
        force_fn, aux = make_dpd_force_fn(params), nl
        integ = verlet.nve(force_fn, dt)
        st = verlet.initialize_velocities(st, max(T, 1e-6))
    elif name == "sph":
        from ..interactors.sph import SPHParams, make_sph_force_fn

        params = SPHParams(support=inp.get("sigma", float, default=1.0))
        nl = build_neighbor_list(st.pos, b, params.max_cutoff)
        force_fn, aux = make_sph_force_fn(params), nl
        integ = verlet.nve(force_fn, dt)
    elif name in ("bdhiCholesky", "bdhiLanczos", "bdhiFCM", "bdhiPSE"):
        from ..integrators.bdhi.euler_maruyama import (
            CholeskyBDHI, LanczosBDHI, bdhi_euler_maruyama,
        )

        eta = inp.get("viscosity", float, default=1.0)
        a = inp.get("hydrodynamicRadius", float, default=1.0)
        if name == "bdhiCholesky":
            backend = CholeskyBDHI(viscosity=eta, radius=a, box=b)
        elif name == "bdhiLanczos":
            backend = LanczosBDHI(viscosity=eta, radius=a, box=b)
        elif name == "bdhiFCM":
            from ..integrators.bdhi.fcm import FCM

            backend = FCM.create(b, viscosity=eta, radius=a)
        else:
            from ..integrators.bdhi.pse import PSE

            backend = PSE.create(b, viscosity=eta, radius=a)
        integ = bdhi_euler_maruyama(force_fn, backend, dt, T)
    elif name in ("fib", "bdhiFIB"):
        # reference: generic_simulation.cu:372-382 (FIB from data.main)
        from ..core.grid import next_fft_size
        from ..integrators.bdhi.fib import FIB, Peskin3pt, fib_integrator

        a = inp.get("hydrodynamicRadius", float, default=1.0)
        h = a / 0.91  # rh ~ 0.91 h for the Peskin 3pt kernel (FIB.cuh:33)
        cells = tuple(next_fft_size(max(8, round(L / h))) for L in bs)
        fib = FIB.create(
            b, cells, viscosity=inp.get("viscosity", float, default=1.0),
            temperature=T, dt=dt, kernel=Peskin3pt(),
        )
        integ = fib_integrator(force_fn, fib)
    elif name == "icm":
        # reference: generic_simulation.cu:385-393 (ICM from data.main)
        from ..core.grid import next_fft_size
        from ..integrators.hydro.icm import ICM, icm_integrator

        a = inp.get("hydrodynamicRadius", float, default=1.0)
        h = a / 0.91
        cells = tuple(next_fft_size(max(8, round(L / h))) for L in bs)
        icm = ICM.create(
            b, cells, viscosity=inp.get("viscosity", float, default=1.0),
            density=inp.get("density", float, default=1.0),
            temperature=T, dt=dt,
        )
        integ = icm_integrator(force_fn, icm)
    elif name == "icmCompressible":
        # reference: Hydro/ICM_Compressible.cuh:183 (RK3 MAC fluid +
        # midpoint Peskin-3pt particle coupling)
        from ..core.grid import next_fft_size
        from ..integrators.hydro.icm_compressible import (
            ICMCompressible,
            icm_compressible_integrator,
        )

        a = inp.get("hydrodynamicRadius", float, default=1.0)
        h = a / 0.91
        cells = tuple(next_fft_size(max(8, round(L / h))) for L in bs)
        icmc = ICMCompressible.create(
            b, cells,
            shear_viscosity=inp.get("viscosity", float, default=1.0),
            density=inp.get("density", float, default=1.0),
            speed_of_sound=inp.get("speedOfSound", float, default=4.0),
            temperature=T, dt=dt,
        )
        integ = icm_compressible_integrator(force_fn, icmc)
    elif name in ("bdhiQuasi2D", "bdhiTrue2D", "bdhiSaffman"):
        # reference: Hydro/BDHI_quasi2D.cuh:92-173 kernel selection
        from ..integrators.bdhi.quasi2d import (
            BDHI2D,
            Quasi2D,
            Saffman,
            True2D,
            bdhi2d_euler_maruyama,
        )

        if name == "bdhiTrue2D":
            kern = True2D()
        elif name == "bdhiSaffman":
            kern = Saffman(
                saffman_length=inp.get("saffmanLength", float, default=10.0)
            )
        else:
            kern = Quasi2D()
        solver = BDHI2D.create(
            b, kernel=kern,
            viscosity=inp.get("viscosity", float, default=1.0),
            radius=inp.get("hydrodynamicRadius", float, default=1.0),
        )
        integ = bdhi2d_euler_maruyama(force_fn, solver, dt, T)
    elif name == "dpstokes":
        # reference: BDHI/DoublyPeriodic/DPStokesSlab.cuh:424
        # (DPStokesIntegrator: EM over the slab mobility + Lanczos noise)
        from ..integrators.bdhi.dpstokes import DPStokes, dpstokes_em

        dps = DPStokes.create(
            b, viscosity=inp.get("viscosity", float, default=1.0),
            radius=inp.get("hydrodynamicRadius", float, default=1.0),
            mode=inp.get("wallMode", str, default="slit"),
        )
        integ = dpstokes_em(force_fn, dps, dt, T)
    elif name == "mcAnderson":
        import dataclasses as _dc

        from ..integrators.base import Integrator
        from ..integrators.mc import AndersonMC

        if pot is None:
            log.critical("mcAnderson needs pair forces (drop noPairForces)")
        mc = AndersonMC.create(
            b, pot, T, st.n,
            tries_per_cell=inp.get("triesPerCell", int, default=4),
        )
        # tune the jump toward 50% acceptance before production
        # (reference: MonteCarlo/NVT/Anderson.cuh:55-57)
        st, jump, _ = mc.sweep_autotune(st, 20)
        mc = _dc.replace(mc, jump_size=float(jump))

        def mc_step(state, mc_aux, _mc=mc):
            return _mc.sweep(state, 1), mc_aux

        integ = Integrator(init=lambda state, mc_aux: (state, mc_aux),
                           step=mc_step)
    elif name == "mcForceBiased":
        from ..integrators.mc import force_biased

        base_fn = force_fn

        def energy_force_fn(state, aux):
            fev, aux = base_fn(state, aux)
            if fev.energy is None:
                raise ValueError(
                    "mcForceBiased requires an energy-capable force path"
                )
            en = jnp.sum(fev.energy)
            return en, fev.force, aux

        integ = force_biased(
            energy_force_fn, dt, T,
            viscosity=inp.get("viscosity", float, default=1.0),
        )
    else:
        log.critical("unknown integrator '%s'", name)
    return st, aux, integ, b


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    inp = InputFile(argv[0])
    st, aux, integ, b = build_simulation(inp)
    n_steps = inp.get("numberSteps", int)
    relax = inp.get("relaxSteps", int, default=0)
    print_every = inp.get("printSteps", int, default=0)
    outfile = inp.get("outfile", str, default=None)

    timer = log.Timer()
    st, aux = integ.init(st, aux)
    if relax:
        st, aux, _ = run(integ, st, aux, relax, initialize=False)
    frames = []
    if print_every and n_steps >= print_every:
        st, aux, obs = run(
            integ, st, aux, n_steps,
            observe=lambda s: s.pos, observe_every=print_every,
            initialize=False,
        )
        frames = np.asarray(jax.device_get(obs))
    else:
        st, aux, _ = run(integ, st, aux, n_steps, initialize=False)
    elapsed = timer.toc()
    log.message(
        "ran %d steps of %d particles in %.2f s (%.3g particle-steps/s)",
        n_steps, st.n, elapsed, n_steps * st.n / elapsed,
    )
    if outfile and len(frames):
        from ..utils.trajectory import write_frame

        # native fastio path when a compiler is available (C frame
        # formatting + single fwrite), numpy fallback otherwise
        open(outfile, "wb").close()
        for f in frames:
            write_frame(outfile, f, box=b, append=True)
        log.message("wrote %d frames to %s", len(frames), outfile)
    log.message("final T = %.4f", float(jax.device_get(measure_T(st))))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
