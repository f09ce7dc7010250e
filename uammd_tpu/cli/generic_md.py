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
  temperature T   friction g   viscosity eta   hydrodynamicRadius a
  dt X            numberSteps M    printSteps K    relaxSteps R
  epsilon e  sigma s  cutOff rc  shiftLJ 0|1      # LJ pair forces
  noPairForces
  bondFile path              # harmonic bonds: first line nbonds, then
                             # "i j k r0" per line (reference BondedForces
                             # file format, BondedForces.cuh:8-11)
  externalForce fx fy fz     # constant per-particle force (gravity-like)
  initialPositions fcc|sc|bcc|random
  outfile path    readFile path                   # xyz-like text I/O
  seed S

  integrator also accepts mcForceBiased (MALA; needs LJ energies).
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

        rows = np.loadtxt(inp.get("bondFile", str), skiprows=1, ndmin=2)
        blist = bonds(rows[:, :2].astype(np.int32),
                      k=rows[:, 2], r0=rows[:, 3])
        prev_fn = force_fn

        def force_fn(state, aux, _prev=prev_fn, _b=blist):
            fev, aux = _prev(state, aux)
            fev = fev + bonded_forces(harmonic, _b, state.pos, b,
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
