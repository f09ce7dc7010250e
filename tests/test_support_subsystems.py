"""Tests for the support subsystems round 1 left unverified: checkpoint
round-trips (incl. RNG), particle groups driving a masked integration,
observables sanity, the Deserno membrane, logging, and the generic_md CLI
driver (reference: utils/checkpoint.h, ParticleData/ParticleGroup.cuh,
utils/HydroGrid.cuh, misc/Deserno.cuh, System/Log.h,
examples/generic_md/generic_simulation.cu)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core import groups
from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.utils import checkpoint, observables
from uammd_tpu.utils.lattices import lattice


# ------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(0)
    st = make_state(rng.normal(size=(50, 3)), seed=7)
    st = st.replace(
        vel=jnp.asarray(rng.normal(size=(50, 3))),
        charge=jnp.asarray(rng.normal(size=50)),
    )
    st, _ = __import__(
        "uammd_tpu.core.state", fromlist=["next_key"]
    ).next_key(st)  # advance RNG so the key is nontrivial
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, st)
    st2 = checkpoint.load(p)
    np.testing.assert_array_equal(np.asarray(st2.pos), np.asarray(st.pos))
    np.testing.assert_array_equal(np.asarray(st2.vel), np.asarray(st.vel))
    np.testing.assert_array_equal(np.asarray(st2.charge),
                                  np.asarray(st.charge))
    # the PRNG state survives: both produce the same next key
    from uammd_tpu.core.state import next_key
    _, k1 = next_key(st)
    _, k2 = next_key(st2)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k1)), np.asarray(jax.random.key_data(k2))
    )


def test_checkpoint_text_reference_format(tmp_path):
    """save_text emits the reference block format and load_text reads it
    back (checkpoint.h:29-78)."""
    rng = np.random.default_rng(1)
    st = make_state(rng.normal(size=(20, 3)), seed=0)
    st = st.replace(vel=jnp.asarray(rng.normal(size=(20, 3))))
    p = str(tmp_path / "ck.dat")
    checkpoint.save_text(p, st)
    txt = open(p).read().splitlines()
    assert txt[0].startswith("# version")
    assert txt[1] == "# 20"
    assert "# Pos" in txt and "# Vel" in txt
    st2 = checkpoint.load_text(p)
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(st.pos),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.vel), np.asarray(st.vel),
                               rtol=1e-6)


# ----------------------------------------------------------------- groups
def test_groups_selectors_and_masked_integration():
    n, L = 128, 16.0
    b = box(L)
    pos = lattice(n, L, "sc")
    st = make_state(pos, seed=0)
    assert int(groups.all_particles(st).sum()) == n
    assert int(groups.none(st).sum()) == 0
    assert int(groups.id_range(st, 10, 20).sum()) == 11  # inclusive ends
    assert int(groups.id_list(st, [1, 5, 9]).sum()) == 3
    dom = groups.domain(st, b, [-L / 2, -L / 2, -L / 2], [0.0, L / 2, L / 2])
    assert 0 < int(dom.sum()) < n

    # masked integration: only the selected half moves (the reference's
    # ParticleGroup-restricted integrator idiom, ParticleGroup.cuh:166)
    from uammd_tpu.core.types import ForceEnergyVirial
    from uammd_tpu.integrators.brownian import euler_maruyama

    mask = groups.id_range(st, 0, n // 2 - 1)
    integ = euler_maruyama(
        lambda s, aux: (ForceEnergyVirial(force=jnp.zeros_like(s.pos)), aux),
        dt=0.1, temperature=1.0, viscosity=1.0,
    )
    st1, _ = integ.init(st, None)
    st2, _ = integ.step(st1, None)
    st3 = groups.apply_masked(st2, st1, mask)
    moved = np.abs(np.asarray(st3.pos - st1.pos)).sum(axis=1)
    assert (moved[: n // 2] > 0).all()
    assert (moved[n // 2:] == 0).all()


# ------------------------------------------------------------ observables
def test_rdf_of_ideal_gas_is_flat():
    rng = np.random.default_rng(3)
    L, n = 12.0, 4000
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    r, g = observables.radial_distribution(pos, b, r_max=4.0, n_bins=24)
    g = np.asarray(g)
    np.testing.assert_allclose(g[3:], 1.0, atol=0.12)


def test_structure_factor_ideal_gas():
    rng = np.random.default_rng(4)
    L, n = 10.0, 2000
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    k, s = observables.static_structure_factor(pos, b, n_max=4)
    k = np.asarray(k)
    s = np.asarray(s)
    assert s[k > 0].mean() == pytest.approx(1.0, rel=0.35)
    # zero mode carries N (rho_0 = N)
    assert s[k == 0].max() == pytest.approx(n, rel=1e-6)


def test_msd_of_ballistic_motion():
    t = np.arange(10, dtype=float)
    traj = np.zeros((10, 5, 3))
    traj[:, :, 0] = t[:, None] * 2.0  # x = 2 t
    msd = np.asarray(observables.mean_squared_displacement(jnp.asarray(traj)))
    np.testing.assert_allclose(msd[:5], (2.0 * t[:5]) ** 2, rtol=1e-6)


def test_kinetic_temperature():
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(0, math.sqrt(2.5), (20000, 3)))
    T = float(observables.kinetic_temperature(v))
    assert T == pytest.approx(2.5, rel=0.05)


# ---------------------------------------------------------------- deserno
def test_deserno_bilayer_holds_together():
    """A small Deserno bilayer under BD stays a bilayer: tails stay inside,
    thickness stays of order 5 sigma (misc/Deserno.cuh;
    test/Potentials/Deserno)."""
    from uammd_tpu.core.types import Computables
    from uammd_tpu.interactors.deserno import (
        DesernoParams, build_bilayer, deserno_forces,
    )
    from uammd_tpu.neighbors.neighbor_list import (
        build_neighbor_list, ensure_capacity, maybe_rebuild,
    )
    from uammd_tpu.integrators.base import run

    params = DesernoParams()
    pos, types, lipid_bonds, straight, L = build_bilayer(4, params)
    n = pos.shape[0]
    b = box([L, L, 6 * L])
    st = make_state(pos, type_id=types, seed=0)
    nl = ensure_capacity(
        build_neighbor_list(st.pos, b, params.max_cutoff), st.pos
    )

    def force_fn(state, nbrs):
        nbrs = maybe_rebuild(nbrs, state.pos)
        fev = deserno_forces(
            state.pos, state.type_id, lipid_bonds, straight, params, nbrs,
            box=b, computables=Computables(force=True),
        )
        return fev, nbrs

    from uammd_tpu.integrators.brownian import leimkuhler

    integ = leimkuhler(force_fn, dt=2e-4, temperature=0.9, viscosity=1.0)
    st2, nl, _ = run(integ, st, nl, 300)
    z = np.asarray(st2.pos[:, 2])
    t = np.asarray(types)
    # no lipid evaporated away and the leaflet structure persists:
    assert np.abs(z).max() < 6 * params.sigma
    # heads sit outside the tails on average
    assert np.abs(z[t == 0]).mean() > np.abs(z[t == 1]).mean()


# ----------------------------------------------------------------- logging
def test_logging_levels_and_critical_raises(capsys):
    from uammd_tpu.core import logging as ulog

    ulog.set_level(ulog.MESSAGE)
    ulog.message("hello %d", 42)
    with pytest.raises(ulog.SimulationError):
        ulog.critical("boom")
    t = ulog.Timer()
    t.tic()
    assert t.toc() >= 0.0


# -------------------------------------------------------------- generic_md
def test_generic_md_cli_runs(tmp_path):
    from uammd_tpu.cli.generic_md import main

    cfg = tmp_path / "data.main"
    cfg.write_text(
        "\n".join(
            [
                "numberParticles 256",
                "boxSize 16 16 16",
                "integrator verletNVT",
                "temperature 1.2",
                "friction 1.0",
                "dt 0.005",
                "numberSteps 40",
                "printSteps 20",
                "cutOff 2.5",
                "outfile " + str(tmp_path / "out.pos"),
            ]
        )
        + "\n"
    )
    main([str(cfg)])
    out = tmp_path / "out.pos"
    assert out.exists()


def test_dynamic_structure_factor_ideal_diffusion():
    """Non-interacting Brownian particles: S(k, t) = S(k, 0) exp(-D k^2 t)."""
    rng = np.random.default_rng(8)
    L, n, T, D, dt = 8.0, 800, 60, 0.5, 0.05
    b = box(L)
    traj = np.zeros((T, n, 3))
    traj[0] = (rng.random((n, 3)) - 0.5) * L
    for t in range(1, T):
        traj[t] = traj[t - 1] + math.sqrt(2 * D * dt) * rng.standard_normal(
            (n, 3)
        )
    kmag, s_kt = observables.dynamic_structure_factor(
        jnp.asarray(traj), b, n_max=2
    )
    kmag = np.asarray(kmag)
    s_kt = np.asarray(s_kt)
    kmin = 2 * math.pi / L
    sel = np.isclose(kmag, kmin)
    decay = s_kt[:, sel].mean(axis=1)
    decay = decay / decay[0]
    t = np.arange(T) * dt
    want = np.exp(-D * kmin**2 * t)
    # early decay only: the correlation estimator's variance blows up at
    # large lag (few time origins x 6 k-points)
    m = want > 0.6
    assert np.abs(decay[m] - want[m]).max() < 0.12, (
        np.abs(decay[m] - want[m]).max()
    )


@pytest.mark.parametrize(
    "integ,extra",
    [
        ("fib", ["viscosity 1.0", "hydrodynamicRadius 1.0"]),
        ("icm", ["viscosity 1.0", "hydrodynamicRadius 1.0", "density 1.0"]),
        ("mcAnderson", ["cutOff 2.5", "triesPerCell 2"]),
        ("icmCompressible", ["viscosity 1.0", "hydrodynamicRadius 1.0",
                             "density 1.0", "speedOfSound 4.0"]),
        ("bdhiQuasi2D", ["viscosity 1.0", "hydrodynamicRadius 1.0"]),
        ("bdhiTrue2D", ["viscosity 1.0", "hydrodynamicRadius 1.0"]),
        ("bdhiSaffman", ["viscosity 1.0", "hydrodynamicRadius 1.0",
                         "saffmanLength 8.0"]),
        ("dpstokes", ["viscosity 1.0", "hydrodynamicRadius 1.0",
                      "wallMode slit", "initialPositions random"]),
    ],
    ids=["fib", "icm", "mcAnderson", "icmCompressible", "quasi2d",
         "true2d", "saffman", "dpstokes"],
)
def test_generic_md_cli_new_integrators(tmp_path, integ, extra):
    """generic_md drives FIB, ICM, Anderson MC, compressible ICM, the
    quasi-2D BDHI family and DPStokes from data.main (reference:
    generic_simulation.cu:372-393, Hydro/, BDHI/DoublyPeriodic/,
    MonteCarlo/NVT)."""
    from uammd_tpu.cli.generic_md import main

    cfg = tmp_path / "data.main"
    cfg.write_text(
        "\n".join(
            [
                "numberParticles 64",
                "boxSize 12 12 12",
                f"integrator {integ}",
                "temperature 1.0",
                "dt 0.005",
                "numberSteps 6",
                "seed 7",
            ]
            + extra
        )
        + "\n"
    )
    assert main([str(cfg)]) == 0


def test_generic_md_cli_bonds_and_electrostatics(tmp_path):
    """Angular/torsional bond files + the Poisson interactor from
    data.main (reference: generic_simulation.cu:444-487)."""
    from uammd_tpu.cli.generic_md import main

    (tmp_path / "ang.bonds").write_text("1\n0 1 2 5.0 1.5708\n")
    (tmp_path / "tor.bonds").write_text("1\n0 1 2 3 2.0 0.0\n")
    (tmp_path / "charges.dat").write_text(
        "\n".join(["1" if i % 2 == 0 else "-1" for i in range(32)]) + "\n"
    )
    cfg = tmp_path / "data.main"
    cfg.write_text(
        "\n".join(
            [
                "numberParticles 32",
                "boxSize 10 10 10",
                "integrator brownian",
                "temperature 0.5",
                "viscosity 1.0",
                "hydrodynamicRadius 0.5",
                "dt 0.001",
                "numberSteps 5",
                "cutOff 2.5",
                "angularBondFile " + str(tmp_path / "ang.bonds"),
                "torsionalBondFile " + str(tmp_path / "tor.bonds"),
                "useElectrostatics",
                "permittivity 1.0",
                "gaussianWidth 0.4",
                "chargeReadFile " + str(tmp_path / "charges.dat"),
                "seed 3",
            ]
        )
        + "\n"
    )
    assert main([str(cfg)]) == 0
