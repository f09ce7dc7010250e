"""Grid-resident Pallas engine: force kernel, rebin kernel, MD stepping.

Reference analog: the CellList/PairForces correctness contract plus the
VerletNVT physics checks (test/MD) — run here against the high-throughput
engine in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.types import Computables
from uammd_tpu.engine.layout import needs_rebin, pack, rebin, unpack
from uammd_tpu.engine.md import make_lj_md
from uammd_tpu.engine.rebin_kernel import rebin_fast, rebin_fast_noforce
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice


@pytest.fixture(scope="module")
def small_system():
    np.random.seed(2)
    n, L = 1500, 24.0
    pos = (np.random.rand(n, 3) - 0.5) * L
    md = make_lj_md(L, n, dt=0.005, temperature=1.0)
    gs = md.init(pos, seed=1)
    return md, gs, pos, L, n


def test_forces_match_dense_reference(small_system):
    md, gs, pos, L, n = small_system
    _, _, f_engine = unpack(gs)
    fev = pair_forces(
        lj(cutoff=2.5), jnp.asarray(pos, jnp.float32), box=box(L),
        computables=Computables(True),
    )
    fref = np.asarray(fev.force)
    rel = np.abs(np.asarray(f_engine) - fref).max() / np.abs(fref).max()
    assert rel < 1e-5, rel


def test_fold_and_wrap_correctness():
    """Grid with fold > 1 and boundary cells: forces still match dense."""
    np.random.seed(3)
    n, L = 2000, 36.0  # 12^3 cells, fold 4
    pos = (np.random.rand(n, 3) - 0.5) * L
    md = make_lj_md(L, n, dt=0.005, temperature=1.0)
    assert md.spec.fold > 1
    gs = md.init(pos, seed=1)
    _, _, f_engine = unpack(gs)
    fev = pair_forces(
        lj(cutoff=2.5), jnp.asarray(pos, jnp.float32), box=box(L),
        computables=Computables(True),
    )
    rel = float(
        jnp.abs(jnp.asarray(f_engine) - fev.force).max()
        / jnp.abs(fev.force).max()
    )
    assert rel < 1e-5, rel


@pytest.mark.parametrize("rb", [rebin_fast, rebin_fast_noforce],
                         ids=["10q", "7q"])
def test_pallas_rebin_matches_sort_rebin(small_system, rb):
    md, gs, pos, L, n = small_system
    k = jax.random.key(3)
    m = gs.mask
    dt_ = gs.x.dtype
    gs2 = gs.replace(
        x=gs.x + 0.8 * jax.random.normal(k, gs.x.shape, dt_) * m,
        y=gs.y + 0.8 * jax.random.normal(jax.random.fold_in(k, 1), gs.x.shape, dt_) * m,
        z=gs.z + 0.8 * jax.random.normal(jax.random.fold_in(k, 2), gs.x.shape, dt_) * m,
    )
    ga = rebin(gs2)
    gb = rb(gs2)
    pa, va, _ = (np.asarray(t) for t in unpack(ga))
    pb, vb, _ = (np.asarray(t) for t in unpack(gb))
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(va, vb)
    assert int((gb.pid >= 0).sum()) == n
    assert not bool(gb.overflow)


def test_rebin_flags_overflow_on_capacity_violation(small_system):
    md, gs, pos, L, n = small_system
    # cram everything into one cell
    gs2 = gs.replace(
        x=jnp.where(gs.mask, 0.1 * gs.x / 24.0, gs.x),
        y=jnp.where(gs.mask, 0.1 * gs.y / 24.0, gs.y),
        z=jnp.where(gs.mask, 0.1 * gs.z / 24.0, gs.z),
    )
    gb = rebin_fast(gs2)
    assert bool(gb.overflow)


def test_engine_gj_step_physics(small_system):
    """Thermostat to T, conserve particle count through drift-driven
    rebins."""
    np.random.seed(5)
    n, L, T = 1024, 16.0, 1.3
    pos = lattice(n, L, "fcc") + np.random.normal(0, 0.05, (n, 3))
    md = make_lj_md(L, n, dt=0.005, temperature=T, pos=pos)
    gs = md.init(pos, seed=4)
    for _ in range(4):
        gs = md.run(gs, 25)
    assert int((gs.pid >= 0).sum()) == n
    assert not bool(gs.overflow)
    t_meas = float(md.temperature_of(gs))
    assert abs(t_meas - T) / T < 0.25, t_meas


def test_pack_unpack_roundtrip(small_system):
    md, gs, pos, L, n = small_system
    p, v, f = unpack(gs)
    # pack wraps positions into the primary box; compare wrapped
    b = box(L)
    pw = np.asarray(b.wrap_position(jnp.asarray(pos, jnp.float32)))
    np.testing.assert_allclose(np.asarray(p), pw, atol=1e-5)


def test_engine_energy_and_virial_outputs():
    """The grid engine's energy/virial kernel options match the [N, K]
    neighbour-list path (the previously unexercised e_fn/compute_virial
    outputs, engine/pair_kernel.py)."""
    from uammd_tpu.engine.layout import choose_spec, pack, unpack_values
    from uammd_tpu.engine.layout import ChannelGrid, pack_channels
    from uammd_tpu.engine.md import lj_e, lj_g
    from uammd_tpu.engine.pair_kernel import make_pair_force_kernel
    from uammd_tpu.neighbors.neighbor_list import build_neighbor_list

    np.random.seed(11)
    n, L = 800, 15.0
    pos = (np.random.rand(n, 3) - 0.5) * L
    b = box(L)

    spec = choose_spec(L, n, 2.5, skin=1.0, pos=pos)
    gs = pack(spec, pos)
    kern = make_pair_force_kernel(
        spec, lj_g(), e_fn=lj_e(), compute_virial=True
    )
    fx, fy, fz, en, vir = kern(gs.x, gs.y, gs.z)
    mask = gs.mask

    fev = pair_forces(
        lj(cutoff=2.5), jnp.asarray(pos, jnp.float32), box=b,
        computables=Computables(force=True, energy=True, virial=True),
    )
    # totals (slot order differs; sums are invariant)
    e_engine = float(jnp.sum(en * mask))
    e_ref = float(jnp.sum(fev.energy))
    assert abs(e_engine - e_ref) / abs(e_ref) < 1e-5, (e_engine, e_ref)
    v_engine = float(jnp.sum(vir * mask))
    v_ref = float(jnp.sum(fev.virial))
    assert abs(v_engine - v_ref) / abs(v_ref) < 1e-4, (v_engine, v_ref)
    f_engine = float(jnp.sum(jnp.abs(fx * mask)))
    f_ref = float(jnp.sum(jnp.abs(fev.force[:, 0])))
    assert abs(f_engine - f_ref) / f_ref < 1e-5
