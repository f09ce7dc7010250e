"""DPPoissonSlab exterior media: dielectric jumps, metallic walls, wall
surface charge (reference: DPPoissonSlab.cuh:17 Permitivity; validated by
the image-charge construction: a single planar interface at z = -H/2 with
permittivities (eps1 inside, eps2 below) is exactly equivalent to a uniform
medium with image charges q' = q (eps1 - eps2)/(eps1 + eps2) mirrored across
the interface — same xy periodicity on both sides of the comparison)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.types import Computables
from uammd_tpu.electrostatics.dpslab import DPPoissonSlab


L, H, GW, EPS = 20.0, 10.0, 0.4, 1.0


def image_compare(eps_below, atol):
    """Solve A: interface at z=-H/2 (eps_below outside). Solve B: uniform
    tall box with explicit image charges. Compare E at the particles."""
    rng = np.random.default_rng(0)
    n = 6
    pos = np.column_stack([
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * L,
        -H / 2 + 1.8 + 2.4 * rng.random(n),  # lower half; >= 4.5 gw
        # above the interface so the Gaussian charge does not leak across
        # (the image equivalence is exact only for charge fully inside)
    ])
    q = rng.normal(size=n)
    q -= q.mean()  # neutral

    A = DPPoissonSlab.create(
        box([L, L, H]), epsilon=EPS, gw=GW, points_per_gw=2.0, nz=96,
        eps_bottom=eps_below,
    )
    _, E_a = A.fields(jnp.asarray(pos), jnp.asarray(q))

    if math.isinf(eps_below):
        qf = -1.0
    else:
        qf = (EPS - eps_below) / (EPS + eps_below)
    mirror = pos.copy()
    mirror[:, 2] = -H - pos[:, 2]  # reflect across z = -H/2
    pos_b = np.vstack([pos, mirror])
    q_b = np.concatenate([q, qf * q])
    # tall uniform box [-1.5H/... ]: recentre so both sets fit
    Hb = 3.0 * H
    B = DPPoissonSlab.create(
        box([L, L, Hb]), epsilon=EPS, gw=GW, points_per_gw=2.0, nz=224,
    )
    _, E_b = B.fields(jnp.asarray(pos_b), jnp.asarray(q_b))

    ea = np.asarray(E_a)
    eb = np.asarray(E_b)[:n]
    scale = np.abs(eb).max()
    assert np.abs(ea - eb).max() < atol * scale, (
        np.abs(ea - eb).max() / scale
    )


@pytest.mark.slow
def test_dielectric_jump_matches_image_charges():
    image_compare(eps_below=4.0, atol=5e-3)


@pytest.mark.slow
def test_metallic_wall_matches_perfect_images():
    image_compare(eps_below=math.inf, atol=5e-3)


def test_uniform_reduces_to_old_behavior():
    """eps_top = eps_bottom = eps must equal the default operator."""
    rng = np.random.default_rng(1)
    n = 5
    pos = np.column_stack([
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * 0.6 * H,
    ])
    q = rng.normal(size=n)
    q -= q.mean()
    a = DPPoissonSlab.create(box([L, L, H]), epsilon=EPS, gw=GW, nz=48)
    c = DPPoissonSlab.create(box([L, L, H]), epsilon=EPS, gw=GW, nz=48,
                             eps_top=EPS, eps_bottom=EPS)
    _, Ea = a.fields(jnp.asarray(pos), jnp.asarray(q))
    _, Ec = c.fields(jnp.asarray(pos), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(Ea), np.asarray(Ec), atol=1e-10)


def test_capacitor_surface_charge():
    """sigma on the bottom wall, -sigma on top: uniform interior field
    E_z = sigma / eps (parallel-plate capacitor)."""
    sigma = 0.7
    sl = DPPoissonSlab.create(
        box([L, L, H]), epsilon=EPS, gw=GW, nz=48,
        sigma_bottom=sigma, sigma_top=-sigma,
    )
    pos = jnp.asarray([[0.0, 0.0, z] for z in (-2.0, 0.0, 2.0)])
    qq = jnp.asarray([1e-9, -1e-9, 0.0])  # negligible probe charges
    _, E = sl.fields(pos, qq)
    E = np.asarray(E)
    np.testing.assert_allclose(E[:, 2], sigma / EPS, rtol=1e-2)
    assert np.abs(E[:, :2]).max() < 1e-6


def test_metallic_wall_grounds_potential():
    """phi ~ 0 near a grounded wall."""
    sl = DPPoissonSlab.create(
        box([L, L, H]), epsilon=EPS, gw=GW, points_per_gw=2.0, nz=64,
        eps_bottom=math.inf,
    )
    pos = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, -H / 2 + 0.8]])
    q = jnp.asarray([1.0, -1.0])
    phi, _ = sl.fields(pos, q)
    # the particle sitting close to the grounded wall feels a much smaller
    # potential than the bulk one
    assert abs(float(phi[1])) < abs(float(phi[0]))


def test_slab_split_matches_no_split():
    """Ewald-split DP slab vs the fine-grid no-split solver (reference
    near field: DoublyPeriodic/PoissonSlab/NearField.cuh). Small gw: the
    no-split solver needs points_per_gw-resolved grids; the split runs a
    ~3x coarser far grid + the near correction and must agree."""
    import numpy as onp

    from uammd_tpu.electrostatics.dpslab import DPPoissonSlab, DPPoissonSlabSplit

    L, H, gw = 12.0, 8.0, 0.25
    b = box([L, L, H], periodic=(True, True, False))
    rng = onp.random.default_rng(9)
    n = 6
    pos = onp.stack([
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * (H * 0.5),  # keep off the walls
    ], axis=-1)
    q = rng.normal(size=n)
    q -= q.mean()
    pos = jnp.asarray(pos)
    q = jnp.asarray(q)

    ref = DPPoissonSlab.create(b, gw=gw, points_per_gw=1.5).sum(
        pos, q, Computables(force=True, energy=True)
    )
    sp = DPPoissonSlabSplit.create(b, n, gw=gw, split=0.7, tolerance=1e-5,
                                   points_per_gw=1.5)
    # far grid is much coarser than the no-split grid at the same ppg
    assert sp.far.shape[0] * 3 <= DPPoissonSlab.create(
        b, gw=gw, points_per_gw=1.5
    ).shape[0] * 2 or sp.far.shape[0] < 48
    out = sp.sum(pos, q, Computables(force=True, energy=True))
    # the agreement floor is each path's own spreading discretization at
    # ppg 1.5 (~0.5-1%), not the split tolerance; the exact level moves
    # with FFT-size quantization of the two grids
    fscale = float(jnp.abs(ref.force).max())
    assert float(jnp.abs(out.force - ref.force).max()) / fscale < 1.5e-2
    escale = float(jnp.abs(ref.energy).max())
    assert float(jnp.abs(out.energy - ref.energy).max()) / escale < 1.5e-2
