"""Spectral Poisson electrostatics validation.

Reference analog: test/Potentials/Poisson. The solver is checked against an
*independent* exact computation: the periodic potential of Gaussian charges
evaluated by a direct nonuniform Fourier sum (no grids, no spreading), i.e.

  phi(x) = (1/(eps V)) sum_{k!=0} (rho_k / k^2) e^{ik.x},
  rho_k = sum_j q_j e^{-ik.x_j} e^{-k^2 gw^2 / 2}    (x2 gw smearing split
  between spread and interpolate)

which is the same physics with none of the same code paths (IBM spreading,
FFT layout, interpolation all get exercised). Also: the isolated-charge
energy must equal the Gaussian self energy q^2/(8 pi^{3/2} eps gw) plus the
Wigner jellium correction -2.83729748 q^2/(8 pi eps L).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.types import Computables
from uammd_tpu.electrostatics.poisson import Poisson


def direct_k_sum(pos, q, L, gw, eps=1.0, kmax=12):
    """Exact periodic fields of Gaussian charges by brute-force k sum."""
    n = np.arange(-kmax, kmax + 1)
    kx, ky, kz = np.meshgrid(n, n, n, indexing="ij")
    k = 2 * np.pi / L * np.stack([kx, ky, kz], -1).reshape(-1, 3)
    k2 = (k**2).sum(-1)
    sel = k2 > 0
    k, k2 = k[sel], k2[sel]
    V = L**3
    phase = np.exp(-1j * pos @ k.T)  # [N, K]
    # both the spread and the interpolate sides carry a width-gw Gaussian:
    # total k-space factor exp(-k^2 gw^2 / 2) * exp(-k^2 gw^2 / 2)
    rho_k = (q[:, None] * phase).sum(0) * np.exp(-k2 * gw**2)
    phi_k = rho_k / (eps * k2)
    # evaluate at particle positions with the interpolation-side smearing
    # already included in rho_k (both gw factors combined there)
    phi = (np.exp(1j * pos @ k.T) * phi_k[None, :]).real.sum(1) / V
    E = (
        (np.exp(1j * pos @ k.T)[:, :, None] * (-1j * k)[None] * phi_k[None, :, None])
        .real.sum(1)
        / V
    )
    return phi, E


def test_fields_match_direct_k_sum():
    L, gw = 20.0, 1.0
    b = box(L, dtype=jnp.float64)
    p = Poisson.create(b, gw=gw, tolerance=1e-5)
    rng = np.random.default_rng(3)
    pos = (rng.random((6, 3)) - 0.5) * L
    q = rng.normal(size=6)
    q -= q.mean()  # neutral
    phi_i, E_i = p.fields(jnp.asarray(pos), jnp.asarray(q))
    phi_ref, E_ref = direct_k_sum(pos, q, L, gw, kmax=14)
    np.testing.assert_allclose(np.asarray(phi_i), phi_ref, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(E_i), E_ref, rtol=5e-3, atol=1e-5)


def test_two_charge_force_newton3():
    L, gw = 24.0, 0.9
    b = box(L, dtype=jnp.float64)
    p = Poisson.create(b, gw=gw)
    pos = jnp.asarray([[0.0, 0, 0], [5.0, 0, 0]], jnp.float64)
    q = jnp.asarray([1.0, -1.0], jnp.float64)
    fev = p.sum(pos, q, Computables(True, True))
    assert float(fev.force[0, 0]) > 0  # attracted toward the negative charge
    np.testing.assert_allclose(
        np.asarray(fev.force[0]), -np.asarray(fev.force[1]), atol=1e-10
    )


def test_isolated_charge_energy_with_wigner_background():
    """E = q^2/(8 pi^{3/2} eps gw) - 2.83729748 q^2/(8 pi eps L): Gaussian
    self-energy + jellium (tinfoil, k=0 removed) correction."""
    L, gw = 40.0, 1.2
    b = box(L, dtype=jnp.float64)
    p = Poisson.create(b, gw=gw, tolerance=1e-5)
    pos = jnp.zeros((1, 3), jnp.float64)
    q = jnp.ones((1,), jnp.float64)
    fev = p.sum(pos, q, Computables(False, True))
    want = 1.0 / (8.0 * math.pi**1.5 * gw) - 2.83729748 / (8.0 * math.pi * L)
    np.testing.assert_allclose(float(fev.energy.sum()), want, rtol=2e-3)


def test_split_mode_matches_k_sum_small_gw():
    """Ewald split mode (reference SpectralEwaldPoisson.cuh:100): small gw
    that would need a ~100^3 no-split grid runs with a ~32^3 far grid plus
    the near-field correction; validated against the exact k-sum."""
    from uammd_tpu.electrostatics.poisson import PoissonSplit

    L, gw, split = 16.0, 0.25, 0.6
    b = box(L, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    n = 6
    pos = (rng.random((n, 3)) - 0.5) * L
    q = rng.normal(size=n)
    q -= q.mean()
    ps = PoissonSplit.create(b, n, gw=gw, split=split, tolerance=1e-5)
    # the split buys a much coarser far grid than no-split would need
    assert max(ps.far.shape) <= 40, ps.far.shape
    assert ps.fit_error < 1e-5, ps.fit_error
    fev = ps.sum(jnp.asarray(pos), jnp.asarray(q),
                 Computables(force=True, energy=True))
    phi_ref, E_ref = direct_k_sum(pos, q, L, gw, kmax=40)
    f_ref = q[:, None] * E_ref
    e_ref = 0.5 * q * phi_ref
    fscale = np.abs(f_ref).max()
    assert np.abs(np.asarray(fev.force) - f_ref).max() / fscale < 2e-3
    escale = np.abs(e_ref).max()
    assert np.abs(np.asarray(fev.energy) - e_ref).max() / escale < 2e-3


def test_split_invariance():
    """Two different splits agree (the reference's own split-mode
    criterion, SpectralEwaldPoisson.cuh:41-43)."""
    from uammd_tpu.electrostatics.poisson import PoissonSplit

    L, gw = 16.0, 0.25
    b = box(L, dtype=jnp.float64)
    rng = np.random.default_rng(6)
    n = 8
    pos = (rng.random((n, 3)) - 0.5) * L
    q = rng.normal(size=n)
    q -= q.mean()
    out = []
    for split in (0.5, 0.8):
        ps = PoissonSplit.create(b, n, gw=gw, split=split, tolerance=1e-5)
        fev = ps.sum(jnp.asarray(pos), jnp.asarray(q),
                     Computables(force=True, energy=True))
        out.append((np.asarray(fev.force), np.asarray(fev.energy)))
    fscale = np.abs(out[0][0]).max()
    assert np.abs(out[0][0] - out[1][0]).max() / fscale < 2e-3
    escale = np.abs(out[0][1]).max()
    assert np.abs(out[0][1] - out[1][1]).max() / escale < 2e-3
