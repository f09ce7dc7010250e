"""Polydisperse / multi-species LJ on the grid-resident engine vs a brute
force O(N^2) reference (the engine answer to per-type parameter tables and
LBVH polydispersity — reference: Potential/ParameterHandler.cuh:8,
NeighbourList/LBVH.cuh:652)."""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.engine.mixtures import MixtureLJ


def brute_forces(pos, eps, sig, L, cut_scale):
    n = len(pos)
    f = np.zeros((n, 3))
    for i in range(n):
        d = pos - pos[i]
        d -= L * np.round(d / L)
        r2 = (d**2).sum(1)
        eij = np.sqrt(eps[i] * eps)
        sij = 0.5 * (sig[i] + sig)
        rc2 = (cut_scale * sij) ** 2
        mask = (r2 < rc2) & (r2 > 1e-12)
        r2s = np.where(mask, r2, 1.0)
        t6 = (sij**2 / r2s) ** 3
        g = np.where(mask, (-24.0 * eij / r2s) * (2 * t6 * t6 - t6), 0.0)
        f[i] = (g[:, None] * d).sum(0)
    return f


def test_binary_mixture_matches_brute_force():
    rng = np.random.default_rng(0)
    n, L = 300, 14.0
    pos = (rng.random((n, 3)) - 0.5) * L
    # binary species: type tables realized as per-particle params
    t = rng.integers(0, 2, n)
    eps = np.where(t == 0, 1.0, 0.5)
    sig = np.where(t == 0, 1.0, 1.6)

    mx = MixtureLJ.create(L, n, eps, sig, cut_scale=2.5)
    out, ovf = mx.forces(jnp.asarray(pos, jnp.float32), eps, sig)
    assert not bool(jax.device_get(ovf))
    want = brute_forces(pos, eps, sig, L, 2.5)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(out) - want).max() / scale < 5e-5


def test_continuous_polydispersity():
    """Continuously distributed radii (the LBVH use case) in one pass."""
    rng = np.random.default_rng(1)
    n, L = 256, 16.0
    pos = (rng.random((n, 3)) - 0.5) * L
    eps = np.full(n, 1.0)
    sig = rng.uniform(0.8, 2.0, n)  # 2.5x size ratio
    mx = MixtureLJ.create(L, n, eps, sig, cut_scale=2.0)
    out, ovf = mx.forces(jnp.asarray(pos, jnp.float32), eps, sig)
    assert not bool(jax.device_get(ovf))
    want = brute_forces(pos, eps, sig, L, 2.0)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(out) - want).max() / scale < 5e-5


def test_hierarchical_two_grid_extreme_polydispersity():
    """Size ratio 8 mixture (LBVH's regime, reference LBVH.cuh:1-60):
    the two-grid hierarchy must match the brute-force O(N^2) sum."""
    rng = np.random.default_rng(11)
    L = 36.0
    n_small, n_large = 300, 16
    n = n_small + n_large
    sigma = np.concatenate([
        np.full(n_small, 0.5), np.full(n_large, 4.0)
    ])
    epsilon = np.concatenate([
        np.full(n_small, 1.0), np.full(n_large, 0.6)
    ])
    # non-overlapping-ish: place larges on a loose grid, smalls anywhere
    pos = (rng.random((n, 3)) - 0.5) * L
    pos = jnp.asarray(pos, jnp.float32)

    from uammd_tpu.engine.mixtures import MixtureLJHierarchical

    m = MixtureLJHierarchical.create(
        L, n, epsilon, sigma, cut_scale=2.5, interpret=True,
    )
    assert m.fine.spec.cutoff < 2.0  # fine grid really is fine
    out, ovf = m.forces(pos, jnp.asarray(epsilon, jnp.float32),
                        jnp.asarray(sigma, jnp.float32))
    assert not bool(ovf)

    # brute force (minimum image, LB mixing, per-pair cutoff, clamped like
    # the kernel so deep-overlap pairs compare equal)
    p = np.asarray(pos, np.float64)
    d = p[None, :, :] - p[:, None, :]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    sig_ij = 0.5 * (sigma[:, None] + sigma[None, :])
    eps_ij = np.sqrt(epsilon[:, None] * epsilon[None, :])
    rc2 = (2.5 * sig_ij) ** 2
    np.fill_diagonal(r2, 1e30)
    inside = r2 < rc2
    r2c = np.maximum(r2, 4e-3 * sig_ij**2)
    t = sig_ij**2 / r2c
    t6 = t**3
    g = np.where(inside,
                 -24.0 * eps_ij / np.maximum(r2, 4e-3) * (2 * t6 * t6 - t6),
                 0.0)
    f_ref = (g[:, :, None] * d).sum(axis=1)
    scale = np.abs(f_ref).max()
    err = np.abs(np.asarray(out, np.float64) - f_ref).max() / scale
    assert err < 5e-5, err
