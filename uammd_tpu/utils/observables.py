"""Structural and dynamical observables.

TPU-native analog of the analysis the reference delegates to user code and
the HydroGrid wrapper (reference: utils/HydroGrid.cuh:1-40 — static/dynamic
structure factors — plus the RDF/MSD checks in test/BD/test*.bash,
test/MD/test.bash). All functions are jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.box import Box


def radial_distribution(
    pos: jax.Array, box: Box, n_bins: int = 100, r_max: float | None = None,
    chunk: int = 2048,
):
    """g(r) histogram over all pairs (the reference's tools/rdf usage).

    Returns (r_centers, g). O(N^2) tiled — an analysis routine, not a hot
    path."""
    n = pos.shape[0]
    if r_max is None:
        r_max = float(jax.device_get(jnp.min(box.size))) / 2.0

    def row_block(i_block):
        dr = box.wrap(pos[None, :, :] - pos[i_block][:, None, :])
        r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
        mask = (i_block[:, None] != jnp.arange(n)[None, :]) & (r < r_max)
        bins = jnp.clip((r / r_max * n_bins).astype(jnp.int32), 0, n_bins - 1)
        return jnp.zeros(n_bins).at[bins.reshape(-1)].add(
            mask.reshape(-1).astype(jnp.float32)
        )

    chunkn = min(chunk, n)
    pad = (-n) % chunkn
    rows = (jnp.arange(n + pad) % n).astype(jnp.int32)
    hist = jnp.sum(jax.lax.map(row_block, rows.reshape(-1, chunkn)), axis=0)
    # correct double counting from padded rows
    hist = hist * (n / (n + pad))
    r_edges = jnp.linspace(0, r_max, n_bins + 1)
    rc = 0.5 * (r_edges[1:] + r_edges[:-1])
    shell = 4.0 / 3.0 * jnp.pi * (r_edges[1:] ** 3 - r_edges[:-1] ** 3)
    rho = n / jnp.prod(box.size)
    g = hist / (n * rho * shell)
    return rc, g


def static_structure_factor(pos: jax.Array, box: Box, n_max: int = 8):
    """S(k) on the reciprocal lattice (HydroGrid's static factor analog)."""
    n = pos.shape[0]
    L = box.size
    m = jnp.arange(-n_max, n_max + 1)
    kx, ky, kz = jnp.meshgrid(m, m, m, indexing="ij")
    kvec = (
        2.0 * jnp.pi
        * jnp.stack([kx, ky, kz], -1).reshape(-1, 3).astype(pos.dtype)
        / L
    )
    phase = pos @ kvec.T  # [N, K]
    rho_k = jnp.exp(-1j * phase).sum(0)
    s = (jnp.abs(rho_k) ** 2 / n).reshape((2 * n_max + 1,) * 3)
    kmag = jnp.sqrt((kvec**2).sum(-1)).reshape(s.shape)
    return kmag, s


def mean_squared_displacement(traj: jax.Array):
    """MSD(t) from a trajectory [T, N, 3] of unwrapped positions."""
    d = traj - traj[0]
    return jnp.mean(jnp.sum(d * d, axis=-1), axis=-1)


def velocity_autocorrelation(vel_traj: jax.Array):
    """VACF(t) = <v(0).v(t)> from [T, N, 3]."""
    return jnp.mean(jnp.sum(vel_traj * vel_traj[0], axis=-1), axis=-1)


def kinetic_temperature(vel: jax.Array, mass=None, dim: int = 3):
    m = jnp.ones(vel.shape[0], vel.dtype) if mass is None else mass
    ke = 0.5 * jnp.sum(m * jnp.sum(vel * vel, axis=-1))
    return 2.0 * ke / (dim * vel.shape[0])


def dynamic_structure_factor(traj: jax.Array, box: Box, n_max: int = 4):
    """S(k, t) = <rho_k(t) rho_-k(0)> / N over a trajectory [T, N, 3]
    (the HydroGrid dynamic factor analog, reference: utils/HydroGrid.cuh).

    Returns (kmag [K], S [T, K]) with K the reciprocal-lattice points of
    |m| <= n_max (zero mode excluded), S averaged over time origins via the
    stationarity identity S(k, t) = mean_t0 Re[rho_k(t0+t) conj(rho_k(t0))]
    computed with an FFT over the time axis.
    """
    T, n, _ = traj.shape
    L = box.size
    m = jnp.arange(-n_max, n_max + 1)
    kx, ky, kz = jnp.meshgrid(m, m, m, indexing="ij")
    kvec = (
        2.0 * jnp.pi
        * jnp.stack([kx, ky, kz], -1).reshape(-1, 3).astype(traj.dtype)
        / L
    )
    nonzero = jnp.any(kvec != 0, axis=-1)
    kvec = kvec[nonzero]
    phase = jnp.einsum("tnd,kd->tnk", traj, kvec)
    rho = jnp.exp(-1j * phase).sum(1)  # [T, K]
    # time-origin-averaged correlation via FFT (Wiener-Khinchin)
    pad = jnp.concatenate([rho, jnp.zeros_like(rho)], axis=0)
    f = jnp.fft.fft(pad, axis=0)
    corr = jnp.fft.ifft(f * jnp.conj(f), axis=0)[:T].real
    norm = (T - jnp.arange(T))[:, None] * n
    s_kt = corr / norm
    kmag = jnp.sqrt((kvec**2).sum(-1))
    return kmag, s_kt
