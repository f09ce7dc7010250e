"""Positively-Split Ewald RPY: near-field real space + far-field spectral.

TPU-native analog of the reference PSE (reference: src/Integrator/BDHI/PSE/
BDHI_PSE.cuh:1-70, NearField.cuh, FarField.cuh, RPY_PSE.cuh): the periodic
RPY mobility is split at an inverse length ``xi`` into

- a *far field*: forces spread with a Gaussian envelope of width
  sigma_split = 1/(2 xi) on each side, solved spectrally exactly like FCM
  (spread -> FFT -> transverse projector -> IFFT -> interpolate), with
  k-space Brownian noise;
- a *near field*: the short-ranged remainder M_RPY(r) - M_blob(r; Sigma)
  (Sigma^2 = 2 sigma_split^2 the combined envelope), tabulated on an r grid
  (the reference tabulates its erfc-based functions the same way,
  NearField.cuh + TabulatedFunction) and summed over a neighbour list; its
  Brownian noise comes from a Lanczos sqrt (the reference uses the same
  Lanczos solver, BDHI_PSE.cuh:20-55).

The blob mobility f, g radial functions are computed at setup by exact 1D
Bessel quadratures of the transverse projector transform

  f(r) = (1/(2 pi^2 eta)) Int phi(k) [j0(kr) - j1(kr)/(kr)] dk
  g(r) = -(1/(2 pi^2 eta)) Int phi(k) [j0(kr) - 3 j1(kr)/(kr)] dk

(phi = exp(-Sigma^2 k^2 / 2); the Sigma -> 0 limit reproduces Oseen,
verifying the identities). By construction near + far = periodic RPY for any
xi — the split-invariance the reference validates against FCM/Cholesky.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...neighbors.neighbor_list import NeighborList, build_neighbor_list
from ...neighbors.pair_map import apply_pairs
from ...solvers.lanczos import lanczos_sqrt_apply
from .fcm import FCM


def _blob_fg(r, sigma_c, eta, kmax_factor=12.0, nk=8192, a=None):
    """Open-space blob pair mobility radial functions f(r), g(r).

    ``a=None``: point Gaussian envelope phi(k) = exp(-Sigma^2 k^2 / 2).
    ``a`` set: the full PSE wave-space envelope
        phi(k) = sinc^2(ka) (1 + Sigma^2 k^2/2) exp(-Sigma^2 k^2/2)
    — the RPY surface-sphere factor plus the Hasimoto splitting polynomial
    that cancels the Gaussians' second moment (reference:
    PSE/FarField.cuh:82-115, B(k) ~ sin^2(k rh)/(k rh)^2 / k^2 x hashimoto).
    Without both factors the near-field remainder RPY - blob carries an
    algebraic (2a^2/3 - Sigma^2)/r^3 tail whose truncation at rcut
    accumulates coherently over neighbours."""
    r = np.atleast_1d(np.asarray(r, np.float64))
    kmax = kmax_factor / sigma_c
    k = np.linspace(1e-8, kmax, nk)
    phi = np.exp(-0.5 * (sigma_c * k) ** 2)
    if a is not None:
        phi = phi * np.square(np.sinc(k * a / math.pi))
        phi = phi * (1.0 + 0.5 * (sigma_c * k) ** 2)
    x = np.outer(r, k)  # [R, K]
    with np.errstate(invalid="ignore", divide="ignore"):
        j0 = np.where(x > 1e-8, np.sin(x) / x, 1.0 - x * x / 6.0)
        j1_over_x = np.where(
            x > 1e-4,
            (np.sin(x) / x**2 - np.cos(x) / x) / x,
            1.0 / 3.0 - x * x / 30.0,
        )
    pref = 1.0 / (2.0 * math.pi**2 * eta)
    f = pref * np.trapezoid(phi * (j0 - j1_over_x), k, axis=1)
    g = -pref * np.trapezoid(phi * (j0 - 3.0 * j1_over_x), k, axis=1)
    return f, g


def _rpy_fg(r, a, eta):
    """RPY radial functions (same decomposition M = f I + g rr^;
    reference: BDHI.cuh:13-70)."""
    r = np.atleast_1d(np.asarray(r, np.float64))
    m0 = 1.0 / (6.0 * math.pi * eta * a)
    rs = np.maximum(r, 1e-14)
    far_f = m0 * (3.0 * a / (4.0 * rs)) * (1.0 + 2.0 * a**2 / (3.0 * rs**2))
    far_g = m0 * (3.0 * a / (4.0 * rs)) * (1.0 - 2.0 * a**2 / rs**2)
    near_f = m0 * (1.0 - 9.0 * r / (32.0 * a))
    near_g = m0 * (3.0 / (32.0 * a)) * r
    f = np.where(r >= 2 * a, far_f, near_f)
    g = np.where(r >= 2 * a, far_g, near_g)
    return f, g


@dataclasses.dataclass(frozen=True)
class PSE:
    """Split RPY backend for bdhi_euler_maruyama."""

    box: Box
    far: FCM
    viscosity: float
    radius: float
    xi: float
    rcut: float
    # near-field tables on a uniform r^2 grid
    r2_max: float
    f_table: jax.Array
    g_table: jax.Array
    self_f: float
    lanczos_iterations: int = 24

    @staticmethod
    def create(
        box: Box,
        viscosity=1.0,
        radius=1.0,
        xi: float | None = None,
        tolerance: float = 1e-4,
        points_per_width: float = 1.2,
        table_size: int = 4096,
        lanczos_iterations: int = 24,
        support: int = 10,
    ):
        Ls = [float(s) for s in jax.device_get(box.size)]
        if xi is None:
            xi = 0.5 / radius  # sigma_split = radius: balanced default
        sigma_split = 0.5 / xi
        sigma_c = math.sqrt(2.0) * sigma_split
        # near-field cutoff: remainder decays ~ erfc(r / (2 sigma_split))
        # +radius: the surface-sphere convolutions shift the remainder's
        # exponential decay outward by ~2a; one radius of slack keeps the
        # truncated remainder below tolerance (measured ladder in
        # test_pse_engine / docs/PERF.md)
        rcut = sigma_c * math.sqrt(2.0 * math.log(1.0 / tolerance)) + radius
        rcut = max(rcut, 2.0 * radius * 1.05)
        # far-field grid resolves the split Gaussian
        h = sigma_split / points_per_width
        far = FCM.create(
            box, viscosity=viscosity, radius=sigma_split * math.sqrt(math.pi),
            points_per_radius=sigma_split * math.sqrt(math.pi) / h,
            support=support, rpy_sinc_radius=radius,
            hasimoto_k2=sigma_split * sigma_split,
        )
        # tables (blob = sinc^2(ka)-enveloped Gaussian, matching the far
        # field's wave-space kernel so the remainder decays exponentially)
        r = np.sqrt(np.linspace(1e-12, rcut * rcut, table_size))
        fb, gb = _blob_fg(r, sigma_c, viscosity, a=radius)
        fr, gr = _rpy_fg(r, radius, viscosity)
        f0b, _ = _blob_fg(np.array([0.0]), sigma_c, viscosity, a=radius)
        m0 = 1.0 / (6.0 * math.pi * viscosity * radius)
        return PSE(
            box=box, far=far, viscosity=viscosity, radius=radius, xi=xi,
            rcut=float(rcut), r2_max=float(rcut * rcut),
            f_table=jnp.asarray(fr - fb),
            g_table=jnp.asarray(gr - gb),
            self_f=float(m0 - f0b[0]),
            lanczos_iterations=lanczos_iterations,
        )

    # ---------------------------------------------------------- near field
    def _interp_tables(self, r2):
        m = self.f_table.shape[0]
        x = jnp.clip(r2 / self.r2_max, 0.0, 1.0) * (m - 1)
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, m - 2)
        w = x - i0
        f = self.f_table[i0] * (1 - w) + self.f_table[i0 + 1] * w
        g = self.g_table[i0] * (1 - w) + self.g_table[i0 + 1] * w
        return f.astype(r2.dtype), g.astype(r2.dtype)

    def near_matvec(self, pos, forces, nlist: NeighborList):
        """M_near @ F via the neighbour list (reference: NearField.cuh
        transverser + TabulatedFunction)."""

        def kernel(r2, dr, fi, fj, idx):
            inside = (r2 < self.r2_max) & (r2 > 1e-14)
            r2s = jnp.where(inside, r2, 1.0)
            f, g = self._interp_tables(r2s)
            rinv = jax.lax.rsqrt(r2s)
            rhat = dr * rinv[..., None]
            fdotr = jnp.sum(fj * rhat, axis=-1)
            out = f[..., None] * fj + g[..., None] * fdotr[..., None] * rhat
            return {"v": jnp.where(inside[..., None], out, 0.0)}

        out = apply_pairs(kernel, nlist, pos, info=forces, box=self.box)
        return out["v"] + self.self_f * forces

    def compute_mf(self, pos, forces, nlist: NeighborList | None = None):
        if nlist is None:
            nlist = build_neighbor_list(pos, self.box, self.rcut)
        return self.far.compute_mf(pos, forces) + self.near_matvec(
            pos, forces, nlist
        )

    def compute_bdw(self, pos, key, nlist: NeighborList | None = None):
        if nlist is None:
            nlist = build_neighbor_list(pos, self.box, self.rcut)
        k1, k2 = jax.random.split(key)
        far_noise = self.far.compute_bdw(pos, k1)

        def mv(x):
            return self.near_matvec(pos, x.reshape(-1, 3), nlist).reshape(-1)

        z = jax.random.normal(k2, (pos.shape[0] * 3,), pos.dtype)
        near_noise, _ = lanczos_sqrt_apply(mv, z, m=self.lanczos_iterations)
        return far_noise + near_noise.reshape(-1, 3)

    def divergence(self, pos):
        return jnp.zeros_like(pos)
