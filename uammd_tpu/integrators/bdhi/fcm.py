"""Force Coupling Method: spectral Stokes mobility on a periodic grid.

TPU-native analog of the reference FCM (reference:
src/Integrator/BDHI/FCM/FCM_impl.cuh:36-693): particle forces are spread with
a Gaussian envelope of width sigma = a / sqrt(pi) (so the resulting pair
mobility is the RPY/FCM level approximation with self-mobility 1/(6 pi eta a)),
the periodic Stokes problem is solved in Fourier space with the transverse
projector

    u(k) = (1/(eta k^2)) (I - k^ k^) f(k),    u(0) = 0

(reference convolveFourier, FCM_impl.cuh:399), Brownian increments are
injected as sqrt(2 kT / dt) B^(1/2) dW with B the grid mobility — here
realized by filtering real white noise through sqrt of the k-space operator
(reference fourierBrownianNoise, FCM_impl.cuh:437; using a real-space white
field makes conjugate symmetry automatic) — and grid velocities are
interpolated back at particle positions. XLA's TPU FFT replaces cuFFT.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...core.grid import next_fft_size
from ...solvers.ibm import (
    BMKernel,
    GaussianKernel,
    Peskin3pt,
    Peskin4pt,
    interpolate_auto as interpolate,
    spread_auto as spread,
)

# Effective hydrodynamic radius of the h-locked IBM kernels, in grid
# spacings, MEASURED on this solver (collocated spectral Stokes; see
# tests/test_fcm_accuracy_ladder.py Peskin rungs). The reference quotes
# 0.91 h (Peskin 3pt) / 1.255 h (4pt) for its staggered-grid solvers
# (FIB.cuh:27-33, FCM_kernels.cuh) — the constant is discretization-
# dependent, and on the collocated grid it calibrates to:
PESKIN_RADIUS_PER_H = {"peskin3pt": 0.990, "peskin4pt": 1.311}

_BM_NORM_CACHE: dict = {}


def _bm_norm(beta: float, support: int) -> float:
    """Continuous integral of the un-normalized ES window over its support
    (in units of h); the lattice sum matches it to spectral accuracy, so
    dividing by it makes spreading conserve the spread quantity."""
    key = (float(beta), int(support))
    if key not in _BM_NORM_CACHE:
        xs = np.linspace(-1.0, 1.0, 4001)
        val = np.exp(beta * (np.sqrt(np.maximum(1.0 - xs * xs, 0.0)) - 1.0))
        _BM_NORM_CACHE[key] = float(
            np.trapezoid(val, xs) * support / 2.0
        )
    return _BM_NORM_CACHE[key]


@dataclasses.dataclass(frozen=True)
class _NormalizedBM:
    """BMKernel (solvers/ibm.py) with unit-sum normalization for FCM use."""

    beta: float
    support: int = 6

    def phi(self, r):
        w = float(self.support)
        x = 2.0 * r / w
        inside = jnp.abs(x) < 1.0
        xs = jnp.where(inside, x, 0.0)
        val = jnp.exp(self.beta * (jnp.sqrt(1.0 - xs * xs) - 1.0))
        return jnp.where(inside, val, 0.0) / _bm_norm(self.beta, w)


def _wavevectors(shape, box_size, dtype=jnp.float32):
    ks = [
        2.0 * math.pi * jnp.fft.fftfreq(n, d=L / n).astype(dtype)
        for n, L in zip(shape[:2], box_size[:2])
    ]
    kz = (
        2.0 * math.pi
        * jnp.fft.rfftfreq(shape[2], d=box_size[2] / shape[2]).astype(dtype)
    )
    kx, ky, kz = jnp.meshgrid(ks[0], ks[1], kz, indexing="ij")
    return kx, ky, kz


def _sample_white_rfft(key, shape, dV, dtype=jnp.float32):
    """Draw rfftn(w) directly in wave space, equal in distribution to the
    transform of real white noise w ~ N(0, 1/dV) iid on the grid — the
    noise forward FFT the fused Brownian pass would otherwise pay
    (reference: FCM_impl.cuh:437 addBrownianNoisePrefactor fills wave-space
    noise the same way) is replaced by Hermitian-consistent sampling:

    - interior kz modes are free complex Gaussians with total variance
      Ngrid/dV (the DFT of iid real noise);
    - the self-conjugate kz planes (kz = 0 and, for even nz, kz = nz/2)
      are symmetrized c -> (c(k) + conj(c(-k)))/sqrt(2), which makes them
      exactly Hermitian under (kx, ky) -> (-kx, -ky) with the correct
      variance at every point, including the real self-conjugate corners
      (there the map yields sqrt(2) Re c: variance Ngrid/dV, as required).

    Returns [nx, ny, nz//2+1, 3] complex64/128.
    """
    nx, ny, nz = shape
    nzr = nz // 2 + 1
    ngrid = nx * ny * nz
    std = np.asarray(math.sqrt(ngrid / (2.0 * dV)), dtype)
    re_im = jax.random.normal(key, (2, nx, ny, nzr, 3), dtype) * std
    wk = jax.lax.complex(re_im[0], re_im[1])
    half = np.asarray(1.0 / math.sqrt(2.0), dtype)

    def herm2d(c):
        # c[(−kx) % nx, (−ky) % ny]: reverse both axes, then roll by 1
        cf = jnp.flip(c, axis=(0, 1))
        cf = jnp.roll(cf, shift=(1, 1), axis=(0, 1))
        return (c + jnp.conj(cf)) * half

    planes = [0] + ([nz // 2] if nz % 2 == 0 else [])
    for zp in planes:
        wk = wk.at[:, :, zp].set(herm2d(wk[:, :, zp]))
    return wk


@dataclasses.dataclass(frozen=True)
class FCM:
    """Spectral FCM mobility backend (plugs into bdhi_euler_maruyama).

    hydrodynamic radius a; grid spacing h <= a * sqrt(pi) / 3 gives ~3-digit
    self-mobility accuracy with the truncated Gaussian; raise
    ``points_per_radius`` for more (reference kernel-accuracy ladder:
    test/BDHI/FCM/fcm_test.cu:19-28).
    """

    box: Box
    viscosity: float = 1.0
    radius: float = 1.0
    shape: tuple = ()
    support: int = 12
    box_size: tuple = ()
    # RPY surface-sphere wave-space factor sinc^2(k a) (reference:
    # PSE/FarField.cuh:82-115); None = plain Gaussian blob (classic FCM).
    rpy_sinc_radius: float | None = None
    # Hasimoto splitting compensation (1 + hasimoto_k2 * k^2): cancels the
    # spread/interp Gaussians' second moment so the Ewald remainder decays
    # exponentially (reference: FarField.cuh hashimoto factor,
    # (1 + k^2/4 xi^2) exp(-k^2/4 xi^2)); use hasimoto_k2 = sigma_split^2.
    hasimoto_k2: float | None = None
    # window kernel: "gaussian" (radius-parameterized) or one of the
    # h-locked kernels "peskin3pt" / "peskin4pt" / "bm" (reference kernel
    # selection: FCM_kernels.cuh, FCM_impl.cuh:36)
    kernel: str = "gaussian"
    bm_beta: float | None = None

    @staticmethod
    def create(box: Box, viscosity=1.0, radius=1.0, points_per_radius=3.0,
               support=12, prefer_pow2=False, rpy_sinc_radius=None,
               hasimoto_k2=None, kernel="gaussian", bm_beta=None):
        Ls = [float(s) for s in jax.device_get(box.size)]
        if kernel in PESKIN_RADIUS_PER_H:
            # h-locked kernels: the hydrodynamic radius is a fixed multiple
            # of the grid spacing (a = c * h), so the requested radius
            # picks h, and the support is the kernel's own
            c = PESKIN_RADIUS_PER_H[kernel]
            h = radius / c
            nominal = [max(8, int(math.ceil(L / h))) for L in Ls]
            shape = tuple(
                next_fft_size(n0, prefer_pow2, tile_safe_support=4,
                              pencil_safe=True)
                for n0 in nominal
            )
            return FCM(
                box=box, viscosity=viscosity, radius=radius, shape=shape,
                support=3 if kernel == "peskin3pt" else 4,
                box_size=tuple(Ls), rpy_sinc_radius=rpy_sinc_radius,
                hasimoto_k2=hasimoto_k2, kernel=kernel,
            )
        if kernel == "bm":
            # ES/BM kernel: support in grid points as passed (default the
            # DPStokes-style w=6), beta defaulting to the Barnett-Magland
            # tuning beta = 1.3267 w used by the reference's BM tables
            nominal = [max(8, int(math.ceil(L * points_per_radius / radius)))
                       for L in Ls]
            shape = tuple(
                next_fft_size(n0, prefer_pow2,
                              tile_safe_support=support if support <= 8
                              else None,
                              pencil_safe=support <= 16)
                for n0 in nominal
            )
            return FCM(
                box=box, viscosity=viscosity, radius=radius, shape=shape,
                support=support, box_size=tuple(Ls),
                rpy_sinc_radius=rpy_sinc_radius, hasimoto_k2=hasimoto_k2,
                kernel="bm",
                bm_beta=float(bm_beta) if bm_beta is not None
                else 1.3267 * support,
            )
        assert kernel == "gaussian", f"unknown FCM kernel {kernel!r}"
        nominal = [max(8, int(math.ceil(L * points_per_radius / radius)))
                   for L in Ls]
        shape = tuple(
            next_fft_size(
                n0,
                prefer_pow2,
                # multiples of 8 on EVERY axis: keeps x/y on the pencil MXU
                # spread path and, for cubic boxes, keeps the grid isotropic
                # (the Gaussian width is set in units of h = L_x/n_x)
                tile_safe_support=support if support <= 8 else None,
                pencil_safe=support <= 16,
            )
            for n0 in nominal
        )
        # ``support`` counts grid points, but the truncation radius that
        # matters is physical: when FFT-friendliness rounds the grid up
        # (finer h), scale the support by the same factor so the Gaussian
        # is cut at the same (or larger) physical radius.
        ratio = max(n / n0 for n, n0 in zip(shape, nominal))
        support = int(2 * math.ceil(support * ratio / 2.0))
        return FCM(
            box=box, viscosity=viscosity, radius=radius, shape=shape,
            support=support, box_size=tuple(Ls),
            rpy_sinc_radius=rpy_sinc_radius, hasimoto_k2=hasimoto_k2,
        )

    def _envelope2(self, kx, ky, kz):
        """Extra wave-space factor on the MOBILITY (i.e. applied squared
        relative to the noise filter): sinc^2(k a) * (1 + sigma_split^2 k^2).
        Returns None when disabled (classic FCM)."""
        if self.rpy_sinc_radius is None and self.hasimoto_k2 is None:
            return None
        k2 = kx * kx + ky * ky + kz * kz
        out = 1.0
        if self.rpy_sinc_radius is not None:
            x = jnp.sqrt(k2) * self.rpy_sinc_radius
            xs = jnp.where(x > 1e-8, x, 1.0)
            sc = jnp.where(x > 1e-8, jnp.sin(xs) / xs, 1.0 - x * x / 6.0)
            out = out * (sc * sc)
        if self.hasimoto_k2 is not None:
            out = out * (1.0 + self.hasimoto_k2 * k2)
        return out

    @property
    def sigma(self) -> float:
        return self.radius / math.sqrt(math.pi)

    @property
    def sigma_torque(self) -> float:
        """Rotlet Gaussian width: sigma_tau = a / (6 sqrt(pi))^(1/3) makes
        the rotational self-mobility exactly 1/(8 pi eta a^3) — the classic
        FCM dipole width (reference: FCM_kernels.cuh separate torque kernel;
        Lomholt & Maxey)."""
        return self.radius / (6.0 * math.sqrt(math.pi)) ** (1.0 / 3.0)

    def _kernel(self, dtype=jnp.float32):
        if self.kernel == "peskin3pt":
            return Peskin3pt()
        if self.kernel == "peskin4pt":
            return Peskin4pt()
        if self.kernel == "bm":
            return _NormalizedBM(beta=self.bm_beta, support=self.support)
        h = self.box_size[0] / self.shape[0]
        return GaussianKernel(sigma=self.sigma / h, support=self.support)

    def _kernel_torque(self, dtype=jnp.float32):
        if self.kernel != "gaussian":
            raise NotImplementedError(
                "torque coupling needs the Gaussian rotlet envelope; "
                f"kernel={self.kernel!r} supports forces only (reference "
                "limits the non-Gaussian FCM kernels the same way, "
                "FCM_kernels.cuh)"
            )
        h = self.box_size[0] / self.shape[0]
        return GaussianKernel(sigma=self.sigma_torque / h,
                              support=self.support)

    def pencil_bins(self, pos, slack: int = 0, cap_extra: int = 0):
        """Pencil bins for this grid, or None when the pencil path does not
        apply.  With ``slack`` > 0 the bins stay exact for up to slack*h of
        x/y drift — reusable across integrator steps (pass them back via
        ``bins=``/``slack=`` on the compute_* methods and rebin when
        max drift exceeds slack * min(hx, hy)).  ``cap_extra`` adds rows to
        the per-pencil capacity (O(cap) in the far contraction cost) —
        the bench's overflow-retry knob."""
        from ...solvers.pencil_ibm import bin_pencils, default_cap, pencil_ok

        if pos.shape[0] >= 4096 and pencil_ok(self.shape, self.support,
                                              slack):
            cap = None
            if cap_extra:
                cap = default_cap(pos.shape[0], self.shape) + int(cap_extra)
            return bin_pencils(pos, self.shape, self.box, cap=cap)
        return None

    def _spread_interp(self, pos, bins=None, slack: int = 0):
        """(spread_fn, interp_fn) sharing ONE pencil binning across every
        spread/interpolate of a spectral pass (bins are kernel-independent,
        so the force and torque kernels reuse them); falls back to the
        per-call auto dispatch on pencil-unsafe grids or small N.  Pass a
        persistent ``bins`` (from pencil_bins) to skip the per-call
        binning."""
        from ...solvers.ibm import _poison
        from ...solvers.pencil_ibm import (
            interpolate_pencil,
            interpolate_pencil_fused,
            spread_pencil,
            spread_pencil_fused,
        )

        if bins is None:
            slack = 0
            bins = self.pencil_bins(pos)
        if bins is not None:
            # On TPU, the Pallas-fused per-pencil contraction (weights
            # built in the contraction layouts, one MXU matmul per
            # pencil) replaces the XLA einsum path — measured round 5:
            # spread 30.8 -> 9.8 ms at the 131k/144^3 bench point.
            fused = jax.default_backend() == "tpu"
            _sp = spread_pencil_fused if fused else spread_pencil
            _it = interpolate_pencil_fused if fused else interpolate_pencil

            def sp(kern, p, vals):
                f, ovf = _sp(kern, p, vals, self.shape, self.box,
                             bins, slack=slack)
                return _poison(f, ovf)

            def it(kern, p, field):
                v, ovf = _it(kern, p, field, self.box, bins,
                             slack=slack)
                return _poison(v, ovf)

            return sp, it
        return (
            lambda kern, p, vals: spread(kern, p, vals, self.shape, self.box),
            lambda kern, p, field: interpolate(kern, p, field, self.box),
        )

    def _project(self, fk, kx, ky, kz):
        """(I - k^k^)/ (eta k^2) applied to the k-space force [.., 3]
        (x sinc^2(ka) when the RPY envelope is enabled)."""
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotf = kx * fk[..., 0] + ky * fk[..., 1] + kz * fk[..., 2]
        scale = 1.0 / (self.viscosity * k2s)
        env2 = self._envelope2(kx, ky, kz)
        if env2 is not None:
            scale = scale * env2
        ux = scale * (fk[..., 0] - kx * kdotf / k2s)
        uy = scale * (fk[..., 1] - ky * kdotf / k2s)
        uz = scale * (fk[..., 2] - kz * kdotf / k2s)
        zero = k2 == 0
        out = jnp.stack(
            [jnp.where(zero, 0, u) for u in (ux, uy, uz)], axis=-1
        )
        return out

    def grid_velocity(self, pos, forces):
        kern = self._kernel(pos.dtype)
        f_grid = spread(kern, pos, forces, self.shape, self.box)  # [nx,ny,nz,3]
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
        kx, ky, kz = _wavevectors(self.shape, self.box_size, pos.dtype)
        uk = self._project(fk, kx, ky, kz)
        return jnp.fft.irfftn(uk, s=self.shape, axes=(0, 1, 2)), kern

    def compute_mf(self, pos, forces, bins=None, slack: int = 0):
        with jax.named_scope("uammd.fcm.compute_mf"):
            sp, it = self._spread_interp(pos, bins, slack)
            kern = self._kernel(pos.dtype)
            f_grid = sp(kern, pos, forces)
            fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
            kx, ky, kz = _wavevectors(self.shape, self.box_size, pos.dtype)
            uk = self._project(fk, kx, ky, kz)
            u = jnp.fft.irfftn(uk, s=self.shape, axes=(0, 1, 2))
            return it(kern, pos, u)

    def compute_hydrodynamic_displacements(self, pos, forces, torques=None):
        """Linear (and angular) velocities from forces (and torques).

        Torque coupling follows the reference's curl construction
        (FCM_impl.cuh:670 addSpreadTorquesFourier + the angular
        interpolation): the torque field enters as (i/2) k x tau(k) and the
        angular velocity is w = (1/2) curl u -> (i/2) k x u(k). The same
        Gaussian envelope is used for both monopole and rotlet (the
        reference offers a separate torque width; that refinement is a
        parameter away)."""
        kern = self._kernel(pos.dtype)
        kern_t = self._kernel_torque(pos.dtype)
        sp, it = self._spread_interp(pos)
        f_grid = sp(kern, pos, forces)
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
        kx, ky, kz = _wavevectors(self.shape, self.box_size, pos.dtype)
        if torques is not None:
            t_grid = sp(kern_t, pos, torques)
            tk = jnp.fft.rfftn(t_grid, axes=(0, 1, 2))
            # add (i/2) k x tau
            fk = fk + 0.5j * jnp.stack(
                [
                    ky * tk[..., 2] - kz * tk[..., 1],
                    kz * tk[..., 0] - kx * tk[..., 2],
                    kx * tk[..., 1] - ky * tk[..., 0],
                ],
                -1,
            )
        uk = self._project(fk, kx, ky, kz)
        u = jnp.fft.irfftn(uk, s=self.shape, axes=(0, 1, 2))
        v = it(kern, pos, u)
        if torques is None:
            return v, None
        wk = 0.5j * jnp.stack(
            [
                ky * uk[..., 2] - kz * uk[..., 1],
                kz * uk[..., 0] - kx * uk[..., 2],
                kx * uk[..., 1] - ky * uk[..., 0],
            ],
            -1,
        )
        w = jnp.fft.irfftn(wk, s=self.shape, axes=(0, 1, 2))
        omega = it(kern_t, pos, w)
        return v, omega

    def compute_mf_bdw_torques(self, pos, forces, torques, key, noise_amp):
        """(M [F; T] + noise_amp * sqrt(M) dW) for the coupled translation-
        rotation grid mobility, in one spectral pass: the fluctuating grid
        velocity field u = u_det + noise is interpolated once with the
        monopole kernel (linear velocity) and once through the half-curl +
        rotlet kernel (angular velocity) — the reference's fused
        computeHydrodynamicDisplacements with torques (FCM_impl.cuh:654-693).
        Fluctuation-dissipation holds jointly because the same adjoint pairs
        (S, J) and (S_tau, J_tau) build both M and the noise."""
        dtype = pos.dtype
        kern = self._kernel(dtype)
        kern_t = self._kernel_torque(dtype)
        sp, it = self._spread_interp(pos)
        f_grid = sp(kern, pos, forces)
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
        kx, ky, kz = _wavevectors(self.shape, self.box_size, dtype)
        t_grid = sp(kern_t, pos, torques)
        tk = jnp.fft.rfftn(t_grid, axes=(0, 1, 2))
        fk = fk + 0.5j * jnp.stack(
            [
                ky * tk[..., 2] - kz * tk[..., 1],
                kz * tk[..., 0] - kx * tk[..., 2],
                kx * tk[..., 1] - ky * tk[..., 0],
            ],
            -1,
        )
        uk = self._project(fk, kx, ky, kz)
        if noise_amp:
            Ls = self.box_size
            dV = float(np.prod(np.asarray(Ls)) / np.prod(self.shape))
            wnk = _sample_white_rfft(key, self.shape, dV, dtype)
            k2 = kx * kx + ky * ky + kz * kz
            k2s = jnp.where(k2 > 0, k2, 1.0)
            kdotw = (kx * wnk[..., 0] + ky * wnk[..., 1] + kz * wnk[..., 2])
            scale = noise_amp / jnp.sqrt(self.viscosity * k2s)
            env2 = self._envelope2(kx, ky, kz)
            if env2 is not None:
                scale = scale * jnp.sqrt(env2)
            bk = jnp.stack(
                [
                    jnp.where(k2 == 0, 0,
                              scale * (wnk[..., c]
                                       - (kx, ky, kz)[c] * kdotw / k2s))
                    for c in range(3)
                ],
                axis=-1,
            )
            uk = uk + bk
        u = jnp.fft.irfftn(uk, s=self.shape, axes=(0, 1, 2))
        v = it(kern, pos, u)
        wk = 0.5j * jnp.stack(
            [
                ky * uk[..., 2] - kz * uk[..., 1],
                kz * uk[..., 0] - kx * uk[..., 2],
                kx * uk[..., 1] - ky * uk[..., 0],
            ],
            -1,
        )
        w = jnp.fft.irfftn(wk, s=self.shape, axes=(0, 1, 2))
        omega = it(kern_t, pos, w)
        return v, omega

    def compute_mf_bdw(self, pos, forces, key, noise_amp, bins=None,
                       slack: int = 0):
        """M F + noise_amp * B^(1/2) dW in ONE spectral pass: one spread,
        one k-space combine, one inverse transform, one interpolation — the
        fusion the reference performs inside
        computeHydrodynamicDisplacements (reference: FCM_impl.cuh:654-693
        with addBrownianNoise :437 injected into the same convolution)."""
        dtype = pos.dtype
        kern = self._kernel(dtype)
        sp, it = self._spread_interp(pos, bins, slack)
        f_grid = sp(kern, pos, forces)
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
        kx, ky, kz = _wavevectors(self.shape, self.box_size, dtype)
        uk = self._project(fk, kx, ky, kz)
        # sqrt(B) filtered white noise, in the same k-space pass; the
        # noise spectrum is sampled directly in wave space (Hermitian-
        # consistent), saving the second forward FFT
        Ls = self.box_size
        dV = float(np.prod(np.asarray(Ls)) / np.prod(self.shape))
        wk = _sample_white_rfft(key, self.shape, dV, dtype)
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotw = kx * wk[..., 0] + ky * wk[..., 1] + kz * wk[..., 2]
        scale = noise_amp / jnp.sqrt(self.viscosity * k2s)
        env2 = self._envelope2(kx, ky, kz)
        if env2 is not None:
            scale = scale * jnp.sqrt(env2)
        bk = jnp.stack(
            [
                jnp.where(k2 == 0, 0, scale * (wk[..., 0] - kx * kdotw / k2s)),
                jnp.where(k2 == 0, 0, scale * (wk[..., 1] - ky * kdotw / k2s)),
                jnp.where(k2 == 0, 0, scale * (wk[..., 2] - kz * kdotw / k2s)),
            ],
            axis=-1,
        )
        u = jnp.fft.irfftn(uk + bk, s=self.shape, axes=(0, 1, 2))
        return it(kern, pos, u)

    def compute_bdw(self, pos, key):
        """sqrt(M) dW: filter real white noise through sqrt(B(k)) =
        (I - k^k^)/sqrt(eta) / k (projector is idempotent so its own sqrt)."""
        dtype = pos.dtype
        Ls = self.box_size
        dV = float(np.prod(np.asarray(Ls)) / np.prod(self.shape))
        wk = _sample_white_rfft(key, self.shape, dV, dtype)
        kx, ky, kz = _wavevectors(self.shape, Ls, dtype)
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotw = kx * wk[..., 0] + ky * wk[..., 1] + kz * wk[..., 2]
        scale = 1.0 / jnp.sqrt(self.viscosity * k2s)
        env2 = self._envelope2(kx, ky, kz)
        if env2 is not None:
            scale = scale * jnp.sqrt(env2)
        bx = scale * (wk[..., 0] - kx * kdotw / k2s)
        by = scale * (wk[..., 1] - ky * kdotw / k2s)
        bz = scale * (wk[..., 2] - kz * kdotw / k2s)
        bk = jnp.stack(
            [jnp.where(k2 == 0, 0, b) for b in (bx, by, bz)], axis=-1
        )
        u = jnp.fft.irfftn(bk, s=self.shape, axes=(0, 1, 2))
        kern = self._kernel(dtype)
        _, it = self._spread_interp(pos)
        return it(kern, pos, u)

    def divergence(self, pos):
        return jnp.zeros_like(pos)
