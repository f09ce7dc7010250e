"""Triply periodic spectral Poisson electrostatics.

TPU-native analog of the reference spectral Ewald Poisson interactor
(reference: src/Interactor/SpectralEwaldPoisson.cuh:1-81): point charges are
spread onto a grid with a Gaussian envelope of width ``gw``, the periodic
Poisson equation is solved in Fourier space,

    phi(k) = rho(k) / (epsilon k^2),    phi(0) = 0   (tinfoil boundary)

the field E = -grad phi is obtained by ik multiplication, and forces
F_i = q_i E(x_i) (and energies 0.5 q_i phi(x_i)) are interpolated back. With
Gaussian spreading applied on both ends the effective pair potential is
erf(r / (2 gw)) / (4 pi eps r) — i.e. charges are physically Gaussian clouds
of width gw, exactly the reference's model (SpectralEwaldPoisson.cuh:22-30).
The reference's split (near-field Ewald) mode is a performance option; the
spectral path here is the full solver (its "no-split direct mode").
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from ..core.grid import next_fft_size
from ..core.types import Computables, ForceEnergyVirial
from ..solvers.ibm import (GaussianKernel, interpolate_auto as interpolate, spread_auto as spread)


@dataclasses.dataclass(frozen=True)
class Poisson:
    box: Box
    epsilon: float = 1.0  # permittivity
    gw: float = 1.0  # Gaussian charge width
    shape: tuple = ()
    support: int = 12
    box_size: tuple = ()

    @staticmethod
    def create(box: Box, epsilon=1.0, gw=1.0, tolerance=1e-4, support=None,
               prefer_pow2=False):
        """Grid sized so h <= gw (reference picks h from tolerance;
        h ~ gw resolves the Gaussian to ~1e-4)."""
        Ls = [float(s) for s in jax.device_get(box.size)]
        h_target = gw / max(1.0, (math.log10(1.0 / tolerance) / 3.0))
        shape = tuple(
            # multiples of 8 keep large-N spreads on the pencil MXU path
            # (every axis, so cubic boxes keep an isotropic h — the Gaussian
            # width is set in units of h = L_x/n_x)
            next_fft_size(max(8, int(math.ceil(L / h_target))), prefer_pow2,
                          pencil_safe=True)
            for L in Ls
        )
        if support is None:
            support = min(14, int(2 * math.ceil(3.0 * gw / (Ls[0] / shape[0]))) + 2)
        return Poisson(box=box, epsilon=epsilon, gw=gw, shape=shape,
                       support=support, box_size=tuple(Ls))

    def _kernel(self):
        h = self.box_size[0] / self.shape[0]
        return GaussianKernel(sigma=self.gw / h, support=self.support)

    def _spread_interp(self, pos):
        """(spread_fn, interp_fn) sharing ONE pencil binning for the whole
        solve (spread + the phi/E interpolation — the FCM pattern,
        integrators/bdhi/fcm.py); auto-dispatch fallback otherwise."""
        from ..solvers.ibm import _poison
        from ..solvers.pencil_ibm import (
            bin_pencils, interpolate_pencil, pencil_ok, spread_pencil)

        if pos.shape[0] >= 4096 and pencil_ok(self.shape, self.support):
            bins = bin_pencils(pos, self.shape, self.box)

            def sp(kern, p, vals):
                f, ovf = spread_pencil(kern, p, vals, self.shape, self.box,
                                       bins)
                return _poison(f, ovf)

            def it(kern, p, field):
                v, ovf = interpolate_pencil(kern, p, field, self.box, bins)
                return _poison(v, ovf)

            return sp, it
        return (
            lambda kern, p, vals: spread(kern, p, vals, self.shape, self.box),
            lambda kern, p, field: interpolate(kern, p, field, self.box),
        )

    def fields(self, pos, charge):
        """Return (phi_i, E_i): potential and field at particle positions."""
        kern = self._kernel()
        sp, it = self._spread_interp(pos)
        rho = sp(kern, pos, charge)
        rho_k = jnp.fft.rfftn(rho)
        Ls = self.box_size
        ks = [
            2.0 * math.pi * jnp.fft.fftfreq(n, d=float(L) / n).astype(pos.dtype)
            for n, L in zip(self.shape[:2], Ls[:2])
        ]
        kz = 2.0 * math.pi * jnp.fft.rfftfreq(
            self.shape[2], d=float(Ls[2]) / self.shape[2]
        ).astype(pos.dtype)
        kx, ky, kz = jnp.meshgrid(ks[0], ks[1], kz, indexing="ij")
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        phi_k = jnp.where(k2 > 0, rho_k / (self.epsilon * k2s), 0.0)
        phi = jnp.fft.irfftn(phi_k, s=self.shape)
        e_k = jnp.stack([-1j * kx * phi_k, -1j * ky * phi_k, -1j * kz * phi_k], -1)
        E = jnp.fft.irfftn(e_k, s=self.shape, axes=(0, 1, 2))
        # one 4-channel interpolation (phi, Ex, Ey, Ez) over the shared bins
        out = it(kern, pos, jnp.concatenate([phi[..., None], E], axis=-1))
        return out[:, 0], out[:, 1:4]

    def sum(
        self,
        pos,
        charge,
        computables: Computables = Computables(),
    ) -> ForceEnergyVirial:
        phi_i, E_i = self.fields(pos, charge)
        force = charge[:, None] * E_i if computables.force else None
        energy = 0.5 * charge * phi_i if computables.energy else None
        return ForceEnergyVirial(force=force, energy=energy)


# ---------------------------------------------------------------------------
# Ewald split mode (reference: SpectralEwaldPoisson.cuh:100 "split" parameter,
# near-field kernels SpectralEwaldPoisson.cu:15-59, :148-159)
# ---------------------------------------------------------------------------


def _erf_np(x):
    try:
        from scipy.special import erf
    except Exception:  # pragma: no cover - scipy is in this image
        from math import erf as _serf

        erf = np.vectorize(_serf)
    return erf(x)


def _near_G_np(r, gw, ngw, eps):
    """Near-field Green's function G(r) = [erf(r/2gw) - erf(r/2ngw)]/(4 pi
    eps r) in f64 numpy, with the reference's small-r series switch
    (SpectralEwaldPoisson.cu:15-35) to avoid the erf cancellation."""
    r = np.asarray(r, np.float64)
    pi32 = math.pi ** 1.5
    gw2 = gw * gw
    n2 = ngw * ngw
    small = r < 0.1 * gw
    rs = np.where(small, 1.0, r)
    G_far = (_erf_np(rs / (2 * gw)) - _erf_np(rs / (2 * ngw))) / (
        4 * math.pi * eps * rs
    )
    selfterm = 1.0 / (4 * pi32 * gw) - 1.0 / (4 * pi32 * ngw)
    r2term = 1.0 / (48.0 * pi32) * (1.0 / (n2 * ngw) - 1.0 / (gw2 * gw))
    r4term = 1.0 / (640.0 * pi32) * (1.0 / (gw2 * gw2 * gw)
                                     - 1.0 / (n2 * n2 * ngw))
    G_small = (selfterm + r * r * r2term + r**4 * r4term) / eps
    return np.where(small, G_small, G_far)


def _near_g_np(r, gw, ngw, eps):
    """g(r) = G'(r)/r (force on i = q_i q_j g . (r_j - r_i)), f64 numpy
    with small-r series."""
    r = np.asarray(r, np.float64)
    pi32 = math.pi ** 1.5
    gw2 = gw * gw
    n2 = ngw * ngw
    small = r < 0.1 * gw
    rs = np.where(small, 1.0, r)
    e_diff = _erf_np(rs / (2 * gw)) - _erf_np(rs / (2 * ngw))
    gauss = (
        np.exp(-rs * rs / (4 * gw2)) / (gw * math.sqrt(math.pi))
        - np.exp(-rs * rs / (4 * n2)) / (ngw * math.sqrt(math.pi))
    )
    g_far = (gauss / rs - e_diff / (rs * rs)) / (4 * math.pi * eps) / rs
    # series: G = G0 + c2 r^2 + c4 r^4 -> g = G'/r = 2 c2 + 4 c4 r^2
    r2term = 1.0 / (48.0 * pi32) * (1.0 / (n2 * ngw) - 1.0 / (gw2 * gw))
    r4term = 1.0 / (640.0 * pi32) * (1.0 / (gw2 * gw2 * gw)
                                     - 1.0 / (n2 * n2 * ngw))
    g_small = (2.0 * r2term + 4.0 * r4term * r * r) / eps
    return np.where(small, g_small, g_far)


@dataclasses.dataclass(frozen=True)
class PoissonSplit:
    """Ewald-split triply periodic Poisson: spectral far field of *widened*
    Gaussian charges (width ngw = sqrt(gw^2 + 1/(4 xi^2)), allowing a much
    coarser FFT grid) plus a short-range near-field correction summed over
    a grid-resident Pallas channel kernel — the reference's split mode
    (SpectralEwaldPoisson.cuh:100; near-field transversers
    SpectralEwaldPoisson.cu:148-159, 211-330). The near-field G and G'/r
    ride as centered Chebyshev-fit polynomials evaluated in registers
    (the TabulatedFunction analog, cf. pse_engine.py)."""

    far: Poisson
    gw: float
    split: float
    ngw: float
    epsilon: float
    near: "GaussianNearField"

    @property
    def rcut(self) -> float:
        return self.near.rcut

    @property
    def fit_error(self) -> float:
        return self.near.fit_error

    @property
    def spec(self):
        return self.near.spec

    @staticmethod
    def create(box: Box, n: int, epsilon=1.0, gw=1.0, split=1.0,
               tolerance=1e-4, support=None, prefer_pow2=False,
               deg=20, pos=None, n_strag: int = 0, cap=None):
        Ls = [float(s) for s in jax.device_get(box.size)]
        ngw = math.sqrt(gw * gw + 1.0 / (4.0 * split * split))
        far = Poisson.create(box, epsilon=epsilon, gw=ngw,
                             tolerance=tolerance, support=support,
                             prefer_pow2=prefer_pow2)
        rcut = min(near_cutoff(ngw, tolerance), 0.45 * min(Ls))
        near = GaussianNearField.create(
            tuple(Ls), n, gw=gw, ngw=ngw, epsilon=epsilon, rcut=rcut,
            deg=deg, pos=pos, n_strag=n_strag, cap=cap,
        )
        return PoissonSplit(far=far, gw=gw, split=split, ngw=ngw,
                            epsilon=epsilon, near=near)

    def sum(self, pos, charge,
            computables: Computables = Computables()) -> ForceEnergyVirial:
        """Far (widened spectral) + near (grid-resident correction) +
        near self-energy."""
        fev = self.far.sum(pos, charge, computables)
        nf = self.near.apply(pos, charge)
        force = None
        energy = None
        if computables.force:
            force = (fev.force if fev.force is not None else 0.0) + (
                charge[:, None] * nf[:, :3]
            )
        if computables.energy:
            self_e = (0.5 * self.near.self_G) * charge * charge
            energy = (fev.energy if fev.energy is not None else 0.0) + (
                0.5 * charge * nf[:, 3] + self_e
            )
        return ForceEnergyVirial(force=force, energy=energy)


def near_cutoff(ngw: float, tolerance: float) -> float:
    """Near-field cutoff: G_near(r) ~ erfc(r/(2 ngw))/(4 pi eps r); the
    Gaussian envelope exp(-r^2/(4 ngw^2)) <= tol sets the reach."""
    return 2.0 * ngw * math.sqrt(max(math.log(1.0 / tolerance), 1.0))


@dataclasses.dataclass(frozen=True)
class GaussianNearField:
    """Short-range Gaussian-difference correction kernel shared by the TP
    split Poisson and the DP slab split (the reference uses the same
    free-space Green's functions in both: SpectralEwaldPoisson.cu:15-59 and
    DoublyPeriodic/PoissonSlab/NearField.cuh:14-62). The radial G and G'/r
    ride as two-piece centered Chebyshev-fit polynomials evaluated in
    registers over the grid-resident channel kernel.

    ``apply(pos, charge)`` returns [N, 4]: (sum_j q_j g(r) dr, sum_j q_j
    G(r)) — field-like sums the caller turns into forces (x q_i) and
    energies (x q_i / 2; add 0.5 q_i^2 self_G for the self term)."""

    gw: float
    ngw: float
    epsilon: float
    rcut: float
    spec: object  # engine GridSpec
    qb: float  # piece boundary in q = r / rcut
    e_coef: tuple  # (piece1, piece2) polynomial coefficients of G
    g_coef: tuple  # (piece1, piece2) of G'(r)/r
    uscale: tuple  # per-piece (a, b): u = a q + b maps the piece to [-1, 1]
    self_G: float
    fit_error: float

    @staticmethod
    def create(box_size, n: int, *, gw, ngw, epsilon=1.0, rcut,
               deg=20, pos=None, n_strag: int = 0, cap=None):
        Ls = [float(s) for s in box_size]
        spec = choose_spec_near(Ls, n, rcut, cap=cap, pos=pos,
                                n_strag=n_strag)
        # two-piece Chebyshev fits over q = r/rcut (the gw-scale core needs
        # its own piece — cf. pse_engine's piecewise TabulatedFunction
        # analog): piece 1 on [0, qb], piece 2 on [qb, 1]
        qb = min(4.0 * gw / rcut, 0.5)
        coefs = []
        scales = []
        fit_err = 0.0
        scale0 = abs(_near_G_np(np.asarray([0.0]), gw, ngw, epsilon)[0])
        for lo, hi in ((1e-7, qb), (qb, 1.0)):
            q = np.linspace(lo, hi, 2500)
            r = q * rcut
            u = (2.0 * q - hi - lo) / (hi - lo)
            for y, sc in ((_near_G_np(r, gw, ngw, epsilon), scale0),
                          (_near_g_np(r, gw, ngw, epsilon), None)):
                ch = np.polynomial.chebyshev.Chebyshev.fit(u, y, deg,
                                                           domain=[-1, 1])
                p = np.polynomial.chebyshev.cheb2poly(ch.coef)
                resid = np.abs(np.polynomial.polynomial.polyval(u, p) - y)
                fit_err = max(fit_err, float(
                    resid.max() / (sc if sc else max(np.abs(y).max(), 1e-300))
                ))
                coefs.append(tuple(float(c) for c in p))
            scales.append((2.0 / (hi - lo), -(hi + lo) / (hi - lo)))
        self_G = float(_near_G_np(np.asarray([0.0]), gw, ngw, epsilon)[0])
        # collected (e1, g1, e2, g2) -> stored (e1, e2, g1, g2)
        return GaussianNearField(
            gw=gw, ngw=ngw, epsilon=epsilon,
            rcut=float(rcut), spec=spec, qb=float(qb),
            e_coef=(coefs[0], coefs[2]), g_coef=(coefs[1], coefs[3]),
            uscale=tuple(scales),
            self_G=self_G, fit_error=fit_err,
        )

    def apply(self, pos, charge):
        from ..engine.layout import pack_channels, unpack_values
        from ..engine.pair_kernel import broadcast_strag_channels

        cg = pack_channels(self.spec, pos, charge[:, None])
        S = self.spec.n_strag
        if S:
            blk = broadcast_strag_channels(
                self.spec, cg.spos, cg.schannels, cg.spid
            )
            outs = self._kernel()(cg.x, cg.y, cg.z, *cg.channels, strag=blk)
            svals = tuple(
                jnp.sum(outs[4 + c], axis=(0, 1, 3)) for c in range(4)
            )
            # straggler-straggler pairs in plain XLA
            ss = self._strag_pairs(cg.spos, cg.spid, cg.schannels[0])
            svals = tuple(s + e for s, e in zip(svals, ss))
            near = unpack_values(cg, outs[:4], svalues=svals)
        else:
            outs = self._kernel()(cg.x, cg.y, cg.z, *cg.channels)
            near = unpack_values(cg, outs[:4])
        return near.astype(pos.dtype)

    def _pair_fn(self):
        rc2 = np.float32(self.rcut * self.rcut)
        inv_rcut = np.float32(1.0 / self.rcut)
        qb = np.float32(self.qb)
        ce1 = [np.float32(c) for c in self.e_coef[0]]
        ce2 = [np.float32(c) for c in self.e_coef[1]]
        cg1 = [np.float32(c) for c in self.g_coef[0]]
        cg2 = [np.float32(c) for c in self.g_coef[1]]
        a1, b1 = (np.float32(v) for v in self.uscale[0])
        a2, b2 = (np.float32(v) for v in self.uscale[1])

        def horner(cs, u):
            acc = cs[-1]
            for c in cs[-2::-1]:
                acc = acc * u + c
            return acc

        def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
            # field-like outputs: sum_j q_j g(r) dr and sum_j q_j G(r);
            # the caller multiplies by q_i (force) / 0.5 q_i (energy)
            (qj,) = ch_j
            inside = (r2 < rc2) & (r2 > 1e-10)
            r2s = jnp.where(inside, r2, 1.0)
            rinv = jax.lax.rsqrt(r2s)
            q = r2s * rinv * inv_rcut
            near = q < qb
            u1 = a1 * q + b1
            u2 = a2 * q + b2
            g = jnp.where(near, horner(cg1, u1), horner(cg2, u2))
            e = jnp.where(near, horner(ce1, u1), horner(ce2, u2))
            g = jnp.where(inside, g, 0.0) * qj
            e = jnp.where(inside, e, 0.0) * qj
            return (g * dxv, g * dyv, g * dzv, e)

        return pair_fn

    def _kernel(self):
        from ..engine.pair_kernel import make_pair_channel_kernel

        cache = self.__dict__.get("_kern_cache")
        if cache is None:
            cache = make_pair_channel_kernel(
                self.spec, self._pair_fn(), 1, 4
            )
            object.__setattr__(self, "_kern_cache", cache)
        return cache

    def _strag_pairs(self, spos, spid, sq):
        pair_fn = self._pair_fn()
        Ls = jnp.asarray(self.spec.box_size, jnp.float32)
        val = spid >= 0
        d = spos[None, :, :] - spos[:, None, :]
        d = d - Ls * jnp.round(d / Ls)
        r2 = jnp.sum(d * d, axis=-1)
        ok = val[None, :] & val[:, None]
        ok = ok & ~jnp.eye(spos.shape[0], dtype=bool)
        r2m = jnp.where(ok, r2, np.float32(1.0e18))[:, :, None]
        ch_i = (sq[:, None, None],)
        ch_j = (sq[None, :, None],)
        out = pair_fn(r2m, d[:, :, 0:1], d[:, :, 1:2], d[:, :, 2:3],
                      ch_i, ch_j)
        return tuple(jnp.sum(o, axis=1)[:, 0] for o in out)


def choose_spec_near(Ls, n, rcut, cap=None, pos=None, n_strag=0):
    from ..engine.layout import choose_spec

    return choose_spec(Ls, n, rcut, skin=1.0, cap=cap, pos=pos,
                       n_strag=n_strag, strag_cell_excess=1 << 30,
                       strag_headroom=1.5)


def pair_potential_theory(r, gw, epsilon=1.0):
    """erf(r/(2 gw)) / (4 pi eps r): the exact interaction of two Gaussian
    charges of width gw (for validation against the spectral solver;
    reference documents the same closed form, SpectralEwaldPoisson.cuh:25)."""
    import jax.scipy.special as jsp

    return jsp.erf(r / (2.0 * gw)) / (4.0 * math.pi * epsilon * r)
