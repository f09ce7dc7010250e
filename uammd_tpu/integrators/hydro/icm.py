"""Inertial Coupling Method: fluctuating incompressible Navier-Stokes with
immersed particles.

TPU-native analog of the reference ICM (reference: src/Integrator/Hydro/
ICM.cuh:157, ICM.cu:1191-1224). Each step follows the reference's
predictor-corrector shape (SURVEY 3.3):

  1. predictor: particles advected dt/2 with the interpolated fluid velocity
  2. fluid update: explicit advection + Crank-Nicolson viscosity +
     fluctuating stress divergence + spread particle forces, then an exact
     spectral Leray projection onto divergence-free fields
  3. corrector: particles advected the full dt with the midpoint velocity

Design deviation (documented): the reference discretizes on a staggered MAC
grid with FFT-diagonalized operators (ICM.cu applyStokesSolutionOperator);
on TPU we use a collocated grid with *spectral* derivatives throughout, so
incompressibility and the CN viscous solve are exact per mode — the same
operators the reference's FFT solve applies, minus the staggering bookkeeping.

The fluctuating stress follows Landau-Lifshitz: Sigma = sqrt(2 eta kT /
(dV dt)) * symmetrized white noise, injected as its (spectral) divergence
(reference: ICM.cu unperturbedFluidForcing / fluctuating stress terms).
Particles are neutrally buoyant (excess mass 0, the reference default).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...core.state import SimState, next_key
from ...core.types import ForceEnergyVirial
from ...solvers.ibm import (Peskin3pt,
                            interpolate_auto as interpolate,
                            spread_auto as spread)
from ..base import Integrator, advance_time


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FluidState:
    v: jax.Array  # [nx, ny, nz, 3] fluid velocity


@dataclasses.dataclass(frozen=True)
class ICM:
    box: Box
    shape: tuple
    box_size: tuple
    viscosity: float = 1.0
    density: float = 1.0
    temperature: float = 0.0
    dt: float = 0.01
    kernel: object = Peskin3pt()
    include_advection: bool = True

    @staticmethod
    def create(box, cells: int | tuple, viscosity=1.0, density=1.0,
               temperature=0.0, dt=0.01, include_advection=True):
        Ls = [float(s) for s in jax.device_get(box.size)]
        if isinstance(cells, int):
            cells = (cells,) * 3
        return ICM(
            box=box, shape=tuple(cells), box_size=tuple(Ls),
            viscosity=viscosity, density=density, temperature=temperature,
            dt=dt, include_advection=include_advection,
        )

    @property
    def hydrodynamic_radius(self) -> float:
        """~0.91 h for the Peskin 3pt kernel (reference: FIB.cuh:33 quotes
        rh ~ 0.91 L/n for the same kernel family)."""
        return 0.91 * self.box_size[0] / self.shape[0]

    @property
    def dV(self) -> float:
        return float(
            np.prod(np.asarray(self.box_size)) / np.prod(self.shape)
        )

    def _k(self, dtype):
        axes = [
            2 * math.pi * jnp.fft.fftfreq(n, d=L / n).astype(dtype)
            for n, L in zip(self.shape[:2], self.box_size[:2])
        ]
        kz = 2 * math.pi * jnp.fft.rfftfreq(
            self.shape[2], d=self.box_size[2] / self.shape[2]
        ).astype(dtype)
        return jnp.meshgrid(axes[0], axes[1], kz, indexing="ij")

    def _project(self, fk, kx, ky, kz):
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotf = kx * fk[..., 0] + ky * fk[..., 1] + kz * fk[..., 2]
        out = jnp.stack(
            [
                fk[..., 0] - kx * kdotf / k2s,
                fk[..., 1] - ky * kdotf / k2s,
                fk[..., 2] - kz * kdotf / k2s,
            ],
            -1,
        )
        return jnp.where((k2 == 0)[..., None], 0.0, out)

    def init_fluid(self, key=None, dtype=jnp.float32) -> FluidState:
        v = jnp.zeros(tuple(self.shape) + (3,), dtype)
        if self.temperature > 0 and key is not None:
            # thermalize: incompressible equipartition <v_a^2> = 2/3 kT/(rho dV)
            w = jnp.sqrt(
                jnp.asarray(self.temperature / (self.density * self.dV), dtype)
            ) * jax.random.normal(key, v.shape, dtype)
            wk = jnp.fft.rfftn(w, axes=(0, 1, 2))
            kx, ky, kz = self._k(dtype)
            v = jnp.fft.irfftn(
                self._project(wk, kx, ky, kz), s=self.shape, axes=(0, 1, 2)
            )
        return FluidState(v=v)

    def _advection(self, v):
        """-(v . grad) v with spectral derivatives (skew form omitted:
        validation runs are low-Reynolds)."""
        vk = jnp.fft.rfftn(v, axes=(0, 1, 2))
        kx, ky, kz = self._k(v.dtype)
        dvdx = jnp.fft.irfftn(1j * kx[..., None] * vk, s=self.shape, axes=(0, 1, 2))
        dvdy = jnp.fft.irfftn(1j * ky[..., None] * vk, s=self.shape, axes=(0, 1, 2))
        dvdz = jnp.fft.irfftn(1j * kz[..., None] * vk, s=self.shape, axes=(0, 1, 2))
        return -(
            v[..., 0:1] * dvdx + v[..., 1:2] * dvdy + v[..., 2:3] * dvdz
        )

    def fluid_step(self, fluid: FluidState, f_ext_grid, key):
        """One CN-viscosity + projection update of the fluid."""
        dtype = fluid.v.dtype
        dt = jnp.asarray(self.dt, dtype)
        rho = jnp.asarray(self.density, dtype)
        eta = jnp.asarray(self.viscosity, dtype)
        force = f_ext_grid
        if self.include_advection:
            force = force + rho * self._advection(fluid.v)
        if self.temperature > 0:
            amp = jnp.sqrt(
                jnp.asarray(
                    2.0 * eta * self.temperature / (self.dV * self.dt), dtype
                )
            )
            w = jax.random.normal(key, tuple(self.shape) + (3, 3), dtype)
            sigma = amp * (w + jnp.swapaxes(w, -1, -2)) / jnp.sqrt(2.0)
            sk = jnp.fft.rfftn(sigma, axes=(0, 1, 2))
            kx, ky, kz = self._k(dtype)
            divs = 1j * (
                kx[..., None] * sk[..., 0, :]
                + ky[..., None] * sk[..., 1, :]
                + kz[..., None] * sk[..., 2, :]
            )
            fk_thermal = divs
        else:
            fk_thermal = None
            kx, ky, kz = self._k(dtype)

        vk = jnp.fft.rfftn(fluid.v, axes=(0, 1, 2))
        fk = jnp.fft.rfftn(force, axes=(0, 1, 2))
        if fk_thermal is not None:
            fk = fk + fk_thermal
        k2 = (kx * kx + ky * ky + kz * kz)[..., None]
        lhs = rho / dt + 0.5 * eta * k2
        rhs = (rho / dt - 0.5 * eta * k2) * vk + fk
        vk_new = self._project(rhs / lhs, kx, ky, kz)
        return FluidState(v=jnp.fft.irfftn(vk_new, s=self.shape, axes=(0, 1, 2)))


def thermal_drift_forcing(icm: ICM, pos, key, delta: float | None = None):
    """kT dS/dq thermal-drift forcing via random finite differences
    (reference: ICM.cu:1068 thermalDrift, applied at :1213): the grid
    force field (kT/delta) [S(q + delta w/2) - S(q - delta w/2)] w with
    w ~ N(0,1)^3 per particle, whose expectation over w is the
    kT dS/dq . e_a divergence term the Gibbs measure requires. The
    predictor-corrector handles the dJ/dq side; without this forcing the
    sampled equilibrium acquires grid-scale bias."""
    kern = icm.kernel
    if delta is None:
        delta = 1e-3 * icm.box_size[0] / icm.shape[0]
    d = jnp.asarray(delta, pos.dtype)
    w = jax.random.normal(key, pos.shape, pos.dtype)
    sp = spread(kern, pos + 0.5 * d * w, w, icm.shape, icm.box)
    sm = spread(kern, pos - 0.5 * d * w, w, icm.shape, icm.box)
    return (jnp.asarray(icm.temperature, pos.dtype) / d) * (sp - sm)


def icm_integrator(force_fn, icm: ICM, *, thermal_drift: bool = True,
                   rfd_delta: float | None = None) -> Integrator:
    """Predictor-corrector particle coupling (reference: ICM.cu:1191-1224).

    ``thermal_drift`` adds the kT dS/dq RFD forcing (thermal_drift_forcing;
    reference ICM.cu:1068) every step when temperature > 0.

    aux = (FluidState, user_aux)."""
    kern = icm.kernel

    def init(state, aux):
        fluid_key = None
        if icm.temperature > 0:
            state, fluid_key = next_key(state)
        fluid = icm.init_fluid(fluid_key, dtype=state.dtype)
        if state.force is None:
            state = state.replace(force=jnp.zeros_like(state.pos))
        return state, (fluid, aux)

    def step(state, carry):
        fluid, aux = carry
        dt = jnp.asarray(icm.dt, state.dtype)
        # predictor half-advection
        v_at_p = interpolate(kern, state.pos, fluid.v, icm.box)
        x_mid = state.pos + 0.5 * dt * v_at_p
        # particle forces at midpoint, spread to the grid
        st_mid = state.replace(pos=x_mid)
        fev, aux = force_fn(st_mid, aux)
        f_grid = spread(kern, x_mid, fev.force, icm.shape, icm.box)
        key = None
        if icm.temperature > 0:
            state, key = next_key(state)
            if thermal_drift:
                state, k_rfd = next_key(state)
                f_grid = f_grid + thermal_drift_forcing(
                    icm, x_mid, k_rfd, delta=rfd_delta
                )
        fluid_new = icm.fluid_step(fluid, f_grid, key)
        # corrector: full step with midpoint fluid velocity
        v_mid_field = 0.5 * (fluid.v + fluid_new.v)
        v_mid = interpolate(kern, x_mid, v_mid_field, icm.box)
        new_pos = state.pos + dt * v_mid
        state = state.replace(pos=new_pos, force=fev.force)
        return advance_time(state, icm.dt), (fluid_new, aux)

    return Integrator(init=init, step=step)
