"""SPH on the grid-resident fast engine.

The reference runs every pair interaction — SPH's two sweeps included —
through the same fast transverser kernel (reference:
src/Interactor/SPH.cuh:44, SPH.cu:7-27 density + force transversers over a
VerletList). Round 2 left SPH on the gathered [N, K] neighbour path
(interactors/sph.py); this module gives it the engine treatment: both SPH
sweeps run over the lane-rolled channel kernel —

1. density: rho_i = sum_j m_j W(r_ij) with the mass riding as a channel
   (self term m_i W(0) added elementwise);
2. force: pressure-gradient + artificial-viscosity pair force with
   (P/rho^2, velocity, mass) channels, identical math to
   interactors/sph.py (same cubic-spline kernel, SPH/Kernel.cuh:18-45).

Integration: velocity Verlet with the half-kicked velocity entering the
viscous force (the DPD engine's Groot-Warren lambda = 1/2 structure; the
reference runs SPH under VerletNVE with the current velocities —
docs/SPH.rst).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..interactors.sph import (
    SPHParams,
    cubic_spline_gradw_over_r,
    cubic_spline_w,
)
from .layout import GridSpec, GridState, choose_spec, pack
from .pair_kernel import make_pair_channel_kernel
from .rebin_kernel import rebin_fast_noforce


def sph_density_pair_fn(h: float):
    cut2 = np.float32(4.0 * h * h)

    def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
        (mj,) = ch_j
        inside = (r2 < cut2) & (r2 > 1e-12)
        r2s = jnp.where(inside, r2, 1.0)
        w = cubic_spline_w(r2s, np.float32(h))
        return (jnp.where(inside, mj * w, 0.0),)

    return pair_fn


def sph_force_pair_fn(params: SPHParams):
    h = params.support
    cut2 = np.float32(4.0 * h * h)
    nu = np.float32(params.viscosity)

    def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
        p_i, vxi, vyi, vzi, mi = ch_i
        p_j, vxj, vyj, vzj, mj = ch_j
        inside = (r2 < cut2) & (r2 > 1e-12)
        r2s = jnp.where(inside, r2, 1.0)
        # (v_i - v_j) . (r_i - r_j) == (v_j - v_i) . (r_j - r_i)
        dvdotdr = ((vxj - vxi) * dxv + (vyj - vyi) * dyv
                   + (vzj - vzi) * dzv)
        visc = -nu * dvdotdr / (r2s + 1e-3)
        gw = cubic_spline_gradw_over_r(r2s, np.float32(h))
        # interactors/sph.py: F_i += -mi mj (Pi + Pj + visc) grad_i W,
        # grad_i W = gw (r_i - r_j) = -gw * (dxv, dyv, dzv)
        fmod = jnp.where(inside, mi * mj * (p_i + p_j + visc) * gw, 0.0)
        return fmod * dxv, fmod * dyv, fmod * dzv

    return pair_fn


@dataclasses.dataclass(frozen=True)
class GridSPH:
    """Slot-resident SPH engine (two channel-kernel sweeps per force)."""

    spec: GridSpec
    params: SPHParams
    dt: float
    mass: float = 1.0

    @staticmethod
    def create(box_size, n, params: SPHParams = SPHParams(), *, dt=0.01,
               mass=1.0, skin=1.1, cap=None, pos=None, interpret=None):
        spec = choose_spec(box_size, n, params.max_cutoff, skin=skin,
                           cap=cap, pos=pos)
        md = GridSPH(spec=spec, params=params, dt=dt, mass=mass)
        object.__setattr__(
            md, "_rho_kern",
            make_pair_channel_kernel(
                spec, sph_density_pair_fn(params.support), 1, 1,
                interpret=interpret,
            ),
        )
        object.__setattr__(
            md, "_f_kern",
            make_pair_channel_kernel(
                spec, sph_force_pair_fn(params), 5, 3, interpret=interpret,
            ),
        )
        return md

    def density(self, gs: GridState) -> jax.Array:
        """Slot-space rho (zero on empty slots)."""
        m = gs.mask
        mch = jnp.where(m, np.float32(self.mass), 0.0)
        (rho,) = self._rho_kern(gs.x, gs.y, gs.z, mch)
        # W(0) = (2^3 - 4*1^3) / (4 pi h^3) = 1/(pi h^3)
        w0 = 1.0 / (math.pi * self.params.support ** 3)
        return (rho + np.float32(self.mass * w0)) * m

    def compute_forces(self, gs: GridState, vx, vy, vz) -> tuple:
        p = self.params
        m = gs.mask
        rho = self.density(gs)
        rho_s = jnp.where(m, rho, 1.0)
        pressure = p.gas_stiffness * (rho_s - p.rest_density)
        p_div_rho2 = jnp.where(m, pressure / (rho_s * rho_s), 0.0)
        mch = jnp.where(m, np.float32(self.mass), 0.0)
        return self._f_kern(
            gs.x, gs.y, gs.z, p_div_rho2, vx, vy, vz, mch
        )

    def init(self, pos, seed=0, vel=None) -> GridState:
        gs = pack(self.spec, pos, vel=vel, key=jax.random.key(seed))
        fx, fy, fz = self.compute_forces(gs, gs.vx, gs.vy, gs.vz)
        return gs.replace(fx=fx, fy=fy, fz=fz)

    def step(self, gs: GridState) -> GridState:
        """Velocity Verlet; the t+dt force sees the half-kicked velocity
        (viscous force is velocity-dependent, the DPD-engine structure)."""
        spec = self.spec
        dt = np.float32(self.dt)
        hv = np.float32(0.5 * self.dt / self.mass)
        m = gs.mask
        vxh = (gs.vx + hv * gs.fx) * m
        vyh = (gs.vy + hv * gs.fy) * m
        vzh = (gs.vz + hv * gs.fz) * m
        x = gs.x + jnp.where(m, dt * vxh, 0.0)
        y = gs.y + jnp.where(m, dt * vyh, 0.0)
        z = gs.z + jnp.where(m, dt * vzh, 0.0)
        gs = gs.replace(x=x, y=y, z=z, vx=vxh, vy=vyh, vz=vzh,
                        step=gs.step + 1)
        d2 = jnp.max(
            jnp.where(m, (x - gs.ref_x) ** 2 + (y - gs.ref_y) ** 2
                      + (z - gs.ref_z) ** 2, 0.0)
        )
        thr2 = jnp.float32(spec.drift_threshold ** 2)
        gs = lax.cond(d2 > thr2, rebin_fast_noforce, lambda g: g, gs)
        fx, fy, fz = self.compute_forces(gs, gs.vx, gs.vy, gs.vz)
        vx = (gs.vx + hv * fx) * gs.mask
        vy = (gs.vy + hv * fy) * gs.mask
        vz = (gs.vz + hv * fz) * gs.mask
        return gs.replace(fx=fx, fy=fy, fz=fz, vx=vx, vy=vy, vz=vz)

    def run(self, gs: GridState, n_steps: int) -> GridState:
        @jax.jit
        def go(g):
            def body(c, _):
                return self.step(c), None
            out, _ = lax.scan(body, g, None, length=n_steps)
            return out

        return go(gs)
