"""DPD on the grid-resident fast engine.

The reference runs every pair potential — DPD included — through the same
fast transverser kernel (reference: src/Interactor/PairForces.cuh:23,
src/Interactor/Potential/DPD.cuh:41-192). Round 2 left DPD on the gathered
[N, K] neighbour path; this module gives it the engine treatment: the DPD
pair force (conservative + dissipative + random) runs over the lane-rolled
channel kernel with velocities and particle ids riding as channels, and the
per-pair random number is a counter-based integer hash evaluated in
registers — the Saru idiom (reference: DPD.cuh:106-120, saruprng.cuh) with
zero gathers and exact (i, j) symmetry, so momentum is conserved to the
bit.

The random variate is a symmetric triangular uniform-sum (variance-exact):
Groot & Warren's original DPD paper already notes uniform variates with the
right variance thermostat correctly; the fluctuation-dissipation pair only
constrains the second moment.

Integration: velocity-Verlet with the half-step velocity entering the
dissipative force (lambda = 1/2 Groot-Warren), as the reference's
VerletNVE + DPD combination does.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .layout import GridSpec, GridState, choose_spec, pack
from .pair_kernel import make_pair_channel_kernel
from .rebin_kernel import rebin_fast_noforce

_C1 = np.int32(0x85EBCA6B - (1 << 32))
_C2 = np.int32(0xC2B2AE35 - (1 << 32))
_C3 = np.int32(0x01000193)
_C4 = np.int32(0x6A09E667)
_SEED = np.int32(0x9E3779B9 - (1 << 32))


def _lsr(h, k):
    return lax.shift_right_logical(h, np.int32(k))


def _mix(h):
    """murmur3-style finalizer on int32 lanes (wrapping arithmetic ==
    uint32 semantics; logical shifts via lax.shift_right_logical)."""
    h = h ^ _lsr(h, 16)
    h = h * _C1
    h = h ^ _lsr(h, 13)
    h = h * _C2
    h = h ^ _lsr(h, 16)
    return h


def _hash(*words):
    h = jnp.full((), _SEED)
    for w in words:
        h = _mix(h ^ w) * _C3 + _C4
    return _mix(h)


def _u24f(h):
    """int32 hash -> uniform [0, 1) float32 from the top 24 bits."""
    return _lsr(h, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def dpd_pair_fn(rc: float, A: float, gamma: float, sigma_dt: float):
    """Channel-kernel pair function for DPD. Channels: (vx, vy, vz,
    pid_f, step_f). sigma_dt = sqrt(2 kT gamma / dt)."""
    rc2 = np.float32(rc * rc)
    inv_rc = np.float32(1.0 / rc)
    A_ = np.float32(A)
    g_ = np.float32(gamma)
    s_ = np.float32(sigma_dt)
    SQ6 = np.float32(math.sqrt(6.0))

    def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
        vxi, vyi, vzi, pidi, stepf = ch_i
        vxj, vyj, vzj, pidj, _ = ch_j
        inside = (r2 < rc2) & (r2 > 1e-10)
        r2s = jnp.where(inside, r2, 1.0)
        rinv = lax.rsqrt(r2s)
        w = 1.0 - r2s * rinv * inv_rc  # 1 - r/rc
        # relative velocity . rhat
        vdotr = ((vxj - vxi) * dxv + (vyj - vyi) * dyv
                 + (vzj - vzi) * dzv) * rinv
        # symmetric pair counter -> two uniforms -> triangular variate
        ii = pidi.astype(jnp.int32)
        jj = pidj.astype(jnp.int32)
        lo = jnp.minimum(ii, jj)
        hi = jnp.maximum(ii, jj)
        c = _hash(lo, hi)
        st = stepf.astype(jnp.int32)
        u1 = _u24f(_hash(c, st, np.int32(0x00BEEF01)))
        u2 = _u24f(_hash(c, st, np.int32(0x00F00D02)))
        xi = SQ6 * (u1 + u2 - 1.0)
        fmod = A_ * w - g_ * w * w * vdotr + s_ * w * xi
        # force on i along -rhat (rhat = dr * rinv points i -> j)
        f = jnp.where(inside, -fmod * rinv, 0.0)
        return f * dxv, f * dyv, f * dzv

    return pair_fn


@dataclasses.dataclass(frozen=True)
class GridDPD:
    """Slot-resident DPD MD engine (velocity Verlet + engine pair pass)."""

    spec: GridSpec
    rc: float
    A: float
    gamma: float
    temperature: float
    dt: float
    mass: float = 1.0

    @staticmethod
    def create(box_size, n, *, rc=1.0, A=25.0, gamma=4.5, temperature=1.0,
               dt=0.01, mass=1.0, skin=1.1, cap=None, pos=None,
               interpret=None):
        spec = choose_spec(box_size, n, rc, skin=skin, cap=cap, pos=pos)
        md = GridDPD(spec=spec, rc=rc, A=A, gamma=gamma,
                     temperature=temperature, dt=dt, mass=mass)
        sigma_dt = math.sqrt(2.0 * temperature * gamma / dt)
        object.__setattr__(
            md, "_kern",
            make_pair_channel_kernel(
                spec, dpd_pair_fn(rc, A, gamma, sigma_dt), 5, 3,
                interpret=interpret,
            ),
        )
        return md

    def compute_forces(self, gs: GridState, vx, vy, vz) -> tuple:
        """Engine pair pass at the given slot velocities."""
        pidf = gs.pid.astype(jnp.float32)
        stepf = jnp.full_like(gs.x, gs.step.astype(jnp.float32))
        return self._kern(gs.x, gs.y, gs.z, vx, vy, vz, pidf, stepf)

    def init(self, pos, seed=0, vel=None) -> GridState:
        gs = pack(self.spec, pos, vel=vel, key=jax.random.key(seed))
        if vel is None and self.temperature > 0:
            k1, k2 = jax.random.split(gs.key)
            sd = float(np.sqrt(self.temperature / self.mass))
            m = gs.mask
            gs = gs.replace(
                vx=sd * jax.random.normal(k1, gs.x.shape, jnp.float32) * m,
                vy=sd * jax.random.normal(
                    jax.random.fold_in(k1, 1), gs.x.shape, jnp.float32) * m,
                vz=sd * jax.random.normal(
                    jax.random.fold_in(k1, 2), gs.x.shape, jnp.float32) * m,
                key=k2,
            )
        fx, fy, fz = self.compute_forces(gs, gs.vx, gs.vy, gs.vz)
        return gs.replace(fx=fx, fy=fy, fz=fz)

    def step(self, gs: GridState) -> GridState:
        """DPD velocity Verlet: the force at t+dt is evaluated with the
        half-kicked velocity (Groot-Warren lambda = 1/2)."""
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

    def temperature_of(self, gs: GridState) -> jax.Array:
        ke = 0.5 * self.mass * jnp.sum(
            gs.vx**2 + gs.vy**2 + gs.vz**2
        )
        return 2.0 * ke / (3.0 * gs.n)
