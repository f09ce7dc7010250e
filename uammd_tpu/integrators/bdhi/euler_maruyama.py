"""BDHI Euler-Maruyama driver: dX = (K X + M F) dt + sqrt(2 kT dt) B dW.

TPU-native analog of the reference driver (reference:
src/Integrator/BDHI/BDHI_EulerMaruyama.cu:125-166). Any backend exposing

    compute_mf(pos, F)  -> M F            [N, 3]
    compute_bdw(pos, key) -> B dW         [N, 3]  (B B^T = M)
    divergence(pos)     -> kT div M       [N, 3]  (zero for RPY in 3D)

plugs in — the same contract as the reference's BDHI::Method template
(BDHI_Cholesky.cuh:41-45 computeMF/computeBdW/computeDivM).

Backends provided here: ``CholeskyBDHI`` (dense, reference BDHI_Cholesky)
and ``LanczosBDHI`` (matrix-free Krylov, reference BDHI_Lanczos). The
spectral backends (FCM / PSE) live in fcm.py / pse.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from ...core.state import SimState, next_key
from ...solvers.lanczos import lanczos_sqrt_apply
from ..base import Integrator, advance_time
from .rpy import cholesky_sqrt_dot, dense_mobility, rpy_matvec


@dataclasses.dataclass(frozen=True)
class CholeskyBDHI:
    """Dense RPY + Cholesky noise (reference: BDHI_Cholesky.cuh)."""

    viscosity: float = 1.0
    radius: float = 1.0
    box: object = None

    def compute_mf(self, pos, f):
        M = dense_mobility(
            pos, viscosity=self.viscosity, radius=self.radius, box=self.box
        )
        return (M @ f.reshape(-1)).reshape(-1, 3)

    def compute_bdw(self, pos, key):
        M = dense_mobility(
            pos, viscosity=self.viscosity, radius=self.radius, box=self.box
        )
        z = jax.random.normal(key, (pos.shape[0] * 3,), pos.dtype)
        return cholesky_sqrt_dot(M, z).reshape(-1, 3)

    def divergence(self, pos):
        return jnp.zeros_like(pos)


@dataclasses.dataclass(frozen=True)
class LanczosBDHI:
    """Matrix-free RPY + Lanczos sqrt(M) (reference: BDHI_Lanczos.cuh)."""

    viscosity: float = 1.0
    radius: float = 1.0
    box: object = None
    iterations: int = 24

    def _mv(self, pos):
        def mv(x):
            return rpy_matvec(
                pos, x.reshape(-1, 3),
                viscosity=self.viscosity, radius=self.radius, box=self.box,
            ).reshape(-1)

        return mv

    def compute_mf(self, pos, f):
        return rpy_matvec(
            pos, f, viscosity=self.viscosity, radius=self.radius, box=self.box
        )

    def compute_bdw(self, pos, key):
        z = jax.random.normal(key, (pos.shape[0] * 3,), pos.dtype)
        out, _res = lanczos_sqrt_apply(self._mv(pos), z, m=self.iterations)
        return out.reshape(-1, 3)

    def divergence(self, pos):
        return jnp.zeros_like(pos)


def bdhi_euler_maruyama(
    force_fn,
    backend,
    dt: float,
    temperature: float = 0.0,
    K=None,
    *,
    is2D: bool = False,
) -> Integrator:
    """The EulerMaruyama<Method> integrator (BDHI_EulerMaruyama.cu:125-166)."""

    def init(state, aux):
        if state.force is None:
            state = state.replace(force=jnp.zeros_like(state.pos))
        return state, aux

    def step(state, aux):
        h = jnp.asarray(dt, state.dtype)
        fev, aux = force_fn(state, aux)
        mf = backend.compute_mf(state.pos, fev.force)
        dx = h * mf
        if K is not None:
            dx = dx + h * (state.pos @ jnp.asarray(K, state.dtype).T)
        if temperature > 0:
            state, k = next_key(state)
            bdw = backend.compute_bdw(state.pos, k)
            dx = dx + jnp.sqrt(2.0 * temperature * h) * bdw
            dx = dx + temperature * h * backend.divergence(state.pos)
        if is2D:
            dx = dx * jnp.asarray([1.0, 1.0, 0.0], state.dtype)
        return advance_time(
            state.replace(pos=state.pos + dx, force=fev.force), dt
        ), aux

    return Integrator(init=init, step=step)


def fcm_em(
    force_fn,
    fcm,
    dt: float,
    temperature: float = 0.0,
    *,
    slack: int = 1,
) -> Integrator:
    """Euler-Maruyama on the FCM backend with the fused spectral pass and
    persistent pencil bins: one spread + one k-space combine (deterministic
    mobility AND fluctuation) + one interpolation per step (reference:
    FCM_impl.cuh:654-693 with addBrownianNoise :437 in the same
    convolution), and the particle->pencil binning carried across steps,
    rebuilt only when some particle's x/y drift exceeds ``slack`` far-grid
    points (the pencil spread stays exact until then — solvers/pencil_ibm).

    The generic ``bdhi_euler_maruyama`` + FCM pays two spectral passes and
    two binning sorts per step; this integrator pays one pass and ~0
    amortized sorts."""
    amp = math.sqrt(2.0 * temperature / dt) if temperature > 0 else 0.0
    hmin = min(fcm.box_size[0] / fcm.shape[0], fcm.box_size[1] / fcm.shape[1])
    thr = slack * hmin
    Ls = fcm.box_size

    def init(state, aux):
        if state.force is None:
            state = state.replace(force=jnp.zeros_like(state.pos))
        bins = fcm.pencil_bins(state.pos, slack=slack)
        return state, (bins, state.pos, aux)

    def _wdrift(pos, ref, d):
        dd = pos[:, d] - ref[:, d]
        return jnp.max(jnp.abs(dd - Ls[d] * jnp.round(dd / Ls[d])))

    def step(state, carry):
        bins, ref, aux = carry
        h = jnp.asarray(dt, state.dtype)
        fev, aux = force_fn(state, aux)
        if bins is None:
            # pencil path unavailable (small N / unsafe grid): per-call
            if temperature > 0:
                state, k = next_key(state)
                mf = fcm.compute_mf_bdw(state.pos, fev.force, k, amp)
            else:
                mf = fcm.compute_mf(state.pos, fev.force)
            new = (None, ref, aux)
        else:
            need = jnp.maximum(
                _wdrift(state.pos, ref, 0), _wdrift(state.pos, ref, 1)
            ) > jnp.asarray(thr, state.dtype)
            pos = state.pos

            def rebin(_):
                return fcm.pencil_bins(pos, slack=slack), pos

            def keep(_):
                return bins, ref

            bins2, ref2 = jax.lax.cond(need, rebin, keep, None)
            if temperature > 0:
                state, k = next_key(state)
                mf = fcm.compute_mf_bdw(state.pos, fev.force, k, amp,
                                        bins=bins2, slack=slack)
            else:
                mf = fcm.compute_mf(state.pos, fev.force, bins=bins2,
                                    slack=slack)
            new = (bins2, ref2, aux)
        dx = h * mf
        return advance_time(
            state.replace(pos=state.pos + dx, force=fev.force), dt
        ), new

    return Integrator(init=init, step=step)
