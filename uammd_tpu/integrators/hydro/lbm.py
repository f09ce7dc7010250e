"""Lattice Boltzmann D3Q19 (BGK collision).

TPU-native analog of the reference LBM module (reference:
src/Integrator/Hydro/LBM.cuh:12, LBM.cu — flagged WIP in the reference
README.md:31). Collide-and-stream with the standard D3Q19 stencil, BGK
single-relaxation-time collision, and bounce-back solid cells. Streaming is
19 lane/axis rolls of the distribution array — exactly the roll idiom the
pair-force engine uses, so it maps perfectly onto the TPU.

State: f [19, nx, ny, nz] distributions; solid mask optional.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# D3Q19 velocities and weights
_C = np.array(
    [
        [0, 0, 0],
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
        [1, 1, 0], [-1, -1, 0], [1, -1, 0], [-1, 1, 0],
        [1, 0, 1], [-1, 0, -1], [1, 0, -1], [-1, 0, 1],
        [0, 1, 1], [0, -1, -1], [0, 1, -1], [0, -1, 1],
    ],
    dtype=np.int32,
)
_W = np.array(
    [1 / 3] + [1 / 18] * 6 + [1 / 36] * 12, dtype=np.float64
)
_OPP = np.array(
    [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15, 18, 17],
    dtype=np.int32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LBMState:
    f: jax.Array  # [19, nx, ny, nz]


@dataclasses.dataclass(frozen=True)
class D3Q19:
    shape: tuple
    tau: float = 0.9  # BGK relaxation time (nu = cs^2 (tau - 1/2))
    dtype: object = jnp.float32

    @property
    def viscosity(self) -> float:
        return (self.tau - 0.5) / 3.0  # lattice units, cs^2 = 1/3

    def equilibrium(self, rho, u):
        c = jnp.asarray(_C, u.dtype)
        w = jnp.asarray(_W, u.dtype)
        cu = jnp.einsum("qa,xyza->qxyz", c, u)
        u2 = jnp.sum(u * u, axis=-1)[None]
        return (
            w[:, None, None, None]
            * rho[None]
            * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * u2)
        )

    def moments(self, f):
        rho = jnp.sum(f, axis=0)
        c = jnp.asarray(_C, f.dtype)
        mom = jnp.einsum("qa,qxyz->xyza", c, f)
        return rho, mom / jnp.maximum(rho, 1e-12)[..., None]

    def init_state(self, rho0=1.0, u0=None) -> LBMState:
        rho = jnp.full(self.shape, jnp.asarray(rho0, self.dtype))
        u = (
            jnp.zeros(tuple(self.shape) + (3,), self.dtype)
            if u0 is None
            else jnp.broadcast_to(
                jnp.asarray(u0, self.dtype), tuple(self.shape) + (3,)
            )
        )
        return LBMState(f=self.equilibrium(rho, u))

    def step(self, state: LBMState, solid=None, body_force=None) -> LBMState:
        """One collide + stream (+ bounce-back on solid cells)."""
        f = state.f
        rho, u = self.moments(f)
        if body_force is not None:
            # Guo-lite forcing: shift the equilibrium velocity
            u = u + jnp.asarray(body_force, f.dtype) * (
                self.tau / jnp.maximum(rho, 1e-12)[..., None]
            )
        feq = self.equilibrium(rho, u)
        f_post = f - (f - feq) / self.tau
        if solid is not None:
            # full bounce-back: reverse populations on solid cells
            f_post = jnp.where(solid[None], f_post[jnp.asarray(_OPP)], f_post)
        # stream: shift each population along its lattice vector
        shifted = [
            jnp.roll(f_post[q], tuple(int(s) for s in _C[q]), axis=(0, 1, 2))
            for q in range(19)
        ]
        return LBMState(f=jnp.stack(shifted))

    def run(self, state: LBMState, n_steps: int, solid=None, body_force=None):
        @jax.jit
        def go(s):
            def body(st, _):
                return self.step(st, solid, body_force), None

            out, _ = jax.lax.scan(body, s, None, length=n_steps)
            return out

        return go(state)
