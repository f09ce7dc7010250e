"""Dissipative Particle Dynamics pair forces.

TPU-native analog of the reference DPD potential (reference:
src/Interactor/Potential/DPD.cuh:41-192): conservative + dissipative +
random pair forces

    F_ij = [ A w(r) - gamma w(r)^2 (v_ij . rhat) + sigma w(r) xi_ij / sqrt(dt) ] rhat
    w(r) = 1 - r/rc,   sigma = sqrt(2 kT gamma)

with xi_ij a per-pair, per-step standard normal that is symmetric in (i, j) —
the reference uses Saru seeded by the particle id pair and step
(DPD.cuh:106-120); here core.rng.pair_normal provides the same property via a
counter-based hash evaluated on the VPU, so the random force costs no gathers
and conserves momentum exactly.

Used inside a Verlet NVE integrator (the DPD thermostat provides temperature),
matching the reference usage (DPD.cuh docs header).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import rng as prng
from ..core.box import Box
from ..core.types import Computables, ForceEnergyVirial
from ..neighbors.neighbor_list import NeighborList
from ..neighbors.pair_map import apply_pairs


@dataclasses.dataclass(frozen=True)
class DPD:
    cutoff: float = 1.0
    A: float = 1.0  # conservative strength (reference: strength parameter)
    gamma: float = 4.0
    temperature: float = 1.0
    dt: float = 0.01

    @property
    def max_cutoff(self) -> float:
        return self.cutoff


def dpd_forces(
    params: DPD,
    pos: jax.Array,
    vel: jax.Array,
    nlist: NeighborList,
    step: jax.Array,
    *,
    box: Box | None = None,
) -> ForceEnergyVirial:
    """Sum DPD pair forces over the neighbour list."""
    rc = params.cutoff
    sigma = (2.0 * params.temperature * params.gamma) ** 0.5
    inv_sqrt_dt = 1.0 / params.dt**0.5
    dtype = pos.dtype

    def kernel(r2, dr, info_i, info_j, idx):
        i, j = idx
        vi, ii = info_i
        vj, jj = info_j
        inside = (r2 < rc * rc) & (r2 > 1e-12)
        r2s = jnp.where(inside, r2, jnp.ones((), r2.dtype))
        rinv = jax.lax.rsqrt(r2s)
        w = jnp.where(inside, 1.0 - jnp.sqrt(r2s) / rc, 0.0)  # [N, K]
        rhat = dr * rinv[..., None]
        vij = vj - vi
        vdotr = jnp.sum(vij * rhat, axis=-1)
        xi = prng.pair_normal(ii, jj, step.astype(jnp.uint32), dtype)
        fmod = (
            params.A * w
            - params.gamma * w * w * vdotr
            + sigma * w * xi * inv_sqrt_dt
        )
        # force on i along -rhat for repulsion: rhat points i->j, so F_i =
        # -fmod * rhat (conservative A pushes apart)
        return {"force": -fmod[..., None] * rhat}

    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)
    out = apply_pairs(kernel, nlist, pos, info=(vel, ids), box=box)
    return ForceEnergyVirial(force=out["force"])


def make_dpd_force_fn(params: DPD, maybe_rebuild_fn=None):
    """force_fn(state, nlist) for integrators.verlet.nve — the reference runs
    DPD under VerletNVE (DPD.cuh header example)."""
    from ..neighbors.neighbor_list import maybe_rebuild

    def force_fn(state, nbrs):
        nbrs = maybe_rebuild(nbrs, state.pos)
        fev = dpd_forces(
            params, state.pos, state.get_vel(), nbrs,
            state.step if state.step is not None else jnp.int32(0),
        )
        return fev, nbrs

    return force_fn
