"""PairForces: radial potential -> per-particle force/energy/virial.

TPU-native analog of the reference PairForces interactor (reference:
src/Interactor/PairForces.cuh:23, PairForces.cu:43-78). Builds a pair kernel
from a radial potential and runs it over a neighbour list, or over all pairs
when the box is small relative to the cutoff — the reference's automatic
NBody fallback (PairForces.cu:50-53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.box import Box
from ..core.types import Computables, ForceEnergyVirial
from ..neighbors.neighbor_list import NeighborList
from ..neighbors.pair_map import apply_pairs, apply_pairs_dense


def make_pair_kernel(potential, computables: Computables):
    """Build pair_kernel(r2, dr, info_i, info_j, idx) -> dict of contributions.

    info is the per-particle type id (or None for single-species)."""

    def kernel(r2, dr, info_i, info_j, idx):
        ti = info_i if info_i is not None else jnp.int32(0)
        tj = info_j if info_j is not None else jnp.int32(0)
        rc2 = potential.cutoff2(ti, tj)
        inside = (r2 < rc2) & (r2 > 0)
        r2safe = jnp.where(inside, r2, jnp.ones((), r2.dtype))
        out = {}
        if computables.force or computables.virial or computables.stress:
            g = jnp.where(inside, potential.force_div_r(r2safe, ti, tj), 0)
            if computables.force:
                out["force"] = g[..., None] * dr
            if computables.virial:
                out["virial"] = -0.5 * g * r2
            if computables.stress:
                # per-particle symmetric stress tensor, packed
                # (xx, xy, xz, yy, yz, zz); trace = virial
                # (reference: Interactor.cuh:98)
                hg = -0.5 * g
                out["stress"] = jnp.stack(
                    [
                        hg * dr[..., 0] * dr[..., 0],
                        hg * dr[..., 0] * dr[..., 1],
                        hg * dr[..., 0] * dr[..., 2],
                        hg * dr[..., 1] * dr[..., 1],
                        hg * dr[..., 1] * dr[..., 2],
                        hg * dr[..., 2] * dr[..., 2],
                    ],
                    axis=-1,
                )
        if computables.energy:
            out["energy"] = 0.5 * jnp.where(
                inside, potential.energy(r2safe, ti, tj), 0
            )
        return out

    return kernel


def pair_forces(
    potential,
    pos: jax.Array,
    nlist: NeighborList | None = None,
    *,
    box: Box | None = None,
    type_id: jax.Array | None = None,
    computables: Computables = Computables(),
) -> ForceEnergyVirial:
    """Sum the potential over pairs.

    With ``nlist`` given, runs the Verlet-list path; otherwise the dense
    O(N^2) NBody path over ``box`` (reference: PairForces.cu:50-53).
    """
    kernel = make_pair_kernel(potential, computables)
    if nlist is not None:
        out = apply_pairs(kernel, nlist, pos, info=type_id, box=box)
    else:
        assert box is not None, "dense path needs a box"
        out = apply_pairs_dense(kernel, pos, box, info=type_id)
    return ForceEnergyVirial(
        force=out.get("force"),
        energy=out.get("energy"),
        virial=out.get("virial"),
        stress=out.get("stress"),
    )
