"""Deserno coarse-grained lipid membrane model.

TPU-native analog of the reference Deserno module (reference:
src/misc/Deserno.cuh:1-35, Deserno.cu — Cooke-Kremer-Deserno 3-bead lipids):
a composite interactor combining

- WCA repulsion between all beads (head sigma_h = 0.95 sigma_t by the model)
- an attractive broad-well tail-tail potential (cos^2 tail, range w_c)
- FENE bonds along each 3-bead lipid
- a harmonic straightening bond between bead 1 and bead 3

Exposes ``deserno_forces(state, lipids, params, nlist)`` returning the summed
ForceEnergyVirial, plus a lipid-bilayer initial condition builder.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from ..core.types import Computables, ForceEnergyVirial
from ..neighbors.neighbor_list import NeighborList
from ..neighbors.pair_map import apply_pairs
from .bonded import Bonds, bonded_forces, bonds, fene, harmonic


@dataclasses.dataclass(frozen=True)
class DesernoParams:
    sigma: float = 1.0  # tail bead diameter
    epsilon: float = 1.0
    w_c: float = 1.6  # attraction range (in sigma; ~1.6 gives fluid bilayer)

    @property
    def sigma_head(self) -> float:
        return 0.95 * self.sigma

    @property
    def max_cutoff(self) -> float:
        return 2 ** (1 / 6) * self.sigma + self.w_c * self.sigma


def _wca(r2, sig, eps):
    rc2 = (2 ** (1 / 6) * sig) ** 2
    inside = (r2 < rc2) & (r2 > 1e-12)
    r2s = jnp.where(inside, r2, 1.0)
    inv6 = (sig * sig / r2s) ** 3
    g = jnp.where(inside, -(24.0 * eps / r2s) * (2 * inv6 * inv6 - inv6), 0.0)
    e = jnp.where(inside, 4 * eps * (inv6 * inv6 - inv6) + eps, 0.0)
    return g, e


def _tail_attraction(r2, sig, eps, wc):
    """cos^2 attractive well from rc to rc + wc (Deserno's tail-tail)."""
    rc = 2 ** (1 / 6) * sig
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    x = (r - rc) * (math.pi / (2 * wc))
    inside = (r >= rc) & (r < rc + wc)
    e = jnp.where(inside, -eps * jnp.cos(x) ** 2, 0.0)
    e = jnp.where(r < rc, -eps, e)  # plateau inside rc
    dedr = jnp.where(
        inside, eps * (math.pi / wc) * jnp.cos(x) * jnp.sin(x), 0.0
    )
    g = dedr / jnp.maximum(r, 1e-10)  # (dE/dr)/r
    return g, e


def deserno_pair_kernel(params: DesernoParams, computables: Computables):
    """Pair kernel over bead types: 0 = head, 1 = tail."""
    sig, eps, wc = params.sigma, params.epsilon, params.w_c * params.sigma

    def kernel(r2, dr, ti, tj, idx):
        both_tail = (ti == 1) & (tj == 1)
        sig_pair = jnp.where(
            both_tail, sig,
            jnp.where((ti == 0) & (tj == 0), params.sigma_head,
                      0.5 * (sig + params.sigma_head)),
        )
        g_rep, e_rep = _wca(r2, sig_pair, eps)
        g_att, e_att = _tail_attraction(r2, sig, eps, wc)
        g = g_rep + jnp.where(both_tail, g_att, 0.0)
        out = {}
        if computables.force:
            out["force"] = g[..., None] * dr
        if computables.energy:
            out["energy"] = 0.5 * (e_rep + jnp.where(both_tail, e_att, 0.0))
        return out

    return kernel


def deserno_forces(
    pos, type_id, lipid_bonds: Bonds, straight_bonds: Bonds,
    params: DesernoParams, nlist: NeighborList, box: Box | None = None,
    computables: Computables = Computables(),
) -> ForceEnergyVirial:
    kernel = deserno_pair_kernel(params, computables)
    out = apply_pairs(kernel, nlist, pos, info=type_id, box=box)
    fev = ForceEnergyVirial(
        force=out.get("force"), energy=out.get("energy")
    )
    fev = fev + bonded_forces(fene, lipid_bonds, pos, box, computables)
    fev = fev + bonded_forces(harmonic, straight_bonds, pos, box, computables)
    return fev


def build_bilayer(n_lipids_side: int, params: DesernoParams, area_per_lipid=1.2):
    """Flat bilayer initial condition: positions, types, bond lists.

    Returns (pos [N,3], type_id [N], lipid_bonds, straight_bonds) with
    N = 2 * side^2 lipids x 3 beads."""
    sig = params.sigma
    a = math.sqrt(area_per_lipid) * sig
    side = n_lipids_side
    lipids = []
    types = []
    for leaflet, zdir in ((0, 1.0), (1, -1.0)):
        for i in range(side):
            for j in range(side):
                x, y = (i + 0.5 * leaflet) * a, (j + 0.5 * leaflet) * a
                z0 = 0.5 * sig * zdir
                beads = [
                    [x, y, z0 + zdir * 2 * sig],  # head
                    [x, y, z0 + zdir * 1 * sig],  # tail 1
                    [x, y, z0],  # tail 2
                ]
                lipids.extend(beads)
                types.extend([0, 1, 1])
    pos = np.asarray(lipids)
    L = side * a
    pos[:, :2] -= L / 2
    n_l = 2 * side * side
    idx = np.arange(n_l * 3).reshape(n_l, 3)
    fene_pairs = np.concatenate([idx[:, [0, 1]], idx[:, [1, 2]]], axis=0)
    lipid_bonds = bonds(
        fene_pairs,
        k=np.full(len(fene_pairs), 30.0 * params.epsilon / sig**2),
        r0=np.full(len(fene_pairs), 1.5 * sig),
    )
    straight = bonds(
        idx[:, [0, 2]],
        k=np.full(n_l, 10.0 * params.epsilon / sig**2),
        r0=np.full(n_l, 4.0 * sig),
    )
    types = np.asarray(types, np.int32)
    return pos, types, lipid_bonds, straight, L
