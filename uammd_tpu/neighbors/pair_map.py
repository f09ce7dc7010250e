"""Pair-interaction combinator: the Transverser executor.

The reference's Transverser contract (zero/getInfo/compute/accumulate/set,
reference: src/utils/TransverserUtils.cuh:34-200) lets one functor run over
CellList, VerletList, LBVH, or O(N^2) NBody unchanged
(reference: src/Interactor/PairForces.cu:43-68). The TPU-native equivalent is
a *pair kernel*: a pure function

    pair_kernel(r2, dr, info_i, info_j, pair_index) -> pytree of per-pair values

mapped over either a fixed-capacity neighbour list (``apply_pairs``) or all
pairs (``apply_pairs_dense``, the NBody path, reference: src/Interactor/
NBody.cuh:29). Outputs are masked and summed over neighbours; ``info`` is any
pytree of per-particle arrays (the getInfo stage) gathered for i and j.

Both executors vectorize entirely on the VPU; the dense path is tiled by
``lax.map`` chunks to bound memory, mirroring NBody's shared-memory tiling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.box import Box
from .neighbor_list import NeighborList


def _mask_tree(tree, mask):
    def f(x):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, jnp.zeros((), x.dtype))

    return jax.tree_util.tree_map(f, tree)


def apply_pairs(
    pair_kernel,
    nlist: NeighborList,
    pos: jax.Array,
    info=None,
    *,
    box: Box | None = None,
):
    """Sum ``pair_kernel`` over each particle's neighbour list entries.

    Returns a pytree of per-particle sums: leaf shapes [N, ...].
    ``dr`` passed to the kernel is the minimum-image vector r_j - r_i.
    """
    box = box or nlist.box
    n = pos.shape[0]
    j = nlist.idx  # [N, K]
    jm = jnp.minimum(j, n - 1)
    mask = j < n
    rj = pos[jm]  # [N, K, 3]
    dr = box.wrap(rj - pos[:, None, :])
    r2 = jnp.sum(dr * dr, axis=-1)

    if info is not None:
        info_i = jax.tree_util.tree_map(lambda a: a[:, None, ...], info)
        info_j = jax.tree_util.tree_map(lambda a: a[jm], info)
    else:
        info_i = info_j = None

    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    out = pair_kernel(r2, dr, info_i, info_j, (i_idx, j))
    out = _mask_tree(out, mask)
    return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=1), out)


def apply_pairs_dense(
    pair_kernel,
    pos: jax.Array,
    box: Box,
    info=None,
    *,
    include_self: bool = False,
    chunk: int = 4096,
):
    """All-pairs executor (reference NBody.cuh:29): O(N^2), tiled over rows."""
    n = pos.shape[0]
    j_idx = jnp.arange(n, dtype=jnp.int32)

    def row_block(i_block):
        pi = pos[i_block]  # [C, 3]
        dr = box.wrap(pos[None, :, :] - pi[:, None, :])  # [C, N, 3]
        r2 = jnp.sum(dr * dr, axis=-1)
        if info is not None:
            info_i = jax.tree_util.tree_map(lambda a: a[i_block][:, None, ...], info)
            info_j = jax.tree_util.tree_map(lambda a: a[None, ...], info)
        else:
            info_i = info_j = None
        out = pair_kernel(r2, dr, info_i, info_j, (i_block[:, None], j_idx[None, :]))
        if not include_self:
            mask = i_block[:, None] != j_idx[None, :]
            out = _mask_tree(out, mask)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=1), out)

    chunk = min(chunk, n)
    pad = (-n) % chunk
    rows = jnp.arange(n + pad, dtype=jnp.int32) % n
    out = jax.lax.map(row_block, rows.reshape(-1, chunk))
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:])[:n], out
    )
