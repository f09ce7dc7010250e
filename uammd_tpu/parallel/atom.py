"""Multi-chip parallel MD: atom decomposition over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.6); scaling is a design
addition. This module implements the first parallel strategy, *atom
decomposition*: the particle SoA is sharded over a 1-D mesh axis ("p"),
positions are all-gathered over ICI each step (XLA collective), each chip
computes forces for its own shard against all particles, and integration is
embarrassingly shard-local. This is exact (no cutoff approximation error) and
maps well to small/medium N; spatial domain decomposition with halo exchange
(cell-sharded) is the follow-up strategy for large N in parallel/domain.py.

Everything is expressed with ``shard_map`` over a ``jax.sharding.Mesh`` so the
same program runs on a v5e pod slice (ICI collectives) or a CPU mesh for
testing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.box import Box
from ..core.state import SimState


def make_mesh(n_devices: int | None = None, axis: str = "p") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested {n}-device mesh but only {len(devs)} devices are "
            f"visible (set XLA_FLAGS=--xla_force_host_platform_device_count)"
        )
    return Mesh(devs[:n], (axis,))


def sharded_lj_langevin_step(
    mesh: Mesh,
    box: Box,
    *,
    epsilon: float = 1.0,
    sigma: float = 1.0,
    cutoff: float = 2.5,
    dt: float = 0.005,
    temperature: float = 1.0,
    friction: float = 1.0,
    axis: str = "p",
):
    """One Gronbech-Jensen Langevin step, sharded over particles.

    Returns step(pos, vel, force, key_data) -> (pos, vel, force, key_data),
    jitted with in/out shardings P(axis) on the particle dimension. The pair
    force uses an all_gather over the mesh axis: each chip evaluates its
    [N/d, N] block of the interaction matrix (the TPU analog of the
    reference's NBody tiled kernel, reference: src/Interactor/NBodyBase.cuh:119).
    """
    spec = P(axis)
    rep = P()

    def local_forces(pos_local, pos_all):
        dr = box.wrap(pos_all[None, :, :] - pos_local[:, None, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        inside = (r2 < cutoff * cutoff) & (r2 > 1e-12)
        r2s = jnp.where(inside, r2, 1.0)
        inv2 = sigma * sigma / r2s
        inv6 = inv2 * inv2 * inv2
        g = jnp.where(inside, -(24.0 * epsilon / r2s) * (2.0 * inv6 * inv6 - inv6), 0.0)
        return jnp.sum(g[..., None] * dr, axis=1)

    def step_shard(pos, vel, force, key_data):
        # pos/vel/force: [N/d, 3] local shards; key_data: [d, 2] -> [1, 2] local
        key = jax.random.wrap_key_data(key_data[0])
        key, sub = jax.random.split(key)
        m = 1.0
        gdt = 0.5 * friction * dt
        b = 1.0 / (1.0 + gdt)
        a = (1.0 - gdt) * b
        amp = jnp.sqrt(jnp.asarray(2.0 * temperature * friction * dt * m, pos.dtype))
        noise = amp * jax.random.normal(sub, pos.shape, pos.dtype)
        x = pos + b * dt * vel + (0.5 * b * dt / m) * (dt * force + noise)
        v = a * vel + (0.5 * dt / m) * a * force + (b / m) * noise
        x_all = jax.lax.all_gather(x, axis).reshape(-1, 3)
        f_new = local_forces(x, x_all)
        v = v + (0.5 * dt / m) * f_new
        return x, v, f_new, jax.random.key_data(key)[None]

    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
    )
    return jax.jit(step)


def initial_sharded_arrays(mesh: Mesh, n: int, box: Box, seed=0, axis: str = "p"):
    """Build sharded pos/vel/force/key arrays for the step above."""
    d = mesh.devices.size
    assert n % d == 0, "N must divide the mesh for the dryrun"
    import numpy as np

    rng = np.random.default_rng(seed)
    L = np.asarray(jax.device_get(box.size))
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32)
    force = jnp.zeros((n, 3), jnp.float32)
    keys = jax.vmap(jax.random.key_data)(
        jax.random.split(jax.random.key(seed), d)
    )
    sharding = NamedSharding(mesh, P(axis))
    pos, vel, force = (jax.device_put(x, sharding) for x in (pos, vel, force))
    keys = jax.device_put(keys, sharding)
    return pos, vel, force, keys
