"""Sharded spectral FCM (distributed FFT over the 8-device CPU mesh) vs the
single-device FCM mobility (SURVEY 2.6/§5: sharded FFT via all-to-all)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.integrators.bdhi.fcm import FCM
from uammd_tpu.parallel.atom import make_mesh
from uammd_tpu.parallel.spectral import (
    gather_shards,
    make_sharded_fcm_mf,
    shard_particles_x,
)


def test_sharded_fcm_matches_single_device():
    n, L, eta, a = 320, 16.0, 1.3, 0.7
    b = box(L)
    shape, support = (48, 48, 48), 6
    rng = np.random.default_rng(0)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    F = jnp.asarray(rng.normal(size=(n, 3)))

    fcm = FCM(box=b, viscosity=eta, radius=a, shape=shape, support=support,
              box_size=(L, L, L))
    ref = np.asarray(fcm.compute_mf(pos, F))

    mesh = make_mesh(8, axis="x")
    mf = make_sharded_fcm_mf(
        mesh, b, viscosity=eta, radius=a, shape=shape, support=support,
        axis="x",
    )
    pos_sh, f_sh, mask, order = shard_particles_x(pos, F, 8, b)
    out_sh = mf(pos_sh, f_sh, mask)
    out = np.asarray(gather_shards(out_sh, mask, order, n))

    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-10, err


def test_sharded_fcm_kz_padding_path():
    """Grid whose nz/2+1 is not a multiple of the mesh exercises the kz pad
    (nz = 30 -> nzr = 16 on 8 devices is exact; nz = 36 -> nzr = 19 pads)."""
    n, L, eta, a = 128, 14.0, 1.0, 0.6
    b = box(L)
    shape, support = (40, 36, 36), 4
    rng = np.random.default_rng(1)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    F = jnp.asarray(rng.normal(size=(n, 3)))

    fcm = FCM(box=b, viscosity=eta, radius=a, shape=shape, support=support,
              box_size=(L, L, L))
    ref = np.asarray(fcm.compute_mf(pos, F))

    mesh = make_mesh(8, axis="x")
    mf = make_sharded_fcm_mf(
        mesh, b, viscosity=eta, radius=a, shape=shape, support=support,
        axis="x",
    )
    pos_sh, f_sh, mask, order = shard_particles_x(pos, F, 8, b)
    out = np.asarray(gather_shards(mf(pos_sh, f_sh, mask), mask, order, n))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-10, err
