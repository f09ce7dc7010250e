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


def test_sharded_pse_far_envelope_matches_single_device():
    """PSE far field = FCM with the sinc^2/Hashimoto envelope; the sharded
    path must match the single-device one exactly (multi-chip PSE far,
    reference: src/Integrator/BDHI/PSE/FarField.cuh)."""
    n, L, eta = 200, 16.0, 1.1
    b = box(L)
    shape, support = (48, 48, 48), 6
    sigma_split = 0.8
    radius_blob = sigma_split * np.sqrt(np.pi)
    rng = np.random.default_rng(3)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    F = jnp.asarray(rng.normal(size=(n, 3)))

    fcm = FCM(box=b, viscosity=eta, radius=radius_blob, shape=shape,
              support=support, box_size=(L, L, L),
              rpy_sinc_radius=1.0, hasimoto_k2=sigma_split**2)
    ref = np.asarray(fcm.compute_mf(pos, F))

    mesh = make_mesh(8, axis="x")
    mf = make_sharded_fcm_mf(
        mesh, b, viscosity=eta, radius=radius_blob, shape=shape,
        support=support, axis="x", rpy_sinc_radius=1.0,
        hasimoto_k2=sigma_split**2,
    )
    pos_sh, f_sh, mask, order = shard_particles_x(pos, F, 8, b)
    out = np.asarray(gather_shards(mf(pos_sh, f_sh, mask), mask, order, n))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-10, err

    # fused-noise path with amp 0 reduces to the same MF
    mfn = make_sharded_fcm_mf(
        mesh, b, viscosity=eta, radius=radius_blob, shape=shape,
        support=support, axis="x", rpy_sinc_radius=1.0,
        hasimoto_k2=sigma_split**2, noise=True,
    )
    out0 = np.asarray(gather_shards(
        mfn(pos_sh, f_sh, mask, jax.random.key(0), 0.0), mask, order, n
    ))
    err0 = np.abs(out0 - ref).max() / np.abs(ref).max()
    assert err0 < 1e-10, err0


def test_sharded_poisson_matches_single_device():
    from uammd_tpu.electrostatics.poisson import Poisson
    from uammd_tpu.parallel.spectral import make_sharded_poisson

    n, L, gw = 96, 20.0, 1.0
    b = box(L)
    rng = np.random.default_rng(4)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    q = rng.normal(size=n)
    q -= q.mean()
    q = jnp.asarray(q)

    # mesh-divisible grid; support sized to the slab width (the sharded
    # path requires support <= nx/D) — exact-match vs the same settings
    shape, support = (48, 48, 48), 6
    p = Poisson(box=b, epsilon=1.0, gw=gw, shape=shape,
                support=support, box_size=(L, L, L))
    phi_ref, E_ref = (np.asarray(v) for v in p.fields(pos, q))

    mesh = make_mesh(8, axis="x")
    sp = make_sharded_poisson(mesh, b, epsilon=1.0, gw=gw, shape=shape,
                              support=support, axis="x")
    pos_sh, q_sh, mask, order = shard_particles_x(pos, q[:, None], 8, b)
    phi_sh, E_sh = sp(pos_sh, q_sh[..., 0], mask)
    phi = np.asarray(gather_shards(phi_sh[..., None], mask, order, n))[:, 0]
    E = np.asarray(gather_shards(E_sh, mask, order, n))
    assert np.abs(phi - phi_ref).max() / np.abs(phi_ref).max() < 1e-10
    assert np.abs(E - E_ref).max() / np.abs(E_ref).max() < 1e-10


def test_sharded_dpstokes_matches_single_device():
    """x-slab + ky-sharded BVP DPStokes M F == the single-device solver."""
    from uammd_tpu.integrators.bdhi.dpstokes import DPStokes
    from uammd_tpu.parallel.spectral import make_sharded_dpstokes_mf

    n, L, H = 96, 16.0, 8.0
    b = box([L, L, H])
    rng = np.random.default_rng(3)
    pos = np.column_stack([
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * L,
        (rng.random(n) - 0.5) * 0.7 * H,
    ])
    pos = jnp.asarray(pos)
    F = jnp.asarray(rng.normal(size=(n, 3)))

    # radius 0.4 -> nx = 80: divisible by the 8-way mesh with slabs at
    # least as thick as the support-10 kernel
    dps = DPStokes.create(b, viscosity=1.2, radius=0.4,
                          points_per_radius=2.0, nz=20, mode="slit")
    ref = np.asarray(dps.compute_mf(pos, F))

    mesh = make_mesh(8, axis="x")
    mf = make_sharded_dpstokes_mf(mesh, dps, axis="x")
    pos_sh, f_sh, mask, order = shard_particles_x(pos, F, 8, b)
    out = np.asarray(gather_shards(mf(pos_sh, f_sh, mask), mask, order, n))

    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_sharded_fcm_2d_mesh_matches_single_device():
    """(x, y)-block decomposition on a 2x4 mesh: two-axis halo folds +
    two-stage distributed FFT == single-device FCM."""
    from uammd_tpu.parallel.spectral import (
        make_mesh_2d, make_sharded_fcm_mf_2d, shard_particles_xy)

    n, L, eta, a = 280, 16.0, 1.1, 0.6
    b = box(L)
    shape, support = (32, 48, 40), 6
    rng = np.random.default_rng(5)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    F = jnp.asarray(rng.normal(size=(n, 3)))

    fcm = FCM(box=b, viscosity=eta, radius=a, shape=shape, support=support,
              box_size=(L, L, L))
    ref = np.asarray(fcm.compute_mf(pos, F))

    mesh = make_mesh_2d(2, 4)
    mf = make_sharded_fcm_mf_2d(
        mesh, b, viscosity=eta, radius=a, shape=shape, support=support,
    )
    pos_sh, f_sh, mask, order = shard_particles_xy(pos, F, 2, 4, b)
    out = np.asarray(gather_shards(mf(pos_sh, f_sh, mask), mask, order, n))

    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err
