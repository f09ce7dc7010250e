"""Spatial domain decomposition of the grid-resident MD engine.

The reference is single-GPU (SURVEY 2.6); this is the multi-chip design the
TPU build adds. The cell grid's z axis is sharded over a 1-D device mesh
("z"): each chip owns a slab of cells [nz_local, nyb, CAP, NLANE]. One MD
step under ``shard_map``:

1. **halo exchange**: each chip sends its boundary z-slab to both neighbors
   with ``jax.lax.ppermute`` (ICI neighbor traffic — the TPU torus is made
   for exactly this pattern); ghost slabs crossing the global boundary get
   the +-Lz image shift applied on arrival.
2. **local force kernel**: the same Pallas pair kernel as single-chip, run in
   halo mode (periodic_z=False) on [nz_local + 2, ...]; ghost rows of the
   output are discarded.
3. **local integrator update** (embarrassingly parallel).

Rebinning across shards works with the same halo pattern (each shard *pulls*
the particles whose new cell lands in its slab — particles migrate at most
one cell per rebin, i.e. at most one shard), and is handled by exchanging
halos before the local rebin; the v1 below targets the dryrun/correctness
path with the XLA fallback force (the Pallas kernel slots in unchanged on
real hardware).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.layout import EMPTY_POS, GridSpec, choose_spec
from ..engine.pair_kernel import make_pair_force_kernel


def make_domain_md_step(
    mesh: Mesh,
    spec: GridSpec,
    *,
    epsilon: float = 1.0,
    sigma: float = 1.0,
    dt: float = 0.005,
    temperature: float = 1.0,
    friction: float = 1.0,
    axis: str = "z",
    interpret: bool | None = None,
):
    """Build step(x, y, z, vx, vy, vz, fx, fy, fz, keys) sharded over z-slabs.

    Arrays are the GridState fields [nz, nyb, CAP, NLANE] with axis 0 sharded
    over the mesh; keys is [n_devices, 2] uint32 (one PRNG key per shard).
    Returns (jitted step fn, sharding for grid arrays).
    """
    n_dev = mesh.devices.size
    nz = spec.shape[2]
    assert nz % n_dev == 0, "nz must divide the mesh for z-sharding"
    nz_loc = nz // n_dev
    Lz = np.float32(spec.box_size[2])

    from ..engine.md import lj_g

    local_spec = dataclasses.replace(
        spec, shape=(spec.shape[0], spec.shape[1], nz_loc + 2)
    )
    kern = make_pair_force_kernel(
        local_spec, lj_g(epsilon, sigma), interpret=interpret,
        periodic_z=False,
    )

    def halo_extend(a, shift_lo=0.0, shift_hi=0.0):
        """Attach z-halos from ring neighbors (ppermute over ICI)."""
        up = jax.lax.ppermute(
            a[-1:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        down = jax.lax.ppermute(
            a[:1], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        idx = jax.lax.axis_index(axis)
        up = up + jnp.where(idx == 0, shift_lo, 0.0)
        down = down + jnp.where(idx == n_dev - 1, shift_hi, 0.0)
        return jnp.concatenate([up, a, down], axis=0)

    def step_shard(x, y, z, vx, vy, vz, fx, fy, fz, key_data):
        key = jax.random.wrap_key_data(key_data[0])
        key, sub = jax.random.split(key)
        mask = (jnp.abs(x) < EMPTY_POS / 2).astype(x.dtype)
        # Gronbech-Jensen first half (same scheme as engine/md.py)
        gdt = np.float32(0.5 * friction * dt)
        b = np.float32(1.0 / (1.0 + gdt))
        a_ = np.float32((1.0 - gdt) * b)
        h = np.float32(dt)
        amp = np.float32(
            math.sqrt(2.0 * temperature * friction * dt)
        )
        nx_ = amp * jax.random.normal(sub, x.shape, x.dtype)
        ny_ = amp * jax.random.normal(jax.random.fold_in(sub, 1), x.shape, x.dtype)
        nz_ = amp * jax.random.normal(jax.random.fold_in(sub, 2), x.shape, x.dtype)
        c_x = np.float32(0.5) * b * h
        x = x + mask * (b * h * vx + c_x * (h * fx + nx_))
        y = y + mask * (b * h * vy + c_x * (h * fy + ny_))
        z = z + mask * (b * h * vz + c_x * (h * fz + nz_))
        hv = np.float32(0.5) * h
        vx = mask * (a_ * vx + hv * a_ * fx + b * nx_)
        vy = mask * (a_ * vy + hv * a_ * fy + b * ny_)
        vz = mask * (a_ * vz + hv * a_ * fz + b * nz_)
        # halo exchange + local force kernel (ghost rows discarded)
        xe = halo_extend(x)
        ye = halo_extend(y)
        ze = halo_extend(z, shift_lo=-Lz, shift_hi=Lz)
        fxl, fyl, fzl = kern(xe, ye, ze)[:3]
        fx = fxl[1:-1] * mask
        fy = fyl[1:-1] * mask
        fz = fzl[1:-1] * mask
        vx = vx + hv * fx
        vy = vy + hv * fy
        vz = vz + hv * fz
        return x, y, z, vx, vy, vz, fx, fy, fz, jax.random.key_data(key)[None]

    gspec = P(axis)
    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(gspec,) * 10,
        out_specs=(gspec,) * 10,
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )
    sharding = NamedSharding(mesh, gspec)
    return jax.jit(step), sharding


def shard_grid_state(gs, mesh, axis: str = "z", seed: int = 0):
    """Place a GridState's arrays on the mesh (z-sharded) + per-shard keys."""
    sharding = NamedSharding(mesh, P(axis))
    arrays = [
        jax.device_put(a, sharding)
        for a in (gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz, gs.fx, gs.fy, gs.fz)
    ]
    n_dev = mesh.devices.size
    keys = jax.vmap(jax.random.key_data)(
        jax.random.split(jax.random.key(seed), n_dev)
    )
    keys = jax.device_put(keys, sharding)
    return arrays, keys


# ---------------------------------------------------------------------------
# v2: domain decomposition with cross-shard rebinning (particle migration)
# ---------------------------------------------------------------------------


def _local_rebin(spec: GridSpec, nz_loc, n_dev, axis, halo_extend,
                 x, y, z, vx, vy, vz, pidf):
    """Shard-local rebin with migration: pull every particle (own slab +
    both neighbor boundary slabs via the halo) whose *current* cell lands in
    my z-slab, and re-bin into local cells with the two-sort filler
    algorithm (layout._bin_columns). Particles move at most one cell between
    rebins (half-skin trigger), so one halo slab is exactly enough — the
    migration guarantee the module docstring sketches.

    pidf carries pid+1 as float32 (0 = empty). Returns rebinned arrays +
    (count, overflow) scalars for the global bookkeeping.
    """
    import dataclasses as _dc

    from ..engine.layout import _bin_columns

    nx, ny, _ = spec.shape
    F = spec.fold
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    Ls = spec.box_size
    # n_strag must be 0 here: the straggler columns _bin_columns would
    # produce are discarded below, and with n_strag > 0 over-CAP entries
    # only latch overflow past the straggler budget — silently dropping
    # particles. With 0, any over-CAP entry latches the flag.
    local_spec = _dc.replace(spec, shape=(nx, ny, nz_loc), n_strag=0)

    # halo-extend the 7 quantities in one stacked ppermute pair
    stacked = jnp.stack([x, y, z, vx, vy, vz, pidf])
    ext = halo_extend(stacked, stacked_axis=1)

    xe, ye, ze = ext[0], ext[1], ext[2]
    valid = ext[6] > 0.5
    # wrap into the primary box
    xw = jnp.where(valid, xe - Ls[0] * jnp.round(xe / Ls[0]), EMPTY_POS)
    yw = jnp.where(valid, ye - Ls[1] * jnp.round(ye / Ls[1]), EMPTY_POS)
    zw = jnp.where(valid, ze - Ls[2] * jnp.round(ze / Ls[2]), EMPTY_POS)

    def cell_of(p, L, ncell):
        frac = p / L + 0.5
        frac = frac - jnp.floor(frac)
        return jnp.clip((frac * ncell).astype(jnp.int32), 0, ncell - 1)

    cx = cell_of(xw, jnp.float32(Ls[0]), nx)
    cy = cell_of(yw, jnp.float32(Ls[1]), ny)
    cz = cell_of(zw, jnp.float32(Ls[2]), spec.shape[2])
    z0 = jax.lax.axis_index(axis) * nz_loc
    mine = valid & (cz >= z0) & (cz < z0 + nz_loc)
    yb = cy // F
    lane = cx * F + (cy - yb * F)
    key = ((cz - z0) * nyb + yb) * nlane + lane
    ncell_loc = nz_loc * nyb * nlane
    key = jnp.where(mine, key, ncell_loc)

    cols = tuple(
        a.reshape(-1)
        for a in (xw, yw, zw, ext[3], ext[4], ext[5], ext[6])
    )
    fills = (None, None, None, 0.0, 0.0, 0.0, 0.0)
    binned, _, ovf = _bin_columns(
        local_spec, key.reshape(-1), cols, 0, fills=fills
    )
    count = jnp.sum((binned[6] > 0.5).astype(jnp.int32))
    return binned, count, ovf


def make_domain_md_step2(
    mesh: Mesh,
    spec: GridSpec,
    *,
    epsilon: float = 1.0,
    sigma: float = 1.0,
    dt: float = 0.005,
    temperature: float = 1.0,
    friction: float = 1.0,
    axis: str = "z",
    interpret: bool | None = None,
    n_total: int | None = None,
):
    """Domain-decomposed MD step WITH drift-triggered cross-shard rebinning.

    step(state_tuple) -> state_tuple over
    (x, y, z, vx, vy, vz, fx, fy, fz, rx, ry, rz, pidf, ovf, keys):
    grid arrays z-sharded, pidf = pid+1 as float32, ovf a per-shard latching
    overflow/lost-particle flag ([n_dev] float32), keys [n_dev, ...] PRNG.

    The drift criterion is evaluated globally (pmax) so all shards rebin in
    the same step — the lax.cond predicate is uniform across the mesh.
    """
    n_dev = mesh.devices.size
    nz = spec.shape[2]
    assert nz % n_dev == 0, "nz must divide the mesh for z-sharding"
    nz_loc = nz // n_dev
    Lz = np.float32(spec.box_size[2])
    thr2 = np.float32(spec.drift_threshold ** 2)

    from ..engine.md import lj_g

    local_spec = dataclasses.replace(
        spec, shape=(spec.shape[0], spec.shape[1], nz_loc + 2)
    )
    kern = make_pair_force_kernel(
        local_spec, lj_g(epsilon, sigma), interpret=interpret,
        periodic_z=False,
    )

    def halo_extend(a, shift_lo=0.0, shift_hi=0.0, stacked_axis=0):
        ax = stacked_axis
        up = jax.lax.ppermute(
            jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax], axis=ax),
            axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        down = jax.lax.ppermute(
            jax.lax.slice_in_dim(a, 0, 1, axis=ax),
            axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        idx = jax.lax.axis_index(axis)
        if shift_lo or shift_hi:
            up = up + jnp.where(idx == 0, shift_lo, 0.0)
            down = down + jnp.where(idx == n_dev - 1, shift_hi, 0.0)
        return jnp.concatenate([up, a, down], axis=ax)

    def step_shard(x, y, z, vx, vy, vz, fx, fy, fz, rx, ry, rz,
                   pidf, ovf, key_data):
        key = jax.random.wrap_key_data(key_data[0])
        key, sub = jax.random.split(key)
        mask = (pidf > 0.5).astype(x.dtype)
        gdt = np.float32(0.5 * friction * dt)
        b = np.float32(1.0 / (1.0 + gdt))
        a_ = np.float32((1.0 - gdt) * b)
        h = np.float32(dt)
        if temperature > 0:
            amp = np.float32(math.sqrt(2.0 * temperature * friction * dt))
            nx_ = amp * jax.random.normal(sub, x.shape, x.dtype)
            ny_ = amp * jax.random.normal(
                jax.random.fold_in(sub, 1), x.shape, x.dtype)
            nz_ = amp * jax.random.normal(
                jax.random.fold_in(sub, 2), x.shape, x.dtype)
        else:
            nx_ = ny_ = nz_ = jnp.zeros_like(x)
        c_x = np.float32(0.5) * b * h
        x = x + mask * (b * h * vx + c_x * (h * fx + nx_))
        y = y + mask * (b * h * vy + c_x * (h * fy + ny_))
        z = z + mask * (b * h * vz + c_x * (h * fz + nz_))
        hv = np.float32(0.5) * h
        vx = mask * (a_ * vx + hv * a_ * fx + b * nx_)
        vy = mask * (a_ * vy + hv * a_ * fy + b * ny_)
        vz = mask * (a_ * vz + hv * a_ * fz + b * nz_)

        # global drift criterion -> synchronized rebin
        d2 = mask * ((x - rx) ** 2 + (y - ry) ** 2 + (z - rz) ** 2)
        drift2 = jax.lax.pmax(jnp.max(d2), axis)

        def do_rebin(args):
            x, y, z, vx, vy, vz, pidf, ovf = args
            (xn, yn, zn, vxn, vyn, vzn, pidn), count, o = _local_rebin(
                spec, nz_loc, n_dev, axis, halo_extend,
                x, y, z, vx, vy, vz, pidf,
            )
            total = jax.lax.psum(count, axis)
            o = o.astype(jnp.float32)
            if n_total is not None:
                o = o + (total != n_total).astype(jnp.float32)
            return xn, yn, zn, vxn, vyn, vzn, pidn, ovf + o

        def no_rebin(args):
            return args

        x, y, z, vx, vy, vz, pidf, ovf = jax.lax.cond(
            drift2 > thr2, do_rebin, no_rebin,
            (x, y, z, vx, vy, vz, pidf, ovf),
        )
        rx = jnp.where(drift2 > thr2, x, rx)
        ry = jnp.where(drift2 > thr2, y, ry)
        rz = jnp.where(drift2 > thr2, z, rz)
        mask = (pidf > 0.5).astype(x.dtype)

        xe = halo_extend(x)
        ye = halo_extend(y)
        ze = halo_extend(z, shift_lo=-Lz, shift_hi=Lz)
        fxl, fyl, fzl = kern(xe, ye, ze)[:3]
        fx = fxl[1:-1] * mask
        fy = fyl[1:-1] * mask
        fz = fzl[1:-1] * mask
        vx = vx + hv * fx
        vy = vy + hv * fy
        vz = vz + hv * fz
        return (x, y, z, vx, vy, vz, fx, fy, fz, rx, ry, rz, pidf, ovf,
                jax.random.key_data(key)[None])

    gspec = P(axis)
    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(gspec,) * 15,
        out_specs=(gspec,) * 15,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, gspec)
    return jax.jit(step), sharding


def shard_grid_state2(gs, mesh, axis: str = "z", seed: int = 0):
    """GridState -> the 15-tuple consumed by make_domain_md_step2."""
    sharding = NamedSharding(mesh, P(axis))
    pidf = (gs.pid + 1).astype(jnp.float32)
    arrays = [
        jax.device_put(a, sharding)
        for a in (gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz,
                  gs.fx, gs.fy, gs.fz, gs.x, gs.y, gs.z, pidf)
    ]
    n_dev = mesh.devices.size
    ovf = jax.device_put(jnp.zeros((n_dev,), jnp.float32), sharding)
    keys = jax.vmap(jax.random.key_data)(
        jax.random.split(jax.random.key(seed), n_dev)
    )
    keys = jax.device_put(keys, sharding)
    return tuple(arrays) + (ovf, keys)


# ---------------------------------------------------------------------------
# v3: domain decomposition for the channel-kernel engines (DPD, SPH)
# ---------------------------------------------------------------------------
#
# The reference runs every pair potential through the same fast machinery
# (reference: src/Interactor/PairForces.cuh:23); the TPU analog is that the
# DD scaffolding (halo exchange + drift-synchronized cross-shard rebin) is
# potential-agnostic: any engine whose force is a channel-kernel pass
# (engine/pair_kernel.make_pair_channel_kernel) rides the same z-slab mesh.
# ``make_domain_channel_step`` provides the shared velocity-Verlet + halo +
# migration skeleton; ``make_domain_dpd_step`` / ``make_domain_sph_step``
# instantiate it for engine/dpd.py and engine/sph.py.


def make_domain_channel_step(
    mesh: Mesh,
    spec: GridSpec,
    make_local_force,
    *,
    dt: float,
    mass: float = 1.0,
    axis: str = "z",
    interpret: bool | None = None,
    n_total: int | None = None,
):
    """Shared DD skeleton for velocity-Verlet channel-kernel engines.

    ``make_local_force(local_spec, interpret)`` must return
    ``force(halo_extend, xe, ye, ze, vxe, vye, vze, pidf_e, step_i) ->
    (fx, fy, fz)`` evaluated on the halo-extended [nz_loc + 2, ...] grids
    (ghost rows may hold garbage forces — the skeleton trims them). The
    velocity entering the force is the half-kicked one (the Groot-Warren
    lambda = 1/2 structure both engines use, engine/dpd.py step()).

    State tuple: (x, y, z, vx, vy, vz, fx, fy, fz, rx, ry, rz, pidf, ovf,
    stepi) — grid arrays z-sharded, pidf = pid + 1 float32, ovf a [n_dev]
    latching flag, stepi a [n_dev] int32 step counter (same value on every
    shard; feeds the DPD counter RNG).
    """
    n_dev = mesh.devices.size
    nz = spec.shape[2]
    assert nz % n_dev == 0, "nz must divide the mesh for z-sharding"
    nz_loc = nz // n_dev
    Lz = np.float32(spec.box_size[2])
    thr2 = np.float32(spec.drift_threshold ** 2)
    dt_ = np.float32(dt)
    hv = np.float32(0.5 * dt / mass)

    local_spec = dataclasses.replace(
        spec, shape=(spec.shape[0], spec.shape[1], nz_loc + 2)
    )
    local_force = make_local_force(local_spec, interpret)

    def halo_extend(a, shift_lo=0.0, shift_hi=0.0, stacked_axis=0):
        ax = stacked_axis
        up = jax.lax.ppermute(
            jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax], axis=ax),
            axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        down = jax.lax.ppermute(
            jax.lax.slice_in_dim(a, 0, 1, axis=ax),
            axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        idx = jax.lax.axis_index(axis)
        if shift_lo or shift_hi:
            up = up + jnp.where(idx == 0, shift_lo, 0.0)
            down = down + jnp.where(idx == n_dev - 1, shift_hi, 0.0)
        return jnp.concatenate([up, a, down], axis=ax)

    def step_shard(x, y, z, vx, vy, vz, fx, fy, fz, rx, ry, rz,
                   pidf, ovf, stepi):
        mask = (pidf > 0.5).astype(x.dtype)
        # half-kick + drift (engine/dpd.py step(): force sees v(t + dt/2))
        vx = (vx + hv * fx) * mask
        vy = (vy + hv * fy) * mask
        vz = (vz + hv * fz) * mask
        x = x + jnp.where(mask > 0, dt_ * vx, 0.0)
        y = y + jnp.where(mask > 0, dt_ * vy, 0.0)
        z = z + jnp.where(mask > 0, dt_ * vz, 0.0)
        stepi = stepi + 1

        # global drift criterion -> synchronized cross-shard rebin
        d2 = mask * ((x - rx) ** 2 + (y - ry) ** 2 + (z - rz) ** 2)
        drift2 = jax.lax.pmax(jnp.max(d2), axis)

        def do_rebin(args):
            x, y, z, vx, vy, vz, pidf, ovf = args
            (xn, yn, zn, vxn, vyn, vzn, pidn), count, o = _local_rebin(
                spec, nz_loc, n_dev, axis, halo_extend,
                x, y, z, vx, vy, vz, pidf,
            )
            total = jax.lax.psum(count, axis)
            o = o.astype(jnp.float32)
            if n_total is not None:
                o = o + (total != n_total).astype(jnp.float32)
            return xn, yn, zn, vxn, vyn, vzn, pidn, ovf + o

        x, y, z, vx, vy, vz, pidf, ovf = jax.lax.cond(
            drift2 > thr2, do_rebin, lambda a: a,
            (x, y, z, vx, vy, vz, pidf, ovf),
        )
        rx = jnp.where(drift2 > thr2, x, rx)
        ry = jnp.where(drift2 > thr2, y, ry)
        rz = jnp.where(drift2 > thr2, z, rz)
        mask = (pidf > 0.5).astype(x.dtype)

        # halo exchange + local channel force (ghost rows discarded)
        xe = halo_extend(x)
        ye = halo_extend(y)
        ze = halo_extend(z, shift_lo=-Lz, shift_hi=Lz)
        vxe = halo_extend(vx)
        vye = halo_extend(vy)
        vze = halo_extend(vz)
        pe = halo_extend(pidf)
        fxl, fyl, fzl = local_force(
            halo_extend, xe, ye, ze, vxe, vye, vze, pe, stepi[0]
        )
        fx = fxl[1:-1] * mask
        fy = fyl[1:-1] * mask
        fz = fzl[1:-1] * mask
        vx = (vx + hv * fx) * mask
        vy = (vy + hv * fy) * mask
        vz = (vz + hv * fz) * mask
        return (x, y, z, vx, vy, vz, fx, fy, fz, rx, ry, rz, pidf, ovf,
                stepi)

    gspec = P(axis)
    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(gspec,) * 15,
        out_specs=(gspec,) * 15,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, gspec)
    return jax.jit(step), sharding


def make_domain_dpd_step(
    mesh: Mesh,
    spec: GridSpec,
    *,
    rc: float = 1.0,
    A: float = 25.0,
    gamma: float = 4.5,
    temperature: float = 1.0,
    dt: float = 0.01,
    mass: float = 1.0,
    axis: str = "z",
    interpret: bool | None = None,
    n_total: int | None = None,
):
    """Domain-decomposed DPD (engine/dpd.py over z-slabs). The per-pair
    random force uses the same symmetric (pid_lo, pid_hi, step) counter
    hash as the single-chip engine, so DD trajectories match the
    single-chip ones wherever the slot layout does and momentum stays
    conserved across shard boundaries (both evaluations of a pair hash
    identically)."""
    import math as _math

    from ..engine.dpd import dpd_pair_fn
    from ..engine.pair_kernel import make_pair_channel_kernel

    sigma_dt = _math.sqrt(2.0 * temperature * gamma / dt)

    def make_local_force(local_spec, interp):
        kern = make_pair_channel_kernel(
            local_spec, dpd_pair_fn(rc, A, gamma, sigma_dt), 5, 3,
            interpret=interp, periodic_z=False,
        )

        def force(halo_extend, xe, ye, ze, vxe, vye, vze, pe, step_i):
            # engine/dpd.py channels: (vx, vy, vz, pid_f, step_f) with
            # pid as a raw float (empties -1); pe carries pid + 1
            pidc = pe - 1.0
            stepf = jnp.full_like(xe, step_i.astype(jnp.float32))
            return kern(xe, ye, ze, vxe, vye, vze, pidc, stepf)

        return force

    return make_domain_channel_step(
        mesh, spec, make_local_force, dt=dt, mass=mass, axis=axis,
        interpret=interpret, n_total=n_total,
    )


def make_domain_sph_step(
    mesh: Mesh,
    spec: GridSpec,
    params,
    *,
    dt: float = 0.01,
    mass: float = 1.0,
    axis: str = "z",
    interpret: bool | None = None,
    n_total: int | None = None,
):
    """Domain-decomposed SPH (engine/sph.py over z-slabs): the density
    sweep runs on the halo-extended grid (home rows exact), then the
    derived P/rho^2 channel is itself halo-exchanged so the force sweep
    sees correct ghost-row pressures — two ppermute rounds per step, the
    short-range analog of the reference's two VerletList transversals
    (reference: src/Interactor/SPH.cu:7-27)."""
    import math as _math

    from ..engine.pair_kernel import make_pair_channel_kernel
    from ..engine.sph import sph_density_pair_fn, sph_force_pair_fn

    def make_local_force(local_spec, interp):
        rho_kern = make_pair_channel_kernel(
            local_spec, sph_density_pair_fn(params.support), 1, 1,
            interpret=interp, periodic_z=False,
        )
        f_kern = make_pair_channel_kernel(
            local_spec, sph_force_pair_fn(params), 5, 3,
            interpret=interp, periodic_z=False,
        )
        w0 = 1.0 / (_math.pi * params.support ** 3)

        def force(halo_extend, xe, ye, ze, vxe, vye, vze, pe, step_i):
            m = (pe > 0.5).astype(xe.dtype)
            mch = m * np.float32(mass)
            (rho,) = rho_kern(xe, ye, ze, mch)
            rho = (rho + np.float32(mass * w0)) * m
            # ghost-row densities are wrong (their neighbours lie outside
            # the halo); recompute them by exchanging the HOME rows
            rho_home = rho[1:-1]
            rho_e = halo_extend(rho_home)
            rho_s = jnp.where(m > 0, rho_e, 1.0)
            pressure = params.gas_stiffness * (rho_s - params.rest_density)
            p_div_rho2 = jnp.where(m > 0, pressure / (rho_s * rho_s), 0.0)
            return f_kern(xe, ye, ze, p_div_rho2, vxe, vye, vze, mch)

        return force

    return make_domain_channel_step(
        mesh, spec, make_local_force, dt=dt, mass=mass, axis=axis,
        interpret=interpret, n_total=n_total,
    )


def shard_channel_state(gs, mesh, axis: str = "z"):
    """GridState -> the 15-tuple consumed by make_domain_channel_step."""
    sharding = NamedSharding(mesh, P(axis))
    pidf = (gs.pid + 1).astype(jnp.float32)
    arrays = [
        jax.device_put(a, sharding)
        for a in (gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz,
                  gs.fx, gs.fy, gs.fz, gs.x, gs.y, gs.z, pidf)
    ]
    n_dev = mesh.devices.size
    ovf = jax.device_put(jnp.zeros((n_dev,), jnp.float32), sharding)
    stepi = jax.device_put(
        jnp.broadcast_to(jnp.asarray(gs.step, jnp.int32), (n_dev,)), sharding
    )
    return tuple(arrays) + (ovf, stepi)
