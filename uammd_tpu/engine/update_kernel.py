"""Pallas TPU kernel: fused Gronbech-Jensen Langevin update with in-kernel
thermal noise.

One elementwise pass per step replaces three separate XLA passes (3x normal
field generation, the position/velocity update chain, and the drift-check
reduction) — each of which round-trips the [slots] arrays through HBM. The
Gaussian noise is generated in registers from the TPU's hardware PRNG
(pltpu.prng_random_bits) via Box-Muller, seeded per (step, program) —
the counter-RNG idiom the reference uses on its hot paths (reference:
third_party/saruprng.cuh, VerletNVT/GronbechJensen.cu:20-62).

Deferred half-kick: the carried velocity field is w(t) = v(t) - (dt/2m) f(t)
(the pre-half-kick value); the kernel first completes v = w + (dt/2m) f with
the *current* force, then applies the G-J update. This lets one kernel per
step suffice even though G-J formally needs f(t) in the position update and
f(t+dt) in the velocity completion.

TPU-only (the hardware PRNG has no CPU lowering); engine/md2.py provides a
jnp mirror used for interpret/CPU runs and cross-validation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import GridSpec

TWO_PI = np.float32(2.0 * math.pi)


def _uniform(shape):
    """(0, 1] uniforms from raw PRNG bits via the mantissa trick.

    Two Mosaic constraints shape this: prng_random_bits yields *signed*
    int32 (an arithmetic shift would make negative "uniforms" whose log()
    poisons the state with NaNs), and uint32 -> float32 casts are not
    lowered. So: pack the top 23 bits into a [1, 2) float's mantissa by
    bit-OR with the 1.0 exponent, bitcast, and map to (0, 1]."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    fbits = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    u = pltpu.bitcast(fbits, jnp.float32) - np.float32(1.0)  # [0, 1)
    return np.float32(1.0) - u  # (0, 1]


def make_gj_update_kernel(spec: GridSpec, dt, temperature, friction, mass):
    """Build update(x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, seed) ->
    (x', y', z', wx', wy', wz', drift_tile[nz, nyb, 8, 128]), where the
    drift metric is the max infinity-norm displacement since the last rebin
    (compare against GridSpec.drift_threshold unsquared).

    seed is a scalar int32 (vary per step). With temperature == 0 the noise
    path compiles out (friction == 0 then gives plain velocity Verlet).
    """
    nz, nyb, cap, nlane = spec.array_shape
    dt_ = np.float32(dt)
    m_ = np.float32(mass)
    hv = np.float32(0.5 * dt / mass)
    gdt = 0.5 * friction * dt
    b = np.float32(1.0 / (1.0 + gdt))
    a = np.float32((1.0 - gdt) * b)
    c_x = np.float32(0.5 * b * dt / mass)
    amp = np.float32(
        math.sqrt(2.0 * temperature * friction * mass * dt)
        if temperature > 0 else 0.0
    )
    noisy = temperature > 0

    def kernel(seed_ref, *refs):
        x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz = (
            refs[i][0, 0, :, :] for i in range(12)
        )
        outs = refs[12:]
        mask = (x < 1.0e8).astype(jnp.float32)

        if noisy:
            # Mosaic caps prng_seed at 2 values: fold the 2-D program id
            pltpu.prng_seed(
                seed_ref[0, 0], pl.program_id(0) * nyb + pl.program_id(1)
            )
            u1 = _uniform((cap, nlane))
            u2 = _uniform((cap, nlane))
            u3 = _uniform((cap, nlane))
            u4 = _uniform((cap, nlane))
            r1 = jnp.sqrt(np.float32(-2.0) * jnp.log(u1))
            r2 = jnp.sqrt(np.float32(-2.0) * jnp.log(u3))
            nx_ = amp * (r1 * jnp.cos(TWO_PI * u2))
            ny_ = amp * (r1 * jnp.sin(TWO_PI * u2))
            nz_ = amp * (r2 * jnp.cos(TWO_PI * u4))
        else:
            nx_ = ny_ = nz_ = jnp.zeros((cap, nlane), jnp.float32)

        # complete the previous step's half kick: v = w + (dt/2m) f
        vx = wx + hv * fx
        vy = wy + hv * fy
        vz = wz + hv * fz

        xo = x + mask * (b * dt_ * vx + c_x * (dt_ * fx + nx_))
        yo = y + mask * (b * dt_ * vy + c_x * (dt_ * fy + ny_))
        zo = z + mask * (b * dt_ * vz + c_x * (dt_ * fz + nz_))
        outs[0][0, 0, :, :] = xo
        outs[1][0, 0, :, :] = yo
        outs[2][0, 0, :, :] = zo
        outs[3][0, 0, :, :] = mask * (a * vx + hv * a * fx + (b / m_) * nx_)
        outs[4][0, 0, :, :] = mask * (a * vy + hv * a * fy + (b / m_) * ny_)
        outs[5][0, 0, :, :] = mask * (a * vz + hv * a * fz + (b / m_) * nz_)

        # Drift metric: per-axis (infinity-norm) displacement since the
        # last rebin. Stencil correctness only needs every particle within
        # (cell - cutoff)/2 of its binned position ON EACH AXIS, so the
        # infinity norm is the exact criterion — the Euclidean norm fired
        # rebins ~1.2-1.5x too early for isotropic thermal motion.
        dinf = mask * jnp.maximum(
            jnp.abs(xo - rx), jnp.maximum(jnp.abs(yo - ry), jnp.abs(zo - rz))
        )
        outs[6][0, 0, :, :] = jnp.full((8, 128), jnp.max(dinf))

    spec_full = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tile_spec = pl.BlockSpec(
        (1, 1, 8, 128), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )

    @jax.jit
    def update(x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, seed):
        outs = pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=[
                pl.BlockSpec((1, 1), lambda z, yb: (0, 0),
                             memory_space=pltpu.SMEM)
            ]
            + [spec_full] * 12,
            out_specs=[spec_full] * 6 + [tile_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
            ] * 6
            + [jax.ShapeDtypeStruct((nz, nyb, 8, 128), jnp.float32)],
        )(
            jnp.asarray([[seed]], jnp.int32),
            x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz,
        )
        return outs[:6], jnp.max(outs[6][:, :, 0, 0])

    return update


def _clt_normals(shape, amp):
    """Three variance-exact pseudo-normals from 16-bit uniform sums.

    Each normal is sqrt(3)/65536 * (a + b - c - d) with a..d iid uniform on
    {0..65535}, split two-per-draw from the hardware PRNG. Exact mean/
    variance; excess kurtosis -0.3 and support bounded at 3.46 sigma — for
    a Langevin thermostat with friction*dt << 1 the velocity distribution
    re-Gaussianizes over the ~1/(friction*dt)-step relaxation (CLT across
    kicks), which bench-time thermostat checks validate on-device. ~3x
    cheaper than Box-Muller on the VPU (no log/sqrt/trig)."""
    scale = amp * np.float32(math.sqrt(3.0) / 65536.0)

    def two(bits):
        lo = (bits & np.int32(0xFFFF)).astype(jnp.float32)
        hi = ((bits >> np.int32(16)) & np.int32(0xFFFF)).astype(jnp.float32)
        return lo, hi

    draws = [pltpu.prng_random_bits(shape) for _ in range(6)]
    u = []
    for d in draws:
        a, b = two(d)
        u += [a, b]
    return tuple(
        scale * ((u[4 * k] + u[4 * k + 1]) - (u[4 * k + 2] + u[4 * k + 3]))
        for k in range(3)
    )


def _bm_normals(shape, amp):
    """Three exact Gaussians via Box-Muller on mantissa-trick uniforms."""
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    u3 = _uniform(shape)
    u4 = _uniform(shape)
    r1 = jnp.sqrt(np.float32(-2.0) * jnp.log(u1))
    r2 = jnp.sqrt(np.float32(-2.0) * jnp.log(u3))
    return (
        amp * (r1 * jnp.cos(TWO_PI * u2)),
        amp * (r1 * jnp.sin(TWO_PI * u2)),
        amp * (r2 * jnp.cos(TWO_PI * u4)),
    )


def make_gj_fold_update_kernel(
    spec: GridSpec, dt, temperature, friction, mass, *, noise: str = "bm"
):
    """Fused reaction-fold + Gronbech-Jensen update.

    Like make_gj_update_kernel, but the force inputs are the v2 pair
    kernel's *unfolded* outputs — home (3 arrays) plus the 4 reaction
    groups (12 arrays, engine/kernel2.REACTION_GROUPS) — and the fold

        f[z, yb] = home[z, yb] + sum_g G_g[(z - dz_g) % nz, (yb - dyb_g) % nyb]

    happens in-kernel via shifted BlockSpec index maps, eliminating the
    standalone fold pass (15 reads + 3 writes of HBM) entirely.

    update(x, y, z, wx, wy, wz, hfx, hfy, hfz, *groups12, rx, ry, rz, seed)
      -> ((x', y', z', wx', wy', wz'), drift_inf_max)

    ``noise`` selects "bm" (exact Box-Muller) or "clt" (variance-exact
    uniform-sum pseudo-normals, ~3x cheaper — see _clt_normals).
    """
    import functools

    from .kernel2 import REACTION_GROUPS, _blk_index

    nz, nyb, cap, nlane = spec.array_shape
    dt_ = np.float32(dt)
    m_ = np.float32(mass)
    hv = np.float32(0.5 * dt / mass)
    gdt = 0.5 * friction * dt
    b = np.float32(1.0 / (1.0 + gdt))
    a = np.float32((1.0 - gdt) * b)
    c_x = np.float32(0.5 * b * dt / mass)
    amp = np.float32(
        math.sqrt(2.0 * temperature * friction * mass * dt)
        if temperature > 0 else 0.0
    )
    noisy = temperature > 0
    assert noise in ("bm", "clt")

    def kernel(seed_ref, *refs):
        x, y, z, wx, wy, wz = (refs[i][0, 0, :, :] for i in range(6))
        fx, fy, fz = (refs[6 + i][0, 0, :, :] for i in range(3))
        for gi in range(4):
            fx = fx + refs[9 + 3 * gi][0, 0, :, :]
            fy = fy + refs[10 + 3 * gi][0, 0, :, :]
            fz = fz + refs[11 + 3 * gi][0, 0, :, :]
        rx, ry, rz = (refs[21 + i][0, 0, :, :] for i in range(3))
        outs = refs[24:]
        mask = (x < 1.0e8).astype(jnp.float32)

        if noisy:
            pltpu.prng_seed(
                seed_ref[0, 0], pl.program_id(0) * nyb + pl.program_id(1)
            )
            gen = _clt_normals if noise == "clt" else _bm_normals
            nx_, ny_, nz_ = gen((cap, nlane), amp)
        else:
            nx_ = ny_ = nz_ = jnp.zeros((cap, nlane), jnp.float32)

        vx = wx + hv * fx
        vy = wy + hv * fy
        vz = wz + hv * fz
        xo = x + mask * (b * dt_ * vx + c_x * (dt_ * fx + nx_))
        yo = y + mask * (b * dt_ * vy + c_x * (dt_ * fy + ny_))
        zo = z + mask * (b * dt_ * vz + c_x * (dt_ * fz + nz_))
        outs[0][0, 0, :, :] = xo
        outs[1][0, 0, :, :] = yo
        outs[2][0, 0, :, :] = zo
        outs[3][0, 0, :, :] = mask * (a * vx + hv * a * fx + (b / m_) * nx_)
        outs[4][0, 0, :, :] = mask * (a * vy + hv * a * fy + (b / m_) * ny_)
        outs[5][0, 0, :, :] = mask * (a * vz + hv * a * fz + (b / m_) * nz_)
        # infinity-norm drift (see make_gj_update_kernel)
        dinf = mask * jnp.maximum(
            jnp.abs(xo - rx), jnp.maximum(jnp.abs(yo - ry), jnp.abs(zo - rz))
        )
        outs[6][0, 0, :, :] = jnp.full((8, 128), jnp.max(dinf))

    spec_full = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    group_specs = []
    for (dz, dyb) in REACTION_GROUPS:
        group_specs += [
            pl.BlockSpec(
                (1, 1, cap, nlane),
                functools.partial(_blk_index, dz=-dz, dyb=-dyb,
                                  nz=nz, nyb=nyb),
                memory_space=pltpu.VMEM,
            )
        ] * 3
    tile_spec = pl.BlockSpec(
        (1, 1, 8, 128), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )

    @jax.jit
    def update(x, y, z, wx, wy, wz, hfx, hfy, hfz, groups, rx, ry, rz, seed):
        args = [x, y, z, wx, wy, wz, hfx, hfy, hfz]
        for g in groups:
            args.append(g)
        args += [rx, ry, rz]
        outs = pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=[
                pl.BlockSpec((1, 1), lambda z, yb: (0, 0),
                             memory_space=pltpu.SMEM)
            ]
            + [spec_full] * 9 + group_specs + [spec_full] * 3,
            out_specs=[spec_full] * 6 + [tile_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
            ] * 6
            + [jax.ShapeDtypeStruct((nz, nyb, 8, 128), jnp.float32)],
        )(
            jnp.asarray([[seed]], jnp.int32), *args,
        )
        return outs[:6], jnp.max(outs[6][:, :, 0, 0])

    return update


def gj_update_jnp(spec: GridSpec, dt, temperature, friction, mass,
                  x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, key):
    """XLA mirror of the fused kernel (CPU tests / interpret runs); noise
    from jax.random instead of the TPU hardware PRNG."""
    dt_ = x.dtype.type(dt)
    m_ = x.dtype.type(mass)
    hv = x.dtype.type(0.5 * dt / mass)
    gdt = 0.5 * friction * dt
    b = x.dtype.type(1.0 / (1.0 + gdt))
    a = x.dtype.type((1.0 - gdt) * b)
    c_x = x.dtype.type(0.5 * b * dt / mass)
    mask = (x < 1.0e8).astype(x.dtype)

    if temperature > 0:
        amp = x.dtype.type(
            math.sqrt(2.0 * temperature * friction * mass * dt)
        )
        nx_ = amp * jax.random.normal(key, x.shape, x.dtype)
        ny_ = amp * jax.random.normal(jax.random.fold_in(key, 1), x.shape, x.dtype)
        nz_ = amp * jax.random.normal(jax.random.fold_in(key, 2), x.shape, x.dtype)
    else:
        nx_ = ny_ = nz_ = jnp.zeros_like(x)

    vx = wx + hv * fx
    vy = wy + hv * fy
    vz = wz + hv * fz
    xo = x + mask * (b * dt_ * vx + c_x * (dt_ * fx + nx_))
    yo = y + mask * (b * dt_ * vy + c_x * (dt_ * fy + ny_))
    zo = z + mask * (b * dt_ * vz + c_x * (dt_ * fz + nz_))
    wxo = mask * (a * vx + hv * a * fx + (b / m_) * nx_)
    wyo = mask * (a * vy + hv * a * fy + (b / m_) * ny_)
    wzo = mask * (a * vz + hv * a * fz + (b / m_) * nz_)
    dinf = jnp.max(mask * jnp.maximum(
        jnp.abs(xo - rx), jnp.maximum(jnp.abs(yo - ry), jnp.abs(zo - rz))
    ))
    return (xo, yo, zo, wxo, wyo, wzo), dinf
