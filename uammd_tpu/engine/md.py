"""High-throughput MD on the grid-resident layout.

Couples the Pallas pair-force kernel (pair_kernel.py) to grid-resident
integrators. This is the performance path for the reference's benchmark
workload (reference: examples/misc/benchmark.cu — 1M-particle LJ liquid under
VerletNVT Gronbech-Jensen): the whole trajectory compiles to one XLA program
(``lax.scan``), with the conditional rebin (layout.maybe_rebin) playing the
role of the reference's VerletList drift-triggered update.

Schemes implemented here mirror integrators/verlet.py but operate on the
[nz, nyb, CAP, NLANE] SoA directly — elementwise updates, no data movement.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .layout import (
    GridState,
    GridSpec,
    choose_spec,
    needs_rebin,
    pack,
    unpack,
)
from .pair_kernel import make_pair_force_kernel
from .rebin_kernel import rebin_fast, rebin_fast_noforce


def maybe_rebin(gs: GridState) -> GridState:
    """Drift-triggered rebin via the Pallas kernel (layout.maybe_rebin uses
    the slower sort path; kept for cross-validation)."""
    return jax.lax.cond(needs_rebin(gs), rebin_fast, lambda g: g, gs)


def maybe_rebin_noforce(gs: GridState) -> GridState:
    """As maybe_rebin but dropping forces (recomputed right after)."""
    return jax.lax.cond(needs_rebin(gs), rebin_fast_noforce, lambda g: g, gs)


def lj_g(epsilon=1.0, sigma=1.0):
    """(dE/dr)/r for 12-6 LJ (see potentials/radial.py for the convention).

    Written with a single reciprocal (t = 1/r2) so the VPU pays one division
    per pair slot instead of two; finite in f32 down to r2 ~ 2e-3 (the
    kernel's clamp floor keeps it there for degenerate slots)."""
    eps = np.float32(epsilon)
    s2 = np.float32(sigma * sigma)

    def g(r2):
        t = np.float32(1.0) / r2
        inv2 = s2 * t
        inv6 = inv2 * inv2 * inv2
        return (np.float32(-24.0) * eps) * t * (2.0 * inv6 * inv6 - inv6)

    return g


def lj_e(epsilon=1.0, sigma=1.0, shift_rc=None):
    eps = np.float32(epsilon)
    s2 = np.float32(sigma * sigma)
    e_shift = np.float32(0.0)
    if shift_rc is not None:
        ic6 = float(sigma * sigma / (shift_rc * shift_rc)) ** 3
        e_shift = np.float32(4.0 * epsilon * (ic6 * ic6 - ic6))

    def e(r2):
        inv6 = (s2 / r2) ** 3
        return np.float32(4.0) * eps * (inv6 * inv6 - inv6) - e_shift

    return e


@dataclasses.dataclass(frozen=True)
class GridMD:
    """Bound engine: spec + compiled force kernel + integrator params."""

    spec: GridSpec
    force_kernel: object
    dt: float
    temperature: float
    friction: float
    mass: float

    def init(self, pos, seed=0) -> GridState:
        # rbg keys: XLA's native RngBitGenerator is several times faster
        # than threefry for the 3 x [slots] noise fields drawn every step
        # (the reference analogously uses curand/saru counter RNGs on the
        # hot path rather than a cryptographic generator).
        gs = pack(self.spec, pos, key=jax.random.key(seed, impl="rbg"))
        if self.temperature > 0:
            k1, k2 = jax.random.split(gs.key)
            sd = float(np.sqrt(self.temperature / self.mass))
            shape = gs.x.shape
            m = gs.mask
            dt_ = gs.x.dtype
            gs = gs.replace(
                vx=sd * jax.random.normal(k1, shape, dt_) * m,
                vy=sd * jax.random.normal(jax.random.fold_in(k1, 1), shape, dt_) * m,
                vz=sd * jax.random.normal(jax.random.fold_in(k1, 2), shape, dt_) * m,
                key=k2,
            )
        return self.compute_forces(gs)

    def compute_forces(self, gs: GridState) -> GridState:
        with jax.named_scope("uammd.engine.pair_forces"):
            fx, fy, fz = self.force_kernel(gs.x, gs.y, gs.z)[:3]
        m = gs.mask
        return gs.replace(fx=fx * m, fy=fy * m, fz=fz * m)

    def step(self, gs: GridState) -> GridState:
        """One Gronbech-Jensen Langevin step (reference:
        src/Integrator/VerletNVT/GronbechJensen.cu:20-62).

        Order: position/velocity update with f(t) -> drift-triggered rebin
        (forces dropped: f(t) is fully consumed by then) -> new forces ->
        final half kick. Rebinning after the position update keeps the drift
        check tight and lets the rebin move 7 instead of 10 quantities."""
        dt = np.float32(self.dt)
        m = np.float32(self.mass)
        mask = gs.mask
        key, sub = jax.random.split(gs.key)
        if self.temperature > 0:
            amp = np.float32(
                np.sqrt(2.0 * self.temperature * self.friction * self.mass * self.dt)
            )
            shape = gs.x.shape
            dt_ = gs.x.dtype
            nx_ = amp * jax.random.normal(sub, shape, dt_)
            ny_ = amp * jax.random.normal(jax.random.fold_in(sub, 1), shape, dt_)
            nz_ = amp * jax.random.normal(jax.random.fold_in(sub, 2), shape, dt_)
        else:
            nx_ = ny_ = nz_ = jnp.zeros_like(gs.x)
        gdt = np.float32(0.5 * self.friction * self.dt)
        b = np.float32(1.0 / (1.0 + gdt))
        a = np.float32((1.0 - gdt) * b)
        c_x = np.float32(0.5) * b * dt / m

        x = gs.x + mask * (b * dt * gs.vx + c_x * (dt * gs.fx + nx_))
        y = gs.y + mask * (b * dt * gs.vy + c_x * (dt * gs.fy + ny_))
        z = gs.z + mask * (b * dt * gs.vz + c_x * (dt * gs.fz + nz_))
        hv = np.float32(0.5) * dt / m
        vx = mask * (a * gs.vx + hv * a * gs.fx + (b / m) * nx_)
        vy = mask * (a * gs.vy + hv * a * gs.fy + (b / m) * ny_)
        vz = mask * (a * gs.vz + hv * a * gs.fz + (b / m) * nz_)
        gs = gs.replace(x=x, y=y, z=z, vx=vx, vy=vy, vz=vz, key=key)
        gs = maybe_rebin_noforce(gs)
        gs = self.compute_forces(gs)
        return gs.replace(
            vx=gs.vx + hv * gs.fx, vy=gs.vy + hv * gs.fy, vz=gs.vz + hv * gs.fz
        )

    def step_nve(self, gs: GridState) -> GridState:
        dt = np.float32(self.dt)
        m = np.float32(self.mass)
        h = np.float32(0.5) * dt / m
        vx = gs.vx + h * gs.fx
        vy = gs.vy + h * gs.fy
        vz = gs.vz + h * gs.fz
        gs = gs.replace(
            x=gs.x + gs.mask * dt * vx,
            y=gs.y + gs.mask * dt * vy,
            z=gs.z + gs.mask * dt * vz,
            vx=vx, vy=vy, vz=vz,
        )
        gs = maybe_rebin_noforce(gs)
        gs = self.compute_forces(gs)
        return gs.replace(
            vx=gs.vx + h * gs.fx, vy=gs.vy + h * gs.fy, vz=gs.vz + h * gs.fz
        )

    def _scan_fn(self, n_steps: int, nve: bool):
        # Cache lives on the instance (not a module dict keyed by id(self)):
        # ties the compiled scans' lifetime to the object and cannot alias
        # a recycled id after GC.
        key = (n_steps, nve)
        cache = self.__dict__.get("_scan_cache")
        if cache is None:
            cache = {}
            object.__setattr__(self, "_scan_cache", cache)
        if key not in cache:
            step = self.step_nve if nve else self.step

            @jax.jit
            def go(gs):
                def body(g, _):
                    return step(g), None
                out, _ = jax.lax.scan(body, gs, None, length=n_steps)
                return out

            cache[key] = go
        return cache[key]

    def run(self, gs: GridState, n_steps: int, *, nve: bool = False) -> GridState:
        """Advance n_steps in one compiled scan (compiled once per length —
        prefer repeated calls with the same n_steps, e.g. fixed chunks)."""
        return self._scan_fn(n_steps, nve)(gs)

    def temperature_of(self, gs: GridState) -> jax.Array:
        ke = 0.5 * self.mass * jnp.sum(gs.vx**2 + gs.vy**2 + gs.vz**2)
        return 2.0 * ke / (3.0 * gs.n)


def make_lj_md(
    box_size,
    n: int,
    *,
    epsilon: float = 1.0,
    sigma: float = 1.0,
    cutoff: float = 2.5,
    skin: float = 1.2,
    dt: float = 0.01,
    temperature: float = 1.0,
    friction: float = 1.0,
    mass: float = 1.0,
    cap: int | None = None,
    interpret: bool | None = None,
    pos=None,
) -> GridMD:
    """The reference benchmark system (examples/misc/benchmark.cu:172-181)."""
    spec = choose_spec(box_size, n, cutoff, skin=skin, cap=cap, pos=pos)
    kern = make_pair_force_kernel(
        spec, lj_g(epsilon, sigma), interpret=interpret
    )
    return GridMD(
        spec=spec, force_kernel=kern, dt=dt,
        temperature=temperature, friction=friction, mass=mass,
    )


def lj_g_fast(epsilon=1.0, sigma=1.0):
    """lj_g with the TPU's hardware approximate reciprocal (Pallas-only;
    ~2^-12 relative error on 1/r2, amplified to ~2e-3 on the r^-14 force
    term — fine for thermostatted runs, not for strict NVE drift studies.
    The reference's CUDA builds commonly enable the analogous fast-math
    division). Use inside Pallas kernels only (pl.reciprocal)."""
    from jax.experimental import pallas as pl

    eps = np.float32(epsilon)
    s2 = np.float32(sigma * sigma)

    def g(r2):
        t = pl.reciprocal(r2, approx=True)
        inv2 = s2 * t
        inv6 = inv2 * inv2 * inv2
        return (np.float32(-24.0) * eps) * t * (2.0 * inv6 * inv6 - inv6)

    return g


def lj_g_fused(epsilon=1.0, sigma=1.0, *, rc2, clamp_lo=4e-3, approx=True):
    """Minimum-op LJ radial function with the cutoff/clamp selects fused in.

    Writes (dE/dr)/r as t^4 * (c1*t^3 + c2) with t = 1/r2 (sigma folded
    into the two static coefficients), which is 2 VPU ops shorter than the
    inv6-factored form. The degenerate-slot floor is a ``max`` clamp on r2
    (1 op) instead of a lower-bound compare folded into the cutoff select
    (cmp + and, 2 ops): below ``clamp_lo`` only padded / self slots with
    d == 0 live, so the clamped value just needs to stay FINITE — the force
    term g*d is exactly zero there either way (and a hypothetical real pair
    under the floor now gets the clamped repulsion instead of silent zero,
    matching the non-fused kernel wrapper). Kernels detect the fused
    contract through the ``.fused`` attribute and skip their own
    clamp/cutoff wrapper.

    ``approx`` uses the TPU hardware approximate reciprocal (Pallas only,
    ~2^-12 relative error — the accuracy class of the reference's
    fast-math CUDA builds); ``approx=False`` is exact and runs anywhere.
    """
    s6 = float(sigma) ** 6
    c1 = np.float32(-48.0 * epsilon * s6 * s6)
    c2 = np.float32(24.0 * epsilon * s6)
    rc2_ = np.float32(rc2)
    lo_ = np.float32(clamp_lo)
    zero = np.float32(0.0)

    if approx:
        from jax.experimental import pallas as pl

        def recip(r2):
            return pl.reciprocal(r2, approx=True)
    else:
        def recip(r2):
            return np.float32(1.0) / r2

    def g(r2):
        t = recip(jnp.maximum(r2, lo_))
        t2 = t * t
        t3 = t2 * t
        t4 = t2 * t2
        return jnp.where(r2 < rc2_, t4 * (c1 * t3 + c2), zero)

    g.fused = True
    return g
