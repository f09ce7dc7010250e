"""v2 high-throughput MD engine: Newton pair kernel + stragglers + fused
Gronbech-Jensen update.

Drop-in evolution of engine/md.py (same reference workload, examples/misc/
benchmark.cu), composing the round-2 performance features:

- CAP sized to the bulk occupancy, overflow in a dense straggler side list
  (layout.GridSpec.n_strag, kernel2 straggler rows, rebin_kernel.rebin_fast2);
- Newton's-third-law pair kernel (kernel2.make_newton_pair_kernel) + one
  fold pass for the cross-block reactions;
- fused G-J update with in-register Box-Muller noise from the TPU hardware
  PRNG (update_kernel) on TPU; jnp mirror elsewhere.

Velocity convention: the state's (vx, vy, vz) carry the *pre-half-kick*
velocity w(t) = v(t) - (dt/2m) f(t) (see update_kernel docstring);
``velocities_of`` / ``temperature_of`` reconstruct the physical v.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .kernel2 import (
    broadcast_stragglers,
    fold_reactions_jnp,
    make_fold_kernel,
    make_newton_pair_kernel,
    straggler_pair_forces,
)
from .layout import GridState, GridSpec, choose_spec, pack
from .md import lj_g
from .rebin_kernel import rebin_fast2, rebin_fast3, rebin_fast_noforce
from .update_kernel import (
    gj_update_jnp,
    make_gj_fold_update_kernel,
    make_gj_update_kernel,
)


@dataclasses.dataclass(frozen=True)
class GridMD2:
    """Bound v2 engine: spec + kernels + integrator parameters."""

    spec: GridSpec
    g_fn: object
    dt: float
    temperature: float
    friction: float
    mass: float
    use_fused_update: bool
    fold_in_update: bool = False
    noise: str = "bm"

    @staticmethod
    def create(spec: GridSpec, g_fn, *, dt, temperature, friction=1.0,
               mass=1.0, interpret: bool | None = None, g_fn_kernel=None,
               fold_in_update: bool | None = None, noise: str = "bm",
               self_half: bool = False, strag_cellcenter: bool = False):
        """``g_fn_kernel`` optionally overrides the radial function used
        INSIDE the Pallas kernel (e.g. md.lj_g_fast with the hardware
        approximate reciprocal); ``g_fn`` stays the jnp-evaluable version
        used for the straggler pair pass. ``fold_in_update`` merges the
        Newton reaction fold into the fused G-J update kernel (default on
        when the fused update is available); ``noise`` = "bm" | "clt"
        selects the in-kernel Gaussian generator (update_kernel)."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        fused = not interpret
        if fold_in_update is None:
            fold_in_update = fused
        md = GridMD2(
            spec=spec, g_fn=g_fn, dt=dt, temperature=temperature,
            friction=friction, mass=mass,
            use_fused_update=fused,
            fold_in_update=bool(fold_in_update and fused),
            noise=noise,
        )
        object.__setattr__(
            md, "_pair",
            make_newton_pair_kernel(
                spec, g_fn_kernel if g_fn_kernel is not None else g_fn,
                interpret=interpret,
                self_half=bool(self_half and not interpret),
                strag_cellcenter=strag_cellcenter,
            )
        )
        object.__setattr__(
            md, "_fold",
            make_fold_kernel(spec, interpret=interpret) if not interpret
            else None,
        )
        if md.fold_in_update:
            object.__setattr__(
                md, "_update",
                make_gj_fold_update_kernel(
                    spec, dt, temperature, friction, mass, noise=noise
                ),
            )
        elif md.use_fused_update:
            object.__setattr__(
                md, "_update",
                make_gj_update_kernel(spec, dt, temperature, friction, mass),
            )
        object.__setattr__(md, "_scan_cache", {})
        return md

    # ----------------------------------------------------------- forces
    def compute_forces(self, gs: GridState) -> GridState:
        S = self.spec.n_strag
        hv = np.float32(0.5 * self.dt / self.mass)
        with jax.named_scope("uammd.engine2.pair_forces"):
            if S:
                strag = broadcast_stragglers(self.spec, gs.spos, gs.spid)
                outs = self._pair(gs.x, gs.y, gs.z, strag)
            else:
                outs = self._pair(gs.x, gs.y, gs.z)
        home = outs[0:3]
        groups = [outs[3 + 3 * i: 6 + 3 * i] for i in range(4)]
        if self.fold_in_update:
            # store home + raw groups; the fused update folds in-kernel
            fx, fy, fz = home
            rep = dict(fx=fx, fy=fy, fz=fz,
                       fgrp=tuple(g[c] for g in groups for c in range(3)))
        elif self._fold is not None:
            fx, fy, fz = self._fold(home, groups)
            rep = dict(fx=fx, fy=fy, fz=fz)
        else:
            fx, fy, fz = fold_reactions_jnp(home, groups)
            rep = dict(fx=fx, fy=fy, fz=fz)
        if S:
            sf = jnp.stack(
                [jnp.sum(outs[15 + c], axis=(0, 1, 3)) for c in range(3)],
                axis=-1,
            )
            sf = sf + straggler_pair_forces(
                self.spec, self.g_fn, gs.spos, gs.spid
            )
            rep["sforce"] = sf * (gs.spid >= 0)[:, None]
        return gs.replace(**rep)

    # ------------------------------------------------------------- init
    def init(self, pos, seed=0, vel=None) -> GridState:
        gs = pack(self.spec, pos, vel=vel,
                  key=jax.random.key(seed, impl="rbg"))
        # per-run base for the monotone fused-kernel seed (see step())
        gs = gs.replace(
            step=jnp.int32((seed * 2654435761 + 12345) % (1 << 31))
        )
        if vel is None and self.temperature > 0:
            k1, k2 = jax.random.split(gs.key)
            sd = float(np.sqrt(self.temperature / self.mass))
            shape = gs.x.shape
            m = gs.mask
            gs = gs.replace(
                vx=sd * jax.random.normal(k1, shape, jnp.float32) * m,
                vy=sd * jax.random.normal(
                    jax.random.fold_in(k1, 1), shape, jnp.float32) * m,
                vz=sd * jax.random.normal(
                    jax.random.fold_in(k1, 2), shape, jnp.float32) * m,
                svel=sd * jax.random.normal(
                    jax.random.fold_in(k1, 3), gs.svel.shape, jnp.float32
                ) * (gs.spid >= 0)[:, None],
                key=k2,
            )
        gs = self.compute_forces(gs)
        # enter the deferred-half-kick convention: w = v - (dt/2m) f
        hv = np.float32(0.5 * self.dt / self.mass)
        ffx, ffy, ffz = self.folded_forces(gs)
        return gs.replace(
            vx=gs.vx - hv * ffx, vy=gs.vy - hv * ffy,
            vz=gs.vz - hv * ffz,
            svel=gs.svel - hv * gs.sforce,
        )

    def folded_forces(self, gs: GridState):
        """Physical (folded) grid forces — identity unless fold_in_update
        deferred the reaction fold to the update kernel."""
        if not self.fold_in_update or not gs.fgrp:
            return gs.fx, gs.fy, gs.fz
        groups = [gs.fgrp[3 * i: 3 * i + 3] for i in range(4)]
        if self._fold is not None:
            return self._fold((gs.fx, gs.fy, gs.fz), groups)
        return fold_reactions_jnp((gs.fx, gs.fy, gs.fz), groups)

    # ------------------------------------------------------------- step
    def _strag_update(self, gs: GridState, key):
        """G-J update for the [S] straggler rows (jnp; S is tiny)."""
        import math

        S = self.spec.n_strag
        dt = np.float32(self.dt)
        hv = np.float32(0.5 * self.dt / self.mass)
        gdt = 0.5 * self.friction * self.dt
        b = np.float32(1.0 / (1.0 + gdt))
        a = np.float32((1.0 - gdt) * b)
        c_x = np.float32(0.5 * b * self.dt / self.mass)
        mask = (gs.spid >= 0)[:, None]
        if self.temperature > 0:
            amp = np.float32(math.sqrt(
                2.0 * self.temperature * self.friction * self.mass * self.dt
            ))
            noise = amp * jax.random.normal(key, (S, 3), jnp.float32)
        else:
            noise = jnp.zeros((S, 3), jnp.float32)
        v = gs.svel + hv * gs.sforce
        spos = gs.spos + mask * (b * dt * v + c_x * (dt * gs.sforce + noise))
        svel = mask * (a * v + hv * a * gs.sforce
                       + (b / np.float32(self.mass)) * noise)
        return gs.replace(spos=spos, svel=svel)

    def step(self, gs: GridState) -> GridState:
        spec = self.spec
        key, k_seed, k_strag = jax.random.split(gs.key, 3)
        if self.fold_in_update:
            # Monotone per-step seed: gs.step carries a per-run random base
            # (set in init) plus the step index, so (seed, program_id)
            # tuples are unique across a run — an independent random draw
            # per step would birthday-collide after ~2^16 steps and reuse
            # whole-step noise fields.
            (x, y, z, wx, wy, wz), drift2 = self._update(
                gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz,
                gs.fx, gs.fy, gs.fz, gs.fgrp,
                gs.ref_x, gs.ref_y, gs.ref_z, gs.step,
            )
        elif self.use_fused_update:
            (x, y, z, wx, wy, wz), drift2 = self._update(
                gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz,
                gs.fx, gs.fy, gs.fz, gs.ref_x, gs.ref_y, gs.ref_z, gs.step,
            )
        else:
            (x, y, z, wx, wy, wz), drift2 = gj_update_jnp(
                spec, self.dt, self.temperature, self.friction, self.mass,
                gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz,
                gs.fx, gs.fy, gs.fz, gs.ref_x, gs.ref_y, gs.ref_z, k_seed,
            )
        gs = gs.replace(x=x, y=y, z=z, vx=wx, vy=wy, vz=wz, key=key,
                        step=gs.step + 1)
        if spec.n_strag:
            gs = self._strag_update(gs, k_strag)
            rebin_fn = rebin_fast3  # separable 3-pass (rebin_fast2 = one-shot)
        else:
            rebin_fn = rebin_fast_noforce
        # drift2 is the max per-axis (infinity-norm) displacement since the
        # last rebin (update_kernel) — compared unsquared against the
        # per-axis half-slack threshold
        thr = jnp.float32(spec.drift_threshold)
        gs = jax.lax.cond(drift2 > thr, rebin_fn, lambda g: g, gs)
        return self.compute_forces(gs)

    def _scan_fn(self, n_steps: int):
        cache = self._scan_cache
        if n_steps not in cache:
            step = self.step

            @jax.jit
            def go(gs):
                def body(g, _):
                    return step(g), None
                out, _ = jax.lax.scan(body, gs, None, length=n_steps)
                return out

            cache[n_steps] = go
        return cache[n_steps]

    def run(self, gs: GridState, n_steps: int) -> GridState:
        return self._scan_fn(n_steps)(gs)

    # ------------------------------------------------------- observables
    def velocities_of(self, gs: GridState):
        hv = np.float32(0.5 * self.dt / self.mass)
        ffx, ffy, ffz = self.folded_forces(gs)
        return (
            (gs.vx + hv * ffx) * gs.mask,
            (gs.vy + hv * ffy) * gs.mask,
            (gs.vz + hv * ffz) * gs.mask,
            (gs.svel + hv * gs.sforce) * (gs.spid >= 0)[:, None],
        )

    def temperature_of(self, gs: GridState) -> jax.Array:
        vx, vy, vz, sv = self.velocities_of(gs)
        ke = 0.5 * self.mass * (
            jnp.sum(vx**2 + vy**2 + vz**2) + jnp.sum(sv**2)
        )
        return 2.0 * ke / (3.0 * gs.n)


def make_lj_md2(
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
    n_strag: int = 32,
    interpret: bool | None = None,
    pos=None,
    fast_recip: bool = False,
    fold_in_update: bool | None = None,
    noise: str = "bm",
    # both defaults measured on-device (scripts/probe_lj4.py, round 4):
    # the circulant Newton-halved self block and the cell-center straggler
    # wrap are exact (checked vs the full kernel) and each shaves ~2% off
    # the pair kernel; self_half auto-disables under interpret.
    self_half: bool = True,
    strag_cellcenter: bool = True,
) -> GridMD2:
    """v2 engine on the reference benchmark system
    (examples/misc/benchmark.cu:172-181). ``fast_recip`` uses the hardware
    approximate reciprocal inside the fused LJ radial function (TPU only;
    see md.lj_g_fused — the fused select-on-t form is used either way)."""
    from .md import lj_g_fused

    spec = choose_spec(box_size, n, cutoff, skin=skin, cap=cap, pos=pos,
                       n_strag=n_strag)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gk = lj_g_fused(epsilon, sigma, rc2=cutoff * cutoff,
                    approx=bool(fast_recip and not interpret))
    return GridMD2.create(
        spec, lj_g(epsilon, sigma), dt=dt, temperature=temperature,
        friction=friction, mass=mass, interpret=interpret, g_fn_kernel=gk,
        fold_in_update=fold_in_update, noise=noise,
        self_half=self_half, strag_cellcenter=strag_cellcenter,
    )
