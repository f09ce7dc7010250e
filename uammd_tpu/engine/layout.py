"""Grid-resident particle layout for the TPU pair-force engine.

This is the performance-path analog of the reference's sorted ParticleData +
CellList (reference: src/utils/ParticleSorter.cuh:129, src/Interactor/
NeighbourList/CellList/CellListBase.cuh:30-230). The reference keeps particles
spatially hash-sorted for locality and maintains id<->index maps
(ParticleData.cuh:298, :492); here we go one step further and keep the
particle state *resident in a dense cell grid*, because on TPU the win is not
cache locality but the total elimination of gathers/scatters from the hot
loop: pair forces become lane-rolls of VMEM blocks (see pair_kernel.py).

Layout
------
Every per-particle quantity is stored as ``[nz, nyb, CAP, NLANE]`` float32:

- cells: the box is split into (nx, ny, nz) cells with edge >= cutoff*skin.
- fold: F consecutive y-rows are folded into the lane dimension so
  NLANE = nx*F approaches 128 (the TPU lane width). Lane l encodes
  (cx = l // F, f = l % F); the actual row is y = yb*F + f, where yb is the
  second array axis (nyb = ny / F blocks).
- CAP: fixed per-cell capacity (multiple of 8 = f32 sublane tile).
- empty slots hold position EMPTY_POS (1e9) so every pair involving them
  fails the cutoff test with zero special-casing; their pid is -1.

Rebinning (triggered by the reference VerletList's half-skin drift criterion,
reference: VerletListBase.cuh:56-70) runs fully under jit with **two variadic
``lax.sort`` calls and no gathers/scatters** (both are pathologically slow on
this platform): the real slots plus one synthetic "filler" entry per slot are
sorted by cell, ranked, and re-sorted by destination slot — the fillers
guarantee every destination slot is produced exactly once, so the result is a
plain reshape. Cell overflow sets a flag (reference error-flag idiom,
CellListBase.cuh:82-85) for the host to regrow CAP.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

EMPTY_POS = 1.0e9


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static geometry of the grid-resident layout."""

    box_size: tuple  # (Lx, Ly, Lz) floats
    shape: tuple  # (nx, ny, nz) cells
    cap: int
    fold: int
    cutoff: float
    skin: float  # rl = cutoff*skin; cells are >= rl on each axis
    # Straggler capacity: when > 0, CAP covers the occupancy *quantile*
    # instead of the max, and the few particles ranked >= CAP in an
    # overflowing cell ride in a dense [n_strag] side list handled by a
    # broadcast pass (engine/kernel2.py). Kernel cost scales with CAP^2, so
    # shaving CAP from the max (32) to the bulk (24) is a 1.8x win on the
    # reference benchmark workload (docs/PERF.md "CAP padding").
    n_strag: int = 0

    @property
    def nyb(self) -> int:
        return self.shape[1] // self.fold

    @property
    def nlane(self) -> int:
        return self.shape[0] * self.fold

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.shape
        return nx * ny * nz

    @property
    def n_slots(self) -> int:
        return self.n_cells * self.cap

    @property
    def cell_size(self) -> tuple:
        return tuple(L / n for L, n in zip(self.box_size, self.shape))

    @property
    def array_shape(self) -> tuple:
        return (self.shape[2], self.nyb, self.cap, self.nlane)

    @property
    def drift_threshold(self) -> float:
        """Half the true cell slack: pairs within cutoff stay inside the
        one-cell stencil as long as every particle drifted less than
        (cell - cutoff)/2 on each axis (the cells are usually a bit larger
        than cutoff*skin because the box quantizes to whole cells)."""
        slack = min(self.cell_size) - self.cutoff
        return 0.5 * max(slack, 1e-6)


def choose_spec(
    box_size,
    n: int,
    cutoff: float,
    skin: float = 1.2,
    max_lanes: int = 128,
    cap: int | None = None,
    pos=None,
    n_strag: int = 0,
    strag_cell_excess: int = 6,
    strag_headroom: float = 3.0,
    nz_multiple: int = 1,
) -> GridSpec:
    """Pick (nx, ny, nz), fold F and CAP for a target box/density.

    Cells must be >= cutoff*skin on each axis (27-stencil correctness); the
    fold maximizes lane usage (F*nx <= max_lanes, ny % F == 0); CAP covers
    mean occupancy + ~4 sigma Poisson margin (liquid fluctuations are
    sub-Poissonian, so this is conservative).
    """
    Ls = [float(s) for s in np.broadcast_to(np.asarray(box_size, float), (3,))]
    rl = cutoff * skin
    nx_nat = max(3, int(Ls[0] / rl))
    nz = max(3, int(Ls[2] / rl))
    ny_nat = max(3, int(Ls[1] / rl))
    if nz_multiple > 1:
        # Floor nz to a multiple (larger z-cells are always stencil-correct)
        # so a z-slab mesh divides the grid evenly; never round UP (that
        # would shrink cells below the cutoff).
        nz_f = (nz // nz_multiple) * nz_multiple
        if nz_f < 3:
            raise ValueError(
                f"box z ({Ls[2]}) too small for nz multiple {nz_multiple} "
                f"at cutoff*skin {rl}")
        nz = nz_f
    # Geometry search: cells may always be *larger* than rl (fewer of them),
    # so pick (nx, ny, F) minimizing the kernel cost model
    # nz * nyb * CAP_est^2 (the hardware always processes 128 lanes, so a
    # poor fold/lane fit shows up as extra blocks, not cheaper ones).
    best = None
    for nx in range(3, nx_nat + 1):
        for F in range(1, max(1, max_lanes // nx) + 1):
            ny = (ny_nat // F) * F
            if ny < 3 or ny // F < 3:
                continue
            lam = n / float(nx * ny * nz)
            cap_est = int(math.ceil(
                (lam + 4.0 * math.sqrt(lam) + 2.0) / 8.0)) * 8
            cost = nz * (ny // F) * cap_est * cap_est
            # Lane-alignment penalty (measured on v5e, round 3): with
            # NLANE = nx*F != 128 every stencil/reaction lane roll lowers
            # to a misaligned multi-op shuffle instead of a native vreg
            # rotate; the same kernel runs ~1.85x slower per cap^2-block
            # unit (probe_lj3: 42x42x42/F3/cap24 = 27.8 ns/unit vs
            # 32x40x42/F4/cap32 = 15.0 ns/unit). Exact-128 geometries win
            # even at substantially more padded candidate volume.
            if nx * F != max_lanes:
                cost = cost * 1.85
            # prefer more lanes on ties (denser lane usage, fewer blocks)
            key_ = (cost, -(nx * F))
            if best is None or key_ < best[0]:
                best = (key_, nx, ny, F)
    _, nx, ny, F = best
    if cap is None:
        lam = (
            n / (Ls[0] * Ls[1] * Ls[2])
            * (Ls[0] / nx) * (Ls[1] / ny) * (Ls[2] / nz)
        )
        cap = int(math.ceil((lam + 4.0 * math.sqrt(lam) + 2.0) / 8.0)) * 8
        if pos is not None:
            # actual max occupancy of the starting configuration (e.g. a
            # lattice incommensurate with the grid can exceed the liquid
            # fluctuation estimate)
            p = np.asarray(pos)
            idx = [
                np.clip(
                    ((p[:, d] / Ls[d] + 0.5) % 1.0 * nd).astype(np.int64),
                    0, nd - 1,
                )
                for d, nd in enumerate((nx, ny, nz))
            ]
            flat = (idx[2] * ny + idx[1]) * nx + idx[0]
            counts = np.bincount(flat, minlength=nx * ny * nz)
            occ = int(counts.max())
            # the measured occupancy (with a fluctuation margin) REPLACES the
            # Poisson estimate — real liquids are sub-Poissonian, and CAP^2
            # drives the kernel cost
            cap = (occ + max(2, occ // 8) + 7) // 8 * 8
            if n_strag > 0:
                # Straggler mode: CAP covers the bulk, the side list absorbs
                # the tail. Pick the smallest CAP whose expected overflow
                # leaves >= 2x headroom in the list and whose per-cell excess
                # fits ``strag_cell_excess`` (the LJ rebin kernel's 8-slot
                # overflow mini-grid needs <= 6; repack-every-step consumers
                # like the PSE near field can pass a large value).
                for c in range(8, cap + 1, 8):
                    excess = np.maximum(counts - c, 0)
                    if (excess.sum() * strag_headroom <= n_strag
                            and excess.max() <= strag_cell_excess):
                        cap = c
                        break
    return GridSpec(
        box_size=tuple(Ls), shape=(nx, ny, nz), cap=cap, fold=F,
        cutoff=float(cutoff), skin=float(skin), n_strag=int(n_strag),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridState:
    """Grid-resident MD state. All grid arrays [nz, nyb, CAP, NLANE].

    When ``spec.n_strag > 0`` the ``s*`` fields hold the straggler side list
    ([S] dense rows for particles whose cell exceeded CAP at the last rebin;
    see GridSpec.n_strag): spos/svel [S, 3], spid int32 (-1 = empty slot).
    Stragglers interact with everything through the broadcast lane of the v2
    pair kernel and are re-absorbed into cells at every rebin.
    """

    spec: GridSpec = dataclasses.field(metadata={"static": True})
    n: int = dataclasses.field(metadata={"static": True})
    x: jax.Array
    y: jax.Array
    z: jax.Array
    vx: jax.Array
    vy: jax.Array
    vz: jax.Array
    fx: jax.Array
    fy: jax.Array
    fz: jax.Array
    pid: jax.Array  # int32, -1 = empty
    ref_x: jax.Array  # positions at last rebin (drift check)
    ref_y: jax.Array
    ref_z: jax.Array
    key: jax.Array
    overflow: jax.Array  # bool, latching
    step: jax.Array  # int32 monotone step counter (fused-kernel PRNG seed)
    spos: jax.Array  # [S, 3] straggler positions (EMPTY_POS on empty rows)
    svel: jax.Array  # [S, 3]
    sforce: jax.Array  # [S, 3]
    spid: jax.Array  # [S] int32, -1 = empty
    # Unfolded Newton reaction groups (12 grid arrays, engine/kernel2.py
    # REACTION_GROUPS x 3 components) when the fused update performs the
    # fold in-kernel (engine/md2.py fold_in_update); () otherwise. The
    # physical force is fx + sum of shifted groups — use
    # GridMD2.folded_forces for observables.
    fgrp: tuple = ()

    @property
    def mask(self) -> jax.Array:
        return self.pid >= 0

    @property
    def smask(self) -> jax.Array:
        return self.spid >= 0

    def replace(self, **kw) -> "GridState":
        return dataclasses.replace(self, **kw)


def _cell_key(spec: GridSpec, x, y, z, valid):
    """Memory-order cell key of positions: ((cz*nyb + yb)*NLANE + lane).

    Matches the flat order of [nz, nyb, NLANE] so slot-sorted data reshapes
    straight into the grid. Invalid entries get key = n_cells (sorts last).
    """
    nx, ny, nz = spec.shape
    F = spec.fold

    def cell_of(p, L, ncell):
        frac = p / L + 0.5
        frac = frac - jnp.floor(frac)
        return jnp.clip((frac * ncell).astype(jnp.int32), 0, ncell - 1)

    cx = cell_of(x, x.dtype.type(spec.box_size[0]), nx)
    cy = cell_of(y, y.dtype.type(spec.box_size[1]), ny)
    cz = cell_of(z, z.dtype.type(spec.box_size[2]), nz)
    yb = cy // F
    f = cy - yb * F
    lane = cx * F + f
    key = (cz * spec.nyb + yb) * spec.nlane + lane
    return jnp.where(valid, key, spec.n_cells)


def _bin_columns(spec: GridSpec, key, cols, n: int, fills=None):
    """Core two-sort binning: place entries with cell ``key`` into the padded
    grid. ``cols`` = tuple of payload columns (float32/int32, 1-D, same length
    as key). ``fills`` optionally overrides the empty-slot fill value per
    column (default: -1 for ints, EMPTY_POS for floats — payload channels
    like forces should pass 0.0). Returns (binned_cols, strag_cols, overflow):
    each binned col is [nz, nyb, CAP, NLANE]; strag_cols are the [S] straggler
    rows (entries ranked >= CAP in an overflowing cell; S = spec.n_strag,
    empty when 0) padded with the fill values."""
    nz_, nyb, cap, nlane = spec.array_shape
    T = spec.n_slots
    S = spec.n_strag
    ncell = nz_ * nyb * nlane  # memory cells
    m = key.shape[0]

    # append one filler per slot (key2 = cell*2+1 sorts after reals of cell*2)
    filler_cell = jnp.repeat(jnp.arange(ncell, dtype=jnp.int32), cap)
    key2 = jnp.concatenate([key * 2, filler_cell * 2 + 1])

    def pad_col(c, fill_value):
        if fill_value is None:
            fill_value = (
                -1 if jnp.issubdtype(c.dtype, jnp.integer) else EMPTY_POS
            )
        fill = jnp.full((T,), fill_value, c.dtype)
        return jnp.concatenate([c, fill])

    if fills is None:
        fills = (None,) * len(cols)
    stream = (key2,) + tuple(
        pad_col(c, f) for c, f in zip(cols, fills)
    )
    s = jax.lax.sort(stream, dimension=0, num_keys=1)
    skey2 = s[0]
    cell = skey2 >> 1
    idx = jnp.arange(m + T, dtype=jnp.int32)
    first = jnp.searchsorted(cell, cell, side="left").astype(jnp.int32)
    rank = idx - first
    kept = (cell < ncell) & (rank < cap)
    is_real = (skey2 & 1) == 0
    is_strag = is_real & (cell < ncell) & (rank >= cap)
    n_over = jnp.sum(is_strag)
    # destination: grid slots [0, T), stragglers right after (ordered by
    # their position in the first sort), junk (excess fillers + invalid
    # entries) last
    strag_rank = jnp.cumsum(is_strag) - 1
    slot = jnp.where(
        kept,
        cell * cap + rank,
        jnp.where(is_strag, T + strag_rank, T + m + idx),
    )
    s2 = jax.lax.sort((slot,) + s[1:], dimension=0, num_keys=1)

    def to_grid(c):
        g = c[:T].reshape(nz_, nyb, nlane, cap)
        return jnp.swapaxes(g, 2, 3)  # -> [nz, nyb, CAP, NLANE]

    if S > 0:
        svalid = jnp.arange(S) < n_over
        strag_cols = tuple(
            jnp.where(
                svalid,
                c[T:T + S],
                (-1 if jnp.issubdtype(c.dtype, jnp.integer) else
                 (0.0 if f == 0.0 else EMPTY_POS)),
            )
            for c, f in zip(s2[1:], fills)
        )
        overflow = n_over > S
    else:
        strag_cols = tuple(c[:0] for c in s2[1:])
        overflow = n_over > 0
    return tuple(to_grid(c) for c in s2[1:]), strag_cols, overflow


def pack(
    spec: GridSpec,
    pos,  # [N, 3]
    vel=None,
    force=None,
    key=None,
    pid=None,
) -> GridState:
    """Build a GridState from canonical [N]-order arrays."""
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    Ls = spec.box_size
    x = pos[:, 0] - Ls[0] * jnp.round(pos[:, 0] / Ls[0])
    y = pos[:, 1] - Ls[1] * jnp.round(pos[:, 1] / Ls[1])
    z = pos[:, 2] - Ls[2] * jnp.round(pos[:, 2] / Ls[2])
    vel = jnp.zeros((n, 3), jnp.float32) if vel is None else jnp.asarray(vel, jnp.float32)
    force = jnp.zeros((n, 3), jnp.float32) if force is None else jnp.asarray(force, jnp.float32)
    pid = jnp.arange(n, dtype=jnp.int32) if pid is None else jnp.asarray(pid, jnp.int32)
    ck = _cell_key(spec, x, y, z, jnp.ones((n,), bool))
    cols = (x, y, z, vel[:, 0], vel[:, 1], vel[:, 2],
            force[:, 0], force[:, 1], force[:, 2], pid)
    fills = (None, None, None, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, None)
    (gx, gy, gz, gvx, gvy, gvz, gfx, gfy, gfz, gpid), strag, ovf = (
        _bin_columns(spec, ck, cols, n, fills=fills)
    )
    if key is None:
        key = jax.random.key(0)
    return GridState(
        spec=spec, n=n,
        x=gx, y=gy, z=gz, vx=gvx, vy=gvy, vz=gvz, fx=gfx, fy=gfy, fz=gfz,
        pid=gpid, ref_x=gx, ref_y=gy, ref_z=gz,
        key=key, overflow=ovf, step=jnp.int32(0),
        spos=jnp.stack(strag[0:3], axis=-1),
        svel=jnp.stack(strag[3:6], axis=-1),
        sforce=jnp.stack(strag[6:9], axis=-1),
        spid=strag[9],
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChannelGrid:
    """Cell-resident positions + payload channels (no integrator state):
    the layout used by grid-resident solvers (PSE near field, SPH, DPD)
    where per-particle payloads ride along with the coordinates.

    When ``spec.n_strag > 0`` the ``s*`` fields carry the straggler side
    list (particles ranked past CAP in an overflowing cell): spos [S, 3],
    schannels tuple of [S] (zero on empties), spid [S] int32 (-1 = empty).
    """

    spec: GridSpec = dataclasses.field(metadata={"static": True})
    n: int = dataclasses.field(metadata={"static": True})
    x: jax.Array
    y: jax.Array
    z: jax.Array
    channels: tuple  # of [nz, nyb, CAP, NLANE] arrays (zero on empties)
    pid: jax.Array  # int32, -1 = empty
    overflow: jax.Array
    spos: jax.Array  # [S, 3] straggler positions (EMPTY_POS on empties)
    schannels: tuple  # of [S] arrays (zero on empties)
    spid: jax.Array  # [S] int32, -1 = empty

    @property
    def mask(self) -> jax.Array:
        return self.pid >= 0

    @property
    def smask(self) -> jax.Array:
        return self.spid >= 0

    def replace(self, **kw) -> "ChannelGrid":
        return dataclasses.replace(self, **kw)


def pack_channels(spec: GridSpec, pos, channels) -> ChannelGrid:
    """Bin [N, 3] positions plus a [N, C] channel payload into the grid.
    Channel empties fill with 0 (so payload-linear kernels see exact zeros
    from empty slots). With ``spec.n_strag > 0`` the occupancy tail past CAP
    lands in the straggler side list instead of raising overflow."""
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    channels = jnp.asarray(channels, jnp.float32)
    if channels.ndim == 1:
        channels = channels[:, None]
    C = channels.shape[1]
    S = spec.n_strag
    Ls = spec.box_size
    x = pos[:, 0] - Ls[0] * jnp.round(pos[:, 0] / Ls[0])
    y = pos[:, 1] - Ls[1] * jnp.round(pos[:, 1] / Ls[1])
    z = pos[:, 2] - Ls[2] * jnp.round(pos[:, 2] / Ls[2])
    pid = jnp.arange(n, dtype=jnp.int32)
    ck = _cell_key(spec, x, y, z, jnp.ones((n,), bool))
    cols = (x, y, z) + tuple(channels[:, c] for c in range(C)) + (pid,)
    fills = (None, None, None) + (0.0,) * C + (None,)
    binned, strag, ovf = _bin_columns(spec, ck, cols, n, fills=fills)
    if S > 0:
        spos = jnp.stack(strag[0:3], axis=-1)
        schannels = tuple(strag[3:3 + C])
        spid = strag[3 + C]
    else:
        spos = jnp.full((0, 3), EMPTY_POS, jnp.float32)
        schannels = tuple(jnp.zeros((0,), jnp.float32) for _ in range(C))
        spid = jnp.full((0,), -1, jnp.int32)
    return ChannelGrid(
        spec=spec, n=n,
        x=binned[0], y=binned[1], z=binned[2],
        channels=tuple(binned[3:3 + C]),
        pid=binned[3 + C], overflow=ovf,
        spos=spos, schannels=schannels, spid=spid,
    )


def unpack_values(cg: ChannelGrid, values, svalues=None) -> jax.Array:
    """Slot-space values (tuple of [nz, nyb, CAP, NLANE]) -> [N, len(values)]
    in canonical pid order (sort-based, no gathers). ``svalues`` optionally
    appends the straggler rows (tuple of [S] arrays matching cg.spid)."""
    valid = cg.pid >= 0
    pid = jnp.where(valid, cg.pid, cg.n).reshape(-1)
    cols = tuple(jnp.asarray(v).reshape(-1) for v in values)
    if svalues is not None and cg.spid.shape[0] > 0:
        spid = jnp.where(cg.spid >= 0, cg.spid, cg.n)
        pid = jnp.concatenate([pid, spid])
        cols = tuple(
            jnp.concatenate([c, jnp.asarray(s).reshape(-1)])
            for c, s in zip(cols, svalues)
        )
    s = jax.lax.sort((pid,) + cols, dimension=0, num_keys=1)
    return jnp.stack([c[: cg.n] for c in s[1:]], axis=-1)


def rebin(gs: GridState) -> GridState:
    """Re-sort all slots (plus the straggler side list, when enabled) into
    their current cells (jit-safe, no gathers)."""
    spec = gs.spec
    Ls = spec.box_size
    valid = gs.pid >= 0
    # wrap into primary box; empties stay at EMPTY_POS
    x = jnp.where(valid, gs.x - Ls[0] * jnp.round(gs.x / Ls[0]), EMPTY_POS)
    y = jnp.where(valid, gs.y - Ls[1] * jnp.round(gs.y / Ls[1]), EMPTY_POS)
    z = jnp.where(valid, gs.z - Ls[2] * jnp.round(gs.z / Ls[2]), EMPTY_POS)
    ck = _cell_key(spec, x, y, z, valid)

    def flat(a):
        return a.reshape(-1)

    cols = [flat(x), flat(y), flat(z),
            flat(gs.vx), flat(gs.vy), flat(gs.vz),
            flat(gs.fx), flat(gs.fy), flat(gs.fz), flat(gs.pid)]
    keys = flat(ck)
    if spec.n_strag > 0:
        sv = gs.spid >= 0
        sp = [
            jnp.where(
                sv,
                gs.spos[:, d] - Ls[d] * jnp.round(gs.spos[:, d] / Ls[d]),
                EMPTY_POS,
            )
            for d in range(3)
        ]
        sck = _cell_key(spec, sp[0], sp[1], sp[2], sv)
        keys = jnp.concatenate([keys, sck])
        extra = sp + [gs.svel[:, d] for d in range(3)] + [
            gs.sforce[:, d] for d in range(3)
        ] + [gs.spid]
        cols = [jnp.concatenate([c, e.astype(c.dtype)])
                for c, e in zip(cols, extra)]
    fills = (None, None, None, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, None)
    (gx, gy, gz, gvx, gvy, gvz, gfx, gfy, gfz, gpid), strag, ovf = (
        _bin_columns(spec, keys, tuple(cols), gs.n, fills=fills)
    )
    return gs.replace(
        x=gx, y=gy, z=gz, vx=gvx, vy=gvy, vz=gvz, fx=gfx, fy=gfy, fz=gfz,
        pid=gpid, ref_x=gx, ref_y=gy, ref_z=gz,
        overflow=gs.overflow | ovf,
        spos=jnp.stack(strag[0:3], axis=-1) if spec.n_strag else gs.spos,
        svel=jnp.stack(strag[3:6], axis=-1) if spec.n_strag else gs.svel,
        sforce=jnp.stack(strag[6:9], axis=-1) if spec.n_strag else gs.sforce,
        spid=strag[9] if spec.n_strag else gs.spid,
    )


def needs_rebin(gs: GridState) -> jax.Array:
    """Half-skin drift criterion (reference: VerletListBase.cuh:56-70)."""
    thr2 = jnp.float32(gs.spec.drift_threshold ** 2)
    m = gs.mask
    d2 = jnp.where(
        m,
        (gs.x - gs.ref_x) ** 2 + (gs.y - gs.ref_y) ** 2 + (gs.z - gs.ref_z) ** 2,
        0.0,
    )
    return jnp.max(d2) > thr2


def maybe_rebin(gs: GridState) -> GridState:
    return jax.lax.cond(needs_rebin(gs), rebin, lambda g: g, gs)


def unpack(gs: GridState):
    """Back to canonical [N]-order (pos, vel, force) — off the hot path.
    Includes the straggler side list when enabled."""
    valid = gs.pid >= 0
    pid = jnp.where(valid, gs.pid, gs.n).reshape(-1)  # empties last
    cols = [
        a.reshape(-1)
        for a in (gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz, gs.fx, gs.fy, gs.fz)
    ]
    if gs.spec.n_strag > 0:
        spid = jnp.where(gs.spid >= 0, gs.spid, gs.n)
        pid = jnp.concatenate([pid, spid])
        extra = [gs.spos[:, d] for d in range(3)] + [
            gs.svel[:, d] for d in range(3)
        ] + [gs.sforce[:, d] for d in range(3)]
        cols = [jnp.concatenate([c, e]) for c, e in zip(cols, extra)]
    s = jax.lax.sort((pid,) + tuple(cols), dimension=0, num_keys=1)
    n = gs.n
    pos = jnp.stack([s[1][:n], s[2][:n], s[3][:n]], axis=-1)
    vel = jnp.stack([s[4][:n], s[5][:n], s[6][:n]], axis=-1)
    force = jnp.stack([s[7][:n], s[8][:n], s[9][:n]], axis=-1)
    return pos, vel, force
