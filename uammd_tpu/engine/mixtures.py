"""Multi-species / polydisperse pair forces on the grid-resident engine.

The reference handles type-dependent potentials with per-type-pair parameter
tables (reference: src/Interactor/Potential/ParameterHandler.cuh:8) and
offers the LBVH list for widely polydisperse cutoffs (reference:
src/Interactor/NeighbourList/LBVH.cuh:652). The TPU-native translation keeps
the grid-resident layout and rides per-particle *parameter channels* through
the lane-roll kernel (engine/pair_kernel.make_pair_channel_kernel) instead
of gathering table entries per pair:

- **LJ mixtures** (Lorentz-Berthelot): each particle carries
  (sqrt(eps_i), sigma_i/2); the pair parameters reconstruct in-register as
  eps_ij = sqrt(eps_i) sqrt(eps_j), sigma_ij = sigma_i/2 + sigma_j/2 —
  zero table lookups, ~4 extra VPU ops per candidate slot. Arbitrary
  (non-combinable) [T, T] tables fit the same kernel with a select chain
  over T^2 branches (cheap for the small T of real systems).
- **Polydisperse cutoffs**: the per-pair cutoff r_c(ij) = cut_scale *
  (sigma_i/2 + sigma_j/2) masks each candidate; the cell size is set by the
  *maximum* pair cutoff. This covers moderate polydispersity in one pass;
  for extreme ratios the LBVH-style answer is hierarchical grids (a
  fine grid for small-small plus a coarse grid holding everyone for
  cross/large pairs) — two passes of this same kernel.

The reference exploits .w-packed types; here the spare channel slots play
that role (SURVEY §2.1 math-types row).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .layout import GridSpec, choose_spec, pack_channels, unpack_values
from .pair_kernel import make_pair_channel_kernel


def lj_mixture_pair_fn(cut_scale: float = 2.5, clamp_lo: float = 4e-3):
    """pair_fn for make_pair_channel_kernel with channels
    (sqrt_eps, half_sigma): truncated LJ with Lorentz-Berthelot mixing and a
    per-pair cutoff cut_scale * sigma_ij. Returns 3 force outputs."""
    cs2 = np.float32(cut_scale * cut_scale)
    lo = np.float32(clamp_lo)

    def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
        se_i, hs_i = ch_i
        se_j, hs_j = ch_j
        eps = se_i * se_j
        sig = hs_i + hs_j
        sig2 = sig * sig
        rc2 = cs2 * sig2
        # empty slots carry zero channels -> rc2 = 0 -> never inside;
        # the exact self pair has r2 == 0 but also dxv == 0, so the clamped
        # g times the zero displacement contributes nothing.
        inside = (r2 < rc2) & (r2 > 1e-10)
        t = sig2 / jnp.maximum(r2, lo * sig2)
        t6 = t * t * t
        g = jnp.where(
            inside,
            (np.float32(-24.0) * eps / jnp.maximum(r2, lo)) * (
                2.0 * t6 * t6 - t6
            ),
            0.0,
        )
        return g * dxv, g * dyv, g * dzv

    return pair_fn


@dataclasses.dataclass(frozen=True)
class MixtureLJ:
    """Grid-resident polydisperse/multi-species LJ engine front end."""

    spec: GridSpec
    cut_scale: float

    @staticmethod
    def create(box_size, n, epsilon, sigma, *, cut_scale=2.5, skin=1.0,
               cap=None, interpret=None):
        """epsilon/sigma: per-particle arrays (use type_id indexing on the
        caller side for species tables). The grid is sized by the maximum
        pair cutoff cut_scale * max(sigma)."""
        max_sigma = float(np.max(np.asarray(sigma)))
        rcut = cut_scale * max_sigma
        spec = choose_spec(box_size, n, rcut, skin=skin, cap=cap)
        m = MixtureLJ(spec=spec, cut_scale=cut_scale)
        object.__setattr__(
            m, "_kern",
            make_pair_channel_kernel(
                spec, lj_mixture_pair_fn(cut_scale), 2, 3,
                interpret=interpret,
            ),
        )
        return m

    def forces(self, pos, epsilon, sigma):
        """[N, 3] forces for per-particle (epsilon, sigma)."""
        eps = jnp.sqrt(jnp.asarray(epsilon, jnp.float32))
        hs = 0.5 * jnp.asarray(sigma, jnp.float32)
        cg = pack_channels(self.spec, pos, jnp.stack([eps, hs], axis=-1))
        fx, fy, fz = self._kern(cg.x, cg.y, cg.z, *cg.channels)
        out = unpack_values(cg, (fx, fy, fz))
        return out, cg.overflow


def lj_mixture_pair_fn_masked(cut_scale: float = 2.5,
                              clamp_lo: float = 4e-3):
    """lj_mixture_pair_fn with a third channel ``small_flag``: pairs where
    BOTH particles are small are excluded (they belong to the fine grid of
    the two-grid hierarchy)."""
    base = lj_mixture_pair_fn(cut_scale, clamp_lo)

    def pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
        si = ch_i[2]
        sj = ch_j[2]
        fx, fy, fz = base(r2, dxv, dyv, dzv, ch_i[:2], ch_j[:2])
        keep = 1.0 - si * sj  # 0 iff both small
        return keep * fx, keep * fy, keep * fz

    return pair_fn


@dataclasses.dataclass(frozen=True)
class MixtureLJHierarchical:
    """Two-grid hierarchy for extreme polydispersity — the LBVH's regime
    (reference: src/Interactor/NeighbourList/LBVH.cuh:1-60: widely varying
    cutoffs make a single cell size pathological). Particles are split at
    ``sigma_split``:

    - a FINE grid (cells from the largest small-small cutoff) holds only
      the small particles and computes small-small pairs;
    - a COARSE grid (cells from the largest overall pair cutoff) holds
      everyone and computes large-large and small-large pairs, with
      small-small pairs masked out in-register.

    Cost: the fine pass never pays the large cutoff; the coarse pass pays
    its huge cells only once per particle pair class that actually needs
    them. For a size ratio R this replaces the single-grid (R^3-occupancy
    CAP)^2 blowup with two well-conditioned passes."""

    fine: MixtureLJ
    coarse_spec: GridSpec
    cut_scale: float
    small_idx: tuple  # static indices of the small subset

    @staticmethod
    def create(box_size, n, epsilon, sigma, *, sigma_split=None,
               cut_scale=2.5, skin=1.0, cap_fine=None, cap_coarse=None,
               interpret=None):
        sig = np.asarray(sigma, np.float64)
        if sigma_split is None:
            sigma_split = float(np.sqrt(sig.min() * sig.max()))
        small = np.nonzero(sig <= sigma_split)[0]
        assert 0 < len(small) < n, "split leaves one group empty"
        fine = MixtureLJ.create(
            box_size, len(small), epsilon=np.asarray(epsilon)[small],
            sigma=sig[small], cut_scale=cut_scale, skin=skin, cap=cap_fine,
            interpret=interpret,
        )
        rcut_c = cut_scale * float(sig.max())
        coarse_spec = choose_spec(box_size, n, rcut_c, skin=skin,
                                  cap=cap_coarse)
        m = MixtureLJHierarchical(
            fine=fine, coarse_spec=coarse_spec, cut_scale=cut_scale,
            small_idx=tuple(int(i) for i in small),
        )
        object.__setattr__(
            m, "_kern_coarse",
            make_pair_channel_kernel(
                coarse_spec, lj_mixture_pair_fn_masked(cut_scale), 3, 3,
                interpret=interpret,
            ),
        )
        return m

    def forces(self, pos, epsilon, sigma):
        """[N, 3] forces; returns (forces, overflow)."""
        eps = jnp.sqrt(jnp.asarray(epsilon, jnp.float32))
        hs = 0.5 * jnp.asarray(sigma, jnp.float32)
        idx = jnp.asarray(self.small_idx, jnp.int32)
        flag = jnp.zeros((pos.shape[0],), jnp.float32).at[idx].set(1.0)

        cg = pack_channels(self.coarse_spec, pos,
                           jnp.stack([eps, hs, flag], axis=-1))
        fx, fy, fz = self._kern_coarse(cg.x, cg.y, cg.z, *cg.channels)
        out = unpack_values(cg, (fx, fy, fz))
        ovf = cg.overflow

        f_small, ovf_f = self.fine.forces(
            pos[idx], epsilon[idx], sigma[idx]
        )
        out = out.at[idx].add(f_small)
        return out, ovf | ovf_f
