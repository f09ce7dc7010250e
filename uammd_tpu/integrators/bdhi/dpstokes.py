"""Doubly periodic Stokes: FFT(x,y) x Chebyshev(z) slab solver.

TPU-native analog of the reference DPStokes (reference:
src/Integrator/BDHI/DoublyPeriodic/DPStokesSlab.cuh:141,424 and
StokesSlab/{BVPStokes,FastChebyshevTransform,spreadInterp}): Stokes flow in
a slab, periodic in x and y, with no-slip walls at z = +-H/2 (the
reference's "slit channel" mode; bottom-wall/open modes are corrections on
top of the same machinery).

Per transverse mode (kx, ky), the coupled system

    eta (D^2 - k^2) u - i kx p = -fx         u=v=w=0 at the walls
    eta (D^2 - k^2) v - i ky p = -fy
    eta (D^2 - k^2) w -    D p = -fz
    i kx u + i ky v + D w      = 0

is collocated on nz Chebyshev-Lobatto points into one dense [4nz, 4nz]
complex operator whose inverse is precomputed on the host (the reference
precomputes with LAPACKE, BVPSolver.cuh:217; here the per-step apply is one
batched complex einsum on the MXU — no pentadiagonal recursions).

Spreading: Gaussian in (x, y); in z the kernel is evaluated *densely* at all
Lobatto points (nz <= 64), with Clenshaw-Curtis weights making interpolation
the exact adjoint — the natural TPU replacement for the reference's
non-uniform z-support bookkeeping.

The Brownian path (DPStokesIntegrator, DPStokesSlab.cuh:424) uses the
Lanczos sqrt of this mobility, as in the reference.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...core.grid import next_fft_size
from ...solvers.bvp import cheb_derivative_matrix
from ...solvers.chebyshev import clenshaw_curtis_weights, lobatto_points
from ...solvers.lanczos import lanczos_sqrt_apply


def _build_stokes_ops(nz, H, kxs, kys, viscosity, mode="slit"):
    """Host precompute: [nk, 4nz, 4nz] complex inverses.

    ``mode`` selects the z boundary conditions (reference:
    DPStokesSlab.cuh:141 WallMode {slit, bottom, none}; the reference
    realizes bottom/open as analytical image corrections on the unbounded
    solve, StokesSlab/Correction.cuh — here they are *direct* boundary rows
    of the collocation operator):

    - ``slit``: no-slip walls at z = +-H/2;
    - ``bottom``: no-slip wall at z = -H/2, open above — the exterior
      force-free Stokes solution decaying as e^{-k z} is eliminated
      analytically, leaving Robin rows at the top node:
          Du + k u + (i k_x / (2 eta k)) p = 0   (v analogous)
          Dw + k w -  p / (2 eta)          = 0
    - ``open``: open on both sides (mirrored Robin rows below); the k = 0
      mode has no decaying solution under net force and is zeroed, exactly
      like the triply periodic solvers' k = 0 convention.

    Lobatto ordering: node 0 = +H/2 (top), node nz-1 = -H/2 (bottom).
    """
    D = cheb_derivative_matrix(nz, H / 2.0)
    D2 = D @ D
    eye = np.eye(nz)
    kx = np.asarray(kxs).ravel()
    ky = np.asarray(kys).ravel()
    nk = kx.shape[0]
    ops = np.empty((nk, 4 * nz, 4 * nz), np.complex128)
    eta = viscosity
    for i in range(nk):
        k2 = kx[i] ** 2 + ky[i] ** 2
        k = math.sqrt(k2)
        A = np.zeros((4 * nz, 4 * nz), np.complex128)
        L = eta * (D2 - k2 * eye)
        sl = [slice(0, nz), slice(nz, 2 * nz), slice(2 * nz, 3 * nz),
              slice(3 * nz, 4 * nz)]
        A[sl[0], sl[0]] = L
        A[sl[0], sl[3]] = -1j * kx[i] * eye
        A[sl[1], sl[1]] = L
        A[sl[1], sl[3]] = -1j * ky[i] * eye
        A[sl[2], sl[2]] = L
        A[sl[2], sl[3]] = -D
        A[sl[3], sl[0]] = 1j * kx[i] * eye
        A[sl[3], sl[1]] = 1j * ky[i] * eye
        A[sl[3], sl[2]] = D

        if mode == "open" and k2 == 0:
            ops[i] = 0.0  # zero the k=0 mode: inv_op @ rhs == 0
            continue

        kcs = (kx[i], ky[i], None)  # pressure coupling per velocity block

        def dirichlet(row, col):
            A[row, :] = 0.0
            A[row, col] = 1.0

        def robin_top(b):
            r0 = b * nz
            A[r0, :] = 0.0
            A[r0, sl[b]] = D[0, :]
            A[r0, r0] += k
            if b < 2:
                A[r0, 3 * nz] = 1j * kcs[b] / (2.0 * eta * k)
            else:
                A[r0, 3 * nz] = -1.0 / (2.0 * eta)

        def robin_bottom(b):
            # exterior z < -H/2: u = (a + b zeta) e^{k zeta}, p = P e^{k zeta}
            # => Du - k u - (i k_b/(2 eta k)) p = 0 and Dw - k w - p/(2 eta) = 0
            r1 = b * nz + nz - 1
            A[r1, :] = 0.0
            A[r1, sl[b]] = D[nz - 1, :]
            A[r1, r1] -= k
            if b < 2:
                A[r1, 4 * nz - 1] = -1j * kcs[b] / (2.0 * eta * k)
            else:
                A[r1, 4 * nz - 1] = -1.0 / (2.0 * eta)

        for b in range(3):
            r0, r1 = b * nz, b * nz + nz - 1
            # top boundary
            if mode == "slit":
                dirichlet(r0, r0)
            elif k2 == 0:
                # open top, k = 0: decay requires zero shear (u, v); w = 0
                A[r0, :] = 0.0
                if b < 2:
                    A[r0, sl[b]] = D[0, :]
                else:
                    A[r0, r0] = 1.0
            else:
                robin_top(b)
            # bottom boundary
            if mode in ("slit", "bottom"):
                dirichlet(r1, r1)
            elif k2 == 0:  # open bottom, k = 0
                A[r1, :] = 0.0
                if b < 2:
                    A[r1, sl[b]] = D[nz - 1, :]
                else:
                    A[r1, r1] = 1.0
            else:
                robin_bottom(b)
        if k2 == 0:
            # pressure gauge: fix p at the bottom node
            A[4 * nz - 1, :] = 0.0
            A[4 * nz - 1, 4 * nz - 1] = 1.0
        ops[i] = np.linalg.inv(A)
    return ops


@dataclasses.dataclass(frozen=True)
class DPStokes:
    box: Box  # box.size[2] = slab height H (z in [-H/2, H/2])
    viscosity: float
    radius: float
    shape: tuple  # (nx, ny) Fourier modes
    nz: int
    box_size: tuple
    support: int
    inv_ops: jax.Array  # [nk, 4nz, 4nz] complex64
    mode: str = "slit"  # slit | bottom | open (DPStokesSlab.cuh WallMode)

    @staticmethod
    def create(box, viscosity=1.0, radius=1.0, points_per_radius=2.0,
               nz=None, support=10, mode="slit"):
        assert mode in ("slit", "bottom", "open"), mode
        Ls = [float(s) for s in jax.device_get(box.size)]
        nominal = [max(16, int(L * points_per_radius / radius))
                   for L in Ls[:2]]
        # xy multiples of 8 keep large-N spreads on the pencil MXU path;
        # scale support with any grid rounding so the physical truncation
        # radius is preserved (the fcm.FCM.create rule)
        shape = tuple(
            next_fft_size(n0, pencil_safe=support <= 16) for n0 in nominal
        )
        ratio = max(sh / n0 for sh, n0 in zip(shape, nominal))
        support = int(2 * math.ceil(support * ratio / 2.0))
        if nz is None:
            nz = max(16, int(Ls[2] * points_per_radius / radius) + 1)
        kx = 2 * math.pi * np.fft.fftfreq(shape[0], d=Ls[0] / shape[0])
        ky = 2 * math.pi * np.fft.rfftfreq(shape[1], d=Ls[1] / shape[1])
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        ops = _build_stokes_ops(nz, Ls[2], KX, KY, viscosity, mode=mode)
        return DPStokes(
            box=box, viscosity=viscosity, radius=radius, shape=shape, nz=nz,
            box_size=tuple(Ls), support=support, mode=mode,
            inv_ops=jnp.asarray(ops, jnp.complex64),
        )

    @property
    def sigma(self):
        return self.radius / math.sqrt(math.pi)

    @property
    def sigma_torque(self):
        """Rotlet width making M_rr(self) = 1/(8 pi eta a^3) in the bulk
        (same choice as fcm.FCM.sigma_torque)."""
        return self.radius / (6.0 * math.sqrt(math.pi)) ** (1.0 / 3.0)

    def _zw(self, dtype):
        z = lobatto_points(self.nz, self.box_size[2] / 2.0)
        w = clenshaw_curtis_weights(self.nz, self.box_size[2] / 2.0)
        return jnp.asarray(z, dtype), jnp.asarray(w, dtype)

    def _xy_weights(self, pos, dtype):
        nx, ny = self.shape
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        s = self.support
        u = jnp.stack(
            [pos[:, 0] / hx + 0.5 * nx - 0.5, pos[:, 1] / hy + 0.5 * ny - 0.5],
            -1,
        )
        base = jnp.round(u).astype(jnp.int32) - s // 2
        off = jnp.arange(s)
        sig = self.sigma
        wx = jnp.exp(-0.5 * (((base[:, 0, None] + off - u[:, 0, None]) * hx) / sig) ** 2)
        wy = jnp.exp(-0.5 * (((base[:, 1, None] + off - u[:, 1, None]) * hy) / sig) ** 2)
        gx = jnp.mod(base[:, 0, None] + off, nx)
        gy = jnp.mod(base[:, 1, None] + off, ny)
        norm = hx * hy / (2.0 * math.pi * sig * sig)
        return gx, gy, wx, wy, norm

    def _z_weights(self, pos, dtype):
        z, w = self._zw(dtype)
        sig = self.sigma
        phi = jnp.exp(-0.5 * ((pos[:, 2:3] - z[None, :]) / sig) ** 2) / (
            sig * math.sqrt(2.0 * math.pi)
        )
        return phi, w  # [N, nz], [nz]

    def _pencil_ctx(self, pos):
        """(kern, bins) for the xy-pencil MXU spread path at large N on
        pencil-safe square-cell grids (solvers/pencil_ibm with Chebyshev
        z_weights), else None.  The pencil path truncates the xy Gaussian
        at support/2 points (~5e-5 relative tail at the default support
        10; a few tail terms can add coherently to ~2e-4 of the field
        peak), which the untruncated direct scatter does not — at the
        solver's own kernel-accuracy level."""
        from ...solvers.ibm import GaussianKernel
        from ...solvers.pencil_ibm import bin_pencils, pencil_ok

        nx, ny = self.shape
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        if (
            pos.shape[0] < 4096
            or abs(hx - hy) > 1e-9 * hx
            or not pencil_ok((nx, ny, self.nz), self.support)
        ):
            return None
        kern = GaussianKernel(sigma=self.sigma / hx, support=self.support)
        return kern, bin_pencils(pos, (nx, ny, self.nz), self.box)

    def spread(self, pos, forces, ctx=None):
        """-> f_grid [nx, ny, nz, 3] (force density)."""
        from ...solvers.ibm import _poison
        from ...solvers.pencil_ibm import spread_pencil

        if ctx is None:
            ctx = self._pencil_ctx(pos)
        if ctx:  # ctx=False forces the direct scatter path
            kern, bins = ctx
            phi_z, _ = self._z_weights(pos, forces.dtype)
            hx = self.box_size[0] / self.shape[0]
            hy = self.box_size[1] / self.shape[1]
            field, ovf = spread_pencil(
                kern, pos, forces, (self.shape[0], self.shape[1], self.nz),
                self.box, bins, z_weights=phi_z,
                density_scale=1.0 / (hx * hy),
            )
            return _poison(field, ovf)
        dtype = forces.dtype
        nx, ny = self.shape
        gx, gy, wx, wy, norm = self._xy_weights(pos, dtype)
        phi_z, _ = self._z_weights(pos, dtype)
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        # [N, s, s, nz] weights -> density via / (hx hy) and z handled by phi
        w_xy = norm * wx[:, :, None] * wy[:, None, :] / (hx * hy)
        contrib = (
            w_xy[..., None, None] * phi_z[:, None, None, :, None]
            * forces[:, None, None, None, :]
        )
        field = jnp.zeros((nx, ny, self.nz, 3), dtype)
        s = self.support
        ix = jnp.broadcast_to(gx[:, :, None], (pos.shape[0], s, s)).reshape(-1)
        iy = jnp.broadcast_to(gy[:, None, :], (pos.shape[0], s, s)).reshape(-1)
        field = field.at[ix, iy].add(contrib.reshape(-1, self.nz, 3))
        return field

    def interpolate(self, pos, field, ctx=None):
        from ...solvers.ibm import _poison
        from ...solvers.pencil_ibm import interpolate_pencil

        if ctx is None:
            ctx = self._pencil_ctx(pos)
        if ctx:  # ctx=False forces the direct gather path
            kern, bins = ctx
            phi_z, w_cc = self._z_weights(pos, field.dtype)
            out, ovf = interpolate_pencil(
                kern, pos, field, self.box, bins,
                z_weights=phi_z * w_cc[None, :],
            )
            return _poison(out, ovf)
        dtype = field.dtype
        gx, gy, wx, wy, norm = self._xy_weights(pos, dtype)
        phi_z, w_cc = self._z_weights(pos, dtype)
        s = self.support
        vals = field[
            jnp.broadcast_to(gx[:, :, None], (pos.shape[0], s, s)),
            jnp.broadcast_to(gy[:, None, :], (pos.shape[0], s, s)),
        ]  # [N, s, s, nz, 3]
        w_xy = norm * wx[:, :, None] * wy[:, None, :]
        zquad = phi_z * w_cc[None, :]  # [N, nz]
        return jnp.einsum("nab,nz,nabzc->nc", w_xy, zquad, vals)

    def _torque_weights(self, pos, dtype):
        """Separable rotlet-kernel values and field-coordinate gradients
        (all offsets are node - particle)."""
        nx, ny = self.shape
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        s = self.support
        sig = self.sigma_torque
        u = jnp.stack(
            [pos[:, 0] / hx + 0.5 * nx - 0.5, pos[:, 1] / hy + 0.5 * ny - 0.5],
            -1,
        )
        base = jnp.round(u).astype(jnp.int32) - s // 2
        off = jnp.arange(s)
        dxp = (base[:, 0, None] + off - u[:, 0, None]) * hx
        dyp = (base[:, 1, None] + off - u[:, 1, None]) * hy
        wx = jnp.exp(-0.5 * (dxp / sig) ** 2)
        wy = jnp.exp(-0.5 * (dyp / sig) ** 2)
        dwx = -(dxp / sig**2) * wx
        dwy = -(dyp / sig**2) * wy
        gx = jnp.mod(base[:, 0, None] + off, nx)
        gy = jnp.mod(base[:, 1, None] + off, ny)
        z, w_cc = self._zw(dtype)
        dz = z[None, :] - pos[:, 2:3]
        phi_z = jnp.exp(-0.5 * (dz / sig) ** 2) / (
            sig * math.sqrt(2.0 * math.pi)
        )
        dphi_z = -(dz / sig**2) * phi_z
        norm = hx * hy / (2.0 * math.pi * sig * sig)
        return gx, gy, wx, dwx, wy, dwy, phi_z, dphi_z, w_cc, norm, hx, hy

    def spread_torque(self, pos, torques):
        """Rotlet spreading: f += (1/2) grad(phi_tau) x torque (reference:
        DPStokesSlab torque path via kernel-derivative spreading,
        StokesSlab/spreadInterp with BM kernel derivatives)."""
        dtype = torques.dtype
        nx, ny = self.shape
        (gx, gy, wx, dwx, wy, dwy, phi_z, dphi_z, w_cc, norm, hx, hy) = (
            self._torque_weights(pos, dtype)
        )
        s = self.support
        npart = pos.shape[0]
        c = norm / (hx * hy)
        # gradient components [N, s, s, nz]
        gpx = c * dwx[:, :, None, None] * wy[:, None, :, None] * phi_z[:, None, None, :]
        gpy = c * wx[:, :, None, None] * dwy[:, None, :, None] * phi_z[:, None, None, :]
        gpz = c * wx[:, :, None, None] * wy[:, None, :, None] * dphi_z[:, None, None, :]
        tx, ty, tz = (torques[:, i, None, None, None] for i in range(3))
        f = 0.5 * jnp.stack(
            [gpy * tz - gpz * ty, gpz * tx - gpx * tz, gpx * ty - gpy * tx],
            axis=-1,
        )  # [N, s, s, nz, 3]
        field = jnp.zeros((nx, ny, self.nz, 3), dtype)
        ix = jnp.broadcast_to(gx[:, :, None], (npart, s, s)).reshape(-1)
        iy = jnp.broadcast_to(gy[:, None, :], (npart, s, s)).reshape(-1)
        return field.at[ix, iy].add(f.reshape(-1, self.nz, 3))

    def interpolate_angular(self, pos, field):
        """omega = (1/2) J curl(u) = -(1/2) sum grad(phi_tau) x u (adjoint
        of spread_torque under the hx hy w_cc quadrature)."""
        dtype = field.dtype
        (gx, gy, wx, dwx, wy, dwy, phi_z, dphi_z, w_cc, norm, hx, hy) = (
            self._torque_weights(pos, dtype)
        )
        s = self.support
        npart = pos.shape[0]
        vals = field[
            jnp.broadcast_to(gx[:, :, None], (npart, s, s)),
            jnp.broadcast_to(gy[:, None, :], (npart, s, s)),
        ]  # [N, s, s, nz, 3]
        zq = phi_z * w_cc[None, :]
        dzq = dphi_z * w_cc[None, :]
        gpx = norm * dwx[:, :, None, None] * wy[:, None, :, None] * zq[:, None, None, :]
        gpy = norm * wx[:, :, None, None] * dwy[:, None, :, None] * zq[:, None, None, :]
        gpz = norm * wx[:, :, None, None] * wy[:, None, :, None] * dzq[:, None, None, :]
        ux, uy, uz = vals[..., 0], vals[..., 1], vals[..., 2]
        wxv = -0.5 * jnp.sum(gpy * uz - gpz * uy, axis=(1, 2, 3))
        wyv = -0.5 * jnp.sum(gpz * ux - gpx * uz, axis=(1, 2, 3))
        wzv = -0.5 * jnp.sum(gpx * uy - gpy * ux, axis=(1, 2, 3))
        return jnp.stack([wxv, wyv, wzv], axis=-1)

    def solve_grid(self, f_grid):
        """f_grid [nx,ny,nz,3] -> velocity grid [nx,ny,nz,3]."""
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1))  # [nx, nyk, nz, 3]
        nx, nyk = fk.shape[0], fk.shape[1]
        rhs = jnp.concatenate(
            [-fk[..., 0], -fk[..., 1], -fk[..., 2],
             jnp.zeros_like(fk[..., 0])],
            axis=-1,
        )  # [nx, nyk, 4nz]
        # wall rows carry the BC values (zero) and k=0 gauge (zero)
        nz = self.nz
        for b in range(3):
            rhs = rhs.at[..., b * nz].set(0.0).at[..., b * nz + nz - 1].set(0.0)
        rhs = rhs.reshape(nx * nyk, 4 * nz)
        sol = jnp.einsum("kij,kj->ki", self.inv_ops, rhs)
        sol = sol.reshape(nx, nyk, 4 * nz)
        uk = jnp.stack(
            [sol[..., 0:nz], sol[..., nz:2 * nz], sol[..., 2 * nz:3 * nz]],
            axis=-1,
        )
        return jnp.fft.irfftn(uk, s=self.shape, axes=(0, 1))

    def compute_mf(self, pos, forces, torques=None, ctx=None):
        """M F (and, with torques, the full grand-mobility product
        -> (v, omega); reference: DPStokes::Mdot with forces and torques,
        DPStokesSlab.cuh:141). One pencil binning serves the spread and
        the interpolation (ctx from _pencil_ctx, built here if omitted)."""
        if ctx is None:
            ctx = self._pencil_ctx(pos)
        f_grid = self.spread(pos, forces, ctx=ctx)
        if torques is not None:
            f_grid = f_grid + self.spread_torque(pos, torques)
        u = self.solve_grid(f_grid)
        v = self.interpolate(pos, u, ctx=ctx)
        if torques is None:
            return v
        return v, self.interpolate_angular(pos, u)

    def compute_bdw(self, pos, key, iterations: int = 24):
        ctx = self._pencil_ctx(pos)

        def mv(x):
            return self.compute_mf(pos, x.reshape(-1, 3), ctx=ctx).reshape(-1)

        z = jax.random.normal(key, (pos.shape[0] * 3,), pos.dtype)
        out, _ = lanczos_sqrt_apply(mv, z, m=iterations)
        return out.reshape(-1, 3)

    def compute_bdw_grand(self, pos, key, iterations: int = 32):
        """sqrt of the grand (translation + rotation) mobility applied to
        white noise: returns (v_noise [N,3], omega_noise [N,3])."""
        n = pos.shape[0]

        def mv(x):
            f = x[: 3 * n].reshape(-1, 3)
            t = x[3 * n:].reshape(-1, 3)
            v, w = self.compute_mf(pos, f, t)
            return jnp.concatenate([v.reshape(-1), w.reshape(-1)])

        z = jax.random.normal(key, (6 * n,), pos.dtype)
        out, _ = lanczos_sqrt_apply(mv, z, m=iterations)
        return out[: 3 * n].reshape(-1, 3), out[3 * n:].reshape(-1, 3)

    def divergence(self, pos):
        return jnp.zeros_like(pos)


def dpstokes_em(
    force_fn,
    dps: DPStokes,
    dt: float,
    temperature: float = 0.0,
    lanczos_iterations: int = 24,
):
    """Euler-Maruyama integrator over the DPStokes mobility with Lanczos
    thermal noise — the reference's DPStokesIntegrator
    (DPStokesSlab.cuh:424): dX = M F dt + sqrt(2 kT dt) sqrt(M) dW.

    Particles must stay inside the slab; walls are free-slip to particles
    only through hydrodynamics (add a repulsive ExternalForces wall to keep
    them off the boundary, as the reference examples do).
    """
    from ...core.state import next_key
    from ..base import Integrator, advance_time

    def init(state, aux):
        if state.force is None:
            state = state.replace(force=jnp.zeros_like(state.pos))
        return state, aux

    def step(state, aux):
        h = jnp.asarray(dt, state.dtype)
        fev, aux = force_fn(state, aux)
        dx = h * dps.compute_mf(state.pos, fev.force)
        if temperature > 0:
            state, k = next_key(state)
            bdw = dps.compute_bdw(state.pos, k, iterations=lanczos_iterations)
            dx = dx + jnp.sqrt(2.0 * temperature * h) * bdw
        return advance_time(
            state.replace(pos=state.pos + dx, force=fev.force), dt
        ), aux

    return Integrator(init=init, step=step)
