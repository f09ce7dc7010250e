"""ICM_Compressible walls (ghost-cell mirrors): Poiseuille profile between
no-slip walls + mass conservation (reference: ICM_Compressible/GhostCells,
test/Hydro/ICM_Compressible wall tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.core.box import box
from uammd_tpu.integrators.hydro.icm_compressible import (
    CompressibleFluid,
    ICMCompressible,
)


def test_poiseuille_between_walls():
    L, nz = 8.0, 16
    b = box([4.0, 4.0, L])
    icm = ICMCompressible.create(
        b, (4, 4, nz), shear_viscosity=1.0, bulk_viscosity=1.0,
        speed_of_sound=4.0, density=1.0, temperature=0.0, dt=0.01,
        walls=True,
    )
    f = 0.05
    f_ext = jnp.zeros(tuple(icm.shape) + (3,), jnp.float32).at[..., 0].set(f)
    fluid = icm.init_fluid()

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def advance(fluid, n):
        def body(fl, _):
            return icm.fluid_step(fl, f_ext, None), None
        return jax.lax.scan(body, fluid, None, length=n)[0]

    fluid = advance(fluid, 4000)
    vx = np.asarray(fluid.g[..., 0] / fluid.rho).mean(axis=(0, 1))
    h = L / nz
    z = (np.arange(nz) + 0.5) * h - L / 2
    want = (f / 2.0) * ((L / 2) ** 2 - z**2)
    # centerline within a few percent; profile shape matches
    assert abs(vx[nz // 2] - want[nz // 2]) / want[nz // 2] < 0.05, (
        vx[nz // 2], want[nz // 2]
    )
    np.testing.assert_allclose(vx, want, rtol=0.08, atol=0.02 * want.max())
    # transverse/normal components stay zero; mass conserved
    assert np.abs(np.asarray(fluid.g[..., 1:])).max() < 1e-8
    np.testing.assert_allclose(
        float(jnp.mean(fluid.rho)), 1.0, rtol=1e-6
    )


def test_wall_kills_slip_velocity():
    """A uniform initial momentum decays to zero between no-slip walls
    (momentum is NOT conserved with walls — it drains through them)."""
    b = box([4.0, 4.0, 6.0])
    icm = ICMCompressible.create(
        b, (4, 4, 12), shear_viscosity=1.0, speed_of_sound=4.0,
        density=1.0, temperature=0.0, dt=0.01, walls=True,
    )
    fluid = icm.init_fluid()
    fluid = CompressibleFluid(rho=fluid.rho, g=fluid.g.at[..., 0].set(0.3))
    zero_f = jnp.zeros(tuple(icm.shape) + (3,), jnp.float32)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def advance(fluid, n):
        def body(fl, _):
            return icm.fluid_step(fl, zero_f, None), None
        return jax.lax.scan(body, fluid, None, length=n)[0]

    g0 = float(jnp.abs(fluid.g[..., 0]).mean())
    fluid = advance(fluid, 1600)
    g1 = float(jnp.abs(fluid.g[..., 0]).mean())
    assert g1 < 0.05 * g0, (g0, g1)
