"""User-defined per-particle properties (EXTRA_PARTICLE_PROPERTIES analog).

The reference lets users add particle fields at compile time
(reference: src/ParticleData/ParticleData.cuh:29-95); here ``SimState.extra``
is an open dict pytree that must survive jit/scan, spatial resorting
(core.state.spatial_sort, the ParticleSorter analog), group-masked updates,
and checkpoint round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.core import groups
from uammd_tpu.core.state import make_state, spatial_sort
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.verlet import nvt_basic
from uammd_tpu.utils import checkpoint

from test_md import make_lj_system


def _tagged_state(n=128, seed=0):
    rng = np.random.default_rng(seed)
    st = make_state(rng.uniform(-5, 5, (n, 3)), seed=seed)
    st = st.replace(extra={
        "birth_step": jnp.arange(n, dtype=jnp.int32),
        "polarization": jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
    })
    return st


def test_extra_survives_jit_and_scan():
    st = _tagged_state()

    @jax.jit
    def bump(s):
        return s.replace(extra={**s.extra,
                                "birth_step": s.extra["birth_step"] + 1})

    out = bump(st)
    assert int(out.extra["birth_step"][3]) == 4
    # pytree flatten/unflatten preserves the dict
    leaves, treedef = jax.tree_util.tree_flatten(st)
    st2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert set(st2.extra) == {"birth_step", "polarization"}


def test_extra_follows_spatial_sort():
    st = _tagged_state(n=256, seed=1)
    # tag each particle's extra rows with its id so identity is checkable
    st = st.replace(extra={
        "tag": st.get_id().astype(jnp.float32) * 2.0 + 1.0,
    })
    srt = spatial_sort(st, box_size=10.0, n_cells=4)
    ids = np.asarray(srt.get_id())
    assert sorted(ids.tolist()) == list(range(256))
    assert not np.array_equal(ids, np.arange(256))  # actually resorted
    np.testing.assert_allclose(
        np.asarray(srt.extra["tag"]), ids.astype(np.float32) * 2.0 + 1.0
    )
    # positions traveled with their ids
    orig = np.asarray(st.pos)
    np.testing.assert_allclose(np.asarray(srt.pos), orig[ids])


def test_extra_through_resorting_md_run_and_checkpoint(tmp_path):
    """Carry a custom field through an MD run with a mid-run spatial resort,
    then a checkpoint roundtrip (VERDICT r3 item 7's acceptance test)."""
    st, nl, b, pot, force_fn = make_lj_system(n=256, T=1.5, dtype=jnp.float32)
    st = st.replace(extra={
        "mobility_scale": 1.0 + 0.001 * st.get_id().astype(jnp.float32),
    })
    integ = nvt_basic(force_fn, dt=0.005, temperature=1.5)
    st, nl = integ.init(st, nl)
    st, nl, _ = run(integ, st, nl, 20, initialize=False)
    st = spatial_sort(st, b.size, n_cells=4)  # resort mid-run
    # the neighbour list caches positions in old order; rebuild aux from
    # scratch exactly as a user would after an explicit resort
    from uammd_tpu.neighbors.neighbor_list import (
        build_neighbor_list, ensure_capacity,
    )
    nl = ensure_capacity(
        build_neighbor_list(st.pos, b, pot.max_cutoff, skin_multiplier=1.2),
        st.pos,
    )
    st, nl, _ = run(integ, st, nl, 20, initialize=False)
    ids = np.asarray(st.get_id())
    np.testing.assert_allclose(
        np.asarray(st.extra["mobility_scale"]),
        1.0 + 0.001 * ids.astype(np.float32),
        rtol=0, atol=0,
    )
    # checkpoint roundtrip keeps the field byte-exact
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, st)
    st2 = checkpoint.load(path)
    assert set(st2.extra) == {"mobility_scale"}
    np.testing.assert_array_equal(
        np.asarray(st2.extra["mobility_scale"]),
        np.asarray(st.extra["mobility_scale"]),
    )
    np.testing.assert_array_equal(np.asarray(st2.get_id()), ids)


def test_extra_untouched_by_group_masked_update():
    st = _tagged_state(n=64, seed=2)
    mask = groups.id_range(st, 0, 31)
    moved = st.replace(pos=st.pos + 1.0)
    out = groups.apply_masked(moved, st, mask)
    assert set(out.extra) == {"birth_step", "polarization"}
    np.testing.assert_array_equal(
        np.asarray(out.extra["birth_step"]), np.asarray(st.extra["birth_step"])
    )
