"""Support-utility tests: checkpoint round-trip (incl. RNG), reference text
format, groups, observables, logging (VERDICT round-1 item 10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.state import make_state
from uammd_tpu.utils import checkpoint


def _rich_state():
    rng = np.random.default_rng(0)
    n = 32
    st = make_state(
        rng.normal(size=(n, 3)),
        seed=7,
        vel=rng.normal(size=(n, 3)),
        mass=rng.random(n) + 0.5,
        radius=rng.random(n) + 1.0,
        charge=rng.normal(size=n),
        type_id=rng.integers(0, 3, n),
        dir=rng.normal(size=(n, 4)),
    )
    return st.replace(force=jnp.asarray(rng.normal(size=(n, 3)), st.dtype))


def test_checkpoint_npz_roundtrip_including_rng(tmp_path):
    st = _rich_state()
    # advance the RNG so the key is non-trivial
    key, sub = jax.random.split(st.key)
    st = st.replace(key=key)
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, st)
    st2 = checkpoint.load(p)
    for f in ("pos", "vel", "force", "mass", "radius", "charge", "type_id",
              "dir", "id", "time", "step"):
        a, b = getattr(st, f), getattr(st2, f)
        assert (a is None) == (b is None), f
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)
    # the restored key must continue the SAME random stream
    n1 = jax.random.normal(jax.random.split(st.key)[1], (4,))
    n2 = jax.random.normal(jax.random.split(st2.key)[1], (4,))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_checkpoint_text_reference_format(tmp_path):
    """save_text writes the reference's per-property block layout
    (reference: utils/checkpoint.h:29-46): '# version', '# N', then one
    '# <PropName>' block per property with one line per particle."""
    st = _rich_state()
    p = str(tmp_path / "ck.dat")
    checkpoint.save_text(p, st)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("# version")
    assert lines[1] == f"# {st.n}"
    names = [l.lstrip("# ") for l in lines[2:] if l.startswith("#")]
    assert "Pos" in names and "Vel" in names and "Mass" in names
    # Pos block: 4 columns (x y z type), matching real4 pos.w = type
    i = lines.index("# Pos")
    assert len(lines[i + 1].split()) == 4
    # Force block is real4-padded
    i = lines.index("# Force")
    assert len(lines[i + 1].split()) == 4

    st2 = checkpoint.load_text(p)
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(st.pos),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.vel), np.asarray(st.vel),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.mass), np.asarray(st.mass),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.force), np.asarray(st.force),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.dir), np.asarray(st.dir),
                               rtol=1e-15)
    np.testing.assert_array_equal(np.asarray(st2.type_id),
                                  np.asarray(st.type_id))


def test_checkpoint_text_id_order(tmp_path):
    """Rows are written in ID order even if the state is spatially permuted."""
    st = _rich_state()
    perm = np.random.default_rng(1).permutation(st.n)
    stp = st.replace(
        pos=st.pos[perm], vel=st.vel[perm], mass=st.mass[perm],
        radius=st.radius[perm], charge=st.charge[perm],
        type_id=st.type_id[perm], dir=st.dir[perm], force=st.force[perm],
        id=st.id[perm],
    )
    p = str(tmp_path / "ck.dat")
    checkpoint.save_text(p, stp)
    st2 = checkpoint.load_text(p)
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(st.pos),
                               rtol=1e-15)
