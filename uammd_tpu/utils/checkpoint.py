"""Checkpoint/restore of the full simulation state.

TPU-native analog of the reference checkpoint utility (reference:
src/utils/checkpoint.h:29-78 saveParticleData/restoreParticleData): the
reference writes allocated properties in ID order to a versioned text file
and does NOT checkpoint RNG or integrator state; here the whole SimState
pytree — including the PRNG key and step counters — round-trips through one
``.npz`` file (functional state makes exact-restart checkpointing free).

Text export/import in the reference's column format is provided for
interoperability (``save_text``/``load_text``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState

FORMAT_VERSION = 1


def save(path: str, state: SimState) -> None:
    fields = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        if f.name == "key":
            fields["key"] = np.asarray(jax.random.key_data(v))
        else:
            fields[f.name] = np.asarray(jax.device_get(v))
    np.savez(path, __version__=FORMAT_VERSION, **fields)


def load(path: str, dtype=None) -> SimState:
    data = dict(np.load(path))
    version = int(data.pop("__version__"))
    assert version == FORMAT_VERSION, f"unknown checkpoint version {version}"
    key = jax.random.wrap_key_data(jnp.asarray(data.pop("key")))
    kwargs = {}
    for name, arr in data.items():
        a = jnp.asarray(arr)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        kwargs[name] = a
    return SimState(key=key, **kwargs)


def save_text(path: str, state: SimState, properties=("pos", "vel")) -> None:
    """Reference-compatible column dump in ID order (checkpoint.h:29-46)."""
    order = np.argsort(np.asarray(jax.device_get(state.get_id())))
    cols = []
    names = []
    for p in properties:
        v = getattr(state, p, None)
        if v is None:
            continue
        arr = np.asarray(jax.device_get(v))[order]
        cols.append(arr.reshape(len(order), -1))
        names.append(p)
    data = np.concatenate(cols, axis=1)
    header = f"uammd_tpu checkpoint v{FORMAT_VERSION}: " + " ".join(names)
    np.savetxt(path, data, header=header)


def load_text(path: str, properties=("pos", "vel"), seed=0) -> SimState:
    from ..core.state import make_state

    data = np.loadtxt(path)
    widths = {"pos": 3, "vel": 3, "force": 3, "mass": 1, "radius": 1,
              "charge": 1}
    out = {}
    c = 0
    for p in properties:
        w = widths.get(p, 1)
        out[p] = data[:, c:c + w].squeeze() if w == 1 else data[:, c:c + w]
        c += w
    pos = out.pop("pos")
    return make_state(pos, seed=seed, **out)
