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
        elif f.name == "extra":
            # user-defined per-particle properties (ParticleData.cuh:29-95
            # EXTRA_PARTICLE_PROPERTIES analog) round-trip under a prefix
            for k, a in v.items():
                fields[f"extra__{k}"] = np.asarray(jax.device_get(a))
        else:
            fields[f.name] = np.asarray(jax.device_get(v))
    np.savez(path, __version__=FORMAT_VERSION, **fields)


def load(path: str, dtype=None) -> SimState:
    data = dict(np.load(path))
    version = int(data.pop("__version__"))
    assert version == FORMAT_VERSION, f"unknown checkpoint version {version}"
    key = jax.random.wrap_key_data(jnp.asarray(data.pop("key")))
    kwargs = {}
    extra = {}
    for name, arr in data.items():
        a = jnp.asarray(arr)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        if name.startswith("extra__"):
            extra[name[len("extra__"):]] = a
        else:
            kwargs[name] = a
    return SimState(key=key, extra=extra, **kwargs)


# Reference property blocks: name -> (SimState field, column count).
# real4 properties print 4 space-separated values per line in the reference
# (printOverloads.h:17); Pos packs the species in .w (ParticleData.cuh:34)
# which maps to our separate int ``type_id``; Force/Torque/AngVel are real4
# with an unused .w that we pad with zeros on write and drop on read.
_REF_PROPS = {
    "Pos": ("pos", 4),
    "Mass": ("mass", 1),
    "Force": ("force", 4),
    "Virial": ("virial", 1),
    "Energy": ("energy", 1),
    "Vel": ("vel", 3),
    "Radius": ("radius", 1),
    "Charge": ("charge", 1),
    "Torque": ("torque", 4),
    "AngVel": ("ang_vel", 4),
    "Dir": ("dir", 4),
}
_REF_VERSION = "3.0.0"  # reference: global/defines.h UAMMD_VERSION


def save_text(path: str, state: SimState, properties=None) -> None:
    """Reference-compatible dump (checkpoint.h:29-46 saveParticleData):

        # version 3.0.0
        # <N>
        # Pos
        x y z type      (one line per particle, ID order)
        # Vel
        ...

    one ``# <PropName>`` block per allocated property, values in ID order,
    real4 properties as 4 columns.  ``properties`` optionally restricts
    which reference property names are written.
    """
    order = np.argsort(np.asarray(jax.device_get(state.get_id())))
    n = len(order)
    lines = [f"# version {_REF_VERSION}", f"# {n}"]
    for ref_name, (field, width) in _REF_PROPS.items():
        if properties is not None and ref_name not in properties:
            continue
        v = getattr(state, field, None)
        if v is None:
            continue
        arr = np.asarray(jax.device_get(v)).reshape(n, -1)[order]
        if ref_name == "Pos":
            t = np.asarray(jax.device_get(state.get_type()))[order]
            arr = np.concatenate([arr[:, :3], t[:, None].astype(arr.dtype)], 1)
        elif arr.shape[1] < width:  # pad real4's unused .w
            arr = np.concatenate(
                [arr, np.zeros((n, width - arr.shape[1]), arr.dtype)], 1
            )
        lines.append(f"# {ref_name}")
        lines.extend(" ".join(repr(float(x)) for x in row) for row in arr)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_text(path: str, seed=0, dtype=None) -> SimState:
    """Parse the reference's per-property block format (checkpoint.h:48-78
    restoreParticleData). Unknown property blocks are skipped with the same
    leniency as the reference (it only warns on version mismatch)."""
    from ..core.state import make_state

    with open(path) as f:
        tokens = f.read().split("\n")
    head = tokens[0].split()
    assert head[:2] == ["#", "version"], f"not a checkpoint file: {tokens[0]}"
    n = int(tokens[1].lstrip("# "))
    blocks = {}
    i = 2
    while i < len(tokens):
        line = tokens[i].strip()
        i += 1
        if not line.startswith("#"):
            continue
        name = line.lstrip("# ").strip()
        rows = []
        while i < len(tokens) and rows.__len__() < n:
            s = tokens[i].strip()
            if s:
                rows.append([float(x) for x in s.split()])
            i += 1
        if len(rows) == n:
            blocks[name] = np.asarray(rows)
    kwargs = {}
    extra = {}
    for ref_name, arr in blocks.items():
        if ref_name not in _REF_PROPS:
            continue
        field, _ = _REF_PROPS[ref_name]
        if ref_name == "Pos":
            kwargs["pos"] = arr[:, :3]
            kwargs["type_id"] = arr[:, 3].astype(np.int32)
        elif ref_name in ("Force", "Torque", "AngVel"):
            extra[field] = arr[:, :3]  # drop the real4 pad
        elif field in ("vel", "mass", "radius", "charge", "dir"):
            kwargs[field] = arr.squeeze() if arr.shape[1] == 1 else arr
        else:
            extra[field] = arr.squeeze() if arr.shape[1] == 1 else arr
    pos = kwargs.pop("pos")
    st = make_state(pos, seed=seed, dtype=dtype, **kwargs)
    for field, arr in extra.items():
        st = st.replace(**{field: jnp.asarray(arr, st.dtype)})
    return st
