"""Particle state: the functional analog of ParticleData.

The reference keeps a mutable SoA store of 12 per-particle properties with
lazy allocation, CPU/GPU mirroring, read/write locks, and reorder signals
(reference: src/ParticleData/ParticleData.cuh:33-46, :161; Property.cuh:153).
Under JAX all of that machinery dissolves: ``SimState`` is an immutable pytree
of SoA ``jnp`` arrays. Unallocated properties are ``None`` (lazy allocation);
locks and dirty flags are unnecessary under functional purity; the reorder
signal web (ParticleData.cuh:492, sortParticles) becomes an explicit
permutation carried in ``perm``/``id`` so stable particle identities survive
spatial resorting (reference: ParticleData.cuh:298 getIdOrderedIndices).

The PRNG key lives in the state so stochastic integrators are pure
``step(state) -> state`` functions and checkpoints capture RNG state (an
improvement over the reference, whose checkpoint omits RNG —
reference: src/utils/checkpoint.h:29-78).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .types import default_real


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """SoA particle state. All arrays share leading dim N; optional = None.

    Mirrors the reference property list (ParticleData.cuh:33-46):
    pos, id, mass, force, vel, radius, charge, energy, virial, torque,
    angVel, dir. ``type_id`` replaces the reference's pos.w packing (storing
    the species in the fourth position component) — an int array is the
    natural TPU layout.
    """

    pos: jax.Array  # [N, 3]
    key: jax.Array  # jax PRNG key
    vel: jax.Array | None = None  # [N, 3]
    force: jax.Array | None = None  # [N, 3]
    mass: jax.Array | None = None  # [N]
    radius: jax.Array | None = None  # [N]
    charge: jax.Array | None = None  # [N]
    energy: jax.Array | None = None  # [N]
    virial: jax.Array | None = None  # [N]
    torque: jax.Array | None = None  # [N, 3]
    ang_vel: jax.Array | None = None  # [N, 3]
    dir: jax.Array | None = None  # [N, 4] quaternion (reference: utils/quaternion.cuh)
    type_id: jax.Array | None = None  # [N] int32 species
    id: jax.Array | None = None  # [N] int32 stable identity under resort
    time: jax.Array | None = None  # scalar simulation time
    step: jax.Array | None = None  # scalar int step counter
    # User-defined per-particle properties (the EXTRA_PARTICLE_PROPERTIES
    # analog, reference: src/ParticleData/ParticleData.cuh:29-95): a dict of
    # name -> [N, ...] array. Being an ordinary pytree child it rides through
    # jit/scan/checkpoint for free; ``permute`` and ``spatial_sort`` reorder
    # it together with the built-in properties so it survives resorting.
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dtype(self):
        return self.pos.dtype

    def replace(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)

    # -- convenience accessors with lazy defaults (pure: they never mutate) --
    def get_mass(self) -> jax.Array:
        return self.mass if self.mass is not None else jnp.ones(self.n, self.dtype)

    def get_radius(self) -> jax.Array:
        return self.radius if self.radius is not None else jnp.ones(self.n, self.dtype)

    def get_charge(self) -> jax.Array:
        return self.charge if self.charge is not None else jnp.zeros(self.n, self.dtype)

    def get_vel(self) -> jax.Array:
        return self.vel if self.vel is not None else jnp.zeros_like(self.pos)

    def get_type(self) -> jax.Array:
        if self.type_id is not None:
            return self.type_id
        return jnp.zeros(self.n, jnp.int32)

    def get_id(self) -> jax.Array:
        return self.id if self.id is not None else jnp.arange(self.n, dtype=jnp.int32)

    def permute(self, perm) -> "SimState":
        """Reorder every per-particle property (built-in and ``extra``) by
        ``perm`` (new_index -> old_index). Stable ids travel with their
        particles, so groups and checkpoints remain valid (reference:
        ParticleData.cuh:492 sortParticles + the reorder-signal web)."""
        perm = jnp.asarray(perm)

        def take(a):
            if a is None or a.ndim == 0 or a.shape[0] != self.n:
                return a
            return jnp.take(a, perm, axis=0)

        kw = {
            f.name: take(getattr(self, f.name))
            for f in dataclasses.fields(self)
            if f.name not in ("key", "extra", "time", "step")
        }
        kw["id"] = jnp.take(self.get_id(), perm)
        kw["extra"] = {k: take(v) for k, v in self.extra.items()}
        return self.replace(**kw)


def spatial_sort(state: SimState, box_size, n_cells: int = 64) -> SimState:
    """Sort particles by spatial cell hash for locality — the functional
    ParticleSorter (reference: src/utils/ParticleSorter.cuh:51-129,
    CellIndexHash). Every property, including ``extra`` user fields, is
    carried through the permutation; ids keep identities stable."""
    Ls = jnp.broadcast_to(jnp.asarray(box_size, state.dtype), (3,))
    frac = state.pos / Ls + 0.5
    frac = frac - jnp.floor(frac)
    c = jnp.clip((frac * n_cells).astype(jnp.int32), 0, n_cells - 1)
    h = (c[:, 2] * n_cells + c[:, 1]) * n_cells + c[:, 0]
    return state.permute(jnp.argsort(h))


def make_state(
    pos,
    *,
    seed: int | jax.Array = 0,
    vel=None,
    mass=None,
    radius=None,
    charge=None,
    type_id=None,
    dir=None,
    dtype=None,
) -> SimState:
    """Create a SimState from positions (host or device arrays)."""
    dtype = dtype or default_real
    pos = jnp.asarray(pos, dtype=dtype)
    n = pos.shape[0]
    key = seed if isinstance(seed, jax.Array) and jnp.issubdtype(
        seed.dtype, jax.dtypes.prng_key
    ) else jax.random.key(seed)

    def cast(x, d=dtype):
        return None if x is None else jnp.asarray(x, dtype=d)

    return SimState(
        pos=pos,
        key=key,
        vel=cast(vel),
        mass=cast(mass),
        radius=cast(radius),
        charge=cast(charge),
        dir=cast(dir),
        type_id=cast(type_id, jnp.int32),
        id=jnp.arange(n, dtype=jnp.int32),
        time=jnp.zeros((), dtype=dtype),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def next_key(state: SimState) -> tuple:
    """Split the state's PRNG key: returns (new_state, subkey)."""
    key, sub = jax.random.split(state.key)
    return state.replace(key=key), sub
