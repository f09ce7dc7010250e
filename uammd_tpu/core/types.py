"""Precision configuration and common flag structs.

TPU-native analog of the reference's global precision switch
(reference: src/global/defines.h:33-43, ``real`` = float/double) and the
``Computables`` request flags (reference: src/Interactor/Interactor.cuh:94-103).

On TPU the natural default is float32 (f64 is emulated and slow); accuracy
suites run under ``jax.config.update("jax_enable_x64", True)`` on CPU, mirroring
the reference's DOUBLE_PRECISION test builds (reference: test/CMakeLists.txt:9).
All library code is dtype-polymorphic: the working dtype is inferred from the
position array, never hard-coded.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__version__ = "0.1.0"

#: Default floating dtype for simulation state created by this library.
default_real = jnp.float32


def real_dtype(x):
    """Working float dtype of an array or pytree (from its first float leaf)."""
    if hasattr(x, "dtype"):
        return x.dtype
    for leaf in jax.tree_util.tree_leaves(x):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return default_real


@dataclasses.dataclass(frozen=True)
class Computables:
    """What an interactor should produce.

    Functional analog of the reference's Computables bitfield
    (reference: src/Interactor/Interactor.cuh:94-103). These are static
    (trace-time) flags: each combination compiles a different XLA program,
    exactly like the reference's templated transverser instantiations. The
    class is hashable so it can be a ``jax.jit`` static argument.
    """

    force: bool = True
    energy: bool = False
    virial: bool = False
    #: per-particle stress tensor (symmetric, packed [N, 6] as
    #: xx, xy, xz, yy, yz, zz; trace = virial) — reference:
    #: src/Interactor/Interactor.cuh:98
    stress: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForceEnergyVirial:
    """Per-particle outputs of an interactor.

    Fields not requested are ``None`` (lazy, like the reference's optional
    property allocation, reference: src/ParticleData/Property.cuh:153).
    """

    force: jax.Array | None = None  # [N, 3]
    energy: jax.Array | None = None  # [N]
    virial: jax.Array | None = None  # [N]
    stress: jax.Array | None = None  # [N, 6] xx, xy, xz, yy, yz, zz

    def __add__(self, other: "ForceEnergyVirial") -> "ForceEnergyVirial":
        def add(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return a + b

        return ForceEnergyVirial(
            force=add(self.force, other.force),
            energy=add(self.energy, other.energy),
            virial=add(self.virial, other.virial),
            stress=add(self.stress, other.stress),
        )

    __radd__ = __add__


def zeros_fev(n: int, dtype, computables: Computables) -> ForceEnergyVirial:
    return ForceEnergyVirial(
        force=jnp.zeros((n, 3), dtype) if computables.force else None,
        energy=jnp.zeros((n,), dtype) if computables.energy else None,
        virial=jnp.zeros((n,), dtype) if computables.virial else None,
        stress=jnp.zeros((n, 6), dtype) if computables.stress else None,
    )
