"""uammd_tpu: a TPU-native multiscale particle-simulation framework.

A ground-up JAX/XLA/Pallas redesign with the capabilities of UAMMD
(the reference CUDA framework; see SURVEY.md): molecular dynamics, Brownian
dynamics, Brownian hydrodynamics (Cholesky/Lanczos/PSE/FCM/FIB/DPStokes/
quasi2D), fluctuating hydrodynamics (ICM), DPD, SPH, Monte Carlo, and
spectral electrostatics — built on functional state, neighbour-map
combinators, XLA FFTs, and `lax.scan`-compiled trajectories.
"""

from .core.box import Box, box
from .core.grid import Grid, next_fft_size
from .core.state import SimState, make_state, next_key
from .core.types import Computables, ForceEnergyVirial, default_real

__version__ = "0.1.0"

# convenience subpackage aliases (heavy modules stay lazy via their paths)
from . import core, electrostatics, engine, integrators, interactors  # noqa: E402
from . import neighbors, parallel, potentials, solvers, utils  # noqa: E402

__all__ = [
    "core", "electrostatics", "engine", "integrators", "interactors",
    "neighbors", "parallel", "potentials", "solvers", "utils",
    "Box",
    "box",
    "Grid",
    "next_fft_size",
    "SimState",
    "make_state",
    "next_key",
    "Computables",
    "ForceEnergyVirial",
    "default_real",
    "__version__",
]
