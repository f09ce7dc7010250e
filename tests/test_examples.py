"""The examples/ scripts run end-to-end (the reference's CI compiles all
examples — .github/workflows/ci.yml:55-66; here we actually execute them)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST = [
    "examples/tutorial/01_basics.py",
    "examples/tutorial/04_parameters_and_io.py",
    "examples/tutorial/06_custom_potential.py",
]
SLOW = [
    "examples/tutorial/02_moving_particles.py",
    "examples/tutorial/03_interacting_particles.py",
    "examples/tutorial/05_measuring.py",
    "examples/tutorial/07_multiple_types.py",
    "examples/tutorial/08_your_first_integrator.py",
    "examples/tutorial/09_your_first_interactor.py",
    "examples/integration_schemes.py",
    "examples/interaction_modules.py",
    "examples/dambreak.py",
]


def _run(rel):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # examples run CPU here (axon disarmed)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # examples run in f32 regardless of the test suite's x64 default
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, rel)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"{rel} failed:\n--- stdout ---\n{proc.stdout}\n"
        f"--- stderr ---\n{proc.stderr}"
    )


@pytest.mark.parametrize("rel", FAST, ids=[os.path.basename(p) for p in FAST])
def test_example_fast(rel):
    _run(rel)


@pytest.mark.slow
@pytest.mark.parametrize("rel", SLOW, ids=[os.path.basename(p) for p in SLOW])
def test_example_slow(rel):
    _run(rel)
