"""Test configuration: CPU backend with 8 virtual devices and f64 enabled.

Mirrors the reference's DOUBLE_PRECISION test builds (reference:
test/CMakeLists.txt:9): accuracy suites run in double precision on CPU so
they are hardware-independent and CI-runnable; TPU-resident perf runs use
bench.py instead.

Self-configuration: this container's ``sitecustomize`` (PYTHONPATH
``.axon_site``) eagerly *registers* the axon TPU PJRT plugin into every
python process and the ambient env sets ``JAX_PLATFORMS=axon``, so mutating
``os.environ["JAX_PLATFORMS"]`` here is too late — jax read it at import.
But registration is not *initialization*: no backend exists until the first
``jax.devices()``/computation, so ``jax.config.update("jax_platforms",
"cpu")`` still wins, and XLA_FLAGS (read at CPU-client creation) can still
inject the 8 virtual devices.  If some plugin ever initializes a backend
before conftest runs, fail loudly rather than silently running the f64
accuracy suites on TPU f32.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

from jax._src import xla_bridge as _xb

if _xb._backends:  # pragma: no cover - defensive
    got = list(_xb._backends)
    if got != ["cpu"]:
        raise RuntimeError(
            f"jax backends {got} were initialized before tests/conftest.py "
            "could select the CPU platform; run pytest with JAX_PLATFORMS=cpu "
            "PALLAS_AXON_POOL_IPS= XLA_FLAGS=--xla_force_host_platform_"
            "device_count=8"
        )

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_sessionstart(session):
    # Fail fast (and loudly) if the backend selection did not take.
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() >= 8, jax.devices()
    assert jax.config.jax_enable_x64
