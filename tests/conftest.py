"""Test configuration: CPU backend with 8 virtual devices and f64 enabled.

Mirrors the reference's DOUBLE_PRECISION test builds (reference:
test/CMakeLists.txt:9): accuracy suites run in double precision on CPU so
they are hardware-independent and CI-runnable; TPU-resident perf runs use
bench.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
