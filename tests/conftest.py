"""Test harness: pin tests to an 8-device virtual CPU mesh.

This image pre-imports jax at interpreter startup (axon sitecustomize) and
pins JAX_PLATFORMS=axon, so env vars alone can't select CPU. The CPU backend
is still registered and initialises lazily — we inject
``--xla_force_host_platform_device_count=8`` into XLA_FLAGS *before* first
CPU-client creation and wrap every test in ``jax.default_device(cpu)``.

Multi-chip behaviour (context/tensor parallelism) is validated on the fake
CPU devices — the TPU-native stand-in for multi-node testing without a
cluster.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the suite is compile-bound; cached
# executables make repeat runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

CPU_DEVICES = jax.devices("cpu")
assert len(CPU_DEVICES) >= 8, (
    f"expected 8 virtual CPU devices, got {len(CPU_DEVICES)} — XLA_FLAGS was "
    "applied after the CPU client initialised")


@pytest.fixture(autouse=True, scope="session")
def _pin_cpu():
    # session-scoped so it activates before any module-scoped model fixture
    with jax.default_device(CPU_DEVICES[0]):
        yield
