"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Multi-chip behaviour (context/tensor parallelism) is validated on fake CPU
devices — the TPU-native stand-in for multi-node testing without a cluster.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
