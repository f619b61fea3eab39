"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench runs; unit tests must be fast,
deterministic, and able to exercise multi-device sharding (shard_map over
8 virtual CPU devices), as rtl_433's ctest suite runs hardware-free
(ref tests/CMakeLists.txt).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
