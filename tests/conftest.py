"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench runs; unit tests must be fast,
deterministic, and able to exercise multi-device sharding (shard_map over
8 virtual CPU devices), as rtl_433's ctest suite runs hardware-free
(ref tests/CMakeLists.txt).

Note: the environment's sitecustomize may register an accelerator plugin
and override ``jax_platforms`` via jax.config at interpreter start, so the
JAX_PLATFORMS env var alone is not enough — we re-force the config here,
which wins as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for ALL tests (api enables it for its own
# pipelines, but detector/sharding tests jit directly): the suite's wall
# clock is dominated by recompiles of the same engine configurations.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TPU433_CACHE", "/tmp/tpu433_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
