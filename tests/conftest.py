"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices. The environment may
pre-register a remote TPU plugin (axon) via sitecustomize before conftest
runs, so the platform is forced through jax.config, which wins over the
already-parsed JAX_PLATFORMS env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import tempfile  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the driver tests build many structurally
# identical XLA programs (same T10/L8 GCM + 16x16x24 LES shapes in fresh
# SPRunner/CoupledStepFn instances), each of which would recompile from
# scratch — the dominant cost of the fast tier on a 2-core host. The disk
# cache dedupes them within AND across sessions.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SP_TEST_CACHE_DIR",
                                 os.path.join(tempfile.gettempdir(),
                                              "sp_coupler_jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
