import os
import sys

# Tests run on CPU with a virtual 8-device mesh so sharding paths are exercised
# without TPU hardware. The container's sitecustomize pins JAX_PLATFORMS=axon
# (the TPU tunnel), so the env var alone is not enough — we must also flip the
# config after import. XLA_FLAGS must be set before the CPU client initialises.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# default-mesh models run single-device: sharding tests pass devices
# explicitly; everything else shouldn't pay 8-way GSPMD on one CPU core
os.environ.setdefault("NERO_MESH_DEVICES", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the e2e suites are compile-dominated on CPU
# (the full train step alone is minutes); cache compiled executables across
# test processes / runs. Safe here: same host, CPU backend.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
# persist even small programs: dozens of sub-2s compiles repeat across
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)  # noqa: E501  runs and add up on the 1-core container

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
