"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU required).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon (TPU tunnel)
via sitecustomize, so plain env vars are too late — use jax.config.update.
Eager per-op dispatch over the TPU tunnel is ~40 ms/op; CPU is what we want
for correctness tests anyway (the benches run on the real chip).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite's cost is dominated by XLA CPU
# compiles; cache hits make re-runs cheap (VERDICT r1 weak #9).
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
