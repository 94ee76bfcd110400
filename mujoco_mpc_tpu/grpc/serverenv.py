"""Shared environment setup for spawned gRPC server processes.

Two concerns every server main has:
  * MJPC_TPU_PLATFORM=cpu|tpu selects the jax backend (env JAX_PLATFORMS
    is consumed by this environment's sitecustomize before our code
    runs, so jax.config is the only working switch);
  * the persistent XLA compile cache — without it every spawned server
    pays full cold compiles, which dominated the e2e service tests'
    wall time (the parent test process caches via tests/conftest.py,
    but subprocesses start fresh).
"""

import os


def apply():
  import jax
  plat = os.environ.get("MJPC_TPU_PLATFORM")
  if plat:
    jax.config.update("jax_platforms", plat)
  repo = os.path.dirname(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  cache = os.environ.get("MJPC_TPU_COMPILE_CACHE")
  if cache is None:
    # match the caches the benches/tests use (bench.py, tests/conftest).
    # Derive the suffix from the RESOLVED backend, not the env var: with
    # MJPC_TPU_PLATFORM unset and no TPU attached, jax falls back to CPU
    # and the CPU cache is the one that can be hit.
    if plat:
      resolved = plat
    else:
      try:
        resolved = jax.default_backend()
      except Exception:
        resolved = "tpu"
    suffix = "_cpu" if resolved == "cpu" else ""
    cache = os.path.join(repo, f".jax_cache{suffix}")
  try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
  except Exception:
    pass  # older jax without the persistent cache knobs
