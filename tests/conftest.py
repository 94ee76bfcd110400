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
