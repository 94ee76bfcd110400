"""Sweep lane-kernel configurations on the TPU to find the wall.

Times the full cost-mode optimize at several K (grid counts), and the
unrolled-horizon variant, with enough repeats to see through the shared
chip's run-to-run variance.
"""

import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache (shared with bench.py): TPU compiles through
# the tunnel take minutes; cache hits make config sweeps iterable
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mujoco_mpc_tpu.ops import sampling_lane
from mujoco_mpc_tpu.physics import collision as coll
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry


def best_of(fn, n=5, iters=5):
  fn()
  best = float("inf")
  for _ in range(n):
    t0 = time.perf_counter()
    for _ in range(iters):
      fn()
    best = min(best, (time.perf_counter() - t0) / iters)
  return best


def main():
  task = registry.get_task("Quadruped Flat")
  horizon = 36
  key = jax.random.PRNGKey(0)
  d0 = task.make_data()

  for label, k, kw in [
      ("K=1024 fori", 1024, dict(unroll=False)),
      ("K=2048 fori", 2048, dict(unroll=False)),
      ("K=4096 fori", 4096, dict(unroll=False)),
      ("K=4096 unroll", 4096, dict(unroll=True)),
      ("K=4096 ls=0", 4096, dict(unroll=False, solver_ls_iters=0)),
  ]:
    config = sampling.make_config(task).replace(
        num_trajectory=k, horizon=horizon)
    opt = jax.jit(sampling_lane.make_lane_optimize_fn(
        task, config, contact_types=(coll.SPHERE,), **kw))
    policy = sampling.initial_policy(
        getattr(task, "plan_model", task.model), config)
    pol, info = opt(key, d0, policy)
    jax.block_until_ready(pol.values)

    def run():
      p, i = opt(key, d0, policy)
      jax.block_until_ready(p.values)

    t = best_of(run)
    print(f"{label:16s} {1e3*t:8.2f} ms  ({k/t:,.0f} rollouts/s)",
          flush=True)


if __name__ == "__main__":
  main()
