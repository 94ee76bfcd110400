"""Break down the flagship lane-planner iteration cost on the real TPU.

Times, for the Quadruped Flat PS-4096 workload:
  1. full optimize() (what bench.py reports),
  2. the bare rollout kernel call,
  3. kernel with fewer Newton/line-search iterations,
  4. kernel without contacts (contact_types=()),
so the optimizer-overhead / solver / contact shares are visible.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.ops import sampling_lane, step_lane
from mujoco_mpc_tpu.physics import collision as coll
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry


def best_of(fn, n=3, iters=5):
  fn()  # warmup/compile
  best = float("inf")
  for _ in range(n):
    t0 = time.perf_counter()
    for _ in range(iters):
      fn()
    best = min(best, (time.perf_counter() - t0) / iters)
  return best


def main():
  task = registry.get_task("Quadruped Flat")
  m = getattr(task, "plan_model", task.model)
  k, horizon = 4096, 36
  config = sampling.make_config(task).replace(
      num_trajectory=k, horizon=horizon)
  spec = task.lane_residual_spec()
  d0 = task.make_data()

  # 1. full optimize
  opt = jax.jit(sampling_lane.make_lane_optimize_fn(
      task, config, unroll=False, contact_types=(coll.SPHERE,)))
  policy = sampling.initial_policy(m, config)
  key = jax.random.PRNGKey(0)
  pol, info = opt(key, d0, policy)
  jax.block_until_ready(pol.values)

  def run_opt():
    p, i = opt(key, d0, policy)
    jax.block_until_ready(p.values)

  t_opt = best_of(run_opt)
  print(f"full optimize:      {1e3*t_opt:8.2f} ms  "
        f"({k/t_opt:,.0f} rollouts/s)")

  # 2. bare kernel
  def make_kernel(**kw):
    kern = step_lane.build_rollout_kernel(
        m, horizon, config.num_spline_points, unroll=False,
        residual_fn=spec["fn"], residual_dim=spec["dim"],
        naux=spec["naux"], record_states=False,
        contact_geoms=getattr(task, "plan_contact_geoms", None), **kw)
    qpos0 = jnp.tile(d0.qpos[:, None], (1, k))
    qvel0 = jnp.tile(d0.qvel[:, None], (1, k))
    vals = jnp.zeros((config.num_spline_points * m.nu, k), jnp.float32)
    aux = jnp.tile(spec["make_aux"](d0, task.residual_params)[:, None],
                   (1, k)).astype(jnp.float32)

    def run():
      res, fin = kern(qpos0, qvel0, vals, aux)
      jax.block_until_ready(res)
    return run

  for label, kw in [
      ("kernel (task cfg)", dict(contact_types=(coll.SPHERE,))),
      ("kernel newton=2/ls=2", dict(contact_types=(coll.SPHERE,),
                                    solver_iters=2, solver_ls_iters=2)),
      ("kernel newton=0", dict(contact_types=(coll.SPHERE,),
                               solver_iters=0)),
      ("kernel no contacts", dict(contact_types=())),
      ("phase smooth", dict(contact_types=(coll.SPHERE,),
                            profile_phase="smooth")),
      ("phase fk", dict(contact_types=(coll.SPHERE,),
                        profile_phase="fk")),
  ]:
    t = best_of(make_kernel(**kw))
    print(f"{label:22s}{1e3*t:8.2f} ms  ({k/t:,.0f} rollouts/s)")


if __name__ == "__main__":
  main()
