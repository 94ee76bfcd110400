"""Benchmark: candidate rollouts/s of the predictive-sampling planner.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline = measured C-MuJoCo single-thread stepping rate on this host,
scaled by an ideal 32-thread pool (generous to the reference CPU planner,
mjpc/testspeed.cc semantics), converted to full candidate rollouts/s at the
same horizon. The BASELINE.md target is >= 10x that number on TPU.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure_tpu_rollouts(task, num_trajectory=1024, horizon=101, iters=20):
  from mujoco_mpc_tpu.planners import sampling

  config = sampling.SamplingConfig(
      num_trajectory=num_trajectory,
      num_spline_points=int(task.config("sampling_spline_points", 10)),
      exploration=jnp.asarray(
          [task.config("sampling_exploration", 0.5), 0.0]),
      horizon=horizon)
  residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
  optimize = jax.jit(sampling.make_optimize_fn(
      task.model, residual_fn, task.cost_spec.cost, config))
  policy = sampling.initial_policy(task.model, config)
  d0 = task.make_data()
  key = jax.random.PRNGKey(0)

  # warmup/compile
  pol, info = optimize(key, d0, policy)
  jax.block_until_ready(pol.values)

  t0 = time.perf_counter()
  for i in range(iters):
    key, sub = jax.random.split(key)
    pol, info = optimize(sub, d0, pol)
  jax.block_until_ready(pol.values)
  dt = time.perf_counter() - t0
  per_iter = dt / iters
  rollouts_per_s = num_trajectory / per_iter
  return rollouts_per_s, per_iter


def measure_cpu_baseline(task, horizon=101, reps=2000, threads=32):
  """C MuJoCo single-thread step rate x ideal 32-thread scaling."""
  import mujoco
  mjm = task.mjm
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  # warmup
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_resetData(mjm, mjd)
  t0 = time.perf_counter()
  for _ in range(reps):
    mujoco.mj_step(mjm, mjd)
    if not np.all(np.isfinite(mjd.qpos)):
      mujoco.mj_resetData(mjm, mjd)
  dt = time.perf_counter() - t0
  steps_per_s = reps / dt
  rollouts_per_s = threads * steps_per_s / max(horizon - 1, 1)
  return rollouts_per_s


def main():
  from mujoco_mpc_tpu.tasks.cartpole import Cartpole

  task = Cartpole()
  horizon = 101  # 1 s @ 0.01 s (reference cartpole agent_horizon)
  k = 1024

  value, per_iter = measure_tpu_rollouts(
      task, num_trajectory=k, horizon=horizon)
  baseline = measure_cpu_baseline(task, horizon=horizon)

  print(json.dumps({
      "metric": "sampling_rollouts_per_s_cartpole_h100_k1024",
      "value": round(value, 1),
      "unit": "rollouts/s",
      "vs_baseline": round(value / baseline, 3),
  }))


if __name__ == "__main__":
  main()
