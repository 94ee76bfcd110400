"""All five BASELINE.md benchmark configs on the real TPU.

Prints one JSON line per config (planner iterations/s, rollouts/s where
meaningful, p50-equivalent steady-state latency). bench.py remains the
driver's single-line flagship; this is the full-coverage instrument:

  1. Cartpole swing-up, predictive sampling, 1 s horizon
  2. Swimmer + Walker, iLQG
  3. Quadruped Flat, predictive sampling, 4096 rollouts (flagship)
  4. Humanoid mocap tracking
  5. Hand/Rubik cube (high-DoF contact-rich)

Run: python -c "import sys; sys.path.insert(0,'/root/repo');
import runpy; runpy.run_path('/root/repo/scripts/bench_configs.py',
run_name='__main__')"  (PYTHONPATH breaks the axon plugin)
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry


def steady_state(step_fn, iters=30):
  """Steady-state pipelined seconds/iteration (bench.py protocol)."""
  step_fn()  # compile + warmup
  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
      out = step_fn()
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / iters)
  return best


def bench_sampling(name, k, horizon, lane=True):
  task = registry.get_task(name)
  config = sampling.make_config(task).replace(num_trajectory=k,
                                              horizon=horizon)
  d0 = task.make_data()
  key = [jax.random.PRNGKey(0)]
  if lane:
    try:
      from mujoco_mpc_tpu.ops import sampling_lane
      opt = jax.jit(sampling_lane.make_lane_optimize_fn(
          task, config, unroll=False))
    except Exception:
      lane = False
  if not lane:
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    opt = jax.jit(sampling.make_optimize_fn(
        getattr(task, "plan_model", task.model), residual_fn,
        task.cost_spec.cost, config))
  pol = [sampling.initial_policy(
      getattr(task, "plan_model", task.model), config)]

  def step():
    key[0], sub = jax.random.split(key[0])
    pol[0], info = opt(sub, d0, pol[0])
    return pol[0].values

  t = steady_state(step)
  row = {
      "config": name, "planner": "sampling",
      "k": k, "horizon": horizon, "path": "lane" if lane else "xla",
      "ms_per_iteration": round(1e3 * t, 2),
      "rollouts_per_s": round(k / t, 1)}
  print(json.dumps(row), flush=True)
  return row


def bench_cem(name, k, horizon):
  """Cross-entropy on the lane fast path (shared candidate scorer)."""
  from mujoco_mpc_tpu.planners import cross_entropy as cem
  task = registry.get_task(name)
  config = cem.make_config(task).replace(num_trajectory=k, horizon=horizon)
  planner = cem.CrossEntropyPlanner(task, config, lane=True, unroll=False)
  d0 = task.make_data()
  key = [jax.random.PRNGKey(0)]

  def step():
    key[0], sub = jax.random.split(key[0])
    planner.optimize(sub, d0)
    return planner.state.policy.values

  t = steady_state(step)
  row = {
      "config": name, "planner": "cross_entropy", "path": "lane",
      "k": k, "horizon": horizon,
      "ms_per_iteration": round(1e3 * t, 2),
      "rollouts_per_s": round(k / t, 1)}
  print(json.dumps(row), flush=True)
  return row


def bench_ilqg(name, horizon):
  task = registry.get_task(name)
  config = ilqg_lib.make_config(task).replace(horizon=horizon)
  planner = ilqg_lib.ILQGPlanner(task, config)
  d0 = task.make_data()
  key = [jax.random.PRNGKey(0)]

  def step():
    key[0], sub = jax.random.split(key[0])
    info = planner.optimize(sub, d0)
    return info["best_return"]

  t = steady_state(step, iters=10)
  row = {
      "config": name, "planner": "ilqg", "horizon": horizon,
      "ms_per_iteration": round(1e3 * t, 2),
      "solves_per_s": round(1.0 / t, 1)}
  print(json.dumps(row), flush=True)
  return row


def bench_planner_family(name):
  """ms/iteration for the rest of the GUI planner registry (iLQS,
  Robust Sampling, Sample Gradient, Gradient) — planner-family
  completeness on one task (reference GUI order, planners/include.cc).
  Lane fast path where the planner supports it."""
  task = registry.get_task(name)
  d0 = task.make_data()
  from mujoco_mpc_tpu.planners import (gradient, ilqs, robust,
                                       sample_gradient)
  planners = [
      ("iLQS", lambda: ilqs.ILQSPlanner(task, lane=True)),
      ("Robust Sampling", lambda: robust.RobustPlanner(task, lane=True)),
      ("Sample Gradient",
       lambda: sample_gradient.SampleGradientPlanner(task, lane=True)),
      ("Gradient", lambda: gradient.GradientPlanner(task)),
  ]
  rows = []
  for pname, ctor in planners:
    planner = ctor()
    key = [jax.random.PRNGKey(0)]

    def step():
      key[0], sub = jax.random.split(key[0])
      info = planner.optimize(sub, d0)
      return info.get("best_return") if isinstance(info, dict) else None

    t = steady_state(step, iters=5)
    rows.append({
        "config": name, "planner": pname,
        "ms_per_iteration": round(1e3 * t, 2),
        "solves_per_s": round(1.0 / t, 1)})
    print(json.dumps(rows[-1]), flush=True)
  return rows


def bench_estimators(name):
  """EKF/UKF per-update latency (the real-time estimator budget: the
  reference runs the estimator once per physics step, app.cc:151-206).
  update() is lazy, so steady_state measures true pipelined latency."""
  from mujoco_mpc_tpu.estimators import kalman, unscented
  task = registry.get_task(name)
  ctrl = jnp.zeros((int(task.model.nu),))
  rows = []
  for cls, label in ((kalman.Kalman, "EKF"), (unscented.Unscented, "UKF")):
    est = cls(task)
    sensor = jnp.zeros((est.ns,))
    t = steady_state(lambda: est.update(ctrl, sensor), iters=20)
    rows.append({
        "config": name, "estimator": label,
        "ms_per_update": round(1e3 * t, 3),
        "updates_per_s": round(1.0 / t, 1)})
    print(json.dumps(rows[-1]), flush=True)
  return rows


def bench_batch(name, cfg_len=None):
  """Batch fixed-lag filter per-update latency (prediction + window
  re-optimize as ONE program, batch.cc Update semantics). cfg_len=32
  exercises reference window scale (batch.h kMaxFilterHistory=64)."""
  import numpy as np
  from mujoco_mpc_tpu.estimators import batch as batch_lib
  task = registry.get_task(name)
  est = batch_lib.Batch(task, configuration_length=cfg_len)
  ctrl = np.zeros(int(task.model.nu))
  sensor = np.zeros(est.direct.ns)
  for _ in range(est.cfg_len + 2):
    est.update(ctrl, sensor)
  t = steady_state(lambda: est.update(ctrl, sensor), iters=10)
  row = {
      "config": name, "estimator": "Batch", "cfg_len": est.cfg_len,
      "ms_per_update": round(1e3 * t, 2),
      "updates_per_s": round(1.0 / t, 1)}
  print(json.dumps(row), flush=True)
  return row


def bench_direct(name, horizon):
  """Direct batch smoother: one full Optimize (GN iterations to
  convergence) on a noisy trajectory of reference scale
  (direct_optimize_test.cc pattern; docs/DIRECT.md)."""
  import numpy as np
  from mujoco_mpc_tpu.direct.optimizer import Direct
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import sensors as sensors_lib
  task = registry.get_task(name)
  m = task.model
  rng = np.random.default_rng(0)
  sensor_fn = sensors_lib.make_sensor_fn(task.mjm)
  step = jax.jit(lambda d: F.step(m, d))
  fwd = jax.jit(lambda d: F.forward(m, d))
  d = task.make_data()
  direct = Direct(task, horizon)
  for t in range(horizon):
    df = fwd(d)
    direct.set_data(
        t,
        qpos=np.asarray(d.qpos) + 0.03 * rng.standard_normal(int(m.nq)),
        sensor=np.asarray(sensor_fn(m, df))
        + 0.002 * rng.standard_normal(direct.ns),
        force=np.asarray(df.qfrc_actuator))
    d = step(d)
  direct.set_weights(sensor=1e4, force=1.0)
  t_s = steady_state(lambda: direct.optimize(), iters=3)
  row = {
      "config": name, "optimizer": "direct", "horizon": horizon,
      "ms_per_solve": round(1e3 * t_s, 2),
      "solves_per_s": round(1.0 / t_s, 2),
      "gn_iterations": direct.iterations}
  print(json.dumps(row), flush=True)
  return row


def main():
  bench_sampling("Cartpole", k=128, horizon=100)          # config 1
  bench_ilqg("Swimmer", horizon=40)                       # config 2a
  bench_ilqg("Walker", horizon=32)                        # config 2b
  bench_sampling("Quadruped Flat", k=4096, horizon=36)    # config 3
  bench_sampling("Humanoid Track", k=512, horizon=25)     # config 4
  bench_sampling("Rubik", k=512, horizon=16)              # config 5
  # reference testspeed.cc default workload (testspeed_app.cc:23-28)
  bench_sampling("Cube Solving", k=512, horizon=16)
  # shadow-class in-hand reorientation (20-actuator hand, VERDICT r4 #4)
  bench_sampling("Hand Reorient", k=512, horizon=16)
  # cross-entropy on the shared lane scorer (flagship shape)
  bench_cem("Quadruped Flat", k=4096, horizon=36)
  # the rest of the planner registry on one cheap task
  bench_planner_family("Swimmer")
  # auxiliary real-time budgets: estimators + Direct smoother
  bench_estimators("Quadruped Flat")
  bench_batch("Cartpole")
  # reference fixed-lag window scale (VERDICT r3 weak #7)
  bench_batch("Cartpole", cfg_len=32)
  bench_direct("Cartpole", horizon=32)


if __name__ == "__main__":
  main()
