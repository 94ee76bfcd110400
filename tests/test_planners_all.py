"""All 7 planners improve the cartpole objective (reference pattern: every
planner test optimizes a simple task and asserts improvement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.tasks import registry


def _d0(task):
  d0 = task.make_data()
  return d0.replace(qpos=d0.qpos.at[1].set(2.4))


def _improves(planner, d0, iters=6):
  key = jax.random.PRNGKey(0)
  rets = []
  for i in range(iters):
    key, sub = jax.random.split(key)
    info = planner.optimize(sub, d0)
    rets.append(float(info["best_return"]))
  assert all(np.isfinite(rets)), rets
  # strict improvement over the first iterate (a no-op planner fails)
  assert min(rets[1:]) < rets[0], rets
  return rets


def test_gradient_planner():
  from mujoco_mpc_tpu.planners import gradient
  task = registry.get_task("Cartpole")
  config = gradient.GradientConfig(horizon=40)
  planner = gradient.GradientPlanner(task, config)
  rets = _improves(planner, _d0(task))
  assert rets[-1] < rets[0]


def test_robust_planner():
  from mujoco_mpc_tpu.planners import robust, sampling
  task = registry.get_task("Cartpole")
  s_cfg = sampling.make_config(task).replace(horizon=40, num_trajectory=8)
  planner = robust.RobustPlanner(task, s_cfg)
  _improves(planner, _d0(task))


def test_sample_gradient_planner():
  from mujoco_mpc_tpu.planners import sample_gradient
  task = registry.get_task("Cartpole")
  cfg = sample_gradient.make_config(task).replace(
      horizon=40, num_trajectory=12, num_gradient=4)
  planner = sample_gradient.SampleGradientPlanner(task, cfg)
  rets = _improves(planner, _d0(task))
  assert rets[-1] < rets[0]


def test_ilqs_planner():
  from mujoco_mpc_tpu.planners import ilqs
  task = registry.get_task("Cartpole")
  planner = ilqs.ILQSPlanner(task)
  # keep it cheap: two iterations, finite + strict improvement
  key = jax.random.PRNGKey(0)
  d0 = _d0(task)
  info1 = planner.optimize(key, d0)
  info2 = planner.optimize(jax.random.split(key)[0], d0)
  assert np.isfinite(info2["best_return"])
  assert info2["best_return"] < info1["best_return"]
