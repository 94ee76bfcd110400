"""Locomotion-task planner tests (CPU-sized configs): upright stability
and cost improvement under the sampling planner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry


def _plan_act(task, steps, k=16, horizon=20, exploration=0.1,
              seed_home_ctrl=False, plan_every=2):
  m = task.model
  config = sampling.SamplingConfig(
      num_trajectory=k, num_spline_points=3,
      exploration=jnp.asarray([exploration, 0.0]), horizon=horizon)
  residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
  opt = jax.jit(sampling.make_optimize_fn(
      m, residual_fn, task.cost_spec.cost, config))
  pol = sampling.initial_policy(m, config)
  d = task.make_data()
  if seed_home_ctrl:
    hc = jnp.asarray(np.tile(task.home_qpos[7:], (3, 1)), jnp.float32)
    pol = pol.replace(values=hc)
    d = d.replace(ctrl=jnp.asarray(task.home_qpos[7:], jnp.float32))
  step = jax.jit(lambda d: F.step(m, d))
  key = jax.random.PRNGKey(0)
  costs = []
  for t in range(steps):
    if t % plan_every == 0:
      key, sub = jax.random.split(key)
      pol, info = opt(sub, d, pol)
    u = jnp.clip(spline_lib.sample(pol, d.time),
                 m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
    d = step(d.replace(ctrl=u))
    r = task.residual(m, F.forward(m, d), task.residual_params)
    costs.append(float(task.cost(r)))
  return d, np.array(costs)


def test_quadruped_stays_upright_under_planner():
  task = registry.get_task("Quadruped Flat")
  d, costs = _plan_act(task, steps=150, k=16, horizon=16,
                       exploration=0.05, seed_home_ctrl=True)
  assert np.all(np.isfinite(costs))
  # trunk above 0.15 and roughly upright
  assert float(d.qpos[2]) > 0.15, float(d.qpos[2])
  assert float(d.xmat[1, 2, 2]) > 0.8
  # planner keeps running cost bounded (standing cost ~< 1)
  assert np.mean(costs[-30:]) < 1.5


def test_walker_planner_improves_cost():
  task = registry.get_task("Walker")
  d, costs = _plan_act(task, steps=120, k=16, horizon=16, exploration=0.3)
  assert np.all(np.isfinite(costs))
  # no catastrophic fall: rootz is an offset from the 1.3 m spawn height,
  # so absolute torso height = 1.3 + qpos[1]; require > 0.6 m
  assert float(d.qpos[1]) > -0.7, float(d.qpos[1])
