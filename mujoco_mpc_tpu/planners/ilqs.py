"""iLQS planner: alternate Sampling and iLQG — TPU-native.

Reference semantics (mjpc/planners/ilqs/planner.cc:87-160): run Sampling,
seed iLQG's nominal from the sampling winner (spline -> action trajectory),
run an iLQG iteration, keep whichever policy class currently wins; convert
the iLQG action trajectory back into spline parameters via a least-squares
inverse of the spline interpolation operator (spline.fit here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
from mujoco_mpc_tpu.planners import sampling as sampling_lib


class ILQSPlanner:
  """Host-side wrapper (reference GUI name: "iLQS")."""

  def __init__(self, task, dtype=jnp.float32, lane: bool = False,
               interpret: bool = False, sampler_config=None, **kernel_kw):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    if lane:
      # sampling phase on the Pallas lane kernel (same policy/config
      # surface as SamplingPlanner; iLQG keeps its own lane line
      # searches when eligible, planners/ilqg.py)
      from mujoco_mpc_tpu.ops import sampling_lane
      self.sampler = sampling_lane.LaneSamplingPlanner(
          task, sampler_config, interpret=interpret, **kernel_kw)
    else:
      self.sampler = sampling_lib.SamplingPlanner(task, sampler_config,
                                                  dtype=dtype)
    self.lane = lane
    # match horizons so trajectories are interchangeable
    ilqg_cfg = ilqg_lib.make_config(task).replace(
        horizon=self.sampler.config.horizon)
    self.ilqg = ilqg_lib.ILQGPlanner(task, ilqg_cfg, dtype=dtype)
    self.active = "sampling"
    self._spline_fit = jax.jit(
        lambda actions, times, t0, dt: spline_lib.fit(
            actions, times, t0, dt, self.sampler.config.num_spline_points,
            self.sampler.config.interp))

  def optimize(self, key, d0: Data):
    k1, k2 = jax.random.split(key)
    s_info = self.sampler.optimize(k1, d0)

    # seed iLQG nominal actions from the sampling winner
    pol = self.sampler.policy
    horizon = self.ilqg.config.horizon
    dt = self.m.opt.timestep
    times = d0.time + dt * jnp.arange(horizon, dtype=pol.values.dtype)
    actions = jax.vmap(lambda t: spline_lib.sample(pol, t))(times)
    self.ilqg.policy = self.ilqg.policy.replace(actions=actions)
    i_info = self.ilqg.optimize(k2, d0)

    s_ret = float(s_info["best_return"])
    i_ret = float(i_info["best_return"])
    if i_ret < s_ret:
      self.active = "ilqg"
      # convert winning action trajectory back into the spline nominal
      fitted = self._spline_fit(
          self.ilqg.policy.actions, self.ilqg.policy.times, pol.t0, pol.dt)
      fitted = jnp.clip(fitted, self.m.actuator_ctrlrange[:, 0],
                        self.m.actuator_ctrlrange[:, 1])
      self.sampler.policy = pol.replace(values=fitted)
    else:
      self.active = "sampling"
    info = {
        "best_return": min(s_ret, i_ret),
        "sampling_return": s_ret,
        "ilqg_return": i_ret,
        "active": self.active,
    }
    self.last_info = info
    return info

  @property
  def policy(self):
    return (self.sampler.policy if self.active == "sampling"
            else self.ilqg.policy)

  def action(self, time, state=None) -> jax.Array:
    if self.active == "ilqg":
      return self.ilqg.action(time, state)
    return self.sampler.action(time)
