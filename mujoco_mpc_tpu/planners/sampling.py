"""Predictive Sampling planner — TPU-native.

Reference semantics (mjpc/planners/sampling/planner.cc):
  * resample the nominal spline onto the current time window
    (UpdateNominalPolicy, :236-310);
  * K candidates = nominal + zero-mean Gaussian noise per spline node,
    scaled by half the ctrl range and the exploration std; with probability
    0.2 a candidate uses the second exploration std if set
    (AddNoiseToPolicy, :313-339); candidate 0 is the noiseless nominal;
  * roll out all candidates, pick the argmin of total_return (:177-181);
  * winner becomes the new nominal.

TPU design: candidates live on a batch axis processed by vmap(rollout);
sharding that axis across chips happens in parallel/ (shard_map), making
this the data-parallel axis of the framework (SURVEY.md §2.10).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.physics.model import Data, Model

STD2_PROPORTION = 0.2  # reference kStd2Proportion (sampling/planner.cc:322)


@struct.dataclass
class SamplingConfig:
  num_trajectory: int = struct.field(pytree_node=False, default=10)
  num_spline_points: int = struct.field(pytree_node=False, default=10)
  interp: int = struct.field(pytree_node=False,
                             default=spline_lib.Interpolation.ZERO)
  exploration: jax.Array = None   # (2,) noise stds
  horizon: int = struct.field(pytree_node=False, default=100)
  # sliding plan keeps committed future nodes instead of re-interpolating
  # (reference `sampling_sliding_plan`, sampling/planner.cc:244-281)
  sliding_plan: bool = struct.field(pytree_node=False, default=False)


def make_config(task, dtype=jnp.float32) -> SamplingConfig:
  """Read planner config from task XML custom numerics (reference names)."""
  horizon_time = task.config("agent_horizon", 1.0)
  timestep = float(task.mjm.opt.timestep)
  agent_timestep = task.config("agent_timestep", timestep)
  steps = int(round(horizon_time / agent_timestep)) + 1
  return SamplingConfig(
      num_trajectory=int(task.config("sampling_trajectories", 10)),
      num_spline_points=int(task.config("sampling_spline_points", 10)),
      interp=int(task.config("sampling_representation",
                             spline_lib.Interpolation.ZERO)),
      exploration=jnp.asarray(
          [task.config("sampling_exploration", 0.1), 0.0], dtype),
      horizon=steps,
      sliding_plan=bool(task.config("sampling_sliding_plan", 0)),
  )


def node_spacing(m: Model, config: SamplingConfig) -> float:
  """Node spacing dt = horizon_time / (P - extra) matching the reference's
  UpdateNominalPolicy grid (sampling/planner.cc:244-310): zero-order
  splines divide the window into P cells, linear/cubic into P-1."""
  p = config.num_spline_points
  denom = p if config.interp == spline_lib.Interpolation.ZERO else max(
      p - 1, 1)
  horizon_time = (config.horizon - 1) * float(jax.device_get(m.opt.timestep))
  return max(horizon_time / denom, 1e-5)


def initial_policy(m: Model, config: SamplingConfig,
                   dtype=jnp.float32) -> spline_lib.SplinePolicy:
  p = config.num_spline_points
  mid = 0.5 * (m.actuator_ctrlrange[:, 0] + m.actuator_ctrlrange[:, 1])
  values = jnp.tile(mid[None], (p, 1)).astype(dtype)
  return spline_lib.SplinePolicy(
      t0=jnp.zeros((), dtype),
      dt=jnp.asarray(node_spacing(m, config), dtype), values=values,
      interp=config.interp)


def add_noise(key: jax.Array, policy_values: jax.Array, m: Model,
              exploration: jax.Array, k: int) -> jax.Array:
  """Per-candidate Gaussian spline noise (AddNoiseToPolicy semantics)."""
  # k candidates (excluding nominal): values (K-1, P, nu)
  kb, kn = jax.random.split(key)
  scale = 0.5 * (m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0])
  # per-candidate std: second std with prob 0.2 when set
  use2 = (jax.random.uniform(kb, (k,)) < STD2_PROPORTION) & (
      exploration[1] > 0)
  std = jnp.where(use2, exploration[1], exploration[0])  # (K-1,)
  noise = jax.random.normal(kn, (k,) + policy_values.shape,
                            policy_values.dtype)
  noise = noise * scale[None, None, :] * std[:, None, None]
  noisy = policy_values[None] + noise
  return jnp.clip(noisy, m.actuator_ctrlrange[:, 0],
                  m.actuator_ctrlrange[:, 1])


def make_optimize_fn(m: Model, residual_fn, cost_fn, config: SamplingConfig,
                     mesh=None, residual_fn_with_params=None):
  """Build the jittable one-iteration optimizer.

  Returns fn(key, d0, policy[, residual_params]) -> (new_policy, info
  dict). If `mesh` is given, the candidate axis is sharded over its
  `rollout` axis (GSPMD partitions the independent per-candidate rollouts
  across chips; the final argmin becomes a cross-chip reduction over ICI).

  residual_fn_with_params, if given, is `(m, d, params) -> residual` and
  the optional `residual_params` call argument is threaded to it as a
  TRACED value — so SetTaskParameters-style updates reach the jitted
  program (a residual_fn closing over `task.residual_params` bakes the
  array as a compile-time constant instead). Likewise the optional
  `cost_spec` call argument (a CostSpec pytree: weights / norm_params /
  risk traced, structure static) makes SetCostWeights-style updates
  reach the program without recompiling or resetting the warm nominal
  policy (reference live GUI sliders, mjpc/agent.cc:353-448)."""
  horizon = config.horizon
  k_noise = config.num_trajectory - 1

  def policy_action(values, t0, dt, state, time):
    pol = spline_lib.SplinePolicy(
        t0=t0, dt=dt, values=values, interp=config.interp)
    return spline_lib.sample(pol, time)

  def rollout_one(rf, cf, values, t0, dt, d0):
    return rollout_lib.rollout(
        m, rf, cf,
        lambda state, time: policy_action(values, t0, dt, state, time),
        d0, horizon)

  def optimize(key, d0, policy: spline_lib.SplinePolicy,
               residual_params=None, cost_spec=None):
    if residual_params is not None and residual_fn_with_params is not None:
      rf = lambda mm, dd: residual_fn_with_params(mm, dd, residual_params)
    else:
      rf = residual_fn
    cf = cost_spec.cost if cost_spec is not None else cost_fn
    dtype = policy.values.dtype
    horizon_time = (horizon - 1) * m.opt.timestep
    # resample nominal onto the current window (or slide it forward)
    if config.sliding_plan:
      # sliding preserves node values; pin dt to the horizon grid so the
      # plan covers [t, t+horizon] for any horizon/spline-point count
      # (reference time_shift, sampling/planner.cc:244-281)
      policy = policy.replace(dt=jnp.asarray(node_spacing(m, config), dtype))
      policy = spline_lib.slide(policy, d0.time)
    else:
      policy = spline_lib.resample(policy, d0.time, horizon_time)

    # candidates: nominal + noisy
    noisy = add_noise(key, policy.values, m, config.exploration, k_noise)
    candidates = jnp.concatenate([policy.values[None], noisy], axis=0)
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      candidates = jax.lax.with_sharding_constraint(
          candidates, NamedSharding(mesh, P(tuple(mesh.axis_names))))

    trajs = jax.vmap(
        lambda v: rollout_one(rf, cf, v, policy.t0, policy.dt, d0))(
            candidates)
    winner = jnp.argmin(trajs.total_return)
    best_values = candidates[winner]
    new_policy = policy.replace(values=best_values)
    info = {
        "returns": trajs.total_return,
        "winner": winner,
        "best_return": trajs.total_return[winner],
        "nominal_return": trajs.total_return[0],
        "failures": jnp.sum(trajs.failure),
    }
    return new_policy, info

  return optimize


class SamplingPlanner:
  """Host-side wrapper owning the jitted optimize fn (stateful nominal)."""

  def __init__(self, task, config: Optional[SamplingConfig] = None,
               dtype=jnp.float32):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    self.config = config or make_config(task, dtype)
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    cost_fn = task.cost_spec.cost
    self._optimize = jax.jit(
        make_optimize_fn(self.m, residual_fn, cost_fn, self.config,
                         residual_fn_with_params=task.residual))
    self.policy = initial_policy(self.m, self.config, dtype)

  def optimize(self, key, d0: Data):
    self.policy, info = self._optimize(key, d0, self.policy,
                                       self.task.residual_params,
                                       self.task.cost_spec)
    self.last_info = info
    return info

  def action(self, time) -> jax.Array:
    u = spline_lib.sample(self.policy, jnp.asarray(time))
    return jnp.clip(u, self.m.actuator_ctrlrange[:, 0],
                    self.m.actuator_ctrlrange[:, 1])
