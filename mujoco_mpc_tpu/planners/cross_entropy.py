"""Cross-Entropy Method planner — TPU-native.

Reference semantics (mjpc/planners/cross_entropy/planner.cc):
  * K candidates = resampled nominal + Gaussian noise with per-parameter std
    sqrt(variance[k]) floored at std_min (AddNoiseToPolicy, :343-372);
  * new policy = MEAN of the n_elite best candidates' spline parameters
    (:220-276); elite variance (unbiased, /(n-1)) becomes next iteration's
    sampling variance, initialized to std_initial^2 (:139);
  * n_elite defaults to max(K/10, 2) ("n_elite" numeric, :63-65).

All candidates roll out batched under vmap; elite selection is a top_k on
the return vector (cross-chip reduction when sharded).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.physics.model import Data, Model


@struct.dataclass
class CEMConfig:
  num_trajectory: int = struct.field(pytree_node=False, default=64)
  num_spline_points: int = struct.field(pytree_node=False, default=10)
  n_elite: int = struct.field(pytree_node=False, default=6)
  interp: int = struct.field(pytree_node=False,
                             default=spline_lib.Interpolation.ZERO)
  std_initial: jax.Array = None
  std_min: jax.Array = None
  horizon: int = struct.field(pytree_node=False, default=100)


def make_config(task, dtype=jnp.float32) -> CEMConfig:
  horizon_time = task.config("agent_horizon", 1.0)
  agent_timestep = task.config("agent_timestep",
                               float(task.mjm.opt.timestep))
  k = int(task.config("sampling_trajectories", 64))
  return CEMConfig(
      num_trajectory=k,
      num_spline_points=int(task.config("sampling_spline_points", 10)),
      n_elite=int(task.config("n_elite", max(k // 10, 2))),
      interp=int(task.config("sampling_representation",
                             spline_lib.Interpolation.ZERO)),
      std_initial=jnp.asarray(task.config("std_initial", 0.3), dtype),
      std_min=jnp.asarray(task.config("std_min", 0.1), dtype),
      horizon=int(round(horizon_time / agent_timestep)) + 1,
  )


@struct.dataclass
class CEMState:
  policy: spline_lib.SplinePolicy
  variance: jax.Array  # (P, nu)


def initial_state(m: Model, config: CEMConfig, dtype=jnp.float32) -> CEMState:
  p = config.num_spline_points
  nu = m.nu
  mid = 0.5 * (m.actuator_ctrlrange[:, 0] + m.actuator_ctrlrange[:, 1])
  policy = spline_lib.SplinePolicy(
      t0=jnp.zeros((), dtype), dt=jnp.asarray(0.1, dtype),
      values=jnp.tile(mid[None], (p, 1)).astype(dtype), interp=config.interp)
  var = jnp.full((p, nu), config.std_initial**2, dtype)
  return CEMState(policy=policy, variance=var)


def make_optimize_fn(m: Model, residual_fn, cost_fn, config: CEMConfig,
                     mesh=None, residual_fn_with_params=None,
                     returns_fn=None):
  """returns_fn, if given, scores the candidate batch in one call
  ((K, P, nu) → (K,) returns) and replaces the vmapped XLA rollouts —
  this is how CEM rides the lane kernel (ops/sampling_lane.py
  make_lane_returns_fn); elite refit stays in XLA."""
  horizon = config.horizon
  k = config.num_trajectory
  n_elite = min(config.n_elite, k)

  def rollout_one(rf, cf, values, t0, dt, d0):
    def action(state, time):
      pol = spline_lib.SplinePolicy(
          t0=t0, dt=dt, values=values, interp=config.interp)
      return spline_lib.sample(pol, time)
    return rollout_lib.rollout(m, rf, cf, action, d0, horizon)

  def optimize(key, d0, state: CEMState, residual_params=None,
               cost_spec=None):
    # params + cost spec threaded as traced values
    # (see sampling.make_optimize_fn)
    if residual_params is not None and residual_fn_with_params is not None:
      rf = lambda mm, dd: residual_fn_with_params(mm, dd, residual_params)
    else:
      rf = residual_fn
    cf = cost_spec.cost if cost_spec is not None else cost_fn
    policy = state.policy
    horizon_time = (horizon - 1) * m.opt.timestep
    policy = spline_lib.resample(policy, d0.time, horizon_time)

    std = jnp.maximum(jnp.sqrt(state.variance), config.std_min)
    noise = jax.random.normal(key, (k - 1,) + policy.values.shape,
                              policy.values.dtype) * std[None]
    candidates = jnp.concatenate(
        [policy.values[None], policy.values[None] + noise], axis=0)
    candidates = jnp.clip(candidates, m.actuator_ctrlrange[:, 0],
                          m.actuator_ctrlrange[:, 1])
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      candidates = jax.lax.with_sharding_constraint(
          candidates, NamedSharding(mesh, P(tuple(mesh.axis_names))))

    if returns_fn is not None:
      rets = returns_fn(candidates, d0, residual_params, cost_spec)
      failures = jnp.sum(rets >= 1e6)
    else:
      trajs = jax.vmap(
          lambda v: rollout_one(rf, cf, v, policy.t0, policy.dt, d0))(
              candidates)
      rets = trajs.total_return
      failures = jnp.sum(trajs.failure)

    # elites: n_elite best returns
    neg_ret, elite_idx = jax.lax.top_k(-rets, n_elite)
    elites = candidates[elite_idx]  # (n_elite, P, nu)
    mean = jnp.mean(elites, axis=0)
    var = jnp.sum((elites - mean[None])**2, axis=0) / max(n_elite - 1, 1)

    new_policy = policy.replace(values=mean)
    info = {
        "returns": rets,
        "best_return": -neg_ret[0],
        "elite_avg_return": jnp.mean(-neg_ret),
        "winner": elite_idx[0],
        "failures": failures,
    }
    return CEMState(policy=new_policy, variance=var), info

  return optimize


class CrossEntropyPlanner:
  """Host-side wrapper (reference GUI name: "Cross Entropy")."""

  def __init__(self, task, config: Optional[CEMConfig] = None,
               dtype=jnp.float32, lane: bool = False, interpret: bool = False,
               **kernel_kw):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    self.config = config or make_config(task, dtype)
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    returns_fn = None
    if lane:
      from mujoco_mpc_tpu.ops import sampling_lane
      returns_fn = sampling_lane.make_lane_returns_fn(
          task, self.config, interpret=interpret, **kernel_kw)
    # lane scorers bake a single-mode residual; the Agent rebuilds the
    # planner on mode switches when this is set (agent.set_mode)
    self.lane = returns_fn is not None
    self._optimize = jax.jit(make_optimize_fn(
        self.m, residual_fn, task.cost_spec.cost, self.config,
        residual_fn_with_params=task.residual, returns_fn=returns_fn))
    self.state = initial_state(self.m, self.config, dtype)

  def optimize(self, key, d0: Data):
    self.state, info = self._optimize(key, d0, self.state,
                                      self.task.residual_params,
                                      self.task.cost_spec)
    self.last_info = info
    return info

  @property
  def policy(self):
    return self.state.policy

  def action(self, time) -> jax.Array:
    u = spline_lib.sample(self.state.policy, jnp.asarray(time))
    return jnp.clip(u, self.m.actuator_ctrlrange[:, 0],
                    self.m.actuator_ctrlrange[:, 1])
