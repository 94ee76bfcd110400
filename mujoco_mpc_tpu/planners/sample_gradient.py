"""Sample-Gradient planner — TPU-native.

Reference semantics (mjpc/planners/sample_gradient/planner.cc): estimate a
search-gradient from ranked noisy-sample returns with NES fitness shaping
(weights max(0, log(K/2+1) - log(rank)) normalized minus 1/K — Wierstra et
al. 2014, :417-450), low-pass filter it against the previous gradient
(:469-489), and add candidates along the negative gradient at log-scaled
step sizes scaled by 1/exploration (:461-491); winner of noisy+gradient
candidates becomes the policy.

Difference from the reference: gradient candidates are evaluated in the
SAME planning iteration (the reference defers them to the next one purely
to reuse its thread-pool scratch; on TPU one extra vmapped batch is free).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.planners import sampling


@struct.dataclass
class SampleGradientConfig:
  num_trajectory: int = struct.field(pytree_node=False, default=16)
  num_gradient: int = struct.field(pytree_node=False, default=4)
  num_spline_points: int = struct.field(pytree_node=False, default=10)
  interp: int = struct.field(pytree_node=False,
                             default=spline_lib.Interpolation.ZERO)
  exploration: jax.Array = None
  gradient_filter: jax.Array = None
  max_step: float = struct.field(pytree_node=False, default=1.0)
  min_step: float = struct.field(pytree_node=False, default=1e-3)
  horizon: int = struct.field(pytree_node=False, default=100)


def make_config(task, dtype=jnp.float32) -> SampleGradientConfig:
  horizon_time = task.config("agent_horizon", 1.0)
  agent_timestep = task.config("agent_timestep",
                               float(task.mjm.opt.timestep))
  k = int(task.config("sampling_trajectories", 16))
  return SampleGradientConfig(
      num_trajectory=k,
      num_gradient=min(int(task.config("num_gradient", 4)), k - 1),
      num_spline_points=int(task.config("sampling_spline_points", 10)),
      exploration=jnp.asarray(task.config("sampling_exploration", 0.1),
                              dtype),
      gradient_filter=jnp.asarray(task.config("gradient_filter", 1.0),
                                  dtype),
      horizon=int(round(horizon_time / agent_timestep)) + 1,
  )


@struct.dataclass
class SGState:
  policy: spline_lib.SplinePolicy
  gradient: jax.Array  # (P, nu) filtered search gradient


def initial_state(m: Model, config: SampleGradientConfig,
                  dtype=jnp.float32) -> SGState:
  p = config.num_spline_points
  mid = 0.5 * (m.actuator_ctrlrange[:, 0] + m.actuator_ctrlrange[:, 1])
  policy = spline_lib.SplinePolicy(
      t0=jnp.zeros((), dtype), dt=jnp.asarray(0.1, dtype),
      values=jnp.tile(mid[None], (p, 1)).astype(dtype), interp=config.interp)
  return SGState(policy=policy, gradient=jnp.zeros((p, m.nu), dtype))


def _fitness_weights(num_noisy: int, dtype) -> jax.Array:
  """NES utility weights by rank (best rank 0)."""
  ranks = jnp.arange(num_noisy, dtype=dtype)
  f0 = jnp.log(0.5 * num_noisy + 1.0)
  raw = jnp.maximum(0.0, f0 - jnp.log(ranks + 1.0))
  return raw / jnp.sum(raw) - 1.0 / num_noisy


def make_optimize_fn(m: Model, residual_fn, cost_fn,
                     config: SampleGradientConfig, mesh=None,
                     residual_fn_with_params=None, returns_fn=None):
  """returns_fn, if given, scores each candidate batch in one call
  ((K, P, nu) → (K,) returns) on the lane kernel
  (ops/sampling_lane.py make_lane_returns_fn) instead of vmapped XLA
  rollouts; it is called twice per iteration — noisy samples, then the
  gradient candidates that depend on their ranking."""
  horizon = config.horizon
  n_grad = config.num_gradient
  n_noisy = config.num_trajectory - n_grad
  ctrl_lo = None

  def ret_of(rf, cf, values, t0, dt, d0):
    def action(state, time):
      pol = spline_lib.SplinePolicy(
          t0=t0, dt=dt, values=values, interp=config.interp)
      return spline_lib.sample(pol, time)
    return rollout_lib.rollout(
        m, rf, cf, action, d0, horizon).total_return

  def optimize(key, d0, state: SGState, residual_params=None,
               cost_spec=None):
    # params + cost spec threaded as traced values
    # (see sampling.make_optimize_fn)
    if residual_params is not None and residual_fn_with_params is not None:
      rf = lambda mm, dd: residual_fn_with_params(mm, dd, residual_params)
    else:
      rf = residual_fn
    cf = cost_spec.cost if cost_spec is not None else cost_fn
    policy = state.policy
    dtype = policy.values.dtype
    horizon_time = (horizon - 1) * m.opt.timestep
    policy = spline_lib.resample(policy, d0.time, horizon_time)

    scale = 0.5 * (m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0])
    noise = jax.random.normal(
        key, (n_noisy - 1,) + policy.values.shape, dtype) * \
        scale[None, None, :] * config.exploration
    noisy_vals = jnp.clip(policy.values[None] + noise,
                          m.actuator_ctrlrange[:, 0],
                          m.actuator_ctrlrange[:, 1])
    noisy_all = jnp.concatenate([policy.values[None], noisy_vals], axis=0)
    if returns_fn is not None:
      noisy_rets = returns_fn(noisy_all, d0, residual_params, cost_spec)
    else:
      noisy_rets = jax.vmap(
          lambda v: ret_of(rf, cf, v, policy.t0, policy.dt, d0))(noisy_all)

    # fitness-shaped gradient over noisy samples (exclude nominal idx 0)
    order = jnp.argsort(noisy_rets[1:])  # best first
    w = _fitness_weights(n_noisy - 1, dtype)
    sorted_noise = noise[order]
    grad = jnp.einsum("k,kpu->pu", w, sorted_noise) / (n_noisy - 1)
    grad = config.gradient_filter * grad + \
        (1.0 - config.gradient_filter) * state.gradient

    # gradient candidates at log-scaled steps
    steps = jnp.logspace(jnp.log10(config.max_step),
                         jnp.log10(config.min_step), n_grad, dtype=dtype)
    scaling = steps / jnp.maximum(config.exploration, 1e-8)
    grad_vals = policy.values[None] - scaling[:, None, None] * grad[None]
    grad_vals = jnp.clip(grad_vals, m.actuator_ctrlrange[:, 0],
                         m.actuator_ctrlrange[:, 1])
    if returns_fn is not None:
      grad_rets = returns_fn(grad_vals, d0, residual_params, cost_spec)
    else:
      grad_rets = jax.vmap(
          lambda v: ret_of(rf, cf, v, policy.t0, policy.dt, d0))(grad_vals)

    all_vals = jnp.concatenate([noisy_all, grad_vals], axis=0)
    all_rets = jnp.concatenate([noisy_rets, grad_rets], axis=0)
    winner = jnp.argmin(all_rets)
    new_policy = policy.replace(values=all_vals[winner])
    info = {
        # ranked-planner contract (planners/base.py): per-candidate
        # returns, candidate 0 = noiseless nominal
        "returns": all_rets,
        "best_return": all_rets[winner],
        "nominal_return": noisy_rets[0],
        "winner": winner,
        "from_gradient": winner >= n_noisy,
    }
    return SGState(policy=new_policy, gradient=grad), info

  return optimize


class SampleGradientPlanner:
  """Host-side wrapper (reference GUI name: "Sample Gradient")."""

  def __init__(self, task, config: Optional[SampleGradientConfig] = None,
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
