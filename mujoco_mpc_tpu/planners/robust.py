"""Robust (meta-)planner — TPU-native.

Reference semantics (mjpc/planners/robust/robust_planner.cc): wrap a ranked
delegate planner (sampling); take its top-N candidates, re-roll each M times
under Ornstein-Uhlenbeck xfrc perturbations (std/rate from the `robust_xfrc`
numerics, :46-57), average the noisy returns per candidate, and promote the
most robust candidate to the policy.

TPU design: the (N candidates x M repetitions) grid is one flat vmapped
batch of noisy rollouts.
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
class RobustConfig:
  num_candidates: int = struct.field(pytree_node=False, default=4)
  num_repetitions: int = struct.field(pytree_node=False, default=4)
  xfrc_std: jax.Array = None
  xfrc_rate: jax.Array = None


def make_config(task, dtype=jnp.float32) -> RobustConfig:
  return RobustConfig(
      num_candidates=int(task.config("robust_candidates", 4)),
      num_repetitions=int(task.config("robust_repetitions", 4)),
      xfrc_std=jnp.asarray(task.config("robust_xfrc", 0.2), dtype),
      xfrc_rate=jnp.asarray(task.config("robust_xfrc_rate", 0.1), dtype),
  )


def make_optimize_fn(m: Model, residual_fn, cost_fn,
                     s_config: sampling.SamplingConfig,
                     r_config: RobustConfig, mesh=None,
                     residual_fn_with_params=None, returns_fn=None):
  """returns_fn, if given, scores the K clean candidate rollouts — the
  dominant batch — on the lane kernel (ops/sampling_lane.py
  make_lane_returns_fn); the N*M OU-perturbed re-rolls keep the XLA
  noisy_rollout path (per-candidate xfrc noise is generated in the
  scan, not in the kernel)."""
  horizon = s_config.horizon
  n_cand = min(r_config.num_candidates, s_config.num_trajectory)
  n_rep = r_config.num_repetitions
  k_noise = s_config.num_trajectory - 1

  def noisy_return(rf, cf, values, t0, dt, d0, key):
    def action(state, time):
      pol = spline_lib.SplinePolicy(
          t0=t0, dt=dt, values=values, interp=s_config.interp)
      return spline_lib.sample(pol, time)
    traj = rollout_lib.noisy_rollout(
        m, rf, cf, action, d0, horizon, key,
        r_config.xfrc_std, r_config.xfrc_rate)
    return traj.total_return

  def clean_return(rf, cf, values, t0, dt, d0):
    def action(state, time):
      pol = spline_lib.SplinePolicy(
          t0=t0, dt=dt, values=values, interp=s_config.interp)
      return spline_lib.sample(pol, time)
    traj = rollout_lib.rollout(
        m, rf, cf, action, d0, horizon)
    return traj.total_return

  def optimize(key, d0, policy: spline_lib.SplinePolicy,
               residual_params=None, cost_spec=None):
    # params + cost spec threaded as traced values
    # (see sampling.make_optimize_fn)
    if residual_params is not None and residual_fn_with_params is not None:
      rf = lambda mm, dd: residual_fn_with_params(mm, dd, residual_params)
    else:
      rf = residual_fn
    cf = cost_spec.cost if cost_spec is not None else cost_fn
    k1, k2 = jax.random.split(key)
    horizon_time = (horizon - 1) * m.opt.timestep
    policy = spline_lib.resample(policy, d0.time, horizon_time)

    # delegate: sampling candidates + clean rollouts
    noisy = sampling.add_noise(
        k1, policy.values, m, s_config.exploration, k_noise)
    candidates = jnp.concatenate([policy.values[None], noisy], axis=0)
    if returns_fn is not None:
      returns = returns_fn(candidates, d0, residual_params, cost_spec)
    else:
      returns = jax.vmap(
          lambda v: clean_return(rf, cf, v, policy.t0, policy.dt, d0))(
              candidates)

    # top-N candidates by clean return
    _, top_idx = jax.lax.top_k(-returns, n_cand)
    top = candidates[top_idx]  # (N, P, nu)

    # re-roll each under OU perturbations, M repetitions
    keys = jax.random.split(k2, n_cand * n_rep).reshape(n_cand, n_rep, 2)
    flat_vals = jnp.repeat(top, n_rep, axis=0)         # (N*M, P, nu)
    flat_keys = keys.reshape(n_cand * n_rep, 2)
    noisy_rets = jax.vmap(
        lambda v, kk: noisy_return(rf, cf, v, policy.t0, policy.dt, d0, kk))(
            flat_vals, flat_keys)
    avg = jnp.mean(noisy_rets.reshape(n_cand, n_rep), axis=1)
    winner = jnp.argmin(avg)

    new_policy = policy.replace(values=top[winner])
    info = {
        "returns": returns,
        "best_return": returns[top_idx[winner]],
        "robust_return": avg[winner],
        "winner": top_idx[winner],
    }
    return new_policy, info

  return optimize


class RobustPlanner:
  """Host-side wrapper (reference GUI name: "Robust Sampling")."""

  def __init__(self, task, s_config: Optional[sampling.SamplingConfig] = None,
               r_config: Optional[RobustConfig] = None, dtype=jnp.float32,
               lane: bool = False, interpret: bool = False, **kernel_kw):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    self.s_config = s_config or sampling.make_config(task, dtype)
    self.r_config = r_config or make_config(task, dtype)
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    returns_fn = None
    if lane:
      from mujoco_mpc_tpu.ops import sampling_lane
      returns_fn = sampling_lane.make_lane_returns_fn(
          task, self.s_config, interpret=interpret, **kernel_kw)
    # lane scorers bake a single-mode residual; the Agent rebuilds the
    # planner on mode switches when this is set (agent.set_mode)
    self.lane = returns_fn is not None
    self._optimize = jax.jit(make_optimize_fn(
        self.m, residual_fn, task.cost_spec.cost, self.s_config,
        self.r_config, residual_fn_with_params=task.residual,
        returns_fn=returns_fn))
    self.policy = sampling.initial_policy(self.m, self.s_config, dtype)

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
