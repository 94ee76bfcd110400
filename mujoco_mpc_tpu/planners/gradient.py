"""Gradient-descent planner — TPU-native.

Reference capability (mjpc/planners/gradient/): Pontryagin gradient descent
on spline parameters — nominal rollout, FD model derivatives, backward sweep
with k = -Qu, mapped into spline-parameter space through hand-built spline
mapping matrices (spline_mapping.cc), then a parallel log-scaled line search
(planner.cc:261-307).

The TPU-native formulation collapses all of that into one reverse-mode AD
pass: grad_theta [ total_return(rollout(theta)) ] — the chain rule through
spline sampling IS the spline mapping, and AD through the step function
replaces the FD sweep exactly. The parallel line search over log-scaled
step sizes (LogScale, utilities.h:231) is kept as a vmapped rollout batch.
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
class GradientConfig:
  num_spline_points: int = struct.field(pytree_node=False, default=10)
  interp: int = struct.field(pytree_node=False,
                             default=spline_lib.Interpolation.ZERO)
  horizon: int = struct.field(pytree_node=False, default=100)
  num_steps: int = struct.field(pytree_node=False, default=8)  # line search
  step_max: float = struct.field(pytree_node=False, default=1.0)
  step_min: float = struct.field(pytree_node=False, default=1e-4)


def make_config(task) -> GradientConfig:
  horizon_time = task.config("agent_horizon", 1.0)
  agent_timestep = task.config("agent_timestep",
                               float(task.mjm.opt.timestep))
  return GradientConfig(
      num_spline_points=int(task.config("gradient_spline_points", 10)),
      horizon=int(round(horizon_time / agent_timestep)) + 1,
  )


def make_optimize_fn(m: Model, residual_fn, cost_fn,
                     config: GradientConfig, mesh=None,
                     residual_fn_with_params=None):
  horizon = config.horizon

  def total_return(rf, cf, values, t0, dt, d0):
    def action(state, time):
      pol = spline_lib.SplinePolicy(
          t0=t0, dt=dt, values=values, interp=config.interp)
      return spline_lib.sample(pol, time)
    traj = rollout_lib.rollout(m, rf, cf, action, d0, horizon)
    return traj.total_return

  def optimize(key, d0, policy: spline_lib.SplinePolicy,
               residual_params=None, cost_spec=None):
    # params + cost spec threaded as traced values
    # (see sampling.make_optimize_fn)
    del key
    if residual_params is not None and residual_fn_with_params is not None:
      rf = lambda mm, dd: residual_fn_with_params(mm, dd, residual_params)
    else:
      rf = residual_fn
    cf = cost_spec.cost if cost_spec is not None else cost_fn
    dtype = policy.values.dtype
    horizon_time = (horizon - 1) * m.opt.timestep
    policy = spline_lib.resample(policy, d0.time, horizon_time)

    ret0, grad = jax.value_and_grad(
        lambda v: total_return(rf, cf, v, policy.t0, policy.dt, d0))(
            policy.values)
    # guard NaN gradients from diverged rollouts
    grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
    gnorm = jnp.maximum(jnp.linalg.norm(grad), 1e-10)
    direction = -grad / gnorm

    # scale steps by ctrl range so step sizes are dimensionless
    scale = 0.5 * jnp.mean(
        m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0])
    steps = scale * jnp.logspace(
        jnp.log10(config.step_max), jnp.log10(config.step_min),
        config.num_steps, dtype=dtype)

    candidates = policy.values[None] + steps[:, None, None] * direction[None]
    candidates = jnp.clip(candidates, m.actuator_ctrlrange[:, 0],
                          m.actuator_ctrlrange[:, 1])
    returns = jax.vmap(
        lambda v: total_return(rf, cf, v, policy.t0, policy.dt, d0))(
            candidates)
    best = jnp.argmin(returns)
    improved = returns[best] < ret0
    new_values = jnp.where(improved, candidates[best], policy.values)
    info = {
        "nominal_return": ret0,
        "best_return": jnp.minimum(returns[best], ret0),
        "grad_norm": gnorm,
        "improved": improved,
        "step": steps[best],
    }
    return policy.replace(values=new_values), info

  return optimize


class GradientPlanner:
  """Host-side wrapper (reference GUI name: "Gradient")."""

  def __init__(self, task, config: Optional[GradientConfig] = None,
               dtype=jnp.float32):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    self.config = config or make_config(task)
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    self._optimize = jax.jit(make_optimize_fn(
        self.m, residual_fn, task.cost_spec.cost, self.config,
        residual_fn_with_params=task.residual))
    from mujoco_mpc_tpu.planners import sampling as sampling_lib
    self.policy = sampling_lib.initial_policy(
        self.m,
        sampling_lib.SamplingConfig(
            num_spline_points=self.config.num_spline_points,
            interp=self.config.interp, horizon=self.config.horizon,
            exploration=jnp.zeros(2, dtype)),
        dtype)

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
