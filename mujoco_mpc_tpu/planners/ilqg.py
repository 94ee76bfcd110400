"""iLQG planner — TPU-native.

Reference semantics (mjpc/planners/ilqg/):
  * nominal (feedback) rollout from the current state;
  * dynamics + Gauss-Newton cost derivatives along the trajectory
    (here: AD, planners/derivatives.py);
  * backward Riccati recursion with adaptive regularization
    (backward_pass.cc:65-356) and a boxQP at every step for control limits
    (projected Newton with free-set Cholesky, backward_pass.cc:158-217;
    feedback rows of clamped controls are zeroed);
  * parallel line search over action-improvement scalings: rollouts of
    u = u_nom + alpha*k + K*(x - x_nom) at log-scaled alphas
    (ilqg/planner.cc:618-680, LogScale utilities.h:231);
  * actual-vs-expected improvement drives the regularization schedule
    (planner.cc:551-604).

TPU design: the Riccati recursion is a reverse lax.scan (sequential in time,
small matrices — fine); the boxQP is a fixed-iteration masked projected
Newton, batched over time by the scan and over candidates by vmap; the line
search is a vmapped batch of feedback rollouts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.planners import derivatives as deriv


@struct.dataclass
class ILQGConfig:
  horizon: int = struct.field(pytree_node=False, default=50)
  num_alphas: int = struct.field(pytree_node=False, default=8)
  boxqp_iters: int = struct.field(pytree_node=False, default=6)
  reg_initial: float = struct.field(pytree_node=False, default=1e-2)
  reg_min: float = struct.field(pytree_node=False, default=1e-6)
  reg_max: float = struct.field(pytree_node=False, default=1e6)
  reg_factor: float = struct.field(pytree_node=False, default=10.0)
  max_reg_retries: int = struct.field(pytree_node=False, default=4)


def make_config(task) -> ILQGConfig:
  horizon_time = task.config("agent_horizon", 1.0)
  agent_timestep = task.config("agent_timestep",
                               float(task.mjm.opt.timestep))
  return ILQGConfig(
      horizon=int(round(horizon_time / agent_timestep)) + 1,
      num_alphas=int(task.config("ilqg_num_rollouts", 8)),
  )


@struct.dataclass
class ILQGPolicy:
  """Nominal trajectory + time-indexed feedback gains
  (reference ilqg/policy.h)."""
  states: jax.Array    # (T, nstate)
  actions: jax.Array   # (T, nu)
  times: jax.Array     # (T,)
  gains: jax.Array     # (T, nu, ndx)
  reg: jax.Array       # regularization carried across iterations


def _boxqp(quu, qu, lower, upper, iters: int):
  """Fixed-iteration projected-Newton box QP.

  min 0.5 du' Quu du + qu' du  s.t.  lower <= du <= upper.
  Returns (du, K_solve) where K_solve(rhs) solves the free-set system for
  feedback gains (clamped rows zeroed). (reference backward_pass.cc:158-217)
  """
  nu = qu.shape[0]
  dtype = qu.dtype
  eye = jnp.eye(nu, dtype=dtype)

  def free_solve(free, rhs):
    """Solve Quu_ff x_f = rhs_f with clamped rows forced to zero."""
    fmask = free.astype(dtype)
    quu_m = quu * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
    chol = jnp.linalg.cholesky(quu_m + 1e-9 * eye)
    y = jax.scipy.linalg.solve_triangular(
        chol, rhs * fmask[..., None] if rhs.ndim == 2 else rhs * fmask,
        lower=True)
    x = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
    return x * (fmask[..., None] if rhs.ndim == 2 else fmask)

  def body(_, du):
    grad = qu + quu @ du
    at_lower = (du <= lower + 1e-9) & (grad > 0)
    at_upper = (du >= upper - 1e-9) & (grad < 0)
    free = ~(at_lower | at_upper)
    # Newton step on the free set, with clamped contribution in the rhs
    clamped_du = jnp.where(free, 0.0, du)
    rhs = qu + quu @ clamped_du
    step = -free_solve(free, rhs)
    du_new = jnp.where(free, step, du)
    return jnp.clip(du_new, lower, upper)

  du = jnp.clip(-qu / jnp.maximum(jnp.diag(quu), 1e-8), lower, upper)
  du = jax.lax.fori_loop(0, iters, body, du)

  grad = qu + quu @ du
  at_lower = (du <= lower + 1e-9) & (grad > 0)
  at_upper = (du >= upper - 1e-9) & (grad < 0)
  free = ~(at_lower | at_upper)
  return du, free, free_solve


def backward_pass(a, b, cx, cu, cxx, cxu, cuu, du_lower, du_upper, reg,
                  boxqp_iters: int):
  """Riccati recursion with control-space regularization.

  a,b: (T-1, ...); cost expansions: (T, ...). Returns k (T-1, nu),
  K (T-1, nu, ndx), dv = (dv1, dv2), ok flag.
  """
  t_end = cx.shape[0] - 1
  nu = cu.shape[-1]

  def step(carry, inp):
    vx, vxx = carry
    at, bt, cxt, cut, cxxt, cxut, cuut, lo, hi = inp
    qx = cxt + at.T @ vx
    qu = cut + bt.T @ vx
    qxx = cxxt + at.T @ vxx @ at
    qux = cxut.T + bt.T @ vxx @ at
    quu = cuut + bt.T @ vxx @ bt
    quu_reg = quu + reg * jnp.eye(nu, dtype=qu.dtype)

    k, free, solve = _boxqp(quu_reg, qu, lo, hi, boxqp_iters)
    kmat = -solve(free, qux)  # (nu, ndx), clamped rows zero

    vx_new = qx + kmat.T @ (quu @ k + qu) + qux.T @ k
    vxx_new = qxx + kmat.T @ quu @ kmat + kmat.T @ qux + qux.T @ kmat
    vxx_new = 0.5 * (vxx_new + vxx_new.T)
    dv1 = k @ qu
    dv2 = 0.5 * k @ quu @ k
    bad = ~jnp.all(jnp.isfinite(vx_new)) | ~jnp.all(jnp.isfinite(k))
    return (vx_new, vxx_new), (k, kmat, dv1, dv2, bad)

  init = (cx[t_end], cxx[t_end])
  inputs = (a, b, cx[:-1], cu[:-1], cxx[:-1], cxu[:-1], cuu[:-1],
            du_lower, du_upper)
  (_, _), (ks, kmats, dv1s, dv2s, bads) = jax.lax.scan(
      step, init, inputs, reverse=True)
  ok = ~jnp.any(bads)
  return ks, kmats, (jnp.sum(dv1s), jnp.sum(dv2s)), ok


def make_optimize_fn(m: Model, residual_fn, cost_fn, cost_spec,
                     config: ILQGConfig, mesh=None):
  horizon = config.horizon
  nx = deriv.ndx(m)
  lo_ctrl = m.actuator_ctrlrange[:, 0]
  hi_ctrl = m.actuator_ctrlrange[:, 1]

  def feedback_rollout(d0, pol_states, pol_actions, ks, kmats, alpha):
    """Rollout u_t = clamp(u_nom_t + alpha k_t + K_t (x - x_nom_t))."""

    def body(carry, inp):
      d = rollout_lib.from_carry(carry)
      x_nom, u_nom, k, kmat = inp
      state = rollout_lib.pack_state(d)
      dx = deriv.state_diff(m, state, x_nom)
      u = u_nom + alpha * k + kmat @ dx
      u = jnp.clip(u, lo_ctrl, hi_ctrl)
      d = d.replace(ctrl=u)
      d = F.step(m, d)
      r = residual_fn(m, d)
      fail = rollout_lib._diverged(d)
      return rollout_lib.slim_carry(d), (state, u, r, fail)

    inputs = (pol_states[:-1], pol_actions[:-1], ks, kmats)
    carry_final, (states, actions, residuals, fails) = jax.lax.scan(
        body, rollout_lib.slim_carry(d0), inputs)
    d_final = F.forward(m, rollout_lib.from_carry(carry_final))
    r_last = residual_fn(m, d_final)
    states = jnp.concatenate(
        [states, rollout_lib.pack_state(d_final)[None]], axis=0)
    actions = jnp.concatenate([actions, actions[-1:]], axis=0)
    residuals = jnp.concatenate([residuals, r_last[None]], axis=0)
    costs = cost_fn(residuals)
    failure = jnp.any(fails) | ~jnp.all(jnp.isfinite(costs))
    total = jnp.where(failure, rollout_lib.MAX_RETURN_VALUE,
                      jnp.sum(costs) / horizon)
    return states, actions, total

  def optimize(key, d0, policy: ILQGPolicy):
    del key
    dtype = policy.actions.dtype
    template = F.forward(m, d0)

    # 1. nominal rollout with current feedback policy (alpha = 0)
    zero_k = jnp.zeros_like(policy.actions[:-1])
    states, actions, nominal_return = feedback_rollout(
        d0, policy.states, policy.actions, zero_k, policy.gains[:-1],
        jnp.zeros((), dtype))
    times = template.time + m.opt.timestep * jnp.arange(horizon, dtype=dtype)

    # 2. derivatives along the nominal
    a, b = deriv.model_derivatives(
        m, template, states[:-1], actions[:-1], times[:-1])
    cx, cu, cxx, cxu, cuu = deriv.cost_derivatives(
        m, template, residual_fn, cost_spec, states, actions, times)

    # 3. backward pass with regularization escalation on failure
    du_lower = lo_ctrl[None] - actions[:-1]
    du_upper = hi_ctrl[None] - actions[:-1]

    def cond(carry):
      reg, ks, kmats, ok, tries = carry
      return (~ok) & (tries < config.max_reg_retries)

    def body(carry):
      reg, _, _, _, tries = carry
      reg_new = jnp.minimum(reg * config.reg_factor, config.reg_max)
      ks, kmats, dv, ok = backward_pass(
          a, b, cx, cu, cxx, cxu, cuu, du_lower, du_upper, reg_new,
          config.boxqp_iters)
      return (reg_new, ks, kmats, ok, tries + 1)

    ks0, kmats0, dv0, ok0 = backward_pass(
        a, b, cx, cu, cxx, cxu, cuu, du_lower, du_upper, policy.reg,
        config.boxqp_iters)
    reg, ks, kmats, ok, _ = jax.lax.while_loop(
        cond, body, (policy.reg, ks0, kmats0, ok0, jnp.zeros((), jnp.int32)))

    # 4. parallel line search over log-scaled alphas (LogScale semantics)
    alphas = jnp.logspace(0.0, -3.0, config.num_alphas, dtype=dtype)
    ls_states, ls_actions, ls_returns = jax.vmap(
        lambda al: feedback_rollout(d0, states, actions, ks, kmats, al))(
            alphas)
    best = jnp.argmin(ls_returns)
    best_return = ls_returns[best]
    improved = best_return < nominal_return

    new_states = jnp.where(improved, ls_states[best], states)
    new_actions = jnp.where(improved, ls_actions[best], actions)
    # regularization schedule: decrease on success, increase on failure
    new_reg = jnp.clip(
        jnp.where(improved, reg / config.reg_factor,
                  reg * config.reg_factor),
        config.reg_min, config.reg_max)

    gains = jnp.concatenate([kmats, kmats[-1:]], axis=0)
    new_policy = ILQGPolicy(
        states=new_states, actions=new_actions, times=times, gains=gains,
        reg=new_reg)
    info = {
        "nominal_return": nominal_return,
        "best_return": jnp.minimum(best_return, nominal_return),
        "alpha": alphas[best],
        "improved": improved,
        "backward_ok": ok,
        "reg": new_reg,
    }
    return new_policy, info

  return optimize


def initial_policy(m: Model, config: ILQGConfig, d0: Data,
                   dtype=jnp.float32) -> ILQGPolicy:
  t = config.horizon
  state0 = jnp.concatenate([d0.qpos, d0.qvel, d0.act]).astype(dtype)
  return ILQGPolicy(
      states=jnp.tile(state0[None], (t, 1)),
      actions=jnp.zeros((t, m.nu), dtype),
      times=jnp.zeros((t,), dtype),
      gains=jnp.zeros((t, m.nu, deriv.ndx(m)), dtype),
      reg=jnp.asarray(config.reg_initial, dtype))


class ILQGPlanner:
  """Host-side wrapper (reference GUI name: "iLQG")."""

  def __init__(self, task, config: Optional[ILQGConfig] = None,
               dtype=jnp.float32):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    self.config = config or make_config(task)
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    self._optimize = jax.jit(make_optimize_fn(
        self.m, residual_fn, task.cost_spec.cost, task.cost_spec,
        self.config))
    self.policy = initial_policy(self.m, self.config, task.make_data(),
                                 dtype)

  def optimize(self, key, d0: Data):
    self.policy, info = self._optimize(key, d0, self.policy)
    return info

  def action(self, time, state=None) -> jax.Array:
    """Nominal + feedback action at query time (ilqg/policy.cc:82-140)."""
    pol = self.policy
    t = jnp.asarray(time)
    idx = jnp.clip(
        jnp.searchsorted(pol.times, t, side="right") - 1, 0,
        pol.times.shape[0] - 1)
    u = pol.actions[idx]
    if state is not None:
      from mujoco_mpc_tpu.planners import derivatives as dv
      dx = dv.state_diff(self.m, jnp.asarray(state), pol.states[idx])
      u = u + pol.gains[idx] @ dx
    return jnp.clip(u, self.m.actuator_ctrlrange[:, 0],
                    self.m.actuator_ctrlrange[:, 1])
