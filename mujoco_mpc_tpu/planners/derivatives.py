"""Model and cost derivatives along a trajectory.

TPU-native replacement for the reference's finite-difference stack
(reference: mjpc/planners/model_derivatives.{h,cc} — batched
mjd_transitionFD per timestep across threads; cost_derivatives.{h,cc} —
Gauss-Newton norm expansion chained with sensor Jacobians):

  * dynamics Jacobians A = df/dx, B = df/du come from forward-mode AD
    (jax.jacfwd) through the full step function in the quaternion-aware
    tangent space — exact to machine precision, vmapped over all timesteps
    at once instead of 2*(ndx+nu) FD rollouts per step;
  * cost expansions are Gauss-Newton: residual Jacobians (AD) chained with
    analytic norm gradients/Hessians (costs/norms.py).

Tangent state dx has dimension ndx = 2*nv + na: [dq (nv), dv (nv), da (na)],
with dq applied through mj_integratePos semantics (quaternion tangent).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import (BALL, FREE, HINGE, SLIDE, Data,
                                          Model)


def ndx(m: Model) -> int:
  return 2 * m.nv + m.na


def qpos_add(m: Model, qpos: jax.Array, dq: jax.Array) -> jax.Array:
  """qpos tangent update (mj_integratePos with dt=1)."""
  return F._integrate_pos(m, qpos, dq, 1.0)


def qpos_diff(m: Model, qpos2: jax.Array, qpos1: jax.Array) -> jax.Array:
  """Tangent difference dq s.t. qpos1 (+) dq ~= qpos2 (mj_differentiatePos).

  Vectorized per joint type (one block scatter each).
  """
  import numpy as np
  dtype = qpos1.dtype
  out = jnp.zeros(m.nv, dtype)
  if len(m.scalar_qadr):
    out = out.at[m.scalar_dadr].set(
        qpos2[m.scalar_qadr] - qpos1[m.scalar_qadr])
  if len(m.ball_qadr):
    qidx = (m.ball_qadr[:, None] + np.arange(4)[None, :]).reshape(-1)
    didx = (m.ball_dadr[:, None] + np.arange(3)[None, :]).reshape(-1)
    dq = mm.quat_sub(mm.normalize_quat(qpos2[qidx].reshape(-1, 4)),
                     mm.normalize_quat(qpos1[qidx].reshape(-1, 4)))
    out = out.at[didx].set(dq.reshape(-1))
  if len(m.free_qadr):
    pidx = (m.free_qadr[:, None] + np.arange(3)[None, :]).reshape(-1)
    vidx = (m.free_dadr[:, None] + np.arange(3)[None, :]).reshape(-1)
    qidx = (m.free_qadr[:, None] + 3 + np.arange(4)[None, :]).reshape(-1)
    widx = (m.free_dadr[:, None] + 3 + np.arange(3)[None, :]).reshape(-1)
    out = out.at[vidx].set(qpos2[pidx] - qpos1[pidx])
    dq = mm.quat_sub(mm.normalize_quat(qpos2[qidx].reshape(-1, 4)),
                     mm.normalize_quat(qpos1[qidx].reshape(-1, 4)))
    out = out.at[widx].set(dq.reshape(-1))
  return out


def state_add(m: Model, state: jax.Array, dx: jax.Array) -> jax.Array:
  """state [qpos,qvel,act] (+) tangent dx [dq,dv,da]."""
  nq, nv, na = m.nq, m.nv, m.na
  qpos = qpos_add(m, state[:nq], dx[:nv])
  qvel = state[nq:nq + nv] + dx[nv:2 * nv]
  act = state[nq + nv:] + dx[2 * nv:]
  return jnp.concatenate([qpos, qvel, act])


def state_diff(m: Model, s2: jax.Array, s1: jax.Array) -> jax.Array:
  """Tangent difference of packed states (reference StateDiff,
  utilities.h:174)."""
  nq, nv = m.nq, m.nv
  dq = qpos_diff(m, s2[:nq], s1[:nq])
  dv = s2[nq:nq + nv] - s1[nq:nq + nv]
  da = s2[nq + nv:] - s1[nq + nv:]
  return jnp.concatenate([dq, dv, da])


def make_step_fn(m: Model, template: Data) -> Callable:
  """(state, action, time) -> next packed state, via the full pipeline."""

  def step_fn(state, action, time):
    d = rollout_lib.set_state(m, template, state)
    d = d.replace(ctrl=action, time=time)
    d = F.step(m, d)
    return rollout_lib.pack_state(d)

  return step_fn


def model_derivatives(m: Model, template: Data, states: jax.Array,
                      actions: jax.Array, times: jax.Array,
                      skip: int = 1):
  """A (T, ndx, ndx), B (T, ndx, nu) along a trajectory.

  `skip` > 1 evaluates every skip-th step and linearly interpolates between
  (reference "derivative skip", model_derivatives.cc:57-72) — cuts the AD
  cost by `skip`x for long horizons at the price of smoothed Jacobians.
  """
  step_fn = make_step_fn(m, template)

  def tangent_step(state, action, time):
    nxt0 = step_fn(state, action, time)

    def f(dxu):
      dx, du = dxu[:ndx(m)], dxu[ndx(m):]
      nxt = step_fn(state_add(m, state, dx), action + du, time)
      return state_diff(m, nxt, nxt0)

    jac = jax.jacfwd(f)(jnp.zeros(ndx(m) + m.nu, states.dtype))
    return jac[:, :ndx(m)], jac[:, ndx(m):]

  t_hor = states.shape[0]
  if skip <= 1 or t_hor <= skip:
    return jax.vmap(tangent_step)(states, actions, times)

  # evaluate every skip-th step, linearly interpolate between
  import numpy as np
  eval_idx = np.arange(0, t_hor, skip)
  if eval_idx[-1] != t_hor - 1:
    eval_idx = np.append(eval_idx, t_hor - 1)
  a_e, b_e = jax.vmap(tangent_step)(
      states[eval_idx], actions[eval_idx], times[eval_idx])
  # interpolation weights per step (static)
  out_a, out_b = [], []
  for t in range(t_hor):
    seg = int(np.searchsorted(eval_idx, t, side="right")) - 1
    seg = min(seg, len(eval_idx) - 2)
    t0, t1 = eval_idx[seg], eval_idx[seg + 1]
    w = (t - t0) / max(t1 - t0, 1)
    out_a.append((1 - w) * a_e[seg] + w * a_e[seg + 1])
    out_b.append((1 - w) * b_e[seg] + w * b_e[seg + 1])
  return jnp.stack(out_a), jnp.stack(out_b)


def trajectory_derivatives(m: Model, template: Data, residual_fn: Callable,
                           cost_spec, states: jax.Array,
                           actions: jax.Array, times: jax.Array,
                           skip: int = 1):
  """Fused model + cost derivatives along a trajectory in ONE AD sweep.

  The reference evaluates dynamics Jacobians (model_derivatives.cc) and
  the Gauss-Newton cost expansion (cost_derivatives.cc) as separate
  passes; both need the same forward pipeline at (state, action, time).
  Fusing them shares that forward trace per tangent — one jacfwd
  produces [state_diff(next); residual] rows, halving the derivative
  phase of an iLQG iteration (the residual is evaluated pre-integration,
  rollout.py semantics).

  Returns (a, b, cx, cu, cxx, cxu, cuu) with a, b of length T-1 and the
  cost expansions of length T (terminal step: zero dynamics rows unused).
  `skip` > 1 evaluates every skip-th step and linearly interpolates the
  DYNAMICS Jacobians between (reference derivative skip,
  model_derivatives.cc:57-72); cost expansions stay exact per step (they
  are the cheap part once the Jacobian sweep is shared).
  """
  nx = ndx(m)
  nr = None

  def fwd_next_res(state, action, time):
    d = rollout_lib.set_state(m, template, state)
    d = d.replace(ctrl=action, time=time)
    d = F.forward(m, d)
    r = residual_fn(m, d)
    nxt = rollout_lib.pack_state(F.integrate(m, d))
    return nxt, r

  def jac_at(state, action, time):
    nxt0, _ = fwd_next_res(state, action, time)

    def f(dxu):
      dx, du = dxu[:nx], dxu[nx:]
      nxt, r = fwd_next_res(state_add(m, state, dx), action + du, time)
      return jnp.concatenate([state_diff(m, nxt, nxt0), r])

    zero = jnp.zeros(nx + m.nu, states.dtype)
    jac = jax.jacfwd(f)(zero)                 # (nx+nr, nx+nu)
    return (jac[:nx, :nx], jac[:nx, nx:],     # a, b
            jac[nx:, :nx], jac[nx:, nx:])     # rx, ru

  def gn(r0, rx, ru):
    g, h = cost_spec.cost_grad_hess(r0)
    hrx = h @ rx
    hru = h @ ru
    return (rx.T @ g, ru.T @ g, rx.T @ hrx, rx.T @ hru, ru.T @ hru)

  t_hor = states.shape[0]
  if skip <= 1 or t_hor <= skip:
    def expand(state, action, time):
      nxt0, r0 = fwd_next_res(state, action, time)

      def f(dxu):
        dx, du = dxu[:nx], dxu[nx:]
        nxt, r = fwd_next_res(state_add(m, state, dx), action + du, time)
        return jnp.concatenate([state_diff(m, nxt, nxt0), r])

      zero = jnp.zeros(nx + m.nu, states.dtype)
      jac = jax.jacfwd(f)(zero)
      a_t, b_t = jac[:nx, :nx], jac[:nx, nx:]
      rx, ru = jac[nx:, :nx], jac[nx:, nx:]
      return (a_t, b_t) + gn(r0, rx, ru)

    a, b, cx, cu, cxx, cxu, cuu = jax.vmap(expand)(states, actions, times)
    return a[:-1], b[:-1], cx, cu, cxx, cxu, cuu

  # derivative skip: the Jacobian sweep (dynamics AND residual rows,
  # like the reference interpolates A,B,C,D between evaluated steps)
  # runs every skip-th step and is linearly interpolated; residual
  # VALUES (for the norm grad/Hess) are exact at every step — the cheap
  # plain-forward part.
  import numpy as np
  eval_idx = np.arange(0, t_hor, skip)
  if eval_idx[-1] != t_hor - 1:
    eval_idx = np.append(eval_idx, t_hor - 1)
  a_e, b_e, rx_e, ru_e = jax.vmap(jac_at)(
      states[eval_idx], actions[eval_idx], times[eval_idx])
  r0s = jax.vmap(lambda s, u, t: fwd_next_res(s, u, t)[1])(
      states, actions, times)
  w_lo, w_hi, seg_lo, seg_hi = [], [], [], []
  for t in range(t_hor):
    seg = int(np.searchsorted(eval_idx, t, side="right")) - 1
    seg = min(seg, len(eval_idx) - 2)
    t0, t1 = eval_idx[seg], eval_idx[seg + 1]
    w = (t - t0) / max(t1 - t0, 1)
    seg_lo.append(seg)
    seg_hi.append(seg + 1)
    w_lo.append(1.0 - w)
    w_hi.append(w)
  wl = jnp.asarray(w_lo, states.dtype)[:, None, None]
  wh = jnp.asarray(w_hi, states.dtype)[:, None, None]
  sl = np.asarray(seg_lo)
  sh = np.asarray(seg_hi)
  a = wl * a_e[sl] + wh * a_e[sh]
  b = wl * b_e[sl] + wh * b_e[sh]
  rx = wl * rx_e[sl] + wh * rx_e[sh]
  ru = wl * ru_e[sl] + wh * ru_e[sh]
  cx, cu, cxx, cxu, cuu = jax.vmap(gn)(r0s, rx, ru)
  return a[:-1], b[:-1], cx, cu, cxx, cxu, cuu


def make_residual_at_fn(m: Model, template: Data, residual_fn: Callable):
  """residual evaluated at (state, action, time) after a forward pass."""

  def res_at(state, action, time):
    d = rollout_lib.set_state(m, template, state)
    d = d.replace(ctrl=action, time=time)
    d = F.forward(m, d)
    return residual_fn(m, d)

  return res_at


def cost_derivatives(m: Model, template: Data, residual_fn: Callable,
                     cost_spec, states: jax.Array, actions: jax.Array,
                     times: jax.Array):
  """Gauss-Newton stage-cost expansion along a trajectory.

  Returns cx (T, ndx), cu (T, nu), cxx (T, ndx, ndx), cxu (T, ndx, nu),
  cuu (T, nu, nu). (reference cost_derivatives.cc:77-224)
  """
  res_at = make_residual_at_fn(m, template, residual_fn)
  nx = ndx(m)

  def expand(state, action, time):
    def r_of(dxu):
      dx, du = dxu[:nx], dxu[nx:]
      return res_at(state_add(m, state, dx), action + du, time)

    zero = jnp.zeros(nx + m.nu, states.dtype)
    r0 = r_of(zero)
    jac = jax.jacfwd(r_of)(zero)           # (nr, nx+nu)
    rx, ru = jac[:, :nx], jac[:, nx:]
    g, h = cost_spec.cost_grad_hess(r0)    # (nr,), (nr, nr)
    cx = rx.T @ g
    cu = ru.T @ g
    hrx = h @ rx
    hru = h @ ru
    cxx = rx.T @ hrx
    cxu = rx.T @ hru
    cuu = ru.T @ hru
    return cx, cu, cxx, cxu, cuu

  return jax.vmap(expand)(states, actions, times)
