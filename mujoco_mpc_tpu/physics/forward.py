"""Forward dynamics pipeline and integrators (mj_forward / mj_step semantics).

Pure functions `forward(m, d) -> d` and `step(m, d) -> d`; everything is
jit/vmap/scan-friendly with static shapes. Constraint (contact/limit) forces
are produced by physics.constraint + physics.solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import constraint as C
from mujoco_mpc_tpu.physics import kinematics as K
from mujoco_mpc_tpu.physics import smooth as S
from mujoco_mpc_tpu.physics.model import (BALL, EULER, FREE, HINGE,
                                          IMPLICIT, IMPLICITFAST, RK4,
                                          SLIDE, Data, Model)
from mujoco_mpc_tpu.physics import math as mm


def fwd_position(m: Model, d: Data) -> Data:
  d = K.kinematics(m, d)
  d = K.com_pos(m, d)
  if m.ntendon:
    from mujoco_mpc_tpu.physics import tendon as T
    d = T.tendon(m, d)
  d = S.crb(m, d)
  d = S.factor_m(m, d)
  d = C.make_constraint(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  d = K.com_vel(m, d)
  d = S.rne(m, d)
  d = S.passive(m, d)
  d = C.reference_constraint(m, d)
  return d


def fwd_actuation(m: Model, d: Data) -> Data:
  return S.actuation(m, d)


def fwd_acceleration(m: Model, d: Data) -> Data:
  """Smooth acceleration: qacc_smooth = M^-1 qfrc_smooth."""
  # applied body wrenches (xfrc_applied: (nbody, 6) torque-last per MuJoCo
  # convention is (force[3], torque[3]); we store (force, torque))
  xfrc_q = S.apply_ft(
      m, d, d.xfrc_applied[:, :3], d.xfrc_applied[:, 3:], d.xipos)
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator +
                 d.qfrc_applied + xfrc_q)
  qacc_smooth = S.solve_m(m, d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def forward(m: Model, d: Data) -> Data:
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  d = C.solve(m, d)
  return d


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  """mj_integratePos, vectorized per joint type (scatter-free fast paths).

  Scalar joints update with one gather+scatter; quaternion joints are
  batched per type with a single block scatter each.
  """
  out = qpos
  if len(m.scalar_qadr):
    out = out.at[m.scalar_qadr].add(dt * qvel[m.scalar_dadr])
  if len(m.ball_qadr):
    qidx = (m.ball_qadr[:, None] + np.arange(4)[None, :]).reshape(-1)
    didx = (m.ball_dadr[:, None] + np.arange(3)[None, :]).reshape(-1)
    quats = qpos[qidx].reshape(-1, 4)
    omegas = qvel[didx].reshape(-1, 3)
    newq = mm.quat_integrate(mm.normalize_quat(quats), omegas, dt)
    out = out.at[qidx].set(newq.reshape(-1))
  if len(m.free_qadr):
    pidx = (m.free_qadr[:, None] + np.arange(3)[None, :]).reshape(-1)
    vidx = (m.free_dadr[:, None] + np.arange(3)[None, :]).reshape(-1)
    qidx = (m.free_qadr[:, None] + 3 + np.arange(4)[None, :]).reshape(-1)
    widx = (m.free_dadr[:, None] + 3 + np.arange(3)[None, :]).reshape(-1)
    out = out.at[pidx].add(dt * qvel[vidx])
    quats = qpos[qidx].reshape(-1, 4)
    omegas = qvel[widx].reshape(-1, 3)
    newq = mm.quat_integrate(mm.normalize_quat(quats), omegas, dt)
    out = out.at[qidx].set(newq.reshape(-1))
  return out


def _advance(m: Model, d: Data, qacc: jax.Array, act_dot: jax.Array,
             qvel_next=None) -> Data:
  dt = m.opt.timestep
  act = d.act + dt * act_dot
  if m.na:
    # clamp activations to actrange where actlimited (mj_advance
    # semantics, engine_forward.c mj_advance: act in [actrange] for
    # actlimited actuators). The act-slot -> actuator map is static
    # model metadata, so the mask/gather indices are trace constants.
    slot_u = np.zeros(m.na, np.int32)
    for u in range(m.nu):
      for k in range(int(m.actuator_actnum[u])):
        slot_u[int(m.actuator_actadr[u]) + k] = u
    limited = np.asarray(m.actuator_actlimited)[slot_u] > 0
    if limited.any():
      lo = m.actuator_actrange[slot_u, 0]
      hi = m.actuator_actrange[slot_u, 1]
      act = jnp.where(jnp.asarray(limited), jnp.clip(act, lo, hi), act)
  qvel = d.qvel + dt * qacc if qvel_next is None else qvel_next
  qpos = _integrate_pos(m, d.qpos, qvel, dt)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + dt)


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (mj_Euler)."""
  import numpy as np
  if np.any(np.asarray(jax.device_get(m.dof_damping)) > 0):
    # (M + h*diag(damping)) qacc' = qfrc_smooth + qfrc_constraint
    mh = d.qM + m.opt.timestep * jnp.diag(m.dof_damping)
    rhs = d.qfrc_smooth + d.qfrc_constraint
    chol = jnp.linalg.cholesky(mh)
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    qacc = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
  else:
    qacc = d.qacc
  return _advance(m, d, qacc, d.act_dot)


def rk4(m: Model, d: Data) -> Data:
  """4th-order Runge-Kutta (mj_RungeKutta)."""
  dt = m.opt.timestep
  a = jnp.array([0.5, 0.5, 1.0], dtype=d.qpos.dtype)
  b = jnp.array([1 / 6, 1 / 3, 1 / 3, 1 / 6], dtype=d.qpos.dtype)

  d0 = d
  qpos0, qvel0, act0 = d.qpos, d.qvel, d.act
  # stage derivatives: (qvel, qacc, act_dot)
  ks = [(d.qvel, d.qacc, d.act_dot)]
  for i in range(3):
    qv, qa, ad = ks[-1]
    qpos_i = _integrate_pos(m, qpos0, qv, a[i] * dt)
    qvel_i = qvel0 + a[i] * dt * qa
    act_i = act0 + a[i] * dt * ad
    di = d0.replace(qpos=qpos_i, qvel=qvel_i, act=act_i)
    di = forward(m, di)
    ks.append((di.qvel, di.qacc, di.act_dot))

  qvel_avg = sum(b[i] * ks[i][0] for i in range(4))
  qacc_avg = sum(b[i] * ks[i][1] for i in range(4))
  act_avg = sum(b[i] * ks[i][2] for i in range(4))
  qpos = _integrate_pos(m, qpos0, qvel_avg, dt)
  qvel = qvel0 + dt * qacc_avg
  act = act0 + dt * act_avg
  return d0.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + dt)


def _qderiv(m: Model, d: Data, include_rne: bool) -> jax.Array:
  """D = d(qfrc_passive + qfrc_actuator [- qfrc_bias])/d qvel at fixed
  positions — the velocity-force Jacobian of mjd_smooth_vel. The
  reference engine assembles it analytically (damping/affine-actuator/
  fluid/RNE terms); here it is one forward-mode AD sweep (nv tangents)
  through the velocity-dependent stages, which XLA batches."""

  def f(qvel):
    dd = d.replace(qvel=qvel)
    dd = K.com_vel(m, dd)
    out = jnp.zeros_like(qvel)
    if include_rne:
      dd = S.rne(m, dd)
      out = out - dd.qfrc_bias
    dd = S.passive(m, dd)
    dd = S.actuation(m, dd)
    return out + dd.qfrc_passive + dd.qfrc_actuator

  return jax.jacfwd(f)(d.qvel)


def implicit(m: Model, d: Data, fast: bool) -> Data:
  """Implicit-in-velocity integration (mj_implicit):
  (M - h·D) qacc = qfrc_smooth + qfrc_constraint.

  implicitfast drops the RNE (Coriolis) derivative from D and
  symmetrizes so a Cholesky solve applies (the reference's rationale:
  M's own derivative terms make D near-symmetric without RNE); full
  implicit keeps RNE and uses an LU solve."""
  dt = m.opt.timestep
  dmat = _qderiv(m, d, include_rne=not fast)
  mh = d.qM - dt * dmat
  rhs = d.qfrc_smooth + d.qfrc_constraint
  if fast:
    mh = 0.5 * (mh + mh.T)
    chol = jnp.linalg.cholesky(mh)
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    qacc = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
  else:
    qacc = jnp.linalg.solve(mh, rhs)
  return _advance(m, d, qacc, d.act_dot)


def integrate(m: Model, d: Data) -> Data:
  """Integration stage of mj_step, assuming forward() already ran on d.

  Split out so rollouts can read time-consistent derived quantities
  (sensors/residuals on the pre-integration state, like mj_step's sensor
  evaluation) before advancing the state."""
  if m.opt.integrator == RK4:
    return rk4(m, d)
  if m.opt.integrator == IMPLICIT:
    return implicit(m, d, fast=False)
  if m.opt.integrator == IMPLICITFAST:
    return implicit(m, d, fast=True)
  return euler(m, d)


def step(m: Model, d: Data) -> Data:
  """mj_step: forward dynamics + integration."""
  return integrate(m, forward(m, d))
