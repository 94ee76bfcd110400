"""Smooth (unconstrained) dynamics: mass matrix, bias forces, passive forces,
actuation. Semantics match MuJoCo mj_crb / mj_rne / mj_passive /
mj_fwdActuation (validated against the C library in tests).

TPU notes: the mass matrix is dense (nv x nv) — robotics nv is tiny, and the
dense form makes CRB a single masked matmul and the solves batched Cholesky,
both of which XLA maps well onto the MXU when vmapped over thousands of
candidate rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import (BALL, BIAS_AFFINE, BIAS_MUSCLE,
                                          BIAS_NONE, DYN_FILTER,
                                          DYN_FILTEREXACT, DYN_INTEGRATOR,
                                          DYN_MUSCLE, DYN_NONE, FREE,
                                          GAIN_AFFINE, GAIN_FIXED,
                                          GAIN_MUSCLE, HINGE,
                                          SLIDE, TRN_JOINT, TRN_SITE,
                                          TRN_TENDON, Data, Model)

# mjDSBL_* flags we honor
DSBL_GRAVITY = 1 << 6
DSBL_PASSIVE = 1 << 3
DSBL_CLAMPCTRL = 1 << 5
DSBL_ACTUATION = 1 << 4
DSBL_CONTACT = 1 << 2
DSBL_CONSTRAINT = 1 << 0
DSBL_LIMIT = 1 << 4  # NOTE: mjDSBL_LIMIT is 1<<7? fixed below.

# correct mjtDisableBit values (mujoco.h): constraint=1, equality=2,
# frictionloss=4, limit=8, contact=16, passive=32, gravity=64, clampctrl=128,
# warmstart=256, actuation=1024
DSBL_CONSTRAINT = 1
DSBL_EQUALITY = 2
DSBL_FRICTIONLOSS = 4
DSBL_LIMIT = 8
DSBL_CONTACT = 16
DSBL_PASSIVE = 32
DSBL_GRAVITY = 64
DSBL_CLAMPCTRL = 128
DSBL_ACTUATION = 1024


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body: dense joint-space mass matrix qM.

  Composite inertias via one subtree-mask matmul; qM = masked F @ cdof^T.
  """
  dtype = d.qpos.dtype
  nb, nv = m.nbody, m.nv

  stm = jnp.asarray(m.subtree_mask, dtype)
  crb_arr = stm @ d.cinert  # (nb, 10)

  # F[i] = I^crb_{body(i)} * cdof_i ; M = mask(F @ cdof^T)
  f = mm.inert_mul(crb_arr[m.dof_bodyid], d.cdof)  # (nv, 6)
  full = f @ d.cdof.T  # (nv, nv)
  anc = jnp.asarray(m.dof_ancestor_mask, dtype)  # lower-triangular mask
  lower = full * anc
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def factor_m(m: Model, d: Data) -> Data:
  """Dense Cholesky factorization of qM."""
  return d.replace(qLD=jnp.linalg.cholesky(d.qM))


def solve_m(m: Model, d: Data, rhs: jax.Array) -> jax.Array:
  """Solve qM x = rhs using the cached Cholesky factor."""
  y = jax.scipy.linalg.solve_triangular(d.qLD, rhs, lower=True)
  return jax.scipy.linalg.solve_triangular(d.qLD.T, y, lower=False)


def rne(m: Model, d: Data) -> Data:
  """Recursive Newton-Euler: qfrc_bias = C(q,v)v + g (mj_rne flg_acc=0)."""
  dtype = d.qpos.dtype
  nb, nv = m.nbody, m.nv

  if (m.opt.disableflags & DSBL_GRAVITY) != 0:
    gravity = jnp.zeros(3, dtype)
  else:
    gravity = m.opt.gravity

  # forward pass (vectorized): cacc[b] = cacc_world + sum over supporting
  # dofs of cdof_dot * qvel — one body_dof_mask matmul
  cacc_world = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
  bdm = jnp.asarray(m.body_dof_mask, dtype)
  cacc = cacc_world[None, :] + bdm @ (d.cdof_dot * d.qvel[:, None])

  # body forces: f = I a + v x* (I v), batched over bodies
  iv = mm.inert_mul(d.cinert, d.cvel)
  cfrc = mm.inert_mul(d.cinert, cacc) + mm.force_cross(d.cvel, iv)
  cfrc = cfrc.at[0].set(jnp.zeros(6, dtype))

  # backward accumulation as subtree-mask matmul
  stm = jnp.asarray(m.subtree_mask, dtype)
  cfrc_tot = stm @ cfrc
  qfrc_bias = jnp.sum(d.cdof * cfrc_tot[m.dof_bodyid], axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


def _spring_force(m: Model, d: Data) -> jax.Array:
  """Joint spring torque: -stiffness * (qpos - qpos_spring), vectorized:
  springs act along the same tangent difference as qpos_diff."""
  from mujoco_mpc_tpu.planners import derivatives as _deriv
  dq = _deriv.qpos_diff(m, d.qpos, m.qpos_spring)  # (nv,)
  # per-dof stiffness from the owning joint
  stiff_dof = m.jnt_stiffness[m.dof_jntid]
  return -stiff_dof * dq


def _fluid_force(m: Model, d: Data) -> jax.Array:
  """Inertia-box fluid model (viscosity / density / wind), mj_passive."""
  dtype = d.qpos.dtype
  # equivalent inertia-box half sizes per body
  inertia = m.body_inertia  # (nb, 3) principal moments
  mass = jnp.maximum(m.body_mass, 1e-15)
  i0, i1, i2 = inertia[:, 0], inertia[:, 1], inertia[:, 2]
  box = jnp.stack(
      [
          jnp.sqrt(jnp.maximum(1e-12, (i1 + i2 - i0) * 3.0 / (2.0 * mass))),
          jnp.sqrt(jnp.maximum(1e-12, (i0 + i2 - i1) * 3.0 / (2.0 * mass))),
          jnp.sqrt(jnp.maximum(1e-12, (i0 + i1 - i2) * 3.0 / (2.0 * mass))),
      ],
      axis=-1,
  )  # (nb, 3) FULL sizes? MuJoCo uses box = sqrt(...) as半 size*2; validated
  # against oracle below — these are full box sizes /2? see test.

  # body spatial velocity at body com (xipos), world frame:
  # cvel is at subtree_com[rootid]; shift to xipos
  ref = d.subtree_com[m.body_rootid]
  offset = d.xipos - ref
  ang_w = d.cvel[:, :3]
  lin_w = d.cvel[:, 3:] + jnp.cross(ang_w, offset)
  # subtract wind, rotate into inertial frame (ximat columns)
  lin_w = lin_w - m.opt.wind
  # local frame = inertial frame orientation
  rot = d.ximat  # (nb, 3, 3) world-from-local
  lvel_ang = jnp.einsum("bij,bi->bj", rot, ang_w)
  lvel_lin = jnp.einsum("bij,bi->bj", rot, lin_w)

  # viscous (linear in velocity)
  diam = jnp.mean(box, axis=-1)
  torque = -jnp.pi * diam[:, None]**3 * m.opt.viscosity * lvel_ang
  force = -3.0 * jnp.pi * diam[:, None] * m.opt.viscosity * lvel_lin

  # density (quadratic drag)
  b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
  rho = m.opt.density
  force = force - 0.5 * rho * jnp.stack(
      [
          b1 * b2 * jnp.abs(lvel_lin[:, 0]) * lvel_lin[:, 0],
          b0 * b2 * jnp.abs(lvel_lin[:, 1]) * lvel_lin[:, 1],
          b0 * b1 * jnp.abs(lvel_lin[:, 2]) * lvel_lin[:, 2],
      ],
      axis=-1,
  )
  torque = torque - rho * jnp.stack(
      [
          b0 * (b1**4 + b2**4) * jnp.abs(lvel_ang[:, 0]) * lvel_ang[:, 0],
          b1 * (b0**4 + b2**4) * jnp.abs(lvel_ang[:, 1]) * lvel_ang[:, 1],
          b2 * (b0**4 + b1**4) * jnp.abs(lvel_ang[:, 2]) * lvel_ang[:, 2],
      ],
      axis=-1,
  ) / 64.0

  # rotate back to world, zero out world body / massless bodies
  force_w = jnp.einsum("bij,bj->bi", rot, force)
  torque_w = jnp.einsum("bij,bj->bi", rot, torque)
  alive = (m.body_mass > 1e-12)[:, None]
  force_w = jnp.where(alive, force_w, 0.0)
  torque_w = jnp.where(alive, torque_w, 0.0)

  return apply_ft(m, d, force_w, torque_w, d.xipos)


def apply_ft(m: Model, d: Data, force: jax.Array, torque: jax.Array,
             point: jax.Array) -> jax.Array:
  """Map per-body world wrenches applied at `point` to joint space.

  force/torque/point: (nbody, 3). Returns qfrc (nv,). Equivalent of
  mj_applyFT accumulated over all bodies.
  """
  ref = d.subtree_com[m.body_rootid]  # (nb, 3)
  # spatial force at the c-frame reference point: (torque + (p-c) x f, f)
  t_ref = torque + jnp.cross(point - ref, force)
  fb = jnp.concatenate([t_ref, force], axis=-1)  # (nb, 6)
  # qfrc[i] = sum_b mask[b, i] * cdof_i . fb[b]
  mask = jnp.asarray(m.body_dof_mask, d.qpos.dtype)  # (nb, nv)
  contrib = d.cdof @ fb.T  # (nv, nb)
  return jnp.sum(contrib * mask.T, axis=-1)


def passive(m: Model, d: Data) -> Data:
  """Spring + damper + fluid passive forces."""
  dtype = d.qpos.dtype
  if (m.opt.disableflags & DSBL_PASSIVE) != 0:
    return d.replace(qfrc_passive=jnp.zeros(m.nv, dtype))
  qfrc = _spring_force(m, d)
  qfrc = qfrc - m.dof_damping * d.qvel
  qfrc = qfrc + _fluid_force(m, d)
  if m.ntendon:
    from mujoco_mpc_tpu.physics import tendon as _tendon
    qfrc = qfrc + _tendon.passive_force(m, d)
  return d.replace(qfrc_passive=qfrc)


def transmission(m: Model, d: Data) -> tuple[jax.Array, jax.Array]:
  """Actuator lengths and moment matrix (nu, nv), vectorized per
  transmission class (joint-scalar actuators — the common case — are a
  single gather + static scatter)."""
  import numpy as np
  dtype = d.qpos.dtype
  nu, nv = m.nu, m.nv
  if nu == 0:
    return jnp.zeros((0,), dtype), jnp.zeros((0, nv), dtype)

  lengths = jnp.zeros(nu, dtype)
  moment = jnp.zeros((nu, nv), dtype)

  # classify actuators (static)
  scalar_u, scalar_qadr, scalar_dadr = [], [], []
  other = []
  for u in range(nu):
    trntype = int(m.actuator_trntype[u])
    tid = int(m.actuator_trnid[u, 0])
    if trntype == TRN_JOINT and int(m.jnt_type[tid]) in (HINGE, SLIDE):
      scalar_u.append(u)
      scalar_qadr.append(int(m.jnt_qposadr[tid]))
      scalar_dadr.append(int(m.jnt_dofadr[tid]))
    else:
      other.append(u)

  if scalar_u:
    su = np.array(scalar_u)
    gear0 = m.actuator_gear[su, 0]
    lengths = lengths.at[su].set(d.qpos[np.array(scalar_qadr)] * gear0)
    moment = moment.at[su, np.array(scalar_dadr)].set(gear0)

  for u in other:
    trntype = int(m.actuator_trntype[u])
    tid = int(m.actuator_trnid[u, 0])
    gear = m.actuator_gear[u]
    if trntype == TRN_JOINT:
      jtype = int(m.jnt_type[tid])
      dadr = int(m.jnt_dofadr[tid])
      if jtype == FREE:
        moment = moment.at[u, dadr:dadr + 6].set(gear[:6])
      elif jtype == BALL:
        moment = moment.at[u, dadr:dadr + 3].set(gear[:3])
    elif trntype == TRN_TENDON:
      gear0 = gear[0]
      lengths = lengths.at[u].set(d.ten_length[tid] * gear0)
      moment = moment.at[u].set(d.ten_J[tid] * gear0)
    elif trntype == TRN_SITE:
      bid = int(m.site_bodyid[tid])
      rot = d.site_xmat[tid]  # world-from-site
      f_w = rot @ gear[:3]
      t_w = rot @ gear[3:6]
      ref = d.subtree_com[m.body_rootid[bid]]
      t_ref = t_w + jnp.cross(d.site_xpos[tid] - ref, f_w)
      fb = jnp.concatenate([t_ref, f_w])
      mask = jnp.asarray(m.body_dof_mask[bid], dtype)
      moment = moment.at[u].set((d.cdof @ fb) * mask)

  return lengths, moment


def _bump(length, a, mid, b):
  """mju_muscleGain's FL bump: piecewise-quadratic, 1 at mid, 0 at a/b."""
  eps = 1e-8
  left = 0.5 * (a + mid)
  right = 0.5 * (mid + b)
  x_a = (length - a) / jnp.maximum(left - a, eps)
  x_l = (mid - length) / jnp.maximum(mid - left, eps)
  x_r = (length - mid) / jnp.maximum(right - mid, eps)
  x_b = (b - length) / jnp.maximum(b - right, eps)
  val = jnp.where(
      length < left, 0.5 * x_a * x_a,
      jnp.where(length < mid, 1.0 - 0.5 * x_l * x_l,
                jnp.where(length < right, 1.0 - 0.5 * x_r * x_r,
                          0.5 * x_b * x_b)))
  return jnp.where((length <= a) | (length >= b), 0.0, val)


def _muscle_gain_bias(m: Model, length: jax.Array, velocity: jax.Array):
  """Vectorized mju_muscleGain / mju_muscleBias over all actuators.

  gainprm = (range0, range1, force, scale, lmin, lmax, vmax, fpmax,
  fvmax); normalized length/velocity from actuator_lengthrange and the
  compiler's acc0 scaling when force < 0."""
  eps = 1e-8
  prm = m.actuator_gainprm
  lr = m.actuator_lengthrange
  r0, r1 = prm[:, 0], prm[:, 1]
  force, scale = prm[:, 2], prm[:, 3]
  lmin, lmax = prm[:, 4], prm[:, 5]
  vmax, fpmax, fvmax = prm[:, 6], prm[:, 7], prm[:, 8]
  len0 = (lr[:, 1] - lr[:, 0]) / jnp.maximum(r1 - r0, eps)
  ln = r0 + (length - lr[:, 0]) / jnp.maximum(len0, eps)
  vn = velocity / jnp.maximum(len0 * vmax, eps)
  frc = jnp.where(force < 0, scale / jnp.maximum(m.actuator_acc0, eps),
                  force)
  fl = _bump(ln, lmin, jnp.ones_like(ln), lmax)
  y = fvmax - 1.0
  fv = jnp.where(
      vn <= -1.0, 0.0,
      jnp.where(vn <= 0.0, (vn + 1.0)**2,
                jnp.where(vn <= y, fvmax - (y - vn)**2 / jnp.maximum(y, eps),
                          fvmax)))
  gain = -frc * fl * fv
  b = 0.5 * (1.0 + lmax)
  x1 = (ln - 1.0) / jnp.maximum(b - 1.0, eps)
  x2 = (ln - b) / jnp.maximum(b - 1.0, eps)
  fp = jnp.where(ln <= 1.0, 0.0,
                 jnp.where(ln <= b, 0.5 * x1 * x1, 0.5 + x2))
  bias = -frc * fpmax * fp
  return gain, bias


def actuation(m: Model, d: Data) -> Data:
  """Actuator forces -> qfrc_actuator; activation derivatives (mj_fwdActuation)."""
  dtype = d.qpos.dtype
  nu, nv, na = m.nu, m.nv, m.na
  if nu == 0 or (m.opt.disableflags & DSBL_ACTUATION) != 0:
    return d.replace(
        qfrc_actuator=jnp.zeros(nv, dtype),
        actuator_force=jnp.zeros(nu, dtype),
        actuator_length=jnp.zeros(nu, dtype),
        actuator_velocity=jnp.zeros(nu, dtype),
        act_dot=jnp.zeros(na, dtype))

  length, moment = transmission(m, d)
  velocity = moment @ d.qvel

  # clamp controls
  ctrl = d.ctrl
  if (m.opt.disableflags & DSBL_CLAMPCTRL) == 0:
    limited = jnp.asarray(m.actuator_ctrllimited, bool)
    lo = m.actuator_ctrlrange[:, 0]
    hi = m.actuator_ctrlrange[:, 1]
    ctrl = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)

  # activation dynamics (vectorized; loop only over stateful actuators,
  # which are rare)
  act_dot = jnp.zeros(na, dtype)
  input_arr = ctrl
  for u in range(nu):
    dyntype = int(m.actuator_dyntype[u])
    if dyntype == DYN_NONE:
      continue
    aadr = int(m.actuator_actadr[u])
    input_arr = input_arr.at[u].set(d.act[aadr])
    if dyntype == DYN_INTEGRATOR:
      act_dot = act_dot.at[aadr].set(ctrl[u])
    elif dyntype in (DYN_FILTER, DYN_FILTEREXACT):
      tau = jnp.maximum(m.actuator_dynprm[u, 0], 1e-8)
      act_dot = act_dot.at[aadr].set((ctrl[u] - d.act[aadr]) / tau)
    elif dyntype == DYN_MUSCLE:
      # mju_muscleDynamics: activation/deactivation time constants scaled
      # by activation level (hard switch; dynprm[2] smoothing unused)
      ctrlc = jnp.clip(ctrl[u], 0.0, 1.0)
      actc = jnp.clip(d.act[aadr], 0.0, 1.0)
      tau = jnp.where(ctrlc > actc,
                      m.actuator_dynprm[u, 0] * (0.5 + 1.5 * actc),
                      m.actuator_dynprm[u, 1] / (0.5 + 1.5 * actc))
      act_dot = act_dot.at[aadr].set(
          (ctrlc - actc) / jnp.maximum(tau, 1e-8))

  # gain / bias
  prm_g = m.actuator_gainprm
  prm_b = m.actuator_biasprm
  gaintype = m.actuator_gaintype
  biastype = m.actuator_biastype
  gain = jnp.where(
      jnp.asarray(gaintype == GAIN_FIXED),
      prm_g[:, 0],
      prm_g[:, 0] + prm_g[:, 1] * length + prm_g[:, 2] * velocity)
  bias = jnp.where(
      jnp.asarray(biastype == BIAS_NONE),
      jnp.zeros(nu, dtype),
      prm_b[:, 0] + prm_b[:, 1] * length + prm_b[:, 2] * velocity)
  if np.any(gaintype == GAIN_MUSCLE) or np.any(biastype == BIAS_MUSCLE):
    mgain, mbias = _muscle_gain_bias(m, length, velocity)
    gain = jnp.where(jnp.asarray(gaintype == GAIN_MUSCLE), mgain, gain)
    bias = jnp.where(jnp.asarray(biastype == BIAS_MUSCLE), mbias, bias)
  force = gain * input_arr + bias

  # clamp force
  flimited = jnp.asarray(m.actuator_forcelimited, bool)
  force = jnp.where(
      flimited,
      jnp.clip(force, m.actuator_forcerange[:, 0],
               m.actuator_forcerange[:, 1]), force)

  qfrc = moment.T @ force
  return d.replace(
      qfrc_actuator=qfrc, actuator_force=force, actuator_length=length,
      actuator_velocity=velocity, act_dot=act_dot, ctrl=ctrl)
