"""Lane-parallel Pallas rollout kernel (prototype: contact-free models).

The speed-of-light design from ops/README.md, realized for the
hinge/slide/no-contact model class (cartpole, acrobot, pendulums): the
ENTIRE rollout — FK, CRB, RNE, passive, actuation, implicit-damping Euler,
for every horizon step — runs inside one Pallas kernel with candidates on
the lane axis. State never leaves VMEM between steps; HBM sees only the
initial state, the spline parameters, and the recorded trajectory.

The kernel is generated from the same static model metadata as the jnp
pipeline (physics/*), using the component-tuple math in ops/lanemath.py.
Correctness is checked against the jnp `F.step` path in tests.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mujoco_mpc_tpu.ops import lanemath as lm
from mujoco_mpc_tpu.physics.model import (BIAS_NONE, GAIN_FIXED, HINGE,
                                          SLIDE, TRN_JOINT, Model)


def supports(m: Model) -> bool:
  """Model class the prototype kernel handles."""
  jt = set(int(t) for t in m.jnt_type)
  if not jt <= {HINGE, SLIDE}:
    return False
  if m.collision_pairs is not None and m.collision_pairs.ncon > 0:
    return False
  if m.neq or m.na:
    return False
  if np.any(np.asarray(jax.device_get(m.dof_frictionloss)) > 0):
    return False
  for u in range(m.nu):
    if int(m.actuator_trntype[u]) != TRN_JOINT:
      return False
  return True


def _static(m: Model):
  """Pull all model constants to host floats (trace-time constants)."""
  g = jax.device_get
  return dict(
      body_pos=g(m.body_pos), body_quat=g(m.body_quat),
      body_ipos=g(m.body_ipos), body_iquat=g(m.body_iquat),
      body_mass=g(m.body_mass), body_inertia=g(m.body_inertia),
      body_subtreemass=g(m.body_subtreemass),
      jnt_pos=g(m.jnt_pos), jnt_axis=g(m.jnt_axis),
      jnt_stiffness=g(m.jnt_stiffness), qpos0=g(m.qpos0),
      qpos_spring=g(m.qpos_spring), dof_damping=g(m.dof_damping),
      dof_armature=g(m.dof_armature),
      gainprm=g(m.actuator_gainprm), biasprm=g(m.actuator_biasprm),
      gaintype=g(m.actuator_gaintype), biastype=g(m.actuator_biastype),
      ctrlrange=g(m.actuator_ctrlrange),
      ctrllimited=g(m.actuator_ctrllimited),
      gear=g(m.actuator_gear), gravity=g(m.opt.gravity),
      timestep=float(g(m.opt.timestep)),
      jnt_range=g(m.jnt_range), jnt_solref=g(m.jnt_solref),
      jnt_solimp=g(m.jnt_solimp), jnt_margin=g(m.jnt_margin),
      dof_invweight0=g(m.dof_invweight0),
  )


def build_rollout_kernel(m: Model, horizon: int, num_nodes: int,
                         interpret: bool = False) -> Callable:
  """Returns fn(qpos0 (nq,K), qvel0 (nv,K), values (P*nu, K)) ->
  states (horizon, nq+nv, K) for a zero-order-hold spline with
  node_of_step[t] = floor(t * P / horizon) (the planner's uniform grid).

  K must tile to the TPU lane layout (multiples of 128 recommended).
  """
  assert supports(m), "model outside the prototype kernel's class"
  c = _static(m)
  nq, nv, nu, nb = m.nq, m.nv, m.nu, m.nbody
  h = c["timestep"]
  node_of_step = [min(int(t * num_nodes / max(horizon - 1, 1)),
                      num_nodes - 1) for t in range(horizon)]

  def step_body(qpos, qvel, ctrl):
    """One physics step on component lists; returns (qpos', qvel')."""
    like = qpos[0]

    def cv(v):
      return lm.const_vec3(v, like)

    # ---- FK ----
    xpos = [cv([0, 0, 0])] * nb
    xquat = [(jnp.ones_like(like), like * 0, like * 0, like * 0)] * nb
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt
    for i in range(1, nb):
      pid = int(m.body_parentid[i])
      pos = lm.vadd(xpos[pid], lm.qrot(xquat[pid], cv(c["body_pos"][i])))
      bq = c["body_quat"][i]
      quat = lm.qmul(xquat[pid],
                     (jnp.ones_like(like) * float(bq[0]),
                      jnp.ones_like(like) * float(bq[1]),
                      jnp.ones_like(like) * float(bq[2]),
                      jnp.ones_like(like) * float(bq[3])))
      ja = int(m.body_jntadr[i])
      for k in range(int(m.body_jntnum[i])):
        j = ja + k
        qadr = int(m.jnt_qposadr[j])
        anchor = lm.vadd(lm.qrot(quat, cv(c["jnt_pos"][j])), pos)
        axis = lm.qrot(quat, cv(c["jnt_axis"][j]))
        if int(m.jnt_type[j]) == SLIDE:
          disp = qpos[qadr] - float(c["qpos0"][qadr])
          pos = lm.vadd(pos, lm.vscale(axis, disp))
        else:  # HINGE
          angle = qpos[qadr] - float(c["qpos0"][qadr])
          qloc = lm.axis_angle_quat(cv(c["jnt_axis"][j]), angle)
          quat = lm.qmul(quat, qloc)
          pos = lm.vsub(anchor, lm.qrot(quat, cv(c["jnt_pos"][j])))
        xanchor[j] = anchor
        xaxis[j] = axis
      xpos[i] = pos
      xquat[i] = quat

    # ---- com quantities ----
    xipos = [lm.vadd(xpos[i], lm.qrot(xquat[i], cv(c["body_ipos"][i])))
             for i in range(nb)]
    # subtree com of the whole tree root (single root assumed per chain)
    # reference point per body: subtree com of its root
    sub_sum = [lm.vscale(xipos[i], float(c["body_mass"][i]))
               for i in range(nb)]
    for i in range(nb - 1, 0, -1):
      pid = int(m.body_parentid[i])
      sub_sum[pid] = lm.vadd(sub_sum[pid], sub_sum[i])
    subtree_com = [lm.vscale(sub_sum[i],
                             1.0 / max(float(c["body_subtreemass"][i]),
                                       1e-12))
                   for i in range(nb)]
    ref = [subtree_com[int(m.body_rootid[i])] for i in range(nb)]

    # packed spatial inertia about ref (I 3x3 entries, h, mass)
    def inertia_of(i):
      iq = c["body_iquat"][i]
      quat = lm.qmul(xquat[i],
                     (jnp.ones_like(like) * float(iq[0]),
                      jnp.ones_like(like) * float(iq[1]),
                      jnp.ones_like(like) * float(iq[2]),
                      jnp.ones_like(like) * float(iq[3])))
      # R columns = rotated basis vectors
      e0 = lm.qrot(quat, cv([1, 0, 0]))
      e1 = lm.qrot(quat, cv([0, 1, 0]))
      e2 = lm.qrot(quat, cv([0, 0, 1]))
      di = c["body_inertia"][i]
      # I = sum_k d_k e_k e_k^T
      rows = [[like * 0.0] * 3 for _ in range(3)]
      for dk, ek in zip(di, (e0, e1, e2)):
        for a in range(3):
          for b in range(3):
            rows[a][b] = rows[a][b] + float(dk) * ek[a] * ek[b]
      mass = float(c["body_mass"][i])
      d = lm.vsub(xipos[i], ref[i])
      d2 = lm.vdot(d, d)
      for a in range(3):
        rows[a][a] = rows[a][a] + mass * d2
        for b in range(3):
          rows[a][b] = rows[a][b] - mass * d[a] * d[b]
      hvec = lm.vscale(d, mass)
      return rows, hvec, mass

    cinert = [inertia_of(i) for i in range(nb)]

    # cdof per dof
    cdof = []
    for j in range(m.njnt):
      bid = int(m.jnt_bodyid[j])
      if int(m.jnt_type[j]) == SLIDE:
        cdof.append((cv([0, 0, 0]), xaxis[j]))
      else:
        offset = lm.vsub(ref[bid], xanchor[j])
        cdof.append((xaxis[j], lm.vcross(xaxis[j], offset)))

    def imul(inert, mot):
      """Spatial inertia times motion -> force (component form)."""
      rows, hvec, mass = inert
      w, v = mot
      iw = tuple(rows[a][0] * w[0] + rows[a][1] * w[1] + rows[a][2] * w[2]
                 for a in range(3))
      torque = lm.vadd(iw, lm.vcross(hvec, v))
      force = lm.vsub(lm.vscale(v, mass), lm.vcross(hvec, w))
      return (torque, force)

    # ---- CRB mass matrix ----
    crb = [cinert[i] for i in range(nb)]
    for i in range(nb - 1, 0, -1):
      pid = int(m.body_parentid[i])
      if pid > 0:
        r0, h0, m0 = crb[pid]
        r1, h1, m1 = crb[i]
        crb[pid] = ([[r0[a][b] + r1[a][b] for b in range(3)]
                     for a in range(3)], lm.vadd(h0, h1), m0 + m1)

    anc = m.dof_ancestor_mask
    mrows = [[like * 0.0] * nv for _ in range(nv)]
    for i in range(nv):
      f = imul(crb[int(m.dof_bodyid[i])], cdof[i])
      for j in range(nv):
        if anc[i, j] or anc[j, i]:
          val = lm.vdot(f[0], cdof[j][0]) + lm.vdot(f[1], cdof[j][1])
          if j <= i:
            mrows[i][j] = val
            mrows[j][i] = val
      mrows[i][i] = mrows[i][i] + float(c["dof_armature"][i])

    # ---- velocities + RNE bias ----
    cvel = [(cv([0, 0, 0]), cv([0, 0, 0]))] * nb
    cdof_dot = [None] * nv
    for i in range(1, nb):
      pid = int(m.body_parentid[i])
      v = cvel[pid]
      da = int(m.body_dofadr[i])
      for k in range(int(m.body_dofnum[i])):
        n = da + k
        # hinge/slide: cdof_dot = v_before x cdof (motion cross)
        w1, v1 = v
        w2, v2 = cdof[n]
        cdof_dot[n] = (lm.vcross(w1, w2),
                       lm.vadd(lm.vcross(w1, v2), lm.vcross(v1, w2)))
        v = (lm.vadd(v[0], lm.vscale(cdof[n][0], qvel[n])),
             lm.vadd(v[1], lm.vscale(cdof[n][1], qvel[n])))
      cvel[i] = v

    grav = c["gravity"]
    cacc = [(cv([0, 0, 0]),
             cv([-grav[0], -grav[1], -grav[2]]))] * 1 + \
        [None] * (nb - 1)
    for i in range(1, nb):
      pid = int(m.body_parentid[i])
      a = cacc[pid]
      da = int(m.body_dofadr[i])
      for k in range(int(m.body_dofnum[i])):
        n = da + k
        a = (lm.vadd(a[0], lm.vscale(cdof_dot[n][0], qvel[n])),
             lm.vadd(a[1], lm.vscale(cdof_dot[n][1], qvel[n])))
      cacc[i] = a

    cfrc = [None] * nb
    for i in range(1, nb):
      iv = imul(cinert[i], cvel[i])
      ia = imul(cinert[i], cacc[i])
      w, v = cvel[i]
      # force cross: (w x t + v x f, w x f)
      fc = (lm.vadd(lm.vcross(w, iv[0]), lm.vcross(v, iv[1])),
            lm.vcross(w, iv[1]))
      cfrc[i] = (lm.vadd(ia[0], fc[0]), lm.vadd(ia[1], fc[1]))
    for i in range(nb - 1, 0, -1):
      pid = int(m.body_parentid[i])
      if pid > 0:
        cfrc[pid] = (lm.vadd(cfrc[pid][0], cfrc[i][0]),
                     lm.vadd(cfrc[pid][1], cfrc[i][1]))

    qfrc_bias = [lm.vdot(cdof[i][0], cfrc[int(m.dof_bodyid[i])][0]) +
                 lm.vdot(cdof[i][1], cfrc[int(m.dof_bodyid[i])][1])
                 for i in range(nv)]

    # ---- passive + actuation ----
    qfrc = [like * 0.0 for _ in range(nv)]
    for j in range(m.njnt):
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      stiff = float(c["jnt_stiffness"][j])
      qfrc[dadr] = qfrc[dadr] - stiff * (
          qpos[qadr] - float(c["qpos_spring"][qadr]))
    for i in range(nv):
      qfrc[i] = qfrc[i] - float(c["dof_damping"][i]) * qvel[i]

    for u in range(nu):
      tid = int(m.actuator_trnid[u, 0])
      dadr = int(m.jnt_dofadr[tid])
      qadr = int(m.jnt_qposadr[tid])
      gear = float(c["gear"][u][0])
      uin = ctrl[u]
      if c["ctrllimited"][u]:
        uin = jnp.clip(uin, float(c["ctrlrange"][u][0]),
                       float(c["ctrlrange"][u][1]))
      length = qpos[qadr] * gear
      velocity = qvel[dadr] * gear
      gp = c["gainprm"][u]
      if int(c["gaintype"][u]) == GAIN_FIXED:
        gain = float(gp[0])
      else:
        gain = float(gp[0]) + float(gp[1]) * length + \
            float(gp[2]) * velocity
      force = gain * uin
      if int(c["biastype"][u]) != BIAS_NONE:
        bp = c["biasprm"][u]
        force = force + float(bp[0]) + float(bp[1]) * length + \
            float(bp[2]) * velocity
      qfrc[dadr] = qfrc[dadr] + gear * force

    rhs = [qfrc[i] - qfrc_bias[i] for i in range(nv)]

    # ---- joint-limit constraint solve (scalar joints) ----
    # rows J = +e (lower) / -e (upper); Newton on the one-sided quadratic
    # penalty (physics/constraint.py semantics, component form)
    limited = [j for j in range(m.njnt) if m.jnt_limited[j]]
    qfrc_constraint = [like * 0.0 for _ in range(nv)]
    if limited:
      rows = []  # (dof, sign, pos, aref, D) with runtime pos/aref/D
      for j in limited:
        qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
        solimp = c["jnt_solimp"][j]
        tc, dr = float(c["jnt_solref"][j][0]), float(c["jnt_solref"][j][1])
        dmax = float(np.clip(solimp[1], 1e-4, 0.9999))
        b_coef = 2.0 / max(dmax * tc, 1e-12)
        k_coef = 1.0 / max(dmax * dmax * tc * tc * dr * dr, 1e-12)
        margin = float(c["jnt_margin"][j])
        invw = float(c["dof_invweight0"][dadr])
        d0i = float(np.clip(solimp[0], 1e-4, 0.9999))
        width = max(float(solimp[2]), 1e-12)
        mid = float(np.clip(solimp[3], 1e-4, 0.9999))
        power = max(float(solimp[4]), 1.0)
        for sign in (1.0, -1.0):
          if sign > 0:
            pos = qpos[qadr] - float(c["jnt_range"][j][0]) - margin
          else:
            pos = float(c["jnt_range"][j][1]) - qpos[qadr] - margin
          # impedance polynomial (mju_makeImpedance)
          x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
          a_c = 1.0 / mid ** (power - 1.0)
          b_c = 1.0 / (1.0 - mid) ** (power - 1.0)
          y = jnp.where(x <= mid, a_c * x ** power,
                        1.0 - b_c * (1.0 - x) ** power)
          imp = jnp.clip(d0i + y * (dmax - d0i), 1e-4, 0.9999)
          jv = sign * qvel[dadr]
          aref = -b_coef * jv - k_coef * imp * pos
          r_reg = jnp.maximum((1.0 - imp) / imp * invw, 1e-12)
          dcoef = jnp.where(pos < 0, 1.0 / r_reg, like * 0.0)
          rows.append((dadr, sign, aref, dcoef))

      # Newton iterations on qacc (a): H = M + J^T D_act J (diag adds)
      a0 = lm.chol_solve_sym(mrows, rhs)  # qacc_smooth
      a = list(a0)
      for _ in range(3):
        grad = [like * 0.0 for _ in range(nv)]
        hdiag = [like * 0.0 for _ in range(nv)]
        # M (a - a0)
        ma = [sum(mrows[i][j] * (a[j] - a0[j]) for j in range(nv))
              for i in range(nv)]
        for dadr, sign, aref, dcoef in rows:
          jar = sign * a[dadr] - aref
          act = dcoef * (jar < 0)
          grad[dadr] = grad[dadr] + sign * act * jar
          hdiag[dadr] = hdiag[dadr] + act
        hrows = [[mrows[i][j] + (hdiag[i] if i == j else 0.0)
                  for j in range(nv)] for i in range(nv)]
        gtot = [ma[i] + grad[i] for i in range(nv)]
        step = lm.chol_solve_sym(hrows, gtot)
        a = [a[i] - step[i] for i in range(nv)]
      for dadr, sign, aref, dcoef in rows:
        jar = sign * a[dadr] - aref
        act = dcoef * (jar < 0)
        qfrc_constraint[dadr] = qfrc_constraint[dadr] - sign * act * jar
      rhs = [rhs[i] + qfrc_constraint[i] for i in range(nv)]

    # ---- implicit-damping Euler ----
    for i in range(nv):
      mrows[i][i] = mrows[i][i] + h * float(c["dof_damping"][i])
    qacc = lm.chol_solve_sym(mrows, rhs)
    qvel_new = [qvel[i] + h * qacc[i] for i in range(nv)]
    qpos_new = list(qpos)
    for j in range(m.njnt):
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      qpos_new[qadr] = qpos_new[qadr] + h * qvel_new[dadr]
    return qpos_new, qvel_new

  def kernel(qpos_ref, qvel_ref, values_ref, out_ref):
    qpos = [qpos_ref[i, :] for i in range(nq)]
    qvel = [qvel_ref[i, :] for i in range(nv)]
    for t in range(horizon):
      for i in range(nq):
        out_ref[t, i, :] = qpos[i]
      for i in range(nv):
        out_ref[t, nq + i, :] = qvel[i]
      node = node_of_step[t]
      ctrl = [values_ref[node * nu + u, :] for u in range(nu)]
      qpos, qvel = step_body(qpos, qvel, ctrl)

  @jax.jit
  def rollout(qpos0, qvel0, values):
    k = qpos0.shape[-1]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((horizon, nq + nv, k), qpos0.dtype),
        interpret=interpret,
    )(qpos0, qvel0, values)

  return rollout
