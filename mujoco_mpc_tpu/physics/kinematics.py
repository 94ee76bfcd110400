"""Forward kinematics and com-frame quantities.

Per-body loops unroll at trace time (tree metadata is static numpy); body
count is small for robotics models so this is cheap, and everything
vectorizes along the vmapped rollout axis.

Semantics match MuJoCo mj_kinematics / mj_comPos (validated against the C
library in tests/test_physics_oracle.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import (BALL, FREE, HINGE, SLIDE, Data,
                                          Model)


def kinematics(m: Model, d: Data) -> Data:
  """Body/geom/site frames from qpos (mj_kinematics semantics)."""
  dtype = d.qpos.dtype
  nb = m.nbody

  xpos = [jnp.zeros(3, dtype)] * nb
  xquat = [jnp.array([1.0, 0, 0, 0], dtype)] * nb
  xanchor = [jnp.zeros(3, dtype)] * m.njnt
  xaxis = [jnp.zeros(3, dtype)] * m.njnt

  for i in range(1, nb):
    pid = int(m.body_parentid[i])
    # mocap body: frame comes from mocap inputs
    mocapid = int(m.body_mocapid[i])
    if mocapid >= 0:
      xpos[i] = d.mocap_pos[mocapid]
      xquat[i] = mm.normalize_quat(d.mocap_quat[mocapid])
      continue

    pos = xpos[pid] + mm.rot_vec_quat(xquat[pid], m.body_pos[i])
    quat = mm.mul_quat(xquat[pid], m.body_quat[i])

    jntadr = int(m.body_jntadr[i])
    for k in range(int(m.body_jntnum[i])):
      j = jntadr + k
      jtype = int(m.jnt_type[j])
      qadr = int(m.jnt_qposadr[j])
      anchor = mm.rot_vec_quat(quat, m.jnt_pos[j]) + pos
      axis = mm.rot_vec_quat(quat, m.jnt_axis[j])
      if jtype == FREE:
        pos = d.qpos[qadr:qadr + 3]
        quat = mm.normalize_quat(d.qpos[qadr + 3:qadr + 7])
        anchor = pos
        axis = m.jnt_axis[j]  # global z for free joints (not rotated)
      elif jtype == BALL:
        qloc = mm.normalize_quat(d.qpos[qadr:qadr + 4])
        quat = mm.mul_quat(quat, qloc)
        pos = anchor - mm.rot_vec_quat(quat, m.jnt_pos[j])
      elif jtype == SLIDE:
        pos = pos + axis * (d.qpos[qadr] - m.qpos0[qadr])
      elif jtype == HINGE:
        angle = d.qpos[qadr] - m.qpos0[qadr]
        qloc = mm.axis_angle_to_quat(m.jnt_axis[j], angle)
        quat = mm.mul_quat(quat, qloc)
        pos = anchor - mm.rot_vec_quat(quat, m.jnt_pos[j])
      xanchor[j] = anchor
      xaxis[j] = axis
    xpos[i] = pos
    xquat[i] = mm.normalize_quat(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = mm.quat_to_mat(xquat)
  xanchor = jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype)
  xaxis = jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype)

  # inertial frames
  xipos = xpos + mm.rot_vec_quat(xquat, m.body_ipos)
  ximat = mm.quat_to_mat(mm.mul_quat(xquat, m.body_iquat))

  # geoms / sites
  bg = m.geom_bodyid
  geom_xpos = xpos[bg] + mm.rot_vec_quat(xquat[bg], m.geom_pos)
  geom_xmat = mm.quat_to_mat(mm.mul_quat(xquat[bg], m.geom_quat))
  bs = m.site_bodyid
  site_xpos = xpos[bs] + mm.rot_vec_quat(xquat[bs], m.site_pos)
  site_xmat = mm.quat_to_mat(mm.mul_quat(xquat[bs], m.site_quat))

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree com, c-frame spatial inertia, and dof axes (mj_comPos)."""
  dtype = d.qpos.dtype
  nb = m.nbody

  # subtree com: backward accumulation of mass-weighted body com
  mass_x = m.body_mass[:, None] * d.xipos  # (nb, 3)
  sub_sum = [mass_x[i] for i in range(nb)]
  sub_mass = [m.body_mass[i] for i in range(nb)]
  for i in range(nb - 1, 0, -1):
    pid = int(m.body_parentid[i])
    sub_sum[pid] = sub_sum[pid] + sub_sum[i]
    sub_mass[pid] = sub_mass[pid] + sub_mass[i]
  subtree_com = jnp.stack(
      [sub_sum[i] / jnp.maximum(sub_mass[i], 1e-15) for i in range(nb)])

  # c-frame reference point per body: subtree com of body's kinematic root
  ref = subtree_com[m.body_rootid]  # (nb, 3)

  # packed spatial inertia about ref, world orientation
  iquat_world = mm.mul_quat(d.xquat, m.body_iquat)
  cinert = mm.transform_inertia(
      m.body_mass, m.body_inertia, iquat_world, d.xipos - ref)
  # world body: zero
  cinert = cinert.at[0].set(jnp.zeros(10, dtype))

  # cdof: motion subspace per dof at body's c-frame point
  cdofs = []
  for j in range(m.njnt):
    jtype = int(m.jnt_type[j])
    bid = int(m.jnt_bodyid[j])
    c = ref[bid]
    offset = c - d.xanchor[j]
    if jtype == FREE:
      # 3 translational dofs (world axes)
      for k in range(3):
        e = jnp.zeros(3, dtype).at[k].set(1.0)
        cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), e]))
      # 3 rotational dofs: body-frame axes (MuJoCo free-joint ang vel is in
      # the child body frame after the translation dofs)
      for k in range(3):
        ax = d.xmat[bid][:, k]
        cdofs.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
    elif jtype == BALL:
      for k in range(3):
        ax = d.xmat[bid][:, k]
        cdofs.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
    elif jtype == SLIDE:
      cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), d.xaxis[j]]))
    elif jtype == HINGE:
      ax = d.xaxis[j]
      cdofs.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
  cdof = (jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), dtype))

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities and cdof time-derivatives (mj_comVel)."""
  dtype = d.qpos.dtype
  nb = m.nbody
  cvel = [jnp.zeros(6, dtype)] * nb
  cdof_dot = [jnp.zeros(6, dtype)] * m.nv

  for i in range(1, nb):
    pid = int(m.body_parentid[i])
    v = cvel[pid]
    dofadr = int(m.body_dofadr[i])
    # mj_comVel convention (verified numerically against the oracle):
    #  * slide/hinge dofs: cdof_dot = v_before_this_dof x cdof
    #  * ball dofs: all three use the velocity BEFORE the ball joint
    #  * free joints: translations have cdof_dot = 0; the three rotational
    #    dofs use the velocity including ONLY the translational dofs
    k = 0
    ndof = int(m.body_dofnum[i])
    while k < ndof:
      n = dofadr + k
      jtype = int(m.jnt_type[int(m.dof_jntid[n])])
      if jtype == FREE:
        # translations: zero cdof_dot
        for kk in range(3):
          v = v + d.cdof[dofadr + kk] * d.qvel[dofadr + kk]
        vpre = v
        for kk in range(3, 6):
          cdof_dot[dofadr + kk] = mm.motion_cross(vpre, d.cdof[dofadr + kk])
          v = v + d.cdof[dofadr + kk] * d.qvel[dofadr + kk]
        k += 6
      elif jtype == BALL:
        vpre = v
        for kk in range(3):
          cdof_dot[n + kk] = mm.motion_cross(vpre, d.cdof[n + kk])
          v = v + d.cdof[n + kk] * d.qvel[n + kk]
        k += 3
      else:
        cdof_dot[n] = mm.motion_cross(v, d.cdof[n])
        v = v + d.cdof[n] * d.qvel[n]
        k += 1
    cvel[i] = v

  cvel = jnp.stack(cvel)
  cdof_dot = (jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype))
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)
