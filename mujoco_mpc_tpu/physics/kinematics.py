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
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import (BALL, FREE, HINGE, SLIDE, Data,
                                          Model)


def kinematics(m: Model, d: Data) -> Data:
  """Body/geom/site frames from qpos (mj_kinematics semantics).

  Level-batched: bodies at the same tree depth with the same joint
  signature are processed in one vectorized group (a handful of batched
  quaternion ops per group instead of per-body unrolling).
  """
  dtype = d.qpos.dtype
  nb = m.nbody

  xpos = jnp.zeros((nb, 3), dtype)
  xquat = jnp.zeros((nb, 4), dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((max(m.njnt, 1), 3), dtype)
  xaxis = jnp.zeros((max(m.njnt, 1), 3), dtype)

  # mocap bodies (all at level 1 under world in practice; handled globally)
  mocap_bodies = np.where(m.body_mocapid >= 0)[0]
  if len(mocap_bodies):
    mid = m.body_mocapid[mocap_bodies]
    xpos = xpos.at[mocap_bodies].set(d.mocap_pos[mid])
    xquat = xquat.at[mocap_bodies].set(
        mm.normalize_quat(d.mocap_quat[mid]))

  for sig, bids in m.fk_groups:
    # skip mocap bodies (already placed)
    bids = np.array([b for b in bids if m.body_mocapid[b] < 0])
    if len(bids) == 0:
      continue
    pid = m.body_parentid[bids]
    pos = xpos[pid] + mm.rot_vec_quat(xquat[pid], m.body_pos[bids])
    quat = mm.mul_quat(xquat[pid], m.body_quat[bids])

    for k, jtype in enumerate(sig):
      j = m.body_jntadr[bids] + k               # (g,) joint ids
      qadr = m.jnt_qposadr[j]
      jpos = m.jnt_pos[j]
      jaxis = m.jnt_axis[j]
      anchor = mm.rot_vec_quat(quat, jpos) + pos
      axis = mm.rot_vec_quat(quat, jaxis)
      if jtype == FREE:
        qidx = qadr[:, None] + np.arange(7)[None]
        qfree = d.qpos[qidx]                    # (g, 7)
        pos = qfree[:, 0:3]
        quat = mm.normalize_quat(qfree[:, 3:7])
        anchor = pos
        axis = jaxis                            # global z, not rotated
      elif jtype == BALL:
        qidx = qadr[:, None] + np.arange(4)[None]
        qloc = mm.normalize_quat(d.qpos[qidx])
        quat = mm.mul_quat(quat, qloc)
        pos = anchor - mm.rot_vec_quat(quat, jpos)
      elif jtype == SLIDE:
        pos = pos + axis * (d.qpos[qadr] - m.qpos0[qadr])[:, None]
      elif jtype == HINGE:
        angle = d.qpos[qadr] - m.qpos0[qadr]
        qloc = mm.axis_angle_to_quat(jaxis, angle)
        quat = mm.mul_quat(quat, qloc)
        pos = anchor - mm.rot_vec_quat(quat, jpos)
      xanchor = xanchor.at[j].set(anchor)
      xaxis = xaxis.at[j].set(axis)
    xpos = xpos.at[bids].set(pos)
    xquat = xquat.at[bids].set(mm.normalize_quat(quat))

  xmat = mm.quat_to_mat(xquat)
  xanchor = xanchor[:m.njnt] if m.njnt else jnp.zeros((0, 3), dtype)
  xaxis = xaxis[:m.njnt] if m.njnt else jnp.zeros((0, 3), dtype)

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
  """Subtree com, c-frame spatial inertia, and dof axes (mj_comPos).

  Backward tree accumulations are expressed as static-mask matmuls
  (subtree_mask @ per-body quantities) — one MXU op instead of an unrolled
  reverse tree walk.
  """
  dtype = d.qpos.dtype
  nb = m.nbody

  stm = jnp.asarray(m.subtree_mask, dtype)
  mass_x = m.body_mass[:, None] * d.xipos  # (nb, 3)
  sub_sum = stm @ mass_x                   # (nb, 3)
  sub_mass = jnp.maximum(m.body_subtreemass, 1e-15)
  subtree_com = sub_sum / sub_mass[:, None]

  # c-frame reference point per body: subtree com of body's kinematic root
  ref = subtree_com[m.body_rootid]  # (nb, 3)

  # packed spatial inertia about ref, world orientation
  iquat_world = mm.mul_quat(d.xquat, m.body_iquat)
  cinert = mm.transform_inertia(
      m.body_mass, m.body_inertia, iquat_world, d.xipos - ref)
  # world body: zero
  cinert = cinert.at[0].set(jnp.zeros(10, dtype))

  # cdof: motion subspace per dof at body's c-frame point — vectorized per
  # joint type (static index maps, no per-joint unrolling)
  cdof = jnp.zeros((m.nv, 6), dtype)
  hinges = np.where(m.jnt_type == HINGE)[0]
  slides = np.where(m.jnt_type == SLIDE)[0]
  if len(hinges):
    dadr = m.jnt_dofadr[hinges]
    bid = m.jnt_bodyid[hinges]
    ax = d.xaxis[hinges]                       # (nh, 3)
    offset = ref[bid] - d.xanchor[hinges]
    rows = jnp.concatenate([ax, jnp.cross(ax, offset)], axis=-1)
    cdof = cdof.at[dadr].set(rows)
  if len(slides):
    dadr = m.jnt_dofadr[slides]
    ax = d.xaxis[slides]
    rows = jnp.concatenate([jnp.zeros_like(ax), ax], axis=-1)
    cdof = cdof.at[dadr].set(rows)
  balls = np.where(m.jnt_type == BALL)[0]
  if len(balls):
    bid = m.jnt_bodyid[balls]
    axes = jnp.swapaxes(d.xmat[bid], -1, -2)   # (nball, 3(axis), 3)
    offset = (ref[bid] - d.xanchor[balls])[:, None, :]
    rows = jnp.concatenate(
        [axes, jnp.cross(axes, jnp.broadcast_to(offset, axes.shape))],
        axis=-1)                               # (nball, 3, 6)
    didx = (m.jnt_dofadr[balls][:, None] + np.arange(3)[None]).reshape(-1)
    cdof = cdof.at[didx].set(rows.reshape(-1, 6))
  frees = np.where(m.jnt_type == FREE)[0]
  if len(frees):
    bid = m.jnt_bodyid[frees]
    dadr = m.jnt_dofadr[frees]
    tidx = (dadr[:, None] + np.arange(3)[None]).reshape(-1)
    eye_rows = jnp.tile(
        jnp.concatenate([jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)],
                        axis=-1), (len(frees), 1))
    cdof = cdof.at[tidx].set(eye_rows)
    axes = jnp.swapaxes(d.xmat[bid], -1, -2)
    offset = (ref[bid] - d.xanchor[frees])[:, None, :]
    rows = jnp.concatenate(
        [axes, jnp.cross(axes, jnp.broadcast_to(offset, axes.shape))],
        axis=-1)
    ridx = (dadr[:, None] + 3 + np.arange(3)[None]).reshape(-1)
    cdof = cdof.at[ridx].set(rows.reshape(-1, 6))

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities and cdof time-derivatives (mj_comVel).

  Fully vectorized: cvel[b] = sum of cdof_j * qvel_j over the dofs
  supporting b (one body_dof_mask matmul); cdof_dot_j = vpre_j x cdof_j
  where vpre_j = dof_pred_mask @ (cdof * qvel) encodes the mj_comVel
  convention (hinge/slide: all earlier path dofs; ball: path before the
  joint; free rotations: own translations; free translations: zero) —
  verified against the oracle in tests.
  """
  dtype = d.qpos.dtype
  cdof_qvel = d.cdof * d.qvel[:, None]                  # (nv, 6)
  bdm = jnp.asarray(m.body_dof_mask, dtype)             # (nb, nv)
  cvel = bdm @ cdof_qvel                                # (nb, 6)
  dpm = jnp.asarray(m.dof_pred_mask, dtype)             # (nv, nv)
  vpre = dpm @ cdof_qvel                                # (nv, 6)
  cdof_dot = mm.motion_cross(vpre, d.cdof)              # (nv, 6)
  zero_rows = jnp.asarray(m.dof_cdofdot_zero, dtype)[:, None]
  cdof_dot = cdof_dot * (1.0 - zero_rows)
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)
