"""Sensor-style derived quantities used by task residuals.

Equivalents of the MuJoCo sensors the reference tasks read via
SensorByName: framepos/framelinvel (from kinematics fields), subtreelinvel
(mj_subtreeVel), subtreeangmom, body velocities (mj_objectVelocity).
All are pure functions of (Model, Data-after-com_vel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model


def body_velocity(m: Model, d: Data, bodyid: int):
  """(linear, angular) world-frame velocity of a body at its com (xipos)."""
  ref = d.subtree_com[m.body_rootid[bodyid]]
  ang = d.cvel[bodyid, :3]
  lin = d.cvel[bodyid, 3:] + jnp.cross(ang, d.xipos[bodyid] - ref)
  return lin, ang


def point_velocity(m: Model, d: Data, bodyid: int,
                   point: jax.Array) -> jax.Array:
  """World-frame linear velocity of a world-coordinates point on a body."""
  ref = d.subtree_com[m.body_rootid[bodyid]]
  ang = d.cvel[bodyid, :3]
  return d.cvel[bodyid, 3:] + jnp.cross(ang, point - ref)


def site_velocity(m: Model, d: Data, siteid: int) -> jax.Array:
  return point_velocity(m, d, int(m.site_bodyid[siteid]),
                        d.site_xpos[siteid])


def _subtree_ids(m: Model, root: int):
  ids = [i for i in range(m.nbody)
         if _is_descendant(m, i, root)]
  return np.array(ids, dtype=np.int32)


def _is_descendant(m: Model, i: int, root: int) -> bool:
  while i > 0:
    if i == root:
      return True
    i = int(m.body_parentid[i])
  return root == 0


def subtree_linvel(m: Model, d: Data, root: int) -> jax.Array:
  """Mass-weighted average linear velocity of the subtree (subtreelinvel)."""
  ids = _subtree_ids(m, root)
  lins = []
  masses = []
  for b in ids:
    lin, _ = body_velocity(m, d, int(b))
    lins.append(lin * m.body_mass[b])
    masses.append(m.body_mass[b])
  total_mass = sum(masses)
  return sum(lins) / jnp.maximum(total_mass, 1e-12)


def subtree_com_of(m: Model, d: Data, root: int) -> jax.Array:
  return d.subtree_com[root]


def subtree_angmom(m: Model, d: Data, root: int) -> jax.Array:
  """Angular momentum of the subtree about its com (subtreeangmom)."""
  ids = _subtree_ids(m, root)
  c = d.subtree_com[root]
  vc = subtree_linvel(m, d, root)
  total = jnp.zeros(3, d.qpos.dtype)
  for b in ids:
    b = int(b)
    lin, ang = body_velocity(m, d, b)
    # orbital term
    r = d.xipos[b] - c
    total = total + m.body_mass[b] * jnp.cross(r, lin - vc)
    # spin term: R diag(I) R^T w in world frame
    rot = mm.quat_to_mat(mm.mul_quat(d.xquat[b], m.body_iquat[b]))
    iw = rot @ (m.body_inertia[b] * (rot.T @ ang))
    total = total + iw
  return total


# ---------------------------------------------------------------------------
# General sensor evaluation (subset of mjSENS_* used by tasks/estimators)
# ---------------------------------------------------------------------------

_SENS_TOUCH = 0
_SENS_ACCELEROMETER = 1
_SENS_VELOCIMETER = 2
_SENS_GYRO = 3
_SENS_JOINTPOS = 9
_SENS_JOINTVEL = 10
_SENS_TENDONPOS = 11
_SENS_TENDONVEL = 12
_SENS_ACTUATORPOS = 13
_SENS_ACTUATORVEL = 14
_SENS_ACTUATORFRC = 15
_SENS_FRAMEPOS = 22
_SENS_FRAMEQUAT = 23
_SENS_FRAMEXAXIS = 24
_SENS_FRAMEYAXIS = 25
_SENS_FRAMEZAXIS = 26
_SENS_FRAMELINVEL = 27
_SENS_FRAMEANGVEL = 28
_SENS_SUBTREECOM = 31
_SENS_SUBTREELINVEL = 32
_SENS_SUBTREEANGMOM = 33

# mjOBJ ids for frame sensors
_OBJ_BODY = 1
_OBJ_XBODY = 2
_OBJ_JOINT = 3
_OBJ_SITE = 6
_OBJ_GEOM = 5


def make_sensor_fn(mjm, skip_user: bool = True):
  """Build a pure function (Model, Data) -> sensordata from mjModel specs.

  Supports the sensor types the reference tasks/estimators rely on
  (jointpos/jointvel, frame*, subtree*, gyro, velocimeter). User sensors
  (cost terms) are skipped by default — residuals are native JAX functions.
  Unsupported types contribute zeros (and are reported in `unsupported`).
  """
  import mujoco
  specs = []
  unsupported = []
  for i in range(mjm.nsensor):
    stype = int(mjm.sensor_type[i])
    if skip_user and stype == int(mujoco.mjtSensor.mjSENS_USER):
      continue
    specs.append((stype, int(mjm.sensor_objtype[i]),
                  int(mjm.sensor_objid[i]), int(mjm.sensor_dim[i]),
                  i))

  def frame_pos_mat(m, d, objtype, objid):
    if objtype in (_OBJ_BODY,):
      return d.xipos[objid], d.ximat[objid], int(m.body_rootid[objid] * 0 +
                                                 objid)
    if objtype == _OBJ_XBODY:
      return d.xpos[objid], d.xmat[objid], objid
    if objtype == _OBJ_SITE:
      return d.site_xpos[objid], d.site_xmat[objid], int(
          m.site_bodyid[objid])
    if objtype == _OBJ_GEOM:
      return d.geom_xpos[objid], d.geom_xmat[objid], int(
          m.geom_bodyid[objid])
    raise ValueError(f"frame objtype {objtype}")

  def sensor_fn(m, d):
    import jax.numpy as jnp
    out = []
    for stype, objtype, objid, dim, idx in specs:
      if stype == _SENS_JOINTPOS:
        out.append(d.qpos[int(m.jnt_qposadr[objid])][None])
      elif stype == _SENS_JOINTVEL:
        out.append(d.qvel[int(m.jnt_dofadr[objid])][None])
      elif stype == _SENS_TENDONPOS:
        out.append(d.ten_length[objid][None])
      elif stype == _SENS_TENDONVEL:
        out.append((d.ten_J[objid] @ d.qvel)[None])
      elif stype == _SENS_ACTUATORPOS:
        out.append(d.actuator_length[objid][None])
      elif stype == _SENS_ACTUATORVEL:
        out.append(d.actuator_velocity[objid][None])
      elif stype == _SENS_ACTUATORFRC:
        out.append(d.actuator_force[objid][None])
      elif stype == _SENS_FRAMEPOS:
        p, _, _ = frame_pos_mat(m, d, objtype, objid)
        out.append(p)
      elif stype == _SENS_FRAMEQUAT:
        _, mat, _ = frame_pos_mat(m, d, objtype, objid)
        # rotation matrix -> quaternion (w,x,y,z)
        out.append(_mat_to_quat(mat))
      elif stype in (_SENS_FRAMEXAXIS, _SENS_FRAMEYAXIS, _SENS_FRAMEZAXIS):
        _, mat, _ = frame_pos_mat(m, d, objtype, objid)
        out.append(mat[:, stype - _SENS_FRAMEXAXIS])
      elif stype == _SENS_FRAMELINVEL:
        p, _, bid = frame_pos_mat(m, d, objtype, objid)
        out.append(point_velocity(m, d, bid, p))
      elif stype == _SENS_FRAMEANGVEL:
        _, _, bid = frame_pos_mat(m, d, objtype, objid)
        out.append(d.cvel[bid, :3])
      elif stype == _SENS_SUBTREECOM:
        out.append(d.subtree_com[objid])
      elif stype == _SENS_SUBTREELINVEL:
        out.append(subtree_linvel(m, d, objid))
      elif stype == _SENS_SUBTREEANGMOM:
        out.append(subtree_angmom(m, d, objid))
      elif stype == _SENS_GYRO:
        # site-frame angular velocity
        bid = int(m.site_bodyid[objid])
        w = d.cvel[bid, :3]
        out.append(d.site_xmat[objid].T @ w)
      elif stype == _SENS_VELOCIMETER:
        bid = int(m.site_bodyid[objid])
        v = point_velocity(m, d, bid, d.site_xpos[objid])
        out.append(d.site_xmat[objid].T @ v)
      else:
        unsupported.append(stype)
        out.append(jnp.zeros(dim, d.qpos.dtype))
    if not out:
      return jnp.zeros(0, d.qpos.dtype)
    return jnp.concatenate(out)

  return sensor_fn


def _mat_to_quat(mat):
  """Rotation matrix -> unit quaternion (w,x,y,z), stable branchless form."""
  m00, m01, m02 = mat[0, 0], mat[0, 1], mat[0, 2]
  m10, m11, m12 = mat[1, 0], mat[1, 1], mat[1, 2]
  m20, m21, m22 = mat[2, 0], mat[2, 1], mat[2, 2]
  tr = m00 + m11 + m22
  qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2
  qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2
  qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2
  qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2
  qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
  qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
  qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
  q = jnp.stack([qw, qx, qy, qz])
  return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
