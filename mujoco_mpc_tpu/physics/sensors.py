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
