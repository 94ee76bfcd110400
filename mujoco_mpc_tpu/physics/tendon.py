"""Tendon lengths, moment arms, and passive tendon forces (mj_tendon).

Reference semantics: MuJoCo's mj_tendon computes, for every tendon, its
scalar length and its (nv,) moment-arm row (the Jacobian d length / d qpos
in tangent space). Fixed tendons are linear joint combinations; spatial
tendons are polylines through sites with optional pulley divisors. The
reference MPC tasks (hands, humanoids) drive these through tendon
transmissions and tendon springs/dampers/limits.

TPU notes: tendon counts are tiny (<= ~40), so the per-tendon loop unrolls
at trace time into gathers + a couple of (ntendon, nv) dense products —
vmap over candidates supplies the parallelism. Geom wrapping (sphere /
cylinder) is not implemented yet; models using it are rejected host-side
at put_model time with a clear error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import (WRAP_JOINT, WRAP_PULLEY,
                                          WRAP_SITE, Data, Model)


def supported(m: Model) -> bool:
  """True if every tendon uses only joint/site/pulley wrap objects."""
  if m.ntendon == 0:
    return True
  return bool(np.all(np.isin(m.wrap_type[:int(np.sum(m.tendon_num))],
                             (WRAP_JOINT, WRAP_PULLEY, WRAP_SITE))))


def _site_jacp(m: Model, d: Data, site: int) -> jax.Array:
  """Translational point Jacobian of a site: (nv, 3).

  cdof rows are (rot, trans) spatial vectors at subtree_com[root]; the
  point jacobian shifts the translation by omega x (p - com) and masks to
  the dofs supporting the site's body (mj_jacSite semantics).
  """
  bid = int(m.site_bodyid[site])
  p = d.site_xpos[site]
  ref = d.subtree_com[m.body_rootid[bid]]
  rot = d.cdof[:, :3]
  trans = d.cdof[:, 3:]
  jacp = trans + jnp.cross(rot, (p - ref)[None, :])
  mask = jnp.asarray(m.body_dof_mask[bid], d.qpos.dtype)
  return jacp * mask[:, None]


def tendon(m: Model, d: Data) -> Data:
  """Compute ten_length (ntendon,) and ten_J (ntendon, nv)."""
  if m.ntendon == 0:
    return d
  dtype = d.qpos.dtype
  nv = m.nv
  lengths = []
  jrows = []
  eps = 1e-12
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wtypes = [int(m.wrap_type[adr + i]) for i in range(num)]
    objid = [int(m.wrap_objid[adr + i]) for i in range(num)]
    prm = [float(m.wrap_prm_np[adr + i]) for i in range(num)]

    if wtypes and wtypes[0] == WRAP_JOINT:
      # fixed tendon: L = sum coef_i * qpos[joint_i] (scalar joints only)
      qadr = np.array([m.jnt_qposadr[j] for j in objid])
      dadr = np.array([m.jnt_dofadr[j] for j in objid])
      coef = jnp.asarray(np.array(prm), dtype)
      length = jnp.sum(coef * d.qpos[qadr])
      row = jnp.zeros(nv, dtype).at[dadr].add(coef)
      lengths.append(length)
      jrows.append(row)
      continue

    # spatial tendon: straight segments between consecutive sites,
    # scaled by the active pulley divisor
    length = jnp.zeros((), dtype)
    row = jnp.zeros(nv, dtype)
    divisor = 1.0
    prev_site = None
    for i in range(num):
      wt = wtypes[i]
      if wt == WRAP_PULLEY:
        divisor = max(prm[i], eps)
        prev_site = None  # pulley breaks the chain into branches
        continue
      assert wt == WRAP_SITE, (
          f"tendon {t}: wrap type {wt} (sphere/cylinder geom wrapping) "
          "not supported yet")
      s = objid[i]
      if prev_site is not None:
        p0 = d.site_xpos[prev_site]
        p1 = d.site_xpos[s]
        diff = p1 - p0
        dist = jnp.sqrt(jnp.sum(diff * diff) + eps)
        dirn = diff / dist
        length = length + dist / divisor
        j0 = _site_jacp(m, d, prev_site)   # (nv, 3)
        j1 = _site_jacp(m, d, s)
        row = row + ((j1 - j0) @ dirn) / divisor
      prev_site = s
    lengths.append(length)
    jrows.append(row)

  return d.replace(ten_length=jnp.stack(lengths),
                   ten_J=jnp.stack(jrows))


def passive_force(m: Model, d: Data) -> jax.Array:
  """Tendon spring + damper forces mapped to joint space (mj_passive's
  tendon section): spring engages outside the [low, high] deadband of
  tendon_lengthspring; damper is -damping * ten_velocity."""
  if m.ntendon == 0:
    return jnp.zeros(m.nv, d.qpos.dtype)
  lo = m.tendon_lengthspring[:, 0]
  hi = m.tendon_lengthspring[:, 1]
  length = d.ten_length
  displacement = jnp.where(length > hi, hi - length,
                           jnp.where(length < lo, lo - length, 0.0))
  frc_spring = m.tendon_stiffness * displacement
  vel = d.ten_J @ d.qvel
  frc_damper = -m.tendon_damping * vel
  return d.ten_J.T @ (frc_spring + frc_damper)
