"""Inverse dynamics: applied generalized force from (q, v, a).

Full mj_inverse semantics (engine_inverse.c; the reference's Direct
optimizer consumes it for the force residual, docs/DIRECT.md:12-63):

    qfrc_inverse = M(q) a + bias(q, v) - passive(q, v)
                   - J(q)^T f_constraint(q, v, a)

The soft convex constraint model makes f_constraint an EXPLICIT function
of the given acceleration (constraint.efc_force_at), so inverse dynamics
needs no iterative solve — exactly the property mj_inverse exploits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import constraint as C
from mujoco_mpc_tpu.physics import kinematics as K
from mujoco_mpc_tpu.physics import smooth as S
from mujoco_mpc_tpu.physics.model import Data, Model


def inv_stages(m: Model, d: Data) -> Data:
  """Position+velocity pipeline stages shared with forward dynamics
  (everything except actuation/acceleration/solve)."""
  d = K.kinematics(m, d)
  d = K.com_pos(m, d)
  if m.ntendon:
    from mujoco_mpc_tpu.physics import tendon as T
    d = T.tendon(m, d)
  d = S.crb(m, d)
  d = C.make_constraint(m, d)
  d = K.com_vel(m, d)
  d = S.rne(m, d)
  d = S.passive(m, d)
  d = C.reference_constraint(m, d)
  return d


def inverse(m: Model, d: Data, qacc: jax.Array,
            smooth_only: bool = False) -> jax.Array:
  """Generalized applied force producing qacc at (qpos, qvel).

  smooth_only=True reproduces the old constraint-free behavior
  (M a + bias - passive) for models where constraints are absent or
  deliberately ignored.
  """
  d = inv_stages(m, d)
  tau = d.qM @ qacc + d.qfrc_bias - d.qfrc_passive
  if smooth_only or d.efc_J is None or d.efc_J.shape[0] == 0:
    return tau
  f = C.efc_force_at(d, qacc)
  return tau - d.efc_J.T @ f
