"""Smooth inverse dynamics: applied generalized force from (q, v, a).

Equivalent of mj_inverse for the smooth pipeline:
qfrc_inverse = M(q) a + bias(q, v) - passive(q, v).
(Constraint-force recovery is handled separately by the Direct optimizer's
force residual; the reference uses mj_inverse the same way,
docs/DIRECT.md:12-63.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import kinematics as K
from mujoco_mpc_tpu.physics import smooth as S
from mujoco_mpc_tpu.physics.model import Data, Model


def inverse(m: Model, d: Data, qacc: jax.Array) -> jax.Array:
  """Generalized applied force producing qacc at (qpos, qvel)."""
  d = K.kinematics(m, d)
  d = K.com_pos(m, d)
  d = S.crb(m, d)
  d = K.com_vel(m, d)
  d = S.rne(m, d)
  d = S.passive(m, d)
  return d.qM @ qacc + d.qfrc_bias - d.qfrc_passive
