"""Quaternion / rotation / spatial-vector algebra for the TPU physics engine.

All functions are pure JAX, shape-static, and written to be `vmap`/`jit`
friendly. Conventions follow MuJoCo:

  * quaternions are (w, x, y, z), unit norm, and rotate local -> world:
    ``x_world = rot(q) @ x_local`` (cf. mju_rotVecQuat).
  * spatial (6D) vectors are ordered (angular[3], linear[3]), expressed in the
    world frame at a stated point (MuJoCo's "c-frame" convention used by
    cvel/cdof/cinert; reference: mujoco mj_comPos / engine_core_smooth.c).

Reference semantics: MuJoCo engine mju_* quaternion helpers; no code is
translated — these are standard textbook formulas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def mul_quat(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product u * v."""
  w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
  w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def neg_quat(q: jax.Array) -> jax.Array:
  """Conjugate (inverse for unit quaternions)."""
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
  n = jnp.linalg.norm(q, axis=-1, keepdims=True)
  return jnp.where(n > eps, q / jnp.maximum(n, eps),
                   jnp.array([1.0, 0.0, 0.0, 0.0], dtype=q.dtype))


def rot_vec_quat(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (local -> world)."""
  w = q[..., 0:1]
  u = q[..., 1:4]
  # v' = v + 2*w*(u x v) + 2*u x (u x v)
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rot_vec_quat_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by q^{-1} (world -> local)."""
  return rot_vec_quat(neg_quat(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix (world-from-local)."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  r = jnp.stack(
      [
          1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
          2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
          2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
      ],
      axis=-1,
  )
  return r.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Quaternion for rotation of `angle` radians about unit `axis`."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q: jax.Array, omega_local: jax.Array,
                   dt: jax.Array) -> jax.Array:
  """Integrate unit quaternion by local-frame angular velocity for dt.

  Matches mju_quatIntegrate: q <- q * exp(omega*dt/2).
  """
  angle = jnp.linalg.norm(omega_local, axis=-1)
  # guard zero rotation
  safe = jnp.maximum(angle, 1e-12)
  axis = omega_local / safe[..., None]
  dq = axis_angle_to_quat(axis, angle * dt)
  return normalize_quat(mul_quat(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """3D tangent-space difference: velocity v s.t. qb * exp(v/2) = qa.

  Matches mju_subQuat(res, qa, qb): res = log(qb^-1 * qa), local frame.
  """
  qd = mul_quat(neg_quat(qb), qa)
  qd = normalize_quat(qd)
  # ensure shortest arc
  sign = jnp.where(qd[..., 0:1] < 0, -1.0, 1.0)
  qd = qd * sign
  sin_half = jnp.linalg.norm(qd[..., 1:4], axis=-1)
  cos_half = qd[..., 0]
  angle = 2.0 * jnp.arctan2(sin_half, cos_half)
  axis = qd[..., 1:4] / jnp.maximum(sin_half, 1e-12)[..., None]
  return axis * angle[..., None]


# ---------------------------------------------------------------------------
# Spatial (6D) algebra; vectors are (angular[3], linear[3])
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors: v x m (mju_crossMotion)."""
  va, vl = v[..., :3], v[..., 3:]
  ma, ml = m[..., :3], m[..., 3:]
  return jnp.concatenate(
      [jnp.cross(va, ma), jnp.cross(va, ml) + jnp.cross(vl, ma)], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial cross product motion x* force (mju_crossForce)."""
  va, vl = v[..., :3], v[..., 3:]
  ft, ff = f[..., :3], f[..., 3:]
  return jnp.concatenate(
      [jnp.cross(va, ft) + jnp.cross(vl, ff), jnp.cross(va, ff)], axis=-1)


def inert_mul(inert: jax.Array, m: jax.Array) -> jax.Array:
  """Multiply c-frame spatial inertia by a motion vector -> force vector.

  `inert` is packed as MuJoCo cinert: 10 values
  [I00 I11 I22 I01 I02 I12, h0 h1 h2, mass] where I is the 3x3 rotational
  inertia about the reference point and h = mass * (com - ref point).
  Force = [I w + h x v, m v - h x w] for motion (w, v).
  """
  w, v = m[..., :3], m[..., 3:]
  i00, i11, i22 = inert[..., 0], inert[..., 1], inert[..., 2]
  i01, i02, i12 = inert[..., 3], inert[..., 4], inert[..., 5]
  h = inert[..., 6:9]
  mass = inert[..., 9:10]
  iw = jnp.stack(
      [
          i00 * w[..., 0] + i01 * w[..., 1] + i02 * w[..., 2],
          i01 * w[..., 0] + i11 * w[..., 1] + i12 * w[..., 2],
          i02 * w[..., 0] + i12 * w[..., 1] + i22 * w[..., 2],
      ],
      axis=-1,
  )
  torque = iw + jnp.cross(h, v)
  force = mass * v - jnp.cross(h, w)
  return jnp.concatenate([torque, force], axis=-1)


def transform_inertia(mass: jax.Array, diag_inertia: jax.Array,
                      quat: jax.Array, offset: jax.Array) -> jax.Array:
  """Build packed c-frame spatial inertia (10,) for one body.

  Args:
    mass: scalar body mass.
    diag_inertia: (3,) principal moments about body com.
    quat: world-from-inertial-frame quaternion (xquat * body_iquat).
    offset: (3,) vector from reference point to body com (xipos - c).
  Returns packed [I(6 sym), h(3), m] about the reference point.
  """
  r = quat_to_mat(quat)
  ic = (r * diag_inertia[..., None, :]) @ jnp.swapaxes(r, -1, -2)
  # parallel axis: I_ref = I_com + m (d.d E - d d^T), with d = com - ref
  d = offset
  d2 = jnp.sum(d * d, axis=-1)[..., None, None]
  shift = mass[..., None, None] * (
      d2 * jnp.eye(3, dtype=ic.dtype) - d[..., :, None] * d[..., None, :])
  i_ref = ic + shift
  h = mass[..., None] * d
  return jnp.concatenate(
      [
          jnp.stack(
              [
                  i_ref[..., 0, 0], i_ref[..., 1, 1], i_ref[..., 2, 2],
                  i_ref[..., 0, 1], i_ref[..., 0, 2], i_ref[..., 1, 2],
              ],
              axis=-1,
          ),
          h,
          mass[..., None],
      ],
      axis=-1,
  )


def inert_add(a: jax.Array, b: jax.Array) -> jax.Array:
  """Sum of packed spatial inertias about the same reference point."""
  return a + b


# ---------------------------------------------------------------------------
# Misc small helpers
# ---------------------------------------------------------------------------


def closest_segment_point(a: jax.Array, b: jax.Array,
                          p: jax.Array) -> jax.Array:
  """Closest point to p on segment [a, b]."""
  ab = b - a
  denom = jnp.maximum(jnp.sum(ab * ab, axis=-1, keepdims=True), 1e-12)
  t = jnp.clip(jnp.sum((p - a) * ab, axis=-1, keepdims=True) / denom, 0.0, 1.0)
  return a + t * ab


def closest_segment_segment(a0: jax.Array, a1: jax.Array, b0: jax.Array,
                            b1: jax.Array) -> tuple[jax.Array, jax.Array]:
  """Closest points between segments [a0,a1] and [b0,b1] (approximate)."""
  da = a1 - a0
  db = b1 - b0
  r = a0 - b0
  aa = jnp.sum(da * da, axis=-1)
  bb = jnp.sum(db * db, axis=-1)
  ab = jnp.sum(da * db, axis=-1)
  ar = jnp.sum(da * r, axis=-1)
  br = jnp.sum(db * r, axis=-1)
  denom = jnp.maximum(aa * bb - ab * ab, 1e-12)
  t = jnp.clip((ab * br - bb * ar) / denom, 0.0, 1.0)
  u = jnp.clip((ab * t + br) / jnp.maximum(bb, 1e-12), 0.0, 1.0)
  t = jnp.clip((ab * u - ar) / jnp.maximum(aa, 1e-12), 0.0, 1.0)
  pa = a0 + t[..., None] * da
  pb = b0 + u[..., None] * db
  return pa, pb
