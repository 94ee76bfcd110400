"""Component-tuple math for lane-parallel kernels.

In the candidates-on-lanes layout every scalar field of the physics state
is a (1, K) array (K candidates across the TPU lane/sublane axes). Vectors
and quaternions are python tuples of such arrays; all algebra below is
written component-wise so it lowers to pure VPU ops with zero layout
shuffling — the building blocks of the Pallas step kernel
(ops/step_lane.py).

Mirrors physics/math.py semantics (same conventions) on this layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Vec3 = tuple  # (x, y, z) of (1, K) arrays
Quat = tuple  # (w, x, y, z)


def v3(x, y, z) -> Vec3:
  return (x, y, z)


def vadd(a: Vec3, b: Vec3) -> Vec3:
  return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a: Vec3, b: Vec3) -> Vec3:
  return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(a: Vec3, s) -> Vec3:
  return (a[0] * s, a[1] * s, a[2] * s)


def vdot(a: Vec3, b: Vec3):
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a: Vec3, b: Vec3) -> Vec3:
  return (a[1] * b[2] - a[2] * b[1],
          a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0])


def qmul(u: Quat, v: Quat) -> Quat:
  w1, x1, y1, z1 = u
  w2, x2, y2, z2 = v
  return (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)


def qrot(q: Quat, v: Vec3) -> Vec3:
  """Rotate v by q (local -> world): v + 2 w (u x v) + 2 u x (u x v)."""
  w = q[0]
  u = (q[1], q[2], q[3])
  uv = vcross(u, v)
  t = vadd(vscale(uv, w), vcross(u, uv))
  return vadd(v, vscale(t, 2.0))


def axis_angle_quat(axis: Vec3, angle) -> Quat:
  half = 0.5 * angle
  s = jnp.sin(half)
  return (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)


def const_vec3(v, like) -> Vec3:
  """Broadcast a static numpy length-3 vector to the (1, K) layout."""
  ones = jnp.ones_like(like)
  return (ones * float(v[0]), ones * float(v[1]), ones * float(v[2]))


def chol_solve_packed(a, b, eps=1e-10):
  """Solve A x = b for symmetric PD A in PACKED lane layout.

  a: (n, n, K) — per-lane matrices with n on the sublane axes;
  b: (n, K). Returns x: (n, K).

  Column-at-a-time Cholesky on packed columns: O(n^2) traced ops total
  (each op engages n sublanes), vs O(n^3/6) scalar-component ops for
  `chol_solve_sym` — this is the round-2 "packed-row" rewrite that makes
  large-nv step kernels traceable and faster (ops/README.md roadmap #1).

  Internal detail: stored column j entries above the diagonal are
  garbage (never zeroed); all reads index at-or-below the diagonal.
  """
  n = b.shape[0]
  cols = []   # cols[j]: (n, K); cols[j][i] = L[i, j] for i >= j
  diag = []   # diag[j]: (K,) = L[j, j]
  for j in range(n):
    s = a[:, j]                       # (n, K)
    for k in range(j):
      s = s - cols[k] * cols[k][j][None, :]
    d = jnp.sqrt(jnp.maximum(s[j], eps))
    cols.append(s / d[None, :])
    diag.append(d)
  y = [None] * n
  for i in range(n):
    s = b[i]
    for k in range(i):
      s = s - cols[k][i] * y[k]
    y[i] = s / diag[i]
  x = [None] * n
  for i in range(n - 1, -1, -1):
    s = y[i]
    for k in range(i + 1, n):
      s = s - cols[i][k] * x[k]
    x[i] = s / diag[i]
  return jnp.stack(x)


def chol_solve_sym(a_rows, b):
  """Solve A x = b for symmetric PD A given as list-of-lists of (1, K)
  entries; b is a list of (1, K). Unrolled Cholesky, one candidate per
  lane (see ops/cholesky.py for the array-layout variant)."""
  n = len(b)
  l = [[None] * n for _ in range(n)]
  eps = 1e-10
  for j in range(n):
    s = a_rows[j][j]
    for k in range(j):
      s = s - l[j][k] * l[j][k]
    diag = jnp.sqrt(jnp.maximum(s, eps))
    l[j][j] = diag
    inv = 1.0 / diag
    for i in range(j + 1, n):
      s = a_rows[i][j]
      for k in range(j):
        s = s - l[i][k] * l[j][k]
      l[i][j] = s * inv
  y = [None] * n
  for i in range(n):
    s = b[i]
    for k in range(i):
      s = s - l[i][k] * y[k]
    y[i] = s / l[i][i]
  x = [None] * n
  for i in range(n - 1, -1, -1):
    s = y[i]
    for k in range(i + 1, n):
      s = s - l[k][i] * x[k]
    x[i] = s / l[i][i]
  return x


def atan2_nonneg(s, c):
  """atan2(s, c) for s, c >= 0 (result in [0, pi/2]).

  Pallas TPU has no inverse-trig lowering; range-reduce to [0, 1] and
  use the Abramowitz-Stegun 4.4.49 minimax polynomial (|err| <= 2e-8,
  below f32 rounding).
  """
  import jax.numpy as jnp
  lo = jnp.minimum(s, c)
  hi = jnp.maximum(s, c)
  x = lo / jnp.maximum(hi, 1e-12)
  x2 = x * x
  at = x * (0.9999993329 + x2 * (-0.3332985605 + x2 * (
      0.1994653599 + x2 * (-0.1390853351 + x2 * (
          0.0964200441 + x2 * (-0.0559098861 + x2 * (
              0.0218612288 + x2 * -0.0040540580)))))))
  return jnp.where(s <= c, at, jnp.pi / 2 - at)


def quat_sub_tangent(qa, qb):
  """3D tangent difference of component-form quaternions: the velocity v
  with qb * exp(v/2) = qa — mju_subQuat semantics, matching
  physics.math.quat_sub. qa/qb are 4-element lists of lane rows or
  scalars (broadcast-compatible). Returns [vx, vy, vz] rows.

  Inverse trig via atan2_nonneg (no lowering for arctan on Pallas TPU);
  after the shortest-arc sign fix both atan2 arguments are >= 0.
  """
  aw, ax, ay, az = qa
  bw, bx, by, bz = qb
  # qd = conj(qb) * qa (Hamilton product, physics/math.py:26-43)
  w = bw * aw + bx * ax + by * ay + bz * az
  x = bw * ax - bx * aw - by * az + bz * ay
  y = bw * ay + bx * az - by * aw - bz * ax
  z = bw * az - bx * ay + by * ax - bz * aw
  inv = jax.lax.rsqrt(jnp.maximum(w * w + x * x + y * y + z * z, 1e-24))
  sign = jnp.where(w < 0, -1.0, 1.0) * inv
  w, x, y, z = w * sign, x * sign, y * sign, z * sign
  sin_half = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 0.0))
  angle = 2.0 * atan2_nonneg(sin_half, w)
  s = angle / jnp.maximum(sin_half, 1e-12)
  return [x * s, y * s, z * s]
