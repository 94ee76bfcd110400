"""Residual norms with analytic gradient and Gauss-Newton Hessian.

Same 8-norm family as the reference cost model (reference: mjpc/norm.{h,cc}:
Null, Quadratic, L22, L2, Cosh, PowerLoss, SmoothAbs, SmoothAbs2, Rectify),
re-expressed as vectorized JAX ops batched over arbitrary leading axes.
Gradients/Hessians are validated against finite differences in
tests/test_norms.py (mirroring the reference's norm_test pattern).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

_EPS = 1e-15


class NormType(enum.IntEnum):
  """Values match the reference enum so task XMLs parse identically."""
  NULL = -1
  QUADRATIC = 0
  L22 = 1
  L2 = 2
  COSH = 3
  POWER_LOSS = 5
  SMOOTH_ABS = 6
  SMOOTH_ABS2 = 7
  RECTIFY = 8


def num_norm_params(norm_type: int) -> int:
  return {
      NormType.NULL: 0,
      NormType.QUADRATIC: 0,
      NormType.L22: 2,
      NormType.L2: 1,
      NormType.COSH: 1,
      NormType.POWER_LOSS: 1,
      NormType.SMOOTH_ABS: 1,
      NormType.SMOOTH_ABS2: 2,
      NormType.RECTIFY: 1,
  }[NormType(norm_type)]


def norm_value(x: jax.Array, norm_type: int, params: jax.Array) -> jax.Array:
  """Norm value; x has shape (..., n), returns (...)."""
  nt = NormType(norm_type)
  p = params[0] if params.shape[0] > 0 else jnp.zeros((), x.dtype)
  q = params[1] if params.shape[0] > 1 else jnp.zeros((), x.dtype)

  if nt == NormType.NULL:
    return x[..., 0]
  if nt == NormType.QUADRATIC:
    return 0.5 * jnp.sum(x * x, axis=-1)
  if nt == NormType.L22:
    c = jnp.sum(x * x, axis=-1)
    a = jnp.power(jnp.maximum(c, _EPS), q / 2) + jnp.power(p, q)
    return jnp.power(a, 1.0 / q) - p
  if nt == NormType.L2:
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p) - p
  if nt == NormType.COSH:
    return jnp.sum(p * p * (jnp.cosh(x / p) - 1.0), axis=-1)
  if nt == NormType.POWER_LOSS:
    return jnp.sum(jnp.power(jnp.abs(x), p), axis=-1)
  if nt == NormType.SMOOTH_ABS:
    return jnp.sum(jnp.sqrt(x * x + p * p) - p, axis=-1)
  if nt == NormType.SMOOTH_ABS2:
    a = jnp.abs(x)
    e = jnp.power(a, q) + jnp.power(p, q)
    return jnp.sum(jnp.power(e, 1.0 / q) - p, axis=-1)
  if nt == NormType.RECTIFY:
    # p > 0: softplus with temperature p; p == 0: relu
    def softplus(v):
      return p * jnp.log1p(jnp.exp(v / p))
    return jnp.sum(
        jnp.where(p > 0, p * jnp.log1p(jnp.exp(x / jnp.maximum(p, _EPS))),
                  jnp.maximum(x, 0.0)),
        axis=-1)
  raise ValueError(f"unknown norm {norm_type}")


def norm_grad(x: jax.Array, norm_type: int, params: jax.Array) -> jax.Array:
  """Analytic gradient dy/dx, shape (..., n)."""
  nt = NormType(norm_type)
  p = params[0] if params.shape[0] > 0 else jnp.zeros((), x.dtype)
  q = params[1] if params.shape[0] > 1 else jnp.zeros((), x.dtype)

  if nt == NormType.NULL:
    return jnp.ones_like(x)
  if nt == NormType.QUADRATIC:
    return x
  if nt == NormType.L22:
    c = jnp.sum(x * x, axis=-1, keepdims=True)
    cc = jnp.maximum(c, _EPS)
    a = jnp.power(cc, q / 2) + jnp.power(p, q)
    s = jnp.power(a, 1.0 / q)
    b = s / a * jnp.power(cc, q / 2 - 1.0)
    return b * x
  if nt == NormType.L2:
    s = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + p * p)
    return x / jnp.maximum(s, _EPS)
  if nt == NormType.COSH:
    return p * jnp.sinh(x / p)
  if nt == NormType.POWER_LOSS:
    a = jnp.maximum(jnp.abs(x), _EPS)
    return jnp.sign(x) * p * jnp.power(a, p - 1.0)
  if nt == NormType.SMOOTH_ABS:
    s = jnp.sqrt(x * x + p * p)
    return x / jnp.maximum(s, _EPS)
  if nt == NormType.SMOOTH_ABS2:
    a = jnp.maximum(jnp.abs(x), _EPS)
    dd = jnp.power(a, q)
    e = dd + jnp.power(p, q)
    s = jnp.power(e, 1.0 / q)
    c = s * jnp.power(a, q - 2.0) / e
    return c * x
  if nt == NormType.RECTIFY:
    s = jnp.exp(x / jnp.maximum(p, _EPS))
    return jnp.where(p > 0, s / (1.0 + s), (x > 0).astype(x.dtype))
  raise ValueError(f"unknown norm {norm_type}")


def norm_hess_diag(x: jax.Array, norm_type: int,
                   params: jax.Array) -> jax.Array:
  """Hessian for Gauss-Newton cost expansion.

  Most norms have (block-)diagonal Hessians; L2/L22 have rank-1 structure —
  we return the full (..., n, n) matrix for uniformity.
  """
  nt = NormType(norm_type)
  n = x.shape[-1]
  p = params[0] if params.shape[0] > 0 else jnp.zeros((), x.dtype)
  q = params[1] if params.shape[0] > 1 else jnp.zeros((), x.dtype)
  eye = jnp.eye(n, dtype=x.dtype)

  def diag(v):
    return v[..., :, None] * eye

  if nt == NormType.NULL:
    return jnp.zeros(x.shape + (n,), x.dtype)
  if nt == NormType.QUADRATIC:
    return jnp.broadcast_to(eye, x.shape + (n,))
  if nt == NormType.L22:
    c = jnp.sum(x * x, axis=-1, keepdims=True)
    cc = jnp.maximum(c, _EPS)
    d = jnp.power(cc, q / 2 - 1.0)
    a = jnp.power(cc, q / 2) + jnp.power(p, q)
    s = jnp.power(a, 1.0 / q)
    b = s / a * d
    coef = (1.0 - q) * d / a + (q - 2.0) / cc
    outer = x[..., :, None] * x[..., None, :]
    return b[..., None] * (eye + outer * coef[..., None])
  if nt == NormType.L2:
    s = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + p * p)
    g = x / jnp.maximum(s, _EPS)
    outer = g[..., :, None] * g[..., None, :]
    return (eye - outer) / jnp.maximum(s[..., None], _EPS)
  if nt == NormType.COSH:
    return diag(jnp.cosh(x / p))
  if nt == NormType.POWER_LOSS:
    a = jnp.maximum(jnp.abs(x), _EPS)
    return diag((p - 1.0) * p * jnp.power(a, p - 2.0))
  if nt == NormType.SMOOTH_ABS:
    s = jnp.sqrt(x * x + p * p)
    g = x / jnp.maximum(s, _EPS)
    return diag((1.0 - g * g) / jnp.maximum(s, _EPS))
  if nt == NormType.SMOOTH_ABS2:
    a = jnp.maximum(jnp.abs(x), _EPS)
    dd = jnp.power(a, q)
    e = dd + jnp.power(p, q)
    s = jnp.power(e, 1.0 / q)
    c = s * jnp.power(a, q - 2.0) / e
    return diag(c * (q - 1.0) * (1.0 - dd / e))
  if nt == NormType.RECTIFY:
    s = jnp.exp(x / jnp.maximum(p, _EPS))
    h = jnp.where(p > 0, s / (jnp.maximum(p, _EPS) * (1 + s)**2),
                  jnp.zeros_like(x))
    return diag(h)
  raise ValueError(f"unknown norm {norm_type}")
