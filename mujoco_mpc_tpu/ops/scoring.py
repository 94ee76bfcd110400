"""Fused trajectory-scoring Pallas kernel.

Computes per-candidate total returns from stacked residuals in ONE pass:
residual slice -> norm -> weight -> sum terms -> risk transform -> mean
over horizon, without materializing the (K, T, nterm) intermediates XLA
produces for the unfused jnp version.

Supports the norms used by the benchmark tasks (quadratic, L2, smooth-abs);
other norms fall back to the jnp reference path in `score`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mujoco_mpc_tpu.costs import norms

_SUPPORTED = {
    int(norms.NormType.QUADRATIC),
    int(norms.NormType.L2),
    int(norms.NormType.SMOOTH_ABS),
}


def _score_kernel(spec_static, t_hor, res_ref, w_ref, out_ref):
  """residuals (T, nr, Kb) + weights (nterm,) -> returns (Kb,)."""
  total = jnp.zeros(out_ref.shape, out_ref.dtype)
  for t in range(t_hor):
    step_cost = jnp.zeros(out_ref.shape, out_ref.dtype)
    for k, (ntype, off, dim, p0) in enumerate(spec_static):
      x = res_ref[t, off:off + dim, :]  # (dim, Kb)
      if ntype == int(norms.NormType.QUADRATIC):
        y = 0.5 * jnp.sum(x * x, axis=0)
      elif ntype == int(norms.NormType.L2):
        y = jnp.sqrt(jnp.sum(x * x, axis=0) + p0 * p0) - p0
      else:  # SMOOTH_ABS
        y = jnp.sum(jnp.sqrt(x * x + p0 * p0) - p0, axis=0)
      step_cost = step_cost + w_ref[k] * y
    total = total + step_cost
  out_ref[...] = total / t_hor


def score_fused(residuals: jax.Array, cost_spec,
                interpret: bool = False) -> jax.Array:
  """Fused scoring; residuals (K, T, nr) -> returns (K,).

  Falls back to the jnp path for unsupported norm types or non-neutral
  risk.
  """
  if (any(int(t) not in _SUPPORTED for t in cost_spec.norm_types)
      or abs(float(jax.device_get(cost_spec.risk))) > 1e-6):
    return jnp.mean(cost_spec.cost(residuals), axis=-1)

  k, t_hor, nr = residuals.shape
  spec_static = []
  off = 0
  for i, ntype in enumerate(cost_spec.norm_types):
    p0 = float(jax.device_get(cost_spec.norm_params[i, 0]))
    spec_static.append((int(ntype), off, cost_spec.dims[i], p0))
    off += cost_spec.dims[i]

  res_t = jnp.moveaxis(residuals, 0, -1)  # (T, nr, K): candidates on lanes
  out = pl.pallas_call(
      functools.partial(_score_kernel, tuple(spec_static), t_hor),
      out_shape=jax.ShapeDtypeStruct((k,), residuals.dtype),
      interpret=interpret,
  )(res_t, cost_spec.weights)
  return out


def score_reference(residuals: jax.Array, cost_spec) -> jax.Array:
  """jnp reference: mean over horizon of the spec cost."""
  return jnp.mean(cost_spec.cost(residuals), axis=-1)
