"""Task cost specification parsed from MJCF conventions.

Follows the reference's XML conventions exactly (reference: mjpc/task.cc:
147-245) so task files carry the same information:
  * leading `<sensor><user .../>` entries define cost terms; their `user`
    attribute is [norm_type, weight, weight_lo, weight_hi, params...];
  * `<custom><numeric name="residual_X" data=".."/>` define residual params;
  * `task_risk` custom numeric sets the exponential risk transform
    (e^{R*cost}-1)/R (reference task.cc:104-109).

The spec's static structure (term dims, norm types, param counts) is parsed
host-side; weights/params live on device so they can be updated at runtime
without recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_mpc_tpu.costs import norms

RISK_NEUTRAL_TOL = 1e-6


def get_number_or_default(mjm, name: str, default):
  """Read a custom numeric scalar (reference GetNumberOrDefault)."""
  try:
    import mujoco
    for i in range(mjm.nnumeric):
      if mjm.numeric(i).name == name:
        return float(mjm.numeric_data[mjm.numeric_adr[i]])
  except Exception:
    pass
  return default


def get_numeric_data(mjm, name: str) -> Optional[np.ndarray]:
  for i in range(mjm.nnumeric):
    if mjm.numeric(i).name == name:
      adr, size = mjm.numeric_adr[i], mjm.numeric_size[i]
      return np.array(mjm.numeric_data[adr:adr + size])
  return None


@struct.dataclass
class CostSpec:
  """Weighted sum of norms over residual slices (+ risk transform)."""
  # static structure
  term_names: tuple = struct.field(pytree_node=False)
  norm_types: tuple = struct.field(pytree_node=False)   # tuple[int]
  dims: tuple = struct.field(pytree_node=False)         # residual dims
  # device parameters (runtime-tunable)
  weights: jax.Array = None         # (nterm,)
  norm_params: jax.Array = None     # (nterm, 3) padded
  risk: jax.Array = None            # scalar

  @property
  def num_term(self) -> int:
    return len(self.norm_types)

  @property
  def num_residual(self) -> int:
    return sum(self.dims)

  def cost_terms(self, residual: jax.Array,
                 weighted: bool = True) -> jax.Array:
    """Per-term costs; residual (..., num_residual) -> (..., nterm)."""
    outs = []
    off = 0
    for k in range(self.num_term):
      x = residual[..., off:off + self.dims[k]]
      y = norms.norm_value(x, self.norm_types[k], self.norm_params[k])
      outs.append(self.weights[k] * y if weighted else y)
      off += self.dims[k]
    return jnp.stack(outs, axis=-1)

  def cost(self, residual: jax.Array) -> jax.Array:
    """Total (risk-transformed) cost; (..., num_residual) -> (...)."""
    c = jnp.sum(self.cost_terms(residual), axis=-1)
    # both branches must be NaN-free (jnp.where grad flows through both)
    neutral = jnp.abs(self.risk) < RISK_NEUTRAL_TOL
    risk_safe = jnp.where(neutral, 1.0, self.risk)
    risked = (jnp.exp(risk_safe * c) - 1.0) / risk_safe
    return jnp.where(neutral, c, risked)

  def cost_grad_hess(self, residual: jax.Array):
    """Gauss-Newton expansion wrt residual: (grad, hess) per term assembled
    into full (num_residual,) grad and (num_residual, num_residual) Hessian
    (block-diagonal over terms), with risk-sensitive scaling when risk != 0
    (reference cost_derivatives.cc:161-224: for l_r = (e^{R c}-1)/R,
    grad_r = e^{R c} grad, hess_r = e^{R c}(hess + R grad grad^T))."""
    nr = self.num_residual
    grad = jnp.zeros(residual.shape[:-1] + (nr,), residual.dtype)
    hess = jnp.zeros(residual.shape[:-1] + (nr, nr), residual.dtype)
    off = 0
    for k in range(self.num_term):
      dim = self.dims[k]
      x = residual[..., off:off + dim]
      g = norms.norm_grad(x, self.norm_types[k], self.norm_params[k])
      h = norms.norm_hess_diag(x, self.norm_types[k], self.norm_params[k])
      grad = grad.at[..., off:off + dim].set(self.weights[k] * g)
      hess = hess.at[..., off:off + dim, off:off + dim].set(
          self.weights[k][..., None] * h)
      off += dim

    neutral = jnp.abs(self.risk) < RISK_NEUTRAL_TOL
    risk_safe = jnp.where(neutral, 1.0, self.risk)
    c = jnp.sum(self.cost_terms(residual), axis=-1)
    scale = jnp.exp(risk_safe * c)
    grad_r = scale[..., None] * grad
    hess_r = scale[..., None, None] * (
        hess + risk_safe * grad[..., :, None] * grad[..., None, :])
    grad = jnp.where(neutral, grad, grad_r)
    hess = jnp.where(neutral, hess, hess_r)
    return grad, hess

  def set_weight(self, name: str, value) -> "CostSpec":
    idx = self.term_names.index(name)
    return self.replace(weights=self.weights.at[idx].set(value))


def parse_cost_spec(mjm, dtype=jnp.float32) -> CostSpec:
  """Build a CostSpec from leading user sensors of a mujoco.MjModel."""
  import mujoco

  names, ntypes, dims, weights, params = [], [], [], [], []
  for i in range(mjm.nsensor):
    if mjm.sensor_type[i] != mujoco.mjtSensor.mjSENS_USER:
      break
    s = mjm.sensor_user[i]
    names.append(mjm.sensor(i).name)
    ntypes.append(int(s[0]))
    dims.append(int(mjm.sensor_dim[i]))
    weights.append(float(s[1]))
    npar = norms.num_norm_params(int(s[0]))
    pvec = np.zeros(3)
    pvec[:npar] = s[4:4 + npar]
    params.append(pvec)

  risk = get_number_or_default(mjm, "task_risk", 0.0)
  return CostSpec(
      term_names=tuple(names),
      norm_types=tuple(ntypes),
      dims=tuple(dims),
      weights=jnp.asarray(weights, dtype),
      norm_params=jnp.asarray(np.array(params), dtype),
      risk=jnp.asarray(risk, dtype),
  )


def parse_residual_params(mjm, dtype=jnp.float32) -> jax.Array:
  """Concatenate `residual_*` custom numerics (reference task.cc:38-64)."""
  # each residual_* numeric contributes its FIRST value (the rest are GUI
  # slider ranges, reference task.cc:38-64)
  vals = []
  for i in range(mjm.nnumeric):
    name = mjm.numeric(i).name
    if name.startswith("residual_"):
      vals.append(mjm.numeric_data[mjm.numeric_adr[i]])
  return jnp.asarray(np.array(vals) if vals else np.zeros(0), dtype)
