"""Norm value/gradient/Hessian vs finite differences (reference norm_test
pattern, mjpc/test/agent/norm_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mujoco_mpc_tpu.costs import norms

CASES = [
    (norms.NormType.QUADRATIC, []),
    (norms.NormType.L22, [0.1, 2.0]),
    (norms.NormType.L2, [0.1]),
    (norms.NormType.COSH, [0.5]),
    (norms.NormType.POWER_LOSS, [2.5]),
    (norms.NormType.SMOOTH_ABS, [0.3]),
    (norms.NormType.SMOOTH_ABS2, [0.3, 2.2]),
    (norms.NormType.RECTIFY, [0.4]),
]


@pytest.mark.parametrize("norm_type,params", CASES)
def test_norm_grad_hess_vs_fd(norm_type, params):
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal(5), jnp.float64) \
      if jax.config.read("jax_enable_x64") else \
      jnp.asarray(rng.standard_normal(5), jnp.float32)
  p = jnp.asarray(np.array(params, dtype=np.float64), x.dtype)

  val = norms.norm_value(x, norm_type, p)
  assert np.isfinite(float(val))

  grad = norms.norm_grad(x, norm_type, p)
  grad_ad = jax.grad(lambda xx: norms.norm_value(xx, norm_type, p))(x)
  np.testing.assert_allclose(grad, grad_ad, rtol=1e-3, atol=1e-4)

  hess = norms.norm_hess_diag(x, norm_type, p)
  hess_ad = jax.hessian(lambda xx: norms.norm_value(xx, norm_type, p))(x)
  # Gauss-Newton Hessians for L22/POWER may deviate from exact AD Hessians
  # only through the scalar-chain terms we intentionally keep (these match
  # the reference's analytic formulas) — compare directly.
  np.testing.assert_allclose(hess, hess_ad, rtol=2e-3, atol=2e-3)


def test_norm_batched():
  x = jnp.ones((7, 4))
  p = jnp.asarray([0.1])
  v = norms.norm_value(x, norms.NormType.L2, p)
  assert v.shape == (7,)
  g = norms.norm_grad(x, norms.NormType.L2, p)
  assert g.shape == (7, 4)


def test_risk_sensitive_grad_matches_ad():
  """Risk-transformed cost gradient/Hessian vs autodiff of the transformed
  cost (reference cost_derivatives.cc risk scaling)."""
  from mujoco_mpc_tpu.costs import spec as spec_lib
  cs = spec_lib.CostSpec(
      term_names=("a", "b"), norm_types=(0, 6), dims=(2, 3),
      weights=jnp.asarray([1.5, 2.0]),
      norm_params=jnp.asarray([[0.0, 0, 0], [0.3, 0, 0]]),
      risk=jnp.asarray(0.7))
  rng = np.random.default_rng(0)
  r = jnp.asarray(rng.standard_normal(5), jnp.float32)
  g, h = cs.cost_grad_hess(r)
  g_ad = jax.grad(cs.cost)(r)
  np.testing.assert_allclose(g, g_ad, rtol=2e-3, atol=1e-4)
  h_ad = jax.hessian(cs.cost)(r)
  # GN Hessian drops the norm's second-order cross terms within terms but
  # keeps the risk outer product; compare diagonal blocks loosely
  np.testing.assert_allclose(h, h_ad, rtol=0.2, atol=0.05)
