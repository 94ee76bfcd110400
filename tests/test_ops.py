"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import cholesky


@pytest.mark.parametrize("n,k", [(4, 128), (18, 128), (7, 256)])
def test_chol_solve_lanes_matches_reference(n, k):
  rng = np.random.default_rng(0)
  g = rng.standard_normal((k, n, n))
  a = np.einsum("kij,klj->kil", g, g) + n * np.eye(n)[None]
  a = jnp.asarray(np.moveaxis(a, 0, -1), jnp.float32)  # (n, n, K)
  b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)

  x = cholesky.chol_solve_lanes(a, b, interpret=True)
  ref = cholesky.chol_solve_reference(a, b)
  np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)


def test_score_fused_matches_reference():
  from mujoco_mpc_tpu.ops import scoring
  from mujoco_mpc_tpu.tasks import registry
  task = registry.get_task("Quadruped Flat")
  rng = np.random.default_rng(0)
  k, t, nr = 16, 8, task.cost_spec.num_residual
  residuals = jnp.asarray(rng.standard_normal((k, t, nr)), jnp.float32)
  fused = scoring.score_fused(residuals, task.cost_spec, interpret=True)
  ref = scoring.score_reference(residuals, task.cost_spec)
  np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-4)
