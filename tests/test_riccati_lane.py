"""Pallas Riccati/boxQP backward-pass kernel vs the XLA scan.

ops/riccati_lane.py re-implements planners.ilqg.backward_pass as one
Pallas program (interpret mode here). Parity must hold bitwise-ish
(1e-4) across regularization types and with ACTIVE control limits so
the masked Gauss-Jordan free-set algebra is exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import riccati_lane
from mujoco_mpc_tpu.planners import ilqg as ilqg_lib


def _random_problem(T, ndx, nu, seed, tight_limits):
  rng = np.random.default_rng(seed)
  f = jnp.float32
  a = jnp.asarray(
      np.eye(ndx) + 0.05 * rng.standard_normal((T - 1, ndx, ndx)), f)
  b = jnp.asarray(0.1 * rng.standard_normal((T - 1, ndx, nu)), f)
  cx = jnp.asarray(0.3 * rng.standard_normal((T, ndx)), f)
  cu = jnp.asarray(0.3 * rng.standard_normal((T, nu)), f)
  w = rng.standard_normal((T, ndx, ndx))
  cxx = jnp.asarray(np.einsum("tij,tkj->tik", w, w) / ndx
                    + 0.5 * np.eye(ndx), f)
  cxu = jnp.asarray(0.05 * rng.standard_normal((T, ndx, nu)), f)
  wu = rng.standard_normal((T, nu, nu))
  cuu = jnp.asarray(np.einsum("tij,tkj->tik", wu, wu) / nu
                    + 0.5 * np.eye(nu), f)
  lim = 0.05 if tight_limits else 5.0
  lo = jnp.full((T - 1, nu), -lim, f)
  hi = jnp.full((T - 1, nu), lim, f)
  return a, b, cx, cu, cxx, cxu, cuu, lo, hi


@pytest.mark.parametrize("reg_type", [ilqg_lib.REG_CONTROL,
                                      ilqg_lib.REG_STATE_CONTROL,
                                      ilqg_lib.REG_VALUE,
                                      ilqg_lib.REG_NONE])
@pytest.mark.parametrize("tight_limits", [False, True])
def test_riccati_kernel_matches_xla(reg_type, tight_limits):
  T, ndx, nu, iters = 6, 7, 3, 6
  prob = _random_problem(T, ndx, nu, seed=reg_type * 2 + tight_limits,
                         tight_limits=tight_limits)
  reg = jnp.float32(1e-2)
  ks_ref, km_ref, dv_ref, ok_ref = ilqg_lib.backward_pass(
      *prob, reg, iters, reg_type)
  kern = riccati_lane.build_backward_kernel(
      ndx, nu, T, iters, reg_type, interpret=True)
  ks, km, dv, ok = kern(*prob, reg)
  assert ks.shape == ks_ref.shape and km.shape == km_ref.shape
  np.testing.assert_allclose(np.asarray(ks), np.asarray(ks_ref),
                             atol=1e-4, rtol=1e-3)
  np.testing.assert_allclose(np.asarray(km), np.asarray(km_ref),
                             atol=1e-4, rtol=1e-3)
  np.testing.assert_allclose(float(dv[0]), float(dv_ref[0]),
                             atol=1e-4, rtol=1e-3)
  np.testing.assert_allclose(float(dv[1]), float(dv_ref[1]),
                             atol=1e-4, rtol=1e-3)
  assert bool(ok) == bool(ok_ref)


@pytest.mark.parametrize("ndx,nu", [(36, 12), (54, 21)])
def test_riccati_kernel_robot_sizes(ndx, nu):
  """Quadruped-class (ndx=36, nu=12) and humanoid-class (ndx=54, nu=21)
  shapes through the generalized padding (nus=16/24, nxs=40/56)."""
  T, iters = 5, 4
  assert riccati_lane.supports(ndx, nu, T)
  prob = _random_problem(T, ndx, nu, seed=7 * ndx + nu,
                         tight_limits=True)
  reg = jnp.float32(1e-2)
  ks_ref, km_ref, dv_ref, ok_ref = ilqg_lib.backward_pass(
      *prob, reg, iters, ilqg_lib.REG_CONTROL)
  kern = riccati_lane.build_backward_kernel(
      ndx, nu, T, iters, ilqg_lib.REG_CONTROL, interpret=True)
  ks, km, dv, ok = kern(*prob, reg)
  np.testing.assert_allclose(np.asarray(ks), np.asarray(ks_ref),
                             atol=2e-4, rtol=1e-3)
  np.testing.assert_allclose(np.asarray(km), np.asarray(km_ref),
                             atol=2e-4, rtol=1e-3)
  np.testing.assert_allclose(float(dv[0]), float(dv_ref[0]),
                             atol=2e-4, rtol=1e-3)
  assert bool(ok) == bool(ok_ref)


def test_riccati_kernel_clamping_fires():
  """With tight limits some k entries must sit exactly on the bounds
  and the corresponding K rows must be zero (backward_pass.cc:158-217
  free-set semantics)."""
  T, ndx, nu, iters = 6, 7, 3, 6
  prob = _random_problem(T, ndx, nu, seed=99, tight_limits=True)
  kern = riccati_lane.build_backward_kernel(
      ndx, nu, T, iters, ilqg_lib.REG_CONTROL, interpret=True)
  ks, km, _, ok = kern(*prob, jnp.float32(1e-2))
  assert bool(ok)
  ks = np.asarray(ks)
  km = np.asarray(km)
  on_bound = np.isclose(np.abs(ks), 0.05, atol=1e-6)
  assert on_bound.any(), "expected clamped actions with tight limits"
  # zero feedback rows exactly where k is clamped
  assert np.allclose(km[on_bound], 0.0, atol=1e-6)
