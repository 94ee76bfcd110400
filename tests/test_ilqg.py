"""iLQG tests: LQR ground truth + task convergence (reference pattern:
mjpc/test/ilqg_planner/ilqg_test.cc compares gains against analytic LQR)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.planners import ilqg
from mujoco_mpc_tpu.tasks import registry


def test_boxqp_unconstrained_matches_solve():
  rng = np.random.default_rng(0)
  nu = 4
  a = rng.standard_normal((nu, nu))
  quu = jnp.asarray(a @ a.T + nu * np.eye(nu), jnp.float32)
  qu = jnp.asarray(rng.standard_normal(nu), jnp.float32)
  lo = jnp.full((nu,), -100.0)
  hi = jnp.full((nu,), 100.0)
  du, free, _ = ilqg._boxqp(quu, qu, lo, hi, iters=8)
  expect = -np.linalg.solve(np.asarray(quu), np.asarray(qu))
  np.testing.assert_allclose(du, expect, atol=1e-4)
  assert bool(jnp.all(free))


def test_boxqp_clamps_at_bounds():
  quu = jnp.eye(2)
  qu = jnp.asarray([-5.0, 0.3])
  lo = jnp.asarray([-1.0, -1.0])
  hi = jnp.asarray([1.0, 1.0])
  du, free, _ = ilqg._boxqp(quu, qu, lo, hi, iters=8)
  np.testing.assert_allclose(du, [1.0, -0.3], atol=1e-5)
  assert not bool(free[0]) and bool(free[1])


def test_backward_pass_matches_lqr():
  """On an LTI system with quadratic cost, gains must equal Riccati LQR."""
  rng = np.random.default_rng(1)
  nx, nu, t_hor = 4, 2, 20
  a_m = np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
  b_m = 0.1 * rng.standard_normal((nx, nu))
  q = np.eye(nx)
  r = 0.5 * np.eye(nu)

  a = jnp.tile(jnp.asarray(a_m, jnp.float32)[None], (t_hor - 1, 1, 1))
  b = jnp.tile(jnp.asarray(b_m, jnp.float32)[None], (t_hor - 1, 1, 1))
  cx = jnp.zeros((t_hor, nx), jnp.float32)
  cu = jnp.zeros((t_hor, nu), jnp.float32)
  cxx = jnp.tile(jnp.asarray(q, jnp.float32)[None], (t_hor, 1, 1))
  cxu = jnp.zeros((t_hor, nx, nu), jnp.float32)
  cuu = jnp.tile(jnp.asarray(r, jnp.float32)[None], (t_hor, 1, 1))
  lo = jnp.full((t_hor - 1, nu), -1e9)
  hi = jnp.full((t_hor - 1, nu), 1e9)

  ks, kmats, dv, ok = ilqg.backward_pass(
      a, b, cx, cu, cxx, cxu, cuu, lo, hi, reg=jnp.asarray(0.0),
      boxqp_iters=8)
  assert bool(ok)

  # analytic discrete-time Riccati
  p = q.copy()
  k_ref = None
  for t in range(t_hor - 2, -1, -1):
    quu = r + b_m.T @ p @ b_m
    qux = b_m.T @ p @ a_m
    k_ref = -np.linalg.solve(quu, qux)
    p = q + a_m.T @ p @ a_m + a_m.T @ p @ b_m @ k_ref
    p = 0.5 * (p + p.T)
  np.testing.assert_allclose(kmats[0], k_ref, rtol=1e-3, atol=1e-3)


def test_ilqg_cartpole_improves():
  task = registry.get_task("Cartpole")
  config = ilqg.ILQGConfig(horizon=40, num_alphas=6)
  planner = ilqg.ILQGPlanner(task, config)
  # start off the exact bottom (gradient of cos vanishes at q = pi)
  d0 = task.make_data()
  d0 = d0.replace(qpos=d0.qpos.at[1].set(2.4))
  key = jax.random.PRNGKey(0)
  rets = []
  for i in range(10):
    info = planner.optimize(key, d0)
    rets.append(float(info["best_return"]))
  assert all(np.isfinite(rets))
  assert rets[-1] < rets[0], rets


def test_derivative_skip_interpolation():
  """skip>1 evaluates a subset and interpolates (model_derivatives.cc:57-72
  parity); interpolated Jacobians must stay close to exact on a smooth
  trajectory."""
  from mujoco_mpc_tpu.planners import derivatives as deriv
  from mujoco_mpc_tpu.physics import forward as F
  task = registry.get_task("Cartpole")
  m = task.model
  d0 = F.forward(m, task.make_data())
  t_hor = 9
  states = jnp.tile(jnp.concatenate([d0.qpos, d0.qvel, d0.act])[None],
                    (t_hor, 1))
  states = states + 0.01 * jnp.arange(t_hor)[:, None]
  actions = jnp.zeros((t_hor, m.nu))
  times = 0.01 * jnp.arange(t_hor)
  a1, b1 = deriv.model_derivatives(m, d0, states, actions, times, skip=1)
  a3, b3 = deriv.model_derivatives(m, d0, states, actions, times, skip=3)
  assert a3.shape == a1.shape and b3.shape == b1.shape
  np.testing.assert_allclose(a3, a1, atol=0.02)


def test_state_snapshot_threadsafe():
  from mujoco_mpc_tpu.agent.state import State
  from mujoco_mpc_tpu.physics import forward as F
  task = registry.get_task("Cartpole")
  d = F.forward(task.model, task.make_data())
  st = State(task.model.nq, task.model.nv, task.model.na)
  st.set(d)
  state, mocap, userdata, t = st.copy_to()
  np.testing.assert_allclose(state[:2], np.asarray(d.qpos), atol=1e-6)
