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


def _lqr_inputs(rng, nx=4, nu=2, t_hor=20):
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
  return (a_m, b_m, q, r), (a, b, cx, cu, cxx, cxu, cuu)


@pytest.mark.parametrize("reg_type", [ilqg.REG_CONTROL,
                                      ilqg.REG_STATE_CONTROL,
                                      ilqg.REG_VALUE, ilqg.REG_NONE])
def test_backward_pass_all_reg_types_match_lqr_at_zero_mu(reg_type):
  """All four regularization modes (backward_pass.cc:116-153) collapse to
  the same LQR gains at mu -> 0."""
  rng = np.random.default_rng(3)
  (a_m, b_m, q, r), packed = _lqr_inputs(rng)
  t_hor = 20
  nu = 2
  lo = jnp.full((t_hor - 1, nu), -1e9)
  hi = jnp.full((t_hor - 1, nu), 1e9)
  ks, kmats, dv, ok = ilqg.backward_pass(
      *packed, lo, hi, reg=jnp.asarray(1e-8), boxqp_iters=8,
      reg_type=reg_type)
  assert bool(ok)
  p = q.copy()
  for t in range(t_hor - 2, -1, -1):
    quu = r + b_m.T @ p @ b_m
    qux = b_m.T @ p @ a_m
    k_ref = -np.linalg.solve(quu, qux)
    p = q + a_m.T @ p @ a_m + a_m.T @ p @ b_m @ k_ref
    p = 0.5 * (p + p.T)
  np.testing.assert_allclose(kmats[0], k_ref, rtol=2e-3, atol=2e-3)


def test_boxqp_active_constraint_zeroes_gain_rows():
  """Clamped control dims must carry ZERO feedback gain rows while free
  dims match the reduced LQR solve (backward_pass.cc:176-194)."""
  quu = jnp.asarray([[2.0, 0.1], [0.1, 1.0]], jnp.float32)
  qu = jnp.asarray([-10.0, 0.2], jnp.float32)   # dim 0 wants du >> upper
  lo = jnp.asarray([-1.0, -1.0])
  hi = jnp.asarray([1.0, 1.0])
  du, free, solve = ilqg._boxqp(quu, qu, lo, hi, iters=8)
  assert float(du[0]) == 1.0 and not bool(free[0]) and bool(free[1])
  qux = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float32)
  kmat = -solve(free, qux)
  np.testing.assert_allclose(kmat[0], np.zeros(3), atol=1e-7)
  # free row solves the 1x1 reduced system: -qux[1] / quu[1,1]
  np.testing.assert_allclose(kmat[1], -np.asarray(qux)[1] / 1.0, atol=1e-4)


def test_surprise_regularization_schedule():
  """UpdateRegularization semantics (backward_pass.cc:327-356)."""
  reg = jnp.asarray(1.0)
  rate = jnp.asarray(1.0)
  # sufficient improvement -> decrease
  r2, _ = ilqg.update_regularization(reg, rate, 10.0, 1e-6, 1e6,
                                     jnp.asarray(1.0), jnp.asarray(1.0))
  assert float(r2) < 1.0
  # insufficient improvement -> increase
  r3, _ = ilqg.update_regularization(reg, rate, 10.0, 1e-6, 1e6,
                                     jnp.asarray(0.0), jnp.asarray(0.0))
  assert float(r3) > 1.0
  # NaN improvement -> strong increase (factor^2)
  r4, _ = ilqg.update_regularization(reg, rate, 10.0, 1e-6, 1e6,
                                     jnp.asarray(jnp.nan), jnp.asarray(1.0))
  assert float(r4) >= float(r3)
  # middle band -> unchanged
  r5, _ = ilqg.update_regularization(reg, rate, 10.0, 1e-6, 1e6,
                                     jnp.asarray(0.3), jnp.asarray(0.2))
  assert float(r5) == 1.0
  # rate compounds across consecutive increases
  rega, ratea = ilqg.scale_regularization(reg, rate, 10.0, 1e-6, 1e6)
  regb, rateb = ilqg.scale_regularization(rega, ratea, 10.0, 1e-6, 1e6)
  assert float(regb) == pytest.approx(1000.0)  # 1 * 10 * 100


@pytest.mark.slow
def test_feedback_beats_feedforward_under_disturbance():
  """Time-indexed feedback gains must reject a state disturbance better
  than replaying the feedforward actions (the point of the iLQG policy,
  ilqg/policy.cc:82-140; round-1 gap: gains were dead code in the loop)."""
  from mujoco_mpc_tpu.physics import forward as F
  task = registry.get_task("Cartpole")
  config = ilqg.ILQGConfig(horizon=40, num_alphas=6)
  planner = ilqg.ILQGPlanner(task, config)
  m = task.model
  # plan about upright (stabilization regime where LQR-like gains shine)
  d0 = task.make_data()
  d0 = d0.replace(qpos=d0.qpos.at[1].set(0.15))
  key = jax.random.PRNGKey(0)
  for _ in range(8):
    planner.optimize(key, d0)

  # execute from a PERTURBED start, with and without state feedback
  step = jax.jit(lambda d: F.step(m, d))

  def run(use_feedback):
    d = d0.replace(qpos=d0.qpos.at[1].set(0.35),
                   qvel=d0.qvel.at[1].set(0.4))
    total = 0.0
    for _ in range(35):
      state = jnp.concatenate([d.qpos, d.qvel, d.act])
      u = planner.action(d.time, state=state if use_feedback else None)
      d = step(d.replace(ctrl=u))
      r = task.residual(m, F.forward(m, d), task.residual_params)
      total += float(task.cost(r))
    return total

  cost_ff = run(False)
  cost_fb = run(True)
  assert cost_fb < cost_ff, (cost_fb, cost_ff)


@pytest.mark.slow
def test_agent_passes_state_to_feedback_planners():
  from mujoco_mpc_tpu.agent import agent as agent_lib
  task = registry.get_task("Cartpole")
  agent = agent_lib.Agent(task, planner="iLQG")
  assert agent._planner_takes_state
  agent.plan_iteration()
  u = agent.action()   # exercises the state-passing path
  assert np.all(np.isfinite(np.asarray(u)))


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


@pytest.mark.slow
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
