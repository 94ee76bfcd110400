"""Banded Direct solve: block-tridiagonal factorization oracle tests and
banded-vs-dense optimizer parity (reference: direct.h:236-302 band
Hessian + mju_cholFactorBand; direct_optimize_test.cc convergence)."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.direct import banded as band_lib
from mujoco_mpc_tpu.direct.optimizer import Direct
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.tasks import registry


def _random_penta(rng, t_len, b):
  """Random SPD block-pentadiagonal system in nv-block band storage."""
  n = t_len * b
  j = rng.standard_normal((n + b, n)) * 0.3
  # zero out couplings beyond two blocks so H = J^T J is pentadiagonal
  for i in range(t_len):
    for k in range(t_len):
      if abs(i - k) > 1:
        pass
  # easier: build H directly from random blocks + diagonal dominance
  h = np.zeros((n, n))
  for i in range(t_len):
    d = rng.standard_normal((b, b))
    h[i * b:(i + 1) * b, i * b:(i + 1) * b] = d @ d.T + 5.0 * np.eye(b)
  for i in range(t_len - 1):
    o = 0.3 * rng.standard_normal((b, b))
    h[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = o
    h[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = o.T
  for i in range(t_len - 2):
    o = 0.2 * rng.standard_normal((b, b))
    h[i * b:(i + 1) * b, (i + 2) * b:(i + 3) * b] = o
    h[(i + 2) * b:(i + 3) * b, i * b:(i + 1) * b] = o.T
  d1 = np.stack([h[i * b:(i + 1) * b, i * b:(i + 1) * b]
                 for i in range(t_len)])
  o1 = np.stack([h[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b]
                 for i in range(t_len - 1)])
  o2 = np.stack([h[i * b:(i + 1) * b, (i + 2) * b:(i + 3) * b]
                 for i in range(t_len - 2)])
  return h, d1, o1, o2


def test_banded_solve_matches_dense_even_and_odd():
  rng = np.random.default_rng(0)
  for t_len in (6, 7):            # even and odd block counts
    b = 3
    h, d1, o1, o2 = _random_penta(rng, t_len, b)
    g = rng.standard_normal((t_len, b))
    dz, _ = jax.jit(band_lib.banded_gn_solve)(
        jnp.asarray(d1, jnp.float32), jnp.asarray(o1, jnp.float32),
        jnp.asarray(o2, jnp.float32), jnp.asarray(g, jnp.float32))
    x_ref = np.linalg.solve(h, -g.reshape(-1)).reshape(t_len, b)
    np.testing.assert_allclose(np.asarray(dz), x_ref, rtol=2e-3,
                               atol=2e-4)


def test_banded_solve_with_parameter_border():
  rng = np.random.default_rng(1)
  t_len, b, npar = 6, 3, 2
  h, d1, o1, o2 = _random_penta(rng, t_len, b)
  n = t_len * b
  p = 0.2 * rng.standard_normal((t_len, b, npar))
  q = np.eye(npar) * 4.0
  g = rng.standard_normal((t_len, b))
  g_th = rng.standard_normal(npar)

  full = np.zeros((n + npar, n + npar))
  full[:n, :n] = h
  full[:n, n:] = p.reshape(n, npar)
  full[n:, :n] = p.reshape(n, npar).T
  full[n:, n:] = q
  ref = np.linalg.solve(full, -np.concatenate([g.reshape(-1), g_th]))

  dz, dth = jax.jit(band_lib.banded_gn_solve)(
      jnp.asarray(d1, jnp.float32), jnp.asarray(o1, jnp.float32),
      jnp.asarray(o2, jnp.float32), jnp.asarray(g, jnp.float32),
      jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32),
      jnp.asarray(g_th, jnp.float32))
  np.testing.assert_allclose(np.asarray(dz).reshape(-1), ref[:n],
                             rtol=2e-3, atol=2e-4)
  np.testing.assert_allclose(np.asarray(dth), ref[n:], rtol=2e-3,
                             atol=2e-4)


def _cartpole_data(horizon, noise=0.05, seed=0):
  task = registry.get_task("Cartpole")
  m = task.model
  rng = np.random.default_rng(seed)
  sensor_fn = sensors_lib.make_sensor_fn(task.mjm)
  step = jax.jit(lambda d: F.step(m, d))
  fwd = jax.jit(lambda d: F.forward(m, d))
  d = task.make_data().replace(
      qpos=jnp.asarray([0.0, 2.0], jnp.float32))
  qs_true, ys, fs = [], [], []
  for t in range(horizon):
    u = np.asarray([0.3 * np.sin(0.2 * t)])
    d = d.replace(ctrl=jnp.asarray(u, jnp.float32))
    qs_true.append(np.asarray(d.qpos))
    df = fwd(d)
    ys.append(np.asarray(sensor_fn(m, df)))
    fs.append(np.asarray(df.qfrc_actuator))
    d = step(d)
  return task, np.array(qs_true), ys, fs, rng


def test_banded_optimizer_matches_dense():
  horizon = 12
  task, qs_true, ys, fs, rng = _cartpole_data(horizon)
  noisy = qs_true + 0.05 * rng.standard_normal(qs_true.shape)

  results = {}
  for banded in (False, True):
    direct = Direct(task, horizon, banded=banded)
    for t in range(horizon):
      direct.set_data(t, qpos=noisy[t], sensor=ys[t], force=fs[t])
    direct.set_weights(sensor=1e4, force=1.0)
    direct.optimize()
    results[banded] = (direct.qpos_optimized.copy(), direct.cost)

  # both paths solve the same GN problem; optima agree tightly
  np.testing.assert_allclose(results[True][0], results[False][0],
                             atol=5e-3)
  assert abs(results[True][1] - results[False][1]) < \
      0.05 * (abs(results[False][1]) + 1e-6)


def test_banded_t64_window_smooths():
  """Reference-scale T=64 window (direct.h uses nband=3*nv at T<=64,
  batch.h kMaxFilterHistory=64); memory here is band storage O(T*nv^2),
  not the dense path's O((T*nv)^2)."""
  horizon = 64
  task, qs_true, ys, fs, rng = _cartpole_data(horizon)
  noisy = qs_true + 0.05 * rng.standard_normal(qs_true.shape)

  direct = Direct(task, horizon)       # auto-selects banded at T >= 24
  assert direct.banded
  for t in range(horizon):
    direct.set_data(t, qpos=noisy[t], sensor=ys[t], force=fs[t])
  direct.set_weights(sensor=1e4, force=1.0)
  q_init_err = np.linalg.norm(direct.qpos_initial - qs_true)
  direct.optimize()
  q_err = np.linalg.norm(direct.qpos_optimized - qs_true)
  assert np.isfinite(direct.cost)
  assert direct.cost < direct.cost_initial
  assert q_err < 0.5 * q_init_err, (q_err, q_init_err)


def test_banded_parameter_estimation():
  """System ID through the banded path's Schur border (direct.h:291)."""
  import mujoco
  from mujoco_mpc_tpu.grpc.filter_service import _XmlTask

  xml_tmpl = """
  <mujoco><option timestep="0.01"/>
    <worldbody><body>
      <joint name="j" type="hinge" axis="0 1 0" damping="{damping}"/>
      <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.02" mass="0.3"/>
    </body></worldbody>
    <sensor><jointpos joint="j"/></sensor>
  </mujoco>"""
  true_task = _XmlTask(xml=xml_tmpl.format(damping=0.25))
  guess_task = _XmlTask(xml=xml_tmpl.format(damping=0.1))

  horizon = 32
  m_true = true_task.model
  step = jax.jit(lambda d: F.step(m_true, d))
  fwd = jax.jit(lambda d: F.forward(m_true, d))
  sensor_fn = sensors_lib.make_sensor_fn(true_task.mjm)
  d = true_task.make_data().replace(qpos=jnp.asarray([1.2]))
  qs, ys = [], []
  for t in range(horizon):
    qs.append(np.asarray(d.qpos))
    ys.append(np.asarray(sensor_fn(m_true, fwd(d))))
    d = step(d)

  def param_update(m, theta):
    return m.replace(dof_damping=m.dof_damping + theta[0])

  direct = Direct(guess_task, horizon, param_update=param_update,
                  nparam=1)
  assert direct.banded
  for t in range(horizon):
    direct.set_data(t, qpos=qs[t], sensor=ys[t],
                    force=np.zeros(guess_task.model.nv))
  direct.set_weights(sensor=1e4, force=1e2)
  direct.optimize()
  est = 0.1 + float(direct.parameters[0])
  assert abs(est - 0.25) < 0.05, est
