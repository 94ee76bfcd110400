"""Direct optimizer tests: recover a true trajectory from noisy sensors
(reference pattern: direct_optimize_test.cc convergence tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.direct.optimizer import Direct, Status
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.tasks import registry


def test_direct_smooths_noisy_cartpole():
  task = registry.get_task("Cartpole")
  m = task.model
  rng = np.random.default_rng(0)
  horizon = 12

  # simulate ground truth
  sensor_fn = sensors_lib.make_sensor_fn(task.mjm)
  step = jax.jit(lambda d: F.step(m, d))
  fwd = jax.jit(lambda d: F.forward(m, d))
  d = task.make_data()
  d = d.replace(qpos=d.qpos.at[1].set(2.0))
  qs_true, ys, fs = [], [], []
  for t in range(horizon):
    u = np.asarray([0.3 * np.sin(0.2 * t)])
    d = d.replace(ctrl=jnp.asarray(u, jnp.float32))
    qs_true.append(np.asarray(d.qpos))
    df = fwd(d)
    ys.append(np.asarray(sensor_fn(m, df)))
    fs.append(np.asarray(df.qfrc_actuator))
    d = step(d)
  qs_true = np.array(qs_true)

  direct = Direct(task, horizon)
  for t in range(horizon):
    # initialize with noisy configurations; measured sensors slightly noisy
    direct.set_data(
        t,
        qpos=qs_true[t] + 0.05 * rng.standard_normal(m.nq),
        sensor=ys[t] + 0.002 * rng.standard_normal(len(ys[t])),
        force=fs[t])
  direct.set_weights(sensor=1e4, force=1.0)
  q_init_err = np.linalg.norm(direct.qpos_initial - qs_true)
  direct.optimize()
  q_err = np.linalg.norm(direct.qpos_optimized - qs_true)

  assert np.isfinite(direct.cost)
  assert direct.cost < direct.cost_initial
  assert q_err < 0.5 * q_init_err, (q_err, q_init_err)


def test_direct_parameter_estimation():
  """System ID: recover a pendulum's damping scale from data (reference
  direct_parameter_test.cc capability)."""
  import mujoco
  from mujoco_mpc_tpu.physics import model as M

  xml_tmpl = """
  <mujoco><option timestep="0.01"/>
    <worldbody><body>
      <joint name="j" type="hinge" axis="0 1 0" damping="{damping}"/>
      <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.02" mass="0.3"/>
    </body></worldbody>
    <sensor><jointpos joint="j"/></sensor>
  </mujoco>"""

  # true system: damping 0.25; model initial guess: damping 0.1
  true_task = _make_task(xml_tmpl.format(damping=0.25))
  guess_task = _make_task(xml_tmpl.format(damping=0.1))

  horizon = 16
  m_true = true_task.model
  step = jax.jit(lambda d: F.step(m_true, d))
  sensor_fn = sensors_lib.make_sensor_fn(true_task.mjm)
  d = true_task.make_data().replace(qpos=jnp.asarray([1.2]))
  qs, ys = [], []
  for t in range(horizon):
    qs.append(np.asarray(d.qpos))
    df = jax.jit(lambda d: F.forward(m_true, d))(d)
    ys.append(np.asarray(sensor_fn(m_true, df)))
    d = step(d)

  def param_update(m, theta):
    # theta[0]: additive damping correction
    return m.replace(dof_damping=m.dof_damping + theta[0])

  direct = Direct(guess_task, horizon, param_update=param_update, nparam=1)
  for t in range(horizon):
    direct.set_data(t, qpos=qs[t], sensor=ys[t],
                    force=np.zeros(guess_task.model.nv))
  direct.set_weights(sensor=1e4, force=1e2)
  direct.optimize()
  est_damping = 0.1 + float(direct.parameters[0])
  assert abs(est_damping - 0.25) < 0.05, est_damping


def _make_task(xml):
  from mujoco_mpc_tpu.grpc.filter_service import _XmlTask
  return _XmlTask(xml=xml)
