"""Direct optimizer tests: recover a true trajectory from noisy sensors
(reference pattern: direct_optimize_test.cc convergence tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import rollout as rollout_lib
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
