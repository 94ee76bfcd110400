"""Estimator tests: EKF/UKF recover the true state from noisy sensors on a
simulated trajectory (reference pattern: estimator tests on particle/box
drops, kalman_test.cc / unscented_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.tasks import registry


def _simulate(task, n, rng, ctrl_scale=0.3):
  """True trajectory + noisy sensor readings."""
  m = task.model
  sensor_fn = sensors_lib.make_sensor_fn(task.mjm)
  step = jax.jit(lambda d: F.step(m, d))
  fwd = jax.jit(lambda d: F.forward(m, d))
  d = task.make_data()
  states, sensors, ctrls = [], [], []
  for t in range(n):
    u = ctrl_scale * np.sin(0.05 * t + np.arange(m.nu))
    d = d.replace(ctrl=jnp.asarray(u, jnp.float32))
    d = step(d)
    df = fwd(d)
    y = np.asarray(sensor_fn(m, df))
    states.append(np.asarray(rollout_lib.pack_state(d)))
    sensors.append(y + 0.01 * rng.standard_normal(y.shape))
    ctrls.append(u)
  return np.array(states), np.array(sensors), np.array(ctrls)


@pytest.mark.parametrize("est_name", ["kalman", "unscented"])
def test_filter_tracks_cartpole(est_name):
  task = registry.get_task("Cartpole")
  rng = np.random.default_rng(0)
  states, sensors, ctrls = _simulate(task, 100, rng)

  if est_name == "kalman":
    from mujoco_mpc_tpu.estimators.kalman import Kalman
    est = Kalman(task)
  else:
    from mujoco_mpc_tpu.estimators.unscented import Unscented
    est = Unscented(task)

  # start from a wrong initial state
  x0 = states[0].copy()
  x0[:task.model.nq] += 0.3 * rng.standard_normal(task.model.nq)
  est.set_state(x0)

  errs = []
  for t in range(1, len(states)):
    est.update(ctrls[t], sensors[t])
    errs.append(np.linalg.norm(est.state - states[t]))
  # converged much closer than the initial error
  assert errs[-1] < 0.1, f"final err {errs[-1]}, first {errs[0]}"
  assert errs[-1] < 0.5 * errs[0]


def test_ground_truth_estimator():
  from mujoco_mpc_tpu.estimators.base import GroundTruth
  task = registry.get_task("Cartpole")
  est = GroundTruth(task)
  s0 = est.state.copy()
  est.update(np.asarray([0.5]))
  assert not np.allclose(est.state, s0)


def test_batch_estimator_tracks():
  from mujoco_mpc_tpu.estimators.batch import Batch
  task = registry.get_task("Cartpole")
  rng = np.random.default_rng(1)
  states, sensors, ctrls = _simulate(task, 40, rng)
  est = Batch(task, configuration_length=4)
  x0 = states[0].copy()
  x0[:task.model.nq] += 0.2 * rng.standard_normal(task.model.nq)
  est.set_state(x0)
  errs = []
  for t in range(1, len(states)):
    est.update(ctrls[t], sensors[t])
    errs.append(np.linalg.norm(
        est.state[:task.model.nq] - states[t][:task.model.nq]))
  assert errs[-1] < 0.1, f"final err {errs[-1]}, first {errs[0]}"
