"""Native policy runtime: spline parity with the JAX implementation and
thread-safety of the publish/sample path."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.runtime.runtime import PolicyRuntime


@pytest.mark.parametrize("interp", [0, 1, 2])
def test_native_spline_matches_jax(interp):
  rng = np.random.default_rng(0)
  nu, nn = 3, 8
  values = rng.standard_normal((nn, nu))
  t0, dt = 0.5, 0.12

  rt = PolicyRuntime(nu, nn, interp=interp)
  rt.update(t0, dt, values)

  pol = spline_lib.SplinePolicy(
      t0=jnp.asarray(t0, jnp.float64) if False else jnp.asarray(
          t0, jnp.float32),
      dt=jnp.asarray(dt, jnp.float32),
      values=jnp.asarray(values, jnp.float32), interp=interp)

  for t in np.linspace(-0.2, 2.0, 23):
    native = rt.action(t)
    ref = np.asarray(spline_lib.sample(pol, jnp.asarray(t, jnp.float32)))
    np.testing.assert_allclose(native, ref, atol=2e-5)


def test_ctrlrange_clamp():
  rt = PolicyRuntime(2, 4, interp=1, ctrl_lo=[-0.5, -1.0],
                     ctrl_hi=[0.5, 1.0])
  rt.update(0.0, 0.1, np.array([[2.0, -3.0]] * 4))
  np.testing.assert_allclose(rt.action(0.15), [0.5, -1.0])


def test_concurrent_publish_and_sample():
  nu, nn = 4, 6
  rt = PolicyRuntime(nu, nn, interp=1)
  stop = threading.Event()
  errors = []

  def writer():
    i = 0
    while not stop.is_set():
      rt.update(0.0, 0.1, np.full((nn, nu), float(i % 7)))
      i += 1

  def reader():
    while not stop.is_set():
      a = rt.action(0.25)
      # every sample must come from a consistent slot: all components equal
      if not np.allclose(a, a[0]):
        errors.append(a.copy())

  threads = [threading.Thread(target=writer)] + \
      [threading.Thread(target=reader) for _ in range(2)]
  for t in threads:
    t.start()
  import time
  time.sleep(1.0)
  stop.set()
  for t in threads:
    t.join()
  assert not errors, f"torn reads: {errors[:3]}"
  assert rt.version > 10


def test_agent_runner_background_planning():
  """AgentRunner (reference interface.cc parity): the plan thread
  re-optimizes continuously while the control thread samples actions
  lock-free from the native policy host."""
  import time as _time
  import numpy as np
  import jax
  import jax.numpy as jnp
  from mujoco_mpc_tpu.agent.runner import AgentRunner
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Cartpole")
  config = sampling.make_config(task).replace(num_trajectory=8, horizon=20)
  planner = sampling.SamplingPlanner(task, config)
  runner = AgentRunner(task, planner=planner)

  # the publish/sample path is exact: a known policy read back clamped
  pol = planner.policy.replace(
      values=jnp.full_like(planner.policy.values, 0.25))
  runner._publish(pol)
  np.testing.assert_allclose(runner.action(0.0), [0.25], atol=1e-6)

  v0 = runner.policy_version
  step = jax.jit(lambda d: F.step(task.model, d))
  d = task.make_data()
  with runner:
    deadline = _time.time() + 120.0
    steps = 0
    while (runner.iterations < 4 or steps < 40) and \
        _time.time() < deadline:
      u = runner.action(float(d.time))
      assert u.shape == (task.model.nu,)
      assert np.all(np.isfinite(u))
      d = d.replace(ctrl=jnp.asarray(u, jnp.float32))
      d = step(d)
      runner.set_state(qpos=d.qpos, qvel=d.qvel, time=d.time)
      steps += 1
  # the plan thread ran and published each iteration to the native host
  assert runner.iterations >= 3, runner.iterations
  assert runner.policy_version >= v0 + runner.iterations
