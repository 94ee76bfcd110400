"""State-estimation demo (parity with python/mujoco_mpc filter demos):
EKF tracking a pendulum from noisy joint measurements."""

import jax
import jax.numpy as jnp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mujoco_mpc_tpu.estimators.kalman import Kalman
from mujoco_mpc_tpu.grpc.filter_service import _XmlTask
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib

XML = """
<mujoco><option timestep="0.005"/>
  <worldbody><body>
    <joint name="j" type="hinge" axis="0 1 0" damping="0.02"/>
    <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.02" mass="0.3"/>
  </body></worldbody>
  <sensor><jointpos joint="j"/><jointvel joint="j"/></sensor>
</mujoco>"""


def main():
  task = _XmlTask(xml=XML)
  m = task.model
  rng = np.random.default_rng(0)
  step = jax.jit(lambda d: F.step(m, d))
  fwd = jax.jit(lambda d: F.forward(m, d))
  sensor_fn = sensors_lib.make_sensor_fn(task.mjm)

  est = Kalman(task)
  est.set_state(np.array([0.5, 0.0]))  # wrong initial guess

  d = task.make_data().replace(qpos=jnp.asarray([1.5]))
  for t in range(200):
    d = step(d)
    y = np.asarray(sensor_fn(m, fwd(d)))
    y_noisy = y + 0.01 * rng.standard_normal(y.shape)
    est.update(np.zeros(0), y_noisy)
    if t % 50 == 49:
      err = abs(est.state[0] - float(d.qpos[0]))
      print(f"t={t + 1}: true q={float(d.qpos[0]):+.3f} "
            f"est q={est.state[0]:+.3f} err={err:.4f}")


if __name__ == "__main__":
  main()
