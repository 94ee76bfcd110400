"""Direct-optimizer smoothing demo (parity with the reference's
python/mujoco_mpc/demos/direct examples): simulate a noisy pendulum,
smooth the trajectory, print error reduction."""

import jax
import jax.numpy as jnp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mujoco_mpc_tpu.direct.optimizer import Direct
from mujoco_mpc_tpu.grpc.filter_service import _XmlTask
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib

XML = """
<mujoco><option timestep="0.01"/>
  <worldbody><body>
    <joint name="j" type="hinge" axis="0 1 0" damping="0.05"/>
    <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.02" mass="0.3"/>
  </body></worldbody>
  <sensor><jointpos joint="j"/></sensor>
</mujoco>"""


def main():
  task = _XmlTask(xml=XML)
  m = task.model
  horizon = 24
  rng = np.random.default_rng(0)

  # ground truth swing
  step = jax.jit(lambda d: F.step(m, d))
  fwd = jax.jit(lambda d: F.forward(m, d))
  sensor_fn = sensors_lib.make_sensor_fn(task.mjm)
  d = task.make_data().replace(qpos=jnp.asarray([1.5]))
  qs, ys = [], []
  for t in range(horizon):
    qs.append(np.asarray(d.qpos))
    ys.append(np.asarray(sensor_fn(m, fwd(d))))
    d = step(d)
  qs = np.array(qs)

  direct = Direct(task, horizon)
  for t in range(horizon):
    direct.set_data(
        t, qpos=qs[t] + 0.08 * rng.standard_normal(1),
        sensor=ys[t] + 0.005 * rng.standard_normal(1),
        force=np.zeros(1))
  direct.set_weights(sensor=1e4, force=1.0)
  err0 = np.linalg.norm(direct.qpos_initial - qs)
  direct.optimize()
  err1 = np.linalg.norm(direct.qpos_optimized - qs)
  print(f"configuration error: {err0:.4f} -> {err1:.4f} "
        f"({direct.iterations} GN iterations, status {direct.status.name})")


if __name__ == "__main__":
  main()
