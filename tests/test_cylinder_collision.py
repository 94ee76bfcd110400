"""Sphere-cylinder narrowphase oracle tests (VERDICT r4 weak #7).

The former implementation reused the capsule routine (rounded end caps);
this pins the exact solid-cylinder closest point — side wall, flat cap,
and cap-edge contact — against C MuJoCo's constrained dynamics.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import model as M

XML = """
<mujoco>
  <option timestep="0.002" jacobian="dense"/>
  <worldbody>
    <body name="cyl" pos="0 0 0.2">
      <joint type="slide" axis="0 0 1" damping="50"/>
      <geom name="cyl" type="cylinder" size="0.15 0.2" mass="2"
            friction="0.8 0.01 0.001"/>
    </body>
    <body name="ball" pos="{bx} {by} {bz}">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.05" mass="0.2"
            friction="0.8 0.01 0.001"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize("pose", [
    # sphere resting on the FLAT CAP (the case capsule-rounding got wrong)
    (0.0, 0.02, 0.448),
    (0.08, 0.0, 0.446),
    # side-wall contact
    (0.198, 0.0, 0.2),
    (0.14, 0.14, 0.15),
    # cap-edge (corner) contact
    (0.17, 0.0, 0.44),
    # penetrating cap
    (0.0, 0.03, 0.43),
])
def test_sphere_cylinder_qacc_matches_oracle(pose):
  bx, by, bz = pose
  mjm = mujoco.MjModel.from_xml_string(XML.format(bx=bx, by=by, bz=bz))
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = [0.0, 0.1, -0.05, -0.3, 0.05, 0.0, 0.4]
  mujoco.mj_forward(mjm, mjd)
  m = M.put_model(mjm)
  d = M.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, jnp.float32),
                qvel=jnp.asarray(mjd.qvel, jnp.float32))
  d = jax.jit(lambda d: F.forward(m, d))(d)
  scale = max(1.0, float(np.max(np.abs(mjd.qacc))))
  err = float(np.max(np.abs(np.asarray(d.qacc) - mjd.qacc))) / scale
  assert err < 5e-3, (pose, err, np.asarray(d.qacc), mjd.qacc)


def test_sphere_on_cap_settles_like_oracle():
  """200-step closed loop: ball dropped onto the flat cap settles at the
  cap height (capsule rounding would leave it ~r_cyl too high/sliding)."""
  mjm = mujoco.MjModel.from_xml_string(XML.format(bx=0.03, by=0.0,
                                                  bz=0.48))
  mjd = mujoco.MjData(mjm)
  m = M.put_model(mjm)
  d = M.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, jnp.float32))
  step = jax.jit(lambda d: F.step(m, d))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  # ball z tracks the oracle's settled height
  err = abs(float(d.qpos[3]) - float(mjd.qpos[3]))
  assert err < 5e-3, (float(d.qpos[3]), float(mjd.qpos[3]))
