"""Quadrotor flight task.

Reference capability: mjpc/tasks/quadrotor (quadrotor.cc:25-75): residuals
Position (body to mocap goal), Linear velocity, Angular velocity, Control
(deviation from hover thrust = total weight / 4), Orientation; rotors are
site-transmission actuators (exercises TRN_SITE in physics.smooth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _rotor(i, x, y, spin):
  return f"""
      <site name="rotor{i}" pos="{x} {y} 0.02"/>
      <geom name="rotor{i}_geom" type="cylinder" pos="{x} {y} 0.02"
            size="0.08 0.01" mass="0.05"/>"""


_XML = f"""
<mujoco model="Quadrotor">
  <option timestep="0.005"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.6" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="5" />
    <numeric name="sampling_exploration" data="0.1" />
    <numeric name="sampling_trajectories" data="30" />
  </custom>
  <worldbody>
    <geom name="floor" type="plane" size="20 20 0.1"/>
    <body name="quad" pos="0 0 0.3">
      <freejoint/>
      <geom name="core" type="box" size="0.06 0.06 0.03" mass="0.3"/>
      {_rotor(0, 0.12, 0.12, 1)}
      {_rotor(1, -0.12, 0.12, -1)}
      {_rotor(2, -0.12, -0.12, 1)}
      {_rotor(3, 0.12, -0.12, -1)}
      <site name="center" pos="0 0 0"/>
    </body>
    <body name="goal" mocap="true" pos="0 0 1.5">
      <geom name="goal_geom" type="sphere" size="0.05" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    <general name="t0" site="rotor0" gear="0 0 1 0 0 0.02"
             ctrlrange="0 6" ctrllimited="true"/>
    <general name="t1" site="rotor1" gear="0 0 1 0 0 -0.02"
             ctrlrange="0 6" ctrllimited="true"/>
    <general name="t2" site="rotor2" gear="0 0 1 0 0 0.02"
             ctrlrange="0 6" ctrllimited="true"/>
    <general name="t3" site="rotor3" gear="0 0 1 0 0 -0.02"
             ctrlrange="0 6" ctrllimited="true"/>
  </actuator>
  <sensor>
    <user name="Position" dim="3" user="0 25.0 0 50.0"/>
    <user name="Lin. Vel." dim="3" user="0 1.25 0.0 5.0"/>
    <user name="Ang. Vel." dim="3" user="0 1.25 0.0 5.0"/>
    <user name="Control" dim="4" user="0 1.0e-3 0.0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 0 0.3 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class Quadrotor(base.Task):
  """Fly to the mocap goal (reference "Quadrotor")."""

  name = "Quadrotor"

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    quad = 1  # body index
    pos = d.xpos[quad] - d.mocap_pos[0]
    linvel, angvel = sensors.body_velocity(m, d, quad)
    total_mass = jnp.sum(m.body_mass)
    hover = total_mass * jnp.linalg.norm(m.opt.gravity) / m.nu
    return jnp.concatenate([
        pos, linvel, angvel, d.ctrl - hover])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: body position to the
    mocap goal (fixed per rollout -> aux), world-frame body velocity
    from the VMEM-resident cvel, hover-thrust control deviation. The
    rotors are TRN_SITE actuators handled in-kernel."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    quad = 1  # body index (residual() above)
    total_mass = float(np.sum(np.asarray(g(m.body_mass))))
    grav = float(np.linalg.norm(np.asarray(g(m.opt.gravity))))
    hover = total_mass * grav / int(m.nu)
    nu = int(m.nu)

    def fn(ctx):
      lm, aux = ctx["lm"], ctx["aux"]
      xpos, xipos = ctx["xpos"], ctx["xipos"]
      ref, cvel, ctrl = ctx["ref"], ctx["cvel"], ctx["ctrl"]
      rows = [xpos[quad][k] - aux[k] for k in range(3)]
      ang, lin = cvel[quad]
      linv = lm.vadd(lin, lm.vcross(ang, lm.vsub(xipos[quad],
                                                 ref[quad])))
      rows += [linv[k] for k in range(3)]
      rows += [ang[k] for k in range(3)]
      rows += [ctrl[u] - hover for u in range(nu)]
      return rows

    def make_aux(d0, params):
      return d0.mocap_pos[0].astype(jnp.float32)

    return dict(dim=9 + nu, naux=3, fn=fn, make_aux=make_aux)
