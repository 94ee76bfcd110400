"""Acrobot swing-up task.

Reference capability: mjpc/tasks/acrobot (acrobot.cc:29-50): residuals
Distance(2) (tip site to goal site, x/z), Velocity(2), Control(1);
underactuated double pendulum with elbow torque only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

_XML = """
<mujoco model="Acrobot">
  <option timestep="0.01" integrator="RK4"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="2.0" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="10" />
    <numeric name="sampling_exploration" data="0.05" />
    <numeric name="sampling_trajectories" data="10" />
  </custom>
  <worldbody>
    <site name="goal" pos="0 0 1.0" size="0.05"/>
    <body name="upper" pos="0 0 0">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom name="upper_geom" type="capsule" fromto="0 0 0 0 0 0.5"
            size="0.04" mass="0.5" contype="0" conaffinity="0"/>
      <body name="lower" pos="0 0 0.5">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom name="lower_geom" type="capsule" fromto="0 0 0 0 0 0.5"
              size="0.035" mass="0.4" contype="0" conaffinity="0"/>
        <site name="tip" pos="0 0 0.5"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="elbow_m" joint="elbow" gear="2" ctrlrange="-1 1"
           ctrllimited="true"/>
  </actuator>
  <sensor>
    <user name="Distance" dim="2" user="0 50.0 0 100.0"/>
    <user name="Velocity" dim="2" user="0 0.1 0.0 1.0"/>
    <user name="Control" dim="1" user="0 0.1 0.0 1.0"/>
    <framepos name="trace0" objtype="site" objname="tip"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="3.141592 0"/>
  </keyframe>
</mujoco>
"""


class Acrobot(base.Task):
  """Swing the tip up to the goal (reference "Acrobot")."""

  name = "Acrobot"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._goal = names["site"].index("goal")
    self._tip = names["site"].index("tip")

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    goal = d.site_xpos[self._goal]
    tip = d.site_xpos[self._tip]
    return jnp.stack([
        goal[2] - tip[2],
        goal[0] - tip[0],
        d.qvel[0],
        d.qvel[1],
        d.ctrl[0],
    ])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: goal/tip site FK plus
    joint velocities and control (pattern: tasks/quadruped.py)."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    gb = int(site_bodyid[self._goal])
    tb = int(site_bodyid[self._tip])
    gp = [float(v) for v in site_pos[self._goal]]
    tp = [float(v) for v in site_pos[self._tip]]

    def fn(ctx):
      lm, cv = ctx["lm"], ctx["cv"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      qvel, ctrl = ctx["qvel"], ctx["ctrl"]
      goal = lm.vadd(xpos[gb], lm.qrot(xquat[gb], cv(gp)))
      tip = lm.vadd(xpos[tb], lm.qrot(xquat[tb], cv(tp)))
      return [goal[2] - tip[2], goal[0] - tip[0], qvel[0], qvel[1],
              ctrl[0]]

    def make_aux(d0, params):
      return jnp.zeros((1,), jnp.float32)

    return dict(dim=5, naux=1, fn=fn, make_aux=make_aux)
