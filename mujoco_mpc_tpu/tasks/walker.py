"""Planar walker task.

Reference capability: mjpc/tasks/walker — residuals Control(6), Height,
Rotation (torso z-axis upright), Speed (com x velocity) with quadratic
norms (walker.cc:28-69); parameters Height Goal / Speed Goal. Planar
(rootx/rootz/rooty) biped with contacts on the feet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _leg(side, x):
  return f"""
      <body name="thigh_{side}" pos="0 {x} -0.2">
        <joint name="hip_{side}" type="hinge" axis="0 -1 0" range="-60 110"/>
        <geom name="thigh_{side}_geom" type="capsule"
              fromto="0 0 0 0 0 -0.3" size="0.045" mass="3.0"/>
        <body name="leg_{side}" pos="0 0 -0.3">
          <joint name="knee_{side}" type="hinge" axis="0 -1 0"
                 range="-160 2"/>
          <geom name="leg_{side}_geom" type="capsule"
                fromto="0 0 0 0 0 -0.3" size="0.03" mass="1.8"/>
          <body name="foot_{side}" pos="0 0 -0.3">
            <joint name="ankle_{side}" type="hinge" axis="0 -1 0"
                   range="-45 45"/>
            <geom name="foot_{side}_geom" type="capsule"
                  fromto="-0.06 0 0 0.14 0 0" size="0.025" mass="0.6"/>
          </body>
        </body>
      </body>"""


_XML = f"""
<mujoco model="Walker">
  <option timestep="0.005"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.8" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.5" />
    <numeric name="sampling_trajectories" data="32" />
    <numeric name="residual_Height Goal" data="1.2 0.5 1.2" />
    <numeric name="residual_Speed Goal" data="0 -5.0 5.0" />
  </custom>
  <default>
    <geom friction="0.7 0.005 0.0001" solref="0.015 1"/>
    <joint damping="0.1" armature="0.01"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="100 1 0.1"/>
    <body name="torso" pos="0 0 1.3">
      <joint name="rootx" type="slide" axis="1 0 0" damping="0"
             armature="0"/>
      <joint name="rootz" type="slide" axis="0 0 1" damping="0"
             armature="0"/>
      <joint name="rooty" type="hinge" axis="0 -1 0" damping="0"
             armature="0"/>
      <geom name="torso_geom" type="capsule" fromto="0 0 0.35 0 0 -0.2"
            size="0.07" mass="10.0"/>
      <site name="torso_site" pos="0 0 0"/>
      {_leg("left", 0.05)}
      {_leg("right", -0.05)}
    </body>
  </worldbody>
  <contact>
    <exclude body1="thigh_left" body2="thigh_right"/>
    <exclude body1="leg_left" body2="leg_right"/>
    <exclude body1="foot_left" body2="foot_right"/>
  </contact>
  <actuator>
    <motor name="hip_left_m" joint="hip_left" gear="50" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="knee_left_m" joint="knee_left" gear="50" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="ankle_left_m" joint="ankle_left" gear="20" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="hip_right_m" joint="hip_right" gear="50" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="knee_right_m" joint="knee_right" gear="50" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="ankle_right_m" joint="ankle_right" gear="20"
           ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
  <sensor>
    <user name="Control" dim="6" user="0 0.1 0.0 1.0"/>
    <user name="Height" dim="1" user="0 10.0 0.0 10.0"/>
    <user name="Rotation" dim="1" user="0 3.0 0.0 5.0"/>
    <user name="Speed" dim="1" user="0 1.0 0.0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 1.3 0 0 0 0 0 0 0"/>
  </keyframe>
</mujoco>
"""


class Walker(base.Task):
  """Stand / walk at target speed (reference "Walker")."""

  name = "Walker"

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    height_goal, speed_goal = params[0], params[1]
    torso_id = 1  # first body after world
    height = d.xpos[torso_id, 2]
    torso_up = d.xmat[torso_id, 2, 2]  # z-axis z-component
    comvel = sensors.subtree_linvel(m, d, torso_id)
    return jnp.concatenate([
        d.ctrl,
        jnp.stack([
            height - height_goal,
            torso_up - 1.0,
            comvel[0] - speed_goal,
        ]),
    ])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: ctrl, height, uprightness
    (torso z-axis z), and com forward speed — all from FK/cvel already in
    VMEM (pattern: tasks/quadruped.py). aux = [height_goal, speed_goal]."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    body_mass = np.asarray(g(m.body_mass))
    ids = list(range(1, m.nbody))
    total_mass = max(sum(float(body_mass[b]) for b in ids), 1e-12)
    nu = m.nu

    def fn(ctx):
      lm, cv = ctx["lm"], ctx["cv"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      ref, cvel, aux = ctx["ref"], ctx["cvel"], ctx["aux"]
      rows = list(ctx["ctrl"])
      rows.append(xpos[1][2] - aux[0])
      up = lm.qrot(xquat[1], cv([0.0, 0.0, 1.0]))
      rows.append(up[2] - 1.0)
      comvel_x = 0.0
      for b in ids:
        ang_b, lin_b = cvel[b]
        linv = lm.vadd(lin_b, lm.vcross(ang_b, lm.vsub(xipos[b], ref[b])))
        comvel_x = comvel_x + float(body_mass[b]) * linv[0]
      rows.append(comvel_x / total_mass - aux[1])
      return rows

    def make_aux(d0, params):
      return jnp.stack([params[0], params[1]])

    return dict(dim=nu + 3, naux=2, fn=fn, make_aux=make_aux)
