"""In-hand cube reorientation on the 20-actuator five-finger hand.

Reference capability: mjpc/tasks/shadow_reorient (task.xml:39-44,
hand.cc:30-82) — reorient a free cube in a high-DoF hand to a goal
orientation. Residual groups match the reference one-for-one:
cube_position - palm_position (3), subQuat(goal, cube) (3), cube linear
velocity (3), actuator_force (nu), hand qpos - home (nhand), hand joint
velocity (nhand). The rig is the same independently-authored 20-actuator
five-finger hand as Cube Solving (tasks/rubik.py:_finger20) holding a
rigid cube; the reduced planning model swaps the palm box for a plane
and runs a shorter Newton schedule, the same reduction Cube Solving
ships (reference plan models are reduced the same way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base
from mujoco_mpc_tpu.tasks.rubik import _ACT20, _finger20


def _xml(plan: bool) -> str:
  # sim palm is a real box; the plan palm is a plane (cheap static-plane
  # contact path in the lane kernel)
  palm = ('<geom name="palm" type="plane" pos="0 0 0.015" '
          'size="0.25 0.25 0.01" contype="1" conaffinity="2" '
          'friction="0.8 0.01 0.001"/>' if plan else
          '<geom name="palm" type="box" pos="0 0 0" '
          'size="0.12 0.12 0.015" contype="1" conaffinity="2" '
          'friction="0.8 0.01 0.001"/>')
  solver = ('<numeric name="solver_iterations" data="3"/>'
            '<numeric name="solver_ls_iterations" data="2"/>'
            if plan else '')
  fingers = "".join(_finger20(i, 90 + 72 * i, radius=0.08)
                    for i in range(5))
  return f"""
<mujoco model="HandReorient">
  <option timestep="0.004"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.35" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.25" />
    <numeric name="sampling_trajectories" data="60" />
    <numeric name="max_contact_points" data="48" />
    {solver}
  </custom>
  <worldbody>
    {palm}
    <site name="palm_site" pos="0 0 0.055"/>
    {fingers}
    <body name="cube" pos="0 0 0.055">
      <freejoint/>
      <geom name="cube_geom" type="box" size="0.04 0.04 0.04"
            mass="0.065" contype="2" conaffinity="5"
            friction="1.2 0.02 0.002"/>
      <site name="cube_site" pos="0 0 0"/>
    </body>
    <body name="goal" mocap="true" pos="0.35 0 0.1">
      <geom name="goal_geom" type="box" size="0.04 0.04 0.04"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_ACT20}
  </actuator>
  <sensor>
    <user name="In Hand" dim="3" user="2 20.0 0 50.0 0.02"/>
    <user name="Orientation" dim="3" user="0 5.0 0 10.0"/>
    <user name="Cube Vel." dim="3" user="0 1.0 0 5.0"/>
    <user name="Actuator" dim="20" user="0 0.03 0 1.0"/>
    <user name="Grasp" dim="20" user="0 0.05 0 1.0"/>
    <user name="Joint Vel." dim="20" user="0 1e-3 0 0.1"/>
  </sensor>
  <keyframe>
    <key name="home"
         qpos="{' '.join(['0 0.6 0.6 0.4'] * 5)} 0 0 0.055 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class HandReorient(base.Task):
  """Reorient the cube to the goal orientation (reference
  "Hand Reorient", mjpc/tasks/shadow_reorient)."""

  name = "Hand Reorient"

  # cube-fingertip contacts are load-bearing for planning: keep the
  # body-body pairs in the lane kernel (pattern: tasks/rubik.py)
  plan_body_pairs = True

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._cube = names["body"].index("cube")
    self._palm_site = names["site"].index("palm_site")
    self._nhand = self.model.nq - 7  # 20 finger joints
    self._cube_qadr = self._nhand
    self._cube_dadr = self._nhand
    self._home_hand = jnp.asarray(self.home_qpos[:self._nhand],
                                  jnp.float32)

  def xml(self) -> str:
    return _xml(plan=False)

  def plan_xml(self) -> str:
    return _xml(plan=True)

  @property
  def plan_contact_geoms(self):
    # planning contacts: distal fingertip capsules vs the cube (+ palm
    # plane); middle-segment detail is sim-model-only
    m = self.plan_model
    names = m.names["geom"]
    return {i for i, n in enumerate(names)
            if n.startswith("ft_") or n == "cube_geom"}

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    cube_pos = d.xpos[self._cube]
    palm = d.site_xpos[self._palm_site]
    position = cube_pos - palm
    goal_quat = mm.normalize_quat(d.mocap_quat[0])
    orientation = mm.quat_sub(goal_quat, d.xquat[self._cube])
    linvel = d.qvel[self._cube_dadr:self._cube_dadr + 3]
    grasp = d.qpos[:self._nhand] - self._home_hand
    joint_vel = d.qvel[:self._nhand]
    return jnp.concatenate([
        position, orientation, linvel, d.actuator_force, grasp, joint_vel])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py (component form; the goal
    quaternion rides aux rows so SetState goal changes never
    recompile)."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    palm_p = [float(v) for v in site_pos[self._palm_site]]
    home_hand = [float(v) for v in np.asarray(g(self._home_hand))]
    cube_b = self._cube
    da_c = self._cube_dadr
    nhand = self._nhand
    nu = int(m.nu)

    def fn(ctx):
      lm = ctx["lm"]
      qpos, qvel, aux = ctx["qpos"], ctx["qvel"], ctx["aux"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      rows = [xpos[cube_b][k] - palm_p[k] for k in range(3)]
      # orientation: mju_subQuat(goal, cube) tangent (quat_sub) in
      # component form; atan2_nonneg after the sign fix (rubik pattern)
      gq = (aux[0], aux[1], aux[2], aux[3])
      cq = xquat[cube_b]
      qd = lm.qmul((cq[0], -cq[1], -cq[2], -cq[3]), gq)
      sgn = jnp.where(qd[0] < 0, -1.0, 1.0)
      qd = tuple(sgn * q for q in qd)
      sin_half = jnp.sqrt(qd[1] ** 2 + qd[2] ** 2 + qd[3] ** 2 + 1e-18)
      angle = 2.0 * lm.atan2_nonneg(sin_half, jnp.maximum(qd[0], 0.0))
      scale = angle / jnp.maximum(sin_half, 1e-12)
      rows += [qd[1 + k] * scale for k in range(3)]
      rows += [qvel[da_c + k] for k in range(3)]
      rows += list(ctx["act_force"])
      rows += [qpos[i] - home_hand[i] for i in range(nhand)]
      rows += [qvel[i] for i in range(nhand)]
      return rows

    def make_aux(d0, params):
      return mm.normalize_quat(d0.mocap_quat[0]).astype(jnp.float32)

    return dict(dim=9 + nu + 2 * nhand, naux=4, fn=fn, make_aux=make_aux)
