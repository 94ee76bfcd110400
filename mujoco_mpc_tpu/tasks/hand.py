"""In-hand cube reorientation task.

Reference capability class: mjpc/tasks/shadow_reorient (hand.cc) and the
Rubik cube-solving stress test — contact-rich in-hand manipulation:
reorient a free cube to a target orientation using fingers. The reference
uses a 24-DoF Shadow Hand mesh model; this is an independently-authored
simplified dexterous rig (3 two-segment fingers around a palm) exercising
the same machinery: box contacts, quaternion orientation costs,
high-dimensional action space, sampling planner under contacts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _finger(i, angle_deg):
  import math
  a = math.radians(angle_deg)
  x, y = 0.09 * math.cos(a), 0.09 * math.sin(a)
  rot = math.degrees(math.atan2(-y, -x))
  return f"""
    <body name="fbase_{i}" pos="{x:.4f} {y:.4f} 0.02"
          euler="0 0 {rot:.2f}">
      <joint name="fj0_{i}" type="hinge" axis="0 0 1" range="-45 45"
             damping="0.2"/>
      <geom name="fb_{i}" type="capsule" fromto="0 0 0 0.035 0 0"
            size="0.012" mass="0.04"/>
      <body name="fmid_{i}" pos="0.035 0 0">
        <joint name="fj1_{i}" type="hinge" axis="0 1 0" range="-20 100"
               damping="0.15"/>
        <geom name="fm_{i}" type="capsule" fromto="0 0 0 0.035 0 0"
              size="0.010" mass="0.03"/>
        <body name="ftip_{i}" pos="0.035 0 0">
          <joint name="fj2_{i}" type="hinge" axis="0 1 0" range="-10 110"
                 damping="0.1"/>
          <geom name="ft_{i}" type="capsule" fromto="0 0 0 0.03 0 0"
                size="0.009" mass="0.02" friction="1.5 0.02 0.002"/>
          <site name="tip_{i}" pos="0.03 0 0"/>
        </body>
      </body>
    </body>"""


_ACT = "".join(
    f'<position name="a{j}_{i}" joint="fj{j}_{i}" kp="3" '
    f'ctrlrange="{lo} {hi}" ctrllimited="true" '
    f'forcerange="-2 2" forcelimited="true"/>'
    for i in range(3)
    for j, lo, hi in ((0, -0.7, 0.7), (1, -0.3, 1.7), (2, -0.15, 1.9)))


_XML = f"""
<mujoco model="HandReorient">
  <option timestep="0.004"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.4" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.15" />
    <numeric name="sampling_trajectories" data="60" />
    <numeric name="max_contact_points" data="48" />
  </custom>
  <worldbody>
    <geom name="palm" type="box" pos="0 0 0" size="0.09 0.09 0.015"
          friction="0.8 0.01 0.001"/>
    {_finger(0, 90)}
    {_finger(1, 210)}
    {_finger(2, 330)}
    <body name="cube" pos="0 0 0.055">
      <freejoint/>
      <geom name="cube_geom" type="box" size="0.028 0.028 0.028"
            mass="0.06" friction="1.2 0.02 0.002"/>
      <site name="cube_site" pos="0 0 0"/>
    </body>
    <body name="goal" mocap="true" pos="0.25 0 0.1">
      <geom name="goal_geom" type="box" size="0.028 0.028 0.028"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_ACT}
  </actuator>
  <sensor>
    <user name="Orientation" dim="3" user="0 5.0 0 10.0"/>
    <user name="Position" dim="3" user="0 20.0 0 50.0"/>
    <user name="Reach" dim="9" user="2 1.0 0 5.0 0.02"/>
    <user name="Control" dim="9" user="0 0.05 0 1.0"/>
    <user name="Cube Vel." dim="6" user="0 0.1 0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="{' '.join(['0 0.6 0.9'] * 3)} 0 0 0.055 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class HandReorient(base.Task):
  """Reorient the cube to the goal orientation (reference capability:
  "Shadow Reorient" / in-hand manipulation)."""

  name = "Hand Reorient"

  # cube-fingertip contacts are load-bearing for planning: keep the
  # body-body pairs in the lane kernel (pattern: tasks/rubik.py)
  plan_body_pairs = True

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._cube = names["body"].index("cube")
    self._tips = [names["site"].index(f"tip_{i}") for i in range(3)]
    self._cube_qadr = 9  # 9 finger joints before the free joint

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    cube = self._cube
    qadr = self._cube_qadr
    cube_quat = mm.normalize_quat(d.qpos[qadr + 3:qadr + 7])
    goal_quat = mm.normalize_quat(d.mocap_quat[0])
    orient = mm.quat_sub(cube_quat, goal_quat)

    cube_pos = d.xpos[cube]
    target_pos = jnp.asarray([0.0, 0.0, 0.055], d.qpos.dtype)
    position = cube_pos - target_pos

    reach = jnp.concatenate(
        [d.site_xpos[t] - cube_pos for t in self._tips])

    cube_dof = 9  # dof address of the cube free joint
    cube_vel = d.qvel[cube_dof:cube_dof + 6]

    return jnp.concatenate([orient, position, reach, d.ctrl, cube_vel])


  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: quat-tangent orientation
    error (mju_subQuat in component form, pattern: tasks/rubik.py),
    cube position/reach/velocity, control. The goal quaternion rides
    aux rows so SetState goal changes never recompile."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    tips = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
            for s in self._tips]
    cube = self._cube
    qadr = self._cube_qadr
    dadr = 9  # 9 hinge dofs precede the cube free joint
    nu = int(m.nu)

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      qpos, qvel, ctrl = ctx["qpos"], ctx["qvel"], ctx["ctrl"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      # orient: quat_sub(cube, goal) = log(goal^-1 * cube)
      cq = tuple(qpos[qadr + 3 + k] for k in range(4))
      nrm = jnp.sqrt(cq[0] ** 2 + cq[1] ** 2 + cq[2] ** 2
                     + cq[3] ** 2 + 1e-18)
      cq = tuple(q / nrm for q in cq)
      gq = (aux[0], aux[1], aux[2], aux[3])
      qd = lm.qmul((gq[0], -gq[1], -gq[2], -gq[3]), cq)
      sgn = jnp.where(qd[0] < 0, -1.0, 1.0)
      qd = tuple(sgn * q for q in qd)
      sin_half = jnp.sqrt(qd[1] ** 2 + qd[2] ** 2 + qd[3] ** 2 + 1e-18)
      angle = 2.0 * lm.atan2_nonneg(sin_half, jnp.maximum(qd[0], 0.0))
      scale = angle / jnp.maximum(sin_half, 1e-12)
      rows = [qd[1 + k] * scale for k in range(3)]
      # position: cube to the fixed palm target
      tgt = [0.0, 0.0, 0.055]
      rows += [xpos[cube][k] - tgt[k] for k in range(3)]
      # reach: fingertips to the cube
      for b, p in tips:
        tip = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        rows += [tip[k] - xpos[cube][k] for k in range(3)]
      rows += [ctrl[u] for u in range(nu)]
      rows += [qvel[dadr + k] for k in range(6)]
      return rows

    def make_aux(d0, params):
      from mujoco_mpc_tpu.physics import math as mmath
      return mmath.normalize_quat(d0.mocap_quat[0]).astype(jnp.float32)

    return dict(dim=6 + 3 * len(tips) + nu + 6, naux=4, fn=fn,
                make_aux=make_aux)


# "Cube Solving" (the reference testspeed default benchmark) used to
# alias this simplified rig; it is now the real high-DoF workload in
# tasks/rubik.py (20-actuator hand + articulated-cubie cube).
