"""Allegro in-hand cube reorientation task.

Reference capability: mjpc/tasks/allegro (allegro.cc:28-110,
task.xml:50-56) — a 16-DoF four-finger Allegro hand reorients a free
cube to a goal mocap pose. Residuals: cube position to goal (3), cube
orientation error (quaternion tangent, 3), cube linear velocity (3),
actuator force (16), grasp posture vs the home keyframe (16), joint
velocity (16). The transition resets the cube into the hand when it has
fallen to the floor and stopped moving (allegro.cc:78-108).

The reference uses the Wonik Allegro mesh model; this is an
independently-authored 4x4-joint finger rig exercising the same
machinery (contact-rich 16-DoF in-hand manipulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _finger(name, y, is_thumb=False):
  if is_thumb:
    return f"""
    <body name="fbase_{name}" pos="-0.03 {y} 0.035" euler="0 0 90">
      <joint name="fj0_{name}" type="hinge" axis="0 0 1" range="-30 90"
             damping="0.2" armature="0.005"/>
      <geom name="fb_{name}" type="capsule" fromto="0 0 0 0.04 0 0"
            size="0.014" mass="0.05"/>
      <body name="fprox_{name}" pos="0.04 0 0">
        <joint name="fj1_{name}" type="hinge" axis="0 1 0" range="-10 100"
               damping="0.15" armature="0.005"/>
        <geom name="fp_{name}" type="capsule" fromto="0 0 0 0.045 0 0"
              size="0.012" mass="0.04"/>
        <body name="fmid_{name}" pos="0.045 0 0">
          <joint name="fj2_{name}" type="hinge" axis="0 1 0"
                 range="-10 100" damping="0.12" armature="0.005"/>
          <geom name="fm_{name}" type="capsule" fromto="0 0 0 0.04 0 0"
                size="0.011" mass="0.03"/>
          <body name="ftip_{name}" pos="0.04 0 0">
            <joint name="fj3_{name}" type="hinge" axis="0 1 0"
                   range="-10 110" damping="0.1" armature="0.005"/>
            <geom name="ft_{name}" type="capsule" fromto="0 0 0 0.035 0 0"
                  size="0.010" mass="0.02" friction="1.5 0.02 0.002"/>
          </body>
        </body>
      </body>
    </body>"""
  return f"""
    <body name="fbase_{name}" pos="0.05 {y} 0.035">
      <joint name="fj0_{name}" type="hinge" axis="1 0 0" range="-25 25"
             damping="0.2" armature="0.005"/>
      <geom name="fb_{name}" type="capsule" fromto="0 0 0 0.04 0 0"
            size="0.013" mass="0.05"/>
      <body name="fprox_{name}" pos="0.04 0 0">
        <joint name="fj1_{name}" type="hinge" axis="0 1 0" range="-15 100"
               damping="0.15" armature="0.005"/>
        <geom name="fp_{name}" type="capsule" fromto="0 0 0 0.045 0 0"
              size="0.011" mass="0.04"/>
        <body name="fmid_{name}" pos="0.045 0 0">
          <joint name="fj2_{name}" type="hinge" axis="0 1 0"
                 range="-10 100" damping="0.12" armature="0.005"/>
          <geom name="fm_{name}" type="capsule" fromto="0 0 0 0.04 0 0"
                size="0.010" mass="0.03"/>
          <body name="ftip_{name}" pos="0.04 0 0">
            <joint name="fj3_{name}" type="hinge" axis="0 1 0"
                   range="-10 110" damping="0.1" armature="0.005"/>
            <geom name="ft_{name}" type="capsule" fromto="0 0 0 0.035 0 0"
                  size="0.009" mass="0.02" friction="1.5 0.02 0.002"/>
          </body>
        </body>
      </body>
    </body>"""


_FINGERS = ["idx", "mid", "rng", "thb"]
_ACT = "".join(
    f'<position name="a{j}_{f}" joint="fj{j}_{f}" kp="2.5" '
    f'ctrlrange="{lo} {hi}" ctrllimited="true" '
    f'forcerange="-1.5 1.5" forcelimited="true"/>'
    for f in _FINGERS
    for j, lo, hi in ((0, -0.45, 0.45), (1, -0.2, 1.7), (2, -0.17, 1.7),
                      (3, -0.17, 1.9)))

_HOME_JOINTS = "0 0.5 0.7 0.7 " * 3 + "0.6 0.5 0.7 0.7"

_XML = f"""
<mujoco model="Allegro">
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
    <geom name="floor" type="plane" pos="0 0 -0.3" size="2 2 0.1"/>
    <geom name="palm" type="box" pos="0 0 0" size="0.05 0.065 0.015"
          friction="0.8 0.01 0.001"/>
    {_finger("idx", 0.045)}
    {_finger("mid", 0.0)}
    {_finger("rng", -0.045)}
    {_finger("thb", 0.07, is_thumb=True)}
    <body name="cube" pos="0.01 0 0.047">
      <freejoint/>
      <geom name="cube" type="box" size="0.03 0.03 0.03"
            mass="0.065" friction="1.2 0.02 0.002"/>
    </body>
    <body name="goal" mocap="true" pos="0.01 0 0.075"
          quat="0.9238795 0 0 0.3826834">
      <geom name="goal_geom" type="box" size="0.03 0.03 0.03"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_ACT}
  </actuator>
  <sensor>
    <user name="Cube Position" dim="3" user="2 20 0 100 0.02"/>
    <user name="Cube Orientation" dim="3" user="0 10 0 20" />
    <user name="Cube Velocity" dim="3" user="0 1 0 20" />
    <user name="Actuation" dim="16" user="0 0.05 0.0 10" />
    <user name="Grasp" dim="16" user="0 0.02 0.0 10" />
    <user name="Joint Vel" dim="16" user="0 1.0e-3 0.0 0.1" />
  </sensor>
  <keyframe>
    <key name="home" qpos="{_HOME_JOINTS} 0.01 0 0.047 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class Allegro(base.Task):
  """Reorient the cube to the goal mocap pose with a 16-DoF hand."""

  name = "Allegro"
  # lane kernel: finger-cube capsule-box contacts in-kernel; the palm
  # box becomes a plane in the reduced plan model (Task.plan_xml)
  plan_body_pairs = True

  def plan_xml(self) -> str:
    return _XML.replace(
        '<geom name="palm" type="box" pos="0 0 0" size="0.05 0.065 0.015"\n'
        '          friction="0.8 0.01 0.001"/>',
        '<geom name="palm" type="plane" pos="0 0 0.015" '
        'size="0.2 0.2 0.01"\n          friction="0.8 0.01 0.001"/>')

  def lane_residual_spec(self):
    """In-kernel residual: goal pose on aux rows (live mocap updates
    never recompile)."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    home = [float(v) for v in np.asarray(g(self._home_joints))]
    cube_b = self._cube_body
    da_c = self._cube_dadr
    nu = m.nu

    def fn(ctx):
      lm = ctx["lm"]
      qpos, qvel, aux = ctx["qpos"], ctx["qvel"], ctx["aux"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      rows = [xpos[cube_b][k] - aux[k] for k in range(3)]
      gq = (aux[3], aux[4], aux[5], aux[6])
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
      rows += [qpos[i] - home[i] for i in range(16)]
      rows += [qvel[i] for i in range(16)]
      return rows

    def make_aux(d0, params):
      from mujoco_mpc_tpu.physics import math as mm2
      return jnp.concatenate([
          d0.mocap_pos[0], mm2.normalize_quat(d0.mocap_quat[0])])

    return dict(dim=3 + 3 + 3 + nu + 16 + 16, naux=7, fn=fn,
                make_aux=make_aux)

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._cube_body = names["body"].index("cube")
    self._cube_geom = names["geom"].index("cube")
    home = self.home_qpos
    self._home_joints = jnp.asarray(home[:16], jnp.float32)
    # cube free joint is the last joint: qpos[16:23], dofs [16:22]
    self._cube_qadr = 16
    self._cube_dadr = 16

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    cube_pos = d.xpos[self._cube_body]
    cube_quat = d.xquat[self._cube_body]
    goal_pos = d.mocap_pos[0]
    goal_quat = mm.normalize_quat(d.mocap_quat[0])
    position = cube_pos - goal_pos
    orientation = mm.quat_sub(goal_quat, cube_quat)
    linvel = d.qvel[self._cube_dadr:self._cube_dadr + 3]
    actuation = d.actuator_force
    grasp = d.qpos[:16] - self._home_joints
    joint_vel = d.qvel[:16]
    return jnp.concatenate([
        position, orientation, linvel, actuation, grasp, joint_vel])

  def transition(self, d: Data) -> Data:
    """Reset the cube into the hand once it rests on the floor
    (allegro.cc:78-108; floor contact approximated by height)."""
    qpos = np.asarray(jax.device_get(d.qpos))
    qvel = np.asarray(jax.device_get(d.qvel))
    cube_z = qpos[self._cube_qadr + 2]
    linvel = np.linalg.norm(qvel[self._cube_dadr:self._cube_dadr + 3])
    if cube_z < -0.2 and linvel < 0.01:
      home = self.home_qpos
      qpos = qpos.copy()
      qvel = qvel.copy()
      qpos[self._cube_qadr:self._cube_qadr + 7] = home[16:23]
      qvel[self._cube_dadr:self._cube_dadr + 6] = 0.0
      d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                    qvel=jnp.asarray(qvel, d.qvel.dtype))
    return d
