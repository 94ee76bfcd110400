"""Manipulation task: arm + gripper picks and brings a box to a target.

Reference capability: mjpc/tasks/manipulation ("PickAndPlace",
manipulation.cc:31-62) — residuals Reach (hand to object), Bring (object
keypoints to target keypoints), Careful, Away; host-side transition flips
reach/away weights when phases complete. The reference uses Panda+Robotiq
meshes; this is an independently-authored 4-DoF arm with a two-finger
gripper exercising the same machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

_XML = """
<mujoco model="Manipulation">
  <option timestep="0.005" cone="elliptic"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.5" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.1" />
    <numeric name="sampling_trajectories" data="30" />
  </custom>
  <default>
    <joint damping="2" armature="0.05"/>
    <geom friction="1 0.01 0.001"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="base" pos="0 0 0.05">
      <geom name="base_geom" type="cylinder" size="0.06 0.05" mass="2"
            contype="0" conaffinity="0"/>
      <body name="link1" pos="0 0 0.05">
        <joint name="shoulder_pan" type="hinge" axis="0 0 1"
               range="-170 170"/>
        <geom name="l1" type="capsule" fromto="0 0 0 0 0 0.12"
              size="0.045" mass="1.5" contype="0" conaffinity="0"/>
        <body name="link2" pos="0 0 0.12">
          <joint name="shoulder_lift" type="hinge" axis="0 1 0"
                 range="-100 100"/>
          <geom name="l2" type="capsule" fromto="0 0 0 0.25 0 0"
                size="0.04" mass="1.2"/>
          <body name="link3" pos="0.25 0 0">
            <joint name="elbow" type="hinge" axis="0 1 0" range="-140 140"/>
            <geom name="l3" type="capsule" fromto="0 0 0 0.2 0 0"
                  size="0.035" mass="0.8"/>
            <body name="wrist" pos="0.2 0 0">
              <joint name="wrist_pitch" type="hinge" axis="0 1 0"
                     range="-100 100"/>
              <geom name="wg" type="capsule" fromto="0 0 0 0.06 0 0"
                    size="0.03" mass="0.3"/>
              <site name="hand" pos="0.1 0 0"/>
              <body name="finger_l" pos="0.06 0.03 0">
                <joint name="grip_l" type="slide" axis="0 -1 0"
                       range="0 0.025"/>
                <geom name="fl" type="box" size="0.035 0.006 0.012"
                      pos="0.035 0 0" mass="0.08" condim="6"
                      friction="1.5 0.02 0.002"/>
              </body>
              <body name="finger_r" pos="0.06 -0.03 0">
                <joint name="grip_r" type="slide" axis="0 1 0"
                       range="0 0.025"/>
                <geom name="fr" type="box" size="0.035 0.006 0.012"
                      pos="0.035 0 0" mass="0.08" condim="6"
                      friction="1.5 0.02 0.002"/>
              </body>
            </body>
          </body>
        </body>
      </body>
    </body>
    <body name="object" pos="0.4 0 0.03">
      <freejoint/>
      <geom name="obj" type="box" size="0.022 0.022 0.03" mass="0.1"
            condim="6" friction="1.5 0.02 0.002"/>
      <site name="obj_top" pos="0 0 0.03"/>
    </body>
    <body name="target" mocap="true" pos="0.3 0.25 0.03">
      <geom name="target_geom" type="box" size="0.022 0.022 0.03"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <contact>
    <exclude body1="wrist" body2="finger_l"/>
    <exclude body1="wrist" body2="finger_r"/>
  </contact>
  <actuator>
    <position name="pan_m" joint="shoulder_pan" kp="100" ctrlrange="-2.9 2.9"
              ctrllimited="true" forcerange="-60 60" forcelimited="true"/>
    <position name="lift_m" joint="shoulder_lift" kp="100"
              ctrlrange="-1.7 1.7" ctrllimited="true" forcerange="-60 60"
              forcelimited="true"/>
    <position name="elbow_m" joint="elbow" kp="60" ctrlrange="-2.4 2.4"
              ctrllimited="true" forcerange="-40 40" forcelimited="true"/>
    <position name="wrist_m" joint="wrist_pitch" kp="30"
              ctrlrange="-1.7 1.7" ctrllimited="true" forcerange="-20 20"
              forcelimited="true"/>
    <position name="grip_l_m" joint="grip_l" kp="30" ctrlrange="0 0.025"
              ctrllimited="true" forcerange="-20 20" forcelimited="true"/>
    <position name="grip_r_m" joint="grip_r" kp="30" ctrlrange="0 0.025"
              ctrllimited="true" forcerange="-20 20" forcelimited="true"/>
  </actuator>
  <sensor>
    <user name="Reach" dim="3" user="2 1.0 0 5.0 0.04"/>
    <user name="Bring" dim="3" user="6 5.0 0 10.0 0.02"/>
    <user name="Careful" dim="1" user="0 0.5 0 2.0"/>
    <user name="Control" dim="6" user="0 0.05 0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 0.6 0.8 0.3 0.02 0.02 0.4 0 0.03 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class Manipulation(base.Task):
  """Bring the object to the target (reference "PickAndPlace")."""

  name = "PickAndPlace"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._hand = names["site"].index("hand")
    self._object = names["body"].index("object")
    self._obj_qadr = 6  # 6 arm/gripper joints precede the free joint

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    hand = d.site_xpos[self._hand]
    obj = d.xpos[self._object]
    target = d.mocap_pos[0]
    reach = hand - obj
    bring = obj - target
    # careful: penalize high object speed (graceful handling)
    obj_dof = 6
    careful = jnp.linalg.norm(d.qvel[obj_dof:obj_dof + 3] + 1e-9)
    return jnp.concatenate(
        [reach, bring, careful[None], d.ctrl])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: hand-to-object reach,
    object-to-target bring (mocap target fixed per rollout -> aux),
    object speed penalty, control."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    hand_b = int(site_bodyid[self._hand])
    hand_p = [float(v) for v in site_pos[self._hand]]
    obj = self._object
    dof = self._obj_qadr
    nu = int(m.nu)

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      qvel, ctrl = ctx["qvel"], ctx["ctrl"]
      hand = lm.vadd(xpos[hand_b], lm.qrot(xquat[hand_b], cv(hand_p)))
      rows = [hand[k] - xpos[obj][k] for k in range(3)]
      rows += [xpos[obj][k] - aux[k] for k in range(3)]
      v = [qvel[dof + k] + 1e-9 for k in range(3)]
      rows.append(jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]))
      rows += [ctrl[u] for u in range(nu)]
      return rows

    def make_aux(d0, params):
      return d0.mocap_pos[0].astype(jnp.float32)

    return dict(dim=7 + nu, naux=3, fn=fn, make_aux=make_aux)
