"""Panda task: 7-DoF arm brings a box to a randomized 6-DoF pose target.

Reference capability: mjpc/tasks/panda (panda.cc:31-99, task.xml:62-70) —
residuals Reach (end-effector to box, 3) and Bring (two box keypoint
sites to the corresponding target keypoints, 6; keypoints encode
position AND orientation), and a host-side transition that, when the
bring distance falls below 15 mm, teleports the box to a random tabletop
position and re-randomizes the target mocap pose (position + quaternion)
— continuous curriculum, no terminal state (panda.cc:74-98).

The reference arm is a mesh Franka Panda; this is an independently-
authored 7-DoF serial arm with the same joint structure exercising the
same task machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

_XML = """
<mujoco model="Panda">
  <option timestep="0.005"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.5" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_trajectories" data="60"/>
    <numeric name="sampling_spline_points" data="7" />
    <numeric name="sampling_exploration" data="0.1" />
  </custom>
  <default>
    <joint damping="4" armature="0.1"/>
    <geom friction="1 0.01 0.001"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="base" pos="0 0 0.06">
      <geom name="base_geom" type="cylinder" size="0.07 0.06" mass="3"
            contype="0" conaffinity="0"/>
      <body name="link1" pos="0 0 0.06">
        <joint name="j1" type="hinge" axis="0 0 1" range="-166 166"/>
        <geom name="g1" type="capsule" fromto="0 0 0 0 0 0.15"
              size="0.05" mass="2" contype="0" conaffinity="0"/>
        <body name="link2" pos="0 0 0.15">
          <joint name="j2" type="hinge" axis="0 1 0" range="-101 101"/>
          <geom name="g2" type="capsule" fromto="0 0 0 0 0 0.2"
                size="0.045" mass="1.8" contype="0" conaffinity="0"/>
          <body name="link3" pos="0 0 0.2">
            <joint name="j3" type="hinge" axis="0 0 1" range="-166 166"/>
            <geom name="g3" type="capsule" fromto="0 0 0 0.08 0 0.1"
                  size="0.04" mass="1.4" contype="0" conaffinity="0"/>
            <body name="link4" pos="0.08 0 0.1">
              <joint name="j4" type="hinge" axis="0 1 0" range="-176 -4"/>
              <geom name="g4" type="capsule" fromto="0 0 0 0 0 0.2"
                    size="0.04" mass="1.2" contype="0" conaffinity="0"/>
              <body name="link5" pos="0 0 0.2">
                <joint name="j5" type="hinge" axis="0 0 1"
                       range="-166 166"/>
                <geom name="g5" type="capsule" fromto="0 0 0 0 0 0.12"
                      size="0.035" mass="0.8" contype="0" conaffinity="0"/>
                <body name="link6" pos="0 0 0.12">
                  <joint name="j6" type="hinge" axis="0 1 0"
                         range="-1 215"/>
                  <geom name="g6" type="capsule" fromto="0 0 0 0.06 0 0"
                        size="0.03" mass="0.6"/>
                  <body name="link7" pos="0.06 0 0">
                    <joint name="j7" type="hinge" axis="1 0 0"
                           range="-166 166"/>
                    <geom name="g7" type="capsule"
                          fromto="0 0 0 0.08 0 -0.04" size="0.025"
                          mass="0.4"/>
                    <site name="eeff" pos="0.1 0 -0.06"/>
                  </body>
                </body>
              </body>
            </body>
          </body>
        </body>
      </body>
    </body>
    <body name="boxb" pos="0.45 0 0.03">
      <freejoint/>
      <geom name="box" type="box" size="0.025 0.025 0.025" mass="0.1"
            priority="1" condim="6" friction="1.5 0.02 0.002"/>
      <site name="box1" pos="0.02 0.02 0.02"/>
      <site name="box2" pos="-0.02 -0.02 -0.02"/>
    </body>
    <body name="target" mocap="true" pos="0.3 0.3 0.2">
      <geom name="target_geom" type="box" size="0.025 0.025 0.025"
            contype="0" conaffinity="0"/>
      <site name="target1" pos="0.02 0.02 0.02"/>
      <site name="target2" pos="-0.02 -0.02 -0.02"/>
    </body>
  </worldbody>
  <actuator>
    <position name="a1" joint="j1" kp="200" ctrlrange="-2.9 2.9"
              ctrllimited="true" forcerange="-87 87" forcelimited="true"/>
    <position name="a2" joint="j2" kp="200" ctrlrange="-1.76 1.76"
              ctrllimited="true" forcerange="-87 87" forcelimited="true"/>
    <position name="a3" joint="j3" kp="150" ctrlrange="-2.9 2.9"
              ctrllimited="true" forcerange="-87 87" forcelimited="true"/>
    <position name="a4" joint="j4" kp="150" ctrlrange="-3.07 -0.07"
              ctrllimited="true" forcerange="-87 87" forcelimited="true"/>
    <position name="a5" joint="j5" kp="80" ctrlrange="-2.9 2.9"
              ctrllimited="true" forcerange="-12 12" forcelimited="true"/>
    <position name="a6" joint="j6" kp="80" ctrlrange="-0.02 3.75"
              ctrllimited="true" forcerange="-12 12" forcelimited="true"/>
    <position name="a7" joint="j7" kp="50" ctrlrange="-2.9 2.9"
              ctrllimited="true" forcerange="-12 12" forcelimited="true"/>
  </actuator>
  <sensor>
    <user name="Reach" dim="3" user="2 1 0 5 0.01"/>
    <user name="Bring" dim="6" user="2 .1 0 1 0.003"/>
  </sensor>
  <keyframe>
    <key name="home"
         qpos="0 0.5 0 -1.8 0 2.2 0 0.45 0 0.03 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class Panda(base.Task):
  """Bring the box keypoints to the randomized target pose."""

  name = "Panda"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._eeff = names["site"].index("eeff")
    self._box1 = names["site"].index("box1")
    self._box2 = names["site"].index("box2")
    self._box_geom = names["geom"].index("box")
    # target keypoints from mocap pose (target sites are fixed offsets of
    # the mocap body; computed from mocap_pos/quat directly so the
    # residual tracks runtime target randomization)
    self._kp1 = np.array([0.02, 0.02, 0.02])
    self._kp2 = np.array([-0.02, -0.02, -0.02])
    self._rng = np.random.default_rng(0)

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    hand = d.site_xpos[self._eeff]
    box = d.geom_xpos[self._box_geom]
    reach = hand - box

    tpos = d.mocap_pos[0]
    tquat = d.mocap_quat[0]
    kp1 = jnp.asarray(self._kp1, d.qpos.dtype)
    kp2 = jnp.asarray(self._kp2, d.qpos.dtype)
    t1 = tpos + mm.rot_vec_quat(tquat, kp1)
    t2 = tpos + mm.rot_vec_quat(tquat, kp2)
    bring = jnp.concatenate([d.site_xpos[self._box1] - t1,
                             d.site_xpos[self._box2] - t2])
    return jnp.concatenate([reach, bring])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: reach (eeff site to box
    geom) + bring (box keypoint sites to mocap-derived targets). The
    mocap target pose is fixed during a rollout, so the two target
    keypoints ride aux rows (pattern: tasks/acrobot.py)."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    geom_pos = np.asarray(g(m.geom_pos))
    geom_bodyid = np.asarray(m.geom_bodyid)
    eeff_b = int(site_bodyid[self._eeff])
    eeff_p = [float(v) for v in site_pos[self._eeff]]
    box_b = int(geom_bodyid[self._box_geom])
    box_p = [float(v) for v in geom_pos[self._box_geom]]
    kp = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
          for s in (self._box1, self._box2)]

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      hand = lm.vadd(xpos[eeff_b], lm.qrot(xquat[eeff_b], cv(eeff_p)))
      box = lm.vadd(xpos[box_b], lm.qrot(xquat[box_b], cv(box_p)))
      rows = [hand[k] - box[k] for k in range(3)]
      for j, (b, p) in enumerate(kp):
        s = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        rows += [s[k] - aux[3 * j + k] for k in range(3)]
      return rows

    def make_aux(d0, params):
      tpos = d0.mocap_pos[0]
      tquat = d0.mocap_quat[0]
      t1 = tpos + mm.rot_vec_quat(tquat, jnp.asarray(self._kp1,
                                                     tpos.dtype))
      t2 = tpos + mm.rot_vec_quat(tquat, jnp.asarray(self._kp2,
                                                     tpos.dtype))
      return jnp.concatenate([t1, t2]).astype(jnp.float32)

    return dict(dim=9, naux=6, fn=fn, make_aux=make_aux)

  def transition(self, d: Data) -> Data:
    """On success (< 15 mm avg keypoint error), teleport the box and
    re-randomize the target pose (reference panda.cc:74-98)."""
    if float(d.time) <= 0:
      return d
    r = np.asarray(jax.device_get(
        self.residual(self.model, d, self.residual_params)))
    bring_dist = 0.5 * (np.linalg.norm(r[3:6]) + np.linalg.norm(r[6:9]))
    if bring_dist < 0.015:
      qpos = np.asarray(jax.device_get(d.qpos)).copy()
      qpos[7:9] = self._rng.uniform(-0.5, 0.5, 2)
      qpos[9] = 0.05
      mp = np.asarray(jax.device_get(d.mocap_pos)).copy()
      mq = np.asarray(jax.device_get(d.mocap_quat)).copy()
      mp[0, :2] = self._rng.uniform(-0.5, 0.5, 2)
      mp[0, 2] = self._rng.uniform(0.03, 1.0)
      q = self._rng.uniform(-1, 1, 4)
      mq[0] = q / max(np.linalg.norm(q), 1e-8)
      d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                    mocap_pos=jnp.asarray(mp, d.mocap_pos.dtype),
                    mocap_quat=jnp.asarray(mq, d.mocap_quat.dtype))
    return d
