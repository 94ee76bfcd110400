"""Bimanual handover task.

Reference capability: the Aloha bimanual tasks (tasks/bimanual/{handover,
insert,reorient}) and notably the reference's own MJX prototype task
(mjx/tasks/bimanual/handover.py) — two arms pass an object between
workspaces. The reference uses Aloha mesh models; this is an
independently-authored pair of 4-DoF arms with grippers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _arm(side, x, flip):
  s = -1 if flip else 1
  return f"""
    <body name="base_{side}" pos="{x} 0 0.05">
      <geom name="base_{side}_geom" type="cylinder" size="0.05 0.05"
            mass="2" contype="0" conaffinity="0"/>
      <body name="l1_{side}" pos="0 0 0.05">
        <joint name="pan_{side}" type="hinge" axis="0 0 1"
               range="-170 170"/>
        <geom name="l1_{side}_geom" type="capsule" fromto="0 0 0 0 0 0.1"
              size="0.035" mass="1" contype="0" conaffinity="0"/>
        <body name="l2_{side}" pos="0 0 0.1">
          <joint name="lift_{side}" type="hinge" axis="0 1 0"
                 range="-100 100"/>
          <geom name="l2_{side}_geom" type="capsule"
                fromto="0 0 0 {s * 0.2} 0 0" size="0.03" mass="0.8"/>
          <body name="l3_{side}" pos="{s * 0.2} 0 0">
            <joint name="elbow_{side}" type="hinge" axis="0 1 0"
                   range="-140 140"/>
            <geom name="l3_{side}_geom" type="capsule"
                  fromto="0 0 0 {s * 0.15} 0 0" size="0.025" mass="0.5"/>
            <site name="hand_{side}" pos="{s * 0.19} 0 0"/>
            <body name="fl_{side}" pos="{s * 0.15} 0.025 0">
              <joint name="grip_l_{side}" type="slide" axis="0 -1 0"
                     range="0 0.02"/>
              <geom name="fl_{side}_geom" type="box"
                    size="0.025 0.005 0.01" pos="{s * 0.025} 0 0"
                    mass="0.05" condim="6" friction="1.5 0.02 0.002"/>
            </body>
            <body name="fr_{side}" pos="{s * 0.15} -0.025 0">
              <joint name="grip_r_{side}" type="slide" axis="0 1 0"
                     range="0 0.02"/>
              <geom name="fr_{side}_geom" type="box"
                    size="0.025 0.005 0.01" pos="{s * 0.025} 0 0"
                    mass="0.05" condim="6" friction="1.5 0.02 0.002"/>
            </body>
          </body>
        </body>
      </body>
    </body>"""


def _acts():
  out = []
  for side in ("left", "right"):
    for j, kp, lo, hi in (("pan", 60, -2.9, 2.9), ("lift", 60, -1.7, 1.7),
                          ("elbow", 40, -2.4, 2.4),
                          ("grip_l", 20, 0, 0.02), ("grip_r", 20, 0, 0.02)):
      out.append(
          f'<position name="{j}_{side}_m" joint="{j}_{side}" kp="{kp}" '
          f'ctrlrange="{lo} {hi}" ctrllimited="true" '
          f'forcerange="-40 40" forcelimited="true"/>')
  return "".join(out)


_XML = f"""
<mujoco model="BimanualHandover">
  <option timestep="0.005" cone="elliptic" impratio="10"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.5" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.1" />
    <numeric name="sampling_trajectories" data="30" />
  </custom>
  <default>
    <joint damping="1.5" armature="0.02"/>
  </default>
  <worldbody>
    <geom name="table" type="box" pos="0 0 -0.02" size="0.8 0.5 0.02"
          friction="1 0.01 0.001"/>
    {_arm("left", -0.45, False)}
    {_arm("right", 0.45, True)}
    <body name="object" pos="-0.15 0 0.03">
      <freejoint/>
      <geom name="obj_geom" type="box" size="0.02 0.02 0.03" mass="0.08"
            condim="6" friction="1.5 0.02 0.002"/>
    </body>
    <body name="target" mocap="true" pos="0.25 0.15 0.03">
      <geom name="target_geom" type="box" size="0.02 0.02 0.03"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_acts()}
  </actuator>
  <sensor>
    <user name="Reach Left" dim="3" user="2 0.5 0 2.0 0.04"/>
    <user name="Reach Right" dim="3" user="2 0.5 0 2.0 0.04"/>
    <user name="Bring" dim="3" user="6 5.0 0 10.0 0.02"/>
    <user name="Control" dim="10" user="0 0.03 0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 0.5 0.8 0.02 0.02 0 0.5 0.8 0.02 0.02
                           -0.15 0 0.03 1 0 0 0"/>
  </keyframe>
</mujoco>
"""


class BimanualHandover(base.Task):
  """Pass the object from the left workspace to the right-side target
  (reference "Bimanual Handover" / MJX prototype task)."""

  name = "Bimanual Handover"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._hand_l = names["site"].index("hand_left")
    self._hand_r = names["site"].index("hand_right")
    self._object = names["body"].index("object")

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    obj = d.xpos[self._object]
    target = d.mocap_pos[0]
    reach_l = d.site_xpos[self._hand_l] - obj
    reach_r = d.site_xpos[self._hand_r] - obj
    bring = obj - target
    return jnp.concatenate([reach_l, reach_r, bring, d.ctrl])

  # object-gripper contacts are load-bearing for planning
  plan_body_pairs = True

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: hand-to-object reach +
    object-to-target bring (mocap target fixed per rollout -> aux)."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    hands = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
             for s in (self._hand_l, self._hand_r)]
    obj = self._object
    nu = int(m.nu)

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      xpos, xquat, ctrl = ctx["xpos"], ctx["xquat"], ctx["ctrl"]
      rows = []
      for b, p in hands:
        h = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        rows += [h[k] - xpos[obj][k] for k in range(3)]
      rows += [xpos[obj][k] - aux[k] for k in range(3)]
      rows += [ctrl[u] for u in range(nu)]
      return rows

    def make_aux(d0, params):
      return d0.mocap_pos[0].astype(jnp.float32)

    return dict(dim=9 + nu, naux=3, fn=fn, make_aux=make_aux)
