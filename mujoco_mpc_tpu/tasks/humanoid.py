"""Humanoid tasks: Stand and Walk.

Reference capability: mjpc/tasks/humanoid/{stand,walk} — Stand residuals
(stand.cc:28-105): Height (head over feet vs goal), Balance (capture point
vs average foot position), CoM velocity, joint velocity, control; Walk
(walk.cc) adds forward-speed and gait terms. 21-actuator humanoid; our MJCF
is an independently-authored classic humanoid topology (abdomen 3, 2x hip 3
+ knee + 2 ankle, 2x shoulder 2 + elbow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _body(side):
  s = 1 if side == "left" else -1
  n = side
  return f"""
        <body name="thigh_{n}" pos="0 {s * 0.1} -0.04">
          <joint name="hip_x_{n}" type="hinge" axis="1 0 0" range="-30 10"
                 damping="5"/>
          <joint name="hip_z_{n}" type="hinge" axis="0 0 1" range="-60 35"
                 damping="5"/>
          <joint name="hip_y_{n}" type="hinge" axis="0 1 0" range="-150 20"
                 damping="5"/>
          <geom name="thigh_{n}_geom" type="capsule"
                fromto="0 0 0 0 {s * 0.01} -0.34" size="0.06" mass="4.5"/>
          <body name="shin_{n}" pos="0 {s * 0.01} -0.4">
            <joint name="knee_{n}" type="hinge" axis="0 -1 0"
                   range="-160 2" damping="1"/>
            <geom name="shin_{n}_geom" type="capsule"
                  fromto="0 0 0 0 0 -0.3" size="0.05" mass="2.7"/>
            <body name="foot_{n}" pos="0 0 -0.35">
              <joint name="ankle_y_{n}" type="hinge" axis="0 1 0"
                     range="-50 50" damping="3"/>
              <joint name="ankle_x_{n}" type="hinge" axis="1 0 0"
                     range="-30 30" damping="3"/>
              <geom name="foot_{n}_geom" type="box"
                    size="0.09 0.045 0.027" pos="0.03 0 -0.01" mass="1.0"/>
              <site name="sp_{n}_front" pos="0.12 0 -0.037"/>
              <site name="sp_{n}_back" pos="-0.06 0 -0.037"/>
            </body>
          </body>
        </body>"""


def _arm(side):
  s = 1 if side == "left" else -1
  n = side
  return f"""
      <body name="upper_arm_{n}" pos="0 {s * 0.17} 0.06">
        <joint name="shoulder1_{n}" type="hinge" axis="2 1 1"
               range="-85 60" damping="1"/>
        <joint name="shoulder2_{n}" type="hinge" axis="0 -1 1"
               range="-85 60" damping="1"/>
        <geom name="uarm_{n}_geom" type="capsule"
              fromto="0 0 0 {s * 0.16} {s * 0.16} -0.16" size="0.04"
              mass="1.5"/>
        <body name="lower_arm_{n}" pos="{s * 0.18} {s * 0.18} -0.18">
          <joint name="elbow_{n}" type="hinge" axis="0 -1 1"
                 range="-90 50" damping="1"/>
          <geom name="larm_{n}_geom" type="capsule"
                fromto="0 0 0 {s * 0.14} {s * 0.14} 0.14" size="0.031"
                mass="1.1"/>
        </body>
      </body>"""


_JOINTS = (
    ["abdomen_z", "abdomen_y", "abdomen_x"] +
    [f"hip_{a}_{s}" for s in ("left", "right") for a in ("x", "z", "y")] +
    [f"knee_{s}" for s in ("left", "right")] +
    [f"ankle_{a}_{s}" for s in ("left", "right") for a in ("y", "x")] +
    [f"shoulder1_{s}" for s in ("left", "right")] +
    [f"shoulder2_{s}" for s in ("left", "right")] +
    [f"elbow_{s}" for s in ("left", "right")])

_GEARS = {"abdomen": 40, "hip": 40, "knee": 80, "ankle": 20, "shoulder": 20,
          "elbow": 40}


def _gear(jname):
  for k, g in _GEARS.items():
    if jname.startswith(k):
      return g
  return 20


_XML = f"""
<mujoco model="Humanoid">
  <option timestep="0.005"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.6" />
    <numeric name="agent_timestep" data="0.015" />
    <numeric name="sampling_spline_points" data="2" />
    <numeric name="sampling_exploration" data="0.08" />
    <numeric name="sampling_trajectories" data="60" />
    <numeric name="residual_Height Goal" data="1.4 0.6 1.6" />
    <numeric name="residual_Speed Goal" data="1.0 0 3" />
  </custom>
  <default>
    <geom friction="0.7 0.005 0.0001" solref="0.015 1"/>
    <joint damping="1" armature="0.01"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="100 100 0.1"/>
    <body name="torso" pos="0 0 1.4">
      <freejoint name="root"/>
      <geom name="torso_geom" type="capsule" fromto="0 -0.07 0 0 0.07 0"
            size="0.11" mass="8.0"/>
      <geom name="head_geom" type="sphere" pos="0 0 0.19" size="0.09"
            mass="1.5"/>
      <site name="head" pos="0 0 0.19"/>
      <body name="waist" pos="-0.01 0 -0.26">
        <joint name="abdomen_z" type="hinge" axis="0 0 1" range="-45 45"
               damping="5"/>
        <joint name="abdomen_y" type="hinge" axis="0 1 0" range="-75 30"
               damping="5"/>
        <joint name="abdomen_x" type="hinge" axis="1 0 0" range="-35 35"
               damping="5"/>
        <geom name="waist_geom" type="capsule" fromto="0 -0.06 0 0 0.06 0"
              size="0.09" mass="5.0"/>
        <body name="pelvis" pos="0 0 -0.165">
          <geom name="pelvis_geom" type="capsule"
                fromto="-0.02 -0.07 0 -0.02 0.07 0" size="0.09" mass="5.5"/>
          {_body("left")}
          {_body("right")}
        </body>
      </body>
      {_arm("left")}
      {_arm("right")}
    </body>
  </worldbody>
  <contact>
    <exclude body1="torso" body2="waist"/>
    <exclude body1="waist" body2="pelvis"/>
  </contact>
  <actuator>
    {"".join(f'<motor name="{j}_m" joint="{j}" gear="{_gear(j)}" '
             f'ctrlrange="-1 1" ctrllimited="true"/>' for j in _JOINTS)}
  </actuator>
  <sensor>
    <user name="Height" dim="1" user="6 100.0 0.0 100.0 0.1"/>
    <user name="Balance" dim="1" user="6 50.0 0.0 100.0 0.1"/>
    <user name="CoM Vel." dim="2" user="0 10.0 0.0 100.0"/>
    <user name="Joint Vel." dim="21" user="0 0.01 0.0 0.1"/>
    <user name="Control" dim="21" user="3 0.025 0.0 0.1 0.3"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 0 1.4 1 0 0 0 {' '.join(['0'] * 21)}"/>
  </keyframe>
</mujoco>
"""


class HumanoidStand(base.Task):
  """Stand upright at target head height (reference "Humanoid Stand")."""

  name = "Humanoid Stand"
  # Stand's residual uses raw comvel (no speed tracking); Walk flips this
  _lane_tracks_speed = False

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._torso = names["body"].index("torso")
    self._head = names["site"].index("head")
    self._feet_sites = [
        names["site"].index(f"sp_{s}_{p}")
        for s in ("left", "right") for p in ("front", "back")
    ]

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    height_goal = params[0]
    feet = d.site_xpos[jnp.array(self._feet_sites)]
    head = d.site_xpos[self._head]
    feet_avg = jnp.mean(feet, axis=0)

    height = (head[2] - feet_avg[2]) - height_goal

    com = d.subtree_com[self._torso]
    comvel = sensors.subtree_linvel(m, d, self._torso)
    capture = com[:2] + 0.2 * comvel[:2]
    balance = jnp.linalg.norm(capture - feet_avg[:2] + 1e-8)

    return jnp.concatenate([
        height[None],
        balance[None],
        comvel[:2],
        d.qvel[6:],
        d.ctrl,
    ])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py (component form).

    Shared by Stand and Walk: aux = [height_goal, speed_goal] and the
    comvel rows become [comvel_x - speed_goal, comvel_y] (Stand passes
    speed_goal = 0, reproducing its raw comvel terms). See
    tasks/quadruped.py lane_residual_spec for the pattern."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    body_mass = np.asarray(g(m.body_mass))
    parent = np.asarray(m.body_parentid)
    torso = self._torso
    feet = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
            for s in self._feet_sites]
    head_b = int(site_bodyid[self._head])
    head_p = [float(v) for v in site_pos[self._head]]
    ids = []
    for b in range(m.nbody):
      a = b
      while a not in (0, torso):
        a = int(parent[a])
      if a == torso:
        ids.append(b)
    total_mass = max(sum(float(body_mass[b]) for b in ids), 1e-12)
    nv, nu = m.nv, m.nu

    def fn(ctx):
      lm, cv = ctx["lm"], ctx["cv"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      scom, ref, cvel = ctx["subtree_com"], ctx["ref"], ctx["cvel"]
      aux, qvel, ctrl = ctx["aux"], ctx["qvel"], ctx["ctrl"]
      fps = [lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p))) for b, p in feet]
      favg = tuple(sum(p[k] for p in fps) / len(fps) for k in range(3))
      head = lm.vadd(xpos[head_b], lm.qrot(xquat[head_b], cv(head_p)))
      rows = [head[2] - favg[2] - aux[0]]
      comvel = [0.0, 0.0, 0.0]
      for b in ids:
        ang_b, lin_b = cvel[b]
        linv = lm.vadd(lin_b, lm.vcross(ang_b, lm.vsub(xipos[b], ref[b])))
        for k in range(3):
          comvel[k] = comvel[k] + float(body_mass[b]) * linv[k]
      comvel = [v / total_mass for v in comvel]
      dx = scom[torso][0] + 0.2 * comvel[0] - favg[0] + 1e-8
      dy = scom[torso][1] + 0.2 * comvel[1] - favg[1] + 1e-8
      rows.append(jnp.sqrt(dx * dx + dy * dy))
      rows.append(comvel[0] - aux[1])
      rows.append(comvel[1])
      rows += [qvel[i] for i in range(6, nv)]
      rows += list(ctrl)
      return rows

    track_speed = self._lane_tracks_speed

    def make_aux(d0, params):
      speed = (params[1] if track_speed and params.shape[0] > 1
               else jnp.zeros_like(params[0]))
      return jnp.stack([params[0], speed])

    return dict(dim=4 + (nv - 6) + nu, naux=2, fn=fn, make_aux=make_aux)


class HumanoidWalk(HumanoidStand):
  """Walk forward at target speed (reference "Humanoid Walk")."""

  name = "Humanoid Walk"
  _lane_tracks_speed = True

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    height_goal, speed_goal = params[0], params[1]
    feet = d.site_xpos[jnp.array(self._feet_sites)]
    head = d.site_xpos[self._head]
    feet_avg = jnp.mean(feet, axis=0)
    height = (head[2] - feet_avg[2]) - height_goal

    com = d.subtree_com[self._torso]
    comvel = sensors.subtree_linvel(m, d, self._torso)
    capture = com[:2] + 0.2 * comvel[:2]
    balance = jnp.linalg.norm(capture - feet_avg[:2] + 1e-8)

    # replace com-vel-zero with forward-speed tracking
    speed = comvel[0] - speed_goal
    return jnp.concatenate([
        height[None],
        balance[None],
        jnp.stack([speed, comvel[1]]),
        d.qvel[6:],
        d.ctrl,
    ])
