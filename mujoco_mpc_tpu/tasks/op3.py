"""OP3 stand / handstand task.

Reference capability: mjpc/tasks/op3 (stand.cc:34-172, task.xml) — a
kid-size humanoid robot with two modes (Stand | Handstand,
task_transition). Residuals: Height (head-over-feet or feet-over-hands
error vs the Height Goal parameter), Balance (capture point with a 50 ms
fall time vs average support xy), CoM xy velocity, Ctrl Diff (ctrl vs the
mode keyframe's joint pose), Upright (13 rows of support-limb and torso
up-vector alignment, sign-flipped in handstand), Joint Vel. The
transition switches the Height Goal per mode (kModeHeight = 0.38/0.57,
stand.cc:155-166).

The reference uses the Robotis OP3 mesh model; this is an independently-
authored 18-joint biped rig (the real OP3 leg layout: hip yaw/roll/pitch, knee, ankle pitch/roll per leg; 3-dof arms) exercising the same machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

MODE_STAND, MODE_HANDSTAND = 0, 1
MODE_HEIGHT = (0.30, 0.45)   # stand / handstand height goals (our rig)
FALL_TIME = 0.05
# appended traced state slot
S_MODE = 1
NPARAM = 2


def _leg(side, sign):
  # 6 dofs per leg (hip yaw/roll/pitch, knee, ankle pitch/roll) — the
  # real ROBOTIS OP3 leg layout (reference task.xml Ctrl Diff dim 18)
  return f"""
      <body name="thigh_{side}" pos="0 {sign * 0.05} -0.08">
        <joint name="hip_y_{side}" type="hinge" axis="0 0 1"
               range="-60 60"/>
        <joint name="hip_r_{side}" type="hinge" axis="1 0 0"
               range="-30 30"/>
        <joint name="hip_p_{side}" type="hinge" axis="0 1 0"
               range="-120 60"/>
        <geom name="thigh_{side}_g" type="capsule"
              fromto="0 0 0 0 0 -0.11" size="0.022" mass="0.6"/>
        <body name="shin_{side}" pos="0 0 -0.11">
          <joint name="knee_{side}" type="hinge" axis="0 1 0"
                 range="-5 150"/>
          <geom name="shin_{side}_g" type="capsule"
                fromto="0 0 0 0 0 -0.11" size="0.02" mass="0.4"/>
          <body name="foot_{side}" pos="0 0 -0.11">
            <joint name="ankle_{side}" type="hinge" axis="0 1 0"
                   range="-60 60"/>
            <joint name="ankle_r_{side}" type="hinge" axis="1 0 0"
                   range="-30 30"/>
            <geom name="foot_{side}_g" type="box" size="0.05 0.028 0.012"
                  pos="0.015 0 -0.012" mass="0.15"
                  friction="1.2 0.02 0.001"/>
            <site name="foot_{side}_s" pos="0.015 0 -0.024"/>
          </body>
        </body>
      </body>"""


def _arm(side, sign):
  return f"""
      <body name="uarm_{side}" pos="0 {sign * 0.09} 0.05">
        <joint name="sho_p_{side}" type="hinge" axis="0 1 0"
               range="-200 200"/>
        <joint name="sho_r_{side}" type="hinge" axis="1 0 0"
               range="-90 90"/>
        <geom name="uarm_{side}_g" type="capsule"
              fromto="0 0 0 0 0 -0.09" size="0.018" mass="0.3"/>
        <body name="farm_{side}" pos="0 0 -0.09">
          <joint name="elbow_{side}" type="hinge" axis="0 1 0"
                 range="-150 5"/>
          <geom name="farm_{side}_g" type="capsule"
                fromto="0 0 0 0 0 -0.09" size="0.016" mass="0.2"/>
          <body name="hand_{side}" pos="0 0 -0.09">
            <geom name="hand_{side}_g" type="sphere" size="0.02"
                  mass="0.05" friction="1.2 0.02 0.001"/>
            <site name="hand_{side}_s" pos="0 0 -0.02"/>
          </body>
        </body>
      </body>"""


_JOINTS = [f"{j}_{s}" for s in ("r", "l")
           for j in ("hip_y", "hip_r", "hip_p", "knee", "ankle",
                     "ankle_r")] + \
          [f"{j}_{s}" for s in ("r", "l")
           for j in ("sho_p", "sho_r", "elbow")]

_RANGES = {
    "hip_y": (-1.0, 1.0), "hip_p": (-2.0, 1.0), "hip_r": (-0.5, 0.5),
    "knee": (-0.05, 2.6), "ankle": (-1.0, 1.0), "ankle_r": (-0.5, 0.5),
    "sho_p": (-3.4, 3.4), "sho_r": (-1.5, 1.5), "elbow": (-2.6, 0.05),
}

_ACT = "".join(
    f'<position name="{j}_m" joint="{j}" kp="20" '
    f'ctrlrange="{_RANGES[j.rsplit("_", 1)[0]][0]} '
    f'{_RANGES[j.rsplit("_", 1)[0]][1]}" ctrllimited="true" '
    f'forcerange="-8 8" forcelimited="true"/>' for j in _JOINTS)

# stand: slight crouch; handstand: arms straight down (inverted pose)
# per-leg order: hip_y hip_r hip_p knee ankle ankle_r
_STAND_JOINTS = "0 0 -0.4 0.8 -0.4 0 " * 2 + "0.2 0 -0.3 " * 2
_HANDSTAND_JOINTS = "0 0 -0.6 1.2 -0.6 0 " * 2 + "3.14 0 0 " * 2

_XML = f"""
<mujoco model="OP3">
  <option timestep="0.005"/>
  <custom>
    <text name="task_transition" data="Stand|Handstand"/>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.5" />
    <numeric name="agent_timestep" data="0.015" />
    <numeric name="sampling_trajectories" data="64"/>
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.1" />
    <numeric name="residual_Height Goal" data="0.30 0.0 0.75" />
  </custom>
  <default>
    <geom friction="0.9 0.02 0.0001" solref="0.01 1"/>
    <joint damping="0.6" armature="0.01"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body name="torso" pos="0 0 0.31">
      <freejoint name="root"/>
      <geom name="torso_g" type="box" size="0.05 0.07 0.09" mass="1.4"/>
      <site name="head" pos="0 0 0.13"/>
      <geom name="head_g" type="sphere" size="0.035" pos="0 0 0.13"
            mass="0.2" contype="0" conaffinity="0"/>
      {_leg("r", -1)}
      {_leg("l", 1)}
      {_arm("r", -1)}
      {_arm("l", 1)}
    </body>
  </worldbody>
  <contact>
    <exclude body1="torso" body2="thigh_r"/>
    <exclude body1="torso" body2="thigh_l"/>
    <exclude body1="torso" body2="uarm_r"/>
    <exclude body1="torso" body2="uarm_l"/>
  </contact>
  <actuator>
    {_ACT}
  </actuator>
  <sensor>
    <user name="Height" dim="1" user="6 100.0 0.0 100.0 0.1" />
    <user name="Balance" dim="1" user="6 50.0 0.0 100.0 0.1" />
    <user name="CoM Vel." dim="2" user="0 10.0 0.0 100.0" />
    <user name="Ctrl Diff" dim="18" user="0 0.25 0.0 1.0" />
    <user name="Upright" dim="13" user="2 5.0 0.0 25.0 0.01" />
    <user name="Joint Vel" dim="18" user="0 1.0e-5 0 1.0e-3" />
  </sensor>
  <keyframe>
    <key name="home" qpos="0 0 0.31 1 0 0 0 {_STAND_JOINTS}"/>
    <key name="handstand" qpos="0 0 0.36 0 1 0 0 {_HANDSTAND_JOINTS}"/>
  </keyframe>
</mujoco>
"""


class OP3(base.Task):
  """Stand (or handstand) balance for a small biped robot."""

  name = "OP3"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._torso = names["body"].index("torso")
    self._head = names["site"].index("head")
    self._foot = {s: names["body"].index(f"foot_{s}") for s in "rl"}
    self._hand = {s: names["body"].index(f"hand_{s}") for s in "rl"}
    self._foot_s = {s: names["site"].index(f"foot_{s}_s") for s in "rl"}
    self._hand_s = {s: names["site"].index(f"hand_{s}_s") for s in "rl"}
    keys = {}
    for k in range(self.mjm.nkey):
      keys[self.mjm.key(k).name] = np.array(self.mjm.key_qpos[k])
    self._key_joints = jnp.asarray(
        np.stack([keys["home"][7:], keys["handstand"][7:]]), jnp.float32)
    state0 = np.zeros(NPARAM - 1, np.float32)
    self.residual_params = jnp.concatenate(
        [self.residual_params, jnp.asarray(state0)])
    self._current_mode = MODE_STAND

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    dtype = d.qpos.dtype
    mode = params[S_MODE]
    is_hand = mode == MODE_HANDSTAND
    height_goal = params[0]

    head = d.site_xpos[self._head]
    foot_r = d.site_xpos[self._foot_s["r"]]
    foot_l = d.site_xpos[self._foot_s["l"]]
    hand_r = d.site_xpos[self._hand_s["r"]]
    hand_l = d.site_xpos[self._hand_s["l"]]

    # Height: head over feet (stand) / feet over hands (handstand)
    h_stand = head[2] - 0.5 * (foot_r[2] + foot_l[2])
    h_hand = 0.5 * (foot_r[2] + foot_l[2]) - 0.5 * (hand_r[2] - hand_l[2])
    height = jnp.where(is_hand, h_hand, h_stand) - height_goal

    # Balance: capture point vs average support xy
    compos = d.subtree_com[self._torso]
    comvel = sensors.subtree_linvel(m, d, self._torso)
    capture = compos[:2] + FALL_TIME * comvel[:2]
    sup_stand = 0.5 * (foot_r[:2] + foot_l[:2])
    sup_hand = 0.5 * (hand_r[:2] + hand_l[:2])
    support = jnp.where(is_hand, sup_hand, sup_stand)
    balance = jnp.linalg.norm(support - capture)

    # CoM xy velocity
    com_vel = comvel[:2]

    # Ctrl diff vs mode keyframe joints
    key_joints = jnp.where(is_hand, self._key_joints[1],
                           self._key_joints[0])
    ctrl_diff = d.ctrl - key_joints

    # Upright (13): support-limb and torso up-vectors
    z = jnp.asarray([0.0, 0.0, 1.0], dtype)
    up = lambda b: d.xmat[b][:, 2]
    torso_up = up(self._torso)
    s_rows = jnp.concatenate([
        0.1 * (up(self._foot["r"]) - z), 0.1 * (up(self._foot["l"]) - z),
        (torso_up[2] - 1.0)[None], jnp.zeros(6, dtype)])
    h_rows = jnp.concatenate([
        0.1 * (up(self._hand["r"]) - z), 0.1 * (up(self._hand["l"]) + z),
        0.1 * (up(self._foot["r"]) + z), 0.1 * (up(self._foot["l"]) + z),
        (torso_up[2] + 1.0)[None]])
    upright = jnp.where(is_hand, h_rows, s_rows)

    joint_vel = d.qvel[6:]

    return jnp.concatenate([
        height[None], balance[None], com_vel, ctrl_diff, upright,
        joint_vel])

  def transition(self, d: Data) -> Data:
    """Mode switch updates the Height Goal (stand.cc:155-166)."""
    if self.mode != self._current_mode:
      self._current_mode = self.mode
      p = np.asarray(jax.device_get(self.residual_params)).copy()
      p[0] = MODE_HEIGHT[self.mode]
      p[S_MODE] = self.mode
      self.residual_params = jnp.asarray(p, jnp.float32)
    return d

  # ---- lane-kernel in-kernel residual (Stand mode) ----

  # handstand runs on the XLA pipeline planner
  lane_modes = (MODE_STAND,)

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py (component form), Stand
    branch of residual() above row for row (pattern:
    tasks/humanoid.py lane_residual_spec)."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    body_mass = np.asarray(g(m.body_mass))
    torso = self._torso
    head_b = int(site_bodyid[self._head])
    head_p = [float(v) for v in site_pos[self._head]]
    feet_s = [(int(site_bodyid[self._foot_s[s]]),
               [float(v) for v in site_pos[self._foot_s[s]]])
              for s in "rl"]
    foot_bodies = [self._foot["r"], self._foot["l"]]
    # torso is the root body: its subtree is every non-world body
    ids = list(range(1, int(m.nbody)))
    total_mass = max(sum(float(body_mass[b]) for b in ids), 1e-12)
    stand_joints = [float(v)
                    for v in np.asarray(g(self._key_joints[MODE_STAND]))]
    nv, nu = int(m.nv), int(m.nu)

    def fn(ctx):
      lm, cv = ctx["lm"], ctx["cv"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      scom, ref, cvel = ctx["subtree_com"], ctx["ref"], ctx["cvel"]
      aux, qvel, ctrl = ctx["aux"], ctx["qvel"], ctx["ctrl"]
      up = lambda b: lm.qrot(xquat[b], cv([0.0, 0.0, 1.0]))
      fps = [lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
             for b, p in feet_s]
      head = lm.vadd(xpos[head_b], lm.qrot(xquat[head_b], cv(head_p)))
      # Height (stand): head z over average foot z
      rows = [head[2] - 0.5 * (fps[0][2] + fps[1][2]) - aux[0]]
      # Balance: |support_xy - capture_xy|
      comvel = [0.0, 0.0, 0.0]
      for b in ids:
        ang_b, lin_b = cvel[b]
        linv = lm.vadd(lin_b, lm.vcross(ang_b, lm.vsub(xipos[b], ref[b])))
        for k in range(3):
          comvel[k] = comvel[k] + float(body_mass[b]) * linv[k]
      comvel = [v / total_mass for v in comvel]
      sup = [0.5 * (fps[0][k] + fps[1][k]) for k in range(2)]
      dx = sup[0] - (scom[torso][0] + FALL_TIME * comvel[0])
      dy = sup[1] - (scom[torso][1] + FALL_TIME * comvel[1])
      rows.append(jnp.sqrt(dx * dx + dy * dy))
      # CoM xy velocity
      rows += [comvel[0], comvel[1]]
      # Ctrl diff vs stand keyframe joints
      rows += [ctrl[u] - stand_joints[u] for u in range(nu)]
      # Upright (13): feet + torso up-vectors, stand branch
      z = [0.0, 0.0, 1.0]
      for b in foot_bodies:
        ub = up(b)
        rows += [0.1 * (ub[k] - z[k]) for k in range(3)]
      rows.append(up(torso)[2] - 1.0)
      rows += [qvel[0] * 0.0] * 6
      # Joint velocities
      rows += [qvel[i] for i in range(6, nv)]
      return rows

    def make_aux(d0, params):
      return params[0][None]

    return dict(dim=4 + nu + 13 + (nv - 6), naux=1, fn=fn,
                make_aux=make_aux)
