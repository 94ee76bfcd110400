"""Quadruped locomotion task with the full gait/mode machine.

Reference capability: mjpc/tasks/quadruped (quadruped.{h,cc}) — the
flagship benchmark workload (BASELINE.md config 3) plus the complete mode
machinery: modes Quadruped | Biped | Walk | Scramble | Flip
(quadruped.h:39-46), gaits Stand | Walk | Trot | Canter | Gallop with the
phase-signature and parameter tables (quadruped.h:77-101), automatic gait
switching from filtered CoM speed (quadruped.cc:255-282), the prescribed
Walk trajectory that drags the goal mocap around a circle
(quadruped.cc:300-341, Walk() quadruped.cc:627-645), and the Flip
trajectory (piecewise crouch/leap/flight/land height + orientation
profiles computed in ResetLocked, quadruped.cc:556-599, FlipHeight/
FlipQuat quadruped.cc:676-712).

TPU design: the residual is a pure JAX function; ALL mode/gait dependence
rides traced residual params (mode id, phase clock, flip quat, walk
origin appended after the XML numerics), so switching modes or gaits at
runtime never recompiles the planner. The host-side `transition()` is the
reference's TransitionLocked: it updates those slots, moves the goal
mocap in Walk mode, applies per-gait cost weights, and saves/restores
weights around a Flip.

The robot model is our own 12-DoF quadruped rig (the reference uses a
Unitree A1 mesh model); the task machinery is the ported capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

# modes (reference A1Mode, quadruped.h:39-46)
MODE_QUADRUPED, MODE_BIPED, MODE_WALK, MODE_SCRAMBLE, MODE_FLIP = range(5)
# gaits (reference A1Gait, quadruped.h:58-65)
GAIT_STAND, GAIT_WALK, GAIT_TROT, GAIT_CANTER, GAIT_GALLOP = range(5)

# gait phase signature per foot FL, HL, FR, HR (kGaitPhase)
GAIT_PHASE = np.array([
    [0.00, 0.00, 0.00, 0.00],   # stand
    [0.00, 0.75, 0.50, 0.25],   # walk
    [0.00, 0.50, 0.50, 0.00],   # trot
    [0.00, 0.33, 0.33, 0.66],   # canter
    [0.00, 0.40, 0.05, 0.35],   # gallop
])
# per-gait parameters: duty, cadence, amplitude, balance w, upright w,
# height w (kGaitParam)
GAIT_PARAM = np.array([
    [1.00, 1.0, 0.00, 0.00, 1.0, 1.0],   # stand
    [0.75, 1.0, 0.03, 0.00, 1.0, 1.0],   # walk
    [0.45, 2.0, 0.03, 0.20, 1.0, 1.0],   # trot
    [0.40, 4.0, 0.05, 0.03, 0.5, 0.2],   # canter
    [0.30, 3.5, 0.10, 0.03, 0.2, 0.1],   # gallop
])
# lower speed bound for auto-switching into each gait (kGaitAuto)
GAIT_AUTO = (0.0, 0.02, 0.02, 0.6, 2.0)
AUTO_GAIT_FILTER = 0.2    # s, com speed filter (kAutoGaitFilter)
AUTO_GAIT_MIN_TIME = 1.0  # s, min time between switches
FOOT_RADIUS = 0.02
HEIGHT_QUADRUPED = 0.25
HEIGHT_BIPED = 0.6
MIN_ANGVEL = 0.01
POSTURE_GAIN = (2.0, 1.0, 1.0)  # abduction, hip, knee (kJointPostureGain)
# flip profile heights (kCrouchHeight / kLeapHeight / kMaxHeight)
CROUCH_HEIGHT = 0.15
LEAP_HEIGHT = 0.5
MAX_HEIGHT = 0.8

# XML residual-param indices (same order as the reference task_flat.xml)
P_GAIT = 0
P_GAIT_SWITCH = 1
P_CADENCE = 2
P_AMPLITUDE = 3
P_DUTY = 4
P_WALK_SPEED = 5
P_WALK_TURN = 6
P_FLIP_DIR = 7
P_BIPED_TYPE = 8
P_HEADING = 9
NPARAM_XML = 10
# appended traced mode-state slots (the reference keeps these as
# ResidualFn member state snapshotted per plan iteration; here they are
# traced params so mode changes never recompile)
S_MODE = 10
S_MODE_START = 11
S_PHASE_START = 12
S_PHASE_START_T = 13
S_PHASE_VEL = 14
S_FLIP_QUAT = 15    # 4 slots (w x y z): orientation at flip start
S_GROUND = 19
S_WALK_POS = 20     # 2 slots: rotation axis / origin
S_WALK_HEAD = 22    # 2 slots: axis->goal vector at walk start
NPARAM = 24


def _leg(name, x, y):
  return f"""
      <body name="hip_{name}" pos="{x} {y} 0">
        <joint name="abd_{name}" type="hinge" axis="1 0 0" range="-45 45"/>
        <geom name="hip_{name}_geom" type="sphere" size="0.035" mass="0.6"/>
        <body name="thigh_{name}" pos="0 {0.06 if y > 0 else -0.06} 0">
          <joint name="hip2_{name}" type="hinge" axis="0 1 0"
                 range="-120 60"/>
          <geom name="thigh_{name}_geom" type="capsule"
                fromto="0 0 0 0 0 -0.2" size="0.02" mass="0.8"/>
          <body name="calf_{name}" pos="0 0 -0.2">
            <joint name="knee_{name}" type="hinge" axis="0 1 0"
                   range="-154 -30"/>
            <geom name="calf_{name}_geom" type="capsule"
                  fromto="0 0 0 0 0 -0.2" size="0.015" mass="0.2"/>
            <geom name="foot_{name}" type="sphere" pos="0 0 -0.2"
                  size="0.02" mass="0.05" priority="1" condim="6"
                  friction="0.8 0.02 0.01"/>
          </body>
        </body>
      </body>"""


_ACT = "".join(
    f'<position name="{j}_{leg}_m" joint="{j}_{leg}" kp="60" '
    f'ctrlrange="{lo} {hi}" ctrllimited="true" forcerange="-33 33" '
    f'forcelimited="true"/>'
    for leg in ("fl", "hl", "fr", "hr")
    for j, lo, hi in (("abd", -0.6, 0.6), ("hip2", -2.0, 1.0),
                      ("knee", -2.6, -0.6)))


_XML = f"""
<mujoco model="Quadruped">
  <option timestep="0.005" cone="elliptic" impratio="10"/>
  <custom>
    <text name="task_transition" data="Quadruped|Biped|Walk|Scramble|Flip"/>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.35" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_trajectories" data="60"/>
    <numeric name="sampling_exploration" data="0.04" />
    <numeric name="residual_select_Gait" data="2"/>
    <text name="residual_list_Gait" data="Stand|Walk|Trot|Canter|Gallop"/>
    <numeric name="residual_select_Gait switch" data="1"/>
    <text name="residual_list_Gait switch" data="Manual|Automatic"/>
    <numeric name="residual_Cadence" data="2 0 4" />
    <numeric name="residual_Amplitude" data="0.06 0 0.2" />
    <numeric name="residual_Duty ratio" data="0.45 0 1"/>
    <numeric name="residual_Walk speed" data="0 0 4"/>
    <numeric name="residual_Walk turn" data="0 -2 2"/>
    <numeric name="residual_select_Flip dir" data="0"/>
    <text name="residual_list_Flip dir" data="Back Flip|Front Flip"/>
    <numeric name="residual_select_Biped type" data="0"/>
    <text name="residual_list_Biped type" data="Foot Stand|Hand Stand"/>
    <numeric name="residual_Heading" data="0 -3.14 3.14" />
    <numeric name="max_contact_points" data="12" />
    <numeric name="solver_iterations" data="4" />
  </custom>
  <default>
    <geom friction="0.7 0.02 0.0001" solref="0.01 1"/>
    <joint damping="0.6" armature="0.01"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" size="50 50 0.1"/>
    <body name="trunk" pos="0 0 0.27">
      <freejoint name="root"/>
      <geom name="trunk_geom" type="box" size="0.19 0.06 0.055"
            mass="4.8"/>
      <site name="head" pos="0.22 0 0"/>
      {_leg("fl", 0.17, 0.12)}
      {_leg("hl", -0.17, 0.12)}
      {_leg("fr", 0.17, -0.12)}
      {_leg("hr", -0.17, -0.12)}
    </body>
    <body name="goal" mocap="true" pos="2 0 0.25">
      <geom name="goal_geom" type="sphere" size="0.05" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_ACT}
  </actuator>
  <sensor>
    <user name="Upright" dim="3" user="6 1 0 3 0.05"/>
    <user name="Height" dim="1" user="6 1 0 3 0.04"/>
    <user name="Position" dim="3" user="2 0.2 0 0.5 0.1"/>
    <user name="Gait" dim="4" user="6 2 0 10 0.03"/>
    <user name="Balance" dim="2" user="2 0.2 0 0.3 0.1"/>
    <user name="Effort" dim="12" user="0 0.03 0.0 0.1"/>
    <user name="Posture" dim="12" user="0 0.02 0.0 0.1"/>
    <user name="Orientation" dim="2" user="0 0 0 .03"/>
    <user name="Angmom" dim="3" user="0 0 0 .03"/>
  </sensor>
  <keyframe>
    <key name="home"
         qpos="0 0 0.27 1 0 0 0 {' '.join(['0 0.9 -1.8'] * 4)}"/>
    <key name="crouch"
         qpos="0 0 0.16 1 0 0 0 {' '.join(['0 1.2 -2.4'] * 4)}"/>
  </keyframe>
</mujoco>
"""


class QuadrupedFlat(base.Task):
  """Goal-seeking locomotion with the full gait/mode machine."""

  name = "Quadruped Flat"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._trunk = names["body"].index("trunk")
    self._head = names["site"].index("head")
    self._feet_geoms = [names["geom"].index(f"foot_{l}")
                        for l in ("fl", "hl", "fr", "hr")]
    # planning-contact whitelist for the lane kernel: only the feet
    # collide during candidate rollouts (reference tasks use simplified
    # planning collision models in the same spirit)
    self.plan_contact_geoms = frozenset(self._feet_geoms)
    home = self.home_qpos
    self._home_joints = jnp.asarray(home[7:], jnp.float32)
    crouch = None
    for k in range(self.mjm.nkey):
      if self.mjm.key(k).name == "crouch":
        crouch = np.array(self.mjm.key_qpos[k])
    self._crouch_joints = jnp.asarray(crouch[7:], jnp.float32)

    # flip-trajectory constants (reference ResetLocked,
    # quadruped.cc:556-599)
    grav = float(np.linalg.norm(
        np.asarray(jax.device_get(self.model.opt.gravity))))
    self._gravity = grav
    self._jump_vel = float(np.sqrt(2 * grav * (MAX_HEIGHT - LEAP_HEIGHT)))
    self._flight_time = 2 * self._jump_vel / grav
    self._jump_acc = (self._jump_vel ** 2 /
                      (2 * (LEAP_HEIGHT - CROUCH_HEIGHT)))
    self._crouch_time = float(np.sqrt(
        2 * (HEIGHT_QUADRUPED - CROUCH_HEIGHT) / self._jump_acc))
    self._leap_time = self._jump_vel / self._jump_acc
    self._jump_time = self._crouch_time + self._leap_time
    self._crouch_vel = -self._jump_acc * self._crouch_time
    self._land_time = 2 * (LEAP_HEIGHT - HEIGHT_QUADRUPED) / self._jump_vel
    self._land_acc = self._jump_vel / self._land_time
    self._flight_rot_vel = 1.25 * np.pi / self._flight_time
    self._jump_rot_vel = (np.pi / self._leap_time - self._flight_rot_vel)
    self._jump_rot_acc = ((self._flight_rot_vel - self._jump_rot_vel) /
                          self._leap_time)
    self._land_rot_acc = (
        2 * (self._flight_rot_vel * self._land_time - np.pi / 4) /
        (self._land_time ** 2))

    # appended traced mode-state slots
    state0 = np.zeros(NPARAM - NPARAM_XML, np.float32)
    state0[S_MODE - NPARAM_XML] = MODE_QUADRUPED
    state0[S_PHASE_VEL - NPARAM_XML] = (
        2 * np.pi * float(self.residual_params[P_CADENCE]))
    state0[S_FLIP_QUAT - NPARAM_XML] = 1.0  # identity quat w
    self.residual_params = jnp.concatenate(
        [self.residual_params, jnp.asarray(state0)])

    # host-side transition bookkeeping (reference ResidualFn state that
    # is NOT needed inside the residual)
    self._last_transition_time = -1.0
    self._com_vel = np.zeros(2)
    self._gait_switch_time = 0.0
    self._current_gait = float(self.residual_params[P_GAIT])
    self._save_weights = None
    self._save_gait_switch = 0.0
    self._current_mode = MODE_QUADRUPED

  def xml(self) -> str:
    return _XML

  # ---- flip profile (FlipHeight / FlipQuat, quadruped.cc:676-712) ----

  def _flip_height(self, ft, ground):
    jt, flt, lt = self._jump_time, self._flight_time, self._land_time
    h_jump = (HEIGHT_QUADRUPED + ft * self._crouch_vel +
              0.5 * ft * ft * self._jump_acc)
    tf = ft - jt
    h_flight = LEAP_HEIGHT + self._jump_vel * tf - 0.5 * 9.81 * tf * tf
    tl = ft - jt - flt
    h_land = (LEAP_HEIGHT - self._jump_vel * tl +
              0.5 * self._land_acc * tl * tl)
    h = jnp.where(ft < jt, h_jump,
                  jnp.where(ft < jt + flt, h_flight, h_land))
    h = jnp.where(ft >= jt + flt + lt, HEIGHT_QUADRUPED, h)
    return h + ground

  def _flip_angle(self, ft):
    ct, jt = self._crouch_time, self._jump_time
    flt, lt = self._flight_time, self._land_time
    tj = ft - ct
    a_leap = 0.5 * self._jump_rot_acc * tj * tj + self._jump_rot_vel * tj
    tf = ft - jt
    a_flight = np.pi / 2 + self._flight_rot_vel * tf
    tl = ft - jt - flt
    a_land = (1.75 * np.pi + self._flight_rot_vel * tl -
              0.5 * self._land_rot_acc * tl * tl)
    angle = jnp.where(ft < ct, 0.0,
                      jnp.where(ft < jt, a_leap,
                                jnp.where(ft < jt + flt, a_flight, a_land)))
    return jnp.where(ft >= jt + flt + lt, 2 * np.pi, angle)

  def _flip_quat(self, ft, params):
    angle = self._flip_angle(ft)
    flip_dir = params[P_FLIP_DIR]
    axis_y = jnp.where(flip_dir > 0.5, 1.0, -1.0)
    dq = mm.axis_angle_to_quat(
        jnp.stack([jnp.zeros_like(axis_y), axis_y,
                   jnp.zeros_like(axis_y)]), angle)
    return mm.mul_quat(params[S_FLIP_QUAT:S_FLIP_QUAT + 4], dq)

  # ---- residual (reference Residual, quadruped.cc:33-224) ----

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    dtype = d.qpos.dtype
    trunk = self._trunk
    mode = params[S_MODE]
    is_biped = mode == MODE_BIPED
    is_walk = mode == MODE_WALK
    is_scramble = mode == MODE_SCRAMBLE
    is_flip = mode == MODE_FLIP
    handstand = params[P_BIPED_TYPE] > 0.5
    flip_time = d.time - params[S_MODE_START]

    foot_pos = d.geom_xpos[jnp.array(self._feet_geoms)]
    # average foot position (AverageFootPos: biped averages the two
    # stance feet only)
    avg_quad = jnp.mean(foot_pos, axis=0)
    avg_front = 0.5 * (foot_pos[0] + foot_pos[2])   # FL + FR
    avg_hind = 0.5 * (foot_pos[1] + foot_pos[3])    # HL + HR
    avg_biped = jnp.where(handstand, avg_front, avg_hind)
    avg_foot = jnp.where(is_biped, avg_biped, avg_quad)

    torso_mat = d.xmat[trunk]
    torso_pos = d.xipos[trunk]
    torso_quat = d.xquat[trunk]

    # ---- Upright (3) ----
    hs_sign = jnp.where(handstand, -1.0, 1.0)
    up_quad = jnp.stack([torso_mat[2, 2] - 1.0,
                         jnp.zeros((), dtype), jnp.zeros((), dtype)])
    up_biped = jnp.stack([torso_mat[2, 0] - hs_sign,
                          jnp.zeros((), dtype), jnp.zeros((), dtype)])
    up_flip = mm.quat_sub(torso_quat, self._flip_quat(flip_time, params))
    upright = jnp.where(is_flip, up_flip,
                        jnp.where(is_biped, up_biped, up_quad))

    # ---- Height (1) ----
    height_goal = jnp.where(is_biped, HEIGHT_BIPED, HEIGHT_QUADRUPED)
    h_normal = (torso_pos[2] - avg_foot[2]) - height_goal
    h_flip = torso_pos[2] - self._flip_height(flip_time, params[S_GROUND])
    height = jnp.where(is_scramble, 0.0,
                       jnp.where(is_flip, h_flip, h_normal))

    # ---- Position (3) ----
    head = d.site_xpos[self._head]
    goal = d.mocap_pos[0]
    # Walk target moves DURING rollouts: target(t) from the saved walk
    # origin/heading (reference evaluates Walk() inside the residual)
    walk_t = d.time - params[S_MODE_START]
    target_walk = self._walk_pos(params, walk_t)
    tx = jnp.where(is_walk, target_walk[0], goal[0])
    ty = jnp.where(is_walk, target_walk[1], goal[1])
    pz = jnp.where(is_scramble, 2.0 * (head[2] - goal[2]), 0.0)
    position = jnp.stack([head[0] - tx, head[1] - ty, pz])

    # ---- Gait (4) ----
    gait = jnp.where(is_biped, GAIT_TROT,
                     params[P_GAIT]).astype(jnp.int32)
    footphase = 2 * jnp.pi * jnp.asarray(GAIT_PHASE, dtype)[gait]
    phase = (params[S_PHASE_START] +
             (d.time - params[S_PHASE_START_T]) * params[S_PHASE_VEL])
    duty = params[P_DUTY]
    amplitude = params[P_AMPLITUDE]
    ang = jnp.mod(phase - footphase + jnp.pi, 2 * jnp.pi) - jnp.pi
    ang = ang * 0.5 / jnp.maximum(1.0 - duty, 1e-3)
    step_v = jnp.abs(jnp.cos(jnp.clip(ang, -jnp.pi / 2, jnp.pi / 2)))
    step_v = jnp.where(step_v < 1e-6, 0.0, step_v)
    step = amplitude * jnp.where(duty < 1.0, step_v, 0.0)
    target = FOOT_RADIUS + step       # flat ground height = 0
    diff = foot_pos[:, 2] - target
    # scramble: feet above target not penalized
    diff = jnp.where(is_scramble, jnp.minimum(diff, 0.0), diff)
    gait_res = jnp.where(step > 0, diff, 0.0)
    # biped: ignore the "hands"
    front_mask = jnp.asarray([1.0, 0.0, 1.0, 0.0], dtype)
    hand_mask = jnp.where(handstand, 1.0 - front_mask, front_mask)
    gait_res = jnp.where(is_biped & (hand_mask > 0), 0.0, gait_res)

    # ---- Balance (2) ----
    comvel = sensors.subtree_linvel(m, d, trunk)
    compos = d.subtree_com[trunk]
    fall_time = jnp.sqrt(2.0 * height_goal / 9.81)
    capture = compos[:2] + fall_time * comvel[:2]
    balance = capture - avg_foot[:2]

    # ---- Effort (nu) ----
    effort = 2e-2 * d.actuator_force

    # ---- Posture (nu) ----
    in_crouch = is_flip & (flip_time < self._crouch_time)
    in_flight = is_flip & (flip_time >= self._crouch_time) & (
        flip_time < self._jump_time + self._flight_time)
    ref_joints = jnp.where(in_crouch, self._crouch_joints,
                           self._home_joints)
    posture = d.qpos[7:] - ref_joints
    posture = jnp.where(in_flight, 0.0, posture)
    gains = jnp.tile(jnp.asarray(POSTURE_GAIN, dtype), 4)
    posture = posture * gains
    # biped: loosen the "hands" (hip/knee of the non-stance legs x0.03)
    loose_foot = jnp.asarray([0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 0], dtype)
    loose_hand = jnp.asarray([0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1], dtype)
    loose = jnp.where(handstand, loose_hand, loose_foot)
    posture = jnp.where(is_biped & (loose > 0), 0.03 * posture, posture)

    # ---- Yaw (2) ----
    head_quad = jnp.stack([torso_mat[0, 0], torso_mat[1, 0]])
    hs_head = jnp.where(handstand, 1.0, -1.0)
    head_biped = hs_head * jnp.stack([torso_mat[0, 2], torso_mat[1, 2]])
    head_dir = jnp.where(is_biped, head_biped, head_quad)
    head_dir = head_dir / jnp.maximum(jnp.linalg.norm(head_dir), 1e-8)
    heading = params[P_HEADING]
    yaw = jnp.stack([head_dir[0] - jnp.cos(heading),
                     head_dir[1] - jnp.sin(heading)])

    # ---- Angular momentum (3) ----
    angmom = sensors.subtree_angmom(m, d, trunk)

    return jnp.concatenate([
        upright, height[None], position, gait_res, balance, effort,
        posture, yaw, angmom])

  def _walk_pos(self, params, time):
    """Walk trajectory target (reference Walk(), quadruped.cc:627-645)."""
    angvel = params[P_WALK_TURN]
    speed = params[P_WALK_SPEED]
    pos = params[S_WALK_POS:S_WALK_POS + 2]
    headv = params[S_WALK_HEAD:S_WALK_HEAD + 2]
    nrm = jnp.maximum(jnp.linalg.norm(headv), 1e-8)
    fwd = headv / nrm
    straight = pos + headv + time * speed * fwd
    angle = time * angvel
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    circ = pos + jnp.stack([ca * headv[0] - sa * headv[1],
                            sa * headv[0] + ca * headv[1]])
    return jnp.where(jnp.abs(angvel) < MIN_ANGVEL, straight, circ)

  # ---- transition (reference TransitionLocked, quadruped.cc:225-390) ----

  def transition(self, d: Data) -> Data:
    t = float(d.time)
    p = np.asarray(jax.device_get(self.residual_params)).copy()
    mode = int(self.mode)

    # reset handling
    if t < self._last_transition_time or self._last_transition_time < 0:
      if mode not in (MODE_QUADRUPED, MODE_BIPED):
        mode = MODE_QUADRUPED
      self._last_transition_time = t
      p[S_PHASE_START] = t
      p[S_PHASE_START_T] = t
      self._com_vel[:] = 0.0

    # forbidden transitions: stateful modes only entered from Quadruped
    if mode != self._current_mode and self._current_mode != MODE_QUADRUPED:
      if mode in (MODE_WALK, MODE_FLIP):
        mode = MODE_QUADRUPED

    # phase velocity change
    phase_velocity = 2 * np.pi * p[P_CADENCE]
    if phase_velocity != p[S_PHASE_VEL]:
      p[S_PHASE_START] = (p[S_PHASE_START] +
                          (t - p[S_PHASE_START_T]) * p[S_PHASE_VEL])
      p[S_PHASE_START_T] = t
      p[S_PHASE_VEL] = phase_velocity

    # automatic gait switching from filtered com speed
    comvel = None
    if d.cvel is not None:
      comvel = np.asarray(jax.device_get(
          sensors.subtree_linvel(self.model, d, self._trunk)))
      beta = np.exp(-(t - self._last_transition_time) / AUTO_GAIT_FILTER)
      self._com_vel = beta * self._com_vel + (1 - beta) * comvel[:2]
    if mode == MODE_BIPED:
      p[P_GAIT] = GAIT_TROT  # biped always trots
    elif int(p[P_GAIT_SWITCH]) == 1 and comvel is not None:
      com_speed = float(np.linalg.norm(self._com_vel))
      for gait in range(5):
        if mode == MODE_SCRAMBLE and gait == GAIT_STAND:
          continue
        lower = com_speed > GAIT_AUTO[gait]
        upper = (gait == GAIT_GALLOP or
                 com_speed <= GAIT_AUTO[gait + 1])
        wait = abs(self._gait_switch_time - t) > AUTO_GAIT_MIN_TIME
        if lower and upper and wait:
          p[P_GAIT] = gait
          self._gait_switch_time = t

    # apply per-gait parameters and cost weights on gait switch
    if p[P_GAIT] != self._current_gait:
      self._current_gait = float(p[P_GAIT])
      g = int(p[P_GAIT])
      p[P_DUTY] = GAIT_PARAM[g][0]
      p[P_CADENCE] = GAIT_PARAM[g][1]
      p[P_AMPLITUDE] = GAIT_PARAM[g][2]
      self.cost_spec = self.cost_spec.set_weight("Balance", GAIT_PARAM[g][3])
      self.cost_spec = self.cost_spec.set_weight("Upright", GAIT_PARAM[g][4])
      self.cost_spec = self.cost_spec.set_weight("Height", GAIT_PARAM[g][5])

    # Walk: drag the goal mocap along the prescribed trajectory
    if mode == MODE_WALK:
      angvel = p[P_WALK_TURN]
      speed = p[P_WALK_SPEED]
      xmat = np.asarray(jax.device_get(d.xmat[self._trunk]))
      fwd = xmat[:2, 0]
      fwd = fwd / max(np.linalg.norm(fwd), 1e-8)
      left = np.array([-fwd[1], fwd[0]])
      entering = mode != self._current_mode
      if (entering or p[S_WALK_POS] != p[S_WALK_POS] or
          getattr(self, "_walk_speed", None) != (speed, angvel)):
        if entering or getattr(self, "_walk_speed", None) != (speed, angvel):
          p[S_MODE_START] = t
          self._walk_speed = (speed, angvel)
          axis = np.asarray(jax.device_get(
              d.xpos[self._trunk][:2])).copy()
          if abs(angvel) > MIN_ANGVEL:
            axis += (speed / angvel) * left
          goal = np.asarray(jax.device_get(d.mocap_pos[0][:2]))
          p[S_WALK_POS:S_WALK_POS + 2] = axis
          p[S_WALK_HEAD:S_WALK_HEAD + 2] = goal - axis
      # move the goal mocap to the current walk target
      wt = t - p[S_MODE_START]
      target = np.asarray(jax.device_get(self._walk_pos(
          jnp.asarray(p), jnp.asarray(wt, jnp.float32))))
      mp = np.asarray(jax.device_get(d.mocap_pos)).copy()
      mp[0, :2] = target
      d = d.replace(mocap_pos=jnp.asarray(mp, d.mocap_pos.dtype))

    # Flip: weight overrides on entry; restore on exit
    if mode == MODE_FLIP:
      if mode != self._current_mode:
        p[S_MODE_START] = t
        xquat = np.asarray(jax.device_get(d.xquat[self._trunk]))
        p[S_FLIP_QUAT:S_FLIP_QUAT + 4] = xquat
        p[S_GROUND] = 0.0   # flat ground
        self._save_weights = self.cost_spec.weights
        self._save_gait_switch = float(p[P_GAIT_SWITCH])
        for nm, w in (("Upright", 0.2), ("Height", 5.0), ("Position", 0.0),
                      ("Gait", 0.0), ("Balance", 0.0), ("Effort", 0.005),
                      ("Posture", 0.1)):
          self.cost_spec = self.cost_spec.set_weight(nm, w)
        p[P_GAIT_SWITCH] = 0.0
      flip_time = t - p[S_MODE_START]
      if flip_time >= self._jump_time + self._flight_time + self._land_time:
        mode = MODE_QUADRUPED
        if self._save_weights is not None:
          self.cost_spec = self.cost_spec.replace(
              weights=self._save_weights)
        p[P_GAIT_SWITCH] = self._save_gait_switch
        head = np.asarray(jax.device_get(d.site_xpos[self._head]))
        mp = np.asarray(jax.device_get(d.mocap_pos)).copy()
        mp[0, :2] = head[:2]
        d = d.replace(mocap_pos=jnp.asarray(mp, d.mocap_pos.dtype))

    p[S_MODE] = mode
    self.mode = mode
    self._current_mode = mode
    self._last_transition_time = t
    self.residual_params = jnp.asarray(p, jnp.float32)
    return d

  def support_polygon(self, d: Data) -> dict:
    """Foot support polygon + capture-point diagnostics.

    Mirrors the reference's scene overlay (quadruped.cc:466-512): 2D
    convex hull of the foot positions (Hull2D, utilities.h:275), the
    capture point com_xy + sqrt(2 h/g)·comvel_xy, and its nearest point
    inside the hull (NearestInHull). Host-side numpy diagnostic.
    """
    from mujoco_mpc_tpu.utils import geometry
    m = self.model
    foot = np.asarray(jax.device_get(
        d.geom_xpos[jnp.array(self._feet_geoms)]))[:, :2]
    hull = geometry.hull2d(foot)
    trunk = self._trunk
    compos = np.asarray(jax.device_get(d.subtree_com[trunk]))
    comvel = np.asarray(jax.device_get(
        sensors.subtree_linvel(m, d, trunk)))
    is_biped = self.mode == MODE_BIPED
    height_goal = HEIGHT_BIPED if is_biped else HEIGHT_QUADRUPED
    fall_time = float(np.sqrt(2.0 * height_goal / 9.81))
    capture = compos[:2] + fall_time * comvel[:2]
    projected = geometry.nearest_in_hull(capture, foot, hull)
    return dict(foot_xy=foot, hull=hull, capture=capture,
                projected_capture=projected,
                inside=bool(geometry.point_in_hull(capture, foot, hull)))

  # ---- lane-kernel in-kernel residual (Quadruped mode) ----

  # the Pallas fast path scores the Quadruped-mode residual; other modes
  # run on the XLA pipeline planner
  lane_modes = (MODE_QUADRUPED,)

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py (component form).

    Mirrors residual() above, Quadruped mode, term by term, so the
    lane-kernel fast path scores the FULL task cost inside the Pallas
    rollout kernel (the reference evaluates residuals inside its
    threaded rollout loop, mjpc/trajectory.cc; here they ride the
    VMEM-resident FK already done for physics). aux rows:
    [time0, goal_x, goal_y, phase0, phase_vel, amplitude, duty,
    cos(heading), sin(heading), footphase x4].
    """
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    geom_pos = np.asarray(g(m.geom_pos))
    site_pos = np.asarray(g(m.site_pos))
    geom_bodyid = np.asarray(m.geom_bodyid)
    site_bodyid = np.asarray(m.site_bodyid)
    body_mass = np.asarray(g(m.body_mass))
    body_inertia = np.asarray(g(m.body_inertia))
    body_iquat = np.asarray(g(m.body_iquat))
    parent = np.asarray(m.body_parentid)
    trunk = self._trunk
    feet = [(gid, int(geom_bodyid[gid])) for gid in self._feet_geoms]
    head_b = int(site_bodyid[self._head])
    head_p = [float(v) for v in site_pos[self._head]]
    home = np.asarray(g(self._home_joints))
    gains = np.tile(np.asarray(POSTURE_GAIN), 4)
    ids = []
    for b in range(m.nbody):
      a = b
      while a not in (0, trunk):
        a = int(parent[a])
      if a == trunk:
        ids.append(b)
    total_mass = max(sum(float(body_mass[b]) for b in ids), 1e-12)
    pi = float(np.pi)
    fall_time = float(np.sqrt(2.0 * HEIGHT_QUADRUPED / 9.81))

    def fn(ctx):
      lm, cv, like = ctx["lm"], ctx["cv"], ctx["like"]
      qpos, aux = ctx["qpos"], ctx["aux"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      scom, ref, cvel = ctx["subtree_com"], ctx["ref"], ctx["cvel"]
      t, h = ctx["t"], ctx["h"]
      tt = float(t) if isinstance(t, int) else t.astype(like.dtype)
      time = aux[0] + tt * h

      fp = [lm.vadd(xpos[b], lm.qrot(xquat[b], cv(list(geom_pos[gid]))))
            for gid, b in feet]
      avg = tuple(sum(p[k] for p in fp) * 0.25 for k in range(3))
      z = lm.qrot(xquat[trunk], cv([0.0, 0.0, 1.0]))
      rows = [z[2] - 1.0, like * 0.0, like * 0.0]
      rows.append(xipos[trunk][2] - avg[2] - HEIGHT_QUADRUPED)
      head = lm.vadd(xpos[head_b], lm.qrot(xquat[head_b], cv(head_p)))
      rows += [head[0] - aux[1], head[1] - aux[2], like * 0.0]
      phase = aux[3] + time * aux[4]
      amplitude, duty = aux[5], aux[6]
      for i in range(4):
        ang = phase - aux[9 + i]
        ang = jnp.mod(ang + pi, 2.0 * pi) - pi
        ang = ang * 0.5 / jnp.maximum(1.0 - duty, 1e-3)
        stp = jnp.abs(jnp.cos(jnp.clip(ang, -pi / 2, pi / 2)))
        stp = jnp.where(stp < 1e-6, 0.0, stp)
        stp = amplitude * jnp.where(duty < 1.0, stp, 0.0)
        target = FOOT_RADIUS + stp
        rows.append(jnp.where(stp > 0, fp[i][2] - target, like * 0.0))
      # balance: capture point vs average foot position
      lins = {}
      for b in ids:
        ang_b, lin_b = cvel[b]
        lins[b] = (ang_b, lm.vadd(
            lin_b, lm.vcross(ang_b, lm.vsub(xipos[b], ref[b]))))
      comvel = tuple(
          sum(float(body_mass[b]) * lins[b][1][k] for b in ids) /
          total_mass for k in range(3))
      rows.append(scom[trunk][0] + fall_time * comvel[0] - avg[0])
      rows.append(scom[trunk][1] + fall_time * comvel[1] - avg[1])
      rows += [2e-2 * f for f in ctx["act_force"]]
      for i in range(len(home)):
        rows.append((qpos[7 + i] - float(home[i])) * float(gains[i]))
      hd = lm.qrot(xquat[trunk], cv([1.0, 0.0, 0.0]))
      nrm = jnp.maximum(jnp.sqrt(hd[0] ** 2 + hd[1] ** 2), 1e-8)
      rows += [hd[0] / nrm - aux[7], hd[1] / nrm - aux[8]]
      # angular momentum of the subtree about its com
      am = [like * 0.0] * 3
      for b in ids:
        ang_b, lin_b = lins[b]
        r = lm.vsub(xipos[b], scom[trunk])
        dv = tuple(lin_b[k] - comvel[k] for k in range(3))
        orb = lm.vcross(r, dv)
        for k in range(3):
          am[k] = am[k] + float(body_mass[b]) * orb[k]
        iq = body_iquat[b]
        q = lm.qmul(xquat[b],
                    (jnp.ones_like(like) * float(iq[0]),
                     jnp.ones_like(like) * float(iq[1]),
                     jnp.ones_like(like) * float(iq[2]),
                     jnp.ones_like(like) * float(iq[3])))
        for kk in range(3):
          e = [0.0, 0.0, 0.0]
          e[kk] = 1.0
          ek = lm.qrot(q, cv(e))
          proj = ek[0] * ang_b[0] + ek[1] * ang_b[1] + ek[2] * ang_b[2]
          for k in range(3):
            am[k] = am[k] + float(body_inertia[b][kk]) * proj * ek[k]
      rows += am
      return rows

    def make_aux(d0, params):
      dtype = d0.qpos.dtype
      gait = params[P_GAIT].astype(jnp.int32)
      footphase = 2 * jnp.pi * jnp.asarray(GAIT_PHASE, dtype)[gait]
      # phase(t) = phase0 + (t - time0) * phase_vel folded to
      # phase0' + t * phase_vel with t measured from time0
      phase0 = (params[S_PHASE_START] +
                (d0.time - params[S_PHASE_START_T]) * params[S_PHASE_VEL])
      return jnp.concatenate([
          jnp.stack([
              jnp.zeros((), dtype), d0.mocap_pos[0, 0], d0.mocap_pos[0, 1],
              phase0, params[S_PHASE_VEL],
              params[P_AMPLITUDE], params[P_DUTY],
              jnp.cos(params[P_HEADING]), jnp.sin(params[P_HEADING])]),
          footphase])

    return dict(dim=42, naux=13, fn=fn, make_aux=make_aux)


class QuadrupedHill(QuadrupedFlat):
  """Uneven-terrain variant on a real heightfield (reference
  tasks/quadruped/task_hill.xml: hfield "terrain"). The elevation grid
  is procedural — smooth rolling hills from a few sinusoid octaves,
  flat near the start pose — filled via prepare_mjm (MJCF cannot carry
  inline elevation data). Collision: physics/collision.py hfield
  narrowphase (bilinear surface patches)."""

  name = "Quadruped Hill"
  HF_NROW = 64
  HF_NCOL = 64

  def xml(self) -> str:
    xml = _XML.replace(
        '<geom name="floor" type="plane" size="50 50 0.1"/>',
        '<geom name="floor" type="plane" size="50 50 0.1" pos="0 0 -0.5"/>'
        '\n    <geom name="terrain" type="hfield" hfield="terrain"/>')
    return xml.replace(
        "<worldbody>",
        f'<asset><hfield name="terrain" nrow="{self.HF_NROW}" '
        f'ncol="{self.HF_NCOL}" size="8 8 0.35 0.4"/></asset>\n'
        "  <worldbody>")

  def prepare_mjm(self, mjm):
    nr, nc = self.HF_NROW, self.HF_NCOL
    y, x = np.meshgrid(np.linspace(-1, 1, nr), np.linspace(-1, 1, nc),
                       indexing="ij")
    h = (0.5 + 0.35 * np.sin(3.1 * x + 1.0) * np.cos(2.3 * y)
         + 0.15 * np.sin(6.7 * x + 2.0) * np.sin(5.3 * y + 1.0))
    h = (h - h.min()) / max(h.max() - h.min(), 1e-9)
    # flatten a disc around the home pose (hfield center) to elevation 0
    r2 = x * x + y * y
    blend = np.clip((np.sqrt(r2) - 0.08) / 0.12, 0.0, 1.0)
    mjm.hfield_data[:] = (h * blend).reshape(-1)
