"""Rubik cube solving task: scramble faces, then solve them back.

Reference capability: mjpc/tasks/rubik (solve.cc:25-248) — a dexterous
hand holds a Rubik's cube whose faces are articulated joints; the task
machinery is a goal-stack mode machine: Scramble applies N random
(face, +-pi/2) turns while caching the face-angle state before each turn
(goal_cache_, solve.cc:143-204), then Solve walks the cache backwards —
each time the face angles reach the current goal within 0.085, the goal
index pops until the cube is solved (solve.cc:211-229). Dropping the
cube aborts to Wait (kResetHeight, solve.cc:232-238). Residuals
(solve.cc:59-135): cube position to palm, cube orientation to goal,
cube linear velocity, actuator force, face-angle errors vs the 6 goal
parameters (zeroed outside Manual/Solve), hand posture vs home, hand
joint velocity, and a remaining-goal cost (goal_index * 12).

The reference cube is the 26-cubie MuJoCo Rubik model driven by a
Shadow Hand; this is an independently-authored rig — a cube core with 6
hinged face knobs (one per face, axis = face normal) above a 3-finger
hand — exercising the same goal-stack machinery and residual structure.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import collision as coll
from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

MODE_WAIT, MODE_MANUAL, MODE_SCRAMBLE, MODE_SOLVE = range(4)
RESET_HEIGHT = -0.1
SOLVE_TOL = 0.085
FACE_NAMES = ("red", "orange", "blue", "green", "white", "yellow")
# param layout: 6 face goals, then Scramble count selection
P_FACES = 0
P_SCRAMBLE = 6
S_MODE = 7
S_GOAL_INDEX = 8
NPARAM = 9

_FACE_DEFS = [
    # name, pos, hinge axis (face normal), knob euler
    ("red", "0.034 0 0", "1 0 0"),
    ("orange", "-0.034 0 0", "-1 0 0"),
    ("blue", "0 0.034 0", "0 1 0"),
    ("green", "0 -0.034 0", "0 -1 0"),
    ("white", "0 0 0.034", "0 0 1"),
    ("yellow", "0 0 -0.034", "0 0 -1"),
]


def _finger(i, angle_deg):
  a = math.radians(angle_deg)
  x, y = 0.1 * math.cos(a), 0.1 * math.sin(a)
  rot = math.degrees(math.atan2(-y, -x))
  return f"""
    <body name="fbase_{i}" pos="{x:.4f} {y:.4f} 0.032"
          euler="0 0 {rot:.2f}">
      <joint name="fj0_{i}" type="hinge" axis="0 0 1" range="-45 45"
             damping="0.2" armature="0.005"/>
      <geom name="fb_{i}" type="capsule" fromto="0 0 0 0.04 0 0"
            size="0.012" mass="0.04"/>
      <body name="fmid_{i}" pos="0.04 0 0">
        <joint name="fj1_{i}" type="hinge" axis="0 1 0" range="-20 100"
               damping="0.15" armature="0.005"/>
        <geom name="fm_{i}" type="capsule" fromto="0 0 0 0.04 0 0"
              size="0.010" mass="0.03"/>
        <body name="ftip_{i}" pos="0.04 0 0">
          <joint name="fj2_{i}" type="hinge" axis="0 1 0" range="-10 110"
                 damping="0.1" armature="0.005"/>
          <geom name="ft_{i}" type="capsule" fromto="0 0 0 0.035 0 0"
                size="0.009" mass="0.02" friction="1.8 0.02 0.002"/>
        </body>
      </body>
    </body>"""


def _faces():
  out = []
  for name, pos, axis in _FACE_DEFS:
    out.append(f"""
      <body name="face_{name}" pos="{pos}">
        <joint name="f_{name}" type="hinge" axis="{axis}" damping="0.02"
               armature="0.001"/>
        <geom name="knob_{name}" type="box" size="0.009 0.016 0.016"
              euler="0 0 0" mass="0.008" friction="1.8 0.02 0.002"/>
      </body>""")
  return "".join(out)


_ACT = "".join(
    f'<position name="a{j}_{i}" joint="fj{j}_{i}" kp="3" '
    f'ctrlrange="{lo} {hi}" ctrllimited="true" '
    f'forcerange="-2 2" forcelimited="true"/>'
    for i in range(3)
    for j, lo, hi in ((0, -0.7, 0.7), (1, -0.3, 1.7), (2, -0.15, 1.9)))

_XML = f"""
<mujoco model="Rubik">
  <option timestep="0.004"/>
  <custom>
    <text name="task_transition" data="Wait|Manual|Scramble|Solve"/>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.4" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.15" />
    <numeric name="sampling_trajectories" data="60" />
    <numeric name="max_contact_points" data="48" />
    <numeric name="residual_red" data="0 -3.15 3.15"/>
    <numeric name="residual_orange" data="0 -3.15 3.15"/>
    <numeric name="residual_blue" data="0 -3.15 3.15"/>
    <numeric name="residual_green" data="0 -3.15 3.15"/>
    <numeric name="residual_white" data="0 -3.15 3.15"/>
    <numeric name="residual_yellow" data="0 -3.15 3.15"/>
    <numeric name="residual_select_Scramble" data="0"/>
    <text name="residual_list_Scramble" data="1|2|3|4|5|6|7|8|9|10"/>
  </custom>
  <worldbody>
    <geom name="palm" type="box" pos="0 0 0" size="0.1 0.1 0.015"
          friction="0.8 0.01 0.001"/>
    <site name="palm_site" pos="0 0 0.05"/>
    {_finger(0, 90)}
    {_finger(1, 210)}
    {_finger(2, 330)}
    <body name="cube" pos="0 0 0.065">
      <freejoint/>
      <geom name="core" type="box" size="0.025 0.025 0.025" mass="0.05"
            friction="1.2 0.02 0.002"/>
      {_faces()}
    </body>
    <body name="goal" mocap="true" pos="0.3 0 0.1">
      <geom name="goal_geom" type="box" size="0.025 0.025 0.025"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_ACT}
  </actuator>
  <sensor>
    <user name="Position" dim="3" user="2 20.0 0 50.0 0.02"/>
    <user name="Orientation" dim="3" user="0 1.0 0 10.0"/>
    <user name="Cube Vel." dim="3" user="0 1.0 0 5.0"/>
    <user name="Actuation" dim="9" user="0 0.05 0 1.0"/>
    <user name="Faces" dim="6" user="0 10.0 0 50.0"/>
    <user name="Grasp" dim="9" user="0 0.05 0 1.0"/>
    <user name="Joint Vel" dim="9" user="0 1e-3 0 0.1"/>
    <user name="Remaining" dim="1" user="-1 1.0 0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home"
         qpos="{' '.join(['0 0.45 0.45'] * 3)} 0 0 0.065 1 0 0 0 0 0 0 0 0 0"/>
  </keyframe>
</mujoco>
"""


class Rubik(base.Task):
  """Scramble-then-solve face turning with a goal-stack mode machine."""

  name = "Rubik"
  # lane kernel: hand-cube contacts run in-kernel (capsule-capsule,
  # capsule-box body pairs); the palm box becomes a plane in the
  # reduced planning model (plan_xml) so cube support uses the cheap
  # static-plane path — the reference ships reduced plan models the
  # same way. The 15 cubie-cubie box-box pairs stay sim-only (the
  # face-turn machine holds cubies rigid during planning anyway; 240
  # corner contacts would triple the kernel and break the <10 ms
  # budget, BASELINE config 5).
  plan_body_pairs = True
  plan_body_pair_types = frozenset({
      (coll.SPHERE, coll.SPHERE), (coll.SPHERE, coll.CAPSULE),
      (coll.CAPSULE, coll.CAPSULE), (coll.SPHERE, coll.BOX),
      (coll.CAPSULE, coll.BOX)})  # everything but BOX-BOX

  def plan_xml(self) -> str:
    return _XML.replace(
        '<geom name="palm" type="box" pos="0 0 0" size="0.1 0.1 0.015"\n'
        '          friction="0.8 0.01 0.001"/>',
        '<geom name="palm" type="plane" pos="0 0 0.015" size="0.2 0.2 0.01"\n'
        '          friction="0.8 0.01 0.001"/>')

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._cube_body = names["body"].index("cube")
    self._palm_site = names["site"].index("palm_site")
    home = self.home_qpos
    # qpos layout: hand joints, cube free 7, faces 6 — the hand size is
    # model-derived so the 20-actuator Cube Solving rig shares this class
    self._nhand = self.model.nq - 13
    self._home_hand = jnp.asarray(home[:self._nhand], jnp.float32)
    self._cube_qadr, self._cube_dadr = self._nhand, self._nhand
    self._face_qadr = self._nhand + 7
    self._face_dadr = self._nhand + 6
    state0 = np.zeros(NPARAM - 7, np.float32)
    self.residual_params = jnp.concatenate(
        [self.residual_params, jnp.asarray(state0)])
    self._goal_cache = np.zeros((0, 6))
    self._goal_index = 0
    self._rng = np.random.default_rng(0)

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    dtype = d.qpos.dtype
    mode = params[S_MODE]
    faces_active = (mode == MODE_MANUAL) | (mode == MODE_SOLVE)

    cube_pos = d.xpos[self._cube_body]
    cube_quat = d.xquat[self._cube_body]
    palm = d.site_xpos[self._palm_site]
    position = cube_pos - palm
    goal_quat = mm.normalize_quat(d.mocap_quat[0])
    orientation = mm.quat_sub(goal_quat, cube_quat)
    linvel = d.qvel[self._cube_dadr:self._cube_dadr + 3]
    actuation = d.actuator_force
    faces = d.qpos[self._face_qadr:self._face_qadr + 6] - \
        params[P_FACES:P_FACES + 6]
    faces = jnp.where(faces_active, faces, jnp.zeros(6, dtype))
    grasp = d.qpos[:self._nhand] - self._home_hand
    joint_vel = d.qvel[:self._nhand]
    # each remaining scramble move costs ~12 (reference goal_index_*12)
    remaining = params[S_GOAL_INDEX] * 12.0
    return jnp.concatenate([
        position, orientation, linvel, actuation, faces, grasp,
        joint_vel, remaining[None]])

  def lane_residual_spec(self):
    """In-kernel residual (ops/step_lane.py component form): same rows
    as residual(); the goal quaternion, face goals, mode gate, and
    remaining-goal scalar ride aux rows so Scramble/Solve transitions
    never recompile."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    palm_p = [float(v) for v in site_pos[self._palm_site]]
    home_hand = [float(v) for v in np.asarray(g(self._home_hand))]
    cube_b = self._cube_body
    qa_c, da_c = self._cube_qadr, self._cube_dadr
    qa_f = self._face_qadr
    nhand = self._nhand
    nu = m.nu

    def fn(ctx):
      lm, cv = ctx["lm"], ctx["cv"]
      qpos, qvel, aux = ctx["qpos"], ctx["qvel"], ctx["aux"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]
      rows = [xpos[cube_b][k] - palm_p[k] for k in range(3)]
      # orientation: mju_subQuat(goal, cube) tangent (physics/math.py
      # quat_sub) in component form
      gq = (aux[0], aux[1], aux[2], aux[3])
      cq = xquat[cube_b]
      # quat_sub(goal, cube) = log(cube^-1 * goal)
      qd = lm.qmul((cq[0], -cq[1], -cq[2], -cq[3]), gq)
      sgn = jnp.where(qd[0] < 0, -1.0, 1.0)
      qd = tuple(sgn * q for q in qd)
      sin_half = jnp.sqrt(qd[1] ** 2 + qd[2] ** 2 + qd[3] ** 2 + 1e-18)
      # Pallas TPU has no atan2; qd[0] >= 0 after the sign fix so the
      # nonneg-quadrant polynomial applies (lanemath.atan2_nonneg)
      angle = 2.0 * lm.atan2_nonneg(sin_half, jnp.maximum(qd[0], 0.0))
      scale = angle / jnp.maximum(sin_half, 1e-12)
      rows += [qd[1 + k] * scale for k in range(3)]
      rows += [qvel[da_c + k] for k in range(3)]
      rows += list(ctx["act_force"])
      active = aux[10]
      rows += [active * (qpos[qa_f + i] - aux[4 + i]) for i in range(6)]
      rows += [qpos[i] - home_hand[i] for i in range(nhand)]
      rows += [qvel[i] for i in range(nhand)]
      rows.append(aux[11] + 0.0 * qpos[0])
      return rows

    def make_aux(d0, params):
      from mujoco_mpc_tpu.physics import math as mm
      gq = mm.normalize_quat(d0.mocap_quat[0])
      mode = params[S_MODE]
      active = ((mode == MODE_MANUAL) | (mode == MODE_SOLVE)).astype(
          gq.dtype)
      remaining = params[S_GOAL_INDEX] * 12.0
      return jnp.concatenate([
          gq, params[P_FACES:P_FACES + 6], active[None], remaining[None]])

    return dict(dim=3 + 3 + 3 + nu + 6 + 2 * nhand + 1, naux=12, fn=fn,
                make_aux=make_aux)

  def transition(self, d: Data) -> Data:
    """Goal-stack mode machine (solve.cc:140-246)."""
    p = np.asarray(jax.device_get(self.residual_params)).copy()
    mode = int(self.mode)
    qpos = np.asarray(jax.device_get(d.qpos))

    if mode == MODE_SCRAMBLE:
      num = int(p[P_SCRAMBLE]) + 1
      # reset to home, then apply num random quarter-turns, caching the
      # face state BEFORE each turn (the solve goals, in reverse)
      home = self.home_qpos.copy()
      angles = np.zeros(6)
      cache = np.zeros((num, 6))
      for i in range(num):
        cache[i] = angles
        face = int(self._rng.integers(0, 6))
        direction = 1 if self._rng.integers(0, 2) else -1
        angles[face] += direction * 0.5 * np.pi
      self._goal_cache = cache
      self._goal_index = num - 1
      new_qpos = home.copy()
      new_qpos[self._face_qadr:self._face_qadr + 6] = angles
      d = d.replace(qpos=jnp.asarray(new_qpos, d.qpos.dtype),
                    qvel=jnp.zeros_like(d.qvel))
      mode = MODE_SOLVE
    elif mode == MODE_SOLVE and self._goal_cache.shape[0]:
      p[P_FACES:P_FACES + 6] = self._goal_cache[self._goal_index]
      err = qpos[self._face_qadr:self._face_qadr + 6] - \
          p[P_FACES:P_FACES + 6]
      if np.linalg.norm(err) < SOLVE_TOL:
        if self._goal_index == 0:
          mode = MODE_WAIT
        else:
          self._goal_index -= 1

    # drop check
    if qpos[self._cube_qadr + 2] < RESET_HEIGHT:
      mode = MODE_WAIT

    p[S_MODE] = mode
    p[S_GOAL_INDEX] = self._goal_index
    self.mode = mode
    self.residual_params = jnp.asarray(p, jnp.float32)
    return d


# ---------------------------------------------------------------------------
# Cube Solving: 20-actuator five-finger hand + articulated-cubie cube
# ---------------------------------------------------------------------------
# Reference workload: mjpc/tasks/rubik/task.xml drives a 20-motor Shadow
# Hand against a cube whose six faces are articulated hinge joints
# carrying real cubie geometry; testspeed_app.cc:23-28 makes "Cube
# Solving" the default benchmark task. This rig is independently
# authored at that capability class: a 5-finger hand, 4 joints per
# finger (abduction + 3 flexions, 20 position actuators), and a cube
# whose 6 face hinges each carry a 3x3 grid of cubie boxes (54 contact
# geoms) around a core. Cube-internal collisions are off (rigid-face
# approximation); hand<->cubie and cube<->palm contacts are real.

_CUBE_HALF = 0.031      # outer half-extent
_CUBIE_H = 0.0095       # cubie half-size
_CUBIE_OFF = 0.0215     # shell offset of cubie centers along the normal
_CUBIE_LAT = 0.0205     # lateral grid spacing


def _finger20(i, angle_deg, radius=0.105):
  a = math.radians(angle_deg)
  x, y = radius * math.cos(a), radius * math.sin(a)
  rot = math.degrees(math.atan2(-y, -x))
  return f"""
    <body name="fknuckle_{i}" pos="{x:.4f} {y:.4f} 0.032"
          euler="0 0 {rot:.2f}">
      <joint name="fj0_{i}" type="hinge" axis="0 0 1" range="-30 30"
             damping="0.2" armature="0.005"/>
      <geom name="fk_{i}" type="sphere" size="0.011" mass="0.02"
            contype="0" conaffinity="0"/>
      <body name="fprox_{i}" pos="0.008 0 0">
        <joint name="fj1_{i}" type="hinge" axis="0 1 0" range="-20 100"
               damping="0.15" armature="0.005"/>
        <geom name="fp_{i}" type="capsule" fromto="0 0 0 0.04 0 0"
              size="0.011" mass="0.035" contype="0" conaffinity="0"/>
        <body name="fmid_{i}" pos="0.04 0 0">
          <joint name="fj2_{i}" type="hinge" axis="0 1 0" range="-10 110"
                 damping="0.12" armature="0.005"/>
          <geom name="fm_{i}" type="capsule" fromto="0 0 0 0.035 0 0"
                size="0.010" mass="0.03" contype="4" conaffinity="3"
                friction="1.5 0.02 0.002"/>
          <body name="ftip_{i}" pos="0.035 0 0">
            <joint name="fj3_{i}" type="hinge" axis="0 1 0" range="-10 95"
                   damping="0.1" armature="0.005"/>
            <geom name="ft_{i}" type="capsule" fromto="0 0 0 0.03 0 0"
                  size="0.009" mass="0.025" contype="4" conaffinity="3"
                  friction="1.8 0.02 0.002"/>
          </body>
        </body>
      </body>
    </body>"""


def _cubie_faces(slab: bool):
  """Six face bodies on hinges through the cube center. slab=False: each
  face carries its 3x3 cubie grid (simulation model); slab=True: one
  face-sized box per face (reduced PLANNING geometry, same joints)."""
  out = []
  for name, _, axis in _FACE_DEFS:
    ax = [float(v) for v in axis.split()]
    # face frame: n = hinge axis, (u, v) span the face plane
    n = np.array(ax)
    u = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.5 else \
        np.array([1.0, 0.0, 0.0])
    u = np.cross(n, u)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    geoms = []
    if slab:
      c = n * _CUBIE_OFF
      # box axes: world-aligned since faces are axis-aligned at build
      size = np.abs(n) * _CUBIE_H + (np.abs(u) + np.abs(v)) * (
          _CUBIE_LAT + _CUBIE_H)
      geoms.append(
          f'<geom name="slab_{name}" type="box" '
          f'pos="{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}" '
          f'size="{size[0]:.4f} {size[1]:.4f} {size[2]:.4f}" '
          f'mass="0.018" contype="2" conaffinity="4" '
          f'friction="1.2 0.02 0.002"/>')
    else:
      k = 0
      for du in (-1, 0, 1):
        for dv in (-1, 0, 1):
          c = n * _CUBIE_OFF + (du * u + dv * v) * _CUBIE_LAT
          geoms.append(
              f'<geom name="cubie_{name}_{k}" type="box" '
              f'pos="{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}" '
              f'size="{_CUBIE_H} {_CUBIE_H} {_CUBIE_H}" mass="0.002" '
              f'contype="2" conaffinity="4" '
              f'friction="1.2 0.02 0.002"/>')
          k += 1
    out.append(f"""
      <body name="face_{name}" pos="0 0 0">
        <joint name="f_{name}" type="hinge" axis="{axis}" damping="0.03"
               armature="0.002"/>
        {''.join(geoms)}
      </body>""")
  return "".join(out)


_ACT20 = "".join(
    f'<position name="a{j}_{i}" joint="fj{j}_{i}" kp="4" '
    f'ctrlrange="{lo} {hi}" ctrllimited="true" '
    f'forcerange="-3 3" forcelimited="true"/>'
    for i in range(5)
    for j, lo, hi in ((0, -0.5, 0.5), (1, -0.3, 1.7), (2, -0.15, 1.9),
                      (3, -0.15, 1.6)))

_HOME_FINGER = "0 0.5 0.55 0.35"


def _cube_solving_xml(plan: bool) -> str:
  # sim palm collides with cubies AND core (conaffinity 10); the plan
  # plane supports the cube through the core only (conaffinity 8) — a
  # reduced planning contact set, like the reference's plan models
  palm = ('<geom name="palm" type="plane" pos="0 0 0.015" '
          'size="0.25 0.25 0.01" contype="1" conaffinity="8" '
          'friction="0.8 0.01 0.001"/>' if plan else
          '<geom name="palm" type="box" pos="0 0 0" '
          'size="0.12 0.12 0.015" contype="1" conaffinity="10" '
          'friction="0.8 0.01 0.001"/>')
  fingers = "".join(_finger20(i, 90 + 72 * i) for i in range(5))
  # the plan solver runs a reduced Newton schedule (3x smaller kernel
  # program at nv=32; planning-model approximation like the quadruped
  # bench's reduced schedule, ops/step_lane.py build_rollout_kernel doc)
  solver = ('<numeric name="solver_iterations" data="3"/>'
            '<numeric name="solver_ls_iterations" data="2"/>'
            if plan else '')
  # plan core: palm-plane support only (contype 8), no tip pairs — the
  # core is fully enclosed by the face slabs anyway
  core = ('contype="8" conaffinity="0"' if plan
          else 'contype="10" conaffinity="5"')
  return f"""
<mujoco model="CubeSolving">
  <option timestep="0.004"/>
  <custom>
    <text name="task_transition" data="Wait|Manual|Scramble|Solve"/>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.35" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_exploration" data="0.12" />
    <numeric name="sampling_trajectories" data="60" />
    <numeric name="max_contact_points" data="64" />
    {solver}
    <numeric name="residual_red" data="0 -3.15 3.15"/>
    <numeric name="residual_orange" data="0 -3.15 3.15"/>
    <numeric name="residual_blue" data="0 -3.15 3.15"/>
    <numeric name="residual_green" data="0 -3.15 3.15"/>
    <numeric name="residual_white" data="0 -3.15 3.15"/>
    <numeric name="residual_yellow" data="0 -3.15 3.15"/>
    <numeric name="residual_select_Scramble" data="0"/>
    <text name="residual_list_Scramble" data="1|2|3|4|5|6|7|8|9|10"/>
  </custom>
  <worldbody>
    {palm}
    <site name="palm_site" pos="0 0 0.07"/>
    {fingers}
    <body name="cube" pos="0 0 0.07">
      <freejoint/>
      <geom name="core" type="box" size="0.0205 0.0205 0.0205"
            mass="0.04" {core}
            friction="1.2 0.02 0.002"/>
      {_cubie_faces(slab=plan)}
    </body>
    <body name="goal" mocap="true" pos="0.35 0 0.1">
      <geom name="goal_geom" type="box" size="0.031 0.031 0.031"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {_ACT20}
  </actuator>
  <sensor>
    <user name="Position" dim="3" user="2 20.0 0 50.0 0.02"/>
    <user name="Orientation" dim="3" user="0 1.0 0 10.0"/>
    <user name="Cube Vel." dim="3" user="0 1.0 0 5.0"/>
    <user name="Actuation" dim="20" user="0 0.03 0 1.0"/>
    <user name="Faces" dim="6" user="0 10.0 0 50.0"/>
    <user name="Grasp" dim="20" user="0 0.05 0 1.0"/>
    <user name="Joint Vel" dim="20" user="0 1e-3 0 0.1"/>
    <user name="Remaining" dim="1" user="-1 1.0 0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home"
         qpos="{' '.join([_HOME_FINGER] * 5)} 0 0 0.07 1 0 0 0 0 0 0 0 0 0"/>
  </keyframe>
</mujoco>
"""


class CubeSolving(Rubik):
  """The reference benchmark workload at full fidelity class: a
  20-actuator five-finger hand scrambling/solving an articulated-cubie
  cube (goal-stack mode machine inherited from Rubik). Registered as
  "Cube Solving" — the reference testspeed default (testspeed_app.cc)."""

  name = "Cube Solving"
  plan_body_pairs = True

  # planning contacts: distal fingertip capsules vs face slabs + core
  # (+ palm plane); middle segments and per-cubie geometry are
  # sim-model-only detail, like the reference's reduced plan models
  @property
  def plan_contact_geoms(self):
    m = self.plan_model
    names = m.names["geom"]
    keep = [i for i, n in enumerate(names)
            if n.startswith("ft_") or n.startswith("slab_")
            or n in ("core",)]
    return set(keep)

  def xml(self) -> str:
    return _cube_solving_xml(plan=False)

  def plan_xml(self) -> str:
    return _cube_solving_xml(plan=True)
