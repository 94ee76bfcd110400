"""Quadruped locomotion task (flat terrain).

Reference capability: mjpc/tasks/quadruped (quadruped.cc:33-260) — the
flagship benchmark workload (BASELINE.md config 3: predictive sampling with
4096 rollouts). Residual terms in Quadruped mode: Upright(3), Height(1),
Position(3), Gait(4) (per-foot height tracking against a phase-offset step
oscillator: StepHeight, quadruped.cc:653-672 with trot phases
kGaitPhase[trot] = (0, .5, .5, 0)), Balance(2) (capture point vs average
foot position), Effort(12), Posture(12, abduction gain 2x), Yaw(2),
Angmom(3). Gait parameters (cadence/amplitude/duty) are residual_*
numerics; the goal is a mocap body.

The robot model here is our own simplified 12-DoF quadruped (trunk + 3
hinges per leg with sphere feet) — reference uses a Unitree A1; the task
machinery, not the mesh fidelity, is the capability being ported. The full
mode machine (Biped/Walk/Scramble/Flip) is host-side Transition work and
comes later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

# trot gait phases FL, HL, FR, HR (reference kGaitPhase[kGaitTrot])
TROT_PHASE = (0.0, 0.5, 0.5, 0.0)
FOOT_RADIUS = 0.02
HEIGHT_GOAL = 0.25
POSTURE_GAIN = (2.0, 1.0, 1.0)  # abduction, hip, knee


def _leg(name, x, y):
  mx = "-1" if y < 0 else "1"
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
                  size="0.02" mass="0.05" friction="1.0 0.02 0.0001"/>
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
  <option timestep="0.005"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.35" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="3" />
    <numeric name="sampling_trajectories" data="60"/>
    <numeric name="sampling_exploration" data="0.04" />
    <numeric name="residual_Cadence" data="2 0 4" />
    <numeric name="residual_Amplitude" data="0.06 0 0.2" />
    <numeric name="residual_Duty ratio" data="0.45 0 1"/>
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
  </keyframe>
</mujoco>
"""


class QuadrupedFlat(base.Task):
  """Trot toward the goal (reference "Quadruped Flat")."""

  name = "Quadruped Flat"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._trunk = names["body"].index("trunk")
    self._head = names["site"].index("head")
    self._feet_geoms = [names["geom"].index(f"foot_{l}")
                       for l in ("fl", "hl", "fr", "hr")]
    # planning-contact whitelist for the lane kernel: only the feet
    # collide during candidate rollouts (same spirit as the reference
    # tasks' simplified collision models) — hips/thigh/calf/trunk ground
    # contact is rare in-plan and pruning it halves the contact work
    self.plan_contact_geoms = frozenset(self._feet_geoms)
    home = self.home_qpos
    self._home_joints = jnp.asarray(home[7:], jnp.float32)

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    cadence, amplitude, duty, heading = (params[0], params[1], params[2],
                                         params[3])
    dtype = d.qpos.dtype
    trunk = self._trunk

    foot_pos = d.geom_xpos[jnp.array(self._feet_geoms)]
    avg_foot = jnp.mean(foot_pos, axis=0)
    torso_mat = d.xmat[trunk]
    torso_pos = d.xipos[trunk]

    # Upright: z-axis of trunk should be (0,0,1); reference uses
    # (xmat[2], xmat[5], xmat[8]-1) scaled by 0.25 on xy? (quadruped.cc:49-59
    # standing branch: [z0*?**]) — standing: residual = z-axis - (0,0,1)
    upright = jnp.stack([
        torso_mat[0, 2], torso_mat[1, 2], torso_mat[2, 2] - 1.0])

    # Height: torso height over average foot height vs goal
    height = (torso_pos[2] - avg_foot[2]) - HEIGHT_GOAL

    # Position: head site to goal (xy; z unused in flat quadruped mode)
    head = d.site_xpos[self._head]
    goal = d.mocap_pos[0]
    position = jnp.stack([
        head[0] - goal[0], head[1] - goal[1], jnp.zeros((), dtype)])

    # Gait: per-foot height tracking of the step oscillator
    phase = 2.0 * jnp.pi * cadence * d.time
    phases = phase - 2.0 * jnp.pi * jnp.asarray(TROT_PHASE, dtype)
    angle = jnp.mod(phases + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    angle = angle * 0.5 / jnp.maximum(1.0 - duty, 1e-3)
    step = jnp.abs(jnp.cos(jnp.clip(angle, -jnp.pi / 2, jnp.pi / 2)))
    step = amplitude * jnp.where(duty < 1.0, step, 0.0)
    target = FOOT_RADIUS + step
    gait = jnp.where(step > 0, foot_pos[:, 2] - target, 0.0)

    # Balance: capture point vs average foot position
    comvel = sensors.subtree_linvel(m, d, trunk)
    compos = d.subtree_com[trunk]
    fall_time = jnp.sqrt(2.0 * HEIGHT_GOAL / 9.81)
    capture = compos[:2] + fall_time * comvel[:2]
    balance = capture - avg_foot[:2]

    # Effort
    effort = 2e-2 * d.actuator_force

    # Posture (abduction joints weighted 2x)
    gains = jnp.tile(jnp.asarray(POSTURE_GAIN, dtype), 4)
    posture = (d.qpos[7:] - self._home_joints) * gains

    # Yaw / heading
    head_dir = torso_mat[:2, 0]
    head_dir = head_dir / jnp.maximum(jnp.linalg.norm(head_dir), 1e-8)
    yaw = jnp.stack([head_dir[0] - jnp.cos(heading),
                     head_dir[1] - jnp.sin(heading)])

    # Angular momentum
    angmom = sensors.subtree_angmom(m, d, trunk)

    return jnp.concatenate([
        upright, height[None], position, gait, balance, effort, posture,
        yaw, angmom])

  def transition(self, d: Data) -> Data:
    return d

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py (component form).

    Mirrors residual() above term by term so the lane-kernel fast path
    scores the FULL task cost inside the Pallas rollout kernel (the
    reference evaluates residuals inside its threaded rollout loop,
    mjpc/trajectory.cc; here they ride the VMEM-resident FK already
    done for physics). aux rows: [time0, goal_x, goal_y, cadence,
    amplitude, duty, cos(heading), sin(heading)].
    """
    import numpy as np
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
    fall_time = float(np.sqrt(2.0 * HEIGHT_GOAL / 9.81))

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
      rows = [z[0], z[1], z[2] - 1.0]
      rows.append(xipos[trunk][2] - avg[2] - HEIGHT_GOAL)
      head = lm.vadd(xpos[head_b], lm.qrot(xquat[head_b], cv(head_p)))
      rows += [head[0] - aux[1], head[1] - aux[2], like * 0.0]
      cadence, amplitude, duty = aux[3], aux[4], aux[5]
      phase = 2.0 * pi * cadence * time
      for i in range(4):
        ang = phase - 2.0 * pi * TROT_PHASE[i]
        ang = jnp.mod(ang + pi, 2.0 * pi) - pi
        ang = ang * 0.5 / jnp.maximum(1.0 - duty, 1e-3)
        stp = jnp.abs(jnp.cos(jnp.clip(ang, -pi / 2, pi / 2)))
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
      rows += [hd[0] / nrm - aux[6], hd[1] / nrm - aux[7]]
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
      return jnp.stack([
          d0.time, d0.mocap_pos[0, 0], d0.mocap_pos[0, 1],
          params[0], params[1], params[2],
          jnp.cos(params[3]), jnp.sin(params[3])])

    return dict(dim=42, naux=8, fn=fn, make_aux=make_aux)


class QuadrupedHill(QuadrupedFlat):
  """Uneven-terrain variant (reference task_hill uses an hfield; here the
  terrain is a run of static ramps and steps — box geoms — since mesh/
  hfield collision is not yet supported)."""

  name = "Quadruped Hill"

  def xml(self) -> str:
    terrain = """
    <geom name="ramp1" type="box" pos="1.0 0 0.03" euler="0 -6 0"
          size="0.5 1.2 0.05"/>
    <geom name="step1" type="box" pos="1.9 0 0.1" size="0.35 1.2 0.1"/>
    <geom name="ramp2" type="box" pos="2.8 0 0.16" euler="0 6 0"
          size="0.55 1.2 0.05"/>
    """
    return _XML.replace(
        '<geom name="floor" type="plane" size="50 50 0.1"/>',
        '<geom name="floor" type="plane" size="50 50 0.1"/>' + terrain)
