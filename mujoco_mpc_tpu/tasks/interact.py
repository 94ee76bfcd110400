"""Humanoid Interact task: sit down on / stand up from a chair.

Reference capability: mjpc/tasks/humanoid/interact (interact.{h,cc}) —
modes Sit Down | Stand Up | Relax | Stay Still (task_transition), each
applying its own cost-weight preset (default_weights, interact.h:42-47)
on mode change (TransitionLocked, interact.cc:201-206). Residual terms
(interact.cc:144-197): torso/pelvis/foot up-vector alignment, head and
torso height vs goals, knee-feet and CoM-feet xy distances, facing
direction, CoM velocity, joint velocity, control, and contact-pair
distances (residual keyframe: body-local points pulled together, e.g.
pelvis onto the chair seat; ContactResidual interact.cc:114-141).

Rig: our independently-authored 21-actuator humanoid plus a static
chair. Contact pairs here: pelvis -> seat point and torso -> backrest
point (active in Sit Down; zeroed otherwise, like the reference's
unselected pairs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base
from mujoco_mpc_tpu.tasks import humanoid as H

MODE_SIT, MODE_STAND, MODE_RELAX, MODE_STILL = range(4)
S_MODE = 2    # param slot appended after Head Height, Torso Height
NPARAM = 3

# per-mode weight presets (reference default_weights, interact.h:42-47):
# [TorsoUp, PelvisUp, RFootUp, LFootUp, HeadHeight, TorsoHeight,
#  KneeFeetXY, COMFeetXY, FacingDir, CoMVel, JointVel, Control, Contact]
MODE_WEIGHTS = (
    (10, 10, 5, 5, 0, 20, 30, 0, 0, 0, 0.01, 0.1, 80.0),    # sit down
    (10, 0, 1, 1, 80, 0, 0, 100, 0, 0, 0.01, 0.025, 0.0),   # stand up
    (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0.01, 0.8, 80.0),        # relax
    (0, 0, 0, 0, 0, 0, 0, 0, 0, 50, 20, 0.025, 80.0),       # stay still
)
# per-mode height goals (head, torso)
MODE_HEIGHTS = ((1.0, 0.55), (1.4, 1.3), (1.0, 0.55), (1.4, 1.3))

_CHAIR = """
    <body name="chair" pos="-0.6 0 0">
      <geom name="seat" type="box" pos="0 0 0.42" size="0.22 0.24 0.03"/>
      <geom name="backrest" type="box" pos="-0.22 0 0.72"
            size="0.03 0.24 0.27"/>
      <geom name="legs" type="box" pos="0 0 0.2" size="0.18 0.2 0.2"/>
    </body>
"""

_XML = H._XML.replace(
    '<geom name="floor" type="plane" size="100 100 0.1"/>',
    '<geom name="floor" type="plane" size="100 100 0.1"/>' + _CHAIR
).replace(
    """<user name="Height" dim="1" user="6 100.0 0.0 100.0 0.1"/>
    <user name="Balance" dim="1" user="6 50.0 0.0 100.0 0.1"/>
    <user name="CoM Vel." dim="2" user="0 10.0 0.0 100.0"/>
    <user name="Joint Vel." dim="21" user="0 0.01 0.0 0.1"/>
    <user name="Control" dim="21" user="3 0.025 0.0 0.1 0.3"/>""",
    """<user name="Torso Up" dim="1" user="6 10.0 0.0 100.0 0.1"/>
    <user name="Pelvis Up" dim="1" user="6 10.0 0.0 100.0 0.1"/>
    <user name="RFoot Up" dim="1" user="6 5.0 0.0 100.0 0.1"/>
    <user name="LFoot Up" dim="1" user="6 5.0 0.0 100.0 0.1"/>
    <user name="Head Height" dim="1" user="6 0.0 0.0 100.0 0.1"/>
    <user name="Torso Height" dim="1" user="6 20.0 0.0 100.0 0.1"/>
    <user name="Knee Feet XY" dim="1" user="6 30.0 0.0 100.0 0.1"/>
    <user name="COM Feet XY" dim="1" user="6 0.0 0.0 100.0 0.1"/>
    <user name="Facing Dir" dim="1" user="6 0.0 0.0 100.0 0.1"/>
    <user name="CoM Vel." dim="2" user="0 10.0 0.0 100.0"/>
    <user name="Joint Vel." dim="21" user="0 0.01 0.0 10."/>
    <user name="Control" dim="21" user="3 0.8 0.0 5. 0.05"/>
    <user name="Contact" dim="6" user="6 100.0 0.0 100.0 0.1"/>"""
).replace(
    '<numeric name="residual_Height Goal" data="1.4 0.6 1.6" />\n'
    '    <numeric name="residual_Speed Goal" data="1.0 0 3" />',
    '<numeric name="residual_Head Height" data="1.4 0 2." />\n'
    '    <numeric name="residual_Torso Height" data="1.3 0 2." />\n'
    '    <text name="task_transition" '
    'data="Sit Down|Stand Up|Relax|Stay Still"/>'
)


class HumanoidInteract(base.Task):
  """Sit on / stand up from a chair with contact-pair costs."""

  name = "Humanoid Interact"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._torso = names["body"].index("torso")
    self._pelvis = names["body"].index("pelvis")
    self._waist = names["body"].index("waist")
    self._foot = {s: names["body"].index(f"foot_{s}")
                  for s in ("left", "right")}
    self._shin = {s: names["body"].index(f"shin_{s}")
                  for s in ("left", "right")}
    self._head = names["site"].index("head")
    # contact keyframe: pelvis local point -> seat world point; torso
    # local point -> backrest world point (chair at -0.6, seat z=0.45)
    self._seat_point = np.array([-0.6, 0.0, 0.48])
    self._back_point = np.array([-0.79, 0.0, 0.72])
    self._facing_target = np.array([1.0, 0.0])
    state0 = np.zeros(NPARAM - 2, np.float32)
    self.residual_params = jnp.concatenate(
        [self.residual_params, jnp.asarray(state0)])
    self._current_mode = -1

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    dtype = d.qpos.dtype
    mode = params[S_MODE]
    is_sit = mode == MODE_SIT

    up = lambda b: d.xmat[b][:, 2]
    up_rows = jnp.stack([
        jnp.abs(up(self._torso)[2] - 1.0),
        jnp.abs(up(self._pelvis)[2] - 1.0),
        jnp.abs(up(self._foot["right"])[2] - 1.0),
        jnp.abs(up(self._foot["left"])[2] - 1.0)])

    head = d.site_xpos[self._head]
    torso_pos = d.xipos[self._torso]
    head_h = jnp.abs(head[2] - params[0])
    torso_h = jnp.abs(torso_pos[2] - params[1])

    foot_r = d.xpos[self._foot["right"]]
    foot_l = d.xpos[self._foot["left"]]
    knee_r = d.xpos[self._shin["right"]]
    knee_l = d.xpos[self._shin["left"]]
    feet_avg = 0.5 * (foot_r[:2] + foot_l[:2])
    knee_avg = 0.5 * (knee_r[:2] + knee_l[:2])
    knee_feet = jnp.linalg.norm(knee_avg - feet_avg)

    compos = d.subtree_com[self._torso]
    com_feet = jnp.linalg.norm(compos[:2] - feet_avg)

    # facing direction: torso forward xy toward the facing target
    fwd = d.xmat[self._torso][:2, 0]
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-8)
    target = jnp.asarray(self._facing_target, dtype)
    to_target = target - torso_pos[:2]
    facing = jnp.linalg.norm(torso_pos[:2] + fwd * 0.5 - target)
    facing = jnp.where(is_sit, facing, 0.0)

    comvel = sensors.subtree_linvel(m, d, self._torso)

    joint_vel = d.qvel[6:]
    control = d.ctrl

    # contact pairs (sit mode): pelvis -> seat, waist -> backrest
    pelvis_pt = d.xipos[self._pelvis]
    waist_pt = d.xipos[self._waist]
    c1 = jnp.abs(pelvis_pt - jnp.asarray(self._seat_point, dtype))
    c2 = jnp.abs(waist_pt - jnp.asarray(self._back_point, dtype))
    contact = jnp.where(is_sit, jnp.concatenate([c1, c2]),
                        jnp.zeros(6, dtype))

    return jnp.concatenate([
        up_rows, head_h[None], torso_h[None], knee_feet[None],
        com_feet[None], facing[None], comvel[:2], joint_vel, control,
        contact])

  # ---- lane-kernel in-kernel residual (stand-family modes) ----

  # Sit mode needs the chair-seat contacts, which the lane kernel's
  # ground-only planning dynamics drop -> Sit plans on the XLA pipeline
  lane_modes = (MODE_STAND, MODE_RELAX, MODE_STILL)

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py (component form),
    stand-family branch of residual() above: the is_sit terms (facing,
    contact) are identically zero in these modes, matching the
    pipeline's jnp.where rows."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    body_mass = np.asarray(g(m.body_mass))
    parent = np.asarray(m.body_parentid)
    torso = self._torso
    head_b = int(site_bodyid[self._head])
    head_p = [float(v) for v in site_pos[self._head]]
    up_bodies = [torso, self._pelvis,
                 self._foot["right"], self._foot["left"]]
    feet = [self._foot["right"], self._foot["left"]]
    shins = [self._shin["right"], self._shin["left"]]
    ids = []
    for b in range(int(m.nbody)):
      a = b
      while a not in (0, torso):
        a = int(parent[a])
      if a == torso:
        ids.append(b)
    total_mass = max(sum(float(body_mass[b]) for b in ids), 1e-12)
    nv, nu = int(m.nv), int(m.nu)

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      scom, ref, cvel = ctx["subtree_com"], ctx["ref"], ctx["cvel"]
      qvel, ctrl = ctx["qvel"], ctx["ctrl"]
      z = cv([0.0, 0.0, 1.0])
      rows = [jnp.abs(lm.qrot(xquat[b], z)[2] - 1.0) for b in up_bodies]
      head = lm.vadd(xpos[head_b], lm.qrot(xquat[head_b], cv(head_p)))
      rows.append(jnp.abs(head[2] - aux[0]))
      rows.append(jnp.abs(xipos[torso][2] - aux[1]))
      feet_avg = [0.5 * (xpos[feet[0]][k] + xpos[feet[1]][k])
                  for k in range(2)]
      knee_avg = [0.5 * (xpos[shins[0]][k] + xpos[shins[1]][k])
                  for k in range(2)]
      kx = knee_avg[0] - feet_avg[0]
      ky = knee_avg[1] - feet_avg[1]
      rows.append(jnp.sqrt(kx * kx + ky * ky))
      cx = scom[torso][0] - feet_avg[0]
      cy = scom[torso][1] - feet_avg[1]
      rows.append(jnp.sqrt(cx * cx + cy * cy))
      zero = qvel[0] * 0.0
      rows.append(zero)  # facing (sit-mode only)
      comvel = [0.0, 0.0, 0.0]
      for b in ids:
        ang_b, lin_b = cvel[b]
        linv = lm.vadd(lin_b, lm.vcross(ang_b, lm.vsub(xipos[b], ref[b])))
        for k in range(3):
          comvel[k] = comvel[k] + float(body_mass[b]) * linv[k]
      rows += [comvel[0] / total_mass, comvel[1] / total_mass]
      rows += [qvel[i] for i in range(6, nv)]
      rows += [ctrl[u] for u in range(nu)]
      rows += [zero] * 6  # contact pairs (sit-mode only)
      return rows

    def make_aux(d0, params):
      return jnp.stack([params[0], params[1]])

    return dict(dim=11 + (nv - 6) + nu + 6, naux=2, fn=fn,
                make_aux=make_aux)

  def transition(self, d: Data) -> Data:
    """Mode change applies the default weight preset + height goals
    (interact.cc:201-206)."""
    if self.mode != self._current_mode:
      self._current_mode = self.mode
      self.cost_spec = self.cost_spec.replace(
          weights=jnp.asarray(MODE_WEIGHTS[self.mode], jnp.float32))
      p = np.asarray(jax.device_get(self.residual_params)).copy()
      p[0], p[1] = MODE_HEIGHTS[self.mode]
      p[S_MODE] = self.mode
      self.residual_params = jnp.asarray(p, jnp.float32)
    return d
