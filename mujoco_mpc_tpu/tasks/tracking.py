"""Humanoid motion-capture tracking task.

Reference capability: mjpc/tasks/humanoid/tracking (tracking.cc:40-110):
track a keyframed motion clip — linear interpolation between consecutive
mocap keyframes at a fixed FPS provides the reference body positions and
velocities; residuals = joint velocity, control, per-body position tracking
error, per-body velocity tracking error.

The reference's clips are CMU mocap keyframes baked into its task XML; here
the clip is an arbitrary (n_frames, n_sites, 3) array supplied by the user
(a procedurally generated clip by default), exercising exactly the same
tracking machinery. The interpolation is a pure JAX gather — time-varying
references work inside rollouts with no host involvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base, humanoid

FPS = 30.0


def make_walk_clip(n_frames: int = 120, speed: float = 1.0,
                   height: float = 1.3) -> np.ndarray:
  """Procedural forward-walk clip for {head, torso-com, 4 foot points}.

  Returns (n_frames, 6, 3): head, com, foot L front/back, foot R front/back.
  """
  t = np.arange(n_frames) / FPS
  x = speed * t
  phase = 2 * np.pi * 1.4 * t
  clip = np.zeros((n_frames, 6, 3))
  clip[:, 0] = np.stack([x, 0 * x, height + 0.16 + 0.01 * np.sin(2 * phase)],
                        axis=1)  # head
  clip[:, 1] = np.stack([x, 0 * x, np.full_like(x, height - 0.35)],
                        axis=1)  # com-ish
  step_amp = 0.06
  lz = step_amp * np.maximum(0, np.sin(phase))
  rz = step_amp * np.maximum(0, np.sin(phase + np.pi))
  lx = x + 0.15 * np.sin(phase)
  rx = x + 0.15 * np.sin(phase + np.pi)
  clip[:, 2] = np.stack([lx + 0.09, 0.1 + 0 * x, lz + 0.04], axis=1)
  clip[:, 3] = np.stack([lx - 0.09, 0.1 + 0 * x, lz + 0.04], axis=1)
  clip[:, 4] = np.stack([rx + 0.09, -0.1 + 0 * x, rz + 0.04], axis=1)
  clip[:, 5] = np.stack([rx - 0.09, -0.1 + 0 * x, rz + 0.04], axis=1)
  return clip


class HumanoidTracking(humanoid.HumanoidStand):
  """Track a motion clip (reference "Humanoid Track")."""

  name = "Humanoid Track"

  def __init__(self, clip: np.ndarray = None, **kw):
    super().__init__(**kw)
    self.clip = jnp.asarray(clip if clip is not None else make_walk_clip(),
                            jnp.float32)

  def xml(self) -> str:
    # tracking weights replace the stand cost terms
    xml = humanoid._XML
    xml = xml.replace(
        '<user name="Height" dim="1" user="6 100.0 0.0 100.0 0.1"/>\n'
        '    <user name="Balance" dim="1" user="6 50.0 0.0 100.0 0.1"/>\n'
        '    <user name="CoM Vel." dim="2" user="0 10.0 0.0 100.0"/>\n'
        '    <user name="Joint Vel." dim="21" user="0 0.01 0.0 0.1"/>\n'
        '    <user name="Control" dim="21" user="3 0.025 0.0 0.1 0.3"/>',
        '<user name="Joint Vel." dim="21" user="0 0.01 0.0 0.1"/>\n'
        '    <user name="Control" dim="21" user="3 0.025 0.0 0.1 0.3"/>\n'
        '    <user name="Track Pos." dim="18" user="2 50.0 0.0 100.0 0.01"/>\n'
        '    <user name="Track Vel." dim="18" user="0 0.1 0.0 1.0"/>')
    return xml

  def _reference(self, time: jax.Array):
    """Linearly interpolated clip pose + velocity at `time`.

    (reference ComputeInterpolationValues, tracking.cc:63-110)
    """
    n = self.clip.shape[0]
    idx = time * FPS
    i0 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, n - 2)
    w1 = jnp.clip(idx - i0, 0.0, 1.0)
    p0 = self.clip[i0]
    p1 = self.clip[i0 + 1]
    pos = (1.0 - w1)[..., None, None] * p0 + w1[..., None, None] * p1
    vel = (p1 - p0) * FPS
    return pos, vel

  def lane_residual_spec(self, horizon: int = None):
    """In-kernel tracking residual (ops/step_lane.py component form).

    The clip targets are time-varying, so they ride PER-STEP aux rows:
    make_aux interpolates the clip at the horizon's step times in XLA
    (d0.time is traced — live SetState never recompiles) and packs
    (pos 18, vel 18) rows per step; the kernel fn gathers row
    t*36 + i through ctx["aux_dyn"] (a dynamic aux_ref read, the same
    mechanism as the ctrl spline's node gather)."""
    if horizon is None:
      raise TypeError("tracking lane spec needs the horizon")
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    h = float(g(m.opt.timestep))
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
    sites = [(head_b, head_p)] + feet   # head + 4 foot points

    def fn(ctx):
      lm, cv, t = ctx["lm"], ctx["cv"], ctx["t"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      scom, ref, cvel = ctx["subtree_com"], ctx["ref"], ctx["cvel"]
      qvel, ctrl, aux_dyn = ctx["qvel"], ctx["ctrl"], ctx["aux_dyn"]
      base = t * 36

      def tgt(i):
        return aux_dyn(base + i)

      rows = [qvel[i] for i in range(6, nv)]
      rows += list(ctrl)
      # current points: head, subtree com, 4 foot sites (order matches
      # residual(): [head, com, feet])
      pts, vels = [], []
      sp_head = lm.vadd(xpos[head_b], lm.qrot(xquat[head_b], cv(head_p)))
      pts.append(sp_head)
      ang_h, lin_h = cvel[head_b]
      vels.append(lm.vadd(lin_h, lm.vcross(
          ang_h, lm.vsub(sp_head, ref[head_b]))))
      comvel = [0.0, 0.0, 0.0]
      for b in ids:
        ang_b, lin_b = cvel[b]
        linv = lm.vadd(lin_b, lm.vcross(ang_b, lm.vsub(xipos[b], ref[b])))
        for k in range(3):
          comvel[k] = comvel[k] + float(body_mass[b]) * linv[k]
      comvel = [v / total_mass for v in comvel]
      pts.append(tuple(scom[torso][k] for k in range(3)))
      vels.append(tuple(comvel))
      for b, p in feet:
        sp = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        pts.append(sp)
        ang_b, lin_b = cvel[b]
        vels.append(lm.vadd(lin_b, lm.vcross(
            ang_b, lm.vsub(sp, ref[b]))))
      for j, p in enumerate(pts):
        for k in range(3):
          rows.append(p[k] - tgt(3 * j + k))
      for j, v in enumerate(vels):
        for k in range(3):
          rows.append(v[k] - tgt(18 + 3 * j + k))
      return rows

    clip = self.clip

    def make_aux(d0, params):
      times = d0.time + h * jnp.arange(horizon, dtype=jnp.float32)
      pos, vel = jax.vmap(self._reference)(times)     # (H, 6, 3) each
      per_step = jnp.concatenate(
          [pos.reshape(horizon, 18), vel.reshape(horizon, 18)], axis=1)
      return per_step.reshape(-1)                     # row t*36 + i

    return dict(dim=(nv - 6) + nu + 36, naux=horizon * 36, fn=fn,
                make_aux=make_aux)

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    ref_pos, ref_vel = self._reference(d.time)

    head = d.site_xpos[self._head]
    com = d.subtree_com[self._torso]
    feet = d.site_xpos[jnp.array(self._feet_sites)]  # L-f, L-b, R-f, R-b
    cur = jnp.concatenate([head[None], com[None], feet], axis=0)  # (6, 3)

    head_vel = sensors.site_velocity(m, d, self._head)
    com_vel = sensors.subtree_linvel(m, d, self._torso)
    feet_vel = jnp.stack(
        [sensors.site_velocity(m, d, int(s)) for s in self._feet_sites])
    cur_vel = jnp.concatenate(
        [head_vel[None], com_vel[None], feet_vel], axis=0)

    track_pos = (cur - ref_pos).reshape(-1)
    track_vel = (cur_vel - ref_vel).reshape(-1)
    return jnp.concatenate([d.qvel[6:], d.ctrl, track_pos, track_vel])
