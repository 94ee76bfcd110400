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
