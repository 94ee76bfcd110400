"""Particle task: planar point mass chasing a (time-varying) goal.

Reference capability: mjpc/tasks/particle/particle.cc — residuals
Position(2)/Velocity(2)/Control(2) with quadratic norms; the moving variant
tracks a Lissajous curve goal = (0.25 sin t, 0.25 cos(t/pi)) which the
host-side transition writes into mocap (particle.cc:35-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

_XML = """
<mujoco model="Particle">
  <option timestep="0.01"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.5" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="10" />
    <numeric name="sampling_exploration" data="0.05" />
    <numeric name="sampling_trajectories" data="10" />
  </custom>
  <worldbody>
    <geom name="floor" type="plane" size="0.5 0.5 0.1" contype="0"
          conaffinity="0"/>
    <body name="pointmass" pos="0 0 0.01">
      <joint name="x" type="slide" axis="1 0 0" damping="1.0"/>
      <joint name="y" type="slide" axis="0 1 0" damping="1.0"/>
      <geom name="mass" type="sphere" size="0.01" mass="0.3" contype="0"
            conaffinity="0"/>
      <site name="tip" pos="0 0 0"/>
    </body>
    <body name="goal" mocap="true" pos="0.25 0 0.01">
      <geom name="goal_geom" type="sphere" size="0.012" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="xm" joint="x" gear="1" ctrlrange="-1 1" ctrllimited="true"/>
    <motor name="ym" joint="y" gear="1" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
  <sensor>
    <user name="Position" dim="2" user="0 5.0 0.0 10.0"/>
    <user name="Velocity" dim="2" user="0 0.1 0.0 1.0"/>
    <user name="Control" dim="2" user="0 0.1 0.0 1.0"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 0"/>
  </keyframe>
</mujoco>
"""


def lissajous_goal(t: jax.Array) -> jax.Array:
  """Reference goal curve (particle.cc:54-55)."""
  return jnp.stack([0.25 * jnp.sin(t), 0.25 * jnp.cos(t / jnp.pi)])


class Particle(base.Task):
  """Track the Lissajous goal (reference "Particle")."""

  name = "Particle"

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    goal = lissajous_goal(d.time)
    return jnp.concatenate([
        d.qpos[:2] - goal,
        d.qvel[:2],
        d.ctrl[:2],
    ])

  def transition(self, d: Data) -> Data:
    goal = lissajous_goal(d.time)
    mocap = d.mocap_pos.at[0, :2].set(goal)
    return d.replace(mocap_pos=mocap)

  def residual_from_rollout(self, states: jax.Array, ctrls: jax.Array,
                            times: jax.Array,
                            params: jax.Array) -> jax.Array:
    """Lane-kernel scoring hook (ops/sampling_lane.py): residuals from the
    raw (H, nq+nv, K) state block."""
    goal = lissajous_goal(times)            # (2, H)
    pos = states[:, 0:2, :]                 # (H, 2, K)
    vel = states[:, 2:4, :]
    err = pos - goal.T[:, :, None]
    return jnp.concatenate([err, vel, ctrls], axis=1)  # (H, 6, K)


class ParticleFixed(Particle):
  """Fixed-goal variant (reference "ParticleFixed"): goal from mocap."""

  name = "ParticleFixed"

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    goal = d.mocap_pos[0, :2]
    return jnp.concatenate([
        d.qpos[:2] - goal,
        d.qvel[:2],
        d.ctrl[:2],
    ])

  def transition(self, d: Data) -> Data:
    return d
