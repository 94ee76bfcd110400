"""Cartpole swing-up task.

Reference capability: mjpc/tasks/cartpole (residuals Vertical / Centered /
Velocity / Control, cartpole.cc:36-49; cost spec + planner config in
task.xml). The MJCF here is our own authoring with the same structure and
cost conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

_XML = """
<mujoco model="Cartpole">
  <option timestep="0.01" integrator="RK4"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="1.0" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="10" />
    <numeric name="sampling_exploration" data="0.5" />
    <numeric name="sampling_trajectories" data="10" />
    <numeric name="residual_Goal" data="0.0 -1.5 1.5" />
  </custom>
  <worldbody>
    <light pos="0 0 3"/>
    <geom name="rail" type="capsule" size="0.02" fromto="-2 0 1 2 0 1"
          contype="0" conaffinity="0"/>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" range="-1.8 1.8"
             damping="0.01"/>
      <geom name="cart_geom" type="box" size="0.1 0.08 0.05" mass="1.0"
            contype="0" conaffinity="0"/>
      <body name="pole" pos="0 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0" damping="0.002"/>
        <geom name="pole_geom" type="capsule" fromto="0 0 0 0 0 0.6"
              size="0.025" mass="0.1" contype="0" conaffinity="0"/>
        <site name="tip" pos="0 0 0.6"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="slide_motor" joint="slider" gear="10" ctrlrange="-1 1"
           ctrllimited="true"/>
  </actuator>
  <sensor>
    <user name="Vertical" dim="1" user="6 10.0 0 100.0 0.01"/>
    <user name="Centered" dim="1" user="6 10.0 0 100.0 0.1"/>
    <user name="Velocity" dim="1" user="0 0.1 0.0 1.0"/>
    <user name="Control" dim="1" user="0 0.1 0.0 1.0"/>
    <jointpos name="slider_pos" joint="slider"/>
    <jointpos name="hinge_pos" joint="hinge"/>
    <framepos name="trace0" objtype="site" objname="tip"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0 3.141592"/>
  </keyframe>
</mujoco>
"""


class Cartpole(base.Task):
  """Swing the pole up and center the cart (reference cartpole.cc)."""

  name = "Cartpole"

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    goal = params[0]
    return jnp.stack([
        jnp.cos(d.qpos[1]) - 1.0,   # Vertical
        d.qpos[0] - goal,           # Centered
        d.qvel[1],                  # Velocity
        d.ctrl[0],                  # Control
    ])

  def residual_from_rollout(self, states: jax.Array, ctrls: jax.Array,
                            times: jax.Array,
                            params: jax.Array) -> jax.Array:
    """Lane-kernel scoring hook (ops/sampling_lane.py): the residual
    needs only qpos/qvel/ctrl, so it maps directly off the raw
    (H, nq+nv, K) state block. `params` is the traced residual-params
    argument (not self.residual_params, which jit would bake)."""
    goal = params[0]
    return jnp.stack([
        jnp.cos(states[:, 1]) - 1.0,   # Vertical
        states[:, 0] - goal,           # Centered
        states[:, 3],                  # Velocity (qvel of pole)
        ctrls[:, 0],                   # Control
    ], axis=1)
