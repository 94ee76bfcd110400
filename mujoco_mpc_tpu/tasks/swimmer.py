"""Swimmer task: 6-link planar swimmer reaching a target in viscous fluid.

Reference capability: mjpc/tasks/swimmer — residuals Control(5) +
nose-to-target XY distance with L2 norm (swimmer.cc:28-45); the host
transition teleports the target when reached (swimmer.cc:47-61). Exercises
the fluid (viscosity/density) passive-force model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base

_NLINK = 6


def _links(n):
  if n == 0:
    return ""
  inner = _links(n - 1)
  return f"""
      <body name="link{_NLINK - n}" pos="0.1 0 0">
        <joint name="joint{_NLINK - n}" type="hinge" axis="0 0 1"
               range="-100 100" damping="0.01"/>
        <geom name="geom{_NLINK - n}" type="capsule" fromto="0 0 0 0.1 0 0"
              size="0.01" mass="0.01" contype="0" conaffinity="0"/>
        {inner}
      </body>"""


_XML = f"""
<mujoco model="Swimmer">
  <option timestep="0.002" viscosity="0.1" density="4000"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="2.0" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="10" />
    <numeric name="sampling_exploration" data="0.05" />
    <numeric name="sampling_trajectories" data="10" />
  </custom>
  <worldbody>
    <body name="nose" pos="0 0 0.05">
      <joint name="rootx" type="slide" axis="1 0 0"/>
      <joint name="rooty" type="slide" axis="0 1 0"/>
      <joint name="rootz" type="hinge" axis="0 0 1"/>
      <geom name="nose_geom" type="capsule" fromto="0 0 0 0.1 0 0"
            size="0.01" mass="0.01" contype="0" conaffinity="0"/>
      <site name="nose_site" pos="0 0 0"/>
      {_links(_NLINK - 1)}
    </body>
    <body name="target" mocap="true" pos="0.5 0.5 0.05">
      <geom name="target_geom" type="sphere" size="0.02" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    {"".join(f'<motor name="m{i}" joint="joint{i}" gear="0.005" '
             f'ctrlrange="-1 1" ctrllimited="true"/>'
             for i in range(1, _NLINK))}
  </actuator>
  <sensor>
    <user name="Control" dim="5" user="0 0.1 0 1"/>
    <user name="Distance" dim="2" user="2 10 0 10 0.04"/>
  </sensor>
</mujoco>
"""


class Swimmer(base.Task):
  """Swim the nose to the target (reference "Swimmer")."""

  name = "Swimmer"

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    nose = d.xpos[1, :2]  # nose body origin
    target = d.mocap_pos[0, :2]
    return jnp.concatenate([d.ctrl, nose - target])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: ctrl + nose-to-target
    error; the target rides aux (frozen per plan like the pipeline's
    d0.mocap_pos). Pattern: tasks/quadruped.py."""
    m = getattr(self, "plan_model", self.model)
    nu = m.nu

    def fn(ctx):
      xpos, aux = ctx["xpos"], ctx["aux"]
      return list(ctx["ctrl"]) + [xpos[1][0] - aux[0],
                                  xpos[1][1] - aux[1]]

    def make_aux(d0, params):
      return d0.mocap_pos[0, :2]

    return dict(dim=nu + 2, naux=2, fn=fn, make_aux=make_aux)

  def transition(self, d: Data) -> Data:
    """Teleport target when the nose reaches it (host-side, stateful RNG)."""
    nose = np.asarray(d.xpos[1, :2]) if d.xpos is not None else np.zeros(2)
    target = np.asarray(d.mocap_pos[0, :2])
    if np.linalg.norm(target - nose) < 0.04:
      new_target = np.random.uniform(-0.8, 0.8, size=2)
      mocap = d.mocap_pos.at[0, :2].set(jnp.asarray(new_target))
      return d.replace(mocap_pos=mocap)
    return d
