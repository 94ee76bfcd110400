"""Fingers manipulation task: two 2-DoF fingers bring a box to a target.

Reference capability: mjpc/tasks/fingers (fingers.cc:30-58): residuals
Reach(6) (both fingertips to object), Bring(3) (three object keypoints to
their mocap targets), Control(6). Exercises sphere-box contacts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base


def _finger(name, x):
  return f"""
    <body name="proximal_{name}" pos="{x} 0 0.12">
      <joint name="base_{name}" type="hinge" axis="0 1 0" range="-90 90"
             damping="0.5"/>
      <geom name="proximal_{name}_geom" type="capsule"
            fromto="0 0 0 0 0 -0.06" size="0.015" mass="0.1"/>
      <body name="distal_{name}" pos="0 0 -0.06">
        <joint name="knuckle_{name}" type="hinge" axis="0 1 0"
               range="-120 120" damping="0.3"/>
        <geom name="distal_{name}_geom" type="capsule"
              fromto="0 0 0 0 0 -0.05" size="0.012" mass="0.05"/>
        <geom name="tip_{name}" type="sphere" pos="0 0 -0.055" size="0.014"
              mass="0.01" condim="6" friction="1.2 0.01 0.001"/>
        <site name="fingertip_{name}" pos="0 0 -0.055"/>
      </body>
    </body>"""


_XML = f"""
<mujoco model="Fingers">
  <option timestep="0.004" cone="elliptic" noslip_iterations="5"/>
  <custom>
    <numeric name="agent_planner" data="0" />
    <numeric name="agent_horizon" data="0.5" />
    <numeric name="agent_timestep" data="0.01" />
    <numeric name="sampling_spline_points" data="4" />
    <numeric name="sampling_exploration" data="0.2" />
    <numeric name="sampling_trajectories" data="30" />
  </custom>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    {_finger("a", -0.08)}
    {_finger("b", 0.08)}
    <body name="object" pos="0 0 0.025">
      <freejoint/>
      <geom name="box" type="box" size="0.025 0.025 0.025" mass="0.08"
            condim="6" friction="1.2 0.01 0.001"/>
      <site name="corner0" pos="0.025 0.025 0.025"/>
      <site name="corner1" pos="-0.025 0.025 -0.025"/>
      <site name="corner2" pos="0.025 -0.025 -0.025"/>
    </body>
    <body name="target" mocap="true" pos="0.05 0 0.025">
      <geom name="target_geom" type="box" size="0.025 0.025 0.025"
            contype="0" conaffinity="0"/>
      <site name="target0" pos="0.025 0.025 0.025"/>
      <site name="target1" pos="-0.025 0.025 -0.025"/>
      <site name="target2" pos="0.025 -0.025 -0.025"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="base_a_m" joint="base_a" gear="1" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="knuckle_a_m" joint="knuckle_a" gear="0.6" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="base_b_m" joint="base_b" gear="1" ctrlrange="-1 1"
           ctrllimited="true"/>
    <motor name="knuckle_b_m" joint="knuckle_b" gear="0.6" ctrlrange="-1 1"
           ctrllimited="true"/>
  </actuator>
  <sensor>
    <user name="Reach" dim="6" user="2 0.35 0 1 0.02"/>
    <user name="Bring" dim="3" user="6 1 0 5 0.05"/>
    <user name="Control" dim="4" user="6 .05 0 1 0.01"/>
  </sensor>
</mujoco>
"""


class Fingers(base.Task):
  """Bring the box to the target pose (reference "FreeFingers")."""

  name = "FreeFingers"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._tips = [names["site"].index(f"fingertip_{s}") for s in "ab"]
    self._corners = [names["site"].index(f"corner{i}") for i in range(3)]
    self._targets = [names["site"].index(f"target{i}") for i in range(3)]
    self._object = names["body"].index("object")

  def xml(self) -> str:
    return _XML

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    obj = d.xpos[self._object]
    reach = jnp.concatenate(
        [d.site_xpos[t] - obj for t in self._tips])
    bring = jnp.stack([
        jnp.linalg.norm(d.site_xpos[c] - d.site_xpos[t] + 1e-9)
        for c, t in zip(self._corners, self._targets)
    ])
    return jnp.concatenate([reach, bring, d.ctrl])

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: fingertip reach + box
    corner-to-target distances. Target sites sit on a mocap body (fixed
    during a rollout) so their world positions ride aux rows."""
    import numpy as np
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    tips = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
            for s in self._tips]
    corners = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
               for s in self._corners]
    obj = self._object
    nu = int(m.nu)

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      xpos, xquat, ctrl = ctx["xpos"], ctx["xquat"], ctx["ctrl"]
      rows = []
      for b, p in tips:
        tip = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        rows += [tip[k] - xpos[obj][k] for k in range(3)]
      for j, (b, p) in enumerate(corners):
        c = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        dx = [c[k] - aux[3 * j + k] + 1e-9 for k in range(3)]
        rows.append(jnp.sqrt(dx[0] * dx[0] + dx[1] * dx[1]
                             + dx[2] * dx[2]))
      rows += [ctrl[u] for u in range(nu)]
      return rows

    from mujoco_mpc_tpu.physics import math as mm
    tgt_body = int(site_bodyid[self._targets[0]])
    tgt_mocap = int(np.asarray(m.body_mocapid)[tgt_body])
    tgt_off = [jnp.asarray(site_pos[s], jnp.float32)
               for s in self._targets]

    def make_aux(d0, params):
      # target sites ride the mocap body: world pos from the mocap pose
      # (make_data has no derived FK fields)
      tp = d0.mocap_pos[tgt_mocap]
      tq = d0.mocap_quat[tgt_mocap]
      return jnp.concatenate(
          [tp + mm.rot_vec_quat(tq, o.astype(tp.dtype))
           for o in tgt_off]).astype(jnp.float32)

    return dict(dim=3 * len(tips) + len(corners) + nu,
                naux=3 * len(corners), fn=fn, make_aux=make_aux)
