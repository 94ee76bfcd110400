"""Convex-mesh collision oracle vs C MuJoCo (plane-mesh rest + drop)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import model as model_lib

# an octahedron-ish convex solid (unique rest faces, no thin features)
_VERTS = """
0.1 0 0   -0.1 0 0   0 0.1 0   0 -0.1 0   0 0 0.12   0 0 -0.12
"""

_XML = f"""
<mujoco>
  <option timestep="0.004"/>
  <asset>
    <mesh name="octa" vertex="{_VERTS}"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body name="obj" pos="0 0 0.5" euler="20 15 0">
      <freejoint/>
      <geom name="obj" type="mesh" mesh="octa" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_plane_mesh_drop_matches_mujoco():
  mjm = mujoco.MjModel.from_xml_string(_XML)
  m = model_lib.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  d = model_lib.make_data(m)
  step = jax.jit(lambda d: F.step(m, d))
  errs = []
  for t in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    errs.append(np.abs(np.asarray(d.qpos[:3]) - mjd.qpos[:3]).max())
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  # through the fall + impact the engines track; after settling the
  # object must rest ON the plane at matching height
  assert max(errs[:80]) < 1.5e-2, max(errs[:80])
  assert abs(float(d.qpos[2]) - mjd.qpos[2]) < 2e-2, (
      float(d.qpos[2]), mjd.qpos[2])
  assert float(d.qpos[2]) > 0.0


def test_sphere_mesh_contact_distance():
  """Sphere vs mesh: nearest-vertex proximity gives a sane signed
  distance against a dense hull (compare against analytic distance to
  an octahedron vertex)."""
  xml = f"""
  <mujoco>
    <asset><mesh name="octa" vertex="{_VERTS}"/></asset>
    <worldbody>
      <body name="obj" pos="0 0 0.2"><freejoint/>
        <geom name="obj" type="mesh" mesh="octa" mass="0.2"/></body>
      <body name="ball" pos="0.3 0 0.2"><freejoint/>
        <geom name="ball" type="sphere" size="0.05" mass="0.1"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = model_lib.put_model(mjm)
  from mujoco_mpc_tpu.physics import collision as coll
  has_pair = any(g.types == (coll.SPHERE, coll.MESH)
                 for g in m.collision_pairs.groups)
  assert has_pair
  d = model_lib.make_data(m)
  d = F.fwd_position(m, d)
  dist, pos, nrm = coll.collide(m, d)
  # ball center 0.3 from mesh center; nearest vertex (0.1,0,0) at body
  # frame -> world (0.1, 0, 0.2); gap = 0.2 - 0.05 = 0.15
  sphere_mesh = [float(x) for x in np.asarray(dist)]
  assert any(abs(v - 0.15) < 1e-3 for v in sphere_mesh), sphere_mesh
