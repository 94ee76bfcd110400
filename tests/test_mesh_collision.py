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


def _drop_track(xml, steps=250, settle_tol=2.5e-2, track_tol=2e-2,
                track_window=80):
  """Closed-loop drop vs C MuJoCo: track through fall+impact, settle at
  matching heights (pattern: test_plane_mesh_drop_matches_mujoco)."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = model_lib.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  d = model_lib.make_data(m)
  step = jax.jit(lambda d: F.step(m, d))
  errs = []
  for t in range(steps):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    errs.append(np.abs(np.asarray(d.qpos[:3]) - mjd.qpos[:3]).max())
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  assert max(errs[:track_window]) < track_tol, max(errs[:track_window])
  assert abs(float(d.qpos[2]) - mjd.qpos[2]) < settle_tol, (
      float(d.qpos[2]), mjd.qpos[2])
  return m, d, mjd


_BLOCK = """
  0.3 0.3 0   -0.3 0.3 0   0.3 -0.3 0   -0.3 -0.3 0
  0.3 0.3 0.2   -0.3 0.3 0.2   0.3 -0.3 0.2   -0.3 -0.3 0.2
"""


def test_capsule_mesh_drop_tracks_mujoco():
  """Capsule dropped flat onto a static convex mesh block (stable rest
  — the vertex-cloud narrowphase sees the block's top-face vertices)."""
  xml = f"""
  <mujoco>
    <option timestep="0.004"/>
    <asset><mesh name="block" vertex="{_BLOCK}"/></asset>
    <worldbody>
      <geom name="base_plane" type="plane" size="2 2 .1" contype="0"
            conaffinity="0"/>
      <body name="base">
        <geom name="base" type="mesh" mesh="block"/>
      </body>
      <body name="cap" pos="0 0 0.5">
        <freejoint/>
        <geom name="cap" type="capsule" fromto="-0.15 0 0 0.15 0 0"
              size="0.04" mass="0.2"/>
      </body>
    </worldbody>
  </mujoco>"""
  m, d, _ = _drop_track(xml, settle_tol=4e-2)
  from mujoco_mpc_tpu.physics import collision as coll
  assert any(g.types == (coll.CAPSULE, coll.MESH)
             for g in m.collision_pairs.groups)
  assert float(d.qpos[2]) > 0.2  # rests on the block top (z=0.2)


def test_box_mesh_drop_tracks_mujoco():
  """Mesh dropped onto a static box table."""
  xml = f"""
  <mujoco>
    <option timestep="0.004"/>
    <asset><mesh name="octa" vertex="{_VERTS}"/></asset>
    <worldbody>
      <geom name="table" type="box" pos="0 0 0.1" size="0.5 0.5 0.1"/>
      <body name="obj" pos="0 0 0.5">
        <freejoint/>
        <geom name="obj" type="mesh" mesh="octa" mass="0.2"/>
      </body>
    </worldbody>
  </mujoco>"""
  m, d, _ = _drop_track(xml, settle_tol=4e-2)
  from mujoco_mpc_tpu.physics import collision as coll
  assert any(g.types == (coll.BOX, coll.MESH)
             for g in m.collision_pairs.groups)
  assert float(d.qpos[2]) > 0.25  # rests on the table top


def test_mesh_mesh_drop_tracks_mujoco():
  """Convex mesh dropped onto a static convex mesh block (vertex-vs-hull
  narrowphase; MuJoCo collides convex hulls via MPR — same physics
  class, one-contact-deepest vs our up-to-4)."""
  block = """
  0.3 0.3 0   -0.3 0.3 0   0.3 -0.3 0   -0.3 -0.3 0
  0.3 0.3 0.2   -0.3 0.3 0.2   0.3 -0.3 0.2   -0.3 -0.3 0.2
  """
  xml = f"""
  <mujoco>
    <option timestep="0.004"/>
    <asset>
      <mesh name="octa" vertex="{_VERTS}"/>
      <mesh name="block" vertex="{block}"/>
    </asset>
    <worldbody>
      <body name="base" pos="0 0 0">
        <geom name="base" type="mesh" mesh="block"/>
      </body>
      <body name="obj" pos="0 0 0.6">
        <freejoint/>
        <geom name="obj" type="mesh" mesh="octa" mass="0.2"/>
      </body>
    </worldbody>
  </mujoco>"""
  m, d, mjd = _drop_track(xml, settle_tol=4e-2, track_tol=2.5e-2)
  from mujoco_mpc_tpu.physics import collision as coll
  assert any(g.types == (coll.MESH, coll.MESH)
             for g in m.collision_pairs.groups)
  assert float(d.qpos[2]) > 0.2  # rests ON the block (top at z=0.2)
