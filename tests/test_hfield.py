"""Heightfield collision: fidelity oracle vs C MuJoCo + the Quadruped
Hill task (reference tasks/quadruped/task_hill.xml capability)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import model as model_lib
from mujoco_mpc_tpu.tasks import registry

_XML = """
<mujoco>
  <option timestep="0.004"/>
  <asset>
    <hfield name="terrain" nrow="24" ncol="24" size="2 2 0.3 0.2"/>
  </asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="terrain"/>
    <body name="ball" pos="0.3 0.2 0.8">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.08" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""


def _hill(nr, nc):
  y, x = np.meshgrid(np.linspace(-1, 1, nr), np.linspace(-1, 1, nc),
                     indexing="ij")
  h = 0.5 + 0.4 * np.sin(2.0 * x) * np.cos(1.5 * y)
  return (h - h.min()) / (h.max() - h.min())


def _models():
  mjm = mujoco.MjModel.from_xml_string(_XML)
  mjm.hfield_data[:] = _hill(24, 24).reshape(-1)
  m = model_lib.put_model(mjm)
  return mjm, m


def test_hfield_sphere_drop_matches_mujoco():
  """Drop a ball onto the heightfield: our bilinear-patch narrowphase
  must track C MuJoCo's triangulated-prism contacts through the impact
  and the settled rest height."""
  mjm, m = _models()
  mjd = mujoco.MjData(mjm)
  d = model_lib.make_data(m)
  step = jax.jit(lambda d: F.step(m, d))
  errs = []
  for t in range(160):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    errs.append(np.abs(np.asarray(d.qpos[:3]) - mjd.qpos[:3]).max())
  # free fall + impact + early rolling: the two engines track closely;
  # longer horizons diverge chaotically (rolling on a slope) because
  # bilinear patches and triangulated prisms give slightly different
  # contact normals — that is a modeling difference, not a bug
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  assert max(errs[:80]) < 1.5e-2, max(errs[:80])
  assert errs[-1] < 8e-2, errs[-1]
  # never tunnels through the surface
  assert float(d.qpos[2]) > -0.05


def test_hfield_static_heights_match_mujoco():
  """mj_forward contact depths at several poses: compare our narrowphase
  signed distance with MuJoCo's contact dist for touching spheres."""
  mjm, m = _models()
  mjd = mujoco.MjData(mjm)
  from mujoco_mpc_tpu.physics import collision as coll
  hits = 0
  for (px, py) in [(0.0, 0.0), (0.5, -0.4), (-0.8, 0.7), (1.2, 1.2)]:
    # place the ball just touching: find surface height via mujoco
    mjd.qpos[:] = [px, py, 1.0, 1, 0, 0, 0]
    mjd.qvel[:] = 0
    mujoco.mj_forward(mjm, mjd)
    # drop analytically: put sphere at a mild penetration and compare
    for z_off in (0.02, -0.01):
      # mujoco surface height via raycast
      geomid = np.zeros(1, np.int32)
      z_top = mujoco.mj_ray(mjm, mjd, np.array([px, py, 2.0]),
                            np.array([0.0, 0.0, -1.0]), None, 1,
                            1,  # exclude the ball body
                            geomid)
      if z_top < 0:
        continue
      surf_z = 2.0 - z_top
      mjd.qpos[:] = [px, py, surf_z + 0.08 + z_off, 1, 0, 0, 0]
      mujoco.mj_forward(mjm, mjd)
      d = model_lib.make_data(m).replace(
          qpos=jnp.asarray(mjd.qpos.copy(), jnp.float32))
      d = F.fwd_position(m, d)
      dist, pos, nrm = coll.collide(m, d)
      ours = float(jnp.min(dist))
      if mjd.ncon:
        ref = float(min(mjd.contact[i].dist for i in range(mjd.ncon)))
        assert abs(ours - ref) < 1.5e-2, (px, py, z_off, ours, ref)
        hits += 1
  assert hits >= 3  # the comparison actually exercised contacts


def test_quadruped_hill_planner_improves():
  """The planner finds better-than-nominal plans on the heightfield
  terrain (pipeline planner; the lane kernel covers flat ground only)."""
  from mujoco_mpc_tpu.planners import sampling
  task = registry.get_task("Quadruped Hill")
  config = sampling.make_config(task).replace(num_trajectory=16,
                                              horizon=12)
  planner = sampling.SamplingPlanner(task, config)
  d0 = task.make_data()
  key = jax.random.PRNGKey(0)
  first, best = None, np.inf
  for i in range(6):
    key, sub = jax.random.split(key)
    info = planner.optimize(sub, d0)
    if first is None:
      first = float(info["nominal_return"])
    best = min(best, float(info["best_return"]))
  assert np.isfinite(best) and best < 1e5  # rollouts survive the terrain
  assert best < 0.99 * first, (first, best)
