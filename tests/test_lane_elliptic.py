"""Lane-kernel elliptic cone parity: condim 3/4/6 blocks vs pipeline.

The lane kernel's in-kernel solver carries per-contact elliptic cone
BLOCKS (ops/step_lane.py emit_elliptic / ell_terms) so elliptic
condim-6 manipulation tasks plan in the same contact class they
simulate — the reference plans on the simulated model
(/root/reference/mjpc/trajectory.cc:141-180 + fingers/task.xml:4).
These tests pin kernel-vs-pipeline parity the same way the pyramidal
lane features are pinned (tests/test_ops.py), at condim 3/4/6, both
impratio=1 and impratio=10, ground and body-body pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ELLIPTIC_BALL = """
<mujoco model="eball">
  <option timestep="0.002" gravity="0 0 -9.81" cone="elliptic"
          impratio="{impratio}" iterations="30" ls_iterations="25"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="ball_geom" type="sphere" size="0.1" mass="0.5"
            condim="{condim}" friction="1.2 0.01 0.005"/>
    </body>
  </worldbody>
</mujoco>
"""

EBODY = """
<mujoco model="ebody">
  <option timestep="0.002" gravity="0 0 -9.81" cone="elliptic"
          iterations="30" ls_iterations="25"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="box" pos="0 0 0.12">
      <freejoint/>
      <geom name="boxg" type="box" size="0.15 0.15 0.1" mass="0.5"
            condim="6" friction="1.0 0.01 0.003"/>
    </body>
    <body name="ball" pos="0.03 0 0.34">
      <freejoint/>
      <geom name="ballg" type="sphere" size="0.08" mass="0.2"
            condim="6" friction="1.0 0.01 0.003"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize("condim,impratio", [(3, 1.0), (4, 1.0),
                                             (6, 1.0), (6, 10.0)])
def test_lane_kernel_elliptic_ground_matches_pipeline(condim, impratio):
  """Sliding, spinning ball on the floor: the in-kernel elliptic cone
  block reproduces the pipeline's constrained dynamics step for step
  (incl. torsional/rolling friction rows and impratio stiffening)."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M

  mjm = mujoco.MjModel.from_xml_string(
      ELLIPTIC_BALL.format(condim=condim, impratio=impratio))
  m = M.put_model(mjm)
  assert step_lane.supports(m, ground_only=True)
  h_hor, k = 25, 4
  kernel = step_lane.build_rollout_kernel(m, h_hor, 1, interpret=True)
  q0 = np.tile(mjm.qpos0[:, None], (1, k)).astype(np.float32)
  q0[2, :] = 0.0995  # ~0.5mm penetration: the cone is live from step 0
  v0 = np.zeros((m.nv, k), np.float32)
  v0[0, :] = 0.8   # tangential slide
  v0[2, :] = -0.5  # pressing down
  v0[3, :] = 3.0   # roll about x
  v0[5, :] = 6.0   # spin about the normal (torsion)
  # closed loop on step_array (the kernel's step_body as plain jnp —
  # identical in-kernel math without the interpreter dispatch cost;
  # the Pallas wrapper itself is covered by the smaller interpret run
  # in test_lane_kernel_elliptic_pallas_wrapper below)
  step_k = jax.jit(kernel.step_array)
  step = jax.jit(lambda d: F.step(m, d))
  qp, qv = jnp.asarray(q0), jnp.asarray(v0)
  ctrl0 = jnp.zeros((0, k), jnp.float32)
  d = M.make_data(m).replace(qpos=jnp.asarray(q0[:, 0]),
                             qvel=jnp.asarray(v0[:, 0]))
  for t in range(h_hor):
    d = step(d)
    qp, qv = step_k(qp, qv, ctrl0)
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    got = np.concatenate([np.asarray(qp[:, 0]), np.asarray(qv[:, 0])])
    np.testing.assert_allclose(got, ref, atol=5e-4, err_msg=f"t={t}")


def test_lane_kernel_pyramidal_condim6_ground_matches_pipeline():
  """Pyramidal condim-6 (the Panda contact class): torsion/rolling
  pyramid rows in-kernel match the pipeline's constrained dynamics."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M

  xml = ELLIPTIC_BALL.format(condim=6, impratio=1.0).replace(
      'cone="elliptic"', 'cone="pyramidal"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = M.put_model(mjm)
  assert int(m.opt.cone) == 0
  kernel = step_lane.build_rollout_kernel(m, 2, 1, interpret=True)
  k = 4
  q0 = np.tile(mjm.qpos0[:, None], (1, k)).astype(np.float32)
  q0[2, :] = 0.0995
  v0 = np.zeros((m.nv, k), np.float32)
  v0[0, :] = 0.8
  v0[3, :] = 3.0
  v0[5, :] = 6.0
  step_k = jax.jit(kernel.step_array)
  step = jax.jit(lambda d: F.step(m, d))
  qp, qv = jnp.asarray(q0), jnp.asarray(v0)
  ctrl0 = jnp.zeros((0, k), jnp.float32)
  d = M.make_data(m).replace(qpos=jnp.asarray(q0[:, 0]),
                             qvel=jnp.asarray(v0[:, 0]))
  for t in range(25):
    d = step(d)
    qp, qv = step_k(qp, qv, ctrl0)
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    got = np.concatenate([np.asarray(qp[:, 0]), np.asarray(qv[:, 0])])
    np.testing.assert_allclose(got, ref, atol=5e-4, err_msg=f"t={t}")


@pytest.mark.smoke
def test_lane_kernel_elliptic_pallas_wrapper():
  """The full Pallas rollout wrapper (interpret mode) with elliptic
  blocks: short condim-6 rollout matches the pipeline."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M

  mjm = mujoco.MjModel.from_xml_string(
      ELLIPTIC_BALL.format(condim=6, impratio=1.0))
  m = M.put_model(mjm)
  h_hor, k = 8, 4
  kernel = step_lane.build_rollout_kernel(m, h_hor, 1, interpret=True)
  q0 = np.tile(mjm.qpos0[:, None], (1, k)).astype(np.float32)
  q0[2, :] = 0.0995
  v0 = np.zeros((m.nv, k), np.float32)
  v0[0, :] = 0.8
  v0[5, :] = 6.0
  out = kernel(jnp.asarray(q0), jnp.asarray(v0),
               jnp.zeros((0, k), jnp.float32))
  d = M.make_data(m).replace(qpos=jnp.asarray(q0[:, 0]),
                             qvel=jnp.asarray(v0[:, 0]))
  step = jax.jit(lambda d: F.step(m, d))
  for t in range(h_hor):
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    np.testing.assert_allclose(out[t, :, 0], ref, atol=5e-4,
                               err_msg=f"t={t}")
    d = step(d)


@pytest.mark.smoke
def test_lane_kernel_elliptic_body_pairs_match_pipeline():
  """condim-6 elliptic sphere-box body pair (+ box-plane ground block):
  kernel steps from stacked contact-rich states match the pipeline."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M

  mjm = mujoco.MjModel.from_xml_string(EBODY)
  m = M.put_model(mjm)
  assert step_lane.supports(m, ground_only=True, body_pairs=True)
  h_hor, k = 20, 4
  kernel = step_lane.build_rollout_kernel(m, h_hor, 1, interpret=True,
                                          body_pairs=True)
  rng = np.random.default_rng(7)
  q0 = np.tile(mjm.qpos0[:, None], (1, k)).astype(np.float32)
  q0[2, :] = 0.101  # box settled on the floor
  q0[9, :] = 0.2805  # ball on the box top face (~0.5mm penetration)
  q0[7, :] += 0.01 * rng.standard_normal(k)  # ball x jitter
  v0 = np.zeros((m.nv, k), np.float32)
  v0[6, :] = 0.5    # ball sliding on the box
  v0[11, :] = 4.0   # ball spinning (torsion on the pair)
  step_k = jax.jit(kernel.step_array)
  step = jax.jit(lambda d: F.step(m, d))
  qp, qv = jnp.asarray(q0), jnp.asarray(v0)
  ctrl0 = jnp.zeros((0, k), jnp.float32)
  d = M.make_data(m).replace(qpos=jnp.asarray(q0[:, 0]),
                             qvel=jnp.asarray(v0[:, 0]))
  for t in range(h_hor):
    d = step(d)
    qp, qv = step_k(qp, qv, ctrl0)
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    got = np.concatenate([np.asarray(qp[:, 0]), np.asarray(qv[:, 0])])
    np.testing.assert_allclose(got, ref, atol=2e-3, err_msg=f"t={t}")


BOXBOX = """
<mujoco model="boxbox">
  <option timestep="0.002" gravity="0 0 -9.81" cone="elliptic"
          impratio="10"/>
  <worldbody>
    <body name="base" pos="0 0 0.1">
      <geom name="baseg" type="box" size="0.2 0.2 0.1" mass="0.6"
            condim="6" friction="1.5 0.02 0.002"/>
    </body>
    <body name="top" pos="0.05 0.02 0.2795">
      <freejoint/>
      <geom name="topg" type="box" size="0.08 0.08 0.08" mass="0.2"
            condim="6" friction="1.5 0.02 0.002"/>
    </body>
  </worldbody>
  <custom>
    <numeric name="solver_iterations" data="2"/>
    <numeric name="solver_ls_iterations" data="2"/>
  </custom>
</mujoco>
"""


def test_lane_kernel_boxbox_elliptic_matches_pipeline():
  """condim-6 elliptic box-on-box (the Bimanual Insert peg/socket
  contact class, impratio=10): in-kernel vertex-in-box narrowphase +
  cone blocks match the pipeline step for step. The lower box is
  world-static so BOTH vertex-in-box directions run while the model
  stays small enough to compile quickly."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M

  mjm = mujoco.MjModel.from_xml_string(BOXBOX)
  m = M.put_model(mjm)
  assert step_lane.supports(m, ground_only=True, body_pairs=True)
  h_hor, k = 10, 4
  kernel = step_lane.build_rollout_kernel(m, h_hor, 1, interpret=True,
                                          body_pairs=True)
  q0 = np.tile(mjm.qpos0[:, None], (1, k)).astype(np.float32)
  q0[2, :] = 0.2795  # top box on the base (~0.5mm penetration)
  v0 = np.zeros((m.nv, k), np.float32)
  v0[0, :] = 0.4     # top box sliding
  v0[5, :] = 3.0     # top box spinning (torsion)
  # kernel side runs EAGERLY: the 16 traced corner narrowphases make
  # XLA:CPU's compile of this step graph pathologically slow (>10 min,
  # flagged "Very slow compile" by XLA itself), while eager dispatch of
  # the same math takes seconds. TPU/Mosaic compiles it fine (~6 min,
  # verified on hardware); parity here pins the MATH.
  step_k = kernel.step_array
  step = jax.jit(lambda d: F.step(m, d))
  qp, qv = jnp.asarray(q0), jnp.asarray(v0)
  ctrl0 = jnp.zeros((0, k), jnp.float32)
  d = M.make_data(m).replace(qpos=jnp.asarray(q0[:, 0]),
                             qvel=jnp.asarray(v0[:, 0]))
  for t in range(h_hor):
    d = step(d)
    qp, qv = step_k(qp, qv, ctrl0)
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    got = np.concatenate([np.asarray(qp[:, 0]), np.asarray(qv[:, 0])])
    np.testing.assert_allclose(got, ref, atol=2e-3, err_msg=f"t={t}")


@pytest.mark.slow
def test_lane_kernel_fingers_model_elliptic_parity():
  """The FreeFingers model (condim-6 elliptic with torsion/rolling —
  the reference's fingers/task.xml:4 contact class) steps identically
  through the kernel and the pipeline. Every collision group of this
  model is in the kernel's narrowphase class (plane/sphere/capsule/box
  combos), so FULL-state parity is well-defined; Bimanual Insert's
  box-box pairs are outside it (a documented contact-SET planning
  reduction), so the cone-class parity is pinned here instead.
  noslip is disabled for the comparison — it is the separately
  disclosed not-in-kernel reduction."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as model_lib
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("FreeFingers")
  # reduced Newton schedule in the MODEL so kernel and pipeline stay
  # bit-identical while the CPU XLA compile shrinks ~3x (same trick as
  # test_ops.py::test_lane_kernel_body_contacts_match_pipeline)
  xml = task.xml().replace(
      'noslip_iterations="5"', 'noslip_iterations="0"').replace(
      "</mujoco>",
      '<custom><numeric name="solver_iterations" data="2"/>'
      '<numeric name="solver_ls_iterations" data="1"/></custom>'
      "</mujoco>")
  assert 'noslip_iterations="0"' in xml
  m = model_lib.put_model(mujoco.MjModel.from_xml_string(xml))
  assert int(m.opt.cone) == 1, "FreeFingers must simulate+plan elliptic"
  assert step_lane.supports(m, ground_only=True, body_pairs=True)
  kernel = step_lane.build_rollout_kernel(
      m, 2, 2, interpret=True, body_pairs=True)
  rng = np.random.default_rng(11)
  d0 = model_lib.make_data(m).replace(
      qpos=task.make_data().qpos, time=jnp.asarray(0.0, jnp.float32))
  k_c = 4
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[:, 1:] += 0.01 * rng.standard_normal((m.nq, k_c - 1))
  qvel0 = 0.05 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.2, 0.2, (m.nu, k_c)), jnp.float32)
  out = jax.jit(kernel.step_array)(
      jnp.asarray(qpos0, jnp.float32), jnp.asarray(qvel0, jnp.float32),
      ctrl)
  qp_k, qv_k = np.asarray(out[0]), np.asarray(out[1])
  step = jax.jit(lambda d: F.step(m, d))
  for kk in range(k_c):
    d = d0.replace(qpos=jnp.asarray(qpos0[:, kk], jnp.float32),
                   qvel=jnp.asarray(qvel0[:, kk], jnp.float32),
                   ctrl=ctrl[:, kk])
    dn = step(d)
    np.testing.assert_allclose(qp_k[:, kk], np.asarray(dn.qpos),
                               atol=2e-3, err_msg=f"qpos k={kk}")
    np.testing.assert_allclose(qv_k[:, kk], np.asarray(dn.qvel),
                               atol=5e-2, err_msg=f"qvel k={kk}")
