"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import cholesky


@pytest.mark.parametrize("n,k", [(4, 128), (18, 128), (7, 256)])
def test_chol_solve_lanes_matches_reference(n, k):
  rng = np.random.default_rng(0)
  g = rng.standard_normal((k, n, n))
  a = np.einsum("kij,klj->kil", g, g) + n * np.eye(n)[None]
  a = jnp.asarray(np.moveaxis(a, 0, -1), jnp.float32)  # (n, n, K)
  b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)

  x = cholesky.chol_solve_lanes(a, b, interpret=True)
  ref = cholesky.chol_solve_reference(a, b)
  np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)


def test_score_fused_matches_reference():
  from mujoco_mpc_tpu.ops import scoring
  from mujoco_mpc_tpu.tasks import registry
  task = registry.get_task("Quadruped Flat")
  rng = np.random.default_rng(0)
  k, t, nr = 16, 8, task.cost_spec.num_residual
  residuals = jnp.asarray(rng.standard_normal((k, t, nr)), jnp.float32)
  fused = scoring.score_fused(residuals, task.cost_spec, interpret=True)
  ref = scoring.score_reference(residuals, task.cost_spec)
  np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_lane_rollout_kernel_matches_pipeline():
  """The lane-parallel Pallas rollout kernel (ops/step_lane.py) must
  reproduce the jnp physics pipeline exactly (same discrete actions)."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import model as M
  from mujoco_mpc_tpu import rollout as RL
  from tests import models as tm

  mjm = mujoco.MjModel.from_xml_string(tm.CHAIN)
  m = M.put_model(mjm)
  assert step_lane.supports(m)
  h_hor, p_nodes, k = 15, 4, 8
  kernel = step_lane.build_rollout_kernel(m, h_hor, p_nodes, interpret=True)
  rng = np.random.default_rng(0)
  qpos0 = jnp.asarray(0.3 * rng.standard_normal((m.nq, k)), jnp.float32)
  qvel0 = jnp.asarray(0.2 * rng.standard_normal((m.nv, k)), jnp.float32)
  values = jnp.asarray(rng.uniform(-1, 1, (p_nodes * m.nu, k)), jnp.float32)
  out = kernel(qpos0, qvel0, values)

  # jnp reference applying the SAME zero-hold node schedule (discrete
  # index policy, avoiding f32 node-boundary roundoff differences)
  node_of = [min(int(t * p_nodes / (h_hor - 1)), p_nodes - 1)
             for t in range(h_hor)]
  dt = float(jax.device_get(m.opt.timestep))

  def ref_one(q0, v0, vals):
    d0 = M.make_data(m).replace(qpos=q0, qvel=v0)
    vals = vals.reshape(p_nodes, m.nu)
    sched = jnp.asarray(np.array(node_of), jnp.int32)

    def action(state, time):
      idx = jnp.clip(jnp.round(time / dt).astype(jnp.int32), 0, h_hor - 1)
      return vals[sched[idx]]

    traj = RL.rollout(m, lambda mm, dd: jnp.zeros(1),
                      lambda r: jnp.sum(r, -1), action, d0, h_hor)
    return traj.states[:, :m.nq + m.nv]

  ref = jax.vmap(ref_one, in_axes=(-1, -1, -1), out_axes=-1)(
      qpos0, qvel0, values)
  np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.slow
def test_lane_sampling_planner_particle():
  """The lane-kernel sampling fast path plans the particle task and
  matches the regular planner's behavior class (tracks the moving goal)."""
  from mujoco_mpc_tpu.ops import sampling_lane, step_lane
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Particle")
  m = task.model
  assert step_lane.supports(m)
  config = sampling.make_config(task).replace(num_trajectory=8, horizon=21)
  planner = sampling_lane.LaneSamplingPlanner(task, config, interpret=True)
  step = jax.jit(lambda d: F.step(m, d))
  d = task.make_data()
  key = jax.random.PRNGKey(0)
  for t in range(60):
    for _ in range(2):
      key, sub = jax.random.split(key)
      info = planner.optimize(sub, d)
    u = planner.action(d.time)
    d = step(d.replace(ctrl=u))
  r = task.residual(m, F.forward(m, d), task.residual_params)
  dist = float(jnp.linalg.norm(r[:2]))
  assert np.isfinite(float(info["best_return"]))
  assert dist < 0.15, f"particle {dist} from goal (lane path)"


@pytest.mark.slow
def test_lane_kernel_joint_limits_match_pipeline():
  """Limit rows inside the lane kernel reproduce the pipeline's
  constrained dynamics exactly (cartpole slider driven into its stop)."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M
  from mujoco_mpc_tpu.tasks.cartpole import Cartpole

  task = Cartpole()
  m = task.model.replace(opt=task.model.opt.replace(integrator=0))
  assert step_lane.supports(m)
  h_hor, k = 12, 4
  kernel = step_lane.build_rollout_kernel(m, h_hor, 1, interpret=True)
  qpos0 = jnp.asarray(np.tile([[1.76], [0.3]], (1, k)), jnp.float32)
  qvel0 = jnp.asarray(np.tile([[1.5], [0.0]], (1, k)), jnp.float32)
  values = jnp.ones((1, k), jnp.float32)
  out = kernel(qpos0, qvel0, values)

  d = M.make_data(m).replace(qpos=qpos0[:, 0], qvel=qvel0[:, 0],
                             ctrl=values[:1, 0])
  step = jax.jit(lambda d: F.step(m, d))
  for t in range(h_hor):
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    np.testing.assert_allclose(out[t, :, 0], ref, atol=2e-4)
    d = step(d)
  # the stop held: slider stays at ~1.8 despite constant outward push
  assert float(out[-1, 0, 0]) < 1.85


@pytest.mark.slow
def test_lane_kernel_ground_contact_matches_pipeline():
  """Plane-sphere contact inside the lane kernel (free-joint ball drop)
  reproduces the pipeline's constrained dynamics exactly."""
  import mujoco
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import model as M
  from tests import models as tm

  mjm = mujoco.MjModel.from_xml_string(tm.BOUNCE)
  m = M.put_model(mjm)
  assert step_lane.supports(m, ground_only=True)
  h_hor, k = 25, 4
  kernel = step_lane.build_rollout_kernel(m, h_hor, 1, interpret=True)
  q0 = np.tile(mjm.qpos0[:, None], (1, k)).astype(np.float32)
  q0[2, :] = 0.16
  v0 = np.zeros((m.nv, k), np.float32)
  v0[2, :] = -0.5
  out = kernel(jnp.asarray(q0), jnp.asarray(v0),
               jnp.zeros((0, k), jnp.float32))
  d = M.make_data(m).replace(qpos=jnp.asarray(q0[:, 0]),
                             qvel=jnp.asarray(v0[:, 0]))
  step = jax.jit(lambda d: F.step(m, d))
  for t in range(h_hor):
    ref = np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])
    np.testing.assert_allclose(out[t, :, 0], ref, atol=3e-4)
    d = step(d)

@pytest.mark.slow
def test_lane_kernel_quadruped_residual_matches_pipeline():
  """In-kernel task residual rows (lane_residual_spec) must match the
  pipeline residual evaluated at the same states/controls/time."""
  import mujoco  # noqa: F401  (oracle import parity with other tests)
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import collision as coll
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Quadruped Flat")
  m = getattr(task, "plan_model", task.model)
  spec = task.lane_residual_spec()
  h_hor, k_c = 2, 4
  # step_array: the kernel's step_body as plain jnp (the Pallas
  # interpret-mode path is covered by the other lane tests; dispatching
  # the quadruped's ~50k-op step through the interpreter takes ~20min)
  kernel = step_lane.build_rollout_kernel(
      m, 3, 2, interpret=True, contact_types=(coll.SPHERE,),
      residual_fn=spec["fn"], residual_dim=spec["dim"], naux=spec["naux"])
  step_lane_fn = jax.jit(kernel.step_array)
  rng = np.random.default_rng(3)
  d0 = task.make_data().replace(time=jnp.asarray(0.37, jnp.float32))
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[7:] += 0.05 * rng.standard_normal((m.nq - 7, k_c))
  qpos0[2] += 0.02 * rng.standard_normal(k_c)
  qvel0 = 0.1 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.3, 0.3, (m.nu, k_c)), jnp.float32)
  aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))[:, None], (1, k_c)),
      jnp.float32)

  h = float(jax.device_get(m.opt.timestep))
  fwd = jax.jit(lambda d: F.forward(m, d))
  qp = jnp.asarray(qpos0, jnp.float32)
  qv = jnp.asarray(qvel0, jnp.float32)
  for t in range(h_hor):
    qp2, qv2, res = step_lane_fn(qp, qv, ctrl,
                                 jnp.asarray(t, jnp.int32), aux)
    assert res.shape == (spec["dim"], k_c)
    for k in range(k_c):
      d = d0.replace(qpos=qp[:, k], qvel=qv[:, k], ctrl=ctrl[:, k],
                     time=d0.time + t * h)
      ref = task.residual(m, fwd(d), task.residual_params)
      np.testing.assert_allclose(np.asarray(res[:, k]),
                                 np.asarray(ref), atol=5e-4,
                                 err_msg=f"t={t} k={k}")
    qp, qv = qp2, qv2

def test_lane_kernel_humanoid_residual_matches_pipeline():
  """Humanoid lane_residual_spec rows must match the pipeline residual
  at identical states (step_array path; see the quadruped test above)."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics import collision as coll
  from mujoco_mpc_tpu.tasks import registry

  # Walk exercises the shared Stand spec plus the speed-tracking term.
  # residual_array traces only the derived quantities the residual
  # needs (the full nv=27 step trace is impractical on CPU; the
  # constrained dynamics are covered by the other lane tests).
  for task_name in ("Humanoid Walk",):
    task = registry.get_task(task_name)
    m = getattr(task, "plan_model", task.model)
    spec = task.lane_residual_spec()
    k_c = 4
    kernel = step_lane.build_rollout_kernel(
        m, 2, 2, interpret=True, contact_types=(),
        residual_fn=spec["fn"], residual_dim=spec["dim"],
        naux=spec["naux"])
    res_fn = jax.jit(kernel.residual_array)
    rng = np.random.default_rng(5)
    d0 = task.make_data()
    qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
    qpos0[7:] += 0.05 * rng.standard_normal((m.nq - 7, k_c))
    qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
    ctrl = jnp.asarray(rng.uniform(-0.5, 0.5, (m.nu, k_c)), jnp.float32)
    aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
        spec["make_aux"](d0, task.residual_params)))[:, None], (1, k_c)),
        jnp.float32)
    res = res_fn(jnp.asarray(qpos0, jnp.float32),
                 jnp.asarray(qvel0, jnp.float32), ctrl,
                 jnp.asarray(0, jnp.int32), aux)
    assert res.shape == (spec["dim"], k_c)
    fwd = jax.jit(lambda d: F.forward(m, d))
    for k in range(k_c):
      d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                     qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                     ctrl=ctrl[:, k])
      ref = task.residual(m, fwd(d), task.residual_params)
      np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                                 atol=5e-4, err_msg=f"{task_name} k={k}")

def test_lane_kernel_small_task_residuals_match_pipeline():
  """Walker/Acrobot/Swimmer lane_residual_spec rows match the pipeline
  residual at identical states (derived-only path; fast)."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  for task_name in ("Walker", "Acrobot", "Swimmer"):
    task = registry.get_task(task_name)
    m = getattr(task, "plan_model", task.model)
    spec = task.lane_residual_spec()
    k_c = 4
    kernel = step_lane.build_rollout_kernel(
        m, 2, 2, interpret=True, contact_types=(),
        residual_fn=spec["fn"], residual_dim=spec["dim"],
        naux=spec["naux"])
    res_fn = jax.jit(kernel.residual_array)
    rng = np.random.default_rng(7)
    d0 = task.make_data()
    qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
    qpos0 += 0.1 * rng.standard_normal(qpos0.shape)
    qvel0 = 0.3 * rng.standard_normal((m.nv, k_c))
    ctrl = jnp.asarray(rng.uniform(-0.5, 0.5, (m.nu, k_c)), jnp.float32)
    aux_1 = np.asarray(jax.device_get(
        spec["make_aux"](d0, task.residual_params)))
    aux = jnp.asarray(np.tile(aux_1[:, None], (1, k_c)), jnp.float32)
    res = res_fn(jnp.asarray(qpos0, jnp.float32),
                 jnp.asarray(qvel0, jnp.float32), ctrl,
                 jnp.asarray(0, jnp.int32), aux)
    assert res.shape == (spec["dim"], k_c), task_name
    fwd = jax.jit(lambda d: F.forward(m, d))
    for k in range(k_c):
      d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                     qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                     ctrl=ctrl[:, k])
      ref = task.residual(m, fwd(d), task.residual_params)
      np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                                 atol=5e-4, err_msg=f"{task_name} k={k}")


def test_lane_kernel_op3_residual_matches_pipeline():
  """OP3 lane_residual_spec (Stand mode) rows match the pipeline
  residual at identical states (derived-only path)."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("OP3")
  m = getattr(task, "plan_model", task.model)
  spec = task.lane_residual_spec()
  k_c = 4
  kernel = step_lane.build_rollout_kernel(
      m, 2, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  res_fn = jax.jit(kernel.residual_array)
  rng = np.random.default_rng(11)
  d0 = task.make_data()
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[7:] += 0.05 * rng.standard_normal((m.nq - 7, k_c))
  qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
  # sample within ctrlrange: the kernel clamps ctrl like the rollout
  # policy does, the raw pipeline residual does not
  cr = np.asarray(jax.device_get(m.actuator_ctrlrange))
  ctrl = jnp.asarray(
      rng.uniform(np.maximum(cr[:, :1], -0.3), np.minimum(cr[:, 1:], 0.3),
                  (m.nu, k_c)), jnp.float32)
  aux_1 = np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))
  aux = jnp.asarray(np.tile(aux_1[:, None], (1, k_c)), jnp.float32)
  res = res_fn(jnp.asarray(qpos0, jnp.float32),
               jnp.asarray(qvel0, jnp.float32), ctrl,
               jnp.asarray(0, jnp.int32), aux)
  assert res.shape == (spec["dim"], k_c)
  fwd = jax.jit(lambda d: F.forward(m, d))
  for k in range(k_c):
    d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                   qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                   ctrl=ctrl[:, k])
    ref = task.residual(m, fwd(d), task.residual_params)
    np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                               atol=5e-4, err_msg=f"OP3 k={k}")


def test_lane_kernel_manipulation_residuals_match_pipeline():
  """Panda / FreeFingers / PickAndPlace lane_residual_spec rows match
  the pipeline residual at identical states (derived-only path)."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.physics.model import FREE
  from mujoco_mpc_tpu.tasks import registry

  for task_name in ("Panda", "FreeFingers", "PickAndPlace",
                    "Hand Reorient", "Bimanual Handover",
                    "Bimanual Insert", "Bimanual Reorient"):
    task = registry.get_task(task_name)
    m = getattr(task, "plan_model", task.model)
    spec = task.lane_residual_spec()
    k_c = 3
    kernel = step_lane.build_rollout_kernel(
        m, 2, 2, interpret=True, contact_types=(),
        residual_fn=spec["fn"], residual_dim=spec["dim"],
        naux=spec["naux"],
        body_pairs=bool(getattr(task, "plan_body_pairs", False)))
    res_fn = jax.jit(kernel.residual_array)
    rng = np.random.default_rng(13)
    d0 = task.make_data()
    qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None],
                    (1, k_c))
    qpos0 += 0.05 * rng.standard_normal(qpos0.shape)
    # renormalize free-joint quaternions after perturbation
    jnt_type = np.asarray(m.jnt_type)
    jnt_qposadr = np.asarray(m.jnt_qposadr)
    for j in range(len(jnt_type)):
      if int(jnt_type[j]) == FREE:
        a = int(jnt_qposadr[j]) + 3
        qpos0[a:a + 4] /= np.linalg.norm(qpos0[a:a + 4], axis=0)
    qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
    cr = np.asarray(jax.device_get(m.actuator_ctrlrange))
    ctrl = jnp.asarray(
        rng.uniform(np.maximum(cr[:, :1], -0.3),
                    np.minimum(cr[:, 1:], 0.3), (m.nu, k_c)), jnp.float32)
    aux_1 = np.asarray(jax.device_get(
        spec["make_aux"](d0, task.residual_params)))
    aux = jnp.asarray(np.tile(aux_1[:, None], (1, k_c)), jnp.float32)
    res = res_fn(jnp.asarray(qpos0, jnp.float32),
                 jnp.asarray(qvel0, jnp.float32), ctrl,
                 jnp.asarray(0, jnp.int32), aux)
    assert res.shape == (spec["dim"], k_c), task_name
    fwd = jax.jit(lambda d: F.forward(m, d))
    # Bimanual Insert rows 6-7 are the contact-normal grasp: the lane
    # spec's pad-sphere narrowphase is a documented planning-model
    # approximation of residual()'s solver-contact version — exclude
    # them from bitwise parity, assert both stay in the [0, 1] grasp
    # convention instead
    skip_rows = {"Bimanual Insert": (6, 7)}.get(task_name, ())
    keep = np.array([i for i in range(spec["dim"])
                     if i not in skip_rows])
    for k in range(k_c):
      d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                     qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                     ctrl=ctrl[:, k])
      ref = task.residual(m, fwd(d), task.residual_params)
      np.testing.assert_allclose(np.asarray(res[keep, k]),
                                 np.asarray(ref)[keep], atol=5e-4,
                                 err_msg=f"{task_name} k={k}")
      for i in skip_rows:
        assert -1e-5 <= float(res[i, k]) <= 1.0 + 1e-5, (task_name, i)
        assert -1e-5 <= float(ref[i]) <= 1.0 + 1e-5, (task_name, i)


def test_lane_kernel_interact_residual_matches_pipeline():
  """Humanoid Interact lane spec (stand-family modes): rows match the
  pipeline residual with the sit-only terms identically zero."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import interact, registry

  task = registry.get_task("Humanoid Interact")
  # stand mode (default params are Sit, which plans on the pipeline)
  p = np.asarray(jax.device_get(task.residual_params)).copy()
  p[interact.S_MODE] = interact.MODE_STAND
  task.residual_params = jnp.asarray(p, jnp.float32)
  m = getattr(task, "plan_model", task.model)
  spec = task.lane_residual_spec()
  k_c = 3
  kernel = step_lane.build_rollout_kernel(
      m, 2, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  res_fn = jax.jit(kernel.residual_array)
  rng = np.random.default_rng(17)
  d0 = task.make_data()
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[7:] += 0.05 * rng.standard_normal((m.nq - 7, k_c))
  qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
  cr = np.asarray(jax.device_get(m.actuator_ctrlrange))
  ctrl = jnp.asarray(
      rng.uniform(np.maximum(cr[:, :1], -0.3),
                  np.minimum(cr[:, 1:], 0.3), (m.nu, k_c)), jnp.float32)
  aux_1 = np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))
  aux = jnp.asarray(np.tile(aux_1[:, None], (1, k_c)), jnp.float32)
  res = res_fn(jnp.asarray(qpos0, jnp.float32),
               jnp.asarray(qvel0, jnp.float32), ctrl,
               jnp.asarray(0, jnp.int32), aux)
  assert res.shape == (spec["dim"], k_c)
  fwd = jax.jit(lambda d: F.forward(m, d))
  for k in range(k_c):
    d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                   qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                   ctrl=ctrl[:, k])
    ref = task.residual(m, fwd(d), task.residual_params)
    np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                               atol=5e-4, err_msg=f"Interact k={k}")


def test_lane_kernel_quadrotor_site_transmission_exact():
  """TRN_SITE actuation in the lane kernel: quadrotor dynamics under
  rotor thrust match the pipeline step exactly (2e-4), and the lane
  residual matches the pipeline residual."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Quadrotor")
  m = getattr(task, "plan_model", task.model)
  assert step_lane.supports(m, ground_only=True)
  spec = task.lane_residual_spec()
  k_c = 4
  kernel = step_lane.build_rollout_kernel(
      m, 3, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  step_fn = jax.jit(kernel.step_array)
  rng = np.random.default_rng(19)
  d0 = task.make_data()
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[2] += 0.5 + 0.1 * rng.standard_normal(k_c)  # airborne
  qpos0[3:7] += 0.05 * rng.standard_normal((4, k_c))
  qpos0[3:7] /= np.linalg.norm(qpos0[3:7], axis=0)
  qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
  # asymmetric thrusts: excites force AND torque rows of the site moment
  ctrl = jnp.asarray(rng.uniform(0.5, 3.0, (m.nu, k_c)), jnp.float32)
  aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))[:, None], (1, k_c)),
      jnp.float32)
  fwd = jax.jit(lambda d: F.forward(m, d))
  step = jax.jit(lambda d: F.step(m, d))
  qp = jnp.asarray(qpos0, jnp.float32)
  qv = jnp.asarray(qvel0, jnp.float32)
  for t in range(3):
    qp2, qv2, res = step_fn(qp, qv, ctrl, jnp.asarray(t, jnp.int32), aux)
    for k in range(k_c):
      d = d0.replace(qpos=qp[:, k], qvel=qv[:, k], ctrl=ctrl[:, k])
      ref = task.residual(m, fwd(d), task.residual_params)
      np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                                 atol=5e-4, err_msg=f"res t={t} k={k}")
      dn = step(d)
      np.testing.assert_allclose(np.asarray(qp2[:, k]),
                                 np.asarray(dn.qpos), atol=2e-4,
                                 err_msg=f"qpos t={t} k={k}")
      np.testing.assert_allclose(np.asarray(qv2[:, k]),
                                 np.asarray(dn.qvel), atol=2e-3,
                                 err_msg=f"qvel t={t} k={k}")
    qp, qv = qp2, qv2


@pytest.mark.slow
def test_lane_kernel_swimmer_fluid_exact():
  """In-kernel inertia-box fluid (viscosity/density): swimmer dynamics
  match the pipeline step exactly. Before this the kernel silently
  dropped fluid forces — the swimmer cannot swim without them."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Swimmer")
  m = getattr(task, "plan_model", task.model)
  assert float(jax.device_get(m.opt.viscosity)) > 0
  spec = task.lane_residual_spec()
  kernel = step_lane.build_rollout_kernel(
      m, 3, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  step_fn = jax.jit(kernel.step_array)
  rng = np.random.default_rng(23)
  d0 = task.make_data()
  k_c = 3
  qpos0 = (np.tile(np.asarray(jax.device_get(d0.qpos))[:, None],
                   (1, k_c))
           + 0.1 * rng.standard_normal((m.nq, k_c)))
  qvel0 = 0.3 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.5, 0.5, (m.nu, k_c)), jnp.float32)
  aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))[:, None], (1, k_c)),
      jnp.float32)
  step = jax.jit(lambda d: F.step(m, d))
  qp = jnp.asarray(qpos0, jnp.float32)
  qv = jnp.asarray(qvel0, jnp.float32)
  for t in range(3):
    qp2, qv2, _ = step_fn(qp, qv, ctrl, jnp.asarray(t, jnp.int32), aux)
    for k in range(k_c):
      d = d0.replace(qpos=qp[:, k], qvel=qv[:, k], ctrl=ctrl[:, k])
      dn = step(d)
      np.testing.assert_allclose(np.asarray(qp2[:, k]),
                                 np.asarray(dn.qpos), atol=2e-6,
                                 err_msg=f"qpos t={t} k={k}")
      np.testing.assert_allclose(np.asarray(qv2[:, k]),
                                 np.asarray(dn.qvel), atol=5e-5,
                                 err_msg=f"qvel t={t} k={k}")
    qp, qv = qp2, qv2


@pytest.mark.slow
def test_ilqg_lane_rollouts_match_pipeline():
  """iLQG's lane-kernel line-search rollouts: same returns / chosen
  alpha as the vmapped pipeline feedback rollouts (acrobot, tiny
  shapes so Pallas interpret mode stays fast)."""
  from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Acrobot")
  cfg = ilqg_lib.make_config(task).replace(
      horizon=4, num_alphas=3, num_fb_scales=2)
  d0 = F.forward(task.model, task.make_data())
  p_ref = ilqg_lib.ILQGPlanner(task, cfg, lane=False)
  p_lane = ilqg_lib.ILQGPlanner(task, cfg, lane=True)
  key = jax.random.PRNGKey(0)
  for it in range(2):
    ia = p_ref.optimize(key, d0)
    ib = p_lane.optimize(key, d0)
    np.testing.assert_allclose(float(ia["nominal_return"]),
                               float(ib["nominal_return"]),
                               rtol=1e-3, err_msg=f"nominal it={it}")
    np.testing.assert_allclose(float(ia["best_return"]),
                               float(ib["best_return"]),
                               rtol=1e-3, err_msg=f"best it={it}")
  # the policies the two paths carry must match closely too
  np.testing.assert_allclose(np.asarray(p_lane.policy.actions),
                             np.asarray(p_ref.policy.actions),
                             atol=1e-3)


def test_lane_kernel_tracking_residual_matches_pipeline():
  """Humanoid Track lane spec: the time-varying clip targets ride
  per-step aux rows gathered with ctx['aux_dyn']; rows must match the
  pipeline residual at the matching clip time."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Humanoid Track")
  m = getattr(task, "plan_model", task.model)
  horizon = 4
  spec = task.lane_residual_spec(horizon=horizon)
  k_c = 3
  kernel = step_lane.build_rollout_kernel(
      m, horizon, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  res_fn = jax.jit(kernel.residual_array, static_argnames=())
  rng = np.random.default_rng(7)
  d0 = task.make_data()
  h = float(jax.device_get(m.opt.timestep))
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[7:] += 0.05 * rng.standard_normal((m.nq - 7, k_c))
  qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.5, 0.5, (m.nu, k_c)), jnp.float32)
  aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))[:, None], (1, k_c)),
      jnp.float32)
  fwd = jax.jit(lambda d: F.forward(m, d))
  for t in (0, 2, 3):   # several steps -> several clip times
    res = res_fn(jnp.asarray(qpos0, jnp.float32),
                 jnp.asarray(qvel0, jnp.float32), ctrl, t, aux)
    assert res.shape == (spec["dim"], k_c)
    for k in range(k_c):
      d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                     qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                     ctrl=ctrl[:, k],
                     time=d0.time + jnp.asarray(t * h, jnp.float32))
      ref = task.residual(m, fwd(d), task.residual_params)
      np.testing.assert_allclose(
          np.asarray(res[:, k]), np.asarray(ref), atol=5e-4,
          err_msg=f"t={t} k={k}")


def test_lane_kernel_rubik_residual_matches_pipeline():
  """Rubik lane spec rows (goal quat / face goals / mode gate on aux)
  match the pipeline residual."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Rubik")
  m = task.plan_model
  spec = task.lane_residual_spec()
  k_c = 4
  kernel = step_lane.build_rollout_kernel(
      m, 2, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  rng = np.random.default_rng(11)
  d0 = task.make_data()
  # scrambled-ish state: faces turned, cube nudged + rotated
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[:9] += 0.1 * rng.standard_normal((9, k_c))
  qpos0[9:12] += 0.01 * rng.standard_normal((3, k_c))
  qq = qpos0[12:16] + 0.2 * rng.standard_normal((4, k_c))
  qpos0[12:16] = qq / np.linalg.norm(qq, axis=0, keepdims=True)
  qpos0[16:] += 0.5 * rng.standard_normal((6, k_c))
  qvel0 = 0.3 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.3, 0.3, (m.nu, k_c)), jnp.float32)
  # exercise the Solve gate: nonzero face goals + active mode
  import mujoco_mpc_tpu.tasks.rubik as RB
  p = np.asarray(jax.device_get(task.residual_params)).copy()
  p[RB.P_FACES:RB.P_FACES + 6] = rng.standard_normal(6)
  p[RB.S_MODE] = RB.MODE_SOLVE
  p[RB.S_GOAL_INDEX] = 2
  params = jnp.asarray(p, jnp.float32)
  aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
      spec["make_aux"](d0, params)))[:, None], (1, k_c)), jnp.float32)
  res = jax.jit(kernel.residual_array)(
      jnp.asarray(qpos0, jnp.float32), jnp.asarray(qvel0, jnp.float32),
      ctrl, 0, aux)
  fwd = jax.jit(lambda d: F.forward(m, d))
  for k in range(k_c):
    d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                   qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                   ctrl=ctrl[:, k])
    ref = task.residual(m, fwd(d), params)
    np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                               atol=5e-4, err_msg=f"k={k}")


@pytest.mark.slow
def test_lane_kernel_body_contacts_match_pipeline():
  """Body-body contacts in-kernel (hand-cube capsule/box pairs on the
  Rubik plan model): a kernel step from contact-rich states matches the
  jnp pipeline step."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  import mujoco
  from mujoco_mpc_tpu.physics import model as model_lib
  task = registry.get_task("Rubik")
  # reduced Newton schedule in the MODEL so the kernel and the pipeline
  # stay bit-identical while the CPU XLA compile of the full nv=21 step
  # shrinks ~3x (this test was the suite's single worst compile)
  xml = task.plan_xml().replace(
      "<custom>",
      '<custom><numeric name="solver_iterations" data="2"/>'
      '<numeric name="solver_ls_iterations" data="1"/>')
  m = model_lib.put_model(mujoco.MjModel.from_xml_string(xml))
  assert step_lane.supports(m, ground_only=True, body_pairs=True)
  # the task's planning pair-type whitelist keeps the cubie-cubie
  # box-box pairs out (they are sim-only; including them makes this
  # test's XLA:CPU compile pathological). Box-box parity itself is
  # pinned in test_lane_elliptic.py.
  kernel = step_lane.build_rollout_kernel(
      m, 2, 2, interpret=True, body_pairs=True,
      body_pair_types=task.plan_body_pair_types)
  rng = np.random.default_rng(13)
  d0 = task.make_data()
  k_c = 4
  # home pose (fingers touching the cube) + small perturbations
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[:9, 1:] += 0.08 * rng.standard_normal((9, k_c - 1))
  qpos0[9:12, 1:] += 0.004 * rng.standard_normal((3, k_c - 1))
  qvel0 = 0.1 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.3, 0.3, (m.nu, k_c)), jnp.float32)
  out = jax.jit(kernel.step_array)(
      jnp.asarray(qpos0, jnp.float32), jnp.asarray(qvel0, jnp.float32),
      ctrl)
  qp_k, qv_k = np.asarray(out[0]), np.asarray(out[1])
  step = jax.jit(lambda d: F.step(m, d))
  for k in range(k_c):
    d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                   qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                   ctrl=ctrl[:, k])
    dn = step(d)
    np.testing.assert_allclose(qp_k[:, k], np.asarray(dn.qpos),
                               atol=2e-3, err_msg=f"qpos k={k}")
    np.testing.assert_allclose(qv_k[:, k], np.asarray(dn.qvel),
                               atol=5e-2, err_msg=f"qvel k={k}")


def test_lane_kernel_allegro_residual_matches_pipeline():
  """Allegro lane spec rows (goal pose on aux) match the pipeline
  residual."""
  from mujoco_mpc_tpu.ops import step_lane
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Allegro")
  m = task.plan_model
  assert step_lane.supports(m, ground_only=True, body_pairs=True)
  spec = task.lane_residual_spec()
  k_c = 3
  kernel = step_lane.build_rollout_kernel(
      m, 2, 2, interpret=True, contact_types=(),
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"])
  rng = np.random.default_rng(17)
  d0 = task.make_data()
  qpos0 = np.tile(np.asarray(jax.device_get(d0.qpos))[:, None], (1, k_c))
  qpos0[:16] += 0.1 * rng.standard_normal((16, k_c))
  qq = qpos0[19:23] + 0.2 * rng.standard_normal((4, k_c))
  qpos0[19:23] = qq / np.linalg.norm(qq, axis=0, keepdims=True)
  qvel0 = 0.2 * rng.standard_normal((m.nv, k_c))
  ctrl = jnp.asarray(rng.uniform(-0.3, 0.3, (m.nu, k_c)), jnp.float32)
  aux = jnp.asarray(np.tile(np.asarray(jax.device_get(
      spec["make_aux"](d0, task.residual_params)))[:, None], (1, k_c)),
      jnp.float32)
  res = jax.jit(kernel.residual_array)(
      jnp.asarray(qpos0, jnp.float32), jnp.asarray(qvel0, jnp.float32),
      ctrl, 0, aux)
  fwd = jax.jit(lambda d: F.forward(m, d))
  for k in range(k_c):
    d = d0.replace(qpos=jnp.asarray(qpos0[:, k], jnp.float32),
                   qvel=jnp.asarray(qvel0[:, k], jnp.float32),
                   ctrl=ctrl[:, k])
    ref = task.residual(m, fwd(d), task.residual_params)
    np.testing.assert_allclose(np.asarray(res[:, k]), np.asarray(ref),
                               atol=5e-4, err_msg=f"k={k}")


def test_lane_returns_fn_matches_discrete_reference():
  """make_lane_returns_fn — the shared scorer behind the lane sampling /
  CEM / sample-gradient fast paths — matches a jnp rollout applying the
  SAME zero-hold node schedule and the task's cost pipeline."""
  from mujoco_mpc_tpu import rollout as RL
  from mujoco_mpc_tpu.ops import sampling_lane
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Particle")
  m = task.model
  h_hor, p_nodes, k = 13, 4, 6
  config = sampling.make_config(task).replace(
      num_trajectory=k, num_spline_points=p_nodes, horizon=h_hor)
  returns_fn = jax.jit(
      sampling_lane.make_lane_returns_fn(task, config, interpret=True))

  rng = np.random.default_rng(11)
  d0 = task.make_data()
  lo = np.asarray(jax.device_get(m.actuator_ctrlrange[:, 0]))
  hi = np.asarray(jax.device_get(m.actuator_ctrlrange[:, 1]))
  candidates = jnp.asarray(
      rng.uniform(lo, hi, (k, p_nodes, m.nu)), jnp.float32)
  rets = returns_fn(candidates, d0, task.residual_params, task.cost_spec)

  # jnp reference applying the SAME discrete node schedule (avoids
  # f32 node-boundary roundoff, cf. test_lane_rollout_kernel)
  node_of = jnp.asarray(
      [min(int(t * p_nodes / (h_hor - 1)), p_nodes - 1)
       for t in range(h_hor)], jnp.int32)
  dt = float(jax.device_get(m.opt.timestep))

  def ret_one(vals):
    def action(state, time):
      idx = jnp.clip(jnp.round((time - d0.time) / dt).astype(jnp.int32),
                     0, h_hor - 1)
      return vals[node_of[idx]]
    rf = lambda mm, dd: task.residual(mm, dd, task.residual_params)
    return RL.rollout(m, rf, task.cost_spec.cost, action, d0,
                      h_hor).total_return

  ref = jax.vmap(ret_one)(candidates)
  np.testing.assert_allclose(np.asarray(rets), np.asarray(ref),
                             rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_lane_cem_particle():
  """CEM on the lane fast path plans the particle task: elite refit from
  lane-kernel returns tracks the goal (behavior-class check — the lane
  node schedule and the continuous XLA spline differ at node-boundary
  f32 roundoff, so exact cross-path return parity is not expected; the
  scorer itself is verified exactly above)."""
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.planners import cross_entropy as cem
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Particle")
  m = task.model
  config = cem.make_config(task).replace(
      num_trajectory=8, n_elite=3, horizon=21)
  planner = cem.CrossEntropyPlanner(task, config, lane=True,
                                    interpret=True)
  step = jax.jit(lambda d: F.step(m, d))
  d = task.make_data()
  key = jax.random.PRNGKey(0)
  for t in range(60):
    for _ in range(2):
      key, sub = jax.random.split(key)
      info = planner.optimize(sub, d)
    u = planner.action(d.time)
    d = step(d.replace(ctrl=u))
  r = task.residual(m, F.forward(m, d), task.residual_params)
  dist = float(jnp.linalg.norm(r[:2]))
  assert np.isfinite(float(info["best_return"]))
  assert int(info["failures"]) == 0
  assert dist < 0.15, f"particle {dist} from goal (lane CEM)"


@pytest.mark.slow
def test_lane_sample_gradient_particle():
  """Sample-Gradient on the lane fast path: both candidate batches
  (noisy + gradient) score on the lane kernel; the planner strictly
  improves the nominal return on the particle task."""
  from mujoco_mpc_tpu.planners import sample_gradient as sg
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Particle")
  config = sg.make_config(task).replace(
      num_trajectory=10, num_gradient=3, horizon=21)
  planner = sg.SampleGradientPlanner(task, config, lane=True,
                                     interpret=True)
  d0 = task.make_data()
  key = jax.random.PRNGKey(4)
  rets = []
  for _ in range(6):
    key, sub = jax.random.split(key)
    info = planner.optimize(sub, d0)
    rets.append(float(info["best_return"]))
  assert all(np.isfinite(rets))
  assert rets[-1] < float(info["nominal_return"]) or \
      rets[-1] < rets[0], f"no improvement: {rets}"
  assert min(rets) < rets[0], f"no strict improvement: {rets}"


def test_lane_ilqs_particle():
  """iLQS with its sampling phase on the lane kernel: alternation still
  improves the particle objective and stays finite."""
  from mujoco_mpc_tpu.planners import ilqs, sampling
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Particle")
  cfg = sampling.make_config(task).replace(num_trajectory=6, horizon=13)
  planner = ilqs.ILQSPlanner(task, lane=True, interpret=True,
                             sampler_config=cfg)
  d0 = task.make_data()
  key = jax.random.PRNGKey(2)
  rets = []
  for _ in range(3):
    key, sub = jax.random.split(key)
    info = planner.optimize(sub, d0)
    rets.append(info["best_return"])
  assert all(np.isfinite(rets)), rets
  assert min(rets) < rets[0] or rets[-1] <= rets[0]
  assert planner.active in ("sampling", "ilqg")


def test_lane_robust_particle():
  """Robust sampling with clean candidate scoring on the lane kernel
  (OU re-rolls stay on the XLA noisy_rollout path): improves and picks
  a winner from the top-N."""
  from mujoco_mpc_tpu.planners import robust, sampling
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Particle")
  s_cfg = sampling.make_config(task).replace(num_trajectory=8, horizon=13)
  planner = robust.RobustPlanner(task, s_cfg, lane=True, interpret=True)
  assert planner.lane
  d0 = task.make_data()
  key = jax.random.PRNGKey(6)
  for _ in range(3):
    key, sub = jax.random.split(key)
    info = planner.optimize(sub, d0)
    # ranked contract: best_return is the clean return of the robust
    # winner, drawn from the published per-candidate returns
    rets = np.asarray(info["returns"])
    assert np.all(np.isfinite(rets))
    assert np.isfinite(float(info["robust_return"]))
    np.testing.assert_allclose(float(info["best_return"]),
                               rets[int(info["winner"])], rtol=1e-6)
    # robust winner comes from the top-N clean candidates
    n_cand = planner.r_config.num_candidates
    top = np.sort(rets)[:n_cand]
    assert float(info["best_return"]) <= top[-1] + 1e-6


@pytest.mark.slow
def test_ilqg_lane_rollouts_match_pipeline_quat():
  """Quat-model iLQG lane line searches: the in-kernel tangent log map
  (lanemath.quat_sub_tangent) must reproduce the vmapped pipeline's
  state_diff feedback on a free-joint task (Quadrotor, tiny shapes)."""
  from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
  from mujoco_mpc_tpu.physics import forward as F
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Quadrotor")
  cfg = ilqg_lib.make_config(task).replace(
      horizon=4, num_alphas=3, num_fb_scales=2)
  d0 = F.forward(task.model, task.make_data())
  p_ref = ilqg_lib.ILQGPlanner(task, cfg, lane=False)
  p_lane = ilqg_lib.ILQGPlanner(task, cfg, lane=True)
  assert p_lane._lane_spec(task, True) is not None, \
      "Quadrotor must be lane-eligible for this test"
  key = jax.random.PRNGKey(0)
  for it in range(2):
    ia = p_ref.optimize(key, d0)
    ib = p_lane.optimize(key, d0)
    np.testing.assert_allclose(float(ia["nominal_return"]),
                               float(ib["nominal_return"]),
                               rtol=1e-3, err_msg=f"nominal it={it}")
    np.testing.assert_allclose(float(ia["best_return"]),
                               float(ib["best_return"]),
                               rtol=1e-3, err_msg=f"best it={it}")
  np.testing.assert_allclose(np.asarray(p_lane.policy.actions),
                             np.asarray(p_ref.policy.actions),
                             atol=1e-3)
