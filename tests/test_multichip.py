"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

The candidate-rollout axis is the framework's data-parallel axis
(SURVEY.md §2.10; reference fans K <= 128 rollouts across threads,
sampling/planner.cc:342-380). These tests pin down the sharded paths in
pytest rather than relying on the driver's dryrun alone: sampling
pipeline, CEM, the lane kernel under shard_map, the non-divisible-K
error path, and sharded-vs-unsharded winner parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_mpc_tpu.parallel import mesh as mesh_lib
from mujoco_mpc_tpu.planners import cross_entropy, sampling
from mujoco_mpc_tpu import spline as spline_lib


def _mesh(n=8):
  assert len(jax.devices()) >= n, "conftest should provide 8 CPU devices"
  return mesh_lib.make_mesh(n)


def _cartpole():
  from mujoco_mpc_tpu.tasks.cartpole import Cartpole
  return Cartpole()


def test_mesh_setup():
  m = _mesh()
  assert m.shape[mesh_lib.ROLLOUT_AXIS] == 8


def test_sampling_sharded_matches_unsharded():
  """Same key: the sharded program must pick the same winner with the
  same returns as the single-device program (pure partitioning, no
  semantic change)."""
  task = _cartpole()
  config = sampling.SamplingConfig(
      num_trajectory=16, num_spline_points=4,
      exploration=jnp.asarray([0.5, 0.0]), horizon=8)
  residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
  cost_fn = task.cost_spec.cost
  d0 = task.make_data()
  policy = sampling.initial_policy(task.model, config)
  key = jax.random.PRNGKey(3)

  opt_ref = jax.jit(sampling.make_optimize_fn(
      task.model, residual_fn, cost_fn, config))
  opt_sh = jax.jit(sampling.make_optimize_fn(
      task.model, residual_fn, cost_fn, config, mesh=_mesh()))

  pol_ref, info_ref = opt_ref(key, d0, policy)
  pol_sh, info_sh = opt_sh(key, d0, policy)
  assert int(info_ref["winner"]) == int(info_sh["winner"])
  np.testing.assert_allclose(np.asarray(info_sh["returns"]),
                             np.asarray(info_ref["returns"]),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(np.asarray(pol_sh.values),
                             np.asarray(pol_ref.values),
                             rtol=1e-6, atol=1e-6)


def test_sampling_sharded_improves():
  """The sharded planner still plans: repeated iterations reduce the
  nominal return on the particle reach task."""
  from mujoco_mpc_tpu.tasks.particle import Particle
  task = Particle()
  config = sampling.SamplingConfig(
      num_trajectory=16, num_spline_points=4,
      exploration=jnp.asarray([0.5, 0.0]), horizon=40)
  residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
  opt = jax.jit(sampling.make_optimize_fn(
      task.model, residual_fn, task.cost_spec.cost, config, mesh=_mesh()))
  d0 = task.make_data()
  policy = sampling.initial_policy(task.model, config)
  key = jax.random.PRNGKey(0)
  first = None
  for i in range(8):
    key, sub = jax.random.split(key)
    policy, info = opt(sub, d0, policy)
    if first is None:
      first = float(info["nominal_return"])
  assert float(info["best_return"]) < first


def test_cem_sharded_matches_unsharded():
  task = _cartpole()
  config = cross_entropy.CEMConfig(
      num_trajectory=16, num_spline_points=4, n_elite=4, horizon=8,
      std_initial=jnp.asarray(0.3), std_min=jnp.asarray(0.1))
  residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
  d0 = task.make_data()
  state = cross_entropy.initial_state(task.model, config)
  key = jax.random.PRNGKey(5)

  opt_ref = jax.jit(cross_entropy.make_optimize_fn(
      task.model, residual_fn, task.cost_spec.cost, config))
  opt_sh = jax.jit(cross_entropy.make_optimize_fn(
      task.model, residual_fn, task.cost_spec.cost, config, mesh=_mesh()))
  st_ref, info_ref = opt_ref(key, d0, state)
  st_sh, info_sh = opt_sh(key, d0, state)
  assert int(info_ref["winner"]) == int(info_sh["winner"])
  np.testing.assert_allclose(np.asarray(st_sh.policy.values),
                             np.asarray(st_ref.policy.values),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(np.asarray(st_sh.variance),
                             np.asarray(st_ref.variance),
                             rtol=1e-6, atol=1e-6)


def test_lane_kernel_sharded_matches_unsharded():
  """Pallas lane kernel under shard_map (interpret mode on CPU): the
  sharded winner and returns must match the unsharded kernel."""
  from mujoco_mpc_tpu.ops import sampling_lane
  from mujoco_mpc_tpu.tasks.particle import Particle
  task = Particle()
  config = sampling.make_config(task).replace(
      num_trajectory=16, horizon=6)
  d0 = task.make_data()
  policy = sampling.initial_policy(task.model, config)
  key = jax.random.PRNGKey(7)

  opt_ref = jax.jit(sampling_lane.make_lane_optimize_fn(
      task, config, interpret=True))
  opt_sh = jax.jit(sampling_lane.make_lane_optimize_fn(
      task, config, interpret=True, mesh=_mesh()))
  pol_ref, info_ref = opt_ref(key, d0, policy)
  pol_sh, info_sh = opt_sh(key, d0, policy)
  assert int(info_ref["winner"]) == int(info_sh["winner"])
  np.testing.assert_allclose(np.asarray(info_sh["returns"]),
                             np.asarray(info_ref["returns"]),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(pol_sh.values),
                             np.asarray(pol_ref.values),
                             rtol=1e-6, atol=1e-6)


def test_lane_kernel_nondivisible_k_rejected():
  """K must divide the mesh axis; the error must be a clear assert at
  build time, not a shard_map shape failure at run time."""
  from mujoco_mpc_tpu.ops import sampling_lane
  from mujoco_mpc_tpu.tasks.particle import Particle
  task = Particle()
  config = sampling.make_config(task).replace(
      num_trajectory=10, horizon=6)  # 10 % 8 != 0
  with pytest.raises(AssertionError, match="divide"):
    sampling_lane.make_lane_optimize_fn(
        task, config, interpret=True, mesh=_mesh())


def test_sharded_argmin_parity_random():
  """Cross-device argmin of a sharded vector equals the local argmin."""
  vals = jax.random.uniform(jax.random.PRNGKey(0), (64,))
  mesh = _mesh()
  sharded = jax.device_put(vals, NamedSharding(mesh, P("rollout")))
  got = jax.jit(mesh_lib.sharded_argmin)(sharded)
  assert int(got) == int(np.argmin(np.asarray(vals)))


def test_hierarchical_dcn_ici_mesh_matches_unsharded():
  """Two-level (dcn, ici) mesh (multi-host topology emulated as 2 hosts
  x 4 devices on the CPU test mesh): the sharded planner picks the same
  winner and returns as the unsharded one — per-candidate work never
  crosses shards; only the (return, index) argmin reduction does."""
  from mujoco_mpc_tpu.parallel import mesh as mesh_lib
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Cartpole")
  config = sampling.make_config(task).replace(num_trajectory=16,
                                              horizon=10)
  residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
  d0 = task.make_data()
  key = jax.random.PRNGKey(3)
  policy = sampling.initial_policy(task.model, config)

  opt_plain = jax.jit(sampling.make_optimize_fn(
      task.model, residual_fn, task.cost_spec.cost, config))
  pol_a, info_a = opt_plain(key, d0, policy)

  mesh = mesh_lib.make_hierarchical_mesh(n_hosts=2, per_host=4)
  assert mesh.axis_names == ("dcn", "ici")
  opt_sharded = jax.jit(sampling.make_optimize_fn(
      task.model, residual_fn, task.cost_spec.cost, config, mesh=mesh))
  pol_b, info_b = opt_sharded(key, d0, policy)

  assert int(info_a["winner"]) == int(info_b["winner"])
  np.testing.assert_allclose(np.asarray(info_a["returns"]),
                             np.asarray(info_b["returns"]), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(pol_a.values),
                             np.asarray(pol_b.values), atol=1e-6)
