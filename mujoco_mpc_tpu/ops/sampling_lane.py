"""Sampling-family planning on the lane-parallel rollout kernel.

Fast path for the model class ops/step_lane.py supports: one planner
iteration = candidate generation + ONE Pallas kernel call rolling out
all candidates + fused scoring — measured ~200x faster than the vmapped
XLA pipeline for the same workload (docs/DESIGN.md).

`make_lane_returns_fn` is the shared candidate scorer
((K, P, nu) node sets -> (K,) returns); predictive sampling
(`make_lane_optimize_fn` / `LaneSamplingPlanner`), cross-entropy,
sample-gradient, iLQS's sampling phase, and robust sampling's clean
scoring all ride it. Tasks opt in by implementing
`lane_residual_spec()` (in-kernel residual) or
`residual_from_rollout(states, ctrls, times, params)` mapping the
kernel's raw (H, nq+nv, K) output to (H, nr, K) residuals.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import spline as spline_lib
from mujoco_mpc_tpu.ops import step_lane
from mujoco_mpc_tpu.planners import sampling


def make_lane_returns_fn(task, config, interpret: bool = False,
                         solver_iters=None, solver_ls_iters=None,
                         contact_types=None, unroll: bool = True,
                         mesh=None, contact_geoms="task"):
  """Jittable candidate scorer on the lane kernel.

  Returns `returns_fn(candidates, d0, residual_params=None,
  cost_spec=None)` mapping a (K, P, nu) batch of spline node sets to
  their (K,) trajectory returns (horizon-mean weighted cost, divergent
  rollouts poisoned to 1e6). This is the shared hot path of every
  sampling-family planner — predictive sampling, cross-entropy, and
  sample-gradient differ only in how they GENERATE candidates and
  UPDATE the policy from the returns, which stays in XLA.

  `config` needs `num_spline_points`, `horizon`, `interp` (must be
  zero-order-hold) — SamplingConfig, CEMConfig, and
  SampleGradientConfig all qualify. K is read from the candidate batch
  at trace time, so one scorer serves differently-sized batches (e.g.
  sample-gradient's noisy vs gradient candidate sets).

  Residuals come from one of two task hooks, preferred in order:
  1. `lane_residual_spec()` — the residual is evaluated IN-KERNEL per
     step (full derived quantities: FK, com, body velocities,
     actuator forces) and rides the rollout's VMEM residency; or
  2. `residual_from_rollout(states, ctrls, times, params)` — the residual is
     reconstructed on the XLA side from the raw (H, nq+nv, K) states
     (only viable for tasks whose cost needs no FK).

  mesh, if given, shards the candidate (lane) axis across the mesh's
  `rollout` axis with shard_map: each chip runs the Pallas kernel on
  its K/n candidate slice, and the scoring/argmin after it is left to
  GSPMD (local argmin + an ICI all-gather of (value, index)). This is
  the multi-chip scaling story of SURVEY.md §2.10 — the reference fans
  rollouts across CPU threads; here across chips.
  """
  m = getattr(task, "plan_model", task.model)
  assert step_lane.supports(
      m, ground_only=True,
      body_pairs=bool(getattr(task, "plan_body_pairs", False))), \
      "model outside the lane kernel class"
  assert config.interp == spline_lib.Interpolation.ZERO
  if hasattr(task, "lane_residual_spec"):
    try:
      # time-varying specs (mocap tracking) need the horizon to pack
      # per-step aux rows
      spec = task.lane_residual_spec(horizon=config.horizon)
    except TypeError:
      spec = task.lane_residual_spec()
  else:
    spec = None
  assert spec is not None or hasattr(task, "residual_from_rollout"), \
      "task must implement lane_residual_spec or residual_from_rollout"
  horizon = config.horizon
  p = config.num_spline_points
  nu, nq, nv = m.nu, m.nq, m.nv
  if contact_geoms == "task":
    # planning-contact whitelist (e.g. feet + trunk) declared by the task
    contact_geoms = getattr(task, "plan_contact_geoms", None)
  # in-kernel scoring: with a risk-neutral cost the kernel reduces the
  # residual rows to UNWEIGHTED per-term norm sums over the horizon
  # (weights applied outside as traced values), so the kernel output is
  # (nterm, K) — small enough for full-VPU-tile folded candidate blocks.
  # Risk-sensitive costs need the per-step transform and keep the
  # residual-row output.
  body_pairs = bool(getattr(task, "plan_body_pairs", False))
  risk0 = abs(float(jax.device_get(task.cost_spec.risk))) < 1e-6
  cost_terms = None
  if spec is not None and risk0:
    cost_terms = tuple(zip(task.cost_spec.norm_types,
                           task.cost_spec.dims))
  # optional per-task PLANNING pair-type whitelist (reduced plan model;
  # e.g. Rubik drops cubie-cubie box-box pairs from planning)
  body_pair_types = getattr(task, "plan_body_pair_types", None)
  if spec is not None:
    # record_states=False: the planner only needs residual rows + the
    # final state's finiteness, and the smaller output block lets the
    # kernel run full-VPU-tile candidate blocks (KB=1024)
    kernel = step_lane.build_rollout_kernel(
        m, horizon, p, interpret=interpret, unroll=unroll,
        contact_types=contact_types, solver_iters=solver_iters,
        solver_ls_iters=solver_ls_iters, residual_fn=spec["fn"],
        residual_dim=spec["dim"], naux=spec["naux"],
        record_states=False, contact_geoms=contact_geoms,
        cost_terms=cost_terms, body_pairs=body_pairs,
        body_pair_types=body_pair_types)
  else:
    kernel = step_lane.build_rollout_kernel(
        m, horizon, p, interpret=interpret, unroll=unroll,
        contact_types=contact_types, solver_iters=solver_iters,
        solver_ls_iters=solver_ls_iters, contact_geoms=contact_geoms,
        body_pairs=body_pairs, body_pair_types=body_pair_types)
  h = float(jax.device_get(m.opt.timestep))
  node_of = np.array([min(int(t * p / max(horizon - 1, 1)), p - 1)
                      for t in range(horizon)])

  if mesh is not None:
    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]
    lane = P(None, axis)
    if spec is not None:
      kernel = jax.shard_map(
          kernel, mesh=mesh, in_specs=(lane, lane, lane, lane),
          out_specs=(P(None, None, axis), P(None, axis)),
          check_vma=False)
    else:
      kernel = jax.shard_map(
          kernel, mesh=mesh, in_specs=(lane, lane, lane),
          out_specs=P(None, None, axis), check_vma=False)

  def returns_fn(candidates, d0, residual_params=None, cost_spec=None):
    """(K, P, nu) candidate node sets → (K,) returns (1e6 on divergence).

    residual_params / cost_spec passed at call time so
    SetTaskParameters / SetCostWeights-style updates reach the jitted
    program (traced args, not baked closure constants); None falls back
    to the task's build-time values."""
    if residual_params is None:
      residual_params = task.residual_params
    if cost_spec is None:
      cost_spec = task.cost_spec
    k = candidates.shape[0]
    if mesh is not None:
      n_shards = mesh.shape[mesh.axis_names[0]]
      assert k % n_shards == 0, (
          f"candidate count {k} must divide the {n_shards}-way "
          f"'{mesh.axis_names[0]}' mesh axis")
    dtype = candidates.dtype

    # kernel layout: candidates on the last axis
    values_lane = candidates.reshape(k, p * nu).T  # (P*nu, K)
    qpos0 = jnp.tile(d0.qpos[:, None], (1, k))
    qvel0 = jnp.tile(d0.qvel[:, None], (1, k))
    if spec is not None and cost_terms is not None:
      aux_rows = jnp.concatenate([
          spec["make_aux"](d0, residual_params).astype(dtype),
          cost_spec.norm_params[:, :2].reshape(-1).astype(dtype)])
      aux = jnp.tile(aux_rows[:, None], (1, k))
      term_sums, final_state = kernel(qpos0, qvel0, values_lane, aux)
      # mean over horizon of the weighted per-step cost == weighted
      # per-term sums / horizon (risk-neutral; gated at build time)
      returns = jnp.sum(
          cost_spec.weights[:, None] * term_sums, axis=0) / horizon
      states = final_state[None]
    elif spec is not None:
      aux = jnp.tile(
          spec["make_aux"](d0, residual_params)[:, None].astype(dtype),
          (1, k))
      residuals, final_state = kernel(qpos0, qvel0, values_lane, aux)
      states = final_state[None]                    # (1, nq+nv, K)
      costs = cost_spec.cost(jnp.moveaxis(residuals, 1, -1))  # (H, K)
      returns = jnp.mean(costs, axis=0)
    else:
      states = kernel(qpos0, qvel0, values_lane)    # (H, nq+nv, K)
      times = d0.time + h * jnp.arange(horizon, dtype=dtype)
      ctrls = candidates[:, node_of, :]             # (K, H, nu)
      ctrls = jnp.moveaxis(ctrls, 0, -1)            # (H, nu, K)
      residuals = task.residual_from_rollout(states, ctrls, times,
                                             residual_params)
      costs = cost_spec.cost(jnp.moveaxis(residuals, 1, -1))  # (H, K)
      returns = jnp.mean(costs, axis=0)
    return jnp.where(
        jnp.all(jnp.isfinite(states[-1]), axis=0), returns, 1e6)

  return returns_fn


def make_lane_optimize_fn(task, config: sampling.SamplingConfig,
                          interpret: bool = False, **kernel_kw):
  """Jittable predictive-sampling optimizer for lane-eligible tasks:
  noise generation + ONE lane-kernel scoring call + argmin. See
  make_lane_returns_fn for the residual hooks and mesh sharding."""
  m = getattr(task, "plan_model", task.model)
  horizon = config.horizon
  k_total = config.num_trajectory
  mesh = kernel_kw.get("mesh")
  if mesh is not None:
    # fail at build time with a clear message, not a shard_map shape
    # error at run time
    n_shards = mesh.shape[mesh.axis_names[0]]
    assert k_total % n_shards == 0, (
        f"num_trajectory={k_total} must divide the {n_shards}-way "
        f"'{mesh.axis_names[0]}' mesh axis")
  returns_fn = make_lane_returns_fn(task, config, interpret=interpret,
                                    **kernel_kw)

  def optimize(key, d0, policy: spline_lib.SplinePolicy,
               residual_params=None, cost_spec=None):
    horizon_time = (horizon - 1) * m.opt.timestep
    policy = spline_lib.resample(policy, d0.time, horizon_time)

    noisy = sampling.add_noise(key, policy.values, m, config.exploration,
                               k_total - 1)
    candidates = jnp.concatenate([policy.values[None], noisy], axis=0)
    returns = returns_fn(candidates, d0, residual_params, cost_spec)

    winner = jnp.argmin(returns)
    new_policy = policy.replace(values=candidates[winner])
    info = {
        "returns": returns,
        "winner": winner,
        "best_return": returns[winner],
        "nominal_return": returns[0],
    }
    return new_policy, info

  return optimize


class LaneSamplingPlanner:
  """Drop-in SamplingPlanner using the Pallas rollout kernel."""

  def __init__(self, task, config: Optional[sampling.SamplingConfig] = None,
               dtype=jnp.float32, interpret: bool = False, **kernel_kw):
    self.task = task
    self.m = getattr(task, "plan_model", task.model)
    self.config = config or sampling.make_config(task, dtype)
    self._optimize = jax.jit(
        make_lane_optimize_fn(task, self.config, interpret=interpret,
                              **kernel_kw))
    self.policy = sampling.initial_policy(self.m, self.config, dtype)

  def optimize(self, key, d0):
    self.policy, info = self._optimize(key, d0, self.policy,
                                       self.task.residual_params,
                                       self.task.cost_spec)
    self.last_info = info
    return info

  def action(self, time) -> jax.Array:
    u = spline_lib.sample(self.policy, jnp.asarray(time))
    return jnp.clip(u, self.m.actuator_ctrlrange[:, 0],
                    self.m.actuator_ctrlrange[:, 1])
