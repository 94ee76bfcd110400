"""Multi-host (DCN) launch glue for candidate-axis scale-out.

The reference has no cross-host story (its pool is one process,
mjpc/threadpool.cc); SURVEY.md §2.10 maps its candidate-rollout
parallelism to chips within a host (ICI) and hosts within a slice/pod
(DCN). This module is the launch-side glue:

  # identical program on every host, e.g. via
  #   python -m mujoco_mpc_tpu.parallel.multihost_demo (or your runner)
  from mujoco_mpc_tpu.parallel import multihost, mesh as mesh_lib
  multihost.initialize()                      # no-op on single host
  mesh = mesh_lib.make_hierarchical_mesh()    # (dcn, ici) global mesh
  planner = LaneSamplingPlanner(task, mesh=mesh)

Design: candidates shard host-major — across hosts first (slow DCN),
then across each host's chips (fast ICI). Rollout work never crosses a
chip boundary; the only DCN traffic per planner iteration is the final
(return, index) argmin reduction (a few bytes per host) and the O(P*nu)
winning-plan broadcast. Scaling efficiency is therefore bounded by the
per-iteration DCN latency over the iteration time, not by bandwidth —
the weak-scaling instrument (`bench.py --scaling`) measures exactly
this ratio.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
  """Bring up the JAX distributed runtime (no-op on a single host).

  Arguments default from the standard env vars the TPU runtimes set
  (JAX auto-detects on Cloud TPU); pass them explicitly on bare-metal
  clusters. Safe to call twice (second call is ignored), and safe to
  call on a single-process run (returns immediately).
  """
  if num_processes is None:
    num_processes = int(os.environ.get("MJPC_TPU_NUM_PROCESSES", "0")) or None
  if coordinator_address is None:
    coordinator_address = os.environ.get("MJPC_TPU_COORDINATOR") or None
  if num_processes in (None, 0, 1) and coordinator_address is None:
    if jax.process_count() <= 1:
      return  # single host: nothing to initialize
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
  except RuntimeError as e:
    if "already initialized" not in str(e).lower():
      raise


def assert_same_plan(plan: jax.Array) -> None:
  """Debug check: the winning plan must be bit-identical on every host
  (they all ran the same argmin over the same all-gathered returns).
  Cheap enough to leave on in staging: one psum of a few floats."""
  if jax.process_count() <= 1:
    return
  from jax.experimental import multihost_utils
  multihost_utils.assert_equal(plan, "winning plan diverged across hosts")
