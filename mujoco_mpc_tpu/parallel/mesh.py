"""Device-mesh sharding for candidate rollouts.

The candidate-rollout axis is the framework's data-parallel axis
(SURVEY.md §2.10): the reference fans K <= 128 rollouts across CPU threads
(sampling/planner.cc:342-380); here we fan thousands across TPU chips.
Pattern: a 1-D `rollout` mesh, candidates sharded along it, per-chip
vmap(rollout), then a cross-chip argmin reduction of (return, index) —
the all-gather rides the ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROLLOUT_AXIS = "rollout"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
  devs = jax.devices()
  if n_devices is not None:
    devs = devs[:n_devices]
  return Mesh(np.array(devs), (ROLLOUT_AXIS,))


DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def make_hierarchical_mesh(n_hosts: Optional[int] = None,
                           per_host: Optional[int] = None) -> Mesh:
  """Two-level ('dcn', 'ici') mesh for multi-host scale-out.

  Host-major device order: the candidate axis splits first across hosts
  (slow DCN links) and then across each host's chips (fast ICI), so the
  only traffic that crosses DCN is the final tiny (return, index) argmin
  reduction — per-candidate rollout work never leaves a chip, and the
  policy/state broadcast is a few KB (SURVEY §2.10: the reference has no
  cross-host story at all; its pool is one process).

  On a real multi-host platform the defaults come from
  jax.process_count(); on a single host (or the CPU-device test mesh)
  pass n_hosts/per_host explicitly to emulate the topology.
  """
  devs = jax.devices()
  if n_hosts is None:
    n_hosts = max(jax.process_count(), 1)
  if per_host is None:
    per_host = len(devs) // n_hosts
  devs = devs[:n_hosts * per_host]
  grid = np.array(devs).reshape(n_hosts, per_host)
  return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def candidate_spec(mesh: Mesh) -> P:
  """PartitionSpec sharding a leading candidate axis over ALL mesh axes
  (works for the 1-D rollout mesh and the 2-D dcn x ici mesh)."""
  return P(tuple(mesh.axis_names))


def shard_candidates(mesh: Mesh, candidates: jax.Array) -> jax.Array:
  """Place candidate axis (leading) across the rollout mesh axis."""
  sharding = NamedSharding(mesh, P(ROLLOUT_AXIS))
  return jax.device_put(candidates, sharding)


def sharded_argmin(returns: jax.Array) -> jax.Array:
  """Global argmin over a sharded candidate axis.

  Under jit with sharded inputs, XLA lowers this to a local argmin +
  all-gather of (value, index) pairs over ICI; nothing manual needed.
  """
  return jnp.argmin(returns)


def sharded_rollout_fn(mesh: Mesh, rollout_one: Callable,
                       out_specs=P(ROLLOUT_AXIS)):
  """Wrap vmap(rollout) in shard_map over the rollout mesh axis.

  `rollout_one(candidate_params) -> pytree` is vmapped within each device
  shard; the candidate batch must divide the mesh size.
  """
  vmapped = jax.vmap(rollout_one)
  return jax.shard_map(
      vmapped, mesh=mesh, in_specs=P(ROLLOUT_AXIS), out_specs=out_specs,
      check_vma=False)
