"""Batched trajectory rollouts: vmap(lax.scan(step)).

TPU-native replacement for the reference's thread-pool rollouts
(reference: mjpc/trajectory.cc:92-331 and sampling/planner.cc:342-380):
instead of K worker threads each stepping its own mjData, we scan the step
function over the horizon and vmap over thousands of candidates.

Semantics matched from Trajectory::Rollout:
  * action sampled from the policy at the pre-step time, held for the step;
  * residual evaluated on the time-consistent PRE-integration state of
    each step (mj_step computes sensors before integrating, so the
    reference's recorded sensordata is at the pre-step state; we run
    forward, record the residual, then integrate) — residuals[t] aligns
    with states[t];
  * a final forward pass produces the last residual;
  * divergence (non-finite state) poisons the rollout: total_return = 1e6
    (kMaxReturnValue, trajectory.cc:29);
  * total_return = sum(costs) / horizon (UpdateReturn, trajectory.cc:312).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics.model import Data, Model

MAX_RETURN_VALUE = 1e6


@struct.dataclass
class Trajectory:
  """Rollout record (reference: mjpc/trajectory.h)."""
  states: jax.Array        # (T, nq+nv+na)
  actions: jax.Array       # (T, nu)
  times: jax.Array         # (T,)
  residuals: jax.Array     # (T, num_residual)
  costs: jax.Array         # (T,)
  total_return: jax.Array  # scalar
  failure: jax.Array       # bool


def pack_state(d: Data) -> jax.Array:
  """[qpos, qvel, act] packing (reference states/state.h:83-86)."""
  return jnp.concatenate([d.qpos, d.qvel, d.act])


# the TRUE dynamic state of a rollout: everything else in Data is derived
# and recomputed every step. Scanning with only these fields in the carry
# keeps the XLA loop state ~50x smaller (the full Data carry dominated HBM
# traffic: ~85 GB/planner-iteration measured before this change).
_CARRY_FIELDS = ("qpos", "qvel", "act", "ctrl", "time", "mocap_pos",
                 "mocap_quat", "userdata", "qfrc_applied", "xfrc_applied")


def slim_carry(d: Data) -> dict:
  return {f: getattr(d, f) for f in _CARRY_FIELDS}


def from_carry(carry: dict) -> Data:
  return Data(**carry)


def set_state(m: Model, d: Data, state: jax.Array) -> Data:
  nq, nv, na = m.nq, m.nv, m.na
  return d.replace(
      qpos=state[:nq], qvel=state[nq:nq + nv], act=state[nq + nv:nq + nv + na])


def _diverged(d: Data) -> jax.Array:
  bad = ~jnp.all(jnp.isfinite(d.qpos)) | ~jnp.all(jnp.isfinite(d.qvel))
  big = (jnp.max(jnp.abs(d.qvel), initial=0.0) > 1e7) | (
      jnp.max(jnp.abs(d.qpos), initial=0.0) > 1e7)
  return bad | big


def rollout(
    m: Model,
    residual_fn: Callable[[Model, Data], jax.Array],
    cost_fn: Callable[[jax.Array], jax.Array],
    policy_fn: Callable[[jax.Array, jax.Array], jax.Array],
    d0: Data,
    horizon: int,
) -> Trajectory:
  """Roll out a policy for `horizon` steps from d0.

  policy_fn(state, time) -> action (already clamped by the policy).
  """
  ctrlrange = m.actuator_ctrlrange

  def body(carry, _):
    d = from_carry(carry)
    state = pack_state(d)
    u = policy_fn(state, d.time)
    u = jnp.clip(u, ctrlrange[:, 0], ctrlrange[:, 1])
    d = d.replace(ctrl=u)
    d = F.forward(m, d)
    r = residual_fn(m, d)  # pre-integration: residuals[t] ~ states[t]
    t = d.time
    d = F.integrate(m, d)
    fail = _diverged(d)
    return slim_carry(d), (state, u, t, r, fail)

  carry_final, (states, actions, times, residuals, fails) = jax.lax.scan(
      body, slim_carry(d0), None, length=horizon - 1)

  # final forward + residual (reference trajectory.cc:181-307)
  d_final = F.forward(m, from_carry(carry_final))
  r_last = residual_fn(m, d_final)
  final_state = pack_state(d_final)

  states = jnp.concatenate([states, final_state[None]], axis=0)
  # final action duplicates the previous one (trajectory.cc:189-195)
  actions = jnp.concatenate([actions, actions[-1:]], axis=0)
  times = jnp.concatenate([times, (d_final.time + 0)[None]], axis=0)
  residuals = jnp.concatenate([residuals, r_last[None]], axis=0)

  costs = cost_fn(residuals)  # (T,)
  failure = jnp.any(fails) | _diverged(d_final) | ~jnp.all(
      jnp.isfinite(costs))
  total = jnp.where(failure, MAX_RETURN_VALUE,
                    jnp.sum(costs) / jnp.maximum(horizon, 1))
  return Trajectory(
      states=states, actions=actions, times=times, residuals=residuals,
      costs=jnp.where(failure, MAX_RETURN_VALUE, costs),
      total_return=total, failure=failure)


def noisy_rollout(
    m: Model,
    residual_fn,
    cost_fn,
    policy_fn,
    d0: Data,
    horizon: int,
    key: jax.Array,
    xfrc_std: jax.Array,
    xfrc_rate: jax.Array,
) -> Trajectory:
  """Rollout under Ornstein-Uhlenbeck body-wrench perturbations.

  Reference: Trajectory::NoisyRollout (trajectory.cc:147-155): per step
  xfrc <- rate * xfrc + N(0, std * sqrt(1 - rate^2)), with
  rate = exp(-timestep / xfrc_rate). Used by the Robust planner.
  """
  ctrlrange = m.actuator_ctrlrange
  rate = jnp.exp(-m.opt.timestep / jnp.maximum(xfrc_rate, 1e-8))
  scale = xfrc_std * jnp.sqrt(jnp.maximum(1.0 - rate * rate, 0.0))

  def body(carry, step_key):
    d = from_carry(carry)
    state = pack_state(d)
    u = policy_fn(state, d.time)
    u = jnp.clip(u, ctrlrange[:, 0], ctrlrange[:, 1])
    noise = jax.random.normal(step_key, d.xfrc_applied.shape,
                              d.xfrc_applied.dtype)
    xfrc = rate * d.xfrc_applied + scale * noise
    d = d.replace(ctrl=u, xfrc_applied=xfrc)
    d = F.forward(m, d)
    r = residual_fn(m, d)  # pre-integration: residuals[t] ~ states[t]
    t = d.time
    d = F.integrate(m, d)
    fail = _diverged(d)
    return slim_carry(d), (state, u, t, r, fail)

  keys = jax.random.split(key, horizon - 1)
  carry_final, (states, actions, times, residuals, fails) = jax.lax.scan(
      body, slim_carry(d0), keys)
  d_final = F.forward(m, from_carry(carry_final))
  r_last = residual_fn(m, d_final)

  states = jnp.concatenate([states, pack_state(d_final)[None]], axis=0)
  actions = jnp.concatenate([actions, actions[-1:]], axis=0)
  times = jnp.concatenate([times, (d_final.time + 0)[None]], axis=0)
  residuals = jnp.concatenate([residuals, r_last[None]], axis=0)

  costs = cost_fn(residuals)
  failure = jnp.any(fails) | _diverged(d_final) | ~jnp.all(
      jnp.isfinite(costs))
  total = jnp.where(failure, MAX_RETURN_VALUE,
                    jnp.sum(costs) / jnp.maximum(horizon, 1))
  return Trajectory(
      states=states, actions=actions, times=times, residuals=residuals,
      costs=jnp.where(failure, MAX_RETURN_VALUE, costs),
      total_return=total, failure=failure)
