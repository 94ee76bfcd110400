"""AgentRunner: background planning thread + lock-free action sampling.

Reference capability (mjpc/interface.cc:27-115, the Unity/C embedding
API): `AgentRunner` spawns a plan thread that continuously re-optimizes
the policy from the latest state; `Step(data)` = SetState +
ActionFromPolicy from the control thread, never blocking on planning.

TPU mapping: the plan thread drives the jitted (device) planner and
publishes fresh spline parameters into the native lock-free
double-buffered policy host (runtime/policy_runtime.cc); `action(time)`
samples from the native host with no Python/JAX/locks on the read path
— the pattern a 1 kHz servo loop embeds.
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import numpy as np

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.runtime import runtime as native


class AgentRunner:
  """Continuously planning agent with a lock-free action read path."""

  def __init__(self, task, planner=None, seed: int = 0):
    from mujoco_mpc_tpu.agent.agent import Agent
    self.task = task
    self._agent = Agent(task)
    self.planner = planner or self._agent.planner
    m = getattr(task, "plan_model", task.model)
    pol = self.planner.policy
    self._host = native.PolicyRuntime(
        nu=m.nu, num_nodes=pol.values.shape[0],
        interp=int(pol.interp))
    lo = np.asarray(jax.device_get(m.actuator_ctrlrange[:, 0]))
    hi = np.asarray(jax.device_get(m.actuator_ctrlrange[:, 1]))
    self._host.set_ctrlrange(lo, hi)
    self._publish(pol)

    self._key = jax.random.PRNGKey(seed)
    self._state_lock = threading.Lock()
    self._d0 = task.make_data()
    self._exit = threading.Event()
    self._iterations = 0
    self._thread: Optional[threading.Thread] = None

  # -- control-thread API ----------------------------------------------------

  def set_state(self, qpos=None, qvel=None, time=None):
    """Latest physics state for the planner (reference Agent::SetState;
    the plan thread snapshots it at each iteration)."""
    import jax.numpy as jnp
    with self._state_lock:
      d = self._d0
      if qpos is not None:
        d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype))
      if qvel is not None:
        d = d.replace(qvel=jnp.asarray(qvel, d.qvel.dtype))
      if time is not None:
        d = d.replace(time=jnp.asarray(time, d.time.dtype))
      self._d0 = d

  def action(self, time: float) -> np.ndarray:
    """Sample the newest published policy — native host, no locks or
    JAX on this path (reference interface.cc Step ->
    ActionFromPolicy)."""
    return self._host.action(float(time))

  @property
  def policy_version(self) -> int:
    return self._host.version

  @property
  def iterations(self) -> int:
    return self._iterations

  # -- plan thread -------------------------------------------------------------

  def _publish(self, pol):
    self._host.update(float(jax.device_get(pol.t0)),
                      float(jax.device_get(pol.dt)),
                      np.asarray(jax.device_get(pol.values)))

  def _plan_loop(self):
    while not self._exit.is_set():
      with self._state_lock:
        d0 = self._d0
      self._key, sub = jax.random.split(self._key)
      self.planner.optimize(sub, d0)
      self._publish(self.planner.policy)
      self._iterations += 1

  def start(self):
    assert self._thread is None, "already running"
    self._thread = threading.Thread(target=self._plan_loop, daemon=True)
    self._thread.start()
    return self

  def stop(self):
    self._exit.set()
    if self._thread is not None:
      self._thread.join(timeout=30.0)
      self._thread = None

  def __enter__(self):
    return self.start()

  def __exit__(self, *exc):
    self.stop()
