"""Thread-safe state snapshot bridging physics and planner threads.

Reference: mjpc/states/state.{h,cc} — a shared_mutex-guarded snapshot of
[qpos, qvel, act] + mocap + userdata + time, written by the physics thread
and read by the planner thread. Here the payload is host numpy (cheap
lock-held copies); conversion to device arrays happens on the reader side.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np


class State:
  """Locked snapshot of the simulation state (reference State parity)."""

  def __init__(self, nq: int, nv: int, na: int, nmocap: int = 0,
               nuserdata: int = 0):
    self._lock = threading.RLock()
    self._state = np.zeros(nq + nv + na)
    self._mocap = np.zeros((max(nmocap, 1), 7))
    self._mocap[:, 3] = 1.0
    self._userdata = np.zeros(max(nuserdata, 1))
    self._time = 0.0

  def set(self, data, m=None):
    """Write from a physics Data (mj Data-like or our Data pytree)."""
    with self._lock:
      qpos = np.asarray(data.qpos)
      qvel = np.asarray(data.qvel)
      act = np.asarray(data.act)
      self._state = np.concatenate([qpos, qvel, act])
      if getattr(data, "mocap_pos", None) is not None:
        mp = np.asarray(data.mocap_pos).reshape(-1, 3)
        mq = np.asarray(data.mocap_quat).reshape(-1, 4)
        n = min(len(mp), len(self._mocap))
        self._mocap[:n, :3] = mp[:n]
        self._mocap[:n, 3:] = mq[:n]
      if getattr(data, "userdata", None) is not None:
        ud = np.asarray(data.userdata)
        self._userdata[:len(ud)] = ud
      self._time = float(data.time)

  def copy_to(self):
    """Read a consistent snapshot: (state, mocap, userdata, time)."""
    with self._lock:
      return (self._state.copy(), self._mocap.copy(),
              self._userdata.copy(), self._time)

  @property
  def time(self) -> float:
    with self._lock:
      return self._time

  @property
  def state(self) -> np.ndarray:
    with self._lock:
      return self._state.copy()
