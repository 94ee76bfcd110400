"""ctypes bindings for the native policy runtime (policy_runtime.cc).

Builds the shared library on first import if needed (g++ is baked into the
image). The PolicyRuntime wraps the lock-free double-buffered spline host:
the JAX planner publishes plans via `update`, a control thread samples with
`action` at servo rate with no Python-side locking of the planner.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libpolicy_runtime.so")


def _build():
  subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)


def _load():
  if not os.path.exists(_LIB):
    # serialize the first build: concurrent importers (pytest-xdist
    # workers, multiple services) must not race `make` on a fresh
    # checkout — a half-written .so makes CDLL fail with OSError
    import fcntl
    with open(os.path.join(_DIR, ".build.lock"), "w") as lockf:
      fcntl.flock(lockf, fcntl.LOCK_EX)
      if not os.path.exists(_LIB):
        _build()
  lib = ctypes.CDLL(_LIB)
  lib.mpc_policy_create.restype = ctypes.c_void_p
  lib.mpc_policy_create.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                    ctypes.c_int32]
  lib.mpc_policy_destroy.argtypes = [ctypes.c_void_p]
  lib.mpc_policy_set_ctrlrange.argtypes = [
      ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
      ctypes.POINTER(ctypes.c_double)]
  lib.mpc_policy_update.argtypes = [
      ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
      ctypes.POINTER(ctypes.c_double)]
  lib.mpc_policy_action.argtypes = [
      ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
  lib.mpc_policy_version.restype = ctypes.c_uint64
  lib.mpc_policy_version.argtypes = [ctypes.c_void_p]
  return lib


_lib = None


def get_lib():
  global _lib
  if _lib is None:
    _lib = _load()
  return _lib


class PolicyRuntime:
  """Native double-buffered policy host (reference AgentRunner parity)."""

  def __init__(self, nu: int, num_nodes: int, interp: int = 0,
               ctrl_lo=None, ctrl_hi=None):
    self.lib = get_lib()
    self.nu = nu
    self.num_nodes = num_nodes
    self.handle = self.lib.mpc_policy_create(nu, num_nodes, interp)
    self._out = np.zeros(nu, dtype=np.float64)
    if ctrl_lo is not None:
      self.set_ctrlrange(ctrl_lo, ctrl_hi)

  def set_ctrlrange(self, lo, hi):
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    hi = np.ascontiguousarray(hi, dtype=np.float64)
    self.lib.mpc_policy_set_ctrlrange(
        self.handle, lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

  def update(self, t0: float, dt: float, values: np.ndarray):
    values = np.ascontiguousarray(values, dtype=np.float64)
    assert values.shape == (self.num_nodes, self.nu)
    self.lib.mpc_policy_update(
        self.handle, float(t0), float(dt),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

  def update_from_policy(self, policy):
    """Publish a spline_lib.SplinePolicy."""
    self.update(float(policy.t0), float(policy.dt),
                np.asarray(policy.values))

  def action(self, time: float) -> np.ndarray:
    self.lib.mpc_policy_action(
        self.handle, float(time),
        self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return self._out.copy()

  @property
  def version(self) -> int:
    return int(self.lib.mpc_policy_version(self.handle))

  def __del__(self):
    try:
      self.lib.mpc_policy_destroy(self.handle)
    except Exception:
      pass
