"""Extended Kalman filter — TPU-native.

Reference semantics (mjpc/estimators/kalman.{h,cc}):
  * measurement update (kalman.cc:134-258): sensor Jacobian C (reference:
    FD via mjd_transitionFD; here forward-mode AD in the quaternion tangent
    space), gain via Cholesky of (C P C' + R), state correction applied with
    mj_integratePos on the tangent (qpos quaternion-aware), covariance
    P <- (I - K C) P;
  * prediction update (kalman.cc:260-335): step the model, A = d step/dx
    (AD), P <- A P A' + Q;
  * diagonal process/sensor noise vectors, settable (kalman.h).

The whole update is one jitted function: batched small matmuls + one
Cholesky, vmappable across parallel filters.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.planners import derivatives as deriv


class Kalman(base.Estimator):
  """EKF (reference GUI name: "Kalman")."""

  def __init__(self, task, sensor_fn=None, dtype=jnp.float32):
    self.task = task
    self.m = task.model
    self.mjm = task.mjm
    self.dtype = dtype
    self.nx = deriv.ndx(self.m)
    self.sensor_fn = sensor_fn or sensors_lib.make_sensor_fn(task.mjm)

    # sensor dimension from a probe evaluation
    d0 = F.forward(self.m, task.make_data())
    self.ns = int(self.sensor_fn(self.m, d0).shape[0])

    self._template = d0
    self._measure = jax.jit(self._measure_impl)
    self._predict = jax.jit(self._predict_impl)
    # fused measurement+prediction: ONE program per filter step, no
    # host round-trip between the halves (serving path; the split
    # _measure/_predict remain for the reference's split-update API,
    # kalman.h:51-66)
    def _step_impl(x, p, q_noise, r_noise, ctrl, y):
      x1, p1, innov = self._measure_impl(x, p, r_noise, ctrl, y)
      x2, p2 = self._predict_impl(x1, p1, q_noise, ctrl)
      return x2, p2, innov
    self._step = jax.jit(_step_impl)
    self.reset()

  def reset(self):
    d0 = self.task.make_data()
    self.x = jnp.asarray(rollout_lib.pack_state(d0), self.dtype)
    self.p = 1e-4 * jnp.eye(self.nx, dtype=self.dtype)
    self.q_noise = 1e-4 * jnp.ones(self.nx, self.dtype)   # process
    self.r_noise = 1e-3 * jnp.ones(self.ns, self.dtype)   # sensor
    self.time = 0.0

  # -- jitted cores ----------------------------------------------------------

  def _sensor_at(self, state, ctrl):
    d = rollout_lib.set_state(self.m, self._template, state)
    d = d.replace(ctrl=ctrl)
    d = F.forward(self.m, d)
    return self.sensor_fn(self.m, d)

  def _measure_impl(self, x, p, r_noise, ctrl, y):
    def h(dx):
      return self._sensor_at(deriv.state_add(self.m, x, dx), ctrl)

    zero = jnp.zeros(self.nx, self.dtype)
    y_pred = h(zero)
    c = jax.jacfwd(h)(zero)  # (ns, nx)
    s = c @ p @ c.T + jnp.diag(r_noise)
    chol = jnp.linalg.cholesky(s + 1e-9 * jnp.eye(self.ns, dtype=self.dtype))
    # K = P C' S^-1 via cholesky solves
    tmp = jax.scipy.linalg.cho_solve((chol, True), c @ p)  # (ns, nx)
    k = tmp.T  # (nx, ns)
    innov = y - y_pred
    dx = k @ innov
    x_new = deriv.state_add(self.m, x, dx)
    p_new = (jnp.eye(self.nx, dtype=self.dtype) - k @ c) @ p
    p_new = 0.5 * (p_new + p_new.T)
    return x_new, p_new, innov

  def _predict_impl(self, x, p, q_noise, ctrl):
    step_fn = deriv.make_step_fn(self.m, self._template)

    def f(dx):
      nxt = step_fn(deriv.state_add(self.m, x, dx), ctrl,
                    jnp.asarray(0.0, self.dtype))
      return deriv.state_diff(self.m, nxt, x_next)

    x_next = step_fn(x, ctrl, jnp.asarray(0.0, self.dtype))
    a = jax.jacfwd(f)(jnp.zeros(self.nx, self.dtype))
    p_new = a @ p @ a.T + jnp.diag(q_noise)
    return x_next, 0.5 * (p_new + p_new.T)

  # -- public API (reference kalman.h:51-66 split update) --------------------

  def update_measurement(self, ctrl, sensor):
    ctrl = jnp.asarray(ctrl, self.dtype)
    y = jnp.asarray(sensor, self.dtype)
    self.x, self.p, innov = self._measure(
        self.x, self.p, self.r_noise, ctrl, y)
    return innov  # lazy device array — sync only if the caller reads it

  def update_prediction(self, ctrl):
    ctrl = jnp.asarray(ctrl, self.dtype)
    self.x, self.p = self._predict(self.x, self.p, self.q_noise, ctrl)

  def update(self, ctrl, sensor):
    """One EKF step (measurement + prediction) as one device program.

    BEHAVIOR CHANGE (round 3): returns a LAZY jax device array, not a
    synced numpy array — the serving path chains updates without a host
    round trip per step. Callers that need numpy semantics must read the
    `.state` property (synced view) instead of the return value. Same
    applies to update_measurement() here and in unscented.py.
    """
    ctrl = jnp.asarray(ctrl, self.dtype)
    y = jnp.asarray(sensor, self.dtype)
    self.x, self.p, _ = self._step(
        self.x, self.p, self.q_noise, self.r_noise, ctrl, y)
    self.time += float(self.m.opt.timestep)
    return self.x  # lazy; .state gives the synced numpy view

  @property
  def state(self):
    return np.asarray(self.x)

  @property
  def covariance(self):
    return np.asarray(self.p)

  def set_state(self, state):
    self.x = jnp.asarray(state, self.dtype)

  def set_noise(self, process: Optional[np.ndarray] = None,
                sensor: Optional[np.ndarray] = None):
    if process is not None:
      self.q_noise = jnp.asarray(process, self.dtype)
    if sensor is not None:
      self.r_noise = jnp.asarray(sensor, self.dtype)
