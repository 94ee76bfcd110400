"""Unscented Kalman filter — TPU-native.

Reference semantics (mjpc/estimators/unscented.{h,cc}): 2*ndx+1 sigma
points generated on the quaternion-aware tangent (mj_integratePos
equivalents; unscented.cc:292-347), alpha/beta/lambda weights (:134-143),
joint state+sensor covariance update (a single update combining prediction
and measurement).

TPU design: all sigma points are stepped in one vmapped batch — exactly the
candidate-rollout pattern, so the sigma-point propagation saturates the
same vectorized step function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import rollout as rollout_lib
from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.planners import derivatives as deriv


class Unscented(base.Estimator):
  """UKF (reference GUI name: "Unscented")."""

  def __init__(self, task, sensor_fn=None, dtype=jnp.float32,
               alpha=1.0, beta=2.0):
    self.task = task
    self.m = task.model
    self.dtype = dtype
    self.nx = deriv.ndx(self.m)
    self.alpha, self.beta = alpha, beta
    self.sensor_fn = sensor_fn or sensors_lib.make_sensor_fn(task.mjm)
    d0 = F.forward(self.m, task.make_data())
    self.ns = int(self.sensor_fn(self.m, d0).shape[0])
    self._template = d0
    self._update = jax.jit(self._update_impl)
    self.reset()

  def reset(self):
    d0 = self.task.make_data()
    self.x = jnp.asarray(rollout_lib.pack_state(d0), self.dtype)
    self.p = 1e-4 * jnp.eye(self.nx, dtype=self.dtype)
    self.q_noise = 1e-4 * jnp.ones(self.nx, self.dtype)
    self.r_noise = 1e-3 * jnp.ones(self.ns, self.dtype)
    self.time = 0.0

  def _update_impl(self, x, p, q_noise, r_noise, ctrl, y):
    nx, ns = self.nx, self.ns
    n_sigma = 2 * nx + 1
    lam = self.alpha**2 * nx - nx  # kappa = 0
    c = nx + lam

    # weights (unscented.cc:134-143)
    wm0 = lam / c
    wc0 = lam / c + (1 - self.alpha**2 + self.beta)
    wi = 1.0 / (2 * c)
    wm = jnp.concatenate([jnp.asarray([wm0], self.dtype),
                          jnp.full((2 * nx,), wi, self.dtype)])
    wc = jnp.concatenate([jnp.asarray([wc0], self.dtype),
                          jnp.full((2 * nx,), wi, self.dtype)])

    # sigma points on the tangent
    chol = jnp.linalg.cholesky(
        c * (p + 1e-9 * jnp.eye(nx, dtype=self.dtype)))
    deltas = jnp.concatenate(
        [jnp.zeros((1, nx), self.dtype), chol.T, -chol.T], axis=0)
    sigma = jax.vmap(lambda dx: deriv.state_add(self.m, x, dx))(deltas)

    # propagate through dynamics + sensors (one vmapped batch)
    step_fn = deriv.make_step_fn(self.m, self._template)

    def prop(s):
      nxt = step_fn(s, ctrl, jnp.asarray(0.0, self.dtype))
      d = rollout_lib.set_state(self.m, self._template, nxt)
      d = d.replace(ctrl=ctrl)
      d = F.forward(self.m, d)
      return nxt, self.sensor_fn(self.m, d)

    nxts, ys = jax.vmap(prop)(sigma)

    # means (tangent mean around the propagated center point)
    center = nxts[0]
    dxs = jax.vmap(lambda s: deriv.state_diff(self.m, s, center))(nxts)
    dx_mean = jnp.einsum("i,ij->j", wm, dxs)
    x_mean = deriv.state_add(self.m, center, dx_mean)
    y_mean = jnp.einsum("i,ij->j", wm, ys)

    # covariances
    dxs_c = dxs - dx_mean[None]
    dys = ys - y_mean[None]
    pxx = jnp.einsum("i,ij,ik->jk", wc, dxs_c, dxs_c) + jnp.diag(q_noise)
    pyy = jnp.einsum("i,ij,ik->jk", wc, dys, dys) + jnp.diag(r_noise)
    pxy = jnp.einsum("i,ij,ik->jk", wc, dxs_c, dys)

    # gain + correction
    chol_y = jnp.linalg.cholesky(
        pyy + 1e-9 * jnp.eye(ns, dtype=self.dtype))
    k = jax.scipy.linalg.cho_solve((chol_y, True), pxy.T).T  # (nx, ns)
    innov = y - y_mean
    x_new = deriv.state_add(self.m, x_mean, k @ innov)
    p_new = pxx - k @ pyy @ k.T
    p_new = 0.5 * (p_new + p_new.T)
    return x_new, p_new, innov

  def update(self, ctrl, sensor):
    ctrl = jnp.asarray(ctrl, self.dtype)
    y = jnp.asarray(sensor, self.dtype)
    self.x, self.p, _ = self._update(
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

  def set_noise(self, process=None, sensor=None):
    if process is not None:
      self.q_noise = jnp.asarray(process, self.dtype)
    if sensor is not None:
      self.r_noise = jnp.asarray(sensor, self.dtype)
