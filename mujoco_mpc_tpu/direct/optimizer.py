"""Direct trajectory optimizer: batch smoothing / system ID over
configurations via inverse dynamics.

Reference capability (mjpc/direct/direct.{h,cc}, docs/DIRECT.md:12-63):
optimize q_{0:T} so that (a) model sensors predicted from (q, v, a) match
measured sensors, and (b) inverse dynamics matches the applied force:
``force residual = g(q_{t-1}, q_t, q_{t+1}) - tau_t``; velocities and
accelerations come from finite differences of configurations; cost is
Gauss-Newton with per-sensor / per-force weights (1/noise, time-scaled).

TPU-native design: instead of assembling FD Jacobian blocks into a banded
Hessian with a custom band Cholesky (direct.h:236-302), the full residual
vector is a pure JAX function of the stacked configuration tangent; its
Jacobian comes from one vmapped jacfwd, and the (T*nv)^2 Gauss-Newton
system is a single dense Cholesky — a few-hundred-dim matrix that the MXU
eats for breakfast. The banded structure can be exploited by a Pallas
block-tridiagonal solver later if T grows.

Statuses mirror direct.h:36-45.
"""

from __future__ import annotations

import enum
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.physics import inverse as inv_lib
from mujoco_mpc_tpu.physics import sensors as sensors_lib
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.planners import derivatives as deriv
from mujoco_mpc_tpu import rollout as rollout_lib


class Status(enum.IntEnum):
  """(reference direct.h:36-45)"""
  UNSOLVED = 0
  SOLVED = 1
  MAX_ITERATIONS_FAILURE = 2
  SMALL_DIRECTION_FAILURE = 3
  MAX_REGULARIZATION_FAILURE = 4
  COST_DIFFERENCE_FAILURE = 5
  EXPECTED_DECREASE_FAILURE = 6


@struct.dataclass
class DirectSettings:
  max_iterations: int = struct.field(pytree_node=False, default=12)
  ls_iterations: int = struct.field(pytree_node=False, default=8)
  gradient_tolerance: float = struct.field(pytree_node=False, default=1e-6)
  cost_tolerance: float = struct.field(pytree_node=False, default=1e-8)
  regularization_initial: float = struct.field(pytree_node=False,
                                               default=1e-6)


class Direct:
  """Host wrapper around the jitted batch Gauss-Newton solve.

  Optional model-parameter estimation (reference: direct's nparam dense
  rows + pluggable model_parameters.{h,cc}): pass `param_update`, a
  function (Model, theta) -> Model applying an nparam-vector of parameters
  (e.g. scaling dof damping or body masses); theta joins the decision
  variables and is returned by optimize() as `self.parameters`.
  """

  def __init__(self, task_or_model, horizon: int,
               sensor_fn: Optional[Callable] = None,
               settings: Optional[DirectSettings] = None,
               param_update: Optional[Callable] = None,
               nparam: int = 0,
               param_initial=None,
               dtype=jnp.float32):
    # accept a Task (has .model/.mjm) or a bare Model + explicit sensor_fn
    if hasattr(task_or_model, "model"):
      self.m = task_or_model.model
      self.mjm = task_or_model.mjm
      self.sensor_fn = sensor_fn or sensors_lib.make_sensor_fn(self.mjm)
      self._template = F.forward(self.m, task_or_model.make_data())
    else:
      self.m = task_or_model
      assert sensor_fn is not None
      self.sensor_fn = sensor_fn
      from mujoco_mpc_tpu.physics import model as model_lib
      self._template = F.forward(self.m, model_lib.make_data(self.m))
    self.horizon = horizon
    self.settings = settings or DirectSettings()
    self.dtype = dtype
    self.param_update = param_update
    self.nparam = nparam if param_update is not None else 0
    self.param_initial = (np.zeros(self.nparam) if param_initial is None
                          else np.asarray(param_initial))

    d_probe = self._template
    self.ns = int(self.sensor_fn(self.m, d_probe).shape[0])
    nv = self.m.nv
    self.nvar = horizon * nv + self.nparam

    # measured data (host-set)
    self.sensor_measured = np.zeros((horizon, self.ns))
    self.force_measured = np.zeros((horizon, nv))
    self.qpos_initial = np.tile(np.asarray(d_probe.qpos), (horizon, 1))
    self.weight_sensor = np.ones(self.ns)
    self.weight_force = np.ones(nv)
    self.prior_weight = 0.0   # static: set before first optimize()
    self._prior_qpos = jnp.asarray(self.qpos_initial, dtype)
    self.status = Status.UNSOLVED
    self.iterations = 0

    self._solve = jax.jit(self._make_solve())

  # -- core ------------------------------------------------------------------

  def _residuals(self, qs, theta, sensor_meas, force_meas, w_sensor,
                 w_force):
    """Stacked weighted residuals over the horizon.

    qs: (T, nq), theta: (nparam,). Velocity/acceleration by configuration
    FD (docs/DIRECT.md): v_t = (q_t - q_{t-1})/h, a_t = (v_{t+1} - v_t)/h.
    Sensor residuals at t = 1..T-2 (need v, a); force residuals likewise.
    """
    m = self.m
    if self.param_update is not None:
      m = self.param_update(m, theta)
    h = m.opt.timestep
    t_hor = self.horizon

    def vel(q1, q0):
      return deriv.qpos_diff(m, q1, q0) / h

    vs = jax.vmap(vel)(qs[1:], qs[:-1])           # (T-1, nv)
    accs = (vs[1:] - vs[:-1]) / h                 # (T-2, nv)

    def stage(qt, vt, at, y_t, f_t):
      d = self._template.replace(qpos=qt, qvel=vt)
      dd = F.fwd_position(m, d)
      dd = F.fwd_velocity(m, dd)
      y_pred = self.sensor_fn(m, dd)
      f_pred = dd.qM @ at + dd.qfrc_bias - dd.qfrc_passive
      r_sensor = jnp.sqrt(w_sensor) * (y_pred - y_t)
      r_force = jnp.sqrt(w_force) * (f_pred - f_t)
      return jnp.concatenate([r_sensor, r_force])

    rs = jax.vmap(stage)(qs[1:-1], vs[:-1], accs, sensor_meas[1:-1],
                         force_meas[1:-1])
    out = rs.reshape(-1)

    # optional Gaussian prior on the first configurations (Batch estimator:
    # reference batch.{h,cc} adds a prior term to the Direct cost)
    if self.prior_weight > 0.0:
      dq = jax.vmap(lambda q, qp: deriv.qpos_diff(m, q, qp))(
          qs, self._prior_qpos)
      out = jnp.concatenate(
          [out, jnp.sqrt(self.prior_weight) * dq.reshape(-1)])
    return out

  def _make_solve(self):
    m = self.m
    nv = m.nv
    t_hor = self.horizon
    st = self.settings
    nparam = self.nparam

    def qs_from_tangent(q0s, dz):
      dzs = dz[:t_hor * nv].reshape(t_hor, nv)
      return jax.vmap(lambda q, dq: deriv.qpos_add(m, q, dq))(q0s, dzs)

    def theta_of(theta0, dz):
      return theta0 + dz[t_hor * nv:]

    def solve(q_init, theta0, sensor_meas, force_meas, w_sensor, w_force):
      def cost_of(dz):
        r = self._residuals(qs_from_tangent(q_init, dz),
                            theta_of(theta0, dz), sensor_meas,
                            force_meas, w_sensor, w_force)
        return 0.5 * jnp.sum(r * r)

      def gn_step(carry):
        dz, cost, reg, it, status = carry
        r = self._residuals(qs_from_tangent(q_init, dz),
                            theta_of(theta0, dz), sensor_meas,
                            force_meas, w_sensor, w_force)
        jac = jax.jacfwd(lambda z: self._residuals(
            qs_from_tangent(q_init, z), theta_of(theta0, z), sensor_meas,
            force_meas, w_sensor, w_force))(dz)
        grad = jac.T @ r
        hess = jac.T @ jac + reg * jnp.eye(self.nvar, dtype=self.dtype)
        chol = jnp.linalg.cholesky(hess)
        p = -jax.scipy.linalg.cho_solve((chol, True), grad)

        # backtracking line search
        def ls_body(k, val):
          alpha, best_c, best_a = val
          c_try = cost_of(dz + alpha * p)
          better = c_try < best_c
          return (alpha * 0.5, jnp.where(better, c_try, best_c),
                  jnp.where(better, alpha, best_a))

        _, new_cost, alpha = jax.lax.fori_loop(
            0, st.ls_iterations, ls_body,
            (jnp.ones((), self.dtype), cost, jnp.zeros((), self.dtype)))
        improved = new_cost < cost
        dz_new = dz + alpha * p
        reg_new = jnp.where(improved, jnp.maximum(reg * 0.3, 1e-10),
                            reg * 10.0)
        gnorm = jnp.linalg.norm(grad) / self.nvar
        done_grad = gnorm < st.gradient_tolerance
        done_cost = jnp.abs(new_cost - cost) < st.cost_tolerance
        status_new = jnp.where(done_grad | done_cost,
                               Status.SOLVED, Status.UNSOLVED)
        return (jnp.where(improved, dz_new, dz),
                jnp.where(improved, new_cost, cost), reg_new, it + 1,
                status_new)

      def cond(carry):
        dz, cost, reg, it, status = carry
        return (it < st.max_iterations) & (status == Status.UNSOLVED) & \
            (reg < 1e8)

      dz0 = jnp.zeros(self.nvar, self.dtype)
      cost0 = cost_of(dz0)
      init = (dz0, cost0, jnp.asarray(st.regularization_initial,
                                      self.dtype),
              jnp.zeros((), jnp.int32), jnp.asarray(int(Status.UNSOLVED),
                                                    jnp.int32))
      dz, cost, reg, it, status = jax.lax.while_loop(cond, gn_step, init)
      status = jnp.where(
          (status == Status.UNSOLVED) & (it >= st.max_iterations),
          Status.MAX_ITERATIONS_FAILURE, status)
      return (qs_from_tangent(q_init, dz), theta_of(theta0, dz), cost,
              cost0, it, status)

    return solve

  # -- public API (reference Direct::Optimize / Data setters) ----------------

  def set_data(self, t: int, qpos=None, sensor=None, force=None):
    if qpos is not None:
      self.qpos_initial[t] = np.asarray(qpos)
    if sensor is not None:
      self.sensor_measured[t] = np.asarray(sensor)
    if force is not None:
      self.force_measured[t] = np.asarray(force)

  def set_weights(self, sensor=None, force=None):
    if sensor is not None:
      self.weight_sensor = np.asarray(sensor) * np.ones(self.ns)
    if force is not None:
      self.weight_force = np.asarray(force) * np.ones(self.m.nv)

  def optimize(self):
    qs, theta, cost, cost0, it, status = self._solve(
        jnp.asarray(self.qpos_initial, self.dtype),
        jnp.asarray(self.param_initial, self.dtype),
        jnp.asarray(self.sensor_measured, self.dtype),
        jnp.asarray(self.force_measured, self.dtype),
        jnp.asarray(self.weight_sensor, self.dtype),
        jnp.asarray(self.weight_force, self.dtype))
    self.qpos_optimized = np.asarray(qs)
    self.parameters = np.asarray(theta)
    self.cost = float(cost)
    self.cost_initial = float(cost0)
    self.iterations = int(it)
    self.status = Status(int(status)) if int(status) != 0 else \
        Status.MAX_ITERATIONS_FAILURE
    return self.qpos_optimized
