"""Direct trajectory optimizer: batch smoothing / system ID over
configurations via inverse dynamics.

Reference capability (mjpc/direct/direct.{h,cc}, docs/DIRECT.md:12-63):
optimize q_{0:T} so that (a) model sensors predicted from (q, v, a) match
measured sensors, and (b) inverse dynamics matches the applied force:
``force residual = g(q_{t-1}, q_t, q_{t+1}) - tau_t``; velocities and
accelerations come from finite differences of configurations; cost is
Gauss-Newton with per-sensor / per-force weights (1/noise, time-scaled).

TPU-native design, two regimes:

* dense (default for short windows): the full residual vector is a pure
  JAX function of the stacked configuration tangent; its Jacobian comes
  from one vmapped jacfwd and the (T*nv)^2 Gauss-Newton system is a
  single dense Cholesky — a few-hundred-dim matrix the MXU eats for
  breakfast.
* banded (`banded=True`, auto at horizon >= 24): per-stage Jacobian
  blocks wrt (q_{t-1}, q_t, q_{t+1}) from ONE vmapped jacfwd over a 3*nv
  tangent (3*nv JVPs total instead of T*nv), assembled into
  block-pentadiagonal band storage and solved by the 2nv-superblock
  block-tridiagonal Cholesky in banded.py — the TPU equivalent of the
  reference's nband = 3*nv band Cholesky (direct.h:299-302,
  mju_cholFactorBand). Memory O(T*nv^2) instead of O((T*nv)^2), so
  T = 64 reference-scale windows fit where the dense path cannot.
  Parameter estimation keeps its dense border via a Schur complement
  on the banded factorization (direct.h:291).

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


def _inverse_force(m, dd, qacc):
  """Force residual prediction = full inverse dynamics incl. the explicit
  soft-constraint force (mj_inverse semantics; reference direct.h force
  residual uses mj_inverse, docs/DIRECT.md:12-63). dd must have passed
  fwd_position + fwd_velocity (efc rows + aref/D ready)."""
  from mujoco_mpc_tpu.physics import constraint as C
  tau = dd.qM @ qacc + dd.qfrc_bias - dd.qfrc_passive
  if dd.efc_J is not None and dd.efc_J.shape[0] > 0:
    tau = tau - dd.efc_J.T @ C.efc_force_at(dd, qacc)
  return tau



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
               banded: Optional[bool] = None,
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
    # optional matrix prior in block-band storage (Pd (T,nv,nv),
    # Po1 (T-1,nv,nv), Po2 (T-2,nv,nv)) — banded path only; traced, so
    # the Batch estimator's recursive prior updates never recompile
    self.prior_band = None
    self.status = Status.UNSOLVED
    self.iterations = 0

    self.banded = (horizon >= 24) if banded is None else banded
    # unjitted core kept for callers that fuse the solve into a larger
    # program (Batch estimator's single-round-trip update)
    self._solve_fn = (self._make_solve_banded() if self.banded
                      else self._make_solve())
    self._solve = jax.jit(self._solve_fn)

  # -- core ------------------------------------------------------------------

  def _residuals(self, qs, theta, sensor_meas, force_meas, w_sensor,
                 w_force, prior_qpos):
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
      f_pred = _inverse_force(m, dd, at)
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
          qs, prior_qpos)
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

    def solve(q_init, theta0, sensor_meas, force_meas, w_sensor, w_force,
              prior_qpos):
      def cost_of(dz):
        r = self._residuals(qs_from_tangent(q_init, dz),
                            theta_of(theta0, dz), sensor_meas,
                            force_meas, w_sensor, w_force, prior_qpos)
        return 0.5 * jnp.sum(r * r)

      def gn_step(carry):
        dz, cost, reg, it, status = carry
        r = self._residuals(qs_from_tangent(q_init, dz),
                            theta_of(theta0, dz), sensor_meas,
                            force_meas, w_sensor, w_force, prior_qpos)
        jac = jax.jacfwd(lambda z: self._residuals(
            qs_from_tangent(q_init, z), theta_of(theta0, z), sensor_meas,
            force_meas, w_sensor, w_force, prior_qpos))(dz)
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

  def _make_solve_banded(self):
    """Gauss-Newton with per-stage Jacobian blocks and a block-banded
    solve (see module docstring). The iterate is the configuration
    sequence itself (manifold retraction per step) rather than a global
    tangent from q_init."""
    from mujoco_mpc_tpu.direct import banded as band_lib
    m0 = self.m
    nv = m0.nv
    t_hor = self.horizon
    st = self.settings
    nparam = self.nparam

    def stage_res(q3, theta, y_t, f_t, w_sensor, w_force):
      """Residual of one interior stage given (q_{t-1}, q_t, q_{t+1})."""
      m = self.param_update(m0, theta) if self.param_update else m0
      h = m.opt.timestep
      v1 = deriv.qpos_diff(m, q3[1], q3[0]) / h
      v2 = deriv.qpos_diff(m, q3[2], q3[1]) / h
      a_t = (v2 - v1) / h
      d = self._template.replace(qpos=q3[1], qvel=v1)
      dd = F.fwd_position(m, d)
      dd = F.fwd_velocity(m, dd)
      y_pred = self.sensor_fn(m, dd)
      f_pred = _inverse_force(m, dd, a_t)
      return jnp.concatenate([jnp.sqrt(w_sensor) * (y_pred - y_t),
                              jnp.sqrt(w_force) * (f_pred - f_t)])

    def stage_res_tangent(dz3, dth, q3, theta, y_t, f_t, ws, wf):
      q3n = jax.vmap(lambda q, dq: deriv.qpos_add(m0, q, dq))(
          q3, dz3.reshape(3, nv))
      return stage_res(q3n, theta + dth, y_t, f_t, ws, wf)

    def prior_res(dq, q_t, q_prior):
      qn = deriv.qpos_add(m0, q_t, dq)
      return jnp.sqrt(jnp.asarray(self.prior_weight, self.dtype)) * \
          deriv.qpos_diff(m0, qn, q_prior)

    def chol_t_mult(ld, l1, l2, dq):
      """y = L^T dq for a block-banded lower Cholesky factor L
      (Ld diag, L1 sub, L2 2-sub blocks); dq (T, nv)."""
      y = jnp.einsum("tji,tj->ti", ld, dq)
      y = y.at[:-1].add(jnp.einsum("tji,tj->ti", l1, dq[1:]))
      y = y.at[:-2].add(jnp.einsum("tji,tj->ti", l2, dq[2:]))
      return y

    def chol_mult(ld, l1, l2, y):
      """x = L y for the same factor."""
      x = jnp.einsum("tij,tj->ti", ld, y)
      x = x.at[1:].add(jnp.einsum("tij,tj->ti", l1, y[:-1]))
      x = x.at[2:].add(jnp.einsum("tij,tj->ti", l2, y[:-2]))
      return x

    def cost_of(qs, theta, sensor_meas, force_meas, w_sensor, w_force,
                prior_qpos, ld, l1, l2):
      stacked = jnp.stack([qs[:-2], qs[1:-1], qs[2:]], axis=1)
      rs = jax.vmap(lambda q3, y, f: stage_res(
          q3, theta, y, f, w_sensor, w_force))(
              stacked, sensor_meas[1:-1], force_meas[1:-1])
      c = 0.5 * jnp.sum(rs * rs)
      dq = jax.vmap(lambda q, qp: deriv.qpos_diff(m0, q, qp))(
          qs, prior_qpos)
      if self.prior_weight > 0.0:
        c = c + 0.5 * self.prior_weight * jnp.sum(dq * dq)
      # matrix prior as its square root (Batch estimator: 0.5 dq^T P dq
      # with P = L L^T, reference batch.cc weight_prior_band_)
      yp = chol_t_mult(ld, l1, l2, dq)
      c = c + 0.5 * jnp.sum(yp * yp)
      return c

    def assemble(qs, theta, sensor_meas, force_meas, w_sensor, w_force,
                 prior_qpos, ld, l1, l2):
      """Band storage (d1, o1, o2), gradient g, the parameter border,
      and the raw per-stage Jacobian blocks of the GN system at
      (qs, theta) — regularization NOT included (the band is the
      information matrix the Batch estimator conditions for its
      recursive prior update; the raw blocks feed the SRIF QR solve).
      The matrix prior arrives as its block-banded Cholesky factor
      (ld, l1, l2), P = L L^T."""
      stacked = jnp.stack([qs[:-2], qs[1:-1], qs[2:]], axis=1)
      zeros3 = jnp.zeros(3 * nv, self.dtype)
      zth = jnp.zeros(nparam, self.dtype)

      def per_stage(q3, y_t, f_t):
        r = stage_res_tangent(zeros3, zth, q3, theta, y_t, f_t,
                              w_sensor, w_force)
        j3, jth = jax.jacfwd(stage_res_tangent, argnums=(0, 1))(
            zeros3, zth, q3, theta, y_t, f_t, w_sensor, w_force)
        return r, j3, jth

      rs, j3s, jths = jax.vmap(per_stage)(
          stacked, sensor_meas[1:-1], force_meas[1:-1])
      a_b = j3s[:, :, :nv]            # (T-2, nr, nv) wrt q_{t-1}
      b_b = j3s[:, :, nv:2 * nv]      # wrt q_t
      c_b = j3s[:, :, 2 * nv:]        # wrt q_{t+1}

      def acc(x, y):                  # (T-2, nr, nv) pair -> X^T Y
        return jnp.einsum("tri,trj->tij", x, y)

      d1 = jnp.zeros((t_hor, nv, nv), self.dtype)
      d1 = d1.at[:t_hor - 2].add(acc(a_b, a_b))
      d1 = d1.at[1:t_hor - 1].add(acc(b_b, b_b))
      d1 = d1.at[2:].add(acc(c_b, c_b))
      o1 = jnp.zeros((t_hor - 1, nv, nv), self.dtype)
      o1 = o1.at[:t_hor - 2].add(acc(a_b, b_b))
      o1 = o1.at[1:].add(acc(b_b, c_b))
      o2 = acc(a_b, c_b)              # H[t, t+2], t = 0..T-3

      gv = jnp.einsum("tri,tr->ti", a_b, rs)
      g = jnp.zeros((t_hor, nv), self.dtype)
      g = g.at[:t_hor - 2].add(gv)
      g = g.at[1:t_hor - 1].add(jnp.einsum("tri,tr->ti", b_b, rs))
      g = g.at[2:].add(jnp.einsum("tri,tr->ti", c_b, rs))

      # scalar prior rows (sqrt(w) * Jp per config) — expressed in the
      # same square-root form the SRIF consumes
      dq_p = jax.vmap(lambda q, qp: deriv.qpos_diff(m0, q, qp))(
          qs, prior_qpos)
      if self.prior_weight > 0.0:
        zero_dq = jnp.zeros(nv, self.dtype)

        def per_prior(q_t, q_p):
          rp = prior_res(zero_dq, q_t, q_p)
          jp = jax.jacfwd(prior_res)(zero_dq, q_t, q_p)
          return rp, jp

        rps, jps = jax.vmap(per_prior)(qs, prior_qpos)
        # fold into the matrix-prior square root: L_d^T rows = jps
        ld_eff = ld + jnp.swapaxes(jps, 1, 2)
        rp_rows = rps + chol_t_mult(ld, l1, l2, dq_p)
      else:
        ld_eff = ld
        rp_rows = chol_t_mult(ld, l1, l2, dq_p)

      # H += P = L L^T, g += P dq (band products of the factor)
      g = g + chol_mult(ld, l1, l2, chol_t_mult(ld, l1, l2, dq_p))
      d1 = d1 + jnp.einsum("tik,tjk->tij", ld, ld)
      d1 = d1.at[1:].add(jnp.einsum("tik,tjk->tij", l1, l1))
      d1 = d1.at[2:].add(jnp.einsum("tik,tjk->tij", l2, l2))
      o1 = o1 + jnp.einsum("tik,tjk->tij", ld[:-1], l1)
      o1 = o1.at[1:].add(jnp.einsum("tik,tjk->tij", l1[:-1], l2))
      o2 = o2 + jnp.einsum("tik,tjk->tij", ld[:-2], l2)
      if self.prior_weight > 0.0:
        d1 = d1 + jnp.einsum("tri,trj->tij", jps, jps)
        g = g + jnp.einsum("tri,tr->ti", jps, rps)

      if nparam:
        p_b = jnp.zeros((t_hor, nv, nparam), self.dtype)
        p_b = p_b.at[:t_hor - 2].add(jnp.einsum("tri,trp->tip", a_b,
                                                jths))
        p_b = p_b.at[1:t_hor - 1].add(jnp.einsum("tri,trp->tip", b_b,
                                                 jths))
        p_b = p_b.at[2:].add(jnp.einsum("tri,trp->tip", c_b, jths))
        q_blk = jnp.einsum("trp,trq->pq", jths, jths)
        g_th = jnp.einsum("trp,tr->p", jths, rs)
      else:
        p_b = q_blk = g_th = None
      return (d1, o1, o2, g, p_b, q_blk, g_th,
              a_b, b_b, c_b, rs, jths, ld_eff, rp_rows)

    self._assemble_banded = assemble

    def solve(q_init, theta0, sensor_meas, force_meas, w_sensor, w_force,
              prior_qpos, ld, l1, l2):
      def gn_step(carry):
        qs, theta, cost, reg, it, status = carry
        (d1, o1, o2, g, p_b, q_blk, g_th, a_b, b_b, c_b, rs, jths,
         ld_eff, rp_rows) = assemble(
            qs, theta, sensor_meas, force_meas, w_sensor, w_force,
            prior_qpos, ld, l1, l2)

        # square-root (QR) solve on the Jacobian — the f32-stable path
        dz, dth = band_lib.srif_gn_solve(
            a_b, b_b, c_b, rs, ld_eff, l1, l2, rp_rows, reg,
            Jth=jths if nparam else None)

        def retract(qs, theta, alpha):
          qn = jax.vmap(lambda q, dq: deriv.qpos_add(m0, q, dq))(
              qs, alpha * dz)
          return qn, theta + alpha * dth if nparam else theta

        def ls_body(k, val):
          alpha, best_c, best_a = val
          qn, thn = retract(qs, theta, alpha)
          c_try = cost_of(qn, thn, sensor_meas, force_meas, w_sensor,
                          w_force, prior_qpos, ld, l1, l2)
          better = c_try < best_c
          return (alpha * 0.5, jnp.where(better, c_try, best_c),
                  jnp.where(better, alpha, best_a))

        _, new_cost, alpha = jax.lax.fori_loop(
            0, st.ls_iterations, ls_body,
            (jnp.ones((), self.dtype), cost, jnp.zeros((), self.dtype)))
        improved = new_cost < cost
        qs_new, th_new = retract(qs, theta, alpha)
        reg_new = jnp.where(improved, jnp.maximum(reg * 0.3, 1e-10),
                            reg * 10.0)
        gnorm = jnp.linalg.norm(g) / self.nvar
        done_grad = gnorm < st.gradient_tolerance
        done_cost = jnp.abs(new_cost - cost) < st.cost_tolerance
        status_new = jnp.where(done_grad | done_cost,
                               Status.SOLVED, Status.UNSOLVED)
        return (jnp.where(improved, qs_new, qs),
                th_new if nparam else theta,
                jnp.where(improved, new_cost, cost), reg_new, it + 1,
                status_new)

      def cond(carry):
        _, _, _, reg, it, status = carry
        return (it < st.max_iterations) & (status == Status.UNSOLVED) & \
            (reg < 1e8)

      cost0 = cost_of(q_init, theta0, sensor_meas, force_meas, w_sensor,
                      w_force, prior_qpos, ld, l1, l2)
      init = (q_init, theta0, cost0,
              jnp.asarray(st.regularization_initial, self.dtype),
              jnp.zeros((), jnp.int32),
              jnp.asarray(int(Status.UNSOLVED), jnp.int32))
      qs, theta, cost, reg, it, status = jax.lax.while_loop(
          cond, gn_step, init)
      status = jnp.where(
          (status == Status.UNSOLVED) & (it >= st.max_iterations),
          Status.MAX_ITERATIONS_FAILURE, status)
      return qs, theta, cost, cost0, it, status

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

  def hessian_band(self, qs=None, theta=None):
    """GN information matrix (no regularization) in block-band storage
    (d1, o1, o2) at the given — default: last optimized —
    configurations. Includes the prior terms. Used by the Batch
    estimator's recursive prior update (reference batch.cc:354-384
    ConditionMatrix on cost_hessian_)."""
    assert self.banded, "hessian_band requires the banded path"
    if not hasattr(self, "_hess_jit"):
      self._hess_jit = jax.jit(
          lambda *a: self._assemble_banded(*a)[:4])
    qs = self.qpos_optimized if qs is None else qs
    theta = self.parameters if theta is None else theta
    d1, o1, o2, g = self._hess_jit(
        jnp.asarray(qs, self.dtype),
        jnp.asarray(theta, self.dtype),
        jnp.asarray(self.sensor_measured, self.dtype),
        jnp.asarray(self.force_measured, self.dtype),
        jnp.asarray(self.weight_sensor, self.dtype),
        jnp.asarray(self.weight_force, self.dtype),
        jnp.asarray(self._prior_qpos, self.dtype), *self._band_args())
    return np.asarray(d1), np.asarray(o1), np.asarray(o2)

  def _band_args(self):
    """Block-banded lower Cholesky factor L of the matrix prior P
    (traced args of the banded solve). Computed host-side in f64 — the
    prior matrix accumulates conditioned Hessians whose entries span
    ~1e8, beyond a safe f32 factorization."""
    nv, t_hor = self.m.nv, self.horizon
    if self.prior_band is not None:
      assert self.prior_weight == 0.0, \
          "scalar and matrix priors are mutually exclusive"
      pd, po1, po2 = [np.asarray(x, np.float64) for x in self.prior_band]
      n = t_hor * nv
      w = np.zeros((n, n))
      for i in range(t_hor):
        w[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv] = pd[i]
      for i in range(t_hor - 1):
        w[i * nv:(i + 1) * nv, (i + 1) * nv:(i + 2) * nv] = po1[i]
        w[(i + 1) * nv:(i + 2) * nv, i * nv:(i + 1) * nv] = po1[i].T
      for i in range(t_hor - 2):
        w[i * nv:(i + 1) * nv, (i + 2) * nv:(i + 3) * nv] = po2[i]
        w[(i + 2) * nv:(i + 3) * nv, i * nv:(i + 1) * nv] = po2[i].T
      jit_eps = max(1e-12, 1e-9 * float(np.abs(np.diag(w)).max()))
      lfull = np.linalg.cholesky(w + jit_eps * np.eye(n))
      ld = np.stack([lfull[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv]
                     for i in range(t_hor)])
      l1 = np.stack([lfull[(i + 1) * nv:(i + 2) * nv, i * nv:(i + 1) * nv]
                     for i in range(t_hor - 1)]) if t_hor > 1 else \
          np.zeros((0, nv, nv))
      l2 = np.stack([lfull[(i + 2) * nv:(i + 3) * nv, i * nv:(i + 1) * nv]
                     for i in range(t_hor - 2)]) if t_hor > 2 else \
          np.zeros((0, nv, nv))
      return (jnp.asarray(ld, self.dtype), jnp.asarray(l1, self.dtype),
              jnp.asarray(l2, self.dtype))
    return (jnp.zeros((t_hor, nv, nv), self.dtype),
            jnp.zeros((t_hor - 1, nv, nv), self.dtype),
            jnp.zeros((t_hor - 2, nv, nv), self.dtype))

  def optimize(self):
    args = (jnp.asarray(self.qpos_initial, self.dtype),
            jnp.asarray(self.param_initial, self.dtype),
            jnp.asarray(self.sensor_measured, self.dtype),
            jnp.asarray(self.force_measured, self.dtype),
            jnp.asarray(self.weight_sensor, self.dtype),
            jnp.asarray(self.weight_force, self.dtype),
            jnp.asarray(self._prior_qpos, self.dtype))
    if self.banded:
      args = args + self._band_args()
    else:
      assert self.prior_band is None, \
          "matrix prior (prior_band) requires the banded path"
    # ONE host transfer for all outputs (sequential np.asarray/float
    # reads each pay a full device round trip on remote backends)
    qs, theta, cost, cost0, it, status = jax.device_get(
        self._solve(*args))
    self.qpos_optimized = np.asarray(qs)
    self.parameters = np.asarray(theta)
    self.cost = float(cost)
    self.cost_initial = float(cost0)
    self.iterations = int(it)
    self.status = Status(int(status)) if int(status) != 0 else \
        Status.MAX_ITERATIONS_FAILURE
    return self.qpos_optimized
