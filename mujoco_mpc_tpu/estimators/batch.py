"""Batch estimator: recursive fixed-lag smoother built on the Direct
optimizer.

Reference semantics (mjpc/estimators/batch.{h,cc}): a sliding window of the
last `configuration_length` configurations is re-optimized at every update
against the buffered (ctrl, sensor) history, with a Gaussian prior on the
window; the window then shifts forward (Shift/ShiftResizeTrajectory,
history <= kMaxFilterHistory=64, batch.h:35).

Prior machinery (batch.cc:352-384):
* the prior is a matrix weight P on the window tangent,
  cost_prior = 0.5 dq^T P dq, stored block-band(3) like the cost Hessian
  (weight_prior_band_); initialized to scale_prior * I.
* recursive prior update (filter_settings.recursive_prior_update): after
  each optimize, the GN cost Hessian H (the window's information matrix)
  is CONDITIONED on dropping the oldest configuration — Schur complement
  H' = H11 - H10 H00^{-1} H01 over the first nv dims (ConditionMatrix,
  utilities.cc:1419) — the marginal information of the surviving
  configurations; the shifted window's prior is H' with a fresh
  scale_prior * I block for the incoming configuration, band-limited to
  3 nv-blocks (DenseToBlockBand).

TPU mapping: the Direct solve carries P as traced block-band arguments
(no recompile per update); the condition/shift step is tiny dense host
math on the <= 64*nv window.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.direct.optimizer import Direct, DirectSettings
from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.planners import derivatives as deriv

MAX_FILTER_HISTORY = 64  # reference batch.h:35


def _band_to_dense(pd, po1, po2):
  t_len, nv = pd.shape[0], pd.shape[1]
  n = t_len * nv
  h = np.zeros((n, n), pd.dtype)
  for i in range(t_len):
    h[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv] = pd[i]
  for i in range(t_len - 1):
    h[i * nv:(i + 1) * nv, (i + 1) * nv:(i + 2) * nv] = po1[i]
    h[(i + 1) * nv:(i + 2) * nv, i * nv:(i + 1) * nv] = po1[i].T
  for i in range(t_len - 2):
    h[i * nv:(i + 1) * nv, (i + 2) * nv:(i + 3) * nv] = po2[i]
    h[(i + 2) * nv:(i + 3) * nv, i * nv:(i + 1) * nv] = po2[i].T
  return h


def _dense_to_band(h, t_len, nv):
  """Band-limit a dense window matrix to 3 nv-blocks (reference
  DenseToBlockBand(..., nv, 3)); symmetrizes the diagonal blocks."""
  pd = np.stack([h[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv]
                 for i in range(t_len)])
  pd = 0.5 * (pd + np.transpose(pd, (0, 2, 1)))
  po1 = np.stack([h[i * nv:(i + 1) * nv, (i + 1) * nv:(i + 2) * nv]
                  for i in range(t_len - 1)]) if t_len > 1 else \
      np.zeros((0, nv, nv), h.dtype)
  po2 = np.stack([h[i * nv:(i + 1) * nv, (i + 2) * nv:(i + 3) * nv]
                  for i in range(t_len - 2)]) if t_len > 2 else \
      np.zeros((0, nv, nv), h.dtype)
  return pd, po1, po2


class Batch(base.Estimator):
  """Fixed-lag batch smoother (reference GUI name: "Batch")."""

  def __init__(self, task, configuration_length: Optional[int] = None,
               recursive_prior_update: bool = False, dtype=jnp.float32):
    self.task = task
    self.m = task.model
    self.dtype = dtype
    cfg_len = configuration_length or int(
        task.config("batch_configuration_length", 3))
    self.cfg_len = min(max(cfg_len, 3), MAX_FILTER_HISTORY)
    self.prior_scale = float(task.config("batch_scale_prior", 1e-3))
    # reference filter_settings.recursive_prior_update (default false)
    self.recursive_prior_update = recursive_prior_update

    self._make_direct()
    # the fused _step pins direct.parameters to param_initial each
    # update; a param_update-configured Direct would be silently
    # disabled, so refuse it up front (ADVICE r3)
    if getattr(self.direct, "nparam", 0) != 0:
      raise ValueError(
          "Batch filtering does not support joint parameter estimation; "
          "run a standalone Direct optimizer with param_update instead")
    self._fwd = jax.jit(lambda d: F.forward(self.m, d))
    # one jitted program for the per-update prep (predict + actuation
    # force) and one for the FD velocity — the eager qpos_add/qpos_diff
    # this replaces cost ~40 ms PER OP through the TPU tunnel
    self._template_d = task.make_data()
    h = float(self.m.opt.timestep)

    def _prep(q_prev, qvel, ctrl):
      q_pred = deriv.qpos_add(self.m, q_prev, qvel * h)
      d = self._template_d.replace(qpos=q_pred, qvel=qvel, ctrl=ctrl)
      d = F.forward(self.m, d)
      return q_pred, d.qfrc_actuator

    self._prep = jax.jit(_prep)
    self._fd_vel = jax.jit(
        lambda q1, q0: deriv.qpos_diff(self.m, q1, q0) / h)

    def _step(q_hist, qvel, ctrl, sensor, sensor_hist, force_hist,
              theta0, w_s, w_f, ld, l1, l2):
      """Whole Batch update as ONE program: predict, shift window,
      re-optimize, FD velocity — a single host round trip per filter
      step (batch.cc Update semantics)."""
      q_pred, force = _prep(q_hist[-1], qvel, ctrl)
      q_win = jnp.concatenate([q_hist[1:], q_pred[None]], 0)
      s_win = jnp.concatenate([sensor_hist[1:], sensor[None]], 0)
      f_win = jnp.concatenate([force_hist[1:], force[None]], 0)
      qs, theta, cost, cost0, it, status = self.direct._solve_fn(
          q_win, theta0, s_win, f_win, w_s, w_f, q_win, ld, l1, l2)
      qvel_new = deriv.qpos_diff(self.m, qs[-1], qs[-2]) / h
      return qs, s_win, f_win, qvel_new, cost, it, status

    self._step = jax.jit(_step)
    self.reset()

  def _make_direct(self):
    self.direct = Direct(
        self.task, self.cfg_len, banded=True,
        settings=DirectSettings(max_iterations=6, ls_iterations=6))
    self.direct.set_weights(sensor=1e3, force=1.0)
    self.sensor_fn = self.direct.sensor_fn

  def _prior_identity(self):
    nv, t_len = self.m.nv, self.cfg_len
    pd = np.tile(self.prior_scale * np.eye(nv, dtype=np.float32),
                 (t_len, 1, 1))
    po1 = np.zeros((t_len - 1, nv, nv), np.float32)
    po2 = np.zeros((t_len - 2, nv, nv), np.float32)
    return pd, po1, po2

  def reset(self):
    d0 = self.task.make_data()
    q0 = np.asarray(d0.qpos)
    self.q_history = deque([q0.copy() for _ in range(self.cfg_len)],
                           maxlen=self.cfg_len)
    self.sensor_history = deque(
        [np.zeros(self.direct.ns) for _ in range(self.cfg_len)],
        maxlen=self.cfg_len)
    self.force_history = deque(
        [np.zeros(self.m.nv) for _ in range(self.cfg_len)],
        maxlen=self.cfg_len)
    self.qvel_est = np.zeros(self.m.nv)
    self.time = 0.0
    # prior weight matrix = scale_prior * I (batch.cc:796)
    self.direct.prior_band = self._prior_identity()
    self.direct.prior_weight = 0.0

  def shift_resize(self, new_length: int):
    """Runtime window resize preserving the newest history
    (reference Batch::ShiftResizeTrajectory, batch.cc:801)."""
    new_length = min(max(new_length, 3), MAX_FILTER_HISTORY)
    if new_length == self.cfg_len:
      return
    old = list(self.q_history), list(self.sensor_history), \
        list(self.force_history)
    old_prior = self.direct.prior_band
    old_len = self.cfg_len
    self.cfg_len = new_length
    self._make_direct()

    def refit(items, fill):
      if new_length <= old_len:
        kept = items[old_len - new_length:]
      else:
        kept = [items[0].copy() for _ in range(new_length - old_len)] + \
            list(items)
      return deque(kept, maxlen=new_length)

    self.q_history = refit(old[0], None)
    self.sensor_history = refit(old[1], None)
    self.force_history = refit(old[2], None)
    # prior: keep the newest blocks' weights, new (older) slots get
    # scale_prior * I (reference grows/truncates weight_prior_ in place)
    pd, po1, po2 = self._prior_identity()
    if old_prior is not None:
      keep = min(old_len, new_length)
      pd[-keep:] = old_prior[0][-keep:]
      if keep > 1:
        po1[-(keep - 1):] = old_prior[1][-(keep - 1):]
      if keep > 2:
        po2[-(keep - 2):] = old_prior[2][-(keep - 2):]
    self.direct.prior_band = (pd, po1, po2)

  def _prior_update(self):
    """Recursive prior update: condition the window information matrix
    on dropping the oldest configuration (batch.cc:352-384)."""
    nv, t_len = self.m.nv, self.cfg_len
    d1, o1, o2 = self.direct.hessian_band()
    h = _band_to_dense(d1, o1, o2)
    # Schur complement removing the first nv dims (ConditionMatrix)
    h00 = h[:nv, :nv] + 1e-8 * np.eye(nv)
    h10 = h[nv:, :nv]
    cond = h[nv:, nv:] - h10 @ np.linalg.solve(h00, h10.T)
    # shifted window: conditioned marginal for slots 0..T-2, fresh
    # scale_prior * I for the incoming configuration
    n = t_len * nv
    w = np.zeros((n, n), np.float32)
    w[:n - nv, :n - nv] = cond
    w[n - nv:, n - nv:] = self.prior_scale * np.eye(nv)
    self.direct.prior_band = _dense_to_band(w, t_len, nv)

  def update(self, ctrl, sensor):
    """Shift window, append measurement, re-optimize (batch.cc Update).

    One jitted program + one device transfer per filter step."""
    m = self.m
    h = float(m.opt.timestep)
    dt = self.dtype
    ld, l1, l2 = self.direct._band_args()
    qs, s_win, f_win, qvel_new, cost, it, status = jax.device_get(
        self._step(
            jnp.asarray(np.array(self.q_history), dt),
            jnp.asarray(self.qvel_est, dt),
            jnp.asarray(ctrl, dt),
            jnp.asarray(sensor, dt),
            jnp.asarray(np.array(self.sensor_history), dt),
            jnp.asarray(np.array(self.force_history), dt),
            jnp.asarray(self.direct.param_initial, dt),
            jnp.asarray(self.direct.weight_sensor, dt),
            jnp.asarray(self.direct.weight_force, dt),
            ld, l1, l2))

    # mirror the optimized window into the host-side history and the
    # Direct bookkeeping (hessian_band / service queries read these)
    for t in range(self.cfg_len):
      self.q_history[t] = np.asarray(qs[t])
      self.sensor_history[t] = np.asarray(s_win[t])
      self.force_history[t] = np.asarray(f_win[t])
    self.direct.qpos_initial = np.array(self.q_history)
    self.direct.sensor_measured = np.array(self.sensor_history)
    self.direct.force_measured = np.array(self.force_history)
    self.direct._prior_qpos = jnp.asarray(np.array(self.q_history), dt)
    self.direct.qpos_optimized = np.asarray(qs)
    self.direct.parameters = np.asarray(self.direct.param_initial)
    self.direct.cost = float(cost)
    self.direct.iterations = int(it)
    self.qvel_est = np.asarray(qvel_new)
    self.time += h

    if self.recursive_prior_update:
      self._prior_update()
    return self.state

  @property
  def state(self):
    act = np.zeros(self.m.na)
    return np.concatenate([self.q_history[-1], self.qvel_est, act])

  def set_state(self, state):
    nq, nv = self.m.nq, self.m.nv
    for t in range(self.cfg_len):
      self.q_history[t] = np.asarray(state[:nq]).copy()
    self.qvel_est = np.asarray(state[nq:nq + nv]).copy()
