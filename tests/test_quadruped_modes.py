"""Quadruped gait/mode machine tests.

Reference behavior: mjpc/tasks/quadruped/quadruped.cc — automatic gait
switching from filtered CoM speed (:255-282), per-gait parameter/weight
application (:284-296), the Walk trajectory dragging the goal mocap
(:300-341), the Flip weight save/restore + piecewise height/orientation
profiles (:344-390, :676-712), and mode-dependent residual terms.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.tasks import quadruped as Q


def _fwd_task():
  task = Q.QuadrupedFlat()
  d = task.make_data()
  d = F.forward(task.model, d)
  return task, d


def test_residual_finite_all_modes():
  task, d = _fwd_task()
  for mode in range(5):
    p = task.residual_params.at[Q.S_MODE].set(float(mode))
    r = task.residual(task.model, d, p)
    assert r.shape == (42,)
    assert bool(jnp.all(jnp.isfinite(r))), f"mode {mode}"


def test_gait_switch_applies_params_and_weights():
  """Manually selecting a gait applies kGaitParam duty/cadence/amplitude
  and balance/upright/height weights on the next transition."""
  task, d = _fwd_task()
  task.residual_params = task.residual_params.at[Q.P_GAIT_SWITCH].set(0.0)
  task.set_selection("Gait", Q.GAIT_GALLOP)
  d = task.transition(d)
  p = np.asarray(task.residual_params)
  assert p[Q.P_DUTY] == np.float32(Q.GAIT_PARAM[Q.GAIT_GALLOP][0])
  assert p[Q.P_CADENCE] == np.float32(Q.GAIT_PARAM[Q.GAIT_GALLOP][1])
  assert p[Q.P_AMPLITUDE] == np.float32(Q.GAIT_PARAM[Q.GAIT_GALLOP][2])
  w = task.cost_spec.weights
  names = task.cost_spec.term_names
  np.testing.assert_allclose(
      [float(w[names.index(n)]) for n in ("Balance", "Upright", "Height")],
      Q.GAIT_PARAM[Q.GAIT_GALLOP][3:6], rtol=1e-6)


def test_auto_gait_switch_speed_thresholds():
  """With auto-switch on, a fast filtered CoM speed selects gallop and a
  standstill selects stand (reference kGaitAuto thresholds)."""
  task, d = _fwd_task()
  task.residual_params = task.residual_params.at[Q.P_GAIT_SWITCH].set(1.0)
  # prime the transition clock, then force the filtered speed
  d = task.transition(d)
  task._gait_switch_time = -10.0
  task._com_vel = np.array([3.0, 0.0])
  d2 = d.replace(time=d.time + 0.01)
  task.transition(d2)
  assert int(np.asarray(task.residual_params)[Q.P_GAIT]) == Q.GAIT_GALLOP
  task._gait_switch_time = -10.0
  # near-standstill (strictly > 0: kGaitAuto[stand] = 0 is a strict
  # lower bound in the reference too)
  task._com_vel = np.array([0.01, 0.0])
  d3 = d.replace(time=d.time + 0.02)
  task.transition(d3)
  assert int(np.asarray(task.residual_params)[Q.P_GAIT]) == Q.GAIT_STAND


def test_phase_continuity_on_cadence_change():
  """Changing cadence re-anchors the phase clock so the gait phase is
  continuous (reference quadruped.cc:246-252)."""
  task, d = _fwd_task()
  d = task.transition(d)
  p0 = np.asarray(task.residual_params)
  t = float(d.time)
  phase_before = (p0[Q.S_PHASE_START] +
                  (t - p0[Q.S_PHASE_START_T]) * p0[Q.S_PHASE_VEL])
  task.residual_params = task.residual_params.at[Q.P_CADENCE].set(3.7)
  d = task.transition(d)
  p1 = np.asarray(task.residual_params)
  assert abs(p1[Q.S_PHASE_VEL] - 2 * np.pi * 3.7) < 1e-4
  phase_after = (p1[Q.S_PHASE_START] +
                 (t - p1[Q.S_PHASE_START_T]) * p1[Q.S_PHASE_VEL])
  assert abs(phase_after - phase_before) < 1e-3


def test_walk_mode_moves_goal():
  """Walk mode drags the goal mocap along the prescribed trajectory."""
  task, d = _fwd_task()
  d = task.transition(d)
  task.set_mode_by_name("Walk")
  task.residual_params = task.residual_params.at[Q.P_WALK_SPEED].set(1.0)
  d = task.transition(d)
  goal0 = np.asarray(jax.device_get(d.mocap_pos[0][:2]))
  d2 = d.replace(time=d.time + 1.0)
  d2 = task.transition(d2)
  goal1 = np.asarray(jax.device_get(d2.mocap_pos[0][:2]))
  moved = np.linalg.norm(goal1 - goal0)
  assert 0.5 < moved < 2.0, moved  # ~speed * dt


def test_walk_only_entered_from_quadruped():
  task, d = _fwd_task()
  d = task.transition(d)
  task.set_mode_by_name("Biped")
  d = task.transition(d)
  assert task.mode_name == "Biped"
  # Biped -> Walk is forbidden; transition falls back to Quadruped
  task.set_mode_by_name("Walk")
  d = task.transition(d)
  assert task.mode_name == "Quadruped"


def test_flip_profile_shapes():
  """FlipHeight/FlipQuat piecewise profiles: start at stand height and
  identity, peak near kMaxHeight, return to stand and 2*pi."""
  task, d = _fwd_task()
  total = task._jump_time + task._flight_time + task._land_time
  h0 = float(task._flip_height(jnp.asarray(0.0), 0.0))
  assert abs(h0 - Q.HEIGHT_QUADRUPED) < 1e-5
  ts = np.linspace(0, total, 60)
  hs = [float(task._flip_height(jnp.asarray(t), 0.0)) for t in ts]
  assert max(hs) > 0.75 * Q.MAX_HEIGHT
  assert abs(hs[-1] - Q.HEIGHT_QUADRUPED) < 0.05
  a0 = float(task._flip_angle(jnp.asarray(0.0)))
  a1 = float(task._flip_angle(jnp.asarray(total + 0.1)))
  assert abs(a0) < 1e-5 and abs(a1 - 2 * np.pi) < 1e-4
  # angle is monotone non-decreasing over the flip
  angs = [float(task._flip_angle(jnp.asarray(t))) for t in ts]
  assert all(b >= a - 1e-5 for a, b in zip(angs, angs[1:]))


def test_flip_saves_and_restores_weights():
  task, d = _fwd_task()
  d = task.transition(d)
  w_before = np.asarray(task.cost_spec.weights).copy()
  task.set_mode_by_name("Flip")
  d = task.transition(d)
  names = task.cost_spec.term_names
  assert float(task.cost_spec.weights[names.index("Height")]) == 5.0
  assert float(task.cost_spec.weights[names.index("Position")]) == 0.0
  # after the flip duration, weights are restored and mode returns
  total = task._jump_time + task._flight_time + task._land_time
  d2 = d.replace(time=d.time + total + 0.1)
  d2 = task.transition(d2)
  assert task.mode_name == "Quadruped"
  np.testing.assert_allclose(np.asarray(task.cost_spec.weights),
                             w_before, rtol=1e-6)


def test_biped_residual_targets_biped_height():
  """In Biped mode the height residual measures against kHeightBiped."""
  task, d = _fwd_task()
  p_quad = task.residual_params.at[Q.S_MODE].set(Q.MODE_QUADRUPED)
  p_biped = task.residual_params.at[Q.S_MODE].set(Q.MODE_BIPED)
  r_quad = task.residual(task.model, d, p_quad)
  r_biped = task.residual(task.model, d, p_biped)
  # height residual is row 3; standing quadruped is ~at quad height, so
  # the biped target (0.6) must show a ~0.35 larger error
  assert float(r_biped[3]) < float(r_quad[3]) - 0.3
