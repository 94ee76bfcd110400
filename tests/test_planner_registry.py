"""Planner interface/registry tests (planner.h:32-102, include.cc:40-53)."""

import jax
import pytest

pytestmark = pytest.mark.smoke

from mujoco_mpc_tpu import planners
from mujoco_mpc_tpu.physics import forward
from mujoco_mpc_tpu.tasks import registry


def test_gui_order_matches_reference():
  # planners/include.cc:40-53 registration order = GUI ids
  assert planners.PLANNER_NAMES == [
      "Sampling", "Gradient", "iLQG", "iLQS", "Robust Sampling",
      "Cross Entropy", "Sample Gradient"]


def test_unknown_planner_raises():
  task = registry.get_task("Particle")
  with pytest.raises(ValueError, match="unknown planner"):
    planners.make_planner(task, "Nope")


@pytest.mark.parametrize("name", planners.PLANNER_NAMES)
def test_make_planner_conforms(name):
  task = registry.get_task("ParticleFixed")
  p = planners.make_planner(task, name)
  assert isinstance(p, planners.Planner)  # runtime-checkable protocol
  d0 = forward.forward(task.model, task.make_data())
  info = p.optimize(jax.random.PRNGKey(0), d0)
  assert "best_return" in info
  assert p.last_info is info
  u = p.action(d0.time)
  assert u.shape == (int(task.model.nu),)
  # ranked contract: sampling-family planners publish per-candidate
  # returns with candidate 0 = nominal (planner.h:84-102 analog)
  if name in ("Sampling", "Robust Sampling", "Cross Entropy",
              "Sample Gradient"):
    assert planners.is_ranked(p)
    assert info["returns"].ndim == 1
