"""Tests for utils/geometry.py (Hull2D / NearestInHull parity,
reference mjpc/utilities.cc:807-902, mjpc/test/agent/utilities_test.cc)."""

import numpy as np

from mujoco_mpc_tpu.utils import geometry
import pytest



@pytest.mark.smoke
def test_hull_square_with_interior_points():
  pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                  [0.5, 0.5], [0.25, 0.75]])
  hull = geometry.hull2d(pts)
  assert sorted(hull.tolist()) == [0, 1, 2, 3]
  # counter-clockwise: positive signed area
  poly = pts[hull]
  area = 0.5 * np.sum(poly[:, 0] * np.roll(poly[:, 1], -1)
                      - np.roll(poly[:, 0], -1) * poly[:, 1])
  assert area > 0


@pytest.mark.smoke
def test_hull_degenerate():
  assert geometry.hull2d(np.zeros((0, 2))).tolist() == []
  assert geometry.hull2d(np.array([[1.0, 2.0]])).tolist() == [0]
  assert geometry.hull2d(np.array([[0, 0], [1, 1.0]])).tolist() == [0, 1]
  # collinear: extremes only
  col = geometry.hull2d(np.array([[0, 0], [1, 1], [2, 2], [3, 3.0]]))
  assert set(col.tolist()) == {0, 3}


@pytest.mark.smoke
def test_hull_random_matches_bruteforce():
  rng = np.random.default_rng(0)
  for _ in range(20):
    pts = rng.normal(size=(12, 2))
    hull = geometry.hull2d(pts)
    # every input point must be inside (or on) the hull
    for p in pts:
      q = geometry.nearest_in_hull(p, pts, hull)
      assert np.linalg.norm(q - p) < 1e-9


@pytest.mark.smoke
def test_nearest_in_hull_inside_and_outside():
  pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
  hull = geometry.hull2d(pts)
  inside = np.array([1.0, 1.0])
  np.testing.assert_allclose(
      geometry.nearest_in_hull(inside, pts, hull), inside)
  assert geometry.point_in_hull(inside, pts, hull)
  # outside right edge: projects onto x=2
  out = np.array([3.0, 1.0])
  np.testing.assert_allclose(
      geometry.nearest_in_hull(out, pts, hull), [2.0, 1.0])
  assert not geometry.point_in_hull(out, pts, hull)
  # outside a corner: projects onto the vertex
  np.testing.assert_allclose(
      geometry.nearest_in_hull(np.array([3.0, 3.0]), pts, hull),
      [2.0, 2.0])


def test_quadruped_support_polygon_diagnostic():
  import jax
  from mujoco_mpc_tpu.physics import forward
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Quadruped Flat")
  d = forward.forward(task.model, task.make_data())
  info = task.support_polygon(d)
  assert info["foot_xy"].shape == (4, 2)
  assert 3 <= len(info["hull"]) <= 4
  # standing at home: capture point starts inside the support polygon
  assert info["inside"]
  np.testing.assert_allclose(info["projected_capture"], info["capture"])
