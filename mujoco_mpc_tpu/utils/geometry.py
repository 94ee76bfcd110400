"""2D convex-hull / support-polygon geometry utilities.

Reference capability: mjpc/utilities.h:275 (Hull2D), utilities.cc:866
(NearestInHull) — used by the quadruped task to draw the foot support
polygon and the capture point projected onto it
(tasks/quadruped/quadruped.cc:466-512). Host-side numpy (these feed
diagnostics / GUI-style overlays, not the jitted planning path).
"""

from __future__ import annotations

import numpy as np


def hull2d(points: np.ndarray) -> np.ndarray:
  """Indices of the convex hull of 2D `points` (N, 2), counter-clockwise.

  Degenerate inputs follow the reference's conventions: 1 point -> [0],
  2 points -> [0, 1]; collinear interior points are dropped.
  """
  pts = np.asarray(points, dtype=np.float64)
  n = len(pts)
  if n == 0:
    return np.zeros((0,), dtype=np.int64)
  if n == 1:
    return np.array([0], dtype=np.int64)
  if n == 2:
    return np.array([0, 1], dtype=np.int64)

  # Andrew's monotone chain: sort by (x, y), build lower + upper chains.
  order = np.lexsort((pts[:, 1], pts[:, 0]))

  def _chain(idx):
    out = []
    for i in idx:
      while len(out) >= 2:
        o, a = pts[out[-2]], pts[out[-1]]
        cross = ((a[0] - o[0]) * (pts[i][1] - o[1])
                 - (a[1] - o[1]) * (pts[i][0] - o[0]))
        if cross <= 0:  # clockwise or collinear: drop
          out.pop()
        else:
          break
      out.append(i)
    return out

  lower = _chain(order)
  upper = _chain(order[::-1])
  hull = lower[:-1] + upper[:-1]
  if not hull:  # all points collinear: keep the two extremes
    hull = [order[0], order[-1]]
  return np.asarray(hull, dtype=np.int64)


def _project_to_segment(q, a, b):
  ab = b - a
  denom = float(ab @ ab)
  if denom <= 0.0:
    return a
  t = float(np.clip((q - a) @ ab / denom, 0.0, 1.0))
  return a + t * ab


def point_in_hull(query, points, hull) -> bool:
  """True if 2D `query` lies inside (or on) the CCW hull polygon."""
  pts = np.asarray(points, dtype=np.float64)
  q = np.asarray(query, dtype=np.float64)
  m = len(hull)
  if m < 3:
    return False
  for i in range(m):
    v0 = pts[hull[i]]
    v1 = pts[hull[(i + 1) % m]]
    e = v1 - v0
    n_in = np.array([-e[1], e[0]])  # inward normal for a CCW polygon
    if (q - v0) @ n_in < 0:
      return False
  return True


def nearest_in_hull(query, points, hull) -> np.ndarray:
  """Nearest point to `query` inside the hull polygon (the query itself
  when it is already inside). Matches NearestInHull (utilities.cc:866)."""
  pts = np.asarray(points, dtype=np.float64)
  q = np.asarray(query, dtype=np.float64)
  m = len(hull)
  if m == 0:
    return q.copy()
  if m == 1:
    return pts[hull[0]].copy()
  best = None
  best_d = np.inf
  outside = False
  for i in range(m):
    v0 = pts[hull[i]]
    v1 = pts[hull[(i + 1) % m]]
    e = v1 - v0
    n_in = np.array([-e[1], e[0]])
    if (q - v0) @ n_in < 0:  # violated edge: project onto it
      outside = True
      p = _project_to_segment(q, v0, v1)
      d = float((p - q) @ (p - q))
      if d < best_d:
        best, best_d = p, d
  if m == 2:  # degenerate segment "hull": always project
    return _project_to_segment(q, pts[hull[0]], pts[hull[1]])
  return q.copy() if not outside else best
