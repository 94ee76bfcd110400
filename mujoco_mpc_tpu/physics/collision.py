"""Static collision-pair enumeration + narrowphase geom collisions.

TPU-first design: instead of a dynamic broadphase (as C MuJoCo does), we
enumerate every potentially-colliding geom pair ONCE at model-build time on
the host, group pairs by (type1, type2), and evaluate ALL of them every step
with distance masking. This gives fully static shapes — the only thing XLA
needs — and the per-pair math vectorizes over both the pair axis and the
vmapped candidate-rollout axis.

MuJoCo pair-selection rules implemented (cf. MuJoCo docs "Collision"):
  * contype/conaffinity bitmask compatibility,
  * geoms on the same body never collide,
  * geoms on parent/child bodies never collide (unless parent is world),
  * <exclude> body pairs removed, explicit <pair> entries added with their
    own condim/friction/solref/solimp.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# geom type ids (mjtGeom)
PLANE = 0
HFIELD = 1
SPHERE = 2
CAPSULE = 3
ELLIPSOID = 4
CYLINDER = 5
BOX = 6
MESH = 7

# narrowphase functions we support, keyed by (type1, type2) with type1<=type2
# (number of candidate contact points per pair)
SUPPORTED_PAIRS = {
    (PLANE, SPHERE): 1,
    (PLANE, CAPSULE): 2,
    (PLANE, ELLIPSOID): 1,
    (PLANE, CYLINDER): 3,
    (PLANE, BOX): 4,
    (SPHERE, SPHERE): 1,
    (SPHERE, CAPSULE): 1,
    (SPHERE, ELLIPSOID): 1,
    (SPHERE, CYLINDER): 1,
    (SPHERE, BOX): 1,
    (CAPSULE, CAPSULE): 1,
    (CAPSULE, BOX): 2,
    (CAPSULE, ELLIPSOID): 1,
    (BOX, BOX): 8,
}


@dataclasses.dataclass(frozen=True)
class PairGroup:
  """All candidate pairs sharing one (type1, type2) narrowphase function."""
  types: tuple  # (type1, type2)
  geom1: np.ndarray  # (npair,)
  geom2: np.ndarray  # (npair,)
  ncon_per_pair: int

  @property
  def count(self) -> int:
    return len(self.geom1)


@dataclasses.dataclass(frozen=True)
class CollisionPairs:
  groups: tuple  # tuple[PairGroup, ...]
  ncon: int      # total candidate contact count (static)


def _mix_params(mjm, g1: int, g2: int):
  """Solver parameter mixing for a dynamic pair (mj_collideGeoms rules)."""
  p1, p2 = mjm.geom_priority[g1], mjm.geom_priority[g2]
  if p1 > p2:
    return (mjm.geom_solref[g1].copy(), mjm.geom_solimp[g1].copy(),
            mjm.geom_friction[g1].copy(), int(mjm.geom_condim[g1]))
  if p2 > p1:
    return (mjm.geom_solref[g2].copy(), mjm.geom_solimp[g2].copy(),
            mjm.geom_friction[g2].copy(), int(mjm.geom_condim[g2]))
  mix = mjm.geom_solmix[g1] / max(mjm.geom_solmix[g1] + mjm.geom_solmix[g2],
                                  1e-15)
  if mjm.geom_solmix[g1] < 1e-15 and mjm.geom_solmix[g2] < 1e-15:
    mix = 0.5
  elif mjm.geom_solmix[g1] < 1e-15:
    mix = 0.0
  elif mjm.geom_solmix[g2] < 1e-15:
    mix = 1.0
  solref = np.where(
      np.logical_and(mjm.geom_solref[g1] > 0, mjm.geom_solref[g2] > 0),
      mix * mjm.geom_solref[g1] + (1 - mix) * mjm.geom_solref[g2],
      np.minimum(mjm.geom_solref[g1], mjm.geom_solref[g2]))
  solimp = mix * mjm.geom_solimp[g1] + (1 - mix) * mjm.geom_solimp[g2]
  friction = np.maximum(mjm.geom_friction[g1], mjm.geom_friction[g2])
  condim = max(int(mjm.geom_condim[g1]), int(mjm.geom_condim[g2]))
  return solref, solimp, friction, condim


def make_collision_pairs(mjm) -> CollisionPairs:
  """Enumerate static candidate pairs from a mujoco.MjModel."""
  ngeom = mjm.ngeom
  pairs: dict = {}
  pair_meta: dict = {}

  # excluded body pairs
  excluded = set()
  for i in range(mjm.nexclude):
    sig = int(mjm.exclude_signature[i])
    excluded.add((sig >> 16, sig & 0xFFFF))

  def body_pair_ok(b1: int, b2: int) -> bool:
    if b1 == b2:
      return False
    if (b1, b2) in excluded or (b2, b1) in excluded:
      return False
    # parent-child exclusion (weld-aware: use weldid chain parents)
    w1, w2 = mjm.body_weldid[b1], mjm.body_weldid[b2]
    if w1 == w2:
      return False
    p1 = mjm.body_weldid[mjm.body_parentid[w1]]
    p2 = mjm.body_weldid[mjm.body_parentid[w2]]
    if (p1 == w2 and w2 != 0) or (p2 == w1 and w1 != 0):
      return False
    return True

  def add(g1: int, g2: int):
    t1, t2 = int(mjm.geom_type[g1]), int(mjm.geom_type[g2])
    if t1 > t2:
      g1, g2, t1, t2 = g2, g1, t2, t1
    if (t1, t2) not in SUPPORTED_PAIRS:
      return
    key = (t1, t2)
    pairs.setdefault(key, []).append((g1, g2))

  # dynamic pairs by contype/conaffinity
  for g1 in range(ngeom):
    for g2 in range(g1 + 1, ngeom):
      b1, b2 = int(mjm.geom_bodyid[g1]), int(mjm.geom_bodyid[g2])
      if not body_pair_ok(b1, b2):
        continue
      c1 = (mjm.geom_contype[g1] & mjm.geom_conaffinity[g2])
      c2 = (mjm.geom_contype[g2] & mjm.geom_conaffinity[g1])
      if not (c1 or c2):
        continue
      add(g1, g2)

  # explicit <pair> entries
  for i in range(mjm.npair):
    add(int(mjm.pair_geom1[i]), int(mjm.pair_geom2[i]))

  groups = []
  total = 0
  for (t1, t2), plist in sorted(pairs.items()):
    plist = sorted(set(plist))
    g = PairGroup(
        types=(t1, t2),
        geom1=np.array([p[0] for p in plist], dtype=np.int32),
        geom2=np.array([p[1] for p in plist], dtype=np.int32),
        ncon_per_pair=SUPPORTED_PAIRS[(t1, t2)],
    )
    groups.append(g)
    total += g.count * g.ncon_per_pair
  return CollisionPairs(groups=tuple(groups), ncon=total)
