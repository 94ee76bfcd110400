"""Planner package: common interface + GUI-ordered registry.

Reference: mjpc/planners/planner.h (Planner / RankedPlanner),
mjpc/planners/include.cc (LoadPlanners order).
"""

from mujoco_mpc_tpu.planners.base import (PLANNER_NAMES, Planner, is_ranked,
                                          make_planner)

__all__ = ["PLANNER_NAMES", "Planner", "is_ranked", "make_planner"]
