"""Common planner interface + registry.

Reference capability: mjpc/planners/planner.h:32-102 (Planner virtual
interface; RankedPlanner multi-candidate extension) and
mjpc/planners/include.cc:40-53 (LoadPlanners, GUI id order).

TPU design note on RankedPlanner: the reference's robust meta-planner
calls a *virtual* delegate per candidate (OptimizePolicyCandidates /
CandidateScore). Virtual dispatch across jit boundaries would split the
planner into several device programs with host round-trips between them,
so here the ranked-candidate contract is a *data* contract instead: any
planner whose `optimize()` info dict carries `returns` (per-candidate
scores, candidate 0 = nominal) is "ranked", and the robust planner fuses
candidate generation + top-N re-rollout into ONE jitted program
(planners/robust.py). Same capability, one device program.
"""

from __future__ import annotations

from typing import Any, Dict, Protocol, Tuple, runtime_checkable


@runtime_checkable
class Planner(Protocol):
  """What every planner wrapper exposes to the Agent / gRPC layer.

  Mirrors planner.h:32-80: OptimizePolicy -> optimize, ActionFromPolicy
  -> action, Reset -> fresh construction (planners here are cheap
  stateless wrappers around a jitted optimize fn; the mutable state is
  the policy pytree they carry).
  """

  def optimize(self, key, d0) -> Dict[str, Any]:
    """Run one planner iteration from state `d0`; returns the info dict
    (per-candidate `returns` when ranked, timers, improvement...)."""
    ...

  def action(self, time) -> Any:
    """Sample the current policy at `time` (feedback planners accept an
    optional `state=` for time-indexed gains, ilqg/policy.cc:82-140)."""
    ...


def is_ranked(planner) -> bool:
  """True if the planner publishes per-candidate scores (the
  RankedPlanner contract, planner.h:84-102) via info['returns']."""
  info = getattr(planner, "last_info", None)
  if info is not None and "returns" in info:
    return True
  return getattr(planner, "ranked", False)


# GUI id order (planners/include.cc:40-53); index = `agent_planner`
# custom numeric in task XMLs.
PLANNER_NAMES = ["Sampling", "Gradient", "iLQG", "iLQS", "Robust Sampling",
                 "Cross Entropy", "Sample Gradient"]


def make_planner(task, name: str):
  """LoadPlanners analog: construct the named planner for `task`.

  Accepts GUI names and a few aliases ("Predictive Sampling",
  "Sampling Lane" = explicit Pallas fast-path opt-in).
  """
  if name in ("Sampling Lane", "Predictive Sampling Lane"):
    from mujoco_mpc_tpu.ops import sampling_lane
    return sampling_lane.LaneSamplingPlanner(task)
  if name in ("Sampling", "Predictive Sampling"):
    from mujoco_mpc_tpu.planners import sampling
    return sampling.SamplingPlanner(task)
  if name == "Cross Entropy":
    from mujoco_mpc_tpu.planners import cross_entropy
    return cross_entropy.CrossEntropyPlanner(task)
  if name == "Gradient":
    from mujoco_mpc_tpu.planners import gradient
    return gradient.GradientPlanner(task)
  if name == "iLQG":
    from mujoco_mpc_tpu.planners import ilqg
    return ilqg.ILQGPlanner(task)
  if name == "iLQS":
    from mujoco_mpc_tpu.planners import ilqs
    return ilqs.ILQSPlanner(task)
  if name == "Robust Sampling":
    from mujoco_mpc_tpu.planners import robust
    return robust.RobustPlanner(task)
  if name == "Sample Gradient":
    from mujoco_mpc_tpu.planners import sample_gradient
    return sample_gradient.SampleGradientPlanner(task)
  raise ValueError(
      f"unknown planner {name!r}; available: {PLANNER_NAMES}")
