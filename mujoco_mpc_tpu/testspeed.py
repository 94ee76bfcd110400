"""Headless synchronous planning benchmark (reference: mjpc/testspeed.{h,cc}).

Runs the plan/act loop for `total_time` simulated seconds, planning every
`steps_per_planning_iteration` physics steps, and reports total wall time,
realtime factor, and average cost per step (testspeed.cc:44-129 output
semantics). Usage:

    python -m mujoco_mpc_tpu.testspeed --task "Cartpole" --total_time 10
"""

from __future__ import annotations

import argparse
import time


def run(task_name: str, total_time: float = 10.0,
        steps_per_planning_iteration: int = 4, planner: str = None,
        verbose: bool = True):
  import numpy as np

  from mujoco_mpc_tpu.agent.agent import Agent
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task(task_name)
  agent = Agent(task, planner=planner)

  # warm up compilation outside the timed region
  agent.plan_iteration()
  agent.step_env()
  agent.reset()

  start = time.perf_counter()
  out = agent.run(total_time=total_time,
                  steps_per_plan=steps_per_planning_iteration)
  wall = time.perf_counter() - start

  result = {
      "task": task_name,
      "planner": agent.planner_name,
      "total_time": total_time,
      "wall_time": wall,
      "realtime_factor": total_time / wall,
      "avg_cost": out["avg_cost"],
      "plan_time_p50": float(np.median(out["plan_times"]))
      if len(out["plan_times"]) else 0.0,
  }
  if verbose:
    print(f"task: {result['task']}  planner: {result['planner']}")
    print(f"simulated {total_time:.1f} s in {wall:.2f} s wall "
          f"({result['realtime_factor']:.2f} x realtime)")
    print(f"average cost per step: {result['avg_cost']:.4f}")
    print(f"p50 planning latency: {result['plan_time_p50'] * 1e3:.2f} ms")
  return result


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--task", default="Cartpole")
  p.add_argument("--planner", default=None)
  p.add_argument("--total_time", type=float, default=10.0)
  p.add_argument("--steps_per_planning_iteration", type=int, default=4)
  args = p.parse_args()
  run(args.task, args.total_time, args.steps_per_planning_iteration,
      args.planner)


if __name__ == "__main__":
  main()
