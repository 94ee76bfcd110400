"""Cartpole swing-up demo over the gRPC API.

Parity with the reference demo (python/mujoco_mpc/demos/agent/cartpole.py):
spawn the agent server, run the synchronous plan/act loop through the
client, and print the cost trace.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mujoco_mpc_tpu.grpc.agent_client import Agent


def main():
  with Agent(task_id="Cartpole") as agent:
    # start hanging down
    agent.set_state(qpos=[0.0, 3.141592], qvel=[0.0, 0.0])

    costs = []
    for step in range(300):
      agent.planner_step()
      agent.step()
      costs.append(agent.get_total_cost())
      if step % 50 == 49:
        print(f"step {step + 1}: cost {costs[-1]:.4f}")

    state = agent.get_state()
    print(f"final pole angle cos: {np.cos(state.qpos[1]):.3f} "
          f"(1.0 = upright)")
    print(f"mean cost first 50: {np.mean(costs[:50]):.3f}, "
          f"last 50: {np.mean(costs[-50:]):.3f}")


if __name__ == "__main__":
  main()
