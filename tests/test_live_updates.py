"""Live cost-weight / task-parameter updates must not recompile planners.

Reference capability: mjpc GUI sliders and gRPC SetCostWeights /
SetTaskParameters mutate the live cost spec with zero planner disruption
(mjpc/agent.cc:353-448). Here cost_spec and residual_params are TRACED
arguments of every planner's jitted optimize, so updates are pure device
value swaps: same jit cache entry, warm nominal policy preserved.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.agent import agent as agent_lib
from mujoco_mpc_tpu.tasks import registry


def _cache_size(jitted) -> int:
  return jitted._cache_size()


def test_agent_weight_param_updates_no_recompile():
  task = registry.get_task("Cartpole")
  agent = agent_lib.Agent(task, planner="Sampling")
  agent.plan_iteration()
  planner_obj = agent.planner
  policy_before = np.asarray(agent.planner.policy.values)
  assert _cache_size(agent.planner._optimize) == 1

  agent.set_cost_weight("Vertical", 3.3)
  agent.set_task_parameter("Goal", 0.7)
  info = agent.plan_iteration()

  # same planner object, same compiled program, warm policy continued
  assert agent.planner is planner_obj
  assert _cache_size(agent.planner._optimize) == 1
  assert np.isfinite(float(info["best_return"]))
  assert agent.get_cost_weights()["Vertical"] == np.float32(3.3)
  assert agent.get_task_parameters()["Goal"] == np.float32(0.7)


def test_weight_update_changes_returns():
  """The traced weights actually flow into the scoring."""
  task = registry.get_task("Cartpole")
  agent = agent_lib.Agent(task, planner="Sampling")
  key = jax.random.PRNGKey(0)
  d0 = agent.data

  info_a = agent.planner._optimize(key, d0, agent.planner.policy,
                                   task.residual_params, task.cost_spec)[1]
  agent.set_cost_weight("Vertical", 0.0)
  info_b = agent.planner._optimize(key, d0, agent.planner.policy,
                                   task.residual_params, task.cost_spec)[1]
  # zeroing the dominant term must lower the nominal return
  assert float(info_b["nominal_return"]) < float(info_a["nominal_return"])
  assert _cache_size(agent.planner._optimize) == 1


def test_ilqg_and_gradient_thread_params():
  """Derivative planners pick up weight/param updates without rebuild
  (round-1 gap: gradient/iLQG baked residual_params, ADVICE.md)."""
  for name in ("Gradient", "iLQG"):
    task = registry.get_task("Cartpole")
    agent = agent_lib.Agent(task, planner=name)
    agent.plan_iteration()
    planner_obj = agent.planner
    n0 = _cache_size(agent.planner._optimize)
    agent.set_cost_weight("Velocity", 0.77)
    agent.set_task_parameter("Goal", -0.4)
    info = agent.plan_iteration()
    assert agent.planner is planner_obj, name
    assert _cache_size(agent.planner._optimize) == n0, name
    assert np.isfinite(float(info["best_return"])), name
