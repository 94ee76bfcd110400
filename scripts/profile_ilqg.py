"""Phase-level iLQG latency breakdown on the current backend.

Times each optimize() phase as its own jitted program (pipelined
steady-state, bench.py protocol) so the <10 ms budget work can see
where the milliseconds go: nominal feedback rollouts, fused
trajectory derivatives, backward Riccati/boxQP, action line search.

Run: python -c "import sys; sys.path.insert(0,'/root/repo');
import runpy; runpy.run_path('/root/repo/scripts/profile_ilqg.py',
run_name='__main__')"
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mujoco_mpc_tpu.planners import derivatives as deriv
from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.tasks import registry


def timeit(fn, *args, iters=20):
  out = fn(*args)
  jax.block_until_ready(out)
  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(iters):
      out = fn(*args)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / iters)
  return 1e3 * best


def profile(name, horizon):
  task = registry.get_task(name)
  config = ilqg_lib.make_config(task).replace(horizon=horizon)
  planner = ilqg_lib.ILQGPlanner(task, config)
  d0 = task.make_data()
  key = jax.random.PRNGKey(0)
  # one full optimize to get a realistic policy
  planner.optimize(key, d0)
  policy = planner.policy
  m = planner.m
  rf = lambda mm, dd: task.residual(mm, dd, task.residual_params)
  cs = task.cost_spec
  template = F.forward(m, d0)
  dtype = policy.actions.dtype

  full_ms = timeit(lambda: planner._optimize(
      key, d0, policy, task.residual_params, cs)[0].actions)

  # phase 2: fused trajectory derivatives
  times = template.time + m.opt.timestep * jnp.arange(horizon, dtype=dtype)
  deriv_fn = jax.jit(lambda s, a: deriv.trajectory_derivatives(
      m, template, rf, cs, s, a, times, skip=config.derivative_skip))
  deriv_ms = timeit(deriv_fn, policy.states, policy.actions)

  # phase 3: backward pass (single sweep, no retry loop)
  a, b, cx, cu, cxx, cxu, cuu = deriv_fn(policy.states, policy.actions)
  lo = m.actuator_ctrlrange[:, 0][None] - policy.actions[:-1]
  hi = m.actuator_ctrlrange[:, 1][None] - policy.actions[:-1]
  bp_fn = jax.jit(lambda: ilqg_lib.backward_pass(
      a, b, cx, cu, cxx, cxu, cuu, lo, hi, policy.reg,
      config.boxqp_iters, config.reg_type))
  bp_ms = timeit(lambda: bp_fn()[0])

  print(json.dumps({
      "config": name, "horizon": horizon,
      "full_ms": round(full_ms, 2),
      "deriv_ms": round(deriv_ms, 2),
      "backward_ms": round(bp_ms, 2),
      "rollout_phases_ms (full - deriv - backward)":
          round(full_ms - deriv_ms - bp_ms, 2),
  }), flush=True)


if __name__ == "__main__":
  profile("Swimmer", 40)
  profile("Walker", 32)
