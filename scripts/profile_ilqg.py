"""Per-phase iLQG timing on the current backend (VERDICT r2 #2).

Times each phase of one iLQG iteration as a separately-jitted program
(best-of-N, pipelined within a trial): nominal feedback line search,
model derivatives, cost derivatives, backward pass, action line search.
Mirrors the reference's per-phase timers (ilqg/planner.cc:609-614).

Usage: python scripts/profile_ilqg.py [Swimmer|Walker] [horizon]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
# NOTE: do NOT use PYTHONPATH=/root/repo for TPU runs — it breaks the
# axon plugin registration in this environment; sys.path works.

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.planners import derivatives as deriv
from mujoco_mpc_tpu.planners import ilqg as ilqg_lib
from mujoco_mpc_tpu.tasks import registry


def timeit(fn, *args, iters=20, trials=3):
  out = fn(*args)  # compile
  jax.block_until_ready(out)
  best = float("inf")
  for _ in range(trials):
    t0 = time.perf_counter()
    for _ in range(iters):
      out = fn(*args)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / iters)
  return best, out


def main():
  name = sys.argv[1] if len(sys.argv) > 1 else "Swimmer"
  task = registry.get_task(name)
  config = ilqg_lib.make_config(task)
  if len(sys.argv) > 2:
    config = config.replace(horizon=int(sys.argv[2]))
  skip_env = int(os.environ.get("ILQG_SKIP", "1"))
  if skip_env > 1:
    config = config.replace(derivative_skip=skip_env)
  m = getattr(task, "plan_model", task.model)
  horizon = config.horizon
  d0 = task.make_data()
  policy = ilqg_lib.initial_policy(m, config, d0)
  template = F.forward(m, d0)
  dtype = policy.actions.dtype
  rf = lambda mm, dd: task.residual(mm, dd, task.residual_params)
  cs = task.cost_spec
  skip = int(os.environ.get("ILQG_SKIP", "1"))

  # run one full iteration first so states/actions are realistic
  planner = ilqg_lib.ILQGPlanner(task, config)
  key = jax.random.PRNGKey(0)
  t_full, _ = timeit(lambda: planner.optimize(key, d0), iters=10)
  states = planner.policy.states
  actions = planner.policy.actions
  times = planner.policy.times

  results = {"task": name, "horizon": horizon,
             "full_iteration_ms": round(1e3 * t_full, 2)}

  md = jax.jit(lambda s, a, t: deriv.model_derivatives(
      m, template, s, a, t, skip=skip))
  t_md, (a_, b_) = timeit(md, states[:-1], actions[:-1], times[:-1])
  results["model_derivatives_ms"] = round(1e3 * t_md, 2)

  cd = jax.jit(lambda s, a, t: deriv.cost_derivatives(
      m, template, rf, cs, s, a, t))
  t_cd, (cx, cu, cxx, cxu, cuu) = timeit(cd, states, actions, times)
  results["cost_derivatives_ms"] = round(1e3 * t_cd, 2)

  lo = m.actuator_ctrlrange[:, 0][None] - actions[:-1]
  hi = m.actuator_ctrlrange[:, 1][None] - actions[:-1]
  bp = jax.jit(lambda *xs: ilqg_lib.backward_pass(
      *xs, config.boxqp_iters, config.reg_type))
  t_bp, (ks, kmats, dv, ok) = timeit(
      bp, a_, b_, cx, cu, cxx, cxu, cuu, lo, hi, policy.reg)
  results["backward_pass_ms"] = round(1e3 * t_bp, 2)

  # fused sweep (what the optimize fn actually runs)
  fd = jax.jit(lambda s, a, t: deriv.trajectory_derivatives(
      m, template, rf, cs, s, a, t, skip=skip))
  t_fd, _ = timeit(fd, states, actions, times)
  results["fused_derivatives_ms"] = round(1e3 * t_fd, 2)

  # backward pass unroll sensitivity
  for unroll in (16, min(horizon - 1, 64)):
    bpu = jax.jit(functools.partial(
        ilqg_lib.backward_pass, boxqp_iters=config.boxqp_iters,
        reg_type=config.reg_type, unroll=unroll))
    t_u, _ = timeit(bpu, a_, b_, cx, cu, cxx, cxu, cuu, lo, hi, policy.reg)
    results[f"backward_pass_u{unroll}_ms"] = round(1e3 * t_u, 2)

  # lane line-search rollouts standalone (the two batch_rollouts calls)
  lane_spec = planner._lane_spec(task, None)
  if lane_spec is not None:
    lane_fb = ilqg_lib._make_lane_feedback(
        m, lane_spec, horizon,
        interpret=jax.devices()[0].platform != "tpu")
    d0f = F.forward(m, d0)
    dtype = actions.dtype
    zero_k = jnp.zeros_like(actions[:-1])
    for label, kc in (("nominal", config.num_fb_scales),
                      ("action", config.num_alphas)):
      fn = jax.jit(lambda al, sc: lane_fb(
          d0f, states, actions, zero_k, kmats, al, sc,
          task.residual_params, cs))
      t_l, _ = timeit(fn, jnp.zeros((kc,), dtype), jnp.ones((kc,), dtype))
      results[f"lane_{label}_ls_ms"] = round(1e3 * t_l, 2)

  known = (results["fused_derivatives_ms"]
           + results["backward_pass_ms"]
           + results.get("lane_nominal_ls_ms", 0)
           + results.get("lane_action_ls_ms", 0))
  results["rest_ms"] = round(results["full_iteration_ms"] - known, 2)
  results["skip"] = skip
  print(json.dumps(results), flush=True)


if __name__ == "__main__":
  main()
