"""Compile + run the LaneSamplingPlanner on TPU for the round-2 lane
tasks (one process, sequential — the tunnel dislikes concurrency).

Usage: python scripts/probe_new_lane_tasks.py [task ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import sampling_lane
from mujoco_mpc_tpu.physics import forward as F
from mujoco_mpc_tpu.tasks import registry

TASKS = sys.argv[1:] or [
    "Quadrotor", "OP3", "Panda", "PickAndPlace", "FreeFingers",
    "Hand Reorient", "Bimanual Handover", "Bimanual Insert",
    "Bimanual Reorient", "Humanoid Interact",
]

for name in TASKS:
  task = registry.get_task(name)
  if name == "Humanoid Interact":
    # lane path covers the stand-family modes
    import numpy as np
    from mujoco_mpc_tpu.tasks import interact
    p = np.asarray(jax.device_get(task.residual_params)).copy()
    p[interact.S_MODE] = interact.MODE_STAND
    task.residual_params = jnp.asarray(p, jnp.float32)
    task.mode = interact.MODE_STAND
  t0 = time.time()
  try:
    planner = sampling_lane.LaneSamplingPlanner(task)
    d0 = F.forward(task.model, task.make_data())
    key = jax.random.PRNGKey(0)
    info = planner.optimize(key, d0)
    jax.block_until_ready(info["best_return"])
    compile_s = time.time() - t0
    # steady-state: chain a few iterations, block once
    t1 = time.time()
    n = 5
    for i in range(n):
      info = planner.optimize(jax.random.PRNGKey(i + 1), d0)
    jax.block_until_ready(info["best_return"])
    per_iter_ms = (time.time() - t1) / n * 1e3
    print(f"{name:20s} OK  best_return={float(info['best_return']):10.4f}"
          f"  compile={compile_s:6.1f}s  iter={per_iter_ms:7.2f} ms"
          f"  K={planner.config.num_trajectory}"
          f" H={planner.config.horizon}", flush=True)
  except Exception as e:
    print(f"{name:20s} FAIL {type(e).__name__}: {e}", flush=True)
