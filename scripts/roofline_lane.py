"""Roofline statement for the flagship lane kernel (VERDICT r4 #9).

On the real chip this measures:
  1. the VPU elementwise CEILING at the kernel's own tile shape — a
     fused multiply-add chain in a Pallas kernel on (32, 128) f32 tiles
     (the cost-sum kernel's folded component shape at KB=4096), the
     scripts/probe_layout.py method, counted at 3 FLOPs per element per
     chain step (2 mul + 1 add);
  2. the flagship scoring kernel's SUSTAINED FLOP/s: a conservative
     static FLOP count of one rollout (walked from the jaxpr of the
     very step math the kernel runs — step_array traces the same
     step_body the Pallas kernel executes — times the horizon) divided
     by the measured kernel wall time;
  3. the HBM boundary traffic (inputs + outputs per call) / time,
     against the ~819 GB/s v5e HBM bandwidth.

utilization = sustained / ceiling. The FLOP count is conservative
(transcendentals counted as 1, selects/compares/copies as 0), so the
printed utilization UNDERSTATES the true VPU issue occupancy.

Publish the numbers in docs/BASELINE_PROTOCOL.md "Roofline".
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mujoco_mpc_tpu.ops import step_lane
from mujoco_mpc_tpu.physics import collision as coll
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry

# primitive -> flops per output element (None: special-cased)
_ONE = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "sqrt", "rsqrt", "exp", "log", "log1p", "tanh", "sin", "cos",
    "pow", "integer_pow", "atan2", "floor", "ceil", "round", "rem",
    "logistic", "erf", "cbrt", "square", "reciprocal", "clamp",
}
_ZERO = {
    "select_n", "eq", "ne", "lt", "le", "gt", "ge", "and", "or", "not",
    "xor", "convert_element_type", "broadcast_in_dim", "reshape",
    "squeeze", "transpose", "slice", "dynamic_slice",
    "dynamic_update_slice", "concatenate", "pad", "iota", "copy",
    "stop_gradient", "is_finite", "reduce_and", "reduce_or", "gather",
    "scatter", "rev", "split", "constant", "device_put",
}


def jaxpr_flops(jaxpr) -> int:
  """Conservative elementwise FLOP count of a (closed) jaxpr."""
  total = 0
  for eq in jaxpr.eqns:
    # recurse into sub-jaxprs (pjit/cond/scan/while/pallas bodies)
    for v in eq.params.values():
      if hasattr(v, "jaxpr"):          # ClosedJaxpr
        total += jaxpr_flops(v.jaxpr)
      elif isinstance(v, (list, tuple)):
        for w in v:
          if hasattr(w, "jaxpr"):
            total += jaxpr_flops(w.jaxpr)
    name = eq.primitive.name
    if name in _ONE:
      total += int(np.prod(eq.outvars[0].aval.shape, dtype=np.int64))
    elif name in ("reduce_sum", "reduce_max", "reduce_min",
                  "reduce_prod", "cumsum", "argmax", "argmin"):
      total += int(np.prod(eq.invars[0].aval.shape, dtype=np.int64))
    elif name == "dot_general":
      a = eq.invars[0].aval.shape
      o = eq.outvars[0].aval.shape
      ((lc, _), _) = eq.params["dimension_numbers"]
      kdim = int(np.prod([a[i] for i in lc], dtype=np.int64))
      total += 2 * kdim * int(np.prod(o, dtype=np.int64))
    # everything else: counted as 0 (conservative)
  return total


def measure_ceiling(shape=(512, 128), n_ops=20000, reps=5):
  """VPU fma-chain ceiling. The workload is sized so ONE kernel call
  runs for multiple ms — host dispatch + tunnel RTT (hundreds of us per
  call on the shared axon tunnel) must be amortized or the 'ceiling'
  measures launch latency, not the VPU."""
  def kernel(x_ref, o_ref):
    x = x_ref[...]
    y = x
    for _ in range(n_ops):
      y = y * 1.000001 + 0.0000001 * x
    o_ref[...] = y

  x = jnp.ones(shape, jnp.float32)
  f = jax.jit(lambda x: pl.pallas_call(
      kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x))
  jax.block_until_ready(f(x))
  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(reps):
      r = f(x)
    jax.block_until_ready(r)
    best = min(best, (time.perf_counter() - t0) / reps)
  flops = 3 * n_ops * int(np.prod(shape))
  return flops / best


def main():
  task = registry.get_task("Quadruped Flat")
  m = getattr(task, "plan_model", task.model)
  k, horizon = 4096, 36
  config = sampling.make_config(task).replace(
      num_trajectory=k, horizon=horizon)
  spec = task.lane_residual_spec()
  d0 = task.make_data()

  # flop count: one step of the kernel's own math (step_array traces
  # the same step_body the Pallas kernel runs), at lane width k
  kern = step_lane.build_rollout_kernel(
      m, horizon, config.num_spline_points, unroll=False,
      residual_fn=spec["fn"], residual_dim=spec["dim"],
      naux=spec["naux"], record_states=False,
      contact_types=(coll.SPHERE,),
      contact_geoms=getattr(task, "plan_contact_geoms", None))
  qpos0 = jnp.tile(d0.qpos[:, None], (1, k))
  qvel0 = jnp.tile(d0.qvel[:, None], (1, k))
  aux = jnp.tile(spec["make_aux"](d0, task.residual_params)[:, None],
                 (1, k)).astype(jnp.float32)
  closed = jax.make_jaxpr(kern.step_array)(qpos0, qvel0,
                                           jnp.zeros((m.nu, k)), 0, aux)
  step_flops = jaxpr_flops(closed.jaxpr)
  roll_flops = step_flops * horizon

  # timed program: the candidate SCORING path (the cost-sum kernel +
  # weighted term reduction — the dominant phase of the bench flagship
  # optimize; noise/argmin add ~5% on top per profile_lane.py)
  from mujoco_mpc_tpu.ops import sampling_lane
  returns_fn = jax.jit(sampling_lane.make_lane_returns_fn(
      task, config, unroll=False))
  cands = jnp.zeros((k, config.num_spline_points * m.nu), jnp.float32)
  out = returns_fn(cands, d0)
  jax.block_until_ready(out)
  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
      out = returns_fn(cands, d0)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / 5)

  ceil = measure_ceiling()
  sustained = roll_flops / best
  io_bytes = 4 * (qpos0.size + qvel0.size + aux.size +
                  k + k * m.nu * config.num_spline_points)
  print(f"scoring time:       {1e3*best:8.2f} ms "
        f"({k/best:,.0f} rollouts/s)")
  print(f"static FLOPs/iteration: {roll_flops/1e9:.2f} GFLOP "
        f"({step_flops/k/1e3:.1f} kFLOP per candidate-step)")
  print(f"sustained:          {sustained/1e12:8.3f} TFLOP/s "
        f"(rollout flops only / full-optimize time: a lower bound)")
  print(f"VPU fma ceiling:    {ceil/1e12:8.3f} TFLOP/s "
        f"(measured fma chain, (512,128) f32)")
  print(f"VPU utilization:    {100*sustained/ceil:8.1f} % (conservative"
        f" — transcendentals/selects counted low)")
  print(f"HBM boundary:       {io_bytes/1e6:8.2f} MB/call = "
        f"{io_bytes/best/1e9:,.2f} GB/s of ~819 GB/s "
        f"— not bandwidth-bound; working set lives in VMEM")


if __name__ == "__main__":
  main()
