"""Probe Mosaic layout efficiency: (K,) 1-D lanes vs (8, K//8) 2-D tiles.

If 1-D (1024,) component arrays lower to (1, 1024) vector layouts, every
elementwise op uses 1 of 8 sublanes -> 8x waste across the whole lane
kernel. This microbenchmark chains N fused multiply-adds on both shapes.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N_OPS = 2000
REPS = 50


def bench(shape, label):
  def kernel(x_ref, o_ref):
    x = x_ref[...]
    y = x
    for i in range(N_OPS):
      y = y * 1.000001 + 0.0000001 * x
    o_ref[...] = y

  x = jnp.ones(shape, jnp.float32)
  f = jax.jit(lambda x: pl.pallas_call(
      kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x))
  jax.block_until_ready(f(x))
  best = float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(REPS):
      r = f(x)
    jax.block_until_ready(r)
    best = min(best, (time.perf_counter() - t0) / REPS)
  nelem = 1
  for s in shape:
    nelem *= s
  ops = N_OPS * nelem
  print(f"{label:18s} {1e6*best:9.1f} us  "
        f"({ops/best/1e9:8.1f} Gop/s elementwise)")


def main():
  bench((1024,), "(1024,)")
  bench((8, 128), "(8,128)")
  bench((1, 1024), "(1,1024)")
  bench((8, 1024), "(8,1024)")
  bench((64, 128), "(64,128)")


if __name__ == "__main__":
  main()
