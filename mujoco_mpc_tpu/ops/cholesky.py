"""Lane-parallel batched Cholesky factor/solve Pallas kernel.

Layout: the batch axis K sits on the TPU lane dimension. The matrix is
(n, n, K): element (i, j) of every candidate's matrix lives in one
(1, 1, K) lane vector, so the textbook Cholesky loops become static
unrolled sequences of full-width VPU ops — one candidate per lane, no
padding waste (vs XLA's batched (K, n, n) layout which pads n -> 128).

Used for the (nv x nv) systems in the constraint solver / implicit Euler /
iLQG. Verified against jnp.linalg.cholesky in tests (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-10


def _chol_solve_kernel(n: int, a_ref, b_ref, x_ref):
  """Solve A x = b per lane; A (n, n, K), b (n, K) -> x (n, K)."""
  # load rows into registers (each row: (n, K))
  a = a_ref[...]  # (n, n, K)
  b = b_ref[...]  # (n, K)

  # Cholesky factor L (lower), unrolled i >= j
  l_rows = [[None] * n for _ in range(n)]
  for j in range(n):
    s = a[j, j]
    for k in range(j):
      s = s - l_rows[j][k] * l_rows[j][k]
    diag = jnp.sqrt(jnp.maximum(s, _EPS))
    l_rows[j][j] = diag
    inv_diag = 1.0 / diag
    for i in range(j + 1, n):
      s = a[i, j]
      for k in range(j):
        s = s - l_rows[i][k] * l_rows[j][k]
      l_rows[i][j] = s * inv_diag

  # forward substitution L y = b
  y = [None] * n
  for i in range(n):
    s = b[i]
    for k in range(i):
      s = s - l_rows[i][k] * y[k]
    y[i] = s / l_rows[i][i]

  # back substitution L^T x = y
  x = [None] * n
  for i in range(n - 1, -1, -1):
    s = y[i]
    for k in range(i + 1, n):
      s = s - l_rows[k][i] * x[k]
    x[i] = s / l_rows[i][i]

  x_ref[...] = jnp.stack(x, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_lanes(a: jax.Array, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
  """Batched SPD solve with batch on the LAST axis.

  a: (n, n, K), b: (n, K) -> x: (n, K) with A[..., k] x[:, k] = b[:, k].
  K should be a multiple of 128 for full lane utilization.
  """
  n = a.shape[0]
  return pl.pallas_call(
      functools.partial(_chol_solve_kernel, n),
      out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
      interpret=interpret,
  )(a, b)


def chol_solve_reference(a: jax.Array, b: jax.Array) -> jax.Array:
  """jnp reference (same signature) for validation."""
  am = jnp.moveaxis(a, -1, 0)  # (K, n, n)
  bm = jnp.moveaxis(b, -1, 0)  # (K, n)
  chol = jnp.linalg.cholesky(am)
  y = jax.scipy.linalg.solve_triangular(chol, bm[..., None], lower=True)
  x = jax.scipy.linalg.solve_triangular(
      jnp.swapaxes(chol, -1, -2), y, lower=False)[..., 0]
  return jnp.moveaxis(x, 0, -1)
