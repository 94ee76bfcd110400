"""Block-banded Gauss-Newton linear algebra for the Direct optimizer.

Reference capability (mjpc/direct/direct.h:236-302): the Direct cost
Hessian is band-limited — stage residuals touch (q_{t-1}, q_t, q_{t+1})
only, so H is block-PENTAdiagonal in nv-blocks (nband = 3*nv in the
reference's scalar band storage) — and is factorized with a custom band
Cholesky (mju_cholFactorBand).

TPU-native design: group consecutive nv-blocks in pairs. A pentadiagonal
matrix in nv-blocks is block-TRIdiagonal in 2nv superblocks, so the
factorization becomes a `lax.scan` of dense (2nv, 2nv) Cholesky /
triangular-solve steps — each step is a handful of MXU matmuls, and the
sequential length is T/2 instead of the reference's T scalar-band sweep.
Memory is O(T * nv^2) band storage instead of the dense path's
O((T*nv)^2).

All functions are shape-static and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_superblocks(D1, O1, O2):
  """Pack nv-block pentadiagonal storage into 2nv-superblock tridiagonal.

  D1: (T, b, b) diagonal blocks H[t, t]
  O1: (T-1, b, b) first off-diagonal H[t, t+1]
  O2: (T-2, b, b) second off-diagonal H[t, t+2]

  Returns (Ds, Us): (S, 2b, 2b) diagonal and (S-1, 2b, 2b) upper
  superblocks with S = ceil(T/2); odd T is padded with an identity
  diagonal block (decoupled, keeps the matrix SPD).
  """
  t_len, b = D1.shape[0], D1.shape[1]
  if t_len % 2:
    D1 = jnp.concatenate([D1, jnp.eye(b, dtype=D1.dtype)[None]], axis=0)
    O1 = jnp.concatenate([O1, jnp.zeros((1, b, b), D1.dtype)], axis=0)
    O2 = jnp.concatenate([O2, jnp.zeros((1, b, b), D1.dtype)], axis=0)
    t_len += 1
  s_len = t_len // 2
  # pad off-diagonals so indexing below stays in range
  O1p = jnp.concatenate([O1, jnp.zeros((1, b, b), D1.dtype)], axis=0)
  O2p = jnp.concatenate([O2, jnp.zeros((2, b, b), D1.dtype)], axis=0)

  even = 2 * jnp.arange(s_len)
  top = jnp.concatenate([D1[even], O1p[even]], axis=2)
  bot = jnp.concatenate([jnp.swapaxes(O1p[even], 1, 2), D1[even + 1]],
                        axis=2)
  Ds = jnp.concatenate([top, bot], axis=1)              # (S, 2b, 2b)

  # U_s couples (2s, 2s+1) to (2s+2, 2s+3):
  #   [[ H[2s, 2s+2]   H[2s, 2s+3]=0 ],
  #    [ H[2s+1,2s+2]  H[2s+1,2s+3]  ]]
  ev = even[:-1]
  zero = jnp.zeros((s_len - 1, b, b), D1.dtype)
  utop = jnp.concatenate([O2p[ev], zero], axis=2)
  ubot = jnp.concatenate([O1p[ev + 1], O2p[ev + 1]], axis=2)
  Us = jnp.concatenate([utop, ubot], axis=1)            # (S-1, 2b, 2b)
  return Ds, Us


def block_tridiag_cholesky(Ds, Us):
  """Blocked Cholesky of an SPD block-tridiagonal matrix.

  Ds: (S, b, b) diagonal blocks, Us: (S-1, b, b) upper blocks
  (H[s, s+1]). Returns (L, W): L (S, b, b) lower Cholesky blocks;
  W (S-1, b, b) = L_s^{-1} U_s (the scaled coupling used by solves).
  """
  s_len, b = Ds.shape[0], Ds.shape[1]
  Us_pad = jnp.concatenate([Us, jnp.zeros((1, b, b), Ds.dtype)], axis=0)

  def step(w_prev, inp):
    d_s, u_s = inp
    h_hat = d_s - w_prev.T @ w_prev
    l_s = jnp.linalg.cholesky(h_hat)
    w_s = jax.scipy.linalg.solve_triangular(l_s, u_s, lower=True)
    return w_s, (l_s, w_s)

  _, (L, W) = jax.lax.scan(step, jnp.zeros((b, b), Ds.dtype),
                           (Ds, Us_pad))
  return L, W[:-1]


def block_tridiag_solve(L, W, rhs):
  """Solve H x = rhs given the factorization from block_tridiag_cholesky.

  L: (S, b, b), W: (S-1, b, b), rhs: (S, b) or (S, b, k).
  """
  squeeze = rhs.ndim == 2
  if squeeze:
    rhs = rhs[..., None]
  s_len, b, k = rhs.shape
  W_pad = jnp.concatenate([jnp.zeros((1, b, b), L.dtype), W], axis=0)

  def fwd(y_prev, inp):
    l_s, w_prev, b_s = inp
    y_s = jax.scipy.linalg.solve_triangular(
        l_s, b_s - w_prev.T @ y_prev, lower=True)
    return y_s, y_s

  _, ys = jax.lax.scan(fwd, jnp.zeros((b, k), L.dtype), (L, W_pad, rhs))

  W_bpad = jnp.concatenate([W, jnp.zeros((1, b, b), L.dtype)], axis=0)

  def bwd(x_next, inp):
    l_s, w_s, y_s = inp
    x_s = jax.scipy.linalg.solve_triangular(
        l_s.T, y_s - w_s @ x_next, lower=False)
    return x_s, x_s

  _, xs = jax.lax.scan(bwd, jnp.zeros((b, k), L.dtype),
                       (L, W_bpad, ys), reverse=True)
  return xs[..., 0] if squeeze else xs


def banded_gn_solve(D1, O1, O2, g, P=None, Q=None, g_theta=None):
  """Solve the Gauss-Newton system H dz = -g for a block-pentadiagonal
  H (optionally bordered by dense parameter columns).

  D1/O1/O2: nv-block band storage (see assemble_superblocks); g: (T, b).
  P: (T, b, np) dense parameter coupling columns, Q: (np, np) parameter
  block, g_theta: (np,). The border is eliminated by a Schur complement
  on the banded factorization (reference: direct.h:291 dense parameter
  rows appended to the band).

  Returns (dz, dtheta): (T, b) configuration tangent step and (np,)
  parameter step (zeros-shaped (0,) when no border).
  """
  t_len, b = g.shape
  Ds, Us = assemble_superblocks(D1, O1, O2)
  s_len = Ds.shape[0]
  pad = s_len * 2 - t_len

  def to_super(x):  # (T, b, ...) -> (S, 2b, ...)
    if pad:
      x = jnp.concatenate(
          [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x.reshape(s_len, 2 * b, *x.shape[2:])

  def from_super(x):
    x = x.reshape(s_len * 2, b, *x.shape[2:])
    return x[:t_len]

  L, W = block_tridiag_cholesky(Ds, Us)

  if P is None:
    dz = block_tridiag_solve(L, W, to_super(-g))
    return from_super(dz), jnp.zeros((0,), g.dtype)

  n_p = Q.shape[0]
  rhs = jnp.concatenate([to_super(g)[..., None], to_super(P)], axis=2)
  sol = block_tridiag_solve(L, W, rhs)        # (S, 2b, 1+np)
  x_g, x_p = sol[..., 0], sol[..., 1:]
  p_s = to_super(P)
  # Schur complement: (Q - P^T H_b^{-1} P) dtheta = -(g_t - P^T H_b^{-1} g)
  pt_xp = jnp.einsum("sbp,sbq->pq", p_s, x_p)
  pt_xg = jnp.einsum("sbp,sb->p", p_s, x_g)
  dtheta = jnp.linalg.solve(Q - pt_xp, -(g_theta - pt_xg))
  dz = -x_g - jnp.einsum("sbp,p->sb", x_p, dtheta)
  return from_super(dz), dtheta
