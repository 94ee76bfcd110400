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


def srif_gn_solve(A, B, C, r, Ld, L1, L2, rp, reg, Jth=None):
  """Gauss-Newton step by sequential block QR on the JACOBIAN (square-
  root information filter), never forming J^T J.

  The Direct GN Hessian has cond ~ 1/h^4 (FD accelerations); in f32 the
  normal-equation Cholesky loses the near-singular pivots to
  cancellation (the reference factorizes the band in f64,
  mju_cholFactorBand). QR works on J directly with cond(J) =
  sqrt(cond(H)), which f32 handles.

  System rows:
    * stage rows [A_i B_i C_i | Jth_i | r_i] at column blocks
      (i, i+1, i+2), i = 0..T-3;
    * prior square-root rows L^T dz + rp (P = L L^T block-banded lower
      Cholesky: Ld (T,b,b) diag, L1 (T-1,b,b) sub, L2 (T-2,b,b) 2-sub);
    * Levenberg rows sqrt(reg) I per column block.

  One lax.scan eliminates column blocks left to right (each step = one
  dense QR of a small stacked block — MXU work); a reverse scan
  back-substitutes. Returns (dz (T,b), dtheta (np,)).
  """
  t_len2, nr, b = A.shape
  t_len = t_len2 + 2
  n_p = Jth.shape[2] if Jth is not None else 0
  dtype = A.dtype
  w_cols = 3 * b + n_p + 1
  nc = 2 * b + n_p                       # carry rows

  sreg = jnp.sqrt(reg)
  zero_stage = jnp.zeros((nr, w_cols), dtype)
  # pad per-t inputs to length T with zeros
  def padT(x, n):
    return jnp.concatenate(
        [x, jnp.zeros((n,) + x.shape[1:], x.dtype)], axis=0)
  A_p, B_p, C_p, r_p = padT(A, 2), padT(B, 2), padT(C, 2), padT(r, 2)
  Jth_p = padT(Jth, 2) if Jth is not None else None
  L1_p, L2_p = padT(L1, 1), padT(L2, 2)

  def step(carry, inp):
    rc = carry                            # (nc, 2b + np + 1)
    a_t, b_t, c_t, r_t, jth_t, ld_t, l1_t, l2_t, rp_t, is_stage = inp
    rows = [jnp.concatenate([
        rc[:, :2 * b], jnp.zeros((nc, b), dtype), rc[:, 2 * b:]], axis=1)]
    stage = [a_t, b_t, c_t]
    if Jth is not None:
      stage.append(jth_t)
    stage.append(r_t[:, None])
    rows.append(jnp.where(is_stage, jnp.concatenate(stage, axis=1),
                          zero_stage))
    prior = [ld_t.T, l1_t.T, l2_t.T]
    if Jth is not None:
      prior.append(jnp.zeros((b, n_p), dtype))
    prior.append(rp_t[:, None])
    rows.append(jnp.concatenate(prior, axis=1))
    damp = [sreg * jnp.eye(b, dtype=dtype),
            jnp.zeros((b, 2 * b + n_p + 1), dtype)]
    rows.append(jnp.concatenate(damp, axis=1))
    m = jnp.concatenate(rows, axis=0)     # (nc + nr + 2b, w_cols)
    q_, r_mat = jnp.linalg.qr(m, mode="reduced")
    head = r_mat[:b]                      # output row block for column t
    new_carry = r_mat[b:b + nc, b:]       # spans (t+1, t+2, theta, rhs)
    return new_carry, head

  carry0 = jnp.zeros((nc, 2 * b + n_p + 1), dtype)
  inputs = (A_p, B_p, C_p, r_p,
            Jth_p if Jth is not None else jnp.zeros((t_len, nr, 0),
                                                    dtype),
            Ld, L1_p, L2_p, rp,
            (jnp.arange(t_len) <= t_len - 3)[:, None, None])
  carry_f, heads = jax.lax.scan(step, carry0, inputs)

  # parameter border: leftover carry rows span only (theta, rhs)
  if n_p:
    th_block = carry_f[:, 2 * b:]         # (nc, np + 1)
    damp_th = jnp.concatenate(
        [sreg * jnp.eye(n_p, dtype=dtype),
         jnp.zeros((n_p, 1), dtype)], axis=1)
    mth = jnp.concatenate([th_block, damp_th], axis=0)
    _, rth = jnp.linalg.qr(mth, mode="reduced")
    dtheta = jax.scipy.linalg.solve_triangular(
        rth[:n_p, :n_p], -rth[:n_p, n_p], lower=False)
  else:
    dtheta = jnp.zeros((0,), dtype)

  # back-substitution: R_tt x_t = -(y + R01 x_{t+1} + R02 x_{t+2}
  #                                 + Rth dtheta)
  def bsub(carry, head):
    x1, x2 = carry
    r_tt = head[:, :b]
    rhs = head[:, -1] + head[:, b:2 * b] @ x1 + head[:, 2 * b:3 * b] @ x2
    if n_p:
      rhs = rhs + head[:, 3 * b:3 * b + n_p] @ dtheta
    x_t = jax.scipy.linalg.solve_triangular(r_tt, -rhs, lower=False)
    return (x_t, x1), x_t

  zb = jnp.zeros((b,), dtype)
  _, xs = jax.lax.scan(bsub, (zb, zb), heads, reverse=True)
  return xs, dtheta


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
  # symmetric block-Jacobi equilibration: the force rows scale the
  # Hessian like 1/h^4 (~1e8 at h=0.01), and the sequential Schur
  # subtractions of the block factorization lose everything below
  # eps_f32 * |H| to cancellation. Scaling by 1/sqrt(diag(H)) brings
  # the pivots to O(1); solve H' y = s*rhs with H' = S H S, dz = S y.
  s = 1.0 / jnp.sqrt(jnp.maximum(
      jnp.einsum("tii->ti", D1), 1e-12))            # (T, b)
  D1 = D1 * s[:, :, None] * s[:, None, :]
  O1 = O1 * s[:-1, :, None] * s[1:, None, :]
  O2 = O2 * s[:-2, :, None] * s[2:, None, :]
  g = g * s
  if P is not None:
    P = P * s[:, :, None]
  # relative Levenberg jitter: after equilibration diag(H') = 1, and the
  # f32 Schur subtractions can push near-singular pivots slightly
  # negative (the FD-acceleration GN Hessian has cond ~ 1/h^4; the
  # reference factorizes it in f64). 1e-4 damping keeps the Cholesky
  # finite; the outer GN loop re-linearizes so the bias washes out.
  D1 = D1 + 1e-4 * jnp.eye(b, dtype=D1.dtype)[None]
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
    return from_super(dz) * s, jnp.zeros((0,), g.dtype)

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
  return from_super(dz) * s, dtheta
