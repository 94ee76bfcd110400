"""Pallas TPU kernel for the iLQG backward Riccati/boxQP sweep.

The reference's backward pass (mjpc/planners/ilqg/backward_pass.cc:65-247)
is a strictly sequential recursion over tiny (ndx x ndx / nu x nu)
matrices. As an XLA `lax.scan` it is op-dispatch bound on TPU: each
Riccati step issues ~250 small fused ops, and even with scan unrolling
the Swimmer H=40 sweep costs ~2.8 ms. This kernel runs the WHOLE sweep
(Q expansions, projected-Newton boxQP, gain solve, value update) inside
one Pallas program: every tiny matrix lives padded in a native
(128, 128) / (1, 128) tile, matvecs ride the MXU as row @ matrix
products, and the per-step cost collapses to raw VPU/MXU issue time.

Math parity: identical recursion to `planners.ilqg.backward_pass`
(same regularization types, same fixed-iteration projected-Newton boxQP
with free-set Gauss-Jordan solve). The free-set masking uses an
algebraic identity instead of row masking: the masked system's inverse
is computed with unit diagonal on clamped/padded rows, and
  x = ((rhs * fmask) @ inv) * fmask
  K = -(inv * fmask_lanes) @ Qux_reg
zero exactly the clamped rows/columns (clamped rows of inv are identity
rows, so the lane mask kills them in the contraction).

Eligibility: ndx <= 128, nu <= 32, and the per-horizon input arrays
must fit the VMEM budget (see `supports`). Callers fall back to the XLA
path outside the gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REG_CONTROL, REG_STATE_CONTROL, REG_VALUE, REG_NONE = 0, 1, 2, 3

def _round8(n):
  return max(8, -(-n // 8) * 8)


def supports(ndx: int, nu: int, horizon: int) -> bool:
  """Kernel eligibility: row vectors need ndx/nu <= 128 lanes; the
  Gauss-Jordan unroll wants nu modest; inputs must fit VMEM (~10MB)."""
  if ndx > 128 or nu > 32 or horizon > 512:
    return False
  nxs, nus = _round8(ndx), _round8(nu)
  t = horizon
  vmem = 4 * 128 * (2 * (t - 1) * nxs + t * nxs + 2 * t * nus
                    + t * 8 + (t - 1) * (nus + 1))
  return vmem <= 10 * 1024 * 1024


def _row_iota(n):
  # lane-index row (1, 128); 1D iota is unsupported on TPU
  return jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)


def build_backward_kernel(ndx: int, nu: int, horizon: int,
                          boxqp_iters: int, reg_type: int,
                          interpret: bool = False):
  """Returns fn(a, b, cx, cu, cxx, cxu, cuu, du_lower, du_upper, reg)
  -> (ks (T-1, nu), kmats (T-1, nu, ndx), (dv1, dv2), ok) with the same
  semantics as planners.ilqg.backward_pass."""
  assert supports(ndx, nu, horizon)
  T = horizon
  f32 = jnp.float32
  nxs, nus = _round8(ndx), _round8(nu)

  def u_valid_row():
    # (1, 128) mask of real u dims, built in-kernel (no closed-over
    # device constants inside the Pallas trace)
    return (_row_iota(nu) < nu).astype(f32)

  def eye_u():
    return jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (nus, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (nus, 128), 1),
        1.0, 0.0).astype(f32)

  def pad_sq(tile):
    """(rows, 128) -> (128, 128) zero-padded square operand for dots.
    concatenate, not dynamic_update_slice (unsupported in Mosaic)."""
    rows = tile.shape[0]
    if rows == 128:
      return tile
    return jnp.concatenate(
        [tile, jnp.zeros((128 - rows, 128), f32)], axis=0)

  def gj_inverse(quu_m):
    """Gauss-Jordan inverse of an (8, 128) tile holding an SPD nu x nu
    block with unit diagonal on clamped/padded rows (cols >= nu or
    masked rows carry identity). No pivoting: diagonal stays >= reg.
    Row writes via sublane-iota masks (Mosaic has no update_slice)."""
    row_id = jax.lax.broadcasted_iota(jnp.int32, (nus, 1), 0)
    aug = jnp.concatenate([quu_m, eye_u()], axis=1)   # (nus, 256)
    for i in range(nus):
      piv = aug[i:i + 1, i:i + 1]                     # static (1, 1)
      row = aug[i:i + 1, :] / piv
      col = aug[:, i:i + 1]
      aug = aug - col * row
      aug = jnp.where(row_id == i, row, aug)
    return aug[:, 128:]                               # (nus, 128)

  def masked_quu(quu8, fmask):
    """Row+column mask the (8, 128) Quu tile, unit diagonal on
    clamped/padded rows. Row masking uses the transposed lane mask."""
    # row mask without a transpose: fcol[i] = fmask[0, i] via the
    # identity-selector lane reduction
    fcol = jnp.sum(eye_u() * fmask, axis=1, keepdims=True)  # (8, 1)
    return quu8 * fmask * fcol + eye_u() * (1.0 - fmask * fcol)

  def boxqp(quu8, quu_f, qu, lo, hi):
    """Projected-Newton box QP in row space. quu8: (8,128) regularized
    Quu; quu_f: its (128,128) padded form; qu/lo/hi: (1,128) rows.
    Returns (du row, fmask row, inv (8,128) for the gain solve)."""
    u_valid = u_valid_row()
    diag = jnp.sum(quu8 * eye_u(), axis=0, keepdims=True)  # (1,128)
    du = jnp.clip(-qu / jnp.maximum(diag, 1e-8), lo, hi) * u_valid
    fmask = u_valid
    inv = None
    for _ in range(boxqp_iters):
      grad = qu + jnp.dot(du, quu_f, preferred_element_type=f32)
      at_lo = (du <= lo + 1e-9) & (grad > 0)
      at_hi = (du >= hi - 1e-9) & (grad < 0)
      fmask = u_valid * (1.0 - (at_lo | at_hi).astype(f32))
      clamped = du * (1.0 - fmask)
      rhs = qu + jnp.dot(clamped, quu_f, preferred_element_type=f32)
      inv = gj_inverse(masked_quu(quu8, fmask))
      inv_f = pad_sq(inv)
      step = -jnp.dot(rhs * fmask, inv_f,
                      preferred_element_type=f32) * fmask
      du = jnp.clip(jnp.where(fmask > 0, step, du), lo, hi) * u_valid
    # final free set at the solution (backward_pass.cc:202-212)
    grad = qu + jnp.dot(du, quu_f, preferred_element_type=f32)
    at_lo = (du <= lo + 1e-9) & (grad > 0)
    at_hi = (du >= hi - 1e-9) & (grad < 0)
    fmask = u_valid * (1.0 - (at_lo | at_hi).astype(f32))
    inv = gj_inverse(masked_quu(quu8, fmask))
    return du, fmask, inv

  def kernel(a_ref, b_ref, cxx_ref, cux_ref, cuu_ref, vecs_ref,
             reg_ref, ks_ref, kmats_ref, out_ref):
    reg = reg_ref[0]
    # terminal boundary: vecs row 4 = cx_T, cxx slot T-1 is cxx_T
    vx = vecs_ref[T - 1, 4:5, :]                      # (1, 128)
    vxx = pad_sq(cxx_ref[T - 1])                       # (128, 128)

    def body(i, carry):
      vx, vxx, dv1, dv2, bad = carry
      t = T - 2 - i
      a8 = a_ref[t]                                   # (nxs, 128)
      b8 = b_ref[t]
      a_f = pad_sq(a8)
      b_f = pad_sq(b8)
      cx = vecs_ref[t, 0:1, :]
      cu = vecs_ref[t, 1:2, :]
      lo = vecs_ref[t, 2:3, :]
      hi = vecs_ref[t, 3:4, :]

      u_valid = u_valid_row()
      qx = cx + jnp.dot(vx, a_f, preferred_element_type=f32)
      qu = (cu + jnp.dot(vx, b_f, preferred_element_type=f32)) * u_valid
      m1 = jnp.dot(vxx, a_f, preferred_element_type=f32)   # Vxx A
      m2 = jnp.dot(vxx, b_f, preferred_element_type=f32)   # Vxx B
      ata = jax.lax.dot_general(                            # A' Vxx A
          a_f, m1, (((0,), (0,)), ((), ())),
          preferred_element_type=f32)
      qxx = pad_sq(cxx_ref[t]) + ata
      qux = pad_sq(cux_ref[t]) + jax.lax.dot_general(       # B' Vxx A
          b_f, m1, (((0,), (0,)), ((), ())),
          preferred_element_type=f32)
      quu_u = pad_sq(cuu_ref[t]) + jax.lax.dot_general(     # B' Vxx B
          b_f, m2, (((0,), (0,)), ((), ())),
          preferred_element_type=f32)

      if reg_type == REG_VALUE:
        # Vxx + reg I propagated into both solve-side expansions
        qux_reg = qux + reg * jax.lax.dot_general(
            b_f, a_f, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        quu_reg = quu_u + reg * jax.lax.dot_general(
            b_f, b_f, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
      elif reg_type == REG_CONTROL:
        qux_reg = qux
        quu_reg = quu_u + reg * pad_sq(eye_u() * u_valid)
      elif reg_type == REG_STATE_CONTROL:
        # Qxu + mu A'B, Quu + mu B'B (backward_pass.cc:116-153)
        qux_reg = qux + reg * jax.lax.dot_general(
            b_f, a_f, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        quu_reg = quu_u + reg * jax.lax.dot_general(
            b_f, b_f, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
      else:  # REG_NONE
        qux_reg = qux
        quu_reg = quu_u + 1e-9 * pad_sq(eye_u() * u_valid)

      quu_reg8 = quu_reg[:nus, :]
      k, fmask, inv = boxqp(quu_reg8, quu_reg, qu, lo, hi)
      # K = -inv_ff Qux_reg on the free set; clamped rows of inv are
      # identity rows, and the lane mask kills their contraction term,
      # so the clamped K rows come out as -fmask[u]*Qux[u,:] == 0 after
      # the explicit row mask below (module docstring)
      kmat = jax.lax.dot_general(
          inv * fmask, qux_reg, (((1,), (0,)), ((), ())),
          preferred_element_type=f32) * (-1.0)       # (nus, 128)
      fcol = jnp.sum(eye_u() * fmask, axis=1, keepdims=True)
      kmat = kmat * fcol                              # zero clamped rows
      kmat_f = pad_sq(kmat)

      # value update with UNregularized expansions
      w = jnp.dot(k, quu_u, preferred_element_type=f32) + qu
      vx_new = (qx
                + jnp.dot(w, kmat_f, preferred_element_type=f32)
                + jnp.dot(k, qux, preferred_element_type=f32))
      z = jax.lax.dot_general(kmat_f, quu_u, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
      s = jax.lax.dot_general(kmat_f, qux, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
      st = jax.lax.dot_general(qux, kmat_f, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)
      vxx_new = (qxx
                 + jnp.dot(z, kmat_f, preferred_element_type=f32)
                 + s + st)
      vxx_new = 0.5 * (vxx_new + jax.lax.transpose(vxx_new, (1, 0)))

      dv1 = dv1 + jnp.sum(k * qu)
      dv2 = dv2 + 0.5 * jnp.sum(k * w - k * qu)       # 0.5 k'Quu k
      fin = (jnp.sum(jnp.abs(vx_new)) + jnp.sum(jnp.abs(k)))
      bad = bad | ~jnp.isfinite(fin)

      ks_ref[t] = k[0]
      kmats_ref[t] = kmat
      return vx_new, vxx_new, dv1, dv2, bad

    _, _, dv1, dv2, bad = jax.lax.fori_loop(
        0, T - 1, body,
        (vx, vxx, jnp.float32(0.0), jnp.float32(0.0),
         jnp.zeros((), jnp.bool_)))
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[0:1, :] = (jnp.where(lane_i == 0, dv1, 0.0)
                       + jnp.where(lane_i == 1, dv2, 0.0)
                       + jnp.where(lane_i == 2,
                                   bad.astype(f32), 0.0))

  @jax.jit
  def backward(a, b, cx, cu, cxx, cxu, cuu, du_lower, du_upper, reg):
    """Same contract as planners.ilqg.backward_pass (a,b: (T-1,...);
    cost expansions (T,...); du bounds (T-1, nu); reg scalar)."""
    f = jnp.float32
    pad_r = lambda x, rows: jnp.pad(
        x.astype(f), ((0, 0), (0, rows - x.shape[1]),
                      (0, 128 - x.shape[2])))
    a_p = pad_r(a, nxs)                                # (T-1, nxs, 128)
    b_p = pad_r(b, nxs)
    cxx_p = pad_r(cxx, nxs)                            # (T, nxs, 128)
    cux_p = pad_r(jnp.swapaxes(cxu, 1, 2), nus)        # (T, nus, 128)
    cuu_p = pad_r(cuu, nus)
    # vecs rows: 0=cx(+pad after T-1), 1=cu, 2=lo, 3=hi, 4=cx (terminal)
    pad_v = lambda x: jnp.pad(x.astype(f), ((0, 0), (0, 128 - x.shape[1])))
    zu = jnp.zeros((1, 128), f)
    cx_p = pad_v(cx)                                   # (T, 128)
    cu_p = jnp.concatenate([pad_v(cu[:-1]), zu], 0)
    lo_p = jnp.concatenate([pad_v(du_lower), zu], 0)
    hi_p = jnp.concatenate([pad_v(du_upper), zu], 0)
    vecs = jnp.stack([cx_p, cu_p, lo_p, hi_p, cx_p], axis=1)  # (T,5,128)
    vecs = jnp.pad(vecs, ((0, 0), (0, 3), (0, 0)))            # (T,8,128)
    reg_a = jnp.asarray([reg], f)

    ks, kmats, out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((T - 1, 128), f),
            jax.ShapeDtypeStruct((T - 1, nus, 128), f),
            jax.ShapeDtypeStruct((1, 128), f),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a_p, b_p, cxx_p, cux_p, cuu_p, vecs, reg_a)

    dv = (out[0, 0], out[0, 1])
    ok = out[0, 2] == 0.0
    return (ks[:, :nu], kmats[:, :nu, :ndx], dv, ok)

  return backward
