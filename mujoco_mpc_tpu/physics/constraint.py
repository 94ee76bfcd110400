"""Soft-constraint assembly and solver (contacts + joint limits).

TPU-first formulation: a FIXED-SIZE constraint system. Every candidate
contact from the static pair list and every joint-limit side always has a
row; rows whose gating distance is non-negative get zero stiffness (D=0), so
inactive rows are no-ops. This keeps all shapes static under jit/vmap.

The solver minimizes the primal objective (MuJoCo "Computation" chapter):

    0.5 (a - a0)^T M (a - a0) + sum_i 0.5 D_i [ (Ja - aref)_i^- ]^2

with one-sided (inequality) quadratic costs, via a damped Newton iteration
with exact 1-D line search — a handful of dense (nv x nv) Cholesky solves,
which batch beautifully over thousands of vmapped rollouts on the MXU.

Friction uses pyramidal cones: each contact with condim c contributes
2*(c-1) rows (or 1 normal-only row when c == 1), matching MuJoCo's
pyramidal default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import collision as coll
from mujoco_mpc_tpu.physics import smooth as S
from mujoco_mpc_tpu.physics.model import HINGE, SLIDE, Contact, Data, Model

_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """Constraint impedance d(r) (mju_makeImpedance semantics)."""
  dmin, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                   solimp[..., 2], solimp[..., 3],
                                   solimp[..., 4])
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
  mid = jnp.clip(mid, _MINIMP, _MAXIMP)
  power = jnp.maximum(power, 1.0)
  a = 1.0 / jnp.power(mid, power - 1.0)
  b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
  y = jnp.where(x <= mid,
                a * jnp.power(x, power),
                1.0 - b * jnp.power(1.0 - x, power))
  d = dmin + y * (dmax - dmin)
  return jnp.clip(d, _MINIMP, _MAXIMP)


def _kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array,
         jv: jax.Array) -> tuple[jax.Array, jax.Array]:
  """Reference acceleration aref and impedance d for constraint rows."""
  imp = _impedance(solimp, pos)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  # standard (positive solref): spring-damper in units of constraint pos
  b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k_std = 1.0 / jnp.maximum(
      dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL)
  # direct (non-positive solref): (-stiffness, -damping)
  b_dir = -solref[..., 1] / jnp.maximum(dmax, _MINVAL)
  k_dir = -solref[..., 0] / jnp.maximum(dmax * dmax, _MINVAL)
  use_std = (timeconst > 0) & (dampratio > 0)
  b = jnp.where(use_std, b_std, b_dir)
  k = jnp.where(use_std, k_std, k_dir)
  aref = -b * jv - k * imp * pos
  return aref, imp


def _limit_rows(m: Model, d: Data):
  """Joint-limit rows for limited hinge/slide joints: 2 per joint."""
  dtype = d.qpos.dtype
  js = [
      j for j in range(m.njnt)
      if m.jnt_limited[j] and int(m.jnt_type[j]) in (HINGE, SLIDE)
  ]
  if not js:
    return None
  rows_j, rows_pos, rows_ref, rows_imp, rows_diag = [], [], [], [], []
  for j in js:
    qadr = int(m.jnt_qposadr[j])
    dadr = int(m.jnt_dofadr[j])
    for side in (0, 1):
      ej = jnp.zeros(m.nv, dtype)
      if side == 0:  # lower: dist = qpos - range0, J = +e
        dist = d.qpos[qadr] - m.jnt_range[j, 0]
        ej = ej.at[dadr].set(1.0)
      else:  # upper: dist = range1 - qpos, J = -e
        dist = m.jnt_range[j, 1] - d.qpos[qadr]
        ej = ej.at[dadr].set(-1.0)
      rows_j.append(ej)
      rows_pos.append(dist - m.jnt_margin[j])
      rows_ref.append(m.jnt_solref[j])
      rows_imp.append(m.jnt_solimp[j])
      rows_diag.append(m.dof_invweight0[dadr])
  return (jnp.stack(rows_j), jnp.stack(rows_pos), jnp.stack(rows_ref),
          jnp.stack(rows_imp), jnp.stack(rows_diag))


def _point_jac(m: Model, d: Data, point: jax.Array,
               bodyid: np.ndarray) -> jax.Array:
  """Translational Jacobian (n, 3, nv) of world points on given bodies."""
  dtype = d.qpos.dtype
  ref = d.subtree_com[m.body_rootid[bodyid]]  # (n, 3)
  # v_p[i] = cdof_lin[i] + cdof_ang[i] x (p - c)
  offset = point[:, None, :] - ref[:, None, :]  # (n, 1, 3)
  ang = d.cdof[None, :, :3]  # (1, nv, 3)
  lin = d.cdof[None, :, 3:]
  jac = lin + jnp.cross(ang, offset)  # (n, nv, 3)
  mask = jnp.asarray(m.body_dof_mask, dtype)[bodyid][:, :, None]  # (n, nv, 1)
  return jnp.swapaxes(jac * mask, 1, 2)  # (n, 3, nv)


def _contact_rows(m: Model, d: Data):
  """Pyramidal contact rows from the static candidate-contact set.

  TPU optimization: only the `max_contacts` deepest candidates are kept
  (static top-k — contacts beyond the cap are virtually never active for
  robotics models where the candidate pair list is dominated by never-
  touching link pairs). Jacobians are computed only for the selected set,
  shrinking the solver system ~4-25x.
  """
  cp = m.collision_pairs
  if cp is None or cp.ncon == 0:
    return None, None
  max_contacts = m.opt.max_contact_points
  dtype = d.qpos.dtype
  dist, pos, n = coll.collide(m, d)
  frame = coll.make_contact_frame(n)  # (ncand, 3, 3)

  incmargin = jnp.asarray(cp.con_includemargin, dtype)
  gap = dist - incmargin  # gating distance; row active iff < 0

  k = min(max_contacts, cp.ncon)
  if k < cp.ncon:
    _, sel = jax.lax.top_k(-gap, k)
  else:
    sel = jnp.arange(cp.ncon)

  gap = gap[sel]
  pos_s = pos[sel]
  frame_s = frame[sel]
  friction = jnp.asarray(cp.con_friction, dtype)[sel]
  solref = jnp.asarray(cp.con_solref, dtype)[sel]
  solimp = jnp.asarray(cp.con_solimp, dtype)[sel]

  b1_all = jnp.asarray(m.geom_bodyid[cp.con_geom1])
  b2_all = jnp.asarray(m.geom_bodyid[cp.con_geom2])
  b1 = b1_all[sel]
  b2 = b2_all[sel]

  contact = Contact(
      dist=dist[sel], pos=pos_s, frame=frame_s,
      includemargin=incmargin[sel], friction=friction, solref=solref,
      solimp=solimp, geom1=None, geom2=None,
      geom1_id=jnp.asarray(cp.con_geom1)[sel],
      geom2_id=jnp.asarray(cp.con_geom2)[sel],
      body1=b1, body2=b2)
  rootid = jnp.asarray(m.body_rootid)
  bdm = jnp.asarray(m.body_dof_mask, dtype)
  invw0 = m.body_invweight0[:, 0]

  def pjac(bid, point):
    ref = d.subtree_com[rootid[bid]]
    offset = point[None, :] - ref[None, :]
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:]
    jac = lin + jnp.cross(ang, offset)  # (nv, 3)
    return (jac * bdm[bid][:, None]).T  # (3, nv)

  jac1 = jax.vmap(pjac)(b1, pos_s)  # (k, 3, nv)
  jac2 = jax.vmap(pjac)(b2, pos_s)
  jrel = jac2 - jac1
  jc = jnp.einsum("cab,cbv->cav", frame_s, jrel)  # (k, 3, nv)

  invw = invw0[b1] + invw0[b2]  # (k,)

  # pyramidal expansion: 4 rows per contact (condim 3), fully vectorized:
  # rows = Jn +/- mu_i * Jt_i for i in {0, 1}
  mu = friction[:, :2]  # (k, 2)
  jn = jc[:, 0:1, :]                            # (k, 1, nv)
  jt = jc[:, 1:3, :]                            # (k, 2, nv)
  plus = jn + mu[..., None] * jt                # (k, 2, nv)
  minus = jn - mu[..., None] * jt
  rows_j = jnp.stack([plus, minus], axis=2).reshape(k * 4, m.nv)
  mu_flat = jnp.stack([mu, mu], axis=2).reshape(k * 4)
  diag = jnp.repeat(invw, 4) * 2.0 * mu_flat * mu_flat * \
      (1.0 + mu_flat * mu_flat)
  rows_pos = jnp.repeat(gap, 4)
  rows_ref = jnp.repeat(solref, 4, axis=0)
  rows_imp = jnp.repeat(solimp, 4, axis=0)
  out = (rows_j, rows_pos, rows_ref, rows_imp, rows_pos, diag)
  return contact, out


def _point_jac_single(m: Model, d: Data, point: jax.Array, bodyid: int):
  """Translational Jacobian (3, nv) of one world point on a static body."""
  dtype = d.qpos.dtype
  ref = d.subtree_com[int(m.body_rootid[bodyid])]
  offset = point[None, :] - ref[None, :]
  jac = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset)
  mask = jnp.asarray(m.body_dof_mask[bodyid], dtype)
  return (jac * mask[:, None]).T


def _rot_jac_single(m: Model, d: Data, bodyid: int):
  """Rotational Jacobian (3, nv) of a static body."""
  dtype = d.qpos.dtype
  mask = jnp.asarray(m.body_dof_mask[bodyid], dtype)
  return (d.cdof[:, :3] * mask[:, None]).T


def _equality_rows(m: Model, d: Data):
  """Equality constraint rows (mjEQ_CONNECT/WELD/JOINT; mj_makeConstraint).

  Always active (two-sided quadratic penalty in the solver).
  """
  if m.neq == 0:
    return None
  from mujoco_mpc_tpu.physics import math as _mm
  dtype = d.qpos.dtype
  js, poss, refs, imps, diags = [], [], [], [], []
  EQ_CONNECT, EQ_WELD, EQ_JOINT = 0, 1, 2
  for e in range(m.neq):
    etype = int(m.eq_type[e])
    o1, o2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
    data = m.eq_data[e]
    solref, solimp = m.eq_solref[e], m.eq_solimp[e]
    if etype == EQ_CONNECT:
      anchor1 = data[0:3]
      anchor2 = data[3:6]
      p1 = d.xpos[o1] + d.xmat[o1] @ anchor1
      p2 = d.xpos[o2] + d.xmat[o2] @ anchor2
      pos = p1 - p2  # (3,)
      jac = _point_jac_single(m, d, p1, o1) - \
          _point_jac_single(m, d, p2, o2)
      iw = m.body_invweight0[o1, 0] + m.body_invweight0[o2, 0]
      for k in range(3):
        js.append(jac[k])
        poss.append(pos[k])
        refs.append(solref)
        imps.append(solimp)
        diags.append(iw)
    elif etype == EQ_WELD:
      anchor1 = data[0:3]
      anchor2 = data[3:6]
      relpose_quat = data[6:10]
      torquescale = data[10]
      p1 = d.xpos[o1] + d.xmat[o1] @ anchor2  # note: weld anchors per spec
      p2 = d.xpos[o2] + d.xmat[o2] @ anchor1
      pos = p1 - p2
      jac = _point_jac_single(m, d, p1, o1) - \
          _point_jac_single(m, d, p2, o2)
      # orientation: quat difference q1^-1 * q2 * relpose vs identity
      q1, q2 = d.xquat[o1], d.xquat[o2]
      qtarget = _mm.mul_quat(q2, _mm.normalize_quat(relpose_quat))
      rot_err = _mm.quat_sub(q1, qtarget) * torquescale
      rjac = (_rot_jac_single(m, d, o1) -
              _rot_jac_single(m, d, o2)) * torquescale
      iw_t = m.body_invweight0[o1, 0] + m.body_invweight0[o2, 0]
      iw_r = m.body_invweight0[o1, 1] + m.body_invweight0[o2, 1]
      for k in range(3):
        js.append(jac[k])
        poss.append(pos[k])
        refs.append(solref)
        imps.append(solimp)
        diags.append(iw_t)
      for k in range(3):
        js.append(rjac[k])
        poss.append(rot_err[k])
        refs.append(solref)
        imps.append(solimp)
        diags.append(iw_r)
    elif etype == EQ_JOINT:
      # q1 - q1_0 = poly(q2 - q2_0); single scalar row
      qadr1 = int(m.jnt_qposadr[o1])
      dadr1 = int(m.jnt_dofadr[o1])
      poly = data[0:5]
      if o2 >= 0:
        qadr2 = int(m.jnt_qposadr[o2])
        dadr2 = int(m.jnt_dofadr[o2])
        dif = d.qpos[qadr2] - m.qpos0[qadr2]
        pval = poly[0] + dif * (poly[1] + dif * (
            poly[2] + dif * (poly[3] + dif * poly[4])))
        dval = poly[1] + dif * (2 * poly[2] + dif * (
            3 * poly[3] + dif * 4 * poly[4]))
        pos = d.qpos[qadr1] - m.qpos0[qadr1] - pval
        row = jnp.zeros(m.nv, dtype).at[dadr1].set(1.0).at[dadr2].set(-dval)
        iw = m.dof_invweight0[dadr1] + m.dof_invweight0[dadr2]
      else:
        pos = d.qpos[qadr1] - m.qpos0[qadr1] - poly[0]
        row = jnp.zeros(m.nv, dtype).at[dadr1].set(1.0)
        iw = m.dof_invweight0[dadr1]
      js.append(row)
      poss.append(pos)
      refs.append(solref)
      imps.append(solimp)
      diags.append(iw)
  if not js:
    return None
  return (jnp.stack(js), jnp.stack(poss), jnp.stack(refs),
          jnp.stack(imps), jnp.stack([jnp.asarray(x, dtype)
                                      for x in diags]))


def _tendon_limit_rows(m: Model, d: Data):
  """Tendon-limit rows: 2 per limited tendon, J = ±ten_J (mj_tendon +
  mjCNSTR_LIMIT_TENDON semantics)."""
  dtype = d.qpos.dtype
  ts = [t for t in range(m.ntendon) if m.tendon_limited[t]]
  if not ts:
    return None
  rows_j, rows_pos, rows_ref, rows_imp, rows_diag = [], [], [], [], []
  for t in ts:
    for side in (0, 1):
      if side == 0:
        dist = d.ten_length[t] - m.tendon_range[t, 0]
        ej = d.ten_J[t]
      else:
        dist = m.tendon_range[t, 1] - d.ten_length[t]
        ej = -d.ten_J[t]
      rows_j.append(ej)
      rows_pos.append(dist - m.tendon_margin[t])
      rows_ref.append(m.tendon_solref_lim[t])
      rows_imp.append(m.tendon_solimp_lim[t])
      rows_diag.append(m.tendon_invweight0[t])
  return (jnp.stack(rows_j), jnp.stack(rows_pos), jnp.stack(rows_ref),
          jnp.stack(rows_imp), jnp.stack(rows_diag))


def _friction_rows(m: Model, d: Data):
  """Dof friction-loss rows: |force| <= frictionloss, Huber cost in the
  solver (mjCNSTR_FRICTION_DOF)."""
  import numpy as np
  dtype = d.qpos.dtype
  idx = np.where(np.asarray(jax.device_get(m.dof_frictionloss)) > 0)[0]
  if len(idx) == 0:
    return None
  nfr = len(idx)
  rows = jnp.zeros((nfr, m.nv), dtype).at[np.arange(nfr), idx].set(1.0)
  pos = jnp.zeros(nfr, dtype)
  solref = jnp.tile(jnp.asarray([0.02, 1.0], dtype)[None], (nfr, 1))
  solimp = jnp.tile(
      jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype)[None], (nfr, 1))
  diag = m.dof_invweight0[idx]
  floss = m.dof_frictionloss[idx]
  return rows, pos, solref, solimp, diag, floss


def make_constraint(m: Model, d: Data) -> Data:
  """Assemble fixed-size efc_{J, D, aref, pos} (positions stage)."""
  dtype = d.qpos.dtype
  eq = _equality_rows(m, d)
  fr = _friction_rows(m, d)
  lim = _limit_rows(m, d)
  contact, con = _contact_rows(m, d)

  js, poss, refs, imps, gates, diags, eqs, flosses = \
      [], [], [], [], [], [], [], []
  if fr is not None:
    fj, fp, fref, fimp, fd, floss = fr
    js.append(fj)
    poss.append(fp)
    refs.append(fref)
    imps.append(fimp)
    gates.append(jnp.full(fp.shape, -1.0, dtype))  # always active
    diags.append(fd)
    eqs.append(jnp.zeros(fp.shape, dtype))
    flosses.append(floss)
  if eq is not None:
    ej, ep, er, ei, ed = eq
    js.append(ej)
    poss.append(ep)
    refs.append(er)
    imps.append(ei)
    gates.append(jnp.full(ep.shape, -1.0, dtype))  # always active
    diags.append(ed)
    eqs.append(jnp.ones(ep.shape, dtype))
    flosses.append(jnp.zeros(ep.shape, dtype))
  if lim is not None:
    lj, lp, lr, li, ld = lim
    js.append(lj)
    poss.append(lp)
    refs.append(lr)
    imps.append(li)
    gates.append(lp)  # limit active iff pos < 0
    diags.append(ld)
    eqs.append(jnp.zeros(lp.shape, dtype))
    flosses.append(jnp.zeros(lp.shape, dtype))
  tlim = _tendon_limit_rows(m, d)
  if tlim is not None:
    tj, tp, tr, ti, td = tlim
    js.append(tj)
    poss.append(tp)
    refs.append(tr)
    imps.append(ti)
    gates.append(tp)
    diags.append(td)
    eqs.append(jnp.zeros(tp.shape, dtype))
    flosses.append(jnp.zeros(tp.shape, dtype))
  if con is not None:
    cj, cpos, cr, ci, cg, cd = con
    js.append(cj)
    poss.append(cpos)
    refs.append(cr)
    imps.append(ci)
    gates.append(cg)
    diags.append(cd)
    eqs.append(jnp.zeros(cpos.shape, dtype))
    flosses.append(jnp.zeros(cpos.shape, dtype))

  if not js:
    z = jnp.zeros((0,), dtype)
    z2 = jnp.zeros((0, 2), dtype)
    z5 = jnp.zeros((0, 5), dtype)
    return d.replace(
        contact=contact, efc_J=jnp.zeros((0, m.nv), dtype), efc_pos=z,
        efc_solref=z2, efc_solimp=z5, efc_diag=z, efc_gate=z, efc_D=z,
        efc_aref=z, efc_eq=z, efc_floss=z)

  return d.replace(
      contact=contact,
      efc_J=jnp.concatenate(js),
      efc_pos=jnp.concatenate(poss),
      efc_solref=jnp.concatenate(refs),
      efc_solimp=jnp.concatenate(imps),
      efc_gate=jnp.concatenate(gates),
      efc_diag=jnp.concatenate(diags),
      efc_eq=jnp.concatenate(eqs),
      efc_floss=jnp.concatenate(flosses))


def reference_constraint(m: Model, d: Data) -> Data:
  """Velocity-stage: aref and D for all rows (mj_fwdVelocity part)."""
  dtype = d.qpos.dtype
  if d.efc_J.shape[0] == 0:
    return d
  jv = d.efc_J @ d.qvel
  aref, imp = _kbi(d.efc_solref, d.efc_solimp, d.efc_pos, jv)
  r = jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL) *
                  jnp.maximum(d.efc_diag, _MINVAL), _MINVAL)
  gate = (d.efc_gate < 0).astype(dtype)
  return d.replace(efc_D=gate / r, efc_aref=aref)


def efc_force_at(d: Data, qacc: jax.Array) -> jax.Array:
  """Explicit constraint force at a GIVEN acceleration.

  The soft convex model makes constraint force a closed-form function of
  jar = J qacc - aref (mj_invConstraint semantics, engine_inverse.c):
  inequality rows push only while jar < 0, equality rows always,
  friction-loss rows follow the Huber clip. This is both the final force
  readout of the forward solve and the whole of INVERSE dynamics'
  constraint stage (physics/inverse.py; reference mj_inverse feeding the
  Direct force residual, docs/DIRECT.md:12-63).

  Requires Data after the position+velocity stages (efc_J/D/aref set).
  """
  dtype = qacc.dtype
  dvec = d.efc_D
  eq_mask = d.efc_eq if d.efc_eq is not None else jnp.zeros_like(dvec)
  floss = d.efc_floss if d.efc_floss is not None else jnp.zeros_like(dvec)
  fr_mask = (floss > 0).astype(dtype)
  jar = d.efc_J @ qacc - d.efc_aref
  base_active = jnp.maximum((jar < 0).astype(dtype), eq_mask) * dvec
  f_lin = dvec * jar
  g = jnp.where(fr_mask > 0, jnp.clip(f_lin, -floss, floss),
                base_active * jar)
  return -g


def solve(m: Model, d: Data) -> Data:
  """Primal Newton solve for constrained qacc."""
  iterations = m.opt.iterations
  ls_iterations = m.opt.ls_iterations
  dtype = d.qpos.dtype
  nv = m.nv
  nefc = d.efc_J.shape[0] if d.efc_J is not None else 0
  if nefc == 0:
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros(nv, dtype),
        efc_force=jnp.zeros((0,), dtype))

  mass = d.qM
  j = d.efc_J
  dvec = d.efc_D
  aref = d.efc_aref
  a0 = d.qacc_smooth

  eq_mask = d.efc_eq if d.efc_eq is not None else jnp.zeros_like(dvec)
  floss = d.efc_floss if d.efc_floss is not None else jnp.zeros_like(dvec)
  fr_mask = (floss > 0).astype(dtype)

  def grad_weight(jar):
    """Per-row cost gradient g(jar) and curvature weight h(jar).

    inequality: quadratic one-sided; equality: quadratic two-sided;
    friction-loss: Huber with force bound +-floss."""
    base_active = jnp.maximum((jar < 0).astype(dtype), eq_mask) * dvec
    f_lin = dvec * jar
    g = jnp.where(fr_mask > 0, jnp.clip(f_lin, -floss, floss),
                  base_active * jar)
    h = jnp.where(fr_mask > 0,
                  dvec * (jnp.abs(f_lin) < floss).astype(dtype),
                  base_active)
    return g, h

  def newton_step(a):
    jar = j @ a - aref
    g, hw = grad_weight(jar)
    grad = mass @ (a - a0) + j.T @ g
    h = mass + (j.T * hw) @ j
    # damped Cholesky (tiny jitter for robustness in f32)
    h = h + 1e-8 * jnp.eye(nv, dtype=dtype)
    chol = jnp.linalg.cholesky(h)
    y = jax.scipy.linalg.solve_triangular(chol, grad, lower=True)
    p = -jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    # exact-ish line search: 1-D Newton on piecewise-quadratic phi(t)
    jp = j @ p
    pmp = p @ (mass @ p)
    pma = p @ (mass @ (a - a0))

    def ls_body(_, t):
      jart = jar + t * jp
      gt, ht = grad_weight(jart)
      dphi = pma + t * pmp + jnp.sum(gt * jp)
      ddphi = pmp + jnp.sum(ht * jp * jp)
      return t - dphi / jnp.maximum(ddphi, _MINVAL)

    t = jax.lax.fori_loop(0, ls_iterations, ls_body, jnp.ones((), dtype))
    return a + t * p

  a = jax.lax.fori_loop(0, iterations, lambda _, a: newton_step(a), a0)

  efc_force = efc_force_at(d, a)
  qfrc_constraint = j.T @ efc_force
  # recompute final qacc consistently: M qacc = qfrc_smooth + qfrc_constraint
  qacc = S.solve_m(m, d, d.qfrc_smooth + qfrc_constraint)
  d = d.replace(
      qacc=qacc, qfrc_constraint=qfrc_constraint, efc_force=efc_force)

  # decode contact-frame forces from the pyramidal tail rows
  # (mj_contactForce semantics for pyramidal cones): contact rows are
  # appended LAST by make_constraint, 4 rows per selected contact in
  # (mu0+, mu0-, mu1+, mu1-) order; lam >= 0 when active.
  # f_n = sum(lam); f_ti = mu_i (lam_i+ - lam_i-).
  if d.contact is not None and d.contact.dist is not None:
    k = d.contact.dist.shape[0]
    if k > 0 and nefc >= 4 * k:
      lam = efc_force[nefc - 4 * k:].reshape(k, 2, 2)
      mu = d.contact.friction[:, :2]
      f_n = jnp.sum(lam, axis=(1, 2))
      f_t = mu * (lam[:, :, 0] - lam[:, :, 1])
      d = d.replace(contact=d.contact.replace(
          force=jnp.concatenate([f_n[:, None], f_t], axis=1)))
  return d
