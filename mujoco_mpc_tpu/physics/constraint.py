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

Friction supports both cone types at condim 1/3/4/6 (mj_makeConstraint
semantics, oracle-matched against C MuJoCo):
  * pyramidal: 2*(condim-1) rows per contact, Jn +/- mu_a J_a per axis
    (tangent, torsion, rolling); condim-1 contacts degrade to pure normal
    rows.
  * elliptic: condim raw rows per contact; the solver treats each contact
    as one convex cone cost with bottom/middle/top zones and
    mu_eff = friction[0]/sqrt(impratio) (see _elliptic_terms).
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


# minimum condim at which friction axis a (t1, t2, torsion, roll1, roll2)
# exists (mjtConDim semantics: condim in {1, 3, 4, 6})
_AXIS_MIN_CONDIM = np.array([3, 3, 4, 6, 6])


def contact_layout(m: Model) -> tuple[int, int, int]:
  """Static contact-block layout: (k, namax, rows_per_contact).

  k = selected contact count; namax = friction axes built per contact
  (max condim - 1, min 2); rows: pyramidal 2*namax, elliptic 1 + namax.
  """
  cp = m.collision_pairs
  if cp is None or cp.ncon == 0:
    return 0, 0, 0
  k = min(m.opt.max_contact_points, cp.ncon)
  namax = max(2, int(cp.con_condim.max()) - 1)
  nrow = (1 + namax) if m.opt.cone == 1 else 2 * namax
  return k, namax, nrow


def _contact_rows(m: Model, d: Data):
  """Contact rows from the static candidate-contact set.

  condim 1/3/4/6 with pyramidal or elliptic cones (mj_makeConstraint
  semantics, oracle-matched against C MuJoCo 3.10 — see
  tests/test_physics_oracle.py condim suite):

  * pyramidal: 2*(condim-1) rows per contact, (axis+, axis-) per friction
    axis, J = Jn +/- mu_a * J_a; torsion/rolling axes use the rotational
    relative Jacobian in the contact frame. All rows of a contact share
    diag = invw * 2*mu0^2*(1+mu0^2). condim-1 contacts become two pure
    normal rows with diag = 2*invw each (equivalent to one frictionless
    row with diag = invw).
  * elliptic: condim raw rows (normal + friction axes); friction rows get
    aref = -B*jv (no spring term) and D_i = D_N * (mu_i/mu_eff)^2 with
    mu_eff = mu0/sqrt(impratio) — encoded via efc_fri for
    reference_constraint.

  TPU optimization: only the `max_contacts` deepest candidates are kept
  (static top-k — contacts beyond the cap are virtually never active for
  robotics models where the candidate pair list is dominated by never-
  touching link pairs). Jacobians are computed only for the selected set,
  shrinking the solver system ~4-25x. Rows of friction axes a contact's
  condim doesn't reach are masked (gate > 0 => D = 0), keeping all shapes
  static under jit/vmap with mixed-condim models.
  """
  cp = m.collision_pairs
  if cp is None or cp.ncon == 0:
    return None, None
  dtype = d.qpos.dtype
  dist, pos, n = coll.collide(m, d)
  frame = coll.make_contact_frame(n)  # (ncand, 3, 3)

  incmargin = jnp.asarray(cp.con_includemargin, dtype)
  gap = dist - incmargin  # gating distance; row active iff < 0

  k, namax, nrow = contact_layout(m)
  elliptic = m.opt.cone == 1
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
  condim_s = jnp.asarray(cp.con_condim)[sel]  # (k,) int

  b1_all = jnp.asarray(m.geom_bodyid[cp.con_geom1])
  b2_all = jnp.asarray(m.geom_bodyid[cp.con_geom2])
  b1 = b1_all[sel]
  b2 = b2_all[sel]

  mu0 = friction[:, 0]
  mu_eff = mu0 / jnp.sqrt(jnp.maximum(m.opt.impratio, _MINVAL))
  contact = Contact(
      dist=dist[sel], pos=pos_s, frame=frame_s,
      includemargin=incmargin[sel], friction=friction, solref=solref,
      solimp=solimp, geom1=None, geom2=None,
      geom1_id=jnp.asarray(cp.con_geom1)[sel],
      geom2_id=jnp.asarray(cp.con_geom2)[sel],
      body1=b1, body2=b2, dim=condim_s, mu_eff=mu_eff,
      cone=int(m.opt.cone), namax=namax)
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

  # friction-axis Jacobians: tangent translations, then (condim > 3)
  # torsion/rolling from the rotational relative Jacobian
  if namax > 2:
    def rjac(bid):
      return (d.cdof[:, :3] * bdm[bid][:, None]).T  # (3, nv)

    jr_rel = jax.vmap(rjac)(b2) - jax.vmap(rjac)(b1)  # (k, 3, nv)
    jr = jnp.einsum("cab,cbv->cav", frame_s, jr_rel)  # torsion, roll1/2
    axes_j = jnp.concatenate(
        [jc[:, 1:3], jr[:, 0:1], jr[:, 1:3]], axis=1)[:, :namax]
  else:
    axes_j = jc[:, 1:3]  # (k, 2, nv)

  invw = invw0[b1] + invw0[b2]  # (k,)
  mu_ax = friction[:, :namax]   # (k, namax): [t0, t1, tors, r0, r1]
  axis_min = jnp.asarray(_AXIS_MIN_CONDIM[:namax])
  axis_ok = condim_s[:, None] >= axis_min[None, :]  # (k, namax)
  is_c1 = condim_s == 1
  axis0 = jnp.arange(namax) == 0

  if not elliptic:
    # condim-1 contacts ride axis 0 as two pure normal rows (mu = 0)
    mu_row = jnp.where(is_c1[:, None] & axis0[None, :], 0.0, mu_ax)
    row_ok = axis_ok | (is_c1[:, None] & axis0[None, :])
    jn = jc[:, 0:1, :]
    plus = jn + mu_row[..., None] * axes_j     # (k, namax, nv)
    minus = jn - mu_row[..., None] * axes_j
    rows_j = jnp.stack([plus, minus], axis=2).reshape(k * nrow, m.nv)
    # all rows of a pyramidal contact share the friction[0]-based diag;
    # impratio stiffens the pyramid rows (D scales linearly with it,
    # oracle-verified), frictionless contacts are unaffected
    diag_c = jnp.where(
        is_c1, 2.0 * invw,
        invw * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) /
        jnp.maximum(m.opt.impratio, _MINVAL))
    diag = jnp.repeat(diag_c, nrow)
    gate = jnp.where(row_ok, gap[:, None], 1.0)
    gate = jnp.stack([gate, gate], axis=2).reshape(k * nrow)
    fri = jnp.zeros(k * nrow, dtype)
  else:
    rows_j = jnp.concatenate([jc[:, 0:1, :], axes_j],
                             axis=1).reshape(k * nrow, m.nv)
    diag = jnp.repeat(invw, nrow)
    row_ok = jnp.concatenate(
        [jnp.ones((k, 1), bool), axis_ok], axis=1)
    gate = jnp.where(row_ok, gap[:, None], 1.0).reshape(k * nrow)
    # efc_fri: friction rows marked with their D scale wrt the normal row
    ratio = mu_ax / jnp.maximum(mu_eff[:, None], _MINVAL)
    fri = jnp.concatenate(
        [jnp.zeros((k, 1), dtype),
         jnp.maximum(ratio * ratio, 1e-20)], axis=1).reshape(k * nrow)

  rows_pos = jnp.repeat(gap, nrow)
  rows_ref = jnp.repeat(solref, nrow, axis=0)
  rows_imp = jnp.repeat(solimp, nrow, axis=0)
  out = (rows_j, rows_pos, rows_ref, rows_imp, gate, diag, fri)
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
  fris = [jnp.zeros(x[1].shape, dtype) for x in (fr, eq, lim)
          if x is not None]
  if tlim is not None:
    fris.append(jnp.zeros(tlim[1].shape, dtype))
  if con is not None:
    cj, cpos, cr, ci, cg, cd, cfri = con
    js.append(cj)
    poss.append(cpos)
    refs.append(cr)
    imps.append(ci)
    gates.append(cg)
    diags.append(cd)
    eqs.append(jnp.zeros(cpos.shape, dtype))
    flosses.append(jnp.zeros(cpos.shape, dtype))
    fris.append(cfri)

  if not js:
    z = jnp.zeros((0,), dtype)
    z2 = jnp.zeros((0, 2), dtype)
    z5 = jnp.zeros((0, 5), dtype)
    return d.replace(
        contact=contact, efc_J=jnp.zeros((0, m.nv), dtype), efc_pos=z,
        efc_solref=z2, efc_solimp=z5, efc_diag=z, efc_gate=z, efc_D=z,
        efc_aref=z, efc_eq=z, efc_floss=z, efc_fri=z)

  return d.replace(
      contact=contact,
      efc_J=jnp.concatenate(js),
      efc_pos=jnp.concatenate(poss),
      efc_solref=jnp.concatenate(refs),
      efc_solimp=jnp.concatenate(imps),
      efc_gate=jnp.concatenate(gates),
      efc_diag=jnp.concatenate(diags),
      efc_eq=jnp.concatenate(eqs),
      efc_floss=jnp.concatenate(flosses),
      efc_fri=jnp.concatenate(fris))


def reference_constraint(m: Model, d: Data) -> Data:
  """Velocity-stage: aref and D for all rows (mj_fwdVelocity part).

  Elliptic-cone friction rows (efc_fri > 0) follow mj_makeConstraint's
  elliptic semantics (oracle-verified): aref = -B*jv (no spring term —
  their constraint "position" is identically zero) and D scaled by
  (mu_i/mu_eff)^2 from the contact's normal-row D.
  """
  dtype = d.qpos.dtype
  if d.efc_J.shape[0] == 0:
    return d
  jv = d.efc_J @ d.qvel
  aref, imp = _kbi(d.efc_solref, d.efc_solimp, d.efc_pos, jv)
  r = jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL) *
                  jnp.maximum(d.efc_diag, _MINVAL), _MINVAL)
  gate = (d.efc_gate < 0).astype(dtype)
  dvec = gate / r
  if d.efc_fri is not None:
    is_fri = d.efc_fri > 0
    # friction rows reuse the contact impedance (same solimp, same pos as
    # the normal row => same imp/r) but drop the K*imp*pos spring term
    timeconst = d.efc_solref[..., 0]
    dmax = jnp.clip(d.efc_solimp[..., 1], _MINIMP, _MAXIMP)
    use_std = (timeconst > 0) & (d.efc_solref[..., 1] > 0)
    b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
    b_dir = -d.efc_solref[..., 1] / jnp.maximum(dmax, _MINVAL)
    b = jnp.where(use_std, b_std, b_dir)
    aref = jnp.where(is_fri, -b * jv, aref)
    dvec = jnp.where(is_fri, dvec * d.efc_fri, dvec)
  return d.replace(efc_D=dvec, efc_aref=aref)


def _elliptic_layout(d: Data):
  """Static elliptic contact-tail layout (k, namax, nrow) or None."""
  c = d.contact
  if c is None or c.cone != 1 or c.dist is None:
    return None
  k = c.dist.shape[0]
  if k == 0:
    return None
  namax = c.namax
  return k, namax, 1 + namax


def _elliptic_terms(d: Data, jar_blk: jax.Array, dblk: jax.Array):
  """Per-contact elliptic cone cost expansion (mj_constraintUpdate
  semantics, oracle-matched incl. impratio and condim 4/6).

  Zones in the scaled space s_i = jar_i * mu_i / mu_eff, n = jar_normal,
  t = ||s||, mu = mu_eff:
    bottom (mu*n + t <= 0): full per-row quadratic (g = D*jar);
    top    (n >= mu*t):     zero force;
    middle:                 cost 0.5 * D_N/(1+mu^2) * (n - mu*t)^2.

  The middle-zone cost is convex with exact Hessian
      w_coef * (gz gz^T + |z| * mu / t * (diag(scale^2) - cs cs^T))
  on the friction block (the cone Hessian — MuJoCo's flg_coneHessian);
  dropping the second term makes Newton overshoot and oscillate.

  Returns (g (k,nrow) row gradients, h (k,nrow) diagonal curvature incl.
  the cone diagonal, w_mid (k,) weight of the +gz gz^T rank-1 term,
  gz (k,nrow), w_neg (k,) weight of the -cs cs^T rank-1 term,
  cs (k,nrow) its row direction).
  """
  c = d.contact
  namax = c.namax
  dtype = jar_blk.dtype
  mu = c.mu_eff
  axis_ok = (c.dim[:, None] >=
             jnp.asarray(_AXIS_MIN_CONDIM[:namax])[None, :])
  scale = (c.friction[:, :namax] /
           jnp.maximum(mu[:, None], _MINVAL)) * axis_ok
  n = jar_blk[:, 0]
  s = jar_blk[:, 1:] * scale
  t = jnp.sqrt(jnp.sum(s * s, axis=1))
  tsafe = jnp.maximum(t, 1e-12)
  bottom = (mu * n + t <= 0.0)
  middle = (~bottom) & (n < mu * t)
  dn = dblk[:, 0]
  w_coef = dn / (1.0 + mu * mu)
  z = n - mu * t
  shat = s / tsafe[:, None]
  zeros1 = jnp.zeros((jar_blk.shape[0], 1), dtype)
  gz = jnp.concatenate(
      [jnp.ones((jar_blk.shape[0], 1), dtype),
       -(mu[:, None]) * shat * scale], axis=1)  # (k, nrow)
  cs = jnp.concatenate([zeros1, shat * scale], axis=1)
  g = (jnp.where(bottom[:, None], dblk * jar_blk, 0.0) +
       jnp.where(middle[:, None], (w_coef * z)[:, None] * gz, 0.0))
  # cone curvature weight |z| mu / t (z < 0 throughout the middle zone)
  w_cone = jnp.where(middle, w_coef * (-z) * mu / tsafe, 0.0)
  h = jnp.where(bottom[:, None], dblk, 0.0)
  cone_diag = jnp.concatenate([zeros1, scale * scale], axis=1)
  h = h + w_cone[:, None] * cone_diag
  w_mid = jnp.where(middle, w_coef, 0.0)
  return g, h, w_mid, gz, w_cone, cs


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
  lay = _elliptic_layout(d)
  if lay is not None:
    k, namax, nrow = lay
    ncr = k * nrow
    g_blk = _elliptic_terms(
        d, jar[-ncr:].reshape(k, nrow), dvec[-ncr:].reshape(k, nrow))[0]
    g = g.at[-ncr:].set(g_blk.reshape(-1))
  return -g


def _qcqp_clamp(a_c, w, jar, f0, rad, eps=1e-10):
  """min 0.5 d^T A d + jar^T d  s.t.  (f0+d)^T W (f0+d) <= rad^2
  (mju_QCQP semantics, any friction dimension count).

  Unconstrained solve first; on violation, Newton on the scalar
  multiplier lam of d(lam) = (A + lam W)^-1 (-jar - lam W f0)."""
  dtype = jar.dtype
  nf = jar.shape[0]
  eye = jnp.eye(nf, dtype=dtype)
  a_r = a_c + eps * eye

  def dsolve(lam):
    return jnp.linalg.solve(a_r + lam * jnp.diag(w),
                            -jar - lam * w * f0)

  d0 = dsolve(0.0)
  r2 = rad * rad

  def newton(lam, _):
    f = f0 + dsolve(lam)
    val = jnp.sum(w * f * f) - r2
    # df/dlam = -(A + lam W)^-1 W f
    dfd = -jnp.linalg.solve(a_r + lam * jnp.diag(w), w * f)
    dval = 2.0 * jnp.sum(w * f * dfd)
    lam_new = lam - val / jnp.where(jnp.abs(dval) < _MINVAL,
                                    -1.0, dval)
    return jnp.maximum(lam_new, 0.0), None

  lam_star, _ = jax.lax.scan(newton, jnp.zeros((), dtype), None,
                             length=12)
  d_clamped = dsolve(lam_star)
  f_uncon = f0 + d0
  violated = jnp.sum(w * f_uncon * f_uncon) > r2
  return jnp.where(violated, d_clamped, d0)


def _noslip(m: Model, d: Data) -> Data:
  """Noslip post-solver (mj_solNoSlip semantics, oracle-matched): for
  each active contact, update friction forces by solving the
  UNREGULARIZED block system A_ff delta = -jar_f (A = Jf M^-1 Jf^T — no
  impedance R, so sticking contacts stop drifting), clamped onto the
  friction cone sum_i (f_i/mu_i)^2 <= f_n^2; Gauss-Seidel over contacts,
  opt.noslip_iterations sweeps. Pyramidal contacts run in net-tangential
  variables y_a = mu_a (lam_a+ - lam_a-) with the oracle-verified decode
  lam_a± = f_n/(2 namax) ± y_a/(2 mu_a). Contact friction only (dof
  friction loss is not swept; none of the registered models combine
  both). Verified against C MuJoCo at impratio=1 (the reference
  noslip user, fingers/task.xml, leaves impratio default)."""
  c = d.contact
  if c is None or c.dist is None or c.dist.shape[0] == 0:
    return d
  k = c.dist.shape[0]
  namax = c.namax
  elliptic = c.cone == 1
  nrow = (1 + namax) if elliptic else 2 * namax
  nefc = d.efc_J.shape[0]
  ncr = k * nrow
  dtype = d.qpos.dtype

  j_blk = d.efc_J[nefc - ncr:].reshape(k, nrow, m.nv)
  aref_blk = d.efc_aref[nefc - ncr:].reshape(k, nrow)
  force_blk = d.efc_force[nefc - ncr:].reshape(k, nrow)
  gap_blk = d.efc_gate[nefc - ncr:].reshape(k, nrow)
  mu_ax = c.friction[:, :namax]
  mu_safe = jnp.maximum(mu_ax, _MINVAL)
  axis_ok = (c.dim[:, None] >=
             jnp.asarray(_AXIS_MIN_CONDIM[:namax])[None, :])

  if elliptic:
    jf = j_blk[:, 1:]
    aref_f = aref_blk[:, 1:]
    f_f = force_blk[:, 1:]
    f_n = force_blk[:, 0]
  else:
    plus = j_blk[:, 0::2]
    minus = j_blk[:, 1::2]
    jf = (plus - minus) / (2.0 * mu_safe[..., None])
    aref_f = (aref_blk[:, 0::2] - aref_blk[:, 1::2]) / (2.0 * mu_safe)
    lam = force_blk.reshape(k, namax, 2)
    f_f = mu_ax * (lam[..., 0] - lam[..., 1])
    f_n = jnp.sum(lam, axis=(1, 2))
    # per-axis bound |y_a| <= mu_a * s_a with the pair sum s_a FROZEN
    # (oracle-verified: pair sums are preserved exactly by noslip)
    pair_sum = lam[..., 0] + lam[..., 1]

  if elliptic:
    # only STICKING contacts are swept (oracle-verified: a gross-slip
    # contact — middle zone — keeps its solved forces)
    scale_zone = (mu_ax / jnp.maximum(c.mu_eff[:, None], _MINVAL)
                  ) * axis_ok
    jar_blk0 = jnp.einsum("krn,n->kr", j_blk, d.qacc) - aref_blk
    s0 = jar_blk0[:, 1:] * scale_zone
    t0 = jnp.sqrt(jnp.sum(s0 * s0, axis=1))
    sticking = c.mu_eff * jar_blk0[:, 0] + t0 <= 0.0
  else:
    # pyramidal sliding freezes via the per-axis box clamp itself
    sticking = jnp.ones((k,), bool)
  active = (gap_blk[:, 0] < 0) & (f_n > _MINVAL) & sticking
  ok = axis_ok & active[:, None]
  jf = jf * ok[..., None]
  w = jnp.where(ok, 1.0 / (mu_safe * mu_safe), 0.0)

  # M^-1 Jf^T per row, and per-contact A blocks (masked rows are zero;
  # their A diagonal is identity-patched so the block solve stays SPD)
  mjf = jax.vmap(lambda r: S.solve_m(m, d, r))(
      jf.reshape(k * namax, m.nv)).reshape(k, namax, m.nv)
  a_blk = jnp.einsum("kan,kbn->kab", jf, mjf)
  eye = jnp.eye(namax, dtype=dtype)
  a_blk = a_blk + (1.0 - ok.astype(dtype))[:, :, None] * eye[None]

  nsweep = m.opt.noslip_iterations

  if not elliptic:
    ybound = mu_ax * pair_sum  # (k, namax)

  def body(i, state):
    qacc, f = state
    ci = i % k
    jf_c = jax.lax.dynamic_index_in_dim(jf, ci, keepdims=False)
    mjf_c = jax.lax.dynamic_index_in_dim(mjf, ci, keepdims=False)
    a_c = jax.lax.dynamic_index_in_dim(a_blk, ci, keepdims=False)
    aref_c = jax.lax.dynamic_index_in_dim(aref_f, ci, keepdims=False)
    f_c = jax.lax.dynamic_index_in_dim(f, ci, keepdims=False)
    fn_c = jax.lax.dynamic_index_in_dim(f_n, ci, keepdims=False)
    ok_c = jax.lax.dynamic_index_in_dim(ok, ci, keepdims=False)
    if elliptic:
      w_c = jax.lax.dynamic_index_in_dim(w, ci, keepdims=False)
      jar_c = (jf_c @ qacc - aref_c) * ok_c
      delta = _qcqp_clamp(a_c, w_c, jar_c, f_c, fn_c) * ok_c
      qacc = qacc + jnp.einsum("an,a->n", mjf_c, delta)
      f = jax.lax.dynamic_update_index_in_dim(f, f_c + delta, ci,
                                              axis=0)
      return qacc, f
    # pyramidal: box-clamped coordinate descent over friction axes
    # (|y_a| <= mu_a * s_a); two inner passes per contact visit
    yb_c = jax.lax.dynamic_index_in_dim(ybound, ci, keepdims=False)
    for _ in range(2):
      for a in range(namax):
        jar_a = (jf_c[a] @ qacc - aref_c[a]) * ok_c[a]
        step = -jar_a / jnp.maximum(a_c[a, a], _MINVAL)
        y_new = jnp.clip(f_c[a] + step, -yb_c[a], yb_c[a])
        dy = (y_new - f_c[a]) * ok_c[a]
        qacc = qacc + mjf_c[a] * dy
        f_c = f_c.at[a].add(dy)
    f = jax.lax.dynamic_update_index_in_dim(f, f_c, ci, axis=0)
    return qacc, f

  qacc, f_f = jax.lax.fori_loop(0, nsweep * k, body, (d.qacc, f_f))

  # write the updated friction forces back into the efc tail
  if elliptic:
    force_new = jnp.concatenate([force_blk[:, :1], f_f], axis=1)
  else:
    # decode with the pair sums preserved: lam_a± = s_a/2 ± y_a/(2 mu_a)
    # (mju_decodePyramid semantics, oracle-verified)
    lam_p = 0.5 * pair_sum + f_f / (2.0 * mu_safe)
    lam_m = 0.5 * pair_sum - f_f / (2.0 * mu_safe)
    lam_new = jnp.stack([lam_p, lam_m], axis=2)
    # keep untouched rows (inactive contact / masked axis) as solved
    lam_old = force_blk.reshape(k, namax, 2)
    lam_new = jnp.where(ok[..., None], lam_new, lam_old)
    force_new = lam_new.reshape(k, nrow)

  efc_force = d.efc_force.at[nefc - ncr:].set(force_new.reshape(-1))
  qfrc = d.efc_J.T @ efc_force
  d = d.replace(qacc=qacc, efc_force=efc_force, qfrc_constraint=qfrc)
  # refresh the decoded contact-frame forces
  if elliptic:
    d = d.replace(contact=c.replace(force=force_new[:, :3]))
  else:
    lam2 = force_new.reshape(k, namax, 2)
    f_nn = jnp.sum(lam2, axis=(1, 2))
    f_t = mu_ax[:, :2] * (lam2[:, :2, 0] - lam2[:, :2, 1])
    d = d.replace(contact=c.replace(
        force=jnp.concatenate([f_nn[:, None], f_t], axis=1)))
  return d


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

  lay = _elliptic_layout(d)
  ncr = lay[0] * lay[2] if lay is not None else 0

  def grad_weight(jar):
    """Cost gradient g(jar), diagonal curvature h(jar), and the elliptic
    middle-zone rank-1 curvature (w_mid, gz) when present.

    inequality: quadratic one-sided; equality: quadratic two-sided;
    friction-loss: Huber with force bound +-floss; elliptic contact
    tail: per-contact cone zones (_elliptic_terms)."""
    base_active = jnp.maximum((jar < 0).astype(dtype), eq_mask) * dvec
    f_lin = dvec * jar
    g = jnp.where(fr_mask > 0, jnp.clip(f_lin, -floss, floss),
                  base_active * jar)
    h = jnp.where(fr_mask > 0,
                  dvec * (jnp.abs(f_lin) < floss).astype(dtype),
                  base_active)
    if lay is None:
      return g, h, None, None, None, None
    k, namax, nrow = lay
    g_blk, h_blk, w_mid, gz, w_cone, cs = _elliptic_terms(
        d, jar[-ncr:].reshape(k, nrow), dvec[-ncr:].reshape(k, nrow))
    g = g.at[-ncr:].set(g_blk.reshape(-1))
    h = h.at[-ncr:].set(h_blk.reshape(-1))
    return g, h, w_mid, gz, w_cone, cs

  def newton_step(a):
    jar = j @ a - aref
    g, hw, w_mid, gz, w_cone, cs = grad_weight(jar)
    grad = mass @ (a - a0) + j.T @ g
    h = mass + (j.T * hw) @ j
    if lay is not None:
      # middle-zone exact cone Hessian per contact:
      # H += sum_c w_mid_c v_c v_c^T - w_cone_c u_c u_c^T
      # (plus the diag(scale^2) part already folded into hw)
      j_blk = j[-ncr:].reshape(lay[0], lay[2], nv)
      v = jnp.einsum("kr,krv->kv", gz, j_blk)  # (k, nv)
      u = jnp.einsum("kr,krv->kv", cs, j_blk)
      h = h + (v.T * w_mid) @ v - (u.T * w_cone) @ u
    # damped Cholesky (tiny jitter for robustness in f32)
    h = h + 1e-8 * jnp.eye(nv, dtype=dtype)
    chol = jnp.linalg.cholesky(h)
    y = jax.scipy.linalg.solve_triangular(chol, grad, lower=True)
    p = -jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    # Safeguarded exact line search on the piecewise-quadratic phi(t).
    # phi is CONVEX, so phi'(t) is monotone nondecreasing: bracket the
    # root of phi' (expansion doublings), then Newton steps clipped into
    # the bracket with bisection fallback — globally convergent, unlike
    # bare 1-D Newton which oscillates between curvature zones on hard
    # states (deep penetration + impratio-stiffened elliptic cones) and
    # can step UPHILL, exploding the outer iteration.
    jp = j @ p
    pmp = p @ (mass @ p)
    pma = p @ (mass @ (a - a0))

    def dphi_at(t):
      jart = jar + t * jp
      gt, ht, w_mid_t, gz_t, w_cone_t, cs_t = grad_weight(jart)
      dphi = pma + t * pmp + jnp.sum(gt * jp)
      ddphi = pmp + jnp.sum(ht * jp * jp)
      if lay is not None:
        jp_blk = jp[-ncr:].reshape(lay[0], lay[2])
        vp = jnp.einsum("kr,kr->k", gz_t, jp_blk)
        up = jnp.einsum("kr,kr->k", cs_t, jp_blk)
        ddphi = ddphi + jnp.sum(w_mid_t * vp * vp) - \
            jnp.sum(w_cone_t * up * up)
      return dphi, ddphi

    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def expand(_, st):
      hi, d_hi = st
      need = d_hi < 0.0
      hi2 = jnp.where(need, hi * 4.0, hi)
      d2 = jnp.where(need, dphi_at(hi2)[0], d_hi)
      return hi2, d2

    # hi covers t* unless phi' stays negative out to 4^5 = 1024 (then the
    # final t is a large descent step anyway — still downhill).
    hi0, dhi0 = jax.lax.fori_loop(0, 5, expand, (one, dphi_at(one)[0]))
    dlo0 = dphi_at(zero)[0]

    def ls_body(_, st):
      lo, dlo, hi, dhi, t = st
      dphi, ddphi = dphi_at(t)
      neg = dphi < 0.0
      lo2 = jnp.where(neg, t, lo)
      dlo2 = jnp.where(neg, dphi, dlo)
      hi2 = jnp.where(neg, hi, t)
      dhi2 = jnp.where(neg, dhi, dphi)
      t_n = t - dphi / jnp.maximum(ddphi, _MINVAL)
      # regula falsi on the bracket (phi' is monotone piecewise
      # linear/smooth; the secant root is exact once both endpoints sit
      # on the root's segment — far faster than midpoint bisection)
      denom = dhi2 - dlo2
      t_s = lo2 - dlo2 * (hi2 - lo2) / jnp.where(
          jnp.abs(denom) < _MINVAL, one, denom)
      t_s = jnp.clip(t_s, lo2, hi2)
      inb = (t_n > lo2) & (t_n < hi2)
      return lo2, dlo2, hi2, dhi2, jnp.where(inb, t_n, t_s)

    lo, dlo, hi, dhi, t = jax.lax.fori_loop(
        0, ls_iterations, ls_body,
        (zero, dlo0, hi0, dhi0, jnp.minimum(one, hi0)))
    t = jnp.clip(t, zero, hi)
    return a + t * p

  a = jax.lax.fori_loop(0, iterations, lambda _, a: newton_step(a), a0)

  efc_force = efc_force_at(d, a)
  qfrc_constraint = j.T @ efc_force
  # recompute final qacc consistently: M qacc = qfrc_smooth + qfrc_constraint
  qacc = S.solve_m(m, d, d.qfrc_smooth + qfrc_constraint)
  d = d.replace(
      qacc=qacc, qfrc_constraint=qfrc_constraint, efc_force=efc_force)

  # decode contact-frame forces from the contact tail rows
  # (mj_contactForce semantics). Pyramidal: 2*namax rows per contact in
  # (a0+, a0-, a1+, a1-, ...) order; f_n = sum(lam),
  # f_ti = mu_i (lam_i+ - lam_i-). Elliptic: the rows ARE the
  # contact-frame forces.
  if d.contact is not None and d.contact.dist is not None:
    k = d.contact.dist.shape[0]
    namax = d.contact.namax
    if d.contact.cone == 1:
      nrow = 1 + namax
      if k > 0 and nefc >= k * nrow:
        fblk = efc_force[nefc - k * nrow:].reshape(k, nrow)
        d = d.replace(contact=d.contact.replace(force=fblk[:, :3]))
    else:
      nrow = 2 * namax
      if k > 0 and nefc >= k * nrow:
        lam = efc_force[nefc - k * nrow:].reshape(k, namax, 2)
        mu = d.contact.friction[:, :2]
        f_n = jnp.sum(lam, axis=(1, 2))
        f_t = mu * (lam[:, :2, 0] - lam[:, :2, 1])
        d = d.replace(contact=d.contact.replace(
            force=jnp.concatenate([f_n[:, None], f_t], axis=1)))
  if m.opt.noslip_iterations > 0:
    d = _noslip(m, d)
  return d
