"""Lane-parallel Pallas rollout kernel (prototype: contact-free models).

The speed-of-light design from ops/README.md, realized for the
hinge/slide/no-contact model class (cartpole, acrobot, pendulums): the
ENTIRE rollout — FK, CRB, RNE, passive, actuation, implicit-damping Euler,
for every horizon step — runs inside one Pallas kernel with candidates on
the lane axis. State never leaves VMEM between steps; HBM sees only the
initial state, the spline parameters, and the recorded trajectory.

The kernel is generated from the same static model metadata as the jnp
pipeline (physics/*), using the component-tuple math in ops/lanemath.py.
Correctness is checked against the jnp `F.step` path in tests.

Contact class: the in-kernel solver carries the model's OWN cone class
and each pair's full condim (1/3/4/6). Pyramidal models get 2 one-sided
rows per friction axis (incl. torsion/rolling); elliptic models
(m.opt.cone == 1) get per-contact elliptic cone BLOCKS — normal +
friction-axis rows solved with the exact middle-zone cone Hessian
(physics/constraint.py _elliptic_terms semantics, incl. impratio), so
the condim-6 manipulation tasks PLAN in the same contact class they
simulate (the reference plans on the simulated model:
/root/reference/mjpc/trajectory.cc:141-180 rollouts call mj_step with
the task's cone=elliptic condim-6 XML, e.g. fingers/task.xml:4).
Parity is pinned kernel-vs-pipeline in tests/test_lane_elliptic.py.
The one remaining disclosed planning reduction: the noslip post-solver
does not run in-kernel (Fingers sets noslip_iterations=5 for
simulation). The cost of the contact-SET reduction is measured and
published: BENCH_PATH=lane_full (all contact types, same kernel) vs
the default feet-only run differ ~6% on the flagship
(docs/BASELINE_PROTOCOL.md).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_mpc_tpu.ops import lanemath as lm
from mujoco_mpc_tpu.physics.model import (BIAS_NONE, FREE, GAIN_FIXED,
                                          HINGE, SLIDE, TRN_JOINT,
                                          TRN_SITE, Model)


from mujoco_mpc_tpu.physics import collision as coll


def _ground_groups(m: Model):
  """Plane-vs-{sphere,capsule,box} pair groups with a STATIC world plane."""
  if m.collision_pairs is None:
    return []
  out = []
  for g in m.collision_pairs.groups:
    if g.types[0] != coll.PLANE:
      continue
    if g.types[1] not in (coll.SPHERE, coll.CAPSULE, coll.BOX):
      continue
    if any(int(m.geom_bodyid[gid]) != 0 for gid in g.geom1):
      continue  # plane must be world-static
    out.append(g)
  return out


def _nonground_count(m: Model) -> int:
  if m.collision_pairs is None:
    return 0
  ground = set()
  for g in _ground_groups(m):
    for a, b in zip(g.geom1, g.geom2):
      ground.add((int(a), int(b)))
  total = 0
  for g in m.collision_pairs.groups:
    for a, b in zip(g.geom1, g.geom2):
      if (int(a), int(b)) not in ground:
        total += 1
  return total


def supports(m: Model, ground_only: bool = False,
             body_pairs: bool = False) -> bool:
  """Model class the kernel handles. With ground_only=True, non-ground
  candidate pairs (e.g. self-collisions) are DROPPED from the kernel's
  planning dynamics — a deliberate planning-model approximation. With
  body_pairs=True, sphere/capsule/box body-body pairs (incl. box-box
  vertex-in-box, pipeline _box_box semantics) are handled in-kernel
  instead of dropped (hand manipulation models)."""
  jt = set(int(t) for t in m.jnt_type)
  if not jt <= {HINGE, SLIDE, FREE}:
    return False
  if m.collision_pairs is not None and m.collision_pairs.ncon > 0:
    if not ground_only:
      return False
    if not _ground_groups(m) and not body_pairs:
      return False
  if m.neq or m.na:
    return False
  if np.any(np.asarray(jax.device_get(m.dof_frictionloss)) > 0):
    return False
  for u in range(m.nu):
    if int(m.actuator_trntype[u]) not in (TRN_JOINT, TRN_SITE):
      return False
  return True


def _static(m: Model):
  """Pull all model constants to host floats (trace-time constants)."""
  g = jax.device_get
  return dict(
      body_pos=g(m.body_pos), body_quat=g(m.body_quat),
      body_ipos=g(m.body_ipos), body_iquat=g(m.body_iquat),
      body_mass=g(m.body_mass), body_inertia=g(m.body_inertia),
      body_subtreemass=g(m.body_subtreemass),
      jnt_pos=g(m.jnt_pos), jnt_axis=g(m.jnt_axis),
      jnt_stiffness=g(m.jnt_stiffness), qpos0=g(m.qpos0),
      qpos_spring=g(m.qpos_spring), dof_damping=g(m.dof_damping),
      dof_armature=g(m.dof_armature),
      gainprm=g(m.actuator_gainprm), biasprm=g(m.actuator_biasprm),
      gaintype=g(m.actuator_gaintype), biastype=g(m.actuator_biastype),
      ctrlrange=g(m.actuator_ctrlrange),
      ctrllimited=g(m.actuator_ctrllimited),
      gear=g(m.actuator_gear), gravity=g(m.opt.gravity),
      timestep=float(g(m.opt.timestep)),
      jnt_range=g(m.jnt_range), jnt_solref=g(m.jnt_solref),
      jnt_solimp=g(m.jnt_solimp), jnt_margin=g(m.jnt_margin),
      dof_invweight0=g(m.dof_invweight0),
      geom_pos=g(m.geom_pos), geom_quat=g(m.geom_quat),
      geom_size=g(m.geom_size), body_invweight0=g(m.body_invweight0),
      forcerange=g(m.actuator_forcerange),
      forcelimited=g(m.actuator_forcelimited),
      site_pos=g(m.site_pos) if m.nsite else None,
      site_quat=g(m.site_quat) if m.nsite else None,
      viscosity=float(g(m.opt.viscosity)),
      density=float(g(m.opt.density)),
      wind=[float(v) for v in g(m.opt.wind)],
      impratio=float(g(m.opt.impratio)),
      cone=int(m.opt.cone),
  )


def lane_term_cost(rows, ntype, p, q):
  """Unweighted norm value of a residual slice in lane layout.

  rows: list of (S, 128)/(K,) component arrays; p, q: traced norm-param
  arrays broadcastable to the rows. Mirrors costs/norms.py::norm_value
  (reference mjpc/norm.cc) term formulas exactly so the in-kernel score
  matches the XLA cost path bit-for-bit up to reassociation.
  """
  from mujoco_mpc_tpu.costs.norms import NormType as NT
  eps = 1e-15
  nt = NT(ntype)
  if nt == NT.NULL:
    return rows[0]
  if nt == NT.QUADRATIC:
    return 0.5 * sum(r * r for r in rows)
  if nt == NT.L22:
    c = jnp.maximum(sum(r * r for r in rows), eps)
    a = jnp.power(c, q / 2) + jnp.power(p, q)
    return jnp.power(a, 1.0 / q) - p
  if nt == NT.L2:
    return jnp.sqrt(sum(r * r for r in rows) + p * p) - p
  if nt == NT.COSH:
    # cosh via exp: Pallas TPU has no cosh lowering
    return sum(p * p * (0.5 * (jnp.exp(r / p) + jnp.exp(-r / p)) - 1.0)
               for r in rows)
  if nt == NT.POWER_LOSS:
    return sum(jnp.power(jnp.abs(r), p) for r in rows)
  if nt == NT.SMOOTH_ABS:
    return sum(jnp.sqrt(r * r + p * p) - p for r in rows)
  if nt == NT.SMOOTH_ABS2:
    return sum(jnp.power(jnp.power(jnp.abs(r), q) + jnp.power(p, q),
                         1.0 / q) - p for r in rows)
  if nt == NT.RECTIFY:
    return sum(jnp.where(p > 0,
                         p * jnp.log1p(jnp.exp(r / jnp.maximum(p, eps))),
                         jnp.maximum(r, 0.0)) for r in rows)
  raise ValueError(f"unknown norm {ntype}")


def build_rollout_kernel(m: Model, horizon: int, num_nodes: int,
                         interpret: bool = False, unroll: bool = True,
                         contact_types=None, solver_iters=None,
                         solver_ls_iters=None, residual_fn=None,
                         residual_dim=0, naux=0,
                         record_states: bool = True,
                         contact_geoms=None,
                         cost_terms=None,
                         body_pairs: bool = False,
                         body_pair_types=None,
                         ctrl_fn=None, naux_extra: int = 0,
                         scalar_rows: int = 0,
                         profile_phase: str = None) -> Callable:
  """Returns fn(qpos0 (nq,K), qvel0 (nv,K), values (P*nu, K)) ->
  states (horizon, nq+nv, K) for a zero-order-hold spline with
  node_of_step[t] = floor(t * P / horizon) (the planner's uniform grid).

  K must tile to the TPU lane layout (multiples of 128 recommended).

  solver_iters / solver_ls_iters default to the model Option's schedule
  (exact vs the jnp pipeline). For planning rollouts a cheaper schedule
  (e.g. solver_ls_iters=0 -> unit Newton steps, ~1.8x faster on the
  quadruped) is a legitimate planning-model approximation, in the same
  spirit as the reference's lower-fidelity planning models
  (mjpc/tasks: separate plan vs simulate models).

  residual_fn, if given, is evaluated IN-KERNEL once per step on the
  pre-step state (matching rollout.py's per-step cost semantics) and its
  residual_dim rows are appended to the output:
  out (horizon, nq+nv+residual_dim, K). It receives a ctx dict exposing
  the step's internal quantities (qpos, qvel, ctrl, xpos, xquat, xipos,
  subtree_com, ref, cvel, act_force, aux rows, step index t, h, lm, cv)
  so task costs are scored at VMEM bandwidth with zero extra FK work —
  the TPU answer to the reference evaluating residuals inside its
  threaded rollout loop (mjpc/trajectory.cc Rollout -> residual).
  aux (naux, K) carries per-candidate scalars (time origin, goal,
  residual params).

  record_states=False (requires residual_fn) changes the output to
  (residuals (horizon, nr, K), final_state (nq+nv, K)): the sampling
  planner only consumes per-step residual rows and final-state
  finiteness, and dropping the per-step trajectory store shrinks the
  output block ~4x, which lets the candidate block KB rise to 1024 — a
  full (8, 128) VPU tile per elementwise op instead of the quarter-tile
  (2, 128) the trajectory-recording layout forced.
  """
  assert supports(m, ground_only=True, body_pairs=body_pairs), \
      "model outside the kernel's class"
  c = _static(m)
  nq, nv, nu, nb = m.nq, m.nv, m.nu, m.nbody
  n_newton = int(m.opt.iterations) if solver_iters is None else int(solver_iters)
  n_ls = (int(m.opt.ls_iterations) if solver_ls_iters is None
          else int(solver_ls_iters))
  h = c["timestep"]
  node_of_step = [min(int(t * num_nodes / max(horizon - 1, 1)),
                      num_nodes - 1) for t in range(horizon)]

  def step_body(qpos, qvel, ctrl, t_step=None, aux=None,
                derived_only=False, aux_dyn=None):
    """One physics step on component lists; returns (qpos', qvel', res)
    where res is the residual_fn row list (or None). With derived_only,
    only the quantities the residual needs (FK, com, cdof/cvel,
    actuator forces) are traced and (None, None, res) is returned —
    used by residual parity tests where the full nv^2 CRB/RNE/Newton
    trace would dominate."""
    like = qpos[0]
    skip_dyn = derived_only or profile_phase == "fk"

    def cv(v):
      return lm.const_vec3(v, like)

    # ---- FK ----
    xpos = [cv([0, 0, 0])] * nb
    xquat = [(jnp.ones_like(like), like * 0, like * 0, like * 0)] * nb
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt
    for i in range(1, nb):
      pid = int(m.body_parentid[i])
      pos = lm.vadd(xpos[pid], lm.qrot(xquat[pid], cv(c["body_pos"][i])))
      bq = c["body_quat"][i]
      quat = lm.qmul(xquat[pid],
                     (jnp.ones_like(like) * float(bq[0]),
                      jnp.ones_like(like) * float(bq[1]),
                      jnp.ones_like(like) * float(bq[2]),
                      jnp.ones_like(like) * float(bq[3])))
      ja = int(m.body_jntadr[i])
      for k in range(int(m.body_jntnum[i])):
        j = ja + k
        qadr = int(m.jnt_qposadr[j])
        anchor = lm.vadd(lm.qrot(quat, cv(c["jnt_pos"][j])), pos)
        axis = lm.qrot(quat, cv(c["jnt_axis"][j]))
        if int(m.jnt_type[j]) == FREE:
          pos = (qpos[qadr], qpos[qadr + 1], qpos[qadr + 2])
          qn = jnp.sqrt(qpos[qadr + 3]**2 + qpos[qadr + 4]**2 +
                        qpos[qadr + 5]**2 + qpos[qadr + 6]**2)
          inv = 1.0 / jnp.maximum(qn, 1e-12)
          quat = (qpos[qadr + 3] * inv, qpos[qadr + 4] * inv,
                  qpos[qadr + 5] * inv, qpos[qadr + 6] * inv)
          anchor = pos
          axis = cv(c["jnt_axis"][j])  # global z, not rotated
        elif int(m.jnt_type[j]) == SLIDE:
          disp = qpos[qadr] - float(c["qpos0"][qadr])
          pos = lm.vadd(pos, lm.vscale(axis, disp))
        else:  # HINGE
          angle = qpos[qadr] - float(c["qpos0"][qadr])
          qloc = lm.axis_angle_quat(cv(c["jnt_axis"][j]), angle)
          quat = lm.qmul(quat, qloc)
          pos = lm.vsub(anchor, lm.qrot(quat, cv(c["jnt_pos"][j])))
        xanchor[j] = anchor
        xaxis[j] = axis
      xpos[i] = pos
      xquat[i] = quat

    # ---- com quantities ----
    xipos = [lm.vadd(xpos[i], lm.qrot(xquat[i], cv(c["body_ipos"][i])))
             for i in range(nb)]
    # subtree com of the whole tree root (single root assumed per chain)
    # reference point per body: subtree com of its root
    sub_sum = [lm.vscale(xipos[i], float(c["body_mass"][i]))
               for i in range(nb)]
    for i in range(nb - 1, 0, -1):
      pid = int(m.body_parentid[i])
      sub_sum[pid] = lm.vadd(sub_sum[pid], sub_sum[i])
    subtree_com = [lm.vscale(sub_sum[i],
                             1.0 / max(float(c["body_subtreemass"][i]),
                                       1e-12))
                   for i in range(nb)]
    ref = [subtree_com[int(m.body_rootid[i])] for i in range(nb)]

    # packed spatial inertia about ref (I 3x3 entries, h, mass)
    def inertia_of(i):
      iq = c["body_iquat"][i]
      quat = lm.qmul(xquat[i],
                     (jnp.ones_like(like) * float(iq[0]),
                      jnp.ones_like(like) * float(iq[1]),
                      jnp.ones_like(like) * float(iq[2]),
                      jnp.ones_like(like) * float(iq[3])))
      # R columns = rotated basis vectors
      e0 = lm.qrot(quat, cv([1, 0, 0]))
      e1 = lm.qrot(quat, cv([0, 1, 0]))
      e2 = lm.qrot(quat, cv([0, 0, 1]))
      di = c["body_inertia"][i]
      # I = sum_k d_k e_k e_k^T
      rows = [[like * 0.0] * 3 for _ in range(3)]
      for dk, ek in zip(di, (e0, e1, e2)):
        for a in range(3):
          for b in range(3):
            rows[a][b] = rows[a][b] + float(dk) * ek[a] * ek[b]
      mass = float(c["body_mass"][i])
      d = lm.vsub(xipos[i], ref[i])
      d2 = lm.vdot(d, d)
      for a in range(3):
        rows[a][a] = rows[a][a] + mass * d2
        for b in range(3):
          rows[a][b] = rows[a][b] - mass * d[a] * d[b]
      hvec = lm.vscale(d, mass)
      return rows, hvec, mass

    cinert = None if skip_dyn else [inertia_of(i) for i in range(nb)]

    # cdof per dof
    cdof = []
    for j in range(m.njnt):
      bid = int(m.jnt_bodyid[j])
      jtype = int(m.jnt_type[j])
      if jtype == SLIDE:
        cdof.append((cv([0, 0, 0]), xaxis[j]))
      elif jtype == HINGE:
        offset = lm.vsub(ref[bid], xanchor[j])
        cdof.append((xaxis[j], lm.vcross(xaxis[j], offset)))
      else:  # FREE: world translations, then body-frame rotation axes
        for k in range(3):
          e = [0.0, 0.0, 0.0]; e[k] = 1.0
          cdof.append((cv([0, 0, 0]), cv(e)))
        offset = lm.vsub(ref[bid], xanchor[j])
        for k in range(3):
          e = [0.0, 0.0, 0.0]; e[k] = 1.0
          ax = lm.qrot(xquat[bid], cv(e))  # body axis k in world
          cdof.append((ax, lm.vcross(ax, offset)))

    def imul(inert, mot):
      """Spatial inertia times motion -> force (component form)."""
      rows, hvec, mass = inert
      w, v = mot
      iw = tuple(rows[a][0] * w[0] + rows[a][1] * w[1] + rows[a][2] * w[2]
                 for a in range(3))
      torque = lm.vadd(iw, lm.vcross(hvec, v))
      force = lm.vsub(lm.vscale(v, mass), lm.vcross(hvec, w))
      return (torque, force)

    # ---- CRB mass matrix ----
    crb = [] if skip_dyn else [cinert[i] for i in range(nb)]
    for i in ([] if skip_dyn else range(nb - 1, 0, -1)):
      pid = int(m.body_parentid[i])
      if pid > 0:
        r0, h0, m0 = crb[pid]
        r1, h1, m1 = crb[i]
        crb[pid] = ([[r0[a][b] + r1[a][b] for b in range(3)]
                     for a in range(3)], lm.vadd(h0, h1), m0 + m1)

    anc = m.dof_ancestor_mask
    mrows = [[like * 0.0] * nv for _ in range(nv)]
    for i in ([] if skip_dyn else range(nv)):
      f = imul(crb[int(m.dof_bodyid[i])], cdof[i])
      for j in range(nv):
        if anc[i, j] or anc[j, i]:
          val = lm.vdot(f[0], cdof[j][0]) + lm.vdot(f[1], cdof[j][1])
          if j <= i:
            mrows[i][j] = val
            mrows[j][i] = val
      mrows[i][i] = mrows[i][i] + float(c["dof_armature"][i])

    # ---- velocities + RNE bias ----
    cvel = [(cv([0, 0, 0]), cv([0, 0, 0]))] * nb
    cdof_dot = [(cv([0, 0, 0]), cv([0, 0, 0]))] * nv

    def mcross(a, b):
      return (lm.vcross(a[0], b[0]),
              lm.vadd(lm.vcross(a[0], b[1]), lm.vcross(a[1], b[0])))

    def vplus(v, n):
      return (lm.vadd(v[0], lm.vscale(cdof[n][0], qvel[n])),
              lm.vadd(v[1], lm.vscale(cdof[n][1], qvel[n])))

    for i in range(1, nb):
      pid = int(m.body_parentid[i])
      v = cvel[pid]
      da = int(m.body_dofadr[i])
      k = 0
      ndofs = int(m.body_dofnum[i])
      while k < ndofs:
        n = da + k
        jtype = int(m.jnt_type[int(m.dof_jntid[n])])
        if jtype == FREE:
          for kk in range(3):      # translations: cdof_dot = 0
            v = vplus(v, da + kk)
          vpre = v
          for kk in range(3, 6):   # rotations: pre-velocity = translations
            cdof_dot[da + kk] = mcross(vpre, cdof[da + kk])
            v = vplus(v, da + kk)
          k += 6
        else:
          cdof_dot[n] = mcross(v, cdof[n])
          v = vplus(v, n)
          k += 1
      cvel[i] = v

    grav = c["gravity"]
    cacc = [(cv([0, 0, 0]),
             cv([-grav[0], -grav[1], -grav[2]]))] * 1 + \
        [None] * (nb - 1)
    for i in ([] if skip_dyn else range(1, nb)):
      pid = int(m.body_parentid[i])
      a = cacc[pid]
      da = int(m.body_dofadr[i])
      for k in range(int(m.body_dofnum[i])):
        n = da + k
        a = (lm.vadd(a[0], lm.vscale(cdof_dot[n][0], qvel[n])),
             lm.vadd(a[1], lm.vscale(cdof_dot[n][1], qvel[n])))
      cacc[i] = a

    cfrc = [None] * nb
    for i in ([] if skip_dyn else range(1, nb)):
      iv = imul(cinert[i], cvel[i])
      ia = imul(cinert[i], cacc[i])
      w, v = cvel[i]
      # force cross: (w x t + v x f, w x f)
      fc = (lm.vadd(lm.vcross(w, iv[0]), lm.vcross(v, iv[1])),
            lm.vcross(w, iv[1]))
      cfrc[i] = (lm.vadd(ia[0], fc[0]), lm.vadd(ia[1], fc[1]))
    for i in ([] if skip_dyn else range(nb - 1, 0, -1)):
      pid = int(m.body_parentid[i])
      if pid > 0:
        cfrc[pid] = (lm.vadd(cfrc[pid][0], cfrc[i][0]),
                     lm.vadd(cfrc[pid][1], cfrc[i][1]))

    qfrc_bias = [like * 0.0] * nv if skip_dyn else \
        [lm.vdot(cdof[i][0], cfrc[int(m.dof_bodyid[i])][0]) +
         lm.vdot(cdof[i][1], cfrc[int(m.dof_bodyid[i])][1])
         for i in range(nv)]

    # ---- passive + actuation ----
    qfrc = [like * 0.0 for _ in range(nv)]
    for j in range(m.njnt):
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      stiff = float(c["jnt_stiffness"][j])
      qfrc[dadr] = qfrc[dadr] - stiff * (
          qpos[qadr] - float(c["qpos_spring"][qadr]))
    for i in range(nv):
      qfrc[i] = qfrc[i] - float(c["dof_damping"][i]) * qvel[i]

    # ---- fluid (inertia-box viscosity/density, smooth.py _fluid_force)
    visc, rho = c["viscosity"], c["density"]
    wind = c["wind"]
    if visc > 0.0 or rho > 0.0 or any(w != 0.0 for w in wind):
      for i in range(1, nb):
        mass_i = float(c["body_mass"][i])
        if mass_i <= 1e-12:
          continue
        i0, i1, i2 = (float(v) for v in c["body_inertia"][i])
        box = [np.sqrt(max(1e-12, (i1 + i2 - i0) * 3.0 / (2 * mass_i))),
               np.sqrt(max(1e-12, (i0 + i2 - i1) * 3.0 / (2 * mass_i))),
               np.sqrt(max(1e-12, (i0 + i1 - i2) * 3.0 / (2 * mass_i)))]
        diam = sum(box) / 3.0
        w_w, v_w = cvel[i]
        v_w = lm.vadd(v_w, lm.vcross(w_w, lm.vsub(xipos[i], ref[i])))
        v_w = lm.vsub(v_w, cv(wind))
        iq = c["body_iquat"][i]
        qw = lm.qmul(xquat[i], (float(iq[0]), float(iq[1]),
                                float(iq[2]), float(iq[3])))
        qc = (qw[0], -qw[1], -qw[2], -qw[3])
        la = lm.qrot(qc, w_w)   # local (inertial-frame) angular vel
        ll = lm.qrot(qc, v_w)   # local linear vel
        tq = [-np.pi * diam ** 3 * visc * la[k] for k in range(3)]
        fr = [-3.0 * np.pi * diam * visc * ll[k] for k in range(3)]
        if rho > 0.0:
          b0, b1, b2 = box
          fr[0] = fr[0] - 0.5 * rho * b1 * b2 * jnp.abs(ll[0]) * ll[0]
          fr[1] = fr[1] - 0.5 * rho * b0 * b2 * jnp.abs(ll[1]) * ll[1]
          fr[2] = fr[2] - 0.5 * rho * b0 * b1 * jnp.abs(ll[2]) * ll[2]
          tq[0] = tq[0] - rho * b0 * (b1 ** 4 + b2 ** 4) / 64.0 * \
              jnp.abs(la[0]) * la[0]
          tq[1] = tq[1] - rho * b1 * (b0 ** 4 + b2 ** 4) / 64.0 * \
              jnp.abs(la[1]) * la[1]
          tq[2] = tq[2] - rho * b2 * (b0 ** 4 + b1 ** 4) / 64.0 * \
              jnp.abs(la[2]) * la[2]
        f_w = lm.qrot(qw, tuple(fr))
        t_w = lm.qrot(qw, tuple(tq))
        t_ref = lm.vadd(t_w, lm.vcross(lm.vsub(xipos[i], ref[i]), f_w))
        for dof in range(nv):
          if m.body_dof_mask[i][dof] > 0:
            qfrc[dof] = qfrc[dof] + lm.vdot(cdof[dof][0], t_ref) + \
                lm.vdot(cdof[dof][1], f_w)

    act_force = []
    for u in range(nu):
      trntype = int(m.actuator_trntype[u])
      tid = int(m.actuator_trnid[u, 0])
      uin = ctrl[u]
      if c["ctrllimited"][u]:
        uin = jnp.clip(uin, float(c["ctrlrange"][u][0]),
                       float(c["ctrlrange"][u][1]))
      if trntype == TRN_JOINT:
        dadr = int(m.jnt_dofadr[tid])
        qadr = int(m.jnt_qposadr[tid])
        gear = float(c["gear"][u][0])
        length = qpos[qadr] * gear
        velocity = qvel[dadr] * gear
        moment = {dadr: gear}
      else:  # TRN_SITE: world wrench at the site (smooth.py transmission)
        bid = int(np.asarray(m.site_bodyid)[tid])
        sp = [float(v) for v in c["site_pos"][tid]]
        sq = [float(v) for v in c["site_quat"][tid]]
        gr = [float(v) for v in c["gear"][u]]
        wq = lm.qmul(xquat[bid], tuple(sq))
        f_w = lm.qrot(wq, cv(gr[0:3]))
        t_w = lm.qrot(wq, cv(gr[3:6]))
        spos = lm.vadd(xpos[bid], lm.qrot(xquat[bid], cv(sp)))
        t_ref = lm.vadd(t_w, lm.vcross(lm.vsub(spos, ref[bid]), f_w))
        dofs = [i for i in range(nv) if m.body_dof_mask[bid][i] > 0]
        moment = {i: lm.vdot(cdof[i][0], t_ref) + lm.vdot(cdof[i][1], f_w)
                  for i in dofs}
        length = like * 0.0
        velocity = sum((moment[i] * qvel[i] for i in dofs), like * 0.0)
      gp = c["gainprm"][u]
      if int(c["gaintype"][u]) == GAIN_FIXED:
        gain = float(gp[0])
      else:
        gain = float(gp[0]) + float(gp[1]) * length + \
            float(gp[2]) * velocity
      force = gain * uin
      if int(c["biastype"][u]) != BIAS_NONE:
        bp = c["biasprm"][u]
        force = force + float(bp[0]) + float(bp[1]) * length + \
            float(bp[2]) * velocity
      if c["forcelimited"][u]:
        force = jnp.clip(force, float(c["forcerange"][u][0]),
                         float(c["forcerange"][u][1]))
      act_force.append(force)
      for i, mom in moment.items():
        qfrc[i] = qfrc[i] + mom * force

    rhs = [qfrc[i] - qfrc_bias[i] for i in range(nv)]

    def integrate_qpos(qpos, qvel_new):
      """Euler position update (free-joint local quaternion integration,
      mju_quatIntegrate semantics)."""
      qpos_new = list(qpos)
      for j in range(m.njnt):
        qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
        if int(m.jnt_type[j]) == FREE:
          for k in range(3):
            qpos_new[qadr + k] = qpos_new[qadr + k] + h * qvel_new[dadr + k]
          w = (qvel_new[dadr + 3], qvel_new[dadr + 4], qvel_new[dadr + 5])
          angle = jnp.sqrt(w[0]**2 + w[1]**2 + w[2]**2)
          safe = jnp.maximum(angle, 1e-12)
          axis = (w[0] / safe, w[1] / safe, w[2] / safe)
          half = 0.5 * angle * h
          sh, ch = jnp.sin(half), jnp.cos(half)
          dq = (ch, axis[0] * sh, axis[1] * sh, axis[2] * sh)
          q0 = (qpos_new[qadr + 3], qpos_new[qadr + 4], qpos_new[qadr + 5],
                qpos_new[qadr + 6])
          qn = lm.qmul(q0, dq)
          norm = jnp.sqrt(qn[0]**2 + qn[1]**2 + qn[2]**2 + qn[3]**2)
          inv = 1.0 / jnp.maximum(norm, 1e-12)
          for k in range(4):
            qpos_new[qadr + 3 + k] = qn[k] * inv
        else:
          qpos_new[qadr] = qpos_new[qadr] + h * qvel_new[dadr]
      return qpos_new

    # ---- in-kernel task residual (pre-step state, full derived ctx) ----
    res = None
    if residual_fn is not None:
      res = residual_fn(dict(
          m=m, c=c, lm=lm, cv=cv, like=like, h=h, t=t_step, aux=aux,
          aux_dyn=aux_dyn,
          qpos=qpos, qvel=qvel, ctrl=ctrl, xpos=xpos, xquat=xquat,
          xipos=xipos, subtree_com=subtree_com, ref=ref, cvel=cvel,
          act_force=act_force))
      assert len(res) == residual_dim, (len(res), residual_dim)
    if derived_only:
      return None, None, res

    # profiling cutoffs (perf bisection only; not a physics mode):
    #   fk     — FK/derived only, qvel frozen
    #   smooth — + CRB/RNE + one chol solve, skip constraints/implicit
    if profile_phase == "fk":
      qvel_new = list(qvel)
      return integrate_qpos(qpos, qvel_new), qvel_new, res

    # ---- constraint rows: joint limits + ground contacts ----
    # generic one-sided quadratic penalty rows solved with masked Newton
    # (physics/constraint.py semantics, component form). Each row:
    # (jrow: list of nv entries (None = structurally zero), aref, D_gate)
    def impedance(pos, solimp):
      d0i = float(np.clip(solimp[0], 1e-4, 0.9999))
      dmax = float(np.clip(solimp[1], 1e-4, 0.9999))
      width = max(float(solimp[2]), 1e-12)
      mid = float(np.clip(solimp[3], 1e-4, 0.9999))
      power = max(float(solimp[4]), 1.0)
      x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
      a_c = 1.0 / mid ** (power - 1.0)
      b_c = 1.0 / (1.0 - mid) ** (power - 1.0)
      y = jnp.where(x <= mid, a_c * x ** power,
                    1.0 - b_c * (1.0 - x) ** power)
      return jnp.clip(d0i + y * (dmax - d0i), 1e-4, 0.9999)

    def kbi(pos, jv, solref, solimp, invw):
      imp = impedance(pos, solimp)
      tc, dr = float(solref[0]), float(solref[1])
      dmax = float(np.clip(solimp[1], 1e-4, 0.9999))
      b_coef = 2.0 / max(dmax * tc, 1e-12)
      k_coef = 1.0 / max(dmax * dmax * tc * tc * dr * dr, 1e-12)
      aref = -b_coef * jv - k_coef * imp * pos
      r_reg = jnp.maximum((1.0 - imp) / imp * float(invw), 1e-12)
      dcoef = jnp.where(pos < 0, 1.0 / r_reg, like * 0.0)
      return aref, dcoef

    rows = []
    # elliptic cone blocks: (sup, jrows [1+nf][nv], arefs [1+nf],
    # dn lane, mu_eff float, scales (nf,) floats). Solved per-contact
    # with the zone logic + exact cone Hessian (see ell_terms below);
    # physics/constraint.py _contact_rows/_elliptic_terms semantics.
    eblocks = []

    def emit_elliptic(support, jn_row, jv_n, axes, gap, solref_c,
                      solimp_c, invw):
      """One elliptic contact block. axes: [(jrow, jv, mu_i)] friction
      axes in [t0, t1, torsion, roll0, roll1][:condim-1] order.
      Normal row: aref/D from kbi (spring+damper, gap-gated impedance);
      friction rows: aref = -B*jv only (reference_constraint elliptic
      semantics — no spring term, B static), D_i = D_N*(mu_i/mu_eff)^2
      with mu_eff = mu0/sqrt(impratio)."""
      mu = max(float(axes[0][2]), 1e-12) / np.sqrt(
          max(c["impratio"], 1e-12))
      aref_n, dn = kbi(gap, jv_n, solref_c, solimp_c,
                       max(float(invw), 1e-12))
      dmax = float(np.clip(solimp_c[1], 1e-4, 0.9999))
      b_coef = 2.0 / max(dmax * float(solref_c[0]), 1e-12)
      jrows = [jn_row]
      arefs = [aref_n]
      scales = []
      for jrow, jv, mu_i in axes:
        jrows.append(jrow)
        arefs.append(-b_coef * jv)
        scales.append(float(mu_i) / mu)
      eblocks.append((tuple(support), jrows, arefs, dn, mu,
                      np.asarray(scales, np.float64)))
    for j in range(m.njnt):
      if not m.jnt_limited[j]:
        continue
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      margin = float(c["jnt_margin"][j])
      for sign in (1.0, -1.0):
        if sign > 0:
          pos = qpos[qadr] - float(c["jnt_range"][j][0]) - margin
        else:
          pos = float(c["jnt_range"][j][1]) - qpos[qadr] - margin
        aref, dcoef = kbi(pos, sign * qvel[dadr], c["jnt_solref"][j],
                          c["jnt_solimp"][j],
                          c["dof_invweight0"][dadr])
        jrow = [None] * nv
        jrow[dadr] = like * 0.0 + sign
        rows.append((jrow, aref, dcoef))

    # ground contacts: plane (world-static) vs sphere/capsule/box
    cp = m.collision_pairs
    if cp is not None and cp.ncon > 0:
      # per-candidate static params indexed to (geom1, geom2) pairs
      meta = {}
      off = 0
      for g in cp.groups:
        for pi in range(g.count):
          key = (int(g.geom1[pi]), int(g.geom2[pi]))
          meta[key] = off
          off += g.ncon_per_pair

      def geom_world(gid, bid):
        gpos = lm.vadd(xpos[bid], lm.qrot(xquat[bid], cv(c["geom_pos"][gid])))
        gq = c["geom_quat"][gid]
        gquat = lm.qmul(xquat[bid],
                        (jnp.ones_like(like) * float(gq[0]),
                         jnp.ones_like(like) * float(gq[1]),
                         jnp.ones_like(like) * float(gq[2]),
                         jnp.ones_like(like) * float(gq[3])))
        return gpos, gquat

      def point_vel(bid, pt):
        """Velocity of world point on body bid (for aref's Jv)."""
        w, v = cvel[bid]
        r = lm.vsub(pt, ref[bid])
        return lm.vadd(v, lm.vcross(w, r))

      def add_contact(bid, pt, dist, nrm, ci):
        """Rows for one candidate ground contact at world point pt.

        Pyramidal cone: 4 one-sided rows Jn +/- mu*Jt (condim-3).
        Elliptic cone: a per-contact cone block at the pair's full
        condim (1/3/4/6) via emit_elliptic."""
        fri = cp.con_friction[ci]
        solref_c = cp.con_solref[ci]
        solimp_c = cp.con_solimp[ci]
        incm = float(cp.con_includemargin[ci])
        invw = (c["body_invweight0"][0][0] +
                c["body_invweight0"][bid][0])
        gap = dist - incm
        # contact frame: static normal -> static tangents (same
        # ref-axis rule as collision.make_contact_frame)
        n_np = np.asarray(nrm, dtype=np.float64)
        refv = np.array([1.0, 0, 0]) if abs(n_np[0]) < 0.5 \
            else np.array([0, 1.0, 0])
        t1 = np.cross(n_np, refv); t1 /= np.linalg.norm(t1)
        t2 = np.cross(n_np, t1)
        dirs = [n_np, t1, t2]
        # per-direction J rows over supporting dofs
        support = [i for i in range(nv) if m.body_dof_mask[bid][i] > 0]
        jdir = []
        for dvec in dirs:
          row = [None] * nv
          for i in support:
            w2, v2 = cdof[i]
            rvec = lm.vsub(pt, ref[bid])
            jp = lm.vadd(v2, lm.vcross(w2, rvec))
            row[i] = jp[0] * float(dvec[0]) + jp[1] * float(dvec[1]) + \
                jp[2] * float(dvec[2])
          jdir.append(row)
        pv = point_vel(bid, pt)
        vdirs = [pv[0] * float(d_[0]) + pv[1] * float(d_[1]) +
                 pv[2] * float(d_[2]) for d_ in dirs]
        condim_c = int(cp.con_condim[ci])
        if condim_c == 1:
          # frictionless: a single one-sided normal row (equivalent to
          # the pipeline's two half-D pyramid rows at mu=0)
          aref, dcoef = kbi(gap, vdirs[0], solref_c, solimp_c,
                            max(float(invw), 1e-12))
          rows.append((jdir[0], aref, dcoef))
          return
        axes = [(jdir[1], vdirs[1], float(fri[0])),
                (jdir[2], vdirs[2], float(fri[1]))]
        if condim_c > 3:
          # torsion/rolling axes: angular Jacobian rows about the
          # static frame dirs (plane is world-static: only bid's
          # dofs move) — _contact_rows rjac semantics
          wvel = cvel[bid][0]
          rot_dirs = dirs if condim_c == 6 else dirs[:1]
          for ax_i, dvec in zip((2, 3, 4), rot_dirs):
            row = [None] * nv
            for i in support:
              wd = cdof[i][0]
              row[i] = wd[0] * float(dvec[0]) + \
                  wd[1] * float(dvec[1]) + wd[2] * float(dvec[2])
            jv_r = wvel[0] * float(dvec[0]) + \
                wvel[1] * float(dvec[1]) + wvel[2] * float(dvec[2])
            axes.append((row, jv_r, float(fri[ax_i])))
        if c["cone"] == 1:
          emit_elliptic(support, jdir[0], vdirs[0], axes, gap,
                        solref_c, solimp_c, invw)
          return
        mu0 = max(float(fri[0]), 1e-12)
        # pyramidal: 2 one-sided rows per friction axis (incl. torsion/
        # rolling for condim > 3), all sharing the friction[0]-based
        # diag stiffened by impratio (pipeline _contact_rows:245-262)
        iw = float(invw) * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) / \
            max(c["impratio"], 1e-12)
        for jrow_a, jv_a, mu_f in axes:
          for sign in (1.0, -1.0):
            jrow = [None] * nv
            for i in support:
              jrow[i] = jdir[0][i] + sign * mu_f * jrow_a[i]
            jv = vdirs[0] + sign * mu_f * jv_a
            aref, dcoef = kbi(gap, jv, solref_c, solimp_c, max(iw, 1e-12))
            rows.append((jrow, aref, dcoef))

      for g in _ground_groups(m):
        if contact_types is not None and g.types[1] not in contact_types:
          continue
        for pi in range(g.count):
          g1, g2 = int(g.geom1[pi]), int(g.geom2[pi])
          if contact_geoms is not None and g2 not in contact_geoms:
            # planning-contact whitelist (e.g. feet only) — same spirit
            # as the reference's reduced planning models
            continue
          ci = meta[(g1, g2)]
          bid = int(m.geom_bodyid[g2])
          # static plane frame (world body)
          pq = c["geom_quat"][g1]
          import numpy as _np
          def rotq(qq, v):
            w, x, y, z = [float(t) for t in qq]
            R = _np.array([
                [1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
                [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
                [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])
            return R @ _np.asarray(v)
          n_pl = rotq(pq, [0, 0, 1.0])
          p_pl = _np.asarray(c["geom_pos"][g1], dtype=_np.float64)
          gpos, gquat = geom_world(g2, bid)
          size = c["geom_size"][g2]
          gtype = int(m.geom_type[g2])
          def plane_h(pt):
            return (float(n_pl[0]) * (pt[0] - float(p_pl[0])) +
                    float(n_pl[1]) * (pt[1] - float(p_pl[1])) +
                    float(n_pl[2]) * (pt[2] - float(p_pl[2])))
          if gtype == coll.SPHERE:
            r0 = float(size[0])
            h_c = plane_h(gpos)
            dist = h_c - r0
            pt = lm.vsub(gpos, lm.vscale(lm.const_vec3(n_pl, like),
                                         r0 + 0.5 * dist))
            add_contact(bid, pt, dist, n_pl, ci)
          elif gtype == coll.CAPSULE:
            r0, hl = float(size[0]), float(size[1])
            ax = lm.qrot(gquat, cv([0, 0, 1.0]))
            for sgn in (1.0, -1.0):
              end = lm.vadd(gpos, lm.vscale(ax, sgn * hl))
              h_c = plane_h(end)
              dist = h_c - r0
              pt = lm.vsub(end, lm.vscale(lm.const_vec3(n_pl, like),
                                          r0 + 0.5 * dist))
              add_contact(bid, pt, dist, n_pl, ci + 0)
          elif gtype == coll.BOX:
            for sx in (-1, 1):
              for sy in (-1, 1):
                for sz in (-1, 1):
                  corner_l = [sx * float(size[0]), sy * float(size[1]),
                              sz * float(size[2])]
                  cw = lm.vadd(gpos, lm.qrot(gquat, cv(corner_l)))
                  dist = plane_h(cw)
                  pt = lm.vsub(cw, lm.vscale(
                      lm.const_vec3(n_pl, like), 0.5 * dist))
                  add_contact(bid, pt, dist, n_pl, ci)

      # ---- body-body contacts (opt-in): dynamic contact frame, both
      # bodies' Jacobians. Types: sphere-sphere, sphere-capsule,
      # capsule-capsule, sphere-box, capsule-box (ends-as-spheres).
      # The whole narrowphase is component math on quantities already
      # in VMEM — this is what puts hand manipulation tasks (Rubik,
      # Allegro) on the lane fast path.
      def vnorm(v):
        return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + 1e-18)

      def vnormalize(v):
        n_ = vnorm(v)
        return (v[0] / n_, v[1] / n_, v[2] / n_), n_

      def qconj_rot(q, v):
        return lm.qrot((q[0], -q[1], -q[2], -q[3]), v)

      def add_contact2(b1, b2, pt, dist, nrm, ci):
        """Pyramidal rows for one contact between bodies b1 -> b2 with
        a TRACED normal (pointing from geom1 to geom2)."""
        fri = cp.con_friction[ci]
        solref_c = cp.con_solref[ci]
        solimp_c = cp.con_solimp[ci]
        incm = float(cp.con_includemargin[ci])
        invw = (c["body_invweight0"][b1][0] +
                c["body_invweight0"][b2][0])
        gap = dist - incm
        # dynamic frame: e least aligned with n, per candidate
        cond = (jnp.abs(nrm[0]) < 0.5).astype(like.dtype)
        e = (cond, 1.0 - cond, like * 0.0)
        t1, _ = vnormalize(lm.vcross(nrm, e))
        t2 = lm.vcross(nrm, t1)
        dirs = [nrm, t1, t2]
        sup = [i for i in range(nv)
               if m.body_dof_mask[b1][i] > 0 or m.body_dof_mask[b2][i] > 0]
        jdir = []
        for dvec in dirs:
          row = [None] * nv
          for i in sup:
            acc_d = None
            for bb, sgn in ((b2, 1.0), (b1, -1.0)):
              if m.body_dof_mask[bb][i] > 0:
                w2, v2 = cdof[i]
                jp = lm.vadd(v2, lm.vcross(w2, lm.vsub(pt, ref[bb])))
                term = sgn * lm.vdot(jp, dvec)
                acc_d = term if acc_d is None else acc_d + term
            row[i] = acc_d
          jdir.append(row)

        def pvel(bb):
          w, v = cvel[bb]
          return lm.vadd(v, lm.vcross(w, lm.vsub(pt, ref[bb])))

        pv = lm.vsub(pvel(b2), pvel(b1))
        vdirs = [lm.vdot(pv, d_) for d_ in dirs]
        condim_c = int(cp.con_condim[ci])
        if condim_c == 1:
          aref, dcoef = kbi(gap, vdirs[0], solref_c, solimp_c,
                            max(float(invw), 1e-12))
          rows.append((jdir[0], aref, dcoef))
          return
        axes = [(jdir[1], vdirs[1], float(fri[0])),
                (jdir[2], vdirs[2], float(fri[1]))]
        if condim_c > 3:
          # torsion/rolling: relative angular Jacobian about the
          # traced frame dirs (_contact_rows rjac: b2 minus b1)
          wrel = lm.vsub(cvel[b2][0], cvel[b1][0])
          rot_dirs = dirs if condim_c == 6 else dirs[:1]
          for ax_i, dvec in zip((2, 3, 4), rot_dirs):
            row = [None] * nv
            for i in sup:
              acc_d = None
              for bb, sgn in ((b2, 1.0), (b1, -1.0)):
                if m.body_dof_mask[bb][i] > 0:
                  term = sgn * lm.vdot(cdof[i][0], dvec)
                  acc_d = term if acc_d is None else acc_d + term
              row[i] = acc_d
            axes.append((row, lm.vdot(wrel, dvec), float(fri[ax_i])))
        if c["cone"] == 1:
          emit_elliptic(sup, jdir[0], vdirs[0], axes, gap,
                        solref_c, solimp_c, invw)
          return
        mu0 = max(float(fri[0]), 1e-12)
        iw = float(invw) * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) / \
            max(c["impratio"], 1e-12)
        for jrow_a, jv_a, mu_f in axes:
          for sign in (1.0, -1.0):
            jrow = [None] * nv
            for i in sup:
              jrow[i] = jdir[0][i] + sign * mu_f * jrow_a[i]
            jv = vdirs[0] + sign * mu_f * jv_a
            aref, dcoef = kbi(gap, jv, solref_c, solimp_c, max(iw, 1e-12))
            rows.append((jrow, aref, dcoef))

      def sphere_point_contact(c1, r1, c2, r2, b1, b2, ci):
        d_ = lm.vsub(c2, c1)
        n_, dn = vnormalize(d_)
        dist = dn - r1 - r2
        pt = lm.vadd(c1, lm.vscale(n_, r1 + 0.5 * dist))
        add_contact2(b1, b2, pt, dist, n_, ci)

      def seg_closest(a0, ax, hl, p):
        """Closest point to p on segment center a0, axis ax, half len."""
        t = lm.vdot(lm.vsub(p, a0), ax)
        t = jnp.clip(t, -hl, hl)
        return lm.vadd(a0, lm.vscale(ax, t))

      def sphere_box_contact(cen, r0, b_pos, b_quat, b_size, b1, b2,
                             ci, flip):
        """Sphere (cen, r0, body b1) vs box (body b2); flip swaps the
        normal convention when the sphere is geom2."""
        loc = qconj_rot(b_quat, lm.vsub(cen, b_pos))
        sx, sy, sz = [float(b_size[k]) for k in range(3)]
        cl = (jnp.clip(loc[0], -sx, sx), jnp.clip(loc[1], -sy, sy),
              jnp.clip(loc[2], -sz, sz))
        dvec = lm.vsub(loc, cl)
        dn = vnorm(dvec)
        outside = dn > 1e-9
        n_out = (dvec[0] / dn, dvec[1] / dn, dvec[2] / dn)
        # inside: push toward the nearest face
        fd = [sx - jnp.abs(loc[0]), sy - jnp.abs(loc[1]),
              sz - jnp.abs(loc[2])]
        m01 = fd[0] < fd[1]
        m02 = jnp.minimum(fd[0], fd[1]) < fd[2]
        sgn = [jnp.where(loc[k] >= 0, 1.0, -1.0) for k in range(3)]
        n_in = (jnp.where(m01 & m02, sgn[0], 0.0),
                jnp.where((~m01) & m02, sgn[1], 0.0),
                jnp.where(~m02, sgn[2], 0.0))
        depth = jnp.where(m02, jnp.where(m01, fd[0], fd[1]), fd[2])
        n_loc = tuple(jnp.where(outside, n_out[k], n_in[k])
                      for k in range(3))
        dist_l = jnp.where(outside, dn, -depth)
        cp_loc = tuple(jnp.where(outside, cl[k],
                                 jnp.where(n_in[k] != 0,
                                           sgn[k] * (sx, sy, sz)[k],
                                           loc[k])) for k in range(3))
        n_w = lm.qrot(b_quat, n_loc)     # points from box toward sphere
        cp_w = lm.vadd(b_pos, lm.qrot(b_quat, cp_loc))
        dist = dist_l - r0
        pt = lm.vadd(cp_w, lm.vscale(n_w, 0.5 * dist))
        if flip:
          add_contact2(b1, b2, pt, dist,
                       (n_w[0], n_w[1], n_w[2]), ci)
        else:
          add_contact2(b1, b2, pt, dist,
                       (-n_w[0], -n_w[1], -n_w[2]), ci)

      _BODY_TYPES = {
          (coll.SPHERE, coll.SPHERE), (coll.SPHERE, coll.CAPSULE),
          (coll.CAPSULE, coll.CAPSULE), (coll.SPHERE, coll.BOX),
          (coll.CAPSULE, coll.BOX), (coll.BOX, coll.BOX)}
      # per-task pair-type whitelist (Task.plan_body_pair_types): a
      # reduced PLANNING contact set in the reference's reduced-plan-
      # model spirit — e.g. Rubik drops its 15 cubie-cubie box-box
      # pairs (240 corner contacts) from planning to hold the <10 ms
      # budget, exactly the set it planned with before box-box existed
      allowed_types = (_BODY_TYPES if body_pair_types is None
                       else frozenset(body_pair_types))
      if body_pairs and cp is not None:
        ground_set = set()
        for g in _ground_groups(m):
          for a_, b_ in zip(g.geom1, g.geom2):
            ground_set.add((int(a_), int(b_)))
        for g in cp.groups:
          if g.types not in _BODY_TYPES or g.types not in allowed_types:
            continue
          for pi in range(g.count):
            g1, g2 = int(g.geom1[pi]), int(g.geom2[pi])
            if (g1, g2) in ground_set:
              continue
            if contact_geoms is not None and not (
                g1 in contact_geoms and g2 in contact_geoms):
              continue
            ci = meta[(g1, g2)]
            b1 = int(m.geom_bodyid[g1])
            b2 = int(m.geom_bodyid[g2])
            p1g, q1g = geom_world(g1, b1)
            p2g, q2g = geom_world(g2, b2)
            s1 = c["geom_size"][g1]
            s2 = c["geom_size"][g2]
            t1_, t2_ = g.types
            if (t1_, t2_) == (coll.SPHERE, coll.SPHERE):
              sphere_point_contact(p1g, float(s1[0]), p2g, float(s2[0]),
                                   b1, b2, ci)
            elif (t1_, t2_) == (coll.SPHERE, coll.CAPSULE):
              ax = lm.qrot(q2g, cv([0, 0, 1.0]))
              cp2 = seg_closest(p2g, ax, float(s2[1]), p1g)
              sphere_point_contact(p1g, float(s1[0]), cp2, float(s2[0]),
                                   b1, b2, ci)
            elif (t1_, t2_) == (coll.CAPSULE, coll.CAPSULE):
              ax1 = lm.qrot(q1g, cv([0, 0, 1.0]))
              ax2 = lm.qrot(q2g, cv([0, 0, 1.0]))
              # closest points between segments (clamped 2x2 solve)
              r_ = lm.vsub(p2g, p1g)
              a_d = lm.vdot(ax1, ax2)
              s1d = lm.vdot(ax1, r_)
              s2d = lm.vdot(ax2, r_)
              den = jnp.maximum(1.0 - a_d * a_d, 1e-9)
              h1, h2 = float(s1[1]), float(s2[1])
              t1s = jnp.clip((s1d - a_d * s2d) / den, -h1, h1)
              t2s = jnp.clip(a_d * t1s - s2d, -h2, h2)
              t1s = jnp.clip(a_d * t2s + s1d, -h1, h1)
              pa = lm.vadd(p1g, lm.vscale(ax1, t1s))
              pb = lm.vadd(p2g, lm.vscale(ax2, t2s))
              sphere_point_contact(pa, float(s1[0]), pb, float(s2[0]),
                                   b1, b2, ci)
            elif (t1_, t2_) == (coll.SPHERE, coll.BOX):
              sphere_box_contact(p1g, float(s1[0]), p2g, q2g, s2,
                                 b1, b2, ci, flip=False)
            elif (t1_, t2_) == (coll.CAPSULE, coll.BOX):
              ax = lm.qrot(q1g, cv([0, 0, 1.0]))
              for sgn_e in (1.0, -1.0):
                end = lm.vadd(p1g, lm.vscale(ax, sgn_e * float(s1[1])))
                sphere_box_contact(end, float(s1[0]), p2g, q2g, s2,
                                   b1, b2, ci, flip=False)
            elif (t1_, t2_) == (coll.BOX, coll.BOX):
              # vertex-in-box both ways (pipeline _box_box semantics,
              # collision.py:516-539). The pipeline keeps the 4 deepest
              # candidates per direction; the kernel emits all 8 —
              # identical forces whenever <=4 corners per direction are
              # active, since separated candidates carry D = 0.
              for src, dst, flip in ((0, 1, False), (1, 0, True)):
                pa, qa, sa = ((p1g, q1g, s1) if src == 0 else
                              (p2g, q2g, s2))
                pb, qb, sb = ((p2g, q2g, s2) if src == 0 else
                              (p1g, q1g, s1))
                for sx in (-1, 1):
                  for sy in (-1, 1):
                    for sz in (-1, 1):
                      corner_l = [sx * float(sa[0]), sy * float(sa[1]),
                                  sz * float(sa[2])]
                      cw = lm.vadd(pa, lm.qrot(qa, cv(corner_l)))
                      sphere_box_contact(cw, 0.0, pb, qb, sb,
                                         b1, b2, ci, flip=flip)

    # ---- support-grouped packed-row Newton constraint solve ----
    # Rows are grouped by their STATIC dof-support pattern (a joint-limit
    # row touches 1 dof; a foot-contact row touches trunk + one leg). Per
    # group the rows pack to Jg (ng, ns, K) over only the ns support dims,
    # so the grad / Hessian / line-search contractions keep the SPARSE
    # flop count (sum_g ns_g^2 * ng_g instead of dense nv^2 * nrow) while
    # staying O(groups * ns^2) traced array ops — both the round-1 trace
    # blowup (O(rows*support^2) scalar unroll) and the dense-packed flop
    # blowup are avoided. Reference semantics: engine_solver Newton
    # (physics/constraint.py mirrors it in jnp).
    M = jnp.stack([jnp.stack(r) for r in mrows])      # (nv, nv, K)
    rhs_p = jnp.stack(rhs)                            # (nv, K)
    if profile_phase == "smooth":
      qacc_p = lm.chol_solve_packed(M, rhs_p)
      qvel_new = [qvel[i] + h * qacc_p[i] for i in range(nv)]
      return integrate_qpos(qpos, qvel_new), qvel_new, res
    if rows or eblocks:
      zero = like * 0.0
      groups = {}
      for jrow, aref, dcoef in rows:
        sup = tuple(i for i in range(nv) if jrow[i] is not None)
        groups.setdefault(sup, []).append((jrow, aref, dcoef))
      packed = []
      for sup, grows in groups.items():
        jg = jnp.stack([jnp.stack([jrow[i] + zero for i in sup])
                        for jrow, _, _ in grows])     # (ng, ns, K)
        arefg = jnp.stack([aref + zero for _, aref, _ in grows])
        dcoefg = jnp.stack([dcoef + zero for _, _, dcoef in grows])
        packed.append((sup, jg, arefg, dcoefg))

      # elliptic cone blocks stay per-contact (rows are COUPLED by the
      # zone logic; they cannot merge into the gated-quadratic groups)
      epacked = []
      for sup, jrows, arefs, dn, mu, scales in eblocks:
        jrs = [[jr[i] + zero for i in sup] for jr in jrows]
        epacked.append((sup, jrs, [ar + zero for ar in arefs],
                        dn + zero, mu, scales))

      def group_jar(a, sup, jg, arefg):
        ag = jnp.stack([a[i] for i in sup])           # (ns, K)
        return jnp.sum(jg * ag[None, :, :], axis=1) - arefg

      def ell_jar(a, sup, jrs, arefs):
        asup = [a[i] for i in sup]
        return [sum(jr[il] * asup[il] for il in range(len(sup))) - ar
                for jr, ar in zip(jrs, arefs)]

      def ell_terms(jar_rows, dn, mu, scales):
        """Elliptic cone cost expansion at jar — physics/constraint.py
        _elliptic_terms in per-row component form. Zones in the scaled
        space s_i = jar_i * scale_i, t = ||s||: bottom (mu*n + t <= 0)
        full quadratic; top (n >= mu*t) zero force; middle convex cost
        0.5*D_N/(1+mu^2)*(n - mu t)^2 with the EXACT cone Hessian
        (diag + w_mid gz gz^T - w_cone cs cs^T). Returns (g rows,
        h diagonal rows, w_mid, gz rows, w_cone, cs rows)."""
        n_ = jar_rows[0]
        nf = len(scales)
        s_rows = [jar_rows[1 + i] * float(scales[i]) for i in range(nf)]
        t = jnp.sqrt(sum(sr * sr for sr in s_rows))
        tsafe = jnp.maximum(t, 1e-12)
        bottom = (mu * n_ + t) <= 0.0
        middle = (~bottom) & (n_ < mu * t)
        w_coef = dn / (1.0 + mu * mu)
        z = n_ - mu * t
        shat = [sr / tsafe for sr in s_rows]
        gz = [jnp.ones_like(n_)] + \
            [-mu * shat[i] * float(scales[i]) for i in range(nf)]
        cs = [jnp.zeros_like(n_)] + \
            [shat[i] * float(scales[i]) for i in range(nf)]
        wz = jnp.where(middle, w_coef * z, 0.0)
        d_act = jnp.where(bottom, dn, 0.0)
        w_cone = jnp.where(middle, w_coef * (-z) * mu / tsafe, 0.0)
        g = [d_act * jar_rows[0] + wz * gz[0]]
        h = [d_act]
        for i in range(nf):
          r2 = float(scales[i]) ** 2
          g.append(d_act * r2 * jar_rows[1 + i] + wz * gz[1 + i])
          h.append(d_act * r2 + w_cone * r2)
        w_mid = jnp.where(middle, w_coef, 0.0)
        return g, h, w_mid, gz, w_cone, cs

      # masked Newton on qacc with exact 1-D line search
      # (physics/constraint.solve schedule: opt.iterations Newton x
      # opt.ls_iterations line-search iters; overridable per-kernel)
      a0 = lm.chol_solve_packed(M, rhs_p)             # qacc_smooth
      a = a0
      for _ in range(n_newton):
        ma = jnp.sum(M * (a - a0)[None, :, :], axis=1)       # (nv, K)
        grad_l = [None] * nv
        hupper = [[None] * nv for _ in range(nv)]     # global i <= j
        jars = []
        for sup, jg, arefg, dcoefg in packed:
          jar_g = group_jar(a, sup, jg, arefg)        # (ng, K)
          act_g = dcoefg * (jar_g < 0)
          jars.append(jar_g)
          gpart = jnp.sum(jg * (act_g * jar_g)[:, None, :], axis=0)
          ns = len(sup)
          for il, i in enumerate(sup):
            gi = gpart[il]
            grad_l[i] = gi if grad_l[i] is None else grad_l[i] + gi
            for jl in range(il, ns):
              jdof = sup[jl]
              hij = jnp.sum(act_g * jg[:, il, :] * jg[:, jl, :], axis=0)
              if hupper[i][jdof] is None:
                hupper[i][jdof] = hij
              else:
                hupper[i][jdof] = hupper[i][jdof] + hij
        # elliptic cone blocks: per-contact zone gradient + exact cone
        # Hessian (diag via h_r, rank-1 via (w_mid, gz)/(w_cone, cs)
        # projected onto the support dofs) — constraint.py newton_step
        e_jars, e_gs = [], []
        for sup, jrs, arefs, dn, mu, scales in epacked:
          jar_rows = ell_jar(a, sup, jrs, arefs)
          g_r, h_r, w_mid, gz, w_cone, cs = ell_terms(
              jar_rows, dn, mu, scales)
          e_jars.append(jar_rows)
          e_gs.append(g_r)
          ns = len(sup)
          ngr = len(jrs)
          v_l = [sum(gz[r] * jrs[r][il] for r in range(ngr))
                 for il in range(ns)]
          u_l = [sum(cs[r] * jrs[r][il] for r in range(ngr))
                 for il in range(ns)]
          for il, i in enumerate(sup):
            gi = sum(jrs[r][il] * g_r[r] for r in range(ngr))
            grad_l[i] = gi if grad_l[i] is None else grad_l[i] + gi
            for jl in range(il, ns):
              jdof = sup[jl]
              hij = sum(h_r[r] * jrs[r][il] * jrs[r][jl]
                        for r in range(ngr)) + \
                  w_mid * v_l[il] * v_l[jl] - w_cone * u_l[il] * u_l[jl]
              if hupper[i][jdof] is None:
                hupper[i][jdof] = hij
              else:
                hupper[i][jdof] = hupper[i][jdof] + hij
        grad = jnp.stack([g if g is not None else zero for g in grad_l])
        hfull = jnp.stack([jnp.stack(
            [mrows[i][j] + (hupper[i][j] if j >= i and
                            hupper[i][j] is not None else
                            (hupper[j][i] if j < i and
                             hupper[j][i] is not None else 0.0))
             for j in range(nv)]) for i in range(nv)])
        pstep = -lm.chol_solve_packed(hfull, ma + grad)
        if n_ls > 0:
          # Safeguarded exact line search along pstep (piecewise-
          # quadratic convex phi, so phi' is monotone): bracket phi''s
          # root, Newton steps clipped into the bracket with regula-
          # falsi fallback — mirrors physics/constraint.solve. Bare 1-D
          # Newton oscillates between activation segments on hard
          # states (deep penetration) and can step uphill, exploding
          # the candidate rollout.
          mp = jnp.sum(M * pstep[None, :, :], axis=1)
          pmp = jnp.sum(pstep * mp, axis=0)                  # (K,)
          pma = jnp.sum(pstep * ma, axis=0)
          jpss = []
          for sup, jg, arefg, dcoefg in packed:
            psg = jnp.stack([pstep[i] for i in sup])
            jpss.append(jnp.sum(jg * psg[None, :, :], axis=1))
          ejpss = []
          for sup, jrs, arefs, dn, mu, scales in epacked:
            psup = [pstep[i] for i in sup]
            ejpss.append([sum(jr[il] * psup[il]
                              for il in range(len(sup))) for jr in jrs])

          def dphi_lane(tls):
            dphi = pma + tls * pmp
            ddphi = pmp
            for (sup, jg, arefg, dcoefg), jar_g, jps_g in zip(
                packed, jars, jpss):
              jart = jar_g + tls[None, :] * jps_g
              act2 = dcoefg * (jart < 0)
              dphi = dphi + jnp.sum(act2 * jart * jps_g, axis=0)
              ddphi = ddphi + jnp.sum(act2 * jps_g * jps_g, axis=0)
            for (sup, jrs, arefs, dn, mu, scales), jar_rows, jps_r in \
                zip(epacked, e_jars, ejpss):
              jart_rows = [jr_ + tls * jp_ for jr_, jp_ in
                           zip(jar_rows, jps_r)]
              g_t, h_t, w_mid_t, gz_t, w_cone_t, cs_t = ell_terms(
                  jart_rows, dn, mu, scales)
              ngr = len(jrs)
              dphi = dphi + sum(g_t[r] * jps_r[r] for r in range(ngr))
              vp = sum(gz_t[r] * jps_r[r] for r in range(ngr))
              up = sum(cs_t[r] * jps_r[r] for r in range(ngr))
              ddphi = ddphi + sum(h_t[r] * jps_r[r] * jps_r[r]
                                  for r in range(ngr)) + \
                  w_mid_t * vp * vp - w_cone_t * up * up
            return dphi, ddphi

          # Zero-extra-eval safeguard: the bracket is built from the
          # n_ls Newton evaluations themselves (no expansion phase, so
          # easy candidates follow the exact pure-Newton iterate
          # sequence at the exact op count). _BIG is the "no upper
          # bracket yet" sentinel; until one exists, Newton growth is
          # capped geometrically (4x) per iteration.
          _BIG = 1e6
          one = jnp.ones_like(like)
          zero = jnp.zeros_like(like)
          # dphi(0) reuses the activations already computed at a (t=0)
          dlo = pma + zero
          for (sup, jg, arefg, dcoefg), jar_g, jps_g in zip(
              packed, jars, jpss):
            act0 = dcoefg * (jar_g < 0)
            dlo = dlo + jnp.sum(act0 * jar_g * jps_g, axis=0)
          for g_r, jps_r in zip(e_gs, ejpss):
            dlo = dlo + sum(g_r[r] * jps_r[r] for r in range(len(g_r)))
          lo = zero
          hi = jnp.full_like(like, _BIG)
          dhi = jnp.zeros_like(like)
          tls = one
          for _ in range(n_ls):
            dphi, ddphi = dphi_lane(tls)
            neg = dphi < 0
            lo = jnp.where(neg, tls, lo)
            dlo = jnp.where(neg, dphi, dlo)
            hi = jnp.where(neg, hi, tls)
            dhi = jnp.where(neg, dhi, dphi)
            t_n = tls - dphi / jnp.maximum(ddphi, 1e-12)
            # fallback when Newton exits the bracket: regula falsi on a
            # real bracket; geometric growth while unbracketed above
            denom = dhi - dlo
            t_s = lo - dlo * (hi - lo) / jnp.where(
                jnp.abs(denom) < 1e-12, 1.0, denom)
            t_s = jnp.clip(t_s, lo, hi)
            inb = (t_n > lo) & (t_n < hi)
            raw = jnp.where(inb, t_n, t_s)
            # while no upper bracket exists, clamp ANY step into
            # [lo, 4*t]: geometric growth only — a wild Newton jump
            # (the oscillation/explosion mode) cannot fire unbracketed
            cap = 4.0 * jnp.maximum(tls, one)
            unbracketed = hi >= _BIG
            tls = jnp.where(unbracketed,
                            jnp.clip(jnp.where(inb, t_n, tls), lo, cap),
                            raw)
          tls = jnp.clip(tls, zero, hi)
          a = a + tls[None, :] * pstep
        else:
          a = a + pstep
      rhs_l = list(rhs)
      for sup, jg, arefg, dcoefg in packed:
        jar_g = group_jar(a, sup, jg, arefg)
        act_g = dcoefg * (jar_g < 0)
        fpart = jnp.sum(jg * (act_g * jar_g)[:, None, :], axis=0)
        for il, i in enumerate(sup):
          rhs_l[i] = rhs_l[i] - fpart[il]
      for sup, jrs, arefs, dn, mu, scales in epacked:
        jar_rows = ell_jar(a, sup, jrs, arefs)
        g_r = ell_terms(jar_rows, dn, mu, scales)[0]
        for il, i in enumerate(sup):
          rhs_l[i] = rhs_l[i] - sum(jrs[r][il] * g_r[r]
                                    for r in range(len(jrs)))
      rhs_p = jnp.stack(rhs_l)

    # ---- implicit-damping Euler (packed solve) ----
    # diagonal damping added in component form (pallas kernels cannot
    # capture non-scalar constants)
    for i in range(nv):
      mrows[i][i] = mrows[i][i] + h * float(c["dof_damping"][i])
    m_e = jnp.stack([jnp.stack(r) for r in mrows])
    qacc_p = lm.chol_solve_packed(m_e, rhs_p)
    qvel_new = [qvel[i] + h * qacc_p[i] for i in range(nv)]
    return integrate_qpos(qpos, qvel_new), qvel_new, res

  nr = residual_dim if residual_fn is not None else 0
  # cost_terms: tuple of (norm_type, dim) — in-kernel scoring mode: the
  # residual rows are reduced to UNWEIGHTED per-term norm values each
  # step and accumulated over the horizon, so the kernel outputs
  # (nterm, K) term sums instead of (horizon, nr, K) residual rows.
  # Weights/risk stay OUTSIDE the kernel as traced XLA values (live
  # SetCostWeights updates never recompile); norm params ride 2*nterm
  # extra aux rows appended after the task aux rows.
  nterm = len(cost_terms) if cost_terms else 0
  if cost_terms:
    assert residual_fn is not None and not record_states
    assert sum(d for _, d in cost_terms) == residual_dim
  # ctrl_fn(t, qpos, qvel, vals, aux_dyn, scal) -> [nu lane arrays]
  # replaces the spline node gather (feedback policies:
  # u = u_nom + a k + K dx, ilqg/policy.cc:82-140). vals(i) reads
  # values_ref rows (per-candidate scalars, e.g. line-search alpha);
  # aux_dyn(i) reads raw aux rows — naux_extra appends per-step rows
  # that are NEVER materialized outside the loop. scal(i) reads the
  # scalar_rows-long SMEM table: per-step values SHARED across
  # candidates (nominal trajectory, gains) live there as true scalars
  # — one broadcast fma each — instead of lane-replicated VMEM rows
  # (which cost a dynamic row load per use and 128x the memory).
  if ctrl_fn is not None:
    assert residual_fn is not None, "ctrl_fn requires an in-kernel residual"
  if scalar_rows:
    assert residual_fn is not None and ctrl_fn is not None
  naux_kernel = naux + 2 * nterm
  naux_eff = (max(naux_kernel, 1) + naux_extra
              if residual_fn is not None else 0)
  if not record_states:
    assert residual_fn is not None, \
        "record_states=False requires an in-kernel residual"

  def term_costs(res, norm_p):
    out = []
    off = 0
    for k_t, (ntype, dim) in enumerate(cost_terms):
      p_, q_ = norm_p[2 * k_t], norm_p[2 * k_t + 1]
      out.append(lane_term_cost(res[off:off + dim], ntype, p_, q_))
      off += dim
    return out

  def kernel(qpos_ref, qvel_ref, values_ref, *rest):
    norm_p = None
    scal_ref = None
    if residual_fn is not None:
      if scalar_rows:
        scal_ref, rest = rest[1], (rest[0],) + rest[2:]
      if record_states:
        aux_ref, out_ref = rest
        res_ref = final_ref = sums_ref = None
      elif cost_terms:
        aux_ref, sums_ref, final_ref = rest
        out_ref = res_ref = None
      else:
        aux_ref, res_ref, final_ref = rest
        out_ref = sums_ref = None
      aux = [aux_ref[i] for i in range(naux)]
      aux_dyn = (lambda i: aux_ref[i]) if aux_ref is not None else None
      if cost_terms:
        norm_p = [aux_ref[naux + i] for i in range(2 * nterm)]
    else:
      (out_ref,) = rest
      res_ref = final_ref = sums_ref = None
      aux = None
      aux_dyn = None
    scal = (lambda i: scal_ref[i]) if scal_ref is not None else None

    def write_step(t, qpos, qvel, res):
      if record_states:
        for i in range(nq):
          out_ref[t, i] = qpos[i]
        for i in range(nv):
          out_ref[t, nq + i] = qvel[i]
        for r in range(nr):
          out_ref[t, nq + nv + r] = res[r]
      elif not cost_terms:
        for r in range(nr):
          res_ref[t, r] = res[r]

    qpos = [qpos_ref[i] for i in range(nq)]
    qvel = [qvel_ref[i] for i in range(nv)]
    zero = qpos[0] * 0.0
    sums = [zero] * nterm
    vals = lambda i: values_ref[i]
    if unroll:
      for t in range(horizon):
        if ctrl_fn is not None:
          ctrl = ctrl_fn(t, qpos, qvel, vals, aux_dyn, scal)
        else:
          node = node_of_step[t]
          ctrl = [values_ref[node * nu + u] for u in range(nu)]
        new_qpos, new_qvel, res = step_body(qpos, qvel, ctrl, t, aux,
                                            aux_dyn=aux_dyn)
        if cost_terms:
          tc = term_costs(res, norm_p)
          sums = [s_ + c_ for s_, c_ in zip(sums, tc)]
        else:
          write_step(t, qpos, qvel, res)
        qpos, qvel = new_qpos, new_qvel
    else:
      # horizon as an in-kernel loop: the program is ONE step body
      def body(t, carry):
        qpos, qvel, sums = (list(carry[0]), list(carry[1]),
                            list(carry[2]))
        if ctrl_fn is not None:
          ctrl = ctrl_fn(t, qpos, qvel, vals, aux_dyn, scal)
        else:
          node = jnp.minimum((t * num_nodes) // max(horizon - 1, 1),
                             num_nodes - 1)
          ctrl = [values_ref[node * nu + u] for u in range(nu)]
        new_qpos, new_qvel, res = step_body(qpos, qvel, ctrl, t, aux,
                                            aux_dyn=aux_dyn)
        if cost_terms:
          tc = term_costs(res, norm_p)
          sums = [s_ + c_ for s_, c_ in zip(sums, tc)]
        else:
          write_step(t, qpos, qvel, res)
        return (tuple(new_qpos), tuple(new_qvel), tuple(sums))

      qpos, qvel, sums = jax.lax.fori_loop(
          0, horizon, body, (tuple(qpos), tuple(qvel), tuple(sums)))
      qpos, qvel, sums = list(qpos), list(qvel), list(sums)
    if cost_terms:
      for k_t in range(nterm):
        sums_ref[k_t] = sums[k_t]
    if not record_states:
      for i in range(nq):
        final_ref[i] = qpos[i]
      for i in range(nv):
        final_ref[nq + i] = qvel[i]

  # candidate-block grid: each grid step processes KB lanes so the
  # output block + step working set stay within the ~16MB VMEM budget.
  # In cost-sum mode the output is just (nterm, K) + final state, so
  # KB=1024 always fits and every component is a full (8, 128) tile.
  out_rows = (nq + nv + residual_dim) if record_states else residual_dim
  out_t = 1 if cost_terms else horizon
  # In cost-sum mode the per-op overhead dominates (the VPU is far from
  # element-throughput-bound at these shapes), so fewer, WIDER blocks
  # win: one (32, 128) op amortizes the fixed Mosaic op cost over 4
  # VREGs where a 4-step grid of (8, 128) blocks pays it 4x. The raised
  # vmem_limit below makes the single-block live set fit.
  KB = 512 if record_states else (4096 if cost_terms else 1024)
  while KB > 128 and out_t * max(out_rows, 1) * KB * 4 > 3_000_000:
    KB //= 2

  @jax.jit
  def _rollout_jit(qpos0, qvel0, values, aux=None, scal=None):
    k = qpos0.shape[-1]
    if nu == 0:  # pallas rejects zero-size operands
      values = jnp.zeros((1, k), qpos0.dtype)
    nvals = values.shape[0]
    inputs = [qpos0, qvel0, values]
    if residual_fn is not None:
      if aux is None or (naux == 0 and naux_extra == 0):
        aux = jnp.zeros((naux_eff, k), qpos0.dtype)
      inputs.append(aux)
    if scalar_rows:
      assert scal is not None and scal.shape == (scalar_rows,)
    nout = nq + nv + nr

    # folded lane layout: the candidate axis becomes (K//128, 128) so
    # every per-component array inside the kernel is a NATIVE (S, 128)
    # VPU tile. A flat 1-D (K,) component lowers to a (1, K) vector
    # layout that uses 1 of 8 sublanes -> 8x waste on every elementwise
    # op (measured: 118 vs 1049 Gop/s, scripts/probe_layout.py).
    # Mosaic grid constraint: a 3-D block's last-two dims must be
    # divisible by (8, 128) or equal the array dims, so a folded GRID
    # needs KB//128 % 8 == 0 (KB >= 1024); single-block any k%128.
    folded = k % 128 == 0 and (
        k <= KB or k % KB != 0 or (KB // 128) % 8 == 0)
    if folded:
      sub = k // 128
      inputs = [x.reshape(x.shape[0], sub, 128) for x in inputs]

    def shape3(rows, kk):
      if folded:
        return (rows, kk // 128, 128)
      return (rows, kk)

    def shape4(t_, rows, kk):
      if folded:
        return (t_, rows, kk // 128, 128)
      return (t_, rows, kk)

    if record_states:
      out_shape = jax.ShapeDtypeStruct(shape4(horizon, nout, k),
                                       qpos0.dtype)
    elif cost_terms:
      out_shape = (
          jax.ShapeDtypeStruct(shape3(nterm, k), qpos0.dtype),
          jax.ShapeDtypeStruct(shape3(nq + nv, k), qpos0.dtype))
    else:
      out_shape = (
          jax.ShapeDtypeStruct(shape4(horizon, nr, k), qpos0.dtype),
          jax.ShapeDtypeStruct(shape3(nq + nv, k), qpos0.dtype))

    def unfold(out):
      if not folded:
        return out
      if record_states:
        return out.reshape(horizon, nout, k)
      if cost_terms:
        return (out[0].reshape(nterm, k), out[1].reshape(nq + nv, k))
      return (out[0].reshape(horizon, nr, k),
              out[1].reshape(nq + nv, k))

    # folded blocks keep 8x more live data per component (8 sublanes vs
    # 1), so the kernel's scoped-VMEM stack outgrows the 16MB default on
    # wide models; v5e/v5p have 128MB VMEM — raise the cap for this
    # single-kernel program (no pipelining to starve)
    compiler_params = None
    if not interpret:
      compiler_params = pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024)
    if k <= KB or k % KB != 0:
      if scalar_rows:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
                    for _ in inputs]
        in_specs.insert(4, pl.BlockSpec(memory_space=pltpu.SMEM))
        return unfold(pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=compiler_params,
        )(*inputs[:4], scal, *inputs[4:]))
      return unfold(pl.pallas_call(
          kernel,
          out_shape=out_shape,
          interpret=interpret,
          compiler_params=compiler_params,
      )(*inputs))
    assert not scalar_rows, \
        "scalar_rows is single-block only (feedback line searches)"
    grid = (k // KB,)
    if folded:
      sb = KB // 128
      in_specs = [
          pl.BlockSpec((nq, sb, 128), lambda i: (0, i, 0)),
          pl.BlockSpec((nv, sb, 128), lambda i: (0, i, 0)),
          pl.BlockSpec((nvals, sb, 128), lambda i: (0, i, 0)),
      ]
      if residual_fn is not None:
        in_specs.append(pl.BlockSpec((naux_eff, sb, 128),
                                     lambda i: (0, i, 0)))
      if record_states:
        out_specs = pl.BlockSpec((horizon, nout, sb, 128),
                                 lambda i: (0, 0, i, 0))
      elif cost_terms:
        out_specs = (pl.BlockSpec((nterm, sb, 128),
                                  lambda i: (0, i, 0)),
                     pl.BlockSpec((nq + nv, sb, 128),
                                  lambda i: (0, i, 0)))
      else:
        out_specs = (pl.BlockSpec((horizon, nr, sb, 128),
                                  lambda i: (0, 0, i, 0)),
                     pl.BlockSpec((nq + nv, sb, 128),
                                  lambda i: (0, i, 0)))
    else:
      in_specs = [
          pl.BlockSpec((nq, KB), lambda i: (0, i)),
          pl.BlockSpec((nv, KB), lambda i: (0, i)),
          pl.BlockSpec((nvals, KB), lambda i: (0, i)),
      ]
      if residual_fn is not None:
        in_specs.append(pl.BlockSpec((naux_eff, KB), lambda i: (0, i)))
      if record_states:
        out_specs = pl.BlockSpec((horizon, nout, KB), lambda i: (0, 0, i))
      elif cost_terms:
        out_specs = (pl.BlockSpec((nterm, KB), lambda i: (0, i)),
                     pl.BlockSpec((nq + nv, KB), lambda i: (0, i)))
      else:
        out_specs = (pl.BlockSpec((horizon, nr, KB), lambda i: (0, 0, i)),
                     pl.BlockSpec((nq + nv, KB), lambda i: (0, i)))
    return unfold(pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*inputs))

  def rollout(qpos0, qvel0, values, aux=None, scal=None):
    if scalar_rows:
      return _rollout_jit(qpos0, qvel0, values, aux, scal)
    return _rollout_jit(qpos0, qvel0, values, aux)

  def step_array(qpos, qvel, ctrl, t=0, aux=None):
    """One physics step as plain jnp on (dim, K) arrays — the same
    step_body the Pallas kernel runs, without the kernel wrapper. Used
    by tests (interpret-mode Pallas dispatch is orders of magnitude
    slower) and usable as a lane-layout XLA step."""
    qp = [qpos[i] for i in range(nq)]
    qv = [qvel[i] for i in range(nv)]
    ct = [ctrl[i] for i in range(nu)]
    ax = None if aux is None else [aux[i] for i in range(aux.shape[0])]
    axd = None if aux is None else (lambda i: aux[i])
    qpn, qvn, res = step_body(qp, qv, ct, t, ax, aux_dyn=axd)
    out = (jnp.stack(qpn), jnp.stack(qvn))
    return out + ((jnp.stack(res),) if res is not None else ())

  def residual_array(qpos, qvel, ctrl, t=0, aux=None):
    """residual_fn rows as plain jnp on (dim, K) arrays, tracing only
    the derived quantities (FK/com/cvel/actuation) — for parity tests
    on large-nv models where the full step trace is impractical."""
    if residual_fn is None:
      raise ValueError("residual_array requires the kernel to be built "
                       "with residual_fn (this one was not)")
    qp = [qpos[i] for i in range(nq)]
    qv = [qvel[i] for i in range(nv)]
    ct = [ctrl[i] for i in range(nu)]
    ax = None if aux is None else [aux[i] for i in range(aux.shape[0])]
    axd = None if aux is None else (lambda i: aux[i])
    _, _, res = step_body(qp, qv, ct, t, ax, derived_only=True,
                          aux_dyn=axd)
    return jnp.stack(res)

  rollout.step_array = step_array
  rollout.residual_array = residual_array
  return rollout
