"""Aloha bimanual Insert and Reorient tasks.

Reference capability: mjpc/tasks/bimanual/{insert,reorient}
(insert.cc:32-186, reorient.cc:32-140) — two-arm manipulation with
18-dim "frame cross" costs (6 points at +-radius along each frame axis,
matching position AND orientation simultaneously), two-handed grasp
quality, z-dominant lift to a target post (Insert), and a floating
target pose (Reorient). The reference scores grasp quality from contact
normals (opposing finger normals, insert/insert.cc:60-121); Insert here
does the same from the solver's contact state exposed on
Data.contact (geom ids, frame normals, dist): grasp = 0 needs REAL
two-sided contact with opposing normals. The lane-kernel planning
residual approximates the same quantity geometrically (pad-center
sphere vs connector box narrowphase — a reduced planning model, like
the reference's plan-model simplifications); Reorient keeps the
finger-pad proximity surrogate (0 = pads on the object, 1 = far,
matching the reference's 1 = not-in-contact convention).

Rig: the same independently-authored two-arm pair as BimanualHandover
(tasks/bimanual.py) with task-specific objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import math as mm
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks import base
from mujoco_mpc_tpu.tasks import bimanual as B


def _cross18(pos, mat, radius):
  """6 points at +-radius along a frame's axes (insert.cc kRadius)."""
  pts = []
  for dim in range(3):
    axis = mat[:, dim]
    for sign in (-1.0, 1.0):
      pts.append(pos + sign * radius * axis)
  return jnp.concatenate(pts)


_OBJ_HANDOVER = (
    '<body name="object" pos="-0.15 0 0.03">\n'
    '      <freejoint/>\n'
    '      <geom name="obj_geom" type="box" size="0.02 0.02 0.03" '
    'mass="0.08"\n            condim="6" friction="1.5 0.02 0.002"/>\n'
    '    </body>\n'
    '    <body name="target" mocap="true" pos="0.25 0.15 0.03">\n'
    '      <geom name="target_geom" type="box" size="0.02 0.02 0.03"\n'
    '            contype="0" conaffinity="0"/>\n'
    '    </body>')

_OBJ_INSERT = (
    '<body name="connector_female" pos="-0.15 0.1 0.025">\n'
    '      <freejoint/>\n'
    '      <geom name="connector_f_grip" type="box" '
    'size="0.03 0.03 0.02" mass="0.08" condim="6" friction="1.5 0.02 0.002"/>\n'
    '      <site name="connector_f" pos="0 0 0.02"/>\n'
    '    </body>\n'
    '    <body name="connector_male" pos="0.15 -0.1 0.025">\n'
    '      <freejoint/>\n'
    '      <geom name="connector_m_grip" type="box" '
    'size="0.015 0.015 0.035" mass="0.06" condim="6" friction="1.5 0.02 0.002"/>\n'
    '      <site name="connector_m" pos="0 0 -0.02"/>\n'
    '    </body>\n'
    '    <geom name="target" type="sphere" pos="0 0.25 0.1" size="0.015"'
    ' contype="0" conaffinity="0"/>')

_OBJ_REORIENT = (
    '<body name="cross" pos="0 0 0.03">\n'
    '      <freejoint/>\n'
    '      <geom name="cross_a" type="box" size="0.05 0.015 0.015" '
    'mass="0.05" condim="6" friction="1.5 0.02 0.002"/>\n'
    '      <geom name="cross_b" type="box" size="0.015 0.05 0.015" '
    'mass="0.05" condim="6" friction="1.5 0.02 0.002"/>\n'
    '    </body>\n'
    '    <body name="target_orient" mocap="true" pos="0 0 0.25">\n'
    '      <geom name="t_a" type="box" size="0.05 0.015 0.015" '
    'contype="0" conaffinity="0"/>\n'
    '      <geom name="t_b" type="box" size="0.015 0.05 0.015" '
    'contype="0" conaffinity="0"/>\n'
    '    </body>')

_SENS_HANDOVER = (
    '<user name="Reach Left" dim="3" user="2 0.5 0 2.0 0.04"/>\n'
    '    <user name="Reach Right" dim="3" user="2 0.5 0 2.0 0.04"/>\n'
    '    <user name="Bring" dim="3" user="6 5.0 0 10.0 0.02"/>\n'
    '    <user name="Control" dim="10" user="0 0.03 0 1.0"/>')

_SENS_INSERT = (
    '<user name="Reach L" dim="3" user="2 .3 0 1 .01"/>\n'
    '    <user name="Reach R" dim="3" user="2 .3 0 1 .01"/>\n'
    '    <user name="Grasp L" dim="1" user="-1 .4 0 1"/>\n'
    '    <user name="Grasp R" dim="1" user="-1 .4 0 1"/>\n'
    '    <user name="Lift" dim="6" user="6 0.7 0 1 0.05"/>\n'
    '    <user name="Insert" dim="18" user="2 0.4 0 1 0.01"/>')

_SENS_REORIENT = (
    '<user name="Reach L" dim="3" user="1 .1 0 .5 .05 4"/>\n'
    '    <user name="Reach R" dim="3" user="1 .1 0 .5 .05 4"/>\n'
    '    <user name="Grasp L" dim="1" user="-1 .05 0 .5"/>\n'
    '    <user name="Grasp R" dim="1" user="-1 .05 0 .5"/>\n'
    '    <user name="Bring" dim="18" user="2 1 0 5 0.01"/>')

_KEY_HANDOVER = ('qpos="0 0.5 0.8 0.02 0.02 0 0.5 0.8 0.02 0.02\n'
                 '                           -0.15 0 0.03 1 0 0 0"')
_KEY_INSERT = ('qpos="0 0.5 0.8 0.02 0.02 0 0.5 0.8 0.02 0.02\n'
               '                           -0.15 0.1 0.025 1 0 0 0\n'
               '                           0.15 -0.1 0.025 1 0 0 0"')
_KEY_REORIENT = ('qpos="0 0.5 0.8 0.02 0.02 0 0.5 0.8 0.02 0.02\n'
                 '                           0 0 0.03 1 0 0 0"')


def _variant_xml(objects, sensors, key):
  xml = B._XML
  assert _OBJ_HANDOVER in xml and _SENS_HANDOVER in xml, \
      "bimanual rig XML changed; update aloha.py substitution anchors"
  xml = xml.replace(_OBJ_HANDOVER, objects)
  xml = xml.replace(_SENS_HANDOVER, sensors)
  xml = xml.replace(_KEY_HANDOVER, key)
  return xml


class _PadGrasp:
  """Finger-pad proximity grasp surrogate shared by Insert/Reorient."""

  def _grasp(self, d, side, obj_body):
    obj = d.xipos[obj_body]
    dl = jnp.linalg.norm(d.xipos[self._fl[side]] - obj)
    dr = jnp.linalg.norm(d.xipos[self._fr[side]] - obj)
    return jnp.clip((dl + dr - 0.06) / 0.2, 0.0, 1.0)

  def _find_pads(self):
    names = self.model.names
    self._fl = {s: names["body"].index(f"fl_{s}")
                for s in ("left", "right")}
    self._fr = {s: names["body"].index(f"fr_{s}")
                for s in ("left", "right")}
    self._hand_l = names["site"].index("hand_left")
    self._hand_r = names["site"].index("hand_right")


class BimanualInsert(_PadGrasp, base.Task):
  """Grasp both connectors, lift them to the target, mate the frames
  (reference "Bimanual Insert")."""

  name = "Bimanual Insert"

  def __init__(self, **kw):
    super().__init__(**kw)
    names = self.model.names
    self._find_pads()
    self._site_f = names["site"].index("connector_f")
    self._site_m = names["site"].index("connector_m")
    self._body_f = names["body"].index("connector_female")
    self._body_m = names["body"].index("connector_male")
    self._target = names["geom"].index("target")
    self._geom_f = names["geom"].index("connector_f_grip")
    self._geom_m = names["geom"].index("connector_m_grip")

  def xml(self) -> str:
    return _variant_xml(_OBJ_INSERT, _SENS_INSERT, _KEY_INSERT)

  def _contact_grasp(self, d: Data, conn_geom: int, fingers,
                     hand_site: int, conn_site: int) -> jax.Array:
    """Opposing-contact-normal grasp quality from the solver's contact
    state (reference insert.cc:60-121: accumulate finger->object
    normals per finger; grasp = (dot(n_l, n_r) + 2 dot(x_grip, x_obj)
    + 3)/6 when both fingers touch, else 1)."""
    con = d.contact
    dtype = d.qpos.dtype
    if con is None or con.geom1_id is None or con.dist.shape[0] == 0:
      return jnp.ones((), dtype)
    active = con.dist < 0
    g1, g2 = con.geom1_id, con.geom2_id
    inv_conn = (g1 == conn_geom) | (g2 == conn_geom)
    # frame normal points geom1 -> geom2; flip so it points
    # finger -> object (reference sign rule)
    sign = jnp.where(g1 == conn_geom, -1.0, 1.0).astype(dtype)
    normals = con.frame[:, 0, :] * sign[:, None]
    ns, counts = [], []
    for fb in fingers:
      on_f = (con.body1 == fb) | (con.body2 == fb)
      mask = (inv_conn & on_f & active).astype(dtype)
      n = jnp.sum(normals * mask[:, None], axis=0)
      ns.append(n / jnp.maximum(jnp.linalg.norm(n), 1e-12))
      counts.append(jnp.sum(mask))
    have_both = (counts[0] > 0) & (counts[1] > 0)
    con_mis = jnp.dot(ns[0], ns[1])
    frame_mis = jnp.dot(d.site_xmat[hand_site][:, 0],
                        d.site_xmat[conn_site][:, 0])
    grasp = (con_mis + 2.0 * frame_mis + 3.0) / 6.0
    return jnp.where(have_both, grasp, jnp.ones((), dtype))

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    f_pos = d.site_xpos[self._site_f]
    m_pos = d.site_xpos[self._site_m]
    reach_l = d.site_xpos[self._hand_l] - f_pos
    reach_r = d.site_xpos[self._hand_r] - m_pos
    grasp_l = self._contact_grasp(
        d, self._geom_f, (self._fl["left"], self._fr["left"]),
        self._hand_l, self._site_f)
    grasp_r = self._contact_grasp(
        d, self._geom_m, (self._fl["right"], self._fr["right"]),
        self._hand_r, self._site_m)
    target = d.geom_xpos[self._target]
    # z-dominant lift: x, y scaled by 0.1 (insert.cc:135-147)
    scale = jnp.asarray([0.1, 0.1, 1.0], d.qpos.dtype)
    lift_m = (m_pos - target) * scale
    lift_f = (f_pos - target) * scale
    insert = (_cross18(m_pos, d.site_xmat[self._site_m], 0.08) -
              _cross18(f_pos, d.site_xmat[self._site_f], 0.08))
    return jnp.concatenate([
        reach_l, reach_r, grasp_l[None], grasp_r[None], lift_m, lift_f,
        insert])


  # connector-gripper contacts are load-bearing for planning
  plan_body_pairs = True

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: reach, opposing-normal
    grasp (pad-center sphere vs connector box narrowphase — the
    planning-model approximation of residual()'s solver-contact grasp),
    z-dominant lift, 18-point frame-mating rows (insert.cc:135-147
    semantics), all on VMEM-resident FK."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_quat = np.asarray(g(m.site_quat))
    site_bodyid = np.asarray(m.site_bodyid)
    geom_pos = np.asarray(g(m.geom_pos))
    geom_size = np.asarray(g(m.geom_size))
    geom_bodyid = np.asarray(m.geom_bodyid)

    def site_const(s):
      return (int(site_bodyid[s]), [float(v) for v in site_pos[s]],
              [float(v) for v in site_quat[s]])

    hands = [site_const(s) for s in (self._hand_l, self._hand_r)]
    conns = [site_const(s) for s in (self._site_f, self._site_m)]
    pad_r = 0.008  # pad half-thickness + margin (planning approximation)
    names = self.model.names

    def pad_geom(b):
      gid = names["geom"].index(names["body"][b] + "_geom")
      return (b, [float(v) for v in geom_pos[gid]])

    pads = {side: [pad_geom(b)
                   for b in (self._fl[side], self._fr[side])]
            for side in ("left", "right")}
    conn_boxes = {
        "left": (int(geom_bodyid[self._geom_f]),
                 [float(v) for v in geom_pos[self._geom_f]],
                 [float(v) for v in geom_size[self._geom_f]]),
        "right": (int(geom_bodyid[self._geom_m]),
                  [float(v) for v in geom_pos[self._geom_m]],
                  [float(v) for v in geom_size[self._geom_m]]),
    }
    tg_b = int(geom_bodyid[self._target])
    tg_p = [float(v) for v in geom_pos[self._target]]

    def fn(ctx):
      lm, cv = ctx["lm"], ctx["cv"]
      xpos, xquat = ctx["xpos"], ctx["xquat"]

      def site_world(b, p, q):
        pos = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        wq = lm.qmul(xquat[b], tuple(q))  # const quat: scalars broadcast
        return pos, wq

      f_pos, f_q = site_world(*conns[0])
      m_pos, m_q = site_world(*conns[1])
      rows = []
      for (b, p, q), tgt in zip(hands, (f_pos, m_pos)):
        h = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        rows += [h[k] - tgt[k] for k in range(3)]
      for side, hand, conn_q in zip(("left", "right"), hands,
                                    (f_q, m_q)):
        bb, bp_l, bs = conn_boxes[side]
        bq = xquat[bb]
        bqc = (bq[0], jnp.negative(bq[1]), jnp.negative(bq[2]),
               jnp.negative(bq[3]))
        bpw = lm.vadd(xpos[bb], lm.qrot(bq, cv(bp_l)))
        ns, gates = [], []
        for pb, pp in pads[side]:
          pc = lm.vadd(xpos[pb], lm.qrot(xquat[pb], cv(pp)))
          loc = lm.qrot(bqc, lm.vsub(pc, bpw))
          cl = tuple(jnp.clip(loc[k], -bs[k], bs[k]) for k in range(3))
          dv = lm.vsub(loc, cl)
          dn = jnp.sqrt(dv[0] ** 2 + dv[1] ** 2 + dv[2] ** 2 + 1e-18)
          dist = dn - pad_r
          # box -> pad direction = object -> finger; flip to
          # finger -> object like the reference normal convention
          n_w = lm.qrot(bq, tuple(-dv[k] / dn for k in range(3)))
          ns.append(n_w)
          gates.append((dist < 0).astype(dn.dtype))
        have = gates[0] * gates[1]
        con_mis = lm.vdot(ns[0], ns[1])
        hb, hp, hq = hand
        hand_q = lm.qmul(xquat[hb], tuple(hq))
        x_hand = lm.qrot(hand_q, cv([1.0, 0.0, 0.0]))
        x_conn = lm.qrot(conn_q, cv([1.0, 0.0, 0.0]))
        frame_mis = lm.vdot(x_hand, x_conn)
        grasp = (con_mis + 2.0 * frame_mis + 3.0) / 6.0
        rows.append(have * grasp + (1.0 - have))
      target = lm.vadd(xpos[tg_b], lm.qrot(xquat[tg_b], cv(tg_p)))
      for pos in (m_pos, f_pos):
        sc = (0.1, 0.1, 1.0)
        rows += [(pos[k] - target[k]) * sc[k] for k in range(3)]
      # 18 mating rows: male keypoints minus female keypoints
      axes = [cv([1.0, 0.0, 0.0]), cv([0.0, 1.0, 0.0]),
              cv([0.0, 0.0, 1.0])]
      r = 0.08
      for dim in range(3):
        am = lm.qrot(m_q, axes[dim])
        af = lm.qrot(f_q, axes[dim])
        for sgn in (-1.0, 1.0):
          for k in range(3):
            rows.append((m_pos[k] + sgn * r * am[k])
                        - (f_pos[k] + sgn * r * af[k]))
      return rows

    def make_aux(d0, params):
      return jnp.zeros((1,), jnp.float32)

    return dict(dim=32, naux=1, fn=fn, make_aux=make_aux)


class BimanualReorient(_PadGrasp, base.Task):
  """Reorient the cross-shaped object to the floating target pose
  (reference "Bimanual Reorient")."""

  name = "Bimanual Reorient"

  def __init__(self, **kw):
    super().__init__(**kw)
    self._find_pads()
    self._object = self.model.names["body"].index("cross")

  def xml(self) -> str:
    return _variant_xml(_OBJ_REORIENT, _SENS_REORIENT, _KEY_REORIENT)

  def residual(self, m: Model, d: Data, params: jax.Array) -> jax.Array:
    obj_pos = d.xipos[self._object]
    obj_mat = d.xmat[self._object]
    reach_l = d.site_xpos[self._hand_l] - obj_pos
    reach_r = d.site_xpos[self._hand_r] - obj_pos
    grasp_l = self._grasp(d, "left", self._object)
    grasp_r = self._grasp(d, "right", self._object)
    t_pos = d.mocap_pos[0]
    t_mat = mm.quat_to_mat(mm.normalize_quat(d.mocap_quat[0]))
    bring = (_cross18(t_pos, t_mat, 0.05) -
             _cross18(obj_pos, obj_mat, 0.05))
    return jnp.concatenate([
        reach_l, reach_r, grasp_l[None], grasp_r[None], bring])

  # object-gripper contacts are load-bearing for planning
  plan_body_pairs = True

  def lane_residual_spec(self):
    """In-kernel residual for ops/step_lane.py: reach + pad grasp +
    18-keypoint bring; the target keypoints are mocap-derived and fixed
    per rollout, so they ride 18 aux rows."""
    m = getattr(self, "plan_model", self.model)
    g = jax.device_get
    site_pos = np.asarray(g(m.site_pos))
    site_bodyid = np.asarray(m.site_bodyid)
    body_ipos = np.asarray(g(m.body_ipos))
    hands = [(int(site_bodyid[s]), [float(v) for v in site_pos[s]])
             for s in (self._hand_l, self._hand_r)]
    pads = {side: [self._fl[side], self._fr[side]]
            for side in ("left", "right")}
    obj = self._object

    def fn(ctx):
      lm, cv, aux = ctx["lm"], ctx["cv"], ctx["aux"]
      xpos, xquat, xipos = ctx["xpos"], ctx["xquat"], ctx["xipos"]
      rows = []
      for b, p in hands:
        h = lm.vadd(xpos[b], lm.qrot(xquat[b], cv(p)))
        rows += [h[k] - xipos[obj][k] for k in range(3)]
      for side in ("left", "right"):
        dsum = None
        for pb in pads[side]:
          dx = [xipos[pb][k] - xipos[obj][k] for k in range(3)]
          dist = jnp.sqrt(dx[0] ** 2 + dx[1] ** 2 + dx[2] ** 2 + 1e-18)
          dsum = dist if dsum is None else dsum + dist
        rows.append(jnp.clip((dsum - 0.06) / 0.2, 0.0, 1.0))
      # bring: aux target keypoints minus object keypoints (body frame)
      axes = [cv([1.0, 0.0, 0.0]), cv([0.0, 1.0, 0.0]),
              cv([0.0, 0.0, 1.0])]
      r, i = 0.05, 0
      for dim in range(3):
        a = lm.qrot(xquat[obj], axes[dim])
        for sgn in (-1.0, 1.0):
          for k in range(3):
            rows.append(aux[i] - (xipos[obj][k] + sgn * r * a[k]))
            i += 1
      return rows

    def make_aux(d0, params):
      t_pos = d0.mocap_pos[0]
      t_mat = mm.quat_to_mat(mm.normalize_quat(d0.mocap_quat[0]))
      return _cross18(t_pos, t_mat, 0.05).astype(jnp.float32)

    return dict(dim=26, naux=18, fn=fn, make_aux=make_aux)
