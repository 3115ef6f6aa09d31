"""Constraint assembly: fixed-shape efc rows + impedance + reference accel.

Counterpart of mj_makeConstraint / mj_diagApprox / mj_makeImpedance /
mj_referenceConstraint (/root/reference/src/engine/engine_core_constraint.c).
Row layout is static (Model.efc): equality, dof/tendon friction, limits,
contacts. Rows that the reference would not instantiate this step (limit not
within margin, contact separated) are masked via efc_active → their D, aref
and frictionloss are zeroed, so they contribute nothing to the solver while
shapes stay fixed.

The solimp→impedance sigmoid, solref→(K,B) maps, diagA inverse-inertia
approximations, pyramidal/elliptic R scalings and the aref formula
aref = −B·(J qvel) − K·imp·(pos − margin) follow the reference's normative
spec (doc/computation eq:impedance_R, eq:aref, eq:solref_standard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (ConeType, Data, DisableBit, EqType,
                                     JointType, Model)
from mujoco_tpu.ops import support
from mujoco_tpu.utils import math as mjm


# ---------------------------------------------------------------------------
# impedance helpers
# ---------------------------------------------------------------------------


def _impedance(solimp, pos, margin):
  """solimp 5-param sigmoid → (imp, imp') (getimpedance,
  engine_core_constraint.c:2099)."""
  d0, dw, width, mid, pw = (solimp[..., 0], solimp[..., 1], solimp[..., 2],
                            solimp[..., 3], solimp[..., 4])
  flat = (d0 == dw) | (width <= mjm.MINVAL)

  x_raw = (pos - margin) / jnp.where(width <= mjm.MINVAL, 1.0, width)
  sgn = jnp.where(x_raw < 0, -1.0, 1.0)
  x = jnp.clip(jnp.abs(x_raw), 0.0, 1.0)

  # piecewise power sigmoid
  lin = pw == 1
  a = 1.0 / jnp.maximum(mid, mjm.MINVAL) ** jnp.maximum(pw - 1, 0.0)
  b = 1.0 / jnp.maximum(1 - mid, mjm.MINVAL) ** jnp.maximum(pw - 1, 0.0)
  lo = a * x ** pw
  hi = 1.0 - b * (1 - x) ** pw
  y = jnp.where(lin, x, jnp.where(x <= mid, lo, hi))
  yp = jnp.where(lin, jnp.ones_like(x),
                 jnp.where(x <= mid, pw * a * x ** jnp.maximum(pw - 1, 0.0),
                           pw * b * (1 - x) ** jnp.maximum(pw - 1, 0.0)))

  sat = (jnp.abs(x_raw) >= 1) | (jnp.abs(x_raw) <= 0)
  imp_sat = jnp.where(jnp.abs(x_raw) >= 1, dw, d0)
  imp = jnp.where(flat, 0.5 * (d0 + dw),
                  jnp.where(sat, imp_sat, d0 + y * (dw - d0)))
  imp_p = jnp.where(flat | sat, 0.0, yp * sgn * (dw - d0) / width)
  return imp, imp_p


def _kb(solref, solimp):
  """solref → stiffness K, damping B (mj_makeImpedance,
  engine_core_constraint.c:2183-2204): standard (timeconst, dampratio) or
  direct (−stiffness, −damping) formats."""
  dw = solimp[..., 1]
  ref0, ref1 = solref[..., 0], solref[..., 1]
  k_std = 1.0 / jnp.maximum(mjm.MINVAL, dw * dw * ref0 * ref0 * ref1 * ref1)
  k_dir = -ref0 / jnp.maximum(mjm.MINVAL, dw * dw)
  k = jnp.where(ref0 > 0, k_std, k_dir)
  b_std = 2.0 / jnp.maximum(mjm.MINVAL, dw * ref0)
  b_dir = -ref1 / jnp.maximum(mjm.MINVAL, dw)
  b = jnp.where(ref1 > 0, b_std, b_dir)
  return k, b


# ---------------------------------------------------------------------------
# Jacobian building blocks
# ---------------------------------------------------------------------------


def _point_jac_diff(m: Model, d: Data, points, body1, body2, with_rot=True):
  """Translational + rotational Jacobian differences (side2 − side1) at one
  point per row. points: (n, 3); body1/body2: static (n,) arrays.
  Returns jacp, jacr each (n, 3, nv) (jacr None when with_rot=False)."""
  dtype = d.qpos.dtype
  mask = (jnp.asarray(m.tree.ancestor_mask[body2], dtype=dtype)
          - jnp.asarray(m.tree.ancestor_mask[body1], dtype=dtype))  # (n, nv)
  o = d.subtree_com[m.body_rootid[m.dof_bodyid]]                  # (nv, 3)
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:]
  # jacp[n, v, :] = lin_v + ang_v × (p_n − o_v)
  jacp = lin[None] + jnp.cross(jnp.broadcast_to(ang[None], (points.shape[0],) + ang.shape),
                               points[:, None, :] - o[None])
  jacp = jacp * mask[..., None]
  if not with_rot:
    return jnp.swapaxes(jacp, 1, 2), None
  jacr = jnp.broadcast_to(ang[None], jacp.shape) * mask[..., None]
  return jnp.swapaxes(jacp, 1, 2), jnp.swapaxes(jacr, 1, 2)


def _jacdot_v(m: Model, d: Data, point, bodyid):
  """(d/dt J)·qvel for a point on a body, dense (mj_jacDot,
  engine_core_util.c:605, contracted with qvel). Returns (jdv_p, jdv_r)."""
  dtype = d.qpos.dtype
  # cdof_dot with quaternion dofs replaced by cvel[dof_body] × cdof
  jtype = m.jnt_type[m.dof_jntid]
  dof_in_jnt = np.arange(m.nv) - m.jnt_dofadr[m.dof_jntid]
  is_quat = (jtype == JointType.BALL) | (
      (jtype == JointType.FREE) & (dof_in_jnt >= 3))
  cd_q = mjm.motion_cross(d.cvel[m.dof_bodyid], d.cdof)
  cdof_dot_q = jnp.where(jnp.asarray(is_quat)[:, None], cd_q, d.cdof_dot)

  mask = jnp.asarray(m.tree.ancestor_mask[bodyid], dtype=dtype)
  a = ((mask * d.qvel)[None, :] @ cdof_dot_q)[0]        # (6,)
  w = ((mask * d.qvel)[None, :] @ d.cdof)[0]            # (6,) = cvel of body
  com = d.subtree_com[m.body_rootid[bodyid]]
  offset = point - com
  # pvel_lin: linear velocity of the point
  pvel_lin = d.cvel[bodyid, 3:] + jnp.cross(d.cvel[bodyid, :3], offset)
  jdv_p = a[3:] + jnp.cross(a[:3], offset) + jnp.cross(w[:3], pvel_lin)
  jdv_r = a[:3]
  return jdv_p, jdv_r


# ---------------------------------------------------------------------------
# row builders — each returns (J, pos, margin, frictionloss, active,
#                              diagA, solref, solreffriction, solimp,
#                              imp_pos) for its rows
# ---------------------------------------------------------------------------


def _equality_rows(m: Model, d: Data):
  dtype = d.qpos.dtype
  nv = m.nv
  rows_J, rows_pos, rows_active, rows_diaga = [], [], [], []
  rows_solref, rows_solimp, rows_imp_pos = [], [], []

  eq_enabled = not m.disabled(DisableBit.EQUALITY)

  for i in range(m.neq):
    et = int(m.eq_type[i])
    obj1, obj2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
    data = m.eq_data[i]
    active = d.eq_active[i] & eq_enabled

    if et in (EqType.CONNECT, EqType.WELD):
      is_site = int(m.eq_objtype[i]) == 6  # mjOBJ_SITE
      if is_site:
        b1, b2 = int(m.site_bodyid[obj1]), int(m.site_bodyid[obj2])
        pos1 = d.site_xpos[obj1]
        pos2 = d.site_xpos[obj2]
      else:
        b1, b2 = obj1, obj2
        if et == EqType.CONNECT:
          anchor1, anchor2 = data[0:3], data[3:6]
        else:
          anchor1, anchor2 = data[3:6], data[0:3]
        pos1 = d.xpos[b1] + d.xmat[b1] @ anchor1
        pos2 = d.xpos[b2] + d.xmat[b2] @ anchor2

      cpos3 = pos1 - pos2
      # J = jac(b1) − jac(b2) at the respective anchor points: build as
      # difference of two single-body jacobians at their own points
      jacp1, jacr1 = support.jac(m, d, pos1, b1)
      jacp2, jacr2 = support.jac(m, d, pos2, b2)
      jp = jacp1 - jacp2

      invw_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      if et == EqType.CONNECT:
        for r in range(3):
          rows_J.append(jp[r])
          rows_pos.append(cpos3[r])
          rows_active.append(active)
          rows_diaga.append(invw_t * jnp.ones((), dtype=dtype))
          rows_solref.append(m.eq_solref[i])
          rows_solimp.append(m.eq_solimp[i])
        imp_pos = mjm.norm_safe(cpos3)
        rows_imp_pos.extend([imp_pos] * 3)
      else:  # WELD
        torquescale = data[10]
        if is_site:
          q0 = mjm.mul_quat(d.xquat[b1], m.site_quat[obj1])
          q1 = mjm.mul_quat(d.xquat[b2], m.site_quat[obj2])
          negq1 = mjm.conj_quat(q1)
          quat = q0
        else:
          relpose = data[6:10]
          quat = mjm.mul_quat(d.xquat[b1], relpose)
          negq1 = mjm.conj_quat(d.xquat[b2])
        quat2 = mjm.mul_quat(negq1, quat)
        crot = quat2[1:] * torquescale

        jr = jacr1 - jacr2  # (3, nv)
        # corrected rotation Jacobian: 0.5 * (negq1 ⊗ axis ⊗ quat) per column
        axis_cols = jr.T  # (nv, 3)
        q2cols = mjm.mul_quat(
            jnp.broadcast_to(negq1, (nv, 4)),
            jnp.concatenate([jnp.zeros((nv, 1), dtype=dtype), axis_cols],
                            axis=1))
        q3cols = mjm.mul_quat(q2cols, jnp.broadcast_to(quat, (nv, 4)))
        jrot = 0.5 * q3cols[:, 1:] * torquescale  # (nv, 3)

        invw_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
        cpos6 = jnp.concatenate([cpos3, crot])
        imp_pos = mjm.norm_safe(cpos6)
        for r in range(3):
          rows_J.append(jp[r])
          rows_pos.append(cpos3[r])
          rows_active.append(active)
          rows_diaga.append(invw_t * jnp.ones((), dtype=dtype))
          rows_solref.append(m.eq_solref[i])
          rows_solimp.append(m.eq_solimp[i])
          rows_imp_pos.append(imp_pos)
        for r in range(3):
          rows_J.append(jrot[:, r])
          rows_pos.append(crot[r])
          rows_active.append(active)
          rows_diaga.append(invw_r * jnp.ones((), dtype=dtype))
          rows_solref.append(m.eq_solref[i])
          rows_solimp.append(m.eq_solimp[i])
          rows_imp_pos.append(imp_pos)

    elif et in (EqType.JOINT, EqType.TENDON):
      if et == EqType.JOINT:
        qadr1 = int(m.jnt_qposadr[obj1])
        dadr1 = int(m.jnt_dofadr[obj1])
        pos1v = d.qpos[qadr1]
        ref1 = m.qpos0[qadr1]
        j1 = jnp.zeros((nv,), dtype=dtype).at[dadr1].set(1.0)
        invw1 = m.dof_invweight0[dadr1]
      else:
        pos1v = d.ten_length[obj1]
        ref1 = m.tendon_length0[obj1]
        j1 = d.ten_J[obj1]
        invw1 = m.tendon_invweight0[obj1]

      if obj2 >= 0:
        if et == EqType.JOINT:
          qadr2 = int(m.jnt_qposadr[obj2])
          dadr2 = int(m.jnt_dofadr[obj2])
          pos2v = d.qpos[qadr2]
          ref2 = m.qpos0[qadr2]
          j2 = jnp.zeros((nv,), dtype=dtype).at[dadr2].set(1.0)
          invw2 = m.dof_invweight0[dadr2]
        else:
          pos2v = d.ten_length[obj2]
          ref2 = m.tendon_length0[obj2]
          j2 = d.ten_J[obj2]
          invw2 = m.tendon_invweight0[obj2]
        dif = pos2v - ref2
        cpos = (pos1v - ref1 - data[0]
                - (data[1] * dif + data[2] * dif**2 + data[3] * dif**3
                   + data[4] * dif**4))
        deriv = (data[1] + 2 * data[2] * dif + 3 * data[3] * dif**2
                 + 4 * data[4] * dif**3)
        jrow = j1 - deriv * j2
        diaga = invw1 + invw2
      else:
        cpos = pos1v - ref1 - data[0]
        jrow = j1
        diaga = invw1

      rows_J.append(jrow)
      rows_pos.append(cpos)
      rows_active.append(active)
      rows_diaga.append(diaga * jnp.ones((), dtype=dtype))
      rows_solref.append(m.eq_solref[i])
      rows_solimp.append(m.eq_solimp[i])
      rows_imp_pos.append(cpos)

    elif et == EqType.FLEXSTRAIN:
      # one row per retained eigenmode of the cell stiffness (mjEQ_FLEXSTRAIN,
      # engine_core_constraint.c:806-980); diagA = avg node invweight0
      # (:1809)
      from mujoco_tpu.ops import flex as flex_mod
      ent = next(s for s in m.flx.strain if s["eq"] == i)
      k = ent["neig"]
      if k:
        pos_blk, J_blk = flex_mod.strain_rows(m, d, ent)
        rows_J.append(J_blk)                                   # (k, nv)
        rows_pos.append(pos_blk)
        rows_active.append(jnp.broadcast_to(jnp.asarray(active), (k,)))
        rows_diaga.append(jnp.full((k,), ent["diaga"], dtype=dtype))
        rows_solref.append(jnp.broadcast_to(m.eq_solref[i], (k, 2)))
        rows_solimp.append(jnp.broadcast_to(m.eq_solimp[i], (k, 5)))
        rows_imp_pos.append(pos_blk)
    elif et == EqType.FLEX:
      # one row per non-rigid edge: pos = length − length0, J = edge
      # Jacobian, diagA = flexedge_invweight0 (mjEQ_FLEX,
      # engine_core_constraint.c:982, :1779)
      f = obj1
      edges = np.nonzero((m.flx.edge_flexid == f) & ~m.flx.edge_rigid)[0]
      if len(edges):
        k = len(edges)
        pos_blk = d.flexedge_length[edges] - m.flexedge_length0[edges]
        rows_J.append(d.flexedge_J[edges])                     # (k, nv)
        rows_pos.append(pos_blk)
        rows_active.append(jnp.broadcast_to(jnp.asarray(active), (k,)))
        rows_diaga.append(m.flexedge_invweight0[edges])
        rows_solref.append(jnp.broadcast_to(m.eq_solref[i], (k, 2)))
        rows_solimp.append(jnp.broadcast_to(m.eq_solimp[i], (k, 5)))
        rows_imp_pos.append(pos_blk)
    else:
      raise NotImplementedError(f"equality type {et}")

  if not rows_J:
    z = jnp.zeros((0,), dtype=dtype)
    return (jnp.zeros((0, nv), dtype=dtype), z, z, z,
            jnp.zeros((0,), dtype=bool), z,
            jnp.zeros((0, 2), dtype=dtype), jnp.zeros((0, 2), dtype=dtype),
            jnp.zeros((0, 5), dtype=dtype), z)

  # rows may be single (nv,) rows or (k, nv) blocks (flex edges)
  J = jnp.concatenate([jnp.atleast_2d(x) for x in rows_J])
  pos = jnp.concatenate([jnp.atleast_1d(x) for x in rows_pos])
  active = jnp.concatenate(
      [jnp.atleast_1d(jnp.asarray(a)) for a in rows_active])
  diaga = jnp.concatenate([jnp.atleast_1d(x) for x in rows_diaga])
  solref = jnp.concatenate(
      [x if x.ndim == 2 else x[None] for x in rows_solref])
  solimp = jnp.concatenate(
      [x if x.ndim == 2 else x[None] for x in rows_solimp])
  imp_pos = jnp.concatenate([jnp.atleast_1d(x) for x in rows_imp_pos])
  n = J.shape[0]
  z = jnp.zeros((n,), dtype=dtype)
  return (J, pos, z, z, active, diaga, solref,
          jnp.zeros((n, 2), dtype=dtype), solimp, imp_pos)


def _friction_rows(m: Model, d: Data):
  dtype = d.qpos.dtype
  meta = m.efc
  nrows = meta.nf
  nv = m.nv
  if nrows == 0:
    z = jnp.zeros((0,), dtype=dtype)
    return (jnp.zeros((0, nv), dtype=dtype), z, z, z,
            jnp.zeros((0,), dtype=bool), z,
            jnp.zeros((0, 2), dtype=dtype), jnp.zeros((0, 2), dtype=dtype),
            jnp.zeros((0, 5), dtype=dtype), z)

  enabled = not m.disabled(DisableBit.FRICTIONLOSS)
  Js, fls, diagas, solrefs, solimps = [], [], [], [], []
  for r in range(nrows):
    dof = int(meta.friction_dof[r])
    ten = int(meta.friction_ten[r])
    if dof >= 0:
      Js.append(jnp.zeros((nv,), dtype=dtype).at[dof].set(1.0))
      fls.append(m.dof_frictionloss[dof])
      diagas.append(m.dof_invweight0[dof])
      solrefs.append(m.dof_solref[dof])
      solimps.append(m.dof_solimp[dof])
    else:
      Js.append(d.ten_J[ten])
      fls.append(m.tendon_frictionloss[ten])
      diagas.append(m.tendon_invweight0[ten])
      solrefs.append(m.tendon_solref_fri[ten])
      solimps.append(m.tendon_solimp_fri[ten])

  J = jnp.stack(Js)
  z = jnp.zeros((nrows,), dtype=dtype)
  return (J, z, z, jnp.stack(fls),
          jnp.full((nrows,), enabled, dtype=bool),
          jnp.stack(diagas), jnp.stack(solrefs),
          jnp.zeros((nrows, 2), dtype=dtype), jnp.stack(solimps), z)


def _limit_rows(m: Model, d: Data):
  dtype = d.qpos.dtype
  meta = m.efc
  nrows = meta.nl
  nv = m.nv
  if nrows == 0:
    z = jnp.zeros((0,), dtype=dtype)
    return (jnp.zeros((0, nv), dtype=dtype), z, z, z,
            jnp.zeros((0,), dtype=bool), z,
            jnp.zeros((0, 2), dtype=dtype), jnp.zeros((0, 2), dtype=dtype),
            jnp.zeros((0, 5), dtype=dtype), z)

  enabled = not m.disabled(DisableBit.LIMIT)

  # --- fully vectorized hinge/slide rows via static gather tables; ball and
  # tendon rows (rare) fall back to per-row assembly merged in below
  hs_rows = np.nonzero((meta.limit_jnt >= 0) & (meta.limit_side != 0))[0]
  other_rows = np.setdiff1d(np.arange(nrows), hs_rows)

  J = jnp.zeros((nrows, nv), dtype=dtype)
  pos = jnp.zeros((nrows,), dtype=dtype)
  margins = jnp.zeros((nrows,), dtype=dtype)
  diagas = jnp.zeros((nrows,), dtype=dtype)
  solrefs = jnp.zeros((nrows, 2), dtype=dtype)
  solimps = jnp.zeros((nrows, 5), dtype=dtype)

  if len(hs_rows):
    jids = meta.limit_jnt[hs_rows]
    sides = meta.limit_side[hs_rows].astype(np.float64)
    qadrs = m.jnt_qposadr[jids]
    dadrs = m.jnt_dofadr[jids]
    value = d.qpos[qadrs]                                 # (nhs,)
    lim = jnp.where(jnp.asarray(sides < 0), m.jnt_range[jids, 0],
                    m.jnt_range[jids, 1])
    dist = jnp.asarray(sides, dtype=dtype) * (lim - value)
    # J is a static constant pattern: -side at (row, dof)
    jhs = np.zeros((len(hs_rows), nv))
    jhs[np.arange(len(hs_rows)), dadrs] = -sides
    J = J.at[hs_rows].set(jnp.asarray(jhs, dtype=dtype))
    pos = pos.at[hs_rows].set(dist)
    margins = margins.at[hs_rows].set(m.jnt_margin[jids])
    diagas = diagas.at[hs_rows].set(m.dof_invweight0[dadrs])
    solrefs = solrefs.at[hs_rows].set(m.jnt_solref[jids])
    solimps = solimps.at[hs_rows].set(m.jnt_solimp[jids])

  for r in other_rows:
    jid = int(meta.limit_jnt[r])
    ten = int(meta.limit_ten[r])
    side = int(meta.limit_side[r])
    if jid >= 0:  # ball limit
      qadr = int(m.jnt_qposadr[jid])
      dadr = int(m.jnt_dofadr[jid])
      quat = mjm.normalize(d.qpos[qadr:qadr + 4])
      aa = mjm.quat_to_vel(quat)
      angle = mjm.norm_safe(aa)
      axis = aa / angle
      dist = jnp.maximum(m.jnt_range[jid, 0], m.jnt_range[jid, 1]) - angle
      J = J.at[r, dadr:dadr + 3].set(-axis)
      pos = pos.at[r].set(dist)
      margins = margins.at[r].set(m.jnt_margin[jid])
      diagas = diagas.at[r].set(m.dof_invweight0[dadr])
      solrefs = solrefs.at[r].set(m.jnt_solref[jid])
      solimps = solimps.at[r].set(m.jnt_solimp[jid])
    else:  # tendon limit
      length = d.ten_length[ten]
      lim = jnp.where(side < 0, m.tendon_range[ten, 0],
                      m.tendon_range[ten, 1])
      dist = side * (lim - length)
      J = J.at[r].set(-float(side) * d.ten_J[ten])
      pos = pos.at[r].set(dist)
      margins = margins.at[r].set(m.tendon_margin[ten])
      diagas = diagas.at[r].set(m.tendon_invweight0[ten])
      solrefs = solrefs.at[r].set(m.tendon_solref_lim[ten])
      solimps = solimps.at[r].set(m.tendon_solimp_lim[ten])

  actives = (pos < margins) & enabled
  return (J, pos, margins, jnp.zeros((nrows,), dtype=dtype),
          actives, diagas, solrefs,
          jnp.zeros((nrows, 2), dtype=dtype), solimps, pos)


def _contact_rows(m: Model, d: Data):
  """Contact rows (mj_instantiateContact): normal/tangent/rolling Jacobians
  rotated into the contact frame; pyramidal edges or elliptic rows."""
  dtype = d.qpos.dtype
  meta = m.efc
  nv = m.nv
  ncon = m.con.ncon
  nrows = meta.ncon_rows
  if nrows == 0:
    z = jnp.zeros((0,), dtype=dtype)
    return (jnp.zeros((0, nv), dtype=dtype), z, z, z,
            jnp.zeros((0,), dtype=bool), z,
            jnp.zeros((0, 2), dtype=dtype), jnp.zeros((0, 2), dtype=dtype),
            jnp.zeros((0, 5), dtype=dtype), z)

  con = d.contact
  enabled = not m.disabled(DisableBit.CONTACT)
  # flex-only models (ngeom == 0): pad the geom→body table with a world-body
  # dummy; those slots are flex-flex and both sides get overridden below
  gbody = m.geom_bodyid if m.geom_bodyid.shape[0] else np.zeros(1, np.int32)
  b1 = gbody[np.minimum(m.con.geom1, len(gbody) - 1)]
  b2 = gbody[np.minimum(np.maximum(m.con.geom2, 0), len(gbody) - 1)]
  # rotational jacobians only exist in rows when some contact has
  # torsional/rolling friction (condim > 3) — skip the work otherwise
  need_rot = bool(np.any(m.con.condim > 3))
  is_flex = m.con.flex2 >= 0
  is_dyn = m.con.dynslot
  if is_flex.any() or is_dyn.any():
    # contacting bodies may be dynamic: flex contacts carry a traced vertex
    # triple (inverse-distance weighted body jacobians, mj_elemBodyWeight +
    # mj_jacSum, engine_core_constraint.c:221, :1611); dynamic pair-group
    # slots carry traced geom ids — both paths build body masks by traced
    # gathers of the ancestor-mask table
    amask_all = jnp.asarray(m.tree.ancestor_mask, dtype=dtype)
    gb = jnp.asarray(gbody, dtype=jnp.int32)
    iw = jnp.asarray(m.body_invweight0, dtype=dtype)

    b1_t = gb[con.geomids[:, 0]]                       # traced (ncon,)
    b2_t = gb[jnp.maximum(con.geomids[:, 1], 0)]
    mask1 = amask_all[b1_t]
    mask2 = amask_all[b2_t]
    tran1 = iw[b1_t, 0]
    rot1 = iw[b1_t, 1]
    tran2 = iw[b2_t, 0]
    rot2 = iw[b2_t, 1]

    if is_flex.any():
      from mujoco_tpu.ops.flex import contact_body_weights

      def flex_side(vids, conflex):
        """Weighted body mask + invweights for a flex side: inverse-distance
        vertex-body weights (mj_elemBodyWeight, engine_core_constraint.c:221)
        or the trilinear node chain for interpolated flexes."""
        bodies, w8 = contact_body_weights(m, d, vids, conflex, con.pos)
        return (jnp.einsum('ck,ckv->cv', w8, amask_all[bodies]),
                jnp.einsum('ck,ck->c', w8, iw[bodies, 0]),
                jnp.einsum('ck,ck->c', w8, iw[bodies, 1]))

      wmask2, wtran2, wrot2 = flex_side(con.flexvert, m.con.flex2)
      isf = jnp.asarray(is_flex)
      mask2 = jnp.where(isf[:, None], wmask2, mask2)
      tran2 = jnp.where(isf, wtran2, tran2)
      rot2 = jnp.where(isf, wrot2, rot2)

      # flex-flex (self/internal) slots: side 1 is also a weighted flex
      # element (mjContact.flex[0]/elem[0], engine_core_constraint.c:1611)
      is_ff = m.con.flex1 >= 0
      if is_ff.any():
        wmask1, wtran1, wrot1 = flex_side(con.flexvert1, m.con.flex1)
        isff = jnp.asarray(is_ff)
        mask1 = jnp.where(isff[:, None], wmask1, mask1)
        tran1 = jnp.where(isff, wtran1, tran1)
        rot1 = jnp.where(isff, wrot1, rot1)

    mask = mask2 - mask1
    o = d.subtree_com[m.body_rootid[m.dof_bodyid]]
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:]
    jacp = lin[None] + jnp.cross(
        jnp.broadcast_to(ang[None], (con.pos.shape[0],) + ang.shape),
        con.pos[:, None, :] - o[None])
    jacp = jnp.swapaxes(jacp * mask[..., None], 1, 2)
    jacr = jnp.swapaxes(
        jnp.broadcast_to(ang[None], (con.pos.shape[0],) + ang.shape)
        * mask[..., None], 1, 2) if need_rot else None
    tran_sides = tran1 + tran2                         # traced (ncon,)
    rot_sides = rot1 + rot2
  else:
    jacp, jacr = _point_jac_diff(m, d, con.pos, b1, b2,
                                 with_rot=need_rot)  # (ncon, 3, nv)
    tran_sides = rot_sides = None

  # rotate into contact frame: rows [n, t1, t2] and rolling [n, t1, t2]
  jt = jnp.einsum('cij,cjv->civ', con.frame, jacp)     # (ncon, 3, nv)
  jr = jnp.einsum('cij,cjv->civ', con.frame, jacr) if need_rot else jt

  active_slot = (con.dist < con.includemargin) & enabled  # (ncon,)

  # per-row assembly via static maps
  cid = meta.con_id                 # (nrows,) slot per row
  crow = meta.con_row               # row index within slot
  condim = m.con.condim[cid]        # static

  pyramidal = int(m.opt.cone) == int(ConeType.PYRAMIDAL)
  if pyramidal:
    # row k (0-based) of a contact with condim c>1: edge pair
    # fdim = k//2 + 1 (1..c-1), sign = +1 for even k, -1 odd
    fdim = crow // 2 + 1
    sign = np.where(crow % 2 == 0, 1.0, -1.0)
    frictionless = condim == 1
    fdim = np.where(frictionless, 0, fdim)
    # friction axis row: axis index within [t1,t2,rollx? ...]: for fdim k:
    # k in 1,2 → jt row k; k in 3,4,5 → jr row k-3
    use_rot = fdim >= 3
    axis_idx = np.where(use_rot, fdim - 3, fdim)
    jn = jt[cid, 0]                                       # (nrows, nv)
    if need_rot:
      jfr = jnp.where(jnp.asarray(use_rot)[:, None],
                      jr[cid, np.clip(axis_idx, 0, 2)],
                      jt[cid, np.clip(axis_idx, 0, 2)])
    else:
      jfr = jt[cid, np.clip(axis_idx, 0, 2)]
    mu_row = con.friction[cid, np.clip(fdim - 1, 0, 4)]
    # single FMA: frictionless rows get coefficient 0 (cast: the np.where
    # sign array is float64 and would promote J under x64)
    coeff = jnp.asarray(sign * ~frictionless, dtype=dtype) * mu_row
    J = jn + coeff[:, None] * jfr
    pos = con.dist[cid]
    margin = con.includemargin[cid]
    imp_pos = pos
  else:
    # elliptic: row 0 normal, rows 1..2 tangents, 3.. rolling
    use_rot = crow >= 3
    axis_idx = np.where(use_rot, crow - 3, crow)
    J = jnp.where(jnp.asarray(use_rot)[:, None],
                  jr[cid, np.clip(axis_idx, 0, 2)],
                  jt[cid, np.clip(axis_idx, 0, 2)])
    isnormal = crow == 0
    pos = jnp.where(jnp.asarray(isnormal), con.dist[cid], 0.0)
    margin = jnp.where(jnp.asarray(isnormal), con.includemargin[cid], 0.0)
    # impedance evaluated at the normal row's pos for the whole contact
    imp_pos = con.dist[cid]

  active = active_slot[cid]

  # diagA (mj_diagApprox): tran/rot from both sides; dynamic/flex slots use
  # the traced-body (or weighted flex-body) inverse inertias
  # (engine_core_constraint.c:1939)
  if tran_sides is not None:
    tran, rot = tran_sides, rot_sides
  else:
    tran = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]  # (ncon,)
    rot = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
  if pyramidal:
    fri = con.friction[cid, np.clip(fdim - 1, 0, 4)]
    base = jnp.where(jnp.asarray(fdim <= 2), tran[cid], rot[cid])
    diaga = jnp.where(jnp.asarray(condim == 1), tran[cid],
                      tran[cid] + fri * fri * base)
  else:
    diaga = jnp.where(jnp.asarray(crow < 3), tran[cid], rot[cid])

  solref = con.solref[cid]
  solreffriction = con.solreffriction[cid]
  solimp = con.solimp[cid]
  fl = jnp.zeros((nrows,), dtype=dtype)
  return (J, pos, margin, fl, active, diaga, solref, solreffriction, solimp,
          imp_pos)


# ---------------------------------------------------------------------------
# main entry points
# ---------------------------------------------------------------------------


def make_constraint(m: Model, d: Data) -> Data:
  """Assemble all efc rows, impedances and regularizers."""
  dtype = d.qpos.dtype
  meta = m.efc

  parts = [_equality_rows(m, d), _friction_rows(m, d), _limit_rows(m, d),
           _contact_rows(m, d)]
  J = jnp.concatenate([p[0] for p in parts], axis=0)
  pos = jnp.concatenate([p[1] for p in parts])
  margin = jnp.concatenate([p[2] for p in parts])
  frictionloss = jnp.concatenate([p[3] for p in parts])
  active = jnp.concatenate([p[4] for p in parts])
  diaga = jnp.concatenate([p[5] for p in parts])
  solref = jnp.concatenate([p[6] for p in parts], axis=0)
  solreffriction = jnp.concatenate([p[7] for p in parts], axis=0)
  solimp = jnp.concatenate([p[8] for p in parts], axis=0)
  imp_pos = jnp.concatenate([p[9] for p in parts])

  # parameter hygiene (getsolparam, engine_core_constraint.c:2022-2050):
  # refsafe enforces timeconst ≥ 2·timestep for standard solref; solimp
  # components are clamped to their legal ranges.
  if not m.disabled(DisableBit.REFSAFE):
    safe0 = jnp.where(solref[:, 0] > 0,
                      jnp.maximum(solref[:, 0], 2 * m.opt.timestep),
                      solref[:, 0])
    solref = solref.at[:, 0].set(safe0)
    srf0 = jnp.where(solreffriction[:, 0] > 0,
                     jnp.maximum(solreffriction[:, 0], 2 * m.opt.timestep),
                     solreffriction[:, 0])
    solreffriction = solreffriction.at[:, 0].set(srf0)
  MINIMP, MAXIMP = 0.0001, 0.9999
  solimp = jnp.stack([
      jnp.clip(solimp[:, 0], MINIMP, MAXIMP),
      jnp.clip(solimp[:, 1], MINIMP, MAXIMP),
      jnp.maximum(solimp[:, 2], 0.0),
      jnp.clip(solimp[:, 3], MINIMP, MAXIMP),
      jnp.maximum(solimp[:, 4], 1.0),
  ], axis=-1)

  # margin for impedance purposes: limits use jnt margin, contacts
  # includemargin, friction/equality 0 — all already in `margin`; the
  # impedance x uses (imp_pos − margin)
  imp, imp_p = _impedance(solimp, imp_pos, margin)

  r_ = jnp.maximum(mjm.MINVAL, (1 - imp) * diaga / imp)

  # solref selection for K/B: elliptic friction rows use solreffriction when
  # nonzero; K is zeroed for friction-type rows
  is_fric_row = jnp.zeros((meta.nefc,), dtype=bool)
  if meta.nf:
    is_fric_row = is_fric_row.at[meta.ne:meta.ne + meta.nf].set(True)
  elliptic = int(m.opt.cone) == int(ConeType.ELLIPTIC)
  ell_fric = np.zeros(meta.nefc, dtype=bool)
  if elliptic and meta.ncon_rows:
    base = meta.ne + meta.nf + meta.nl
    ell_fric[base:] = meta.con_row > 0
  ell_fric_j = jnp.asarray(ell_fric)
  has_srf = jnp.any(solreffriction != 0.0, axis=-1)
  ref_used = jnp.where((ell_fric_j & has_srf)[:, None], solreffriction,
                       solref)
  k, b = _kb(ref_used, solimp)
  k = jnp.where(is_fric_row | ell_fric_j, 0.0, k)

  # contact R adjustments + regularized cone mu (mj_makeImpedance tail)
  mu = jnp.zeros((m.con.ncon,), dtype=dtype)
  if meta.ncon_rows:
    base = meta.ne + meta.nf + meta.nl
    impratio = jnp.maximum(m.opt.impratio, mjm.MINVAL)
    # per-slot first-row R (con_efcadr are absolute row addresses)
    r0 = r_[jnp.asarray(meta.con_efcadr)]
    r1 = r0 / impratio
    fri0 = d.contact.friction[:, 0]
    mu = fri0 * jnp.sqrt(r1 / jnp.maximum(r0, mjm.MINVAL))

    if int(m.opt.cone) == int(ConeType.PYRAMIDAL):
      rpy = 2.0 * mu * mu * r0                       # per slot
      is_fless = jnp.asarray(m.con.condim[meta.con_id] == 1)
      r_con = jnp.where(is_fless, r_[base:], rpy[jnp.asarray(meta.con_id)])
      r_ = r_.at[base:].set(r_con)
    else:
      # R[i+1] = R[i]/impratio; R[i+j+1] = R[i+1]·fri0²/fri_j²
      cid = jnp.asarray(meta.con_id)
      crow = meta.con_row
      frij = d.contact.friction[jnp.asarray(meta.con_id),
                                np.clip(crow - 1, 0, 4)]
      r_fric = (r1[cid] * fri0[cid] ** 2
                / jnp.maximum(frij ** 2, mjm.MINVAL))
      r_row0 = r0[cid]
      r_con = jnp.where(jnp.asarray(crow == 0), r_row0,
                        jnp.where(jnp.asarray(crow == 1), r1[cid], r_fric))
      r_ = r_.at[base:].set(r_con)

  # inactive rows contribute nothing
  act_f = active.astype(dtype)
  d_inv = act_f / r_
  frictionloss = frictionloss * act_f

  kbip = jnp.stack([k, b, imp, imp_p], axis=-1)

  return d.replace(
      efc_J=J, efc_pos=pos, efc_margin=margin, efc_D=d_inv, efc_R=r_,
      efc_frictionloss=frictionloss, efc_active=active, efc_KBIP=kbip,
      contact=d.contact.replace(mu=mu))


def reference_acceleration(m: Model, d: Data) -> Data:
  """aref = −B·(J qvel) − K·imp·(pos − margin), plus the Jdot·qvel
  correction for connect/weld rows (mj_referenceConstraint,
  engine_core_constraint.c:3245)."""
  if not m.efc.nefc:
    return d
  vel = d.efc_J @ d.qvel
  kbip = d.efc_KBIP
  aref = -kbip[:, 1] * vel - kbip[:, 0] * kbip[:, 2] * (d.efc_pos
                                                        - d.efc_margin)
  aref = _jdotv_correction(m, d, aref)
  # inactive rows carry sentinel-sized pos (separated contact slots); zero
  # their aref so jar stays finite (they contribute nothing regardless)
  aref = aref * d.efc_active.astype(aref.dtype)
  return d.replace(efc_aref=aref)


def _jdotv_correction(m: Model, d: Data, aref):
  """Subtract Jdot·qvel from connect/weld equality rows (mj_Jdotv,
  engine_core_constraint.c:1056)."""
  meta = m.efc
  dtype = d.qpos.dtype
  row = 0
  for i in range(m.neq):
    et = int(m.eq_type[i])
    if et == EqType.JOINT or et == EqType.TENDON:
      row += 1
      continue
    if et not in (EqType.CONNECT, EqType.WELD):
      continue
    obj1, obj2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
    is_site = int(m.eq_objtype[i]) == 6
    data = m.eq_data[i]
    if is_site:
      b1, b2 = int(m.site_bodyid[obj1]), int(m.site_bodyid[obj2])
      pos1, pos2 = d.site_xpos[obj1], d.site_xpos[obj2]
    else:
      b1, b2 = obj1, obj2
      if et == EqType.CONNECT:
        anchor1, anchor2 = data[0:3], data[3:6]
      else:
        anchor1, anchor2 = data[3:6], data[0:3]
      pos1 = d.xpos[b1] + d.xmat[b1] @ anchor1
      pos2 = d.xpos[b2] + d.xmat[b2] @ anchor2

    jdv1, jrdv1 = _jacdot_v(m, d, pos1, b1)
    jdv2, jrdv2 = _jacdot_v(m, d, pos2, b2)
    aref = aref.at[row:row + 3].add(-(jdv1 - jdv2))
    row += 3

    if et == EqType.WELD:
      torquescale = data[10]
      if is_site:
        q0r = mjm.mul_quat(d.xquat[b1], m.site_quat[obj1])
        qfull1 = mjm.mul_quat(d.xquat[b2], m.site_quat[obj2])
        negq1 = mjm.conj_quat(qfull1)
      else:
        q0r = mjm.mul_quat(d.xquat[b1], data[6:10])
        negq1 = mjm.conj_quat(d.xquat[b2])
      omega1 = d.cvel[b1, :3]
      omega2 = d.cvel[b2, :3]
      domega = omega1 - omega2

      def deriv_quat(q, w):
        return 0.5 * mjm.mul_quat(q, jnp.concatenate(
            [jnp.zeros((1,), dtype=dtype), w]))

      if is_site:
        qdot0 = deriv_quat(q0r, omega1)
        qdot0r = qdot0
        negqdot1 = mjm.conj_quat(deriv_quat(qfull1, omega2))
      else:
        qdot0 = deriv_quat(d.xquat[b1], omega1)
        qdot0r = mjm.mul_quat(qdot0, data[6:10])
        negqdot1 = mjm.conj_quat(deriv_quat(d.xquat[b2], omega2))

      djrdv = jrdv1 - jrdv2
      quat_axis = lambda q, v: mjm.mul_quat(q, jnp.concatenate(
          [jnp.zeros((1,), dtype=dtype), v]))
      t1 = mjm.mul_quat(quat_axis(negqdot1, domega), q0r)
      t2 = mjm.mul_quat(quat_axis(negq1, djrdv), q0r)
      t3 = mjm.mul_quat(quat_axis(negq1, domega), qdot0r)
      corr = 0.5 * (t1[1:] + t2[1:] + t3[1:]) * torquescale
      aref = aref.at[row:row + 3].add(-corr)
      row += 3
  return aref
