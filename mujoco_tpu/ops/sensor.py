"""Sensors: staged pos/vel/acc evaluation, energy, post-constraint dynamics.

Counterpart of /root/reference/src/engine/engine_sensor.c (mj_sensorPos:~600,
mj_sensorVel:838, mj_sensorAcc:957, mj_energyPos:1659, mj_energyVel:1766)
plus the supporting body-dynamics quantities from engine_core_smooth.c
(mj_subtreeVel:2249, mj_rnePostConstraint:2394) and engine_core_util.c
(mj_objectVelocity:835, mj_objectAcceleration:909).

Sensor structure (type/objid/refid/adr/dim) is static model metadata, so the
sensor sweep is a static python loop emitting one fused vectorized block of
scatter-writes into sensordata under jit. Heavy shared quantities
(subtree velocities, post-constraint accelerations) are computed at most once
per stage, only when some sensor in that stage needs them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (ConeType, Data, DataType, DisableBit,
                                     EqType, JointType, Model, ObjType,
                                     SensorType)
from mujoco_tpu.ops import ray as ray_mod
from mujoco_tpu.utils import math as mjm

ST = SensorType


# ---------------------------------------------------------------------------
# object frame / velocity / acceleration resolvers
# ---------------------------------------------------------------------------


def object_pos_mat(m: Model, d: Data, objtype: int, objid: int):
  """(xpos, xmat) of an object (get_xpos_xmat, engine_sensor.c:227)."""
  t = ObjType(objtype)
  if t == ObjType.XBODY:
    return d.xpos[objid], d.xmat[objid]
  if t == ObjType.BODY:
    return d.xipos[objid], d.ximat[objid]
  if t == ObjType.GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid]
  if t == ObjType.SITE:
    return d.site_xpos[objid], d.site_xmat[objid]
  if t == ObjType.CAMERA:
    return d.cam_xpos[objid], d.cam_xmat[objid]
  raise NotImplementedError(f"object type {t} frame")


def object_quat(m: Model, d: Data, objtype: int, objid: int):
  """Global object quaternion (get_xquat, engine_sensor.c:257)."""
  t = ObjType(objtype)
  if t == ObjType.XBODY:
    return d.xquat[objid]
  if t == ObjType.BODY:
    return mjm.mul_quat(d.xquat[objid], m.body_iquat[objid])
  if t == ObjType.GEOM:
    return mjm.mul_quat(d.xquat[m.geom_bodyid[objid]], m.geom_quat[objid])
  if t == ObjType.SITE:
    return mjm.mul_quat(d.xquat[m.site_bodyid[objid]], m.site_quat[objid])
  if t == ObjType.CAMERA:
    return mjm.mul_quat(d.xquat[m.cam_bodyid[objid]], m.cam_quat[objid])
  raise NotImplementedError(f"object type {t} quat")


def _object_body(m: Model, objtype: int, objid: int) -> int:
  t = ObjType(objtype)
  if t in (ObjType.BODY, ObjType.XBODY):
    return int(objid)
  if t == ObjType.GEOM:
    return int(m.geom_bodyid[objid])
  if t == ObjType.SITE:
    return int(m.site_bodyid[objid])
  if t == ObjType.CAMERA:
    return int(m.cam_bodyid[objid])
  raise NotImplementedError(f"object type {t} body")


def object_velocity(m: Model, d: Data, objtype: int, objid: int,
                    flg_local: bool):
  """6D object velocity [ang; lin] (mj_objectVelocity,
  engine_core_util.c:835)."""
  bodyid = _object_body(m, objtype, objid)
  pos, mat = object_pos_mat(m, d, objtype, objid)
  if m.body_dofnum[m.body_weldid[bodyid]] == 0:
    return jnp.zeros((6,), dtype=d.qpos.dtype)
  com = d.subtree_com[m.body_rootid[bodyid]]
  return mjm.transform_spatial(d.cvel[bodyid], False, pos, com,
                               mat if flg_local else None)


def object_acceleration(m: Model, d: Data, objtype: int, objid: int,
                        flg_local: bool):
  """6D object acceleration, incl. Coriolis correction
  (mj_objectAcceleration, engine_core_util.c:909). Needs d.cacc."""
  bodyid = _object_body(m, objtype, objid)
  pos, mat = object_pos_mat(m, d, objtype, objid)
  if m.body_dofnum[m.body_weldid[bodyid]] == 0:
    return jnp.zeros((6,), dtype=d.qpos.dtype)
  com = d.subtree_com[m.body_rootid[bodyid]]
  rot = mat if flg_local else None
  acc = mjm.transform_spatial(d.cacc[bodyid], False, pos, com, rot)
  vel = mjm.transform_spatial(d.cvel[bodyid], False, pos, com, rot)
  corr = jnp.cross(vel[:3], vel[3:])
  return acc.at[3:].add(corr)


# ---------------------------------------------------------------------------
# contact force decode
# ---------------------------------------------------------------------------


def contact_force(m: Model, d: Data):
  """Per-slot contact wrench [force3; torque3] in the contact frame
  (mj_contactForce + mju_decodePyramid, engine_util_misc.c:1584).
  Inactive slots return zeros. Shape (ncon, 6)."""
  dtype = d.qpos.dtype
  ncon = m.con.ncon
  out = jnp.zeros((ncon, 6), dtype=dtype)
  if ncon == 0 or m.efc.ncon_rows == 0:
    return out
  pyramidal = int(m.opt.cone) == int(ConeType.PYRAMIDAL)
  active = d.contact.dist < d.contact.includemargin
  for c in range(ncon):
    dim = int(m.con.condim[c])
    adr = int(m.efc.con_efcadr[c])
    nrow = int(m.efc.con_nrow[c])
    f = d.efc_force[adr:adr + nrow]
    if dim == 1:
      w = jnp.zeros((6,), dtype=dtype).at[0].set(f[0])
    elif pyramidal:
      normal = jnp.sum(f)
      pairs = f.reshape(dim - 1, 2)
      tang = (pairs[:, 0] - pairs[:, 1]) * d.contact.friction[c, :dim - 1]
      w = jnp.zeros((6,), dtype=dtype).at[0].set(normal)
      w = w.at[1:dim].set(tang)
    else:
      w = jnp.zeros((6,), dtype=dtype).at[:dim].set(f)
    out = out.at[c].set(jnp.where(active[c], w, 0.0))
  return out


# ---------------------------------------------------------------------------
# contact sensor (mjSENS_CONTACT)
# ---------------------------------------------------------------------------

# per-field slot widths in dataspec bit order: found, force, torque, dist,
# pos, normal, tangent (mjCONDATA_SIZE, engine_support.c:114)
_CONDATA_SIZE = (1, 3, 3, 1, 3, 3, 3)


def _con_bodies(m: Model, d: Data):
  """Traced (ncon, 2) body ids of the contacting sides: geom body for geom
  sides, first-element-vertex body for flex sides (mj_flexBody,
  engine_sleep.c:293)."""
  gids = d.contact.geomids                             # (ncon, 2) traced
  gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
  bodies = gb[jnp.maximum(gids, 0)]
  if m.flx.nvert:
    vb = jnp.asarray(m.flx.vertbodyid, dtype=jnp.int32)
    fb = vb[jnp.maximum(d.contact.flexvert[:, 0], 0)]
    bodies = jnp.where(gids < 0, fb[:, None], bodies)
  return bodies


def _check_match(m: Model, bodies, gids, objtype: int, objid: int, side: int):
  """checkMatch (engine_sensor.c:320) vectorized over contact slots: does
  sensor object (objtype, objid) match contact side `side`?"""
  t = ObjType(objtype)
  ncon = gids.shape[0]
  if t == ObjType.UNKNOWN or t == ObjType.SITE:
    return jnp.ones((ncon,), dtype=bool)
  if t == ObjType.GEOM:
    return gids[:, side] == objid
  if t == ObjType.BODY:
    return bodies[:, side] == objid
  if t == ObjType.XBODY:
    # id is ancestor-or-self of the contact body <=> body in subtree(id)
    sub = jnp.asarray(m.tree.subtree_mask[objid], dtype=bool)
    return sub[bodies[:, side]]
  raise NotImplementedError(f"contact sensor match objtype {t}")


def _match_contacts(m: Model, d: Data, objtype: int, objid: int,
                    reftype: int, refid: int):
  """matchContact (engine_sensor.c:339) over all slots: (matched, flip)."""
  bodies = _con_bodies(m, d)
  gids = d.contact.geomids
  ncon = m.con.ncon
  filled = d.contact.dist < d.contact.includemargin

  t1, t2 = ObjType(objtype), ObjType(reftype)
  if t1 == ObjType.UNKNOWN and t2 == ObjType.UNKNOWN:
    return filled, jnp.zeros((ncon,), dtype=bool)

  ok = jnp.ones((ncon,), dtype=bool)
  if t1 == ObjType.SITE:
    ok = jax.vmap(lambda p: inside_geom(
        d.site_xpos[objid], d.site_xmat[objid], m.site_size[objid],
        int(m.site_type[objid]), p) > 0.5)(d.contact.pos)

  m11 = _check_match(m, bodies, gids, objtype, objid, 0)
  m12 = _check_match(m, bodies, gids, objtype, objid, 1)
  m21 = _check_match(m, bodies, gids, reftype, refid, 0)
  m22 = _check_match(m, bodies, gids, reftype, refid, 1)
  ok = ok & (m11 | m12) & (m21 | m22)

  if t1 != ObjType.UNKNOWN and t2 != ObjType.UNKNOWN:
    regular = m11 & m22
    reverse = m12 & m21
    ok = ok & (regular | reverse)
    flip = reverse & ~regular
  elif t1 != ObjType.UNKNOWN:
    flip = ~m11    # normal points away from obj1
  else:
    flip = ~m22    # normal points towards obj2
  return ok & filled, flip


def _contact_sensor(m: Model, d: Data, i: int, ft_all):
  """mjSENS_CONTACT (engine_sensor.c:1027): match contacts against the
  sensor spec, reduce (none/mindist/maxforce/netforce), and pack the
  requested data fields into fixed slots. Slot order under reduce=none
  follows this engine's static slot enumeration rather than the reference's
  contact-array order (documented deviation); sorted reductions match."""
  dtype = d.qpos.dtype
  dataspec = int(m.sensor_intprm[i, 0])
  reduce = int(m.sensor_intprm[i, 1])
  dim = int(m.sensor_dim[i])
  size = sum(s for j, s in enumerate(_CONDATA_SIZE) if dataspec & (1 << j))
  num = dim // size
  ncon = m.con.ncon

  matched, flip = _match_contacts(m, d, int(m.sensor_objtype[i]),
                                  int(m.sensor_objid[i]),
                                  int(m.sensor_reftype[i]),
                                  int(m.sensor_refid[i]))
  nmatch = jnp.sum(matched).astype(dtype)
  con = d.contact

  # field base offsets within one slot, in dataspec bit order
  offs, off = {}, 0
  for j, s in enumerate(_CONDATA_SIZE):
    if dataspec & (1 << j):
      offs[j] = off
      off += s

  out = jnp.zeros((dim,), dtype=dtype)
  if ncon == 0:
    return out

  if reduce == 3:  # netforce: one aggregate wrench about the force centroid
    sgn = jnp.where(flip, -1.0, 1.0)[:, None]
    wrench = ft_all * sgn * matched[:, None]
    weight = mjm.norm_safe(wrench[:, :3])
    total = jnp.maximum(jnp.sum(weight), mjm.MINVAL)
    point = jnp.sum(weight[:, None] * con.pos, axis=0) / total
    # rotate to global: frame rows are the contact axes
    force_g = jnp.einsum('cij,ci->cj', con.frame, wrench[:, :3])
    torque_g = jnp.einsum('cij,ci->cj', con.frame, wrench[:, 3:])
    induced = jnp.cross(con.pos - point, force_g)
    force = jnp.sum(force_g, axis=0)
    torque = jnp.sum(torque_g + induced, axis=0)
    vals = {0: nmatch[None], 1: force, 2: torque,
            3: jnp.zeros((1,), dtype=dtype), 4: point,
            5: jnp.array([1.0, 0, 0], dtype=dtype),
            6: jnp.array([0.0, 1, 0], dtype=dtype)}
    for j, o in offs.items():
      out = out.at[o:o + _CONDATA_SIZE[j]].set(vals[j])
    return out

  # sorting criterion (stable argsort; unmatched slots sort last)
  inf = jnp.asarray(jnp.inf, dtype=dtype)
  if reduce == 1:      # mindist
    crit = con.dist
  elif reduce == 2:    # maxforce
    crit = -jnp.sum(ft_all[:, :3] ** 2, axis=1)
  else:                # none: static slot order
    crit = jnp.arange(ncon, dtype=dtype)
  order = jnp.argsort(jnp.where(matched, crit, inf))

  nslot = min(num, ncon)
  for s in range(nslot):
    cid = order[s]
    valid = jnp.sum(matched) > s
    sg = jnp.where(flip[cid], -1.0, 1.0)
    base = s * size
    for j, o in offs.items():
      if j == 0:
        val = nmatch[None]
      elif j == 1:
        val = ft_all[cid, :3] * jnp.array([1.0, 1, 1], dtype=dtype).at[2].set(sg)
      elif j == 2:
        val = ft_all[cid, 3:] * jnp.array([1.0, 1, 1], dtype=dtype).at[2].set(sg)
      elif j == 3:
        val = con.dist[cid][None]
      elif j == 4:
        val = con.pos[cid]
      elif j == 5:
        val = con.frame[cid, 0] * sg
      else:
        val = con.frame[cid, 1] * sg
      out = out.at[base + o:base + o + _CONDATA_SIZE[j]].set(
          jnp.where(valid, val, 0.0))
  return out


def _tactile(m: Model, d: Data, i: int):
  """mjSENS_TACTILE (engine_sensor.c:80-193, dispatch :1160): the sensor
  mesh's vertices are taxels in the bound geom's frame; each taxel reports
  the max penetration depth into any geom contacting the parent weld body
  (analytic SDFs, ops/sdf.py), plus |tangential relative velocity| channels
  when the mesh carries per-vertex frames. Channel-major output
  (nchannel, ntaxel)."""
  from mujoco_tpu.ops import sdf as sdf_mod
  dtype = d.qpos.dtype
  mesh_id = int(m.sensor_objid[i])
  geom_id = int(m.sensor_refid[i])
  parent_weld = int(m.body_weldid[m.geom_bodyid[geom_id]])
  vadr, vnum = int(m.mesh_vertadr[mesh_id]), int(m.mesh_vertnum[mesh_id])
  nchannel = int(m.sensor_dim[i]) // vnum
  nadr = int(m.mesh_normaladr[mesh_id])
  has_frame = int(m.mesh_normalnum[mesh_id]) == 3 * vnum

  taxel_local = m.mesh_vert[vadr:vadr + vnum]            # (T, 3)
  xpos = d.geom_xpos[geom_id] + taxel_local @ d.geom_xmat[geom_id].T

  # traced relevance: geoms in active contact with the parent weld
  gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
  wb = jnp.asarray(m.body_weldid, dtype=jnp.int32)
  gids = d.contact.geomids
  welds = wb[gb[jnp.maximum(gids, 0)]]
  live = (d.contact.dist < d.contact.includemargin) & jnp.all(gids >= 0, 1)
  rel = jnp.zeros((m.ngeom,), dtype=bool)
  side_w = live & (welds[:, 0] == parent_weld)
  rel = rel.at[jnp.clip(gids[:, 1], 0, m.ngeom - 1)].max(side_w)
  side_w2 = live & (welds[:, 1] == parent_weld)
  rel = rel.at[jnp.clip(gids[:, 0], 0, m.ngeom - 1)].max(side_w2)

  out = jnp.zeros((nchannel, vnum), dtype=dtype)
  if has_frame:
    frames = m.mesh_normal[nadr:nadr + 3 * vnum].reshape(vnum, 3, 3)
    mq = mjm.normalize(m.mesh_quat_arr[mesh_id]) if hasattr(
        m, "mesh_quat_arr") else None
    # velocity of the sensor surface at each taxel
    com_s = d.subtree_com[m.body_rootid[parent_weld]]
    vel_s = jax.vmap(lambda p: mjm.transform_spatial(
        d.cvel[parent_weld], False, p, com_s))(xpos)[:, 3:]

  weld_np = np.asarray(m.body_weldid)
  gb_np = np.asarray(m.geom_bodyid)
  for g in range(m.ngeom):
    if g == geom_id or int(weld_np[gb_np[g]]) == parent_weld:
      continue
    if not sdf_mod.has_sdf(m, g):
      continue   # mesh/hfield others need octrees (reference skips too)
    dist = sdf_mod.geom_distance(m, d, g, xpos)          # (T,)
    depth = jnp.minimum(dist, 0.0)
    active = rel[g]
    pen = jnp.where(active, -depth, 0.0)
    out = out.at[0].set(jnp.maximum(out[0], pen))
    if has_frame and nchannel >= 3:
      b = int(m.geom_bodyid[g])
      com_o = d.subtree_com[m.body_rootid[b]]
      vel_o = mjm.transform_spatial(d.cvel[b], False, d.geom_xpos[g],
                                    com_o)[3:]
      vrel = vel_s - vel_o[None, :]                      # (T, 3)
      t1 = frames[:, 1]
      t2 = frames[:, 2]
      w = jnp.where(active & (depth < 0), 1.0, 0.0)
      out = out.at[1].add(w * jnp.abs(jnp.sum(vrel * t1, axis=-1)))
      out = out.at[2].add(w * jnp.abs(jnp.sum(vrel * t2, axis=-1)))
  return out.reshape(-1)


# ---------------------------------------------------------------------------
# subtree velocity / momentum
# ---------------------------------------------------------------------------


def subtree_vel(m: Model, d: Data) -> Data:
  """Subtree linear velocity and angular momentum (mj_subtreeVel,
  engine_core_smooth.c:2249), as dense subtree-mask contractions:

    linvel_i = (Σ_{j∈sub(i)} m_j v_j) / M_i
    angmom_i = Σ_{j∈sub(i)} [Iw_j ω_j + m_j x_j × v_j] − c_i × (M_i linvel_i)

  (the reference's parallel-axis recursion telescopes to this closed form).
  """
  dtype = d.qpos.dtype
  sub = jnp.asarray(m.tree.subtree_mask, dtype=dtype)

  # body 6D velocity about own CoM, world-oriented
  com = d.subtree_com[m.body_rootid]
  vel = mjm.transform_spatial(d.cvel, False, d.xipos, com)  # (nbody, 6)
  w, v = vel[:, :3], vel[:, 3:]

  mom = m.body_mass[:, None] * v
  p = sub @ mom                                              # (nbody, 3)
  mass_sub = jnp.maximum(m.body_subtreemass, mjm.MINVAL)
  linvel = p / mass_sub[:, None]

  # world-frame rotational inertia times omega
  iw = jnp.einsum('bij,bj->bi', d.ximat,
                  m.body_inertia * jnp.einsum('bij,bi->bj', d.ximat, w))
  s1 = sub @ (iw + m.body_mass[:, None] * jnp.cross(d.xipos, v))
  angmom = s1 - jnp.cross(d.subtree_com, p)
  return d.replace(subtree_linvel=linvel, subtree_angmom=angmom)


# ---------------------------------------------------------------------------
# post-constraint body accelerations and interaction forces
# ---------------------------------------------------------------------------


def rne_postconstraint(m: Model, d: Data) -> Data:
  """cacc, cfrc_int, cfrc_ext (mj_rnePostConstraint,
  engine_core_smooth.c:2394). External forces gather xfrc_applied, contact
  forces and connect/weld equality forces; the body force recursion becomes
  two masked dense contractions."""
  dtype = d.qpos.dtype
  nb = m.nbody
  anc = jnp.asarray(m.tree.ancestor_mask, dtype=dtype)
  sub = jnp.asarray(m.tree.subtree_mask, dtype=dtype)
  com_all = d.subtree_com[m.body_rootid]                    # (nbody, 3)

  # ---- cfrc_ext = perturb (xfrc_applied is [force3; torque3] world at xipos)
  xf = d.xfrc_applied
  wrench = jnp.concatenate([xf[:, 3:], xf[:, :3]], axis=-1)  # torque:force
  cfrc_ext = mjm.transform_spatial(wrench, True, com_all, d.xipos)
  cfrc_ext = cfrc_ext.at[0].set(0.0)

  # ---- cfrc_ext += contacts (traced body ids: dynamic pair-group slots and
  # flex contacts select their bodies per step)
  if m.con.ncon:
    cf = contact_force(m, d)                                 # (ncon, 6)
    frames = d.contact.frame                                 # (ncon, 3, 3)
    # world torque:force (rows of frame are axes → world = frame^T @ local)
    f_w = jnp.einsum('cij,cj->ci', jnp.swapaxes(frames, -1, -2), cf[:, :3])
    t_w = jnp.einsum('cij,cj->ci', jnp.swapaxes(frames, -1, -2), cf[:, 3:])
    cfrc = jnp.concatenate([t_w, f_w], axis=-1)              # (ncon, 6)
    gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    rootid = jnp.asarray(m.body_rootid, dtype=jnp.int32)
    b1s = gb[d.contact.geomids[:, 0]]                        # (ncon,) traced
    b2s = gb[jnp.maximum(d.contact.geomids[:, 1], 0)]
    # static numpy, not jnp: under jacfwd-inside-jit an asarray of host
    # metadata stages to a tracer and breaks the Python branch below
    is_flex = np.asarray(m.con.flex2 >= 0)

    def side_add(cfrc_ext, bodies, sgn, live):
      v = jax.vmap(lambda c, k, p: mjm.transform_spatial(
          c, True, d.subtree_com[k], p))(cfrc, rootid[bodies], d.contact.pos)
      v = v * (sgn * live * (bodies != 0))[:, None]
      return cfrc_ext.at[bodies].add(v)

    one = jnp.ones((m.con.ncon,), dtype=dtype)
    cfrc_ext = side_add(cfrc_ext, b1s, -1.0, one)
    cfrc_ext = side_add(cfrc_ext, b2s, 1.0,
                        (~is_flex).astype(dtype))
    if is_flex.any():
      # flex side: distribute over the bodies the contact Jacobian
      # attributes to (vertex bodies, or trilinear node bodies for
      # interpolated flexes)
      from mujoco_tpu.ops.flex import contact_body_weights
      bodies8, w8 = contact_body_weights(m, d, d.contact.flexvert,
                                         m.con.flex2, d.contact.pos)
      flexf = jnp.asarray(is_flex.astype(dtype))
      for j in range(bodies8.shape[1]):
        cfrc_ext = side_add(cfrc_ext, bodies8[:, j], 1.0,
                            flexf * w8[:, j])

  # ---- cfrc_ext += connect/weld equality forces
  for e in range(m.neq):
    et = int(m.eq_type[e])
    if et not in (int(EqType.CONNECT), int(EqType.WELD)):
      continue
    rows = np.nonzero(m.efc.eq_id == e)[0]
    adr = int(rows[0])
    is_weld = et == int(EqType.WELD)
    frc = d.efc_force[adr:adr + 3]
    trq = d.efc_force[adr + 3:adr + 6] if is_weld else jnp.zeros(
        (3,), dtype=dtype)
    cfrc = jnp.concatenate([trq, frc])
    body_sem = int(m.eq_objtype[e]) == int(ObjType.BODY)
    for sgn, obj, off_idx in ((1.0, int(m.eq_obj1id[e]), 1 if is_weld else 0),
                              (-1.0, int(m.eq_obj2id[e]),
                               0 if is_weld else 1)):
      k = obj if body_sem else int(m.site_bodyid[obj])
      if k == 0:
        continue
      if body_sem:
        offset = jax.lax.dynamic_slice(m.eq_data[e], (3 * off_idx,), (3,))
      else:
        offset = m.site_pos[obj]
      pos = d.xmat[k] @ offset + d.xpos[k]
      v = mjm.transform_spatial(cfrc, True,
                                d.subtree_com[m.body_rootid[k]], pos)
      cfrc_ext = cfrc_ext.at[k].add(sgn * v)

  # ---- forward pass: cacc (dense, same contraction as smooth.com_acc)
  base = jnp.zeros((6,), dtype=dtype)
  if not m.disabled(DisableBit.GRAVITY):
    base = base.at[3:].set(-m.opt.gravity)
  cacc = (base[None, :] + (anc * d.qvel[None, :]) @ d.cdof_dot
          + (anc * d.qacc[None, :]) @ d.cdof)
  cacc = cacc.at[0].set(base)

  # cfrc_body = cinert cacc + cvel ×* (cinert cvel)
  icvel = jnp.einsum('bij,bj->bi', d.cinert, d.cvel)
  cfrc_body = (jnp.einsum('bij,bj->bi', d.cinert, cacc)
               + mjm.force_cross(d.cvel, icvel))

  # cfrc_int = subtree sum of (cfrc_body − cfrc_ext)
  cfrc_int = sub @ (cfrc_body - cfrc_ext)
  cfrc_int = cfrc_int.at[0].set(0.0)
  return d.replace(cacc=cacc, cfrc_ext=cfrc_ext, cfrc_int=cfrc_int)


# ---------------------------------------------------------------------------
# energy
# ---------------------------------------------------------------------------


def energy_pos(m: Model, d: Data) -> Data:
  """Potential energy: gravity + joint/tendon springs (mj_energyPos,
  engine_sensor.c:1659)."""
  dtype = d.qpos.dtype
  e = jnp.zeros((), dtype=dtype)
  if not m.disabled(DisableBit.GRAVITY):
    e = e - jnp.sum(m.body_mass[1:] * (d.xipos[1:] @ m.opt.gravity))
  if not m.disabled(DisableBit.SPRING):
    for j in range(m.njnt):
      jt = int(m.jnt_type[j])
      qadr = int(m.jnt_qposadr[j])
      k = m.jnt_stiffness[j]
      if jt == JointType.FREE:
        dif = d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]
        e = e + 0.5 * k * jnp.sum(dif * dif)
        quat = mjm.normalize(d.qpos[qadr + 3:qadr + 7])
        dq = mjm.quat_sub(quat, m.qpos_spring[qadr + 3:qadr + 7])
        e = e + 0.5 * k * jnp.sum(dq * dq)
      elif jt == JointType.BALL:
        quat = mjm.normalize(d.qpos[qadr:qadr + 4])
        dq = mjm.quat_sub(quat, m.qpos_spring[qadr:qadr + 4])
        e = e + 0.5 * k * jnp.sum(dq * dq)
      else:
        x = d.qpos[qadr] - m.qpos_spring[qadr]
        e = e + 0.5 * k * x * x
    if m.ntendon:
      lo = m.tendon_lengthspring[:, 0]
      hi = m.tendon_lengthspring[:, 1]
      x = jnp.where(d.ten_length > hi, d.ten_length - hi,
                    jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
      e = e + 0.5 * jnp.sum(m.tendon_stiffness * x * x)
  return d.replace(energy=d.energy.at[0].set(e))


def energy_vel(m: Model, d: Data) -> Data:
  """Kinetic energy 0.5 qvelᵀ M qvel (mj_energyVel, engine_sensor.c:1766)."""
  ke = 0.5 * jnp.dot(d.qvel, d.qM @ d.qvel)
  return d.replace(energy=d.energy.at[1].set(ke))


# ---------------------------------------------------------------------------
# cutoff + staged evaluation
# ---------------------------------------------------------------------------


def _apply_cutoff(m: Model, i: int, val):
  """Sensor cutoff clamp (apply_cutoff, engine_sensor.c:198)."""
  cutoff = m.sensor_cutoff[i]
  datatype = int(m.sensor_datatype[i])
  if datatype == int(DataType.REAL):
    clamped = jnp.clip(val, -cutoff, cutoff)
  elif datatype == int(DataType.POSITIVE):
    clamped = jnp.minimum(val, cutoff)
  else:
    return val
  return jnp.where(cutoff > 0, clamped, val)


def _limit_row(m: Model, objid: int, is_tendon: bool) -> int:
  """Static efc row index of a joint/tendon limit constraint, or -1."""
  arr = m.efc.limit_ten if is_tendon else m.efc.limit_jnt
  rows = np.nonzero(arr == objid)[0]
  return int(rows[0]) + m.efc.ne + m.efc.nf if len(rows) else -1


def _write(sensordata, adr, dim, val):
  return sensordata.at[adr:adr + dim].set(jnp.ravel(val))


def _history_adjust(m: Model, d: Data, sd, stage: int):
  """Replace this stage's delayed/interval sensors with history-buffer reads
  (compute_or_read_sensor, engine_sensor.c:1387). The raw values stay in
  `sd` for sensors without delay; the advance step recomputes raw values for
  delayed sensors before inserting (mj_advance, engine_forward.c:1276)."""
  if m.nhistory == 0:
    return sd
  from mujoco_tpu.ops import history as hist
  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != stage:
      continue
    n = int(m.sensor_history[i, 0])
    if n <= 0:
      continue
    adr_sd = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])
    interp = int(m.sensor_history[i, 1])
    adr = int(m.sensor_historyadr[i])
    delay = float(m.sensor_delay[i])
    period = float(m.sensor_interval[i, 0])
    if delay > 0:
      val = hist.read(d.history, adr, n, dim, d.time - delay, interp)
      sd = sd.at[adr_sd:adr_sd + dim].set(val)
    elif period > 0:
      # interval mode: keep the fresh value when the tick fires, otherwise
      # hold/interpolate the buffered one
      time_prev = d.history[adr]
      fire = time_prev + period <= d.time
      rd = hist.read(d.history, adr, n, dim, d.time, interp)
      cur = jax.lax.dynamic_slice(sd, (adr_sd,), (dim,))
      sd = sd.at[adr_sd:adr_sd + dim].set(jnp.where(fire, cur, rd))
  return sd


def sensor_pos(m: Model, d: Data, history_adjust: bool = True) -> Data:
  """Position-stage sensors (mj_sensorPos, engine_sensor.c)."""
  if m.disabled(DisableBit.SENSOR) or m.nsensor == 0:
    return d
  sd = d.sensordata
  dtype = d.qpos.dtype
  need_energy_pos = any(
      int(t) == ST.E_POTENTIAL for t in m.sensor_type)
  if need_energy_pos:
    d = energy_pos(m, d)

  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != 1:  # mjSTAGE_POS
      continue
    t = ST(int(m.sensor_type[i]))
    objid = int(m.sensor_objid[i])
    objtype = int(m.sensor_objtype[i])
    refid = int(m.sensor_refid[i])
    reftype = int(m.sensor_reftype[i])
    adr = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])

    if t == ST.CAMPROJECTION:
      # pixel coordinates of a site in a camera image (cam_project,
      # engine_sensor.c:283)
      res = m.cam_resolution[refid]
      ss = m.cam_sensorsize[refid]
      f_cal = m.cam_intrinsic[refid, :2] / jnp.maximum(ss, mjm.MINVAL) * \
          jnp.asarray(res, dtype=dtype)
      f_fov = 0.5 / jnp.tan(m.cam_fovy[refid] * jnp.pi / 360.0) * res[1]
      use_cal = (ss[0] != 0) & (ss[1] != 0)
      fx = jnp.where(use_cal, f_cal[0], f_fov)
      fy = jnp.where(use_cal, f_cal[1], f_fov)
      rel = d.cam_xmat[refid].T @ (d.site_xpos[objid] - d.cam_xpos[refid])
      denom = jnp.where(jnp.abs(rel[2]) < mjm.MINVAL,
                        jnp.where(rel[2] < 0, -mjm.MINVAL, mjm.MINVAL),
                        rel[2])
      val = jnp.stack([-fx * rel[0] / denom + 0.5 * res[0],
                       fy * rel[1] / denom + 0.5 * res[1]])
    elif t == ST.MAGNETOMETER:
      val = d.site_xmat[objid].T @ m.opt.magnetic
    elif t == ST.RANGEFINDER:
      pnt = d.site_xpos[objid]
      vec = d.site_xmat[objid][:, 2]
      dist, _ = ray_mod.ray(m, d, pnt, vec,
                            bodyexclude=int(m.site_bodyid[objid]))
      val = dist
    elif t == ST.JOINTPOS:
      val = d.qpos[m.jnt_qposadr[objid]]
    elif t == ST.TENDONPOS:
      val = d.ten_length[objid]
    elif t == ST.ACTUATORPOS:
      # one value per force output (engine_sensor.c:653): scalar for SISO
      # actuators, the 3-wide block for SO3
      oadr = int(m.actuator_outadr[objid])
      onum = int(m.actuator_outnum[objid])
      val = d.actuator_length[oadr] if onum == 1 else \
          d.actuator_length[oadr:oadr + onum]
    elif t == ST.BALLQUAT:
      val = mjm.normalize(
          jax.lax.dynamic_slice(d.qpos, (int(m.jnt_qposadr[objid]),), (4,)))
    elif t in (ST.JOINTLIMITPOS, ST.TENDONLIMITPOS):
      # up to two rows per limited joint (lower/upper); the reference reports
      # the first instantiated one — replicate with reverse-order selects
      arr = m.efc.limit_ten if t == ST.TENDONLIMITPOS else m.efc.limit_jnt
      all_rows = np.nonzero(arr == objid)[0] + m.efc.ne + m.efc.nf
      val = jnp.zeros((), dtype=dtype)
      for r in reversed(list(all_rows)):
        val = jnp.where(d.efc_active[r], d.efc_pos[r] - d.efc_margin[r], val)
    elif t in (ST.FRAMEPOS, ST.FRAMEXAXIS, ST.FRAMEYAXIS, ST.FRAMEZAXIS):
      xpos, xmat = object_pos_mat(m, d, objtype, objid)
      if refid == -1:
        if t == ST.FRAMEPOS:
          val = xpos
        else:
          val = xmat[:, int(t) - int(ST.FRAMEXAXIS)]
      else:
        xpos_ref, xmat_ref = object_pos_mat(m, d, reftype, refid)
        if t == ST.FRAMEPOS:
          val = xmat_ref.T @ (xpos - xpos_ref)
        else:
          val = xmat_ref.T @ xmat[:, int(t) - int(ST.FRAMEXAXIS)]
    elif t == ST.FRAMEQUAT:
      q = object_quat(m, d, objtype, objid)
      if refid == -1:
        val = q
      else:
        qref = object_quat(m, d, reftype, refid)
        val = mjm.mul_quat(mjm.conj_quat(qref), q)
    elif t == ST.INSIDESITE:
      xpos, _ = object_pos_mat(m, d, objtype, objid)
      val = inside_geom(d.site_xpos[refid], d.site_xmat[refid],
                        m.site_size[refid], int(m.site_type[refid]), xpos)
    elif t in (ST.GEOMDIST, ST.GEOMNORMAL, ST.GEOMFROMTO):
      cutoff = m.sensor_cutoff[i]
      g1s = ([objid] if ObjType(objtype) == ObjType.GEOM else
             list(range(int(m.body_geomadr[objid]),
                        int(m.body_geomadr[objid])
                        + int(m.body_geomnum[objid]))))
      g2s = ([refid] if ObjType(reftype) == ObjType.GEOM else
             list(range(int(m.body_geomadr[refid]),
                        int(m.body_geomadr[refid])
                        + int(m.body_geomnum[refid]))))
      best = cutoff * jnp.ones((), dtype=dtype)
      fromto = jnp.zeros((6,), dtype=dtype)
      for ga in g1s:
        for gb in g2s:
          dist_n, ft_n = geom_distance(m, d, ga, gb, cutoff)
          better = dist_n < best
          fromto = jnp.where(better, ft_n, fromto)
          best = jnp.minimum(best, dist_n)
      if t == ST.GEOMDIST:
        val = best
      elif t == ST.GEOMNORMAL:
        n_ = fromto[3:] - fromto[:3]
        nz = mjm.norm_safe(n_) > mjm.MINVAL
        val = jnp.where(nz, n_ / mjm.norm_safe(n_), jnp.zeros(3, dtype=dtype))
      else:
        val = fromto
    elif t == ST.SUBTREECOM:
      val = d.subtree_com[objid]
    elif t == ST.E_POTENTIAL:
      val = d.energy[0]
    elif t == ST.E_KINETIC:
      d = energy_vel(m, d)
      val = d.energy[1]
    elif t == ST.CLOCK:
      val = d.time
    elif t == ST.USER:
      # registered pure-JAX callback (mjcb_sensor analog, plugin.py):
      # fn(m, d, i) -> (dim,) written at the sensor address
      if m.user_cb[3] is None:
        raise NotImplementedError(
            "USER sensor requires plugin.set_sensor_callback")
      val = m.user_cb[3](m, d, i)
    else:
      raise NotImplementedError(f"pos-stage sensor {t}")
    sd = _write(sd, adr, dim, _apply_cutoff(m, i, val))
  if history_adjust:
    sd = _history_adjust(m, d, sd, 1)
  return d.replace(sensordata=sd)


def sensor_vel(m: Model, d: Data, history_adjust: bool = True) -> Data:
  """Velocity-stage sensors (mj_sensorVel, engine_sensor.c:838)."""
  if m.disabled(DisableBit.SENSOR) or m.nsensor == 0:
    return d
  dtype = d.qpos.dtype
  need_subtree = any(int(t) in (ST.SUBTREELINVEL, ST.SUBTREEANGMOM)
                     for t in m.sensor_type)
  if need_subtree:
    d = subtree_vel(m, d)
  sd = d.sensordata

  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != 2:  # mjSTAGE_VEL
      continue
    t = ST(int(m.sensor_type[i]))
    objid = int(m.sensor_objid[i])
    objtype = int(m.sensor_objtype[i])
    refid = int(m.sensor_refid[i])
    reftype = int(m.sensor_reftype[i])
    adr = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])

    if t == ST.VELOCIMETER:
      val = object_velocity(m, d, int(ObjType.SITE), objid, True)[3:]
    elif t == ST.GYRO:
      val = object_velocity(m, d, int(ObjType.SITE), objid, True)[:3]
    elif t == ST.JOINTVEL:
      val = d.qvel[m.jnt_dofadr[objid]]
    elif t == ST.TENDONVEL:
      val = d.ten_velocity[objid]
    elif t == ST.ACTUATORVEL:
      oadr = int(m.actuator_outadr[objid])
      onum = int(m.actuator_outnum[objid])
      val = d.actuator_velocity[oadr] if onum == 1 else \
          d.actuator_velocity[oadr:oadr + onum]
    elif t == ST.BALLANGVEL:
      val = jax.lax.dynamic_slice(d.qvel, (int(m.jnt_dofadr[objid]),), (3,))
    elif t in (ST.JOINTLIMITVEL, ST.TENDONLIMITVEL):
      arr = m.efc.limit_ten if t == ST.TENDONLIMITVEL else m.efc.limit_jnt
      all_rows = np.nonzero(arr == objid)[0] + m.efc.ne + m.efc.nf
      val = jnp.zeros((), dtype=dtype)
      for r in reversed(list(all_rows)):
        val = jnp.where(d.efc_active[r], jnp.dot(d.efc_J[r], d.qvel), val)
    elif t in (ST.FRAMELINVEL, ST.FRAMEANGVEL):
      xvel = object_velocity(m, d, objtype, objid, False)
      if refid > -1:
        xpos, _ = object_pos_mat(m, d, objtype, objid)
        xpos_ref, xmat_ref = object_pos_mat(m, d, reftype, refid)
        xvel_ref = object_velocity(m, d, reftype, refid, False)
        rel = xvel - xvel_ref
        rvec = xpos - xpos_ref
        rel = rel.at[3:].add(jnp.cross(rvec, xvel_ref[:3]))
        xvel = jnp.concatenate([xmat_ref.T @ rel[:3], xmat_ref.T @ rel[3:]])
      val = xvel[3:] if t == ST.FRAMELINVEL else xvel[:3]
    elif t == ST.SUBTREELINVEL:
      val = d.subtree_linvel[objid]
    elif t == ST.SUBTREEANGMOM:
      val = d.subtree_angmom[objid]
    elif t == ST.USER:
      # registered pure-JAX callback (mjcb_sensor analog, plugin.py):
      # fn(m, d, i) -> (dim,) written at the sensor address
      if m.user_cb[3] is None:
        raise NotImplementedError(
            "USER sensor requires plugin.set_sensor_callback")
      val = m.user_cb[3](m, d, i)
    else:
      raise NotImplementedError(f"vel-stage sensor {t}")
    sd = _write(sd, adr, dim, _apply_cutoff(m, i, val))
  if history_adjust:
    sd = _history_adjust(m, d, sd, 2)
  return d.replace(sensordata=sd)


def sensor_acc(m: Model, d: Data, history_adjust: bool = True) -> Data:
  """Acceleration-stage sensors (mj_sensorAcc, engine_sensor.c:957)."""
  if m.disabled(DisableBit.SENSOR) or m.nsensor == 0:
    return d
  dtype = d.qpos.dtype
  need_rnepost = any(
      int(t) in (ST.ACCELEROMETER, ST.FORCE, ST.TORQUE, ST.FRAMELINACC,
                 ST.FRAMEANGACC, ST.TOUCH)
      for t in m.sensor_type)
  if need_rnepost:
    d = rne_postconstraint(m, d)
  need_ft = any(int(t) == ST.CONTACT for t in m.sensor_type)
  ft_all = contact_force(m, d) if need_ft else None
  sd = d.sensordata

  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != 3:  # mjSTAGE_ACC
      continue
    t = ST(int(m.sensor_type[i]))
    objid = int(m.sensor_objid[i])
    objtype = int(m.sensor_objtype[i])
    adr = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])

    if t == ST.TOUCH:
      val = _touch(m, d, objid)
    elif t == ST.CONTACT:
      val = _contact_sensor(m, d, i, ft_all)
    elif t == ST.TACTILE:
      val = _tactile(m, d, i)
    elif t == ST.ACCELEROMETER:
      val = object_acceleration(m, d, int(ObjType.SITE), objid, True)[3:]
    elif t in (ST.FORCE, ST.TORQUE):
      bodyid = int(m.site_bodyid[objid])
      rootid = int(m.body_rootid[bodyid])
      w = mjm.transform_spatial(d.cfrc_int[bodyid], True,
                                d.site_xpos[objid], d.subtree_com[rootid],
                                d.site_xmat[objid])
      val = w[3:] if t == ST.FORCE else w[:3]
    elif t == ST.ACTUATORFRC:
      oadr = int(m.actuator_outadr[objid])
      onum = int(m.actuator_outnum[objid])
      val = d.actuator_force[oadr] if onum == 1 else \
          d.actuator_force[oadr:oadr + onum]
    elif t == ST.JOINTACTFRC:
      val = d.qfrc_actuator[m.jnt_dofadr[objid]]
    elif t == ST.TENDONACTFRC:
      from mujoco_tpu.models.types import TrnType
      val = jnp.zeros((), dtype=dtype)
      for a_ in range(m.nu):
        if (int(m.actuator_trntype[a_]) == int(TrnType.TENDON)
            and int(m.actuator_trnid[a_, 0]) == objid):
          val = val + d.actuator_force[int(m.actuator_outadr[a_])]
    elif t in (ST.JOINTLIMITFRC, ST.TENDONLIMITFRC):
      arr = m.efc.limit_ten if t == ST.TENDONLIMITFRC else m.efc.limit_jnt
      all_rows = np.nonzero(arr == objid)[0] + m.efc.ne + m.efc.nf
      val = jnp.zeros((), dtype=dtype)
      for r in reversed(list(all_rows)):
        val = jnp.where(d.efc_active[r], d.efc_force[r], val)
    elif t in (ST.FRAMELINACC, ST.FRAMEANGACC):
      acc = object_acceleration(m, d, objtype, objid, False)
      val = acc[3:] if t == ST.FRAMELINACC else acc[:3]
    elif t == ST.USER:
      # registered pure-JAX callback (mjcb_sensor analog, plugin.py):
      # fn(m, d, i) -> (dim,) written at the sensor address
      if m.user_cb[3] is None:
        raise NotImplementedError(
            "USER sensor requires plugin.set_sensor_callback")
      val = m.user_cb[3](m, d, i)
    else:
      raise NotImplementedError(f"acc-stage sensor {t}")
    sd = _write(sd, adr, dim, _apply_cutoff(m, i, val))
  if history_adjust:
    sd = _history_adjust(m, d, sd, 3)
  return d.replace(sensordata=sd)


def _touch(m: Model, d: Data, siteid: int):
  """Touch sensor: sum normal forces of contacts whose force ray intersects
  the site zone (mjSENS_TOUCH, engine_sensor.c:980)."""
  dtype = d.qpos.dtype
  bodyid = int(m.site_bodyid[siteid])
  total = jnp.zeros((), dtype=dtype)
  if m.con.ncon == 0:
    return total
  cf = contact_force(m, d)
  active = d.contact.dist < d.contact.includemargin
  site_type = int(m.site_type[siteid])
  # traced body match: dynamic pair-group slots select geoms per step
  gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
  b1s = gb[d.contact.geomids[:, 0]]
  b2s = gb[jnp.maximum(d.contact.geomids[:, 1], 0)]
  sel1 = b1s == bodyid
  sel2 = (b2s == bodyid) & (d.contact.geomids[:, 1] >= 0)
  fn = cf[:, 0]
  ray_dir = d.contact.frame[:, 0] * jnp.where(sel1, 1.0, -1.0)[:, None]
  hit = jax.vmap(lambda p, v: ray_mod.ray_geom(
      d.site_xpos[siteid], d.site_xmat[siteid], m.site_size[siteid],
      p, v, site_type))(d.contact.pos, ray_dir)
  ok = active & (fn > 0) & jnp.isfinite(hit) & (sel1 | sel2)
  return jnp.sum(jnp.where(ok, fn, 0.0))


# ---------------------------------------------------------------------------
# geom distance (mj_geomDistance) + inside-geom test
# ---------------------------------------------------------------------------


def geom_distance(m: Model, d: Data, g1: int, g2: int, cutoff):
  """Signed distance + nearest segment between two geoms (mj_geomDistance):
  returns (dist, fromto (6,)). Uses the narrowphase collider registry; falls
  back to (cutoff, zeros) for unsupported type pairs."""
  from mujoco_tpu.ops import collision_driver
  dtype = d.qpos.dtype
  t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
  swap = t1 > t2
  a, b = (g2, g1) if swap else (g1, g2)
  from mujoco_tpu.models.types import GeomType
  fn_entry = collision_driver._COLLIDERS.get(
      (GeomType(min(t1, t2)), GeomType(max(t1, t2))))
  if fn_entry is None:
    return jnp.asarray(cutoff, dtype=dtype), jnp.zeros((6,), dtype=dtype)
  fn, _ = fn_entry
  dd, pp, nn, _tt = fn(d.geom_xpos[a], d.geom_xmat[a], m.geom_size[a],
                       d.geom_xpos[b], d.geom_xmat[b], m.geom_size[b])
  i = jnp.argmin(dd)
  dist = dd[i]
  pos = pp[i]
  n = nn[i] * (-1.0 if swap else 1.0)
  frm = pos - n * (dist * 0.5)
  to = pos + n * (dist * 0.5)
  ok = dist < cutoff
  dist = jnp.minimum(dist, jnp.asarray(cutoff, dtype=dtype))
  fromto = jnp.where(ok, jnp.concatenate([frm, to]),
                     jnp.zeros((6,), dtype=dtype))
  return dist, fromto


def inside_geom(pos, mat, size, geomtype: int, point):
  """1.0 if point is inside the geom (mju_insideGeom analog)."""
  from mujoco_tpu.models.types import GeomType
  p = mat.T @ (point - pos)
  t = int(geomtype)
  if t == GeomType.SPHERE:
    return (mjm.norm_safe(p) <= size[0]).astype(point.dtype)
  if t == GeomType.BOX:
    return jnp.all(jnp.abs(p) <= size[:3]).astype(point.dtype)
  if t == GeomType.CAPSULE:
    z = jnp.clip(p[2], -size[1], size[1])
    return (mjm.norm_safe(p - jnp.array([0.0, 0, 1], dtype=point.dtype) * z)
            <= size[0]).astype(point.dtype)
  if t == GeomType.ELLIPSOID:
    return (jnp.sum((p / jnp.maximum(size[:3], mjm.MINVAL)) ** 2)
            <= 1.0).astype(point.dtype)
  if t == GeomType.CYLINDER:
    inside = (jnp.abs(p[2]) <= size[1]) & (
        p[0] ** 2 + p[1] ** 2 <= size[0] ** 2)
    return inside.astype(point.dtype)
  raise NotImplementedError(f"inside_geom for type {t}")
