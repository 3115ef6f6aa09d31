"""Narrowphase collision driver: static type-grouped dispatch over the
precomputed candidate pair table (Model.con).

TPU redesign of mj_collision (/root/reference/src/engine/engine_collision_driver.c:595):
no broadphase pruning or dynamic contact array — every candidate pair owns
fixed contact slots (ContactMeta), each type-pair group is evaluated as one
vmapped collider call, and inactive slots simply carry dist > includemargin.
Contact parameter combination mirrors mj_contactParam
(engine_collision_driver.c:1740): priority override, solmix-weighted solref /
solimp mixing, elementwise-max friction, max margin/gap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Contact, Data, DisableBit, GeomType, Model
from mujoco_tpu.ops import collision_primitive as cp
from mujoco_tpu.utils import math as mjm

def _box_box(*args):
  from mujoco_tpu.ops import collision_box
  return collision_box.box_box(*args)


_COLLIDERS = {
    (GeomType.PLANE, GeomType.SPHERE): (cp.plane_sphere, 1),
    (GeomType.PLANE, GeomType.CAPSULE): (cp.plane_capsule, 2),
    (GeomType.PLANE, GeomType.ELLIPSOID): (cp.plane_ellipsoid, 1),
    (GeomType.PLANE, GeomType.CYLINDER): (cp.plane_cylinder, 4),
    (GeomType.PLANE, GeomType.BOX): (cp.plane_box, 4),
    (GeomType.SPHERE, GeomType.SPHERE): (cp.sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (cp.sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.CYLINDER): (cp.sphere_cylinder, 1),
    (GeomType.SPHERE, GeomType.BOX): (cp.sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (cp.capsule_capsule, 2),
    (GeomType.CAPSULE, GeomType.BOX): (cp.capsule_box, 3),
    (GeomType.BOX, GeomType.BOX): (_box_box, 8),
}


def make_frame(normal, tangent):
  """Complete a contact frame from normal (+optional tangent), mirroring
  mju_makeFrame (engine_util_spatial.c:512). Rows: [normal; t1; t2]."""
  n = mjm.normalize(normal)
  t_given = jnp.sum(tangent * tangent, axis=-1, keepdims=True) >= 0.25
  # default y: (0,1,0) if |n_y| < 0.5 else (0,0,1)
  ny_small = jnp.abs(n[..., 1:2]) < 0.5
  e1 = jnp.zeros_like(n).at[..., 1].set(1.0)
  e2 = jnp.zeros_like(n).at[..., 2].set(1.0)
  y0 = jnp.where(ny_small, e1, e2)
  y = jnp.where(t_given, tangent, y0)
  y = y - n * jnp.sum(n * y, axis=-1, keepdims=True)
  y = mjm.normalize(y)
  z = jnp.cross(n, y)
  return jnp.stack([n, y, z], axis=-2)


def _combine_params(m: Model, slots: np.ndarray):
  """Per-slot combined (includemargin, friction5, solref, solreffriction,
  solimp) as traced arrays; slot→geom indices are static. Slots with
  flex2 >= 0 take their second-side parameters from the flex
  (mj_contactParam with f2 >= 0, engine_collision_driver.c:1740)."""
  g1 = m.con.geom1[slots]
  g2 = np.maximum(m.con.geom2[slots], 0)
  fx2 = m.con.flex2[slots]
  fx1 = m.con.flex1[slots]
  is_flex = fx2 >= 0
  is_ff = fx1 >= 0            # flex-flex (self/internal) slot
  fxi = np.maximum(fx2, 0)
  fx1i = np.maximum(fx1, 0)
  pid = m.con.pairid[slots]
  dtype = m.geom_friction.dtype

  def G(arr):
    """Geom table with a zero dummy row for flex-only models (ngeom == 0:
    every slot is flex-flex and the geom side is fully overridden)."""
    if arr.shape[0]:
      return arr
    if isinstance(arr, np.ndarray):
      return np.zeros((1,) + arr.shape[1:], dtype=arr.dtype)
    return jnp.zeros((1,) + arr.shape[1:], dtype=arr.dtype)

  def side2(geom_arr, flex_arr):
    if not is_flex.any():
      return G(geom_arr)[g2]
    return jnp.where(jnp.asarray(is_flex).reshape(
        (-1,) + (1,) * (geom_arr.ndim - 1)), flex_arr[fxi], G(geom_arr)[g2])

  def side1(geom_arr, flex_arr):
    if not is_ff.any():
      return G(geom_arr)[g1]
    return jnp.where(jnp.asarray(is_ff).reshape(
        (-1,) + (1,) * (geom_arr.ndim - 1)), flex_arr[fx1i], G(geom_arr)[g1])

  p1 = np.where(is_ff, m.flx.priority[fx1i] if len(m.flx.priority) else 0,
                np.asarray(G(np.asarray(m.geom_priority)))[g1])
  p2 = np.where(is_flex, m.flx.priority[fxi] if len(m.flx.priority) else 0,
                np.asarray(G(np.asarray(m.geom_priority)))[g2])

  solmix1 = side1(m.geom_solmix, m.flex_solmix)
  solmix2 = side2(m.geom_solmix, m.flex_solmix)
  both = (solmix1 >= mjm.MINVAL) & (solmix2 >= mjm.MINVAL)
  neither = (solmix1 < mjm.MINVAL) & (solmix2 < mjm.MINVAL)
  mix = jnp.where(
      both, solmix1 / jnp.maximum(solmix1 + solmix2, mjm.MINVAL),
      jnp.where(neither, 0.5, jnp.where(solmix1 < mjm.MINVAL, 0.0, 1.0)))
  mix = mix[:, None]

  ref1 = side1(m.geom_solref, m.flex_solref)
  ref2 = side2(m.geom_solref, m.flex_solref)
  imp1 = side1(m.geom_solimp, m.flex_solimp)
  imp2 = side2(m.geom_solimp, m.flex_solimp)
  fri1 = side1(m.geom_friction, m.flex_friction)
  fri2 = side2(m.geom_friction, m.flex_friction)
  std = (ref1[:, :1] > 0) & (ref2[:, :1] > 0)
  solref_mixed = jnp.where(std, mix * ref1 + (1 - mix) * ref2,
                           jnp.minimum(ref1, ref2))
  solimp_mixed = mix * imp1 + (1 - mix) * imp2
  fri_mixed = jnp.maximum(fri1, fri2)

  # priority overrides (static selection masks)
  hi1 = jnp.asarray(p1 > p2)[:, None]
  hi2 = jnp.asarray(p2 > p1)[:, None]
  solref = jnp.where(hi1, ref1, jnp.where(hi2, ref2, solref_mixed))
  solimp = jnp.where(hi1, imp1, jnp.where(hi2, imp2, solimp_mixed))
  fri = jnp.where(hi1, fri1, jnp.where(hi2, fri2, fri_mixed))

  friction5 = jnp.stack(
      [fri[:, 0], fri[:, 0], fri[:, 1], fri[:, 2], fri[:, 2]], axis=-1)
  friction5 = jnp.maximum(friction5, mjm.MINVAL)

  # margins/gaps add (getMargin/getGap, engine_collision_driver.c:161-175);
  # includemargin = margin — the gap only widens detection, and rows with
  # dist ≥ includemargin are excluded, which fixed slots handle by masking.
  # Self/internal flex contacts ignore margin entirely
  # (engine_collision_driver.c:2230,2529)
  margin = side1(m.geom_margin, m.flex_margin) \
      + side2(m.geom_margin, m.flex_margin)
  if is_ff.any():
    margin = jnp.where(jnp.asarray(is_ff), 0.0, margin)
  solreffriction = jnp.zeros_like(solref)

  # explicit <pair> overrides (mj_collideGeomPair: pair params replace the
  # combined ones wholesale)
  has_pair = pid >= 0
  if has_pair.any():
    pidx = np.maximum(pid, 0)
    is_pair = jnp.asarray(has_pair)
    solref = jnp.where(is_pair[:, None], m.pair_solref[pidx], solref)
    solreffriction = jnp.where(is_pair[:, None],
                               m.pair_solreffriction[pidx], solreffriction)
    solimp = jnp.where(is_pair[:, None], m.pair_solimp[pidx], solimp)
    friction5 = jnp.where(is_pair[:, None], m.pair_friction[pidx], friction5)
    margin = jnp.where(is_pair, m.pair_margin[pidx], margin)

  return margin, friction5, solref, solreffriction, solimp


def _collider_for(m: Model, t1: int, t2: int, did1: int, did2: int):
  """Resolve the narrowphase collider fn + contacts-per-pair for a static
  type-pair signature (mjCOLLISIONFUNC analog,
  engine_collision_driver.c:45)."""
  if t1 == GeomType.HFIELD:
    from mujoco_tpu.ops import collision_hfield
    if t2 == GeomType.SPHERE:
      return collision_hfield.make_hfield_sphere(m, did1), 3
    if t2 == GeomType.CAPSULE:
      return collision_hfield.make_hfield_capsule(m, did1), 3
    if t2 in (GeomType.BOX, GeomType.CYLINDER, GeomType.ELLIPSOID,
              GeomType.MESH):
      did2m = did2 if t2 == GeomType.MESH else -1
      return collision_hfield.make_hfield_convex(m, did1, t2, did2m), 4
    raise NotImplementedError(f"hfield vs geom type {t2}")
  if t2 == GeomType.MESH and (GeomType(t1), GeomType(t2)) not in \
      _COLLIDERS and t1 in (GeomType.PLANE, GeomType.SPHERE,
                            GeomType.CAPSULE):
    from mujoco_tpu.ops import collision_mesh
    if t1 == GeomType.PLANE:
      return collision_mesh.make_plane_mesh(m, did2), 4
    if t1 == GeomType.SPHERE:
      return collision_mesh.make_sphere_mesh(m, did2), 1
    return collision_mesh.make_capsule_mesh(m, did2), 3
  if (GeomType(t1), GeomType(t2)) in _COLLIDERS:
    return _COLLIDERS[GeomType(t1), GeomType(t2)]
  # general convex pair: MPR + perturbed-support manifold
  from mujoco_tpu.ops import collision_convex
  return (collision_convex.make_convex_convex(m, t1, t2, did1, did2),
          collision_convex.CONVEX_NCON)


def collision(m: Model, d: Data) -> Data:
  """Evaluate all candidate pairs, fill d.contact (mj_collision analog)."""
  ncon = m.con.ncon
  if ncon == 0 or m.disabled(DisableBit.CONTACT):
    return d.replace(contact=d.contact.replace(
        dist=jnp.full((ncon,), 1e10, dtype=d.qpos.dtype)))

  dtype = d.qpos.dtype
  dist = jnp.full((ncon,), 1e10, dtype=dtype)
  pos = jnp.zeros((ncon, 3), dtype=dtype)
  frame = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (ncon, 3, 3))

  # group contact slots by type pair; each group's first-slot stride is the
  # collider's contact count
  keys = {}
  for c in range(ncon):
    if m.con.con_first[c]:
      if m.con.flex2[c] >= 0:
        continue  # flex slots are filled by collision_flex below
      t1 = int(m.con.pair_type[c, 0])
      t2 = int(m.con.pair_type[c, 1])
      if t2 == GeomType.SDF:
        continue  # SDF slots are filled by collision_sdf below
      # hfield/mesh colliders close over the (static) asset ids
      did1 = int(m.geom_dataid[m.con.geom1[c]]) if t1 in (
          GeomType.HFIELD, GeomType.MESH) else -1
      did2 = int(m.geom_dataid[m.con.geom2[c]]) if t2 == GeomType.MESH \
          else -1
      keys.setdefault((t1, t2, did1, did2), []).append(c)

  for key, first_slots in keys.items():
    fn, k = _collider_for(m, *key)
    first_slots = np.array(first_slots, dtype=np.int32)
    g1 = m.con.geom1[first_slots]
    g2 = m.con.geom2[first_slots]
    out = jax.vmap(fn)(d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                       d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2])
    dd, pp, nn, tt = out            # (npair, k, ...)
    ff = make_frame(nn, tt)         # (npair, k, 3, 3)
    slot_idx = (first_slots[:, None] + np.arange(k)[None, :]).ravel()
    dist = dist.at[slot_idx].set(dd.reshape(-1))
    pos = pos.at[slot_idx].set(pp.reshape(-1, 3))
    frame = frame.at[slot_idx].set(ff.reshape(-1, 3, 3))

  flexvert = jnp.full((ncon, 4), -1, dtype=jnp.int32)
  flexvert1 = jnp.full((ncon, 4), -1, dtype=jnp.int32)
  ncon_dropped = jnp.zeros((), dtype=jnp.int32)
  npair_dropped = jnp.zeros((), dtype=jnp.int32)
  if len(m.con.flexpair_geom):
    from mujoco_tpu.ops import collision_flex
    dist, pos, frame, flexvert, ncon_dropped = collision_flex.flex_collision(
        m, d, dist, pos, frame, flexvert, ncon_dropped)
  if len(m.con.selfgroups) or len(m.con.intgroups) or len(m.con.evgroups):
    from mujoco_tpu.ops import collision_flex
    dist, pos, frame, flexvert, flexvert1, ncon_dropped = \
        collision_flex.flex_flex_collision(
            m, d, dist, pos, frame, flexvert, flexvert1, ncon_dropped)
  if len(m.con.sdfgroups):
    from mujoco_tpu.ops import collision_sdf
    dist, pos, frame = collision_sdf.sdf_collision(m, d, dist, pos, frame)

  all_slots = np.arange(ncon)
  includemargin, friction5, solref, solreffriction, solimp = _combine_params(
      m, all_slots)

  geomids = jnp.stack([jnp.asarray(m.con.geom1, dtype=jnp.int32),
                       jnp.asarray(m.con.geom2, dtype=jnp.int32)], axis=-1)

  # dynamic pair groups: per-step bounding-sphere cull selects the npair
  # closest candidate pairs, which then run the group's narrowphase
  # (fixed-shape broadphase — mj_broadphase analog; see ContactMeta.dyngroups)
  for grp in m.con.dyngroups:
    fn, k = _collider_for(m, grp["t1"], grp["t2"], grp["did1"], grp["did2"])
    g1s = jnp.asarray(grp["g1"])
    g2s = jnp.asarray(grp["g2"])
    p1 = d.geom_xpos[grp["g1"]]
    p2 = d.geom_xpos[grp["g2"]]
    score = (mjm.norm_safe(p1 - p2) - m.geom_rbound[grp["g1"]]
             - m.geom_rbound[grp["g2"]]
             - m.geom_margin[grp["g1"]] - m.geom_margin[grp["g2"]])
    _, idx = jax.lax.top_k(-score, grp["npair"])
    # overlapping candidate pairs beyond the budget: broadphase overflow
    # (the reference grows its arrays; we count instead — mjWARN analog)
    npair_dropped = npair_dropped + jnp.maximum(
        jnp.sum(score < 0) - grp["npair"], 0).astype(jnp.int32)
    sg1 = g1s[idx]
    sg2 = g2s[idx]
    out = jax.vmap(fn)(d.geom_xpos[sg1], d.geom_xmat[sg1], m.geom_size[sg1],
                       d.geom_xpos[sg2], d.geom_xmat[sg2], m.geom_size[sg2])
    dd, pp, nn, tt = out
    ff = make_frame(nn, tt)
    adr = int(grp["adr"])
    nslots = grp["npair"] * k
    sl = slice(adr, adr + nslots)
    dist = dist.at[sl].set(dd.reshape(-1))
    pos = pos.at[sl].set(pp.reshape(-1, 3))
    frame = frame.at[sl].set(ff.reshape(-1, 3, 3))
    pair_ids = jnp.stack([sg1, sg2], axis=-1)            # (npair, 2)
    geomids = geomids.at[sl].set(jnp.repeat(pair_ids, k, axis=0))
    # combined contact parameters via traced gathers for the selected pairs
    im_d, fr_d, sr_d, srf_d, si_d = _combine_params_traced(
        m, jnp.repeat(sg1, k), jnp.repeat(sg2, k))
    includemargin = includemargin.at[sl].set(im_d)
    friction5 = friction5.at[sl].set(fr_d)
    solref = solref.at[sl].set(sr_d)
    solreffriction = solreffriction.at[sl].set(srf_d)
    solimp = solimp.at[sl].set(si_d)

  contact = Contact(dist=dist, pos=pos, frame=frame,
                    includemargin=includemargin, friction=friction5,
                    solref=solref, solreffriction=solreffriction,
                    solimp=solimp, mu=jnp.zeros((ncon,), dtype=dtype),
                    flexvert=flexvert, flexvert1=flexvert1, geomids=geomids)
  return d.replace(contact=contact,
                   warning=jnp.stack([ncon_dropped, npair_dropped]))


def _combine_params_traced(m: Model, g1, g2):
  """mj_contactParam combination with TRACED geom indices (dynamic pair
  slots): priority override and solmix mixing computed with jnp selects."""
  p1 = jnp.asarray(m.geom_priority)[g1]
  p2 = jnp.asarray(m.geom_priority)[g2]
  solmix1 = m.geom_solmix[g1]
  solmix2 = m.geom_solmix[g2]
  both = (solmix1 >= mjm.MINVAL) & (solmix2 >= mjm.MINVAL)
  neither = (solmix1 < mjm.MINVAL) & (solmix2 < mjm.MINVAL)
  mix = jnp.where(
      both, solmix1 / jnp.maximum(solmix1 + solmix2, mjm.MINVAL),
      jnp.where(neither, 0.5, jnp.where(solmix1 < mjm.MINVAL, 0.0, 1.0)))
  mix = mix[:, None]

  ref1, ref2 = m.geom_solref[g1], m.geom_solref[g2]
  std = (ref1[:, :1] > 0) & (ref2[:, :1] > 0)
  solref_mixed = jnp.where(std, mix * ref1 + (1 - mix) * ref2,
                           jnp.minimum(ref1, ref2))
  solimp_mixed = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
  fri_mixed = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])

  hi1 = (p1 > p2)[:, None]
  hi2 = (p2 > p1)[:, None]
  solref = jnp.where(hi1, ref1, jnp.where(hi2, ref2, solref_mixed))
  solimp = jnp.where(hi1, m.geom_solimp[g1],
                     jnp.where(hi2, m.geom_solimp[g2], solimp_mixed))
  fri = jnp.where(hi1, m.geom_friction[g1],
                  jnp.where(hi2, m.geom_friction[g2], fri_mixed))
  friction5 = jnp.stack(
      [fri[:, 0], fri[:, 0], fri[:, 1], fri[:, 2], fri[:, 2]], axis=-1)
  friction5 = jnp.maximum(friction5, mjm.MINVAL)
  margin = m.geom_margin[g1] + m.geom_margin[g2]
  return margin, friction5, solref, jnp.zeros_like(solref), solimp
