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
  is_flex = fx2 >= 0
  fxi = np.maximum(fx2, 0)
  pid = m.con.pairid[slots]
  dtype = m.geom_friction.dtype

  def side2(geom_arr, flex_arr):
    if not is_flex.any():
      return geom_arr[g2]
    return jnp.where(jnp.asarray(is_flex).reshape(
        (-1,) + (1,) * (geom_arr.ndim - 1)), flex_arr[fxi], geom_arr[g2])

  p1 = m.geom_priority[g1]
  p2 = np.where(is_flex, m.flx.priority[fxi] if len(m.flx.priority) else 0,
                m.geom_priority[g2])

  solmix1 = m.geom_solmix[g1]
  solmix2 = side2(m.geom_solmix, m.flex_solmix)
  both = (solmix1 >= mjm.MINVAL) & (solmix2 >= mjm.MINVAL)
  neither = (solmix1 < mjm.MINVAL) & (solmix2 < mjm.MINVAL)
  mix = jnp.where(
      both, solmix1 / jnp.maximum(solmix1 + solmix2, mjm.MINVAL),
      jnp.where(neither, 0.5, jnp.where(solmix1 < mjm.MINVAL, 0.0, 1.0)))
  mix = mix[:, None]

  ref1 = m.geom_solref[g1]
  ref2 = side2(m.geom_solref, m.flex_solref)
  imp1 = m.geom_solimp[g1]
  imp2 = side2(m.geom_solimp, m.flex_solimp)
  fri1 = m.geom_friction[g1]
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
  # dist ≥ includemargin are excluded, which fixed slots handle by masking
  margin = m.geom_margin[g1] + side2(m.geom_margin, m.flex_margin)
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
      # hfield/mesh colliders close over the (static) asset ids
      did1 = int(m.geom_dataid[m.con.geom1[c]]) if t1 in (
          GeomType.HFIELD, GeomType.MESH) else -1
      did2 = int(m.geom_dataid[m.con.geom2[c]]) if t2 == GeomType.MESH \
          else -1
      keys.setdefault((t1, t2, did1, did2), []).append(c)

  for key, first_slots in keys.items():
    t1, t2, did1, did2 = key
    if t1 == GeomType.HFIELD:
      from mujoco_tpu.ops import collision_hfield
      if t2 == GeomType.SPHERE:
        fn, k = collision_hfield.make_hfield_sphere(m, did1), 3
      elif t2 == GeomType.CAPSULE:
        fn, k = collision_hfield.make_hfield_capsule(m, did1), 3
      else:
        raise NotImplementedError(f"hfield vs geom type {t2}")
    elif t2 == GeomType.MESH and (GeomType(t1), GeomType(t2)) not in \
        _COLLIDERS and t1 in (GeomType.PLANE, GeomType.SPHERE,
                              GeomType.CAPSULE):
      from mujoco_tpu.ops import collision_mesh
      if t1 == GeomType.PLANE:
        fn, k = collision_mesh.make_plane_mesh(m, did2), 4
      elif t1 == GeomType.SPHERE:
        fn, k = collision_mesh.make_sphere_mesh(m, did2), 1
      else:
        fn, k = collision_mesh.make_capsule_mesh(m, did2), 3
    elif (GeomType(t1), GeomType(t2)) in _COLLIDERS:
      fn, k = _COLLIDERS[GeomType(t1), GeomType(t2)]
    else:
      # general convex pair: fixed-iteration MPR (single contact)
      from mujoco_tpu.ops import collision_convex
      fn, k = collision_convex.make_convex_convex(m, t1, t2, did1, did2), 1
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

  flexvert = jnp.full((ncon, 3), -1, dtype=jnp.int32)
  if len(m.con.flexpair_geom):
    from mujoco_tpu.ops import collision_flex
    dist, pos, frame, flexvert = collision_flex.flex_collision(
        m, d, dist, pos, frame, flexvert)

  all_slots = np.arange(ncon)
  includemargin, friction5, solref, solreffriction, solimp = _combine_params(
      m, all_slots)

  contact = Contact(dist=dist, pos=pos, frame=frame,
                    includemargin=includemargin, friction=friction5,
                    solref=solref, solreffriction=solreffriction,
                    solimp=solimp, mu=jnp.zeros((ncon,), dtype=dtype),
                    flexvert=flexvert)
  return d.replace(contact=contact)
