"""Flex (deformable) contact generation: geom vs flex elements/vertices.

Counterparts (all closed-form, re-expressed branchlessly):
  mj_collidePlaneFlex   engine_collision_driver.c:2086  (plane vs vertices)
  mjraw_SphereTriangle  engine_collision_primitive.c:566
  mjraw_CapsuleTriangle engine_collision_primitive.c:746
  mjraw_BoxTriangle     engine_collision_primitive.c:653

Fixed shapes: every compatible (geom, flex) pair owns `flex_budget` contact
slots; all per-element candidates are evaluated vectorized and the K deepest
land in the slots (the fixed-shape analog of filterFlexContacts,
engine_collision_driver.c:447). Candidate→slot selection is dynamic, so the
contacting vertex triple rides in Contact.flexvert (traced) for the
constraint stage's inverse-distance body weighting (mj_elemBodyWeight,
engine_core_constraint.c:221).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, GeomType, Model
from mujoco_tpu.utils import math as mjm

_BIG = 1e10


def _point_segment_2d(p, a, b):
  """Closest point to p on segment ab (2D); returns (point, dist)."""
  ab = b - a
  t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), mjm.MINVAL)
  t = jnp.clip(t, 0.0, 1.0)
  x = a + t * ab
  return x, mjm.norm_safe(x - p)


def sphere_triangle(s, rs, t1, t2, t3, rt):
  """Sphere (center s, radius rs) vs triangle+radius: (dist, pos, normal).
  Branchless mjraw_SphereTriangle; normal points sphere → triangle."""
  S = s - t1
  A = t2 - t1
  B = t3 - t1
  N = mjm.normalize(jnp.cross(A, B))
  dstS = jnp.dot(N, S)
  P = S - N * dstS

  V1 = mjm.normalize(A)
  V2 = mjm.normalize(jnp.cross(N, A))
  o2 = jnp.zeros((2,), dtype=s.dtype)
  a2 = jnp.stack([mjm.norm_safe(A), jnp.zeros((), dtype=s.dtype)])
  b2 = jnp.stack([jnp.dot(V1, B), jnp.dot(V2, B)])
  p2 = jnp.stack([jnp.dot(V1, P), jnp.dot(V2, P)])

  def area_sign(p, q, r):
    return jnp.sign((q[0] - p[0]) * (r[1] - p[1])
                    - (q[1] - p[1]) * (r[0] - p[0]))

  s1 = area_sign(p2, o2, a2)
  s2 = area_sign(p2, a2, b2)
  s3 = area_sign(p2, b2, o2)
  inside = (s1 == s2) & (s2 == s3)

  x1, d1 = _point_segment_2d(p2, o2, a2)
  x2, d2 = _point_segment_2d(p2, a2, b2)
  x3, d3 = _point_segment_2d(p2, b2, o2)
  best = jnp.where(d1 < jnp.minimum(d2, d3), 0,
                   jnp.where(d2 < d3, 1, 2))
  xe = jnp.stack([x1, x2, x3])[best]
  X2 = jnp.where(inside, P, V1 * xe[0] + V2 * xe[1])

  nrm = X2 - S
  dst = mjm.norm_safe(nrm)
  nrm = nrm / dst
  dist = dst - rs - rt
  pos = s + nrm * (rs + dist / 2)
  return dist, pos, nrm


def capsule_triangle(pos, mat, size, t1, t2, t3, rt):
  """Capsule vs triangle+radius: 5 candidates (2 endpoint spheres + 3
  triangle vertices vs interior segment). Returns (dist(5,), pos(5,3),
  normal(5,3))."""
  dtype = pos.dtype
  radius, length = size[0], size[1]
  axis = mat[:, 2]
  p1 = pos - axis * length
  p2 = pos + axis * length

  d_a, pos_a, n_a = sphere_triangle(p1, radius, t1, t2, t3, rt)
  d_b, pos_b, n_b = sphere_triangle(p2, radius, t1, t2, t3, rt)

  ab = p2 - p1
  dists, poss, nrms = [d_a, d_b], [pos_a, pos_b], [n_a, n_b]
  for v in (t1, t2, t3):
    t = jnp.dot(v - p1, ab) / jnp.maximum(4 * length * length, mjm.MINVAL)
    interior = (t > mjm.MINVAL) & (t < 1 - mjm.MINVAL)
    closest = p1 + ab * t
    vec = v - closest
    dst = mjm.norm_safe(vec)
    vecn = vec / dst
    dist = dst - radius - rt
    cpos = 0.5 * (closest + v + vecn * (radius - rt))
    dists.append(jnp.where(interior, dist, _BIG))
    poss.append(cpos)
    nrms.append(vecn)
  return jnp.stack(dists), jnp.stack(poss), jnp.stack(nrms)


def box_triangle(pos, mat, size, t1, t2, t3, rt):
  """Box vs triangle+radius: 3 vertex-face + 8 corner-sphere candidates.
  Returns (dist(11,), pos(11,3), normal(11,3))."""
  dtype = pos.dtype
  dists, poss, nrms = [], [], []
  for v in (t1, t2, t3):
    local = mat.T @ (v - pos)
    vals = jnp.abs(local) - size
    maxaxis = jnp.argmax(vals)
    maxval = vals[maxaxis]
    # inside check in other dims is margin-dependent in the reference; the
    # rbound-free analog: candidate only when within faces laterally
    # (|local_j| <= size_j + rt) — looser candidates just rank deeper-than-
    # margin and get masked by includemargin
    nrm_local = jnp.zeros((3,), dtype=dtype).at[maxaxis].set(
        jnp.sign(local[maxaxis]))
    nrm = mat @ nrm_local
    dist = maxval - rt
    offset = rt + dist * 0.5
    lateral_ok = jnp.sum(
        jnp.where(jnp.arange(3) == maxaxis, 0.0,
                  jnp.maximum(jnp.abs(local) - size - rt, 0.0))) <= 0.0
    dists.append(jnp.where(lateral_ok, dist, _BIG))
    poss.append(v - nrm * offset)
    nrms.append(nrm)
  for i in range(8):
    corner_l = jnp.stack([size[0] * (1.0 if i & 1 else -1.0),
                          size[1] * (1.0 if i & 2 else -1.0),
                          size[2] * (1.0 if i & 4 else -1.0)])
    corner = mat @ corner_l + pos
    dd, pp, nn = sphere_triangle(corner, jnp.zeros((), dtype=dtype),
                                 t1, t2, t3, rt)
    dists.append(dd)
    poss.append(pp)
    nrms.append(nn)
  return jnp.stack(dists), jnp.stack(poss), jnp.stack(nrms)


def sphere_segment(s, rs, a, b, rt):
  """Sphere vs segment+radius (the dim-1 flex element analog of
  mjraw_CapsuleCapsule's closest-point core): (dist, pos, normal)."""
  ab = b - a
  t = jnp.clip(jnp.dot(s - a, ab)
               / jnp.maximum(jnp.dot(ab, ab), mjm.MINVAL), 0.0, 1.0)
  c = a + t * ab
  vec = c - s
  dst = mjm.norm_safe(vec)
  nrm = vec / dst
  dist = dst - rs - rt
  return dist, s + nrm * (rs + dist / 2), nrm


def _seg_seg_closest(p1, q1, p2, q2):
  """Closest points between segments p1q1 and p2q2 (branchless clamped
  solve; engine_collision_primitive.c capsule-capsule core)."""
  d1 = q1 - p1
  d2 = q2 - p2
  r = p1 - p2
  a = jnp.dot(d1, d1)
  e = jnp.dot(d2, d2)
  f = jnp.dot(d2, r)
  c = jnp.dot(d1, r)
  b = jnp.dot(d1, d2)
  denom = jnp.maximum(a * e - b * b, mjm.MINVAL)
  s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
  t = (b * s + f) / jnp.maximum(e, mjm.MINVAL)
  t_cl = jnp.clip(t, 0.0, 1.0)
  s2 = jnp.clip((b * t_cl - c) / jnp.maximum(a, mjm.MINVAL), 0.0, 1.0)
  return p1 + d1 * s2, p2 + d2 * t_cl, t_cl


def capsule_segment(pos, mat, size, a, b, rt):
  """Capsule vs segment+radius: exactly the primitive capsule-capsule
  collider (mjraw_CapsuleCapsule) with the rope element as the second
  capsule — one closest-pair contact, or two endpoint contacts when
  parallel. Returns (dist(2,), pos(2,3), normal(2,3))."""
  from mujoco_tpu.ops import collision_primitive as prim
  center = 0.5 * (a + b)
  half = 0.5 * (b - a)
  hlen = mjm.norm_safe(half)
  ax2 = half / jnp.maximum(hlen, mjm.MINVAL)
  m2 = jnp.stack([jnp.zeros_like(ax2), jnp.zeros_like(ax2), ax2], axis=1)
  s2 = jnp.stack([rt, hlen, jnp.zeros_like(hlen)])
  dd, pp, nn, _ = prim.capsule_capsule(pos, mat, size, center, m2, s2)
  return dd, pp, nn


def box_segment(pos, mat, size, a, b, rt):
  """Box vs segment+radius: endpoint/midpoint face candidates + 8 corner
  probes vs the segment (box-capsule deviation documented in ROADMAP).
  Returns (dist(11,), pos(11,3), normal(11,3))."""
  dtype = pos.dtype
  dists, poss, nrms = [], [], []
  mid = 0.5 * (a + b)
  for v in (a, b, mid):
    local = mat.T @ (v - pos)
    vals = jnp.abs(local) - size
    maxaxis = jnp.argmax(vals)
    maxval = vals[maxaxis]
    nrm_local = jnp.zeros((3,), dtype=dtype).at[maxaxis].set(
        jnp.sign(local[maxaxis]))
    nrm = mat @ nrm_local
    dd = maxval - rt
    lateral_ok = jnp.sum(
        jnp.where(jnp.arange(3) == maxaxis, 0.0,
                  jnp.maximum(jnp.abs(local) - size - rt, 0.0))) <= 0.0
    dists.append(jnp.where(lateral_ok, dd, _BIG))
    poss.append(v - nrm * (rt + dd * 0.5))
    nrms.append(nrm)
  for i in range(8):
    corner_l = jnp.stack([size[0] * (1.0 if i & 1 else -1.0),
                          size[1] * (1.0 if i & 2 else -1.0),
                          size[2] * (1.0 if i & 4 else -1.0)])
    corner = mat @ corner_l + pos
    dd, pp, nn = sphere_segment(corner, jnp.zeros((), dtype=dtype), a, b, rt)
    dists.append(dd)
    poss.append(pp)
    nrms.append(nn)
  return jnp.stack(dists), jnp.stack(poss), jnp.stack(nrms)


def flex_collision(m: Model, d: Data, dist, pos, frame, flexvert):
  """Fill flex contact slots: per (geom, flex) pair, evaluate all element
  (or vertex, for planes) candidates and keep the K deepest."""
  from mujoco_tpu.ops.collision_driver import make_frame
  flx = m.flx
  con = m.con
  dtype = d.qpos.dtype
  K = con.flex_budget

  for p in range(len(con.flexpair_geom)):
    g = int(con.flexpair_geom[p])
    f = int(con.flexpair_flex[p])
    adr = int(con.flexpair_adr[p])
    t = int(m.geom_type[g])
    gpos = d.geom_xpos[g]
    gmat = d.geom_xmat[g]
    gsize = m.geom_size[g]
    rt = m.flex_radius[f]

    if t == GeomType.PLANE:
      # one candidate per vertex (mj_collidePlaneFlex)
      vs = np.arange(flx.vertadr[f], flx.vertadr[f] + flx.vertnum[f])
      v = d.flexvert_xpos[vs]
      nrm = gmat[:, 2]
      dstv = (v - gpos[None, :]) @ nrm - rt
      posv = v - nrm[None, :] * (dstv * 0.5 + rt)[:, None]
      cd = dstv
      cp = posv
      cn = jnp.broadcast_to(nrm, (len(vs), 3))
      cverts = np.stack([vs, np.full_like(vs, -1), np.full_like(vs, -1),
                         np.full_like(vs, -1)], axis=1)
    elif int(flx.dim[f]) == 1:
      # dim-1 (rope/cable): elements are segments with the flex radius
      elems = np.arange(flx.elemadr[f], flx.elemadr[f] + flx.elemnum[f])
      seg = flx.elem[elems][:, :2]                   # (ne, 2) global verts
      gbody = int(m.geom_bodyid[g])
      excl = (flx.vertbodyid[seg] == gbody).any(axis=1)
      s1 = d.flexvert_xpos[seg[:, 0]]
      s2 = d.flexvert_xpos[seg[:, 1]]
      if t == GeomType.SPHERE:
        fn = lambda a, b: sphere_segment(gpos, gsize[0], a, b, rt)
        ncand = 1
      elif t == GeomType.CAPSULE:
        fn = lambda a, b: capsule_segment(gpos, gmat, gsize, a, b, rt)
        ncand = 2
      else:  # BOX
        fn = lambda a, b: box_segment(gpos, gmat, gsize, a, b, rt)
        ncand = 11
      cd, cp, cn = jax.vmap(fn)(s1, s2)
      if ncand == 1:
        cd, cp, cn = cd[:, None], cp[:, None, :], cn[:, None, :]
      cd = jnp.where(jnp.asarray(excl)[:, None], _BIG, cd)
      cd = cd.reshape(-1)
      cp = cp.reshape(-1, 3)
      cn = cn.reshape(-1, 3)
      # two valid vertices per candidate: remaining slots -1 so the body
      # weighting spreads over the segment endpoints only
      cverts = np.concatenate(
          [np.repeat(seg, ncand, axis=0),
           np.full((len(seg) * ncand, 2), -1)], axis=1)
    else:
      # dim-2: one triangle per element; dim-3: the 4 faces of each
      # surface-layer tetrahedron, each collided as a triangle (the shallow-
      # contact equivalent of mjc_ConvexElem on the simplex + radius,
      # engine_collision_driver.c:2372,2461)
      elems = np.arange(flx.elemadr[f], flx.elemadr[f] + flx.elemnum[f])
      elems = elems[flx.elem_collidable[elems]]
      gbody = int(m.geom_bodyid[g])
      if int(flx.dim[f]) == 2:
        tri = flx.elem[elems][:, :3]                 # (nt, 3) global verts
        cvert_of_tri = tri
      else:
        tet = flx.elem[elems]                        # (ne, 4) global verts
        faces = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 2, 3]])
        tri = tet[:, faces].reshape(-1, 3)           # (4*ne, 3)
        cvert_of_tri = np.repeat(tet, 4, axis=0)     # (4*ne, 4)
      excl = (flx.vertbodyid[tri] == gbody).any(axis=1)
      t1 = d.flexvert_xpos[tri[:, 0]]
      t2 = d.flexvert_xpos[tri[:, 1]]
      t3 = d.flexvert_xpos[tri[:, 2]]
      if t == GeomType.SPHERE:
        fn = lambda a, b, c: sphere_triangle(gpos, gsize[0], a, b, c, rt)
        ncand = 1
      elif t == GeomType.CAPSULE:
        fn = lambda a, b, c: capsule_triangle(gpos, gmat, gsize, a, b, c, rt)
        ncand = 5
      else:  # BOX
        fn = lambda a, b, c: box_triangle(gpos, gmat, gsize, a, b, c, rt)
        ncand = 11
      cd, cp, cn = jax.vmap(fn)(t1, t2, t3)          # (nt, [ncand,] ...)
      if ncand == 1:
        cd, cp, cn = cd[:, None], cp[:, None, :], cn[:, None, :]
      cd = jnp.where(jnp.asarray(excl)[:, None], _BIG, cd)
      cd = cd.reshape(-1)
      cp = cp.reshape(-1, 3)
      cn = cn.reshape(-1, 3)
      cverts = np.repeat(cvert_of_tri, ncand, axis=0)  # (nt*ncand, <=4)

    # normalize vertex tuples to width 4 (-1 pad)
    if cverts.shape[1] < 4:
      cverts = np.concatenate(
          [cverts, np.full((cverts.shape[0], 4 - cverts.shape[1]), -1)],
          axis=1)

    # top-K deepest candidates into the K slots (pad when fewer candidates)
    if cd.shape[0] < K:
      padn = K - cd.shape[0]
      cd = jnp.concatenate([cd, jnp.full((padn,), _BIG, dtype=dtype)])
      cp = jnp.concatenate([cp, jnp.zeros((padn, 3), dtype=dtype)])
      cn = jnp.concatenate(
          [cn, jnp.broadcast_to(jnp.array([0.0, 0, 1], dtype=dtype),
                                (padn, 3))])
      cverts = np.concatenate([cverts, np.full((padn, 4), -1)], axis=0)
    neg, idx = jax.lax.top_k(-cd, K)
    sel_d = -neg
    sel_p = cp[idx]
    sel_n = cn[idx]
    sel_v = jnp.asarray(cverts, dtype=jnp.int32)[idx]
    sel_f = make_frame(sel_n, jnp.zeros_like(sel_n))

    sl = slice(adr, adr + K)
    dist = dist.at[sl].set(sel_d)
    pos = pos.at[sl].set(sel_p)
    frame = frame.at[sl].set(sel_f)
    flexvert = flexvert.at[sl].set(sel_v)

  return dist, pos, frame, flexvert
