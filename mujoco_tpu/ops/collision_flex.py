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


_point_segment_3d = _point_segment_2d  # same clamped-projection formula


def sphere_triangle(s, rs, t1, t2, t3, rt):
  """Sphere (center s, radius rs) vs triangle+radius: (dist, pos, normal).
  Branchless mjraw_SphereTriangle; normal points sphere → triangle.
  Degenerate (near-collinear) triangles fall back to the closest edge in 3D
  — the hull of 3 collinear points is a segment, matching the reference's
  GJK behavior instead of a garbage plane normal."""
  S = s - t1
  A = t2 - t1
  B = t3 - t1
  cr = jnp.cross(A, B)
  crn = mjm.norm_safe(cr)
  degenerate = crn < 1e-6 * jnp.maximum(
      mjm.norm_safe(A) * mjm.norm_safe(B), mjm.MINVAL)
  N = cr / jnp.maximum(crn, mjm.MINVAL)
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
  X2 = jnp.where(inside & ~degenerate, P, V1 * xe[0] + V2 * xe[1])

  # 3D edge fallback for degenerate triangles
  e1p, e1d = _point_segment_3d(s, t1, t2)
  e2p, e2d = _point_segment_3d(s, t2, t3)
  e3p, e3d = _point_segment_3d(s, t3, t1)
  ebest = jnp.where(e1d < jnp.minimum(e2d, e3d), 0,
                    jnp.where(e2d < e3d, 1, 2))
  X2 = jnp.where(degenerate, jnp.stack([e1p, e2p, e3p])[ebest] - t1, X2)

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


def _seg_seg_contact(a0, a1, ra, b0, b1, rb):
  """Single closest-pair contact between two flex segments:
  (dist, pos, normal a→b)."""
  ca, cb, _ = _seg_seg_closest(a0, a1, b0, b1)
  vec = cb - ca
  dst = mjm.norm_safe(vec)
  nrm = vec / dst
  return dst - ra - rb, 0.5 * (ca + cb) + 0.5 * (ra - rb) * nrm, nrm


def _seg_seg_capsule(a0, a1, ra, b0, b1, rb):
  """Full capsule-capsule manifold between two flex segments — 1 closest-
  pair contact, or 2 endpoint contacts when parallel (mjraw_CapsuleCapsule,
  the mj_collideElems dim-1 path, engine_collision_driver.c:2555).
  Returns (dist(2,), pos(2,3), normal(2,3)) a→b."""
  from mujoco_tpu.ops import collision_primitive as prim
  c1 = 0.5 * (a0 + a1)
  h1 = 0.5 * (a1 - a0)
  l1 = mjm.norm_safe(h1)
  ax1 = h1 / jnp.maximum(l1, mjm.MINVAL)
  m1 = jnp.stack([jnp.zeros_like(ax1), jnp.zeros_like(ax1), ax1], axis=1)
  s1 = jnp.stack([ra, l1, jnp.zeros_like(l1)])
  c2 = 0.5 * (b0 + b1)
  h2 = 0.5 * (b1 - b0)
  l2 = mjm.norm_safe(h2)
  ax2 = h2 / jnp.maximum(l2, mjm.MINVAL)
  m2 = jnp.stack([jnp.zeros_like(ax2), jnp.zeros_like(ax2), ax2], axis=1)
  s2 = jnp.stack([rb, l2, jnp.zeros_like(l2)])
  dd, pp, nn, _ = prim.capsule_capsule(c1, m1, s1, c2, m2, s2)
  return dd, pp, nn


def _tri_tri_contact(a, ra, b, rb):
  """Min-distance contact between two radius-inflated triangles: exact
  feature enumeration (6 vertex-triangle + 9 edge-edge candidates) replaces
  the reference's GJK call (mjc_ConvexElem, engine_collision_driver.c:2372).
  Exact while the core triangles do not interpenetrate (documented deviation
  in ROADMAP.md). a, b: (3, 3) vertex positions. Returns (dist, pos,
  normal a→b)."""
  dists, poss, nrms = [], [], []
  for i in range(3):
    dd, pp, nn = sphere_triangle(a[i], ra, b[0], b[1], b[2], rb)
    dists.append(dd)
    poss.append(pp)
    nrms.append(nn)
  for i in range(3):
    dd, pp, nn = sphere_triangle(b[i], rb, a[0], a[1], a[2], ra)
    dists.append(dd)
    poss.append(pp)
    nrms.append(-nn)
  edges = ((0, 1), (1, 2), (2, 0))
  for i1, i2 in edges:
    for j1, j2 in edges:
      dd, pp, nn = _seg_seg_contact(a[i1], a[i2], ra, b[j1], b[j2], rb)
      dists.append(dd)
      poss.append(pp)
      nrms.append(nn)
  D = jnp.stack(dists)
  k = jnp.argmin(D)
  return D[k], jnp.stack(poss)[k], jnp.stack(nrms)[k]


def _tet_tet_contact(a, ra, b, rb, dtype):
  """Tetrahedron-tetrahedron contact via MPR + MTD polish on the radius-
  inflated 4-vertex hulls (the branchless analog of mjc_ConvexElem on
  dim-3 elements, engine_collision_driver.c:2372). Returns (dist, pos,
  normal a→b)."""
  from mujoco_tpu.ops.collision_convex import mpr

  def sup_a(pos, mat, verts, dd):
    dn = mjm.normalize(dd)
    return verts[jnp.argmax(verts @ dd)] + ra * dn

  def sup_b(pos, mat, verts, dd):
    dn = mjm.normalize(dd)
    return verts[jnp.argmax(verts @ dd)] + rb * dn

  z = jnp.zeros((3,), dtype=dtype)
  eye = jnp.eye(3, dtype=dtype)
  return mpr(sup_a, sup_b, a.mean(axis=0), b.mean(axis=0),
             (z, eye, a), (z, eye, b), dtype)


def _pad4(v):
  """Pad a (n, k<=4) int array with -1 columns to width 4."""
  if v.shape[1] == 4:
    return v
  fill = jnp.full((v.shape[0], 4 - v.shape[1]), -1, dtype=v.dtype)
  return jnp.concatenate([v, fill], axis=1)


_TET_FACES = np.array([[0, 1, 2, 3], [0, 2, 3, 1], [0, 3, 1, 2],
                       [1, 3, 2, 0]], dtype=np.int32)


def flex_flex_collision(m: Model, d: Data, dist, pos, frame, flexvert,
                        flexvert1, dropped):
  """Fill flex self-collision and internal (within-element) contact slots.

  Self-collision (ContactMeta.selfgroups): static candidate element pairs
  (precomputed without shared vertex bodies) are prefiltered per step by
  AABB-separation top-K, then narrowphased per dim (segment-segment /
  triangle-triangle features / tet-tet MPR) and the deepest `npair` land in
  the group's slots — the fixed-shape analog of mj_collideFlexSAP
  (engine_collision_driver.c:2315).

  Internal (ContactMeta.intgroups): each tetrahedron's 4 face-vs-opposite-
  vertex anti-inversion candidates (planeVertex, condim 1), top-K into the
  group's slots (mj_collideFlexInternal, engine_collision_driver.c:2230).
  """
  from mujoco_tpu.ops.collision_driver import make_frame
  flx = m.flx
  dtype = d.qpos.dtype

  for grp in m.con.selfgroups:
    f = int(grp["flex"])
    adr = int(grp["adr"])
    K = int(grp["npair"])
    dm = int(grp["dim"])
    nvl = dm + 1
    r = m.flex_radius[f]
    base = int(flx.elemadr[f])
    nel = int(flx.elemnum[f])
    # per-element AABBs once, then per-pair separation proxy
    ev = flx.elem[base:base + nel, :nvl]               # (E, nvl) static
    ex = d.flexvert_xpos[ev]                           # (E, nvl, 3)
    elo = ex.min(axis=1) - r
    ehi = ex.max(axis=1) + r
    e1l = grp["e1"] - base                             # static local ids
    e2l = grp["e2"] - base
    sep = jnp.max(jnp.maximum(elo[e1l], elo[e2l])
                  - jnp.minimum(ehi[e1l], ehi[e2l]), axis=1)
    P = min(4 * K, len(e1l))
    _, pidx = jax.lax.top_k(-sep, P)
    v1 = jnp.asarray(ev[e1l], dtype=jnp.int32)[pidx]   # (P, nvl) traced
    v2 = jnp.asarray(ev[e2l], dtype=jnp.int32)[pidx]
    xa = d.flexvert_xpos[v1]                           # (P, nvl, 3)
    xb = d.flexvert_xpos[v2]
    if dm == 1:
      fn = lambda a, b: _seg_seg_capsule(a[0], a[1], r, b[0], b[1], r)
      ncand = 2
    elif dm == 2:
      fn = lambda a, b: _tri_tri_contact(a, r, b, r)
      ncand = 1
    else:
      fn = lambda a, b: _tet_tet_contact(a, r, b, r, dtype)
      ncand = 1
    cd, cp, cn = jax.vmap(fn)(xa, xb)                  # (P, [ncand,] ...)
    if ncand > 1:
      cd = cd.reshape(-1)
      cp = cp.reshape(-1, 3)
      cn = cn.reshape(-1, 3)
      v1 = jnp.repeat(v1, ncand, axis=0)
      v2 = jnp.repeat(v2, ncand, axis=0)
    neg, idx = jax.lax.top_k(-cd, K)
    dropped = dropped + (jnp.sum(cd < 0) - jnp.sum(-neg < 0)).astype(
        jnp.int32)
    sl = slice(adr, adr + K)
    dist = dist.at[sl].set(-neg)
    pos = pos.at[sl].set(cp[idx])
    frame = frame.at[sl].set(make_frame(cn[idx], jnp.zeros((K, 3),
                                                          dtype=dtype)))
    flexvert1 = flexvert1.at[sl].set(_pad4(v1[idx]))
    flexvert = flexvert.at[sl].set(_pad4(v2[idx]))

  for grp in m.con.intgroups:
    f = int(grp["flex"])
    adr = int(grp["adr"])
    nslots = int(grp["nslots"])
    r = m.flex_radius[f]
    base = int(flx.elemadr[f])
    nel = int(flx.elemnum[f])
    tet = flx.elem[base:base + nel]                    # (E, 4) static
    x = d.flexvert_xpos[tet]                           # (E, 4, 3)
    x0 = x[:, _TET_FACES[:, 0]]                        # (E, 4, 3)
    x1 = x[:, _TET_FACES[:, 1]]
    x2 = x[:, _TET_FACES[:, 2]]
    xv = x[:, _TET_FACES[:, 3]]
    nrm = mjm.normalize(jnp.cross(x1 - x0, x2 - x0))
    dst = jnp.einsum('efc,efc->ef', xv - x0, nrm)      # (E, 4)
    cd = jnp.where(dst > -2 * r, -dst - 2 * r, _BIG)
    cp = xv - 0.5 * dst[..., None] * nrm
    cn = -nrm
    vop = tet[:, _TET_FACES[:, 3]]                     # (E, 4) opposite vert
    cd = cd.reshape(-1)
    cp = cp.reshape(-1, 3)
    cn = cn.reshape(-1, 3)
    v1s = np.repeat(tet, 4, axis=0)                    # (4E, 4) element verts
    v2s = vop.reshape(-1)                              # (4E,) vertex
    neg, idx = jax.lax.top_k(-cd, nslots)
    dropped = dropped + (jnp.sum(cd < 0) - jnp.sum(-neg < 0)).astype(
        jnp.int32)
    sl = slice(adr, adr + nslots)
    dist = dist.at[sl].set(-neg)
    pos = pos.at[sl].set(cp[idx])
    frame = frame.at[sl].set(make_frame(cn[idx],
                                        jnp.zeros((nslots, 3), dtype=dtype)))
    flexvert1 = flexvert1.at[sl].set(jnp.asarray(v1s, dtype=jnp.int32)[idx])
    v2full = jnp.stack([jnp.asarray(v2s, dtype=jnp.int32),
                        jnp.full((len(v2s),), -1, dtype=jnp.int32),
                        jnp.full((len(v2s),), -1, dtype=jnp.int32),
                        jnp.full((len(v2s),), -1, dtype=jnp.int32)], axis=1)
    flexvert = flexvert.at[sl].set(v2full[idx])

  for grp in m.con.evgroups:
    # predefined element-vertex pairs: vertex sphere vs element, no margin
    # (mj_collideElemVert, engine_collision_driver.c:2620)
    f = int(grp["flex"])
    adr = int(grp["adr"])
    nslots = int(grp["nslots"])
    r = m.flex_radius[f]
    dm = int(flx.dim[f])
    va = int(flx.vertadr[f])
    ea = int(flx.elemadr[f])
    ev = grp["ev"]                                     # (N, 2) local (e, v)
    elverts = flx.elem[ea + ev[:, 0], :dm + 1]         # (N, dm+1) global
    vg = va + ev[:, 1]                                 # (N,) global vert
    xv = d.flexvert_xpos[vg]                           # (N, 3)
    xe = d.flexvert_xpos[elverts]                      # (N, dm+1, 3)
    if dm == 1:
      fn = lambda v, e: sphere_segment(v, r, e[0], e[1], r)
    elif dm == 2:
      fn = lambda v, e: sphere_triangle(v, r, e[0], e[1], e[2], r)
    else:
      fn = lambda v, e: _tet_tet_contact(v[None], r, e, r, dtype)
    cd, cp, cn = jax.vmap(fn)(xv, xe)
    neg, idx = jax.lax.top_k(-cd, nslots)
    dropped = dropped + (jnp.sum(cd < 0) - jnp.sum(-neg < 0)).astype(
        jnp.int32)
    sl = slice(adr, adr + nslots)
    dist = dist.at[sl].set(-neg)
    pos = pos.at[sl].set(cp[idx])
    frame = frame.at[sl].set(make_frame(cn[idx],
                                        jnp.zeros((nslots, 3), dtype=dtype)))
    v1full = jnp.stack([jnp.asarray(vg, dtype=jnp.int32),
                        jnp.full((len(vg),), -1, dtype=jnp.int32),
                        jnp.full((len(vg),), -1, dtype=jnp.int32),
                        jnp.full((len(vg),), -1, dtype=jnp.int32)], axis=1)
    flexvert1 = flexvert1.at[sl].set(v1full[idx])
    flexvert = flexvert.at[sl].set(
        _pad4(jnp.asarray(elverts, dtype=jnp.int32))[idx])

  return dist, pos, frame, flexvert, flexvert1, dropped


def flex_collision(m: Model, d: Data, dist, pos, frame, flexvert, dropped):
  """Fill flex contact slots: per (geom, flex) pair, evaluate all element
  (or vertex, for planes) candidates and keep the K deepest. `dropped`
  accumulates penetrating candidates that did not fit the budget
  (mjWARN_CONTACTFULL analog)."""
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
      if int(flx.dim[f]) == 3:
        # one contact per ELEMENT, like the reference's per-element convex
        # call (mjc_ConvexElem, engine_collision_driver.c:2372): reduce the
        # 4 face candidates (x ncand probes) of each tet to the deepest, so
        # a single squashed element cannot crowd the top-K budget out of
        # other contacting elements
        ne = len(elems)
        cd = cd.reshape(ne, -1)
        cp = cp.reshape(ne, -1, 3)
        cn = cn.reshape(ne, -1, 3)
        best = jnp.argmin(cd, axis=1)
        ar = jnp.arange(ne)
        cd = cd[ar, best]
        cp = cp[ar, best]
        cn = cn[ar, best]
        cverts = tet                                 # (ne, 4)
      else:
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
    dropped = dropped + (jnp.sum(cd < 0) - jnp.sum(sel_d < 0)).astype(
        jnp.int32)

    sl = slice(adr, adr + K)
    dist = dist.at[sl].set(sel_d)
    pos = pos.at[sl].set(sel_p)
    frame = frame.at[sl].set(sel_f)
    flexvert = flexvert.at[sl].set(sel_v)

  return dist, pos, frame, flexvert, dropped
