"""Analytic primitive colliders, branchless and vmappable.

Behavioral counterparts of /root/reference/src/engine/engine_collision_primitive.c
(mjraw_PlaneSphere, mjraw_SphereSphere, mjraw_SphereCapsule,
mjraw_CapsuleCapsule, mjc_PlaneCapsule, mjc_PlaneBox), redesigned without
early-outs: every collider always returns its static maximum number of
candidate contacts; inactive candidates carry large dist and are masked
downstream. This is what makes the whole narrowphase one fused vectorized
block under vmap over geom pairs.

Each collider takes (pos1, mat1, size1, pos2, mat2, size2) for a single pair
and returns (dist(k,), pos(k,3), normal(k,3), tangent(k,3)); tangent rows of
zero mean "frame underdetermined, pick any" (mju_makeFrame semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_tpu.utils import math as mjm

_BIG = 1e10


def _stack1(dist, pos, normal, tangent=None):
  t = tangent if tangent is not None else jnp.zeros_like(normal)
  return (dist[None], pos[None], normal[None], t[None])


def plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  cdist = jnp.dot(p2 - p1, n)
  dist = cdist - s2[0]
  pos = p2 + n * (-dist / 2 - s2[0])
  return _stack1(dist, pos, n)


def _plane_sphere_pt(n, p1, center, r):
  """plane vs sphere located at an explicit point."""
  cdist = jnp.dot(center - p1, n)
  dist = cdist - r
  pos = center + n * (-dist / 2 - r)
  return dist, pos


def plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  seg = axis * s2[1]
  d1, c1 = _plane_sphere_pt(n, p1, p2 + seg, s2[0])
  d2, c2 = _plane_sphere_pt(n, p1, p2 - seg, s2[0])
  dist = jnp.stack([d1, d2])
  pos = jnp.stack([c1, c2])
  normal = jnp.stack([n, n])
  tangent = jnp.stack([axis, axis])
  return dist, pos, normal, tangent


def plane_box(p1, m1, s1, p2, m2, s2):
  """Plane vs box: all 8 corners tested, 4 deepest returned
  (mjc_PlaneBox emits up to 4 corners below margin)."""
  n = m1[:, 2]
  # corner offsets in box frame
  signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], dtype=p2.dtype)
  corners = p2[None, :] + (signs * s2[None, :3]) @ m2.T      # (8, 3)
  dists = (corners - p1[None, :]) @ n                        # (8,)
  # 4 deepest corners
  idx = jnp.argsort(dists)[:4]
  dist = dists[idx]
  pos = corners[idx] - 0.5 * dist[:, None] * n[None, :]
  normal = jnp.broadcast_to(n, (4, 3))
  return dist, pos, normal, jnp.zeros_like(normal)


def _sphere_sphere_pts(c1, r1, c2, r2, axis1, axis2):
  """Core sphere-sphere at explicit centers (mjraw_SphereSphere)."""
  dif = c2 - c1
  len_ = mjm.norm_safe(dif)
  normal = dif / len_
  # degenerate: centers coincide → cross of z axes (fallback x)
  alt = jnp.cross(axis1, axis2)
  alt = alt / mjm.norm_safe(alt)
  use_alt = len_ < 1e-9
  normal = jnp.where(use_alt, alt, normal)
  dist = len_ - r1 - r2
  pos = c1 + normal * (r1 + dist / 2)
  return dist, pos, normal


def sphere_sphere(p1, m1, s1, p2, m2, s2):
  dist, pos, normal = _sphere_sphere_pts(p1, s1[0], p2, s2[0],
                                         m1[:, 2], m2[:, 2])
  return _stack1(dist, pos, normal)


def sphere_capsule(p1, m1, s1, p2, m2, s2):
  axis = m2[:, 2]
  x = jnp.clip(jnp.dot(axis, p1 - p2), -s2[1], s2[1])
  nearest = p2 + axis * x
  dist, pos, normal = _sphere_sphere_pts(p1, s1[0], nearest, s2[0],
                                         m1[:, 2], axis)
  return _stack1(dist, pos, normal)


def capsule_capsule(p1, m1, s1, p2, m2, s2):
  """Segment-segment closest points; parallel case emits 2 contacts
  (mjraw_CapsuleCapsule)."""
  a1 = m1[:, 2] * s1[1]
  a2 = m2[:, 2] * s2[1]
  dif = p1 - p2
  ma = jnp.dot(a1, a1)
  mb = -jnp.dot(a1, a2)
  mc = jnp.dot(a2, a2)
  u = -jnp.dot(a1, dif)
  v = jnp.dot(a2, dif)
  det = ma * mc - mb * mb
  # absolute threshold, matching the reference's `fabs(det) >= mjMINVAL`
  # (engine_collision_primitive.c:443) — a relative test here would call
  # near-parallel capsules "general" where the reference emits the 2-point
  # parallel manifold
  parallel = jnp.abs(det) < mjm.MINVAL

  # --- general case
  safe_det = jnp.where(parallel, 1.0, det)
  x1 = (mc * u - mb * v) / safe_det
  x2 = (ma * v - mb * u) / safe_det
  # clip x1, recompute x2; then clip x2, recompute x1 (C's clipping order)
  x2 = jnp.where(x1 > 1, (v - mb) / mc, jnp.where(x1 < -1, (v + mb) / mc, x2))
  x1 = jnp.clip(x1, -1, 1)
  x1 = jnp.where(x2 > 1, jnp.clip((u - mb) / ma, -1, 1),
                 jnp.where(x2 < -1, jnp.clip((u + mb) / ma, -1, 1), x1))
  x2 = jnp.clip(x2, -1, 1)
  g_d, g_p, g_n = _sphere_sphere_pts(p1 + a1 * x1, s1[0], p2 + a2 * x2,
                                     s2[0], m1[:, 2], m2[:, 2])

  # --- parallel case: endpoint tests of capsule 1 against segment 2, with
  # the reference's x2 = ±1 fallbacks when fewer than 2 of the first pair
  # are in contact (engine_collision_primitive.c:473-519). All 4 candidates
  # are evaluated, then the reference's sequential early-exit is emulated by
  # keeping the first two candidates that actually touch.
  x2a = jnp.clip((v - mb) / mc, -1, 1)
  pa_d, pa_p, pa_n = _sphere_sphere_pts(p1 + a1, s1[0], p2 + a2 * x2a,
                                        s2[0], m1[:, 2], m2[:, 2])
  x2b = jnp.clip((v + mb) / mc, -1, 1)
  pb_d, pb_p, pb_n = _sphere_sphere_pts(p1 - a1, s1[0], p2 + a2 * x2b,
                                        s2[0], m1[:, 2], m2[:, 2])
  x1c = jnp.clip((u - mb) / ma, -1, 1)
  pc_d, pc_p, pc_n = _sphere_sphere_pts(p1 + a1 * x1c, s1[0], p2 + a2,
                                        s2[0], m1[:, 2], m2[:, 2])
  x1d = jnp.clip((u + mb) / ma, -1, 1)
  pd_d, pd_p, pd_n = _sphere_sphere_pts(p1 + a1 * x1d, s1[0], p2 - a2,
                                        s2[0], m1[:, 2], m2[:, 2])
  cd = jnp.stack([pa_d, pb_d, pc_d, pd_d])
  cp = jnp.stack([pa_p, pb_p, pc_p, pd_p])
  cn = jnp.stack([pa_n, pb_n, pc_n, pd_n])
  # "touching" uses dist < 0 as the creation criterion (the caller's
  # includemargin mask re-applies the true margin); first-two-actives in
  # candidate order reproduces the reference's early exit
  act = cd < 0
  rank = jnp.cumsum(act) - 1
  sel0 = jnp.argmax(act & (rank == 0))
  sel1 = jnp.argmax(act & (rank == 1))
  has0 = jnp.any(act & (rank == 0))
  has1 = jnp.any(act & (rank == 1))
  par_d = jnp.stack([jnp.where(has0, cd[sel0], cd[0]),
                     jnp.where(has1, cd[sel1], _BIG)])
  par_p = jnp.stack([cp[sel0], cp[sel1]])
  par_n = jnp.stack([cn[sel0], cn[sel1]])

  dist = jnp.stack([jnp.where(parallel, par_d[0], g_d),
                    jnp.where(parallel, par_d[1], _BIG)])
  pos = jnp.stack([jnp.where(parallel, par_p[0], g_p),
                   jnp.where(parallel, par_p[1], g_p)])
  normal = jnp.stack([jnp.where(parallel, par_n[0], g_n),
                      jnp.where(parallel, par_n[1], g_n)])
  return dist, pos, normal, jnp.zeros_like(normal)


def sphere_box(p1, m1, s1, p2, m2, s2):
  """Sphere vs box (mjraw_SphereBox behavior): closest point on box to
  sphere center; deep-penetration case pushes out along the shallowest
  face."""
  # sphere center in box frame
  c = m2.T @ (p1 - p2)
  half = s2[:3]
  clamped = jnp.clip(c, -half, half)
  inside = jnp.all(jnp.abs(c) < half)

  # outside: closest point on surface
  dif = c - clamped
  len_out = mjm.norm_safe(dif)
  n_out = dif / len_out
  dist_out = len_out - s1[0]
  pos_box_out = clamped

  # inside: push along axis with min distance to face
  face_dist = half - jnp.abs(c)
  ax = jnp.argmin(face_dist)
  sign = jnp.sign(c[ax])
  n_in = jnp.zeros(3, dtype=c.dtype).at[ax].set(sign)
  dist_in = -(face_dist[ax] + s1[0])
  pos_box_in = c.at[ax].set(sign * half[ax])

  dist = jnp.where(inside, dist_in, dist_out)
  n_box = jnp.where(inside, n_in, n_out)
  pos_box = jnp.where(inside, pos_box_in, pos_box_out)
  # world frame; normal from sphere(1) into box(2) must point 1→2: n_box
  # points box→sphere, so flip
  normal = -(m2 @ n_box)
  pos = p1 + normal * (s1[0] + dist / 2)
  return _stack1(dist, pos, normal)


def plane_cylinder(p1, m1, s1, p2, m2, s2):
  """Plane vs cylinder (mjc_PlaneCylinder, engine_collision_primitive.c:101):
  up to 4 contacts — the two rim points nearest/farthest along the axis and
  a sideways triangle pair when the disk is near-parallel."""
  n = m1[:, 2]
  axis0 = m2[:, 2]
  prjaxis0 = jnp.dot(n, axis0)
  # axis points towards plane
  flip = prjaxis0 > 0
  axis = jnp.where(flip, -axis0, axis0)
  prjaxis = jnp.where(flip, -prjaxis0, prjaxis0)

  dist0 = jnp.dot(p2 - p1, n)

  # vec = radius-direction component of -normal
  vec = axis * prjaxis - n
  len_sqr = jnp.dot(vec, vec)
  degenerate = len_sqr < mjm.MINVAL ** 2
  scl = s2[0] / jnp.sqrt(jnp.where(degenerate, 1.0, len_sqr))
  vec = jnp.where(degenerate, m2[:, 0] * s2[0], vec * scl)

  prjvec = jnp.dot(vec, n)
  axis_h = axis * s2[1]
  prjaxis_h = prjaxis * s2[1]

  # rim points nearest (d1) and opposite (d2)
  d1 = dist0 + prjaxis_h + prjvec
  pos1c = p2 + vec + axis_h - n * (d1 * 0.5)
  d2 = dist0 - prjaxis_h + prjvec
  pos2c = p2 + vec - axis_h - n * (d2 * 0.5)

  # sideways triangle points (A, B) on the near cap
  prjvec1 = -prjvec * 0.5
  d34 = dist0 + prjaxis_h + prjvec1
  vec1 = jnp.cross(vec, axis)
  vec1 = mjm.normalize(vec1) * (s2[0] * jnp.sqrt(3.0) / 2)
  base = p2 + axis_h - vec * 0.5 - n * (d34 * 0.5)
  pos3c = base + vec1
  pos4c = base - vec1

  dist = jnp.stack([d1, d2, d34, d34])
  pos = jnp.stack([pos1c, pos2c, pos3c, pos4c])
  normal = jnp.broadcast_to(n, (4, 3))
  return dist, pos, normal, jnp.zeros_like(normal)


def plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  """Plane vs ellipsoid: support point of the ellipsoid against the plane
  normal (the mjc_PlaneConvex path specialized analytically)."""
  n = m1[:, 2]
  # plane normal in ellipsoid frame
  n_l = m2.T @ n
  sn = s2 * n_l
  denom = mjm.norm_safe(sn)
  # support point in local frame along -n_l
  sp_local = -(s2 * sn) / denom
  sp = p2 + m2 @ sp_local
  dist = jnp.dot(sp - p1, n)
  pos = sp - n * (dist * 0.5)
  return _stack1(dist, pos, n)


def sphere_cylinder(p1, m1, s1, p2, m2, s2):
  """Sphere vs cylinder (mjc_SphereCylinder,
  engine_collision_primitive.c:345): side / cap / rim cases, branchless."""
  radius, height = s2[0], s2[1]
  axis = m2[:, 2]
  vec = p1 - p2
  x = jnp.dot(axis, vec)
  a_proj = axis * x
  p_proj = vec - a_proj
  p_proj_sqr = jnp.dot(p_proj, p_proj)

  collide_side = jnp.abs(x) < height
  collide_cap = p_proj_sqr < radius * radius
  both = collide_side & collide_cap
  dist_cap = height - jnp.abs(x)
  dist_radius = radius - jnp.sqrt(jnp.maximum(p_proj_sqr, 0.0))
  collide_side = collide_side & ~(both & (dist_cap < dist_radius))
  collide_cap = collide_cap & ~(both & (dist_cap >= dist_radius))

  # --- side: sphere vs sphere at axis projection
  side_d, side_p, side_n = _sphere_sphere_pts(p1, s1[0], p2 + a_proj, radius,
                                              m1[:, 2], axis)

  # --- cap: plane-sphere against the near cap, normal flipped to cyl→sphere
  cap_sign = jnp.where(x > 0, 1.0, -1.0)
  cap_pos = p2 + axis * (cap_sign * height)
  cap_n = axis * cap_sign                      # cap outward normal
  cdist = jnp.dot(p1 - cap_pos, cap_n)
  cap_d = cdist - s1[0]
  cap_p = p1 + cap_n * (-cap_d / 2 - s1[0])
  cap_n_out = -cap_n                           # sphere→cylinder convention

  # --- rim: sphere vs point at the rim corner
  p_safe = jnp.sqrt(jnp.maximum(p_proj_sqr, mjm.MINVAL))
  corner = p2 + p_proj * (radius / p_safe) + axis * (cap_sign * height)
  rim_d, rim_p, rim_n = _sphere_sphere_pts(p1, s1[0], corner, 0.0,
                                           m1[:, 2], axis)

  dist = jnp.where(collide_side, side_d, jnp.where(collide_cap, cap_d, rim_d))
  pos = jnp.where(collide_side, side_p, jnp.where(collide_cap, cap_p, rim_p))
  normal = jnp.where(collide_side, side_n,
                     jnp.where(collide_cap, cap_n_out, rim_n))
  return _stack1(dist, pos, normal)


def capsule_box(p1, m1, s1, p2, m2, s2):
  """Capsule vs box (behavioral counterpart of mjc_CapsuleBox,
  engine_collision_box.c:603), TPU redesign: the closest segment parameter is
  found by fixed-count alternating projection (segment point ↔ box clamp,
  convex so it converges), then sphere-box tests at both capsule endpoints
  and at the converged interior point give up to 3 candidate contacts —
  the flat-resting case keeps both endpoint contacts, matching the
  reference's 2-contact manifolds; duplicate interior candidates are masked.
  """
  r, h = s1[0], s1[1]
  axis = m1[:, 2]

  def sphere_at(t):
    center = p1 + axis * t
    # inline sphere-box with explicit center (sphere geom frame irrelevant)
    c = m2.T @ (center - p2)
    half = s2[:3]
    clamped = jnp.clip(c, -half, half)
    inside = jnp.all(jnp.abs(c) < half)
    dif = c - clamped
    len_out = mjm.norm_safe(dif)
    n_out = dif / len_out
    dist_out = len_out - r
    face_dist = half - jnp.abs(c)
    ax = jnp.argmin(face_dist)
    sign = jnp.sign(c[ax]) + (c[ax] == 0)
    n_in = jnp.zeros(3, dtype=c.dtype).at[ax].set(sign)
    dist_in = -(face_dist[ax] + r)
    dist = jnp.where(inside, dist_in, dist_out)
    n_box = jnp.where(inside, n_in, n_out)
    normal = -(m2 @ n_box)
    pos = center + normal * (r + dist / 2)
    return dist, pos, normal

  # alternating projection for the interior closest point
  t = jnp.zeros((), dtype=p1.dtype)
  for _ in range(12):
    q_local = jnp.clip(m2.T @ (p1 + axis * t - p2), -s2[:3], s2[:3])
    q = p2 + m2 @ q_local
    t = jnp.clip(jnp.dot(q - p1, axis), -h, h)

  d_lo, p_lo, n_lo = sphere_at(-h)
  d_hi, p_hi, n_hi = sphere_at(h)
  d_in, p_in, n_in = sphere_at(t)
  # drop the interior candidate when it coincides with an endpoint
  dup = jnp.minimum(jnp.abs(t - h), jnp.abs(t + h)) < 1e-6 * (h + 1e-12)
  d_in = jnp.where(dup, _BIG, d_in)

  dist = jnp.stack([d_lo, d_hi, d_in])
  pos = jnp.stack([p_lo, p_hi, p_in])
  normal = jnp.stack([n_lo, n_hi, n_in])
  return dist, pos, normal, jnp.zeros_like(normal)
