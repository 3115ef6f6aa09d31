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
  parallel = jnp.abs(det) < 1e-12 * ma * mc + mjm.MINVAL

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

  # --- parallel case: two endpoint tests of capsule 1 against segment 2
  x2a = jnp.clip((v - mb) / mc, -1, 1)
  pa_d, pa_p, pa_n = _sphere_sphere_pts(p1 + a1, s1[0], p2 + a2 * x2a,
                                        s2[0], m1[:, 2], m2[:, 2])
  x2b = jnp.clip((v + mb) / mc, -1, 1)
  pb_d, pb_p, pb_n = _sphere_sphere_pts(p1 - a1, s1[0], p2 + a2 * x2b,
                                        s2[0], m1[:, 2], m2[:, 2])

  dist = jnp.stack([jnp.where(parallel, pa_d, g_d),
                    jnp.where(parallel, pb_d, _BIG)])
  pos = jnp.stack([jnp.where(parallel, pa_p, g_p),
                   jnp.where(parallel, pb_p, g_p)])
  normal = jnp.stack([jnp.where(parallel, pa_n, g_n),
                      jnp.where(parallel, pb_n, g_n)])
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
