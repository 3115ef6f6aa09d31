"""Box-box collision: branchless SAT + exact rectangle-overlap manifold.

Behavioral counterpart of mjc_BoxBox
(/root/reference/src/engine/engine_collision_box.c), redesigned for the TPU:
no early-outs or dynamic manifolds. All 15 separating-axis candidates (6
faces + 9 edge pairs) are evaluated unconditionally; the minimal-penetration
axis picks between a face-face manifold (up to 8 points from the exact
intersection of the reference face rectangle with the projected incident
face) and an edge-edge contact — all composed with `where` selects so the
whole collider is one fused vectorized block under vmap over geom pairs.

Returns 8 contact candidates; inactive ones carry dist > margin and are
masked downstream like every other collider in this package.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.utils import math as mjm

_BIG = 1e10
# face-axis preference: a face axis within 1% of the best edge axis wins
# (standard SAT practice for manifold stability)
_FACE_BIAS = 1.01


def _clip_candidates(ref_half, quad2d):
  """All vertices of the intersection of rect([-ref_half, ref_half]) with a
  convex quad (both in 2D): quad verts inside rect (4), rect corners inside
  quad (4), and edge-edge crossings (16). Returns (24, 2) points + validity.
  """
  rx, ry = ref_half[0], ref_half[1]
  eps = 1e-9

  # quad verts inside rect
  in_rect = (jnp.abs(quad2d[:, 0]) <= rx + eps) & (
      jnp.abs(quad2d[:, 1]) <= ry + eps)

  # rect corners inside quad (convex, consistent winding unknown → use
  # sign-consistency of cross products)
  corners = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]],
                      dtype=quad2d.dtype) * jnp.stack([rx, ry])
  q_next = jnp.roll(quad2d, -1, axis=0)
  edge = q_next - quad2d                              # (4, 2)
  rel = corners[:, None, :] - quad2d[None, :, :]      # (4c, 4e, 2)
  cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
  in_quad = (jnp.all(cross >= -eps, axis=1)) | (jnp.all(cross <= eps, axis=1))

  # edge-edge crossings: quad edges vs 4 rect edges
  # rect edges: x=+rx, x=-rx (param y), y=+ry, y=-ry (param x)
  p0 = quad2d                                          # (4, 2)
  dvec = edge                                          # (4, 2)
  pts = []
  valid = []
  for axis, bound, obound in ((0, rx, ry), (1, ry, rx)):
    for sgn in (1.0, -1.0):
      denom = dvec[:, axis]
      safe = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
      t = (sgn * bound - p0[:, axis]) / safe
      pt = p0 + t[:, None] * dvec                      # (4, 2)
      other = pt[:, 1 - axis]
      ok = ((jnp.abs(denom) >= eps) & (t >= -eps) & (t <= 1 + eps)
            & (jnp.abs(other) <= obound + eps))
      pts.append(pt)
      valid.append(ok)

  all_pts = jnp.concatenate([quad2d, corners] + pts, axis=0)      # (24, 2)
  all_valid = jnp.concatenate([in_rect, in_quad] + valid, axis=0)  # (24,)
  return all_pts, all_valid


def box_box(p1, m1, s1, p2, m2, s2):
  """Box vs box; 8 contact candidates (dist, pos, normal, tangent)."""
  dtype = p1.dtype
  s1 = s1[:3]
  s2 = s2[:3]
  r = m1.T @ m2                    # box2 axes in box1 frame
  t = m1.T @ (p2 - p1)             # box2 center in box1 frame
  absr = jnp.abs(r) + 1e-8

  # ---- SAT over 15 axes (penetration = overlap; negative ⇒ separated)
  # box1 faces (axes e_i in box1 frame)
  pen_a = s1 + absr @ s2 - jnp.abs(t)                      # (3,)
  # box2 faces (axes r[:, j])
  pen_b = s2 + absr.T @ s1 - jnp.abs(r.T @ t)              # (3,)
  # edge cross products e_i × r[:, j]
  pens_e = []
  axes_e = []
  for i in range(3):
    for j in range(3):
      ax = jnp.zeros(3, dtype=dtype).at[(i + 1) % 3].set(
          -r[(i + 2) % 3, j]).at[(i + 2) % 3].set(r[(i + 1) % 3, j])
      ln = mjm.norm_safe(ax)
      axn = ax / ln
      degenerate = ln < 1e-6
      proj1 = jnp.abs(axn) @ s1
      proj2 = jnp.abs(m2.T @ (m1 @ axn)) @ s2
      pen = proj1 + proj2 - jnp.abs(jnp.dot(axn, t))
      pens_e.append(jnp.where(degenerate, _BIG, pen))
      axes_e.append(axn)
  pen_e = jnp.stack(pens_e)                                # (9,)
  axes_e = jnp.stack(axes_e)                               # (9, 3) box1 frame

  pen_faces = jnp.concatenate([pen_a, pen_b])              # (6,)
  best_face = jnp.argmin(pen_faces)
  best_face_pen = pen_faces[best_face]
  best_edge = jnp.argmin(pen_e)
  best_edge_pen = pen_e[best_edge]
  use_face = best_face_pen <= best_edge_pen * _FACE_BIAS

  # ================= face-face manifold =================
  # work in the REFERENCE box frame: if best face is on box1 use (r, t,
  # s1 ref, s2 inc); else swap roles with r' = rᵀ, t' = −rᵀt.
  face_on_1 = best_face < 3
  axis_idx = jnp.where(face_on_1, best_face, best_face - 3)

  r_sw = jnp.where(face_on_1, r, r.T)
  t_sw = jnp.where(face_on_1, t, -(r.T @ t))
  sref = jnp.where(face_on_1, s1, s2)
  sinc = jnp.where(face_on_1, s2, s1)

  # permute coordinates so the reference axis is local z
  perms = jnp.asarray(np.array([[1, 2, 0], [2, 0, 1], [0, 1, 2]]))
  perm = perms[axis_idx]                                   # (3,) u, v, w=axis
  t_p = t_sw[perm]                                         # (3,)
  r_p = r_sw[perm][:, :]                                   # rows permuted
  sref_p = sref[perm]
  sign_w = jnp.where(t_p[2] >= 0, 1.0, -1.0)               # face towards inc

  # incident box corners in reference-permuted frame
  signs = jnp.asarray(
      np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                for sz in (-1, 1)], dtype=np.float64)).astype(dtype)  # (8,3)
  corners = t_p[None, :] + (signs * sinc[None, :]) @ r_p.T           # (8, 3)

  # incident face = 4 corners with smallest w·sign_w: select via the incident
  # axis (the inc-box axis most anti-parallel to the ref normal)
  w_row = r_p[2]                                           # (3,)
  inc_axis = jnp.argmax(jnp.abs(w_row))
  inc_sign = -jnp.sign(w_row[inc_axis]) * sign_w
  keep = signs[:, inc_axis] * inc_sign > 0                 # (8,) exactly 4
  order = jnp.argsort(jnp.where(keep, 0.0, 1.0))[:4]
  quad = corners[order]                                    # (4, 3)
  # wind the quad consistently: sort by angle around its centroid
  ctr = jnp.mean(quad[:, :2], axis=0)
  ang = jnp.arctan2(quad[:, 1] - ctr[1], quad[:, 0] - ctr[0])
  quad = quad[jnp.argsort(ang)]

  cand2d, valid = _clip_candidates(sref_p[:2], quad[:, :2])  # (24,2),(24,)

  # depth of each candidate: interpolate w over the incident face plane.
  # plane through quad: w = w0 + g·(xy − xy0); fit from three verts
  e1 = quad[1] - quad[0]
  e2 = quad[2] - quad[0]
  det = e1[0] * e2[1] - e1[1] * e2[0]
  det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
  gx = (e1[2] * e2[1] - e2[2] * e1[1]) / det
  gy = (e2[2] * e1[0] - e1[2] * e2[0]) / det
  w_cand = quad[0, 2] + gx * (cand2d[:, 0] - quad[0, 0]) + gy * (
      cand2d[:, 1] - quad[0, 1])
  # separation of candidate = sign_w·w − sref_z  (negative ⇒ penetrating)
  cand_dist = sign_w * w_cand - sref_p[2]

  # keep the 8 deepest valid candidates
  score = jnp.where(valid, cand_dist, _BIG)
  top = jnp.argsort(score)[:8]
  f_dist = score[top]
  f_xy = cand2d[top]
  f_w = w_cand[top]

  # positions: midpoint between face plane and incident point along w
  f_w_mid = f_w - sign_w * 0.5 * f_dist
  f_pts_p = jnp.concatenate([f_xy, f_w_mid[:, None]], axis=-1)  # (8,3) perm
  # unpermute: local ref frame coords
  inv_perm = jnp.zeros((3,), dtype=jnp.int32).at[perm].set(
      jnp.arange(3, dtype=jnp.int32))
  f_pts_ref = f_pts_p[:, inv_perm]                         # (8, 3)

  # normal in ref frame = ±e_axis, pointing ref → incident
  n_ref_p = jnp.array([0.0, 0.0, 1.0], dtype=dtype) * sign_w
  n_ref = n_ref_p[inv_perm]

  # map to world: ref frame is box1 (face_on_1) or box2
  ref_mat = jnp.where(face_on_1, m1, m2)
  ref_pos = jnp.where(face_on_1, p1, p2)
  f_pts_world = f_pts_ref @ ref_mat.T + ref_pos[None, :]
  n_world_raw = ref_mat @ n_ref
  # convention: normal points box1 → box2
  f_normal = jnp.where(face_on_1, n_world_raw, -n_world_raw)

  # ================= edge-edge contact =================
  ei = best_edge // 3                                      # box1 edge dir
  ej = best_edge - 3 * ei                                  # box2 edge dir
  axis_e = axes_e[best_edge]                               # box1 frame
  sign_e = jnp.where(jnp.dot(axis_e, t) >= 0, 1.0, -1.0)
  axis_e = axis_e * sign_e                                 # points 1 → 2

  # supporting edge on box1: corner maximizing axis_e, free along ei
  eye = jnp.eye(3, dtype=dtype)
  sgn1 = jnp.sign(axis_e) * s1
  sgn1 = jnp.where(jnp.arange(3) == ei, 0.0, sgn1)
  c1 = sgn1                                                # box1 frame
  d1 = eye[ei]
  # supporting edge on box2 (box2 frame): minimize axis_e in box2 coords
  axis_e2 = r.T @ axis_e
  sgn2 = -jnp.sign(axis_e2) * s2
  sgn2 = jnp.where(jnp.arange(3) == ej, 0.0, sgn2)
  c2 = t + r @ sgn2                                        # box1 frame
  d2 = r[:, ej]

  # closest points between the two (infinite) edge lines
  w0 = c1 - c2
  a_ = jnp.dot(d1, d1)
  b_ = jnp.dot(d1, d2)
  c_ = jnp.dot(d2, d2)
  dd = jnp.dot(d1, w0)
  ee = jnp.dot(d2, w0)
  den = a_ * c_ - b_ * b_
  den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
  s_par = (b_ * ee - c_ * dd) / den
  t_par = (a_ * ee - b_ * dd) / den
  pe1 = c1 + s_par * d1
  pe2 = c2 + t_par * d2
  e_pos_local = 0.5 * (pe1 + pe2)
  e_dist = -best_edge_pen
  e_pos = m1 @ e_pos_local + p1
  e_normal = m1 @ axis_e

  # ================= select =================
  dist = jnp.where(use_face, f_dist, jnp.full((8,), _BIG, dtype=dtype)
                   .at[0].set(e_dist))
  pos = jnp.where(use_face, f_pts_world,
                  jnp.zeros((8, 3), dtype=dtype).at[0].set(e_pos))
  normal = jnp.where(use_face, jnp.broadcast_to(f_normal, (8, 3)),
                     jnp.broadcast_to(e_normal, (8, 3)))
  # fully separated on a face axis but edge selected etc.: dist still valid
  return dist, pos, normal, jnp.zeros_like(normal)
