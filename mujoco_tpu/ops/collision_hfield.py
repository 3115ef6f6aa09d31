"""Height-field collision: sphere/capsule vs terrain, branchless.

TPU redesign of mjc_ConvexHField
(/root/reference/src/engine/engine_collision_convex.c): instead of prism
construction + CCD per candidate cell, the collider gathers a static-size
patch of grid cells around the query point and runs an exact sphere-triangle
test against every triangle in the patch (2 per cell, the same triangulation
as mj_rayHfield, engine_ray.c:660-688), keeping the deepest contacts in
fixed slots. Elevation data is a traced array — terrain is
domain-randomizable per env.

Patch extent is sized at trace time from the nominal geometry
(put_model-time radius and grid pitch); geoms larger than the patch would
need a bigger static budget (documented cap, like max_contact_points).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.utils import math as mjm

_BIG = 1e10


def closest_pt_triangle(p, a, b, c):
  """Closest point on triangle abc to p (branchless Ericson 5.1.5)."""
  ab = b - a
  ac = c - a
  ap = p - a
  d1 = jnp.dot(ab, ap)
  d2 = jnp.dot(ac, ap)
  bp = p - b
  d3 = jnp.dot(ab, bp)
  d4 = jnp.dot(ac, bp)
  cp = p - c
  d5 = jnp.dot(ab, cp)
  d6 = jnp.dot(ac, cp)

  vc = d1 * d4 - d3 * d2
  vb = d5 * d2 - d1 * d6
  va = d3 * d6 - d5 * d4

  denom_f = jnp.maximum(va + vb + vc, mjm.MINVAL)
  v_f = vb / denom_f
  w_f = vc / denom_f
  q_face = a + ab * v_f + ac * w_f

  t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < mjm.MINVAL, 1.0,
                                 d1 - d3), 0.0, 1.0)
  q_ab = a + t_ab * ab
  t_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < mjm.MINVAL, 1.0,
                                 d2 - d6), 0.0, 1.0)
  q_ac = a + t_ac * ac
  t_bc = jnp.clip((d4 - d3) / jnp.where(
      jnp.abs((d4 - d3) + (d5 - d6)) < mjm.MINVAL, 1.0,
      (d4 - d3) + (d5 - d6)), 0.0, 1.0)
  q_bc = b + t_bc * (c - b)

  q = q_face
  # edge/vertex regions override the face solution
  in_vert_a = (d1 <= 0) & (d2 <= 0)
  in_vert_b = (d3 >= 0) & (d4 <= d3)
  in_vert_c = (d6 >= 0) & (d5 <= d6)
  in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
  in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
  in_edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
  q = jnp.where(in_edge_bc, q_bc, q)
  q = jnp.where(in_edge_ac, q_ac, q)
  q = jnp.where(in_edge_ab, q_ab, q)
  q = jnp.where(in_vert_c, c, q)
  q = jnp.where(in_vert_b, b, q)
  q = jnp.where(in_vert_a, a, q)
  return q


def _sphere_vs_patch(m: Model, hid: int, data_h, center_local, radius,
                     patch: int):
  """Sphere (local hfield frame) vs all triangles of a patch² cell window.
  Returns (dist, pos_local, normal_local) arrays over 2·patch² triangles."""
  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])
  size = m.hfield_size_np[hid]                      # static (4,)
  dx = 2.0 * size[0] / (ncol - 1)
  dy = 2.0 * size[1] / (nrow - 1)

  cu = (center_local[0] + size[0]) / dx             # continuous col
  cv = (center_local[1] + size[1]) / dy             # continuous row
  c0 = jnp.floor(cu).astype(jnp.int32) - (patch // 2 - 1)
  r0 = jnp.floor(cv).astype(jnp.int32) - (patch // 2 - 1)

  cc = c0 + jnp.arange(patch)                       # (patch,)
  rr = r0 + jnp.arange(patch)
  valid_c = (cc >= 0) & (cc <= ncol - 2)
  valid_r = (rr >= 0) & (rr <= nrow - 2)
  cc = jnp.clip(cc, 0, ncol - 2)
  rr = jnp.clip(rr, 0, nrow - 2)

  # corner elevations for all cells in the patch
  def z_at(r, c):
    return data_h[r * ncol + c] * size[2]

  r_g, c_g = jnp.meshgrid(rr, cc, indexing='ij')    # (patch, patch)
  z00 = z_at(r_g, c_g)
  z01 = z_at(r_g, c_g + 1)
  z11 = z_at(r_g + 1, c_g + 1)
  z10 = z_at(r_g + 1, c_g)
  x0 = dx * c_g - size[0]
  x1 = dx * (c_g + 1) - size[0]
  y0 = dy * r_g - size[1]
  y1 = dy * (r_g + 1) - size[1]

  def tri_pts(ax, ay, az, bx, by, bz, cx, cy, cz):
    a = jnp.stack([ax, ay, az], axis=-1).reshape(-1, 3)
    b = jnp.stack([bx, by, bz], axis=-1).reshape(-1, 3)
    c = jnp.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
    return a, b, c

  # triangle A: (c,r), (c+1,r), (c+1,r+1); B: (c,r), (c+1,r+1), (c,r+1)
  a1, b1, c1 = tri_pts(x0, y0, z00, x1, y0, z01, x1, y1, z11)
  a2, b2, c2 = tri_pts(x0, y0, z00, x1, y1, z11, x0, y1, z10)
  tri_a = jnp.concatenate([a1, a2], axis=0)         # (2·patch², 3)
  tri_b = jnp.concatenate([b1, b2], axis=0)
  tri_c = jnp.concatenate([c1, c2], axis=0)
  cell_valid = (valid_r[:, None] & valid_c[None, :]).reshape(-1)
  tri_valid = jnp.concatenate([cell_valid, cell_valid], axis=0)

  def one_tri(a, b, c, ok):
    q = closest_pt_triangle(center_local, a, b, c)
    u = center_local - q
    l = mjm.norm_safe(u)
    n_tri = mjm.normalize(jnp.cross(b - a, c - a))  # CCW → points up
    above = jnp.dot(u, n_tri) >= 0

    # separated / shallow side: closest-point distance
    dist_out = l - radius
    normal_out = u / l

    # center behind the plane: a real penetration only if the center lies
    # directly under this triangle's footprint (2D barycentric test) —
    # otherwise a neighboring triangle owns the contact
    def cross2(p0, p1, pt):
      return ((p1[0] - p0[0]) * (pt[1] - p0[1])
              - (p1[1] - p0[1]) * (pt[0] - p0[0]))
    c1 = cross2(a, b, center_local)
    c2 = cross2(b, c, center_local)
    c3 = cross2(c, a, center_local)
    eps = 1e-12
    inside_xy = ((c1 >= -eps) & (c2 >= -eps) & (c3 >= -eps)) | (
        (c1 <= eps) & (c2 <= eps) & (c3 <= eps))
    depth = jnp.dot(center_local - a, n_tri)        # negative below
    dist_in = depth - radius
    normal_in = n_tri

    dist = jnp.where(above, dist_out,
                     jnp.where(inside_xy, dist_in, _BIG))
    normal = jnp.where(above, normal_out, normal_in)
    pos = center_local - normal * (radius + dist * 0.5)
    return jnp.where(ok, dist, _BIG), pos, normal

  dists, poss, normals = jax.vmap(one_tri)(tri_a, tri_b, tri_c, tri_valid)
  return dists, poss, normals


def _topk(dists, poss, normals, k):
  order = jnp.argsort(dists)[:k]
  return dists[order], poss[order], normals[order]


def make_hfield_sphere(m: Model, hid: int, patch: int = 6, nslot: int = 3):
  """Collider fn(p1, m1, s1, p2, m2, s2) for one static hfield id."""
  adr = int(m.hfield_adr[hid])
  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])

  def collide(p1, m1, s1, p2, m2, s2):
    data_h = jax.lax.dynamic_slice(m.hfield_data, (adr,), (nrow * ncol,))
    center_local = m1.T @ (p2 - p1)
    d_, p_, n_ = _sphere_vs_patch(m, hid, data_h, center_local, s2[0], patch)
    d_, p_, n_ = _topk(d_, p_, n_, nslot)
    # back to world; normal convention hfield(geom1) → sphere(geom2)
    pos = p_ @ m1.T + p1[None, :]
    normal = n_ @ m1.T
    return d_, pos, normal, jnp.zeros_like(normal)

  return collide


def _box_samples():
  """26 unit sample points: corners, edge midpoints, face centers."""
  pts = []
  for x in (-1, 0, 1):
    for y in (-1, 0, 1):
      for z in (-1, 0, 1):
        if x == y == z == 0:
          continue
        pts.append((x, y, z))
  return np.array(pts, dtype=np.float64)


def _cylinder_samples(nang: int = 8):
  """Rim points of both caps, cap centers, side midline (unit template:
  xy scaled by size[0], z by size[1])."""
  ang = np.linspace(0, 2 * np.pi, nang, endpoint=False)
  c, s = np.cos(ang), np.sin(ang)
  pts = []
  for z in (-1.0, 1.0):
    pts += [(ci, si, z) for ci, si in zip(c, s)]
    pts.append((0.0, 0.0, z))
  pts += [(ci, si, 0.0) for ci, si in zip(c, s)]
  return np.array(pts, dtype=np.float64)


_SAMPLES_BOX = _box_samples()
_SAMPLES_CYL = _cylinder_samples()
_SAMPLES_ELL = _box_samples() / np.linalg.norm(_box_samples(), axis=1,
                                               keepdims=True)


def _points_vs_hfield(m: Model, hid: int, pts_local):
  """Family A: signed distance of points (in the hfield frame) to the
  terrain surface, measured along the normal of the triangle vertically
  below each point (same triangulation as mj_rayHfield,
  /root/reference/src/engine/engine_ray.c:660-688).

  Returns (dist, pos_local, normal_local) per point; points outside the
  grid extent are masked with _BIG."""
  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])
  adr = int(m.hfield_adr[hid])
  size = m.hfield_size_np[hid]
  dx = 2.0 * size[0] / (ncol - 1)
  dy = 2.0 * size[1] / (nrow - 1)
  data_h = jax.lax.dynamic_slice(m.hfield_data, (adr,), (nrow * ncol,))

  def one(p):
    cu = (p[0] + size[0]) / dx
    cv = (p[1] + size[1]) / dy
    c = jnp.floor(cu).astype(jnp.int32)
    r = jnp.floor(cv).astype(jnp.int32)
    valid = (c >= 0) & (c <= ncol - 2) & (r >= 0) & (r <= nrow - 2)
    c = jnp.clip(c, 0, ncol - 2)
    r = jnp.clip(r, 0, nrow - 2)
    fu = cu - c
    fv = cv - r

    def z_at(rr, cc):
      return data_h[rr * ncol + cc] * size[2]

    z00 = z_at(r, c)
    z01 = z_at(r, c + 1)
    z11 = z_at(r + 1, c + 1)
    z10 = z_at(r + 1, c)
    x0 = dx * c - size[0]
    x1 = x0 + dx
    y0 = dy * r - size[1]
    y1 = y0 + dy
    a = jnp.stack([x0, y0, z00])
    # triangle A (fv <= fu): (c,r),(c+1,r),(c+1,r+1); B: (c,r),(c+1,r+1),(c,r+1)
    in_a = fv <= fu
    b = jnp.where(in_a, jnp.stack([x1, y0, z01]), jnp.stack([x1, y1, z11]))
    cc3 = jnp.where(in_a, jnp.stack([x1, y1, z11]), jnp.stack([x0, y1, z10]))
    n = mjm.normalize(jnp.cross(b - a, cc3 - a))      # CCW → points up
    dist = jnp.dot(p - a, n)
    pos = p - n * (dist * 0.5)
    return jnp.where(valid, dist, _BIG), pos, n

  return jax.vmap(one)(pts_local)


def make_hfield_convex(m: Model, hid: int, t2: int, did2: int,
                       patch: int = 6, nslot: int = 4):
  """Hfield vs box/cylinder/ellipsoid/mesh, branchless.

  TPU redesign of the reference's hfield narrowphase (prism construction +
  CCD per candidate cell, mjc_ConvexHField,
  /root/reference/src/engine/engine_collision_convex.c): two fixed-size
  contact families evaluated in parallel and merged by deepest-K —

    A. static surface samples of the geom (box corner/edge/face lattice,
       cylinder rim/cap lattice, ellipsoid direction lattice, mesh
       vertices) tested against the terrain triangle vertically below each
       sample (exact signed distance along that triangle's normal);
    B. terrain grid vertices in a patch² window under the geom tested
       against the geom's analytic SDF (ops/sdf.py; convex meshes use the
       exact interior max-over-face-planes distance).

  Family A captures geom-into-terrain contacts (box corner on a slope);
  family B captures terrain-into-geom contacts (a bump poking a face).
  Depths at the sampled points are exact; the approximation (documented,
  ROADMAP) is that contact positions land on sample points rather than the
  reference's CCD witness points. Non-convex meshes collide as if convex
  (matching the reference's convex-hull behavior only when the mesh is its
  own hull)."""
  from mujoco_tpu.models.types import GeomType as GT
  from mujoco_tpu.ops import sdf as sdf_mod

  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])
  adr = int(m.hfield_adr[hid])
  size = m.hfield_size_np[hid]
  dx = 2.0 * size[0] / (ncol - 1)
  dy = 2.0 * size[1] / (nrow - 1)

  if t2 == GT.MESH:
    vadr = int(m.mesh_vertadr[did2])
    vnum = int(m.mesh_vertnum[did2])
    fadr = int(m.mesh_faceadr[did2])
    fnum = int(m.mesh_facenum[did2])
    faces = np.asarray(m.mesh_face[fadr:fadr + fnum]) - vadr   # (F,3) local

  def geom_samples(s2, down_l, dtype):
    """Sample points on the geom surface, geom-local frame (traced size).
    `down_l` is the terrain-down direction in the geom frame; smooth shapes
    add exact support samples toward it so the deepest contact is captured
    regardless of the static lattice resolution."""
    if t2 == GT.BOX:
      return jnp.asarray(_SAMPLES_BOX, dtype=dtype) * s2[None, :3]
    if t2 == GT.CYLINDER:
      t = jnp.asarray(_SAMPLES_CYL, dtype=dtype)
      pts = t * jnp.stack([s2[0], s2[0], s2[1]])[None, :]
      # support line toward terrain-down: radial part of down_l
      rad = down_l.at[2].set(0.0)
      rad = rad / jnp.maximum(mjm.norm_safe(rad), mjm.MINVAL)
      ts = jnp.linspace(-1.0, 1.0, 5).astype(dtype)
      line = (rad[None, :] * s2[0]
              + jnp.stack([jnp.zeros_like(ts), jnp.zeros_like(ts),
                           ts * s2[1]], axis=-1))
      return jnp.concatenate([pts, line])
    if t2 == GT.ELLIPSOID:
      pts = jnp.asarray(_SAMPLES_ELL, dtype=dtype) * s2[None, :3]
      # exact support point toward terrain-down
      sd_ = s2[:3] * down_l
      sup = s2[:3] * sd_ / jnp.maximum(mjm.norm_safe(sd_), mjm.MINVAL)
      return jnp.concatenate([pts, sup[None, :]])
    if t2 == GT.MESH:
      return jax.lax.dynamic_slice(m.mesh_vert, (vadr, 0), (vnum, 3))
    raise NotImplementedError(f"hfield vs geom type {t2}")

  def geom_sdf(lp, s2):
    """Signed distance + outward gradient of the geom at local points."""
    if t2 == GT.MESH:
      verts = jax.lax.dynamic_slice(m.mesh_vert, (vadr, 0), (vnum, 3))
      tri = verts[faces]                                # (F,3,3)
      nf = mjm.normalize(jnp.cross(tri[:, 1] - tri[:, 0],
                                   tri[:, 2] - tri[:, 0]))
      off = jnp.sum(nf * tri[:, 0], axis=-1)            # (F,)
      pd = lp @ nf.T - off[None, :]                     # (P,F)
      i = jnp.argmax(pd, axis=-1)
      return jnp.take_along_axis(pd, i[:, None], axis=-1)[:, 0], nf[i]
    fn = {GT.BOX: sdf_mod.sd_box, GT.CYLINDER: sdf_mod.sd_cylinder,
          GT.ELLIPSOID: sdf_mod.sd_ellipsoid}[GT(t2)]
    val, grad = jax.vmap(jax.value_and_grad(lambda p: fn(p, s2)))(lp)
    return val, mjm.normalize(grad)

  def collide(p1, m1, s1, p2, m2, s2):
    dtype = p1.dtype
    # terrain normal under the geom center → support direction for the
    # orientation-adaptive samples of smooth shapes
    ctr_h = (m1.T @ (p2 - p1))[None, :]
    _, _, n_ctr = _points_vs_hfield(m, hid, ctr_h)
    down_l = m2.T @ (-(m1 @ n_ctr[0]))
    # --- family A: geom samples vs terrain triangles ---
    pts_g = geom_samples(s2, down_l, dtype)             # (P,3) geom-local
    pts_w = pts_g @ m2.T + p2[None, :]
    pts_h = (pts_w - p1[None, :]) @ m1                  # hfield-local
    d_a, p_a, n_a = _points_vs_hfield(m, hid, pts_h)

    # --- family B: terrain grid vertices vs geom SDF ---
    cl = m1.T @ (p2 - p1)
    c0 = jnp.floor((cl[0] + size[0]) / dx).astype(jnp.int32) - (
        patch // 2 - 1)
    r0 = jnp.floor((cl[1] + size[1]) / dy).astype(jnp.int32) - (
        patch // 2 - 1)
    ccs = c0 + jnp.arange(patch)
    rrs = r0 + jnp.arange(patch)
    valid = ((ccs >= 0) & (ccs <= ncol - 1))[None, :] & \
            ((rrs >= 0) & (rrs <= nrow - 1))[:, None]
    ccs = jnp.clip(ccs, 0, ncol - 1)
    rrs = jnp.clip(rrs, 0, nrow - 1)
    data_h = jax.lax.dynamic_slice(m.hfield_data, (adr,), (nrow * ncol,))
    r_g, c_g = jnp.meshgrid(rrs, ccs, indexing='ij')
    gz = data_h[(r_g * ncol + c_g).reshape(-1)] * size[2]
    gx = (dx * c_g - size[0]).reshape(-1)
    gy = (dy * r_g - size[1]).reshape(-1)
    gv_h = jnp.stack([gx, gy, gz], axis=-1).astype(dtype)   # (patch²,3)
    gv_w = gv_h @ m1.T + p1[None, :]
    gv_l = (gv_w - p2[None, :]) @ m2                    # geom-local
    sd, grad_l = geom_sdf(gv_l, s2)
    grad_w = grad_l @ m2.T
    d_b = jnp.where(valid.reshape(-1), sd, _BIG)
    n_b = -grad_w                                       # hfield → geom
    p_b = gv_w - grad_w * (sd * 0.5)[:, None]

    dists = jnp.concatenate([d_a, d_b])
    poss = jnp.concatenate([p_a @ m1.T + p1[None, :], p_b])
    normals = jnp.concatenate([n_a @ m1.T, n_b])
    d_, p_, n_ = _topk(dists, poss, normals, nslot)
    return d_, p_, n_, jnp.zeros_like(n_)

  return collide


def make_hfield_capsule(m: Model, hid: int, patch: int = 6, nslot: int = 3):
  """Capsule vs hfield: sphere tests at both endpoints and the midpoint,
  keeping the best contact of each (flat-resting keeps both end contacts)."""
  adr = int(m.hfield_adr[hid])
  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])

  def collide(p1, m1, s1, p2, m2, s2):
    data_h = jax.lax.dynamic_slice(m.hfield_data, (adr,), (nrow * ncol,))
    axis = m2[:, 2]
    outs = []
    for t in (-1.0, 0.0, 1.0):
      center = p2 + axis * (t * s2[1])
      center_local = m1.T @ (center - p1)
      d_, p_, n_ = _sphere_vs_patch(m, hid, data_h, center_local, s2[0],
                                    patch)
      d1, p1_, n1 = _topk(d_, p_, n_, 1)
      outs.append((d1, p1_, n1))
    d_ = jnp.concatenate([o[0] for o in outs])
    p_ = jnp.concatenate([o[1] for o in outs])
    n_ = jnp.concatenate([o[2] for o in outs])
    pos = p_ @ m1.T + p1[None, :]
    normal = n_ @ m1.T
    return d_, pos, normal, jnp.zeros_like(normal)

  return collide
