"""Ray casting: ray vs primitive geoms, batched and branchless.

Behavioral counterpart of /root/reference/src/engine/engine_ray.c
(ray_plane:204, ray_sphere:242, ray_capsule:272, ray_ellipsoid:358,
ray_cylinder:401, ray_box:490, mju_rayGeom:972, mj_ray:1305), redesigned
without early-outs: every intersection candidate is computed unconditionally
and masked, so a whole geom set evaluates as one fused vectorized block.

Convention: "no hit" is jnp.inf internally (clean min-reductions); the
public ``ray`` entry converts to the reference's -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, GeomType, Model
from mujoco_tpu.utils import math as mjm

_INF = jnp.inf


def _ray_map(pos, mat, pnt, vec):
  """Express ray in the geom's local frame (ray_map, engine_ray.c:37)."""
  lpnt = (pnt - pos) @ mat          # mat^T @ (pnt - pos), mat cols = axes
  lvec = vec @ mat
  return lpnt, lvec


def _ray_quad(a, b, c):
  """Smallest non-negative root of a x² + 2 b x + c = 0, else inf
  (ray_quad, engine_ray.c:103)."""
  det = b * b - a * c
  ok = det >= mjm.MINVAL
  sdet = jnp.sqrt(jnp.where(ok, det, 1.0))
  a_safe = jnp.where(jnp.abs(a) < mjm.MINVAL, 1.0, a)
  x0 = (-b - sdet) / a_safe
  x1 = (-b + sdet) / a_safe
  x0 = jnp.where(x0 >= 0, x0, _INF)
  x1 = jnp.where(x1 >= 0, x1, _INF)
  x = jnp.minimum(x0, x1)
  return jnp.where(ok & (jnp.abs(a) >= mjm.MINVAL), x, _INF)


def ray_plane(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  facing = lvec[2] < -mjm.MINVAL
  x = -lpnt[2] / jnp.where(facing, lvec[2], -1.0)
  p0 = lpnt[0] + x * lvec[0]
  p1 = lpnt[1] + x * lvec[1]
  in0 = (size[0] <= 0) | (jnp.abs(p0) <= size[0])
  in1 = (size[1] <= 0) | (jnp.abs(p1) <= size[1])
  ok = facing & (x >= 0) & in0 & in1
  return jnp.where(ok, x, _INF)


def _ray_sphere_at(center, r2, pnt, vec):
  dif = pnt - center
  a = jnp.dot(vec, vec)
  b = jnp.dot(vec, dif)
  c = jnp.dot(dif, dif) - r2
  return _ray_quad(a, b, c)


def ray_sphere(pos, mat, size, pnt, vec):
  return _ray_sphere_at(pos, size[0] * size[0], pnt, vec)


def ray_capsule(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  # round side, constrained between the flat caps
  a = lvec[0] ** 2 + lvec[1] ** 2
  b = lvec[0] * lpnt[0] + lvec[1] * lpnt[1]
  c = lpnt[0] ** 2 + lpnt[1] ** 2 - size[0] ** 2
  x_cyl = _ray_quad(a, b, c)
  z = lpnt[2] + x_cyl * lvec[2]
  x_cyl = jnp.where(jnp.abs(z) <= size[1], x_cyl, _INF)

  # caps: sphere at ±size[1], accepting only the outer hemisphere
  def cap(sign):
    dif = lpnt - jnp.array([0.0, 0.0, sign * size[1]], dtype=lpnt.dtype)
    a_ = jnp.dot(lvec, lvec)
    b_ = jnp.dot(lvec, dif)
    c_ = jnp.dot(dif, dif) - size[0] ** 2
    det = b_ * b_ - a_ * c_
    ok = det >= mjm.MINVAL
    sdet = jnp.sqrt(jnp.where(ok, det, 1.0))
    a_safe = jnp.where(jnp.abs(a_) < mjm.MINVAL, 1.0, a_)
    best = _INF
    for root_sign in (-1.0, 1.0):
      xx = (-b_ + root_sign * sdet) / a_safe
      zz = lpnt[2] + xx * lvec[2]
      good = ok & (xx >= 0) & (sign * zz >= size[1])
      best = jnp.minimum(best, jnp.where(good, xx, _INF))
    return best

  return jnp.minimum(x_cyl, jnp.minimum(cap(1.0), cap(-1.0)))


def ray_ellipsoid(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  s = 1.0 / jnp.maximum(size * size, mjm.MINVAL)
  a = jnp.sum(s * lvec * lvec)
  b = jnp.sum(s * lvec * lpnt)
  c = jnp.sum(s * lpnt * lpnt) - 1.0
  return _ray_quad(a, b, c)


def ray_cylinder(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  best = _INF
  # flat sides
  safe_vz = jnp.where(jnp.abs(lvec[2]) > mjm.MINVAL, lvec[2], 1.0)
  for side in (-1.0, 1.0):
    sol = (side * size[1] - lpnt[2]) / safe_vz
    p0 = lpnt[0] + sol * lvec[0]
    p1 = lpnt[1] + sol * lvec[1]
    ok = ((jnp.abs(lvec[2]) > mjm.MINVAL) & (sol >= 0)
          & (p0 * p0 + p1 * p1 <= size[0] ** 2))
    best = jnp.minimum(best, jnp.where(ok, sol, _INF))
  # round side
  a = lvec[0] ** 2 + lvec[1] ** 2
  b = lvec[0] * lpnt[0] + lvec[1] * lpnt[1]
  c = lpnt[0] ** 2 + lpnt[1] ** 2 - size[0] ** 2
  x_round = _ray_quad(a, b, c)
  z = lpnt[2] + x_round * lvec[2]
  best = jnp.minimum(best, jnp.where(jnp.abs(z) <= size[1], x_round, _INF))
  return best


def ray_box(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  best = _INF
  other = np.array([[1, 2], [0, 2], [0, 1]])
  for i in range(3):
    safe_v = jnp.where(jnp.abs(lvec[i]) > mjm.MINVAL, lvec[i], 1.0)
    for side in (-1.0, 1.0):
      sol = (side * size[i] - lpnt[i]) / safe_v
      j, k = other[i]
      p0 = lpnt[j] + sol * lvec[j]
      p1 = lpnt[k] + sol * lvec[k]
      ok = ((jnp.abs(lvec[i]) > mjm.MINVAL) & (sol >= 0)
            & (jnp.abs(p0) <= size[j]) & (jnp.abs(p1) <= size[k]))
      best = jnp.minimum(best, jnp.where(ok, sol, _INF))
  return best


def _ray_triangles(lpnt, lvec, v0, v1, v2):
  """Batched Möller–Trumbore ray-triangle: min distance over all triangles
  (the branchless all-triangle analog of mj_rayMesh's BVH walk,
  engine_ray.c:952). v0/v1/v2: (F, 3) in the local frame."""
  e1 = v1 - v0
  e2 = v2 - v0
  h = jnp.cross(lvec[None, :], e2)
  a = jnp.sum(e1 * h, axis=-1)
  safe_a = jnp.where(jnp.abs(a) > mjm.MINVAL, a, 1.0)
  s = lpnt[None, :] - v0
  u = jnp.sum(s * h, axis=-1) / safe_a
  q = jnp.cross(s, e1)
  v = jnp.sum(lvec[None, :] * q, axis=-1) / safe_a
  t = jnp.sum(e2 * q, axis=-1) / safe_a
  ok = ((jnp.abs(a) > mjm.MINVAL) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t >= 0))
  return jnp.min(jnp.where(ok, t, _INF))


def make_ray_mesh(m, meshid: int):
  """Ray collider for one static mesh id (mj_rayMesh, engine_ray.c:952):
  all-triangle test in the geom frame."""
  vadr = int(m.mesh_vertadr[meshid])
  fadr = int(m.mesh_faceadr[meshid])
  fnum = int(m.mesh_facenum[meshid])
  faces = m.mesh_face[fadr:fadr + fnum] + vadr   # (F, 3) global vert rows

  def fn(pos, mat, size, pnt, vec):
    lpnt, lvec = _ray_map(pos, mat, pnt, vec)
    v0 = m.mesh_vert[faces[:, 0]]
    v1 = m.mesh_vert[faces[:, 1]]
    v2 = m.mesh_vert[faces[:, 2]]
    return _ray_triangles(lpnt, lvec, v0, v1, v2)
  return fn


def make_ray_hfield(m, hid: int):
  """Ray collider for one static hfield id (mj_rayHfield, engine_ray.c:562):
  all grid triangles + the four base prism side/bottom quads are tested
  branchlessly (no grid traversal — fixed shapes)."""
  adr = int(m.hfield_adr[hid])
  nrow = int(m.hfield_nrow[hid])
  ncol = int(m.hfield_ncol[hid])
  size = m.hfield_size_np[hid]                    # (4,) static

  xs = np.linspace(-size[0], size[0], ncol)
  ys = np.linspace(-size[1], size[1], nrow)
  r, c = np.meshgrid(np.arange(nrow - 1), np.arange(ncol - 1), indexing="ij")
  r = r.ravel()
  c = c.ravel()

  def fn(pos, mat, gsize, pnt, vec):
    lpnt, lvec = _ray_map(pos, mat, pnt, vec)
    data = jax.lax.dynamic_slice(m.hfield_data, (adr,),
                                 (nrow * ncol,)).reshape(nrow, ncol)
    z = data * size[2]
    def corner(rr, cc):
      return jnp.stack([jnp.asarray(xs[cc], dtype=lpnt.dtype),
                        jnp.asarray(ys[rr], dtype=lpnt.dtype),
                        z[rr, cc]], axis=-1)
    p00 = corner(r, c)
    p01 = corner(r, c + 1)
    p10 = corner(r + 1, c)
    p11 = corner(r + 1, c + 1)
    # cell diagonal (c,r)→(c+1,r+1), matching the collision triangulation:
    # triangle A (p00, p01, p11), triangle B (p00, p11, p10)
    v0 = jnp.concatenate([p00, p00])
    v1 = jnp.concatenate([p01, p11])
    v2 = jnp.concatenate([p11, p10])
    best = _ray_triangles(lpnt, lvec, v0, v1, v2)
    # base box sides/bottom (depth size[3])
    base_size = jnp.asarray([size[0], size[1], size[3] * 0.5],
                            dtype=lpnt.dtype)
    shift = jnp.asarray([0.0, 0.0, -size[3] * 0.5], dtype=lpnt.dtype)
    eye = jnp.eye(3, dtype=lpnt.dtype)
    b = ray_box(shift, eye, base_size, lpnt, lvec)
    return jnp.minimum(best, b)
  return fn


_RAY_FUNC = {
    int(GeomType.PLANE): ray_plane,
    int(GeomType.SPHERE): ray_sphere,
    int(GeomType.CAPSULE): ray_capsule,
    int(GeomType.ELLIPSOID): ray_ellipsoid,
    int(GeomType.CYLINDER): ray_cylinder,
    int(GeomType.BOX): ray_box,
}


def ray_geom(pos, mat, size, pnt, vec, geomtype: int):
  """Ray vs one geom of static type (mju_rayGeom, engine_ray.c:972).
  Returns distance or inf."""
  fn = _RAY_FUNC.get(int(geomtype))
  if fn is None:
    raise NotImplementedError(f"ray vs geom type {geomtype}")
  return fn(pos, mat, size, pnt, vec)


def ray(m: Model, d: Data, pnt, vec, geomgroup=None, flg_static: bool = True,
        bodyexclude: int = -1):
  """Ray vs all geoms (mj_ray, engine_ray.c:1305): returns (dist, geomid)
  with dist = -1 / geomid = -1 when nothing is hit.

  Static geom-type dispatch; the whole scene evaluates branchlessly.
  geomgroup/flg_static filtering uses static model metadata; geomgroup is a
  sequence of per-group enables indexed by clamped geom_group (mj_ray's
  geomgroup filter, engine_ray.c:1305).
  """
  dtype = d.qpos.dtype
  dists = jnp.full((m.ngeom,), _INF, dtype=dtype)
  for g in range(m.ngeom):
    t = int(m.geom_type[g])
    if t not in _RAY_FUNC and t not in (int(GeomType.MESH),
                                        int(GeomType.HFIELD)):
      continue
    if bodyexclude >= 0 and int(m.geom_bodyid[g]) == bodyexclude:
      continue
    if not flg_static and int(m.body_weldid[m.geom_bodyid[g]]) == 0:
      continue
    if geomgroup is not None:
      grp = min(max(int(m.geom_group[g]), 0), len(geomgroup) - 1)
      if not geomgroup[grp]:
        continue
    if t == int(GeomType.MESH):
      fn = make_ray_mesh(m, int(m.geom_dataid[g]))
    elif t == int(GeomType.HFIELD):
      fn = make_ray_hfield(m, int(m.geom_dataid[g]))
    else:
      fn = _RAY_FUNC[t]
    x = fn(d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g], pnt, vec)
    dists = dists.at[g].set(x)
  geomid = jnp.argmin(dists)
  best = dists[geomid]
  hit = jnp.isfinite(best)
  return jnp.where(hit, best, -1.0), jnp.where(hit, geomid, -1)


def multi_ray(m: Model, d: Data, pnt, vecs, **kw):
  """Batched rays from one origin (mj_multiRay, engine_ray.c): vecs (n, 3).
  Returns (dists (n,), geomids (n,))."""
  import jax
  return jax.vmap(lambda v: ray(m, d, pnt, v, **kw))(vecs)


def ray_flex(m: Model, d: Data, flexid: int, pnt, vec, flex_layer: int = 0,
             flg_vert: bool = False, flg_edge: bool = True,
             flg_face: bool = True, flg_skin: bool = True):
  """Ray vs one flex (mj_rayFlex, engine_ray.c:1002): nearest distance and
  the nearest LOCAL vertex id, (-1.0, -1) on miss. Default flags match the
  mjVisual flex defaults (skin faces + edges, no vertex spheres). The
  per-candidate tables are static; poses are traced — one fused gather
  instead of the reference's per-primitive loop."""
  flx = m.flx
  dim = int(flx.dim[flexid])
  vadr = int(flx.vertadr[flexid])
  vnum = int(flx.vertnum[flexid])
  radius = m.flex_radius[flexid].astype(d.qpos.dtype)
  pnt = jnp.asarray(pnt, dtype=d.qpos.dtype)
  vec = jnp.asarray(vec, dtype=d.qpos.dtype)
  verts = d.flexvert_xpos[vadr:vadr + vnum]             # (vnum, 3)

  dists = []
  vids = []

  # element faces: dim-2 elements are triangles; dim-3 surface faces come
  # from layer-filtered tets (skin: layer 0; else the requested layer)
  if dim > 1 and (flg_face or flg_skin):
    eadr, enum_ = int(flx.elemadr[flexid]), int(flx.elemnum[flexid])
    tris = []
    for e in range(eadr, eadr + enum_):
      if dim == 3:
        lay = int(flx.elem_layer[e])
        if (flg_skin and lay > 0) or (not flg_skin and lay != flex_layer):
          continue
      ev = flx.elem[e]
      combos = ([(0, 1, 2)] if dim == 2
                else [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)])
      for c in combos:
        tris.append([ev[c[0]] - vadr, ev[c[1]] - vadr,
                     ev[c[2]] - vadr])
    if tris:
      t = np.asarray(tris, dtype=np.int32)
      v0, v1, v2 = verts[t[:, 0]], verts[t[:, 1]], verts[t[:, 2]]
      # Möller–Trumbore per triangle (keep per-candidate distances: the
      # nearest-vertex id depends on which triangle wins)
      e1, e2 = v1 - v0, v2 - v0
      h = jnp.cross(vec[None, :], e2)
      a = jnp.sum(e1 * h, axis=-1)
      f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / a, 0.0)
      s = pnt[None, :] - v0
      u = f * jnp.sum(s * h, axis=-1)
      q = jnp.cross(s, e1)
      vv = f * jnp.sum(vec[None, :] * q, axis=-1)
      tt = f * jnp.sum(e2 * q, axis=-1)
      ok = ((jnp.abs(a) > 1e-12) & (u >= 0) & (vv >= 0)
            & (u + vv <= 1) & (tt >= 0))
      dist = jnp.where(ok, tt, jnp.inf)
      hitp = pnt[None, :] + dist[:, None] * vec[None, :]
      dv = jnp.stack([mjm_norm(hitp - verts[t[:, k]]) for k in range(3)],
                     axis=-1)
      nearest = jnp.argmin(dv, axis=-1)
      vid = jnp.asarray(t)[jnp.arange(t.shape[0]), nearest]
      dists.append(dist)
      vids.append(vid)

  # edges as capsules
  if flg_edge or (dim > 1 and flg_skin):
    eadr, en = int(flx.edgeadr[flexid]), int(flx.edgenum[flexid])
    ed = flx.edge[eadr:eadr + en] - vadr                # (en, 2) local
    p1, p2 = verts[ed[:, 0]], verts[ed[:, 1]]
    seg = p2 - p1
    L = jnp.maximum(jnp.sqrt(jnp.sum(seg ** 2, -1)), 1e-15)
    z = seg / L[:, None]
    # any orthonormal frame with z along the segment (capsules are
    # axisymmetric)
    alt = jnp.where(jnp.abs(z[:, :1]) < 0.9,
                    jnp.tile(jnp.array([1.0, 0, 0], dtype=z.dtype),
                             (z.shape[0], 1)),
                    jnp.tile(jnp.array([0.0, 1, 0], dtype=z.dtype),
                             (z.shape[0], 1)))
    x = jnp.cross(alt, z)
    x = x / jnp.maximum(jnp.sqrt(jnp.sum(x ** 2, -1, keepdims=True)),
                        1e-15)
    y = jnp.cross(z, x)
    mat = jnp.stack([x, y, z], axis=-1)                 # (en, 3, 3)
    pos = 0.5 * (p1 + p2)
    size = jnp.stack([jnp.full(en, radius), 0.5 * L,
                      jnp.zeros(en)], axis=-1)
    dist = jax.vmap(lambda P, M, S: ray_capsule(P, M, S, pnt, vec))(
        pos, mat, size)
    dist = jnp.where(jnp.isfinite(dist) & (dist >= 0), dist, jnp.inf)
    hitp = pnt[None, :] + dist[:, None] * vec[None, :]
    near0 = mjm_norm(hitp - p1) < mjm_norm(hitp - p2)
    vid = jnp.where(near0, jnp.asarray(ed[:, 0]), jnp.asarray(ed[:, 1]))
    dists.append(dist)
    vids.append(vid)

  # vertex spheres
  elif flg_vert:
    r2 = radius * radius
    dist = jax.vmap(lambda c: _ray_sphere_at(c, r2, pnt, vec))(verts)
    dist = jnp.where(jnp.isfinite(dist) & (dist >= 0), dist, jnp.inf)
    dists.append(dist)
    vids.append(jnp.arange(vnum, dtype=jnp.int32))

  if not dists:
    return (jnp.asarray(-1.0, dtype=d.qpos.dtype),
            jnp.asarray(-1, dtype=jnp.int32))
  alld = jnp.concatenate(dists)
  allv = jnp.concatenate([v.astype(jnp.int32) for v in vids])
  best = jnp.argmin(alld)
  hit = jnp.isfinite(alld[best])
  return (jnp.where(hit, alld[best], -1.0),
          jnp.where(hit, allv[best], -1))


def mjm_norm(x):
  return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1), 1e-30))


def ray_skin(m: Model, d: Data, skinid: int, pnt, vec, skinvert=None):
  """Ray vs one posed skin (mju_raySkin, engine_ray.c:1191): nearest
  distance and nearest local vertex id, (-1.0, -1) on miss. Vertices come
  from ops/skin.skin_update (pass `skinvert` to reuse a computed table)."""
  if skinvert is None:
    from mujoco_tpu.ops.skin import skin_update
    skinvert, _ = skin_update(m, d)
  va, vn = int(m.skin_vertadr[skinid]), int(m.skin_vertnum[skinid])
  fa, fn = int(m.skin_faceadr[skinid]), int(m.skin_facenum[skinid])
  verts = skinvert[va:va + vn]
  faces = np.asarray(m.skin_face[fa:fa + fn], dtype=np.int32)
  pnt = jnp.asarray(pnt, dtype=verts.dtype)
  vec = jnp.asarray(vec, dtype=verts.dtype)
  v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
  e1, e2 = v1 - v0, v2 - v0
  h = jnp.cross(vec[None, :], e2)
  a = jnp.sum(e1 * h, axis=-1)
  f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / a, 0.0)
  s = pnt[None, :] - v0
  u = f * jnp.sum(s * h, axis=-1)
  q = jnp.cross(s, e1)
  vv = f * jnp.sum(vec[None, :] * q, axis=-1)
  tt = f * jnp.sum(e2 * q, axis=-1)
  ok = ((jnp.abs(a) > 1e-12) & (u >= 0) & (vv >= 0)
        & (u + vv <= 1) & (tt >= 0))
  dist = jnp.where(ok, tt, jnp.inf)
  best = jnp.argmin(dist)
  facesj = jnp.asarray(faces)
  hitp = pnt + dist[best] * vec
  dv = jnp.stack([mjm_norm(hitp - verts[facesj[best, k]])
                  for k in range(3)])
  vid = facesj[best][jnp.argmin(dv)]
  hit = jnp.isfinite(dist[best])
  return (jnp.where(hit, dist[best], -1.0),
          jnp.where(hit, vid, -1).astype(jnp.int32))
