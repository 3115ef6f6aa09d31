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
    if t not in _RAY_FUNC:
      continue
    if bodyexclude >= 0 and int(m.geom_bodyid[g]) == bodyexclude:
      continue
    if not flg_static and int(m.body_weldid[m.geom_bodyid[g]]) == 0:
      continue
    if geomgroup is not None:
      grp = min(max(int(m.geom_group[g]), 0), len(geomgroup) - 1)
      if not geomgroup[grp]:
        continue
    x = _RAY_FUNC[t](d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g], pnt, vec)
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
