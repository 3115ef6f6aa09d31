"""Analytic signed distance functions for primitive geoms.

Counterpart of the reference's SDF machinery
(/root/reference/src/engine/engine_collision_sdf.c: geomDistance:234,
radialField3d:200): exact signed distances in the geom's local frame,
negative inside. Consumed by the tactile sensor (taxel penetration depths)
and usable for SDF-style collision queries. All functions are batched over
points: x has shape (..., 3).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import GeomType
from mujoco_tpu.utils import math as mjm


def sd_plane(x, size):
  return x[..., 2]


def sd_sphere(x, size):
  return mjm.norm_safe(x) - size[0]


def sd_capsule(x, size):
  z = x[..., 2] - jnp.clip(x[..., 2], -size[1], size[1])
  a = jnp.stack([x[..., 0], x[..., 1], z], axis=-1)
  return mjm.norm_safe(a) - size[0]


def sd_cylinder(x, size):
  a0 = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-30) - size[0]
  a1 = jnp.abs(x[..., 2]) - size[1]
  b = jnp.stack([jnp.maximum(a0, 0.0), jnp.maximum(a1, 0.0)], axis=-1)
  return (jnp.minimum(jnp.maximum(a0, a1), 0.0)
          + jnp.sqrt(jnp.sum(b * b, axis=-1) + 1e-30))


def sd_ellipsoid(x, size):
  """First-order ellipsoid distance bound (geomDistance mjGEOM_ELLIPSOID)."""
  a = x / size[:3]
  b = a / size[:3]
  k0 = mjm.norm_safe(a)
  k1 = jnp.maximum(mjm.norm_safe(b), mjm.MINVAL)
  return k0 * (k0 - 1.0) / k1


def sd_box(x, size):
  """Exact outside; inside uses the reference's rotating radial field
  (geomDistance mjGEOM_BOX + radialField3d)."""
  a = jnp.abs(x) - size[:3]
  outside = jnp.any(a >= 0, axis=-1)
  b = jnp.maximum(a, 0.0)
  d_out = mjm.norm_safe(b) + jnp.minimum(jnp.max(a, axis=-1), 0.0)

  field = -size[:3] / jnp.minimum(a, -mjm.MINVAL)      # a < 0 inside
  field = field / jnp.maximum(mjm.norm_safe(field)[..., None], mjm.MINVAL)
  field = jnp.where(x < 0, -field, field)
  t = -a / jnp.maximum(jnp.abs(field), mjm.MINVAL)
  d_in = -jnp.min(t, axis=-1) * mjm.norm_safe(field)
  return jnp.where(outside, d_out, d_in)


_SDF = {
    int(GeomType.PLANE): sd_plane,
    int(GeomType.SPHERE): sd_sphere,
    int(GeomType.CAPSULE): sd_capsule,
    int(GeomType.CYLINDER): sd_cylinder,
    int(GeomType.ELLIPSOID): sd_ellipsoid,
    int(GeomType.BOX): sd_box,
}


# ---------------------------------------------------------------------------
# Analytic gradients matching the reference's geomGradient
# (engine_collision_sdf.c:295): NOT everywhere the true distance gradient
# (box/cylinder interiors use a rotating radial field), so jax.grad of the
# distance is deliberately not used for primitives.

def gd_plane(x, size):
  g = jnp.zeros_like(x)
  return g.at[..., 2].set(1.0)


def gd_sphere(x, size):
  return x / mjm.norm_safe(x)[..., None]


def gd_capsule(x, size):
  z = x[..., 2] - jnp.clip(x[..., 2], -size[1], size[1])
  a = jnp.stack([x[..., 0], x[..., 1], z], axis=-1)
  return a / mjm.norm_safe(a)[..., None]


def gd_cylinder(x, size):
  c = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-30)
  e = jnp.abs(x[..., 2])
  a0 = c - size[0]
  a1 = e - size[1]
  grada = jnp.stack([x[..., 0] / jnp.maximum(c, mjm.MINVAL),
                     x[..., 1] / jnp.maximum(c, mjm.MINVAL),
                     x[..., 2] / jnp.maximum(e, mjm.MINVAL)], axis=-1)
  radial = a0 > a1
  g_in = jnp.where(radial[..., None],
                   grada * jnp.array([1.0, 1.0, 0.0]),
                   grada * jnp.array([0.0, 0.0, 1.0]))
  b0 = jnp.maximum(a0, 0.0)
  b1 = jnp.maximum(a1, 0.0)
  bnorm = jnp.maximum(jnp.sqrt(b0 ** 2 + b1 ** 2 + 1e-30), mjm.MINVAL)
  g_out = grada * jnp.stack([b0 / bnorm, b0 / bnorm, b1 / bnorm], axis=-1)
  inside = jnp.maximum(a0, a1) < 0
  return jnp.where(inside[..., None], g_in, g_out)


def gd_ellipsoid(x, size):
  a = x / size[:3]
  b = a / size[:3]
  k0 = mjm.norm_safe(a)
  k1 = jnp.maximum(mjm.norm_safe(b), mjm.MINVAL)
  inv_k0 = 1.0 / jnp.maximum(k0, mjm.MINVAL)
  inv_k1 = 1.0 / k1
  gk0 = b * inv_k0[..., None]
  gk1 = b * inv_k1[..., None] / (size[:3] ** 2)
  df_dk0 = (2.0 * k0 - 1.0) * inv_k1
  df_dk1 = k0 * (k0 - 1.0) * inv_k1 * inv_k1
  g = gk0 * df_dk0[..., None] - gk1 * df_dk1[..., None]
  return g / mjm.norm_safe(g)[..., None]


def gd_box(x, size):
  a = jnp.abs(x) - size[:3]
  inside = jnp.max(a, axis=-1) < 0
  # interior: rotating radial field (radialField3d)
  field = -size[:3] / jnp.minimum(a, -mjm.MINVAL)
  field = field / jnp.maximum(mjm.norm_safe(field)[..., None], mjm.MINVAL)
  g_in = jnp.where(x < 0, -field, field)
  # exterior: normalized positive-part vector with per-axis sign
  b = jnp.maximum(a, 0.0)
  c = jnp.maximum(mjm.norm_safe(b), mjm.MINVAL)
  g_out = jnp.where(a > 0, b / c[..., None] * jnp.sign(x), 0.0)
  return jnp.where(inside[..., None], g_in, g_out)


_GRAD = {
    int(GeomType.PLANE): gd_plane,
    int(GeomType.SPHERE): gd_sphere,
    int(GeomType.CAPSULE): gd_capsule,
    int(GeomType.CYLINDER): gd_cylinder,
    int(GeomType.ELLIPSOID): gd_ellipsoid,
    int(GeomType.BOX): gd_box,
}


# ---------------------------------------------------------------------------
# Plugin SDF shapes (reference: /root/reference/plugin/sdf/{torus,bolt,nut,
# bowl,gear}.cc — re-derived from the published shadertoy/iquilezles
# formulas the plugins themselves cite). `params` are the plugin config
# attributes in declaration order; gradients come from jax.grad (the torus
# plugin's analytic gradient equals it; nut/bolt/gear use finite differences
# in the reference, which jax.grad matches to FD error).

_SQRT12 = float(np.sqrt(2.0) / 2.0)


def _fract(x):
  return x - jnp.floor(x)


def sd_torus(x, params):
  r1, r2 = params[0], params[1]
  q = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-30) - r1
  return jnp.sqrt(q * q + x[..., 2] ** 2 + 1e-30) - r2


def _hex_head(x, radius):
  """Hex head + rounding cones shared by bolt/nut (plugin/sdf/bolt.cc:49)."""
  k = 6.0 / jnp.pi / 2.0
  angle = -jnp.floor(jnp.arctan2(x[..., 1], x[..., 0]) * k + 0.5) / k
  s0 = jnp.sin(angle)
  s1 = jnp.sin(angle + jnp.pi * 0.5)
  px = s1 * x[..., 0] - s0 * x[..., 1]
  head = px - 0.5
  head = jnp.maximum(head, jnp.abs(x[..., 2] + 0.25) - 0.25)
  head = jnp.maximum(head, (x[..., 2] + radius - 0.22) * _SQRT12)
  return head


def _thread(x, radius0, screw=12.0):
  rad = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-30) - radius0
  azimuth = jnp.arctan2(x[..., 1], x[..., 0])
  triangle = jnp.abs(
      _fract(x[..., 2] * screw - azimuth / jnp.pi / 2.0) - 0.5)
  return rad, (rad - triangle / screw) * _SQRT12


def sd_bolt(x, params):
  rad, thread = _thread(x, params[0])
  bolt = jnp.maximum(thread, -(0.5 - jnp.abs(x[..., 2] + 0.5)))
  cone = (x[..., 2] - rad) * _SQRT12
  bolt = jnp.maximum(bolt, -(cone + 1.0 * _SQRT12))
  return jnp.minimum(bolt, _hex_head(x, rad))


def sd_nut(x, params):
  rad, thread = _thread(x, params[0])
  cone = (x[..., 2] - rad) * _SQRT12
  hole = jnp.maximum(thread, -(cone + 0.5 * _SQRT12))
  hole = jnp.minimum(hole, -cone - 0.05 * _SQRT12)
  return jnp.maximum(_hex_head(x, rad), -hole)


def sd_bowl(x, params):
  height, radius, thick = params[0], params[1], params[2]
  width = jnp.sqrt(jnp.maximum(radius * radius - height * height, 1e-30))
  q0 = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-30)
  q1 = x[..., 2]
  d_cut = jnp.sqrt((q0 - width) ** 2 + (q1 - height) ** 2 + 1e-30)
  d_shell = jnp.abs(jnp.sqrt(q0 * q0 + q1 * q1 + 1e-30) - radius)
  return jnp.where(height * q0 < width * q1, d_cut, d_shell) - thick


def sd_gear(x, params):
  """Involute gear (plugin/sdf/gear.cc distance2D + extrusion)."""
  alpha, D, N, depth, innerd = (params[0], params[1], params[2], params[3],
                                params[4])
  psi = 3.096e-5 * N * N - 6.557e-3 * N + 0.551
  R = D / 2.0
  rho = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-30)
  Pd = N / D
  P = jnp.pi / Pd
  a = 1.0 / Pd
  Ro = (D + 2.0 * a) / 2.0
  h = 2.2 / Pd
  innerR = jnp.where(innerd >= 0.0, innerd / 2.0, Ro - h - 0.14 * D)

  Rb = D * jnp.cos(psi) / 2.0
  fi = jnp.arctan2(x[..., 1], x[..., 0]) + alpha
  stride = P / R
  inv_alpha = jnp.arccos(jnp.clip(Rb / R, -1.0, 1.0))
  inv_phi = jnp.tan(inv_alpha) - inv_alpha
  shift = stride / 2.0 - 2.0 * inv_phi

  def _mod(v, y):
    return v - y * jnp.floor(v / y)

  fia = _mod(fi + shift / 2.0, stride) - shift / 2.0
  fib = _mod(-fi - shift + shift / 2.0, stride) - shift / 2.0

  safe_rho = jnp.maximum(rho, Rb * (1 + 1e-12))
  acos_rb = jnp.arccos(jnp.clip(Rb / safe_rho, -1.0, 1.0))
  ta = jnp.sqrt(jnp.maximum(safe_rho ** 2 - Rb ** 2, 1e-30))
  dista = jnp.where(Rb < rho, ta - Rb * (fia + acos_rb), -1.0e6)
  distb = jnp.where(Rb < rho, ta - Rb * (fib + acos_rb), -1.0e6)

  gear_outer = rho - Ro
  gear_lowbase = rho - (Ro - h)
  crown_base = rho - innerR

  def _smooth_union(aa, bb, k):
    hh = jnp.clip(0.5 + 0.5 * (bb - aa) / k, 0.0, 1.0)
    return bb * (1.0 - hh) + aa * hh - k * hh * (1.0 - hh)

  def _smooth_intersection(aa, bb, k):
    return jnp.maximum(jnp.maximum(aa, bb),
                       -_smooth_union(jnp.maximum(aa, -bb),
                                      jnp.maximum(bb, -aa), k))

  cogs = jnp.maximum(dista, distb)
  base_walls = jnp.maximum(fia - (stride - shift), fib - (stride - shift))
  cogs = jnp.maximum(base_walls, cogs)
  cogs = _smooth_intersection(gear_outer, cogs, 0.0035 * D)
  cogs = _smooth_union(gear_lowbase, cogs, Rb - Ro + h)
  cogs = jnp.maximum(cogs, -crown_base)
  d2d = jnp.where(innerR - rho > 0.0, innerR - rho,
                  jnp.where(Ro - rho < -0.2, rho - Ro, cogs))
  # extrusion along z
  w0 = d2d
  w1 = jnp.abs(x[..., 2]) - depth / 2.0
  w0p = jnp.maximum(w0, 0.0)
  w1p = jnp.maximum(w1, 0.0)
  return (jnp.minimum(jnp.maximum(w0, w1), 0.0)
          + jnp.sqrt(w0p ** 2 + w1p ** 2 + 1e-30))


# plugin name → (distance fn, attribute names in order, defaults)
PLUGIN_SDF = {
    "mujoco.sdf.torus": (sd_torus, ("radius1", "radius2"), (0.35, 0.15)),
    "mujoco.sdf.bolt": (sd_bolt, ("radius",), (0.26,)),
    "mujoco.sdf.nut": (sd_nut, ("radius",), (0.26,)),
    "mujoco.sdf.bowl": (sd_bowl, ("height", "radius", "thickness"),
                        (0.4, 1.0, 0.02)),
    "mujoco.sdf.gear": (sd_gear, ("alpha", "diameter", "teeth", "depth",
                                  "innerdiameter"), (0.0, 2.8, 25.0, 0.2,
                                                     -1.0)),
}


MESH_GRID = "__meshgrid__"       # kind tag for mesh-backed grid SDFs


def _point_tri_dist_sq(p, v0, v1, v2):
  """Squared point-triangle distances, p (P, 3) vs one triangle batch
  (T, 3) each — vectorized Ericson closest-point (numpy, compile time)."""
  ab = v1 - v0
  ac = v2 - v0
  ap = p[:, None, :] - v0[None, :, :]                      # (P, T, 3)
  d1 = np.einsum('ptk,tk->pt', ap, ab)
  d2 = np.einsum('ptk,tk->pt', ap, ac)
  bp = p[:, None, :] - v1[None, :, :]
  d3 = np.einsum('ptk,tk->pt', bp, ab)
  d4 = np.einsum('ptk,tk->pt', bp, ac)
  cp = p[:, None, :] - v2[None, :, :]
  d5 = np.einsum('ptk,tk->pt', cp, ab)
  d6 = np.einsum('ptk,tk->pt', cp, ac)
  va = d3 * d6 - d5 * d4
  vb = d5 * d2 - d1 * d6
  vc = d1 * d4 - d3 * d2
  denom = np.maximum(va + vb + vc, 1e-30)
  v = np.clip(vb / denom, 0.0, 1.0)
  w = np.clip(vc / denom, 0.0, 1.0)
  # interior projection
  proj = (v0[None] + v[..., None] * ab[None] + w[..., None] * ac[None])
  # edge/vertex regions handled by clamping barycentrics per edge
  t_ab = np.clip(d1 / np.maximum(np.einsum('tk,tk->t', ab, ab)[None],
                                 1e-30), 0.0, 1.0)
  p_ab = v0[None] + t_ab[..., None] * ab[None]
  t_ac = np.clip(d2 / np.maximum(
      np.einsum('tk,tk->t', ac, ac)[None], 1e-30), 0.0, 1.0)
  p_ac = v0[None] + t_ac[..., None] * ac[None]
  bc = v2 - v1
  t_bc = np.clip(np.einsum('ptk,tk->pt', bp, bc)
                 / np.maximum(np.einsum('tk,tk->t', bc, bc)[None], 1e-30),
                 0.0, 1.0)
  p_bc = v1[None] + t_bc[..., None] * bc[None]
  cands = np.stack([proj, p_ab, p_ac, p_bc], axis=0)       # (4, P, T, 3)
  dsq = np.sum((p[None, :, None, :] - cands) ** 2, axis=-1)
  # interior candidate only valid when inside the face region
  inside = (vb / denom >= 0) & (vc / denom >= 0) & \
      ((vb + vc) / denom <= 1)
  dsq[0] = np.where(inside, dsq[0], np.inf)
  return dsq.min(axis=0)                                   # (P, T)


def _winding(p, v0, v1, v2):
  """Generalized winding number per point (van Oosterom–Strackee solid
  angles summed over triangles), vectorized numpy."""
  a = v0[None, :, :] - p[:, None, :]
  b = v1[None, :, :] - p[:, None, :]
  c = v2[None, :, :] - p[:, None, :]
  la = np.linalg.norm(a, axis=-1)
  lb = np.linalg.norm(b, axis=-1)
  lc = np.linalg.norm(c, axis=-1)
  det = np.einsum('ptk,ptk->pt', a, np.cross(b, c))
  denom = (la * lb * lc + np.einsum('ptk,ptk->pt', a, b) * lc
           + np.einsum('ptk,ptk->pt', b, c) * la
           + np.einsum('ptk,ptk->pt', a, c) * lb)
  return np.sum(np.arctan2(det, denom), axis=1) / (2.0 * np.pi)


def mesh_grid_sdf(verts: np.ndarray, faces: np.ndarray, res: int = None,
                  pad: float = 0.08):
  """Dense signed-distance grid for a watertight mesh — the TPU-first
  analog of the reference's per-mesh octree
  (/root/reference/src/user/user_mesh.cc:488,784 SetOctree): instead of a
  pointer-chasing tree, a fixed (res³) grid over the padded AABB with
  runtime trilinear sampling (one gather + lerp, vectorizes on the VPU).
  Sign from generalized winding numbers (robust to slivers). Resolution
  via MJTPU_SDF_GRID (default 32)."""
  if res is None:
    res = int(os.environ.get("MJTPU_SDF_GRID", "32"))
  verts = np.asarray(verts, dtype=np.float64)
  v0 = verts[faces[:, 0]]
  v1 = verts[faces[:, 1]]
  v2 = verts[faces[:, 2]]
  lo = verts.min(axis=0)
  hi = verts.max(axis=0)
  extent = hi - lo
  lo = lo - pad * np.maximum(extent, 1e-6)
  hi = hi + pad * np.maximum(extent, 1e-6)
  spacing = (hi - lo) / (res - 1)
  axes = [lo[k] + spacing[k] * np.arange(res) for k in range(3)]
  pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
  grid = np.empty(pts.shape[0])
  chunk = max(1, int(4e6 // max(len(faces), 1)))
  for s in range(0, pts.shape[0], chunk):
    p = pts[s:s + chunk]
    dist = np.sqrt(_point_tri_dist_sq(p, v0, v1, v2).min(axis=1))
    wind = _winding(p, v0, v1, v2)
    grid[s:s + chunk] = np.where(np.abs(wind) > 0.5, -dist, dist)
  return dict(grid=grid.reshape(res, res, res), lower=lo, spacing=spacing)


def _grid_sample(x, grid, lower, spacing):
  """Trilinear sample of a (R, R, R) grid at local points x (..., 3);
  clamped at the boundary (queries outside the padded AABB are clamped —
  the narrowphase only descends inside the intersected AABBs)."""
  res = grid.shape[0]
  u_raw = (x - lower) / spacing
  u = jnp.clip(u_raw, 0.0, res - 1 - 1e-6)
  # queries beyond the padded AABB: boundary sample + the clamped excess
  # (keeps the far field a valid lower-bound distance)
  excess = jnp.sqrt(jnp.maximum(
      jnp.sum(((u_raw - u) * spacing) ** 2, axis=-1), 1e-30))
  i0 = jnp.floor(u).astype(jnp.int32)
  f = u - i0
  i1 = jnp.minimum(i0 + 1, res - 1)

  def g(ix, iy, iz):
    return grid[ix[..., 0], iy[..., 1], iz[..., 2]]

  c000 = g(i0, i0, i0)
  c100 = g(i1, i0, i0)
  c010 = g(i0, i1, i0)
  c110 = g(i1, i1, i0)
  c001 = g(i0, i0, i1)
  c101 = g(i1, i0, i1)
  c011 = g(i0, i1, i1)
  c111 = g(i1, i1, i1)
  fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
  c00 = c000 * (1 - fx) + c100 * fx
  c10 = c010 * (1 - fx) + c110 * fx
  c01 = c001 * (1 - fx) + c101 * fx
  c11 = c011 * (1 - fx) + c111 * fx
  c0 = c00 * (1 - fy) + c10 * fy
  c1 = c01 * (1 - fy) + c11 * fy
  return c0 * (1 - fz) + c1 * fz + excess


def dist_fn(kind, size_or_params):
  """Return x ↦ sdf(x) for a static shape: `kind` is an int GeomType for
  primitives, a plugin name string, or MESH_GRID with a grid dict."""
  if kind == MESH_GRID:
    grid = jnp.asarray(size_or_params["grid"])
    lower = jnp.asarray(size_or_params["lower"])
    spacing = jnp.asarray(size_or_params["spacing"])
    return lambda x: _grid_sample(x, grid.astype(x.dtype),
                                  lower.astype(x.dtype),
                                  spacing.astype(x.dtype))
  if isinstance(kind, str):
    fn = PLUGIN_SDF[kind][0]
    params = np.asarray(size_or_params, dtype=np.float64)
    return lambda x: fn(x, params)
  fn = _SDF[int(kind)]
  return lambda x: fn(x, size_or_params)


def grad_fn(kind, size_or_params):
  """Gradient matching the reference: analytic geomGradient for primitives,
  jax.grad for plugin shapes (≡ the plugins' analytic/FD gradients)."""
  if isinstance(kind, str):
    import jax
    f = dist_fn(kind, size_or_params)
    return jax.grad(lambda x: jnp.sum(f(x)))
  fn = _GRAD[int(kind)]
  return lambda x: fn(x, size_or_params)


def geom_distance(m, d, g: int, points):
  """Signed distance of world-frame `points` (..., 3) to geom g (static
  type dispatch; mjc_distance SINGLE-type analog). Mesh/hfield geoms are
  unsupported (the reference requires an octree) and raise."""
  t = int(m.geom_type[g])
  fn = _SDF.get(t)
  if fn is None:
    raise NotImplementedError(f"SDF for geom type {GeomType(t)}")
  lp = jnp.einsum("ji,...j->...i", d.geom_xmat[g], points - d.geom_xpos[g])
  return fn(lp, m.geom_size[g])


def has_sdf(m, g: int) -> bool:
  return int(m.geom_type[g]) in _SDF
