"""Analytic signed distance functions for primitive geoms.

Counterpart of the reference's SDF machinery
(/root/reference/src/engine/engine_collision_sdf.c: geomDistance:234,
radialField3d:200): exact signed distances in the geom's local frame,
negative inside. Consumed by the tactile sensor (taxel penetration depths)
and usable for SDF-style collision queries. All functions are batched over
points: x has shape (..., 3).
"""

from __future__ import annotations

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


def dist_fn(kind, size_or_params):
  """Return x ↦ sdf(x) for a static shape: `kind` is an int GeomType for
  primitives or a plugin name string; size/params close over statically."""
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
