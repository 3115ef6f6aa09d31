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
