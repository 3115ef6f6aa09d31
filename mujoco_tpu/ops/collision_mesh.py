"""Mesh collision: plane-mesh, sphere-mesh, capsule-mesh — branchless.

TPU redesign of the reference's convex narrowphase for the mesh pairs that
don't need full GJK/EPA (mjc_PlaneConvex and the sphere/capsule paths of
mjc_Convex, /root/reference/src/engine/engine_collision_convex.c): the mesh
vertex/face arrays are static-shape model data, so

  * plane-mesh tests every vertex against the plane and keeps the 4 deepest
    (the reference's plane-convex support-point manifold, capped like
    mj_maxContact);
  * sphere-mesh runs the exact sphere-triangle test against every face,
    selecting the surface-nearest face outside and the least-penetrating
    face inside (closed-mesh interior handling);
  * capsule-mesh applies the sphere test at both endpoints and the midpoint.

Vertex positions are traced — mesh shapes are domain-randomizable per env.
Mesh-mesh and box-mesh (GJK/EPA territory) are tracked for a later round.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.ops.collision_hfield import closest_pt_triangle
from mujoco_tpu.utils import math as mjm

_BIG = 1e10


def make_plane_mesh(m: Model, meshid: int, nslot: int = 4):
  """Collider fn for (PLANE, MESH geom using meshid)."""
  vadr = int(m.mesh_vertadr[meshid])
  vnum = int(m.mesh_vertnum[meshid])

  def collide(p1, m1, s1, p2, m2, s2):
    verts = jax.lax.dynamic_slice(m.mesh_vert, (vadr, 0), (vnum, 3))
    world = verts @ m2.T + p2[None, :]
    n = m1[:, 2]
    dists = (world - p1[None, :]) @ n
    order = jnp.argsort(dists)[:nslot]
    dist = dists[order]
    pos = world[order] - 0.5 * dist[:, None] * n[None, :]
    normal = jnp.broadcast_to(n, (nslot, 3))
    return dist, pos, normal, jnp.zeros_like(normal)

  return collide


def _sphere_vs_mesh(m: Model, meshid: int, center, radius):
  """Sphere center/radius (world) vs one mesh instance placed at (p2, m2):
  callers pass center already in the MESH local frame. Returns
  (dist, pos_local, normal_local).

  Midphase: meshes beyond MJTPU_FACE_BUDGET faces are prefiltered by exact
  point-to-face-AABB distance (a lower bound on the point-triangle
  distance), and only the K nearest faces run the exact test — the
  fixed-shape analog of the BVH midphase (mj_collideTree,
  engine_collision_driver.c:996). Exact whenever the true nearest face is
  among the K best lower bounds (K=64 default)."""
  vadr = int(m.mesh_vertadr[meshid])
  vnum = int(m.mesh_vertnum[meshid])
  fadr = int(m.mesh_faceadr[meshid])
  fnum = int(m.mesh_facenum[meshid])
  faces = m.mesh_face[fadr:fadr + fnum] - 0  # (F, 3) global vertex ids

  verts = jax.lax.dynamic_slice(m.mesh_vert, (vadr, 0), (vnum, 3))
  tri = verts[faces - vadr]                  # (F, 3, 3)

  budget = int(os.environ.get("MJTPU_FACE_BUDGET", "64"))
  if fnum > budget:
    lo = tri.min(axis=1)                     # (F, 3)
    hi = tri.max(axis=1)
    gap = jnp.maximum(jnp.maximum(lo - center, center - hi), 0.0)
    score = jnp.sum(gap * gap, axis=1)       # squared point-AABB distance
    _, fidx = jax.lax.top_k(-score, budget)
    tri = tri[fidx]

  def one_face(t):
    a, b, c = t[0], t[1], t[2]
    q = closest_pt_triangle(center, a, b, c)
    u = center - q
    l = mjm.norm_safe(u)
    n_face = mjm.normalize(jnp.cross(b - a, c - a))   # outward (CCW)
    outside = jnp.dot(u, n_face) >= 0
    return l, u / l, n_face, outside

  ls, dirs, nfaces, outs = jax.vmap(one_face)(tri)
  any_out = jnp.any(outs)

  # outside: nearest face among outside-facing ones
  l_out = jnp.where(outs, ls, _BIG)
  i_out = jnp.argmin(l_out)
  dist_out = l_out[i_out] - radius
  normal_out = dirs[i_out]

  # inside: least-deep face (nearest surface), push along its outward normal
  i_in = jnp.argmin(ls)
  dist_in = -ls[i_in] - radius
  normal_in = nfaces[i_in]

  dist = jnp.where(any_out, dist_out, dist_in)
  normal = jnp.where(any_out, normal_out, normal_in)
  pos = center - normal * (radius + dist * 0.5)
  return dist, pos, normal


def make_sphere_mesh(m: Model, meshid: int):
  """Collider fn for (SPHERE, MESH geom using meshid)."""

  def collide(p1, m1, s1, p2, m2, s2):
    center_local = m2.T @ (p1 - p2)
    dist, pos_l, n_l = _sphere_vs_mesh(m, meshid, center_local, s1[0])
    pos = m2 @ pos_l + p2
    # convention: normal geom1(sphere) → geom2(mesh) = −(surface→center)
    normal = -(m2 @ n_l)
    return dist[None], pos[None], normal[None], jnp.zeros((1, 3),
                                                          dtype=pos.dtype)

  return collide


def make_capsule_mesh(m: Model, meshid: int):
  """Collider fn for (CAPSULE, MESH geom using meshid): sphere tests at the
  endpoints and midpoint of the capsule segment."""

  def collide(p1, m1, s1, p2, m2, s2):
    axis = m1[:, 2]
    outs = []
    for t in (-1.0, 0.0, 1.0):
      center = p1 + axis * (t * s1[1])
      center_local = m2.T @ (center - p2)
      dist, pos_l, n_l = _sphere_vs_mesh(m, meshid, center_local, s1[0])
      pos = m2 @ pos_l + p2
      normal = -(m2 @ n_l)
      outs.append((dist, pos, normal))
    dist = jnp.stack([o[0] for o in outs])
    pos = jnp.stack([o[1] for o in outs])
    normal = jnp.stack([o[2] for o in outs])
    return dist, pos, normal, jnp.zeros_like(normal)

  return collide
