"""General convex-convex collision: branchless fixed-iteration MPR.

TPU counterpart of the reference's convex narrowphase (mjc_Convex via
GJK/EPA, /root/reference/src/engine/engine_collision_gjk.c) — redesigned as
Minkowski Portal Refinement with fixed iteration counts and masked updates
(no data-dependent control flow), which maps the deeply-branchy CCD loop
onto straight-line vectorized code:

  discovery : K₁ masked portal swaps to find a portal pierced by the
              origin ray
  refinement: K₂ masked support insertions; the portal normal converges to
              the contact normal, the portal plane offset to the signed
              distance (negative ⇒ penetration depth)

Support functions cover sphere/capsule/ellipsoid/cylinder/box and meshes
(argmax over the vertex table — one matvec). Contact position is
reconstructed from the barycentric combination of the portal's witness
points on each body.

Covers every convex pair the analytic colliders don't; single-contact
manifold (the reference's multi-point CCD is a later round).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, GeomType, Model
from mujoco_tpu.utils import math as mjm

_DISCOVERY_ITERS = 12
_REFINE_ITERS = 64
_BIG = 1e10


# ---------------------------------------------------------------------------
# support functions (local frame)
# ---------------------------------------------------------------------------


def _support_local(geomtype: int, size, verts, d):
  """Farthest point of the geom along direction d (local frame)."""
  t = int(geomtype)
  dn = mjm.normalize(d)
  if t == GeomType.SPHERE:
    return size[0] * dn
  if t == GeomType.CAPSULE:
    zsign = jnp.where(d[2] >= 0, 1.0, -1.0)
    return size[0] * dn + jnp.array([0.0, 0, 1], dtype=d.dtype) * (
        zsign * size[1])
  if t == GeomType.ELLIPSOID:
    s = size[:3]
    sd = s * d
    return s * sd / jnp.maximum(mjm.norm_safe(sd), mjm.MINVAL)
  if t == GeomType.CYLINDER:
    dxy = jnp.stack([d[0], d[1], jnp.zeros((), dtype=d.dtype)])
    nxy = mjm.norm_safe(dxy)
    radial = jnp.where(nxy > mjm.MINVAL, size[0] * dxy / nxy,
                       jnp.zeros(3, dtype=d.dtype))
    zsign = jnp.where(d[2] >= 0, 1.0, -1.0)
    return radial + jnp.array([0.0, 0, 1], dtype=d.dtype) * (zsign * size[1])
  if t == GeomType.BOX:
    return size[:3] * jnp.where(d >= 0, 1.0, -1.0)
  if t == GeomType.MESH:
    i = jnp.argmax(verts @ d)
    return verts[i]
  raise NotImplementedError(f"support for geom type {t}")


def _make_support(m: Model, geomtype: int, meshid: int):
  """Returns fn(pos, mat, size, dir_world) → world support point. Mesh
  supports gather the compile-time convex hull (Model.mesh_hull_idx) so the
  argmax runs over O(nhull) points — the mesh_graph/maxhullvert analog
  (user_mesh.cc MakeGraph; engine hillclimb support,
  engine_collision_convex.c:748)."""
  if geomtype == GeomType.MESH:
    hull = None
    if len(m.mesh_hull_idx) > meshid and len(m.mesh_hull_idx[meshid]):
      hull = np.asarray(m.mesh_hull_idx[meshid])
    vadr = int(m.mesh_vertadr[meshid])
    vnum = int(m.mesh_vertnum[meshid])

    def fn(pos, mat, size, d):
      if hull is not None:
        verts = m.mesh_vert[hull]                  # static-index gather
      else:
        verts = jax.lax.dynamic_slice(m.mesh_vert, (vadr, 0), (vnum, 3))
      dl = mat.T @ d
      return pos + mat @ _support_local(geomtype, size, verts, dl)
  else:
    def fn(pos, mat, size, d):
      dl = mat.T @ d
      return pos + mat @ _support_local(geomtype, size, None, dl)
  return fn


def _center(m: Model, geomtype: int, meshid: int, pos, mat, size):
  """An interior point (geom frame origin works for all our types)."""
  return pos


# ---------------------------------------------------------------------------
# MPR core
# ---------------------------------------------------------------------------


def mpr(support1, support2, c1, c2, args1, args2, dtype):
  """Fixed-iteration MPR on the Minkowski difference (2 − 1).

  support*, c*: world support fns and interior points. args* = (pos, mat,
  size). Returns (depth_signed, pos, normal) with normal 1→2 and
  depth_signed < 0 ⇒ penetrating (matching contact.dist semantics).
  """
  p1, r1, s1 = args1
  p2, r2, s2 = args2

  def sup(d):
    """Minkowski support along d: S₂(d) − S₁(−d); keep both witnesses."""
    a = support1(p1, r1, s1, -d)
    b = support2(p2, r2, s2, d)
    return b - a, a, b

  v0 = c2 - c1
  v0 = jnp.where(mjm.norm_safe(v0) < 1e-9,
                 jnp.array([1e-5, 0, 0], dtype=dtype), v0)

  # initial portal
  d1 = -v0
  v1, a1, b1 = sup(d1)
  d2 = jnp.cross(v1, v0)
  d2 = jnp.where(mjm.norm_safe(d2) < 1e-12,
                 _any_perp(v0, dtype), d2)
  v2, a2, b2 = sup(d2)
  d3 = jnp.cross(v1 - v0, v2 - v0)
  flip = jnp.dot(d3, v0) > 0
  v1, v2 = jnp.where(flip, v2, v1), jnp.where(flip, v1, v2)
  a1, a2 = jnp.where(flip, a2, a1), jnp.where(flip, a1, a2)
  b1, b2 = jnp.where(flip, b2, b1), jnp.where(flip, b1, b2)
  d3 = jnp.where(flip, -d3, d3)
  v3, a3, b3 = sup(d3)

  # ---- discovery: rotate the portal until the origin ray pierces it
  def disc_body(carry, _):
    v1, v2, v3, a1, a2, a3, b1, b2, b3 = carry
    out1 = jnp.dot(jnp.cross(v1, v3), v0) < 0   # origin outside (v0,v1,v3)
    out2 = jnp.dot(jnp.cross(v3, v2), v0) < 0   # origin outside (v0,v3,v2)
    # case 1: v2 ← v3, new v3 from normal of (v0,v1,v3)
    n1 = jnp.cross(v1 - v0, v3 - v0)
    # case 2: v1 ← v3, new v3 from normal of (v0,v3,v2)
    n2 = jnp.cross(v3 - v0, v2 - v0)
    newdir = jnp.where(out1, n1, n2)
    v3n, a3n, b3n = sup(newdir)
    needs = out1 | out2
    v2_, a2_, b2_ = (jnp.where(out1, v3, v2), jnp.where(out1, a3, a2),
                     jnp.where(out1, b3, b2))
    v1_, a1_, b1_ = (jnp.where(~out1 & out2, v3, v1),
                     jnp.where(~out1 & out2, a3, a1),
                     jnp.where(~out1 & out2, b3, b1))
    v3_, a3_, b3_ = (jnp.where(needs, v3n, v3), jnp.where(needs, a3n, a3),
                     jnp.where(needs, b3n, b3))
    return (v1_, v2_, v3_, a1_, a2_, a3_, b1_, b2_, b3_), ()

  carry = (v1, v2, v3, a1, a2, a3, b1, b2, b3)
  carry, _ = jax.lax.scan(disc_body, carry, None, length=_DISCOVERY_ITERS)
  v1, v2, v3, a1, a2, a3, b1, b2, b3 = carry

  # ---- refinement: push the portal towards the surface along its normal
  def ref_body(carry, _):
    v1, v2, v3, a1, a2, a3, b1, b2, b3 = carry
    n = jnp.cross(v2 - v1, v3 - v1)
    n = mjm.normalize(n)
    # orient outward (away from v0)
    n = jnp.where(jnp.dot(n, v1 - v0) < 0, -n, n)
    v4, a4, b4 = sup(n)
    # which edge plane does the origin ray cross? replace the opposite vertex
    t1 = jnp.dot(jnp.cross(v4, v1), v0) < 0
    t2 = jnp.dot(jnp.cross(v4, v2), v0) < 0
    # standard MPR replacement rule
    repl1 = t1 & t2          # replace v1
    repl2 = (~t1) & (~t2)    # replace v2
    repl3 = t1 & (~t2)       # replace v3  (case ~t1 & t2 → replace v2 too)
    repl2 = repl2 | ((~t1) & t2)
    v1_, a1_, b1_ = (jnp.where(repl1, v4, v1), jnp.where(repl1, a4, a1),
                     jnp.where(repl1, b4, b1))
    v2_, a2_, b2_ = (jnp.where(repl2, v4, v2), jnp.where(repl2, a4, a2),
                     jnp.where(repl2, b4, b2))
    v3_, a3_, b3_ = (jnp.where(repl3, v4, v3), jnp.where(repl3, a4, a3),
                     jnp.where(repl3, b4, b3))
    return (v1_, v2_, v3_, a1_, a2_, a3_, b1_, b2_, b3_), ()

  carry, _ = jax.lax.scan(ref_body, carry, None, length=_REFINE_ITERS)
  v1, v2, v3, a1, a2, a3, b1, b2, b3 = carry

  # final portal plane normal — initialization for the MTD polish. A
  # degenerate (zero-area) portal normalizes to the zero vector, which would
  # poison the polish (h(0) = 0 beats every true positive support value when
  # penetrating) — fall back to the center-line direction.
  n = jnp.cross(v2 - v1, v3 - v1)
  n = mjm.normalize(n)
  n = jnp.where(jnp.dot(n, v1 - v0) < 0, -n, n)
  n = jnp.where(mjm.norm_safe(n) < 0.5, mjm.normalize(v0), n)

  # ---- MTD polish: the signed contact distance is −min_{|u|=1} h(u) with
  # h(u) = ⟨u, S_M(u)⟩ the Minkowski support function (origin inside ⇒
  # min h = penetration depth; outside ⇒ −min h = separation). Projected
  # subgradient descent on the sphere, best-so-far tracking.
  def h_of(u):
    w, a, b = sup(u)
    return jnp.dot(u, w), w, a, b

  def polish_body(carry, _):
    u, best_h, best_u, gamma = carry
    hval, w, _, _ = h_of(u)
    better = (hval < best_h) & (mjm.norm_safe(u) > 0.5)
    best_h = jnp.where(better, hval, best_h)
    best_u = jnp.where(better, u, best_u)
    grad = w - u * jnp.dot(u, w)            # tangential component of S_M(u)
    gn = jnp.maximum(mjm.norm_safe(grad), mjm.MINVAL)
    u_new = mjm.normalize(u - gamma * grad / gn)
    return (u_new, best_h, best_u, gamma * 0.85), ()

  big = jnp.asarray(_BIG, dtype=dtype)
  gamma0 = jnp.asarray(0.4, dtype=dtype)
  (_, h1, u1_, _), _ = jax.lax.scan(
      polish_body, (-n, big, -n, gamma0), None, length=32)
  u_init2 = -mjm.normalize(v0)
  (_, h2, u2_, _), _ = jax.lax.scan(
      polish_body, (u_init2, big, u_init2, gamma0), None, length=32)
  use1 = h1 <= h2
  h_best = jnp.where(use1, h1, h2)
  u_best = jnp.where(use1, u1_, u2_)

  # exact candidates: both bodies' principal axes (face normals of
  # boxes/cylinders — the nonsmooth minima subgradient descent circles)
  for mat in (r1, r2):
    for col in range(3):
      for sgn in (1.0, -1.0):
        u_c = sgn * mat[:, col]
        h_c, _, _, _ = h_of(u_c)
        better = h_c < h_best
        h_best = jnp.where(better, h_c, h_best)
        u_best = jnp.where(better, u_c, u_best)

  dist = -h_best                            # contact.dist convention
  _, _, aw, bw = h_of(u_best)
  pos = 0.5 * (aw + bw)
  # u_best points (in Minkowski 2−1 space) from B toward A; contact normal
  # 1→2 is the opposite direction
  return dist, pos, -u_best


def _any_perp(v, dtype):
  ax = jnp.argmin(jnp.abs(v))
  e = jnp.zeros(3, dtype=dtype).at[ax].set(1.0)
  return jnp.cross(v, e)


def _ray_portal_bary(v0, v1, v2, v3):
  """Barycentric coords of the intersection of ray v0→origin (extended) with
  the portal triangle (v1, v2, v3)."""
  # solve origin = α v1 + β v2 + γ v3 projected along the ray direction
  dirn = -mjm.normalize(v0)
  m_ = jnp.stack([v1, v2, v3], axis=1)        # columns
  # least-squares in the plane: project out the ray direction
  a = jnp.concatenate([m_, dirn[:, None]], axis=1)  # 3x4: [v1 v2 v3 d]
  # solve [v1 v2 v3 d][α β γ t]ᵀ = 0 with α+β+γ = 1 →
  # [v1−v3, v2−v3, d][α β t]ᵀ = −v3
  mat = jnp.stack([v1 - v3, v2 - v3, dirn], axis=1)
  rhs = -v3
  det = jnp.linalg.det(mat)
  sol = jnp.where(jnp.abs(det) > 1e-14,
                  jnp.linalg.solve(
                      mat + 1e-14 * jnp.eye(3, dtype=v0.dtype), rhs),
                  jnp.array([1 / 3, 1 / 3, 0.0], dtype=v0.dtype))
  alpha, beta = sol[0], sol[1]
  gamma = 1.0 - alpha - beta
  lam = jnp.clip(jnp.stack([alpha, beta, gamma]), 0.0, 1.0)
  return lam / jnp.maximum(jnp.sum(lam), mjm.MINVAL)


CONVEX_NCON = 5  # MPR primary + 4 perturbed-support manifold points


def make_convex_convex(m: Model, t1: int, t2: int, mesh1: int, mesh2: int):
  """Collider fn for a general convex pair: the MPR/MTD contact plus a
  4-point manifold from perturbed support directions.

  Manifold expansion (the branchless analog of the reference's multiCCD
  polygon clipping, engine_collision_gjk.c:2114): tilt the contact normal
  by a small angle in 4 tangential directions and take the support pair of
  each body along the tilted axis. On face-face configurations the tilted
  supports land on the face corners (stable 4-point rest); on curved
  surfaces they collapse onto the primary point and are masked out as
  near-duplicates. Per-point depth is the projection onto the primary
  normal, like the reference's clipped manifold.
  """
  sup1 = _make_support(m, t1, mesh1)
  sup2 = _make_support(m, t2, mesh2)
  tilt = 0.05  # ~3° support tilt

  def collide(p1, m1, s1, p2, m2_, s2):
    dtype = p1.dtype
    dist, _, n = mpr(sup1, sup2, p1, p2,
                     (p1, m1, s1), (p2, m2_, s2), dtype)
    t1v = mjm.normalize(_any_perp(n, dtype))
    t2v = jnp.cross(n, t1v)

    # contact-plane anchor along n: support VALUES are unique even when the
    # support points are degenerate on flat features
    a0 = sup1(p1, m1, s1, n)
    b0 = sup2(p2, m2_, s2, -n)
    h0 = 0.5 * (jnp.dot(n, a0) + jnp.dot(n, b0))

    # tangential extent of each body's contact feature via tilted supports,
    # then the manifold rectangle = interval intersection per tangent axis
    # (the branchless 1D analog of the reference's polygon clipping)
    def extent(t):
      ua_hi = jnp.dot(t, sup1(p1, m1, s1, mjm.normalize(n + tilt * t)))
      ua_lo = jnp.dot(t, sup1(p1, m1, s1, mjm.normalize(n - tilt * t)))
      ub_hi = jnp.dot(t, sup2(p2, m2_, s2, mjm.normalize(-n + tilt * t)))
      ub_lo = jnp.dot(t, sup2(p2, m2_, s2, mjm.normalize(-n - tilt * t)))
      lo = jnp.maximum(jnp.minimum(ua_lo, ua_hi), jnp.minimum(ub_lo, ub_hi))
      hi = jnp.minimum(jnp.maximum(ua_lo, ua_hi), jnp.maximum(ub_lo, ub_hi))
      # disjoint guard (hi < lo on curved/degenerate features): both bounds
      # collapse to the midpoint
      mid = 0.5 * (lo + hi)
      return jnp.minimum(lo, mid), jnp.maximum(hi, mid)

    lo1, hi1 = extent(t1v)
    lo2, hi2 = extent(t2v)
    eps = 0.05 * jnp.minimum(jnp.max(s1), jnp.max(s2)) + 1e-9
    # collapse near-degenerate axes SYMMETRICALLY before forming corners —
    # a greedy point-dedup would keep a lopsided subset (e.g. both +x
    # corners of a thin line contact), injecting spurious torque
    def collapse(lo, hi):
      mid = 0.5 * (lo + hi)
      thin = hi - lo < eps
      return jnp.where(thin, mid, lo), jnp.where(thin, mid, hi)
    lo1, hi1 = collapse(lo1, hi1)
    lo2, hi2 = collapse(lo2, hi2)
    center = h0 * n + 0.5 * (lo1 + hi1) * t1v + 0.5 * (lo2 + hi2) * t2v

    dists = [dist]
    poss = [center]
    pts = [center]
    for u, v in ((lo1, lo2), (hi1, lo2), (lo1, hi2), (hi1, hi2)):
      pi = h0 * n + u * t1v + v * t2v
      bad = jnp.zeros((), dtype=bool)
      for pj in pts:
        bad = bad | (mjm.norm_safe(pi - pj) < eps)
      pts.append(jnp.where(bad, pi + 4 * eps, pi))  # keep dedup transitive
      dists.append(jnp.where(bad, _BIG, dist))
      poss.append(pi)
    nn = jnp.broadcast_to(n, (CONVEX_NCON, 3))
    return (jnp.stack(dists), jnp.stack(poss), nn,
            jnp.zeros((CONVEX_NCON, 3), dtype=dtype))

  return collide
