"""Spatial tendons: site paths, sphere/cylinder wrapping, pulleys.

Behavioral counterpart of mj_tendon's spatial branch
(/root/reference/src/engine/engine_core_smooth.c:927) and the 2D wrap
geometry (mju_wrap / wrap_circle / wrap_inside,
/root/reference/src/engine/engine_util_misc.c:36-330), redesigned branchless:
the path structure (segment sequence, wrap objects, pulley divisors'
addresses, sidesite ids) is static model metadata, so each tendon unrolls at
trace time into a fixed chain of fused vector ops; the wrap decision
(wlen < 0 ⇒ straight segment) becomes a `where` select between the two
precomputed variants. The inside-wrap Newton iteration runs a fixed 20
steps with failure flags instead of early returns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model, WrapType
from mujoco_tpu.ops import support
from mujoco_tpu.utils import math as mjm

_NOWRAP = -1.0


def _norm2(v):
  return jnp.sqrt(jnp.maximum(v[0] * v[0] + v[1] * v[1], 0.0))


def _is_intersect(p1, p2, p3, p4):
  """2D segment intersection test (is_intersect, engine_util_misc.c:36)."""
  det = (p4[1] - p3[1]) * (p2[0] - p1[0]) - (p4[0] - p3[0]) * (p2[1] - p1[1])
  ok = jnp.abs(det) >= mjm.MINVAL
  det_s = jnp.where(ok, det, 1.0)
  a = ((p4[0] - p3[0]) * (p1[1] - p3[1])
       - (p4[1] - p3[1]) * (p1[0] - p3[0])) / det_s
  b = ((p2[0] - p1[0]) * (p1[1] - p3[1])
       - (p2[1] - p1[1]) * (p1[0] - p3[0])) / det_s
  return ok & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)


def _length_circle(p0, p1, flip_ind, radius):
  """Arc length between two circle points (length_circle,
  engine_util_misc.c:55). flip_ind: bool, the solution branch."""
  p0n = p0 / jnp.maximum(_norm2(p0), mjm.MINVAL)
  p1n = p1 / jnp.maximum(_norm2(p1), mjm.MINVAL)
  angle = jnp.arccos(jnp.clip(p0n[0] * p1n[0] + p0n[1] * p1n[1], -1.0, 1.0))
  cross = p0[1] * p1[0] - p0[0] * p1[1]
  flip = jnp.where(flip_ind, cross > 0, cross < 0)
  angle = jnp.where(flip, 2 * jnp.pi - angle, angle)
  return radius * angle


def wrap_circle(end, side, radius):
  """2D circle wrap (wrap_circle, engine_util_misc.c:78).

  end: (4,) endpoint pair, side: (2,) scaled side point or None.
  Returns (wlen, pnt4); wlen < 0 means no wrap."""
  dtype = end.dtype
  sqlen0 = end[0] ** 2 + end[1] ** 2
  sqlen1 = end[2] ** 2 + end[3] ** 2
  sqrad = radius * radius

  nowrap = (sqlen0 < sqrad) | (sqlen1 < sqrad) | (radius < mjm.MINVAL)

  dif = jnp.stack([end[2] - end[0], end[3] - end[1]])
  dd = dif[0] ** 2 + dif[1] ** 2
  nowrap |= dd < mjm.MINVAL
  dd_s = jnp.maximum(dd, mjm.MINVAL)
  a = jnp.clip(-(dif[0] * end[0] + dif[1] * end[1]) / dd_s, 0.0, 1.0)
  tmp = a * dif + end[:2]
  outside = tmp[0] ** 2 + tmp[1] ** 2 > sqrad
  if side is None:
    nowrap |= outside
  else:
    nowrap |= outside & (side[0] * tmp[0] + side[1] * tmp[1] >= 0)

  sqrt0 = jnp.sqrt(jnp.maximum(sqlen0 - sqrad, 0.0))
  sqrt1 = jnp.sqrt(jnp.maximum(sqlen1 - sqrad, 0.0))
  sqlen0_s = jnp.maximum(sqlen0, mjm.MINVAL)
  sqlen1_s = jnp.maximum(sqlen1, mjm.MINVAL)

  sols = []
  goods = []
  for sgn in (1.0, -1.0):
    s00 = (end[0] * sqrad + sgn * radius * end[1] * sqrt0) / sqlen0_s
    s01 = (end[1] * sqrad - sgn * radius * end[0] * sqrt0) / sqlen0_s
    s10 = (end[2] * sqrad - sgn * radius * end[3] * sqrt1) / sqlen1_s
    s11 = (end[3] * sqrad + sgn * radius * end[2] * sqrt1) / sqlen1_s
    sol0 = jnp.stack([s00, s01])
    sol1 = jnp.stack([s10, s11])
    if side is not None:
      mid = sol0 + sol1
      midn = mid / jnp.maximum(_norm2(mid), mjm.MINVAL)
      good = midn[0] * side[0] + midn[1] * side[1]
    else:
      df = sol0 - sol1
      good = -(df[0] ** 2 + df[1] ** 2)
    good = jnp.where(_is_intersect(end[:2], sol0, end[2:], sol1),
                     -10000.0, good)
    sols.append((sol0, sol1))
    goods.append(good)

  pick0 = goods[0] > goods[1]
  sol0 = jnp.where(pick0, sols[0][0], sols[1][0])
  sol1 = jnp.where(pick0, sols[0][1], sols[1][1])
  nowrap |= _is_intersect(end[:2], sol0, end[2:], sol1)
  wlen = _length_circle(sol0, sol1, ~pick0, radius)
  pnt = jnp.concatenate([sol0, sol1])
  return jnp.where(nowrap, jnp.asarray(_NOWRAP, dtype=dtype), wlen), pnt


def wrap_inside(end, radius):
  """2D inside wrap (wrap_inside, engine_util_misc.c:157): fixed-iteration
  Newton on asin(Az)+asin(Bz)−2asin(z)+G = 0, with the reference's failure
  modes mapped to flags. Returns (wlen ∈ {0, −1}, pnt4)."""
  dtype = end.dtype
  len0 = _norm2(end[:2])
  len1 = _norm2(end[2:])
  dif = jnp.stack([end[2] - end[0], end[3] - end[1]])
  dd = dif[0] ** 2 + dif[1] ** 2

  nowrap = ((len0 <= radius) | (len1 <= radius) | (radius < mjm.MINVAL)
            | (len0 < mjm.MINVAL) | (len1 < mjm.MINVAL))
  # segment-circle intersection: no wrap
  dd_s = jnp.maximum(dd, mjm.MINVAL)
  a = -(dif[0] * end[0] + dif[1] * end[1]) / dd_s
  seg_pt = end[:2] + a * dif
  nowrap |= (dd > mjm.MINVAL) & (a > 0) & (a < 1) & (
      _norm2(seg_pt) <= radius)

  # default point: scaled midpoint
  mid = 0.5 * (end[:2] + end[2:])
  midn = mid / jnp.maximum(_norm2(mid), mjm.MINVAL)
  default_pnt = midn * radius

  a_ = radius / jnp.maximum(len0, mjm.MINVAL)
  b_ = radius / jnp.maximum(len1, mjm.MINVAL)
  cosg = (len0 ** 2 + len1 ** 2 - dd) / jnp.maximum(
      2 * len0 * len1, mjm.MINVAL)
  nowrap |= cosg < -1 + mjm.MINVAL
  use_default = cosg > 1 - mjm.MINVAL
  g = jnp.arccos(jnp.clip(cosg, -1.0, 1.0))

  def f_of(z):
    return (jnp.arcsin(jnp.clip(a_ * z, -1, 1))
            + jnp.arcsin(jnp.clip(b_ * z, -1, 1))
            - 2 * jnp.arcsin(jnp.clip(z, -1, 1)) + g)

  z = jnp.asarray(1 - 1e-7, dtype=dtype)
  f = f_of(z)
  use_default |= f > 0
  converged = jnp.zeros((), dtype=bool)
  for _ in range(20):
    done = converged | use_default | (jnp.abs(f) <= 1e-6)
    converged |= jnp.abs(f) <= 1e-6
    df = (a_ / jnp.maximum(mjm.MINVAL, jnp.sqrt(jnp.maximum(
        1 - z * z * a_ * a_, 0.0)))
        + b_ / jnp.maximum(mjm.MINVAL, jnp.sqrt(jnp.maximum(
            1 - z * z * b_ * b_, 0.0)))
        - 2 / jnp.maximum(mjm.MINVAL, jnp.sqrt(jnp.maximum(
            1 - z * z, 0.0))))
    bad = df > -mjm.MINVAL
    z1 = z - f / jnp.where(bad, -1.0, df)
    bad |= z1 > z
    use_default |= bad & ~done
    z = jnp.where(done | bad, z, z1)
    f = f_of(z)
    use_default |= (f > 1e-6) & ~done
  use_default |= ~converged & ~(jnp.abs(f) <= 1e-6)

  # finalize: rotate from the endpoint on the convex side
  pos_side = end[0] * end[3] - end[1] * end[2] > 0
  vec = jnp.where(pos_side, end[:2], end[2:])
  vec = vec / jnp.maximum(_norm2(vec), mjm.MINVAL)
  ang = jnp.where(pos_side,
                  jnp.arcsin(jnp.clip(z, -1, 1))
                  - jnp.arcsin(jnp.clip(a_ * z, -1, 1)),
                  jnp.arcsin(jnp.clip(z, -1, 1))
                  - jnp.arcsin(jnp.clip(b_ * z, -1, 1)))
  ca, sa = jnp.cos(ang), jnp.sin(ang)
  p = radius * jnp.stack([ca * vec[0] - sa * vec[1],
                          sa * vec[0] + ca * vec[1]])
  p = jnp.where(use_default, default_pnt, p)
  pnt = jnp.concatenate([p, p])
  wlen = jnp.where(nowrap, jnp.asarray(_NOWRAP, dtype=dtype),
                   jnp.zeros((), dtype=dtype))
  return wlen, pnt


def wrap(x0, x1, xpos, xmat, radius, wraptype: int, side_xpos=None):
  """3D wrap of a path segment around a sphere/cylinder geom (mju_wrap,
  engine_util_misc.c:281). Returns (wlen, wpnt (2,3)); wlen<0 = no wrap."""
  dtype = x0.dtype
  p0 = xmat.T @ (x0 - xpos)
  p1 = xmat.T @ (x1 - xpos)
  nowrap = (mjm.norm_safe(p0) < mjm.MINVAL) | (mjm.norm_safe(p1) < mjm.MINVAL)

  if wraptype == int(WrapType.SPHERE):
    ax0 = mjm.normalize(p0)
    normal = jnp.cross(p0, p1)
    nrm = mjm.norm_safe(normal)
    # parallel fallback: axis with max |component| zeroed
    imax = jnp.argmax(jnp.abs(ax0))
    alt = jnp.ones((3,), dtype=dtype).at[imax].set(0.0)
    normal_alt = mjm.normalize(jnp.cross(ax0, alt))
    normal = jnp.where(nrm < mjm.MINVAL, normal_alt, normal / nrm)
    ax1 = mjm.normalize(jnp.cross(normal, ax0))
  else:  # CYLINDER
    ax0 = jnp.array([1.0, 0, 0], dtype=dtype)
    ax1 = jnp.array([0.0, 1, 0], dtype=dtype)

  end = jnp.stack([jnp.dot(p0, ax0), jnp.dot(p0, ax1),
                   jnp.dot(p1, ax0), jnp.dot(p1, ax1)])

  if side_xpos is not None:
    s = xmat.T @ (side_xpos - xpos)
    sd = jnp.stack([jnp.dot(s, ax0), jnp.dot(s, ax1)])
    sd = sd / jnp.maximum(_norm2(sd), mjm.MINVAL) * radius
    inside = mjm.norm_safe(s) < radius
    w_in, p_in = wrap_inside(end, radius)
    w_ci, p_ci = wrap_circle(end, sd, radius)
    wlen = jnp.where(inside, w_in, w_ci)
    pnt = jnp.where(inside, p_in, p_ci)
  else:
    wlen, pnt = wrap_circle(end, None, radius)

  # reconstruct 3D points in local frame
  res0 = ax0 * pnt[0] + ax1 * pnt[1]
  res1 = ax0 * pnt[2] + ax1 * pnt[3]

  if wraptype == int(WrapType.CYLINDER):
    l0 = jnp.sqrt(jnp.maximum(
        (p0[0] - res0[0]) ** 2 + (p0[1] - res0[1]) ** 2, 0.0))
    l1 = jnp.sqrt(jnp.maximum(
        (p1[0] - res1[0]) ** 2 + (p1[1] - res1[1]) ** 2, 0.0))
    wl = jnp.maximum(wlen, 0.0)
    tot = jnp.maximum(l0 + wl + l1, mjm.MINVAL)
    z0 = p0[2] + (p1[2] - p0[2]) * l0 / tot
    z1 = p0[2] + (p1[2] - p0[2]) * (l0 + wl) / tot
    res0 = res0.at[2].set(z0)
    res1 = res1.at[2].set(z1)
    height = jnp.abs(z1 - z0)
    wlen = jnp.where(wlen >= 0, jnp.sqrt(wlen * wlen + height * height),
                     wlen)

  wpnt0 = xmat @ res0 + xpos
  wpnt1 = xmat @ res1 + xpos
  wlen = jnp.where(nowrap, jnp.asarray(_NOWRAP, dtype=dtype), wlen)
  return wlen, jnp.stack([wpnt0, wpnt1])


def _seg_jac(m: Model, d: Data, p0, b0: int, p1, b1: int):
  """Tendon-moment contribution of one straight segment between bodies
  (the mj_jacDifPair + chain-rule block in mj_tendon)."""
  dif = mjm.normalize(p1 - p0)
  jacp0, _ = support.jac(m, d, p0, b0)
  jacp1, _ = support.jac(m, d, p1, b1)
  return dif @ (jacp1 - jacp0)


def spatial_tendon(m: Model, d: Data, t: int):
  """Length and moment row of one spatial tendon; static path unroll."""
  dtype = d.qpos.dtype
  adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
  wtypes = m.wrap_type[adr:adr + num]
  objid = m.wrap_objid[adr:adr + num]

  length = jnp.zeros((), dtype=dtype)
  row = jnp.zeros((m.nv,), dtype=dtype)
  divisor = jnp.ones((), dtype=dtype)

  j = 0
  while j < num - 1:
    t0, t1 = int(wtypes[j]), int(wtypes[j + 1])
    if t0 == WrapType.PULLEY or t1 == WrapType.PULLEY:
      if t0 == WrapType.PULLEY:
        divisor = m.wrap_prm[adr + j]
      j += 1
      continue

    id0 = int(objid[j])
    site0 = d.site_xpos[id0]
    b0 = int(m.site_bodyid[id0])

    if t1 in (WrapType.SPHERE, WrapType.CYLINDER):
      wrapid = int(objid[j + 1])
      # sidesite id lives in wrap_prm but is structural → static copy
      sideid = int(m.wrap_sideid[adr + j + 1])
      id1 = int(objid[j + 2])
      site1 = d.site_xpos[id1]
      b1 = int(m.site_bodyid[id1])
      bg = int(m.geom_bodyid[wrapid])

      side = d.site_xpos[sideid] if sideid >= 0 else None
      wlen, wpnt = wrap(site0, site1, d.geom_xpos[wrapid],
                        d.geom_xmat[wrapid], m.geom_size[wrapid, 0],
                        t1, side)
      wrapped = wlen >= 0
      # straight variant
      len_straight = mjm.norm_safe(site1 - site0)
      row_straight = _seg_jac(m, d, site0, b0, site1, b1)
      # wrapped variant: site0→w0 (b0→bg), arc, w1→site1 (bg→b1)
      w0, w1 = wpnt[0], wpnt[1]
      len_wrap = (mjm.norm_safe(w0 - site0) + jnp.maximum(wlen, 0.0)
                  + mjm.norm_safe(site1 - w1))
      row_wrap = jnp.zeros((m.nv,), dtype=dtype)
      if b0 != bg:
        row_wrap = row_wrap + _seg_jac(m, d, site0, b0, w0, bg)
      if bg != b1:
        row_wrap = row_wrap + _seg_jac(m, d, w1, bg, site1, b1)

      length = length + jnp.where(wrapped, len_wrap, len_straight) / divisor
      row = row + jnp.where(wrapped, row_wrap, row_straight) / divisor
      j += 2
    else:
      id1 = int(objid[j + 1])
      site1 = d.site_xpos[id1]
      b1 = int(m.site_bodyid[id1])
      length = length + mjm.norm_safe(site1 - site0) / divisor
      if b0 != b1:
        row = row + _seg_jac(m, d, site0, b0, site1, b1) / divisor
      j += 1

  return length, row
