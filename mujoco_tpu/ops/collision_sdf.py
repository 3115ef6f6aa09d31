"""SDF collision narrowphase: multi-start gradient descent on combined
signed-distance objectives.

TPU redesign of mjc_SDF (/root/reference/src/engine/engine_collision_sdf.c:1040)
and its helpers stepGradient (:615), mjc_distance/mjc_gradient (:417,:451),
addPreContact (:545): the reference's per-pair dynamic loop becomes a
fixed-shape batch — `sdf_initpoints` Halton starts per pair, vmapped descent
with a fixed 15-candidate backtracking line search replacing the do-while,
and a frozen-mask early stop replacing the `return`. Distances/gradients are
the analytic forms in ops/sdf.py (primitive gradients follow geomGradient's
piecewise fields exactly; plugin shapes use jax.grad).

Objective types (mjc_distance, engine_collision_sdf.c:417):
  COLLISION    A + B + |max(A, B)|   (descended sdf_iterations times)
  INTERSECTION max(A, B)             (1 step; its value is the contact depth)
  MIDSURFACE   A - B                 (gradient only → contact normal)
where A = sdf2(x) in the SDF geom's frame and B = sdf1(map(x)) in the other
geom's frame; x lives in geom2's (the SDF's) local frame throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.ops import sdf as sdfmod
from mujoco_tpu.utils import math as mjm

# backtracking schedule of stepGradient (engine_collision_sdf.c:618-624):
# alpha starts at 2, is halved before each trial (do-while), floor 1e-4 →
# trial alphas 1, 0.5, ..., 2*0.5^15; c = 0.1 scales the Wolfe decrease
_C = 0.1
_NALPHA = 15
_ALPHAS = 2.0 * (0.5 ** np.arange(1, _NALPHA + 1))


def _halton(n, base):
  """First n Halton points in the given base (mju_Halton analog)."""
  out = np.zeros(n)
  for i in range(n):
    f, r, x = 1.0, 0.0, i
    while x > 0:
      f /= base
      r += f * (x % base)
      x //= base
    out[i] = r
  return out


def _descent_step(x, objective, grad):
  """One stepGradient iteration: gradient + backtracking line search.
  Returns (x_new, dist_at_x_new, improved)."""
  g = grad(x)
  x0 = x
  dist0 = objective(x0)
  gg = jnp.sum(g * g)
  # trial points for the fixed alpha schedule
  alphas = jnp.asarray(_ALPHAS, dtype=x.dtype)
  trials = x0[None, :] - alphas[:, None] * g[None, :]
  dists = jax.vmap(objective)(trials)
  wolfe = -_C * alphas * gg
  ok = (dists - dist0) <= wolfe
  # the do-while exits at the first satisfying alpha, or at the first alpha
  # <= amin (the last trial, since 2*0.5^15 < 1e-4 <= 2*0.5^14): emulate by
  # taking the first ok index, else the last
  idx = jnp.argmax(ok)
  sel = jnp.where(jnp.any(ok), idx, _NALPHA - 1)
  x_new = trials[sel]
  dist_new = dists[sel]
  return x_new, dist_new, dist_new <= dist0


def _step_gradient(x, objective, grad, niter):
  """stepGradient: niter descent steps with the reference's early stop —
  once a step fails to improve, x freezes at that (worse) trial point and
  the failing step's value is returned (engine_collision_sdf.c:652-656)."""

  def body(carry, _):
    x, ret, done = carry
    x_new, dist_new, improved = _descent_step(x, objective, grad)
    x_out = jnp.where(done, x, x_new)
    ret_out = jnp.where(done, ret, dist_new)
    done_out = done | ~improved
    return (x_out, ret_out, done_out), None

  init = (x, objective(x), jnp.zeros((), dtype=bool))
  (x, ret, _), _ = jax.lax.scan(body, init, None, length=niter)
  return x, ret


def _corners(aabb):
  """(8, 3) corners of a (6,) center+half aabb (mjm.geom_aabb layout)."""
  c, h = aabb[:3], aabb[3:]
  sgn = np.array([[(-1, 1)[(i >> k) & 1] for k in range(3)]
                  for i in range(8)], dtype=np.float64)
  return c[None, :] + sgn * h[None, :]


def sdf_collision(m: Model, d: Data, dist, pos, frame):
  """Fill the SDF contact slots (ContactMeta.sdfgroups)."""
  from mujoco_tpu.ops.collision_driver import make_frame
  dtype = d.qpos.dtype

  for grp in m.con.sdfgroups:
    g1, g2 = int(grp["g1"]), int(grp["g2"])
    adr, n = int(grp["adr"]), int(grp["n"])
    niter = int(grp["iterations"])

    # static local SDFs; size rows are traced (domain-randomizable) for
    # primitives, static params for plugin shapes
    k1, k2 = grp["kind1"], grp["kind2"]
    p1 = grp["params1"] if isinstance(k1, str) else m.geom_size[g1]
    p2 = grp["params2"] if isinstance(k2, str) else m.geom_size[g2]
    f1 = sdfmod.dist_fn(k1, p1)
    f2 = sdfmod.dist_fn(k2, p2)
    gr1 = sdfmod.grad_fn(k1, p1)
    gr2 = sdfmod.grad_fn(k2, p2)

    # x lives in g2's local frame; map to g1 local: y = A x + b
    R1 = d.geom_xmat[g1]
    R2 = d.geom_xmat[g2]
    A = R1.T @ R2
    b = R1.T @ (d.geom_xpos[g2] - d.geom_xpos[g1])

    def to1(x, A=A, b=b):
      return x @ A.T + b if x.ndim > 1 else A @ x + b

    def d_coll(x, f1=f1, f2=f2, to1=to1):
      Av = f2(x)
      Bv = f1(to1(x))
      return Av + Bv + jnp.abs(jnp.maximum(Av, Bv))

    def g_coll(x, f1=f1, f2=f2, gr1=gr1, gr2=gr2, to1=to1, A=A):
      Av = f2(x)
      Bv = f1(to1(x))
      gA = gr2(x)
      gB = gr1(to1(x)) @ A                     # chain rule back to g2 frame
      extra = jnp.where(Av > Bv, gA, gB)
      return gA + gB + jnp.where(jnp.maximum(Av, Bv) > 0, 1.0, -1.0) * extra

    def d_inter(x, f1=f1, f2=f2, to1=to1):
      return jnp.maximum(f2(x), f1(to1(x)))

    def g_inter(x, f1=f1, f2=f2, gr1=gr1, gr2=gr2, to1=to1, A=A):
      pick2 = f2(x) > f1(to1(x))
      return jnp.where(pick2, gr2(x), gr1(to1(x)) @ A)

    def g_mid(x, gr1=gr1, gr2=gr2, to1=to1, A=A):
      n2 = mjm.normalize(gr2(x))
      n1 = mjm.normalize(gr1(to1(x)) @ A)
      return mjm.normalize(n2 - n1)

    # start points: Halton samples of the intersected AABB in g1's frame
    # (mjc_SDF, engine_collision_sdf.c:1069-1141), mapped to g2's frame
    c1 = jnp.asarray(_corners(grp["aabb1"]), dtype=dtype)      # g1 frame
    c2 = jnp.asarray(_corners(grp["aabb2"]), dtype=dtype) @ A.T + b
    lo = jnp.maximum(c1.min(axis=0), c2.min(axis=0))
    hi = jnp.minimum(c1.max(axis=0), c2.max(axis=0))
    degenerate = jnp.any(hi < lo)
    h = jnp.stack([jnp.asarray(_halton(n, 2), dtype=dtype),
                   jnp.asarray(_halton(n, 3), dtype=dtype),
                   jnp.asarray(_halton(n, 5), dtype=dtype)], axis=1)
    starts1 = lo[None, :] + (hi - lo)[None, :] * h                # g1 frame
    starts = (starts1 - b[None, :]) @ A                           # g2 frame

    def solve_one(x0):
      x, _ = _step_gradient(x0, d_coll, g_coll, niter)
      x, dd = _step_gradient(x, d_inter, g_inter, 1)
      nrm = g_mid(x)
      return x, dd, nrm

    xs, dds, nrms = jax.vmap(solve_one)(starts)
    # NaN/inf guard (stepGradient's sanity check returns mjMAXVAL): park the
    # slot far away instead of letting NaN leak into masked-but-computed
    # constraint rows
    bad = ~(jnp.all(jnp.isfinite(xs), axis=1) & jnp.isfinite(dds)
            & jnp.all(jnp.isfinite(nrms), axis=1))
    xs = jnp.where(bad[:, None], 0.0, xs)
    nrms = jnp.where(bad[:, None], jnp.array([0.0, 0.0, 1.0], dtype=dtype),
                     nrms)
    dds = jnp.where(bad, 1e10, dds)
    # no AABB overlap → no contacts this step (the reference returns early)
    dds = jnp.where(degenerate, 1e10, dds)
    # exact-duplicate removal (isknown, engine_collision_sdf.c:532): drop a
    # point if an earlier one converged to (numerically) the same location
    diff = jnp.sum((xs[:, None, :] - xs[None, :, :]) ** 2, axis=-1)
    earlier = np.tril(np.ones((n, n), dtype=bool), -1)
    dup = jnp.any((diff < mjm.MINVAL ** 2) & jnp.asarray(earlier), axis=1)
    dds = jnp.where(dup, 1e10, dds)
    # degenerate normals are skipped (addPreContact)
    nlen = mjm.norm_safe(nrms)
    dds = jnp.where(nlen < mjm.MINVAL, 1e10, dds)

    # world contacts: normal INTO the SDF (flipNormal=0 → scaled by -1)
    nrm_w = -(nrms @ R2.T)
    pos_w = xs @ R2.T + d.geom_xpos[g2][None, :] \
        - 0.5 * dds[:, None] * nrm_w

    sl = slice(adr, adr + n)
    dist = dist.at[sl].set(dds)
    pos = pos.at[sl].set(pos_w)
    frame = frame.at[sl].set(
        make_frame(nrm_w, jnp.zeros((n, 3), dtype=dtype)))

  return dist, pos, frame
