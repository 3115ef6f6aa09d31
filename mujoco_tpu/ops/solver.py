"""Constraint solvers: primal Newton (flagship) and CG, fully batched.

Counterpart of mj_solNewton / mj_solCG (/root/reference/src/engine/engine_solver.c),
solving the convex primal problem over qacc (doc/computation eq:primal):

  min_x  0.5 (x − a_s)ᵀ M (x − a_s) + Σ_i s_i(jar_i),   jar = J x − aref

with s_i the per-row penalty from the reference's constraint state machine
(mj_constraintUpdate_impl, engine_core_constraint.c:3275): quadratic for
equality, huber-like for friction rows, one-sided quadratic for
limits/contacts (pyramidal), and the elliptic cone's three-zone
(satisfied/middle/bottom) penalty with its dense cone Hessian.

Everything is fixed-shape: inactive rows carry D = 0 so they vanish from
cost, gradient and Hessian. The Newton iteration (Hessian assembly +
Cholesky + exact linesearch) is the per-env hot loop the MXU eats: H is
nv×nv dense, assembled as M + (J ⊙ w)ᵀ J in one matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import ConeType, Data, DisableBit, Model, SolverType
from mujoco_tpu.utils import math as mjm


class _Ctx(NamedTuple):
  force: jax.Array       # (nefc,)
  cost: jax.Array        # ()
  quad_w: jax.Array      # (nefc,) diagonal Hessian weights (D for quadratic)
  cone_mid: jax.Array    # (ncon,) bool: elliptic middle zone


def _update(m: Model, d: Data, jar):
  """Constraint state machine → (force, cost, Hessian weights, cone state).

  Mirrors mj_constraintUpdate_impl exactly; all-where, no branches.
  """
  meta = m.efc
  dtype = jar.dtype
  D = d.efc_D
  R = d.efc_R
  fl = d.efc_frictionloss

  ne, nf = meta.ne, meta.nf
  is_eq = np.zeros(meta.nefc, dtype=bool)
  is_eq[:ne] = True
  is_fric = np.zeros(meta.nefc, dtype=bool)
  is_fric[ne:ne + nf] = True
  is_con = np.zeros(meta.nefc, dtype=bool)
  is_con[ne + nf + meta.nl:] = True
  is_eq = jnp.asarray(is_eq)
  is_fric = jnp.asarray(is_fric)

  force = -D * jar
  quad_cost = 0.5 * D * jar * jar
  quad_w = D

  # friction rows: linear outside ±R·floss
  lin_neg = is_fric & (jar <= -R * fl)
  lin_pos = is_fric & (jar >= R * fl)
  lin = lin_neg | lin_pos
  fric_cost = -0.5 * R * fl * fl + fl * jnp.abs(jar)
  force = jnp.where(lin_neg, fl, jnp.where(lin_pos, -fl, force))
  cost_row = jnp.where(lin, fric_cost, quad_cost)
  quad_w = jnp.where(lin, 0.0, quad_w)

  # one-sided rows (limits + contacts under pyramidal; elliptic handled below)
  one_sided = np.zeros(meta.nefc, dtype=bool)
  one_sided[ne + nf:] = True
  elliptic = int(m.opt.cone) == int(ConeType.ELLIPTIC)
  if elliptic and meta.ncon_rows:
    # frictional elliptic contacts use the cone zones; frictionless contact
    # rows remain one-sided even under the elliptic cone
    con_rows = np.arange(meta.ne + meta.nf + meta.nl, meta.nefc)
    one_sided[con_rows] = m.con.condim[meta.con_id] == 1
  one_sided = jnp.asarray(one_sided)
  satisfied = one_sided & (jar >= 0)
  force = jnp.where(satisfied, 0.0, force)
  cost_row = jnp.where(satisfied, 0.0, cost_row)
  quad_w = jnp.where(satisfied, 0.0, quad_w)

  cone_mid = jnp.zeros((m.con.ncon,), dtype=bool)
  if elliptic and meta.ncon_rows:
    base = ne + nf + meta.nl
    cid = meta.con_id
    crow = meta.con_row
    mu = d.contact.mu                                  # (ncon,)
    fri = d.contact.friction                           # (ncon, 5)
    # map rows to regularized cone space: U0 = jar_n·mu, Uj = jar_j·fri_j
    scale = jnp.where(jnp.asarray(crow == 0), mu[jnp.asarray(cid)],
                      fri[jnp.asarray(cid), np.clip(crow - 1, 0, 4)])
    u = jar[base:] * scale
    # per-slot N and T via segment reductions on static maps
    ncon = m.con.ncon
    seg = jnp.asarray(cid)
    u0 = jnp.zeros((ncon,), dtype=dtype).at[seg].add(
        jnp.where(jnp.asarray(crow == 0), u, 0.0))
    t2 = jnp.zeros((ncon,), dtype=dtype).at[seg].add(
        jnp.where(jnp.asarray(crow == 0), 0.0, u * u))
    t_raw = jnp.sqrt(jnp.maximum(t2, mjm.MINVAL * mjm.MINVAL))
    n_ = u0
    active_slot = (d.contact.dist < d.contact.includemargin) & (
        jnp.asarray(m.con.condim[np.arange(ncon)] > 1))
    # zones
    top = (n_ >= mu * t_raw) | ((t_raw <= mjm.MINVAL) & (n_ >= 0))
    bottom = (mu * n_ + t_raw <= 0) | ((t_raw <= mjm.MINVAL) & (n_ < 0))
    mid = ~top & ~bottom & active_slot
    t = jnp.where(mid, t_raw, 1.0)  # safe denominator outside middle zone

    d0 = d.efc_D[jnp.asarray(meta.con_efcadr)]          # D of normal rows
    dm = d0 / jnp.maximum(mu * mu * (1 + mu * mu), mjm.MINVAL)
    nmt = n_ - mu * t

    # rows of frictionless contacts keep one-sided handling; frictional rows:
    fric_row = jnp.asarray(m.con.condim[cid] > 1)
    top_r = top[seg] & fric_row
    mid_r = mid[seg] & fric_row
    bot_r = bottom[seg] & fric_row

    # bottom zone: quadratic (already computed); top: zero; middle: cone
    f_mid_n = -dm * nmt * mu                            # per slot
    # tangential: force_j = -f_n/T·U_j·fri_j
    f_mid = jnp.where(jnp.asarray(crow == 0)[..., None] if False else
                      jnp.asarray(crow == 0),
                      f_mid_n[seg],
                      -f_mid_n[seg] / t[seg] * u * scale)
    force_con = force[base:]
    force_con = jnp.where(top_r, 0.0, force_con)
    force_con = jnp.where(mid_r, f_mid, force_con)
    force = force.at[base:].set(force_con)

    cost_con = cost_row[base:]
    cost_con = jnp.where(top_r, 0.0, cost_con)
    # middle-zone cost: assigned to the normal row only
    cost_mid = 0.5 * dm * nmt * nmt
    cost_con = jnp.where(mid_r, jnp.where(jnp.asarray(crow == 0),
                                          cost_mid[seg], 0.0), cost_con)
    cost_row = cost_row.at[base:].set(cost_con)

    w_con = quad_w[base:]
    w_con = jnp.where(top_r | mid_r, 0.0, w_con)  # middle handled via blocks
    quad_w = quad_w.at[base:].set(w_con)
    cone_mid = mid

  # equality rows are always quadratic — force/cost/w already correct
  cost = jnp.sum(cost_row)
  return _Ctx(force=force, cost=cost, quad_w=quad_w, cone_mid=cone_mid)


def _cone_hessian_blocks(m: Model, d: Data, jar, cone_mid):
  """Elliptic middle-zone cone Hessian contribution Hx = Σ Jcᵀ Hc Jc.

  Returns a function hvp(J) → (nv, nv) addition, implemented with static
  per-slot slices (ncon is static and modest)."""
  meta = m.efc
  base = meta.ne + meta.nf + meta.nl
  dtype = jar.dtype
  h_add = jnp.zeros((m.nv, m.nv), dtype=dtype)
  mu_all = d.contact.mu
  for c in range(m.con.ncon):
    dim = int(m.con.condim[c])
    if dim == 1:
      continue
    adr = int(meta.con_efcadr[c])
    jc = d.efc_J[adr:adr + dim]                       # (dim, nv)
    mu = mu_all[c]
    fri = d.contact.friction[c, :dim - 1]
    scale = jnp.concatenate([mu[None], fri])
    u = jar[adr:adr + dim] * scale
    # safe denominator: outside the middle zone t is unused — replace with 1
    # so t³ can't underflow into inf·0 = NaN under the where mask
    t_raw = jnp.sqrt(jnp.maximum(jnp.sum(u[1:] ** 2), mjm.MINVAL ** 2))
    t = jnp.where(cone_mid[c], t_raw, 1.0)
    n_ = u[0]
    d0 = d.efc_D[adr]
    dm = d0 / jnp.maximum(mu * mu * (1 + mu * mu), mjm.MINVAL)

    # cone Hessian in U space (mj_constraintUpdate_impl flg_coneHessian)
    hc = jnp.zeros((dim, dim), dtype=dtype)
    hc = hc.at[0, 0].set(1.0)
    hc = hc.at[0, 1:].set(-mu / t * u[1:])
    hc = hc.at[1:, 0].set(-mu / t * u[1:])
    outer = (mu * n_ / t ** 3) * jnp.outer(u[1:], u[1:])
    diag_add = (mu * mu - mu * n_ / t) * jnp.eye(dim - 1, dtype=dtype)
    hc = hc.at[1:, 1:].set(outer + diag_add)
    hc = dm * (scale[:, None] * hc * scale[None, :])

    mask = cone_mid[c].astype(dtype)
    h_add = h_add + mask * (jc.T @ hc @ jc)
  return h_add


def _eval_phi(m: Model, d: Data, jar0, jp, gx0, pmp, alpha):
  """φ'(α), φ''(α) for the linesearch along direction p.

  gx0 = pᵀM(x−a_s), pmp = pᵀMp, jp = J p, jar0 = J x − aref.
  """
  jar = jar0 + alpha * jp
  ctx = _update(m, d, jar)
  dphi = gx0 + alpha * pmp - jnp.dot(jp, ctx.force)
  ddphi = pmp + jnp.sum(ctx.quad_w * jp * jp)
  if int(m.opt.cone) == int(ConeType.ELLIPTIC) and m.con.ncon:
    # add cone curvature along jp
    meta = m.efc
    for c in range(m.con.ncon):
      dim = int(m.con.condim[c])
      if dim == 1:
        continue
      adr = int(meta.con_efcadr[c])
      mu = d.contact.mu[c]
      fri = d.contact.friction[c, :dim - 1]
      scale = jnp.concatenate([mu[None], fri])
      u = jar[adr:adr + dim] * scale
      du = jp[adr:adr + dim] * scale
      t = jnp.where(ctx.cone_mid[c],
                    jnp.sqrt(jnp.maximum(jnp.sum(u[1:] ** 2),
                                         mjm.MINVAL ** 2)), 1.0)
      n_ = u[0]
      d0 = d.efc_D[adr]
      dm = d0 / jnp.maximum(mu * mu * (1 + mu * mu), mjm.MINVAL)
      dt = jnp.dot(u[1:], du[1:]) / t
      dn = du[0]
      nmt = n_ - mu * t
      # second derivative of 0.5·Dm·(N−µT)² along du, incl. T curvature
      dT2 = (jnp.sum(du[1:] ** 2) - dt * dt) / t
      curv = dm * ((dn - mu * dt) ** 2 - nmt * mu * dT2)
      mask = ctx.cone_mid[c].astype(jar.dtype)
      ddphi = ddphi + mask * curv
  return dphi, ddphi, ctx


def _linesearch(m: Model, d: Data, jar0, jp, gx0, pmp):
  """Bracketed safeguarded Newton on φ'(α) = 0 (PrimalSearch,
  engine_solver.c:1852): pure Newton steps while the slope stays negative
  (one-sided expansion); once the slope changes sign the bracket [lo, hi]
  is maintained and proposals falling outside it are replaced by bisection.
  This keeps exact-Newton behavior on smooth stretches while staying robust
  at the piecewise-quadratic kinks where many rows switch state at once
  (e.g. duplicate flex contacts)."""
  dtype = jar0.dtype
  ls_iter = int(m.opt.ls_iterations)
  big = jnp.asarray(jnp.inf, dtype=dtype)

  def body(_, carry):
    lo, hi, has_hi, alpha = carry
    dphi, ddphi, _ = _eval_phi(m, d, jar0, jp, gx0, pmp, alpha)
    neg = dphi < 0
    lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
    hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
    has_hi = has_hi | ~neg
    prop = alpha - dphi / jnp.maximum(ddphi, mjm.MINVAL)
    mid = 0.5 * (lo + jnp.where(has_hi, hi, lo))
    # plain Newton proposals are kept whenever they stay inside the known
    # bracket, INCLUSIVE (exact-Newton behavior on smooth stretches — a
    # converged proposal sits exactly on a bracket edge and must be kept);
    # only escapes fall back to bisection
    ok = (prop >= lo) & (prop <= hi)
    alpha_next = jnp.where(ok, prop, jnp.where(has_hi, mid, prop))
    return lo, hi, has_hi, alpha_next

  carry = (jnp.zeros((), dtype=dtype), big, jnp.zeros((), dtype=bool),
           jnp.zeros((), dtype=dtype))
  lo, hi, has_hi, alpha = jax.lax.fori_loop(0, ls_iter, body, carry)
  return jnp.maximum(alpha, 0.0)


def solve(m: Model, d: Data) -> Data:
  """Newton/CG/PGS solve → qacc, qfrc_constraint, efc_force
  (mj_fwdConstraint tail, engine_forward.c:1151). Multi-tree models under
  Newton + pyramidal dispatch to the island-decomposed solve (ops/island.py,
  the solveIslandTask analog, engine_forward.c:1190-1226)."""
  if int(m.opt.solver) == int(SolverType.PGS):
    return solve_pgs(m, d)
  from mujoco_tpu.ops import island as _island
  if _island.use_islands(m):
    x, force, niter, solver_stat = _island.solve_core(m, d)
    if int(m.opt.noslip_iterations) > 0:
      from mujoco_tpu.ops import linalg_tpu
      force = _noslip(m, d, force)
      qfrc = d.efc_J.T @ force
      x = d.qacc_smooth + linalg_tpu.spd_solve(d.qM, qfrc)
    else:
      qfrc = d.efc_J.T @ force
    return d.replace(qacc=x, efc_force=force, qfrc_constraint=qfrc,
                     solver_niter=niter, solver_stat=solver_stat)
  return _monolithic_solve(m, d)


def monolithic_core(m: Model, d: Data):
  """Monolithic Newton/CG core returning (qacc, efc_force, niter, stat) —
  also the lax.cond fallback branch for island budget overflow."""
  return _core(m, d)


def _use_newton_kernel(m: Model) -> bool:
  """The whole-solve Pallas megakernel (ops/newton_tpu) covers the
  static-unroll Newton regime: pyramidal cone (or frictionless contacts),
  iterations ≤ 4, monolithic. Elsewhere the general XLA path runs."""
  from mujoco_tpu.ops import newton_tpu
  return (newton_tpu.enabled()
          and int(m.opt.solver) == int(SolverType.NEWTON)
          and int(m.opt.iterations) <= 4
          and not (int(m.opt.cone) == int(ConeType.ELLIPTIC)
                   and m.con.ncon > 0)
          and m.efc.nefc > 0)


def _kernel_solve(m: Model, d: Data):
  """Dispatch the full Newton solve to the lane-mapped megakernel."""
  from mujoco_tpu.ops import newton_tpu
  meta = m.efc
  dtype = d.qpos.dtype
  fric = np.zeros(meta.nefc, dtype=np.float64)
  fric[meta.ne:meta.ne + meta.nf] = 1.0
  ones = np.zeros(meta.nefc, dtype=np.float64)
  ones[meta.ne + meta.nf:] = 1.0
  warm = (d.qacc_smooth if m.disabled(DisableBit.WARMSTART)
          else d.qacc_warmstart)
  meaninertia = jnp.maximum(m.stat_meaninertia, mjm.MINVAL)
  reg = (1e-12 if dtype == jnp.float64 else 1e-6) * meaninertia
  return newton_tpu.newton_pyramidal(
      d.efc_J, d.efc_aref, d.efc_D, d.efc_R, d.efc_frictionloss,
      fric, ones, d.qM, d.qacc_smooth, warm, reg,
      int(m.opt.iterations), int(m.opt.ls_iterations))


def _monolithic_solve(m: Model, d: Data) -> Data:
  if _use_newton_kernel(m):
    # the kernel emits real per-iteration [improvement, cost] diagnostics
    # (computed in-kernel from quantities the solve already holds)
    x, force, qfrc, solver_stat = _kernel_solve(m, d)
    niter = jnp.asarray(int(m.opt.iterations), dtype=jnp.int32)
  else:
    x, force, niter, solver_stat = _core(m, d)
    qfrc = None
  if int(m.opt.noslip_iterations) > 0:
    # noslip post-pass applies to all solvers (mj_fwdConstraint tail)
    from mujoco_tpu.ops import linalg_tpu
    force = _noslip(m, d, force)
    qfrc = d.efc_J.T @ force
    x = d.qacc_smooth + linalg_tpu.spd_solve(d.qM, qfrc)
  elif qfrc is None:
    qfrc = d.efc_J.T @ force
  return d.replace(qacc=x, efc_force=force, qfrc_constraint=qfrc,
                   solver_niter=niter, solver_stat=solver_stat)


def _core(m: Model, d: Data):
  dtype = d.qpos.dtype
  nv = m.nv

  aref = d.efc_aref
  J = d.efc_J
  a_s = d.qacc_smooth
  M = d.qM

  def cost_of(x):
    return _update(m, d, J @ x - aref).cost + 0.5 * jnp.dot(
        x - a_s, M @ (x - a_s))

  # warmstart comparison (engine_forward.c:1167-1177)
  if m.disabled(DisableBit.WARMSTART):
    x0 = a_s
  else:
    c_warm = cost_of(d.qacc_warmstart)
    c_smooth = cost_of(a_s)
    x0 = jnp.where(c_warm < c_smooth, d.qacc_warmstart, a_s)

  meaninertia = jnp.maximum(m.stat_meaninertia, mjm.MINVAL)
  tol = m.opt.tolerance * meaninertia * max(1, nv)

  use_newton = int(m.opt.solver) != int(SolverType.CG)

  def newton_step(x):
    jar = J @ x - aref
    ctx = _update(m, d, jar)
    # full objective at x (constraint penalty + Gauss quadratic) — the
    # convergence test compares successive full costs; constraint cost alone
    # would mis-measure improvement and stop early
    cost_x = ctx.cost + 0.5 * jnp.dot(x - a_s, M @ (x - a_s))
    grad = M @ (x - a_s) - J.T @ ctx.force
    jw = J * ctx.quad_w[:, None]
    h = M + jw.T @ J
    if int(m.opt.cone) == int(ConeType.ELLIPTIC) and m.con.ncon:
      h = h + _cone_hessian_blocks(m, d, jar, ctx.cone_mid)
    # regularize lightly for f32 robustness
    h = h + jnp.eye(nv, dtype=dtype) * (1e-12 if dtype == jnp.float64
                                        else 1e-6) * meaninertia
    from mujoco_tpu.ops import linalg_tpu
    p = -linalg_tpu.spd_solve(h, grad)
    jp = J @ p
    gx0 = jnp.dot(p, M @ (x - a_s))
    pmp = jnp.dot(p, M @ p)
    alpha = _linesearch(m, d, jar, jp, gx0, pmp)
    return x + alpha * p, cost_x, grad

  def cg_step(carry):
    x, g_prev, dir_prev, first = carry
    jar = J @ x - aref
    ctx = _update(m, d, jar)
    grad = M @ (x - a_s) - J.T @ ctx.force
    # preconditioned by M⁻¹ (Polak-Ribière), via the tree L'DL' factor
    from mujoco_tpu.ops import smooth
    mgrad = smooth.solve_m(m, d, grad)
    beta = jnp.maximum(
        0.0, jnp.dot(grad - g_prev, mgrad)
        / jnp.maximum(jnp.dot(g_prev, smooth.solve_m(m, d, g_prev)),
                      mjm.MINVAL))
    p = jnp.where(first, -mgrad, -mgrad + beta * dir_prev)
    jp = J @ p
    gx0 = jnp.dot(p, M @ (x - a_s))
    pmp = jnp.dot(p, M @ p)
    alpha = _linesearch(m, d, jar, jp, gx0, pmp)
    return x + alpha * p, grad, p, jnp.zeros((), dtype=bool)

  iterations = int(m.opt.iterations)

  def loop_body(carry, need_improvement=True):
    x, prev_cost, _, it, g_prev, dir_prev, first = carry
    if use_newton:
      x_new, cost_old, grad = newton_step(x)
      g_new, dir_new, first_new = g_prev, dir_prev, first
    else:
      x_new, g_new, dir_new, first_new = cg_step((x, g_prev, dir_prev, first))
      grad = g_new
    if need_improvement:
      # post-step full cost: the stop test compares THIS iteration's
      # improvement, matching the reference's end-of-iteration break
      # (engine_solver.c saveStats/termination) — a lagged comparison would
      # run one extra iteration and drift from the oracle's trajectory
      cost = cost_of(x_new)
    else:
      cost = prev_cost  # static-unroll path: never inspected
    improvement = prev_cost - cost
    return x_new, cost, improvement, it + 1, g_new, dir_new, first_new

  def loop_cond(carry):
    _, _, improvement, it, *_ = carry
    return (it < iterations) & (improvement > tol)

  big = jnp.asarray(jnp.inf, dtype=dtype)
  init_cost = cost_of(x0)
  carry = (x0, init_cost, big, jnp.zeros((), jnp.int32),
           jnp.zeros((nv,), dtype=dtype), jnp.zeros((nv,), dtype=dtype),
           jnp.ones((), dtype=bool))
  solver_stat = jnp.zeros((32, 2), dtype=dtype)
  if iterations <= 4:
    # small fixed budgets (the benchmark regime): static unroll — no
    # while_loop barrier or convergence bookkeeping, lets XLA fuse across
    # the whole solve
    for _ in range(iterations):
      carry = loop_body(carry, need_improvement=False)
    x, cost, _, niter, *_ = carry
  elif iterations <= 32:
    # bounded scan with a convergence freeze: fixed trip count, so
    # reverse-mode AD works (MJX's scan-based while_loop,
    # mjx/_src/solver.py:239); emits per-iteration [improvement, cost]
    # diagnostics (mjSolverStat analog, mjdata.h:86)
    def scan_body(c, _):
      keep = loop_cond(c)
      new = loop_body(c)
      c = jax.tree.map(lambda a, b: jnp.where(keep, b, a), c, new)
      stat = jnp.where(keep, jnp.stack([new[2], new[1]]), 0.0)
      return c, stat
    carry, stats = jax.lax.scan(scan_body, carry, None, length=iterations)
    solver_stat = solver_stat.at[:iterations].set(stats)
    x, cost, _, niter, *_ = carry
  else:
    # large budgets: early-exit while_loop (not reverse-differentiable —
    # use iterations ≤ 32 for training setups, as MJX models do)
    x, cost, _, niter, *_ = jax.lax.while_loop(loop_cond, loop_body, carry)

  jar = J @ x - aref
  ctx = _update(m, d, jar)
  return x, ctx.force, niter, solver_stat


# ---------------------------------------------------------------------------
# PGS (dual projected Gauss-Seidel) + noslip post-pass
# ---------------------------------------------------------------------------


def _row_bounds(m: Model, d: Data):
  """Per-row projection interval for the dual forces: equality rows free,
  friction rows ±frictionloss, limit/contact (pyramidal/frictionless) rows
  ≥ 0; inactive rows pinned to 0."""
  meta = m.efc
  dtype = d.qpos.dtype
  big = jnp.asarray(jnp.inf, dtype=dtype)
  lo = jnp.zeros((meta.nefc,), dtype=dtype)
  hi = jnp.full((meta.nefc,), big, dtype=dtype)
  ne, nf = meta.ne, meta.nf
  lo = lo.at[:ne].set(-big)
  lo = lo.at[ne:ne + nf].set(-d.efc_frictionloss[ne:ne + nf])
  hi = hi.at[ne:ne + nf].set(d.efc_frictionloss[ne:ne + nf])
  lo = jnp.where(d.efc_active, lo, 0.0)
  hi = jnp.where(d.efc_active, hi, 0.0)
  return lo, hi


def solve_pgs(m: Model, d: Data) -> Data:
  """Dual PGS (solPGS, engine_solver.c:457), pyramidal and elliptic cones.

  Deterministic sweep order (the reference shuffles with a fixed-seed PCG32;
  the dual objective is strictly convex so both converge to the same forces).
  AR = J M⁻¹ Jᵀ + diag(R) is assembled dense once; scalar rows are one
  dynamic-sliced dot per Gauss-Seidel update inside a fori_loop. Elliptic
  contacts update as blocks: the reference's normal-or-ray step followed by
  the fixed-normal friction QCQP over the ellipsoid
  (engine_solver.c:605-677, solveQCQP:402).
  """
  from mujoco_tpu.ops import smooth
  dtype = d.qpos.dtype
  meta = m.efc
  nefc = meta.nefc
  elliptic = int(m.opt.cone) == int(ConeType.ELLIPTIC)

  # PGS needs the multi-rhs M-solve; build the tree factor here (fwd_position
  # skips it for non-CG solvers)
  d = smooth.factor_m(m, d)
  J = d.efc_J
  minvjt = smooth.solve_m(m, d, J)              # (nefc, nv) rows M⁻¹Jᵀ cols
  ar = J @ minvjt.T + jnp.diag(d.efc_R)
  b = J @ d.qacc_smooth - d.efc_aref
  ar_diag = jnp.diagonal(ar)
  arinv = jnp.where(d.efc_active & (ar_diag > mjm.MINVAL),
                    1.0 / jnp.maximum(ar_diag, mjm.MINVAL), 0.0)
  lo, hi = _row_bounds(m, d)

  def row_update(c, f):
    ar_row = jax.lax.dynamic_slice(ar, (c, 0), (1, nefc))[0]
    res = jnp.dot(ar_row, f) + b[c]
    fi = jnp.clip(f[c] - res * arinv[c], lo[c], hi[c])
    return f.at[c].set(fi)

  def elliptic_block(f, c):
    """One elliptic contact block (engine_solver.c:605-677)."""
    dim = int(m.con.condim[c])
    adr = int(meta.con_efcadr[c])
    active = d.efc_active[adr]
    if dim == 1:
      res = jnp.dot(ar[adr], f) + b[adr]
      fi = jnp.maximum(f[adr] - res * arinv[adr], 0.0)
      return f.at[adr].set(jnp.where(active, fi, f[adr]))
    athis = ar[adr:adr + dim, adr:adr + dim]
    res = ar[adr:adr + dim] @ f + b[adr:adr + dim]
    oldf = f[adr:adr + dim]
    # normal update (f_n ~ 0) or ray update along the current force
    fn_normal = jnp.maximum(oldf[0] - res[0] * arinv[adr], 0.0)
    v = oldf
    denom = jnp.dot(v, athis @ v)
    x = jnp.where(denom >= mjm.MINVAL,
                  -jnp.dot(v, res) / jnp.maximum(denom, mjm.MINVAL), 0.0)
    x = jnp.maximum(x, -1.0)            # keep the normal non-negative
    fray = oldf + x * v
    small = oldf[0] < mjm.MINVAL
    fnew0 = jnp.where(small, fn_normal, fray[0])
    # friction update with the normal fixed (QCQP over the ellipsoid)
    ac = athis[1:, 1:]
    bc = (res[1:] - ac @ oldf[1:] + athis[1:, 0] * (fnew0 - oldf[0]))
    mu_vec = d.contact.friction[c, :dim - 1]
    fr = _qcqp(ac, bc, mu_vec, fnew0)
    fr = jnp.where(fnew0 < mjm.MINVAL, jnp.zeros_like(fr), fr)
    block = jnp.concatenate([fnew0[None], fr])
    block = jnp.where(active, block, oldf)
    return f.at[adr:adr + dim].set(block)

  ncon_start = int(meta.con_efcadr[0]) if (elliptic and m.con.ncon) else nefc

  def sweep(f):
    f = jax.lax.fori_loop(0, ncon_start, row_update, f)
    if elliptic:
      for c in range(m.con.ncon):
        f = elliptic_block(f, c)
    return f

  # dual cost for honest convergence reporting (solPGS accumulates per-row
  # costChange into `improvement`, scales by 1/(meaninertia·max(1,nv)), and
  # stops at opt.tolerance — engine_solver.c:683-720); a converged sweep
  # freezes f so the fixed budget returns the same forces while
  # solver_niter/solver_stat report the true iteration count
  scale = 1.0 / (jnp.maximum(m.stat_meaninertia, mjm.MINVAL)
                 * max(1, int(m.nv)))

  def cost_of(f):
    return 0.5 * jnp.dot(f, ar @ f) + jnp.dot(f, b)

  iterations = int(m.opt.iterations)
  tol = m.opt.tolerance

  def scan_body(carry, _):
    f, prev_cost, niter, live = carry
    f_new = sweep(f)
    cost = cost_of(f_new)
    improvement = (prev_cost - cost) * scale
    f_out = jnp.where(live, f_new, f)
    cost_out = jnp.where(live, cost, prev_cost)
    niter_out = niter + jnp.where(live, 1, 0)
    live_out = live & (improvement >= tol)
    stat = jnp.where(live, jnp.stack([improvement, cost]), 0.0)
    return (f_out, cost_out, niter_out, live_out), stat

  f0 = jnp.zeros((nefc,), dtype=dtype)
  carry = (f0, cost_of(f0), jnp.zeros((), jnp.int32),
           jnp.ones((), dtype=bool))
  (f, _, niter, _), stats = jax.lax.scan(scan_body, carry, None,
                                         length=iterations)
  solver_stat = jnp.zeros((32, 2), dtype=dtype)
  solver_stat = solver_stat.at[:min(iterations, 32)].set(
      stats[:min(iterations, 32)])

  if int(m.opt.noslip_iterations) > 0:
    f = _noslip(m, d, f)

  qfrc = J.T @ f
  qacc = d.qacc_smooth + smooth.solve_m(m, d, qfrc)
  return d.replace(qacc=qacc, efc_force=f, qfrc_constraint=qfrc,
                   solver_niter=niter, solver_stat=solver_stat)


def _qcqp(ac, bc, mu_vec, r):
  """Solve min ½xᵀAx + xᵀb s.t. Σ(x_i/µ_i)² ≤ r² (mju_QCQP/QCQP2/QCQP3,
  engine_util_solve.c:1189-1338): Newton iteration on the Lagrange
  multiplier λ of the scaled problem, fixed 20 iterations with freeze-on-
  convergence masks mirroring the reference's break conditions."""
  n = ac.shape[0]
  dtype = ac.dtype
  scale = mu_vec
  a_s = ac * scale[:, None] * scale[None, :]
  b_s = bc * scale

  def body(_, carry):
    la, done = carry
    p = jnp.linalg.inv(a_s + la * jnp.eye(n, dtype=dtype))
    det = jnp.linalg.det(a_s + la * jnp.eye(n, dtype=dtype))
    bad = det < 1e-10
    v = -(p @ b_s)
    val = jnp.dot(v, v) - r * r
    deriv = -2.0 * jnp.dot(v, p @ v)
    delta = -val / jnp.where(jnp.abs(deriv) > mjm.MINVAL, deriv, mjm.MINVAL)
    stop = bad | (val < 1e-10) | (delta < 1e-10)
    la_new = jnp.where(done | stop, la, la + delta)
    return la_new, done | stop

  la0 = jnp.zeros((), dtype=dtype)
  la, _ = jax.lax.fori_loop(0, 20, body, (la0, jnp.zeros((), dtype=bool)))
  amat = a_s + la * jnp.eye(n, dtype=dtype)
  det = jnp.linalg.det(amat)
  bad = det < 1e-10
  v = -(jnp.linalg.inv(amat) @ b_s)
  # flg_active: λ != 0 → project exactly onto the ellipsoid
  # (projectEllipsoid with feasible=0, engine_solver.c:384)
  x = v * scale
  s = jnp.sum((x / jnp.maximum(scale, mjm.MINVAL)) ** 2)
  proj = x * jnp.sqrt(r * r / jnp.maximum(s, mjm.MINVAL))
  x = jnp.where(la != 0, proj, x)
  return jnp.where(bad, 0.0, x)


def _noslip(m: Model, d: Data, f):
  """Noslip post-pass (solNoSlip, engine_solver.c:767): unregularized
  Gauss-Seidel over friction rows — dry-friction rows individually; each
  pyramidal contact's opposing edge pairs jointly with the normal sum held
  fixed; each elliptic contact's friction block via a QCQP over the friction
  ellipsoid with the normal force held fixed (solveQCQP, engine_solver.c:402).
  """
  from mujoco_tpu.ops import smooth
  meta = m.efc
  ne, nf = meta.ne, meta.nf
  d = smooth.factor_m(m, d)  # fwd_position may have skipped the factor
  J = d.efc_J
  minvjt = smooth.solve_m(m, d, J)
  a_nor = J @ minvjt.T                            # A without R
  b = J @ d.qacc_smooth - d.efc_aref
  a_diag = jnp.diagonal(a_nor)
  ainv = jnp.where(d.efc_active & (a_diag > mjm.MINVAL),
                   1.0 / jnp.maximum(a_diag, mjm.MINVAL), 0.0)
  floss = d.efc_frictionloss
  elliptic = int(m.opt.cone) == int(ConeType.ELLIPTIC)

  # static pyramidal edge-pair table: (row_j, row_j+1) per opposing pair
  # (pyramidal contacts have 2·(dim−1) rows; elliptic have dim rows and are
  # handled by the QCQP branch below instead)
  pairs = []
  if not elliptic:
    for c in range(m.con.ncon):
      dim = int(m.con.condim[c])
      if dim == 1:
        continue
      adr = int(meta.con_efcadr[c])
      for j in range(adr, adr + 2 * (dim - 1), 2):
        pairs.append(j)
  pairs = np.array(pairs, dtype=np.int32)

  def one_iter(_, f):
    # dry friction rows
    def fric_update(c, f):
      res = jnp.dot(jax.lax.dynamic_slice(a_nor, (c, 0),
                                          (1, meta.nefc))[0], f) + b[c]
      fi = jnp.clip(f[c] - res * ainv[c], -floss[c], floss[c])
      return f.at[c].set(fi)
    f = jax.lax.fori_loop(ne, ne + nf, fric_update, f)

    # pyramidal pairs: minimize over y with f0 = mid+y, f1 = mid−y
    if len(pairs):
      pairs_j = jnp.asarray(pairs)

      def pair_update(k, f):
        j = pairs_j[k]
        zero = jnp.zeros((), dtype=j.dtype)
        a2 = jax.lax.dynamic_slice(a_nor, (j, zero), (2, meta.nefc))
        fj = jax.lax.dynamic_slice(f, (j,), (2,))
        res = a2 @ f + jax.lax.dynamic_slice(b, (j,), (2,))
        ac = jax.lax.dynamic_slice(a2, (zero, j), (2, 2))
        bc = res - ac @ fj
        mid = 0.5 * (fj[0] + fj[1])
        k1 = ac[0, 0] + ac[1, 1] - ac[0, 1] - ac[1, 0]
        k0 = mid * (ac[0, 0] - ac[1, 1]) + bc[0] - bc[1]
        y = jnp.clip(-k0 / jnp.maximum(k1, mjm.MINVAL), -mid, mid)
        good = k1 >= mjm.MINVAL
        f0 = jnp.where(good, mid + y, mid)
        f1 = jnp.where(good, mid - y, mid)
        return jax.lax.dynamic_update_slice(f, jnp.stack([f0, f1]), (j,))
      f = jax.lax.fori_loop(0, len(pairs), pair_update, f)

    # elliptic contacts: sequential Gauss-Seidel over contact slots, one QCQP
    # per contact (reference sweep order, engine_solver.c:891-925)
    if elliptic:
      for c in range(m.con.ncon):
        dim = int(m.con.condim[c])
        if dim == 1:
          continue
        adr = int(meta.con_efcadr[c])
        nfr = dim - 1
        fb = f[adr + 1:adr + dim]
        ac = a_nor[adr + 1:adr + dim, adr + 1:adr + dim]
        res = a_nor[adr + 1:adr + dim] @ f + b[adr + 1:adr + dim]
        bc = res - ac @ fb
        mu_vec = d.contact.friction[c, :nfr]
        r = f[adr]
        v = _qcqp(ac, bc, mu_vec, r)
        v = jnp.where(r < mjm.MINVAL, jnp.zeros_like(v), v)
        active = d.efc_active[adr]
        v = jnp.where(active, v, fb)
        f = f.at[adr + 1:adr + dim].set(v)
    return f

  return jax.lax.fori_loop(0, int(m.opt.noslip_iterations), one_iter, f)
