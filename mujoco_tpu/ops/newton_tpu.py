"""Whole-Newton-solve Pallas megakernel, batch on the 128-lane axis.

tools/profile_ablate.py measured the constraint solve at 59% of the
flagship step; the XLA implementation spends that time in many small ops
over (B, nefc, nv) arrays whose minor dims (nv≈27) waste 4/5 of the
128-lane tiles and round-trip HBM between every op. This kernel runs the
ENTIRE pyramidal Newton solve of mj_solNewton
(/root/reference/src/engine/engine_solver.c:1975, PrimalUpdate /
PrimalSearch / mj_constraintUpdate_impl, engine_core_constraint.c:3275)
for 128 environments at a time with everything resident in VMEM:

  warmstart-vs-smooth cost pick → [jar → row update → gradient →
  H = M + JᵀWJ → in-place LDL → direction → bracketed Newton linesearch →
  x ← x + αp] × iterations → final row update

HBM traffic is one read of (J, aref, D, R, fl, M, a_s, warm) and one write
of (x, force) per solve — the XLA path re-reads J from HBM ~6 times.

Semantics match ops/solver._core's static-unroll regime (iterations ≤ 4,
pyramidal cone, monolithic): no convergence test, niter = iterations.
AD: a custom_jvp falls back to the mathematically identical XLA body, so
jacfwd/grad through step() produce the unrolled-Newton derivatives the
differential tests pin down. Under vmap the custom_vmap rule dispatches to
the kernel on TPU and to vmapped XLA elsewhere (the ops/linalg_tpu.spd_solve
pattern).
"""

from __future__ import annotations

import functools
import os

import jax
from jax import custom_batching
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.utils import math as mjm

_LANES = 128


def enabled() -> bool:
  return os.environ.get("MJTPU_NEWTON_KERNEL", "1") == "1"


# ---------------------------------------------------------------------------
# shared row machinery (pyramidal): works on any trailing batch shape
# ---------------------------------------------------------------------------


def _row_update(jar, D, R, fl, fric, ones):
  """mj_constraintUpdate_impl for the pyramidal cone on raw row tensors.

  fric/ones are {0,1} float masks of friction(loss) and one-sided rows.
  Returns (force, cost_rows, quad_w); identical math to ops/solver._update.
  """
  force = -D * jar
  cost = 0.5 * D * jar * jar
  w = D
  rfl = R * fl
  lin_neg = (fric > 0) & (jar <= -rfl)
  lin_pos = (fric > 0) & (jar >= rfl)
  lin = lin_neg | lin_pos
  fric_cost = -0.5 * rfl * fl + fl * jnp.abs(jar)
  force = jnp.where(lin_neg, fl, jnp.where(lin_pos, -fl, force))
  cost = jnp.where(lin, fric_cost, cost)
  w = jnp.where(lin, 0.0, w)
  satisfied = (ones > 0) & (jar >= 0)
  force = jnp.where(satisfied, 0.0, force)
  cost = jnp.where(satisfied, 0.0, cost)
  w = jnp.where(satisfied, 0.0, w)
  return force, cost, w


# ---------------------------------------------------------------------------
# single-environment XLA body (fallback + AD semantics)
# ---------------------------------------------------------------------------


def _xla_newton(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg,
                iterations: int, ls_iter: int):
  """Reference implementation on raw tensors, one environment.

  Returns (x, force, qfrc, stat): stat is the (32, 2) mjSolverStat analog
  with [improvement, cost] per iteration (the quantities mj_solNewton's
  saveStats records, engine_solver.c) — real diagnostics, matching what the
  Pallas kernel emits."""
  dtype = a_s.dtype

  def cost_of(x):
    _, cost, _ = _row_update(J @ x - aref, D, R, fl, fric, ones)
    dx = x - a_s
    return jnp.sum(cost) + 0.5 * jnp.dot(dx, M @ dx)

  x = jnp.where(cost_of(warm) < cost_of(a_s), warm, a_s)

  costs = []
  for _ in range(iterations):
    jar = J @ x - aref
    force, cost_rows, w = _row_update(jar, D, R, fl, fric, ones)
    mdx = M @ (x - a_s)
    costs.append(jnp.sum(cost_rows) + 0.5 * jnp.dot(x - a_s, mdx))
    grad = mdx - J.T @ force
    h = M + (J * w[:, None]).T @ J
    h = h + jnp.eye(h.shape[0], dtype=dtype) * reg
    chol = jnp.linalg.cholesky(h)
    p = -jax.scipy.linalg.cho_solve((chol, True), grad[:, None])[:, 0]
    jp = J @ p
    gx0 = jnp.dot(p, mdx)
    pmp = jnp.dot(p, M @ p)
    alpha = _xla_linesearch(jar, jp, gx0, pmp, D, R, fl, fric, ones, ls_iter)
    x = x + alpha * p

  jar = J @ x - aref
  force, cost_rows, _ = _row_update(jar, D, R, fl, fric, ones)
  costs.append(jnp.sum(cost_rows)
               + 0.5 * jnp.dot(x - a_s, M @ (x - a_s)))
  stat = jnp.zeros((32, 2), dtype=dtype)
  stat = stat.at[:iterations].set(jnp.stack(
      [jnp.stack([costs[i] - costs[i + 1], costs[i + 1]])
       for i in range(iterations)]))
  return x, force, J.T @ force, stat


def _xla_linesearch(jar0, jp, gx0, pmp, D, R, fl, fric, ones, ls_iter: int):
  """Bracketed safeguarded Newton on φ'(α)=0 (ops/solver._linesearch)."""
  dtype = jar0.dtype
  big = jnp.asarray(jnp.inf, dtype=dtype)
  lo = jnp.zeros((), dtype=dtype)
  hi = big
  has_hi = jnp.zeros((), dtype=bool)
  alpha = jnp.zeros((), dtype=dtype)
  for _ in range(ls_iter):
    jar = jar0 + alpha * jp
    force, _, w = _row_update(jar, D, R, fl, fric, ones)
    dphi = gx0 + alpha * pmp - jnp.dot(jp, force)
    ddphi = pmp + jnp.sum(w * jp * jp)
    neg = dphi < 0
    lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
    hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
    has_hi = has_hi | ~neg
    prop = alpha - dphi / jnp.maximum(ddphi, mjm.MINVAL)
    mid = 0.5 * (lo + jnp.where(has_hi, hi, lo))
    ok = (prop >= lo) & (prop <= hi)
    alpha = jnp.where(ok, prop, jnp.where(has_hi, mid, prop))
  return jnp.maximum(alpha, 0.0)


# ---------------------------------------------------------------------------
# the Pallas kernel: one grid step = 128 environments
# ---------------------------------------------------------------------------


def _newton_kernel(J_ref, aref_ref, D_ref, R_ref, fl_ref, fric_ref, ones_ref,
                   M_ref, as_ref, warm_ref, reg_ref, x_ref, f_ref, qf_ref,
                   stat_ref, h_scr, wj_scr, nefc: int, nv: int,
                   iterations: int, ls_iter: int):
  D = D_ref[:]
  R = R_ref[:]
  fl = fl_ref[:]
  fric = fric_ref[:]
  ones = ones_ref[:]
  aref = aref_ref[:]
  a_s = as_ref[:]
  J = J_ref[:]                         # (nefc, nv, 128) resident value
  M = M_ref[:]                         # (nv, nv, 128)

  # contractions as whole-array multiply + 3D reduce: sliced operands carry
  # nonzero sublane offsets that Mosaic's reduce lowering rejects; the full
  # arrays have canonical zero-offset layouts on every dim
  def jmul(x):                         # (nv,128) -> (nefc,128)
    return jnp.sum(J * x[None, :, :], axis=1)

  def jtmul(f):                        # (nefc,128) -> (nv,128)
    return jnp.sum(J * f[:, None, :], axis=0)

  def mmul(x):                         # M @ x: (nv,128)
    return jnp.sum(M * x[None, :, :], axis=1)

  def update(jar):
    return _row_update(jar, D, R, fl, fric, ones)

  def cost_of(x, jar):
    _, cost, _ = update(jar)
    dx = x - a_s
    return jnp.sum(cost, axis=0) + 0.5 * jnp.sum(dx * mmul(dx), axis=0)

  # ---- warmstart-vs-smooth pick (engine_forward.c:1167-1177)
  warm = warm_ref[:]
  jar_w = jmul(warm) - aref
  jar_s = jmul(a_s) - aref
  pick = cost_of(warm, jar_w) < cost_of(a_s, jar_s)   # (128,)
  x = jnp.where(pick[None, :], warm, a_s)

  ii = jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
  jj = jax.lax.broadcasted_iota(jnp.int32, (1, nv, 1), 1)
  iv = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)

  costs = []  # per-iteration objective: real mjSolverStat diagnostics
  for _ in range(iterations):
    jar = jmul(x) - aref
    force, cost_rows, w = update(jar)
    mdx = mmul(x - a_s)
    costs.append(jnp.sum(cost_rows, axis=0)
                 + 0.5 * jnp.sum((x - a_s) * mdx, axis=0))
    grad = mdx - jtmul(force)

    # ---- H = M + JᵀWJ + reg·I: fori_loop over rows with dynamic REF loads
    # (Mosaic lowers dynamic indexing on the leading untiled dim; value
    # dynamic_slice is unsupported) — code size independent of nefc
    wj_scr[:] = w[:, None, :] * J                      # (nefc, nv, 128)

    def h_body(r, acc):
      col = wj_scr[r, :, :]                            # (nv, 128)
      row = J_ref[r, :, :]                             # (nv, 128)
      return acc + col[:, None, :] * row[None, :, :]

    reg = reg_ref[0, :]
    h0 = M_ref[:] + jnp.where(ii == jj, reg[None, None, :], 0.0)
    h_scr[:] = jax.lax.fori_loop(0, nefc, h_body, h0)

    # ---- in-place LDL factor (ops/linalg_tpu._ldl_solve_kernel)
    for k in range(nv):
      dk = h_scr[k, k, :]
      inv = 1.0 / dk
      colk = h_scr[:, k, :]
      rowk = h_scr[k, :, :]
      mask = jnp.logical_and(ii > k, jj > k)
      upd = colk[:, None, :] * rowk[None, :, :] * inv[None, None, :]
      h_scr[:] = h_scr[:] - jnp.where(mask, upd, 0.0)

    # ---- p = -H⁻¹ grad: forward solve, diagonal, back substitution
    y = -grad
    for k in range(nv):
      inv = 1.0 / h_scr[k, k, :]
      lcol = h_scr[:, k, :] * inv[None, :]
      y = y - jnp.where(iv > k, lcol * y[k, :][None, :], 0.0)
    dinv = jnp.stack([1.0 / h_scr[k, k, :] for k in range(nv)], axis=0)
    y = y * dinv
    for k in range(nv - 1, -1, -1):
      inv = 1.0 / h_scr[k, k, :]
      contrib = jnp.where(iv > k, h_scr[k, :, :] * y, 0.0)
      s = jnp.sum(contrib, axis=0) * inv
      y = jnp.where(iv == k, y - s[None, :], y)
    p = y

    # ---- linesearch on φ'(α)=0
    jp = jmul(p)
    gx0 = jnp.sum(p * mdx, axis=0)
    pmp = jnp.sum(p * mmul(p), axis=0)
    lo = jnp.zeros_like(gx0)
    hi = jnp.full_like(gx0, jnp.inf)
    has_hi = jnp.zeros(gx0.shape, dtype=bool)
    alpha = jnp.zeros_like(gx0)
    for _ in range(ls_iter):
      jar_a = jar + alpha[None, :] * jp
      force_a, _, w_a = update(jar_a)
      dphi = gx0 + alpha * pmp - jnp.sum(jp * force_a, axis=0)
      ddphi = pmp + jnp.sum(w_a * jp * jp, axis=0)
      neg = dphi < 0
      lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
      has_hi = has_hi | ~neg
      prop = alpha - dphi / jnp.maximum(ddphi, mjm.MINVAL)
      mid = 0.5 * (lo + jnp.where(has_hi, hi, lo))
      ok = (prop >= lo) & (prop <= hi)
      alpha = jnp.where(ok, prop, jnp.where(has_hi, mid, prop))
    alpha = jnp.maximum(alpha, 0.0)
    x = x + alpha[None, :] * p

  jar = jmul(x) - aref
  force, cost_rows, _ = update(jar)
  dx = x - a_s
  costs.append(jnp.sum(cost_rows, axis=0)
               + 0.5 * jnp.sum(dx * mmul(dx), axis=0))
  x_ref[:] = x
  f_ref[:] = force
  qf_ref[:] = jtmul(force)
  # rows [imp_0, cost_1, imp_1, cost_2, ...]: (B, iterations, 2) after the
  # host-side transpose+reshape
  rows = []
  for i in range(iterations):
    rows.append(costs[i] - costs[i + 1])
    rows.append(costs[i + 1])
  stat_ref[:] = jnp.stack(rows, axis=0)


def _newton_lanes(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg,
                  iterations: int, ls_iter: int, interpret: bool = False):
  """Batched solve with batch on the last axis (multiple of 128).

  J: (nefc, nv, B); aref/D/R/fl/fric/ones: (nefc, B); M: (nv, nv, B);
  a_s/warm: (nv, B); reg: (1, B). Returns x (nv, B), force (nefc, B),
  qfrc (nv, B), stat (2*iterations, B) with interleaved
  [improvement_i, cost_{i+1}] rows.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  nefc, nv, b = J.shape
  assert b % _LANES == 0, b
  grid = (b // _LANES,)
  kernel = functools.partial(_newton_kernel, nefc=nefc, nv=nv,
                             iterations=iterations, ls_iter=ls_iter)

  def rows(i):
    return (0, i)

  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((nefc, nv, _LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, nv, _LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((1, _LANES), rows, memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((nv, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nefc, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, _LANES), rows, memory_space=pltpu.VMEM),
          pl.BlockSpec((2 * iterations, _LANES), rows,
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((nv, b), J.dtype),
          jax.ShapeDtypeStruct((nefc, b), J.dtype),
          jax.ShapeDtypeStruct((nv, b), J.dtype),
          jax.ShapeDtypeStruct((2 * iterations, b), J.dtype),
      ],
      scratch_shapes=[pltpu.VMEM((nv, nv, _LANES), J.dtype),
                      pltpu.VMEM((nefc, nv, _LANES), J.dtype)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg)


# ---------------------------------------------------------------------------
# dispatch: custom_jvp (AD = XLA semantics) over custom_vmap (TPU = kernel)
# ---------------------------------------------------------------------------


def _tpu_backend() -> bool:
  plat = jax.devices()[0].platform
  return plat in ("tpu", "axon")


@functools.lru_cache(maxsize=None)
def _make_solver(iterations: int, ls_iter: int):
  body = functools.partial(_xla_newton, iterations=iterations,
                           ls_iter=ls_iter)

  @custom_batching.custom_vmap
  def raw(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg):
    return body(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg)

  @raw.def_vmap
  def _raw_vmap(axis_size, in_batched, *args):
    args = [a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)]
    J, aref, D, R, fl, fric, ones, M, a_s, warm, reg = args
    if (not _tpu_backend()) or J.dtype != jnp.float32:
      x, force, qfrc, stat = jax.vmap(body)(*args)
      return (x, force, qfrc, stat), (True, True, True, True)
    b = a_s.shape[0]
    pad = (-b) % _LANES
    if pad:
      def padb(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dtype=a.dtype)], axis=0)
      J, aref, D, R, fl, fric, ones, a_s, warm, reg = map(
          padb, (J, aref, D, R, fl, fric, ones, a_s, warm, reg))
      # identity M on padding lanes keeps the LDL pivots finite
      eyes = jnp.broadcast_to(jnp.eye(M.shape[1], dtype=M.dtype),
                              (pad,) + M.shape[1:])
      M = jnp.concatenate([M, eyes], axis=0)
    xt, ft, qt, st = _newton_lanes(
        jnp.transpose(J, (1, 2, 0)), jnp.transpose(aref, (1, 0)),
        jnp.transpose(D, (1, 0)), jnp.transpose(R, (1, 0)),
        jnp.transpose(fl, (1, 0)), jnp.transpose(fric, (1, 0)),
        jnp.transpose(ones, (1, 0)), jnp.transpose(M, (1, 2, 0)),
        jnp.transpose(a_s, (1, 0)), jnp.transpose(warm, (1, 0)),
        jnp.transpose(reg, (1, 0)), iterations, ls_iter)
    x = jnp.transpose(xt, (1, 0))
    force = jnp.transpose(ft, (1, 0))
    qfrc = jnp.transpose(qt, (1, 0))
    # (2it, B) -> (B, it, 2) -> embedded in the (B, 32, 2) mjSolverStat slab
    stat_it = jnp.transpose(st, (1, 0)).reshape(-1, iterations, 2)
    stat = jnp.zeros((stat_it.shape[0], 32, 2), dtype=st.dtype)
    stat = stat.at[:, :iterations].set(stat_it)
    if pad:
      x, force, qfrc, stat = x[:b], force[:b], qfrc[:b], stat[:b]
    return (x, force, qfrc, stat), (True, True, True, True)

  @jax.custom_jvp
  def solver(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg):
    return raw(J, aref, D, R, fl, fric, ones, M, a_s, warm, reg)

  @solver.defjvp
  def _solver_jvp(primals, tangents):
    out = raw(*primals)
    tangents = [jnp.zeros_like(p) if isinstance(t, jax.custom_derivatives
                .SymbolicZero) else t for p, t in zip(primals, tangents)]
    _, tan = jax.jvp(body, primals, tuple(tangents))
    return out, tan

  return solver


def newton_pyramidal(J, aref, D, R, fl, fric_mask, oneside_mask, M, a_s,
                     warm, reg, iterations: int, ls_iter: int):
  """Public entry: full pyramidal Newton solve → (qacc, efc_force,
  qfrc_constraint, solver_stat) with solver_stat the (32, 2)
  [improvement, cost] per-iteration diagnostics (mjSolverStat analog).

  fric_mask/oneside_mask: static numpy {0,1} row masks. reg: traced scalar
  diagonal regularizer. Dispatches to the Pallas megakernel under vmap on
  TPU; XLA everywhere else; AD falls back to the XLA body.
  """
  solver = _make_solver(int(iterations), int(ls_iter))
  dtype = a_s.dtype
  fric = jnp.asarray(fric_mask, dtype=dtype)
  ones = jnp.asarray(oneside_mask, dtype=dtype)
  return solver(J, aref, D, R, fl, fric, ones, M, a_s, warm,
                jnp.reshape(jnp.asarray(reg, dtype=dtype), (1,)))
