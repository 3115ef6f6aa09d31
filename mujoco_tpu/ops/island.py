"""Island-decomposed constraint solving (mjDSBL_ISLAND analog).

Counterpart of constraint-island discovery (mj_island,
/root/reference/src/engine/engine_island.c:460) and the per-island solver
dispatch in mj_fwdConstraint (/root/reference/src/engine/engine_forward.c:
1190-1226, solveIslandTask → mj_solNewton_island). The reference gathers
each island's dofs/rows into island-local arrays (mju_gather with
d->map_idof2dof / map_iefc2efc) and solves islands on a threadpool.

TPU-first redesign — fixed shapes, no threads:

  * island labels per kinematic tree come from the same boolean
    matrix-squaring transitive closure the sleep machinery uses
    (ops/sleep.py:_island_labels) — O(log ntree) dense squarings instead
    of the reference's serial flood fill. Solver labels additionally union
    two-tree tendons that can emit friction/limit rows (the reference's
    findEdges walks actual efc rows; tendon rows are the one row class
    whose activity criterion isn't shared with the sleep labels, so they
    are unioned statically — conservative, never wrong).
  * every tree id owns one fixed island slot. Member dofs/rows are binned
    by a stable argsort of their island label and sliced into
    (ntree, B) / (ntree, R) index blocks with STATIC budgets. Default
    budgets are *sound* bounds from the potential coupling graph (every
    candidate collision pair + equality + two-tree tendon): a runtime
    island can never outgrow its static component, so the default never
    overflows. MJTPU_ISLAND_NV / MJTPU_ISLAND_EFC opt into tighter budgets
    (for scenes whose potential graph is fully connected but whose runtime
    islands stay small — piles, multi-robot without contact exclusions);
    overflow then falls back to the monolithic solve under lax.cond, which
    executes only the taken branch in single-scene stepping.
  * the per-island Newton (pyramidal cones) runs vmapped over island
    slots — the lane-mapped Pallas LDL (ops/linalg_tpu.py) eats the
    (ntree, B, B) Hessian batch — with per-island convergence freezing and
    the reference's per-island tolerance scale (1/island_inertia,
    engine_solver.c:2383-2391).

Scope (documented): Newton and CG solvers + pyramidal cone + no flex,
mirroring the reference's own exclusion of flex-CG models from islands
(engine_forward.c:1190 `islands_supported`). PGS solves monolithically by
design, not as a gap: the dual matrix A = J M⁻¹ Jᵀ + R is exactly
block-diagonal across islands (different islands touch disjoint dof sets
and M⁻¹ is tree-block-diagonal), so the monolithic deterministic sweep IS
the island sweep — the reference's island PGS differs only in threading,
which XLA replaces. Elliptic cones and equality types beyond connect/weld/
joint (tendon/distance equalities) also fall back: the cone's contact-block
coupling is not represented in the gathered row layout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (ConeType, Data, DisableBit, EqType,
                                     Model, SolverType)
from mujoco_tpu.utils import math as mjm


# ---------------------------------------------------------------------------
# static analysis: potential coupling components and budgets
# ---------------------------------------------------------------------------


def _tree_of_geom(m: Model, g: int) -> int:
  return int(m.body_treeid[m.geom_bodyid[g]])


def _eq_trees(m: Model, i: int):
  from mujoco_tpu.ops import sleep as slp
  return slp._equality_trees(m, i)


def _tendon_pairs(m: Model):
  """Static (t1, t2) tree pairs for two-tree tendons that can emit efc rows
  (limit or friction) — unioned unconditionally, see module docstring."""
  # friction status must come from the STATIC efc meta, not the traced
  # tendon_frictionloss leaf (which stages to a tracer when this runs
  # inside the jitted solve)
  fric_ten = set(int(t) for t in np.asarray(m.efc.friction_ten) if t >= 0)
  pairs = []
  for t in range(m.ntendon):
    if int(m.tendon_treenum[t]) != 2:
      continue
    has_rows = bool(m.tendon_limited[t]) or (t in fric_ten)
    if not has_rows:
      continue
    t1, t2 = int(m.tendon_treeid[t, 0]), int(m.tendon_treeid[t, 1])
    if t1 >= 0 and t2 >= 0 and t1 != t2:
      pairs.append((t1, t2))
  return pairs


def _static_components(m: Model) -> np.ndarray:
  """(ntree,) min-tree component label from the POTENTIAL coupling graph:
  every candidate contact pair (static slots + dynamic-group candidates),
  every equality, every row-emitting two-tree tendon. Runtime islands are
  always subsets of these components."""
  nt = m.ntree
  parent = np.arange(nt)

  def find(a):
    while parent[a] != a:
      parent[a] = parent[parent[a]]
      a = parent[a]
    return a

  def union(a, b):
    if a < 0 or b < 0:
      return
    ra, rb = find(a), find(b)
    if ra != rb:
      parent[max(ra, rb)] = min(ra, rb)

  for c in range(m.con.ncon):
    if m.con.dynslot[c] or m.con.flex2[c] >= 0 or m.con.flex1[c] >= 0:
      continue
    union(_tree_of_geom(m, int(m.con.geom1[c])),
          _tree_of_geom(m, int(max(m.con.geom2[c], 0))))
  for grp in m.con.dyngroups:
    for a, b in zip(grp["g1"], grp["g2"]):
      union(_tree_of_geom(m, int(a)), _tree_of_geom(m, int(b)))
  for i in range(m.neq):
    t1, t2 = _eq_trees(m, i)
    union(t1, t2)
  for t1, t2 in _tendon_pairs(m):
    union(t1, t2)
  return np.array([find(t) for t in range(nt)], dtype=np.int32)


def _row_rep_tree_static(m: Model) -> np.ndarray:
  """(nefc,) static representative tree per row; -1 for contact rows
  (resolved at trace time from traced geom ids)."""
  meta = m.efc
  rep = np.full(meta.nefc, -1, dtype=np.int32)
  ne, nf, nl = meta.ne, meta.nf, meta.nl
  bt = m.body_treeid
  for r in range(ne):
    t1, t2 = _eq_trees(m, int(meta.eq_id[r]))
    rep[r] = t1 if t1 >= 0 else t2
  for k in range(nf):
    r = ne + k
    dof = int(meta.friction_dof[k])
    if dof >= 0:
      rep[r] = int(m.dof_treeid[dof])
    else:
      ten = int(meta.friction_ten[k])
      rep[r] = int(m.tendon_treeid[ten, 0])
  for k in range(nl):
    r = ne + nf + k
    jid = int(meta.limit_jnt[k])
    if jid >= 0:
      rep[r] = int(bt[m.jnt_bodyid[jid]])
    else:
      ten = int(meta.limit_ten[k])
      rep[r] = int(m.tendon_treeid[ten, 0])
  return rep


def _static_row_component(m: Model, comp: np.ndarray) -> np.ndarray:
  """(nefc,) static component id per row (every row's component IS static
  even when its island is dynamic: dynamic-group slots only mix pairs
  within one component by construction)."""
  meta = m.efc
  rc = np.zeros(meta.nefc, dtype=np.int32)
  rep = _row_rep_tree_static(m)
  base = meta.ne + meta.nf + meta.nl
  stat = rep >= 0
  rc[stat] = comp[rep[stat]]
  # contact rows: component of the slot's static or group trees
  slot_comp = np.zeros(m.con.ncon, dtype=np.int32)
  for c in range(m.con.ncon):
    if m.con.dynslot[c]:
      continue
    t1 = _tree_of_geom(m, int(m.con.geom1[c]))
    t2 = _tree_of_geom(m, int(max(m.con.geom2[c], 0)))
    t = t1 if t1 >= 0 else t2
    slot_comp[c] = comp[t] if t >= 0 else 0
  for grp in m.con.dyngroups:
    t = -1
    for a in grp["g1"]:
      t = _tree_of_geom(m, int(a))
      if t >= 0:
        break
    if t < 0:
      for b in grp["g2"]:
        t = _tree_of_geom(m, int(b))
        if t >= 0:
          break
    cc = comp[t] if t >= 0 else 0
    sl = np.arange(grp["adr"], grp["adr"] + grp["npair"] * grp["k"])
    slot_comp[sl] = cc
  rows = np.arange(base, meta.nefc)
  rc[rows] = slot_comp[meta.con_id]
  return rc


def _budgets(m: Model):
  """(B dofs, R rows, need_fallback). Defaults are sound bounds; env vars
  opt into tighter budgets with a monolithic lax.cond fallback."""
  comp = _static_components(m)
  rc = _static_row_component(m, comp)
  nv_of_tree = m.tree_dof_mask.sum(axis=1)
  sound_b = 0
  sound_r = 0
  for c in np.unique(comp):
    sound_b = max(sound_b, int(nv_of_tree[comp == c].sum()))
    sound_r = max(sound_r, int((rc == c).sum()))
  b = int(os.environ.get("MJTPU_ISLAND_NV", "0")) or sound_b
  r = int(os.environ.get("MJTPU_ISLAND_EFC", "0")) or sound_r
  b, r = min(b, m.nv), min(r, m.efc.nefc)
  return b, r, (b < sound_b or r < sound_r)


def use_islands(m: Model) -> bool:
  """Static dispatch test (islands_supported, engine_forward.c:1190).

  TPU deviation (measured, see ROADMAP round-5 island note): below
  MJTPU_ISLAND_MIN_NV total dofs (default 256) the monolithic lane-dense
  solve beats the island decomposition on-chip (0.94x at nv=108 on a v5e:
  XLA's batched small-matrix solves waste the MXU and the gather/scatter
  framing exceeds the cubic savings), so islands engage only for larger
  scenes. Set MJTPU_ISLAND_MIN_NV=0 for the reference's always-on
  dispatch semantics."""
  if m.nv < int(os.environ.get("MJTPU_ISLAND_MIN_NV", "256")):
    return False
  if m.disabled(DisableBit.ISLAND) or m.disabled(DisableBit.CONSTRAINT):
    return False
  if int(m.opt.solver) not in (int(SolverType.NEWTON), int(SolverType.CG)):
    return False
  if int(m.opt.cone) != int(ConeType.PYRAMIDAL):
    return False
  if m.ntree <= 1 or m.efc.nefc == 0:
    return False
  if m.flx.nvert:                       # mirror the mj_flexCG exclusion
    return False
  for i in range(m.neq):                # unsupported eq coupling types
    if int(m.eq_type[i]) not in (int(EqType.CONNECT), int(EqType.WELD),
                                 int(EqType.JOINT)):
      return False
  b, _, _ = _budgets(m)
  # no decomposition win: a single component covering everything, and no
  # tighter budget requested
  return b < m.nv


# ---------------------------------------------------------------------------
# traced labels and binning
# ---------------------------------------------------------------------------


def _solver_labels(m: Model, d: Data):
  from mujoco_tpu.ops import sleep as slp
  extra = _tendon_pairs(m)
  return slp._island_labels(m, d, extra_pairs=extra or None)


def _row_islands(m: Model, d: Data, labels):
  """(nefc,) traced island id per row."""
  meta = m.efc
  nt = m.ntree
  rep_static = _row_rep_tree_static(m)
  rep = jnp.asarray(rep_static, dtype=jnp.int32)
  base = meta.ne + meta.nf + meta.nl
  if meta.ncon_rows:
    gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    bt = jnp.asarray(m.body_treeid, dtype=jnp.int32)
    gids = d.contact.geomids                        # (ncon, 2) traced
    trees = bt[gb[jnp.maximum(gids, 0)]]
    trees = jnp.where(gids >= 0, trees, -1)
    rep_con = jnp.where(trees[:, 0] >= 0, trees[:, 0], trees[:, 1])
    rep = rep.at[base:].set(rep_con[jnp.asarray(meta.con_id)])
  isl = labels[jnp.clip(rep, 0, nt - 1)]
  return jnp.where(rep >= 0, isl, 0)


def _bin(ids, n_slots: int, budget: int, sentinel: int):
  """Bin ids into per-slot index blocks.

  Returns (idx (n_slots, budget) with sentinel padding, counts (n_slots,)).
  """
  order = jnp.argsort(ids, stable=True)
  counts = jnp.zeros((n_slots,), jnp.int32).at[ids].add(1)
  starts = jnp.cumsum(counts) - counts
  pad = jnp.full((budget,), sentinel, dtype=order.dtype)
  order_p = jnp.concatenate([order, pad])
  idx = jax.vmap(
      lambda s: jax.lax.dynamic_slice(order_p, (s,), (budget,)))(starts)
  valid = jnp.arange(budget)[None, :] < counts[:, None]
  return jnp.where(valid, idx, sentinel), counts


# ---------------------------------------------------------------------------
# per-island Newton (pyramidal)
# ---------------------------------------------------------------------------


def _island_newton(m: Model, p, iterations: int, ls_iter: int, tol_opt,
                   use_newton: bool = True):
  """Newton or Polak-Ribière CG over one gathered island problem `p`
  (dict); vmapped by caller (mj_solNewton_island / mj_solCG per island,
  solveIslandTask, engine_forward.c:1196-1216).

  Follows solver.solve()'s newton/cg paths minus the elliptic cone. CG
  preconditions with the island's dense M (the reference's tree-factor
  solve restricted to the island dofs). Per-island tolerance scale
  1/island_inertia (engine_solver.c:2383-2391)."""
  dtype = p["M"].dtype
  M, J, aref = p["M"], p["J"], p["aref"]
  a_s, D, fl = p["a_s"], p["D"], p["fl"]
  is_fric, one_sided = p["is_fric"], p["one_sided"]

  def update(jar):
    """Pyramidal constraint state machine with traced row-type masks
    (mj_constraintUpdate_impl, engine_core_constraint.c:3275). Inactive
    rows carry D = 0 and frictionloss = 0, so they vanish. The friction
    linear band is ±R·frictionloss (engine_core_constraint.c:3311)."""
    force = -D * jar
    cost = 0.5 * D * jar * jar
    w = D
    band = p["R"] * fl
    lin_neg = is_fric & (jar <= -band)
    lin_pos = is_fric & (jar >= band)
    lin = lin_neg | lin_pos
    fric_cost = -0.5 * band * fl + fl * jnp.abs(jar)
    force = jnp.where(lin_neg, fl, jnp.where(lin_pos, -fl, force))
    cost = jnp.where(lin, fric_cost, cost)
    w = jnp.where(lin, 0.0, w)
    sat = one_sided & (jar >= 0)
    force = jnp.where(sat, 0.0, force)
    cost = jnp.where(sat, 0.0, cost)
    w = jnp.where(sat, 0.0, w)
    return force, jnp.sum(cost), w

  def cost_of(x):
    _, c, _ = update(J @ x - aref)
    return c + 0.5 * jnp.dot(x - a_s, M @ (x - a_s))

  tol = tol_opt * p["inertia"]

  def eval_phi(jar0, jp, gx0, pmp, alpha):
    force, _, w = update(jar0 + alpha * jp)
    dphi = gx0 + alpha * pmp - jnp.dot(jp, force)
    ddphi = pmp + jnp.sum(w * jp * jp)
    return dphi, ddphi

  def linesearch(jar0, jp, gx0, pmp):
    big = jnp.asarray(jnp.inf, dtype=dtype)

    def body(_, carry):
      lo, hi, has_hi, alpha = carry
      dphi, ddphi = eval_phi(jar0, jp, gx0, pmp, alpha)
      neg = dphi < 0
      lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
      has_hi = has_hi | ~neg
      prop = alpha - dphi / jnp.maximum(ddphi, mjm.MINVAL)
      mid = 0.5 * (lo + jnp.where(has_hi, hi, lo))
      ok = (prop >= lo) & (prop <= hi)
      alpha_next = jnp.where(ok, prop, jnp.where(has_hi, mid, prop))
      return lo, hi, has_hi, alpha_next

    carry = (jnp.zeros((), dtype), big, jnp.zeros((), bool),
             jnp.zeros((), dtype))
    *_, alpha = jax.lax.fori_loop(0, ls_iter, body, carry)
    return jnp.maximum(alpha, 0.0)

  from mujoco_tpu.ops import linalg_tpu
  nb = M.shape[0]
  reg = (1e-12 if dtype == jnp.float64 else 1e-6) * p["meaninertia"]

  def newton_step(x):
    jar = J @ x - aref
    force, ccost, w = update(jar)
    cost_x = ccost + 0.5 * jnp.dot(x - a_s, M @ (x - a_s))
    grad = M @ (x - a_s) - J.T @ force
    h = M + (J * w[:, None]).T @ J + jnp.eye(nb, dtype=dtype) * reg
    pdir = -linalg_tpu.spd_solve(h, grad)
    jp = J @ pdir
    gx0 = jnp.dot(pdir, M @ (x - a_s))
    pmp = jnp.dot(pdir, M @ pdir)
    alpha = linesearch(jar, jp, gx0, pmp)
    return x + alpha * pdir, cost_x

  def cg_step(x, g_prev, dir_prev, first):
    """Preconditioned Polak-Ribière step (mj_solCG, engine_solver.c),
    island-local M as the preconditioner."""
    jar = J @ x - aref
    force, ccost, _ = update(jar)
    cost_x = ccost + 0.5 * jnp.dot(x - a_s, M @ (x - a_s))
    grad = M @ (x - a_s) - J.T @ force
    mgrad = linalg_tpu.spd_solve(M, grad)
    beta = jnp.maximum(
        0.0, jnp.dot(grad - g_prev, mgrad)
        / jnp.maximum(jnp.dot(g_prev, linalg_tpu.spd_solve(M, g_prev)),
                      mjm.MINVAL))
    pdir = jnp.where(first, -mgrad, -mgrad + beta * dir_prev)
    jp = J @ pdir
    gx0 = jnp.dot(pdir, M @ (x - a_s))
    pmp = jnp.dot(pdir, M @ pdir)
    alpha = linesearch(jar, jp, gx0, pmp)
    return x + alpha * pdir, cost_x, grad, pdir

  def scan_body(carry, _):
    x, prev_cost, it, live, g_prev, dir_prev, first = carry
    if use_newton:
      x_new, _ = newton_step(x)
      g_new, dir_new = g_prev, dir_prev
    else:
      x_new, _, g_new, dir_new = cg_step(x, g_prev, dir_prev, first)
    cost = cost_of(x_new)
    improvement = prev_cost - cost
    x_out = jnp.where(live, x_new, x)
    cost_out = jnp.where(live, cost, prev_cost)
    it_out = it + jnp.where(live, 1, 0)
    live_out = live & (improvement > tol)
    stat = jnp.where(live, jnp.stack([improvement, cost]), 0.0)
    g_out = jnp.where(live, g_new, g_prev)
    dir_out = jnp.where(live, dir_new, dir_prev)
    return (x_out, cost_out, it_out, live_out, g_out, dir_out,
            jnp.zeros((), bool)), stat

  x0 = p["x0"]
  zv = jnp.zeros_like(x0)
  carry = (x0, cost_of(x0), jnp.zeros((), jnp.int32), jnp.ones((), bool),
           zv, zv, jnp.ones((), bool))
  (x, _, niter, *_), stats = jax.lax.scan(scan_body, carry, None,
                                          length=iterations)
  force, _, _ = update(J @ x - aref)
  return x, force, niter, stats


def island_cost(p):
  """Total constraint+Gauss cost of p at a candidate x (for the global
  warmstart choice, warmstart(), engine_forward.c:1080-1117)."""
  def at(x):
    band = p["R"] * p["fl"]
    jar = p["J"] @ x - p["aref"]
    force = -p["D"] * jar
    cost = 0.5 * p["D"] * jar * jar
    lin = p["is_fric"] & (jnp.abs(jar) >= band)
    cost = jnp.where(lin, -0.5 * band * p["fl"] + p["fl"] * jnp.abs(jar),
                     cost)
    sat = p["one_sided"] & (jar >= 0)
    cost = jnp.where(sat, 0.0, cost)
    return jnp.sum(cost) + 0.5 * jnp.dot(x - p["a_s"],
                                         p["M"] @ (x - p["a_s"]))
  return at


# ---------------------------------------------------------------------------
# gather / solve / scatter
# ---------------------------------------------------------------------------


def _gather_problems(m: Model, d: Data, labels, B: int, R: int):
  """Build (ntree, ...) island sub-problems + index blocks + overflow."""
  meta = m.efc
  nt, nv, nefc = m.ntree, m.nv, meta.nefc
  dtype = d.qpos.dtype

  isl_dof = labels[jnp.asarray(m.dof_treeid, dtype=jnp.int32)]
  isl_row = _row_islands(m, d, labels)
  # inactive rows (D = 0, contribute nothing) go to a dummy slot nt that is
  # never solved — they must not consume row budget (a typical scene's slots
  # are mostly inactive) and their efc_force is identically 0, which the
  # scatter's untouched zeros already encode
  isl_row = jnp.where(d.efc_active, isl_row, nt)
  idx_d, counts_d = _bin(isl_dof, nt, B, nv)
  idx_r, counts_r = _bin(isl_row, nt + 1, R, nefc)
  idx_r, counts_r = idx_r[:nt], counts_r[:nt]
  overflow = jnp.any(counts_d > B) | jnp.any(counts_r > R)

  def padv(x, fill=0.0):
    return jnp.concatenate(
        [x, jnp.full((1,) + x.shape[1:], fill, dtype=x.dtype)])

  Mp = jnp.pad(d.qM, ((0, 1), (0, 1)))
  Mp = Mp.at[nv, nv].set(1.0)
  Jp = jnp.pad(d.efc_J, ((0, 1), (0, 1)))

  # static row-type masks, padded then gathered (traced per island)
  ne, nf = meta.ne, meta.nf
  is_fric_np = np.zeros(nefc + 1, dtype=bool)
  is_fric_np[ne:ne + nf] = True
  one_sided_np = np.zeros(nefc + 1, dtype=bool)
  one_sided_np[ne + nf:nefc] = True

  diagM = jnp.diagonal(d.qM)

  probs = {
      "M": Mp[idx_d[:, :, None], idx_d[:, None, :]],
      "J": Jp[idx_r[:, :, None], idx_d[:, None, :]],
      "aref": padv(d.efc_aref)[idx_r],
      "D": padv(d.efc_D)[idx_r],
      "R": padv(d.efc_R)[idx_r],
      "fl": padv(d.efc_frictionloss)[idx_r],
      "is_fric": jnp.asarray(is_fric_np)[idx_r],
      "one_sided": jnp.asarray(one_sided_np)[idx_r],
      "a_s": padv(d.qacc_smooth)[idx_d],
      "warm": padv(d.qacc_warmstart)[idx_d],
      "inertia": jnp.maximum(padv(diagM)[idx_d].sum(axis=1), mjm.MINVAL),
      "meaninertia": jnp.broadcast_to(
          jnp.asarray(m.stat_meaninertia, dtype=dtype), (nt,)),
  }
  return probs, idx_d, idx_r, overflow


def solve_core(m: Model, d: Data):
  """Island-decomposed Newton; returns (qacc, efc_force, niter, stat) in
  global layout — the same contract as solver's monolithic core."""
  meta = m.efc
  nt, nv, nefc = m.ntree, m.nv, meta.nefc
  dtype = d.qpos.dtype
  B, R, need_fallback = _budgets(m)

  labels = _solver_labels(m, d)
  probs, idx_d, idx_r, overflow = _gather_problems(m, d, labels, B, R)

  # global warmstart choice (warmstart(), engine_forward.c:1080): one
  # boolean for the whole state, comparing total costs
  if m.disabled(DisableBit.WARMSTART):
    x0 = probs["a_s"]
  else:
    costs_w = jax.vmap(lambda p: island_cost(p)(p["warm"]))(probs)
    costs_s = jax.vmap(lambda p: island_cost(p)(p["a_s"]))(probs)
    use_warm = jnp.sum(costs_w) < jnp.sum(costs_s)
    x0 = jnp.where(use_warm, probs["warm"], probs["a_s"])
  probs = dict(probs, x0=x0)

  iterations = int(m.opt.iterations)
  ls_iter = int(m.opt.ls_iterations)
  tol_opt = m.opt.tolerance

  use_newton = int(m.opt.solver) == int(SolverType.NEWTON)

  def run_islands(_):
    xi, fi, niter_i, stats_i = jax.vmap(
        lambda p: _island_newton(m, p, iterations, ls_iter, tol_opt,
                                 use_newton=use_newton))(probs)
    # scatter back; sentinel indices all land on the dropped pad slot
    x = jnp.zeros((nv + 1,), dtype=dtype).at[idx_d.reshape(-1)].set(
        xi.reshape(-1))[:nv]
    force = jnp.zeros((nefc + 1,), dtype=dtype).at[idx_r.reshape(-1)].set(
        fi.reshape(-1))[:nefc]
    niter = jnp.max(niter_i)
    # solver_stat: per-iteration [max improvement, total cost] across islands
    stat = jnp.zeros((32, 2), dtype=dtype)
    k = min(iterations, 32)
    stat = stat.at[:k, 0].set(jnp.max(stats_i[:, :k, 0], axis=0))
    stat = stat.at[:k, 1].set(jnp.sum(stats_i[:, :k, 1], axis=0))
    return x, force, niter, stat

  if not need_fallback:
    return run_islands(None)

  from mujoco_tpu.ops import solver as _solver

  def run_mono(_):
    return _solver.monolithic_core(m, d)

  return jax.lax.cond(overflow, run_mono, run_islands, None)
