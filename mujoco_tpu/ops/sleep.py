"""Tree sleep/wake state machine (mjENBL_SLEEP).

Counterpart of /root/reference/src/engine/engine_sleep.c: per-kinematic-tree
sleep countdown (mj_sleep:573, treeCanSleep:123), wake on user perturbation
(mj_wake:261), collision (mj_wakeCollision:318), equality (mj_wakeEquality:400)
and tendon limits (mj_wakeTendon:371), with constraint islands grouping trees
that must sleep together (the reference's mj_island union-find).

TPU-first redesign with fixed shapes and traced state:

  * d.tree_asleep (ntree,) int32 is the source of truth: < 0 awake countdown
    (-(1+mjMINAWAKE) fully awake, -1 ready), >= 0 asleep. Sleeping trees
    store the island's canonical label (the smallest tree id in the island);
    the reference stores cycle pointers instead — same information,
    scatter-friendly encoding (documented deviation).
  * islands are connected components of the tree-coupling graph (active
    contacts, active equalities, limit-taut two-tree tendons), computed by
    boolean matrix squaring (log2(ntree) doublings of an (ntree, ntree)
    adjacency) instead of serial union-find.
  * sleeping is enforced by masks, not index lists: constraint rows whose
    Jacobian touches no awake dof are deactivated, qacc/qvel of sleeping
    dofs are zeroed. Kinematics for sleeping trees are recomputed from
    their (frozen) qpos — same values, no gather/scatter index machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, EnableBit, EqType, Model, ObjType

MINAWAKE = 10
K_AWAKE = -(1 + MINAWAKE)

# mjtSleepPolicy values that forbid sleeping
_POLICY_NEVER = (1, 3)  # AUTO_NEVER, NEVER


def sleep_active(m: Model) -> bool:
  return m.ntree > 0 and m.enabled(EnableBit.SLEEP)


def dof_awake_mask(m: Model, d: Data):
  """(nv,) float mask: 1 for dofs of awake trees (dof_awake_ind analog)."""
  awake_tree = d.tree_asleep < 0                          # (ntree,)
  tmask = jnp.asarray(m.tree_dof_mask)                    # (ntree, nv)
  return jnp.any(tmask & awake_tree[:, None], axis=0).astype(d.qpos.dtype)


def _tree_of_bodies(m: Model, bodies):
  """Traced body ids -> tree ids (-1 for static)."""
  bt = jnp.asarray(m.body_treeid, dtype=jnp.int32)
  return bt[jnp.maximum(bodies, 0)] * (bodies >= 0) + (bodies < 0) * -1


def _can_sleep(m: Model, d: Data, tol):
  """(ntree,) bool: treeCanSleep (engine_sleep.c:123) — policy allows, no
  applied forces on the tree, weighted |qvel| under tol (exact zero when
  tol == 0)."""
  bmask = jnp.asarray(m.tree_body_mask)                   # (ntree, nbody)
  dmask = jnp.asarray(m.tree_dof_mask)                    # (ntree, nv)
  policy_ok = ~jnp.isin(jnp.asarray(m.tree_sleep_policy),
                        jnp.asarray(_POLICY_NEVER))
  xfrc = jnp.any(jnp.abs(d.xfrc_applied).sum(-1)[None, :] * bmask > 0, axis=1)
  qfrc = jnp.any((jnp.abs(d.qfrc_applied)[None, :] * dmask) > 0, axis=1)
  wvel = jnp.max(jnp.where(dmask, jnp.abs(d.qvel * m.dof_length)[None, :],
                           0.0), axis=1)
  vel_ok = jnp.where(tol > 0, wvel < tol, wvel == 0)
  return policy_ok & ~xfrc & ~qfrc & vel_ok


def _island_labels(m: Model, d: Data, extra_pairs=None):
  """Canonical island label per tree: smallest tree id reachable through the
  active coupling graph (contacts, equalities, taut tendons). Transitive
  closure by boolean matrix squaring."""
  nt = m.ntree
  adj = jnp.eye(nt, dtype=bool)

  # contacts: traced contacting trees per active slot
  if m.con.ncon:
    gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    gids = d.contact.geomids
    bodies = gb[jnp.maximum(gids, 0)]
    if m.flx.nvert:
      vb = jnp.asarray(m.flx.vertbodyid, dtype=jnp.int32)
      fb = vb[jnp.maximum(d.contact.flexvert[:, 0], 0)]
      bodies = jnp.where(gids < 0, fb[:, None], bodies)
    trees = _tree_of_bodies(m, bodies)                    # (ncon, 2)
    live = ((d.contact.dist < d.contact.includemargin)
            & (trees[:, 0] >= 0) & (trees[:, 1] >= 0))
    t1 = jnp.clip(trees[:, 0], 0, nt - 1)
    t2 = jnp.clip(trees[:, 1], 0, nt - 1)
    adj = adj.at[t1, t2].max(live)
    adj = adj.at[t2, t1].max(live)

  # equalities: static tree pairs, traced eq_active
  for i in range(m.neq):
    t1, t2 = _equality_trees(m, i)
    if t1 >= 0 and t2 >= 0 and t1 != t2:
      on = d.eq_active[i]
      adj = adj.at[t1, t2].max(on)
      adj = adj.at[t2, t1].max(on)

  # tendons between exactly two trees, at a limit (mj_wakeTendon semantics)
  for t in range(m.ntendon):
    if int(m.tendon_treenum[t]) == 2:
      t1, t2 = int(m.tendon_treeid[t, 0]), int(m.tendon_treeid[t, 1])
      if t1 >= 0 and t2 >= 0 and t1 != t2:
        taut = _tendon_limit(m, d, t)
        adj = adj.at[t1, t2].max(taut)
        adj = adj.at[t2, t1].max(taut)

  if extra_pairs is not None:
    for t1, t2 in extra_pairs:
      adj = adj.at[t1, t2].set(True)
      adj = adj.at[t2, t1].set(True)

  # transitive closure: O(log nt) squarings
  n_iter = max(1, int(np.ceil(np.log2(max(nt, 2)))))
  for _ in range(n_iter):
    ai = adj.astype(jnp.int32)
    adj = adj | ((ai @ ai) > 0)

  ids = jnp.arange(nt, dtype=jnp.int32)
  labels = jnp.min(jnp.where(adj, ids[None, :], nt), axis=1)
  return labels.astype(jnp.int32)


def _equality_trees(m: Model, i: int):
  """Static (tree1, tree2) of equality i, -1 for static/world sides
  (mj_wakeEquality, engine_sleep.c:400)."""
  eq_type = int(m.eq_type[i])
  o1, o2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
  bt = m.body_treeid
  if eq_type in (int(EqType.CONNECT), int(EqType.WELD)):
    if int(m.eq_objtype[i]) == int(ObjType.SITE):
      b1, b2 = int(m.site_bodyid[o1]), int(m.site_bodyid[o2])
    else:
      b1, b2 = o1, o2
    return int(bt[b1]), int(bt[b2])
  if eq_type == int(EqType.JOINT):
    t1 = int(bt[m.jnt_bodyid[o1]]) if o1 >= 0 else -1
    t2 = int(bt[m.jnt_bodyid[o2]]) if o2 >= 0 else -1
    return t1, t2
  return -1, -1


def _tendon_limit(m: Model, d: Data, t: int):
  """Traced bool: tendon t at (or within margin of) a length limit
  (tendonLimit, engine_core_util.c:1099)."""
  if not bool(m.tendon_limited[t]):
    return jnp.zeros((), dtype=bool)
  length = d.ten_length[t]
  lo, hi = m.tendon_range[t, 0], m.tendon_range[t, 1]
  margin = m.tendon_margin[t]
  return ((length - lo) < margin) | ((hi - length) < margin)


def wake(m: Model, d: Data) -> Data:
  """Combined wake pass, run after collision in fwd_position. Covers the
  reference's mj_wake (user perturbation), mj_wakeCollision,
  mj_wakeEquality and mj_wakeTendon. Wakes whole sleeping islands; wake
  values follow the reference (the awake partner's countdown for
  constraint-coupled wakes, fully-awake for user perturbation)."""
  if not sleep_active(m):
    return d
  nt = m.ntree
  asleep = d.tree_asleep >= 0
  awake = ~asleep
  counter = d.tree_asleep                                # < 0 for awake
  label = jnp.where(asleep, d.tree_asleep, nt)           # sleeping labels

  # per-tree wake requests: (requested, wakeval); combined by min(wakeval)
  req = jnp.zeros((nt,), dtype=bool)
  val = jnp.full((nt,), -1, dtype=jnp.int32)

  def request(req, val, tree_idx, want, wakeval):
    """Register wake request for (traced) sleeping tree indices."""
    t = jnp.clip(tree_idx, 0, nt - 1)
    req = req.at[t].max(want)
    val = val.at[t].min(jnp.where(want, wakeval, 0))
    return req, val

  # --- user perturbation (mj_wake): asleep tree that can no longer sleep
  # with tol=0 (nonzero qvel or applied forces)
  cant = ~_can_sleep(m, d, jnp.zeros((), dtype=d.qpos.dtype))
  req, val = request(req, val, jnp.arange(nt), asleep & cant,
                     jnp.full((nt,), K_AWAKE, dtype=jnp.int32))

  # --- collision wake: active contact with exactly one sleeping side
  if m.con.ncon:
    gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    gids = d.contact.geomids
    bodies = gb[jnp.maximum(gids, 0)]
    if m.flx.nvert:
      vb = jnp.asarray(m.flx.vertbodyid, dtype=jnp.int32)
      fb = vb[jnp.maximum(d.contact.flexvert[:, 0], 0)]
      bodies = jnp.where(gids < 0, fb[:, None], bodies)
    trees = _tree_of_bodies(m, bodies)
    live = ((d.contact.dist < d.contact.includemargin)
            & (trees[:, 0] >= 0) & (trees[:, 1] >= 0))
    a1 = awake[jnp.clip(trees[:, 0], 0, nt - 1)]
    a2 = awake[jnp.clip(trees[:, 1], 0, nt - 1)]
    one_awake = live & (a1 ^ a2)
    sleeper = jnp.where(a1, trees[:, 1], trees[:, 0])
    waker = jnp.where(a1, trees[:, 0], trees[:, 1])
    wv = counter[jnp.clip(waker, 0, nt - 1)]
    req, val = request(req, val, sleeper, one_awake, wv)

    # mocap-contact wake: a dof-less body whose root is a mocap body counts
    # as awake and fully wakes the sleeping side (engine_sleep.c:336-341)
    if m.nmocap:
      rootid = jnp.asarray(m.body_rootid, dtype=jnp.int32)
      mocapid = jnp.asarray(m.body_mocapid, dtype=jnp.int32)
      is_mocap = mocapid[rootid[bodies]] >= 0               # (ncon, 2)
      live_m = (d.contact.dist < d.contact.includemargin)
      for s in (0, 1):
        o = 1 - s
        ts = trees[:, s]
        want = (live_m & (ts >= 0) & asleep[jnp.clip(ts, 0, nt - 1)]
                & (trees[:, o] < 0) & is_mocap[:, o])
        req, val = request(req, val, ts, want,
                           jnp.full_like(ts, K_AWAKE))

  # --- equality wake (static pairs, traced active/sleep state)
  for i in range(m.neq):
    t1, t2 = _equality_trees(m, i)
    if t1 < 0 or t2 < 0 or t1 == t2:
      continue
    on = d.eq_active[i]
    s1, s2 = asleep[t1], asleep[t2]
    # one side asleep: wake it with the partner's countdown
    req, val = request(req, val, jnp.full((), t1, jnp.int32),
                       on & s1 & ~s2, counter[t2])
    req, val = request(req, val, jnp.full((), t2, jnp.int32),
                       on & s2 & ~s1, counter[t1])
    # both asleep in different islands: wake both fully
    diff = on & s1 & s2 & (label[t1] != label[t2])
    req, val = request(req, val, jnp.full((), t1, jnp.int32), diff, K_AWAKE)
    req, val = request(req, val, jnp.full((), t2, jnp.int32), diff, K_AWAKE)

  # --- flex equality wake (mjEQ_FLEX/FLEXVERT): any awake tree of the flex
  # wakes every sleeping tree of the flex with its countdown
  # (engine_sleep.c:443-480); tree membership is static
  for i in range(m.neq):
    if int(m.eq_type[i]) not in (4, 5):     # mjEQ_FLEX, mjEQ_FLEXVERT
      continue
    f = int(m.eq_obj1id[i])
    adr, num = int(m.flx.vertadr[f]), int(m.flx.vertnum[f])
    tf = np.unique(np.asarray(m.body_treeid)[
        np.asarray(m.flx.vertbodyid)[adr:adr + num]])
    tf = tf[tf >= 0]
    if len(tf) < 2:
      continue
    tfj = jnp.asarray(tf, dtype=jnp.int32)
    aw = awake[tfj]
    first = jnp.argmax(aw)                  # first awake tree, vertex order
    wv = counter[tfj[first]]
    want = d.eq_active[i] & aw.any() & asleep[tfj]
    req, val = request(req, val, tfj, want, jnp.full_like(tfj, 1) * wv)

  # --- tendon wake (static pairs, taut check traced)
  for t in range(m.ntendon):
    if int(m.tendon_treenum[t]) != 2:
      continue
    t1, t2 = int(m.tendon_treeid[t, 0]), int(m.tendon_treeid[t, 1])
    if t1 < 0 or t2 < 0 or t1 == t2:
      continue
    taut = _tendon_limit(m, d, t)
    req, val = request(req, val, jnp.full((), t1, jnp.int32),
                       taut & asleep[t1] & ~asleep[t2], counter[t2])
    req, val = request(req, val, jnp.full((), t2, jnp.int32),
                       taut & asleep[t2] & ~asleep[t1], counter[t1])

  # island-wide wake: aggregate requests by sleeping-island label
  lab_req = jnp.zeros((nt + 1,), dtype=bool).at[label].max(req)[:nt]
  lab_val = jnp.full((nt + 1,), 0, dtype=jnp.int32).at[label].min(
      jnp.where(req, val, 0))[:nt]
  lab = jnp.clip(label, 0, nt - 1)
  woke = asleep & lab_req[lab]
  new_val = jnp.minimum(lab_val[lab], -1)   # wake values are negative
  tree_asleep = jnp.where(woke, new_val, d.tree_asleep)
  return d.replace(tree_asleep=tree_asleep)


def sleep_step(m: Model, d: Data, qacc):
  """Countdown + island sleep, run at the top of the integrator advance
  (mj_sleep, engine_sleep.c:573). Returns (d, qacc) with tree_asleep
  updated and qvel/qacc zeroed for sleeping trees."""
  if not sleep_active(m):
    return d, qacc
  nt = m.ntree
  asleep = d.tree_asleep >= 0
  can = _can_sleep(m, d, m.opt.sleep_tolerance)

  # awake trees: increment countdown toward -1, or reset to fully awake
  cnt = d.tree_asleep
  cnt = jnp.where(~asleep, jnp.where(can, cnt + (cnt < -1), K_AWAKE), cnt)

  # islands: all member trees must be ready (== -1) to sleep together
  labels = _island_labels(m, d)
  ready = cnt == -1
  lab = jnp.clip(labels, 0, nt - 1)
  # a label's island can sleep iff no member is not-ready (awake countdown
  # or policy-blocked); sleeping members cannot appear in an island with
  # awake ones at this point (they were woken earlier in the step)
  blocker = ~ready & ~asleep
  lab_blocked = jnp.zeros((nt + 1,), dtype=bool).at[labels].max(blocker)[:nt]
  goes = ready & ~lab_blocked[lab]
  tree_asleep = jnp.where(goes, labels, cnt)

  # zero qvel/qacc of sleeping trees (newly slept and continuing)
  sleeping_now = tree_asleep >= 0
  dmask = jnp.asarray(m.tree_dof_mask)
  dof_sleep = jnp.any(dmask & sleeping_now[:, None], axis=0)
  qvel = jnp.where(dof_sleep, 0.0, d.qvel)
  qacc = jnp.where(dof_sleep, 0.0, qacc)
  return d.replace(tree_asleep=tree_asleep, qvel=qvel,
                   qacc=jnp.where(dof_sleep, 0.0, d.qacc)), qacc


def mask_sleeping_rows(m: Model, d: Data) -> Data:
  """Deactivate constraint rows whose Jacobian touches no awake dof — the
  analog of the reference building efc rows over awake dofs only. Run after
  constraint assembly."""
  if not sleep_active(m) or m.efc.nefc == 0:
    return d
  awake = dof_awake_mask(m, d)
  touches_awake = (jnp.abs(d.efc_J) @ awake) > 0
  return d.replace(efc_active=d.efc_active & touches_awake)


def init_sleep(m: Model, d: Data) -> Data:
  """Put SLEEP_INIT trees to sleep after a forward pass (the reference does
  this inside mj_resetData, engine_io.c:1486-1497; here it is an explicit
  post-reset call because make_data cannot run forward)."""
  from mujoco_tpu.ops import forward as fwd
  if not sleep_active(m):
    return d
  init = np.asarray(m.tree_sleep_policy) == 5  # mjSLEEP_INIT
  if not init.any():
    return d
  d = fwd.forward(m, d)
  marks = jnp.where(jnp.asarray(init), -1, K_AWAKE).astype(jnp.int32)
  d = d.replace(tree_asleep=marks)
  d, _ = sleep_step(m, d, d.qacc)
  return d
