"""Smooth (unconstrained) dynamics: FK, CoM frames, CRB inertia, RNE.

TPU-first redesign of /root/reference/src/engine/engine_core_smooth.c.
Instead of the reference's per-body tree recursions and sparse L'DL', tree
structure is baked into *static dense masks* (Model.tree) so that every
downstream quantity is a masked dense contraction the MXU can eat:

  cvel      = (ancestor_mask ⊙ qvel) @ cdof                (nbody,6)
  qM        = mask ⊙ (cdof crb cdofᵀ), one (nv,6)x(6,nv) matmul
  cdof_dot  = (cdofdot_mask ⊙ qvel) @ cdof, crossed with cdof
  rne       = two masked (nbody,6)-contractions

Only forward kinematics itself remains level-sequential (it is a prefix
product down the tree); levels are static python loops over numpy index
tables, so each level is one fused vectorized block under jit.

All functions are single-env; batch via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, DisableBit, JointType, Model
from mujoco_tpu.utils import math as mjm


def _take_qpos(qpos, qadr: np.ndarray, width: int, nq: int):
  """Gather fixed-width qpos windows at static addresses (clipped)."""
  idx = np.minimum(qadr[:, None] + np.arange(width)[None, :], nq - 1)
  return qpos[idx]


def normalize_qpos(m: Model, qpos):
  """Normalize ball/free quaternions in qpos (mj_normalizeQuat analog).
  Scatter-free: batched normalize + static gather-map merge."""
  quat_adr = []
  for j in range(m.njnt):
    if m.jnt_type[j] == JointType.BALL:
      quat_adr.append(m.jnt_qposadr[j])
    elif m.jnt_type[j] == JointType.FREE:
      quat_adr.append(m.jnt_qposadr[j] + 3)
  if not quat_adr:
    return qpos
  idx = np.array(quat_adr, dtype=np.int32)[:, None] + np.arange(4)[None, :]
  flat = jnp.concatenate([mjm.normalize(qpos[idx]).reshape(-1),
                          jnp.zeros((1,), dtype=qpos.dtype)])
  qmask = np.zeros(m.nq, dtype=bool)
  qmap = np.full(m.nq, len(quat_adr) * 4, dtype=np.int64)
  qmask[idx.ravel()] = True
  qmap[idx.ravel()] = np.arange(len(quat_adr) * 4)
  return jnp.where(jnp.asarray(qmask), flat[qmap], qpos)


def kinematics(m: Model, d: Data) -> Data:
  """Forward kinematics (mj_kinematics, engine_core_smooth.c).

  Level-synchronous with static (level, joint-type) grouping: bodies are
  grouped by tree depth, and within each level the joint fold is specialized
  per joint type over static index subsets (the masked-dense counterpart of
  MJX's scan.body_tree type grouping, mjx/_src/scan.py:337). No scatters:
  levels accumulate into a growing concat and a single static-permutation
  gather restores body/joint order at the end — this keeps the XLA graph
  small (per-type kernels only for types present) and scatter-free, which is
  what keeps compile time bounded on large scenes.

  The arithmetic and normalization sequence match the per-level masked
  version exactly (same FP order as the reference's parent→child recursion).
  """
  dtype = d.qpos.dtype
  qpos = normalize_qpos(m, d.qpos)
  qpos0 = m.qpos0

  nb = m.nbody
  # world row: identity frame
  pos_rows = [jnp.zeros((1, 3), dtype=dtype)]
  quat_rows = [jnp.zeros((1, 4), dtype=dtype).at[:, 0].set(1.0)]
  row_of = np.zeros(nb, dtype=np.int64)
  next_row = 1
  anchor_chunks = []   # (static jids, values)
  axis_chunks = []

  xp = pos_rows[0]     # running concat of world frames computed so far
  xq = quat_rows[0]

  for bids in m.tree.levels:
    pid_rows = row_of[m.body_parentid[bids]]
    pq = xq[pid_rows]
    pp = xp[pid_rows]

    # body reference frame composed with parent
    body_pos = m.body_pos[bids]
    body_quat = m.body_quat[bids]
    # mocap override (body_mocapid >= 0): positions come from d.mocap_*
    mocapid = m.body_mocapid[bids]
    if (mocapid >= 0).any():
      is_mocap = jnp.asarray(mocapid >= 0)
      midx = np.maximum(mocapid, 0)
      body_pos = jnp.where(is_mocap[:, None], d.mocap_pos[midx], body_pos)
      body_quat = jnp.where(is_mocap[:, None],
                            mjm.normalize(d.mocap_quat[midx]), body_quat)

    bq = mjm.normalize(mjm.mul_quat(pq, body_quat))
    bp = pp + mjm.rot_vec_quat(body_pos, pq)

    jnum = m.body_jntnum[bids]
    jadr = m.body_jntadr[bids]
    nlev = len(bids)
    for k in range(int(jnum.max()) if len(jnum) else 0):
      has = k < jnum                      # static numpy bool per body
      jid_all = np.where(has, jadr + k, 0)
      jt_all = np.where(has, m.jnt_type[jid_all], -1)

      groups = []                         # (sel, new_bp, new_bq)
      for jt in (int(JointType.FREE), int(JointType.BALL),
                 int(JointType.SLIDE), int(JointType.HINGE)):
        sel = np.nonzero(jt_all == jt)[0]
        if not len(sel):
          continue
        jid = jid_all[sel]
        qadr = m.jnt_qposadr[jid]
        bq_s, bp_s = bq[sel], bp[sel]

        if jt == JointType.FREE:
          q7 = _take_qpos(qpos, qadr, 7, m.nq)
          new_bp = q7[:, :3]
          new_bq = mjm.normalize(q7[:, 3:7])
          anchor = new_bp
          axis_out = jnp.asarray(m.jnt_axis[jid], dtype=dtype) + \
              jnp.zeros((len(sel), 3), dtype=dtype)
        else:
          axis_w = mjm.rot_vec_quat(m.jnt_axis[jid], bq_s)
          anchor = bp_s + mjm.rot_vec_quat(m.jnt_pos[jid], bq_s)
          if jt == JointType.SLIDE:
            q1 = qpos[np.minimum(qadr, m.nq - 1)]
            q0 = qpos0[np.minimum(qadr, m.nq - 1)]
            new_bp = bp_s + axis_w * (q1 - q0)[:, None]
            new_bq = bq_s
          else:
            if jt == JointType.BALL:
              qloc = mjm.normalize(_take_qpos(qpos, qadr, 4, m.nq))
            else:  # HINGE
              q1 = qpos[np.minimum(qadr, m.nq - 1)]
              q0 = qpos0[np.minimum(qadr, m.nq - 1)]
              qloc = mjm.axis_angle_to_quat(m.jnt_axis[jid], q1 - q0)
            new_bq = mjm.mul_quat(bq_s, qloc)
            new_bp = anchor - mjm.rot_vec_quat(m.jnt_pos[jid], new_bq)
          axis_out = axis_w

        anchor_chunks.append((jid, anchor))
        axis_chunks.append((jid, axis_out))
        groups.append((sel, new_bp, new_bq))

      if groups:
        # merge type groups back into level order with one static gather
        sels = np.concatenate([g[0] for g in groups])
        rest = np.setdiff1d(np.arange(nlev), sels)
        order = np.concatenate([sels, rest])
        inv = np.empty(nlev, dtype=np.int64)
        inv[order] = np.arange(nlev)
        bp = jnp.concatenate([jnp.concatenate([g[1] for g in groups]),
                              bp[rest]])[inv]
        bq = jnp.concatenate([jnp.concatenate([g[2] for g in groups]),
                              bq[rest]])[inv]

    bq = mjm.normalize(bq)
    xp = jnp.concatenate([xp, bp])
    xq = jnp.concatenate([xq, bq])
    row_of[bids] = next_row + np.arange(len(bids))
    next_row += len(bids)

  # restore body order with one static-permutation gather
  xpos = xp[row_of]
  xquat = xq[row_of]

  # joints: concat chunks, restore joint order
  if m.njnt:
    jids = np.concatenate([c[0] for c in anchor_chunks])
    jinv = np.empty(m.njnt, dtype=np.int64)
    jinv[jids] = np.arange(m.njnt)
    xanchor = jnp.concatenate([c[1] for c in anchor_chunks])[jinv]
    xaxis = jnp.concatenate([c[1] for c in axis_chunks])[jinv]
  else:
    xanchor = jnp.zeros((0, 3), dtype=dtype)
    xaxis = jnp.zeros((0, 3), dtype=dtype)

  xmat = mjm.quat_to_mat(xquat)
  xipos = xpos + mjm.rot_vec_quat(m.body_ipos, xquat)
  ximat = mjm.quat_to_mat(mjm.mul_quat(xquat, m.body_iquat))

  gb = m.geom_bodyid
  geom_xpos = xpos[gb] + mjm.rot_vec_quat(m.geom_pos, xquat[gb])
  geom_xmat = mjm.quat_to_mat(mjm.mul_quat(xquat[gb], m.geom_quat))
  sb = m.site_bodyid
  site_xpos = xpos[sb] + mjm.rot_vec_quat(m.site_pos, xquat[sb])
  site_xmat = mjm.quat_to_mat(mjm.mul_quat(xquat[sb], m.site_quat))

  return d.replace(qpos=qpos, xpos=xpos, xquat=xquat, xmat=xmat,
                   xipos=xipos, ximat=ximat, xanchor=xanchor, xaxis=xaxis,
                   geom_xpos=geom_xpos, geom_xmat=geom_xmat,
                   site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree CoM, c-frame spatial inertias, and dof motion axes (mj_comPos).

  The backward accumulation becomes one subtree-mask matmul; cinert is stored
  as a full 6x6 spatial inertia (vs the reference's packed 10-vector) so CRB
  and RNE are straight matmuls.
  """
  dtype = d.qpos.dtype
  sub = jnp.asarray(m.tree.subtree_mask, dtype=dtype)      # (nbody, nbody)
  moment = m.body_mass[:, None] * d.xipos                  # (nbody, 3)
  subtree_com = sub @ moment / jnp.maximum(
      m.body_subtreemass, mjm.MINVAL)[:, None]
  subtree_com = jnp.where((m.body_subtreemass > mjm.MINVAL)[:, None],
                          subtree_com, d.xipos)

  root_com = subtree_com[m.body_rootid]                    # (nbody, 3)
  offset = d.xipos - root_com
  cinert = mjm.spatial_inertia(m.body_mass, m.body_inertia, d.ximat, offset)
  cinert = cinert.at[0].set(0.0)

  # cdof per dof: axes depend on joint type (static per dof)
  jnt_of_dof = m.dof_jntid
  jtype = m.jnt_type[jnt_of_dof]                           # static numpy (nv,)
  bodyid = m.dof_bodyid
  anchor = d.xanchor[jnt_of_dof]
  off_ca = subtree_com[m.body_rootid[bodyid]] - anchor     # com - anchor

  # within-joint dof offset (static)
  dof_in_jnt = np.arange(m.nv) - m.jnt_dofadr[jnt_of_dof]

  # rotational axis candidates: xaxis for hinge, child-frame axes for
  # ball/free-rotation (xmat columns)
  axis_col = np.where(jtype == JointType.FREE, dof_in_jnt - 3, dof_in_jnt)
  axis_col = np.clip(axis_col, 0, 2)
  frame_axis = d.xmat[bodyid][np.arange(m.nv), :, axis_col]   # (nv, 3)
  hinge_axis = d.xaxis[jnt_of_dof]

  is_hinge = jnp.asarray(jtype == JointType.HINGE)
  is_slide = jnp.asarray(jtype == JointType.SLIDE)
  is_free_trans = jnp.asarray((jtype == JointType.FREE) & (dof_in_jnt < 3))

  rot_axis = jnp.where(is_hinge[:, None], hinge_axis, frame_axis)
  cdof_rot = jnp.concatenate([rot_axis, jnp.cross(rot_axis, off_ca)], axis=-1)

  world_axes = jnp.eye(3, dtype=dtype)[np.clip(dof_in_jnt, 0, 2)]
  slide_lin = jnp.where(is_free_trans[:, None], world_axes, hinge_axis)
  cdof_lin = jnp.concatenate([jnp.zeros_like(slide_lin), slide_lin], axis=-1)

  use_lin = is_slide | is_free_trans
  cdof = jnp.where(use_lin[:, None], cdof_lin, cdof_rot)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def crb(m: Model, d: Data) -> Data:
  """Composite rigid-body inertia and dense joint-space inertia matrix.

  mj_crb + mj_makeM (engine_core_smooth.c) reduced to masked matmuls:
  crb[b] = Σ_subtree cinert; M[i,j] = cdof_jᵀ crb[body_i] cdof_i on the
  dof-ancestor sparsity pattern, computed dense and symmetrized.
  """
  dtype = d.qpos.dtype
  sub = jnp.asarray(m.tree.subtree_mask, dtype=dtype)
  crb_ = jnp.einsum('bc,cij->bij', sub, d.cinert)

  u = jnp.einsum('vij,vj->vi', crb_[m.dof_bodyid], d.cdof)  # (nv, 6)
  p = u @ d.cdof.T                                          # (nv, nv)
  danc = jnp.asarray(m.tree.dof_ancestor_mask, dtype=bool)
  qm = jnp.where(danc, p, 0.0)
  qm = qm + qm.T - jnp.diag(jnp.diag(p))
  qm = qm + jnp.diag(m.dof_armature)
  if m.has_tendon_armature:
    # M += armature · ten_Jᵀ ten_J (mj_tendonArmature,
    # engine_core_smooth.c:1845), dense
    qm = qm + jnp.einsum('t,tv,tw->vw', m.tendon_armature, d.ten_J, d.ten_J)
  return d.replace(crb=crb_, qM=qm)


def factor_tree(m: Model, mat):
  """Fill-in-free tree L'DL' factorization of a matrix with qM's sparsity
  (mj_factorM / mj_factorI, engine_core_smooth.c + engine_util_solve.c).

  Tree mass matrices factor as M = Lᵀ D L with unit-lower L supported on the
  strict dof-ancestor chains — no fill-in. Statically unrolled over dof-tree
  *depth levels*: every level is one small batched gather/outer/scatter, so
  the sequential chain is the tree depth (~12 for a humanoid), not nv, and
  each step vectorizes over the env batch. This is the TPU replacement for
  the batched dense Cholesky, which XLA unrolls into nv sequential rank-1
  updates.

  Returns (L, Dinv): L (nv, nv) unit-lower on the chain pattern, Dinv (nv,).
  """
  nv = m.nv
  dtype = mat.dtype
  # scratch row/col nv absorbs padded-index writes
  mp = jnp.zeros((nv + 1, nv + 1), dtype=dtype).at[:nv, :nv].set(mat)
  lmat = jnp.zeros((nv + 1, nv + 1), dtype=dtype)
  anc_all = m.tree.dof_anc_table                       # (nv, A) padded w/ nv

  for level in reversed(m.tree.dof_levels):            # deepest first
    ks = level                                         # (nk,) static
    anc = anc_all[ks]                                  # (nk, A) static
    mkk = mp[ks, ks]                                   # (nk,)
    mk_anc = mp[ks[:, None], anc]                      # (nk, A)
    a = mk_anc / mkk[:, None]
    # chain update: ancestors of k form a chain → full outer product valid
    upd = a[:, :, None] * mk_anc[:, None, :]           # (nk, A, A)
    mp = mp.at[anc[:, :, None], anc[:, None, :]].add(-upd)
    lmat = lmat.at[ks[:, None], anc].set(a)
  dinv = 1.0 / mp[jnp.arange(nv), jnp.arange(nv)]
  return lmat[:nv, :nv], dinv


def solve_tree(m: Model, lmat, dinv, y):
  """Solve (Lᵀ D L) x = y given factor_tree output (mj_solveLD).

  Level-synchronous two-sweep substitution; y may have leading batch dims
  ending in (nv,).
  """
  nv = m.nv
  anc_all = m.tree.dof_anc_table
  batch = y.shape[:-1]
  z = jnp.concatenate(
      [y, jnp.zeros(batch + (1,), dtype=y.dtype)], axis=-1)  # scratch col

  # Lᵀ z = y : descendants first
  for level in reversed(m.tree.dof_levels):
    ks = level
    anc = anc_all[ks]                                  # (nk, A)
    contrib = lmat[ks[:, None], anc] * z[..., ks, None]  # (..., nk, A)
    flat = anc.reshape(-1)
    z = z.at[..., flat].add(-contrib.reshape(batch + (-1,)))

  z = z.at[..., :nv].multiply(dinv)

  # L x = z : ancestors first (root level downward)
  for level in m.tree.dof_levels:
    ks = level
    anc = anc_all[ks]
    dot = jnp.einsum('ka,...ka->...k', lmat[ks[:, None], anc], z[..., anc])
    z = z.at[..., ks].add(-dot)
  return z[..., :nv]


def factor_m(m: Model, d: Data) -> Data:
  """Factor qM (mj_factorM): tree L'DL', stored in (qLD, qLDiagInv)."""
  lmat, dinv = factor_tree(m, d.qM)
  return d.replace(qLD=lmat, qLDiagInv=dinv)


def solve_m(m: Model, d: Data, y):
  """M⁻¹ y via the cached tree factor (mj_solveM). y: (..., nv)."""
  return solve_tree(m, d.qLD, d.qLDiagInv, y)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities + cdof time-derivatives (mj_comVel).

  Dense form: cvel = (anc ⊙ qvel) @ cdof; cdof_dot_j = v_pred(j) × cdof_j
  with v_pred the masked predecessor velocity (Model.tree.cdofdot_mask
  encodes mj_comVel's exact accumulation order — see engine_core_smooth.c:2179).
  """
  dtype = d.qpos.dtype
  anc = jnp.asarray(m.tree.ancestor_mask, dtype=dtype)
  cvel = (anc * d.qvel[None, :]) @ d.cdof                  # (nbody, 6)

  pred = jnp.asarray(m.tree.cdofdot_mask, dtype=dtype)
  v_pred = (pred * d.qvel[None, :]) @ d.cdof               # (nv, 6)
  cdof_dot = mjm.motion_cross(v_pred, d.cdof)
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def rne(m: Model, d: Data, flg_acc: bool = False):
  """Recursive Newton-Euler → qfrc_bias (mj_rne, engine_core_smooth.c:2328),
  as three masked dense contractions (no tree recursion):

    cacc[b]  = base + Σ_anc (cdof_dot qvel [+ cdof qacc]),  base = (0; −g)
    f[b]     = I_b cacc_b + v_b ×* (I_b v_b)
    result_v = Σ_{b ∈ subtree(body_v)} cdof_v · f_b
  """
  dtype = d.qpos.dtype
  anc = jnp.asarray(m.tree.ancestor_mask, dtype=dtype)

  base = jnp.zeros((6,), dtype=dtype)
  if not m.disabled(DisableBit.GRAVITY):
    base = base.at[3:].set(-m.opt.gravity)

  cacc = base[None, :] + (anc * d.qvel[None, :]) @ d.cdof_dot
  if flg_acc:
    cacc = cacc + (anc * d.qacc[None, :]) @ d.cdof

  icvel = jnp.einsum('bij,bj->bi', d.cinert, d.cvel)
  f = jnp.einsum('bij,bj->bi', d.cinert, cacc) + mjm.force_cross(d.cvel, icvel)

  # accumulate subtree forces onto each dof's body, then project on cdof
  tmp = anc.T @ f                                          # (nv, 6)
  return jnp.sum(tmp * d.cdof, axis=-1)


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths and Jacobians (mj_tendon, engine_core_smooth.c:927):
  fixed tendons as joint-coefficient sums; spatial tendons (site paths with
  sphere/cylinder wrapping, pulleys, sidesites) in ops/tendon.py."""
  if m.ntendon == 0:
    return d
  from mujoco_tpu.models.types import WrapType
  from mujoco_tpu.ops import tendon as tendon_mod
  dtype = d.qpos.dtype
  lengths = []
  rows = []
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wtypes = m.wrap_type[adr:adr + num]
    if np.all(wtypes == WrapType.JOINT):  # fixed tendon
      jids = m.wrap_objid[adr:adr + num]
      coef = m.wrap_prm[adr:adr + num]
      qadr = m.jnt_qposadr[jids]
      dadr = m.jnt_dofadr[jids]
      lengths.append(jnp.sum(coef * d.qpos[qadr]))
      row = jnp.zeros((m.nv,), dtype=dtype).at[dadr].add(coef)
      rows.append(row)
    else:  # spatial tendon
      length, row = tendon_mod.spatial_tendon(m, d, t)
      lengths.append(length)
      rows.append(row)
  return d.replace(ten_length=jnp.stack(lengths), ten_J=jnp.stack(rows))


def _ancestor_chain_mask(m: Model, bodyid: int, refbody: int) -> np.ndarray:
  """Static dof mask clearing the common-ancestor parental chain of two
  bodies (engine_core_smooth.c:1600-1627). 1 = keep column, 0 = clear."""
  b0 = int(m.body_weldid[bodyid])
  b1 = int(m.body_weldid[refbody])
  da0 = int(m.body_dofadr[b0] + m.body_dofnum[b0] - 1)
  da1 = int(m.body_dofadr[b1] + m.body_dofnum[b1] - 1)
  common = -1
  if da0 >= 0 and da1 >= 0:
    a, b = da0, da1
    while a != b and a >= 0 and b >= 0:
      if a < b:
        b = int(m.dof_parentid[b])
      else:
        a = int(m.dof_parentid[a])
    if a == b and a >= 0:
      common = a
  chain_mask = np.ones(m.nv, dtype=bool)
  da = common
  while da >= 0:
    chain_mask[da] = False
    da = int(m.dof_parentid[da])
  return chain_mask


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths and moment arms (mj_transmission,
  engine_core_smooth.c): JOINT/JOINTINPARENT for all 4 joint types, TENDON,
  SITE, SLIDERCRANK. Static per-actuator unroll (nu is small and structure
  static); moment rows are built scatter-free — per-actuator values land in
  per-row lists and static one-hot dof masks replace scatters, keeping the
  batched XLA graph free of scatter ops.
  """
  if m.nu == 0:
    return d
  from mujoco_tpu.models.types import JointType, TrnType
  dtype = d.qpos.dtype
  lengths = []
  rows = []

  def onehot(dadr, n=1):
    mask = np.zeros((m.nv,), dtype=np.float32 if dtype == jnp.float32
                    else np.float64)
    mask[dadr:dadr + n] = 1.0
    return mask

  for i in range(m.nu):
    trn = int(m.actuator_trntype[i])
    gear = m.actuator_gear[i]
    tid = int(m.actuator_trnid[i, 0])
    length = jnp.zeros((), dtype=dtype)
    row = None
    if trn in (TrnType.JOINT, TrnType.JOINTINPARENT):
      jt = int(m.jnt_type[tid])
      qadr = int(m.jnt_qposadr[tid])
      dadr = int(m.jnt_dofadr[tid])
      if jt in (JointType.SLIDE, JointType.HINGE):
        length = d.qpos[qadr] * gear[0]
        row = onehot(dadr) * gear[0]
      elif jt == JointType.BALL:
        quat = mjm.normalize(d.qpos[qadr:qadr + 4])
        axis = mjm.quat_to_vel(quat)
        gear_axis = gear[:3]
        if trn == TrnType.JOINTINPARENT:
          gear_axis = mjm.rot_vec_quat(gear[:3], mjm.conj_quat(quat))
        length = jnp.dot(axis, gear_axis)
        row = jnp.concatenate([jnp.zeros((dadr,), dtype=dtype), gear_axis,
                               jnp.zeros((m.nv - dadr - 3,), dtype=dtype)])
      else:  # FREE
        gear_rot = gear[3:6]
        if trn == TrnType.JOINTINPARENT:
          quat = mjm.normalize(d.qpos[qadr + 3:qadr + 7])
          gear_rot = mjm.rot_vec_quat(gear[3:6], mjm.conj_quat(quat))
        row = jnp.concatenate([
            jnp.zeros((dadr,), dtype=dtype), gear[:3], gear_rot,
            jnp.zeros((m.nv - dadr - 6,), dtype=dtype)])
    elif trn == TrnType.TENDON:
      length = d.ten_length[tid] * gear[0]
      row = d.ten_J[tid] * gear[0]
    elif trn == TrnType.SLIDERCRANK:
      # slider-crank (engine_core_smooth.c mjTRN_SLIDERCRANK):
      # length = a·v − √(det), det = (a·v)² + rod² − v·v
      from mujoco_tpu.ops import support
      sid = tid
      idslider = int(m.actuator_trnid[i, 1])
      rod = m.actuator_cranklength[i]
      axis = d.site_xmat[idslider][:, 2]
      vec = d.site_xpos[sid] - d.site_xpos[idslider]
      av = jnp.dot(vec, axis)
      det = av * av + rod * rod - jnp.dot(vec, vec)
      ok = det > 0
      sdet = jnp.sqrt(jnp.where(ok, det, 1.0))
      leng = jnp.where(ok, av - sdet, av)
      dldv = jnp.where(ok, axis * (1 - av / sdet) + vec / sdet, axis)
      dlda = jnp.where(ok, vec * (1 - av / sdet), vec)
      sbody = int(m.site_bodyid[idslider])
      jacp_s, jacr_s = support.jac(m, d, d.site_xpos[idslider], sbody)
      # jacAxis column j = jacr_col_j × axis
      jac_a = jnp.cross(jacr_s.T, axis[None, :]).T         # (3, nv)
      jacp_site, _ = support.jac(m, d, d.site_xpos[sid],
                                 int(m.site_bodyid[sid]))
      jac_v = jacp_site - jacp_s
      length = leng * gear[0]
      row = (dlda @ jac_a + dldv @ jac_v) * gear[0]
    elif trn == TrnType.SO3:
      # relative orientation: 3 lengths + 3 moment rows
      # (mjTRN_SO3, engine_core_smooth.c:1482-1560)
      refid = int(m.actuator_trnid[i, 1])
      if refid == -1:
        # ball joint: lengths = expmap of the joint quat, rows = identity
        # at the joint dofs
        qadr = int(m.jnt_qposadr[tid])
        dadr = int(m.jnt_dofadr[tid])
        quat = mjm.normalize(d.qpos[qadr:qadr + 4])
        axis = mjm.quat_to_vel(quat)
        for k in range(3):
          lengths.append(axis[k])
          rows.append(jnp.asarray(onehot(dadr + k), dtype=dtype))
      else:
        # site + refsite: lengths = relative expmap in the refsite frame,
        # rows = site axes projected on the relative rotational Jacobian
        # with the common-ancestor dof chain cleared
        from mujoco_tpu.ops import support
        sid = tid
        bodyid = int(m.site_bodyid[sid])
        refbody = int(m.site_bodyid[refid])
        quat = mjm.mul_quat(m.site_quat[sid], d.xquat[bodyid])
        refquat = mjm.mul_quat(m.site_quat[refid], d.xquat[refbody])
        vec = mjm.quat_sub(quat, refquat)
        _, jacr = support.jac(m, d, d.site_xpos[sid], bodyid)
        _, jacr_r = support.jac(m, d, d.site_xpos[refid], refbody)
        chain = jnp.asarray(_ancestor_chain_mask(m, bodyid, refbody),
                            dtype=dtype)
        jac_rel = (jacr - jacr_r) * chain[None, :]
        for k in range(3):
          lengths.append(vec[k])
          # wrench = site axis k in the global frame (column k of site_xmat)
          rows.append(d.site_xmat[sid][:, k] @ jac_rel)
      continue
    elif trn == TrnType.SITE:
      from mujoco_tpu.ops import support
      sid = tid
      refid = int(m.actuator_trnid[i, 1])
      bodyid = int(m.site_bodyid[sid])
      jacp, jacr = support.jac(m, d, d.site_xpos[sid], bodyid)  # (3, nv)
      if refid == -1:
        wrench_t = d.site_xmat[sid] @ gear[:3]
        wrench_r = d.site_xmat[sid] @ gear[3:6]
        row = wrench_t @ jacp + wrench_r @ jacr
      else:
        refbody = int(m.site_bodyid[refid])
        # static common-ancestor dof chain (engine_core_smooth.c:1600-1627)
        chain = jnp.asarray(_ancestor_chain_mask(m, bodyid, refbody),
                            dtype=dtype)

        jacp_r, jacr_r = support.jac(m, d, d.site_xpos[refid], refbody)
        row = jnp.zeros((m.nv,), dtype=dtype)
        leng = jnp.zeros((), dtype=dtype)
        # translational part
        vec_t = d.site_xmat[refid].T @ (d.site_xpos[sid] - d.site_xpos[refid])
        leng = leng + jnp.dot(vec_t, gear[:3])
        wrench_t = d.site_xmat[refid] @ gear[:3]
        row = row + wrench_t @ ((jacp - jacp_r) * chain[None, :])
        # rotational part (quat order matches the reference:
        # site_quat ⊗ xquat, engine_core_smooth.c mjTRN_SITE)
        quat = mjm.mul_quat(m.site_quat[sid], d.xquat[bodyid])
        refquat = mjm.mul_quat(m.site_quat[refid], d.xquat[refbody])
        vec_r = mjm.quat_sub(quat, refquat)
        leng = leng + jnp.dot(vec_r, gear[3:6])
        wrench_r = d.site_xmat[refid] @ gear[3:6]
        row = row + wrench_r @ ((jacr - jacr_r) * chain[None, :])
        length = leng
    elif trn == TrnType.BODY:
      # adhesion (mjTRN_BODY, engine_core_smooth.c:1719): length 0; moment
      # is minus the average of the normal Jacobians of all contacts
      # involving the body. Active rows are gathered from efc_J: elliptic /
      # frictionless contacts weight the normal row with 1, pyramidal ones
      # spread 0.5/(dim-1) over the edge rows (their sum reconstructs the
      # normal direction). Contact relevance is traced (works with dynamic
      # slots / flex budgets); the reference's gap-excluded branch
      # (exclude==1) cannot occur here because slots use includemargin as
      # the detection margin.
      from mujoco_tpu.models.types import ConeType
      ncon = m.con.ncon
      if ncon == 0 or m.efc.ncon_rows == 0:
        row = jnp.zeros((m.nv,), dtype=dtype)
      else:
        gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
        gids = d.contact.geomids
        bodies = gb[jnp.maximum(gids, 0)]
        rel = ((d.contact.dist < d.contact.includemargin)
               & jnp.all(gids >= 0, axis=1)
               & ((bodies[:, 0] == tid) | (bodies[:, 1] == tid)))
        counter = jnp.sum(rel).astype(dtype)
        elliptic = int(m.opt.cone) == int(ConeType.ELLIPTIC)
        w = jnp.zeros((m.efc.nefc,), dtype=dtype)
        for c in range(ncon):
          cdim = int(m.con.condim[c])
          adr = int(m.efc.con_efcadr[c])
          sel = jnp.where(rel[c], 1.0, 0.0)
          if cdim == 1 or elliptic:
            w = w.at[adr].add(sel)
          else:
            w = w.at[adr:adr + 2 * (cdim - 1)].add(sel * 0.5 / (cdim - 1))
        row = jnp.where(counter > 0,
                        -(w @ d.efc_J) / jnp.maximum(counter, 1.0), 0.0)
    else:
      raise NotImplementedError(f"transmission type {trn}")
    lengths.append(length)
    rows.append(jnp.asarray(row, dtype=dtype) if row is not None
                else jnp.zeros((m.nv,), dtype=dtype))
  return d.replace(actuator_length=jnp.stack(lengths),
                   actuator_moment=jnp.stack(rows))


def com_acc(m: Model, d: Data):
  """Body spatial accelerations given qacc (used by acc-stage sensors and
  rnePostConstraint analog)."""
  dtype = d.qpos.dtype
  anc = jnp.asarray(m.tree.ancestor_mask, dtype=dtype)
  base = jnp.zeros((6,), dtype=dtype)
  if not m.disabled(DisableBit.GRAVITY):
    base = base.at[3:].set(-m.opt.gravity)
  cacc = (base[None, :] + (anc * d.qvel[None, :]) @ d.cdof_dot
          + (anc * d.qacc[None, :]) @ d.cdof)
  return cacc


def camlight(m: Model, d: Data) -> Data:
  """Camera/light frames (mj_camlight, engine_core_smooth.c): FIXED, TRACK,
  TRACKCOM, TARGETBODY, TARGETBODYCOM modes; static per-object unroll."""
  if m.ncam == 0 and m.nlight == 0:
    return d
  dtype = d.qpos.dtype
  cam_xpos = d.cam_xpos
  cam_xmat = d.cam_xmat
  for i in range(m.ncam):
    bid = int(m.cam_bodyid[i])
    tid = int(m.cam_targetbodyid[i])
    mode = int(m.cam_mode[i])
    pos = d.xpos[bid] + d.xmat[bid] @ m.cam_pos[i]
    mat = mjm.quat_to_mat(mjm.mul_quat(d.xquat[bid], m.cam_quat[i]))
    if mode in (1, 2):  # TRACK, TRACKCOM
      mat = m.cam_mat0[i]
      if mode == 1:
        pos = d.xpos[bid] + m.cam_pos0[i]
      else:
        pos = d.subtree_com[bid] + m.cam_poscom0[i]
    elif mode in (3, 4) and tid >= 0:  # TARGETBODY, TARGETBODYCOM
      target = d.xpos[tid] if mode == 3 else d.subtree_com[tid]
      z = mjm.normalize(pos - target)          # -view direction
      up = jnp.array([0.0, 0, 1], dtype=dtype)
      x = mjm.normalize(jnp.cross(up, z))
      y = mjm.normalize(jnp.cross(z, x))
      mat = jnp.stack([x, y, z], axis=-1)      # columns = axes
    cam_xpos = cam_xpos.at[i].set(pos)
    cam_xmat = cam_xmat.at[i].set(mat)

  light_xpos = d.light_xpos
  light_xdir = d.light_xdir
  for i in range(m.nlight):
    bid = int(m.light_bodyid[i])
    tid = int(m.light_targetbodyid[i])
    mode = int(m.light_mode[i])
    pos = d.xpos[bid] + d.xmat[bid] @ m.light_pos[i]
    xdir = mjm.rot_vec_quat(m.light_dir[i], d.xquat[bid])
    if mode in (1, 2):  # TRACK, TRACKCOM
      xdir = m.light_dir0[i]
      if mode == 1:
        pos = d.xpos[bid] + m.light_pos0[i]
      else:
        pos = d.subtree_com[bid] + m.light_poscom0[i]
    elif mode in (3, 4) and tid >= 0:
      target = d.xpos[tid] if mode == 3 else d.subtree_com[tid]
      xdir = target - pos
    light_xdir = light_xdir.at[i].set(mjm.normalize(xdir))
    light_xpos = light_xpos.at[i].set(pos)
  return d.replace(cam_xpos=cam_xpos, cam_xmat=cam_xmat,
                   light_xpos=light_xpos, light_xdir=light_xdir)
