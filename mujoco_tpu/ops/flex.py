"""Flex (deformable) kinematics: vertex positions, edge lengths/Jacobians.

Counterpart of mj_flex (/root/reference/src/engine/engine_core_smooth.c:548)
for non-interpolated flexes: vertices ride their bodies (centered → body
origin, otherwise body frame offset), edge lengths/Jacobians feed the
mjEQ_FLEX equality rows, edge spring-dampers, and flex contacts.

Everything is vectorized over vertices/edges with static topology from
Model.flx; the edge Jacobian is the dense masked-contraction analog of the
reference's sparse mj_jacDifPair chain rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.utils import math as mjm


def flex(m: Model, d: Data) -> Data:
  """Flex vertex positions + edge lengths and Jacobians (mj_flex)."""
  flx = m.flx
  if flx.nflex == 0:
    return d
  dtype = d.qpos.dtype

  # vertex positions: body origin when centered or zero offset, else
  # body frame transform of the local offset (engine_core_smooth.c:566-577)
  bid = np.maximum(flx.vertbodyid, 0)                # (nvert,) static
  base = d.xpos[bid]
  offset = jnp.einsum('vij,vj->vi', d.xmat[bid], m.flex_vert)
  centered = flx.centered[_vert_flexid(flx)] | flx.vert_iszero
  vert_xpos = jnp.where(jnp.asarray(centered)[:, None], base, base + offset)

  # interpolated flexes: vertices are trilinear blends of node body
  # positions (engine_core_smooth.c:580-625); node ids/weights are static
  if flx.nnode:
    nb = flx.nodebodyid
    nbase = d.xpos[nb]
    noff = jnp.einsum('nij,nj->ni', d.xmat[nb], m.flex_node)
    node_flexid = np.repeat(np.arange(flx.nflex), flx.nodenum)
    ncent = flx.centered[node_flexid] | flx.node_iszero
    node_xpos = jnp.where(jnp.asarray(ncent)[:, None], nbase,
                          nbase + noff)
    ipos = jnp.einsum('vk,vkc->vc',
                      jnp.asarray(flx.vert_nodew, dtype=dtype),
                      node_xpos[flx.vert_node])
    is_interp = np.asarray(flx.interp)[_vert_flexid(flx)] >= 1
    vert_xpos = jnp.where(jnp.asarray(is_interp)[:, None], ipos,
                          vert_xpos)

  # edge lengths (engine_core_smooth.c:718-721)
  v1 = flx.edge[:, 0]
  v2 = flx.edge[:, 1]
  vec = vert_xpos[v2] - vert_xpos[v1]                # (nedge, 3)
  length = mjm.norm_safe(vec)
  uvec = vec / length[:, None]

  # edge Jacobians: J_e = uvecᵀ·(jacp(pos2, b2) − jacp(pos1, b1)), built as
  # masked dense contractions over cdof (mj_jacDifPair + chain rule,
  # engine_core_smooth.c:728-739)
  ej = d.flexedge_J
  if flx.nedge:
    anc = m.tree.ancestor_mask                       # (nbody, nv) static
    o = d.subtree_com[m.body_rootid[m.dof_bodyid]]   # (nv, 3)
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:]

    def point_jac(points, bodies):
      # (ne, nv, 3): per-edge-endpoint translational jacobian
      mask = jnp.asarray(anc[bodies], dtype=dtype)   # (ne, nv)
      jac = lin[None] + jnp.cross(
          jnp.broadcast_to(ang[None], (points.shape[0],) + ang.shape),
          points[:, None, :] - o[None])
      return jac * mask[..., None]

    j2 = point_jac(vert_xpos[v2], bid[v2])
    j1 = point_jac(vert_xpos[v1], bid[v1])
    ej = jnp.einsum('enc,ec->en', j2 - j1, uvec)
    # interp/rigid edges generate no forces and their vertices have no
    # bodies — zero their rows (engine_core_smooth.c:696)
    if flx.edge_rigid.any():
      ej = ej * jnp.asarray(~flx.edge_rigid, dtype=dtype)[:, None]

  return d.replace(flexvert_xpos=vert_xpos, flexedge_length=length,
                   flexedge_J=ej)


def _vert_flexid(flx) -> np.ndarray:
  """Static vertex → flex id map."""
  out = np.zeros(flx.nvert, dtype=np.int32)
  for f in range(flx.nflex):
    out[flx.vertadr[f]:flx.vertadr[f] + flx.vertnum[f]] = f
  return out


# local edge → (endpoint0, endpoint1) vertex indexing inside an element, for
# dim-2 (3 edges / 3 verts) and dim-3 (6 edges / 4 verts)
# (engine_passive.c:41-44)
_ELEM_EDGES = {
    2: np.array([[1, 2], [2, 0], [0, 1]], dtype=np.int32),
    3: np.array([[0, 1], [1, 2], [2, 0], [2, 3], [0, 3], [1, 3]],
                dtype=np.int32),
}


def _triu_index(n: int) -> np.ndarray:
  """(n, n) map into the packed upper-triangular coefficient vector used by
  flex_stiffness (id counts ed1-major over ed2 >= ed1)."""
  idx = np.zeros((n, n), dtype=np.int32)
  k = 0
  for i in range(n):
    for j in range(i, n):
      idx[i, j] = idx[j, i] = k
      k += 1
  return idx


def _vert_qvel(m: Model, d: Data):
  """(nvert, 3) translational qvel of each flex vertex body (zero when the
  body does not have exactly 3 dofs — engine_passive.c:502-507)."""
  flx = m.flx
  adr = np.where(flx.vert_free, np.maximum(flx.vert_dofadr, 0), 0)
  cols = adr[:, None] + np.arange(3)[None, :]
  v = d.qvel[np.clip(cols, 0, max(m.nv - 1, 0))]
  return jnp.where(jnp.asarray(flx.vert_free)[:, None], v, 0.0)


def _insert_vertex_forces(m: Model, d: Data, force, verts_mask):
  """Map world-space per-vertex forces into qfrc: simple vertex bodies get
  the body-frame rotation into their 3 slide dofs
  (engine_passive.c:639-647); the rest go through the point Jacobian
  (mj_applyFT with zero torque)."""
  flx = m.flx
  dtype = d.qpos.dtype
  qfrc = jnp.zeros((m.nv,), dtype=dtype)

  simple = flx.vert_simple & verts_mask
  if simple.any():
    vs = np.where(simple)[0]
    bid = flx.vertbodyid[vs]
    loc = jnp.einsum('vij,vi->vj', d.xmat[bid], force[vs])  # xmatᵀ · F
    cols = (flx.vert_dofadr[vs][:, None] + np.arange(3)[None, :]).reshape(-1)
    qfrc = qfrc.at[cols].add(loc.reshape(-1))

  other = verts_mask & ~flx.vert_simple
  if other.any():
    vs = np.where(other)[0]
    bid = flx.vertbodyid[vs]
    anc = m.tree.ancestor_mask                       # (nbody, nv) static
    o = d.subtree_com[m.body_rootid[m.dof_bodyid]]   # (nv, 3)
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:]
    mask = jnp.asarray(anc[bid], dtype=dtype)        # (k, nv)
    pts = d.flexvert_xpos[vs]
    jac = lin[None] + jnp.cross(
        jnp.broadcast_to(ang[None], (len(vs),) + ang.shape),
        pts[:, None, :] - o[None])                   # (k, nv, 3)
    qfrc = qfrc + jnp.einsum('knc,kc->n', jac * mask[..., None], force[vs])
  return qfrc


def elasticity_passive(m: Model, d: Data, enbl_spring: bool,
                       enbl_damper: bool):
  """Element stretch + thin-plate bending forces → (qfrc_spring_add,
  qfrc_damper_add).

  Stretch: per-element Saint-Venant metric over squared edge elongations
  with generalized Rayleigh damping folded in (mj_flexPassiveStretch,
  engine_passive.c:551-651). Bending: discrete Crouzeix-Raviart thin-plate
  operator per interior edge + flap (mj_flexPassiveBend,
  engine_passive.c:459-547). Both vectorized over elements/edges with
  static topology; scatter-adds replace the reference's per-element loops.
  """
  flx = m.flx
  dtype = d.qpos.dtype
  zero = jnp.zeros((m.nv,), dtype=dtype)
  spring_add = zero
  damper_add = zero
  dt = m.opt.timestep

  # ----- stretch (engine_passive.c:580-630)
  if flx.has_stretch.any():
    fvert = jnp.zeros((flx.nvert, 3), dtype=dtype)
    touched = np.zeros(flx.nvert, dtype=bool)
    for dm in (2, 3):
      els = np.where((flx.dim[flx.elem_flexid] == dm)
                     & flx.has_stretch[flx.elem_flexid])[0]
      if not len(els):
        continue
      ne_loc = 3 if dm == 2 else 6
      tab = _ELEM_EDGES[dm]                          # (ne_loc, 2) local verts
      verts = flx.elem[els, :dm + 1]                 # (E, dm+1) global verts
      eidx = flx.elemedge[els, :ne_loc]              # (E, ne_loc) global edges
      fid = flx.elem_flexid[els]
      kD = jnp.where(dt > 0, m.flex_damping[fid] / dt, 0.0)

      L = d.flexedge_length[eidx]
      L0 = m.flexedge_length0[eidx]
      vel = d.flexedge_velocity[eidx]
      prev = L - vel * dt
      elong = L * L - L0 * L0 + (L * L - prev * prev) * kD[:, None]

      metric = m.flex_stiffness[els][:, _triu_index(ne_loc)]  # (E, ne, ne)
      c = jnp.einsum('ea,eab->eb', elong, metric)    # (E, ne_loc)

      va = verts[:, tab[:, 0]]                       # (E, ne_loc) global
      vb = verts[:, tab[:, 1]]
      gvec = d.flexvert_xpos[va] - d.flexvert_xpos[vb]
      contrib = c[..., None] * gvec                  # (E, ne_loc, 3)
      fvert = fvert.at[va.reshape(-1)].add(-contrib.reshape(-1, 3))
      fvert = fvert.at[vb.reshape(-1)].add(contrib.reshape(-1, 3))
      touched[np.unique(verts)] = True
    spring_add = spring_add + _insert_vertex_forces(m, d, fvert, touched)

  # ----- bending (engine_passive.c:475-546)
  eb = np.where(flx.has_bending[flx.edge_flexid]
                & (flx.edgeflap[:, 1] >= 0))[0]
  if len(eb):
    v = np.concatenate([flx.edge[eb], flx.edgeflap[eb]], axis=1)  # (E, 4)
    B = m.flex_bending[eb]
    Bm = B[:, :16].reshape(-1, 4, 4)
    x = d.flexvert_xpos[v]                           # (E, 4, 3)
    e0 = x[:, 1] - x[:, 0]
    e1 = x[:, 2] - x[:, 0]
    e2 = x[:, 3] - x[:, 0]
    f1 = jnp.cross(e1, e2)
    f2 = jnp.cross(e2, e0)
    f3 = jnp.cross(e0, e1)
    frc = jnp.stack([-(f1 + f2 + f3), f1, f2, f3], axis=1)  # (E, 4, 3)

    spring = jnp.einsum('eij,ejx->eix', Bm, x) + B[:, 16, None, None] * frc
    velv = _vert_qvel(m, d)[v]                       # (E, 4, 3)
    damper = jnp.einsum('eij,ejx->eix', Bm, velv)

    # insertion: free (3-dof) vertex bodies only, rotated into the body
    # frame; spring subtracted, damper scaled by flex_damping
    free = jnp.asarray(flx.vert_free[v], dtype=dtype)[..., None]
    fdmp = m.flex_damping[flx.edge_flexid[eb]]
    bs = jnp.zeros((flx.nvert, 3), dtype=dtype)
    bd = jnp.zeros((flx.nvert, 3), dtype=dtype)
    if enbl_spring:
      bs = bs.at[v.reshape(-1)].add((-spring * free).reshape(-1, 3))
    if enbl_damper:
      bd = bd.at[v.reshape(-1)].add(
          (-damper * free * fdmp[:, None, None]).reshape(-1, 3))

    bid = flx.vertbodyid
    freev = np.asarray(flx.vert_free)
    vs = np.where(freev)[0]
    if len(vs):
      b2 = bid[vs]
      cols = (flx.vert_dofadr[vs][:, None] + np.arange(3)[None, :]).reshape(-1)
      if enbl_spring:
        loc = jnp.einsum('vij,vi->vj', d.xmat[b2], bs[vs])
        spring_add = spring_add.at[cols].add(loc.reshape(-1))
      if enbl_damper:
        loc = jnp.einsum('vij,vi->vj', d.xmat[b2], bd[vs])
        damper_add = damper_add.at[cols].add(loc.reshape(-1))

  return spring_add, damper_add


def edge_passive(m: Model, d: Data):
  """Flex edge spring-damper forces → (qfrc_spring_add, qfrc_damper_add)
  (engine_passive.c:760-791)."""
  flx = m.flx
  dtype = d.qpos.dtype
  zero = jnp.zeros((m.nv,), dtype=dtype)
  if flx.nedge == 0:
    return zero, zero
  fid = flx.edge_flexid
  k = m.flex_edgestiffness[fid]
  c = m.flex_edgedamping[fid]
  live = jnp.asarray(~(flx.rigid[fid] | flx.edge_rigid), dtype=dtype)
  frc_spring = live * k * (m.flexedge_length0 - d.flexedge_length)
  frc_damper = live * (-c) * d.flexedge_velocity
  return d.flexedge_J.T @ frc_spring, d.flexedge_J.T @ frc_damper


def contact_body_weights(m: Model, d: Data, vids, conflex, pos):
  """Per-contact (bodies, weights), each (ncon, 8): the physical bodies a
  flex contact side attributes force to. Non-interpolated flexes use
  inverse-distance weights over the element's vertex bodies
  (mj_elemBodyWeight, engine_core_constraint.c:221; 4 slots + 4 zero pads);
  interpolated flexes chain through the trilinear basis at the contact's
  rest-space coordinates (the flexInterpWeights path,
  engine_core_constraint.c:270-360): coord = Σ|w_i|·vert0_i, traced cell
  lookup, 8 node bodies with basis weights.

  vids: (ncon, 4) traced local→global vertex ids (-1 padded);
  conflex: (ncon,) STATIC flex id per slot (-1 for non-flex slots);
  pos: (ncon, 3) contact positions."""
  flx = m.flx
  dtype = d.qpos.dtype
  ncon = vids.shape[0]
  valid = vids >= 0
  vsafe = jnp.maximum(vids, 0)
  vpos = d.flexvert_xpos[vsafe]                      # (ncon, 4, 3)
  dvert = mjm.norm_safe(pos[:, None, :] - vpos)
  w = jnp.where(valid, 1.0 / jnp.maximum(mjm.MINVAL, dvert), 0.0)
  w = w / jnp.maximum(mjm.MINVAL, jnp.sum(w, axis=1, keepdims=True))

  vb = jnp.asarray(flx.vertbodyid, dtype=jnp.int32)[vsafe]
  w4 = jnp.where(vb >= 0, w, 0.0)
  bodies = jnp.concatenate(
      [jnp.maximum(vb, 0), jnp.zeros((ncon, 4), dtype=jnp.int32)], axis=1)
  weights = jnp.concatenate(
      [w4, jnp.zeros((ncon, 4), dtype=dtype)], axis=1)

  conflex = np.asarray(conflex)
  order_np = np.where(conflex >= 0,
                      np.asarray(flx.interp)[np.maximum(conflex, 0)], 0)
  is_interp = order_np >= 1
  if not is_interp.any():
    return bodies, weights
  omax = int(order_np.max())
  npc = (omax + 1) ** 3
  if npc > weights.shape[1]:                         # widen to 27 slots
    padn = npc - weights.shape[1]
    bodies = jnp.concatenate(
        [bodies, jnp.zeros((ncon, padn), dtype=jnp.int32)], axis=1)
    weights = jnp.concatenate(
        [weights, jnp.zeros((ncon, padn), dtype=dtype)], axis=1)

  # rest-space coordinates of the contact (absolute weights)
  v0 = jnp.asarray(flx.vert0, dtype=dtype)[vsafe]    # (ncon, 4, 3)
  coord = jnp.einsum('cw,cwk->ck', w, v0)
  cn = np.asarray(flx.cellnum)[np.maximum(conflex, 0)].astype(np.float64)
  cnj = jnp.asarray(cn, dtype=dtype)                 # (ncon, 3)
  ci = jnp.clip(jnp.floor(coord * cnj), 0.0,
                jnp.maximum(cnj - 1.0, 0.0))
  local = jnp.clip(coord * cnj - ci, 0.0, 1.0)       # (ncon, 3)
  ci = ci.astype(jnp.int32)
  order_j = jnp.asarray(order_np.astype(np.int32))   # (ncon,)
  ny_g = jnp.asarray((cn[:, 1].astype(np.int32)) * order_np + 1)
  nz_g = jnp.asarray((cn[:, 2].astype(np.int32)) * order_np + 1)
  nadr = jnp.asarray(np.asarray(flx.nodeadr)[np.maximum(conflex, 0)])
  o2 = jnp.asarray(order_np == 2)

  def phi(s, i):
    """mju_flexPhi with per-slot static order (engine_util_misc.h:130)."""
    lin = jnp.where(i == 0, 1.0 - s, jnp.where(i == 1, s, 0.0))
    quad = jnp.where(i == 0, 2 * s * s - 3 * s + 1,
                     jnp.where(i == 1, 4 * (s - s * s), 2 * s * s - s))
    return jnp.where(o2, quad, lin)

  nbody = jnp.asarray(
      np.concatenate([np.asarray(flx.nodebodyid, dtype=np.int32),
                      np.zeros(1, dtype=np.int32)]))
  ib = []
  iw = []
  for i0 in range(omax + 1):
    for i1 in range(omax + 1):
      for i2 in range(omax + 1):
        idx = (((ci[:, 0] * order_j + i0) * ny_g
                + (ci[:, 1] * order_j + i1)) * nz_g
               + (ci[:, 2] * order_j + i2))
        wk = phi(local[:, 0], i0) * phi(local[:, 1], i1) \
            * phi(local[:, 2], i2)
        valid_combo = (i0 <= order_j) & (i1 <= order_j) & (i2 <= order_j)
        # the reference skips small/negative basis weights (the quadratic
        # lobes), engine_core_constraint.c:306/348: `if (w < 1e-5) continue`
        ib.append(nbody[jnp.clip(nadr + idx, 0, flx.nnode)])
        iw.append(jnp.where(valid_combo & (wk >= 1e-5), wk, 0.0))
  ibod = jnp.stack(ib, axis=1)                       # (ncon, npc)
  iwgt = jnp.stack(iw, axis=1).astype(dtype)
  if ibod.shape[1] < weights.shape[1]:
    padn = weights.shape[1] - ibod.shape[1]
    ibod = jnp.concatenate(
        [ibod, jnp.zeros((ncon, padn), dtype=jnp.int32)], axis=1)
    iwgt = jnp.concatenate(
        [iwgt, jnp.zeros((ncon, padn), dtype=dtype)], axis=1)
  mask = jnp.asarray(is_interp)
  bodies = jnp.where(mask[:, None], ibod, bodies)
  weights = jnp.where(mask[:, None], iwgt, weights)
  return bodies, weights


def _center_grad(order: int) -> np.ndarray:
  """(npe, 3) basis gradients at the cell center (mju_defGradient weights
  at p = (.5,.5,.5); node order x-slowest/z-fastest)."""
  if order == 1:
    phi = [0.5, 0.5]
    dphi = [-1.0, 1.0]
  else:
    phi = [0.0, 1.0, 0.0]                # mju_flexPhi(.5, i, 2)
    dphi = [-1.0, 0.0, 1.0]              # mju_flexDphi(.5, i, 2)
  g = []
  for i in range(order + 1):
    for j in range(order + 1):
      for k in range(order + 1):
        g.append([dphi[i] * phi[j] * phi[k],
                  phi[i] * dphi[j] * phi[k],
                  phi[i] * phi[j] * dphi[k]])
  return np.asarray(g)


def node_positions(m: Model, d: Data):
  """(nnode, 3) world node positions (mju_flexGatherState,
  engine_core_util.c:1022): body origin for centered/zero-offset nodes,
  body-frame offset otherwise."""
  flx = m.flx
  nb = flx.nodebodyid
  node_flexid = np.repeat(np.arange(flx.nflex), flx.nodenum)
  nbase = d.xpos[nb]
  noff = jnp.einsum('nij,nj->ni', d.xmat[nb], m.flex_node)
  ncent = flx.centered[node_flexid] | flx.node_iszero
  return jnp.where(jnp.asarray(ncent)[:, None], nbase, nbase + noff)


def node_point_jacobians(m: Model, d: Data, gmat: np.ndarray, node_xp):
  """(k, nv, 3) translational point Jacobians of the nodes with global ids
  `gmat` at their current positions, ancestor-masked (mj_jacSparse over the
  node bodies, cell_pos_and_jac, engine_core_constraint.c:51-103)."""
  dtype = node_xp.dtype
  bid = np.asarray(m.flx.nodebodyid)[gmat]
  anc = m.tree.ancestor_mask
  o = d.subtree_com[m.body_rootid[m.dof_bodyid]]
  angd = d.cdof[:, :3]
  lind = d.cdof[:, 3:]
  mask = jnp.asarray(anc[bid], dtype=dtype)           # (k, nv)
  jac = lind[None] + jnp.cross(
      jnp.broadcast_to(angd[None], (len(gmat),) + angd.shape),
      node_xp[:, None, :] - o[None])
  return jac * mask[..., None]


def strain_rows(m: Model, d: Data, ent: dict):
  """mjEQ_FLEXSTRAIN rows for one strain equality = one interpolated cell
  (engine_core_constraint.c:806-980, volume mode).

  Returns (pos (neig,), J (neig, nv)): residual_e = eigvec_e · displ with
  displ the corotational-frame displacement from flex_node0, and
  J_e = Σ_n rot(eigvec_e[n], elem_quat⁻¹) · jac_node_n (the corotational
  rotation treated as constant, matching the reference)."""
  dtype = d.qpos.dtype
  f, order, npe = ent["flex"], ent["order"], ent["npe"]
  gmat = int(m.flx.nodeadr[f]) + ent["gind"]
  node_xp = node_positions(m, d)
  xp = node_xp[gmat]                                   # (npe, 3)
  x0 = m.flex_node0[gmat].astype(dtype)
  g = jnp.asarray(_center_grad(order), dtype=dtype)    # (npe, 3)
  fmat = jnp.einsum('na,nb->ab', xp, g)                # deformation grad
  quat = mjm.mat_to_rot_quat(fmat)
  qrot = mjm.conj_quat(quat)                           # elem_quat
  xr = mjm.rot_vec_quat(xp, qrot[None, :])
  displ = (xr - x0).reshape(-1)                        # (ndof,)
  eig = jnp.asarray(ent["eigvecs"], dtype=dtype)       # (neig, ndof)
  pos = eig @ displ
  # dS/dx in world frame: rotate each node triple by elem_quat⁻¹ (= quat)
  eig3 = eig.reshape(ent["neig"], npe, 3)
  dsdx = mjm.rot_vec_quat(eig3, quat[None, None, :])   # (neig, npe, 3)
  jac = node_point_jacobians(m, d, gmat, xp)           # (npe, nv, 3)
  J = jnp.einsum('enc,nvc->ev', dsdx, jac)
  return pos, J


def interp_passive(m: Model, d: Data, enbl_spring: bool, enbl_damper: bool):
  """Corotational FEM passive forces for interpolated flexes →
  (qfrc_spring_add, qfrc_damper_add).

  mj_flexPassiveInterp (engine_passive.c:61-215): per active cell, extract
  the corotational rotation from the deformation gradient at the cell
  center (mju_defGradient + mju_mat2Rot), rotate node positions and
  velocities into that frame, apply the precompiled raw stiffness
  (flex_stiffness stores -K_physical) to the displacement from flex_node0,
  rotate back and scatter to node dofs; dampers scale by flex_damping.
  Vectorized over cells per flex; all topology static."""
  flx = m.flx
  dtype = d.qpos.dtype
  zero = jnp.zeros((m.nv,), dtype=dtype)
  if not flx.nnode or (np.asarray(flx.interp_stiffadr) < 0).all():
    return zero, zero

  # world node positions and velocities (mju_flexGatherState,
  # engine_core_util.c:1022)
  nb = flx.nodebodyid
  node_flexid = np.repeat(np.arange(flx.nflex), flx.nodenum)
  ncent = flx.centered[node_flexid] | flx.node_iszero
  node_xpos = node_positions(m, d)
  ang = d.cvel[nb, :3]
  node_vel = (d.cvel[nb, 3:]
              + jnp.cross(ang, node_xpos
                          - d.subtree_com[m.body_rootid[nb]]))

  frc_g = jnp.zeros((flx.nnode, 3), dtype=dtype)
  dmp_g = jnp.zeros((flx.nnode, 3), dtype=dtype)
  for f in range(flx.nflex):
    order = int(flx.interp[f])
    sadr = int(flx.interp_stiffadr[f])
    if order < 1 or sadr < 0:
      continue
    npe = (order + 1) ** 3
    ndof = 3 * npe
    cx, cy, cz = (int(x) for x in flx.cellnum[f])
    ny_g, nz_g = cy * order + 1, cz * order + 1
    nadr = int(flx.nodeadr[f])
    active = np.asarray(flx.interp_cell_active[f])
    gind = []
    kadr = []
    for fe in range(cx * cy * cz):
      if not active[fe]:
        continue
      ci, cj, ck = fe // (cy * cz), (fe // cz) % cy, fe % cz
      idx = [((ci * order + li) * ny_g + (cj * order + lj)) * nz_g
             + (ck * order + lk)
             for li in range(order + 1)
             for lj in range(order + 1)
             for lk in range(order + 1)]
      gind.append(idx)
      kadr.append(sadr + fe * ndof * ndof)
    if not gind:
      continue
    gmat = nadr + np.asarray(gind, dtype=np.int32)     # (C, npe) global
    kidx = (np.asarray(kadr)[:, None]
            + np.arange(ndof * ndof)[None, :])
    stiff = m.flex_stiffness_interp[kidx].reshape(-1, ndof, ndof)

    xp = node_xpos[gmat]                               # (C, npe, 3)
    vl = node_vel[gmat]
    x0 = m.flex_node0[gmat].astype(dtype)
    g = jnp.asarray(_center_grad(order), dtype=dtype)  # (npe, 3)
    fmat = jnp.einsum('cna,nb->cab', xp, g)            # deformation grad
    quat = jax.vmap(mjm.mat_to_rot_quat)(fmat)
    qrot = mjm.conj_quat(quat)                         # flexInterpRotation
    xr = mjm.rot_vec_quat(xp, qrot[:, None, :])
    vr = mjm.rot_vec_quat(vl, qrot[:, None, :])
    displ = (xr - x0).reshape(-1, ndof)
    back = quat[:, None, :]                            # negQuat(qrot)
    if enbl_spring:
      fe_ = jnp.einsum('cij,cj->ci', stiff, displ).reshape(-1, npe, 3)
      frc_g = frc_g.at[gmat].add(mjm.rot_vec_quat(fe_, back))
    if enbl_damper:
      de_ = jnp.einsum('cij,cj->ci', stiff,
                       vr.reshape(-1, ndof)).reshape(-1, npe, 3)
      dmp_g = dmp_g.at[gmat].add(mjm.rot_vec_quat(de_, back))

  dmp_g = dmp_g * m.flex_damping[node_flexid][:, None]

  # map node forces into qfrc: nodes at their body origin with 3 dofs take
  # the body-frame fast path; everything else goes through the point
  # Jacobian (engine_passive.c:185-212)
  bdof = np.asarray(m.body_dofnum)[np.asarray(nb)]
  simple = (bdof == 3) & np.asarray(ncent)
  spring_add = zero
  damper_add = zero

  def scatter(force):
    qfrc = jnp.zeros((m.nv,), dtype=dtype)
    if simple.any():
      ns = np.where(simple)[0]
      bid = np.asarray(nb)[ns]
      loc = jnp.einsum('vij,vi->vj', d.xmat[bid], force[ns])
      cols = (np.asarray(m.body_dofadr)[bid][:, None]
              + np.arange(3)[None, :]).reshape(-1)
      qfrc = qfrc.at[cols].add(loc.reshape(-1))
    # everything else (offset nodes, pinned nodes with dof-bearing
    # ancestors); ancestor masks zero out truly static chains
    other = (~simple) & (np.asarray(nb) > 0)
    if other.any():
      ns = np.where(other)[0]
      bid = np.asarray(nb)[ns]
      anc = m.tree.ancestor_mask
      o = d.subtree_com[m.body_rootid[m.dof_bodyid]]
      angd = d.cdof[:, :3]
      lind = d.cdof[:, 3:]
      mask = jnp.asarray(anc[bid], dtype=dtype)
      pts = node_xpos[ns]
      jac = lind[None] + jnp.cross(
          jnp.broadcast_to(angd[None], (len(ns),) + angd.shape),
          pts[:, None, :] - o[None])
      qfrc = qfrc + jnp.einsum('knc,kc->n', jac * mask[..., None],
                               force[ns])
    return qfrc

  if enbl_spring:
    spring_add = scatter(frc_g)
  if enbl_damper:
    damper_add = scatter(dmp_g)
  return spring_add, damper_add
