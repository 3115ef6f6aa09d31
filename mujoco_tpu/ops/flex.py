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
  bid = flx.vertbodyid                               # (nvert,) static
  base = d.xpos[bid]
  offset = jnp.einsum('vij,vj->vi', d.xmat[bid], m.flex_vert)
  centered = flx.centered[_vert_flexid(flx)] | flx.vert_iszero
  vert_xpos = jnp.where(jnp.asarray(centered)[:, None], base, base + offset)

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

  return d.replace(flexvert_xpos=vert_xpos, flexedge_length=length,
                   flexedge_J=ej)


def _vert_flexid(flx) -> np.ndarray:
  """Static vertex → flex id map."""
  out = np.zeros(flx.nvert, dtype=np.int32)
  for f in range(flx.nflex):
    out[flx.vertadr[f]:flx.vertadr[f] + flx.vertnum[f]] = f
  return out


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
