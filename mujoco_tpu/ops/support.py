"""Jacobians and force application (counterparts of engine_support.c).

All Jacobians come directly from the c-frame dof axes: for a point p on body
b, column v (for v in ancestors(b)) is

  jacp[:, v] = cdof_lin_v + cdof_ang_v × (p − o_v),   jacr[:, v] = cdof_ang_v

with o_v the c-frame origin (subtree_com of the body's tree root) — the same
identity mj_jac uses (/root/reference/src/engine/engine_support.c). Dense
ancestor masks replace the sparse chain walk.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model


def jac(m: Model, d: Data, point, bodyid):
  """Point Jacobian (jacp, jacr), each (3, nv), for a world point on a body.

  ``bodyid`` must be a static int (use vmap over bodies for batches).
  """
  mask = jnp.asarray(m.tree.ancestor_mask[bodyid], dtype=d.qpos.dtype)
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:]
  jacp = (lin + jnp.cross(ang, jnp.broadcast_to(offset, ang.shape))) * mask[:, None]
  jacr = ang * mask[:, None]
  return jacp.T, jacr.T


def jac_all_bodies(m: Model, d: Data, points):
  """Jacobians for one point per body, fully vectorized.

  points: (nbody, 3). Returns jacp, jacr of shape (nbody, 3, nv).
  """
  mask = jnp.asarray(m.tree.ancestor_mask, dtype=d.qpos.dtype)  # (nbody, nv)
  offset = points - d.subtree_com[m.body_rootid]                # (nbody, 3)
  ang = d.cdof[:, :3][None]                                     # (1, nv, 3)
  lin = d.cdof[:, 3:][None]
  jacp = (lin + jnp.cross(ang, offset[:, None, :])) * mask[..., None]
  jacr = jnp.broadcast_to(ang, jacp.shape) * mask[..., None]
  return jnp.swapaxes(jacp, 1, 2), jnp.swapaxes(jacr, 1, 2)


def apply_ft_all_bodies(m: Model, d: Data, force, torque, points):
  """Project per-body world wrenches (applied at ``points``) into qfrc.

  Batched mj_applyFT: spatial force at each tree's c-frame origin is
  (t + (p − o) × f; f); projection is the same two masked contractions as
  RNE's backward pass.
  """
  dtype = d.qpos.dtype
  o = d.subtree_com[m.body_rootid]                 # (nbody, 3)
  t_o = torque + jnp.cross(points - o, force)
  f_spatial = jnp.concatenate([t_o, force], axis=-1)   # (nbody, 6)
  anc = jnp.asarray(m.tree.ancestor_mask, dtype=dtype)
  tmp = anc.T @ f_spatial                           # (nv, 6)
  return jnp.sum(tmp * d.cdof, axis=-1)


def xfrc_accumulate(m: Model, d: Data):
  """qfrc contribution of xfrc_applied (world-frame wrench at body CoM),
  counterpart of mj_xfrcAccumulate."""
  return apply_ft_all_bodies(m, d, d.xfrc_applied[:, :3],
                             d.xfrc_applied[:, 3:], d.xipos)


def mul_m(m: Model, d: Data, vec):
  """M @ vec (mj_mulM). vec: (..., nv)."""
  return (d.qM @ vec[..., None])[..., 0]


def apply_ft(m: Model, d: Data, force, torque, point, bodyid: int):
  """qfrc contribution of one world wrench at a point on a body
  (mj_applyFT, engine_support.c)."""
  import jax.numpy as jnp
  o = d.subtree_com[m.body_rootid[bodyid]]
  t_o = torque + jnp.cross(point - o, force)
  f_spatial = jnp.concatenate([t_o, force])
  mask = jnp.asarray(m.tree.ancestor_mask[bodyid], dtype=d.qpos.dtype)
  return (d.cdof @ f_spatial) * mask


def jac_site(m: Model, d: Data, siteid: int):
  """Site Jacobian (mj_jacSite)."""
  return jac(m, d, d.site_xpos[siteid], int(m.site_bodyid[siteid]))


def jac_geom(m: Model, d: Data, geomid: int):
  """Geom-center Jacobian (mj_jacGeom)."""
  return jac(m, d, d.geom_xpos[geomid], int(m.geom_bodyid[geomid]))


def jac_body_com(m: Model, d: Data, bodyid: int):
  """Body CoM Jacobian (mj_jacBodyCom)."""
  return jac(m, d, d.xipos[bodyid], bodyid)


def jac_subtree_com(m: Model, d: Data, bodyid: int):
  """Subtree-CoM translational Jacobian (mj_jacSubtreeCom): mass-weighted
  average of body CoM Jacobians over the subtree."""
  import jax.numpy as jnp
  sub = np.nonzero(m.tree.subtree_mask[bodyid])[0]
  total = 0.0
  acc = jnp.zeros((3, m.nv), dtype=d.qpos.dtype)
  for b in sub:
    jacp, _ = jac(m, d, d.xipos[b], int(b))
    acc = acc + m.body_mass[b] * jacp
    total = total + m.body_mass[b]
  return acc / jnp.maximum(total, 1e-15)


def differentiate_pos(m: Model, qpos1, qpos2, dt):
  """Finite-difference velocity (qpos2 ⊖ qpos1)/dt, manifold-aware
  (mj_differentiatePos): quaternions via mju_subQuat."""
  import jax.numpy as jnp
  from mujoco_tpu.models.types import JointType
  from mujoco_tpu.utils import math as mjm
  qvel = jnp.zeros((m.nv,), dtype=qpos1.dtype)
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr = int(m.jnt_qposadr[j])
    dadr = int(m.jnt_dofadr[j])
    if jt in (JointType.HINGE, JointType.SLIDE):
      qvel = qvel.at[dadr].set((qpos2[qadr] - qpos1[qadr]) / dt)
    elif jt == JointType.BALL:
      dq = mjm.quat_sub(mjm.normalize(qpos2[qadr:qadr + 4]),
                        mjm.normalize(qpos1[qadr:qadr + 4]))
      qvel = qvel.at[dadr:dadr + 3].set(dq / dt)
    else:  # FREE
      qvel = qvel.at[dadr:dadr + 3].set(
          (qpos2[qadr:qadr + 3] - qpos1[qadr:qadr + 3]) / dt)
      dq = mjm.quat_sub(mjm.normalize(qpos2[qadr + 3:qadr + 7]),
                        mjm.normalize(qpos1[qadr + 3:qadr + 7]))
      qvel = qvel.at[dadr + 3:dadr + 6].set(dq / dt)
  return qvel
