"""Passive forces: springs, dampers, gravity compensation, fluid drag.

Counterpart of mj_passive (/root/reference/src/engine/engine_passive.c).
Joint springs are manifold-aware (quaternion log for ball/free rotations);
tendon springs have a deadband interval (tendon_lengthspring). Fluid forces
(inertia-box + ellipsoid models) land with the fluid milestone.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, DisableBit, JointType, Model
from mujoco_tpu.ops import support
from mujoco_tpu.utils import math as mjm


def _joint_springs(m: Model, d: Data):
  """-k · (qpos ⊖ qpos_spring) per joint, scattered into qfrc."""
  dtype = d.qpos.dtype
  qfrc = jnp.zeros((m.nv,), dtype=dtype)
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr = int(m.jnt_qposadr[j])
    dadr = int(m.jnt_dofadr[j])
    k = m.jnt_stiffness[j]
    if jt in (JointType.SLIDE, JointType.HINGE):
      qfrc = qfrc.at[dadr].add(-k * (d.qpos[qadr] - m.qpos_spring[qadr]))
    elif jt == JointType.BALL:
      dif = mjm.quat_sub(mjm.normalize(d.qpos[qadr:qadr + 4]),
                         m.qpos_spring[qadr:qadr + 4])
      qfrc = qfrc.at[dadr:dadr + 3].add(-k * dif)
    else:  # FREE
      qfrc = qfrc.at[dadr:dadr + 3].add(
          -k * (d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]))
      dif = mjm.quat_sub(mjm.normalize(d.qpos[qadr + 3:qadr + 7]),
                         m.qpos_spring[qadr + 3:qadr + 7])
      qfrc = qfrc.at[dadr + 3:dadr + 6].add(-k * dif)
  return qfrc


def passive(m: Model, d: Data) -> Data:
  """Assemble qfrc_passive = spring + damper + gravcomp (+ fluid)."""
  dtype = d.qpos.dtype
  zero = jnp.zeros((m.nv,), dtype=dtype)
  enbl_spring = not m.disabled(DisableBit.SPRING)
  enbl_damper = not m.disabled(DisableBit.DAMPER)

  qfrc_spring = _joint_springs(m, d) if enbl_spring else zero
  qfrc_damper = -m.dof_damping * d.qvel if enbl_damper else zero

  # tendon spring (deadband interval) + damper
  if m.ntendon:
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    x = jnp.where(d.ten_length > hi, d.ten_length - hi,
                  jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
    if enbl_spring:
      qfrc_spring = qfrc_spring + d.ten_J.T @ (-m.tendon_stiffness * x)
    if enbl_damper:
      qfrc_damper = qfrc_damper + d.ten_J.T @ (
          -m.tendon_damping * d.ten_velocity)

  # gravity compensation: anti-gravity force at each body CoM
  qfrc_gravcomp = zero
  if not m.disabled(DisableBit.GRAVITY):
    f = -(m.body_mass * m.body_gravcomp)[:, None] * m.opt.gravity[None, :]
    qfrc_gravcomp = support.apply_ft_all_bodies(
        m, d, f, jnp.zeros_like(f), d.xipos)

  qfrc_fluid = _fluid(m, d) if m.has_fluid else zero

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)


def _fluid(m: Model, d: Data):
  """Inertia-box fluid model, vectorized over bodies
  (mj_inertiaBoxFluidModel, engine_passive.c:1154): equivalent-box viscous
  drag + quadratic lift/drag in the body inertial frame, wind-relative."""
  dtype = d.qpos.dtype
  inertia = m.body_inertia                       # (nbody, 3)
  mass = jnp.maximum(m.body_mass, mjm.MINVAL)
  box = jnp.sqrt(jnp.maximum(
      mjm.MINVAL,
      jnp.stack([inertia[:, 1] + inertia[:, 2] - inertia[:, 0],
                 inertia[:, 0] + inertia[:, 2] - inertia[:, 1],
                 inertia[:, 0] + inertia[:, 1] - inertia[:, 2]],
                axis=-1) / mass[:, None] * 6.0))

  # local body-frame 6D velocity at xipos
  com = d.subtree_com[m.body_rootid]
  lvel = mjm.transform_spatial(d.cvel, False, d.xipos, com, d.ximat)
  # wind in the same local frame
  wind = jnp.zeros((m.nbody, 6), dtype=dtype).at[:, 3:].set(
      m.opt.wind[None, :])
  lwind = mjm.transform_spatial(wind, False, d.xipos, com, d.ximat)
  lvel = lvel.at[:, 3:].add(-lwind[:, 3:])

  lfrc = jnp.zeros((m.nbody, 6), dtype=dtype)
  visc = m.opt.viscosity
  dens = m.opt.density

  diam = jnp.mean(box, axis=-1)                  # (nbody,)
  lfrc = lfrc.at[:, :3].add(
      -jnp.pi * (diam ** 3)[:, None] * visc * lvel[:, :3])
  lfrc = lfrc.at[:, 3:].add(-3.0 * jnp.pi * diam[:, None] * visc
                            * lvel[:, 3:])

  b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
  v = lvel
  lfrc = lfrc.at[:, 3].add(-0.5 * dens * b1 * b2 * jnp.abs(v[:, 3]) * v[:, 3])
  lfrc = lfrc.at[:, 4].add(-0.5 * dens * b0 * b2 * jnp.abs(v[:, 4]) * v[:, 4])
  lfrc = lfrc.at[:, 5].add(-0.5 * dens * b0 * b1 * jnp.abs(v[:, 5]) * v[:, 5])
  lfrc = lfrc.at[:, 0].add(-dens * b0 * (b1 ** 4 + b2 ** 4)
                           * jnp.abs(v[:, 0]) * v[:, 0] / 64.0)
  lfrc = lfrc.at[:, 1].add(-dens * b1 * (b0 ** 4 + b2 ** 4)
                           * jnp.abs(v[:, 1]) * v[:, 1] / 64.0)
  lfrc = lfrc.at[:, 2].add(-dens * b2 * (b0 ** 4 + b1 ** 4)
                           * jnp.abs(v[:, 2]) * v[:, 2] / 64.0)

  # rotate to world, zero massless bodies, apply at body CoM
  torque = jnp.einsum('bij,bj->bi', d.ximat, lfrc[:, :3])
  force = jnp.einsum('bij,bj->bi', d.ximat, lfrc[:, 3:])
  live = (m.body_mass >= mjm.MINVAL)[:, None]
  torque = jnp.where(live, torque, 0.0)
  force = jnp.where(live, force, 0.0)
  return support.apply_ft_all_bodies(m, d, force, torque, d.xipos)
