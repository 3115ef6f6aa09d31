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

  qfrc_fluid = zero  # fluid model: later milestone

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)
