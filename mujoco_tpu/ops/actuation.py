"""Actuation: activation dynamics, gain/bias force generation.

Counterpart of mj_fwdActuation (/root/reference/src/engine/engine_forward.c:351).
Dynamics types NONE/INTEGRATOR/FILTER/FILTEREXACT and gain/bias FIXED/AFFINE
are vectorized over actuators via static type masks; MUSCLE lands with the
muscle milestone.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (BiasType, Data, DisableBit, DynType,
                                     GainType, JointType, Model, TrnType)
from mujoco_tpu.utils import math as mjm


def _check_supported(m: Model):
  for i in range(m.nu):
    if m.actuator_dyntype[i] == DynType.USER or \
       m.actuator_gaintype[i] == GainType.USER:
      raise NotImplementedError("user callbacks not supported under jit")


def act_dot(m: Model, d: Data):
  """Activation time-derivative per dyntype."""
  if m.na == 0:
    return d.act_dot
  dtype = d.qpos.dtype
  out = jnp.zeros((m.na,), dtype=dtype)
  for i in range(m.nu):
    adr, num = int(m.actuator_actadr[i]), int(m.actuator_actnum[i])
    if num == 0:
      continue
    dyn = int(m.actuator_dyntype[i])
    ctrl = d.ctrl[i]
    if dyn == DynType.INTEGRATOR:
      out = out.at[adr + num - 1].set(ctrl)
    elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
      tau = jnp.maximum(m.actuator_dynprm[i, 0], mjm.MINVAL)
      out = out.at[adr + num - 1].set((ctrl - d.act[adr + num - 1]) / tau)
    elif dyn == DynType.MUSCLE:
      from mujoco_tpu.ops import muscle
      out = out.at[adr + num - 1].set(
          muscle.dynamics(ctrl, d.act[adr + num - 1], m.actuator_dynprm[i]))
  return out


def fwd_actuation(m: Model, d: Data) -> Data:
  """Actuator forces → qfrc_actuator."""
  dtype = d.qpos.dtype
  zero_v = jnp.zeros((m.nv,), dtype=dtype)
  if m.nu == 0 or m.disabled(DisableBit.ACTUATION):
    return d.replace(act_dot=jnp.zeros((m.na,), dtype=dtype),
                     actuator_force=jnp.zeros((m.nu,), dtype=dtype),
                     qfrc_actuator=zero_v)
  _check_supported(m)

  # clamp ctrl
  ctrl = d.ctrl
  if not m.disabled(DisableBit.CLAMPCTRL):
    limited = jnp.asarray(m.actuator_ctrllimited.astype(bool))
    clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                       m.actuator_ctrlrange[:, 1])
    ctrl = jnp.where(limited, clamped, ctrl)
  # the reference keeps unclamped ctrl in data; clamping is local to this stage
  adot = act_dot(m, d.replace(ctrl=ctrl))

  # input to force generation: ctrl for stateless, last act otherwise
  # (actearly: use next-step act, engine_forward.c)
  inputs = []
  for i in range(m.nu):
    if m.actuator_dyntype[i] == DynType.NONE:
      inputs.append(ctrl[i])
    else:
      last = int(m.actuator_actadr[i]) + int(m.actuator_actnum[i]) - 1
      a = d.act[last]
      if m.actuator_actearly[i]:
        a = a + m.opt.timestep * adot[last]
      inputs.append(a)
  inp = jnp.stack(inputs) if inputs else jnp.zeros((0,), dtype=dtype)

  length = d.actuator_length
  velocity = d.actuator_velocity

  # gain
  gp = m.actuator_gainprm
  gain_fixed = gp[:, 0]
  gain_affine = gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity
  is_affine_g = jnp.asarray(m.actuator_gaintype == GainType.AFFINE)
  gain = jnp.where(is_affine_g, gain_affine, gain_fixed)

  # bias
  bp = m.actuator_biasprm
  bias_affine = bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity
  is_affine_b = jnp.asarray(m.actuator_biastype == BiasType.AFFINE)
  bias = jnp.where(is_affine_b, bias_affine, jnp.zeros_like(bias_affine))

  # muscles (FLV model, engine_util_misc.c:1049-1199)
  if (m.actuator_gaintype == GainType.MUSCLE).any() or \
     (m.actuator_biastype == BiasType.MUSCLE).any():
    from mujoco_tpu.ops import muscle
    g_mus = muscle.gain(length, velocity, m.actuator_lengthrange,
                        m.actuator_acc0, gp)
    b_mus = muscle.bias(length, m.actuator_lengthrange, m.actuator_acc0, bp)
    gain = jnp.where(jnp.asarray(m.actuator_gaintype == GainType.MUSCLE),
                     g_mus, gain)
    bias = jnp.where(jnp.asarray(m.actuator_biastype == BiasType.MUSCLE),
                     b_mus, bias)

  force = gain * inp + bias

  # clamp force
  flimited = jnp.asarray(m.actuator_forcelimited.astype(bool))
  force = jnp.where(
      flimited,
      jnp.clip(force, m.actuator_forcerange[:, 0],
               m.actuator_forcerange[:, 1]), force)

  qfrc = d.actuator_moment.T @ force

  # clamp total actuator force at joints (jnt_actfrclimited)
  for j in range(m.njnt):
    if not m.jnt_actfrclimited[j]:
      continue
    dadr = int(m.jnt_dofadr[j])
    ndof = {int(JointType.FREE): 6, int(JointType.BALL): 3}.get(
        int(m.jnt_type[j]), 1)
    sl = slice(dadr, dadr + ndof)
    qfrc = qfrc.at[sl].set(
        jnp.clip(qfrc[sl], m.jnt_actfrcrange[j, 0], m.jnt_actfrcrange[j, 1]))

  return d.replace(act_dot=adot, actuator_force=force, qfrc_actuator=qfrc)
