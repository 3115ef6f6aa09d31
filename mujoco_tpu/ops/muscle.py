"""Muscle FLV model, branchless (counterparts of mju_muscleGain /
mju_muscleBias / mju_muscleDynamics, /root/reference/src/engine/engine_util_misc.c:1049-1199).

prm layout (gainprm == biasprm for muscles):
  [range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax]
dynprm: [tau_act, tau_deact, smoothing_width].
All functions are elementwise over actuators.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_tpu.utils import math as mjm


def sigmoid(x):
  """Quintic smoothstep clamped to [0, 1] (mju_sigmoid)."""
  y = x * x * x * (3 * x * (2 * x - 5) + 10)
  return jnp.where(x <= 0, 0.0, jnp.where(x >= 1, 1.0, y))


def gain_length(length, lmin, lmax):
  """Active force-length curve FL(L) (mju_muscleGainLength)."""
  a = 0.5 * (lmin + 1)
  b = 0.5 * (1 + lmax)
  x1 = (length - lmin) / jnp.maximum(mjm.MINVAL, a - lmin)
  x2 = (1 - length) / jnp.maximum(mjm.MINVAL, 1 - a)
  x3 = (length - 1) / jnp.maximum(mjm.MINVAL, b - 1)
  x4 = (lmax - length) / jnp.maximum(mjm.MINVAL, lmax - b)
  y = jnp.where(length <= a, 0.5 * x1 * x1,
                jnp.where(length <= 1, 1 - 0.5 * x2 * x2,
                          jnp.where(length <= b, 1 - 0.5 * x3 * x3,
                                    0.5 * x4 * x4)))
  inside = (lmin <= length) & (length <= lmax)
  return jnp.where(inside, y, 0.0)


def _norm_length(len_, lengthrange, prm):
  r0, r1 = prm[..., 0], prm[..., 1]
  l0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(
      mjm.MINVAL, r1 - r0)
  return r0 + (len_ - lengthrange[..., 0]) / jnp.maximum(mjm.MINVAL, l0), l0


def _force(prm, acc0):
  force = prm[..., 2]
  scale = prm[..., 3]
  return jnp.where(force < 0, scale / jnp.maximum(mjm.MINVAL, acc0), force)


def gain(len_, vel, lengthrange, acc0, prm):
  """Active muscle gain −force·FL·FV (mju_muscleGain)."""
  lmin, lmax = prm[..., 4], prm[..., 5]
  vmax, fvmax = prm[..., 6], prm[..., 8]
  force = _force(prm, acc0)
  l, l0 = _norm_length(len_, lengthrange, prm)
  v = vel / jnp.maximum(mjm.MINVAL, l0 * vmax)

  fl = gain_length(l, lmin, lmax)
  y = fvmax - 1
  fv = jnp.where(
      v <= -1, 0.0,
      jnp.where(v <= 0, (v + 1) * (v + 1),
                jnp.where(v <= y,
                          fvmax - (y - v) * (y - v) / jnp.maximum(
                              mjm.MINVAL, y),
                          fvmax)))
  return -force * fl * fv


def bias(len_, lengthrange, acc0, prm):
  """Passive muscle force (mju_muscleBias)."""
  lmax, fpmax = prm[..., 5], prm[..., 7]
  force = _force(prm, acc0)
  l, _ = _norm_length(len_, lengthrange, prm)
  b = 0.5 * (1 + lmax)
  x_mid = (l - 1) / jnp.maximum(mjm.MINVAL, b - 1)
  x_hi = (l - b) / jnp.maximum(mjm.MINVAL, b - 1)
  return jnp.where(
      l <= 1, 0.0,
      jnp.where(l <= b, -force * fpmax * 0.5 * x_mid * x_mid,
                -force * fpmax * (0.5 + x_hi)))


def dynamics(ctrl, act, dynprm):
  """Activation dynamics act_dot (mju_muscleDynamics), Millard et al. 2013
  timescales with optional sigmoid smoothing."""
  ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
  actclamp = jnp.clip(act, 0.0, 1.0)
  tau_act = dynprm[..., 0] * (0.5 + 1.5 * actclamp)
  tau_deact = dynprm[..., 1] / (0.5 + 1.5 * actclamp)
  width = dynprm[..., 2]
  dctrl = ctrlclamp - act
  tau_hard = jnp.where(dctrl > 0, tau_act, tau_deact)
  tau_smooth = tau_deact + (tau_act - tau_deact) * sigmoid(
      dctrl / jnp.where(width < mjm.MINVAL, 1.0, width) + 0.5)
  tau = jnp.where(width < mjm.MINVAL, tau_hard, tau_smooth)
  return dctrl / jnp.maximum(mjm.MINVAL, tau)
