"""Analytic/AD velocity derivatives for implicit integration.

Counterpart of /root/reference/src/engine/engine_derivative.c
(mjd_smooth_vel:3140, mjd_actuator_vel:2350, mjd_passive_vel:3035,
mjd_rne_vel:599, mjd_freeMhat:844, mj_isFreeBody:822).

qDeriv = ∂(qfrc_actuator + qfrc_passive − qfrc_bias)/∂qvel, dense (nv, nv).
The actuator and passive terms are small closed forms; the RNE term — the
reference's largest hand-derived code path — is obtained by forward-mode
autodiff of the same masked dense contractions used in the primal
(smooth.com_vel + smooth.rne), which is exactly the analytic derivative,
TPU-idiomatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (BiasType, Data, DisableBit, GainType,
                                     JointType, Model)
from mujoco_tpu.ops import smooth
from mujoco_tpu.utils import math as mjm


def actuator_vel(m: Model, d: Data):
  """∂qfrc_actuator/∂qvel (mjd_actuator_vel, engine_derivative.c:2350):
  momentᵀ diag(gain_vel·input + bias_vel) moment over affine gain/bias."""
  dtype = d.qpos.dtype
  out = jnp.zeros((m.nv, m.nv), dtype=dtype)
  if m.nu == 0 or m.disabled(DisableBit.ACTUATION):
    return out

  coefs = []
  for i in range(m.nu):
    oadr = int(m.actuator_outadr[i])
    onum = int(m.actuator_outnum[i])
    gain_vel = jnp.zeros((), dtype=dtype)
    bias_vel = jnp.zeros((), dtype=dtype)
    if int(m.actuator_biastype[i]) in (int(BiasType.AFFINE),
                                       int(BiasType.SO3)):
      # SO3 kv term applies to each output row (engine_derivative.c:2399)
      bias_vel = m.actuator_biasprm[i, 2]
    elif int(m.actuator_biastype[i]) == int(BiasType.DCMOTOR):
      # back-EMF of a stateless DC motor (engine_derivative.c:2405)
      if int(m.actuator_slots[i, 4]) < 0:
        r = jnp.maximum(mjm.MINVAL, m.actuator_gainprm[i, 0])
        k = m.actuator_gainprm[i, 1]
        bias_vel = bias_vel - k * k / r
    if int(m.actuator_gaintype[i]) == int(GainType.DCMOTOR):
      # controller damping + LuGre micro-damping (engine_derivative.c:2431)
      gainprm, dynprm = m.actuator_gainprm[i], m.actuator_dynprm[i]
      input_mode = int(m.actuator_slots[i, 6])
      dvdw = (-gainprm[6] if input_mode == 1
              else (-gainprm[4] if input_mode == 2 else None))
      r = jnp.maximum(mjm.MINVAL, gainprm[0])
      k = gainprm[1]
      if int(m.actuator_slots[i, 4]) >= 0:
        s = 1.0 - jnp.exp(-m.opt.timestep / dynprm[0])
        dvdw0 = dvdw if dvdw is not None else jnp.zeros((), dtype=dtype)
        bias_vel = bias_vel + k * (dvdw0 - k) * s / r
      elif dvdw is not None:
        bias_vel = bias_vel + k * dvdw / r
      if int(m.actuator_slots[i, 3]) >= 0:
        bias_vel = bias_vel - dynprm[6]
    if int(m.actuator_gaintype[i]) == int(GainType.AFFINE):
      gain_vel = m.actuator_gainprm[i, 2]
    elif int(m.actuator_gaintype[i]) == int(GainType.MUSCLE):
      # d(muscleGain)/d(velocity) (mjd_muscleGain_vel,
      # engine_derivative.c:969): −force·FL·dFV/dV / (L0·vmax)
      from mujoco_tpu.ops import muscle as muscle_mod
      prm = m.actuator_gainprm[i]
      lr = m.actuator_lengthrange[i]
      lmin, lmax, vmax, fvmax = prm[4], prm[5], prm[6], prm[8]
      force = muscle_mod._force(prm, m.actuator_acc0[i])
      l, l0 = muscle_mod._norm_length(d.actuator_length[oadr], lr, prm)
      denom = jnp.maximum(mjm.MINVAL, l0 * vmax)
      v = d.actuator_velocity[oadr] / denom
      fl = muscle_mod.gain_length(l, lmin, lmax)
      y = fvmax - 1
      dfv = jnp.where(
          v <= -1, 0.0,
          jnp.where(v <= 0, 2 * v + 2,
                    jnp.where(v <= y,
                              (-2 * v + 2 * y) / jnp.maximum(mjm.MINVAL, y),
                              0.0)))
      gain_vel = -force * fl * dfv / denom
    # input: ctrl for stateless, last activation otherwise
    if int(m.actuator_actnum[i]) == 0:
      inp = d.ctrl[int(m.actuator_ctrladr[i])]
      if m.actuator_ctrllimited[i] and not m.disabled(DisableBit.CLAMPCTRL):
        inp = jnp.clip(inp, m.actuator_ctrlrange[i, 0],
                       m.actuator_ctrlrange[i, 1])
    else:
      last = int(m.actuator_actadr[i]) + int(m.actuator_actnum[i]) - 1
      if m.actuator_actearly[i]:
        # matching the forward pass: use next-step activation
        from mujoco_tpu.ops import forward as fwd_mod
        inp = fwd_mod.next_activation(m, d, d.act_dot)[last]
      else:
        inp = d.act[last]
    coef = bias_vel + gain_vel * inp
    # force clamped at the boundary: derivative is zero
    if m.actuator_forcelimited[i]:
      if int(m.actuator_gaintype[i]) == int(GainType.SO3):
        # SO3: norm-clamp saturation (engine_derivative.c:2378)
        clamped = (mjm.norm_safe(d.actuator_force[oadr:oadr + 3])
                   >= m.actuator_forcerange[i, 1])
      else:
        f = d.actuator_force[oadr]
        clamped = (f <= m.actuator_forcerange[i, 0]) | (
            f >= m.actuator_forcerange[i, 1])
      coef = jnp.where(clamped, 0.0, coef)
    coefs.extend([coef] * onum)

  coef = jnp.stack(coefs)
  return d.actuator_moment.T @ (coef[:, None] * d.actuator_moment)


def passive_vel(m: Model, d: Data):
  """∂qfrc_passive/∂qvel (mjd_passive_vel, engine_derivative.c:3035):
  joint damping diagonal + tendon damping JᵀbJ + flex edge damping
  Jᵀdiag(c)J + the interpolated-flex FEM damper (mjd_flexInterp_kernel,
  engine_derivative.c:1055 — obtained here by forward-mode AD of the same
  interp_passive primal)."""
  dtype = d.qpos.dtype
  out = jnp.zeros((m.nv, m.nv), dtype=dtype)
  if m.disabled(DisableBit.DAMPER):
    return out
  out = out - jnp.diag(m.dof_damping)
  if m.ntendon:
    out = out - d.ten_J.T @ (m.tendon_damping[:, None] * d.ten_J)
  if m.has_flex and m.flx.nedge:
    c = m.flex_edgedamping[m.flx.edge_flexid]
    live = jnp.asarray(~(m.flx.rigid[m.flx.edge_flexid]
                         | m.flx.edge_rigid), dtype=dtype)
    out = out - d.flexedge_J.T @ ((c * live)[:, None] * d.flexedge_J)
  if m.has_flex and (np.asarray(m.flx.interp_stiffadr) >= 0).any():
    from mujoco_tpu.ops import flex as flex_mod

    def damper_of(qvel):
      dd = d.replace(qvel=qvel)
      dd = smooth.com_vel(m, dd)
      _, fd = flex_mod.interp_passive(m, dd, False, True)
      return fd

    out = out + jax.jacfwd(damper_of)(d.qvel)
  return out


def rne_vel(m: Model, d: Data):
  """∂qfrc_bias/∂qvel via forward-mode AD of the dense RNE contraction chain
  (mjd_rne_vel, engine_derivative.c:599). Returns (nv, nv) with
  out[i, j] = ∂bias_i/∂qvel_j."""

  def bias_of(qvel):
    dd = d.replace(qvel=qvel)
    dd = smooth.com_vel(m, dd)
    return smooth.rne(m, dd)

  return jax.jacfwd(bias_of)(d.qvel)


def smooth_vel(m: Model, d: Data, flg_bias: bool):
  """qDeriv (mjd_smooth_vel, engine_derivative.c:3140), dense."""
  out = actuator_vel(m, d) + passive_vel(m, d)
  if flg_bias:
    out = out - rne_vel(m, d)
  return out


def free_body_joints(m: Model):
  """Static list of free joints on standalone free bodies (mj_isFreeBody,
  engine_derivative.c:822): single free joint, no children in the subtree."""
  out = []
  for j in range(m.njnt):
    if int(m.jnt_type[j]) != int(JointType.FREE):
      continue
    b = int(m.jnt_bodyid[j])
    if int(m.body_jntnum[b]) != 1:
      continue
    # standalone: subtree is just this body (no children), 6-dof tree
    if m.tree.subtree_mask[b].sum() != 1:
      continue
    out.append(j)
  return out


def free_mhat(m: Model, d: Data, jnt: int, qderiv):
  """6x6 A = M − h·(∂qfrc_smooth/∂qvel) block for a standalone free body
  (mjd_freeMhat, engine_derivative.c:844). The gyroscopic bias derivative —
  dropped from the symmetric global solve — is restored here via the same
  AD-RNE block."""
  h = m.opt.timestep
  adr = int(m.jnt_dofadr[jnt])
  sl = slice(adr, adr + 6)
  a = d.qM[sl, sl] - h * qderiv[sl, sl]

  # + h · ∂qfrc_bias/∂qvel block (qfrc_smooth carries −bias); the reference's
  # mjd_freeBias_vel fills only the angular-velocity columns
  # (engine_derivative.c:796-818) — mask the linear columns to match
  db = rne_vel(m, d)[sl, sl]
  db = db.at[:, :3].set(0.0)
  return a + h * db
