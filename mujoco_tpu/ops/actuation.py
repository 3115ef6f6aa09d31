"""Actuation: activation dynamics, gain/bias force generation.

Counterpart of mj_fwdActuation (/root/reference/src/engine/engine_forward.c:351).
Dynamics types NONE/INTEGRATOR/FILTER/FILTEREXACT/MUSCLE/DCMOTOR/PID and
gain/bias FIXED/AFFINE/MUSCLE/DCMOTOR/PID/SO3 are implemented; USER callbacks
route to registered pure-JAX plugins (models/io.py:_actuator_meta).

SO3 geodesic servo (engine_forward.c:636-679): 3-4 control inputs (expmap or
quat chart, actuator_ctrlspec) and 3 force outputs on an mjTRN_SO3
transmission; force = kp·log(q_cur⁻¹ q_tgt) + const + kv·ω in the child
frame, with the torque NORM clamped by forcerange (engine_forward.c:926-931).
Output/ctrl block addressing uses the static actuator_ctrladr/outadr tables
(mjmodel.h:787-791; Model keeps nu = the reference's nactuator).

DC motor (engine_forward.c:487-583, :715-747, :844-854, :943-977): electrical
current ODE, PI(D) voltage controller with anti-windup, thermal resistance
model, LuGre bristle friction, cogging torque. Activation slot layout is
static metadata (Model.actuator_slots, mirroring mj_dcmotorSlots,
engine_util_misc.c:1202).

PID servo (engine_forward.c:451-485, :766-793): slew-rate-limited setpoint +
anti-windup integral state; kp/kv single-sourced in the affine bias params.
The reference's multi-input ctrl blocks (actuator_ctrlspec) are not modeled
yet: our PID takes one ctrl = position setpoint (vref = ff = 0).

Rotational servo setpoint wrapping (wrapPeriod/wrapSetpoint,
engine_forward.c:295-333) uses the static Model.actuator_wrapprd.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (BiasType, Data, DisableBit, DynType,
                                     GainType, JointType, Model, TrnType)
from mujoco_tpu.utils import math as mjm

_MAXVAL = 1e10  # mjMAXVAL


def _disabled_actuators(m: Model) -> np.ndarray:
  """Static per-actuator disable mask (mj_actuatorDisabled,
  engine_support.c:695): group in [0, 30] and its bit set in
  opt.disableactuator."""
  grp = m.actuator_group
  mask = (grp >= 0) & (grp <= 30) & (
      (int(m.opt.disableactuator) >> np.clip(grp, 0, 30)) & 1).astype(bool)
  return mask


def _wrap_setpoint(u, length, period):
  """Representative of setpoint u nearest to length (wrapSetpoint,
  engine_forward.c:330)."""
  err = u - length
  return u - period * jnp.round(err / period)


def _dcmotor_voltage(ctrl, length, velocity, x_i, gainprm, input_mode: int):
  """Control voltage from PID state (dcmotorVoltage, engine_forward.c:239).
  input_mode is static (actuator_slots[:, 6])."""
  vmax = gainprm[7]
  kp, ki, kd = gainprm[4], gainprm[5], gainprm[6]
  if input_mode == 1:      # position mode
    v = kp * (ctrl - length) + ki * x_i - kd * velocity
  elif input_mode == 2:    # velocity mode
    v = kp * (ctrl - velocity) + ki * (x_i - length)
  else:
    v = ctrl
  return jnp.where(vmax > 0, jnp.clip(v, -vmax, vmax), v)


def _lugre_stribeck(velocity, f_c, f_s, v_s):
  """g(v) = F_C + (F_S − F_C)·exp(−(v/v_S)²) (mj_lugreStribeck,
  engine_util_misc.c:1195)."""
  ratio = velocity / jnp.maximum(mjm.MINVAL, v_s)
  return f_c + (f_s - f_c) * jnp.exp(-ratio * ratio)


def _ctrl_and_actdot(m: Model, d: Data):
  """Clamped effective ctrl + activation derivatives.

  Returns (ctrl_eff, act_dot): ctrl_eff carries the slew-rate-limited
  setpoints that the force phase must see (the reference mutates its local
  ctrl copy in place, engine_forward.c:458,:511).
  """
  dtype = d.qpos.dtype
  h = m.opt.timestep

  ctrl = d.ctrl
  # delayed actuators read the history buffer instead of d.ctrl
  # (mj_fwdActuation, engine_forward.c:377-386)
  if m.nhistory:
    from mujoco_tpu.ops import history as hist
    for i in range(m.nu):
      if float(m.actuator_delay[i]) and int(m.actuator_history[i, 0]) > 0:
        if int(m.actuator_ctrlnum[i]) != 1:
          raise NotImplementedError(
              f"actuator {i}: ctrl delay on a multi-input (SO3) block")
        ctrl = ctrl.at[int(m.actuator_ctrladr[i])].set(
            hist.read_ctrl(m, d, i, d.time))
  if not m.disabled(DisableBit.CLAMPCTRL):
    # per-CONTROL clamp: each actuator's range applies to every control in
    # its block (clampVec, engine_forward.c:390; quat/expmap blocks
    # replicate the range, XMLreference actuator-orientation-ctrlrange)
    ctrl_actid = np.repeat(np.arange(m.nu), np.asarray(m.actuator_ctrlnum))
    limited = jnp.asarray(m.actuator_ctrllimited.astype(bool)[ctrl_actid])
    rng = m.actuator_ctrlrange[ctrl_actid]
    ctrl = jnp.where(limited, jnp.clip(ctrl, rng[:, 0], rng[:, 1]), ctrl)
  # bad-ctrl guard: any NaN/huge control zeroes all controls
  # (mjWARN_BADCTRL, engine_forward.c:393-400)
  if m.nu:
    bad = jnp.any(jnp.isnan(ctrl) | (jnp.abs(ctrl) > _MAXVAL))
    ctrl = jnp.where(bad, 0.0, ctrl)

  out = jnp.zeros((m.na,), dtype=dtype)
  disabled = _disabled_actuators(m)
  for i in range(m.nu):
    adr0, num = int(m.actuator_actadr[i]), int(m.actuator_actnum[i])
    dyn = int(m.actuator_dyntype[i])
    if num == 0 and dyn != DynType.PID:
      continue
    uadr = int(m.actuator_ctrladr[i])
    oadr = int(m.actuator_outadr[i])
    ci = ctrl[uadr]
    length = d.actuator_length[oadr]
    velocity = d.actuator_velocity[oadr]
    dynprm = m.actuator_dynprm[i]
    gainprm = m.actuator_gainprm[i]

    if dyn == DynType.INTEGRATOR:
      if int(m.actuator_gaintype[i]) == GainType.SO3:
        # SO3 integrator: the whole 3-wide expmap rate block
        out = out.at[adr0:adr0 + 3].set(ctrl[uadr:uadr + 3])
        if disabled[i]:
          out = out.at[adr0:adr0 + 3].set(0.0)
        continue
      out = out.at[adr0 + num - 1].set(ci)
    elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
      tau = jnp.maximum(dynprm[0], mjm.MINVAL)
      out = out.at[adr0 + num - 1].set((ci - d.act[adr0 + num - 1]) / tau)
    elif dyn == DynType.MUSCLE:
      from mujoco_tpu.ops import muscle
      out = out.at[adr0 + num - 1].set(
          muscle.dynamics(ci, d.act[adr0 + num - 1], dynprm))
    elif dyn == DynType.PID:
      slew_s, integ_s = int(m.actuator_slots[i, 0]), int(m.actuator_slots[i, 1])
      period = float(m.actuator_wrapprd[i])
      if slew_s >= 0:
        u_prev = d.act[adr0 + slew_s]
        if period > 0:
          ci = _wrap_setpoint(ci, u_prev, period)
        slew = dynprm[1] * h
        u_eff = jnp.clip(ci, u_prev - slew, u_prev + slew)
        out = out.at[adr0 + slew_s].set((u_eff - u_prev) / h)
        ci = u_eff
      if integ_s >= 0:
        err = ci - length
        if period > 0:
          err = err - period * jnp.round(err / period)
        imax = dynprm[0]
        z = d.act[adr0 + integ_s]
        err_aw = jnp.where(z >= imax, jnp.minimum(err, 0.0),
                           jnp.where(z <= -imax, jnp.maximum(err, 0.0), err))
        err = jnp.where(imax > 0, err_aw, err)
        out = out.at[adr0 + integ_s].set(err)
    elif dyn == DynType.DCMOTOR:
      slots = m.actuator_slots[i]
      slew_s, integ_s, temp_s, brist_s, cur_s = (int(s) for s in slots[:5])
      input_mode = int(slots[6])
      r0, k = gainprm[0], gainprm[1]
      te = dynprm[0]
      # slot: slew rate limiting (engine_forward.c:505)
      if slew_s >= 0:
        u_prev = d.act[adr0 + slew_s]
        slew = dynprm[7] * h
        u_eff = jnp.clip(ci, u_prev - slew, u_prev + slew)
        out = out.at[adr0 + slew_s].set((u_eff - u_prev) / h)
        ci = u_eff
      # slot: PI integral state (engine_forward.c:515)
      x_i = jnp.zeros((), dtype=dtype)
      if integ_s >= 0:
        x_i = d.act[adr0 + integ_s]
        imax = dynprm[8]
        acc = ci - length if input_mode == 1 else ci
        acc_aw = jnp.where(x_i >= imax, jnp.minimum(acc, 0.0),
                           jnp.where(x_i <= -imax, jnp.maximum(acc, 0.0), acc))
        acc = jnp.where(imax > 0, acc_aw, acc)
        out = out.at[adr0 + integ_s].set(acc)
      # physical voltage (engine_forward.c:541)
      volt = _dcmotor_voltage(ci, length, velocity, x_i, gainprm, input_mode)
      r = r0
      # slot: temperature rise (engine_forward.c:543)
      if temp_s >= 0:
        c_th, t_amb = dynprm[3], dynprm[4]
        alpha, t0 = gainprm[2], gainprm[3]
        t_rise = d.act[adr0 + temp_s]
        r = r * (1 + alpha * (t_rise + t_amb - t0))
        if cur_s >= 0:
          current = d.act[adr0 + cur_s]
        else:
          current = (volt - k * velocity) / r
        out = out.at[adr0 + temp_s].set(
            (r * current * current - t_rise / dynprm[2]) / c_th)
      # slot: LuGre bristle (engine_forward.c:559)
      if brist_s >= 0:
        biasprm = m.actuator_biasprm[i]
        g = _lugre_stribeck(velocity, biasprm[3], biasprm[4], biasprm[5])
        a = -dynprm[5] * jnp.abs(velocity) / jnp.maximum(mjm.MINVAL, g)
        out = out.at[adr0 + brist_s].set(a * d.act[adr0 + brist_s] + velocity)
      # slot: current ODE (engine_forward.c:573)
      if cur_s >= 0:
        dimax = dynprm[1]
        i_dot = (volt / r - k / r * velocity - d.act[adr0 + cur_s]) / te
        i_dot = jnp.where(dimax > 0, jnp.clip(i_dot, -dimax, dimax), i_dot)
        out = out.at[adr0 + cur_s].set(i_dot)
    elif dyn == DynType.USER:
      # registered pure-JAX callback (mjcb_act_dyn analog, plugin.py)
      out = out.at[adr0 + num - 1].set(m.user_cb[0](m, d, i))

    if disabled[i] and num:
      out = out.at[adr0:adr0 + num].set(0.0)
    ctrl = ctrl.at[uadr].set(ci)
  return ctrl, out


def act_dot(m: Model, d: Data):
  """Activation time-derivative per dyntype (compatibility entry)."""
  if m.na == 0:
    return d.act_dot
  _, out = _ctrl_and_actdot(m, d)
  return out


def fwd_actuation(m: Model, d: Data) -> Data:
  """Actuator forces → qfrc_actuator (mj_fwdActuation,
  engine_forward.c:351-1005)."""
  dtype = d.qpos.dtype
  zero_v = jnp.zeros((m.nv,), dtype=dtype)
  if m.nu == 0 or m.disabled(DisableBit.ACTUATION):
    return d.replace(act_dot=jnp.zeros((m.na,), dtype=dtype),
                     actuator_force=jnp.zeros((m.nout,), dtype=dtype),
                     qfrc_actuator=zero_v)

  h = m.opt.timestep
  ctrl, adot = _ctrl_and_actdot(m, d)
  length = d.actuator_length
  velocity = d.actuator_velocity
  disabled = _disabled_actuators(m)

  def next_act(i, last):
    """actearly: next-step activation of slot `last` (mj_nextActivation)."""
    from mujoco_tpu.ops import forward as fwd_mod
    return fwd_mod.next_activation(m, d, adot)[last]

  forces = []
  for i in range(m.nu):
    dyn = int(m.actuator_dyntype[i])
    gt = int(m.actuator_gaintype[i])
    bt = int(m.actuator_biastype[i])
    adr0, num = int(m.actuator_actadr[i]), int(m.actuator_actnum[i])
    uadr = int(m.actuator_ctrladr[i])
    oadr = int(m.actuator_outadr[i])
    onum = int(m.actuator_outnum[i])
    gainprm = m.actuator_gainprm[i]
    biasprm = m.actuator_biasprm[i]
    dynprm = m.actuator_dynprm[i]
    slots = m.actuator_slots[i]
    ci = ctrl[uadr]
    li, vi = length[oadr], velocity[oadr]
    period = float(m.actuator_wrapprd[i])

    if disabled[i]:
      forces.extend([jnp.zeros((), dtype=dtype)] * onum)
      continue

    # ----- SO(3) geodesic servo: 3-4 inputs, 3 outputs
    # (engine_forward.c:636-679): force = kp·log(q_cur⁻¹ q_tgt) + const
    # + kv·velocity, all in the child (joint/site) frame
    if gt == GainType.SO3:
      from mujoco_tpu.models.types import CtrlChart
      if int(m.actuator_ctrlspec[i]) == int(CtrlChart.QUAT):
        q_tgt = mjm.normalize(ctrl[uadr:uadr + 4])
      else:
        if dyn == DynType.NONE:
          u = ctrl[uadr:uadr + 3]
        elif m.actuator_actearly[i]:
          from mujoco_tpu.ops import forward as fwd_mod
          u = fwd_mod.next_activation(m, d, adot)[adr0:adr0 + 3]
        else:
          u = d.act[adr0:adr0 + 3]
        q_tgt = mjm.expmap_to_quat(u)
      q_cur = mjm.expmap_to_quat(d.actuator_length[oadr:oadr + 3])
      e = mjm.quat_sub(q_tgt, q_cur)
      f3 = (gainprm[0] * e + biasprm[0]
            + biasprm[2] * d.actuator_velocity[oadr:oadr + 3])
      forces.extend([f3[k] for k in range(3)])
      continue

    # ----- gain (engine_forward.c:693-759)
    if gt == GainType.FIXED:
      gain = gainprm[0]
    elif gt == GainType.AFFINE:
      gain = gainprm[0] + gainprm[1] * li + gainprm[2] * vi
    elif gt == GainType.MUSCLE:
      from mujoco_tpu.ops import muscle
      gain = muscle.gain(li, vi, m.actuator_lengthrange[i],
                         m.actuator_acc0[i], gainprm)
    elif gt == GainType.DCMOTOR:
      r, k = gainprm[0], gainprm[1]
      temp_s, cur_s = int(slots[2]), int(slots[4])
      input_mode = int(slots[6])
      if temp_s >= 0:
        t_rise = d.act[adr0 + temp_s]
        r = r * (1 + gainprm[2] * (t_rise + dynprm[4] - gainprm[3]))
      gain = k if cur_s >= 0 else k / jnp.maximum(mjm.MINVAL, r)
      if input_mode > 0:
        # ctrl already carries the slew-limited setpoint from
        # _ctrl_and_actdot; override with the controller voltage
        # (engine_forward.c:741-745)
        x_i = d.act[adr0 + int(slots[1])] if int(slots[1]) >= 0 else \
            jnp.zeros((), dtype=dtype)
        ci = _dcmotor_voltage(ci, li, vi, x_i, gainprm, input_mode)
    elif gt == GainType.PID:
      gain = jnp.zeros((), dtype=dtype)
    elif gt == GainType.USER:
      # registered pure-JAX callback (mjcb_act_gain analog, plugin.py)
      gain = m.user_cb[1](m, d, i)
    else:
      raise NotImplementedError(f"gain type {gt}")

    # ----- force = gain·input [+ PID input terms] (engine_forward.c:761-820)
    if gt == GainType.PID:
      # single ctrl input = position setpoint (vref = ff = 0 until
      # multi-input ctrl blocks are modeled)
      qref = ci  # slew slot already produced the effective setpoint in ctrl
      if period > 0:
        qref = _wrap_setpoint(qref, li, period)
      force = -biasprm[1] * qref
      integ_s = int(slots[1])
      if integ_s >= 0:
        z = next_act(i, adr0 + integ_s) if m.actuator_actearly[i] \
            else d.act[adr0 + integ_s]
        force = force + gainprm[0] * z
    else:
      dc_no_current = gt == GainType.DCMOTOR and int(slots[4]) < 0
      if num == 0 or dc_no_current:
        inp = ci
        if period > 0:
          inp = _wrap_setpoint(inp, li, period)
        force = gain * inp
      else:
        last = adr0 + num - 1
        a = next_act(i, last) if m.actuator_actearly[i] else d.act[last]
        if period > 0:
          a = _wrap_setpoint(a, li, period)
        force = gain * a

    # ----- bias (engine_forward.c:826-865)
    if bt == BiasType.AFFINE:
      force = force + biasprm[0] + biasprm[1] * li + biasprm[2] * vi
    elif bt == BiasType.MUSCLE:
      from mujoco_tpu.ops import muscle
      force = force + muscle.bias(li, m.actuator_lengthrange[i],
                                  m.actuator_acc0[i], biasprm)
    elif bt == BiasType.DCMOTOR:
      # back-EMF for stateless current (engine_forward.c:844)
      if int(slots[4]) < 0:
        force = force - gain * gainprm[1] * vi
    elif bt == BiasType.USER:
      # registered pure-JAX callback (mjcb_act_bias analog, plugin.py)
      force = force + m.user_cb[2](m, d, i)

    forces.append(force)

  force = jnp.stack(forces) if forces else jnp.zeros((0,), dtype=dtype)

  # clamp force (engine_forward.c:918-941): elementwise per output, except
  # SO3 blocks whose torque NORM is clamped preserving direction
  out_actid = np.repeat(np.arange(m.nu), np.asarray(m.actuator_outnum))
  so3_out = np.asarray(m.actuator_gaintype)[out_actid] == int(GainType.SO3)
  flimited = m.actuator_forcelimited.astype(bool)[out_actid]
  force = jnp.where(
      jnp.asarray(flimited & ~so3_out),
      jnp.clip(force, m.actuator_forcerange[out_actid, 0],
               m.actuator_forcerange[out_actid, 1]), force)
  for i in range(m.nu):
    if int(m.actuator_gaintype[i]) != GainType.SO3 or \
       not m.actuator_forcelimited[i]:
      continue
    oadr = int(m.actuator_outadr[i])
    f3 = force[oadr:oadr + 3]
    norm = mjm.norm_safe(f3)
    hi = m.actuator_forcerange[i, 1]
    scale = jnp.where(norm > hi, hi / jnp.maximum(norm, mjm.MINVAL), 1.0)
    force = force.at[oadr:oadr + 3].set(f3 * scale)

  # DC motor mechanical forces, not subject to force limits
  # (engine_forward.c:943-977): cogging torque + LuGre friction
  for i in range(m.nu):
    if int(m.actuator_biastype[i]) != BiasType.DCMOTOR or disabled[i]:
      continue
    oadr = int(m.actuator_outadr[i])
    biasprm = m.actuator_biasprm[i]
    dynprm = m.actuator_dynprm[i]
    add = biasprm[0] * jnp.sin(biasprm[1] * length[oadr] + biasprm[2])
    brist_s = int(m.actuator_slots[i, 3])
    if brist_s >= 0:
      adr = int(m.actuator_actadr[i]) + brist_s
      add = add - (dynprm[5] * d.act[adr] + dynprm[6] * adot[adr])
    force = force.at[oadr].add(add)

  qfrc = d.actuator_moment.T @ force

  # actuator-level gravity compensation (engine_forward.c:983-999)
  if m.has_actgravcomp and not m.disabled(DisableBit.GRAVITY):
    qfrc = qfrc + d.qfrc_gravcomp * jnp.asarray(
        _actgravcomp_dof_mask(m), dtype=dtype)

  # clamp qfrc_actuator at each limited joint's first dof (clampVec with
  # jnt_dofadr index, engine_forward.c:1002)
  for j in range(m.njnt):
    if not m.jnt_actfrclimited[j]:
      continue
    dadr = int(m.jnt_dofadr[j])
    qfrc = qfrc.at[dadr].set(
        jnp.clip(qfrc[dadr], m.jnt_actfrcrange[j, 0], m.jnt_actfrcrange[j, 1]))

  return d.replace(act_dot=adot, actuator_force=force, qfrc_actuator=qfrc)


def _actgravcomp_dof_mask(m: Model) -> np.ndarray:
  """Static dof mask: joints whose gravcomp routes through actuators
  (jnt_actgravcomp, engine_forward.c:988-998)."""
  mask = np.zeros(m.nv, dtype=bool)
  ndof = {int(JointType.FREE): 6, int(JointType.BALL): 3}
  for j in range(m.njnt):
    if m.jnt_actgravcomp[j]:
      dadr = int(m.jnt_dofadr[j])
      n = ndof.get(int(m.jnt_type[j]), 1)
      mask[dadr:dadr + n] = True
  return mask
