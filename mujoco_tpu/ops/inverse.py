"""Inverse dynamics: given (qpos, qvel, qacc), compute applied forces.

Counterpart of /root/reference/src/engine/engine_inverse.c (mj_inverse:295,
mj_invConstraint:189, mj_discreteAcc:87, mj_compareFwdInv:300).

qfrc_inverse = M qacc + qfrc_bias − qfrc_passive − qfrc_constraint, with the
constraint forces recovered analytically from jar = J qacc − aref through the
same constraint-state update the solver uses (no iterative solve needed in
the inverse direction — the dual forces are an explicit function of jar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (Data, DisableBit, EnableBit, Integrator,
                                     Model)
from mujoco_tpu.ops import forward as fwd, smooth, solver


def inv_constraint(m: Model, d: Data) -> Data:
  """Constraint forces from qacc (mj_invConstraint, engine_inverse.c:189)."""
  if not m.efc.nefc:
    return d.replace(qfrc_constraint=jnp.zeros((m.nv,), dtype=d.qpos.dtype))
  jar = d.efc_J @ d.qacc - d.efc_aref
  ctx = solver._update(m, d, jar)
  return d.replace(efc_force=ctx.force,
                   qfrc_constraint=d.efc_J.T @ ctx.force)


def discrete_acc(m: Model, d: Data):
  """Convert discrete-time qacc to continuous-time (mj_discreteAcc,
  engine_inverse.c:87): qacc ← M⁻¹ (M − h·qDeriv) qacc per integrator."""
  from mujoco_tpu.ops import derivative
  h = m.opt.timestep
  integ = int(m.opt.integrator)
  if integ == Integrator.RK4:
    raise NotImplementedError(
        "discrete inverse dynamics is not supported by RK4")
  if integ == Integrator.EULER:
    if m.disabled(DisableBit.EULERDAMP) or not m.has_dof_damping:
      return d.qacc
    qfrc = d.qM @ d.qacc + h * m.dof_damping * d.qacc
    from mujoco_tpu.ops import linalg_tpu
    return linalg_tpu.spd_solve(d.qM, qfrc)
  elif integ == Integrator.IMPLICIT:
    sym = np.asarray(m.tree.dof_ancestor_mask)
    sym = jnp.asarray(sym | sym.T)
    qderiv = jnp.where(sym, derivative.smooth_vel(m, d, flg_bias=True), 0.0)
    qfrc = (d.qM - h * qderiv) @ d.qacc
  else:  # IMPLICITFAST
    sym = np.asarray(m.tree.dof_ancestor_mask)
    sym = jnp.asarray(sym | sym.T)
    qderiv0 = jnp.where(sym, derivative.smooth_vel(m, d, flg_bias=False), 0.0)
    qfrc = (d.qM - h * qderiv0) @ d.qacc
    for j in derivative.free_body_joints(m):
      adr = int(m.jnt_dofadr[j])
      a = derivative.free_mhat(m, d, j, qderiv0)
      qfrc = qfrc.at[adr:adr + 6].set(a @ d.qacc[adr:adr + 6])
  from mujoco_tpu.ops import linalg_tpu
  return linalg_tpu.spd_solve(d.qM, qfrc)


def inverse(m: Model, d: Data) -> Data:
  """Full inverse dynamics (mj_inverse, engine_inverse.c:295)."""
  d = fwd.fwd_position(m, d)
  d = fwd.sensor_pos(m, d)
  d = fwd.fwd_velocity(m, d)
  d = fwd.sensor_vel(m, d)

  qacc_save = d.qacc
  if m.opt.enableflags & EnableBit.INVDISCRETE:
    d = d.replace(qacc=discrete_acc(m, d))

  d = inv_constraint(m, d)
  bias = smooth.rne(m, d)
  if m.has_tendon_armature:
    # mj_inverse adds mj_tendonBias to qfrc_inverse (engine_inverse.c:260)
    bias = bias + fwd._tendon_bias(m, d)
  d = fwd.sensor_acc(m, d)

  ma = d.qM @ d.qacc
  qfrc_inverse = bias + ma - d.qfrc_passive - d.qfrc_constraint
  return d.replace(qfrc_inverse=qfrc_inverse, qacc=qacc_save)


def compare_fwd_inv(m: Model, d: Data):
  """Forward/inverse consistency check (mj_compareFwdInv,
  engine_inverse.c:300). Returns (norm_constraint_dif, norm_force_dif); d
  must hold a completed forward pass."""
  if not m.efc.nefc:
    z = jnp.zeros((), dtype=d.qpos.dtype)
    return z, z
  qfrc_fwd = d.qfrc_constraint
  d_inv = inv_constraint(m, d)
  bias = smooth.rne(m, d)
  if m.has_tendon_armature:
    bias = bias + fwd._tendon_bias(m, d)
  qfrc_inverse = bias + d.qM @ d.qacc - d.qfrc_passive - d_inv.qfrc_constraint
  qforce = (d.qfrc_applied + d.qfrc_actuator
            + _xfrc_qfrc(m, d))
  dif1 = jnp.linalg.norm(d_inv.qfrc_constraint - qfrc_fwd)
  dif2 = jnp.linalg.norm(qfrc_inverse - qforce)
  return dif1, dif2


def _xfrc_qfrc(m: Model, d: Data):
  from mujoco_tpu.ops import support
  return support.xfrc_accumulate(m, d)
