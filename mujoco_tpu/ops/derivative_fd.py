"""Transition derivatives: A, B, C, D state-space Jacobians.

Counterpart of mjd_transitionFD / mjd_inverseFD
(/root/reference/src/engine/engine_derivative_fd.c:710,
/root/reference/include/mujoco/mujoco.h:1491-1510) — but computed by
automatic differentiation of the same jitted step the simulation runs,
which is exact where the reference's finite differences are approximate
(the differentiability the C engine never had, doc/mjx.rst:526-529).
A finite-difference variant with the reference's quaternion-tangent
conventions is provided for cross-checking.

State layout (tangent space, matching mjd_transitionFD):
  x = [dq (nv); qvel (nv); act (na)],   u = ctrl (nu)
  A = ∂x⁺/∂x  (2nv+na, 2nv+na),  B = ∂x⁺/∂u  (2nv+na, nu)
  C = ∂sensordata/∂x,            D = ∂sensordata/∂u
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.ops import forward, support


def _apply_tangent(m: Model, d: Data, dq, dv, da, du):
  """Perturb Data by a tangent-space displacement."""
  qpos = forward.integrate_pos(m, d.qpos, dq, 1.0)
  return d.replace(qpos=qpos, qvel=d.qvel + dv,
                   act=d.act + da if m.na else d.act,
                   ctrl=d.ctrl + du if m.nu else d.ctrl)


def _state_step(m: Model, d: Data):
  """One step as a tangent-space map: (dq, dv, da, du) → (dq⁺, v⁺, a⁺, y).

  The output tangent dq⁺ is measured against the NOMINAL next position —
  the same convention as the reference's stateDiff
  (engine_derivative_fd.c:55-64), which differences perturbed-next against
  nominal-next; a current-qpos base point would shift the quaternion
  log-map curvature into the Jacobian."""
  qpos_next0 = forward.step(m, d).qpos

  def f(dq, dv, da, du):
    dd = _apply_tangent(m, d, dq, dv, da, du)
    out = forward.step(m, dd)
    dq_out = support.differentiate_pos(m, qpos_next0, out.qpos, 1.0)
    return dq_out, out.qvel, out.act, out.sensordata
  return f


def inverse_derivatives(m: Model, d: Data, flg_actuation: bool = True):
  """Analytic (AD) counterpart of mjd_inverseFD
  (engine_derivative_fd.c:608): Jacobians of inverse dynamics and sensors
  w.r.t. (qpos, qvel, qacc), in the reference's transposed layout —
  DfDq[i, j] = ∂ qfrc_inverse_j / ∂ qpos_i along tangent direction i.

  Returns (DfDq, DfDv, DfDa, DsDq, DsDv, DsDa) with shapes (nv, nv) ×3 and
  (nv, nsensordata) ×3. flg_actuation subtracts qfrc_actuator from
  qfrc_inverse, like the reference flag. The mass-matrix Jacobian DmDq is
  not provided (this engine keeps no sparse qM layout)."""
  from mujoco_tpu.ops import actuation, inverse as inv_mod

  def f(dq, dv, da_acc):
    dd = _apply_tangent(m, d, dq, dv, jnp.zeros(m.na), jnp.zeros(m.nu))
    dd = dd.replace(qacc=d.qacc + da_acc)
    out = inv_mod.inverse(m, dd)
    qfrc = out.qfrc_inverse
    if flg_actuation:
      qfrc = qfrc - actuation.fwd_actuation(m, out).qfrc_actuator
    return qfrc, out.sensordata

  z = jnp.zeros(m.nv)
  jac = jax.jacfwd(f, argnums=(0, 1, 2))
  (dfdq, dfdv, dfda), (dsdq, dsdv, dsda) = jac(z, z, z)
  # jacfwd output axes are (out, in); the reference stores (in, out)
  return (dfdq.T, dfdv.T, dfda.T, dsdq.T, dsdv.T, dsda.T)


def transition(m: Model, d: Data):
  """(A, B, C, D) via forward-mode autodiff of the full step.

  d must hold the state to linearize around (qpos/qvel/act/ctrl)."""
  nv, na, nu = m.nv, m.na, m.nu
  nx = 2 * nv + na
  dtype = d.qpos.dtype
  f = _state_step(m, d)
  zq = jnp.zeros((nv,), dtype=dtype)
  zv = jnp.zeros((nv,), dtype=dtype)
  za = jnp.zeros((na,), dtype=dtype)
  zu = jnp.zeros((nu,), dtype=dtype)

  jac = jax.jacfwd(f, argnums=(0, 1, 2, 3))
  (jq, jv, ja, ju) = zip(*jac(zq, zv, za, zu))
  # rows: dq⁺, qvel⁺, act⁺ / sensors; columns per argument
  a_rows = []
  for r in range(3):
    a_rows.append(jnp.concatenate([jq[r], jv[r], ja[r]], axis=1))
  a = jnp.concatenate(a_rows, axis=0)
  b = jnp.concatenate([ju[0], ju[1], ju[2]], axis=0)
  c = jnp.concatenate([jq[3], jv[3], ja[3]], axis=1)
  dmat = ju[3]
  assert a.shape == (nx, nx), a.shape
  return a, b, c, dmat


def transition_fd(m: Model, d: Data, eps: float = 1e-6,
                  centered: bool = False):
  """(A, B) by finite differences with the reference's tangent conventions
  (mjd_transitionFD, engine_derivative_fd.c) — for cross-checking AD."""
  nv, na, nu = m.nv, m.na, m.nu
  nx = 2 * nv + na
  dtype = d.qpos.dtype
  f = _state_step(m, d)

  def pack(out):
    dq, v, a_, _ = out
    return jnp.concatenate([dq, v, a_]) if na else jnp.concatenate([dq, v])

  z = (jnp.zeros((nv,), dtype=dtype), jnp.zeros((nv,), dtype=dtype),
       jnp.zeros((na,), dtype=dtype), jnp.zeros((nu,), dtype=dtype))
  base = pack(f(*z))

  cols_a = []
  for which in range(3):
    n = (nv, nv, na)[which]
    for i in range(n):
      e = list(z)
      e[which] = e[which].at[i].set(eps)
      hi = pack(f(*e))
      if centered:
        e[which] = z[which].at[i].set(-eps)
        lo = pack(f(*e))
        cols_a.append((hi - lo) / (2 * eps))
      else:
        cols_a.append((hi - base) / eps)
  a = jnp.stack(cols_a, axis=1)

  cols_b = []
  for i in range(nu):
    e = list(z)
    e[3] = e[3].at[i].set(eps)
    hi = pack(f(*e))
    cols_b.append((hi - base) / eps)
  b = (jnp.stack(cols_b, axis=1) if nu
       else jnp.zeros((nx, 0), dtype=dtype))
  return a, b
