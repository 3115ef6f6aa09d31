"""Nonlinear least squares with box constraints (Gauss-Newton + trust
region), jit-compatible.

Counterpart of the reference's python toolkit
(/root/reference/python/mujoco/minimize.py — Gauss-Newton with box
constraints, used for inverse kinematics and system identification), as a
pure-JAX routine: residual Jacobians come from jax.jacfwd, the loop is a
bounded lax.scan (differentiable, batchable with vmap over problems).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LeastSquaresResult(NamedTuple):
  x: jax.Array           # solution
  cost: jax.Array        # final 0.5·‖r‖²
  grad_norm: jax.Array   # final ‖Jᵀr‖∞
  niter: jax.Array


def least_squares(residual: Callable, x0, bounds: Optional[tuple] = None,
                  max_iter: int = 50, tol: float = 1e-9,
                  mu0: float = 1e-4) -> LeastSquaresResult:
  """Minimize 0.5‖residual(x)‖² s.t. lo ≤ x ≤ hi.

  Levenberg-style damped Gauss-Newton: step = −(JᵀJ + µI)⁻¹Jᵀr, projected
  onto the box; µ adapts on cost decrease/increase. Fixed trip count
  (lax.scan) with a convergence freeze, so the whole solve jits, vmaps and
  differentiates.
  """
  x0 = jnp.asarray(x0)
  n = x0.shape[-1]
  if bounds is not None:
    lo = jnp.broadcast_to(jnp.asarray(bounds[0], dtype=x0.dtype), x0.shape)
    hi = jnp.broadcast_to(jnp.asarray(bounds[1], dtype=x0.dtype), x0.shape)
    x0 = jnp.clip(x0, lo, hi)

  def cost_of(x):
    r = residual(x)
    return 0.5 * jnp.sum(r * r)

  def body(carry, _):
    x, mu, cost, done, it = carry
    r = residual(x)
    jac = jax.jacfwd(residual)(x)                  # (m, n)
    g = jac.T @ r
    h = jac.T @ jac + mu * jnp.eye(n, dtype=x.dtype)
    step = -jnp.linalg.solve(h, g)
    x_new = x + step
    if bounds is not None:
      x_new = jnp.clip(x_new, lo, hi)
    new_cost = cost_of(x_new)
    improved = new_cost < cost
    x = jnp.where(done, x, jnp.where(improved, x_new, x))
    mu = jnp.where(done, mu,
                   jnp.where(improved, jnp.maximum(mu * 0.5, 1e-12),
                             jnp.minimum(mu * 10.0, 1e8)))
    cost = jnp.where(done | ~improved, cost, new_cost)
    gnorm = jnp.max(jnp.abs(g))
    done = done | (gnorm < tol) | (improved & (jnp.abs(step).max() < tol))
    it = it + jnp.where(done, 0, 1)
    return (x, mu, cost, done, it), ()

  init = (x0, jnp.asarray(mu0, dtype=x0.dtype), cost_of(x0),
          jnp.zeros((), dtype=bool), jnp.zeros((), jnp.int32))
  (x, mu, cost, done, it), _ = jax.lax.scan(body, init, None,
                                            length=max_iter)
  r = residual(x)
  jac = jax.jacfwd(residual)(x)
  return LeastSquaresResult(x=x, cost=0.5 * jnp.sum(r * r),
                            grad_norm=jnp.max(jnp.abs(jac.T @ r)), niter=it)


def ik(m, d, site: int, target_pos, q_init=None, joint_mask=None,
       max_iter: int = 40):
  """Inverse kinematics: find qpos placing a site at target_pos
  (the reference minimize.py's flagship use case).

  joint_mask: optional (nq,) bool — False entries stay at their q_init
  value. Returns LeastSquaresResult with x = qpos.
  """
  from mujoco_tpu.ops import smooth

  q0 = d.qpos if q_init is None else jnp.asarray(q_init)
  mask = (jnp.ones_like(q0, dtype=bool) if joint_mask is None
          else jnp.asarray(joint_mask))

  def residual(q):
    qq = jnp.where(mask, q, q0)
    dd = smooth.kinematics(m, d.replace(qpos=qq))
    return dd.site_xpos[site] - jnp.asarray(target_pos, dtype=q0.dtype)

  return least_squares(residual, q0, max_iter=max_iter)
