"""System identification: fit model parameters to observed trajectories.

The TPU-native counterpart of the reference ecosystem's sysid workflows
(residual functions over rollouts + nonlinear least squares; the reference
engine itself is not differentiable, so its tooling uses finite differences
— here the whole rollout differentiates, so Gauss-Newton Jacobians come
from one jacfwd through the physics).

Usage:
    spec = [("dof_damping", None), ("body_mass", [1, 2])]
    result = fit(m, d0, ctrls, observed_qpos, spec)
    m_fit = apply_params(m, spec, result.x)

Each spec entry is (traced Model field name, optional index list). The
parameter vector concatenates the selected entries; bounds keep physical
parameters positive. Everything jits and runs batched on device.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.minimize import LeastSquaresResult, least_squares
from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.ops import forward


ParamSpec = Sequence[Tuple[str, Optional[Sequence[int]]]]


def _indices(m: Model, spec: ParamSpec):
  out = []
  for name, idx in spec:
    leaf = getattr(m, name)
    n = int(np.prod(leaf.shape))
    sel = np.arange(n) if idx is None else np.asarray(idx, dtype=int)
    out.append((name, sel, leaf.shape))
  return out


def get_params(m: Model, spec: ParamSpec):
  """Flatten the selected model entries into one parameter vector."""
  parts = []
  for name, sel, _ in _indices(m, spec):
    parts.append(jnp.ravel(getattr(m, name))[sel])
  return jnp.concatenate(parts)


def apply_params(m: Model, spec: ParamSpec, x) -> Model:
  """Scatter a parameter vector back into the (traced) model leaves."""
  updates = {}
  adr = 0
  for name, sel, shape in _indices(m, spec):
    n = len(sel)
    flat = jnp.ravel(getattr(m, name)).at[sel].set(
        jax.lax.dynamic_slice(x, (adr,), (n,)))
    updates[name] = flat.reshape(shape)
    adr += n
  return m.replace(**updates)


def simulate(m: Model, d0: Data, ctrls) -> jax.Array:
  """Roll out len(ctrls) steps, returning the (nstep, nq) qpos trajectory.
  Differentiable w.r.t. any traced model leaf."""
  def body(d, u):
    d = d.replace(ctrl=u)
    d = forward.step(m, d)
    return d, d.qpos
  _, traj = jax.lax.scan(body, d0, ctrls)
  return traj


def fit(m: Model, d0: Data, ctrls, observed_qpos, spec: ParamSpec,
        bounds: Optional[tuple] = None, max_iter: int = 30,
        x0=None) -> LeastSquaresResult:
  """Gauss-Newton parameter fit: min ‖simulate(params) − observed‖².

  observed_qpos: (nstep, nq). bounds default to (1e-6, +inf) — physical
  parameters stay positive. Returns the minimize.least_squares result;
  pass result.x to apply_params for the fitted model.
  """
  target = jnp.asarray(observed_qpos)
  ctrls = jnp.asarray(ctrls)

  def residual(x):
    mm = apply_params(m, spec, x)

    def body(d, u):
      d = d.replace(ctrl=u)
      d = forward.step(mm, d)
      return d, d.qpos
    _, traj = jax.lax.scan(body, d0, ctrls)
    return jnp.ravel(traj - target)

  if x0 is None:
    x0 = get_params(m, spec)
  if bounds is None:
    bounds = (1e-6, jnp.inf)
  return least_squares(residual, jnp.asarray(x0), bounds=bounds,
                       max_iter=max_iter)
