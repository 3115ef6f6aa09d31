"""Batched small-SPD solves as a Pallas TPU kernel.

The Newton constraint solver needs p = H⁻¹ g for a dense SPD H of size
nv×nv (≈27 for a humanoid) per environment, batch B ≈ thousands. XLA's
batched Cholesky materializes the matrix between each of the nv sequential
panel updates — HBM-bandwidth bound and the single largest cost in the whole
step. This kernel lane-maps environments (batch on the 128-lane axis, the
layout SURVEY.md §7.5 calls for) and keeps each env's H resident in VMEM
through the entire in-place LDL factorization + two triangular solves:
HBM traffic is exactly one read of H and one write of p.

Algorithm: in-place symmetric Gaussian elimination (LDL without square
roots). The trailing update at step k is one (nv, nv, 128) fused
multiply-add; the two substitution sweeps are (nv, 128) FMAs/reductions.
Everything is statically unrolled over k (nv is a compile-time constant).

Counterpart of the dense mju_cholFactor/mju_cholSolve pair used by
mj_solPrimal (/root/reference/src/engine/engine_util_solve.c,
engine_solver.c) — redesigned for the TPU memory hierarchy.
"""

from __future__ import annotations

import functools

import jax
from jax import custom_batching
import jax.numpy as jnp
import numpy as np

_LANES = 128


def _ldl_solve_kernel(h_ref, g_ref, p_ref, h_scr, y_scr, n: int):
  """One block of 128 envs: p = H⁻¹ g via in-place LDL in VMEM.

  h_ref: (n, n, 128) [i, j, env]; g_ref/p_ref/y_scr: (n, 128) [i, env];
  h_scr: (n, n, 128) scratch.
  """
  h_scr[:] = h_ref[:]
  ii = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
  jj = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

  # ---- factor: for k, trailing Schur update on the (i>k, j>k) block.
  # Symmetry is preserved at every step, so column k (varying i) and row k
  # (varying j) hold the same values in the two layouts we need.
  for k in range(n):
    dk = h_scr[k, k, :]                      # (128,)
    inv = 1.0 / dk
    col = h_scr[:, k, :]                     # (n, 128), i on dim0
    row = h_scr[k, :, :]                     # (n, 128), j on dim0
    mask = jnp.logical_and(ii > k, jj > k)
    upd = col[:, None, :] * row[None, :, :] * inv[None, None, :]
    h_scr[:] = h_scr[:] - jnp.where(mask, upd, 0.0)

  # ---- forward solve L y = g  (L[i,k] = H[i,k]/D[k], unit diagonal)
  y_scr[:] = g_ref[:]
  iv = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
  for k in range(n):
    inv = 1.0 / h_scr[k, k, :]               # (128,)
    lcol = h_scr[:, k, :] * inv[None, :]     # (n, 128)
    yk = y_scr[k, :]                         # (128,)
    y_scr[:] = y_scr[:] - jnp.where(iv > k, lcol * yk[None, :], 0.0)

  # ---- diagonal:  y ← D⁻¹ y
  dinv = 1.0 / jnp.stack([h_scr[k, k, :] for k in range(n)], axis=0)
  y_scr[:] = y_scr[:] * dinv

  # ---- back solve Lᵀ x = y   (x written into y_scr in place, top-up order)
  for k in range(n - 1, -1, -1):
    inv = 1.0 / h_scr[k, k, :]
    # Σ_{j>k} L[j,k]·x[j]; by symmetry L[j,k]·D[k] = H[k,j]
    contrib = jnp.where(iv > k, h_scr[k, :, :] * y_scr[:], 0.0)
    s = jnp.sum(contrib, axis=0) * inv       # (128,)
    y_scr[k, :] = y_scr[k, :] - s

  p_ref[:] = y_scr[:]


def ldl_solve_lanes(h, g, interpret: bool = False):
  """p = H⁻¹ g, batched with batch on the last axis.

  h: (n, n, B), g: (n, B) with B a multiple of 128. Returns (n, B).
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, _, b = h.shape
  assert b % _LANES == 0, b
  grid = (b // _LANES,)
  kernel = functools.partial(_ldl_solve_kernel, n=n)
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, _LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, _LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, b), h.dtype),
      scratch_shapes=[
          pltpu.VMEM((n, n, _LANES), h.dtype),
          pltpu.VMEM((n, _LANES), h.dtype),
      ],
      interpret=interpret,
  )(h, g)


def _tpu_backend() -> bool:
  plat = jax.devices()[0].platform
  return plat in ("tpu", "axon")


@custom_batching.custom_vmap
def _spd_solve_raw(h, g):
  """Solve H p = g for SPD H (single instance). Under vmap, dispatches to
  the lane-mapped Pallas kernel on TPU; falls back to XLA Cholesky
  elsewhere. No AD rule — use spd_solve for differentiable code."""
  chol = jnp.linalg.cholesky(h)
  return jax.scipy.linalg.cho_solve((chol, True), g[:, None])[:, 0]


def spd_solve(h, g):
  """Differentiable p = H⁻¹ g for SPD H.

  Wrapped in lax.custom_linear_solve (symmetric) so forward- and
  reverse-mode AD re-solve with the same lane-mapped Pallas kernel instead
  of differentiating through it."""
  def mv(x):
    return (h @ x[..., None])[..., 0]

  def slv(_, b):
    return _spd_solve_raw(h, b)

  return jax.lax.custom_linear_solve(mv, g, slv, symmetric=True)


@_spd_solve_raw.def_vmap
def _spd_solve_vmap(axis_size, in_batched, h, g):
  h_b, g_b = in_batched
  # partial batching (e.g. jacfwd pushing tangents through only one operand):
  # broadcast the unbatched side
  if not h_b:
    h = jnp.broadcast_to(h[None], (axis_size,) + h.shape)
  if not g_b:
    g = jnp.broadcast_to(g[None], (axis_size,) + g.shape)
  if not _tpu_backend():
    chol = jnp.linalg.cholesky(h)
    out = jax.scipy.linalg.cho_solve((chol, True), g[..., None])[..., 0]
    return out, True

  b, n = g.shape
  pad = (-b) % _LANES
  if pad:
    eye = jnp.broadcast_to(jnp.eye(n, dtype=h.dtype), (pad, n, n))
    h = jnp.concatenate([h, eye], axis=0)
    g = jnp.concatenate([g, jnp.zeros((pad, n), dtype=g.dtype)], axis=0)
  ht = jnp.transpose(h, (1, 2, 0))          # (n, n, B)
  gt = jnp.transpose(g, (1, 0))             # (n, B)
  pt = ldl_solve_lanes(ht, gt)
  p = jnp.transpose(pt, (1, 0))
  if pad:
    p = p[:b]
  return p, True
