"""Batched + sharded environment stepping.

The TPU-native equivalent of the reference's parallelism stack (SURVEY.md
§2.6): the rollout module's thread fan-out (python/mujoco/rollout.cc:242)
becomes vmap over a leading env axis; multi-chip scaling uses
jax.sharding.Mesh + shard_map with the env batch sharded over ICI — physics
steps are embarrassingly parallel across envs, so the step itself contains
no collectives; only learner-side reductions cross chips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_tpu.models.types import Data, Model
from mujoco_tpu.ops import forward


def make_batch(m: Model, nbatch: int, dtype=None) -> Data:
  """A batched Data with a leading env axis (broadcast of make_data)."""
  from mujoco_tpu.models import io
  d = io.make_data(m, dtype=dtype)
  return jax.tree.map(lambda x: jnp.broadcast_to(x, (nbatch,) + x.shape), d)


def batched_step(m: Model):
  """jit(vmap(step)) over the leading env axis."""
  return jax.jit(jax.vmap(lambda d: forward.step(m, d)))


def rollout(m: Model, d: Data, nstep: int, ctrl: Optional[jax.Array] = None):
  """Scan nstep physics steps; ctrl optionally (nstep, batch, nu).

  Counterpart of rollout.rollout (python/mujoco/rollout.py): returns final
  Data and (nstep, batch, nq) qpos trajectory.
  """
  step_fn = jax.vmap(lambda dd: forward.step(m, dd))

  def body(dd, xs):
    if xs is not None:
      dd = dd.replace(ctrl=xs)
    dd = step_fn(dd)
    return dd, dd.qpos

  return jax.lax.scan(body, d, ctrl, length=None if ctrl is not None
                      else nstep)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
  devs = jax.devices()[:n_devices] if n_devices else jax.devices()
  return Mesh(np.array(devs), axis_names=("env",))


def sharded_step(m: Model, mesh: Mesh):
  """Batched step with the env axis sharded over the mesh.

  Uses explicit output shardings; with env-parallel physics XLA inserts no
  collectives — data stays resident on each chip across steps.
  """
  @jax.jit
  def step_fn(d: Data) -> Data:
    return jax.vmap(lambda dd: forward.step(m, dd))(d)

  def shard_data(d: Data) -> Data:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("env"))), d)

  return step_fn, shard_data
