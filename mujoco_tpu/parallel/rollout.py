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


# the integration-state leaves that must survive between steps; everything
# else in Data is workspace that forward() recomputes from them
# (mjSTATE_INTEGRATION analog, mjtype.h:501-526, plus qacc for warmstart
# and the divergence guard)
STATE_FIELDS = ("time", "qpos", "qvel", "act", "ctrl", "qacc_warmstart",
                "qacc", "qfrc_applied", "xfrc_applied", "eq_active",
                "mocap_pos", "mocap_quat", "history", "tree_asleep")


def scan_steps(m: Model, d: Data, nstep: int, d_fresh: Optional[Data] = None,
               check: bool = True, mesh: Optional[Mesh] = None) -> Data:
  """Scan nstep physics steps carrying ONLY the integration state.

  Carrying the full Data through lax.scan makes every workspace array
  (efc_J, qM, contact slots, ...) a loop-carried buffer — pure HBM traffic
  at each iteration boundary. Restricting the carry to STATE_FIELDS lets
  XLA keep the workspace as in-loop temporaries (fused/reused), which is
  worth ~20% step throughput at batch 3072 on one v5e chip. Results are
  bit-identical to the full-Data scan: forward() reads nothing outside
  STATE_FIELDS.

  d may be batched (leading env axis) or single. check=True applies the
  per-env divergence guard each step (the benchmark/production contract).
  Returns the final full Data (workspace reconstructed by one more
  forward pass would be needed for derived fields; here the last step's
  state is merged into a fresh template).

  mesh: if given (or if d is already committed to a multi-device
  NamedSharding), the whole scan runs under shard_map with the env axis
  sharded — each device scans its local envs with no collectives, and the
  Pallas megakernel (below) sees only per-device shards, which is the only
  layout it supports.

  Megakernel caveats: the in-kernel fori_loop is NOT differentiable (use
  MJTPU_MEGASTEP=0 or f64 to force the XLA path under AD — reverse-mode
  through the XLA path works); results are numerically equivalent but not
  bit-identical to the XLA scan; and d_fresh must be unbatched on the
  kernel path.
  """
  from mujoco_tpu.models import io
  if d_fresh is None:
    d_fresh = io.make_data(m, dtype=d.qpos.dtype)
  batched = d.qpos.ndim == 2

  # multi-device batches run under shard_map: env-parallel, no collectives,
  # and the megakernel pallas_call only ever sees a single device's shard
  if batched and mesh is None:
    try:
      sh = d.qpos.sharding
    except Exception:
      sh = None  # tracer: caller must pass mesh explicitly to shard
    if (isinstance(sh, NamedSharding) and len(sh.device_set) > 1
        and len(sh.spec) and sh.spec[0] is not None):
      mesh = sh.mesh
  if batched and mesh is not None and mesh.size > 1:
    from jax.experimental.shard_map import shard_map
    spec = P(mesh.axis_names[0])
    # XLA commits zero-size leaves (empty act/mocap/history slots) as
    # replicated no matter what device_put asked for, and shard_map's
    # input/output checks reject the mismatch — so they ride replicated on
    # both sides, are rebuilt at the local batch size inside the shard, and
    # restored to the global batch size after.
    io_specs = jax.tree.map(lambda x: spec if x.size else P(), d)
    nb_global = d.qpos.shape[0]

    def local(dd):
      nb_local = dd.qpos.shape[0]
      dd = jax.tree.map(
          lambda x: x if x.size else jnp.zeros((nb_local,) + x.shape[1:],
                                               x.dtype), dd)
      return _scan_steps_local(m, dd, nstep, d_fresh, check)

    out = shard_map(local, mesh=mesh, in_specs=(io_specs,),
                    out_specs=io_specs, check_rep=False)(d)
    return jax.tree.map(
        lambda x: x if x.size else jnp.zeros((nb_global,) + x.shape[1:],
                                             x.dtype), out)
  return _scan_steps_local(m, d, nstep, d_fresh, check)


def _scan_steps_local(m: Model, d: Data, nstep: int, d_fresh: Data,
                      check: bool) -> Data:
  """Single-device scan_steps body (see scan_steps)."""
  batched = d.qpos.ndim == 2
  nb = d.qpos.shape[0] if batched else None

  # whole-step scan-resident Pallas megakernel (ops/megastep_tpu): runs the
  # ENTIRE nstep rollout in VMEM with batch on the 128-lane axis for the
  # supported model class — ~2.7x the XLA step pipeline on a v5e chip
  if batched and d.qpos.dtype == jnp.float32:
    from mujoco_tpu.ops import megastep_tpu as mega
    plat = jax.devices()[0].platform
    under_ad = isinstance(d.qpos, jax.interpreters.ad.JVPTracer)
    if (plat in ("tpu", "axon") and mega.enabled() and not under_ad
        and d_fresh.qpos.ndim == 1 and mega.supported(m)):
      return mega.scan_batch(m, d, nstep, d_fresh=d_fresh, check=check)

  def expand(template):
    if not batched:
      return template
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (nb,) + x.shape), template)

  step = (jax.vmap(lambda dd: forward.step(m, dd)) if batched
          else (lambda dd: forward.step(m, dd)))

  def body(st, _):
    dd = expand(d_fresh).replace(**st)
    dd = step(dd)
    if check:
      dd = check_reset(m, dd, d_fresh)
    return {k: getattr(dd, k) for k in STATE_FIELDS}, ()

  st0 = {k: getattr(d, k) for k in STATE_FIELDS}
  st, _ = jax.lax.scan(body, st0, None, length=nstep)
  return expand(d_fresh).replace(**st)


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


def randomize_model(m: Model, leaf_updates: dict):
  """Per-env (domain-randomized) model + matching vmap axis spec.

  Reference precedent: per-env models in rollout
  (/root/reference/python/mujoco/rollout.cc — list of MjModel). Here the
  static/dynamic pytree split makes it free: any numeric Model leaf may
  carry a leading env axis; stepping maps over (model, data) together:

      bm, axes = randomize_model(m, {'geom_friction': fric_batch})  # (B,...)
      step = jax.vmap(lambda mm, dd: forward.step(mm, dd),
                      in_axes=(axes, 0))
      d = step(bm, d)

  Returns (batched_model, in_axes_spec) where the axis spec maps the updated
  leaves to axis 0 and every other leaf to None. Structural (static) fields
  cannot be randomized without recompiling.
  """
  bm = m.replace(**leaf_updates)
  axes = jax.tree.map(lambda _: None, m)
  ax_updates = {}
  for k, v in leaf_updates.items():
    old = getattr(m, k)
    # nested pytree values (e.g. an Option with one batched leaf): only the
    # leaves that actually gained a leading env axis get mapped
    ax_updates[k] = jax.tree.map(
        lambda new, o: 0 if jnp.shape(new) != jnp.shape(o) else None, v, old)
  axes = axes.replace(**ax_updates)
  return bm, axes


def step_randomized(m_batched: Model, axes, d: Data) -> Data:
  """vmap over per-env model leaves (axes from randomize_model) and data."""
  return jax.vmap(lambda mm, dd: forward.step(mm, dd),
                  in_axes=(axes, 0))(m_batched, d)


def check_reset(m: Model, d: Data, d_fresh: Data) -> Data:
  """Per-env divergence guard (mj_checkPos/Vel analog,
  engine_forward.c:54-92): if qpos/qvel contain NaN/huge values, reset that
  env to d_fresh (auto-reset semantics, warning counters dropped). Works on
  single or batched Data — on batched Data only bad envs reset.

  Only the integration state (mjSTATE_INTEGRATION analog) is overwritten —
  everything else is workspace that the next forward() recomputes; selecting
  every leaf would add a full-Data-sized select to each step (~16% of the
  flagship bench's step time)."""
  bad = (~jnp.isfinite(d.qpos).all(axis=-1)
         | ~jnp.isfinite(d.qvel).all(axis=-1)
         | (jnp.abs(d.qpos).max(axis=-1) > 1e10)
         | (jnp.abs(d.qvel).max(axis=-1) > 1e10))

  def pick(fresh, cur):
    b = bad.reshape(bad.shape + (1,) * (cur.ndim - bad.ndim))
    return jnp.where(b, fresh, cur)

  return d.replace(
      time=pick(d_fresh.time, d.time),
      qpos=pick(d_fresh.qpos, d.qpos),
      qvel=pick(d_fresh.qvel, d.qvel),
      act=pick(d_fresh.act, d.act),
      ctrl=pick(d_fresh.ctrl, d.ctrl),
      qacc_warmstart=pick(d_fresh.qacc_warmstart, d.qacc_warmstart),
      qacc=pick(d_fresh.qacc, d.qacc),
      **({"history": pick(d_fresh.history, d.history)}
         if d.history.shape[-1] else {}),
  )
