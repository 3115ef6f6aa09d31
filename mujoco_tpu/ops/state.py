"""State vector API: get/set/reset, keyframes, name lookup.

Counterpart of the reference's state signature machinery
(mj_stateSize/mj_getState/mj_setState, /root/reference/src/engine/engine_support.c,
spec mjtState /root/reference/include/mujoco/mjtype.h:501-526) and
mj_resetData/mj_resetDataKeyframe (engine_io.c). The bitmask semantics and
component ordering match the reference exactly, so a state vector saved from
the C engine restores bit-identically here (the checkpoint/resume contract,
SURVEY.md §5)."""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, Model


class StateBit(enum.IntFlag):
  """mjtState (mjtype.h:501-526)."""
  TIME = 1 << 0
  QPOS = 1 << 1
  QVEL = 1 << 2
  ACT = 1 << 3
  HISTORY = 1 << 4
  WARMSTART = 1 << 5
  CTRL = 1 << 6
  QFRC_APPLIED = 1 << 7
  XFRC_APPLIED = 1 << 8
  EQ_ACTIVE = 1 << 9
  MOCAP_POS = 1 << 10
  MOCAP_QUAT = 1 << 11

  PHYSICS = QPOS | QVEL | ACT | HISTORY
  FULLPHYSICS = TIME | PHYSICS
  USER = (CTRL | QFRC_APPLIED | XFRC_APPLIED | EQ_ACTIVE | MOCAP_POS
          | MOCAP_QUAT)
  INTEGRATION = FULLPHYSICS | USER | WARMSTART


# (bit, data field, size fn) in the reference's canonical order
_COMPONENTS = (
    (StateBit.TIME, "time", lambda m: 1),
    (StateBit.QPOS, "qpos", lambda m: m.nq),
    (StateBit.QVEL, "qvel", lambda m: m.nv),
    (StateBit.ACT, "act", lambda m: m.na),
    (StateBit.HISTORY, "history", lambda m: m.nhistory),
    (StateBit.WARMSTART, "qacc_warmstart", lambda m: m.nv),
    (StateBit.CTRL, "ctrl", lambda m: m.nctrl),
    (StateBit.QFRC_APPLIED, "qfrc_applied", lambda m: m.nv),
    (StateBit.XFRC_APPLIED, "xfrc_applied", lambda m: 6 * m.nbody),
    (StateBit.EQ_ACTIVE, "eq_active", lambda m: m.neq),
    (StateBit.MOCAP_POS, "mocap_pos", lambda m: 3 * m.nmocap),
    (StateBit.MOCAP_QUAT, "mocap_quat", lambda m: 4 * m.nmocap),
)


def state_size(m: Model, spec: int) -> int:
  """mj_stateSize."""
  return sum(sz(m) for bit, _, sz in _COMPONENTS if spec & bit)


def get_state(m: Model, d: Data, spec: int):
  """mj_getState: flat state vector in canonical component order."""
  parts = []
  for bit, name, sz in _COMPONENTS:
    if not spec & bit:
      continue
    v = getattr(d, name)
    parts.append(jnp.ravel(v).astype(d.qpos.dtype))
  return (jnp.concatenate(parts) if parts
          else jnp.zeros((0,), dtype=d.qpos.dtype))


def set_state(m: Model, d: Data, spec: int, vec) -> Data:
  """mj_setState: scatter a flat state vector back into Data."""
  adr = 0
  updates = {}
  for bit, name, sz in _COMPONENTS:
    if not spec & bit:
      continue
    n = sz(m)
    cur = getattr(d, name)
    chunk = jax.lax.dynamic_slice(vec, (adr,), (n,))
    updates[name] = chunk.reshape(jnp.shape(cur)).astype(cur.dtype)
    adr += n
  return d.replace(**updates)


def reset_data(m: Model, d: Data) -> Data:
  """mj_resetData: state back to qpos0, everything else zeroed. Like the
  reference (engine_io.c:1486-1497), models with sleep='init' trees run a
  forward pass here and put those trees to sleep (static check: models
  without SLEEP_INIT trees pay nothing)."""
  from mujoco_tpu.models import io
  fresh = io.make_data(m, dtype=d.qpos.dtype)
  if m.ntree and np.any(np.asarray(m.tree_sleep_policy) == 5):
    from mujoco_tpu.ops import sleep as sleep_mod
    fresh = sleep_mod.init_sleep(m, fresh)
  return fresh


def reset_data_keyframe(m: Model, d: Data, key: int) -> Data:
  """mj_resetDataKeyframe."""
  d = reset_data(m, d)
  return d.replace(
      time=m.key_time[key],
      qpos=m.key_qpos[key],
      qvel=m.key_qvel[key],
      act=m.key_act[key],
      ctrl=m.key_ctrl[key],
      mocap_pos=m.key_mpos[key].reshape(m.nmocap, 3),
      mocap_quat=m.key_mquat[key].reshape(m.nmocap, 4),
  )


def name2id(m: Model, objtype: str, name: str) -> int:
  """mj_name2id analog over the static name tables; -1 if absent."""
  return m.names.get(objtype, {}).get(name, -1)


def id2name(m: Model, objtype: str, objid: int):
  """mj_id2name analog; None if absent."""
  for name, i in m.names.get(objtype, {}).items():
    if i == objid:
      return name
  return None
