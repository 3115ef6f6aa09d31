"""Ctrl/sensor history ring buffers: insert, interpolated read, init.

Counterpart of the reference's history utilities
(mju_historyInit/mju_historyInsert/mju_historyRead,
/root/reference/src/engine/engine_util_misc.c:1403-1560, and the
mj_readCtrl/mj_readSensor wrappers, engine_support.c:886-932).

Buffer layout per the reference: [user(1), cursor(1), times(n), values(n*dim)]
inside the flat Data.history array. n (nsample) and dim are static model
metadata, so every loop below unrolls to fixed-shape gathers; the cursor is a
traced scalar and logical->physical index maps are traced gathers. The
physical layout (including cursor advancement) matches the reference byte for
byte so mjSTATE_HISTORY round-trips bit-exactly against the C engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.utils import math as mjm


def _views(buf, adr: int, n: int, dim: int):
  """(user, cursor, times(n,), values(n, dim)) views of one buffer."""
  user = buf[adr]
  cursor = buf[adr + 1].astype(jnp.int32)
  times = jax.lax.dynamic_slice(buf, (adr + 2,), (n,))
  values = jax.lax.dynamic_slice(buf, (adr + 2 + n,), (n * dim,))
  return user, cursor, times, values.reshape(n, dim)


def _store(buf, adr: int, n: int, dim: int, user, cursor, times, values):
  buf = buf.at[adr].set(user)
  buf = buf.at[adr + 1].set(cursor.astype(buf.dtype))
  buf = jax.lax.dynamic_update_slice(buf, times, (adr + 2,))
  return jax.lax.dynamic_update_slice(buf, values.reshape(-1), (adr + 2 + n,))


def _find_index(ltimes, t):
  """Smallest logical i with ltimes[i] >= t; 0 if t <= oldest, n if t >
  newest (historyFindIndex, engine_util_misc.c:1360). ltimes is the
  logically-ordered (oldest-first) timestamp array."""
  n = ltimes.shape[0]
  ge = ltimes >= t
  first = jnp.argmax(ge)                        # first logical index with >=
  i = jnp.where(jnp.any(ge), first, n)
  return jnp.where(t <= ltimes[0], 0, i).astype(jnp.int32)


def insert(buf, adr: int, n: int, dim: int, t, value):
  """Insert `value` (dim,) at time t, dropping the oldest sample
  (mju_historyInsert, engine_util_misc.c:1429). Returns the updated flat
  history array. All four reference cases (exact-match overwrite, older-than-
  oldest replace, append-with-cursor-advance, out-of-order shift) are
  computed branchlessly and selected by masks."""
  user, cursor, times, values = _views(buf, adr, n, dim)
  value = jnp.asarray(value).reshape(dim).astype(values.dtype)

  logical = (cursor + 1 + jnp.arange(n, dtype=jnp.int32)) % n  # log->phys
  lt = times[logical]
  lv = values[logical]
  i = _find_index(lt, t)

  i_idx = jnp.clip(i, 0, n - 1)
  exact = (i < n) & (jnp.abs(t - lt[i_idx]) < mjm.MINVAL)

  # case: append (i == n) — advance cursor, write at new cursor slot
  app_cursor = (cursor + 1) % n

  # case: out-of-order (0 < i < n, not exact) — shift logical [1, i-1] left
  # onto [0, i-2], write at logical i-1; expressed in logical coordinates
  jl = jnp.arange(n, dtype=jnp.int32)
  shift_lt = jnp.where(jl < i - 1, lt[jnp.minimum(jl + 1, n - 1)],
                       jnp.where(jl == i - 1, t, lt))
  shift_lv = jnp.where((jl < i - 1)[:, None],
                       lv[jnp.minimum(jl + 1, n - 1)],
                       jnp.where((jl == i - 1)[:, None], value[None, :], lv))

  is_append = (~exact) & (i == n)
  is_oldest = (~exact) & (i == 0)
  is_shift = (~exact) & (i > 0) & (i < n)

  # target physical slot for the point-write cases (exact / oldest / append)
  phys_exact = logical[i_idx]
  phys_oldest = logical[0]
  target = jnp.where(exact, phys_exact,
                     jnp.where(is_append, app_cursor, phys_oldest))

  # point-write result
  pt_times = times.at[target].set(jnp.where(exact, times[target], t))
  pt_values = values.at[target].set(value)

  # shift result, scattered back to physical order (cursor unchanged)
  sh_times = jnp.zeros_like(times).at[logical].set(shift_lt)
  sh_values = jnp.zeros_like(values).at[logical].set(shift_lv)

  new_cursor = jnp.where(is_append, app_cursor, cursor)
  new_times = jnp.where(is_shift, sh_times, pt_times)
  new_values = jnp.where(is_shift, sh_values, pt_values)
  return _store(buf, adr, n, dim, user, new_cursor, new_times, new_values)


def read(buf, adr: int, n: int, dim: int, t, interp: int):
  """Interpolated read at time t (mju_historyRead,
  engine_util_misc.c:1478). interp: 0 zero-order hold, 1 linear, 2 cubic
  Hermite with Catmull-Rom slopes (0 at the endpoints). Extrapolation clamps
  to the oldest/newest sample. Returns (dim,)."""
  _, cursor, times, values = _views(buf, adr, n, dim)
  logical = (cursor + 1 + jnp.arange(n, dtype=jnp.int32)) % n
  lt = times[logical]
  lv = values[logical]

  i = _find_index(lt, t)
  i_idx = jnp.clip(i, 1, n - 1)
  lo, hi = i_idx - 1, i_idx

  exact = jnp.abs(t - lt[i_idx]) < mjm.MINVAL
  below = t <= lt[0] + mjm.MINVAL
  above = t >= lt[n - 1] - mjm.MINVAL

  if interp == 0:
    mid = lv[lo]
  else:
    dt = lt[hi] - lt[lo]
    alpha = (t - lt[lo]) / jnp.where(jnp.abs(dt) > mjm.MINVAL, dt, 1.0)
    if interp == 1:
      mid = lv[lo] + alpha * (lv[hi] - lv[lo])
    else:
      a2, a3 = alpha * alpha, alpha ** 3
      h00 = 2 * a3 - 3 * a2 + 1
      h10 = a3 - 2 * a2 + alpha
      h01 = -2 * a3 + 3 * a2
      h11 = a3 - a2
      lo_prev = jnp.maximum(i_idx - 2, 0)
      hi_next = jnp.minimum(i_idx + 1, n - 1)
      dt_lo = lt[hi] - lt[lo_prev]
      m_lo = jnp.where(i_idx > 1,
                       (lv[hi] - lv[lo_prev])
                       / jnp.where(jnp.abs(dt_lo) > mjm.MINVAL, dt_lo, 1.0),
                       0.0)
      dt_hi = lt[hi_next] - lt[lo]
      m_hi = jnp.where(i_idx < n - 1,
                       (lv[hi_next] - lv[lo])
                       / jnp.where(jnp.abs(dt_hi) > mjm.MINVAL, dt_hi, 1.0),
                       0.0)
      mid = h00 * lv[lo] + h10 * dt * m_lo + h01 * lv[hi] + h11 * dt * m_hi

  out = jnp.where(below, lv[0], jnp.where(above, lv[n - 1],
                                          jnp.where(exact, lv[i_idx], mid)))
  return out


def read_ctrl(m, d, i: int, t, interp: int = -1):
  """Delayed scalar ctrl for actuator i at time t (mj_readCtrl,
  engine_support.c:886). Falls back to d.ctrl when the actuator has no
  history buffer."""
  n = int(m.actuator_history[i, 0])
  if n <= 0:
    return d.ctrl[int(m.actuator_ctrladr[i])]
  if interp < 0:
    interp = int(m.actuator_history[i, 1])
  adr = int(m.actuator_historyadr[i])
  delay = float(m.actuator_delay[i])
  return read(d.history, adr, n, 1, t - delay, interp)[0]


def read_sensor(m, d, i: int, t, interp: int = -1):
  """Delayed sensor value for sensor i at time t (mj_readSensor,
  engine_support.c:912). Falls back to the live sensordata slice when the
  sensor has no history buffer."""
  dim = int(m.sensor_dim[i])
  adr_sd = int(m.sensor_adr[i])
  n = int(m.sensor_history[i, 0])
  if n <= 0:
    return d.sensordata[adr_sd:adr_sd + dim]
  if interp < 0:
    interp = int(m.sensor_history[i, 1])
  adr = int(m.sensor_historyadr[i])
  delay = float(m.sensor_delay[i])
  return read(d.history, adr, n, dim, t - delay, interp)


def init_ctrl_history(m, d, i: int, times, values):
  """Seed actuator i's history buffer with explicit (times, values)
  (mj_initCtrlHistory, engine_support.c:938). times must be strictly
  increasing; the user slot is preserved. Returns updated Data."""
  n = int(m.actuator_history[i, 0])
  if n <= 0:
    raise ValueError(f"actuator {i} has no history buffer")
  adr = int(m.actuator_historyadr[i])
  return d.replace(history=_init_buf(d.history, adr, n, 1, times, values,
                                     user=d.history[adr]))


def init_sensor_history(m, d, i: int, times, values, phase=0.0):
  """Seed sensor i's history buffer (mj_initSensorHistory,
  engine_support.c:968). phase lands in the user slot (interval-mode
  previous-tick time). Returns updated Data."""
  n = int(m.sensor_history[i, 0])
  if n <= 0:
    raise ValueError(f"sensor {i} has no history buffer")
  adr = int(m.sensor_historyadr[i])
  dim = int(m.sensor_dim[i])
  return d.replace(history=_init_buf(d.history, adr, n, dim, times, values,
                                     user=phase))


def _init_buf(buf, adr, n, dim, times, values, user):
  times = jnp.asarray(times).reshape(n).astype(buf.dtype)
  values = jnp.asarray(values).reshape(n * dim).astype(buf.dtype)
  buf = buf.at[adr].set(user)
  buf = buf.at[adr + 1].set(float(n - 1))
  buf = jax.lax.dynamic_update_slice(buf, times, (adr + 2,))
  return jax.lax.dynamic_update_slice(buf, values, (adr + 2 + n,))
