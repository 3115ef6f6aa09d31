"""Extension registry: the mjpPlugin / mjcb_* analog.

Reference surfaces re-designed functionally:
  * plugin slots + registration   /root/reference/include/mujoco/mjplugin.h,
                                  /root/reference/src/engine/engine_plugin.cc:1-779
  * user callbacks (mjcb_act_dyn/gain/bias, mjcb_sensor, mjcb_passive)
                                  /root/reference/src/engine/engine_callback.c

Because the engine is pure-functional and jit-compiled, callbacks must be
pure JAX-traceable functions, and they are resolved ONCE at ``put_model``
time into static Model metadata (``Model.user_cb``): jit caching then keys
on the callables themselves, so re-registering and re-building a model
retraces cleanly. Register BEFORE calling ``put_model``.

API
---
register_sdf(name, fn, attr_names=(), defaults=())
    Register a custom signed-distance shape usable as
    ``<geom type="sdf"><plugin instance=.../></geom>``. ``fn(x, params)``
    maps local points (..., 3) to signed distances; gradients come from
    jax.grad. The five reference shapes (mujoco.sdf.torus/bolt/nut/bowl/
    gear) are pre-registered through this same table.

set_actuator_callbacks(dyn=None, gain=None, bias=None)
    mjcb_act_* analog for actuators declared with dyntype/gaintype/biastype
    "user". Each callback is ``fn(m, d, i) -> scalar`` with ``i`` the static
    actuator index: dyn returns act_dot, gain/bias return the gain/bias
    force terms.

set_sensor_callback(fn)
    mjcb_sensor analog for ``<user .../>`` sensors: ``fn(m, d, i) -> (dim,)``
    with ``i`` the static sensor index; the result lands at the sensor's
    address in sensordata.

set_passive_callback(fn)
    mjcb_passive analog: ``fn(m, d) -> (nv,)`` force added to qfrc_passive.
"""

from __future__ import annotations

from typing import Callable, Optional


def register_sdf(name: str, fn: Callable, attr_names=(), defaults=()):
  """Register a custom SDF shape under a plugin name."""
  from mujoco_tpu.ops import sdf as sdfmod
  sdfmod.PLUGIN_SDF[name] = (fn, tuple(attr_names), tuple(defaults))


def unregister_sdf(name: str):
  from mujoco_tpu.ops import sdf as sdfmod
  sdfmod.PLUGIN_SDF.pop(name, None)


_act_dyn: Optional[Callable] = None
_act_gain: Optional[Callable] = None
_act_bias: Optional[Callable] = None
_sensor: Optional[Callable] = None
_passive: Optional[Callable] = None


def set_actuator_callbacks(dyn=None, gain=None, bias=None):
  global _act_dyn, _act_gain, _act_bias
  _act_dyn, _act_gain, _act_bias = dyn, gain, bias


def set_sensor_callback(fn):
  global _sensor
  _sensor = fn


def set_passive_callback(fn):
  global _passive
  _passive = fn


def resolve() -> tuple:
  """Snapshot of the registered callbacks, stored statically on Model at
  put_model time: (act_dyn, act_gain, act_bias, sensor, passive)."""
  return (_act_dyn, _act_gain, _act_bias, _sensor, _passive)
