"""Built-in model zoo: flagship benchmark models authored for this project.

Counterpart of the reference's model/ directory; all MJCFs here are original
to this codebase. v0 compiles through the ``mujoco`` pip package
(SURVEY.md §7.1 layering); the native compiler replaces that layer later.
"""

from __future__ import annotations

import os

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def load_mj(name: str):
  """Compiled mujoco.MjModel for a zoo model (oracle-side object)."""
  import mujoco
  path = os.path.join(_ASSETS, f"{name}.xml")
  return mujoco.MjModel.from_xml_path(path)


def load(name: str, dtype=None):
  """TPU Model pytree for a zoo model."""
  from mujoco_tpu.models import io
  return io.put_model(load_mj(name), dtype=dtype)


def humanoid(dtype=None):
  """27-DoF humanoid, the flagship benchmark model (BASELINE.md config 3)."""
  return load("humanoid", dtype=dtype)


def quadruped(dtype=None):
  """18-DoF torque-controlled quadruped (contact-rich locomotion class)."""
  return load("quadruped", dtype=dtype)
