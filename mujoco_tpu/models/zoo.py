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


def multi_humanoid_spec(n: int = 4, spacing: float = 3.0):
  """MjSpec for a SINGLE scene with n flagship humanoids on one floor
  (BASELINE.md config 5's replicate-style scene; the reference builds these
  with <replicate>, user_api.cc attach namespacing). The humanoid's own
  contype/conaffinity scheme already excludes humanoid-humanoid collision,
  so the potential coupling graph decomposes per humanoid and the island
  solver (ops/island.py) runs each robot as its own fixed-shape island."""
  from mujoco_tpu.compiler.spec_api import MjSpec
  with open(os.path.join(_ASSETS, "humanoid.xml")) as f:
    xml = f.read()
  scene = MjSpec.from_xml(xml)
  part = MjSpec.from_xml(xml)
  part.worldbody.delete(part.find("floor"))
  for i in range(1, n):
    scene.attach(part, prefix=f"h{i}_")
    root = scene.find(f"h{i}_root")
    row, col = divmod(i, max(1, int(round(n ** 0.5))))
    root.set(pos=[spacing * row, spacing * col, 1.35])
  return scene


def multi_humanoid(n: int = 4, spacing: float = 3.0, dtype=None):
  """Compiled single-scene n-humanoid Model (see multi_humanoid_spec)."""
  from mujoco_tpu.models import io
  return io.put_model(multi_humanoid_spec(n, spacing).compile(), dtype=dtype)
