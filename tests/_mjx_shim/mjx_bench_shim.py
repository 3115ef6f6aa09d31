"""Import the reference tree's MJX (v3.11.1 source) against pip mujoco 3.10.0
for on-chip benchmarking.  MJX's put_model reads MjModel attributes by name;
a handful of fields are new in 3.11 — this proxy synthesizes them.

Benchmark-only helper (not part of the mujoco_tpu framework).
"""
import sys
import numpy as np

_SHIM_DIR = "/root/repo/tests/_mjx_shim"
_MJX_DIR = "/root/reference/mjx"


def import_mjx():
  if _SHIM_DIR not in sys.path:
    sys.path.insert(0, _SHIM_DIR)
  if _MJX_DIR not in sys.path:
    sys.path.insert(0, _MJX_DIR)
  # mujoco is a pkgutil-style namespace package; if it was imported before
  # the sys.path insert, its __path__ must be re-extended to see the
  # reference tree's mujoco/mjx subpackage
  import pkgutil
  import mujoco
  mujoco.__path__ = pkgutil.extend_path(mujoco.__path__, "mujoco")
  from mujoco import mjx  # noqa: deferred
  return mjx


class ModelProxy:
  """Forwards attribute reads to a pip-3.10 MjModel, synthesizing fields
  that MJX 3.11 expects but 3.10 lacks."""

  def __init__(self, m):
    self._m = m

  def __getattr__(self, name):
    m = object.__getattribute__(self, "_m")
    try:
      return getattr(m, name)
    except AttributeError:
      pass
    if name == "flg_gravcomp":
      return bool(np.any(m.body_gravcomp != 0))
    if name in ("nhistory", "nsleep", "ntree"):
      return 0
    if name.startswith("flg_"):
      return False
    # int scalar counts default to 0; arrays can't be guessed — fail loudly
    raise AttributeError(f"ModelProxy: no shim for MjModel.{name}")
