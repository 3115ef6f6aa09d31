"""Loader for the native model-preprocessing extension.

Builds native/topology.cc on first use (g++ against the running
interpreter's headers — the environment ships no pybind11, so the extension
uses the plain CPython C API) and caches the .so next to the source.
Everything degrades gracefully: if the toolchain or build fails, callers
fall back to the pure-Python implementations in models/io.py.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "topology.cc")
_SO = os.path.join(_NATIVE_DIR, "_mjtpu_topology.so")

_mod = None
_tried = False


def _build() -> bool:
  import numpy as np
  inc_py = sysconfig.get_paths()["include"]
  inc_np = np.get_include()
  cmd = [
      "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
      f"-I{inc_py}", f"-I{inc_np}",
      _SRC, "-o", _SO,
  ]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return True
  except Exception:
    return False


def get():
  """The native module, or None if unavailable."""
  global _mod, _tried
  if _mod is not None or _tried:
    return _mod
  _tried = True
  if not os.path.exists(_SO) or (
      os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
    if not _build():
      return None
  try:
    import importlib.util
    spec = importlib.util.spec_from_file_location("_mjtpu_topology", _SO)
    _mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_mod)
  except Exception:
    _mod = None
  return _mod
