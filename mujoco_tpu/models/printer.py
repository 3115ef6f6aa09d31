"""Text dumps of Model/Data (mj_printModel / mj_printData analog,
/root/reference/src/engine/engine_print.c): human-readable field listings
for debugging and regression diffs."""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from mujoco_tpu.models.types import Data, Model


def _fmt(name, v, float_format="%g"):
  a = np.asarray(jax.device_get(v)) if hasattr(v, "shape") else v
  if isinstance(a, np.ndarray):
    if a.size == 0:
      return f"{name}: []"
    flat = a.reshape(-1)
    if flat.size <= 24:
      body = " ".join(float_format % x if np.issubdtype(a.dtype, np.floating)
                      else str(x) for x in flat)
    else:
      body = (" ".join(float_format % x if np.issubdtype(a.dtype, np.floating)
                       else str(x) for x in flat[:24]) +
              f" ... ({a.shape})")
    return f"{name}{list(a.shape)}: {body}"
  return f"{name}: {a}"


def print_model(m: Model, float_format="%g", file=None) -> str:
  """Formatted dump of every Model field; returns (and optionally prints)
  the text."""
  lines = [f"MODEL: nq={m.nq} nv={m.nv} nu={m.nu} na={m.na} "
           f"nbody={m.nbody} njnt={m.njnt} ngeom={m.ngeom} "
           f"ncon_slots={m.con.ncon} nefc={m.efc.nefc}"]
  for f in dataclasses.fields(type(m)):
    v = getattr(m, f.name)
    if f.name in ("tree", "con", "efc", "opt", "names") or v is None:
      continue
    if isinstance(v, (int, float, bool)):
      lines.append(f"{f.name}: {v}")
    else:
      try:
        lines.append(_fmt(f.name, v, float_format))
      except Exception:
        pass
  text = "\n".join(lines)
  if file is not None:
    print(text, file=file)
  return text


def print_data(d: Data, float_format="%g", file=None) -> str:
  """Formatted dump of every Data field."""
  lines = ["DATA:"]
  for f in dataclasses.fields(type(d)):
    v = getattr(d, f.name)
    try:
      lines.append(_fmt(f.name, v, float_format))
    except Exception:
      pass
  text = "\n".join(lines)
  if file is not None:
    print(text, file=file)
  return text
