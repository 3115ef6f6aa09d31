"""Interactive viewer: the `simulate` application analog.

Re-implements the reference's physics-loop + render-loop split
(/root/reference/simulate/main.cc:296 PhysicsLoop + simulate.h:60-86
Simulate state machine; /root/reference/python/mujoco/viewer.py
launch/launch_passive) for an engine whose physics lives on an
accelerator: the jitted step loop runs HERE (batched state on device), and
each render frame syncs the single visualized env into a `mujoco.MjData`
via the `io.get_data_into` bridge, which the pip passive viewer renders.

Interaction contract (matching the reference viewer's passive mode):
  - mouse perturb: the GUI writes `mjd.xfrc_applied` (mjv_applyPerturbForce)
    and drags mocap bodies through `mjd.mocap_pos/quat`; both are copied
    into the device Data every frame.
  - keyboard: SPACE pause, BACKSPACE reset, '-'/'=' halve/double the
    real-time factor (simulate.h percentRealTime).
  - real-time pacing: physics advances in chunks of
    ceil(frame_dt * rtf / timestep) steps per rendered frame, the
    reference's Simulate::Render sync strategy.

CLI: python -m mujoco_tpu.viewer model.xml [--fps 60] [--rtf 1.0]
"""

from __future__ import annotations

import argparse
import math
import time
from typing import Any, Callable, Optional

import numpy as np


class LoopState:
  """Pause/speed/reset shared between key callback and the loop
  (Simulate::run/speed state, simulate.h:60-86)."""

  def __init__(self, rtf: float = 1.0):
    self.paused = False
    self.reset_requested = False
    self.rtf = rtf          # real-time factor (1.0 = real time)
    self.running = True

  def key(self, keycode: int) -> None:
    if keycode == 32:           # SPACE
      self.paused = not self.paused
    elif keycode == 259:        # BACKSPACE
      self.reset_requested = True
    elif keycode in (45, 95):   # '-'
      self.rtf = max(self.rtf / 2.0, 1.0 / 64.0)
    elif keycode in (61, 43):   # '='
      self.rtf = min(self.rtf * 2.0, 64.0)


def _physics_frame(m, d, d_fresh, mjd, state, step_fn, nstep: int):
  """One render frame's worth of physics: pull GUI edits from mjd, advance
  nstep steps (0 when paused), return the new device Data."""
  import jax.numpy as jnp

  # GUI -> device: perturb forces and mocap drags (the passive viewer
  # writes these into mjd during its sync)
  xfrc = np.asarray(mjd.xfrc_applied, dtype=np.float64)
  if xfrc.any() or bool(np.asarray(d.xfrc_applied).any()):
    d = d.replace(xfrc_applied=jnp.asarray(xfrc, dtype=d.qpos.dtype))
  if m.nmocap:
    d = d.replace(
        mocap_pos=jnp.asarray(mjd.mocap_pos, dtype=d.qpos.dtype),
        mocap_quat=jnp.asarray(mjd.mocap_quat, dtype=d.qpos.dtype))

  if state.reset_requested:
    state.reset_requested = False
    d = d_fresh
  elif not state.paused and nstep > 0:
    d = step_fn(d, nstep)
  return d


def run_loop(m, mjm, mjd, viewer_obj, state: LoopState,
             d=None, fps: float = 60.0,
             max_frames: Optional[int] = None) -> Any:
  """The physics+render loop (PhysicsLoop, simulate/main.cc:296), driving
  `viewer_obj` (anything with .is_running() and .sync(); normally the pip
  passive viewer). Returns the final device Data."""
  import jax

  from mujoco_tpu.models import io
  from mujoco_tpu.parallel import rollout

  if d is None:
    d = io.make_data(m)
  d_fresh = d
  h = float(np.asarray(m.opt.timestep))
  frame_dt = 1.0 / fps

  from mujoco_tpu.ops import forward as fwd_mod

  compiled = {}

  def step_fn(dd, nstep):
    fn = compiled.get(nstep)
    if fn is None:
      if nstep > 1:
        fn = jax.jit(lambda x: rollout.scan_steps(m, x, nstep, check=False))
      else:
        fn = jax.jit(lambda x: fwd_mod.step(m, x))
      compiled[nstep] = fn
    return fn(dd)

  frames = 0
  next_frame = time.monotonic()
  while viewer_obj.is_running() and state.running:
    if max_frames is not None and frames >= max_frames:
      break
    nstep = max(1, math.ceil(frame_dt * state.rtf / h))
    d = _physics_frame(m, d, d_fresh, mjd, state, step_fn, nstep)
    io.get_data_into(mjd, mjm, d)
    viewer_obj.sync()
    frames += 1
    next_frame += frame_dt
    sleep_s = next_frame - time.monotonic()
    if sleep_s > 0:
      time.sleep(sleep_s)
    else:
      next_frame = time.monotonic()   # fell behind: don't spiral
  return d


def launch(path: Optional[str] = None, xml: Optional[str] = None,
           fps: float = 60.0, rtf: float = 1.0,
           max_frames: Optional[int] = None,
           viewer_factory: Optional[Callable] = None) -> Any:
  """Load a model and run the interactive loop.

  The pip `mujoco` package provides the GL window (launch_passive);
  physics runs in this engine. viewer_factory injects a viewer stand-in
  for headless tests."""
  import mujoco

  from mujoco_tpu.models import io

  if xml is None:
    with open(path) as f:
      xml = f.read()
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)

  state = LoopState(rtf=rtf)
  if viewer_factory is None:
    import mujoco.viewer as mjv

    def viewer_factory(mjm, mjd, key_callback):
      return mjv.launch_passive(mjm, mjd, key_callback=key_callback)

  with viewer_factory(mjm, mjd, state.key) as v:
    return run_loop(m, mjm, mjd, v, state, fps=fps, max_frames=max_frames)


def main(argv=None):
  p = argparse.ArgumentParser(description="mujoco_tpu interactive viewer")
  p.add_argument("model", help="MJCF path")
  p.add_argument("--fps", type=float, default=60.0)
  p.add_argument("--rtf", type=float, default=1.0,
                 help="real-time factor (1.0 = real time)")
  args = p.parse_args(argv)
  launch(path=args.model, fps=args.fps, rtf=args.rtf)


if __name__ == "__main__":
  main()
