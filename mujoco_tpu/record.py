"""Record CLI: simulate a model and write rendered frames / a USD stage.

Counterpart of the reference's sample/record.cc (offscreen render of a
trajectory to raw RGB) rebuilt on this engine's on-device ray-cast renderer:
steps the model, renders every `--fps`-th state through ops/render.py
(materials/textures/lights included), and writes PNG frames — plus,
optionally, the whole trajectory as a time-sampled USD stage.

  python -m mujoco_tpu.record <model.xml | zoo-name> [--out DIR]
      [--seconds S] [--fps F] [--width W] [--height H] [--camera ID]
      [--shadows] [--usd]
"""

from __future__ import annotations

import argparse
import os


def record(m, nstep: int, every: int, camid: int = 0, width: int = 128,
           height: int = 128, shadows: bool = False, d=None):
  """Roll out nstep steps, rendering every `every`-th frame on device.

  Returns (frames_u8 (nframes, H, W, 3), datas list). jit-compiled scan
  over the step; frames render from the saved kinematic snapshots."""
  import jax
  import jax.numpy as jnp
  from mujoco_tpu.models import io
  from mujoco_tpu.ops import forward, render

  if d is None:
    d = io.make_data(m)

  step = jax.jit(lambda dd: forward.step(m, dd))
  rend = jax.jit(lambda dd: render.render(m, dd, camid, width, height,
                                          shadows=shadows))
  frames = []
  datas = []
  for t in range(nstep):
    d = step(d)
    if t % every == 0:
      rgb, _, _ = rend(d)
      frames.append((jnp.clip(rgb, 0, 1) * 255).astype(jnp.uint8))
      datas.append(d)
  import numpy as np
  return np.stack([np.asarray(f) for f in frames]), datas


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("model", help="MJCF path or built-in zoo name")
  p.add_argument("--out", default="frames")
  p.add_argument("--seconds", type=float, default=2.0)
  p.add_argument("--fps", type=float, default=30.0)
  p.add_argument("--width", type=int, default=128)
  p.add_argument("--height", type=int, default=128)
  p.add_argument("--camera", type=int, default=0)
  p.add_argument("--shadows", action="store_true")
  p.add_argument("--usd", action="store_true",
                 help="also write a time-sampled USD stage")
  args = p.parse_args(argv)

  from mujoco_tpu.models import io, zoo

  if os.path.exists(args.model):
    from mujoco_tpu.compiler import load_xml_path
    m = io.put_model(load_xml_path(args.model))
  else:
    m = getattr(zoo, args.model)()

  dt = float(m.opt.timestep)
  nstep = max(1, int(round(args.seconds / dt)))
  every = max(1, int(round(1.0 / (args.fps * dt))))
  frames, datas = record(m, nstep, every, args.camera, args.width,
                         args.height, args.shadows)

  os.makedirs(args.out, exist_ok=True)
  from PIL import Image
  for i, f in enumerate(frames):
    Image.fromarray(f).save(os.path.join(args.out, f"frame_{i:05d}.png"))
  print(f"wrote {len(frames)} frames to {args.out}/")

  if args.usd:
    from mujoco_tpu.usd_export import export_usd
    path = os.path.join(args.out, "trajectory.usda")
    export_usd(m, datas, path, fps=args.fps)
    print(f"wrote {path}")


if __name__ == "__main__":
  main()
