"""Build a model procedurally with MjSpec, compile natively, simulate,
render a depth image — no XML files, no reference-compiler dependency.

Run:  python examples/procedural_model.py
"""

import jax
import numpy as np

import mujoco_tpu as mt
from mujoco_tpu.compiler import MjSpec

spec = MjSpec()
spec.set_option(timestep=0.002)
spec.worldbody.add_geom(type="plane", size=[3, 3, 0.1],
                        rgba=[0.3, 0.4, 0.3, 1])
for i in range(3):
    b = spec.worldbody.add_body(name=f"box{i}", pos=[0, 0, 0.15 + 0.25 * i])
    b.add_freejoint()
    b.add_geom(type="box", size=[0.1 - 0.02 * i] * 3,
               rgba=[1 - 0.3 * i, 0.2, 0.3 * i, 1])
spec.worldbody.add_camera(name="cam", pos=[0, -1.5, 0.8],
                          xyaxes=[1, 0, 0, 0, 0.45, 0.9])
spec.worldbody.add_light(name="sun", type="directional", dir=[-0.3, 0.4, -1],
                         diffuse=[0.8, 0.8, 0.8])

m = mt.put_model(spec.compile())
d = mt.make_data(m)
step = jax.jit(lambda dd: mt.step(m, dd))
for _ in range(400):
    d = step(d)

rgb, depth, seg = mt.render(m, d, camid=0, width=48, height=32)
chars = " .:-=+*#%@"
img = np.asarray(rgb).sum(-1) / 3
img = np.where(np.asarray(seg) >= 0,
               (img - img.min()) / max(float(np.ptp(img)), 1e-6), 0.0)
print("\n".join("".join(chars[min(9, int(v * 9.99))] for v in row)
                for row in img))
print("stack heights:", [round(float(d.qpos[7 * i + 2]), 3)
                         for i in range(3)])
