"""USD export: stage structure and trajectory time samples.

No pxr runtime in this environment, so the checks parse the emitted usda
text (schema per the reference's exporter,
/root/reference/python/mujoco/usd/exporter.py + shapes.py).
"""

import re

import mujoco
import numpy as np

import jax

from mujoco_tpu import usd_export
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


XML = """
<mujoco>
  <asset>
    <mesh name="tet" vertex="0 0 0  .2 0 0  0 .2 0  0 0 .2"/>
    <material name="red" rgba="1 0 0 1"/>
  </asset>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1"/>
    <light directional="true" pos="1 0 3" dir="0 0 -1"/>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <body pos="0 0 1"><freejoint/>
      <geom name="ball" type="sphere" size=".25" material="red"/></body>
    <body pos="1 0 1"><freejoint/>
      <geom name="chunk" type="mesh" mesh="tet"/></body>
    <body pos="-1 0 .5"><freejoint/>
      <geom name="pill" type="capsule" size=".1 .2"/></body>
    <camera name="cam" pos="0 -3 1" xyaxes="1 0 0 0 .3 .95"/>
  </worldbody>
</mujoco>"""


def test_usd_single_frame(tmp_path):
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  p = tmp_path / "scene.usda"
  text = usd_export.export_usd(m, d, str(p))
  assert p.exists() and text.startswith("#usda 1.0")
  # one Xform per geom with the right Gprim types
  assert text.count("def Xform") == 1 + mjm.ngeom   # World + geoms
  assert 'def Sphere "shape"' in text
  assert 'def Capsule "shape"' in text
  assert 'def Mesh "shape"' in text                 # tet + plane quad
  assert 'def Camera "camera_0"' in text
  assert "def SphereLight" in text and "def DistantLight" in text
  # material rgba reached displayColor (setMaterial rule)
  assert re.search(r"displayColor = \[\(1\.0, 0\.0, 0\.0\)\]", text)
  # named prims
  assert 'def Xform "ball"' in text and 'def Xform "pill"' in text
  # mesh has 4 faces of the tet
  mm = re.search(r"faceVertexCounts = \[((?:3, )*3)\]", text)
  assert mm and mm.group(1).count("3") == 4


def test_usd_trajectory(tmp_path):
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  frames = []
  for _ in range(4):
    d = step(d)
    frames.append(d)
  p = tmp_path / "traj.usda"
  text = usd_export.export_usd(m, frames, str(p), fps=100.0)
  assert "endTimeCode = 3" in text
  assert "timeCodesPerSecond = 100.0" in text
  assert text.count("xformOp:transform.timeSamples") == mjm.ngeom
  # the falling ball's z decreases across samples
  ball = text.split('def Xform "ball"')[1].split("def ")[0]
  zs = [float(r.split(",")[-2]) for r in
        re.findall(r"\(([^()]+, [^()]+, [^()]+, 1\.0)\)", ball)]
  assert len(zs) == 4 and zs[-1] < zs[0]


def test_record_tool(tmp_path):
  """The record CLI (sample/record.cc analog) writes PNG frames and a
  time-sampled USD stage."""
  import os
  from mujoco_tpu import record as rec
  xml = tmp_path / "m.xml"
  xml.write_text(XML)
  out = tmp_path / "frames"
  rec.main([str(xml), "--out", str(out), "--seconds", "0.05",
            "--fps", "100", "--width", "24", "--height", "18", "--usd"])
  pngs = sorted(p for p in os.listdir(out) if p.endswith(".png"))
  assert len(pngs) >= 2
  from PIL import Image
  img = np.asarray(Image.open(out / pngs[0]))
  assert img.shape == (18, 24, 3) and img.max() > 0
  assert (out / "trajectory.usda").exists()


def test_usd_flex_and_skin_meshes():
  """Deformables and skins export as Mesh prims with time-sampled points."""
  xml = """
<mujoco>
  <asset>
    <skin name="flag" rgba=".9 .2 .2 1"
      vertex="0 0 0  .2 0 0  .2 .2 0  0 .2 0"
      face="0 1 2  0 2 3">
      <bone body="pole" bindpos="0 0 0" bindquat="1 0 0 0"
            vertid="0 1 2 3" vertweight="1 1 1 1"/>
    </skin>
  </asset>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body name="pole" pos="0 0 1"><joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size=".02" fromto="0 0 0 .3 0 0"/></body>
    <flexcomp name="pad" type="grid" dim="2" count="3 3 1"
              spacing="0.1 0.1 0.1" pos="0.5 0 0.5" mass="0.2"
              rgba="0 0 1 1">
      <contact selfcollide="none"/></flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  frames = []
  for _ in range(3):
    d = step(d)
    frames.append(d)
  text = usd_export.export_usd(m, frames, "/tmp/flexskin.usda")
  assert 'def Mesh "flex_0"' in text
  assert 'def Mesh "skin_0"' in text
  assert text.count("points.timeSamples") == 2     # one per soft mesh
  # the falling pad's points move across samples
  blk = text.split('def Mesh "flex_0"')[1].split("faceVertexCounts")[0]
  assert "0: [" in blk and "2: [" in blk
