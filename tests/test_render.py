"""Batched renderer: depth/seg pixel-exact vs mj_ray, RGB/shading sanity.

The renderer (ops/render.py) casts one ray per pixel through the same
dispatch as mj_ray (engine_ray.c), so depth and segmentation are compared
pixel-exactly against the reference ray caster; shading is this engine's own
headlight model (the reference's rasterizer is OpenGL/warp — no oracle here).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, render
from mujoco_tpu.ops.render import _camera_rays


SCENE = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" rgba="0.5 0.5 0.5 1"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="sphere" size="0.3" rgba="1 0 0 1"/></body>
    <body pos="1 0 0.3"><freejoint/>
      <geom type="box" size="0.2 0.2 0.3" euler="0 0 30" rgba="0 1 0 1"/>
    </body>
    <body pos="-1 0.5 0.4"><freejoint/>
      <geom type="capsule" size="0.15" fromto="0 0 0 0 0 0.4"
            rgba="0 0 1 1"/></body>
    <body pos="0.2 1 0.8"><freejoint/>
      <geom type="ellipsoid" size="0.2 0.3 0.15"/></body>
    <body pos="-0.8 -0.5 0.3"><freejoint/>
      <geom type="cylinder" size="0.15 0.2" euler="30 0 0"/></body>
    <camera name="cam" pos="0 -3 1.5" xyaxes="1 0 0 0 0.4 0.9"/>
  </worldbody>
</mujoco>"""


def _oracle_check(xml, W=48, H=36, camid=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  rgb, depth, seg = jax.jit(
      lambda dd: render.render(m, dd, camid, W, H))(d)
  depth = np.asarray(depth).ravel()
  seg = np.asarray(seg).ravel()
  dirs = np.asarray(_camera_rays(m, d, camid, W, H, np.float64))
  pnt = np.asarray(d.cam_xpos[camid])
  geomid = np.zeros(1, dtype=np.int32)
  for i in range(W * H):
    n = np.linalg.norm(dirs[i])
    dref = mujoco.mj_ray(mjm, mjd, pnt, dirs[i] / n, None, 1, -1, geomid)
    assert geomid[0] == seg[i], f"pixel {i}: geom {seg[i]} vs {geomid[0]}"
    if geomid[0] >= 0:
      np.testing.assert_allclose(depth[i] * n, dref, atol=1e-9,
                                 err_msg=f"pixel {i}")
  return np.asarray(rgb), m, d


def test_primitives_pixel_exact():
  rgb, _, _ = _oracle_check(SCENE)
  # shading produced colored, in-range pixels
  assert rgb.min() >= 0 and rgb.max() <= 1
  assert rgb.max() > 0.2


def test_hfield_and_mesh():
  xml = """
<mujoco>
  <asset>
    <hfield name="hf" nrow="6" ncol="6" size="2 2 0.5 0.1"/>
    <mesh name="tet" vertex="0 0 0  0.4 0 0  0 0.4 0  0 0 0.4"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="hf" pos="0 0 0" contype="0" conaffinity="0"/>
    <body pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="tet" rgba="1 1 0 1" contype="0" conaffinity="0"/></body>
    <camera name="c" pos="0 -2.5 1.8" xyaxes="1 0 0 0 0.5 0.87"/>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.hfield_data[:] = np.linspace(0, 1, 36)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  W, H = 40, 30
  rgb, depth, seg = jax.jit(lambda dd: render.render(m, dd, 0, W, H))(d)
  depth = np.asarray(depth).ravel()
  seg = np.asarray(seg).ravel()
  dirs = np.asarray(_camera_rays(m, d, 0, W, H, np.float64))
  pnt = np.asarray(d.cam_xpos[0])
  geomid = np.zeros(1, dtype=np.int32)
  for i in range(W * H):
    n = np.linalg.norm(dirs[i])
    dref = mujoco.mj_ray(mjm, mjd, pnt, dirs[i] / n, None, 1, -1, geomid)
    assert geomid[0] == seg[i], f"pixel {i}"
    if geomid[0] >= 0:
      np.testing.assert_allclose(depth[i] * n, dref, atol=1e-9)
  assert (seg >= 0).sum() > 50  # scene visible


def test_batched_render():
  """vmap over batched Data renders independent envs (MJX render.py batched
  contract)."""
  mjm = mujoco.MjModel.from_xml_string(SCENE)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  batch = jax.tree.map(lambda x: jnp.stack([x, x]), d)
  # env 1: move the sphere away
  qpos = np.array(batch.qpos)
  qpos[1, 0:3] = [50, 50, 50]
  batch = batch.replace(qpos=jnp.asarray(qpos))
  batch = jax.vmap(lambda dd: forward.forward(m, dd))(batch)
  rgb, depth, seg = jax.vmap(
      lambda dd: render.render(m, dd, 0, 32, 24))(batch)
  assert rgb.shape == (2, 24, 32, 3)
  # sphere (geom 1) visible only in env 0
  assert (np.asarray(seg[0]) == 1).sum() > 0
  assert (np.asarray(seg[1]) == 1).sum() == 0


def test_depth_differentiable():
  """Mean depth differentiates w.r.t. body height (renderer is a pure jax
  fn; the reference's C renderer is not differentiable)."""
  mjm = mujoco.MjModel.from_xml_string(SCENE)
  m = io.put_model(mjm)

  from mujoco_tpu.ops import smooth

  def mean_depth(dz):
    d = io.make_data(m)
    qpos = d.qpos.at[2].add(dz)
    d = d.replace(qpos=qpos)
    # rendering needs kinematics only — no need to differentiate the solver
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.camlight(m, d)
    _, depth, seg = render.render(m, d, 0, 24, 18)
    w = (seg == 1)
    return jnp.sum(jnp.where(w, depth, 0.0)) / jnp.maximum(jnp.sum(w), 1)

  g = jax.grad(mean_depth)(jnp.zeros(()))
  assert np.isfinite(float(g)) and abs(float(g)) > 1e-6
