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


# ---------------------------------------------------------------------------
# materials, textures, lights (render_gl3.c shading analog)
# ---------------------------------------------------------------------------

LIT_SCENE = """
<mujoco>
  <visual><headlight active="0"/></visual>
  <asset>
    <texture name="grid" type="2d" builtin="checker" rgb1="1 0 0"
             rgb2="0 0 1" width="8" height="8"/>
    <texture name="sky" type="skybox" builtin="flat" rgb1=".3 .5 .7"
             width="4" height="4"/>
    <material name="floor" texture="grid" texrepeat="2 2"/>
    <material name="glow" emission="1" rgba="0 1 0 1"/>
    <material name="plain" rgba="1 0 1 1"/>
  </asset>
  <worldbody>
    <light name="top" pos="0 0 4" dir="0 0 -1" diffuse="1 1 1"
           ambient=".1 .1 .1" cutoff="80" exponent="0"/>
    <geom name="floor" type="plane" size="2 2 .1" material="floor"/>
    <geom name="ball" type="sphere" size=".3" pos="0 0 .6"
          material="plain"/>
    <geom name="glowbox" type="box" size=".1 .1 .1" pos="1.2 0 .1"
          material="glow"/>
    <camera name="down" pos="0 0 3" xyaxes="1 0 0 0 1 0"/>
  </worldbody>
</mujoco>"""


def _render_lit(xml, shadows=False, W=32, H=32):
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  rgb, depth, seg = jax.jit(
      lambda dd: render.render(m, dd, 0, W, H, shadows=shadows))(d)
  return np.asarray(rgb), np.asarray(seg), m, d


def test_texture_checker_plane():
  """Checker texture shows both rgb1 and rgb2 tones on the floor, with the
  repeat structure (red and blue both present, no green channel)."""
  rgb, seg, m, d = _render_lit(LIT_SCENE)
  floor = rgb[seg == 0]
  assert floor.shape[0] > 100
  # red-dominant and blue-dominant texels both sampled
  assert ((floor[:, 0] > 2 * floor[:, 2] + 0.05).sum() > 10)
  assert ((floor[:, 2] > 2 * floor[:, 0] + 0.05).sum() > 10)
  # checker has no green component anywhere on the floor
  assert floor[:, 1].max() < 0.15


def test_material_rgba_and_emission():
  """Material rgba colors an untextured geom (setMaterial rule); emission
  lights a geom even where diffuse contribution is tiny."""
  rgb, seg, m, d = _render_lit(LIT_SCENE)
  ball = rgb[seg == 1]
  # plain material rgba (1 0 1): magenta, green stays dark
  assert ball[:, 0].max() > 0.3 and ball[:, 2].max() > 0.3
  assert ball[:, 1].max() < 0.2
  # emission=1 green box is bright green regardless of light geometry
  glow = rgb[seg == 2]
  assert glow[:, 1].min() > 0.8
  assert glow[:, 0].max() < 0.3


def test_geom_rgba_overrides_material():
  """A non-default geom rgba wins over the material color
  (engine_vis_visualize.c:237-240)."""
  xml = LIT_SCENE.replace('material="plain"', 'material="plain" rgba="1 1 0 1"')
  rgb, seg, m, d = _render_lit(xml)
  ball = rgb[seg == 1]
  assert ball[:, 1].max() > 0.3       # yellow now has green
  assert ball[:, 2].max() < 0.2       # and no blue


def test_skybox_background():
  """Rays that miss everything sample the skybox instead of black."""
  rgb, seg, m, d = _render_lit(LIT_SCENE)
  bg = rgb[seg == -1]
  if bg.shape[0]:                      # camera sees past the 2x2 plane edge
    np.testing.assert_allclose(
        bg, np.broadcast_to(np.array([0.3, 0.5, 0.7]), bg.shape),
        atol=2 / 255)
  # side-looking camera definitely sees sky
  xml = LIT_SCENE.replace('pos="0 0 3" xyaxes="1 0 0 0 1 0"',
                          'pos="0 -4 1" xyaxes="1 0 0 0 .3 .95"')
  rgb2, seg2, _, _ = _render_lit(xml)
  bg2 = rgb2[seg2 == -1]
  assert bg2.shape[0] > 0
  np.testing.assert_allclose(
      bg2, np.broadcast_to(np.array([0.3, 0.5, 0.7]), bg2.shape),
      atol=2 / 255)


def test_directional_light_shading():
  """A directional light from +x makes the sphere's +x side brighter."""
  xml = LIT_SCENE.replace(
      '<light name="top" pos="0 0 4" dir="0 0 -1" diffuse="1 1 1"\n'
      '           ambient=".1 .1 .1" cutoff="80" exponent="0"/>',
      '<light name="side" type="directional" dir="-1 0 -.2" diffuse="1 1 1"/>')
  rgb, seg, m, d = _render_lit(xml, W=48, H=48)
  ys, xs = np.nonzero(seg == 1)
  cols = rgb[seg == 1]
  mid = np.median(xs)
  # image columns increase toward world -x (x_img = -fx x/z + cx,
  # cam_project convention) — the lit +x hemisphere is image-left
  bright_left = cols[xs < mid].mean()
  bright_right = cols[xs > mid].mean()
  assert bright_left > bright_right + 0.05


def test_spot_cone():
  """A narrow spot lights only the cone footprint on the floor."""
  xml = LIT_SCENE.replace('cutoff="80" exponent="0"', 'cutoff="10" exponent="0"')
  xml = xml.replace('<geom name="ball" type="sphere" size=".3" pos="0 0 .6"\n'
                    '          material="plain"/>', '')
  rgb, seg, m, d = _render_lit(xml, W=48, H=48)
  lum = rgb.sum(-1)
  floor = seg == 0
  # cone footprint: tan(10 deg)*4 ~ 0.7m radius on a 4m-away floor; the
  # center pixels are lit, the plane corners only by ambient
  cy, cx = 24, 24
  assert lum[cy, cx] > 0.3
  corner = lum[np.nonzero(floor)].min()
  assert lum[cy, cx] > corner + 0.2


def test_shadows():
  """With shadows on, an oblique light casts the ball's shadow onto
  visible floor pixels (occlusion ray): some floor pixel darkens a lot,
  no pixel brightens."""
  xml = LIT_SCENE.replace('<light name="top" pos="0 0 4"',
                          '<light name="top" pos="2 0 4"')
  rgb_ns, seg, m, d = _render_lit(xml, shadows=False, W=48, H=48)
  rgb_sh, seg2, _, _ = _render_lit(xml, shadows=True, W=48, H=48)
  np.testing.assert_array_equal(seg, seg2)
  floor = seg == 0
  diff = rgb_ns.sum(-1)[floor] - rgb_sh.sum(-1)[floor]
  assert diff.max() > 0.3               # umbra visible beside the ball
  assert diff.min() > -1e-6             # shadows only remove light
  # lit fraction of the floor is unchanged
  assert (np.abs(diff) < 1e-6).sum() > 0.3 * floor.sum()


def test_render_native_compiled_textures():
  """The native compiler's texture/material tables drive the renderer the
  same way the pip compiler's do (same scene through both)."""
  from mujoco_tpu.compiler import load_xml
  cm = load_xml(LIT_SCENE)
  mn = io.put_model(cm)
  mjm = mujoco.MjModel.from_xml_string(LIT_SCENE)
  mo = io.put_model(mjm)
  dn = forward.forward(mn, io.make_data(mn))
  do = forward.forward(mo, io.make_data(mo))
  rn, _, sn = render.render(mn, dn, 0, 24, 24)
  ro, _, so = render.render(mo, do, 0, 24, 24)
  np.testing.assert_array_equal(np.asarray(sn), np.asarray(so))
  np.testing.assert_allclose(np.asarray(rn), np.asarray(ro), atol=1e-6)


def test_orthographic_camera():
  """Orthographic cameras (cam_projection == 1, fovy = extent): parallel
  rays — object size in pixels is distance-invariant, unlike perspective."""
  def scene(proj, h):
    return f"""
<mujoco>
  <worldbody>
    <geom type="plane" size="6 6 .1"/>
    <body pos="0 0 {h}"><freejoint/><geom type="sphere" size=".3"/></body>
    <camera name="c" projection="{proj}" fovy="{2 if proj == 'orthographic'
                                                else 45}" pos="0 0 4"
            xyaxes="1 0 0 0 1 0"/>
  </worldbody>
</mujoco>"""

  def ball_pixels(proj, h):
    mjm = mujoco.MjModel.from_xml_string(scene(proj, h))
    m = io.put_model(mjm)
    d = forward.forward(m, io.make_data(m))
    _, _, seg = render.render(m, d, 0, 48, 48)
    return (np.asarray(seg) == 1).sum()

  near_o = ball_pixels("orthographic", 3.0)
  far_o = ball_pixels("orthographic", 0.5)
  assert near_o > 10 and far_o > 10
  np.testing.assert_allclose(near_o, far_o, rtol=0.2)   # size invariant
  near_p = ball_pixels("perspective", 3.0)
  far_p = ball_pixels("perspective", 0.5)
  assert near_p > 2.5 * far_p                           # perspective shrinks
  # native compiler carries the projection flag
  from mujoco_tpu.compiler import load_xml
  cm = load_xml(scene("orthographic", 1.0))
  np.testing.assert_array_equal(cm.cam_projection, [1])
