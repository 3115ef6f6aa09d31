"""Skins: compiler field parity + skinning differential vs mjv_updateScene.

The oracle path is the reference's CPU skin evolution
(mjv_updateActiveSkin, engine_vis_visualize.c:3403), reached through
mujoco.mjv_updateScene into MjvScene.skinvert/skinnormal.
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu.compiler import load_xml
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward
from mujoco_tpu.ops.skin import skin_update


# a two-bone arm wrapped by a 8-vertex "sleeve" skin: vertices near the
# elbow weighted between both bones
SKIN_XML = """
<mujoco>
  <asset>
    <skin name="sleeve" inflate="0.01" rgba=".8 .3 .3 1"
      vertex="0 -.1 -.1   0 .1 -.1   0 .1 .1   0 -.1 .1
              .4 -.1 -.1  .4 .1 -.1  .4 .1 .1  .4 -.1 .1"
      face="0 1 2  0 2 3  4 6 5  4 7 6  0 4 5  0 5 1
            1 5 6  1 6 2  2 6 7  2 7 3  3 7 4  3 4 0">
      <bone body="upper" bindpos="0 0 0" bindquat="1 0 0 0"
            vertid="0 1 2 3 4 5 6 7"
            vertweight=".9 .9 .9 .9 .3 .3 .3 .3"/>
      <bone body="lower" bindpos="0.4 0 0" bindquat="1 0 0 0"
            vertid="0 1 2 3 4 5 6 7"
            vertweight=".1 .1 .1 .1 .7 .7 .7 .7"/>
    </skin>
  </asset>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping=".1"/>
      <geom type="capsule" size=".05" fromto="0 0 0 .4 0 0"/>
      <body name="lower" pos="0.4 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping=".1"/>
        <geom type="capsule" size=".04" fromto="0 0 0 .3 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""


def _oracle_skin(mjm, mjd):
  scn = mujoco.MjvScene(mjm, maxgeom=32)
  mujoco.mjv_updateScene(mjm, mjd, mujoco.MjvOption(), None,
                         mujoco.MjvCamera(),
                         mujoco.mjtCatBit.mjCAT_ALL, scn)
  return (np.array(scn.skinvert).reshape(-1, 3),
          np.array(scn.skinnormal).reshape(-1, 3))


def test_skin_update_vs_oracle():
  mjm = mujoco.MjModel.from_xml_string(SKIN_XML)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.4, -0.9]              # bent arm
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  vert, normal = jax.jit(lambda dd: skin_update(m, dd))(d)
  overt, onormal = _oracle_skin(mjm, mjd)
  # oracle accumulates in f32
  np.testing.assert_allclose(np.asarray(vert), overt, atol=2e-6)
  np.testing.assert_allclose(np.asarray(normal), onormal, atol=2e-5)


def test_skin_native_compile_parity():
  cm = load_xml(SKIN_XML)
  mjm = mujoco.MjModel.from_xml_string(SKIN_XML)
  assert cm.nskin == mjm.nskin == 1
  for f in ("skin_vertadr", "skin_vertnum", "skin_faceadr", "skin_facenum",
            "skin_boneadr", "skin_bonenum", "skin_bonevertadr",
            "skin_bonevertnum", "skin_bonevertid", "skin_bonebodyid",
            "skin_matid", "skin_group", "skin_face"):
    np.testing.assert_array_equal(np.asarray(getattr(cm, f)).ravel(),
                                  np.asarray(getattr(mjm, f)).ravel(),
                                  err_msg=f)
  for f in ("skin_vert", "skin_bonebindpos", "skin_bonebindquat",
            "skin_bonevertweight", "skin_rgba", "skin_inflate"):
    np.testing.assert_allclose(np.asarray(getattr(cm, f)).ravel(),
                               np.asarray(getattr(mjm, f)).ravel(),
                               atol=1e-6, err_msg=f)
  # the natively compiled model skins identically
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [-0.3, 0.7]
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(cm)
  d = io.make_data(m).replace(qpos=jnp.asarray(mjd.qpos.copy()))
  d = forward.forward(m, d)
  vert, _ = skin_update(m, d)
  overt, _ = _oracle_skin(mjm, mjd)
  np.testing.assert_allclose(np.asarray(vert), overt, atol=2e-6)


def test_skin_batched_and_differentiable():
  mjm = mujoco.MjModel.from_xml_string(SKIN_XML)
  m = io.put_model(mjm)

  def tip_height(q):
    d = io.make_data(m)
    d = d.replace(qpos=q)
    d = forward.forward(m, d)
    vert, _ = skin_update(m, d)
    return vert[:, 2].mean()

  qs = jnp.stack([jnp.array([0.1, -0.4]), jnp.array([0.9, 0.2])])
  hs = jax.vmap(tip_height)(qs)
  assert hs.shape == (2,) and bool(jnp.isfinite(hs).all())
  g = jax.grad(tip_height)(jnp.array([0.3, -0.2]))
  assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 1e-6


def test_ray_skin_vs_oracle():
  """ray_skin vs mju_raySkin (engine_ray.c:1191) on the posed sleeve."""
  from mujoco_tpu.ops.ray import ray_skin
  mjm = mujoco.MjModel.from_xml_string(SKIN_XML)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.3, -0.6]
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m).replace(qpos=jnp.asarray(mjd.qpos.copy()))
  d = forward.forward(m, d)
  vert, _ = skin_update(m, d)
  overt = np.asarray(vert)
  faces = np.asarray(mjm.skin_face[:mjm.skin_facenum[0]], dtype=np.int32)

  def ref_rayskin(pnt, vec):
    # numpy transcription of mju_raySkin's triangle sweep + nearest vertex
    # (the pip binding's array arguments are mistyped as scalars, so the C
    # oracle is not callable from python here)
    best_d, best_vid = -1.0, -1
    for f in faces:
      v0, v1, v2 = overt[f[0]], overt[f[1]], overt[f[2]]
      e1, e2 = v1 - v0, v2 - v0
      h = np.cross(vec, e2)
      a = e1 @ h
      if abs(a) < 1e-12:
        continue
      s = pnt - v0
      u = (s @ h) / a
      q = np.cross(s, e1)
      v = (vec @ q) / a
      t = (e2 @ q) / a
      if u < 0 or v < 0 or u + v > 1 or t < 0:
        continue
      if best_d < 0 or t < best_d:
        best_d = t
        hitp = pnt + t * vec
        dists = [np.linalg.norm(hitp - overt[k]) for k in f]
        best_vid = int(f[int(np.argmin(dists))])
    return best_d, best_vid

  rng = np.random.RandomState(4)
  hits = 0
  for trial in range(30):
    src = np.array([0.2, -1.5, 1.2]) + 0.2 * rng.randn(3)
    tgt = np.array([0.2, 0, 0.95]) + 0.1 * rng.randn(3)
    vec = tgt - src
    vec /= np.linalg.norm(vec)
    dref, vref = ref_rayskin(src, vec)
    dist, vid = ray_skin(m, d, 0, src, vec)
    if dref < 0:
      assert float(dist) < 0, trial
      continue
    hits += 1
    np.testing.assert_allclose(float(dist), dref, atol=1e-10, err_msg=trial)
    assert int(vid) == vref, trial
  assert hits > 5, hits


def test_render_composites_skin_and_flex():
  """Skins and flexes appear in the renderer as extra ray passes with
  their own seg ids."""
  from mujoco_tpu.ops import render
  xml = SKIN_XML.replace(
      "</worldbody>",
      """<flexcomp name="pad" type="grid" dim="2" count="3 3 1"
           spacing="0.15 0.15 0.15" pos="0.2 0.6 1" mass="0.3" rgba="0 0 1 1">
           <contact selfcollide="none"/></flexcomp>
         <camera name="c" pos="0.2 0.3 3" xyaxes="1 0 0 0 1 0"/>
      </worldbody>""")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  rgb, depth, seg = jax.jit(
      lambda dd: render.render(m, dd, 0, 48, 36))(d)
  seg = np.asarray(seg)
  nflex = 1
  assert (seg == m.ngeom + 0).sum() > 3          # flex visible
  assert (seg == m.ngeom + nflex + 0).sum() > 3  # skin visible
  rgb = np.asarray(rgb)
  # flex pixels carry its blue rgba
  fpix = rgb[seg == m.ngeom]
  assert fpix[:, 2].mean() > 0.5 and fpix[:, 0].max() < 0.1
