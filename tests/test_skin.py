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
