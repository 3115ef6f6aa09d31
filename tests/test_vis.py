"""mjv-lite scene export (mjv_updateScene analog, mujoco_tpu/vis.py).

Checks the scene table against the oracle's own mjv_updateScene output:
model-geom poses match the reference scene's geoms, contact glyphs follow
addContactGeoms' sizing/orientation (engine_vis_visualize.c:607), and the
host bridge writes valid mjvScene entries the reference viewer can draw.
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu import vis
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, render

_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1"/>
    <body pos="0 0 0.3"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06" mass="0.5" rgba="0.8 0.2 0.2 1"/>
    </body>
    <camera name="cam" pos="0.8 0 0.5" xyaxes="0 -1 0 -0.4 0 0.9"/>
  </worldbody>
</mujoco>"""


def _settled():
  mjm = mujoco.MjModel.from_xml_string(_XML)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  mujoco.mj_forward(mjm, mjd)
  return mjm, mjd, m, d


def test_scene_matches_reference_mjv():
  mjm, mjd, m, d = _settled()
  scene = vis.update_scene(m, d, contact_points=True, contact_forces=True)

  # reference scene for comparison
  scn = mujoco.MjvScene(mjm, maxgeom=100)
  opt = mujoco.MjvOption()
  opt.flags[mujoco.mjtVisFlag.mjVIS_CONTACTPOINT] = True
  mujoco.mjv_updateScene(mjm, mjd, opt, None, mujoco.MjvCamera(),
                         mujoco.mjtCatBit.mjCAT_ALL, scn)

  # model-geom slots mirror the oracle's geom entries (pos for each source
  # geom present in the reference scene)
  ref_geoms = {int(scn.geoms[i].objid): np.array(scn.geoms[i].pos)
               for i in range(scn.ngeom)
               if scn.geoms[i].objtype == mujoco.mjtObj.mjOBJ_GEOM}
  for g in range(m.ngeom):
    np.testing.assert_allclose(np.asarray(scene.pos[g]), ref_geoms[g],
                               atol=1e-10)

  # contact glyphs: one active cylinder per oracle contact, sized by
  # vis.scale × stat.meansize, axis along the contact normal
  pt = np.where((scene.category == vis.CAT_CONTACT_POINT)
                & np.asarray(scene.active))[0]
  assert len(pt) == mjd.ncon > 0
  w = mjm.vis.scale.contactwidth * mjm.stat.meansize
  for i, s in enumerate(pt):
    np.testing.assert_allclose(np.asarray(scene.size[s][0]), w, atol=1e-12)
    nrm = np.asarray(scene.mat[s][:, 2])
    ref_n = mjd.contact.frame[i][:3]
    np.testing.assert_allclose(np.abs(np.dot(nrm, ref_n)), 1.0, atol=1e-10)

  # force glyphs exist for active contacts
  fr = np.where((scene.category == vis.CAT_CONTACT_FORCE)
                & np.asarray(scene.active))[0]
  assert len(fr) == mjd.ncon


def test_update_scene_into_viewer_bridge():
  mjm, mjd, m, d = _settled()
  scn = mujoco.MjvScene(mjm, maxgeom=200)
  scn.ngeom = 0
  n = vis.update_scene_into(m, d, scn)
  assert n == scn.ngeom > m.ngeom      # model geoms + contact glyphs
  # entries are drawable: finite pose/size, types valid
  for i in range(scn.ngeom):
    g = scn.geoms[i]
    assert np.all(np.isfinite(np.array(g.pos)))
    assert np.all(np.isfinite(np.array(g.size)))


def test_render_scene_draws_glyphs():
  """Contact glyphs appear in the ray-cast image as contact-point-colored
  pixels that plain render() does not produce."""
  mjm, mjd, m, d = _settled()
  scene = vis.update_scene(m, d, contact_points=True, contact_forces=False)
  rgb0, depth0, _ = render.render(m, d, camid=0, width=48, height=48)
  rgb1, depth1, _ = render.render_scene(m, d, scene, camid=0, width=48,
                                        height=48)
  changed = np.any(np.asarray(rgb0) != np.asarray(rgb1))
  assert changed, "glyphs did not affect the image"
  assert np.all(np.asarray(depth1) <= np.asarray(depth0) + 1e-12)


def test_perturb_force_vs_oracle():
  """apply_perturb_force vs mjv_applyPerturbForce
  (engine_vis_interact.c:717): translate-mode spring + damping force and
  rotate-mode torsional spring on a moving free body."""
  from mujoco_tpu import vis as vis_mod
  xml = """
<mujoco>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.5" euler="15 10 5"><freejoint/>
      <geom type="box" size=".1 .08 .06" mass="0.7"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(2)
  mjd.qvel[:] = 0.4 * rng.randn(6)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)

  pert = mujoco.MjvPerturb()
  pert.select = 1
  pert.active = mujoco.mjtPertBit.mjPERT_TRANSLATE
  pert.localpos = np.array([0.05, 0.02, 0.0])
  pert.refselpos = np.array([0.3, -0.2, 0.8])
  pert.localmass = 0.9
  mujoco.mjv_applyPerturbForce(mjm, mjd, pert)

  d2 = jax.jit(lambda dd: vis_mod.apply_perturb_force(
      m, dd, 1, [0.05, 0.02, 0.0], [0.3, -0.2, 0.8],
      localmass=0.9))(d)
  np.testing.assert_allclose(np.asarray(d2.xfrc_applied)[1],
                             mjd.xfrc_applied[1], atol=1e-9)

  # rotate mode
  pert.active = mujoco.mjtPertBit.mjPERT_ROTATE
  q = np.array([0.9, 0.1, -0.3, 0.2])
  q /= np.linalg.norm(q)
  pert.refquat = q
  mjd.xfrc_applied[:] = 0
  mujoco.mjv_applyPerturbForce(mjm, mjd, pert)
  d3 = jax.jit(lambda dd: vis_mod.apply_perturb_force(
      m, dd, 1, [0, 0, 0], [0, 0, 0], refquat=q, translate=False,
      rotate=True))(d)
  np.testing.assert_allclose(np.asarray(d3.xfrc_applied)[1],
                             mjd.xfrc_applied[1], atol=1e-9)
