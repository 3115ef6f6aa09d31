"""State API / keyframe / name-lookup / support-function tests vs oracle."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, state, support

XML = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <body name="b1" pos="0 0 0.5">
      <freejoint name="root"/>
      <geom name="g1" type="sphere" size="0.1"/>
      <site name="s1" pos="0.05 0 0"/>
      <body name="b2" pos="0.2 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0"/>
        <geom name="g2" type="capsule" size="0.04" fromto="0 0 0 0.2 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor name="mot" joint="hinge"/></actuator>
  <keyframe>
    <key name="k0" time="1.5" qpos="0 0 0.7 1 0 0 0 0.3" qvel="0 0 0 0 0 0 1"
         ctrl="0.5"/>
  </keyframe>
</mujoco>
"""


def test_state_roundtrip():
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = io.put_model(mjm)
  d = io.make_data(m)
  rng = np.random.RandomState(0)
  d = d.replace(qpos=jnp.asarray(mjm.qpos0 + 0.1 * rng.randn(mjm.nq)),
                qvel=jnp.asarray(rng.randn(mjm.nv)),
                ctrl=jnp.asarray(rng.randn(mjm.nu)),
                time=jnp.asarray(3.25))
  spec = int(state.StateBit.INTEGRATION)
  # size matches the oracle
  assert state.state_size(m, spec) == mujoco.mj_stateSize(mjm, spec)
  vec = state.get_state(m, d, spec)
  d2 = state.set_state(m, io.make_data(m), spec, vec)
  np.testing.assert_allclose(np.asarray(d2.qpos), np.asarray(d.qpos))
  np.testing.assert_allclose(np.asarray(d2.qvel), np.asarray(d.qvel))
  np.testing.assert_allclose(np.asarray(d2.ctrl), np.asarray(d.ctrl))
  assert float(d2.time) == float(d.time)

  # component ordering matches the oracle exactly
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = np.asarray(d.qpos)
  mjd.qvel[:] = np.asarray(d.qvel)
  mjd.ctrl[:] = np.asarray(d.ctrl)
  mjd.time = float(d.time)
  ref = np.zeros(mujoco.mj_stateSize(mjm, spec))
  mujoco.mj_getState(mjm, mjd, ref, spec)
  np.testing.assert_allclose(np.asarray(vec), ref, atol=0)


def test_keyframe_reset():
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = io.put_model(mjm)
  d = state.reset_data_keyframe(m, io.make_data(m), 0)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetDataKeyframe(mjm, mjd, 0)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel)
  np.testing.assert_allclose(np.asarray(d.ctrl), mjd.ctrl)
  assert float(d.time) == mjd.time


def test_name_lookup():
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = io.put_model(mjm)
  assert state.name2id(m, "body", "b2") == 2
  assert state.name2id(m, "joint", "hinge") == 1
  assert state.name2id(m, "actuator", "mot") == 0
  assert state.name2id(m, "geom", "nope") == -1
  assert state.id2name(m, "site", 0) == "s1"


def test_support_functions():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(1)
  mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
  mjd.qpos[3:7] /= np.linalg.norm(mjd.qpos[3:7])
  mjd.qvel[:] = rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)

  # mul_m
  vec = rng.randn(mjm.nv)
  ref = np.zeros(mjm.nv)
  mujoco.mj_mulM(mjm, mjd, ref, vec)
  np.testing.assert_allclose(np.asarray(support.mul_m(m, d, jnp.asarray(vec))),
                             ref, atol=1e-10)

  # jac_site
  jacp, jacr = support.jac_site(m, d, 0)
  refp = np.zeros((3, mjm.nv)); refr = np.zeros((3, mjm.nv))
  mujoco.mj_jacSite(mjm, mjd, refp, refr, 0)
  np.testing.assert_allclose(np.asarray(jacp), refp, atol=1e-12)
  np.testing.assert_allclose(np.asarray(jacr), refr, atol=1e-12)

  # jac_subtree_com
  jsub = support.jac_subtree_com(m, d, 1)
  refsub = np.zeros((3, mjm.nv))
  mujoco.mj_jacSubtreeCom(mjm, mjd, refsub, 1)
  np.testing.assert_allclose(np.asarray(jsub), refsub, atol=1e-12)

  # apply_ft
  frc, trq, pnt = rng.randn(3), rng.randn(3), rng.randn(3)
  refq = np.zeros(mjm.nv)
  mujoco.mj_applyFT(mjm, mjd, frc, trq, pnt, 2, refq)
  ours = support.apply_ft(m, d, jnp.asarray(frc), jnp.asarray(trq),
                          jnp.asarray(pnt), 2)
  np.testing.assert_allclose(np.asarray(ours), refq, atol=1e-12)

  # differentiate_pos
  qpos2 = mjd.qpos + 0.02 * rng.randn(mjm.nq)
  qpos2[3:7] /= np.linalg.norm(qpos2[3:7])
  refv = np.zeros(mjm.nv)
  mujoco.mj_differentiatePos(mjm, refv, 0.01, mjd.qpos, qpos2)
  ours = support.differentiate_pos(m, jnp.asarray(mjd.qpos.copy()),
                                   jnp.asarray(qpos2), 0.01)
  np.testing.assert_allclose(np.asarray(ours), refv, atol=1e-9)


def test_domain_randomization():
  """Per-env friction via batched model leaves changes per-env outcomes."""
  from mujoco_tpu.parallel import rollout as par
  from tests import models as zoo_t
  mjm = mujoco.MjModel.from_xml_string(zoo_t.BALLS)
  m = io.put_model(mjm)
  nbatch = 4
  d = par.make_batch(m, nbatch)
  d = d.replace(qvel=d.qvel.at[:, 0].set(1.0))  # slide the ball
  fric = jnp.tile(m.geom_friction[None], (nbatch, 1, 1))
  fric = fric.at[:, :, 0].mul(jnp.array([0.1, 0.5, 1.0, 2.0])[:, None])
  bm, axes = par.randomize_model(m, {"geom_friction": fric})
  step = jax.jit(lambda mm, dd: par.step_randomized(mm, axes, dd))
  for _ in range(150):
    d = step(bm, d)
  x = np.asarray(d.qpos[:, 0])
  # lower friction → slides farther; strictly decreasing distance
  assert x[0] > x[1] > x[2], x


def test_check_reset():
  from mujoco_tpu.parallel import rollout as par
  from tests import models as zoo_t
  mjm = mujoco.MjModel.from_xml_string(zoo_t.PENDULUM)
  m = io.put_model(mjm)
  fresh = par.make_batch(m, 3)
  d = fresh.replace(qpos=fresh.qpos.at[1, 0].set(jnp.nan),
                    qvel=fresh.qvel.at[2, 1].set(1e12))
  out = par.check_reset(m, d, fresh)
  assert np.isfinite(np.asarray(out.qpos)).all()
  assert np.abs(np.asarray(out.qvel)).max() < 1e11


def test_get_data_viewer_bridge():
  from tests import models as zoo_t
  mjm = mujoco.MjModel.from_xml_string(zoo_t.PENDULUM)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray([0.3, -0.2]), qvel=jnp.asarray([1.0, 0.5]))
  d = forward.forward(m, d)
  mjd = io.get_data(mjm, d)
  np.testing.assert_allclose(mjd.qpos, np.asarray(d.qpos))
  np.testing.assert_allclose(mjd.xpos, np.asarray(d.xpos), atol=1e-12)


def test_camera_name_lookup():
  """Cameras are in the name tables (mjOBJ_CAMERA, ADVICE r1)."""
  xml = """
<mujoco>
  <worldbody>
    <camera name="track_cam" pos="0 -2 1"/>
    <body><joint type="hinge"/><geom size="0.1"/>
      <camera name="body_cam" pos="0 0 0.5"/>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  assert state.name2id(m, "camera", "track_cam") == 0
  assert state.name2id(m, "camera", "body_cam") == 1
  assert state.name2id(m, "camera", "nope") == -1
  assert state.id2name(m, "camera", 1) == "body_cam"


def test_ray_geomgroup_filter():
  """mj_ray's geomgroup filter: geoms in disabled groups are skipped."""
  xml = """
<mujoco>
  <worldbody>
    <geom name="g0" type="sphere" size="0.1" pos="0 0 1" group="0"/>
    <geom name="g1" type="sphere" size="0.1" pos="0 0 2" group="1"/>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  from mujoco_tpu.ops import forward as fwd_mod, ray as ray_mod
  d = fwd_mod.forward(m, d)
  pnt = jnp.array([0.0, 0.0, 3.0])
  vec = jnp.array([0.0, 0.0, -1.0])
  # no filter: nearest is g1 (top sphere)
  dist, gid = ray_mod.ray(m, d, pnt, vec)
  assert int(gid) == 1
  # group 1 disabled: g0 is hit instead
  dist0, gid0 = ray_mod.ray(m, d, pnt, vec, geomgroup=[1, 0, 1, 1, 1, 1])
  assert int(gid0) == 0
  np.testing.assert_allclose(float(dist0), 1.9, atol=1e-6)

  # oracle cross-check
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  geomid = np.zeros(1, dtype=np.int32)
  dref = mujoco.mj_ray(mjm, mjd, np.array([0.0, 0, 3.0]),
                       np.array([0.0, 0, -1.0]),
                       np.array([1, 0, 1, 1, 1, 1], dtype=np.uint8), 1, -1,
                       geomid)
  assert geomid[0] == 0
  np.testing.assert_allclose(float(dist0), dref, atol=1e-6)


def test_ray_mesh_hfield():
  """mj_ray vs mesh (Möller-Trumbore all-triangle) and hfield (grid
  triangles + base prism), oracle-exact on random rays (engine_ray.c:952,
  :562)."""
  xml = """
<mujoco>
  <asset>
    <mesh name="tet" vertex="0 0 0  0.2 0 0  0 0.2 0  0 0 0.25  0.2 0.2 0.22"/>
    <hfield name="hf" nrow="8" ncol="8" size="1 1 0.3 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="hf" pos="0 0 0" contype="2" conaffinity="2"/>
    <body pos="0.3 0.2 0.8"><joint type="hinge"/>
      <geom type="mesh" mesh="tet" contype="1" conaffinity="1"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  rng = np.random.RandomState(0)
  mjm.hfield_data[:] = rng.rand(64).astype(np.float32)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  from mujoco_tpu.ops import forward as fwd_mod, ray as ray_mod
  d = fwd_mod.forward(m, d)
  for i in range(25):
    pnt = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 1.5])
    vec = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.4, 0.4), -1.0])
    vec /= np.linalg.norm(vec)
    geomid = np.zeros(1, dtype=np.int32)
    dref = mujoco.mj_ray(mjm, mjd, pnt, vec, None, 1, -1, geomid)
    dd, gid = ray_mod.ray(m, d, jnp.asarray(pnt), jnp.asarray(vec))
    assert int(gid) == geomid[0], f"ray {i}: geom {int(gid)} vs {geomid[0]}"
    np.testing.assert_allclose(float(dd), dref, atol=1e-6,
                               err_msg=f"ray {i} distance")
