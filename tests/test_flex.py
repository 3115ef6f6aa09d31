"""Differential tests: flex (deformable) bodies vs the C oracle.

Covers the mj_flex pipeline (engine_core_smooth.c:548), mjEQ_FLEX equality
rows (engine_core_constraint.c:982), flex edge spring-dampers
(engine_passive.c:760), and geom-vs-element contacts
(mj_collidePlaneFlex / mjraw_{Sphere,Capsule,Box}Triangle) including the
hammock driver-benchmark config (BASELINE.json configs[3]).
"""

import os

os.environ.setdefault("MJTPU_FLEX_BUDGET", "32")

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def _cloth_xml(body="", pins="0 4 20 24", edge='<edge equality="true" solref="0.004 1"/>'):
  pin = f'<pin id="{pins}"/>' if pins else ""
  return f"""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1" pos="0 0 -0.5"/>
    <flexcomp name="cloth" type="grid" count="5 5 1" spacing="0.1 0.1 0.1"
              radius="0.02" dim="2" mass="0.4" pos="0 0 0.35">
      {pin}
      {edge}
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
    {body}
  </worldbody>
</mujoco>"""


def test_flex_kinematics_and_equality():
  """flexvert positions, edge lengths/Jacobians, and mjEQ_FLEX rows →
  qacc, all oracle-exact at f64."""
  mjm = mujoco.MjModel.from_xml_string(_cloth_xml())
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qvel[:] = 0.2 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.flexvert_xpos), mjd.flexvert_xpos,
                             atol=1e-14, err_msg="flexvert_xpos")
  np.testing.assert_allclose(np.asarray(d.flexedge_length),
                             mjd.flexedge_length, atol=1e-14)
  # dense-reconstruct the oracle's sparse edge Jacobian
  Jref = np.zeros((mjm.nflexedge, mjm.nv))
  for e in range(mjm.nflexedge):
    adr = mjm.flexedge_J_rowadr[e]
    for k in range(mjm.flexedge_J_rownnz[e]):
      Jref[e, mjm.flexedge_J_colind[adr + k]] = mjd.flexedge_J[adr + k]
  np.testing.assert_allclose(np.asarray(d.flexedge_J), Jref, atol=1e-12,
                             err_msg="flexedge_J")
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8,
                             err_msg="qacc with flex equality")


@pytest.mark.parametrize("name,body", [
    ("sphere", '<body pos="0.05 0.03 0.7"><freejoint/>'
               '<geom type="sphere" size="0.06" mass="0.2"/></body>'),
    ("capsule", '<body pos="-0.12 -0.1 0.85"><freejoint/>'
                '<geom type="capsule" size="0.035" fromto="-0.08 0 0 0.08 0 0"'
                ' mass="0.15"/></body>'),
    ("box", '<body pos="0.1 -0.12 1.0"><freejoint/>'
            '<geom type="box" size="0.05 0.04 0.03" mass="0.15"/></body>'),
])
def test_flex_contact_trajectory(name, body):
  """Body dropped on a pinned cloth: full 600-step trajectory parity
  through geom-vs-element contacts."""
  mjm = mujoco.MjModel.from_xml_string(_cloth_xml(body=body))
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  maxcon = 0
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    maxcon = max(maxcon, mjd.ncon)
  assert maxcon > 0, "scene produced no contacts — not a contact test"
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-7,
                             err_msg=f"{name}-on-cloth qpos drift")


def test_flex_plane_drop():
  """Unpinned cloth dropped on the floor plane: plane-vertex contacts
  (mj_collidePlaneFlex)."""
  xml = _cloth_xml(pins="").replace('pos="0 0 0.35"',
                                    'pos="0 0 0.3" euler="12 7 0"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  maxcon = 0
  for _ in range(700):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    maxcon = max(maxcon, mjd.ncon)
  assert maxcon >= 10
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9,
                             err_msg="cloth-on-plane qpos drift")


@pytest.mark.parametrize("condim", [4, 6])
def test_flex_plane_condim_friction(condim):
  """Flex contacts with torsional (condim 4) and rolling (condim 6)
  friction: the weighted-body rotational Jacobian rows
  (engine_core_constraint.c:1611,1747-1756). 500-step trajectory parity."""
  xml = f"""
<mujoco>
  <worldbody>
    <geom type="plane" size="2 2 .1" condim="{condim}" friction="1 .08 .02"/>
    <flexcomp name="cloth" type="grid" count="5 5 1" spacing="0.1 0.1 0.1"
              pos="0 0 0.3" euler="12 7 0" radius="0.01" mass="0.5">
      <contact condim="{condim}" friction="1 .08 .02"
               solimp="0.9 0.95 0.001" solref="0.02 1"/>
      <edge equality="true" solref="0.004 1"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  maxcon = 0
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    maxcon = max(maxcon, mjd.ncon)
  assert maxcon >= 10, maxcon
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9,
                             err_msg=f"flex condim={condim} qpos drift")


def test_flex_cable_edge_springs():
  """Dim-1 cable with edge stiffness/damping (no equality): flex edge
  spring-damper passive forces."""
  xml = """
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <flexcomp name="cable" type="grid" count="8 1 1" spacing="0.08 0.08 0.08"
              radius="0.01" dim="1" mass="0.2" pos="0 0 0.6">
      <pin id="0"/>
      <edge equality="false" stiffness="60" damping="0.5"/>
      <contact contype="0" conaffinity="0" selfcollide="none"
               internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive), mjd.qfrc_passive,
                             atol=1e-12, err_msg="flex edge spring-damper")
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_hammock():
  """The hammock driver-benchmark config (humanoid on a pinned flex grid,
  CG solver): model bridges, steps, and tracks the oracle. CG sweep-order
  differences bound the tolerance (solver converges to 1e-6)."""
  path = "/root/reference/model/hammock/hammock.xml"
  if not os.path.exists(path):
    pytest.skip("reference hammock model not available")
  mjm = mujoco.MjModel.from_xml_path(path)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.flexvert_xpos), mjd.flexvert_xpos,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-5,
                             err_msg="hammock initial qacc")
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-4,
                             err_msg="hammock qpos drift (CG)")


def test_rope_on_floor_dim1():
  """dim-1 (cable) flex: plane-vertex contacts + edge equality, rope
  settles on the floor oracle-exactly."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <flexcomp name="rope" type="grid" count="4 1 1" spacing="0.1 0.1 0.1"
              pos="0 0 0.15" dim="1" mass="0.4" radius="0.02">
      <edge equality="true"/>
      <contact selfcollide="none"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)
  assert mjd.ncon > 0


def test_sphere_capsule_on_pinned_rope_dim1():
  """Sphere and capsule geoms resting on a pinned rope: segment colliders
  (sphere_segment / capsule_segment) vs the oracle."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <flexcomp name="rope" type="grid" count="6 1 1" spacing="0.1 0.1 0.1"
              pos="0 0 0.15" dim="1" mass="0.6" radius="0.02">
      <edge equality="true"/>
      <pin id="0 5"/>
      <contact selfcollide="none"/>
    </flexcomp>
    <body pos="-0.1 0 0.35"><freejoint/><geom type="sphere" size="0.05"/></body>
    <body pos="0.15 0 0.45"><freejoint/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.1 0 0"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(350):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)


def test_native_compiled_rope_matches_bridged():
  """dim-1 flexcomp through the native compiler: field-exact + identical
  trajectory vs the pip-bridged model."""
  from mujoco_tpu.compiler import load_xml
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <flexcomp name="rope" type="grid" count="5 1 1" spacing="0.08 0.08 0.08"
              pos="0 0 0.2" dim="1" mass="0.5" radius="0.015">
      <edge equality="true"/>
      <contact selfcollide="none"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  for f in ("flex_dim", "flex_elem", "flex_edge", "flex_vertbodyid",
            "flexedge_length0", "flexedge_invweight0"):
    np.testing.assert_allclose(
        np.asarray(getattr(cm, f), dtype=np.float64),
        np.asarray(getattr(mjm, f), dtype=np.float64).reshape(
            np.asarray(getattr(cm, f)).shape), atol=1e-8, err_msg=f)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


# ----------------------------------------------------------------------------
# element elasticity: stretch + bending (mj_flexPassiveStretch/Bend,
# engine_passive.c:459-651)
# ----------------------------------------------------------------------------

def _forward_pair(xml, seed=0, qpos_scale=0.01, qvel_scale=0.1):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjd.qpos + qpos_scale * rng.randn(mjm.nq)
  mjd.qvel[:] = qvel_scale * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  return mjm, mjd, m, d


def test_flex_elasticity_cloth_bend_stretch():
  """Cloth with Young/Poisson stretch metric + thin-plate bending:
  qfrc_spring/qfrc_damper oracle-exact."""
  xml = """
<mujoco>
  <worldbody>
    <flexcomp type="grid" count="5 5 1" spacing=".1 .1 .1" name="cloth"
              dim="2" mass="1" pos="0 0 1">
      <elasticity young="1e4" poisson="0.3" thickness="1e-2"
                  elastic2d="both" damping="0.02"/>
      <edge equality="false"/>
      <contact selfcollide="none" contype="0" conaffinity="0"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  _, mjd, _, d = _forward_pair(xml)
  assert np.abs(mjd.qfrc_spring).max() > 0.5
  np.testing.assert_allclose(np.asarray(d.qfrc_spring), mjd.qfrc_spring,
                             atol=1e-11, err_msg="bend+stretch spring")
  np.testing.assert_allclose(np.asarray(d.qfrc_damper), mjd.qfrc_damper,
                             atol=1e-13, err_msg="bend damper")


def test_flex_elasticity_pinned_stretch():
  """Pinned cloth, stretch only: pinned vertices route through the point
  Jacobian (mj_applyFT) path."""
  xml = """
<mujoco>
  <worldbody>
    <flexcomp type="grid" count="5 5 1" spacing=".1 .1 .1" name="cloth"
              dim="2" mass="1" pos="0 0 1">
      <elasticity young="1e4" poisson="0.3" thickness="1e-2"
                  elastic2d="stretch" damping="0.02"/>
      <edge equality="false"/>
      <contact selfcollide="none" contype="0" conaffinity="0"/>
      <pin id="0 4"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  _, mjd, _, d = _forward_pair(xml)
  np.testing.assert_allclose(np.asarray(d.qfrc_spring), mjd.qfrc_spring,
                             atol=1e-11)


def test_flex_elasticity_solid():
  """Dim-3 (solid) flex: tetrahedral stretch metric oracle-exact, and a
  gravity-sag trajectory tracks the oracle."""
  xml = """
<mujoco>
  <option timestep="0.001"/>
  <worldbody>
    <flexcomp type="grid" count="3 3 3" spacing=".1 .1 .1" name="gel"
              dim="3" mass="5" pos="0 0 1">
      <elasticity young="1e4" poisson="0.25" damping="0.001"/>
      <edge equality="false" damping="1"/>
      <contact selfcollide="none" contype="0" conaffinity="0"/>
      <pin id="0 2 6 8"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm, mjd, m, d = _forward_pair(xml, qpos_scale=0.002, qvel_scale=0.02)
  np.testing.assert_allclose(np.asarray(d.qfrc_spring), mjd.qfrc_spring,
                             atol=1e-10, err_msg="solid stretch spring")
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(mjd.qpos).all()
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8,
                             err_msg="solid flex sag trajectory")


def test_flex_elasticity_solid_on_moving_body():
  """Dim-3 flex pinned to a moving free body: pinned-vertex forces reach
  the parent's dofs through the point Jacobian."""
  xml = """
<mujoco>
  <worldbody>
    <body pos="0 0 1" name="base">
      <joint type="free"/>
      <geom type="box" size=".2 .2 .02" mass="1"/>
      <flexcomp type="grid" count="4 4 4" spacing=".06 .06 .06" name="gel2"
                dim="3" mass="1" pos="0 0 .3">
        <elasticity young="2e3" poisson="0.4" damping="0.01"/>
        <edge equality="false"/>
        <contact selfcollide="none" contype="0" conaffinity="0"/>
        <pin id="0 3 12 15"/>
      </flexcomp>
    </body>
  </worldbody>
</mujoco>"""
  _, mjd, _, d = _forward_pair(xml)
  np.testing.assert_allclose(np.asarray(d.qfrc_spring), mjd.qfrc_spring,
                             atol=1e-10)


def test_flex_solid_plane_drop():
  """Gel cube (dim-3) dropped on the floor plane: vertex-plane contacts are
  oracle-exact (mj_collidePlaneFlex covers all dims)."""
  xml = """
<mujoco>
  <option timestep="0.001" solver="Newton"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <flexcomp type="grid" count="3 3 3" spacing=".08 .08 .08" name="gel"
              dim="3" mass="2" pos="0 0 0.25" radius="0.005">
      <elasticity young="2e3" poisson="0.2" damping="0.002"/>
      <edge equality="false" damping="1"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  maxcon = 0
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    maxcon = max(maxcon, mjd.ncon)
  assert maxcon >= 9
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10,
                             err_msg="gel-on-plane qpos drift")


def test_flex_solid_sphere_press():
  """Sphere dropped onto a gel block: tetrahedral surface-element contacts
  (our 4-face triangle sampling vs the oracle's per-element GJK — contact
  positions differ within an element, rest physics must agree)."""
  xml = """
<mujoco>
  <option timestep="0.001" solver="Newton"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <flexcomp type="grid" count="3 3 3" spacing=".08 .08 .08" name="gel"
              dim="3" mass="2" pos="0 0 0.13" radius="0.005">
      <elasticity young="5e3" poisson="0.2" damping="0.002"/>
      <edge equality="false" damping="1"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
    <body pos="0.01 0.0 0.3"><freejoint/>
      <geom type="sphere" size="0.05" mass="0.3"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(800):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  # sphere comes to rest pressed into the gel at the same height
  z_ours = float(np.asarray(d.geom_xpos)[1, 2])
  z_ref = float(mjd.geom_xpos[1, 2])
  assert abs(z_ours - z_ref) < 2e-3, (z_ours, z_ref)
  # gel stays coherent: vertex heights within the oracle envelope
  assert abs(float(np.asarray(d.flexvert_xpos)[:, 2].max())
             - mjd.flexvert_xpos[:, 2].max()) < 5e-3


def test_ray_flex_vs_oracle():
  """ray_flex vs mj_rayFlex (engine_ray.c:1002): distances and nearest
  vertex ids over a fan of rays, cloth (dim 2) and solid (dim 3)."""
  from mujoco_tpu.ops.ray import ray_flex
  xml = """
<mujoco>
  <worldbody>
    <geom type="plane" size="4 4 .1"/>
    <flexcomp name="cloth" type="grid" dim="2" count="4 4 1"
              spacing="0.1 0.1 0.1" pos="0 0 0.4" mass="0.5" radius="0.01">
      <contact selfcollide="none"/>
    </flexcomp>
    <flexcomp name="jelly" type="grid" dim="3" count="3 3 3"
              spacing="0.1 0.1 0.1" pos="1 0 0.4" mass="0.5" radius="0.008">
      <contact selfcollide="none"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = forward.forward(m, io.make_data(m))
  rng = np.random.RandomState(0)
  vertid = np.zeros(1, dtype=np.int32)
  normal = np.zeros(3)
  for f, center in ((0, [0, 0, 0.4]), (1, [1, 0, 0.4])):
    hits = 0
    for trial in range(40):
      src = np.array(center) + np.array([0, 0, 2.0]) + 0.3 * rng.randn(3)
      tgt = np.array(center) + 0.12 * rng.randn(3)
      vec = tgt - src
      vec /= np.linalg.norm(vec)
      dref = mujoco.mj_rayFlex(mjm, mjd, 0, 0, 1, 1, 1, f,
                               src, vec, vertid)
      dist, vid = ray_flex(m, d, f, src, vec)
      dist = float(dist)
      if dref < 0:
        assert dist < 0, (f, trial, dist, dref)
        continue
      hits += 1
      np.testing.assert_allclose(dist, dref, atol=1e-9,
                                 err_msg=f"flex {f} trial {trial}")
      assert int(vid) == int(vertid[0]), (f, trial, int(vid), vertid[0])
    assert hits > 10, (f, hits)


def test_trilinear_interp_flex_vs_oracle():
  """Order-1 interpolated (trilinear) flex: 27 vertices blended from 8
  corner node bodies (flex_interp == 1, engine_core_smooth.c:580-625), with
  contact forces chained to the node dofs through the trilinear basis
  (engine_core_constraint.c:270-360). A gel block dropped on the plane
  tracks the oracle trajectory; FLEXSTRAIN elasticity is a documented gap
  (no <elasticity> here, so the oracle model has none either)."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="4 4 .1"/>
    <flexcomp name="gel" type="grid" dim="3" count="3 3 3"
              spacing="0.1 0.1 0.1" pos="0 0 0.25" mass="1" dof="trilinear">
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)

  # kinematics parity at a perturbed pose
  rng = np.random.RandomState(0)
  q = mjd.qpos.copy() + 0.03 * rng.randn(mjm.nq)
  mjd.qpos[:] = q
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(qpos=jnp.asarray(q))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.flexvert_xpos),
                             mjd.flexvert_xpos, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-6,
                             rtol=1e-6)

  # trajectory: drop onto the plane (contact forces reach the node dofs)
  mjd2 = mujoco.MjData(mjm)
  d2 = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(300):
    mujoco.mj_step(mjm, mjd2)
    d2 = step(d2)
  assert (np.asarray(d2.flexvert_xpos)[:, 2] > -0.01).all()  # resting
  np.testing.assert_allclose(np.asarray(d2.qpos), mjd2.qpos, atol=1e-7)


def test_quadratic_interp_flex_vs_oracle(monkeypatch):
  """Order-2 (quadratic) interpolated flex: 27-node Lagrange basis
  (mju_flexPhi order 2, engine_util_misc.h:130). Same gel-drop protocol as
  the trilinear test. The squishing 5x5x5 gel peaks at 50 simultaneous
  plane contacts, above the suite's default 32-slot flex budget."""
  monkeypatch.setenv("MJTPU_FLEX_BUDGET", "96")
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="4 4 .1"/>
    <flexcomp name="gel" type="grid" dim="3" count="5 5 5"
              spacing="0.05 0.05 0.05" pos="0 0 0.2" mass="1"
              dof="quadratic">
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)

  rng = np.random.RandomState(1)
  q = mjd.qpos.copy() + 0.02 * rng.randn(mjm.nq)
  mjd.qpos[:] = q
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(qpos=jnp.asarray(q))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.flexvert_xpos),
                             mjd.flexvert_xpos, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-6,
                             rtol=1e-6)

  mjd2 = mujoco.MjData(mjm)
  d2 = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(200):
    mujoco.mj_step(mjm, mjd2)
    d2 = step(d2)
  np.testing.assert_allclose(np.asarray(d2.qpos), mjd2.qpos, atol=1e-7)


@pytest.mark.parametrize(
    "dof,count,young,dt,integ,damping",
    [("trilinear", 3, 2e4, 0.002, "Euler", 0.01),
     # pip 3.10's quadratic FEM is only conditionally stable: soft modulus
     # + implicitfast keeps BOTH engines finite (the oracle auto-resets on
     # blowup otherwise)
     ("quadratic", 5, 100.0, 0.0002, "implicitfast", 0.05)])
def test_interp_flex_fem_elasticity(monkeypatch, dof, count, young, dt,
                                    integ, damping):
  """Corotational FEM passive forces for interpolated flexes
  (mj_flexPassiveInterp, engine_passive.c:61): per-cell rotation from the
  deformation gradient, raw -K_physical stiffness on corotated
  displacements, damping via K·v scaled by flex_damping. Force parity at a
  perturbed pose and a full bounce trajectory."""
  monkeypatch.setenv("MJTPU_FLEX_BUDGET", "96")
  xml = f"""
<mujoco>
  <option timestep="{dt}" integrator="{integ}"/>
  <worldbody>
    <geom type="plane" size="4 4 .1"/>
    <flexcomp name="gel" type="grid" dim="3" count="{count} {count} {count}"
              spacing="{0.3 / (count - 1)} {0.3 / (count - 1)}
                       {0.3 / (count - 1)}"
              pos="0 0 0.25" mass="1" dof="{dof}">
      <elasticity young="{young}" poisson="0.2" damping="{damping}"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  q = mjd.qpos.copy() + 0.02 * rng.randn(mjm.nq)
  v = 0.1 * rng.randn(mjm.nv)
  mjd.qpos[:] = q
  mjd.qvel[:] = v
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m).replace(qpos=jnp.asarray(q), qvel=jnp.asarray(v))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  np.testing.assert_allclose(np.asarray(d.qfrc_spring), mjd.qfrc_spring,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qfrc_damper), mjd.qfrc_damper,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8,
                             rtol=1e-8)

  # gel dropped on the plane: bounces, holds shape, trajectories track.
  # The quadratic variant runs undamped: our implicitfast includes the
  # 3.11 FEM-damper derivative (mjd_flexInterp_kernel) that the pip 3.10
  # oracle predates, so damped implicit trajectories diverge by design.
  if integ == "implicitfast":
    xml2 = xml.replace(f'damping="{damping}"', 'damping="0"')
    mjm = mujoco.MjModel.from_xml_string(xml2)
    m = io.put_model(mjm)
    step = None
  mjd2 = mujoco.MjData(mjm)
  d2 = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(400):
    mujoco.mj_step(mjm, mjd2)
    d2 = step(d2)
  assert mjd2.time >= 400 * dt - 1e-9     # the oracle did not auto-reset
  np.testing.assert_allclose(np.asarray(d2.qpos), mjd2.qpos, atol=2e-6)
  # elasticity held the shape: node z-displacements (slide dofs) are nearly
  # uniform — a collapsed block would drop its top layer much further
  zs = np.asarray(d2.qpos).reshape(-1, 3)[:, 2]
  assert np.ptp(zs) < 0.06, zs
