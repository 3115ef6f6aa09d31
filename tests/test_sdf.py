"""Differential tests: SDF collision narrowphase vs the oracle.

Covers mjc_SDF (multi-start gradient descent on the combined SDF objective,
engine_collision_sdf.c:1040), stepGradient's backtracking line search
(:615), the COLLISION/INTERSECTION/MIDSURFACE objectives (:417), and the
plugin SDF shapes (plugin/sdf/{torus,bowl,nut,bolt}.cc).

Pairs where both engines run mjc_SDF (prim-vs-SDF, SDF-vs-SDF) are
oracle-exact. Plane-vs-SDF is a documented deviation: the reference collides
the plugin's marching-cubes mesh via mjc_PlaneConvex; we collide the analytic
SDF (resting heights agree to the mesh discretization error).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

_TORUS_EXT = """
  <extension>
    <plugin plugin="mujoco.sdf.torus">
      <instance name="torus">
        <config key="radius1" value="0.35"/>
        <config key="radius2" value="0.15"/>
      </instance>
    </plugin>
  </extension>
  <asset><mesh name="torus"><plugin instance="torus"/></mesh></asset>
"""


def _compare(xml, nsteps, every=20, dist_atol=1e-8, qacc_atol=1e-6,
             min_active=1):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d0 = io.make_data(m)
  fwd = jax.jit(lambda dd: forward.forward(m, dd))
  nactive = 0
  for i in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    if i % every == 0:
      mujoco.mj_forward(mjm, mjd)
      d = d0.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                     qvel=jnp.asarray(mjd.qvel.copy()))
      d = fwd(d)
      msk = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
      assert int(msk.sum()) == mjd.ncon, \
          f"step {i}: ncon ours={int(msk.sum())} ref={mjd.ncon}"
      if mjd.ncon:
        nactive += 1
        np.testing.assert_allclose(
            np.sort(np.asarray(d.contact.dist)[msk]),
            np.sort(mjd.contact.dist[:mjd.ncon]), atol=dist_atol)
      np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc,
                                 atol=qacc_atol, err_msg=f"qacc step {i}")
  assert nactive >= min_active, "scene never produced SDF contacts"


def test_sphere_in_torus():
  """Sphere resting in a fixed torus: prim-vs-SDF descent, oracle-exact."""
  _compare(f"""
<mujoco>
  {_TORUS_EXT}
  <option sdf_iterations="10" sdf_initpoints="40"/>
  <worldbody>
    <body pos="0 0 0.5">
      <geom type="sdf" mesh="torus" mass="0.5"><plugin instance="torus"/></geom>
    </body>
    <body pos="0.05 0.02 1.0"><freejoint/>
      <geom type="sphere" size="0.25" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>""", nsteps=300, dist_atol=1e-10, qacc_atol=1e-8)


def test_torus_on_torus():
  """Free torus dropping onto a fixed vertical torus: SDF-vs-SDF descent."""
  _compare(f"""
<mujoco>
  {_TORUS_EXT}
  <option sdf_iterations="10" sdf_initpoints="20"/>
  <worldbody>
    <body pos="0 0 0.5" euler="90 0 0">
      <geom type="sdf" mesh="torus" mass="0.5"><plugin instance="torus"/></geom>
    </body>
    <body pos="0.32 0 1.1"><freejoint/>
      <geom type="sdf" mesh="torus" mass="0.5"><plugin instance="torus"/></geom>
    </body>
  </worldbody>
</mujoco>""", nsteps=300, dist_atol=1e-10, qacc_atol=1e-6)


def test_capsule_in_bowl():
  """Capsule sliding inside a bowl (plugin/sdf/bowl.cc)."""
  _compare("""
<mujoco>
  <extension>
    <plugin plugin="mujoco.sdf.bowl">
      <instance name="bowl">
        <config key="height" value="0.3"/>
        <config key="radius" value="0.5"/>
        <config key="thickness" value="0.03"/>
      </instance>
    </plugin>
  </extension>
  <asset><mesh name="bowl"><plugin instance="bowl"/></mesh></asset>
  <option sdf_iterations="10" sdf_initpoints="20"/>
  <worldbody>
    <body pos="0 0 0.2">
      <geom type="sdf" mesh="bowl" mass="0.5"><plugin instance="bowl"/></geom>
    </body>
    <body pos="0.05 0.02 0.8"><freejoint/>
      <geom type="capsule" size="0.08" fromto="-0.1 0 0 0.1 0 0" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>""", nsteps=300, dist_atol=1e-7, qacc_atol=1e-3)


def test_box_on_nut():
  """Box landing on a nut (threaded SDF, plugin/sdf/nut.cc)."""
  _compare("""
<mujoco>
  <extension>
    <plugin plugin="mujoco.sdf.nut">
      <instance name="nut"><config key="radius" value="0.26"/></instance>
    </plugin>
  </extension>
  <asset><mesh name="nut"><plugin instance="nut"/></mesh></asset>
  <option sdf_iterations="10" sdf_initpoints="20"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" pos="0 0 -1"/>
    <body pos="0 0 0">
      <geom type="sdf" mesh="nut" mass="0.5"><plugin instance="nut"/></geom>
    </body>
    <body pos="0.0 0.1 0.6"><freejoint/>
      <geom type="box" size="0.1 0.1 0.1" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>""", nsteps=300, dist_atol=1e-10, qacc_atol=1e-8)


def test_torus_on_plane_resting_height():
  """Plane-vs-SDF deviation: the oracle collides the marching-cubes mesh,
  we collide the analytic surface — resting heights agree to the mesh
  discretization error, and our contact ring is on the exact surface."""
  xml = f"""
<mujoco>
  {_TORUS_EXT}
  <option sdf_iterations="10" sdf_initpoints="40"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="sdf" mesh="torus" mass="0.5"><plugin instance="torus"/></geom>
    </body>
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
  # analytic resting height is radius2 = 0.15; allow solver compliance and
  # the oracle's mesh discretization
  assert abs(float(d.qpos[2]) - 0.15) < 5e-3, float(d.qpos[2])
  assert abs(mjd.qpos[2] - 0.15) < 5e-3, mjd.qpos[2]


def test_mesh_grid_sdf_accuracy():
  """Dense-grid mesh SDF (ops/sdf.mesh_grid_sdf — the TPU analog of the
  reference's per-mesh octree, user_mesh.cc:488,784): samples of a unit
  cube mesh match the analytic box SDF to grid resolution."""
  v = np.array([[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
                for z in (-0.5, 0.5)])
  f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
  from mujoco_tpu.ops import sdf as sdfmod
  g = sdfmod.mesh_grid_sdf(v, f, res=33)
  fn = sdfmod.dist_fn(sdfmod.MESH_GRID, g)
  pts = jnp.asarray([[0.0, 0, 0], [0.45, 0, 0], [0, 0, 0.55],
                     [0.3, 0.3, 0.3], [-0.2, 0.1, 0.0]])
  got = np.asarray(fn(pts))
  expect = np.array([-0.5, -0.05, 0.05, -0.2, -0.3])
  np.testing.assert_allclose(got, expect, atol=0.04)
  # far-field query outside the padded grid stays a sane lower bound
  far = float(np.asarray(fn(jnp.asarray([[2.0, 0, 0]]))[0]))
  assert far > 1.0, far


def test_sphere_rests_on_mesh_sdf():
  """Mesh-backed SDF geom (type="sdf" with a mesh, no plugin): sphere
  dropped on a cube mesh rests at the analytic height. Spec-only (the pip
  3.10 oracle loads but does not collide octree-less mesh SDFs)."""
  xml = """
<mujoco>
  <asset>
    <mesh name="cube" vertex="-.3 -.3 -.3  .3 -.3 -.3  -.3 .3 -.3  .3 .3 -.3
                              -.3 -.3 .3  .3 -.3 .3  -.3 .3 .3  .3 .3 .3"/>
  </asset>
  <worldbody>
    <geom type="sdf" mesh="cube"/>
    <body pos="0 0 1"><freejoint/><geom type="sphere" size=".1"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  assert len(m.con.sdfgroups) == 1
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(800):
    d = step(d)
  z = float(np.asarray(d.qpos)[2])
  assert 0.36 < z < 0.44, z  # cube top 0.3 + radius 0.1
