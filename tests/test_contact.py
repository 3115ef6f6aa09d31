"""Differential tests for collision, constraints, and the Newton solver.

Strategy (SURVEY.md §4): state-matched single-step comparison — put the
oracle's exact state into our engine, run forward, compare qacc — plus
trajectory tracking on contact-rich scenes.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

from tests import models as zoo

LIMITS_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-0.4 0.5"
             limited="true" damping="0.02"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="slide" axis="1 0 0" range="-0.1 0.15"
               limited="true" frictionloss="0.3"/>
        <geom type="sphere" size="0.05" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

EQUALITY_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
    </body>
    <body name="b" pos="0.4 0 1.3">
      <joint name="j2" type="hinge" axis="0 1 0"/>
      <joint name="j3" type="slide" axis="0 0 1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
    </body>
  </worldbody>
  <equality>
    <connect body1="a" body2="b" anchor="0.4 0 0"/>
    <joint joint1="j2" joint2="j1" polycoef="0 0.5 0.1 0 0"/>
  </equality>
</mujoco>
"""


def _sync_and_compare(xml, nsteps, check_steps, atol, ctrl_fn=None,
                      qacc_atol=None):
  """Run the oracle; at chosen steps, copy its state in and compare qacc."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d0 = io.make_data(m)
  fwd = jax.jit(lambda d: forward.forward(m, d))

  for t in range(nsteps):
    if ctrl_fn is not None:
      mjd.ctrl[:] = ctrl_fn(t)
    mujoco.mj_step(mjm, mjd)
    if t in check_steps:
      mujoco.mj_forward(mjm, mjd)
      d = d0.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                     qvel=jnp.asarray(mjd.qvel.copy()),
                     act=jnp.asarray(mjd.act.copy()),
                     ctrl=jnp.asarray(mjd.ctrl.copy()),
                     qacc_warmstart=jnp.asarray(mjd.qacc_warmstart.copy()))
      d = fwd(d)
      np.testing.assert_allclose(
          np.asarray(d.qacc), mjd.qacc, atol=qacc_atol or atol,
          err_msg=f"qacc mismatch at step {t}")
      np.testing.assert_allclose(
          np.asarray(d.qfrc_constraint), mjd.qfrc_constraint,
          atol=(qacc_atol or atol) * 10,
          err_msg=f"qfrc_constraint mismatch at step {t}")


def test_contact_qacc():
  _sync_and_compare(zoo.BALLS, 200, {5, 30, 80, 150, 199}, atol=1e-6)


def test_contact_trajectory():
  mjm = mujoco.MjModel.from_xml_string(zoo.BALLS)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda d: forward.step(m, d))
  for t in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-4)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-3)


def test_contact_dist_matches():
  """Contact geometry: active contacts agree with the oracle's."""
  mjm = mujoco.MjModel.from_xml_string(zoo.BALLS)
  mjd = mujoco.MjData(mjm)
  for _ in range(120):  # let things settle on the floor
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m).replace(qpos=jnp.asarray(mjd.qpos.copy()),
                              qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.fwd_position(m, d)

  oracle = {}
  for i in range(mjd.ncon):
    c = mjd.contact[i]
    key = (min(c.geom1, c.geom2), max(c.geom1, c.geom2))
    oracle.setdefault(key, []).append((c.dist, c.pos.copy()))

  mine = {}
  dist = np.asarray(d.contact.dist)
  pos = np.asarray(d.contact.pos)
  im = np.asarray(d.contact.includemargin)
  for s in range(m.con.ncon):
    if dist[s] < im[s]:
      key = (int(min(m.con.geom1[s], m.con.geom2[s])),
             int(max(m.con.geom1[s], m.con.geom2[s])))
      mine.setdefault(key, []).append((dist[s], pos[s]))

  assert set(oracle) == set(mine), (oracle.keys(), mine.keys())
  for key in oracle:
    od = sorted(x[0] for x in oracle[key])
    md = sorted(x[0] for x in mine[key])
    assert len(od) == len(md), f"{key}: {od} vs {md}"
    np.testing.assert_allclose(md, od, atol=1e-10)


def test_limits_friction_qacc():
  _sync_and_compare(LIMITS_XML, 300, {10, 60, 150, 290}, atol=1e-6)


def test_equality_qacc():
  _sync_and_compare(EQUALITY_XML, 200, {2, 40, 120, 199}, atol=1e-6)


def test_elliptic_cone_qacc():
  xml = zoo.BALLS.replace("<option ", '<option cone="elliptic" ')
  _sync_and_compare(xml, 200, {5, 30, 80, 150}, atol=1e-5)
