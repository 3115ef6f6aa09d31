"""Contact sensors (mjSENS_CONTACT): matching, reduction, data packing.

Differential tests vs the reference engine (engine_sensor.c:1027-1155,
matchContact:339, copySensorData:398, total_wrench:442).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def _run(xml, nstep=150, seed=3, qvel_scale=0.3):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qvel[:] = qvel_scale * rng.randn(mjm.nv)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  worst = 0.0
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    worst = max(worst,
                np.abs(np.asarray(d.sensordata) - mjd.sensordata).max())
  return worst, d, mjd


SCENE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 0.1"/>
    <body name="b1" pos="0 0 0.08">
      <freejoint/>
      <geom name="g1" type="sphere" size="0.1"/>
      <body name="b2" pos="0.35 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.1"/>
        <geom name="g2" type="sphere" size="0.09"/>
      </body>
    </body>
    <site name="zone" type="sphere" size="0.3" pos="0 0 0"/>
  </worldbody>
  <sensor>%s</sensor>
</mujoco>"""


def test_all_fields_reduce_none():
  """Every condata field through a single-geom match (one contact, so slot
  order is unambiguous)."""
  worst, _, _ = _run(SCENE % (
      '<contact geom1="g1" data="found force torque dist pos normal tangent"'
      ' num="2" reduce="none"/>'))
  assert worst < 1e-6, worst


def test_reduce_mindist_and_maxforce():
  worst, _, _ = _run(SCENE % (
      '<contact geom1="g1" geom2="floor" data="force dist" num="1"'
      ' reduce="mindist"/>'
      '<contact body1="b1" data="found force" num="2" reduce="maxforce"/>'))
  assert worst < 1e-6, worst


def test_reduce_netforce_subtree():
  """Net wrench about the force centroid over all subtree contacts
  (total_wrench, engine_sensor.c:442)."""
  worst, _, _ = _run(SCENE % (
      '<contact subtree1="b1" data="found force torque pos"'
      ' reduce="netforce"/>'))
  assert worst < 1e-6, worst


def test_site_zone_match():
  """site= matching filters contacts by position inside the site volume
  (mju_insideGeom filter, engine_sensor.c:347)."""
  worst, _, _ = _run(SCENE % (
      '<contact site="zone" data="found dist" num="2" reduce="mindist"/>'))
  assert worst < 1e-6, worst


def test_normal_flip_direction():
  """With obj2-only or reversed-order specs the reported normal/force flips
  (matchContact sign, engine_sensor.c:375-390)."""
  worst, d, mjd = _run(SCENE % (
      '<contact geom1="floor" geom2="g2" data="force normal"/>'
      '<contact geom2="g1" data="found normal" num="1" reduce="mindist"/>'))
  assert worst < 1e-6, worst


def test_found_counts_all_matches():
  """found reports the total number of matching contacts even when only
  num slots are exported."""
  xml = SCENE % ('<contact body1="b1" data="found" num="1"'
                 ' reduce="mindist"/>')
  worst, d, mjd = _run(xml, nstep=200)
  assert worst < 1e-6, worst
  # at rest both spheres touch the floor plus the inter-body contact region
  assert mjd.sensordata[0] >= 1
