"""Tactile sensor (mjSENS_TACTILE) differential tests.

vs the reference taxel machinery (engine_sensor.c:80-193 tactile_taxel_batch
+ the mjSENS_TACTILE dispatch, and the analytic SDFs in
engine_collision_sdf.c geomDistance:234)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


PAD = """
<mujoco>
  <option timestep="0.002"/>
  <asset><mesh name="pad" vertex="0 0 0  0.1 0 0  0 0.1 0  0.1 0.1 0
    0 0 0.05  0.1 0 0.05  0 0.1 0.05  0.1 0.1 0.05"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 .1"/>
    <body pos="0 0 0.035" euler="5 3 0"><freejoint/>
      <geom name="padgeom" type="box" size="0.05 0.05 0.04"/>
    </body>
    %s
  </worldbody>
  <sensor><tactile mesh="pad" geom="padgeom"/></sensor>
</mujoco>"""


def _drive(xml, nstep=300):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  worst = 0.0
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    worst = max(worst,
                np.abs(np.asarray(d.sensordata) - mjd.sensordata).max())
  return worst, d, mjd


def test_tactile_floor_penetration():
  """Taxels below the floor report their penetration depth (plane SDF)."""
  worst, d, mjd = _drive(PAD % "")
  assert worst < 1e-12, worst
  assert mjd.sensordata[:8].max() > 1e-3  # settled box penetrates slightly


def test_tactile_sphere_press():
  """A sphere dropping onto the pad registers on the upper taxels
  (sphere SDF + traced contact relevance)."""
  worst, d, mjd = _drive(PAD % (
      '<body pos="0.02 0.01 0.2"><freejoint/>'
      '<geom type="sphere" size="0.04"/></body>'))
  assert worst < 1e-12, worst


def test_tactile_capsule_and_cylinder():
  """Capsule and cylinder SDFs through the same taxel pipeline. The state
  is pinned to the oracle each step (capsule-box contact trajectories hit
  the documented manifold deviation) so only the sensor is compared."""
  xml = PAD % (
      '<body pos="0.02 0 0.2"><freejoint/>'
      '<geom type="capsule" size="0.03" fromto="0 0 0 0.08 0 0"/></body>'
      '<body pos="-0.03 0.02 0.3"><freejoint/>'
      '<geom type="cylinder" size="0.03 0.02"/></body>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  fwd = jax.jit(lambda dd: forward.forward(m, dd))
  worst = 0.0
  for _ in range(350):
    mujoco.mj_step(mjm, mjd)
    mujoco.mj_forward(mjm, mjd)  # refresh sensors at the post-step state
    d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                  qvel=jnp.asarray(mjd.qvel.copy()))
    d = fwd(d)
    worst = max(worst,
                np.abs(np.asarray(d.sensordata) - mjd.sensordata).max())
  assert worst < 1e-12, worst


def test_tactile_zero_without_contact():
  """No contact with the parent weld -> all taxels zero even if another
  geom overlaps the taxel volume without touching the pad body."""
  xml = PAD % ('<body pos="0.5 0 0.2"><freejoint/>'
               '<geom type="sphere" size="0.04"/></body>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  # lift the pad off the floor: no contacts at all
  qpos = np.asarray(d.qpos).copy()
  qpos[2] = 0.5
  d = d.replace(qpos=jnp.asarray(qpos))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.sensordata), 0.0, atol=0)
