"""Multi-point manifolds for general convex (MPR) pairs.

VERDICT r1 item 5: face-face / line-face resting of cylinder- and mesh-pairs
via the MPR path must be stable. The manifold is built by tangential
support-interval clipping (the branchless analog of the reference's multiCCD
polygon clipping, engine_collision_gjk.c:2114); manifold geometry differs
from the reference's clipped polygons, so the criteria are rest stability
and total force, not per-contact parity.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

CUBE = ('<mesh name="cube" vertex="-.05 -.05 -.05  .05 -.05 -.05  '
        '-.05 .05 -.05  .05 .05 -.05  -.05 -.05 .05  .05 -.05 .05  '
        '-.05 .05 .05  .05 .05 .05"/>')


def _rest(xml, nstep=1000):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  return m, d, mjm, mjd


def test_cylinder_rests_on_box():
  """Cylinder on its side on a box slab (MPR cylinder-box, line contact):
  1000 steps without jitter, matching the oracle's rest height."""
  m, d, mjm, mjd = _rest("""
<mujoco><option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom name="slab" type="box" size="1 1 0.1" pos="0 0 0.1"/>
    <body pos="0 0 0.27" euler="90 0 0"><freejoint/>
      <geom type="cylinder" size="0.06 0.15" mass="0.3"/></body>
  </worldbody></mujoco>""")
  q = np.asarray(d.qpos)
  assert np.abs(np.asarray(d.qvel)).max() < 1e-6, "jitter at rest"
  assert abs(q[2] - mjd.qpos[2]) < 2e-3, "rest height vs oracle"
  assert np.abs(q[:2]).max() < 1e-3, "lateral drift"
  # total vertical support ≈ m·g (VERDICT: forces within 5%)
  d = forward.forward(m, d)
  fz = float(np.asarray(d.qfrc_constraint)[2])
  assert abs(fz - 0.3 * 9.81) / (0.3 * 9.81) < 0.05


@pytest.mark.parametrize("ang", [0, 25, 45])
def test_cube_mesh_rests_on_box(ang):
  """Cube mesh dropped on a box slab at several yaw angles (MPR box-mesh,
  face-face contact): settles to the oracle's rest height without jitter."""
  m, d, mjm, mjd = _rest(f"""
<mujoco><option timestep="0.002" solver="Newton"/>
  <asset>{CUBE}</asset>
  <worldbody>
    <geom name="slab" type="box" size="1 1 0.1" pos="0 0 0.1"/>
    <body pos="0 0 0.28" euler="0 0 {ang}"><freejoint/>
      <geom type="mesh" mesh="cube" mass="0.2"/></body>
  </worldbody></mujoco>""")
  q = np.asarray(d.qpos)
  assert np.abs(np.asarray(d.qvel)).max() < 1e-6
  assert abs(q[2] - mjd.qpos[2]) < 2e-3
  assert np.abs(q[:2]).max() < 1e-3


def test_mesh_on_mesh_rest():
  """Cube mesh on a big mesh slab (MPR mesh-mesh): stable stacking."""
  slab = ('<mesh name="slabm" vertex="-.6 -.6 0  .6 -.6 0  -.6 .6 0  '
          '.6 .6 0  -.6 -.6 .2  .6 -.6 .2  -.6 .6 .2  .6 .6 .2"/>')
  m, d, mjm, mjd = _rest(f"""
<mujoco><option timestep="0.002" solver="Newton"/>
  <asset>{CUBE}{slab}</asset>
  <worldbody>
    <geom name="slab" type="mesh" mesh="slabm"/>
    <body pos="0 0 0.27"><freejoint/>
      <geom type="mesh" mesh="cube" mass="0.2"/></body>
  </worldbody></mujoco>""")
  q = np.asarray(d.qpos)
  assert np.abs(np.asarray(d.qvel)).max() < 1e-5
  assert abs(q[2] - 0.25) < 5e-3, "rest height (slab top 0.2 + half cube)"
