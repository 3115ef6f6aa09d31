"""Mesh scalability: compile-time convex hulls (maxhullvert analog) and the
fixed-shape face midphase (mj_collideTree analog, engine_collision_driver.c:996).

A 1000-vertex bumpy ball exercises both: MPR supports gather the decimated
64-vertex hull, and sphere-vs-mesh prefilters faces by point-AABB distance.
"""

import os

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def _rock_xml(nvert=1000):
  rng = np.random.RandomState(0)
  pts = rng.randn(nvert, 3)
  pts /= np.linalg.norm(pts, axis=1, keepdims=True)
  pts *= 0.15 * (1 + 0.08 * rng.rand(nvert, 1))
  vert = " ".join(f"{x:.6f}" for x in pts.ravel())
  return f"""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <asset><mesh name="rock" vertex="{vert}"/></asset>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.3"><freejoint/>
      <geom type="mesh" mesh="rock" mass="0.4"/>
    </body>
    <body pos="0.02 0.01 0.7"><freejoint/>
      <geom type="sphere" size="0.08" mass="0.2"/>
    </body>
    <body pos="-0.02 0.03 1.0"><freejoint/>
      <geom type="box" size="0.06 0.05 0.04" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>"""


def test_hull_decimation_and_midphase_load():
  """Hull is decimated to the cap; the oracle-state forward stays exact
  (nearest faces are inside the midphase budget)."""
  mjm = mujoco.MjModel.from_xml_string(_rock_xml())
  m = io.put_model(mjm)
  assert [len(h) for h in m.mesh_hull_idx] == [64]
  assert int(mjm.mesh_facenum[0]) > int(os.environ.get(
      "MJTPU_FACE_BUDGET", "64")), "scene too small to exercise the midphase"
  # hull decimation intentionally changes the collision shape (as the
  # reference's maxhullvert does), so trajectory parity is not expected;
  # the scene must remain stable and settle plausibly
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(400):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert np.all(np.isfinite(qpos))
  assert qpos[2] > 0.05, f"rock sank through the floor: z={qpos[2]}"
  # sphere rests on the floor (radius 0.08) or on the rock — not through it
  assert qpos[9] > 0.07, f"sphere sank through the floor: z={qpos[9]}"


def test_midphase_matches_exhaustive():
  """Top-K face prefilter returns bit-identical results to the exhaustive
  test on a fixed state (the nearest face is always within the budget)."""
  xml = _rock_xml()
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)

  def run(budget):
    os.environ["MJTPU_FACE_BUDGET"] = str(budget)
    try:
      m = io.put_model(mjm)
      d = io.make_data(m).replace(qpos=jnp.asarray(mjd.qpos.copy()),
                                  qvel=jnp.asarray(mjd.qvel.copy()))
      d = forward.forward(m, d)
    finally:
      os.environ.pop("MJTPU_FACE_BUDGET", None)
    return np.asarray(d.contact.dist), np.asarray(d.qacc)

  d64, q64 = run(64)
  dall, qall = run(10000)   # > nface: exhaustive
  np.testing.assert_allclose(d64, dall, atol=0)
  np.testing.assert_allclose(q64, qall, atol=0)
