"""Differential tests: PGS dual solver + noslip post-pass vs the C oracle.

PGS's dual objective is strictly convex, so despite different sweep orders
(the reference shuffles; we sweep deterministically) both converge to the
same forces with enough iterations."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

from tests import models as zoo


def _ball_xml(solver_opts):
  return f"""
<mujoco>
  <option timestep="0.002" {solver_opts}/>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 0.1" friction="1 0.01 0.002"/>
    <body pos="0 0 0.09">
      <freejoint/>
      <geom type="sphere" size="0.1" friction="0.8 0.008 0.001"/>
    </body>
    <body pos="0.15 0.02 0.3">
      <joint type="hinge" axis="0 1 0" range="-50 50" limited="true"
             frictionloss="0.2"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
</mujoco>"""


@pytest.mark.parametrize("seed", [0, 1])
def test_pgs_vs_oracle(seed):
  xml = _ball_xml('solver="PGS" iterations="200"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qvel[:] = 0.3 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=5e-4,
                             rtol=1e-5, err_msg="qacc")
  np.testing.assert_allclose(np.asarray(d.qfrc_constraint),
                             mjd.qfrc_constraint, atol=5e-4, rtol=1e-5)


def test_pgs_trajectory():
  xml = _ball_xml('solver="PGS" iterations="150"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(3)
  mjd.qvel[:] = 0.2 * rng.randn(mjm.nv)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-5)


def test_noslip_vs_oracle():
  xml = _ball_xml('solver="Newton" noslip_iterations="20"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(5)
  mjd.qvel[:] = 0.4 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-5,
                             err_msg="qacc with noslip")


def test_noslip_elliptic_vs_oracle():
  """Elliptic cone + noslip: the QCQP friction-block branch
  (solveQCQP/mju_QCQP, engine_solver.c:402) vs the oracle."""
  xml = _ball_xml('solver="Newton" cone="elliptic" noslip_iterations="20"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(7)
  mjd.qvel[:] = 0.4 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-5,
                             err_msg="qacc with elliptic noslip")
  # fixed-shape rows vs the oracle's compact rows: compare J^T f
  np.testing.assert_allclose(np.asarray(d.qfrc_constraint),
                             mjd.qfrc_constraint, atol=1e-5,
                             err_msg="qfrc_constraint elliptic noslip")


def test_noslip_elliptic_condim4_vs_oracle():
  """condim-4 (torsional) elliptic contacts through the QCQP3 path."""
  xml = """
<mujoco>
  <option timestep="0.002" solver="Newton" cone="elliptic"
          noslip_iterations="25"/>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 0.1" friction="1 0.05 0.002"/>
    <body pos="0 0 0.09">
      <freejoint/>
      <geom type="sphere" size="0.1" condim="4" friction="0.7 0.06 0.003"/>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(11)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-5,
                             err_msg="qacc condim4 elliptic noslip")


@pytest.mark.parametrize("seed", [0, 2])
def test_pgs_elliptic_vs_oracle(seed):
  """Elliptic-cone PGS: normal-or-ray block update + fixed-normal friction
  QCQP (solPGS elliptic branch, engine_solver.c:605-677)."""
  xml = _ball_xml('solver="PGS" cone="elliptic" iterations="300"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qvel[:] = 0.3 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=5e-4,
                             rtol=1e-5, err_msg="qacc")
  np.testing.assert_allclose(np.asarray(d.qfrc_constraint),
                             mjd.qfrc_constraint, atol=5e-4, rtol=1e-5)


def test_pgs_elliptic_condim4_trajectory():
  """Elliptic PGS trajectory with torsional friction (condim 4)."""
  xml = _ball_xml('solver="PGS" cone="elliptic" iterations="200"')
  xml = xml.replace('<geom type="sphere" size="0.1" friction="0.8 0.008 0.001"/>',
                    '<geom type="sphere" size="0.1" condim="4" '
                    'friction="0.8 0.008 0.001"/>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(7)
  mjd.qvel[:] = 0.2 * rng.randn(mjm.nv)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-5)
