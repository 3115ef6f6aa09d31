"""Differential tests: inverse dynamics vs the C oracle + fwd/inv
self-consistency (the reference's own physics oracle, mj_compareFwdInv)."""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, inverse

from tests import models as zoo

MODELS = {
    "pendulum": zoo.PENDULUM,
    "cartpole": zoo.CARTPOLE,
    "chain3d": zoo.CHAIN_3D,
    "balls": zoo.BALLS,
}


def _setup(xml, seed, qvel_scale=0.4):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.15 * rng.randn(mjm.nq)
  for j in range(mjm.njnt):
    adr = mjm.jnt_qposadr[j]
    if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
      mjd.qpos[adr:adr + 4] /= np.linalg.norm(mjd.qpos[adr:adr + 4])
    elif mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      mjd.qpos[adr + 3:adr + 7] /= np.linalg.norm(mjd.qpos[adr + 3:adr + 7])
  mjd.qvel[:] = qvel_scale * rng.randn(mjm.nv)
  mjd.qacc[:] = 2.0 * rng.randn(mjm.nv)
  return mjm, mjd


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("seed", [0, 1])
def test_inverse_vs_oracle(name, seed):
  mjm, mjd = _setup(MODELS[name], seed)
  mujoco.mj_inverse(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                qacc=jnp.asarray(mjd.qacc.copy()))
  d = inverse.inverse(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_inverse), mjd.qfrc_inverse,
                             atol=1e-9, err_msg="qfrc_inverse")
  np.testing.assert_allclose(np.asarray(d.qfrc_constraint),
                             mjd.qfrc_constraint, atol=1e-9)


@pytest.mark.parametrize("name", ["pendulum", "balls"])
def test_fwd_inv_consistency(name):
  """Forward then inverse recovers the applied force (the reference's
  mjENBL_FWDINV self-check)."""
  mjm, mjd = _setup(MODELS[name], 5)
  m = io.put_model(mjm)
  d = io.make_data(m)
  rng = np.random.RandomState(7)
  qfrc_applied = 0.5 * rng.randn(mjm.nv)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                qfrc_applied=jnp.asarray(qfrc_applied))
  d = forward.forward(m, d)
  dif1, dif2 = inverse.compare_fwd_inv(m, d)
  # tolerance scale: solver tolerance dominates
  assert float(dif1) < 1e-6, float(dif1)
  assert float(dif2) < 1e-6, float(dif2)


@pytest.mark.parametrize("integrator", ["Euler", "implicit", "implicitfast"])
def test_invdiscrete(integrator):
  """mjENBL_INVDISCRETE round-trip: step forward, then the discrete inverse
  of the finite-difference qacc recovers the applied force."""
  xml = zoo.PENDULUM.replace(
      '<option timestep="0.005" gravity="0 0 -9.81"/>',
      f'<option timestep="0.005" gravity="0 0 -9.81" '
      f'integrator="{integrator}"/>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_INVDISCRETE
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(11)
  mjd.qpos[:] = mjm.qpos0 + 0.2 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  qpos0, qvel0 = mjd.qpos.copy(), mjd.qvel.copy()
  mujoco.mj_step(mjm, mjd)
  qacc_fd = (mjd.qvel - qvel0) / mjm.opt.timestep

  # oracle inverse with discrete qacc
  mjd2 = mujoco.MjData(mjm)
  mjd2.qpos[:] = qpos0
  mjd2.qvel[:] = qvel0
  mjd2.qacc[:] = qacc_fd
  mujoco.mj_inverse(mjm, mjd2)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(qpos0), qvel=jnp.asarray(qvel0),
                qacc=jnp.asarray(qacc_fd))
  d = inverse.inverse(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_inverse), mjd2.qfrc_inverse,
                             atol=1e-9)
  # and the recovered force is ~zero (no applied force in the fwd step)
  assert np.abs(np.asarray(d.qfrc_inverse)).max() < 1e-6
