"""Transition Jacobians: AD vs our FD vs the oracle's mjd_transitionFD."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import derivative_fd, forward

from tests import models as zoo


@pytest.mark.parametrize("name", ["cartpole", "chain3d"])
def test_transition_vs_oracle(name):
  xml = {"cartpole": zoo.CARTPOLE, "chain3d": zoo.CHAIN_3D}[name]
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
  for j in range(mjm.njnt):
    adr = mjm.jnt_qposadr[j]
    if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
      mjd.qpos[adr:adr + 4] /= np.linalg.norm(mjd.qpos[adr:adr + 4])
    elif mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      mjd.qpos[adr + 3:adr + 7] /= np.linalg.norm(mjd.qpos[adr + 3:adr + 7])
  mjd.qvel[:] = 0.3 * rng.randn(mjm.nv)
  mjd.ctrl[:] = 0.2 * rng.randn(mjm.nu)

  nx = 2 * mjm.nv + mjm.na
  a_ref = np.zeros((nx, nx))
  b_ref = np.zeros((nx, mjm.nu))
  mujoco.mjd_transitionFD(mjm, mjd, 1e-7, 1, a_ref, b_ref, None, None)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  a, b, c, dd = derivative_fd.transition(m, d)
  np.testing.assert_allclose(np.asarray(a), a_ref, atol=5e-5, err_msg="A")
  if mjm.nu:
    np.testing.assert_allclose(np.asarray(b), b_ref, atol=5e-5, err_msg="B")

  # AD vs our own FD
  a_fd, b_fd = derivative_fd.transition_fd(m, d, eps=1e-7, centered=True)
  np.testing.assert_allclose(np.asarray(a), np.asarray(a_fd), atol=1e-5)
