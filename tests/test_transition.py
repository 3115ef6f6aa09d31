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


def test_grad_through_batched_step():
  """End-to-end differentiability: gradient of a rollout loss wrt ctrl
  through the batched contact solve (the capability MuJoCo's C engine
  lacks, doc/mjx.rst:526-529)."""
  xml = zoo.BALLS.replace("<option ", '<option iterations="20" ')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  from mujoco_tpu.parallel import rollout as par
  nbatch = 3
  d0 = par.make_batch(m, nbatch)

  def loss(qvel0):
    d = d0.replace(qvel=qvel0)
    step = jax.vmap(lambda dd: forward.step(m, dd))
    for _ in range(3):
      d = step(d)
    return jnp.sum(d.qpos[:, 0] ** 2)

  qvel0 = jnp.zeros((nbatch, mjm.nv)).at[:, 0].set(
      jnp.array([0.5, 1.0, 1.5]))
  g = jax.grad(loss)(qvel0)
  assert np.isfinite(np.asarray(g)).all()
  # FD cross-check on one entry
  eps = 1e-6
  e = jnp.zeros_like(qvel0).at[1, 0].set(eps)
  fd = (loss(qvel0 + e) - loss(qvel0 - e)) / (2 * eps)
  np.testing.assert_allclose(float(g[1, 0]), float(fd), rtol=1e-4)


def test_inverse_derivatives_vs_oracle():
  """AD inverse-dynamics Jacobians vs mjd_inverseFD
  (engine_derivative_fd.c:608): force and sensor Jacobians w.r.t.
  qpos/qvel/qacc in the reference's transposed layout."""
  xml = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.35">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
      <site name="tip" pos="0.3 0 0"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="slide" axis="0 0 1" stiffness="8"/>
        <geom type="sphere" size="0.06" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="j1" gear="1.5"/></actuator>
  <sensor><jointpos joint="j1"/><accelerometer site="tip"/>
          <jointvel joint="j2"/></sensor>
  <!-- jointactuatorfrc is excluded: the oracle's FD perturbs inverse
       passes that never refresh qfrc_actuator, producing a 1/eps
       artifact in that sensor's row -->

</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.35, -0.04]
  mjd.qvel[:] = [0.6, -0.2]
  mjd.qacc[:] = [0.8, 1.1]
  mjd.ctrl[:] = [0.4]
  nv, ns = mjm.nv, mjm.nsensordata
  DfDq = np.zeros((nv, nv)); DfDv = np.zeros((nv, nv))
  DfDa = np.zeros((nv, nv))
  DsDq = np.zeros((nv, ns)); DsDv = np.zeros((nv, ns))
  DsDa = np.zeros((nv, ns))
  mujoco.mjd_inverseFD(mjm, mjd, 1e-7, 1,
                       DfDq, DfDv, DfDa, DsDq, DsDv, DsDa, None)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                qacc=jnp.asarray(mjd.qacc.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  out = jax.jit(lambda dd: derivative_fd.inverse_derivatives(m, dd))(d)
  ours = [np.asarray(x) for x in out]
  for got, ref, name in zip(
      ours, (DfDq, DfDv, DfDa, DsDq, DsDv, DsDa),
      ("DfDq", "DfDv", "DfDa", "DsDq", "DsDv", "DsDa")):
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4,
                               err_msg=name)
