"""Differential tests: muscle actuators (FLV model) vs the C oracle."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

MUSCLE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-60 60"
             limited="true" damping="0.05"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" contype="0"
            conaffinity="0"/>
      <site name="s1" pos="0.38 0 0.03"/>
    </body>
  </worldbody>
  <actuator>
    <muscle name="m1" joint="j1" force="120"/>
    <muscle name="m2" joint="j1" scale="180" lmin="0.4" lmax="1.7"
            vmax="1.2" fpmax="1.1" fvmax="1.3" timeconst="0.012 0.045"/>
  </actuator>
</mujoco>
"""


@pytest.mark.parametrize("seed", [0, 1])
def test_muscle_trajectory(seed):
  mjm = mujoco.MjModel.from_xml_string(MUSCLE_XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = 0.3 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mjd.ctrl[:] = rng.rand(mjm.nu)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))

  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  mujoco.mj_forward(mjm, mjd)
  d = forward.forward(m, d)

  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.actuator_force),
                             mjd.actuator_force, atol=1e-9)


def test_muscle_implicitfast_trajectory():
  """Muscles under implicitfast: qDeriv must include the FV-curve velocity
  derivative (mjd_muscleGain_vel, engine_derivative.c:969)."""
  xml = MUSCLE_XML.replace('<option timestep="0.002"/>',
                           '<option timestep="0.004" integrator="implicitfast"/>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(4)
  mjd.qpos[:] = 0.3 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mjd.ctrl[:] = rng.rand(mjm.nu)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))

  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9,
                             err_msg="muscle implicitfast qpos drift")
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-9)
