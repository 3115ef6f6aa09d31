"""Differential tests: implicit / implicitfast integrators vs the C oracle.

Exercises the qDeriv machinery (actuator affine-velocity terms, joint/tendon
damping, AD-RNE bias derivative) and the standalone-free-body gyroscopic
correction (mjd_freeMhat path).
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

from tests import models as zoo

# damped, position-servo-actuated double pendulum — dense qDeriv, both terms
SERVO_XML = """
<mujoco>
  <option timestep="0.004" integrator="{integrator}"/>
  <worldbody>
    <body pos="0 0 1.2">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.3"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0 0 -0.5"/>
      <body pos="0 0 -0.5">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.12"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 -0.3"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position joint="j1" kp="40" kv="3"/>
    <velocity joint="j2" kv="1.5"/>
  </actuator>
</mujoco>
"""

# standalone tumbling free body — exercises the freeMhat gyroscopic path
FREEBODY_XML = """
<mujoco>
  <option timestep="0.004" integrator="{integrator}" gravity="0 0 0"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.2 0.05 0.03" density="800" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _traj_compare(xml, integrator, seed, nstep=150, atol=1e-9):
  mjm = mujoco.MjModel.from_xml_string(xml.format(integrator=integrator))
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.2 * rng.randn(mjm.nq)
  for j in range(mjm.njnt):
    adr = mjm.jnt_qposadr[j]
    if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      mjd.qpos[adr + 3:adr + 7] /= np.linalg.norm(mjd.qpos[adr + 3:adr + 7])
  mjd.qvel[:] = 1.5 * rng.randn(mjm.nv)
  mjd.ctrl[:] = 0.4 * rng.randn(mjm.nu)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  import jax
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=atol,
                             err_msg="qpos")
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=atol,
                             err_msg="qvel")


@pytest.mark.parametrize("integrator", ["implicit", "implicitfast"])
@pytest.mark.parametrize("seed", [0, 1])
def test_servo_pendulum(integrator, seed):
  _traj_compare(SERVO_XML, integrator, seed)


def test_tumbling_free_body_implicit_vs_oracle():
  _traj_compare(FREEBODY_XML, "implicit", seed=2, atol=1e-8)


def test_tumbling_free_body_fast_equals_full():
  """3.11 semantics: implicitfast is identical to implicit for standalone
  free bodies (gyroscopic local solve, /root/reference/doc/changelog.rst:186-189).
  The pip oracle (3.10) still uses the older rotational midpoint rule there,
  so the oracle cross-check is implicit-only; this test pins the 3.11
  invariant instead."""
  import jax
  mjm_fast = mujoco.MjModel.from_xml_string(
      FREEBODY_XML.format(integrator="implicitfast"))
  mjm_full = mujoco.MjModel.from_xml_string(
      FREEBODY_XML.format(integrator="implicit"))
  rng = np.random.RandomState(2)
  qpos = mjm_fast.qpos0 + 0.2 * rng.randn(7)
  qpos[3:7] /= np.linalg.norm(qpos[3:7])
  qvel = 1.5 * rng.randn(6)

  outs = []
  for mjm in (mjm_fast, mjm_full):
    m = io.put_model(mjm)
    d = io.make_data(m)
    d = d.replace(qpos=jnp.asarray(qpos.copy()), qvel=jnp.asarray(qvel.copy()))
    step = jax.jit(lambda dd, m=m: forward.step(m, dd))
    for _ in range(100):
      d = step(d)
    outs.append((np.asarray(d.qpos), np.asarray(d.qvel)))
  np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-10)
  np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-10)


@pytest.mark.parametrize("integrator", ["implicit", "implicitfast"])
def test_chain3d(integrator):
  # free+ball+hinge+slide chain (free joint with children — NOT standalone)
  xml = zoo.CHAIN_3D.replace('<option timestep="0.003"/>',
                             f'<option timestep="0.003" '
                             f'integrator="{integrator}"/>')
  _traj_compare(xml, integrator, seed=3, nstep=100, atol=1e-8)
