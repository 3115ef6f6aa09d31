"""Differential tests: spatial tendons (site paths, wrapping, pulleys) vs
the C oracle."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, smooth

# straight site-site-site path, spring+damper, actuated
STRAIGHT = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <site name="a0" pos="0 0 1.5"/>
    <body pos="0 0 1.2">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
      <site name="s1" pos="0.2 0 0.04"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.025" fromto="0 0 0 0.3 0 0"/>
        <site name="s2" pos="0.3 0 0.03"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t" stiffness="30" damping="0.4" springlength="0.5">
      <site site="a0"/><site site="s1"/><site site="s2"/>
    </spatial>
  </tendon>
  <actuator><motor tendon="t" gear="2"/></actuator>
</mujoco>
"""

# sphere wrap with sidesite
SPHERE_WRAP = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <site name="a0" pos="-0.4 0 1.5"/>
    <geom name="pulleyg" type="sphere" size="0.1" pos="0 0 1.4"
          contype="0" conaffinity="0"/>
    <site name="side" pos="0 0 1.55"/>
    <body pos="0.3 0 1.2">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.08"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
      <site name="s1" pos="0.28 0 0.03"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t" stiffness="25" damping="0.3" springlength="0.4">
      <site site="a0"/>
      <geom geom="pulleyg" sidesite="side"/>
      <site site="s1"/>
    </spatial>
  </tendon>
</mujoco>
"""

# cylinder wrap
CYL_WRAP = SPHERE_WRAP.replace('type="sphere" size="0.1"',
                               'type="cylinder" size="0.1 0.3" euler="90 0 0"')

# pulley with divisor
PULLEY = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <site name="a0" pos="0 0 1.6"/>
    <body pos="-0.25 0 1.2">
      <joint name="j1" type="slide" axis="0 0 1" damping="0.4"/>
      <geom type="box" size="0.05 0.05 0.05" density="600"/>
      <site name="sl" pos="0 0 0.05"/>
    </body>
    <body pos="0.25 0 1.2">
      <joint name="j2" type="slide" axis="0 0 1" damping="0.4"/>
      <geom type="box" size="0.05 0.05 0.05" density="600"/>
      <site name="sr" pos="0 0 0.05"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t" stiffness="60" springlength="0.5">
      <site site="sl"/><site site="a0"/>
      <pulley divisor="2"/>
      <site site="a0"/><site site="sr"/>
    </spatial>
  </tendon>
</mujoco>
"""

MODELS = {"straight": STRAIGHT, "sphere_wrap": SPHERE_WRAP,
          "cyl_wrap": CYL_WRAP, "pulley": PULLEY}


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("seed", [0, 1])
def test_spatial_tendon_kinematics(name, seed):
  mjm = mujoco.MjModel.from_xml_string(MODELS[name])
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.25 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length,
                             atol=1e-10, err_msg="ten_length")
  np.testing.assert_allclose(np.asarray(d.ten_J),
                             mjd.ten_J.reshape(mjm.ntendon, mjm.nv),
                             atol=1e-9, err_msg="ten_J")
  np.testing.assert_allclose(np.asarray(d.ten_velocity), mjd.ten_velocity,
                             atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive), mjd.qfrc_passive,
                             atol=1e-9)


@pytest.mark.parametrize("name", list(MODELS))
def test_spatial_tendon_trajectory(name):
  mjm = mujoco.MjModel.from_xml_string(MODELS[name])
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(4)
  mjd.qpos[:] = mjm.qpos0 + 0.15 * rng.randn(mjm.nq)
  mjd.ctrl[:] = 0.3 * rng.randn(mjm.nu)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)


SITE_TRN = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <body pos="0 0 1.2">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
      <site name="tip" pos="0.4 0 0"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="ball" damping="0.05"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 -0.1"/>
        <site name="tip2" pos="0.2 0 -0.1" euler="10 20 5"/>
      </body>
    </body>
    <site name="ref" pos="0.3 0 1.0" euler="0 30 0"/>
  </worldbody>
  <actuator>
    <general site="tip2" gear="0 0 1 0 0 0"/>
    <general site="tip2" gear="0.2 0 0.5 0.1 0.3 0" refsite="ref"/>
    <general site="tip" gear="0 0 0 0 1 0"/>
  </actuator>
</mujoco>
"""


@pytest.mark.parametrize("seed", [0, 1])
def test_site_transmission(seed):
  mjm = mujoco.MjModel.from_xml_string(SITE_TRN)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.3 * rng.randn(mjm.nq)
  q = mjd.qpos[1:5]
  mjd.qpos[1:5] = q / np.linalg.norm(q)
  mjd.ctrl[:] = 0.4 * rng.randn(mjm.nu)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_length),
                             mjd.actuator_length, atol=1e-10)
  moment = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(moment, mjd.actuator_moment,
                          mjd.moment_rownnz, mjd.moment_rowadr,
                          mjd.moment_colind)
  np.testing.assert_allclose(np.asarray(d.actuator_moment), moment,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                             mjd.qfrc_actuator, atol=1e-9)


def test_slidercrank_transmission():
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1">
        <joint name="crank" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.15 0 0"
              contype="0" conaffinity="0"/>
        <site name="cranktip" pos="0.15 0 0"/>
      </body>
      <body pos="0.5 0 1">
        <joint name="push" type="slide" axis="1 0 0" damping="0.2"/>
        <geom type="box" size="0.04 0.04 0.04" contype="0" conaffinity="0"/>
        <site name="slider" pos="0 0 0" euler="0 -90 0"/>
      </body>
    </worldbody>
    <actuator>
      <general cranksite="cranktip" slidersite="slider" cranklength="0.4"
               gear="2"/>
    </actuator>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(1)
  mjd.qpos[:] = 0.3 * rng.randn(mjm.nq)
  mjd.ctrl[:] = 0.5 * rng.randn(mjm.nu)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_length),
                             mjd.actuator_length, atol=1e-10)
  moment = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(moment, mjd.actuator_moment, mjd.moment_rownnz,
                          mjd.moment_rowadr, mjd.moment_colind)
  np.testing.assert_allclose(np.asarray(d.actuator_moment), moment,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator), mjd.qfrc_actuator,
                             atol=1e-9)


def test_tendon_armature():
  """Tendon armature: inertia contribution + bias vs the oracle."""
  xml = """
  <mujoco>
    <option timestep="0.003"/>
    <worldbody>
      <site name="a0" pos="0 0 1.5"/>
      <body pos="0 0 1.2">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
        <site name="s1" pos="0.2 0 0.04"/>
        <body pos="0.4 0 0">
          <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
          <geom type="capsule" size="0.025" fromto="0 0 0 0.3 0 0"/>
          <site name="s2" pos="0.3 0 0.03"/>
        </body>
      </body>
    </worldbody>
    <tendon>
      <spatial name="t" armature="0.05" stiffness="10" springlength="0.5">
        <site site="a0"/><site site="s1"/><site site="s2"/>
      </spatial>
    </tendon>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  if not hasattr(mjm, "tendon_armature") or mjm.tendon_armature[0] == 0:
    pytest.skip("oracle lacks tendon armature")
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qpos[:] = 0.3 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.8 * rng.randn(mjm.nv)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  import mujoco as mj
  mujoco.mj_forward(mjm, mjd)
  d1 = forward.forward(m, d)
  qm_ref = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qm_ref)
  np.testing.assert_allclose(np.asarray(d1.qM), qm_ref, atol=1e-10,
                             err_msg="qM with tendon armature")
  np.testing.assert_allclose(np.asarray(d1.qfrc_bias), mjd.qfrc_bias,
                             atol=1e-9, err_msg="bias with tendon armature")
  np.testing.assert_allclose(np.asarray(d1.qacc), mjd.qacc, atol=1e-7)

  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)


def test_tendon_armature_inverse():
  """mj_inverse adds the tendon-armature bias (engine_inverse.c:260):
  qfrc_inverse and the fwd/inv check must match the oracle."""
  xml = """
  <mujoco>
    <option timestep="0.003"/>
    <worldbody>
      <site name="a0" pos="0 0 1.5"/>
      <body pos="0 0 1.2">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
        <site name="s1" pos="0.2 0 0.04"/>
        <body pos="0.4 0 0">
          <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
          <geom type="capsule" size="0.025" fromto="0 0 0 0.3 0 0"/>
          <site name="s2" pos="0.3 0 0.03"/>
        </body>
      </body>
    </worldbody>
    <tendon>
      <spatial name="t" armature="0.05" stiffness="10" springlength="0.5">
        <site site="a0"/><site site="s1"/><site site="s2"/>
      </spatial>
    </tendon>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  if not hasattr(mjm, "tendon_armature") or mjm.tendon_armature[0] == 0:
    pytest.skip("oracle lacks tendon armature")
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(2)
  mjd.qpos[:] = 0.3 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.8 * rng.randn(mjm.nv)
  mjd.qacc[:] = 1.5 * rng.randn(mjm.nv)
  mujoco.mj_inverse(mjm, mjd)

  from mujoco_tpu.ops import inverse as inv_mod
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                qacc=jnp.asarray(mjd.qacc.copy()))
  d = inv_mod.inverse(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_inverse), mjd.qfrc_inverse,
                             atol=1e-8, err_msg="qfrc_inverse w/ tendon armature")
