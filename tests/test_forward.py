"""Trajectory-level differential tests: step() vs the C oracle at f64.

The contact-free configs are BASELINE.json's first capability tier; the
reference treats fwd/inv consistency and trajectory comparison as the
physics oracle (SURVEY.md §4).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

from tests import models as zoo


def _run_oracle(mjm, nstep, ctrl_fn=None):
  mjd = mujoco.MjData(mjm)
  qs, vs = [], []
  for t in range(nstep):
    if ctrl_fn is not None:
      mjd.ctrl[:] = ctrl_fn(t)
    mujoco.mj_step(mjm, mjd)
    qs.append(mjd.qpos.copy())
    vs.append(mjd.qvel.copy())
  return np.array(qs), np.array(vs)


def _run_tpu(mjm, nstep, ctrl_fn=None):
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda d: forward.step(m, d))
  qs, vs = [], []
  for t in range(nstep):
    if ctrl_fn is not None:
      d = d.replace(ctrl=jnp.asarray(ctrl_fn(t)))
    d = step(d)
    qs.append(np.asarray(d.qpos))
    vs.append(np.asarray(d.qvel))
  return np.array(qs), np.array(vs)


@pytest.mark.parametrize("name,xml,ctrl", [
    ("pendulum", zoo.PENDULUM, None),
    ("cartpole", zoo.CARTPOLE, lambda t: np.array([np.sin(0.05 * t)])),
    ("chain3d", zoo.CHAIN_3D, None),
])
def test_step_trajectory(name, xml, ctrl):
  mjm = zoo.load(xml)
  nstep = 100
  q0, v0 = _run_oracle(mjm, nstep, ctrl)
  q1, v1 = _run_tpu(mjm, nstep, ctrl)
  np.testing.assert_allclose(q1, q0, atol=1e-9, err_msg=f"{name} qpos")
  np.testing.assert_allclose(v1, v0, atol=1e-8, err_msg=f"{name} qvel")


def test_rk4_trajectory():
  xml = zoo.PENDULUM.replace('timestep="0.005"',
                             'timestep="0.005" integrator="RK4"')
  mjm = zoo.load(xml)
  assert mjm.opt.integrator == mujoco.mjtIntegrator.mjINT_RK4
  q0, v0 = _run_oracle(mjm, 50)
  q1, v1 = _run_tpu(mjm, 50)
  np.testing.assert_allclose(q1, q0, atol=1e-9)
  np.testing.assert_allclose(v1, v0, atol=1e-8)


def test_actuation_filter_integrator():
  """Exercise FILTER/FILTEREXACT/INTEGRATOR dyntypes + position/velocity
  shortcut actuators against the oracle."""
  xml = """
  <mujoco>
    <option timestep=\"0.004\"/>
    <worldbody>
      <body pos=\"0 0 1\">
        <joint name=\"j1\" type=\"hinge\" axis=\"0 1 0\" damping=\"0.1\"/>
        <geom type=\"capsule\" size=\"0.03\" fromto=\"0 0 0 0.4 0 0\"/>
        <body pos=\"0.4 0 0\">
          <joint name=\"j2\" type=\"hinge\" axis=\"0 1 0\"/>
          <geom type=\"capsule\" size=\"0.025\" fromto=\"0 0 0 0.3 0 0\"/>
        </body>
      </body>
    </worldbody>
    <actuator>
      <position joint=\"j1\" kp=\"8\" kv=\"0.4\"/>
      <velocity joint=\"j2\" kv=\"1.2\"/>
      <general joint=\"j1\" dyntype=\"filter\" dynprm=\"0.03\" gainprm=\"2.5\"/>
      <general joint=\"j2\" dyntype=\"filterexact\" dynprm=\"0.05\" gainprm=\"1.5\"/>
      <general joint=\"j2\" dyntype=\"integrator\" gainprm=\"0.8\"
               actrange=\"-1 1\" actlimited=\"true\"/>
    </actuator>
  </mujoco>
  """
  mjm = zoo.load(xml)
  ctrl = lambda t: np.array([np.sin(0.1 * t), np.cos(0.13 * t),
                             0.3 * np.sin(0.21 * t), 0.4, 0.2])
  q0, v0 = _run_oracle(mjm, 80, ctrl)
  q1, v1 = _run_tpu(mjm, 80, ctrl)
  np.testing.assert_allclose(q1, q0, atol=1e-9)
  np.testing.assert_allclose(v1, v0, atol=1e-8)


def test_fixed_tendon_spring():
  xml = """
  <mujoco>
    <option timestep=\"0.003\"/>
    <worldbody>
      <body pos=\"0 0 1\">
        <joint name=\"a\" type=\"hinge\" axis=\"0 1 0\"/>
        <geom type=\"capsule\" size=\"0.03\" fromto=\"0 0 0 0.3 0 0\"/>
        <body pos=\"0.3 0 0\">
          <joint name=\"b\" type=\"hinge\" axis=\"0 1 0\"/>
          <geom type=\"capsule\" size=\"0.025\" fromto=\"0 0 0 0.25 0 0\"/>
        </body>
      </body>
    </worldbody>
    <tendon>
      <fixed name=\"t\" stiffness=\"3\" damping=\"0.2\" springlength=\"0 0.1\">
        <joint joint=\"a\" coef=\"1\"/>
        <joint joint=\"b\" coef=\"-0.7\"/>
      </fixed>
    </tendon>
    <actuator>
      <general tendon=\"t\" gainprm=\"1.1\"/>
    </actuator>
  </mujoco>
  """
  mjm = zoo.load(xml)
  ctrl = lambda t: np.array([np.sin(0.07 * t)])
  q0, v0 = _run_oracle(mjm, 80, ctrl)
  q1, v1 = _run_tpu(mjm, 80, ctrl)
  np.testing.assert_allclose(q1, q0, atol=1e-9)
  np.testing.assert_allclose(v1, v0, atol=1e-8)


def test_fluid_inertia_box():
  """Viscosity+density drag on a tumbling body vs the oracle."""
  import mujoco
  xml = """
  <mujoco>
    <option timestep="0.003" viscosity="0.9" density="80" wind="0.4 -0.2 0.1"/>
    <worldbody>
      <body pos="0 0 1.5">
        <freejoint/>
        <geom type="box" size="0.12 0.06 0.04" density="300" contype="0"
              conaffinity="0"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qvel[:] = 2.0 * rng.randn(6)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  import jax
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  mujoco.mj_forward(mjm, mjd)
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_fluid), mjd.qfrc_fluid,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)


def test_fluid_ellipsoid_model():
  """Per-geom ellipsoid fluid model (fluidshape=ellipsoid) vs the oracle."""
  import mujoco
  xml = """
  <mujoco>
    <option timestep="0.003" viscosity="0.5" density="500"
            wind="0.2 -0.1 0"/>
    <worldbody>
      <body pos="0 0 2">
        <freejoint/>
        <geom type="ellipsoid" size="0.1 0.05 0.03" density="400"
              fluidshape="ellipsoid" fluidcoef="0.5 0.25 1.5 1.7 1.0"
              contype="0" conaffinity="0"/>
        <geom type="capsule" size="0.03 0.1" pos="0.15 0 0" density="300"
              fluidshape="ellipsoid" contype="0" conaffinity="0"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(2)
  mjd.qvel[:] = 1.5 * rng.randn(6)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  import jax
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  mujoco.mj_forward(mjm, mjd)
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_fluid), mjd.qfrc_fluid,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)


def test_quadruped_trajectory_parity():
  """Flagship quadruped: 500 contact-rich steps track the oracle."""
  import jax
  import mujoco
  from mujoco_tpu.models import zoo
  from mujoco_tpu.ops import state

  mjm = zoo.load_mj("quadruped")
  m = io.put_model(mjm)
  d = state.reset_data_keyframe(m, io.make_data(m), 0)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetDataKeyframe(mjm, mjd, 0)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
