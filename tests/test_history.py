"""Sensor/ctrl history buffers: delay, interval sampling, interpolation.

Differential tests vs the reference ring-buffer machinery
(mju_historyInit/Insert/Read, engine_util_misc.c:1403-1560; the
mj_advance insertion block, engine_forward.c:1271-1315; mj_readCtrl /
mj_readSensor, engine_support.c:886-932). Buffers are compared byte for
byte — the physical ring layout (cursor included) matches the reference.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, history, state


PENDULUM = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j" %s/></actuator>
  <sensor>%s</sensor>
</mujoco>"""


def _drive(xml, nstep=120):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  np.testing.assert_allclose(np.asarray(d.history), mjd.history, atol=1e-12,
                             err_msg="reset-state history buffers")
  step = jax.jit(lambda dd: forward.step(m, dd))
  worst_sd = worst_h = 0.0
  for t in range(nstep):
    c = np.sin(0.13 * t)
    mjd.ctrl[:] = c
    d = d.replace(ctrl=jnp.full((mjm.nu,), c))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    worst_sd = max(worst_sd,
                   np.abs(np.asarray(d.sensordata) - mjd.sensordata).max())
    worst_h = max(worst_h,
                  np.abs(np.asarray(d.history) - mjd.history).max())
  qerr = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  return worst_sd, worst_h, qerr, (m, d, mjm, mjd)


@pytest.mark.parametrize("interp", ["zoh", "linear", "cubic"])
def test_delay_all_interp_modes(interp):
  """Delayed ctrl (through the dynamics) and delayed sensor, all three
  interpolation orders."""
  sd, h, q, _ = _drive(PENDULUM % (
      f'delay="0.017" nsample="6" interp="{interp}"',
      f'<jointpos joint="j" delay="0.012" nsample="5" interp="{interp}"/>'
      '<jointvel joint="j" nsample="4"/>'))
  assert q < 1e-12, q
  assert sd < 1e-12, sd
  assert h < 1e-12, h


def test_interval_sampling():
  """Interval mode: sensor recomputed only on period ticks, held (or
  delayed-read) between them; the user slot advances by the exact period."""
  sd, h, q, _ = _drive(PENDULUM % (
      "",
      '<jointpos joint="j" nsample="6" interval="0.02"/>'
      '<jointvel joint="j" nsample="4" interval="0.035" delay="0.01"/>'),
      nstep=150)
  assert sd < 1e-12, sd
  assert h < 1e-12, h


def test_read_api_matches_oracle():
  """history.read_ctrl / read_sensor vs mj_readCtrl / mj_readSensor at
  off-grid query times."""
  _, _, _, (m, d, mjm, mjd) = _drive(PENDULUM % (
      'delay="0.01" nsample="8" interp="linear"',
      '<jointpos joint="j" delay="0.01" nsample="8" interp="cubic"/>'))
  for t in [0.31, 0.333, 0.5011, 0.55]:
    ours = float(history.read_ctrl(m, d, 0, t))
    ref = mujoco.mj_readCtrl(mjm, mjd, 0, t, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-12)
    ours_s = np.asarray(history.read_sensor(m, d, 0, t))
    buf = np.zeros(1)
    ref_s = mujoco.mj_readSensor(mjm, mjd, 0, t, buf, -1)
    ref_v = buf if ref_s is None else np.array(ref_s)
    np.testing.assert_allclose(ours_s, ref_v.reshape(ours_s.shape),
                               atol=1e-12)


def test_init_history_seeding():
  """init_ctrl_history / init_sensor_history vs the C seeding APIs."""
  xml = PENDULUM % ('delay="0.01" nsample="4" interp="linear"',
                    '<jointpos joint="j" delay="0.02" nsample="4"'
                    ' interp="linear"/>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  times = np.array([0.1, 0.2, 0.35, 0.4])
  cvals = np.array([1.0, -0.5, 0.25, 0.8])
  svals = np.array([0.3, 0.1, -0.2, 0.6])
  mujoco.mj_initCtrlHistory(mjm, mjd, 0, times, cvals)
  mujoco.mj_initSensorHistory(mjm, mjd, 0, times, svals, 0.0)
  d = history.init_ctrl_history(m, d, 0, times, cvals)
  d = history.init_sensor_history(m, d, 0, times, svals, 0.0)
  np.testing.assert_allclose(np.asarray(d.history), mjd.history, atol=1e-12)
  for t in [0.05, 0.17, 0.38, 0.9]:
    np.testing.assert_allclose(float(history.read_ctrl(m, d, 0, t)),
                               mujoco.mj_readCtrl(mjm, mjd, 0, t, -1),
                               atol=1e-12)


def test_state_spec_roundtrip_with_history():
  """mjSTATE_HISTORY rides in the state vector at the reference position
  (mjSTATE_PHYSICS includes it, mjtype.h:520)."""
  xml = PENDULUM % ('delay="0.01" nsample="4" interp="zoh"',
                    '<jointpos joint="j" nsample="3"/>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(30):
    mjd.ctrl[:] = np.cos(0.3 * t)
    d = d.replace(ctrl=jnp.asarray(mjd.ctrl.copy()))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  spec = int(mujoco.mjtState.mjSTATE_FULLPHYSICS)
  assert state.state_size(m, spec) == mujoco.mj_stateSize(mjm, spec)
  ref = np.zeros(mujoco.mj_stateSize(mjm, spec))
  mujoco.mj_getState(mjm, mjd, ref, spec)
  ours = np.asarray(state.get_state(m, d, spec))
  np.testing.assert_allclose(ours, ref, atol=1e-12)
  # set_state restores the buffers
  d2 = state.set_state(m, io.make_data(m), spec, jnp.asarray(ref))
  np.testing.assert_allclose(np.asarray(d2.history), mjd.history, atol=1e-12)
