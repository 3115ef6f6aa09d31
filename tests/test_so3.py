"""SO3 geodesic servo actuation (mjGAIN_SO3/mjBIAS_SO3/mjTRN_SO3).

Reference semantics: engine_forward.c:636-679 (force), :926-931 (norm
clamp), :1342-1352 (act re-anchor); engine_core_smooth.c:1482-1560
(transmission); user_api.cc:1328 (mjs_setToOrientation);
engine_setconst.c:1135-1178 (dampratio).

The pip oracle (3.10) predates the feature, so these tests port the
reference tree's own goldens: test/engine/engine_core_smooth_test.cc
(SO3MixedModelLayout, SO3RefsiteMixedAxisEquilibrium,
SO3BallMixedAxisContrast, SO3LargeAngleConvergence, SO3QuatNeutralCtrl,
SO3IntVelocityWindsWithBoundedAct).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_tpu import compiler
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward
from mujoco_tpu.utils import math as mjm

REFSITE_XML = """
<mujoco>
  <option integrator="implicitfast">
    <flag contact="disable" gravity="disable"/>
  </option>
  <worldbody>
    <site name="reference"/>
    <body name="box">
      <freejoint/>
      <geom type="box" size=".05 .07 .03"/>
      <site name="end_effector"/>
    </body>
  </worldbody>
  <actuator>
    <position name="x" site="end_effector" refsite="reference"
              gear="1 0 0 0 0 0" kp="100" dampratio="1"/>
    <orientation name="orient" site="end_effector" refsite="reference"
                 kp="1" dampratio="1"/>
    <position name="y" site="end_effector" refsite="reference"
              gear="0 1 0 0 0 0" kp="100" dampratio="1"/>
    <position name="z" site="end_effector" refsite="reference"
              gear="0 0 1 0 0 0" kp="100" dampratio="1"/>
  </actuator>
  <sensor>
    <actuatorpos actuator="orient"/>
    <actuatorfrc actuator="orient"/>
  </sensor>
</mujoco>
"""

BALL_XML = """
<mujoco>
  <option integrator="implicitfast">
    <flag contact="disable" gravity="disable"/>
  </option>
  <worldbody>
    <body name="peraxis" pos="-.3 0 .2">
      <joint name="peraxis" type="ball"/>
      <geom type="box" size=".07 .09 .05"/>
    </body>
    <body name="expmap" pos="0 0 .2">
      <joint name="expmap" type="ball"/>
      <geom type="box" size=".07 .09 .05"/>
    </body>
    <body name="quat" pos=".3 0 .2">
      <joint name="quat" type="ball"/>
      <geom type="box" size=".07 .09 .05"/>
    </body>
  </worldbody>
  <actuator>
    <position name="rx_peraxis" joint="peraxis" gear="1 0 0" kp="5"
              dampratio="1"/>
    <position name="ry_peraxis" joint="peraxis" gear="0 1 0" kp="5"
              dampratio="1"/>
    <position name="rz_peraxis" joint="peraxis" gear="0 0 1" kp="5"
              dampratio="1"/>
    <orientation name="expmap" joint="expmap" kp="5" dampratio="1"/>
    <orientation name="quat" joint="quat" kp="5" dampratio="1" input="quat"/>
  </actuator>
</mujoco>
"""

INT_XML = """
<mujoco>
  <option integrator="implicitfast">
    <flag contact="disable" gravity="disable"/>
  </option>
  <worldbody>
    <body>
      <joint name="ball" type="ball"/>
      <geom type="box" size=".05 .07 .03"/>
    </body>
  </worldbody>
  <actuator>
    <general name="rot" joint="ball" dyntype="integrator"
             gaintype="so3" biastype="so3" gainprm="1" biasprm="0 -1 -1"/>
  </actuator>
</mujoco>
"""


def _load(xml):
  cm = compiler.load_xml(xml)
  return cm, io.put_model(cm)


def test_mixed_model_layout():
  """SO3MixedModelLayout: 4 actuators / 6 controls / 6 outputs; the SO3
  actuator is second (address accumulation); sensors are 3-dim."""
  cm, m = _load(REFSITE_XML)
  assert m.nu == 4 and m.nctrl == 6 and m.nout == 6
  orient = cm.name_tables["actuator"]["orient"]
  assert orient == 1
  assert int(m.actuator_ctrladr[1]) == 1 and int(m.actuator_ctrlnum[1]) == 3
  assert int(m.actuator_outadr[1]) == 1 and int(m.actuator_outnum[1]) == 3
  from mujoco_tpu.models.types import TrnType
  assert int(m.actuator_trntype[1]) == int(TrnType.SO3)
  assert int(np.asarray(cm.sensor_dim)[0]) == 3
  assert int(np.asarray(cm.sensor_adr)[1]) == 3


def test_refsite_mixed_axis_equilibrium():
  """SO3RefsiteMixedAxisEquilibrium: a 5.66-rad mixed-axis target beyond
  the pi shell is a true equilibrium; lengths/sensors report the canonical
  (shortest) expmap; convergence from rest."""
  _, m = _load(REFSITE_XML)
  d = io.make_data(m)
  target = np.array([4.0, 4.0, 0.0])
  canonical = target * (1 - 2 * np.pi / np.linalg.norm(target))
  q = np.asarray(mjm.expmap_to_quat(jnp.asarray(target)))
  d = d.replace(qpos=d.qpos.at[3:7].set(jnp.asarray(q)),
                ctrl=d.ctrl.at[1:4].set(jnp.asarray(target)))
  d = forward.forward(m, d)
  assert np.all(np.abs(np.asarray(d.actuator_force)[1:4]) < 1e-8)
  np.testing.assert_allclose(np.asarray(d.actuator_length)[1:4], canonical,
                             atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.sensordata)[:3], canonical,
                             atol=1e-9)
  assert np.all(np.abs(np.asarray(d.sensordata)[3:6]) < 1e-8)

  # converge to the commanded orientation from the initial state
  d = io.make_data(m)
  d = d.replace(ctrl=d.ctrl.at[1:4].set(jnp.asarray(target)))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(int(10.0 / float(np.asarray(m.opt.timestep)))):
    d = step(d)
  assert np.all(np.abs(np.asarray(d.actuator_length)[1:4] - canonical)
                < 1e-3)
  assert np.all(np.abs(np.asarray(d.actuator_velocity)[1:4]) < 1e-3)


def test_ball_mixed_axis_contrast():
  """SO3BallMixedAxisContrast: at expmap target (4,4,0), SO3 force is 0;
  per-axis wrapped servos keep residual force kp*(4.443-2pi) ~ -1.84."""
  cm, m = _load(BALL_XML)
  d = io.make_data(m)
  target = np.array([4.0, 4.0, 0.0])
  q = jnp.asarray(np.asarray(mjm.expmap_to_quat(jnp.asarray(target))))
  qadr_p = int(m.jnt_qposadr[0])
  qadr_e = int(m.jnt_qposadr[1])
  d = d.replace(qpos=d.qpos.at[qadr_p:qadr_p + 4].set(q)
                .at[qadr_e:qadr_e + 4].set(q))
  uadr = int(m.actuator_ctrladr[3])
  d = d.replace(ctrl=d.ctrl.at[0].set(4.0).at[1].set(4.0)
                .at[uadr].set(4.0).at[uadr + 1].set(4.0))
  d = forward.forward(m, d)
  f = np.asarray(d.actuator_force)
  oadr = int(m.actuator_outadr[3])
  assert np.all(np.abs(f[oadr:oadr + 3]) < 1e-8), f
  assert abs(f[0]) > 1 and abs(f[1]) > 1, f


@pytest.mark.parametrize("target", [(1, 1, 1), (2.2, 2.2, 2.2)])
def test_large_angle_convergence(target):
  """SO3LargeAngleConvergence: geodesic servo converges to large mixed-axis
  targets with no limit cycles (child-frame gradient feedback)."""
  cm, m = _load(BALL_XML)
  d = io.make_data(m)
  uadr = int(m.actuator_ctrladr[3])
  d = d.replace(ctrl=d.ctrl.at[uadr:uadr + 3].set(
      jnp.asarray(np.array(target, dtype=np.float64))))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(4000):
    d = step(d)
  u = np.array(target, dtype=np.float64)
  q_tgt = np.asarray(mjm.expmap_to_quat(jnp.asarray(u)))
  qadr = int(m.jnt_qposadr[1])
  q_cur = np.asarray(d.qpos)[qadr:qadr + 4]
  e = np.asarray(mjm.quat_sub(jnp.asarray(q_tgt), jnp.asarray(
      q_cur / np.linalg.norm(q_cur))))
  dadr = int(m.jnt_dofadr[1])
  assert np.linalg.norm(e) < 1e-4, e
  assert np.linalg.norm(np.asarray(d.qvel)[dadr:dadr + 3]) < 1e-4


def test_quat_neutral_ctrl():
  """SO3QuatNeutralCtrl: neutral controls are zero except the quat block's
  leading component (identity)."""
  cm, m = _load(BALL_XML)
  d = io.make_data(m)
  uadr = int(m.actuator_ctrladr[4])
  expect = np.zeros(m.nctrl)
  expect[uadr] = 1.0
  np.testing.assert_array_equal(np.asarray(d.ctrl), expect)

  # quat chart: commanded quat equilibrium holds (normalize handles scale)
  target = np.array([4.0, 4.0, 0.0])
  q = np.asarray(mjm.expmap_to_quat(jnp.asarray(target)))
  qadr = int(m.jnt_qposadr[2])
  d = d.replace(qpos=d.qpos.at[qadr:qadr + 4].set(jnp.asarray(q)),
                ctrl=d.ctrl.at[uadr:uadr + 4].set(jnp.asarray(2.0 * q)))
  d = forward.forward(m, d)
  oadr = int(m.actuator_outadr[4])
  assert np.all(np.abs(np.asarray(d.actuator_force)[oadr:oadr + 3]) < 1e-8)


def test_integrator_winds_with_bounded_act():
  """SO3IntVelocityWindsWithBoundedAct: one actuator = 3 controls/outputs/
  activations; constant rate ctrl spins steadily over multiple periods while
  the act setpoint stays re-anchored to |u| <= pi."""
  cm, m = _load(INT_XML)
  assert m.nctrl == 3 and m.nout == 3 and m.na == 3
  d = io.make_data(m)
  rate = 1.0
  d = d.replace(ctrl=d.ctrl.at[2].set(rate))
  step = jax.jit(lambda dd: forward.step(m, dd))
  h = float(np.asarray(m.opt.timestep))
  nstep = int(round(4 * 2 * np.pi / rate / h))  # 4 full turns
  angles = []
  for k in range(nstep):
    d = step(d)
    if k % 200 == 0:
      act = np.asarray(d.act)
      assert np.linalg.norm(act) <= np.pi + 1e-9, act
      angles.append(float(np.asarray(d.actuator_length)[2]))
  # steady tracking: the body follows the wound setpoint (length stays in
  # the canonical chart, velocity approaches the commanded rate)
  w = np.asarray(d.qvel)[:3]
  assert abs(np.linalg.norm(w) - rate) < 0.05, w


def test_so3_force_norm_clamp():
  """forcerange clamps the torque NORM preserving direction
  (engine_forward.c:926-931)."""
  xml = REFSITE_XML.replace(
      '<orientation name="orient" site="end_effector" refsite="reference"\n'
      '                 kp="1" dampratio="1"/>',
      '<orientation name="orient" site="end_effector" refsite="reference"\n'
      '                 kp="100" dampratio="1" forcerange="0 .5"/>')
  cm, m = _load(xml)
  assert m.actuator_forcelimited[1]
  d = io.make_data(m)
  target = np.array([1.0, -0.7, 0.4])
  d = d.replace(ctrl=d.ctrl.at[1:4].set(jnp.asarray(target)))
  d = forward.forward(m, d)
  f = np.asarray(d.actuator_force)[1:4]
  np.testing.assert_allclose(np.linalg.norm(f), 0.5, rtol=1e-9)
  # direction preserved: parallel to the unclamped error
  e = target  # body at identity: error = canonical target expmap
  cosang = f @ e / (np.linalg.norm(f) * np.linalg.norm(e))
  assert cosang > 1 - 1e-9


def test_so3_validation():
  """Compile-time validation mirrors user_objects.cc:7118-7182."""
  bad = INT_XML.replace('biasprm="0 -1 -1"', 'biasprm="0 -2 -1"')
  with pytest.raises(ValueError, match="gainprm"):
    io.put_model(compiler.load_xml(bad))
  bad = INT_XML.replace('type="ball"', 'type="hinge"')
  with pytest.raises(ValueError, match="ball"):
    io.put_model(compiler.load_xml(bad))
