"""Differential tests: DC-motor / PID actuators, group disable, actgravcomp.

DC motor configurations run against the C oracle (mj_fwdActuation,
/root/reference/src/engine/engine_forward.c:487-583,:715-747,:844-854,
:943-977). PID dynamics/gain (reference v3.11, engine_forward.c:451-485,
:766-793) do not exist in the pip oracle, so they are tested against
hand-derived values from the reference formulas.
"""

import dataclasses

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.models.types import BiasType, DynType, GainType
from mujoco_tpu.ops import forward


def _motor_xml(dynprm, gainprm, biasprm, actdim, extra=""):
  prm = lambda v: " ".join(str(x) for x in v)
  return f"""
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 0.5">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    <general joint="j" actearly="true" actdim="{actdim}"
             dyntype="dcmotor" gaintype="dcmotor" biastype="dcmotor"
             dynprm="{prm(dynprm)}" gainprm="{prm(gainprm)}"
             biasprm="{prm(biasprm)}" {extra}/>
  </actuator>
</mujoco>"""


Z10 = [0.0] * 10

# dynprm: [te, dimax, RT, C, Ta, sigma0, sigma1, slew, Imax, -]
# gainprm: [R, K, alpha, T0, kp, ki, kd, Vmax, input_mode, -]
# biasprm: [A(cogging), Np, phi, F_C, F_S, v_S, ...]
DCMOTOR_CASES = {
    "current": dict(
        dynprm=[0.01] + Z10[1:], gainprm=[2.0, 0.5] + Z10[2:],
        biasprm=Z10, actdim=1),
    "stateless_backemf": dict(
        dynprm=Z10, gainprm=[2.0, 0.5] + Z10[2:], biasprm=Z10, actdim=0),
    "temperature": dict(
        dynprm=[0.01, 0, 5.0, 0.8, 25.0] + Z10[5:],
        gainprm=[2.0, 0.5, 0.004, 20.0] + Z10[4:], biasprm=Z10, actdim=2),
    "bristle": dict(
        dynprm=[0.01, 0, 0, 0, 0, 50.0, 0.3] + Z10[7:],
        gainprm=[2.0, 0.5] + Z10[2:],
        biasprm=[0, 0, 0, 0.4, 0.6, 0.05] + Z10[6:], actdim=2),
    "cogging": dict(
        dynprm=[0.01] + Z10[1:], gainprm=[2.0, 0.5] + Z10[2:],
        biasprm=[0.2, 7.0, 0.3] + Z10[3:], actdim=1),
    "slew": dict(
        dynprm=[0.01, 0, 0, 0, 0, 0, 0, 4.0] + Z10[8:],
        gainprm=[2.0, 0.5] + Z10[2:], biasprm=Z10, actdim=2),
    "pi_position": dict(
        dynprm=[0.01, 0, 0, 0, 0, 0, 0, 0, 1.5] + Z10[9:],
        gainprm=[2.0, 0.5, 0, 0, 8.0, 3.0, 0.4, 24.0, 1] + Z10[9:],
        biasprm=Z10, actdim=2),
    "current_limited": dict(
        dynprm=[0.01, 30.0] + Z10[2:], gainprm=[2.0, 0.5] + Z10[2:],
        biasprm=Z10, actdim=1),
}


@pytest.mark.parametrize("name", sorted(DCMOTOR_CASES))
def test_dcmotor_vs_oracle(name):
  cfg = DCMOTOR_CASES[name]
  xml = _motor_xml(cfg["dynprm"], cfg["gainprm"], cfg["biasprm"],
                   cfg["actdim"])
  try:
    mjm = mujoco.MjModel.from_xml_string(xml)
  except Exception as e:  # oracle predates this slot combination
    pytest.skip(f"oracle rejects config: {e}")
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qpos[:] = 0.2 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(lambda dd, ctrl: forward.step(m, dd.replace(ctrl=ctrl)))
  for t in range(150):
    ctrl = np.array([np.sin(0.05 * t) * 2.0])
    mjd.ctrl[:] = ctrl
    mujoco.mj_step(mjm, mjd)
    d = step(d, jnp.asarray(ctrl))
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-9,
                             err_msg=f"act [{name}]")
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9,
                             err_msg=f"qpos [{name}]")
  mujoco.mj_forward(mjm, mjd)
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_force),
                             mjd.actuator_force, atol=1e-9,
                             err_msg=f"force [{name}]")


def test_dcmotor_implicitfast_vs_oracle():
  """DC-motor qDeriv terms (back-EMF, LuGre sigma1) under implicitfast."""
  cfg = DCMOTOR_CASES["bristle"]
  xml = _motor_xml(cfg["dynprm"], cfg["gainprm"], cfg["biasprm"],
                   cfg["actdim"]).replace(
      '<option timestep="0.002"/>',
      '<option timestep="0.004" integrator="implicitfast"/>')
  try:
    mjm = mujoco.MjModel.from_xml_string(xml)
  except Exception as e:
    pytest.skip(f"oracle rejects config: {e}")
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = 0.4

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd.replace(
      ctrl=jnp.asarray([1.5]))))
  for _ in range(100):
    mjd.ctrl[:] = 1.5
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-9)


def test_actuator_group_disable():
  """opt.disableactuator bit g zeroes group-g actuator forces
  (mj_actuatorDisabled, engine_support.c:695)."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j1" gear="2" group="1"/>
    <motor joint="j1" gear="3" group="2"/>
  </actuator>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.opt.disableactuator = 1 << 1  # disable group 1
  mjd = mujoco.MjData(mjm)
  mjd.ctrl[:] = [1.0, 1.0]
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(ctrl=jnp.asarray([1.0, 1.0]))
  d = forward.forward(m, d)
  assert float(d.actuator_force[0]) == 0.0
  np.testing.assert_allclose(np.asarray(d.actuator_force),
                             mjd.actuator_force, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                             mjd.qfrc_actuator, atol=1e-12)


def test_actgravcomp_vs_oracle():
  """jnt_actgravcomp routes gravcomp through qfrc_actuator
  (engine_forward.c:983-999, engine_passive.c:1118)."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 0.5" gravcomp="1">
      <joint name="j1" type="hinge" axis="0 1 0" actuatorgravcomp="true"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j1" gear="2"/></actuator>
</mujoco>"""
  try:
    mjm = mujoco.MjModel.from_xml_string(xml)
  except Exception as e:
    pytest.skip(f"oracle lacks actuatorgravcomp: {e}")
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = 0.3
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                             mjd.qfrc_actuator, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive),
                             mjd.qfrc_passive, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-9)


def _patch_pid(m, dynprm, gainprm, biasprm):
  """Turn the single motor actuator of `m` into a reference-v3.11 PID
  actuator (the pip oracle cannot compile one)."""
  slots = np.full((1, 7), -1, dtype=np.int32)
  n = 0
  if dynprm[1] > 0:
    slots[0, 0] = n; n += 1
  if gainprm[0] > 0:
    slots[0, 1] = n; n += 1
  slots[0, 5] = n
  return dataclasses.replace(
      m,
      na=n,
      actuator_dyntype=np.array([DynType.PID], dtype=np.int32),
      actuator_gaintype=np.array([GainType.PID], dtype=np.int32),
      actuator_biastype=np.array([BiasType.AFFINE], dtype=np.int32),
      actuator_actadr=np.array([0], dtype=np.int32),
      actuator_actnum=np.array([n], dtype=np.int32),
      actuator_slots=slots,
      actuator_dynprm=jnp.asarray([dynprm]),
      actuator_gainprm=jnp.asarray([gainprm]),
      actuator_biasprm=jnp.asarray([biasprm]),
  )


def test_pid_actuator_reference_formulas():
  """PID dyn/gain (v3.11-only): slew-limited setpoint + anti-windup integral,
  force = kp·(qref−L) + kv·(0−v) + ki·z, validated against a hand-stepped
  reference implementation of engine_forward.c:451-485,:766-793."""
  xml = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 0.5">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j"/></actuator>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  kp, kv, ki = 12.0, 1.5, 4.0
  imax, slew = 0.8, 6.0
  dynprm = [imax, slew] + [0.0] * 8
  gainprm = [ki] + [0.0] * 9
  biasprm = [0.0, -kp, -kv] + [0.0] * 7

  m0 = io.put_model(mjm)
  m = _patch_pid(m0, dynprm, gainprm, biasprm)
  d = io.make_data(m)
  h = float(np.asarray(m.opt.timestep))

  # reference implementation in pure numpy
  qpos, qvel = 0.0, 0.0
  act = np.zeros(2)  # [slew_state, integral]
  ctrl = 1.0
  step = jax.jit(lambda dd: forward.step(m, dd.replace(
      ctrl=jnp.asarray([ctrl]))))
  # model constants for the numpy replica
  mjd = mujoco.MjData(mjm)

  for t in range(50):
    # numpy replica of one step (gear=1 hinge: length = qpos·gear)
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mjm, mjd)  # for length/velocity/M/bias via oracle
    length = mjd.actuator_length[0]
    velocity = qvel * mjm.actuator_gear[0, 0]
    # act_dot
    u_prev = act[0]
    u_eff = np.clip(ctrl, u_prev - slew * h, u_prev + slew * h)
    adot = np.zeros(2)
    adot[0] = (u_eff - u_prev) / h
    err = u_eff - length
    if act[1] >= imax:
      err = min(err, 0.0)
    elif act[1] <= -imax:
      err = max(err, 0.0)
    adot[1] = err
    # force (gain PID, bias affine)
    force = kp * u_eff + ki * act[1]  # −prm[1]·qref + ki·z with prm[1]=−kp
    force += 0.0 - kp * length - kv * velocity
    # dynamics: qacc = M⁻¹(force·gear + passive − bias)
    gear = mjm.actuator_gear[0, 0]
    qfrc = force * gear - 0.05 * qvel - mjd.qfrc_bias[0]
    qM = np.zeros((1, 1))
    mujoco.mj_fullM(mjm, mjd, qM)
    # mj_Euler with joint damping: (M + h·D)⁻¹ qfrc
    qacc = qfrc / (qM[0, 0] + h * 0.05)
    # advance (plain Euler activations; no actrange clamp configured)
    act = act + h * adot
    qvel = qvel + h * qacc
    qpos = qpos + h * qvel

    d = step(d)

  np.testing.assert_allclose(np.asarray(d.act), act, atol=1e-10,
                             err_msg="PID activation states")
  np.testing.assert_allclose(float(d.qpos[0]), qpos, atol=1e-10,
                             err_msg="PID qpos")
