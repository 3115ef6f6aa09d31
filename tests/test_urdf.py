"""URDF importer differential tests vs the reference's URDF reader
(/root/reference/src/xml/xml_urdf.cc): same URDF through both compilers,
field and trajectory parity."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.compiler.urdf import load_urdf
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


ARM = """<?xml version="1.0"?>
<robot name="arm">
  <link name="base">
    <inertial><origin xyz="0 0 0.05"/><mass value="2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.01" ixy="0.001" ixz="0"
               iyz="0"/></inertial>
    <collision><origin xyz="0 0 0.05"/>
      <geometry><cylinder radius="0.08" length="0.1"/></geometry></collision>
  </link>
  <link name="upper">
    <inertial><origin xyz="0 0 0.15"/><mass value="1"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.002" ixy="0" ixz="0"
               iyz="0"/></inertial>
    <collision><origin xyz="0 0 0.18"/>
      <geometry><box size="0.06 0.06 0.2"/></geometry></collision>
  </link>
  <link name="lower">
    <inertial><mass value="0.5"/>
      <inertia ixx="0.005" iyy="0.005" izz="0.001" ixy="0.0004" ixz="0"
               iyz="0"/></inertial>
    <collision><origin xyz="0 0 0.1" rpy="0.3 0 0"/>
      <geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="shoulder" type="revolute">
    <origin xyz="0 0 0.12" rpy="0 0.2 0"/>
    <parent link="base"/><child link="upper"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="50" velocity="2"/>
    <dynamics damping="0.2" friction="0.05"/>
  </joint>
  <joint name="elbow" type="continuous">
    <origin xyz="0 0 0.3"/>
    <parent link="upper"/><child link="lower"/>
    <axis xyz="1 0 0"/>
  </joint>
</robot>"""


def test_urdf_field_parity():
  cm = load_urdf(ARM)
  mjm = mujoco.MjModel.from_xml_string(ARM)
  bad = []
  for f in sorted(dir(cm)):
    if f.startswith("_"):
      continue
    a = getattr(cm, f)
    if not isinstance(a, np.ndarray) or a.size == 0:
      continue
    b = getattr(mjm, f, None)
    if b is None:
      continue
    try:
      err = np.abs(a - np.asarray(b).reshape(a.shape)).max()
    except Exception:
      bad.append((f, "shape"))
      continue
    if err > 1e-8:
      bad.append((f, err))
  assert not bad, bad


def test_urdf_trajectory():
  # strip self-colliding geometry: penetrating convex pairs hit the
  # documented MPR-manifold deviation; this test is about joints/inertia
  import re
  urdf = re.sub(r"<collision>.*?</collision>", "", ARM, flags=re.S)
  cm = load_urdf(urdf)
  mjm = mujoco.MjModel.from_xml_string(urdf)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = [0.3, -0.8]
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  ncon_total = 0
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    ncon_total += mjd.ncon
    d = step(d)
  # contact-free swing: smooth dynamics + limits track exactly (self-
  # colliding configurations hit the documented MPR-manifold deviation)
  assert ncon_total == 0, "test scene unexpectedly made contact"
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)


def test_urdf_floating_and_fixed_joints():
  urdf = """<?xml version="1.0"?>
<robot name="box">
  <link name="root">
    <inertial><mass value="1"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0"
               iyz="0"/></inertial>
    <collision><geometry><box size="0.2 0.2 0.2"/></geometry></collision>
  </link>
  <link name="ball">
    <inertial><mass value="0.3"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0"
               iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.06"/></geometry></collision>
  </link>
  <link name="tip">
    <inertial><mass value="0.1"/>
      <inertia ixx="0.0005" iyy="0.0005" izz="0.0005" ixy="0" ixz="0"
               iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.03"/></geometry></collision>
  </link>
  <joint name="free" type="floating">
    <origin xyz="0 0 1"/>
    <parent link="root"/><child link="ball"/>
  </joint>
  <joint name="weld" type="fixed">
    <origin xyz="0.2 0 0"/>
    <parent link="ball"/><child link="tip"/>
  </joint>
</robot>"""
  cm = load_urdf(urdf)
  mjm = mujoco.MjModel.from_xml_string(urdf)
  assert cm.nq == mjm.nq == 7
  assert cm.nv == mjm.nv == 6
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_urdf_mimic_joint():
  """<mimic> maps to an mjEQ_JOINT polynomial coupling (the reference's
  URDF reader drops mimic silently — this importer keeps the semantics):
  the follower tracks q = multiplier*q_leader + offset."""
  urdf = """
<robot name="gripper">
  <link name="base">
    <inertial><mass value="1"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><box size="0.1 0.1 0.1"/></geometry></collision>
  </link>
  <link name="finger_l">
    <inertial><mass value="0.1"/>
      <inertia ixx="0.0005" iyy="0.0005" izz="0.0005" ixy="0" ixz="0"
               iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.02"/></geometry></collision>
  </link>
  <link name="finger_r">
    <inertial><mass value="0.1"/>
      <inertia ixx="0.0005" iyy="0.0005" izz="0.0005" ixy="0" ixz="0"
               iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.02"/></geometry></collision>
  </link>
  <joint name="drive" type="prismatic">
    <origin xyz="0.1 0.05 0"/>
    <parent link="base"/><child link="finger_l"/>
    <axis xyz="0 1 0"/>
    <limit lower="-0.04" upper="0.04" effort="10"/>
    <dynamics damping="0.5"/>
  </joint>
  <joint name="follow" type="prismatic">
    <origin xyz="0.1 -0.05 0"/>
    <parent link="base"/><child link="finger_r"/>
    <axis xyz="0 1 0"/>
    <limit lower="-0.05" upper="0.05" effort="10"/>
    <dynamics damping="0.5"/>
    <mimic joint="drive" multiplier="-1" offset="0.01"/>
  </joint>
</robot>"""
  cm = load_urdf(urdf)
  assert cm.neq == 1
  m = io.put_model(cm)
  d = io.make_data(m)
  qfrc = np.zeros(m.nv)
  qfrc[0] = 2.0                      # push the drive joint
  d = d.replace(qfrc_applied=jnp.asarray(qfrc))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(400):
    d = step(d)
  q = np.asarray(d.qpos)
  # follower satisfies q1 = -q0 + 0.01 through the equality
  assert abs(q[0]) > 1e-3            # the drive actually moved
  np.testing.assert_allclose(q[1], -q[0] + 0.01, atol=1e-6)
