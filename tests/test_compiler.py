"""Differential tests: the native MJCF compiler vs the reference compiler.

Every test compiles the same MJCF with mujoco_tpu.compiler.load_xml and the
pip reference, then compares the bridged models and/or trajectories
(mjCModel::Compile parity, /root/reference/src/user/user_model.cc:4862).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.compiler import load_xml
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, state


def _model_fields_match(cm, mjm, skip=(), atol=1e-9):
  """Compare every shared ndarray attribute of the two compiled models."""
  fields = [f for f in dir(cm) if not f.startswith("_")
            and isinstance(getattr(cm, f), np.ndarray)]
  bad = []
  for f in sorted(fields):
    if f in skip:
      continue
    b = getattr(mjm, f, None)
    if b is None:
      continue
    a = np.asarray(getattr(cm, f))
    b = np.asarray(b)
    if f == "mat_texid" and b.ndim == 2:
      b = b[:, 1]                      # reference stores per-role columns
    if a.dtype == bool or b.dtype == bool:
      a = a.astype(np.float64)
      b = b.astype(np.float64)
    if a.size == 0 and b.size == 0:
      continue
    try:
      err = np.abs(a - b.reshape(a.shape)).max()
    except Exception:
      bad.append((f, f"shape {a.shape} vs {b.shape}"))
      continue
    if err > atol:
      bad.append((f, err))
  assert not bad, f"model fields differ: {bad}"


def _traj_match(xml, nstep, atol, ctrl=None):
  cm = load_xml(xml)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(nstep):
    if ctrl is not None:
      c = ctrl(t)
      mjd.ctrl[:] = c
      d = d.replace(ctrl=jnp.asarray(c))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=atol)
  return cm, mjm


PENDULUM = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 1.2">
      <joint name="swing" type="hinge" axis="0 1 0" damping="0.08"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0 0 -0.55" density="900"/>
      <body pos="0 0 -0.55">
        <joint type="hinge" axis="0 1 0" stiffness="1.5" springref="0.3"
               damping="0.02"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.02 0 -0.4"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""


def test_pendulum_field_and_trajectory_parity():
  cm, mjm = _traj_match(PENDULUM, 500, 1e-12)
  _model_fields_match(cm, mjm)


def test_contacts_free_ball_trajectory():
  _traj_match("""
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 0.1"/>
    <body pos="0 0.02 0.5" euler="10 5 0">
      <freejoint/>
      <geom type="box" size="0.08 0.06 0.05" mass="0.4"/>
      <body pos="0.1 0 0">
        <joint type="ball" damping="0.05" limited="true" range="0 40"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.15 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>""", 400, 1e-9)


def test_tendon_actuator_sensor_trajectory():
  cm, mjm = _traj_match("""
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <body pos="0 0 0.6">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.05"
             limited="true" range="-60 60"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" contype="0"
            conaffinity="0"/>
      <site name="s1" pos="0.3 0 0.03"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="slide" axis="1 0 0" damping="0.1"
               limited="true" range="-0.1 0.1"/>
        <geom type="sphere" size="0.04" mass="0.1"/>
      </body>
    </body>
    <site name="a0" pos="0 0 1"/>
  </worldbody>
  <tendon>
    <spatial name="t" stiffness="20" damping="0.3" limited="true"
             range="0 0.8">
      <site site="a0"/><site site="s1"/>
    </spatial>
    <fixed name="fx"><joint joint="j1" coef="0.5"/>
      <joint joint="j2" coef="-1.2"/></fixed>
  </tendon>
  <actuator>
    <motor joint="j1" gear="2" ctrlrange="-1 1"/>
    <position joint="j2" kp="30" kv="1"/>
    <velocity tendon="t" kv="0.5"/>
  </actuator>
  <sensor>
    <jointpos joint="j1"/><tendonpos tendon="t"/>
    <framepos objtype="site" objname="s1"/>
    <accelerometer site="s1"/><gyro site="s1"/>
  </sensor>
</mujoco>""", 400, 1e-12,
              ctrl=lambda t: np.array([np.sin(0.02 * t), 0.05, 0.0]))
  # sensordata parity too
  m = io.put_model(cm)
  d = forward.forward(m, io.make_data(m))
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata,
                             atol=1e-10)


def test_equality_keyframe_pair_exclude():
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body name="b1" pos="0 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0"/>
      <geom name="g1" type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
    <body name="b2" pos="0.4 0 0.5">
      <joint name="j2" type="hinge" axis="0 1 0"/>
      <geom name="g2" type="capsule" size="0.03" fromto="0 0 0 0.25 0 0"/>
    </body>
  </worldbody>
  <equality>
    <joint joint1="j1" joint2="j2" polycoef="0 0.8 0.1 0 0"/>
    <connect body1="b1" body2="b2" anchor="0.3 0 0"/>
  </equality>
  <contact>
    <pair geom1="g1" geom2="g2" condim="4" friction="0.7 0.7 0.01 0.002 0.002"/>
    <exclude body1="b1" body2="b2"/>
  </contact>
  <keyframe>
    <key name="bent" qpos="0.4 -0.2" qvel="0.1 -0.3" time="1.5"/>
  </keyframe>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  _model_fields_match(cm, mjm)
  # keyframe reset + step parity
  m = io.put_model(cm)
  d = state.reset_data_keyframe(m, io.make_data(m), 0)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_resetDataKeyframe(mjm, mjd, 0)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_muscle_compilation():
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-60 60"
             limited="true" damping="0.05"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <actuator><muscle name="m1" joint="j1" force="120"/></actuator>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  # lengthrange via the same mini-simulation as the reference
  # (mj_setLengthRange/evalAct): matches to integrator roundoff
  np.testing.assert_allclose(cm.actuator_lengthrange,
                             mjm.actuator_lengthrange, atol=1e-9)
  np.testing.assert_allclose(cm.actuator_acc0, mjm.actuator_acc0, atol=1e-9)
  _traj_match(xml, 300, 1e-9, ctrl=lambda t: np.array([0.7]))


def test_humanoid_native_compile():
  """The flagship humanoid compiles natively: static/inertial fields match
  the reference compiler exactly; the (chaotic, contact-rich) trajectory
  tracks within Lyapunov amplification of the ~1e-12 setconst residuals."""
  xml = open("/root/repo/mujoco_tpu/models/assets/humanoid.xml").read()
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  _model_fields_match(cm, mjm, atol=1e-8)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(30):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  # contact-free falling phase: trajectories identical
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10,
                             err_msg="pre-contact trajectory")
  for _ in range(90):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  # ground impacts amplify the ~1e-12 setconst residuals knife-edge
  # (marginal contacts flip on/off); bounded, not exact
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, rtol=0,
                             atol=0.05, err_msg="post-contact trajectory")


def test_defaults_and_frames():
  """Nested default classes, childclass inheritance, frame transforms,
  euler/axisangle/zaxis orientations."""
  xml = """
<mujoco>
  <compiler angle="radian"/>
  <default>
    <geom density="500" friction="0.8 0.01 0.001"/>
    <default class="heavy">
      <geom density="2000"/>
      <default class="heavier"><geom density="3000"/></default>
    </default>
    <joint damping="0.2"/>
  </default>
  <worldbody>
    <body pos="0 0 1" childclass="heavy">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="box" size="0.1 0.05 0.04" euler="0.3 0.2 0.1"/>
      <geom type="sphere" size="0.05" pos="0.2 0 0" class="heavier"/>
      <frame pos="0 0 -0.3" axisangle="1 0 0 0.5">
        <geom type="capsule" size="0.02" fromto="0 0 0 0.1 0 0" class="heavy"/>
      </frame>
    </body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  _model_fields_match(cm, mjm)
  _traj_match(xml, 300, 1e-12)


OBJ_SOLID = """v 0 0 0
v 1.2 0 0
v 1.0 0.9 0
v 0.1 0.8 0
v 0.1 0.1 0.7
v 1.0 0.2 0.8
f 1 4 3 2
f 1 2 6 5
f 2 3 6
f 3 4 5 6
f 1 5 4
"""


def test_obj_file_mesh(tmp_path):
  """OBJ loading + volumetric CoM/principal-frame processing
  (user_mesh.cc LoadOBJ + mjCMesh::Compile): fields match the reference
  (f32 mesh storage limits parity to ~1e-6) and the falling-mesh trajectory
  is exact through impact."""
  (tmp_path / "solid.obj").write_text(OBJ_SOLID)
  xml = f"""
<mujoco>
  <compiler meshdir="{tmp_path}"/>
  <asset><mesh name="solid" file="solid.obj"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 .1"/>
    <body pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="solid" euler="15 25 5"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  for f in ["mesh_pos", "mesh_quat", "geom_pos", "geom_quat", "geom_rbound",
            "body_mass", "body_inertia", "mesh_vertnum", "mesh_facenum"]:
    a = np.asarray(getattr(cm, f))
    b = np.asarray(getattr(mjm, f)).reshape(a.shape)
    np.testing.assert_allclose(a, b, atol=2e-5, err_msg=f)
  _traj_match(xml, 140, 1e-9)


def test_stl_file_mesh(tmp_path):
  """Binary STL loading with vertex welding; volumetric mass properties
  match. The tetra's two equal principal moments make the frame ambiguous,
  so geometry is compared shape-invariantly (sorted vertex radii)."""
  import struct
  tris = [((0, 0, 0), (1, 0, 0), (0, 1, 0)),
          ((0, 0, 0), (0, 0, 1), (1, 0, 0)),
          ((0, 0, 0), (0, 1, 0), (0, 0, 1)),
          ((1, 0, 0), (0, 0, 1), (0, 1, 0))]
  with open(tmp_path / "tet.stl", "wb") as f:
    f.write(b"\0" * 80)
    f.write(struct.pack("<I", len(tris)))
    for t in tris:
      f.write(struct.pack("<3f", 0, 0, 0))
      for v in t:
        f.write(struct.pack("<3f", *v))
      f.write(struct.pack("<H", 0))
  xml = f"""
<mujoco>
  <compiler meshdir="{tmp_path}"/>
  <asset><mesh name="tet" file="tet.stl" scale="0.5 0.5 0.5"/></asset>
  <worldbody>
    <body pos="0 0 1"><freejoint/><geom type="mesh" mesh="tet"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  np.testing.assert_allclose(cm.body_mass, mjm.body_mass, atol=1e-6)
  np.testing.assert_allclose(cm.mesh_pos, mjm.mesh_pos, atol=1e-6)
  np.testing.assert_allclose(np.sort(cm.body_inertia.ravel()),
                             np.sort(mjm.body_inertia.ravel()), atol=1e-6)
  # same shape modulo the (degenerate) principal frame
  np.testing.assert_allclose(
      np.sort(np.linalg.norm(cm.mesh_vert, axis=1)),
      np.sort(np.linalg.norm(mjm.mesh_vert, axis=1)), atol=1e-6)
  assert cm.mesh_vertnum[0] == 4 and cm.mesh_facenum[0] == 4


def test_include_and_load_path(tmp_path):
  """<include> splicing + load_xml_path with relative meshdir
  (ParseXML include handling, xml.cc:322)."""
  (tmp_path / "arm.xml").write_text("""
<mujocoinclude>
  <worldbody>
    <body pos="0 0 0.6">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j1" gear="1.5"/></actuator>
</mujocoinclude>""")
  (tmp_path / "main.xml").write_text("""
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom type="plane" size="3 3 0.1"/>
  </worldbody>
  <include file="arm.xml"/>
</mujoco>""")
  from mujoco_tpu.compiler import load_xml_path
  cm = load_xml_path(str(tmp_path / "main.xml"))
  mjm = mujoco.MjModel.from_xml_path(str(tmp_path / "main.xml"))
  _model_fields_match(cm, mjm)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(300):
    mjd.ctrl[:] = np.sin(0.05 * t)
    d = d.replace(ctrl=jnp.asarray(mjd.ctrl.copy()))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-12)


def test_native_compile_tree_metadata_and_sleep():
  """Tree tables + sleep policies from the native compiler (user_model.cc
  tree assignment; AUTO policy resolution, engine_setconst.c:340-470):
  natively compiled models sleep identically to the oracle."""
  xml = """
<mujoco>
  <option timestep="0.002" sleep_tolerance="1e-4">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom type="plane" size="4 4 0.1"/>
    <body pos="0 0 0.4"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
    <body pos="1 0 0.3"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="2 0 0.5" sleep="never">
      <freejoint/><geom type="box" size="0.08 0.08 0.08"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  for f in ["ntree", "body_treeid", "dof_treeid", "tree_sleep_policy",
            "tree_bodyadr", "tree_bodynum", "tree_dofadr", "tree_dofnum",
            "dof_length"]:
    np.testing.assert_allclose(
        np.asarray(getattr(cm, f), dtype=np.float64),
        np.asarray(getattr(mjm, f), dtype=np.float64), atol=1e-8,
        err_msg=f)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(900):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-12)
  ours = np.asarray(d.tree_asleep)
  assert np.array_equal(ours < 0, mjd.tree_asleep < 0)
  assert ours[2] < 0  # sleep="never" stays awake


def test_flexcomp_grid_field_exact():
  """Native flexcomp generation (mjCFlexcomp, user_flexcomp.cc): grid
  vertices/elements/edges, pins riding the parent body, edge equality and
  engine-computed flexedge length0/invweight0 are field-exact vs the
  reference compiler, and the pinned-cloth trajectory is oracle-exact."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <body name="anchor" pos="0 0 0.8">
      <geom type="sphere" size="0.03" contype="0" conaffinity="0"/>
      <flexcomp name="cloth" type="grid" count="3 3 1" spacing="0.1 0.1 0.1"
                dim="2" mass="0.9" radius="0.01">
        <pin id="0 2"/>
        <edge equality="true" solref="0.01 1"/>
        <contact selfcollide="none"/>
      </flexcomp>
    </body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
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
      err = np.abs(a.astype(np.float64)
                   - np.asarray(b, dtype=np.float64).reshape(a.shape)).max()
    except Exception:
      bad.append((f, "shape"))
      continue
    if err > 1e-8:
      bad.append((f, err))
  assert not bad, bad

  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_flexcomp_free_cloth_on_floor():
  """Unpinned flexcomp cloth falls and drapes on the floor; native compile
  tracks the oracle."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <flexcomp name="sheet" type="grid" count="3 3 1" spacing="0.08 0.08 0.08"
              pos="0 0 0.2" dim="2" mass="0.5" radius="0.008">
      <edge equality="true"/>
      <contact selfcollide="none"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(250):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  # cloth settled on the floor
  z = np.asarray(d.qpos).reshape(9, 3)[:, 2]
  assert np.all(z < 0.05)


def _field_parity(xml):
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
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
      err = np.abs(a.astype(np.float64)
                   - np.asarray(b, dtype=np.float64).reshape(a.shape)).max()
    except Exception:
      bad.append((f, "shape"))
      continue
    if err > 1e-8:
      bad.append((f, err))
  assert not bad, bad
  return cm, mjm


def test_flexcomp_dim3_field_exact():
  """Dim-3 (solid) flexcomp: 6-tets-per-cube grid, outward tet orientation,
  eledge edge order, elemlayer surface distance — field-exact vs the
  reference compiler (MakeGrid cube2tets user_flexcomp.cc:903-946, fragment
  pass user_mesh.cc:5470-5665), and the native-compiled model steps
  bit-identically to the pip-loaded one through this engine."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <flexcomp name="gel" type="grid" count="3 3 3" spacing="0.06 0.06 0.06"
              pos="0 0 0.2" dim="3" mass="0.8" radius="0.005">
      <edge equality="true"/>
      <contact selfcollide="none" internal="true"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  cm, mjm = _field_parity(xml)
  assert cm.nflexelem == 48 == mjm.nflexelem
  assert int(cm.flex_dim[0]) == 3

  m_nat = io.put_model(cm)
  m_pip = io.put_model(mjm)
  d_nat = io.make_data(m_nat)
  d_pip = io.make_data(m_pip)
  mjd = mujoco.MjData(mjm)
  step_nat = jax.jit(lambda dd: forward.step(m_nat, dd))
  step_pip = jax.jit(lambda dd: forward.step(m_pip, dd))
  for t in range(120):
    d_nat = step_nat(d_nat)
    d_pip = step_pip(d_pip)
    mujoco.mj_step(mjm, mjd)
    if t == 60:           # pre-contact free fall: oracle-exact
      np.testing.assert_allclose(np.asarray(d_nat.qpos), mjd.qpos,
                                 atol=1e-12)
  # in-contact: native == pip-loaded bitwise (engine deviations cancel)
  assert np.array_equal(np.asarray(d_nat.qpos), np.asarray(d_pip.qpos))
  assert mjd.ncon > 0


def test_flexcomp_dim2_internal_evpairs():
  """Dim-2 flexcomp with internal collision: element-vertex pairs match
  the reference compiler exactly (evpair creation, user_mesh.cc:5643-5665,
  -1 address convention for empty flexes)."""
  xml = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <flexcomp name="sheet" type="grid" count="4 3 1" spacing="0.06 0.06 0.06"
              pos="0 0 0.2" dim="2" mass="0.4" radius="0.006">
      <edge equality="true"/>
      <contact selfcollide="none" internal="true"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  cm, mjm = _field_parity(xml)
  assert cm.flex_evpairnum[0] == 24 == mjm.flex_evpairnum[0]


def test_model_save_load_roundtrip(tmp_path):
  """Binary serialization (mj_saveModel/mj_loadModel analog,
  engine_io.c:514-640): save -> load round-trips every array byte-exactly
  and the loaded model steps identically without recompiling MJCF."""
  from mujoco_tpu.compiler import load_model, save_model
  xml = open("/root/repo/mujoco_tpu/models/assets/humanoid.xml").read()
  cm = load_xml(xml)
  path = str(tmp_path / "humanoid.mjtpu.npz")
  save_model(cm, path)
  cm2 = load_model(path)
  for k, v in vars(cm).items():
    if isinstance(v, np.ndarray):
      v2 = getattr(cm2, k)
      assert v2.dtype == v.dtype and v2.shape == v.shape, k
      np.testing.assert_array_equal(v, v2, err_msg=k)
  assert cm2.name_tables == cm.name_tables
  m1 = io.put_model(cm)
  m2 = io.put_model(cm2)
  d1 = io.make_data(m1)
  d2 = io.make_data(m2)
  step1 = jax.jit(lambda dd: forward.step(m1, dd))
  step2 = jax.jit(lambda dd: forward.step(m2, dd))
  for _ in range(50):
    d1 = step1(d1)
    d2 = step2(d2)
  np.testing.assert_array_equal(np.asarray(d1.qpos), np.asarray(d2.qpos))


def test_cable_composite():
  """<composite type="cable"> expansion (mjCComposite, user_composite.cc):
  ball-joint segment chain with capsule geoms; fields match the reference
  compiler (relative tolerance — the chain's tiny inertias make invweights
  ~2e5) and the swing trajectory is oracle-exact."""
  xml = """
<mujoco>
  <option timestep="0.003"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <composite type="cable" curve="s" count="6 1 1" size="0.5"
               offset="0 0 0.4" initial="none">
      <geom type="capsule" size="0.01"/>
      <joint kind="main" damping="0.01"/>
    </composite>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
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
      b = np.asarray(b, dtype=np.float64).reshape(a.shape)
      err = np.abs(a.astype(np.float64) - b).max()
      rel = err / max(1.0, np.abs(b).max())
    except Exception:
      bad.append((f, "shape"))
      continue
    if err > 1e-8 and rel > 1e-7:
      bad.append((f, err))
  assert not bad, bad
  assert cm.njnt == mjm.njnt == 4 and cm.nbody == 6
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-7)


def test_cable_composite_free_head():
  """initial='free' puts a free joint on the head segment; the cable falls
  and drapes on the floor."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <composite type="cable" curve="s" count="5 1 1" size="0.4"
               offset="0 0 0.3" initial="free">
      <geom type="capsule" size="0.012"/>
      <joint kind="main" damping="0.02"/>
    </composite>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert cm.nq == mjm.nq
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)


def test_replicate():
  """<replicate> meta-element (xml_native_reader.cc:2494-2562): subtree
  cloned count times with frame-accumulated offset/euler, zero-padded name
  suffixes, and referencing actuators/sensors carried along per copy.
  Field + trajectory parity vs the reference compiler."""
  xml = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom type="plane" size="4 4 .1"/>
    <replicate count="4" offset="0.5 0.1 0" euler="0 0 20" sep="-">
      <body pos="0.2 0 0.6">
        <joint name="swing" type="hinge" axis="0 1 0" damping="0.03"/>
        <geom name="rod" type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
        <site name="tip" pos="0 0 -0.3"/>
      </body>
    </replicate>
    <replicate count="12" euler="0 0 30">
      <body pos="0.9 0 0.05">
        <geom type="sphere" size="0.04" density="600"/>
      </body>
    </replicate>
  </worldbody>
  <actuator><motor joint="swing" gear="0.8"/></actuator>
  <sensor>
    <jointpos joint="swing"/>
    <framepos objtype="site" objname="tip"/>
  </sensor>
</mujoco>"""
  cm, mjm = _traj_match(
      xml, 60, 1e-9, ctrl=lambda t: 0.4 * np.sin(0.1 * t) * np.ones(4))
  assert cm.nbody == mjm.nbody == 17 and cm.nu == mjm.nu == 4
  _model_fields_match(cm, mjm)
  # copies renamed with zero-padded suffixes; references follow
  names = [mjm.joint(i).name for i in range(mjm.njnt)]
  assert names == ["swing-0", "swing-1", "swing-2", "swing-3"]


def test_msh_file_mesh(tmp_path):
  """Legacy binary MSH loading (user_mesh.cc LoadMSH:1101): header-driven
  vertex/face blocks; mass properties and mesh fields match the reference
  compiler."""
  import struct
  verts = [(0, 0, 0), (0.8, 0, 0), (0, 0.9, 0), (0, 0, 1.1),
           (0.5, 0.5, 0.7)]
  faces = [(0, 2, 1), (0, 1, 3), (0, 3, 2), (1, 2, 4), (2, 3, 4),
           (3, 1, 4)]
  with open(tmp_path / "blob.msh", "wb") as f:
    f.write(struct.pack("<4i", len(verts), 0, 0, len(faces)))
    for v in verts:
      f.write(struct.pack("<3f", *v))
    for fc in faces:
      f.write(struct.pack("<3i", *fc))
  xml = f"""
<mujoco>
  <compiler meshdir="{tmp_path}"/>
  <asset><mesh name="blob" file="blob.msh"/></asset>
  <worldbody>
    <body pos="0 0 1"><freejoint/><geom type="mesh" mesh="blob"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert cm.mesh_vertnum[0] == 5 and cm.mesh_facenum[0] == 6
  np.testing.assert_allclose(cm.body_mass, mjm.body_mass, atol=1e-6)
  np.testing.assert_allclose(cm.mesh_pos, mjm.mesh_pos, atol=1e-6)
  np.testing.assert_allclose(cm.body_inertia, mjm.body_inertia, atol=1e-6)
  np.testing.assert_allclose(cm.mesh_vert,
                             np.asarray(mjm.mesh_vert).reshape(-1, 3),
                             atol=1e-6)


def test_texture_material_assets():
  """<texture>/<material>/<visual> and extended <light> attributes:
  builtin texture synthesis byte-exact vs mjCTexture (Builtin2D/BuiltinCube
  incl. edge/cross marks, user_objects.cc:5024-5260), material tables, and
  light photometry fields match the reference compiler."""
  xml = """
<mujoco>
  <visual><headlight ambient=".2 .2 .2" diffuse=".5 .5 .5"/></visual>
  <asset>
    <texture name="grid" type="2d" builtin="checker" rgb1=".1 .2 .3"
             rgb2=".9 .8 .7" width="8" height="8" mark="edge" markrgb="1 0 0"/>
    <texture name="cgrad" type="cube" builtin="gradient" rgb1="1 0 0"
             rgb2="0 0 1" width="6" height="6"/>
    <texture name="cchk" type="cube" builtin="checker" rgb1="1 1 0"
             rgb2="0 1 1" width="4" height="4" mark="cross" markrgb=".5 .5 .5"/>
    <texture name="sky" type="skybox" builtin="flat" rgb1=".5 .6 .7"
             width="4" height="4"/>
    <texture name="g2" type="2d" builtin="gradient" rgb1=".9 .3 .1"
             rgb2=".1 .3 .9" width="5" height="7"/>
    <material name="mat" texture="grid" texrepeat="3 4" texuniform="true"
              emission=".2" specular=".6" shininess=".4" reflectance=".1"
              rgba=".2 .4 .6 1"/>
    <material name="cmat" texture="cchk"/>
    <material name="plain" rgba="1 0 1 1"/>
  </asset>
  <worldbody>
    <light pos="0 0 3" dir="0 0 -1" diffuse=".8 .7 .6" ambient=".1 .1 .2"
           specular=".3 .3 .3" attenuation="1 .1 .01" cutoff="40"
           exponent="5"/>
    <light directional="true" pos="1 0 3" dir="0 0 -1" castshadow="false"/>
    <geom type="plane" size="2 2 .1" material="mat"/>
    <body pos="0 0 1"><freejoint/>
      <geom name="s" type="sphere" size=".5" material="cmat"
            rgba=".9 .1 .1 1"/></body>
    <geom type="box" size=".2 .2 .2" pos="1 0 .2" material="plain"/>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert cm.ntex == mjm.ntex and cm.nmat == mjm.nmat
  np.testing.assert_array_equal(cm.tex_data, mjm.tex_data)
  np.testing.assert_array_equal(cm.tex_adr, mjm.tex_adr)
  np.testing.assert_array_equal(cm.geom_matid, mjm.geom_matid)
  _model_fields_match(cm, mjm, atol=1e-6)
  # <visual> headlight flows into vis_meta through put_model
  m = io.put_model(cm)
  assert m.vis_meta["headlight_ambient"] == (0.2, 0.2, 0.2)
  mo = io.put_model(mjm)
  assert mo.vis_meta["headlight_ambient"] == (
      pytest.approx(0.2), pytest.approx(0.2), pytest.approx(0.2))


def test_texture_png_file(tmp_path):
  """PNG file textures load with the reference's byte layout."""
  from PIL import Image
  rng = np.random.RandomState(3)
  img = rng.randint(0, 255, (6, 4, 3), dtype=np.uint8)
  p = tmp_path / "t.png"
  Image.fromarray(img).save(p)
  xml = f"""
<mujoco>
  <asset>
    <texture name="t" type="2d" file="{p}"/>
    <material name="m" texture="t"/>
  </asset>
  <worldbody><geom type="plane" size="1 1 .1" material="m"/></worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  np.testing.assert_array_equal(cm.tex_data, mjm.tex_data)
  np.testing.assert_array_equal(cm.tex_width, mjm.tex_width)
  np.testing.assert_array_equal(cm.tex_height, mjm.tex_height)


def test_vfs_assets_dict():
  """mjVFS analog: load_xml(xml, assets={...}) resolves <include>, mesh
  files, and texture files from memory, exactly like
  MjModel.from_xml_string(xml, assets) (engine_vfs.c + the bindings'
  assets= contract); fields match the reference compiler."""
  import struct as _struct
  obj = b"v 0 0 0\nv .3 0 0\nv 0 .3 0\nv 0 0 .3\n" \
        b"f 1 3 2\nf 1 2 4\nf 2 3 4\nf 1 4 3\n"
  inc = b"""<mujocoinclude>
    <asset><texture name="t" type="2d" builtin="flat" rgb1=".2 .4 .8"
                    width="4" height="4"/>
           <material name="m" texture="t"/></asset>
  </mujocoinclude>"""
  xml = """
<mujoco>
  <include file="sub/inc.xml"/>
  <asset><mesh name="tet" file="meshes/tet.obj"/></asset>
  <worldbody>
    <geom type="plane" size="2 2 .1" material="m"/>
    <body pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="tet"/></body>
  </worldbody>
</mujoco>"""
  assets = {"sub/inc.xml": inc, "tet.obj": obj}   # stripped-basename lookup
  cm = load_xml(xml, assets=assets)
  mjm = mujoco.MjModel.from_xml_string(xml, {"sub/inc.xml": inc,
                                             "meshes/tet.obj": obj})
  # mesh-geom geom_size holds reference-side AABB metadata; mass/inertia
  # compare at f32 mesh-storage precision (same as the file-mesh tests)
  _model_fields_match(cm, mjm, atol=1e-5,
                      skip=("geom_size", "geom_rbound"))
  np.testing.assert_allclose(cm.mesh_vert, mjm.mesh_vert, atol=2e-7)
  np.testing.assert_array_equal(cm.mesh_face, mjm.mesh_face)
  np.testing.assert_array_equal(cm.tex_data, mjm.tex_data)
  # trajectory parity for the in-memory mesh falling onto the plane
  m = io.put_model(cm)
  d = io.make_data(m)
  mjd = mujoco.MjData(mjm)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)


def test_composite_deprecations_match_reference():
  """Every non-cable composite type is a deprecation error in the reference
  too (user_composite.cc:191-224) — same message, same outcome."""
  for ctype in ("particle", "grid", "rope", "loop", "cloth"):
    xml = f"""
<mujoco><worldbody><body>
  <composite type="{ctype}" count="3 3 1"><geom size=".02"/>
  </composite></body></worldbody></mujoco>"""
    with pytest.raises(ValueError, match="deprecated"):
      load_xml(xml)
    with pytest.raises(ValueError):       # the pip oracle rejects them too
      mujoco.MjModel.from_xml_string(xml)


@pytest.mark.parametrize("fitaabb", [False, True])
def test_geom_fitting(fitaabb):
  """Primitive geoms fitted to meshes (mjCMesh::FitGeom,
  user_mesh.cc:944-1018): equivalent-inertia box or aabb mode, fitscale,
  and the mesh frame accumulation into the geom frame."""
  flag = 'fitaabb="true"' if fitaabb else ""
  xml = f"""
<mujoco>
  <compiler {flag}/>
  <asset>
    <mesh name="blob" vertex="0 0 0  .4 0 0  0 .3 0  0 0 .5  .3 .3 .3"/>
  </asset>
  <worldbody>
    <body pos="0 0 1"><freejoint/>
      <geom type="box" mesh="blob"/></body>
    <body pos="1 0 1"><freejoint/>
      <geom type="sphere" mesh="blob" fitscale="1.4"/></body>
    <body pos="2 0 1"><freejoint/>
      <geom type="capsule" mesh="blob"/></body>
    <body pos="3 0 1"><freejoint/>
      <geom type="cylinder" mesh="blob"/></body>
    <body pos="4 0 1"><freejoint/>
      <geom type="ellipsoid" mesh="blob"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  np.testing.assert_allclose(cm.geom_size, mjm.geom_size, atol=1e-6)
  np.testing.assert_allclose(cm.geom_pos, mjm.geom_pos, atol=1e-6)
  q = np.asarray(mjm.geom_quat)
  q = np.where(np.sum(q * np.asarray(cm.geom_quat), axis=1,
                      keepdims=True) < 0, -q, q)
  np.testing.assert_allclose(cm.geom_quat, q, atol=1e-6)
  # mass/inertia amplify the f32 mesh-vertex roundoff through size^3
  np.testing.assert_allclose(cm.body_mass, mjm.body_mass, rtol=1e-6)
  np.testing.assert_allclose(cm.body_inertia, mjm.body_inertia, rtol=2e-6,
                             atol=1e-9)


def test_hfield_png_and_elevation(tmp_path):
  """Hfield assets from PNG files (rows reversed, normalized to [0,1],
  mjCHField::LoadPNG/Compile) and from inline elevation data."""
  from PIL import Image
  rng = np.random.RandomState(5)
  img = rng.randint(0, 255, (5, 7), dtype=np.uint8)
  p = tmp_path / "terrain.png"
  Image.fromarray(img, mode="L").save(p)
  xml = f"""
<mujoco>
  <asset><hfield name="hf" file="{p}" size="2 2 0.3 0.1"/></asset>
  <worldbody>
    <geom type="hfield" hfield="hf"/>
    <body pos="0 0 1"><freejoint/><geom type="sphere" size=".1"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert cm.hfield_nrow[0] == mjm.hfield_nrow[0] == 5
  assert cm.hfield_ncol[0] == mjm.hfield_ncol[0] == 7
  np.testing.assert_allclose(cm.hfield_data, mjm.hfield_data, atol=1e-6)
  _traj_match(xml, 150, 1e-9)

  ele = " ".join(str(v) for v in rng.randn(12))
  xml2 = f"""
<mujoco>
  <asset><hfield name="hf" nrow="3" ncol="4" size="1 1 0.2 0.1"
                 elevation="{ele}"/></asset>
  <worldbody><geom type="hfield" hfield="hf"/></worldbody>
</mujoco>"""
  cm2 = load_xml(xml2)
  mjm2 = mujoco.MjModel.from_xml_string(xml2)
  np.testing.assert_allclose(cm2.hfield_data, mjm2.hfield_data, atol=1e-7)


def test_model_statistics():
  """mjStatistic (setStat, engine_setconst.c:1190-1340): meansize,
  meanmass, extent, center from the qpos0 bounding box and body
  characteristic lengths — drives mjv-lite glyph scaling identically for
  both load paths."""
  xml = """
<mujoco>
  <worldbody>
    <geom type="plane" size="3 2 .1"/>
    <body pos="0.4 0 0.6">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size=".05" fromto="0 0 0 .4 0 0" mass="1.2"/>
      <site name="tip" pos=".4 0 0"/>
    </body>
    <body pos="-0.5 0.3 0.3"><freejoint/>
      <geom type="box" size=".1 .15 .2" mass="0.4"/></body>
  </worldbody>
</mujoco>"""
  cm = load_xml(xml)
  mjm = mujoco.MjModel.from_xml_string(xml)
  np.testing.assert_allclose(cm.stat.meansize, mjm.stat.meansize,
                             rtol=1e-10)
  np.testing.assert_allclose(cm.stat.meanmass, mjm.stat.meanmass,
                             rtol=1e-10)
  np.testing.assert_allclose(cm.stat.extent, mjm.stat.extent, rtol=1e-10)
  np.testing.assert_allclose(cm.stat.center, mjm.stat.center, atol=1e-12)
  # vis_meta consumes it through put_model
  m = io.put_model(cm)
  assert m.vis_meta["meansize"] == pytest.approx(mjm.stat.meansize)

  # humanoid: the flagship's glyph scaling matches too
  xmlh = open("/root/repo/mujoco_tpu/models/assets/humanoid.xml").read()
  cmh = load_xml(xmlh)
  mjh = mujoco.MjModel.from_xml_string(xmlh)
  np.testing.assert_allclose(cmh.stat.meansize, mjh.stat.meansize,
                             rtol=1e-9)
  np.testing.assert_allclose(cmh.stat.extent, mjh.stat.extent, rtol=1e-9)
