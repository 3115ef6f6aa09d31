"""Procedural editing API (MjSpec) + MJCF writer round-trips.

Differential: models built procedurally or round-tripped through to_xml are
compiled by BOTH the native compiler and the reference compiler and must
match (mjSpec/mjs_* analog, user_api.cc; writer: xml_native_writer.cc).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.compiler.spec_api import MjSpec
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def _drive_both(cm, mjm, nstep=300, ctrl=None, atol=1e-10):
  m = io.put_model(cm)
  d = io.make_data(m)
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


def _build_arm() -> MjSpec:
  spec = MjSpec()
  spec.set_option(timestep=0.003)
  spec.worldbody.add_geom(name="floor", type="plane", size=[3, 3, 0.1])
  arm = spec.worldbody.add_body(name="arm", pos=[0, 0, 0.8])
  arm.add_joint(name="shoulder", type="hinge", axis=[0, 1, 0], damping=0.1)
  arm.add_geom(type="capsule", size=[0.04], fromto=[0, 0, 0, 0.4, 0, 0])
  arm.add_site(name="tip", pos=[0.4, 0, 0.05])
  fore = arm.add_body(name="fore", pos=[0.4, 0, 0])
  fore.add_joint(name="elbow", type="hinge", axis=[0, 1, 0], damping=0.05,
                 limited=True, range=[-120, 10])
  fore.add_geom(type="capsule", size=[0.03], fromto=[0, 0, 0, 0.3, 0, 0])
  spec.worldbody.add_site(name="anchor", pos=[0, 0, 1.4])
  spec.add_actuator("motor", joint="shoulder", gear=[2], ctrlrange=[-1, 1])
  spec.add_actuator("position", joint="elbow", kp=20, kv=0.5)
  spec.add_tendon("spatial", name="t", stiffness=15, damping=0.2,
                  path=[("site", {"site": "anchor"}),
                        ("site", {"site": "tip"})])
  spec.add_sensor("jointpos", joint="shoulder")
  spec.add_sensor("tendonpos", tendon="t")
  return spec


def test_procedural_build_compiles_and_matches():
  """Spec-built model: native compile vs reference compile of the written
  XML agree over a driven trajectory."""
  spec = _build_arm()
  cm = spec.compile()
  mjm = mujoco.MjModel.from_xml_string(spec.to_xml())
  assert cm.nq == mjm.nq and cm.nu == mjm.nu and cm.ntendon == mjm.ntendon
  _drive_both(cm, mjm, ctrl=lambda t: np.array([np.sin(0.05 * t), 0.3]),
              atol=1e-10)


def test_roundtrip_parse_edit_write():
  """from_xml -> edit -> to_xml -> reference compiler: edits land."""
  xml = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body name="b" pos="0 0 0.5">
      <joint name="j" type="hinge" axis="0 1 0"/>
      <geom name="g" type="capsule" size="0.03" fromto="0 0 0 0.25 0 0"/>
    </body>
  </worldbody>
</mujoco>"""
  spec = MjSpec.from_xml(xml)
  spec.find("j").set(damping=0.7)
  spec.find("b").add_body(name="tip", pos=[0.25, 0, 0]) \
      .add_geom(type="sphere", size=[0.05], mass=0.2)
  spec.add_actuator("motor", joint="j")
  out = spec.to_xml()
  mjm = mujoco.MjModel.from_xml_string(out)
  assert mjm.nbody == 3 and mjm.nu == 1
  assert mjm.dof_damping[0] == 0.7
  cm = spec.compile()
  _drive_both(cm, mjm, ctrl=lambda t: np.array([0.4]), atol=1e-11)


def test_delete_element():
  spec = _build_arm()
  # deleting the forearm subtree orphans the elbow actuator: the compiler
  # must refuse the dangling reference, and succeed once it is removed too
  arm = spec.find("arm")
  arm.delete(spec.find("fore"))
  with pytest.raises(Exception):
    spec.compile()
  spec.delete(MjsElement_for_kind(spec, "position"))
  cm = spec.compile()
  assert cm.njnt == 1  # elbow gone with the subtree


def MjsElement_for_kind(spec, kind):
  from mujoco_tpu.compiler.spec_api import MjsElement
  for el in spec.spec.actuators:
    if el.kind == kind:
      return MjsElement(el)
  raise KeyError(kind)


def test_attach_with_prefix():
  """mjs_attach namespacing: two copies of a sub-spec coexist; references
  (actuators, tendons, sensors) follow the renamed elements."""
  part = MjSpec()
  pend = part.worldbody.add_body(name="pend", pos=[0, 0, 0.6])
  pend.add_joint(name="swing", type="hinge", axis=[0, 1, 0], damping=0.05)
  pend.add_geom(type="capsule", size=[0.03], fromto=[0, 0, 0, 0.3, 0, 0])
  part.add_actuator("motor", joint="swing")
  part.add_sensor("jointpos", joint="swing")

  scene = MjSpec()
  scene.set_option(timestep=0.004)
  scene.worldbody.add_geom(type="plane", size=[3, 3, 0.1])
  scene.attach(part, prefix="left_")
  scene.attach(part, prefix="right_")
  scene.find("right_pend").set(pos=[1, 0, 0.6])

  cm = scene.compile()
  mjm = mujoco.MjModel.from_xml_string(scene.to_xml())
  assert cm.nu == 2 and cm.njnt == 2
  assert mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_JOINT, "left_swing") >= 0
  _drive_both(cm, mjm, ctrl=lambda t: np.array([0.3, -0.3]), atol=1e-11)


def test_edit_time_validation():
  """mjs_set*-style typed validation at edit time (generated from the
  reference's mjcf.schema): unknown attributes (with did-you-mean), wrong
  numeric arity, bad enum keywords, and bad bools all raise immediately."""
  spec = MjSpec()
  b = spec.worldbody.add_body(name="b", pos=[0, 0, 1])
  with pytest.raises(ValueError, match="did you mean 'pos'"):
    b.add_geom(type="sphere", size=[0.1], poss=[1, 2, 3])
  with pytest.raises(ValueError, match="expected 1..3 values"):
    b.add_geom(type="sphere", size=[0.1, 0.2, 0.3, 0.4])
  with pytest.raises(ValueError, match="not one of"):
    b.add_geom(type="blob", size=[0.1])
  with pytest.raises(ValueError, match="no attribute"):
    b.add_joint(type="hinge", axes=[0, 1, 0])
  with pytest.raises(ValueError, match="non-numeric"):
    b.add_geom(type="sphere", size="tiny")
  with pytest.raises(ValueError):
    spec.set_option(timestp=0.001)
  with pytest.raises(ValueError, match="not one of"):
    spec.set_flag(sleep="on")       # must be enable/disable
  g = b.add_geom(type="sphere", size=[0.1])
  with pytest.raises(ValueError):
    g.set(rgba=[1, 0, 0])           # rgba is float[4]
  g.set(rgba=[1, 0, 0, 1])          # correct arity passes
  spec.set_option(timestep=0.002)
  spec.set_flag(sleep="enable")
  m = spec.compile()
  assert m.ngeom == 1
