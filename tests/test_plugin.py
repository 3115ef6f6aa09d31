"""Extension registry (mjpPlugin / mjcb_* analog, mujoco_tpu/plugin.py).

Differential strategy: register pure-JAX callbacks that reproduce behaviors
the oracle can express natively (an affine gain, a spring passive force, a
frame-position sensor), compile the SAME physics two ways, and require
matching trajectories. A custom SDF shape registers without touching package
code and simulates stably.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu import plugin
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def _cleanup():
  plugin.set_actuator_callbacks()
  plugin.set_sensor_callback(None)
  plugin.set_passive_callback(None)


def test_user_actuator_gain_bias():
  """gaintype/biastype="user" callbacks reproducing gain=3, bias=-0.5*vel
  match the oracle's affine actuator."""
  native = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body><joint name="j" type="slide" axis="1 0 0" damping="0.5"/>
      <geom type="sphere" size="0.1" mass="1"/></body>
  </worldbody>
  <actuator><general joint="j" gaintype="fixed" gainprm="3"
                     biastype="affine" biasprm="0 0 -0.5"/></actuator>
</mujoco>"""
  user = native.replace('gaintype="fixed" gainprm="3"',
                        'gaintype="user"').replace(
      'biastype="affine" biasprm="0 0 -0.5"', 'biastype="user"')
  mjm = mujoco.MjModel.from_xml_string(native)
  mjd = mujoco.MjData(mjm)

  plugin.set_actuator_callbacks(
      gain=lambda m, d, i: jnp.asarray(3.0, dtype=d.qpos.dtype),
      bias=lambda m, d, i: -0.5 * d.actuator_velocity[i])
  try:
    mju = mujoco.MjModel.from_xml_string(user)
    m = io.put_model(mju)
  finally:
    _cleanup()
  d = io.make_data(m)
  step = jax.jit(lambda dd, c: forward.step(m, dd.replace(
      ctrl=jnp.asarray([c]))))
  for k in range(200):
    c = 0.6 * np.sin(0.07 * k)
    mjd.ctrl[0] = c
    mujoco.mj_step(mjm, mjd)
    d = step(d, c)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_user_sensor():
  """<user/> sensor callback returning the body height matches framepos[z]."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body name="ball" pos="0 0 0.5"><freejoint/>
      <geom type="sphere" size="0.1" mass="1"/></body>
  </worldbody>
  <sensor>
    <framepos objtype="body" objname="ball"/>
    <user dim="1" needstage="pos"/>
  </sensor>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)

  plugin.set_sensor_callback(lambda m, d, i: d.xpos[1, 2][None])
  try:
    m = io.put_model(mjm)
  finally:
    _cleanup()
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(100):
    d = step(d)
  sd = np.asarray(d.sensordata)
  np.testing.assert_allclose(sd[3], sd[2], atol=1e-14)


def test_user_passive_force():
  """A registered passive callback reproducing joint stiffness matches the
  oracle's native spring."""
  native = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <body><joint name="j" type="hinge" axis="0 1 0" stiffness="4"
                 springref="0.3"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>"""
  user = native.replace(' stiffness="4"\n                 springref="0.3"',
                        '')
  assert "stiffness" not in user
  mjm = mujoco.MjModel.from_xml_string(native)
  mjd = mujoco.MjData(mjm)

  plugin.set_passive_callback(
      lambda m, d: (-4.0 * (d.qpos - 0.3)))
  try:
    mju = mujoco.MjModel.from_xml_string(user)
    m = io.put_model(mju)
  finally:
    _cleanup()
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_custom_sdf_shape():
  """A third-party SDF (rounded octahedron) registers without touching
  package code, loads through the pip compiler's sdf machinery under a
  pre-registered plugin name, and rests stably on a plane."""
  def sd_octa(x, params):
    # params follow the borrowed attribute slots: radius = octa scale,
    # thickness = rounding — so the oracle compiler's sdf_aabb
    # (radius + thickness) covers the custom shape
    s, r = params[1], params[2]
    return (jnp.abs(x[..., 0]) + jnp.abs(x[..., 1])
            + jnp.abs(x[..., 2]) - s) * 0.57735027 - r

  # the pip oracle only accepts plugin names its own registry knows, so the
  # test borrows a registered name and overrides its distance function —
  # third-party code would use its own name with a native compiler model
  plugin.register_sdf("mujoco.sdf.bowl", sd_octa,
                      ("height", "radius", "thickness"), (0.0, 0.15, 0.02))
  xml = """
<mujoco>
  <extension>
    <plugin plugin="mujoco.sdf.bowl">
      <instance name="octa">
        <config key="height" value="0.0"/>
        <config key="radius" value="0.15"/>
        <config key="thickness" value="0.02"/>
      </instance>
    </plugin>
  </extension>
  <asset><mesh name="octa"><plugin instance="octa"/></mesh></asset>
  <option sdf_iterations="10" sdf_initpoints="20"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.6"><freejoint/>
      <geom type="sdf" mesh="octa" mass="0.4"><plugin instance="octa"/></geom>
    </body>
  </worldbody>
</mujoco>"""
  try:
    mjm = mujoco.MjModel.from_xml_string(xml)
    m = io.put_model(mjm)
  finally:
    from mujoco_tpu.ops import sdf as sdfmod
    sdfmod.PLUGIN_SDF["mujoco.sdf.bowl"] = (
        sdfmod.sd_bowl, ("height", "radius", "thickness"), (0.4, 1.0, 0.02))
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(400):
    d = step(d)
  q = np.asarray(d.qpos)
  assert np.all(np.isfinite(q))
  # rests on a face/edge/vertex of the rounded octahedron: between the
  # rounding radius and the full vertex height (0.15·0.577 + 0.02 ≈ 0.107)
  assert 0.02 < q[2] < 0.2, q[2]
