"""Least-squares / IK tests (minimize.py counterpart)."""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu import minimize
from mujoco_tpu.models import io
from mujoco_tpu.ops import smooth


def test_rosenbrock_ls():
  def residual(x):
    return jnp.stack([10 * (x[1] - x[0] ** 2), 1 - x[0]])
  out = minimize.least_squares(residual, jnp.array([-1.2, 1.0]),
                               max_iter=100)
  np.testing.assert_allclose(np.asarray(out.x), [1.0, 1.0], atol=1e-6)


def test_bounded_ls():
  def residual(x):
    return x - jnp.array([2.0, -3.0])
  out = minimize.least_squares(residual, jnp.zeros(2),
                               bounds=(jnp.array([-1.0, -1.0]),
                                       jnp.array([1.0, 1.0])))
  np.testing.assert_allclose(np.asarray(out.x), [1.0, -1.0], atol=1e-8)


def test_ik_two_link():
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-150 150"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-150 150"/>
        <geom type="capsule" size="0.025" fromto="0 0 0 0.35 0 0"/>
        <site name="tip" pos="0.35 0 0"/>
      </body>
    </body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  target = np.array([0.3, 0.0, 1.35])
  out = minimize.ik(m, d, site=0, target_pos=target)
  dd = smooth.kinematics(m, d.replace(qpos=out.x))
  np.testing.assert_allclose(np.asarray(dd.site_xpos[0]), target, atol=1e-5)
