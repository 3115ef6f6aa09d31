"""Adhesion actuators (BODY transmission, mjTRN_BODY).

Differential tests vs the reference (mj_transmission mjTRN_BODY branch,
engine_core_smooth.c:1719-1810): the moment row is minus the average of the
normal Jacobians of all contacts involving the target body.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


GRIPPER = """
<mujoco>
  <option timestep="0.002" cone="%s"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body name="grip" pos="0 0 0.35">
      <joint name="lift" type="slide" axis="0 0 1" damping="5"/>
      <geom name="pad" type="box" size="0.12 0.12 0.02" mass="0.5"/>
    </body>
    <body name="obj" pos="0 0 0.12">
      <freejoint/>
      <geom name="cube" type="box" size="0.1 0.1 0.1" mass="0.2" condim="%d"/>
    </body>
  </worldbody>
  <actuator>
    <adhesion body="grip" ctrlrange="0 5" gain="30"/>
    <motor joint="lift" gear="20"/>
  </actuator>
</mujoco>"""


@pytest.mark.parametrize("cone,condim", [("pyramidal", 3), ("elliptic", 3),
                                         ("pyramidal", 1)])
def test_adhesion_grab_and_lift(cone, condim):
  """Press the pad onto the cube, switch adhesion on, lift: the cube must
  follow, and the trajectory must track the oracle."""
  xml = GRIPPER % (cone, condim)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  worst = 0.0
  for t in range(400):
    c = np.array([3.0 if t > 100 else 0.0, -0.4 if t < 120 else 0.6])
    mjd.ctrl[:] = c
    d = d.replace(ctrl=jnp.asarray(c))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    worst = max(worst, np.abs(np.asarray(d.qpos) - mjd.qpos).max())
  assert worst < 1e-9, worst
  # cube z: started at 0.12, must be lifted with the pad
  assert float(d.qpos[3]) > 0.3


def test_adhesion_moment_row():
  """actuator_moment for the adhesion actuator vs the oracle at a static
  contact-rich configuration."""
  xml = GRIPPER % ("pyramidal", 3)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[0] = -0.111  # pad pressed into the cube
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()))
  d = forward.forward(m, d)
  moment = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(moment, mjd.actuator_moment.reshape(-1),
                          mjd.moment_rownnz, mjd.moment_rowadr,
                          mjd.moment_colind.reshape(-1))
  np.testing.assert_allclose(np.asarray(d.actuator_moment), moment,
                             atol=1e-10)
