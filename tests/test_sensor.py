"""Differential tests: sensors vs the C oracle at f64.

Same pattern as the reference's own sensor tests
(/root/reference/test/engine/engine_sensor_test.cc and mjx sensor_test.py):
identical model + state through both engines, allclose on sensordata.
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

from tests import models as zoo

# pendulum with a broad sensor suite: every pos/vel stage family that doesn't
# need contacts, plus acc-stage force/torque/accelerometer
SENSOR_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="b1" pos="0 0 1.2">
      <joint name="swing" type="hinge" axis="0 1 0" damping="0.08"/>
      <geom name="g1" type="capsule" size="0.04" fromto="0 0 0 0 0 -0.55"
            density="900"/>
      <site name="tip" pos="0 0 -0.55"/>
      <body name="b2" pos="0 0 -0.55">
        <joint name="elbow" type="hinge" axis="0 1 0" stiffness="1.5"
               springref="0.3" damping="0.02"/>
        <geom name="g2" type="capsule" size="0.03" fromto="0 0 0 0.02 0 -0.4"/>
        <site name="tip2" pos="0.02 0 -0.4"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="mot" joint="swing" gear="12"/>
  </actuator>
  <sensor>
    <jointpos joint="swing"/>
    <jointvel joint="elbow"/>
    <actuatorpos actuator="mot"/>
    <actuatorvel actuator="mot"/>
    <actuatorfrc actuator="mot"/>
    <jointactuatorfrc joint="swing"/>
    <framepos objtype="site" objname="tip"/>
    <framepos objtype="body" objname="b2" reftype="site" refname="tip"/>
    <framequat objtype="body" objname="b2"/>
    <framequat objtype="xbody" objname="b2" reftype="xbody" refname="b1"/>
    <framexaxis objtype="site" objname="tip"/>
    <framezaxis objtype="geom" objname="g2" reftype="body" refname="b1"/>
    <framelinvel objtype="site" objname="tip2"/>
    <frameangvel objtype="body" objname="b2"/>
    <framelinvel objtype="site" objname="tip2" reftype="body" refname="b1"/>
    <framelinacc objtype="site" objname="tip2"/>
    <frameangacc objtype="body" objname="b2"/>
    <subtreecom body="b1"/>
    <subtreelinvel body="b1"/>
    <subtreeangmom body="b1"/>
    <velocimeter site="tip2"/>
    <gyro site="tip2"/>
    <accelerometer site="tip2"/>
    <force site="tip"/>
    <torque site="tip"/>
    <magnetometer site="tip"/>
    <e_potential/>
    <e_kinetic/>
    <clock/>
  </sensor>
</mujoco>
"""

# free-falling box on a floor with touch + rangefinder + limit sensors
CONTACT_SENSOR_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="4 4 0.1"/>
    <body pos="0 0 0.08">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1"/>
      <site name="zone" type="sphere" size="0.15"/>
      <site name="rf" pos="0 0 0.0" zaxis="0 0 -1"/>
    </body>
    <body pos="1 0 0.5">
      <joint name="lim" type="hinge" axis="0 1 0" range="-0.2 0.2"
             limited="true"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <sensor>
    <touch site="zone"/>
    <rangefinder site="rf"/>
    <jointlimitpos joint="lim"/>
    <jointlimitvel joint="lim"/>
    <jointlimitfrc joint="lim"/>
  </sensor>
</mujoco>
"""


def _run_both(xml, seed, nstep=0, qvel_scale=0.4):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
  for j in range(mjm.njnt):
    adr = mjm.jnt_qposadr[j]
    if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
      mjd.qpos[adr:adr + 4] /= np.linalg.norm(mjd.qpos[adr:adr + 4])
    elif mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      mjd.qpos[adr + 3:adr + 7] /= np.linalg.norm(mjd.qpos[adr + 3:adr + 7])
  mjd.qvel[:] = qvel_scale * rng.randn(mjm.nv)
  mjd.ctrl[:] = 0.5 * rng.randn(mjm.nu)
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()),
                time=jnp.asarray(float(mjd.time)))
  d = forward.forward(m, d)
  return mjm, mjd, m, d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sensors_vs_oracle(seed):
  mjm, mjd, m, d = _run_both(SENSOR_XML, seed)
  ours = np.asarray(d.sensordata)
  theirs = np.asarray(mjd.sensordata)
  for i in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[i], mjm.sensor_dim[i]
    np.testing.assert_allclose(
        ours[adr:adr + dim], theirs[adr:adr + dim], atol=1e-9, rtol=1e-9,
        err_msg=f"sensor {i} ({mujoco.mjtSensor(mjm.sensor_type[i]).name})")


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("nstep", [0, 40])
def test_contact_sensors_vs_oracle(seed, nstep):
  mjm, mjd, m, d = _run_both(CONTACT_SENSOR_XML, seed, nstep=nstep,
                             qvel_scale=0.05)
  ours = np.asarray(d.sensordata)
  theirs = np.asarray(mjd.sensordata)
  for i in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[i], mjm.sensor_dim[i]
    np.testing.assert_allclose(
        ours[adr:adr + dim], theirs[adr:adr + dim], atol=1e-7, rtol=1e-6,
        err_msg=f"sensor {i} ({mujoco.mjtSensor(mjm.sensor_type[i]).name})")


def test_energy_enableflag():
  mjm = mujoco.MjModel.from_xml_string(zoo.PENDULUM)
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_ENERGY
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(3)
  mjd.qpos[:] = mjm.qpos0 + 0.3 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  d = forward.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.energy), mjd.energy, atol=1e-10)


CAMERA_XML = """
<mujoco>
  <worldbody>
    <body name="b1" pos="0 0 1">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0"/>
      <site name="tip" pos="0.4 0 0"/>
      <camera name="onbody" pos="0.1 0.2 0.05" euler="30 10 0"/>
    </body>
    <camera name="tracker" mode="trackcom" target="b1" pos="1 1 2"/>
    <camera name="targeter" mode="targetbody" target="b1" pos="1.5 -1 1.8"/>
    <light name="l1" mode="targetbodycom" target="b1" pos="0 0 3"/>
  </worldbody>
  <sensor>
    <framepos objtype="camera" objname="onbody"/>
    <framequat objtype="camera" objname="onbody"/>
    <framelinvel objtype="camera" objname="onbody"/>
    <camprojection site="tip" camera="targeter"/>
  </sensor>
</mujoco>
"""


@pytest.mark.parametrize("seed", [0, 1])
def test_cameras_lights(seed):
  mjm = mujoco.MjModel.from_xml_string(CAMERA_XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = 0.4 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.6 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  from mujoco_tpu.models import io as io_mod
  m = io_mod.put_model(mjm)
  d = io_mod.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  from mujoco_tpu.ops import forward as fwd
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.cam_xpos), mjd.cam_xpos,
                             atol=1e-12, err_msg="cam_xpos")
  np.testing.assert_allclose(np.asarray(d.cam_xmat),
                             mjd.cam_xmat.reshape(-1, 3, 3), atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.light_xpos), mjd.light_xpos,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.light_xdir), mjd.light_xdir,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata,
                             atol=1e-9, err_msg="camera sensors")


def test_geomdist_inside_tendonactfrc():
  """GEOMDIST/GEOMNORMAL/GEOMFROMTO, INSIDESITE, TENDONACTFRC vs oracle."""
  xml = """
  <mujoco>
    <worldbody>
      <body name="b1" pos="0 0 1">
        <joint name="j1" type="slide" axis="0 0 1"/>
        <geom name="ga" type="sphere" size="0.1" contype="0" conaffinity="0"/>
        <site name="zone" type="box" size="0.3 0.3 0.3"/>
      </body>
      <body name="b2" pos="0.35 0 1">
        <joint name="j2" type="slide" axis="1 0 0"/>
        <geom name="gb" type="sphere" size="0.08" contype="0"
              conaffinity="0"/>
        <site name="probe" pos="0 0 0"/>
      </body>
    </worldbody>
    <tendon>
      <fixed name="t1">
        <joint joint="j1" coef="1"/><joint joint="j2" coef="-0.5"/>
      </fixed>
    </tendon>
    <actuator>
      <motor tendon="t1" gear="3"/>
      <motor tendon="t1" gear="-1"/>
    </actuator>
    <sensor>
      <distance geom1="ga" geom2="gb" cutoff="2"/>
      <normal geom1="ga" geom2="gb" cutoff="2"/>
      <fromto geom1="ga" geom2="gb" cutoff="2"/>
      <insidesite site="zone" objtype="site" objname="probe"/>
      <tendonactuatorfrc tendon="t1"/>
    </sensor>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.ctrl[:] = rng.randn(2)
  mujoco.mj_forward(mjm, mjd)

  from mujoco_tpu.models import io as io_mod
  from mujoco_tpu.ops import forward as fwd
  m = io_mod.put_model(mjm)
  d = io_mod.make_data(m)
  d = d.replace(ctrl=jnp.asarray(mjd.ctrl.copy()))
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata,
                             atol=1e-9)
