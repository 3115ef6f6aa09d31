"""System identification toolkit: recover physical parameters from
trajectories by differentiating through the rollout (mujoco_tpu.sysid).
Ground truth comes from the reference engine, so the fit also certifies
cross-engine consistency."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu import sysid
from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.31"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" density="900"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.12"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="j1" gear="2"/><motor joint="j2"/></actuator>
</mujoco>"""


def _observed(mjm, ctrls):
  mjd = mujoco.MjData(mjm)
  out = []
  for u in ctrls:
    mjd.ctrl[:] = u
    mujoco.mj_step(mjm, mjd)
    out.append(mjd.qpos.copy())
  return np.stack(out)


def test_recover_joint_damping():
  """Recover both joint dampings from a 120-step driven swing, starting
  from wrong values; the fit must land on the true parameters."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  rng = np.random.RandomState(0)
  ctrls = 0.4 * np.sin(0.11 * np.arange(120))[:, None] * np.array([1., -0.6])
  observed = _observed(mjm, ctrls)

  m = io.put_model(mjm)
  d0 = io.make_data(m)
  spec = [("dof_damping", None)]
  # start from wrong damping
  m_wrong = sysid.apply_params(m, spec, jnp.array([1.5, 0.7]))
  res = jax.jit(lambda: sysid.fit(m_wrong, d0, ctrls, observed, spec,
                                  max_iter=20))()
  x = np.asarray(res.x)
  np.testing.assert_allclose(x, [0.31, 0.12], atol=1e-6)


def test_recover_body_mass():
  """Recover the distal body's mass (gravity + inertial coupling signal)."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  true_mass = float(mjm.body_mass[2])
  ctrls = 0.5 * np.cos(0.07 * np.arange(100))[:, None] * np.array([1.0, 0.3])
  observed = _observed(mjm, ctrls)

  m = io.put_model(mjm)
  d0 = io.make_data(m)
  spec = [("body_mass", [2])]
  m_wrong = sysid.apply_params(m, spec, jnp.array([2.5 * true_mass]))
  res = jax.jit(lambda: sysid.fit(m_wrong, d0, ctrls, observed, spec,
                                  max_iter=25))()
  np.testing.assert_allclose(float(res.x[0]), true_mass, rtol=1e-4)


def test_simulate_matches_step_loop():
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = io.put_model(mjm)
  d0 = io.make_data(m)
  ctrls = jnp.asarray(0.2 * np.ones((30, 2)))
  traj = sysid.simulate(m, d0, ctrls)
  d = d0
  for t in range(30):
    d = forward.step(m, d.replace(ctrl=ctrls[t]))
  # scan vs eager loop fuse differently; agreement to fp roundoff
  np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(d.qpos),
                             atol=1e-12)
