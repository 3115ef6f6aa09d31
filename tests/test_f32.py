"""f32 tolerance ladder (VERDICT r1 item 6 / BASELINE.md north star:
"within tolerance at f32").

The bench runs f32 on TPU; these tests pin down the f32 behavior on CPU:
single-pass stage outputs stay within f32-roundoff of the f64 oracle, and
contact-free trajectories track within an f32-appropriate tolerance.
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io, zoo
from mujoco_tpu.ops import forward


def test_f32_forward_stage_tolerances():
  """One forward() pass at f32 vs the f64 oracle: per-stage outputs within
  f32 roundoff-scaled tolerances."""
  mjm = zoo.load_mj("humanoid")
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qvel[:] = 0.1 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm, dtype=jnp.float32)
  d = io.make_data(m, dtype=jnp.float32)
  d = d.replace(qvel=jnp.asarray(mjd.qvel, dtype=jnp.float32))
  d = forward.forward(m, d)
  assert d.qpos.dtype == jnp.float32

  np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=5e-6,
                             err_msg="FK @ f32")
  np.testing.assert_allclose(np.asarray(d.qM), _fullm(mjm, mjd), atol=1e-4,
                             err_msg="CRB @ f32")
  np.testing.assert_allclose(np.asarray(d.qfrc_bias), mjd.qfrc_bias,
                             atol=5e-4, err_msg="RNE @ f32")
  # accelerations: scale-aware tolerance (qacc ~ 10..100)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, rtol=5e-3,
                             atol=5e-2, err_msg="qacc @ f32")


def _fullm(mjm, mjd):
  out = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, out)
  return out


def test_f32_contact_free_trajectory():
  """Contact-free double pendulum at f32: 500-step drift bounded by f32
  roundoff growth (the BASELINE 'within tolerance at f32' metric)."""
  xml = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <body pos="0 0 1.2">
      <joint type="hinge" axis="0 1 0" damping="0.08"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0 0 -0.5"/>
      <body pos="0 0 -0.5">
        <joint type="hinge" axis="0 1 0" damping="0.02"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.02 0 -0.4"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.6, -0.3]
  mujoco.mj_forward(mjm, mjd)

  m = io.put_model(mjm, dtype=jnp.float32)
  d = io.make_data(m, dtype=jnp.float32)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, dtype=jnp.float32))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=2e-3,
                             err_msg="f32 500-step contact-free drift")


def test_f32_humanoid_stays_physical():
  """Contact-rich humanoid at f32: 300 steps stay finite and track the
  oracle's gross state (chaotic divergence bounded, no blowup)."""
  mjm = zoo.load_mj("humanoid")
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm, dtype=jnp.float32)
  d = io.make_data(m, dtype=jnp.float32)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  q = np.asarray(d.qpos)
  assert np.isfinite(q).all()
  # root height within 10 cm of the oracle after 1.5 s of settling
  assert abs(q[2] - mjd.qpos[2]) < 0.1


def test_f32_interp_flex_and_render():
  """Round-3 features at f32 (the bench precision): an interpolated FEM gel
  steps finite and close to the f64 result; a textured/lit/shadowed render
  stays in range and matches f64 within display precision."""
  from mujoco_tpu.ops import render
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <texture name="grid" type="2d" builtin="checker" rgb1="1 0 0"
             rgb2="0 0 1" width="8" height="8"/>
    <material name="floor" texture="grid" texrepeat="4 4"/>
  </asset>
  <worldbody>
    <light pos="1 1 3" dir="-.3 -.3 -1" diffuse=".8 .8 .8"/>
    <geom type="plane" size="3 3 .1" material="floor"/>
    <flexcomp name="gel" type="grid" dim="3" count="3 3 3"
              spacing="0.1 0.1 0.1" pos="0 0 0.3" mass="1" dof="trilinear">
      <elasticity young="2e4" poisson="0.2" damping="0.01"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
    <camera name="c" pos="0 -1.5 1" xyaxes="1 0 0 0 .5 .87"/>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)

  def run(dtype):
    m = io.put_model(mjm, dtype=dtype)
    d = io.make_data(m, dtype=dtype)
    step = jax.jit(lambda dd: forward.step(m, dd))
    for _ in range(150):
      d = step(d)
    rgb, depth, seg = jax.jit(
        lambda dd: render.render(m, dd, 0, 32, 24, shadows=True))(d)
    return np.asarray(d.qpos), np.asarray(rgb), np.asarray(seg)

  q32, rgb32, seg32 = run(jnp.float32)
  q64, rgb64, seg64 = run(jnp.float64)
  assert np.isfinite(q32).all()
  np.testing.assert_allclose(q32, q64, atol=2e-3)   # soft contact, 150 steps
  assert rgb32.min() >= 0 and rgb32.max() <= 1
  # images agree except at silhouette pixels where rays graze edges
  close = np.abs(rgb32 - rgb64) < 0.12
  assert close.mean() > 0.97
