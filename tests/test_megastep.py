"""Whole-step megakernel (ops/megastep_tpu) correctness on CPU.

The physics body (_lane_step) is pure jnp on lane-layout values, so it is
differentially tested directly against forward.step; the Pallas wrapper is
exercised in interpret mode (slow — kept to 2 steps). Reference semantics:
mj_step (engine_forward.c:1849) for the supported model class.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_tpu.models import io, zoo
from mujoco_tpu.models.types import DisableBit
from mujoco_tpu.ops import forward, megastep_tpu as mega
from mujoco_tpu.parallel import rollout as par


def _perturbed_batch(m, B, qscale=0.05, vscale=0.5, cscale=0.3):
  d = par.make_batch(m, B)
  d = d.replace(
      qpos=d.qpos + qscale * jax.random.normal(
          jax.random.PRNGKey(0), d.qpos.shape, dtype=d.qpos.dtype),
      qvel=d.qvel + vscale * jax.random.normal(
          jax.random.PRNGKey(1), d.qvel.shape, dtype=d.qvel.dtype),
      ctrl=cscale * jax.random.normal(
          jax.random.PRNGKey(2), d.ctrl.shape, dtype=d.ctrl.dtype))
  return d


# slide joints + joint springs + sphere-sphere/sphere-capsule/
# capsule-capsule contacts + ctrl/force clamps: the supported()-class
# branches no zoo model exercises
_MIXED_XML = """
<mujoco>
  <option timestep="0.004" solver="Newton" iterations="2" ls_iterations="6"/>
  <worldbody>
    <geom type="plane" size="4 4 .1" contype="1" conaffinity="3"/>
    <body pos="0 0 0.6">
      <freejoint/>
      <geom type="capsule" size=".06 .15" euler="20 30 0"/>
      <body pos="0.05 0 0.3">
        <joint type="slide" axis="0 0 1" stiffness="80" damping="2"
               range="-.2 .2" springref="0.05"/>
        <geom type="sphere" size=".07"/>
      </body>
    </body>
    <body pos="0.12 0.03 1.1">
      <freejoint/>
      <geom type="capsule" size=".05 .12"/>
    </body>
    <body pos="-0.25 0 0.9">
      <freejoint/>
      <geom type="sphere" size=".08"/>
    </body>
    <body pos="0.5 0 0.5">
      <freejoint/>
      <!-- box collides only with the plane (sphere-box / capsule-box are
           outside the megastep class) -->
      <geom type="box" size=".1 .08 .06" euler="5 10 20"
            contype="2" conaffinity="2"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="{j}" ctrlrange="-1 1" ctrllimited="true"
           forcerange="-50 50" gear="30"/>
  </actuator>
</mujoco>
"""


def _mixed_model(disable=0):
  import mujoco
  xml = _MIXED_XML.replace('joint="{j}"', 'joint="slider"').replace(
      '<joint type="slide"', '<joint name="slider" type="slide"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  # single kinematic chain per body: multi-tree -> disable islands so the
  # XLA path is monolithic like the kernel
  mjm.opt.disableflags |= int(DisableBit.ISLAND) | int(disable)
  return io.put_model(mjm)


def test_supported_gate(monkeypatch):
  m = zoo.humanoid()
  assert mega.supported(m)
  # outside the class: RK4 integrator
  from mujoco_tpu.models.types import Integrator
  m2 = m.replace(opt=m.opt.replace(integrator=int(Integrator.RK4)))
  assert not mega.supported(m2)
  # island-decomposed scenes stay on the XLA path (the kernel is the
  # monolithic solve); with the TPU size gate at 0 the multi-tree scene
  # islands by default and is excluded — disabling islands re-admits it.
  # At the default gate (islands only engage for nv >= 256) the same
  # model is kernel-admissible as-is.
  m3 = zoo.multi_humanoid(2)
  monkeypatch.setenv("MJTPU_ISLAND_MIN_NV", "0")
  assert not mega.supported(m3)
  m4 = m3.replace(opt=m3.opt.replace(
      disableflags=int(m3.opt.disableflags) | int(DisableBit.ISLAND)))
  assert mega.supported(m4)
  monkeypatch.setenv("MJTPU_ISLAND_MIN_NV", "256")
  assert mega.supported(m3)    # default gate: monolithic -> kernel-class
  # the widened class admits the quadruped (plane-box + eulerdamp)
  assert mega.supported(zoo.quadruped())
  assert mega.supported(_mixed_model())


def _islands_off(m):
  return m.replace(opt=m.opt.replace(
      disableflags=int(m.opt.disableflags) | int(DisableBit.ISLAND)))


# sphere dropped onto a free box on the plane: sphere-box + plane-box
_SPHEREBOX_XML = """
<mujoco>
  <option timestep="0.004" solver="Newton" iterations="2" ls_iterations="6"/>
  <worldbody>
    <geom type="plane" size="4 4 .1"/>
    <body pos="0 0 0.2">
      <freejoint/>
      <geom type="box" size=".15 .12 .1" euler="0 0 15"/>
    </body>
    <body pos="0.05 0.02 0.6">
      <freejoint/>
      <geom type="sphere" size=".08"/>
    </body>
  </worldbody>
</mujoco>
"""


def _spherebox_model():
  import mujoco
  mjm = mujoco.MjModel.from_xml_string(_SPHEREBOX_XML)
  mjm.opt.disableflags |= int(DisableBit.ISLAND)
  return io.put_model(mjm)


@pytest.mark.parametrize("name", [
    "humanoid", "quadruped", "multi_humanoid", "mixed", "spherebox",
    "mixed_nolimit", "mixed_noclampctrl", "mixed_nogravity"])
def test_lane_step_matches_forward_step(name):
  m = {
      "humanoid": zoo.humanoid,
      "quadruped": zoo.quadruped,
      "multi_humanoid": lambda: _islands_off(zoo.multi_humanoid(2)),
      "mixed": _mixed_model,
      "spherebox": _spherebox_model,
      "mixed_nolimit": lambda: _mixed_model(DisableBit.LIMIT),
      "mixed_noclampctrl": lambda: _mixed_model(DisableBit.CLAMPCTRL),
      "mixed_nogravity": lambda: _mixed_model(DisableBit.GRAVITY),
  }[name]()
  assert mega.supported(m), name
  B = 8
  d = _perturbed_batch(m, B)
  d1 = jax.vmap(lambda dd: forward.step(m, dd))(d)
  mt = mega._meta(m)
  consts = mega.make_consts(mt, jnp.float64)
  t = lambda x: jnp.transpose(x, (1, 0))
  qp, qv, warm, qacc = mega._lane_step(
      mt, consts, t(d.qpos), t(d.qvel), t(d.ctrl), t(d.qacc_warmstart),
      t(d.qfrc_applied), t(d.xfrc_applied.reshape(B, -1)), jnp.float64)
  np.testing.assert_allclose(np.asarray(t(qp)), np.asarray(d1.qpos),
                             rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(t(qv)), np.asarray(d1.qvel),
                             rtol=1e-8, atol=1e-8)
  np.testing.assert_allclose(np.asarray(t(qacc)), np.asarray(d1.qacc),
                             rtol=1e-6, atol=1e-6)


def test_lane_step_with_xfrc_and_applied():
  m = zoo.humanoid()
  B = 4
  d = _perturbed_batch(m, B, vscale=0.1)
  d = d.replace(
      qfrc_applied=0.5 * jax.random.normal(
          jax.random.PRNGKey(5), d.qfrc_applied.shape, d.qfrc_applied.dtype),
      xfrc_applied=2.0 * jax.random.normal(
          jax.random.PRNGKey(6), d.xfrc_applied.shape, d.xfrc_applied.dtype))
  d1 = jax.vmap(lambda dd: forward.step(m, dd))(d)
  mt = mega._meta(m)
  consts = mega.make_consts(mt, jnp.float64)
  t = lambda x: jnp.transpose(x, (1, 0))
  qp, qv, _, _ = mega._lane_step(
      mt, consts, t(d.qpos), t(d.qvel), t(d.ctrl), t(d.qacc_warmstart),
      t(d.qfrc_applied), t(d.xfrc_applied.reshape(B, -1)), jnp.float64)
  np.testing.assert_allclose(np.asarray(t(qp)), np.asarray(d1.qpos),
                             rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(t(qv)), np.asarray(d1.qvel),
                             rtol=1e-8, atol=1e-8)


def test_scan_batch_interpret_matches_scan_steps():
  m = zoo.humanoid()
  B, nstep = 4, 2
  d = par.make_batch(m, B)
  d = d.replace(qpos=d.qpos + 0.03 * jax.random.normal(
      jax.random.PRNGKey(0), d.qpos.shape, dtype=d.qpos.dtype),
                ctrl=0.2 * jax.random.normal(
      jax.random.PRNGKey(2), d.ctrl.shape, dtype=d.ctrl.dtype))
  d_fresh = io.make_data(m)
  ref = par.scan_steps(m, d, nstep, d_fresh=d_fresh, check=True)
  out = mega.scan_batch(m, d, nstep, d_fresh=d_fresh, check=True,
                        interpret=True)
  np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                             rtol=1e-12, atol=1e-12)
  np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel),
                             rtol=1e-10, atol=1e-10)
  np.testing.assert_allclose(np.asarray(out.time), np.asarray(ref.time),
                             rtol=0, atol=1e-12)


def test_check_reset_lane():
  m = zoo.humanoid()
  mt = mega._meta(m)
  consts = mega.make_consts(mt, jnp.float64)
  L = 4
  qpos = jnp.zeros((mt.nq, L), jnp.float64).at[2, 1].set(jnp.nan)
  qvel = jnp.zeros((mt.nv, L), jnp.float64).at[0, 2].set(1e12)
  ctrl = jnp.ones((mt.nu, L), jnp.float64)
  warm = jnp.ones((mt.nv, L), jnp.float64)
  qacc = jnp.ones((mt.nv, L), jnp.float64)
  time = jnp.full((1, L), 3.0)
  qp, qv, ct, wa, qa, tm = mega._check_reset_lane(
      mt, consts, qpos, qvel, ctrl, warm, qacc, time)
  # envs 1 and 2 reset to fresh state; envs 0, 3 untouched
  assert np.allclose(np.asarray(qp[:, 1]), mt.fresh_qpos)
  assert np.allclose(np.asarray(qv[:, 2]), 0.0)
  assert float(tm[0, 1]) == 0.0 and float(tm[0, 0]) == 3.0
  assert np.allclose(np.asarray(qp[:, 0]), np.asarray(qpos[:, 0]))
  assert np.allclose(np.asarray(wa[:, 3]), 1.0)
