"""Tests for the parallel layer: sharded stepping, domain randomization,
rollout (VERDICT r1 item 6 — this layer previously had thin coverage).

Runs on the conftest's virtual 8-device CPU mesh.
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io, zoo
from mujoco_tpu.ops import forward
from mujoco_tpu.parallel import rollout as par


def test_sharded_step_matches_unsharded():
  """Mesh-sharded stepping is bitwise-identical to plain vmap stepping."""
  assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
  m = zoo.humanoid()
  nbatch = 16
  d = par.make_batch(m, nbatch)
  key = jax.random.PRNGKey(0)
  d = d.replace(qpos=d.qpos + 0.01 * jax.random.normal(
      key, d.qpos.shape, dtype=d.qpos.dtype))

  mesh = par.make_mesh()
  step_fn, shard_data = par.sharded_step(m, mesh)
  ds = shard_data(d)
  for _ in range(5):
    ds = step_fn(ds)

  du = d
  plain = jax.jit(jax.vmap(lambda dd: forward.step(m, dd)))
  for _ in range(5):
    du = plain(du)

  # partitioned compilation changes XLA fusion decisions, so results agree
  # to FP-reassociation roundoff (observed ~1e-16), not bitwise
  np.testing.assert_allclose(np.asarray(ds.qpos), np.asarray(du.qpos),
                             atol=1e-12, rtol=1e-12,
                             err_msg="sharded vs unsharded")
  np.testing.assert_allclose(np.asarray(ds.qvel), np.asarray(du.qvel),
                             atol=1e-12, rtol=1e-12)
  # and data actually lives sharded over the mesh
  assert len(ds.qpos.sharding.device_set) == 8


def test_rollout_matches_stepping():
  """rollout() scan equals sequential stepping; trajectory shape correct."""
  m = zoo.humanoid()
  nbatch = 4
  nstep = 10
  d0 = par.make_batch(m, nbatch)
  d_final, traj = jax.jit(
      lambda dd: par.rollout(m, dd, nstep))(d0)
  assert traj.shape == (nstep, nbatch, m.nq)

  d = d0
  step = jax.jit(jax.vmap(lambda dd: forward.step(m, dd)))
  for _ in range(nstep):
    d = step(d)
  np.testing.assert_array_equal(np.asarray(d_final.qpos), np.asarray(d.qpos))
  np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(d.qpos))


def test_domain_randomized_gravity_vs_oracle():
  """Per-env model leaves (randomize_model/step_randomized) give each env
  its own physics; every env matches an oracle run with that parameter."""
  xml = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <body pos="0 0 1"><joint type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  nbatch = 4
  gravities = np.stack([[0, 0, -9.81 * s] for s in (0.5, 1.0, 1.5, 2.0)])
  bm, axes = par.randomize_model(
      m, {"opt": m.opt.replace(gravity=jnp.asarray(gravities))})
  d = par.make_batch(m, nbatch)
  step = jax.jit(lambda dd: par.step_randomized(bm, axes, dd))
  for _ in range(100):
    d = step(d)

  for i, s in enumerate((0.5, 1.0, 1.5, 2.0)):
    mjm.opt.gravity[:] = [0, 0, -9.81 * s]
    mjd = mujoco.MjData(mjm)
    for _ in range(100):
      mujoco.mj_step(mjm, mjd)
    np.testing.assert_allclose(np.asarray(d.qpos[i]), mjd.qpos, atol=1e-10,
                               err_msg=f"env {i} (gravity scale {s})")


def test_scan_steps_matches_full_carry():
  """rollout.scan_steps (slim state carry) is bit-identical to scanning the
  full Data pytree."""
  import mujoco
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.25"><freejoint/><geom type="box" size=".1 .1 .1"/></body>
    <body pos="0.5 0 0.4">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j"/></actuator>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  nb, nstep = 3, 40
  d0 = par.make_batch(m, nb)
  key = jax.random.PRNGKey(1)
  d0 = d0.replace(qvel=0.2 * jax.random.normal(key, d0.qvel.shape,
                                               dtype=d0.qvel.dtype))
  d_fresh = io.make_data(m)

  step = jax.vmap(lambda dd: forward.step(m, dd))

  @jax.jit
  def run_full(d):
    def body(dd, _):
      dd = step(dd)
      dd = par.check_reset(m, dd, d_fresh)
      return dd, ()
    d, _ = jax.lax.scan(body, d, None, length=nstep)
    return d

  @jax.jit
  def run_slim(d):
    return par.scan_steps(m, d, nstep, d_fresh=d_fresh, check=True)

  df = run_full(d0)
  ds = run_slim(d0)
  np.testing.assert_array_equal(np.asarray(df.qpos), np.asarray(ds.qpos))
  np.testing.assert_array_equal(np.asarray(df.qvel), np.asarray(ds.qvel))
  np.testing.assert_array_equal(np.asarray(df.qacc_warmstart),
                                np.asarray(ds.qacc_warmstart))
