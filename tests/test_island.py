"""Island-decomposed constraint solving (ops/island.py).

Differential strategy: the island solve must reproduce (a) the monolithic
solve on the same model to solver-convergence tolerance, and (b) the C
oracle, which itself solves per island by default (mjDSBL_ISLAND clear,
engine_forward.c:1190). Covers the sound-budget path (static decoupling),
the tight-budget path with runtime-separate islands, and the lax.cond
monolithic fallback when runtime islands outgrow the budget.
"""

import os

# exercise the island machinery regardless of the TPU size gate
# (use_islands' MJTPU_ISLAND_MIN_NV default, measured in ROADMAP round 5)
os.environ["MJTPU_ISLAND_MIN_NV"] = "0"

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_tpu.models import io, zoo
from mujoco_tpu.models.types import DisableBit
from mujoco_tpu.ops import forward, island

TWO_BOX_EXCLUDED = """
<mujoco>
  <option solver="Newton" cone="pyramidal" iterations="20" tolerance="1e-12"/>
  <worldbody>
    <geom type="plane" size="10 10 1" contype="2" conaffinity="1"/>
    <body pos="-1 0 0.3">
      <freejoint/>
      <geom type="box" size=".1 .1 .1" contype="1" conaffinity="2"/>
    </body>
    <body pos="1 0 0.3">
      <freejoint/>
      <geom type="box" size=".1 .12 .09" contype="1" conaffinity="2"/>
    </body>
  </worldbody>
</mujoco>
"""

TWO_BOX_OPEN = """
<mujoco>
  <option solver="Newton" cone="pyramidal" iterations="20" tolerance="1e-12"/>
  <worldbody>
    <geom type="plane" size="10 10 1"/>
    <body pos="-.5 0 0.1"><freejoint/><geom type="box" size=".1 .1 .1"/></body>
    <body pos=".5 0 0.1"><freejoint/><geom type="box" size=".1 .12 .09"/></body>
  </worldbody>
</mujoco>
"""


def _mono(m):
  return m.replace(opt=m.opt.replace(
      disableflags=m.opt.disableflags | DisableBit.ISLAND))


def _run(m, nstep, qvel0=None):
  d = io.make_data(m, dtype=jnp.float64)
  if qvel0 is not None:
    d = d.replace(qvel=jnp.asarray(qvel0, dtype=jnp.float64))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(nstep):
    d = step(d)
  return np.asarray(d.qpos)


def test_static_decoupled_vs_mono_and_oracle():
  """Contype-excluded boxes form two static components; the island solve
  is used, matches the monolithic solve and the oracle."""
  mjm = mujoco.MjModel.from_xml_string(TWO_BOX_EXCLUDED)
  m = io.put_model(mjm, dtype=jnp.float64)
  assert island.use_islands(m)
  b, r, fb = island._budgets(m)
  assert (b, fb) == (6, False)
  assert np.array_equal(island._static_components(m), [0, 1])

  qv0 = np.zeros(m.nv)
  qv0[0], qv0[7] = 0.3, -0.2
  qpos_isl = _run(m, 400, qv0)
  qpos_mono = _run(_mono(m), 400, qv0)
  assert not island.use_islands(_mono(m))
  np.testing.assert_allclose(qpos_isl, qpos_mono, atol=1e-10)

  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = qv0
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  assert mjd.ncon > 0
  np.testing.assert_allclose(qpos_isl, mjd.qpos, atol=1e-10)


def test_tight_budget_and_fallback(monkeypatch):
  """Boxes that CAN touch: single static component. A tight budget opts
  into dynamic islands; when the boxes actually collide the runtime
  islands merge and the lax.cond fallback reproduces the monolithic
  solve."""
  monkeypatch.setenv("MJTPU_ISLAND_NV", "6")
  monkeypatch.setenv("MJTPU_ISLAND_EFC", "40")
  mjm = mujoco.MjModel.from_xml_string(TWO_BOX_OPEN)
  m = io.put_model(mjm, dtype=jnp.float64)
  b, r, fb = island._budgets(m)
  assert (b, r, fb) == (6, 40, True)
  assert island.use_islands(m)

  d = io.make_data(m, dtype=jnp.float64)
  m_mono = _mono(m)
  d2 = io.make_data(m_mono, dtype=jnp.float64)
  step = jax.jit(lambda dd: forward.step(m, dd))
  step2 = jax.jit(lambda dd: forward.step(m_mono, dd))
  mjd = mujoco.MjData(mjm)

  # phase 1: apart — separate runtime islands, no overflow
  for _ in range(300):
    d, d2 = step(d), step2(d2)
    mujoco.mj_step(mjm, mjd)
  dd = forward.fwd_velocity(m, forward.fwd_position(m, d))
  labels = island._solver_labels(m, dd)
  _, _, _, overflow = island._gather_problems(m, dd, labels, b, r)
  assert not bool(overflow)
  np.testing.assert_allclose(np.asarray(d.qpos), np.asarray(d2.qpos),
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)

  # phase 2: slide box 1 into box 2 — islands merge, dof budget overflows,
  # the fallback branch must take over (bitwise-identical to monolithic)
  qv = np.zeros(m.nv)
  qv[0] = 2.0
  d = d.replace(qvel=jnp.asarray(qv))
  d2 = d2.replace(qvel=jnp.asarray(qv))
  mjd.qvel[:] = qv
  for _ in range(200):
    d, d2 = step(d), step2(d2)
    mujoco.mj_step(mjm, mjd)
  dd = forward.fwd_velocity(m, forward.fwd_position(m, d))
  np.testing.assert_allclose(np.asarray(d.qpos), np.asarray(d2.qpos),
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_multi_humanoid_islands():
  """The BASELINE config-5 scene class: n humanoids in ONE scene decompose
  into per-robot islands with sound budgets (no fallback), and the island
  trajectory tracks the monolithic one."""
  m = zoo.multi_humanoid(3)
  assert m.ntree == 3
  b, r, fb = island._budgets(m)
  assert b * 3 == m.nv and not fb
  assert island.use_islands(m)

  qpos_isl = _run(m, 30)
  qpos_mono = _run(_mono(m), 30)
  assert np.isfinite(qpos_isl).all()
  np.testing.assert_allclose(qpos_isl, qpos_mono, atol=1e-9)


def test_island_dispatch_exclusions():
  """Monolithic fallback for elliptic cones and single-tree models."""
  mjm = mujoco.MjModel.from_xml_string(TWO_BOX_EXCLUDED)
  mjm.opt.cone = mujoco.mjtCone.mjCONE_ELLIPTIC
  m = io.put_model(mjm, dtype=jnp.float64)
  assert not island.use_islands(m)

  m1 = zoo.humanoid(dtype=jnp.float64)
  assert m1.ntree == 1 and not island.use_islands(m1)


def test_island_cg():
  """CG islands (mj_solCG per island, engine_forward.c:1210): the
  decoupled two-box scene island-solves under CG, matches the monolithic
  CG solve and the oracle at convergence."""
  xml = TWO_BOX_EXCLUDED.replace('solver="Newton"', 'solver="CG"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm, dtype=jnp.float64)
  from mujoco_tpu.models.types import SolverType
  assert int(m.opt.solver) == int(SolverType.CG)
  assert island.use_islands(m)

  qv0 = np.zeros(m.nv)
  qv0[0], qv0[7] = 0.3, -0.2
  qpos_isl = _run(m, 200, qv0)
  qpos_mono = _run(_mono(m), 200, qv0)
  np.testing.assert_allclose(qpos_isl, qpos_mono, atol=1e-8)

  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = qv0
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
  assert mjd.ncon > 0
  np.testing.assert_allclose(qpos_isl, mjd.qpos, atol=1e-7)


def test_island_cg_multi_humanoid():
  """CG islands on the multi-robot scene class."""
  m0 = zoo.multi_humanoid(2)
  from mujoco_tpu.models.types import SolverType
  m = m0.replace(opt=m0.opt.replace(solver=int(SolverType.CG),
                                    iterations=30))
  assert island.use_islands(m)
  qpos_isl = _run(m, 30)
  qpos_mono = _run(_mono(m), 30)
  assert np.isfinite(qpos_isl).all()
  np.testing.assert_allclose(qpos_isl, qpos_mono, atol=1e-7)
