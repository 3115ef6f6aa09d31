"""Differential tests: dynamic pair budgeting for large scenes.

The fixed-shape broadphase analog (ContactMeta.dyngroups): large groups of
same-signature candidate pairs own a K-pair budget filled per step by
bounding-sphere-distance top-K (reference: mj_broadphase SAP,
engine_collision_driver.c:1572; fixed-shape precedent: MJX max_geom_pairs,
mjx/_src/collision_driver.py:405). Covers BASELINE.json configs[4]
(multi-humanoid replicate scene).
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def test_sphere_pile_dynamic_groups():
  """32 spheres → 496 candidate sphere-sphere pairs collapse to one
  24-pair budgeted group; pile trajectory matches the oracle."""
  rng = np.random.RandomState(0)
  bodies = []
  for i in range(32):
    x, y = rng.uniform(-0.5, 0.5, 2)
    z = 0.08 + 0.15 * (i % 4)
    r = rng.uniform(0.03, 0.05)
    bodies.append(f'<body pos="{x:.3f} {y:.3f} {z:.3f}"><freejoint/>'
                  f'<geom type="sphere" size="{r:.3f}" mass="0.1"/></body>')
  xml = f"""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    {''.join(bodies)}
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  assert len(m.con.dyngroups) == 1
  assert len(m.con.dyngroups[0]["g1"]) == 496
  assert m.con.ncon < 100  # bounded slots, no ngeom² explosion
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  maxcon = 0
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    maxcon = max(maxcon, mjd.ncon)
  assert maxcon > 32  # sphere-sphere contacts beyond the floor ones
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8,
                             err_msg="sphere pile drift")


def _replicate_humanoids(n, spacing=1.5, selfcollide=True):
  parent = mujoco.MjSpec.from_string("""
<mujoco>
  <option timestep="0.004" iterations="8" ls_iterations="8"/>
  <worldbody><geom name="floor" type="plane" size="10 10 .1"/></worldbody>
</mujoco>""")
  for i in range(n):
    child = mujoco.MjSpec.from_file(
        "/root/repo/mujoco_tpu/models/assets/humanoid.xml")
    if selfcollide:
      for g in child.geoms:
        g.contype = 1
        g.conaffinity = 1
    frame = parent.worldbody.add_frame(pos=[spacing * i, 0, 0])
    frame.attach_body(child.worldbody.first_body(), f"h{i}_", "")
  return parent.compile()


def test_multi_humanoid_replicate():
  """BASELINE configs[4]: 4-humanoid replicate scene with self/cross
  collisions enabled — thousands of candidate pairs, bounded slots,
  oracle-parity trajectory."""
  try:
    mjm = _replicate_humanoids(4)
  except Exception as e:
    pytest.skip(f"MjSpec attach unavailable: {e}")
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  ncand = sum(len(g["g1"]) for g in m.con.dyngroups)
  assert ncand > 1000, "expected large dynamic candidate sets"
  assert m.con.ncon < 400, "slots must stay bounded"
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  maxcon = 0
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    maxcon = max(maxcon, mjd.ncon)
  assert maxcon > 0
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8,
                             err_msg="multi-humanoid drift")
