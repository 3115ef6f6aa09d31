"""Tree sleep/wake (mjENBL_SLEEP) differential tests.

vs the reference state machine (engine_sleep.c): countdown, island sleep,
collision/equality/user wake, velocity zeroing, constraint-row masking.
tree_asleep is compared on awake/asleep status and awake counters; sleeping
values use this engine's canonical-label encoding vs the reference's cycle
pointers (documented deviation), so only island *grouping* is compared there.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, sleep as sleep_mod


def _status_match(ours, ref):
  if not np.array_equal(ours < 0, ref < 0):
    return False
  awake = ours < 0
  return np.array_equal(ours[awake], ref[awake])


def _groups(vals):
  """Island partition of sleeping trees (label-encoding agnostic)."""
  out = {}
  for i, v in enumerate(vals):
    if v >= 0:
      out.setdefault(_root(vals, i), set()).add(i)
  return sorted(tuple(sorted(g)) for g in out.values())


def _root(vals, i):
  # follow pointers/labels to the smallest reachable index
  seen = {i}
  cur = i
  for _ in range(len(vals)):
    nxt = vals[cur]
    if nxt < 0 or nxt in seen:
      break
    seen.add(nxt)
    cur = nxt
  return min(seen)


SCENE = """
<mujoco>
  <option timestep="0.002" sleep_tolerance="1e-4">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size=".1 .1 .1"/></body>
    <body pos="0 0 0.31"><freejoint/><geom type="box" size=".09 .09 .1"/></body>
    <body pos="-3 0 0.25">
      <freejoint/><geom type="sphere" size=".12" friction="0.1"/>
    </body>
  </worldbody>
</mujoco>"""


def test_sleep_islands_and_collision_wake():
  """Stacked boxes sleep as one island; a poked ball rolls in and wakes
  them with the reference's wake counters; everything re-sleeps."""
  mjm = mujoco.MjModel.from_xml_string(SCENE)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(3000):
    if t == 1500:
      mjd.qvel[12] = 4.0
      qv = np.asarray(d.qvel).copy()
      qv[12] = 4.0
      d = d.replace(qvel=jnp.asarray(qv))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    ours = np.asarray(d.tree_asleep)
    assert _status_match(ours, mjd.tree_asleep), (t, ours, mjd.tree_asleep)
    assert _groups(ours) == _groups(mjd.tree_asleep), (t, ours,
                                                       mjd.tree_asleep)
  # the stack re-slept (the low-friction ball may still be rolling, in both
  # engines alike); sleeping dofs carry exactly zero velocity
  ours = np.asarray(d.tree_asleep)
  assert ours[0] >= 0 and ours[1] >= 0
  np.testing.assert_allclose(np.asarray(d.qvel)[:12], 0.0, atol=0)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)


def test_sleep_never_policy_and_actuated_tree():
  """sleep='never' and actuated trees (AUTO_NEVER) stay awake."""
  xml = """
<mujoco>
  <option timestep="0.002" sleep_tolerance="1e-4">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.1" sleep="never">
      <freejoint/><geom type="box" size=".1 .1 .1"/>
    </body>
    <body pos="1 0 0.3">
      <joint name="j" type="hinge" axis="0 1 0" damping="2"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j"/></actuator>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(1500):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    assert _status_match(np.asarray(d.tree_asleep), mjd.tree_asleep)
  assert np.all(np.asarray(d.tree_asleep) < 0)  # nobody sleeps


def test_equality_island():
  """Connect-coupled trees sleep as one island and wake together."""
  xml = """
<mujoco>
  <option timestep="0.002" sleep_tolerance="1e-4">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="a" pos="0 0 0.15"><freejoint/>
      <geom type="box" size=".1 .1 .1" mass="1"/></body>
    <body name="b" pos="0.4 0 0.15"><freejoint/>
      <geom type="box" size=".1 .1 .1" mass="1"/></body>
  </worldbody>
  <equality><connect body1="a" body2="b" anchor="0.2 0 0"/></equality>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(1200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    ours = np.asarray(d.tree_asleep)
    assert _status_match(ours, mjd.tree_asleep), (t, ours, mjd.tree_asleep)
    assert _groups(ours) == _groups(mjd.tree_asleep)
  # both sleep in ONE island
  assert _groups(np.asarray(d.tree_asleep)) == [(0, 1)]


def test_xfrc_wake():
  """Applied force on a sleeping body wakes its island (mj_wake)."""
  mjm = mujoco.MjModel.from_xml_string(SCENE)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(700):
    if t == 500:
      assert np.asarray(d.tree_asleep)[0] >= 0  # stack asleep
      mjd.xfrc_applied[1, 0] = 5.0
      xf = np.asarray(d.xfrc_applied).copy()
      xf[1, 0] = 5.0
      d = d.replace(xfrc_applied=jnp.asarray(xf))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    assert _status_match(np.asarray(d.tree_asleep), mjd.tree_asleep), t
  assert np.asarray(d.tree_asleep)[0] < 0  # woken by the applied force
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)


def test_sleep_disabled_is_inert():
  """Without the enable flag the machinery adds nothing: tree_asleep stays
  fully awake and trajectories are unchanged."""
  xml = SCENE.replace('<flag sleep="enable"/>', "")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  mjd = mujoco.MjData(mjm)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.all(np.asarray(d.tree_asleep) == -11)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)


def test_mocap_contact_wake():
  """A mocap body pushed into a sleeping box wakes it (the reference treats
  dof-less bodies with mocap roots as awake contacts,
  engine_sleep.c:336-341)."""
  xml = """
<mujoco>
  <option timestep="0.002" sleep_tolerance="1e-4">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size=".1 .1 .1"/></body>
    <body name="hand" mocap="true" pos="1.5 0 0.1">
      <geom type="sphere" size=".08"/>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  # make_data starts the mocap body at its model pose (mj_resetData)
  np.testing.assert_allclose(np.asarray(d.mocap_pos[0]), [1.5, 0, 0.1])
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(600):
    d = step(d)
  assert np.asarray(d.tree_asleep)[0] >= 0         # box asleep
  # teleport the mocap sphere into contact with the box; the 3.11 engine
  # wakes on mocap contact (engine_sleep.c:336-341 in the reference tree;
  # the pip 3.10 oracle predates this wake path, so no status-matching)
  d = d.replace(mocap_pos=jnp.asarray(np.array([[0.0, 0, 0.12]])))
  d = step(d)
  assert np.asarray(d.tree_asleep)[0] < 0          # woken by the mocap hand
  # and fully awake (kAwake), not a resumed countdown
  assert np.asarray(d.tree_asleep)[0] <= -10


def test_sleep_init_in_reset():
  """sleep='init' trees come out of reset_data asleep, like mj_resetData
  (engine_io.c:1486-1497)."""
  from mujoco_tpu.ops import state
  xml = """
<mujoco>
  <option timestep="0.002">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.0995" sleep="init">
      <freejoint/><geom type="box" size=".1 .1 .1"/></body>
    <body pos="2 0 0.5"><freejoint/><geom type="sphere" size=".1"/></body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)             # mj_resetData runs in MjData init
  m = io.put_model(mjm)
  d = state.reset_data(m, io.make_data(m))
  ours = np.asarray(d.tree_asleep)
  assert ours[0] >= 0 and mjd.tree_asleep[0] >= 0   # init tree asleep
  assert ours[1] < 0 and mjd.tree_asleep[1] < 0     # free ball awake
  # stepping keeps parity
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
    assert _status_match(np.asarray(d.tree_asleep), mjd.tree_asleep), t


def test_flex_equality_wake():
  """Poking one vertex of a sleeping cloth wakes the whole flex through
  the edge equality (mj_wakeEquality mjEQ_FLEX branch,
  engine_sleep.c:443-480). Milestone-based (countdown phases at the sleep
  threshold are trajectory-sensitive): both engines sleep, then the poke
  wakes every flex tree in both."""
  xml = """
<mujoco>
  <option timestep="0.002" sleep_tolerance="1e-3">
    <flag sleep="enable"/>
  </option>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <flexcomp name="cloth" type="grid" dim="2" count="3 3 1"
              spacing="0.12 0.12 0.12" pos="0 0 0.05" mass="0.45">
      <edge equality="true" damping="0.3"/>
      <contact selfcollide="none"/>
    </flexcomp>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(2000):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  ours = np.asarray(d.tree_asleep)
  assert (ours >= 0).all(), ours                 # whole cloth asleep
  assert (mjd.tree_asleep >= 0).all(), mjd.tree_asleep
  # poke one vertex
  qv = np.zeros(m.nv)
  qv[2] = 1.5
  mjd.qvel[:] = qv
  d = d.replace(qvel=jnp.asarray(qv))
  for _ in range(3):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  ours = np.asarray(d.tree_asleep)
  assert (ours < 0).all(), ours                  # all woken via the flex eq
  assert (mjd.tree_asleep < 0).all(), mjd.tree_asleep
