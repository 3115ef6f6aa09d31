"""Interactive viewer loop (mujoco_tpu/viewer.py): headless exercise of
the simulate-analog physics+render loop with a stub GL viewer.

Reference: /root/reference/simulate/main.cc:296 (PhysicsLoop),
/root/reference/python/mujoco/viewer.py (passive viewer contract)."""

import contextlib

import numpy as np

from mujoco_tpu import viewer as vw

XML = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body name="ball" pos="0 0 1" mocap="false">
      <freejoint/>
      <geom type="sphere" size=".1"/>
    </body>
    <body name="marker" mocap="true" pos=".5 0 .5">
      <geom type="sphere" size=".03" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""


class _StubViewer:
  """Minimal stand-in for mujoco.viewer.launch_passive's handle."""

  def __init__(self, mjm, mjd, key_callback):
    self.mjd = mjd
    self.key_callback = key_callback
    self.syncs = 0

  def is_running(self):
    return True

  def sync(self):
    self.syncs += 1

  def close(self):
    pass


def _factory(store):
  @contextlib.contextmanager
  def make(mjm, mjd, key_callback):
    v = _StubViewer(mjm, mjd, key_callback)
    store.append(v)
    yield v
  return make


def test_loop_advances_time_and_syncs():
  store = []
  d = vw.launch(xml=XML, fps=240.0, max_frames=6,
                viewer_factory=_factory(store))
  v = store[0]
  assert v.syncs == 6
  assert float(np.asarray(d.time)) > 0
  # the bridge synced the final state into mjd
  assert abs(float(v.mjd.time) - float(np.asarray(d.time))) < 1e-12
  assert v.mjd.qpos[2] < 1.0  # ball fell


def test_pause_reset_and_speed_keys():
  store = []

  @contextlib.contextmanager
  def factory(mjm, mjd, key_callback):
    v = _StubViewer(mjm, mjd, key_callback)
    store.append(v)
    # pause immediately: SPACE
    key_callback(32)
    yield v

  d = vw.launch(xml=XML, fps=240.0, max_frames=3, viewer_factory=factory)
  assert float(np.asarray(d.time)) == 0.0  # paused: no physics ran

  # speed keys halve/double the real-time factor within bounds
  st = vw.LoopState()
  st.key(45)
  assert st.rtf == 0.5
  st.key(61)
  st.key(61)
  assert st.rtf == 2.0
  # reset request flag
  st.key(259)
  assert st.reset_requested


def test_gui_perturb_force_flows_into_physics():
  """xfrc_applied written by the GUI (mjv_applyPerturbForce contract) is
  picked up by the device step; mocap drags flow through too."""
  import mujoco

  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  from mujoco_tpu.models import io
  m = io.put_model(mjm)
  state = vw.LoopState()

  class V(_StubViewer):
    def sync(self):
      super().sync()
      # user drag: sideways force on the ball, mocap body moved
      self.mjd.xfrc_applied[1, 0] = 50.0
      self.mjd.mocap_pos[0] = (0.9, 0.1, 0.2)

  v = V(mjm, mjd, state.key)
  d = vw.run_loop(m, mjm, mjd, v, state, fps=240.0, max_frames=8)
  # the force pushed the ball in +x
  assert float(np.asarray(d.qvel)[0]) > 0.01
  np.testing.assert_allclose(np.asarray(d.mocap_pos)[0], (0.9, 0.1, 0.2))
