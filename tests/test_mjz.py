"""mjz zip models + compile cache (compiler/mjz.py).

References: /root/reference/src/xml/mjz/mjz_decoder.cc (main-file
resolution, zip assets), /root/reference/src/user/user_cache.cc
(modification-time keyed cache)."""

import io
import os
import zipfile

import numpy as np

from mujoco_tpu import compiler

XML = """
<mujoco>
  <asset>
    <mesh name="tet" file="tet.obj"/>
  </asset>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 .5">
      <freejoint/>
      <geom type="mesh" mesh="tet" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

OBJ = b"""v -0.1 -0.1 -0.1
v 0.1 -0.1 -0.1
v -0.1 0.1 -0.1
v 0.1 0.1 -0.1
v -0.1 -0.1 0.1
v 0.1 -0.1 0.1
v -0.1 0.1 0.1
v 0.1 0.1 0.1
f 1 4 2
f 1 3 4
f 5 6 8
f 5 8 7
f 1 2 6
f 1 6 5
f 3 8 4
f 3 7 8
f 1 7 3
f 1 5 7
f 2 4 8
f 2 8 6
"""


def _zip_bytes(main_name):
  buf = io.BytesIO()
  with zipfile.ZipFile(buf, "w") as z:
    z.writestr(main_name, XML)
    d = os.path.dirname(main_name)
    z.writestr((d + "/" if d else "") + "tet.obj", OBJ)
  return buf.getvalue()


def test_mjz_main_resolution_and_parity():
  """Each main-file convention resolves; the compiled model equals the
  direct load_xml of the same content."""
  direct = compiler.load_xml(XML, assets={"tet.obj": OBJ})
  for main in ("robot.xml", "robot/robot.xml", "model.xml",
               "robot/model.xml"):
    cm = compiler.load_mjz(_zip_bytes(main), name="robot")
    np.testing.assert_array_equal(cm.geom_type, direct.geom_type)
    np.testing.assert_allclose(np.asarray(cm.mesh_vert),
                               np.asarray(direct.mesh_vert))
    np.testing.assert_allclose(np.asarray(cm.body_mass),
                               np.asarray(direct.body_mass))


def test_mjz_missing_main():
  buf = io.BytesIO()
  with zipfile.ZipFile(buf, "w") as z:
    z.writestr("other.xml", XML)
  import pytest
  with pytest.raises(ValueError, match="no main XML"):
    compiler.load_mjz(buf.getvalue(), name="robot")


def test_compile_cache_hit_and_invalidation(tmp_path, monkeypatch):
  """Second load is served from the npz snapshot; touching the source
  invalidates (mtime key)."""
  monkeypatch.setenv("MJTPU_CACHE_DIR", str(tmp_path / "cache"))
  src = tmp_path / "m.mjz"
  src.write_bytes(_zip_bytes("m.xml"))
  cm1 = compiler.load_cached(str(src))
  entries = os.listdir(tmp_path / "cache")
  assert len(entries) == 1
  cm2 = compiler.load_cached(str(src))
  np.testing.assert_array_equal(cm1.geom_type, cm2.geom_type)
  np.testing.assert_allclose(np.asarray(cm1.qpos0), np.asarray(cm2.qpos0))
  # stale source -> new cache entry
  os.utime(src, (os.path.getatime(src), os.path.getmtime(src) + 5))
  compiler.load_cached(str(src))
  assert len(os.listdir(tmp_path / "cache")) == 2

  # the cached model steps identically to a fresh compile
  import jax
  from mujoco_tpu.models import io as mio
  from mujoco_tpu.ops import forward

  def traj(cm):
    m = mio.put_model(cm)
    d = mio.make_data(m)
    step = jax.jit(lambda dd: forward.step(m, dd))
    for _ in range(10):
      d = step(d)
    return np.asarray(d.qpos)

  q_cached = traj(cm2)
  q_fresh = traj(compiler.load_mjz(str(src)))
  assert np.isfinite(q_cached).all()
  np.testing.assert_array_equal(q_cached, q_fresh)
