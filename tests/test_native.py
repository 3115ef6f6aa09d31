"""Native extension equivalence: C topology kernels vs the Python fallback."""

import numpy as np
import pytest

import mujoco

from mujoco_tpu import native_ext
from mujoco_tpu.models import io

from tests import models as zoo


@pytest.mark.parametrize("name", ["pendulum", "chain3d", "balls"])
def test_native_matches_python(name, monkeypatch):
  xml = {"pendulum": zoo.PENDULUM, "chain3d": zoo.CHAIN_3D,
         "balls": zoo.BALLS}[name]
  mjm = mujoco.MjModel.from_xml_string(xml)

  nat = native_ext.get()
  if nat is None:
    pytest.skip("native toolchain unavailable")
  m_native = io.put_model(mjm)

  # force the Python fallback
  monkeypatch.setattr(native_ext, "get", lambda: None)
  m_py = io.put_model(mjm)

  np.testing.assert_array_equal(m_native.tree.ancestor_mask,
                                m_py.tree.ancestor_mask)
  np.testing.assert_array_equal(m_native.tree.subtree_mask,
                                m_py.tree.subtree_mask)
  np.testing.assert_array_equal(m_native.tree.dof_ancestor_mask,
                                m_py.tree.dof_ancestor_mask)
  for a, b in zip(m_native.tree.levels, m_py.tree.levels):
    np.testing.assert_array_equal(a, b)
  np.testing.assert_array_equal(m_native.con.geom1, m_py.con.geom1)
  np.testing.assert_array_equal(m_native.con.geom2, m_py.con.geom2)
  np.testing.assert_array_equal(m_native.con.condim, m_py.con.condim)
  assert m_native.efc.nefc == m_py.efc.nefc
