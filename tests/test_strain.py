"""mjEQ_FLEXSTRAIN eigenmode strain rows (volume mode).

Ports the reference tree's own goldens (the pip oracle predates the
feature): test/engine/engine_core_constraint_test.cc
(StrainConstraintNoPinning, StrainConstraintQuadratic) — residual ~0 at
rest, rigid-rotation invariance, FD-vs-analytic Jacobian, step stability.
Reference implementation: engine_core_constraint.c:806-980 (rows),
:1809-1860 (diagApprox), :2451-2510 (row counting);
user_mesh.cc:4127-4167 (EigendecomposeStiffness);
user_flexcomp.cc:760-805 (per-cell equality creation, reproduced by
mujoco_tpu.models.strain.with_strain_constraints)."""

import os

os.environ.setdefault("MJTPU_FLEX_BUDGET", "32")

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io, strain
from mujoco_tpu.ops import forward

XML = """
<mujoco>
<option integrator="implicitfast" jacobian="dense"/>
<worldbody>
  <body name="parent">
    <joint type="free"/>
    <geom type="box" size=".01 .01 .01" mass=".1"/>
    <flexcomp name="test" type="box"
              spacing=".1 .1 .1" radius="0.001"
              dof="{dof}" pos="0 0 .5" mass="1" dim="3">
      <contact selfcollide="none"/>
      <elasticity young="10" poisson="0.3"/>
    </flexcomp>
  </body>
</worldbody>
</mujoco>
"""


def _model(dof="trilinear"):
  mjm0 = mujoco.MjModel.from_xml_string(XML.replace("{dof}", dof))
  return io.put_model(strain.with_strain_constraints(mjm0))


@pytest.mark.parametrize("dof", ["trilinear", "quadratic"])
def test_strain_rows(dof):
  m = _model(dof)
  assert len(m.flx.strain) >= 1
  assert m.efc.ne > 0
  d = forward.forward(m, io.make_data(m))
  ne = m.efc.ne
  pos0 = np.asarray(d.efc_pos)[:ne]

  # residual ~0 at rest (StrainConstraintNoPinning)
  assert np.abs(pos0).max() < 1e-6

  # Jacobian finite
  J = np.asarray(d.efc_J)[:ne]
  assert np.isfinite(J).all()

  # FD vs analytic Jacobian on the first rows/dofs
  eps = 1e-6
  qpos0 = np.asarray(d.qpos).copy()
  nv = m.nv
  for j in range(min(nv, 9)):
    dq = np.zeros(nv)
    dq[j] = eps
    qp = forward.integrate_pos(m, jnp.asarray(qpos0), jnp.asarray(dq), 1.0)
    d2 = forward.forward(m, io.make_data(m).replace(qpos=qp))
    pos2 = np.asarray(d2.efc_pos)[:ne]
    for i in range(min(3, ne)):
      fd = (pos2[i] - pos0[i]) / eps
      an = J[i, j]
      assert abs(fd - an) <= max(1e-8, 0.1 * (abs(fd) + abs(an))), (i, j)

  # rigid-rotation invariance: 45 deg about z through the free joint
  ang = 0.785398
  d3 = io.make_data(m)
  d3 = d3.replace(qpos=d3.qpos.at[3].set(np.cos(ang / 2)).at[4].set(0.0)
                  .at[5].set(0.0).at[6].set(np.sin(ang / 2)))
  d3 = forward.forward(m, d3)
  assert np.abs(np.asarray(d3.efc_pos)[:ne]).max() < 1e-6

  # stability (100 steps, free fall)
  step = jax.jit(lambda dd: forward.step(m, dd))
  d4 = io.make_data(m)
  for i in range(100):
    d4 = step(d4)
  assert np.isfinite(np.asarray(d4.qpos)).all()
  assert np.abs(np.asarray(d4.qvel)).max() < 1000.0


def test_strain_resists_deformation():
  """The rows are real constraints: squeezing the flex produces restoring
  forces along the eigenmodes (nonzero qfrc_constraint on node dofs)."""
  m = _model("trilinear")
  d = io.make_data(m)
  # squeeze: move a corner node body inward via its slide dofs
  nb = int(np.asarray(m.flx.nodebodyid)[-1])
  dadr = int(m.body_dofadr[nb])
  d = d.replace(qpos=d.qpos.at[7 + 0].add(0.02))  # first node qpos block
  d = forward.forward(m, d)
  ne = m.efc.ne
  pos = np.asarray(d.efc_pos)[:ne]
  assert np.abs(pos).max() > 1e-4          # strain registered
  assert np.abs(np.asarray(d.qfrc_constraint)).max() > 1e-6


def test_strain_passive_exclusive():
  """Strain mode replaces passive FEM elasticity (has_stretch gate,
  engine_passive.c:92): the strain flex produces no interp passive
  spring force."""
  m = _model("trilinear")
  assert (np.asarray(m.flx.interp_stiffadr) == -1).all()
