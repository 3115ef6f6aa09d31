"""Overflow warning counters (mjWARN_CONTACTFULL analog) and honest PGS
convergence reporting (solPGS termination, engine_solver.c:683-720)."""

import os

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward


def test_contact_overflow_counter():
  """A 25-vertex cloth on a plane with a 4-slot budget must report dropped
  penetrating candidates instead of silently losing them."""
  os.environ["MJTPU_FLEX_BUDGET"] = "4"
  try:
    mjm = mujoco.MjModel.from_xml_string("""
<mujoco>
  <option timestep="0.002" solver="Newton"/>
  <worldbody>
    <geom type="plane" size="3 3 .1" pos="0 0 0"/>
    <flexcomp name="cloth" type="grid" count="5 5 1" spacing="0.05 0.05 0.05"
              radius="0.015" dim="2" mass="0.3" pos="0 0 0.05">
      <edge equality="true" solref="0.004 1"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>""")
    m = io.put_model(mjm)
  finally:
    os.environ["MJTPU_FLEX_BUDGET"] = "32"
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(200):
    d = step(d)
  assert int(d.warning[0]) > 0, "expected contact-slot overflow counts"


def test_pgs_reports_true_iterations():
  """PGS must report the converged iteration count, not the static budget,
  and converge to the same forces as the full budget."""
  xml = """
<mujoco>
  <option timestep="0.002" solver="PGS" iterations="{it}" tolerance="1e-3"/>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.099"><freejoint/>
      <geom type="box" size="0.1 0.1 0.1" mass="1"/>
    </body>
  </worldbody>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml.format(it=100))
  m = io.put_model(mjm)
  d = io.make_data(m)
  # settle a few steps, then check diagnostics at a resting state
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(50):
    d = step(d)
  d = jax.jit(lambda dd: forward.forward(m, dd))(d)
  niter = int(d.solver_niter)
  assert 0 < niter < 100, f"PGS reported niter={niter} with budget 100"
  # the iteration AFTER convergence contributes nothing (frozen)
  stats = np.asarray(d.solver_stat)
  assert stats[niter:, 0].max(initial=0.0) == 0.0
