"""Randomized-model differential sweep.

The reference's single most important test pattern (SURVEY.md §4): put
procedurally generated random models through both engines and compare
(mjx/integration_test/smooth_test.py sweeps 30 random models per op).
Models are assembled from random joint chains, geom types, options and
actuators; each is stepped and compared per-stage and at trajectory level.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward

_GEOMS = [
    ('sphere', '0.07'),
    ('capsule', '0.05 0.12'),
    ('box', '0.08 0.06 0.05'),
    ('ellipsoid', '0.08 0.05 0.06'),
    ('cylinder', '0.05 0.08'),
]
_JOINTS = ['hinge', 'slide', 'ball']


def _random_model(rng: np.random.RandomState) -> str:
  """A random branching chain with random joints/geoms/options."""
  nbody = rng.randint(2, 6)
  integrator = rng.choice(['Euler', 'implicitfast', 'RK4'])
  cone = rng.choice(['pyramidal', 'elliptic'])
  solver = rng.choice(['Newton', 'CG'])
  timestep = rng.choice([0.002, 0.004])
  parts = [f'<mujoco><option timestep="{timestep}" integrator="{integrator}" '
           f'cone="{cone}" solver="{solver}"/>']
  parts.append('<worldbody>')
  has_floor = rng.rand() < 0.5
  if has_floor:
    parts.append('<geom type="plane" size="5 5 .1"/>')

  def body(depth, idx):
    out = []
    pos = rng.uniform(-0.25, 0.25, 3)
    pos[2] = abs(pos[2]) + 0.25
    out.append(f'<body pos="{pos[0]:.3f} {pos[1]:.3f} {pos[2]:.3f}">')
    if depth == 0 and rng.rand() < 0.5:
      out.append('<freejoint/>')
    else:
      jt = rng.choice(_JOINTS)
      axis = rng.uniform(-1, 1, 3)
      axis /= np.linalg.norm(axis)
      limited = rng.rand() < 0.4 and jt != 'ball'
      lim = (' range="-40 60" limited="true"' if limited else '')
      damp = f' damping="{rng.uniform(0, 0.5):.3f}"'
      if jt == 'ball':
        out.append(f'<joint type="ball"{damp}/>')
      else:
        out.append(f'<joint name="j{idx[0]}" type="{jt}" '
                   f'axis="{axis[0]:.3f} {axis[1]:.3f} {axis[2]:.3f}"'
                   f'{lim}{damp}/>')
        idx[0] += 1
    gt, size = _GEOMS[rng.randint(len(_GEOMS))]
    contype = 1 if has_floor and rng.rand() < 0.7 else 0
    out.append(f'<geom type="{gt}" size="{size}" contype="{contype}" '
               f'conaffinity="0" density="600"/>')
    return out

  idx = [0]
  depth_stack = []
  for b in range(nbody):
    depth = len(depth_stack)
    parts.extend(body(depth, idx))
    depth_stack.append(b)
    if rng.rand() < 0.4 and depth_stack:
      parts.append('</body>')
      depth_stack.pop()
  parts.extend('</body>' for _ in depth_stack)
  parts.append('</worldbody>')

  njoints = idx[0]
  if njoints and rng.rand() < 0.6:
    parts.append('<actuator>')
    for j in range(min(njoints, 3)):
      parts.append(f'<motor joint="j{j}" gear="{rng.uniform(5, 40):.1f}"/>')
    parts.append('</actuator>')
  parts.append('</mujoco>')
  return '\n'.join(parts)


@pytest.mark.parametrize("seed", range(15))
def test_random_model_trajectory(seed):
  rng = np.random.RandomState(1000 + seed)
  xml = _random_model(rng)
  try:
    mjm = mujoco.MjModel.from_xml_string(xml)
  except Exception:
    pytest.skip("generator produced an invalid model")
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = 0.1 * rng.randn(mjm.nv)
  mjd.ctrl[:] = 0.3 * rng.randn(mjm.nu)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()),
                ctrl=jnp.asarray(mjd.ctrl.copy()))
  step = jax.jit(lambda dd: forward.step(m, dd))
  for t in range(60):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  # contact-free models track the oracle tightly; contact-rich tumbling is
  # chaotic (impact times amplify manifold-level differences), so those get
  # a coarse bound plus finiteness
  assert np.isfinite(np.asarray(d.qpos)).all()
  atol = 5e-5 if m.con.ncon == 0 else 0.08
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=atol,
                             err_msg=f"qpos drift, model:\n{xml}")
