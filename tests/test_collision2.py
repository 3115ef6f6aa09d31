"""Differential + physical-sanity tests for the extended narrowphase:
plane-cylinder, plane-ellipsoid, sphere-cylinder, box-box."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import forward, collision_driver


def _mindist(m, d):
  """Our deepest contact distance per step."""
  dd = forward.fwd_position(m, d)
  return float(jnp.min(dd.contact.dist))


def _setup(xml, qpos=None, qvel=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qpos is not None:
    mjd.qpos[:] = qpos
  if qvel is not None:
    mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                qvel=jnp.asarray(mjd.qvel.copy()))
  return mjm, mjd, m, d


CYL_PLANE = """
<mujoco><worldbody>
  <geom type="plane" size="3 3 .1"/>
  <body pos="0 0 {z}" euler="{e}">
    <freejoint/><geom type="cylinder" size="0.1 0.25"/>
  </body>
</worldbody></mujoco>
"""

ELL_PLANE = """
<mujoco><worldbody>
  <geom type="plane" size="3 3 .1"/>
  <body pos="0.02 -0.01 {z}" euler="{e}">
    <freejoint/><geom type="ellipsoid" size="0.12 0.2 0.07"/>
  </body>
</worldbody></mujoco>
"""

SPH_CYL = """
<mujoco><worldbody>
  <body pos="0 0 1"><geom type="cylinder" size="0.15 0.3"
    euler="{e}" contype="1" conaffinity="1"/></body>
  <body pos="{p}">
    <freejoint/><geom type="sphere" size="0.1"/>
  </body>
</worldbody></mujoco>
"""

BOX_BOX = """
<mujoco><worldbody>
  <body pos="0 0 1"><geom type="box" size="0.3 0.25 0.2" euler="{e1}"
    contype="1" conaffinity="1"/></body>
  <body pos="{p}" euler="{e2}">
    <freejoint/><geom type="box" size="0.15 0.1 0.12"/>
  </body>
</worldbody></mujoco>
"""


@pytest.mark.parametrize("z,e", [(0.2, "0 0 0"), (0.09, "90 0 0"),
                                 (0.23, "20 15 0"), (0.3, "80 5 30")])
def test_plane_cylinder_dist(z, e):
  mjm, mjd, m, d = _setup(CYL_PLANE.format(z=z, e=e))
  if mjd.ncon == 0:
    assert _mindist(m, d) > 0
    return
  np.testing.assert_allclose(_mindist(m, d), mjd.contact.dist.min(),
                             atol=1e-8)


@pytest.mark.parametrize("z,e", [(0.05, "0 0 0"), (0.1, "45 20 10"),
                                 (0.18, "90 0 0")])
def test_plane_ellipsoid_dist(z, e):
  mjm, mjd, m, d = _setup(ELL_PLANE.format(z=z, e=e))
  if mjd.ncon == 0:
    assert _mindist(m, d) > 0
    return
  np.testing.assert_allclose(_mindist(m, d), mjd.contact.dist.min(),
                             atol=1e-8)


@pytest.mark.parametrize("p,e", [
    ("0.2 0 1.0", "0 0 0"),     # side
    ("0 0 1.42", "0 0 0"),      # cap
    ("0.17 0 1.37", "0 0 0"),   # rim corner
    ("0.25 0.05 1.1", "30 40 0"),
])
def test_sphere_cylinder_dist(p, e):
  mjm, mjd, m, d = _setup(SPH_CYL.format(p=p, e=e))
  if mjd.ncon == 0:
    assert _mindist(m, d) > -1e-9
    return
  np.testing.assert_allclose(_mindist(m, d), mjd.contact.dist.min(),
                             atol=1e-7)


@pytest.mark.parametrize("p,e1,e2", [
    ("0 0 1.3", "0 0 0", "0 0 0"),          # face-face aligned
    ("0.1 0.05 1.28", "0 0 0", "0 0 35"),   # face-face twisted
    ("0.4 0 1.25", "0 0 0", "0 45 0"),      # edge-ish
    ("0.05 -0.08 1.3", "10 5 0", "25 -15 40"),
])
def test_box_box_dist(p, e1, e2):
  mjm, mjd, m, d = _setup(BOX_BOX.format(p=p, e1=e1, e2=e2))
  ours = _mindist(m, d)
  if mjd.ncon == 0:
    assert ours > -5e-3, ours
    return
  np.testing.assert_allclose(ours, mjd.contact.dist.min(), atol=2e-3)


def test_box_stack_settles():
  """Two stacked boxes settle under gravity and stay put — the classic
  manifold-quality test (requires a stable multi-point box-box manifold)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="3 3 .1"/>
      <body pos="0 0 0.102"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1"/></body>
      <body pos="0.02 0.01 0.35"><freejoint/>
        <geom type="box" size="0.08 0.08 0.08"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(800):
    d = step(d)
  qpos = np.asarray(d.qpos)
  qvel = np.asarray(d.qvel)
  assert np.isfinite(qpos).all()
  # bottom box resting at ~0.1, top box at ~0.28, both nearly still
  assert abs(qpos[2] - 0.1) < 0.02, qpos[2]
  assert abs(qpos[9] - 0.28) < 0.03, qpos[9]
  assert np.abs(qvel).max() < 0.05, np.abs(qvel).max()


def test_cylinder_rolls_and_rests():
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="5 5 .1"/>
      <body pos="0 0 0.3" euler="90 0 0"><freejoint/>
        <geom type="cylinder" size="0.1 0.2"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(600):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert abs(qpos[2] - 0.1) < 0.02, qpos[2]  # resting on its side


def test_capsule_box_rest():
  """Capsule resting flat on a box face needs a stable 2-contact manifold."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <body pos="0 0 0.5"><geom type="box" size="0.4 0.4 0.5"
        contype="1" conaffinity="1"/></body>
      <body pos="0 0 1.08"><freejoint/>
        <geom type="capsule" size="0.07" fromto="-0.2 0 0 0.2 0 0"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(500):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert abs(qpos[2] - 1.07) < 0.01, qpos[2]
  assert np.abs(np.asarray(d.qvel)).max() < 0.05


@pytest.mark.parametrize("p,e", [
    ("0.55 0 1.0", "0 0 0"),      # side face
    ("0 0 1.62", "90 0 0"),       # lying on top
    ("0.5 0.45 1.3", "20 30 45"), # corner-ish
])
def test_capsule_box_dist(p, e):
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 1"><geom type="box" size="0.4 0.35 0.45"
      contype="1" conaffinity="1"/></body>
    <body pos="{p}" euler="{e}">
      <freejoint/><geom type="capsule" size="0.08" fromto="-0.15 0 0 0.15 0 0"/>
    </body>
  </worldbody></mujoco>""".format(p=p, e=e)
  mjm, mjd, m, d = _setup(xml)
  ours = _mindist(m, d)
  if mjd.ncon == 0:
    assert ours > -1e-3, ours
    return
  np.testing.assert_allclose(ours, mjd.contact.dist.min(), atol=1e-3)


def test_pair_override():
  """Explicit <pair> with custom friction/solref/margin, vs oracle."""
  xml = """
  <mujoco>
    <worldbody>
      <geom name="floor" type="plane" size="3 3 .1" contype="0"
            conaffinity="0"/>
      <body pos="0 0 0.09"><freejoint/>
        <geom name="ball" type="sphere" size="0.1" contype="0"
              conaffinity="0"/></body>
    </worldbody>
    <contact>
      <pair geom1="floor" geom2="ball" condim="6"
            friction="1.4 1.2 0.01 0.002 0.003" solref="0.01 0.8"
            margin="0.02" gap="0.005"/>
    </contact>
  </mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  d = forward.forward(m, d)
  assert mjd.ncon == 1
  np.testing.assert_allclose(np.asarray(d.contact.dist[:1]),
                             mjd.contact.dist, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.contact.friction[0]),
                             mjd.contact.friction[0], atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.contact.solref[0]),
                             mjd.contact.solref[0], atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.contact.includemargin[0]),
                             mjd.contact.includemargin[0], atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8)


def _hfield_xml(body):
  import numpy as _np
  # bowl-shaped terrain so free bodies settle instead of rolling forever
  nrow, ncol = 9, 11
  yy, xx = _np.meshgrid(_np.linspace(-1, 1, nrow), _np.linspace(-1, 1, ncol),
                        indexing="ij")
  data = (0.25 * (xx ** 2 + yy ** 2)).reshape(-1)
  datastr = " ".join("%.4f" % v for v in data)
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    <asset>
      <hfield name="terrain" nrow="{nrow}" ncol="{ncol}"
              size="1.2 1.0 0.4 0.1" elevation="{datastr}"/>
    </asset>
    <worldbody>
      <geom type="hfield" hfield="terrain"/>
      {body}
    </worldbody>
  </mujoco>"""


def test_hfield_sphere_settles():
  xml = _hfield_xml(
      '<body pos="0.15 -0.1 0.45"><freejoint/>'
      '<geom type="sphere" size="0.09" condim="6" '
      'friction="1 0.02 0.01"/></body>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(1800):
    d = step(d)
  qpos = np.asarray(d.qpos)
  qvel = np.asarray(d.qvel)
  assert np.isfinite(qpos).all()
  # resting near the bowl bottom
  assert 0.0 < qpos[2] < 0.35, qpos[2]
  assert np.abs(qpos[:2]).max() < 0.4, qpos[:2]
  assert np.abs(qvel).max() < 0.5, np.abs(qvel).max()

  # penetration depth vs the oracle at the settled state
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = qpos
  mujoco.mj_forward(mjm, mjd)
  dd = forward.fwd_position(m, d)
  if mjd.ncon:
    np.testing.assert_allclose(float(jnp.min(dd.contact.dist)),
                               mjd.contact.dist.min(), atol=3e-3)


def test_hfield_capsule_settles():
  xml = _hfield_xml(
      '<body pos="-0.2 0.1 0.45" euler="0 0 30"><freejoint/>'
      '<geom type="capsule" size="0.07" fromto="-0.2 0 0 0.2 0 0" '
      'condim="6" friction="1 0.02 0.01"/></body>')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(1800):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert 0.0 < qpos[2] < 0.35, qpos[2]
  assert np.abs(np.asarray(d.qvel)).max() < 0.5


MESH_XML = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <mesh name="tet" vertex="0 0 0  0.2 0 0  0 0.2 0  0 0 0.2"/>
    <mesh name="wedge" vertex="-0.15 -0.1 0  0.15 -0.1 0  0.15 0.1 0
                               -0.15 0.1 0  0 0 0.18"/>
  </asset>
  <worldbody>
    <geom type="plane" size="3 3 .1"/>
    <body pos="0 0 0.4" euler="10 25 40"><freejoint/>
      <geom type="mesh" mesh="tet" contype="1" conaffinity="0"/></body>
    <body pos="0.6 0 0.4" euler="5 -15 70"><freejoint/>
      <geom type="mesh" mesh="wedge" contype="1" conaffinity="0"/></body>
    <body pos="-0.6 0 0.6"><freejoint/>
      <geom type="sphere" size="0.08" contype="1" conaffinity="0"/></body>
  </worldbody>
</mujoco>
"""


def test_mesh_plane_settles():
  """Mesh bodies dropped on the floor come to rest; penetration matches the
  oracle at the settled state."""
  mjm = mujoco.MjModel.from_xml_string(MESH_XML)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(1200):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert np.abs(np.asarray(d.qvel)).max() < 0.3
  # both mesh bodies resting near the floor
  assert -0.02 < qpos[2] < 0.25, qpos[2]
  assert -0.02 < qpos[9] < 0.25, qpos[9]

  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = qpos
  mujoco.mj_forward(mjm, mjd)
  dd = forward.fwd_position(m, d)
  if mjd.ncon:
    np.testing.assert_allclose(float(jnp.min(dd.contact.dist)),
                               mjd.contact.dist.min(), atol=2e-3)


def test_sphere_mesh_dist():
  """Sphere vs tetrahedron mesh: penetration depth vs the oracle."""
  xml = """
  <mujoco>
    <asset><mesh name="tet" vertex="0 0 0  0.3 0 0  0 0.3 0  0 0 0.3"/></asset>
    <worldbody>
      <body pos="0 0 1"><geom type="mesh" mesh="tet" contype="1"
        conaffinity="1"/></body>
      <body pos="{p}"><freejoint/><geom type="sphere" size="0.08"/></body>
    </worldbody>
  </mujoco>"""
  for p in ["0.05 0.05 1.4", "0.4 0.05 1.05", "0.12 0.12 1.1"]:
    mjm = mujoco.MjModel.from_xml_string(xml.format(p=p))
    mjd = mujoco.MjData(mjm)
    mujoco.mj_forward(mjm, mjd)
    m = io.put_model(mjm)
    d = io.make_data(m)
    dd = forward.fwd_position(m, d)
    ours = float(jnp.min(dd.contact.dist))
    if mjd.ncon == 0:
      assert ours > -2e-3, (p, ours)
    else:
      np.testing.assert_allclose(ours, mjd.contact.dist.min(), atol=2e-3,
                                 err_msg=p)


CONVEX_CASES = [
    ('<geom type="ellipsoid" size="0.15 0.1 0.08" contype="1" '
     'conaffinity="1"/>',
     '<geom type="ellipsoid" size="0.1 0.12 0.07"/>',
     ["0.2 0 1.0", "0.1 0.1 1.12", "0.3 0.1 1.1"]),
    ('<geom type="cylinder" size="0.1 0.15" contype="1" conaffinity="1"/>',
     '<geom type="box" size="0.08 0.07 0.06"/>',
     ["0.15 0.1 1.18", "0.05 0 1.19"]),
    ('<geom type="cylinder" size="0.1 0.15" euler="30 20 0" contype="1" '
     'conaffinity="1"/>',
     '<geom type="cylinder" size="0.08 0.1" euler="0 45 0"/>',
     ["0.2 0 1.05"]),
    ('<geom type="ellipsoid" size="0.15 0.1 0.08" contype="1" '
     'conaffinity="1"/>',
     '<geom type="capsule" size="0.05 0.1" euler="20 60 0"/>',
     ["0.2 0 1.02"]),
]


@pytest.mark.parametrize("case", range(len(CONVEX_CASES)))
def test_mpr_convex_dist(case):
  """General convex pairs (MPR + MTD polish) vs the oracle's GJK/EPA."""
  g1, g2, positions = CONVEX_CASES[case]
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 1">{g1}</body>
    <body pos="{p}"><freejoint/>{g2}</body>
  </worldbody></mujoco>"""
  for p in positions:
    mjm = mujoco.MjModel.from_xml_string(xml.format(g1=g1, g2=g2, p=p))
    mjd = mujoco.MjData(mjm)
    mujoco.mj_forward(mjm, mjd)
    m = io.put_model(mjm)
    d = io.make_data(m)
    dd = forward.fwd_position(m, d)
    ours = float(jnp.min(dd.contact.dist))
    if mjd.ncon == 0:
      assert ours > -1e-3, (p, ours)
    else:
      np.testing.assert_allclose(ours, mjd.contact.dist.min(), atol=2e-4,
                                 err_msg=p)


def test_mpr_mesh_mesh():
  """Mesh-mesh via MPR (hull support over vertex tables)."""
  xml = """
  <mujoco>
    <asset>
      <mesh name="tet" vertex="0 0 0  0.25 0 0  0 0.25 0  0 0 0.25"/>
      <mesh name="wedge" vertex="-0.15 -0.1 0  0.15 -0.1 0  0.15 0.1 0
                                 -0.15 0.1 0  0 0 0.2"/>
    </asset>
    <worldbody>
      <body pos="0 0 1"><geom type="mesh" mesh="tet" contype="1"
        conaffinity="1"/></body>
      <body pos="{p}" euler="{e}"><freejoint/>
        <geom type="mesh" mesh="wedge"/></body>
    </worldbody>
  </mujoco>"""
  for p, e in [("0.15 0.1 1.1", "0 0 0"), ("0.05 0.05 1.28", "180 0 0"),
               ("0.5 0 1.0", "0 0 0")]:
    mjm = mujoco.MjModel.from_xml_string(xml.format(p=p, e=e))
    mjd = mujoco.MjData(mjm)
    mujoco.mj_forward(mjm, mjd)
    m = io.put_model(mjm)
    d = io.make_data(m)
    dd = forward.fwd_position(m, d)
    ours = float(jnp.min(dd.contact.dist))
    if mjd.ncon == 0:
      assert ours > -2e-3, (p, ours)
    else:
      np.testing.assert_allclose(ours, mjd.contact.dist.min(), atol=2e-3,
                                 err_msg=(p, e))


def test_mpr_ellipsoid_settles():
  """Ellipsoid dropped on a tilted box comes to rest (MPR trajectory)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="3 3 .1"/>
      <body pos="0 0 0.5"><freejoint/>
        <geom type="ellipsoid" size="0.12 0.09 0.05" condim="6"
              friction="1 0.05 0.02"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(1500):
    d = step(d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert 0.02 < qpos[2] < 0.14, qpos[2]
  assert np.abs(np.asarray(d.qvel)).max() < 0.5


# ---------------------------------------------------------------------------
# hfield vs box / cylinder / ellipsoid / mesh (make_hfield_convex: two-sided
# sampling — geom surface lattice vs terrain triangles + grid verts vs SDF)
# ---------------------------------------------------------------------------


def _settle(xml, nstep=1800):
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  step = jax.jit(lambda dd: forward.step(m, dd))
  for _ in range(nstep):
    d = step(d)
  return mjm, m, d


def _oracle_depth_check(mjm, m, d, atol=3e-3):
  """Penetration depth at our settled state matches the C narrowphase."""
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = np.asarray(d.qpos)
  mujoco.mj_forward(mjm, mjd)
  dd = forward.fwd_position(m, d)
  if mjd.ncon:
    np.testing.assert_allclose(float(jnp.min(dd.contact.dist)),
                               mjd.contact.dist.min(), atol=atol)


def test_hfield_box_settles():
  xml = _hfield_xml(
      '<body pos="0.1 -0.05 0.5" euler="0 0 20"><freejoint/>'
      '<geom type="box" size="0.12 0.08 0.05" condim="6" '
      'friction="1 0.02 0.01"/></body>')
  mjm, m, d = _settle(xml)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert 0.0 < qpos[2] < 0.35, qpos[2]
  assert np.abs(qpos[:2]).max() < 0.5
  assert np.abs(np.asarray(d.qvel)).max() < 0.5
  _oracle_depth_check(mjm, m, d)


def test_hfield_flat_box_matches_plane():
  """Box at rest on a FLAT hfield: penetration equals the analytic
  plane-box result (depths exact for family-A corner samples)."""
  nrow, ncol = 5, 5
  datastr = " ".join("0" for _ in range(nrow * ncol))
  xml = f"""
  <mujoco>
    <asset>
      <hfield name="flat" nrow="{nrow}" ncol="{ncol}"
              size="1 1 0.5 0.1" elevation="{datastr}"/>
    </asset>
    <worldbody>
      <geom type="hfield" hfield="flat"/>
      <body pos="0 0 0.0495"><freejoint/>
        <geom type="box" size="0.1 0.1 0.05"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = io.put_model(mjm)
  d = io.make_data(m)
  d = forward.fwd_position(m, d)
  dist = np.sort(np.asarray(d.contact.dist))[:4]
  np.testing.assert_allclose(dist, -0.0005, atol=1e-6)

  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon >= 1
  np.testing.assert_allclose(dist.min(), mjd.contact.dist.min(), atol=1e-7)


def test_hfield_cylinder_settles():
  xml = _hfield_xml(
      '<body pos="-0.15 0.1 0.5" euler="90 0 15"><freejoint/>'
      '<geom type="cylinder" size="0.08 0.15" condim="6" '
      'friction="1 0.02 0.01"/></body>')
  mjm, m, d = _settle(xml)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert 0.0 < qpos[2] < 0.35, qpos[2]
  assert np.abs(np.asarray(d.qvel)).max() < 0.5
  _oracle_depth_check(mjm, m, d, atol=5e-3)


def test_hfield_ellipsoid_settles():
  xml = _hfield_xml(
      '<body pos="0.05 0.15 0.5"><freejoint/>'
      '<geom type="ellipsoid" size="0.1 0.08 0.05" condim="6" '
      'friction="1 0.05 0.02"/></body>')
  mjm, m, d = _settle(xml)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert 0.0 < qpos[2] < 0.35, qpos[2]
  assert np.abs(np.asarray(d.qvel)).max() < 0.6
  _oracle_depth_check(mjm, m, d, atol=5e-3)


def test_hfield_mesh_settles():
  """A convex wedge mesh dropped on the bowl terrain settles; rover-class
  scene (mesh chassis on terrain) loads and steps."""
  body = """
  <body pos="0.1 0 0.5" euler="5 10 30"><freejoint/>
    <geom type="mesh" mesh="wedge" condim="6" friction="1 0.02 0.01"/>
  </body>"""
  xml = _hfield_xml(body).replace(
      "<asset>",
      '<asset><mesh name="wedge" vertex="-0.15 -0.1 0  0.15 -0.1 0  '
      '0.15 0.1 0  -0.15 0.1 0  0 0 0.18"/>')
  mjm, m, d = _settle(xml)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  assert 0.0 < qpos[2] < 0.35, qpos[2]
  assert np.abs(np.asarray(d.qvel)).max() < 0.5
  _oracle_depth_check(mjm, m, d, atol=5e-3)
