"""Passive forces: springs, dampers, gravity compensation, fluid drag.

Counterpart of mj_passive (/root/reference/src/engine/engine_passive.c).
Joint springs are manifold-aware (quaternion log for ball/free rotations);
tendon springs have a deadband interval (tendon_lengthspring). Fluid forces
(inertia-box + ellipsoid models) land with the fluid milestone.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import Data, DisableBit, JointType, Model
from mujoco_tpu.ops import support
from mujoco_tpu.utils import math as mjm


def _joint_springs(m: Model, d: Data):
  """-k · (qpos ⊖ qpos_spring) per joint, assembled scatter-free: grouped
  by joint type, then merged into dof order with one static gather (each dof
  receives at most one spring contribution)."""
  dtype = d.qpos.dtype
  jt_all = np.asarray(m.jnt_type)
  parts = []             # flat contribution chunks
  dof_map = np.full(m.nv, -1, dtype=np.int64)
  pos = 0

  lin = np.nonzero((jt_all == JointType.SLIDE) | (jt_all == JointType.HINGE))[0]
  if len(lin):
    qadr = np.asarray(m.jnt_qposadr)[lin]
    dadr = np.asarray(m.jnt_dofadr)[lin]
    k = m.jnt_stiffness[lin]
    parts.append(-k * (d.qpos[qadr] - m.qpos_spring[qadr]))
    dof_map[dadr] = pos + np.arange(len(lin))
    pos += len(lin)

  ball = np.nonzero(jt_all == JointType.BALL)[0]
  if len(ball):
    qadr = np.asarray(m.jnt_qposadr)[ball][:, None]
    dadr = np.asarray(m.jnt_dofadr)[ball][:, None]
    k = m.jnt_stiffness[ball][:, None]
    dif = mjm.quat_sub(mjm.normalize(d.qpos[qadr + np.arange(4)]),
                       m.qpos_spring[qadr + np.arange(4)])
    parts.append((-k * dif).reshape(-1))
    dof_map[(dadr + np.arange(3)).ravel()] = pos + np.arange(3 * len(ball))
    pos += 3 * len(ball)

  free = np.nonzero(jt_all == JointType.FREE)[0]
  if len(free):
    qadr = np.asarray(m.jnt_qposadr)[free][:, None]
    dadr = np.asarray(m.jnt_dofadr)[free][:, None]
    k = m.jnt_stiffness[free][:, None]
    trn = -k * (d.qpos[qadr + np.arange(3)]
                - m.qpos_spring[qadr + np.arange(3)])
    dif = mjm.quat_sub(mjm.normalize(d.qpos[qadr + 3 + np.arange(4)]),
                       m.qpos_spring[qadr + 3 + np.arange(4)])
    parts.append(jnp.concatenate([trn, -k * dif], axis=-1).reshape(-1))
    span = np.concatenate([dadr + np.arange(3), dadr + 3 + np.arange(3)],
                          axis=-1).ravel()
    dof_map[span] = pos + np.arange(6 * len(free))
    pos += 6 * len(free)

  if not parts:
    return jnp.zeros((m.nv,), dtype=dtype)
  flat = jnp.concatenate(parts + [jnp.zeros((1,), dtype=dtype)])
  return flat[np.where(dof_map >= 0, dof_map, pos)]


def passive(m: Model, d: Data) -> Data:
  """Assemble qfrc_passive = spring + damper + gravcomp (+ fluid)."""
  dtype = d.qpos.dtype
  zero = jnp.zeros((m.nv,), dtype=dtype)
  enbl_spring = not m.disabled(DisableBit.SPRING)
  enbl_damper = not m.disabled(DisableBit.DAMPER)

  qfrc_spring = _joint_springs(m, d) if enbl_spring else zero
  qfrc_damper = -m.dof_damping * d.qvel if enbl_damper else zero

  # flex edge spring-dampers (engine_passive.c:760-791)
  if m.has_flex and m.flx.nedge:
    from mujoco_tpu.ops import flex as flex_mod
    fs, fd = flex_mod.edge_passive(m, d)
    if enbl_spring:
      qfrc_spring = qfrc_spring + fs
    if enbl_damper:
      qfrc_damper = qfrc_damper + fd

  # flex element elasticity: stretch + bending (engine_passive.c:739-758);
  # stretch runs whenever spring-dampers run (its Rayleigh damping is folded
  # into the elastic force), bending parts are gated individually
  if m.has_flex and (m.flx.has_stretch.any() or m.flx.has_bending.any()) \
      and (enbl_spring or enbl_damper):
    from mujoco_tpu.ops import flex as flex_mod
    fs, fd = flex_mod.elasticity_passive(m, d, enbl_spring, enbl_damper)
    qfrc_spring = qfrc_spring + fs
    qfrc_damper = qfrc_damper + fd

  # corotational FEM forces for interpolated flexes
  # (mj_flexPassiveInterp, engine_passive.c:61)
  if m.has_flex and (np.asarray(m.flx.interp_stiffadr) >= 0).any() \
      and (enbl_spring or enbl_damper):
    from mujoco_tpu.ops import flex as flex_mod
    fs, fd = flex_mod.interp_passive(m, d, enbl_spring, enbl_damper)
    qfrc_spring = qfrc_spring + fs
    qfrc_damper = qfrc_damper + fd

  # tendon spring (deadband interval) + damper
  if m.ntendon:
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    x = jnp.where(d.ten_length > hi, d.ten_length - hi,
                  jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
    if enbl_spring:
      qfrc_spring = qfrc_spring + d.ten_J.T @ (-m.tendon_stiffness * x)
    if enbl_damper:
      qfrc_damper = qfrc_damper + d.ten_J.T @ (
          -m.tendon_damping * d.ten_velocity)

  # gravity compensation: anti-gravity force at each body CoM
  qfrc_gravcomp = zero
  if not m.disabled(DisableBit.GRAVITY):
    f = -(m.body_mass * m.body_gravcomp)[:, None] * m.opt.gravity[None, :]
    qfrc_gravcomp = support.apply_ft_all_bodies(
        m, d, f, jnp.zeros_like(f), d.xipos)

  qfrc_fluid = _fluid(m, d) if m.has_fluid else zero

  # joints with jnt_actgravcomp route their gravcomp through qfrc_actuator
  # instead (engine_passive.c:1118, engine_forward.c:988)
  gravcomp_passive = qfrc_gravcomp
  if m.has_actgravcomp:
    from mujoco_tpu.ops import actuation as act_mod
    mask = act_mod._actgravcomp_dof_mask(m)
    gravcomp_passive = jnp.where(jnp.asarray(mask), 0.0, qfrc_gravcomp)

  qfrc_passive = qfrc_spring + qfrc_damper + gravcomp_passive + qfrc_fluid
  if m.user_cb[4] is not None:
    # registered pure-JAX callback (mjcb_passive analog, plugin.py)
    qfrc_passive = qfrc_passive + m.user_cb[4](m, d)
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)


def _fluid(m: Model, d: Data):
  """Fluid forces (mj_fluid, engine_passive.c:871): bodies whose geoms carry
  fluid coefficients use the per-geom ellipsoid model; all others use the
  vectorized inertia-box model (equivalent-box viscous drag + quadratic
  lift/drag in the body inertial frame, wind-relative)."""
  ell_bodies = [b for b in range(m.nbody)
                if m.body_geomnum[b]
                and m.geom_has_fluid[
                    m.body_geomadr[b]:m.body_geomadr[b]
                    + m.body_geomnum[b]].any()]
  qfrc_ell = sum((_ellipsoid_fluid_body(m, d, b) for b in ell_bodies),
                 jnp.zeros((m.nv,), dtype=d.qpos.dtype))
  ell_mask = np.zeros(m.nbody, dtype=bool)
  ell_mask[ell_bodies] = True
  dtype = d.qpos.dtype
  inertia = m.body_inertia                       # (nbody, 3)
  mass = jnp.maximum(m.body_mass, mjm.MINVAL)
  box = jnp.sqrt(jnp.maximum(
      mjm.MINVAL,
      jnp.stack([inertia[:, 1] + inertia[:, 2] - inertia[:, 0],
                 inertia[:, 0] + inertia[:, 2] - inertia[:, 1],
                 inertia[:, 0] + inertia[:, 1] - inertia[:, 2]],
                axis=-1) / mass[:, None] * 6.0))

  # local body-frame 6D velocity at xipos
  com = d.subtree_com[m.body_rootid]
  lvel = mjm.transform_spatial(d.cvel, False, d.xipos, com, d.ximat)
  # wind in the same local frame
  wind = jnp.zeros((m.nbody, 6), dtype=dtype).at[:, 3:].set(
      m.opt.wind[None, :])
  lwind = mjm.transform_spatial(wind, False, d.xipos, com, d.ximat)
  lvel = lvel.at[:, 3:].add(-lwind[:, 3:])

  lfrc = jnp.zeros((m.nbody, 6), dtype=dtype)
  visc = m.opt.viscosity
  dens = m.opt.density

  diam = jnp.mean(box, axis=-1)                  # (nbody,)
  lfrc = lfrc.at[:, :3].add(
      -jnp.pi * (diam ** 3)[:, None] * visc * lvel[:, :3])
  lfrc = lfrc.at[:, 3:].add(-3.0 * jnp.pi * diam[:, None] * visc
                            * lvel[:, 3:])

  b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
  v = lvel
  lfrc = lfrc.at[:, 3].add(-0.5 * dens * b1 * b2 * jnp.abs(v[:, 3]) * v[:, 3])
  lfrc = lfrc.at[:, 4].add(-0.5 * dens * b0 * b2 * jnp.abs(v[:, 4]) * v[:, 4])
  lfrc = lfrc.at[:, 5].add(-0.5 * dens * b0 * b1 * jnp.abs(v[:, 5]) * v[:, 5])
  lfrc = lfrc.at[:, 0].add(-dens * b0 * (b1 ** 4 + b2 ** 4)
                           * jnp.abs(v[:, 0]) * v[:, 0] / 64.0)
  lfrc = lfrc.at[:, 1].add(-dens * b1 * (b0 ** 4 + b2 ** 4)
                           * jnp.abs(v[:, 1]) * v[:, 1] / 64.0)
  lfrc = lfrc.at[:, 2].add(-dens * b2 * (b0 ** 4 + b1 ** 4)
                           * jnp.abs(v[:, 2]) * v[:, 2] / 64.0)

  # rotate to world, zero massless/ellipsoid-model bodies, apply at body CoM
  torque = jnp.einsum('bij,bj->bi', d.ximat, lfrc[:, :3])
  force = jnp.einsum('bij,bj->bi', d.ximat, lfrc[:, 3:])
  live = ((m.body_mass >= mjm.MINVAL) & ~ell_mask)[:, None]
  torque = jnp.where(live, torque, 0.0)
  force = jnp.where(live, force, 0.0)
  return qfrc_ell + support.apply_ft_all_bodies(m, d, force, torque, d.xipos)


def _semi_axes(m: Model, g: int):
  """Equivalent ellipsoid semi-axes per geom type (mju_geomSemiAxes)."""
  from mujoco_tpu.models.types import GeomType
  s = m.geom_size[g]
  t = int(m.geom_type[g])
  if t == GeomType.SPHERE:
    return jnp.stack([s[0], s[0], s[0]])
  if t == GeomType.CAPSULE:
    return jnp.stack([s[0], s[0], s[1] + s[0]])
  if t == GeomType.CYLINDER:
    return jnp.stack([s[0], s[0], s[1]])
  return s[:3]


def _ellipsoid_fluid_body(m: Model, d: Data, bodyid: int):
  """Per-geom ellipsoid fluid model for one body (mj_ellipsoidFluidModel,
  engine_passive.c:1214): added-mass + Magnus/Kutta lift + blunt/slender/
  angular drag, in the geom frame."""
  from mujoco_tpu.ops import sensor as sensor_mod
  from mujoco_tpu.models.types import ObjType
  dtype = d.qpos.dtype
  qfrc = jnp.zeros((m.nv,), dtype=dtype)
  rho = m.opt.density
  visc = m.opt.viscosity
  for j in range(int(m.body_geomnum[bodyid])):
    g = int(m.body_geomadr[bodyid]) + j
    if not m.geom_has_fluid[g]:
      continue
    coefs = m.geom_fluid[g]
    interact = coefs[0]
    blunt, slender, ang_drag = coefs[1], coefs[2], coefs[3]
    kutta, magnus = coefs[4], coefs[5]
    vmass = coefs[6:9]
    vinert = coefs[9:12]
    size = _semi_axes(m, g)

    lvel = sensor_mod.object_velocity(m, d, int(ObjType.GEOM), g, True)
    com = d.subtree_com[m.body_rootid[bodyid]]
    wind6 = jnp.zeros((6,), dtype=dtype).at[3:].set(m.opt.wind)
    lwind = mjm.transform_spatial(wind6, False, d.geom_xpos[g], com,
                                  d.geom_xmat[g])
    w = lvel[:3]
    v = lvel[3:] - lwind[3:]

    lfrc = jnp.zeros((6,), dtype=dtype)
    # added mass (mj_addedMassForces)
    plin = rho * vmass * v
    pang = rho * vinert * w
    lfrc = lfrc.at[:3].add(jnp.cross(plin, v) + jnp.cross(pang, w))
    lfrc = lfrc.at[3:].add(jnp.cross(plin, w))

    # viscous forces (mj_viscousForces)
    volume = 4.0 / 3.0 * jnp.pi * size[0] * size[1] * size[2]
    d_max = jnp.max(size)
    d_min = jnp.min(size)
    d_mid = jnp.sum(size) - d_max - d_min
    a_max = jnp.pi * d_max * d_mid

    magnus_force = jnp.cross(w, v) * (magnus * rho * volume)

    s01, s12, s20 = size[0] * size[1], size[1] * size[2], size[2] * size[0]
    proj_denom = (s12 ** 4 * v[0] ** 2 + s20 ** 4 * v[1] ** 2
                  + s01 ** 4 * v[2] ** 2)
    proj_num = ((s12 * v[0]) ** 2 + (s20 * v[1]) ** 2 + (s01 * v[2]) ** 2)
    a_proj = jnp.pi * jnp.sqrt(
        proj_denom / jnp.maximum(mjm.MINVAL, proj_num))
    norm = jnp.stack([s12 ** 2 * v[0], s20 ** 2 * v[1], s01 ** 2 * v[2]])
    vnorm = mjm.norm_safe(v)
    cos_alpha = proj_num / jnp.maximum(mjm.MINVAL, vnorm * proj_denom)
    kutta_circ = jnp.cross(norm, v) * (kutta * rho * cos_alpha * a_proj)
    kutta_force = jnp.cross(kutta_circ, v)

    eq_d = 2.0 / 3.0 * jnp.sum(size)
    lin_visc_force = 3.0 * jnp.pi * eq_d
    lin_visc_torq = jnp.pi * eq_d ** 3

    i_max = 8.0 / 15.0 * jnp.pi * d_mid * d_max ** 4
    def max_moment(dir_):
      d0 = size[dir_]
      d1 = size[(dir_ + 1) % 3]
      d2 = size[(dir_ + 2) % 3]
      return 8.0 / 15.0 * jnp.pi * d0 * jnp.maximum(d1, d2) ** 4
    ii = jnp.stack([max_moment(0), max_moment(1), max_moment(2)])
    mom_visc = w * (ang_drag * ii + slender * (i_max - ii))

    drag_lin = (visc * lin_visc_force
                + rho * vnorm * (a_proj * blunt + slender * (a_max - a_proj)))
    drag_ang = visc * lin_visc_torq + rho * mjm.norm_safe(mom_visc)

    lfrc = lfrc.at[:3].add(-drag_ang * w)
    lfrc = lfrc.at[3:].add(magnus_force + kutta_force - drag_lin * v)
    lfrc = lfrc * interact

    torque = d.geom_xmat[g] @ lfrc[:3]
    force = d.geom_xmat[g] @ lfrc[3:]
    qfrc = qfrc + support.apply_ft(m, d, force, torque, d.geom_xpos[g],
                                   bodyid)
  return qfrc
