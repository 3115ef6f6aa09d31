"""Whole-step scan-resident Pallas megakernel, batch on the 128-lane axis.

Round-4 profiling on a v5e chip showed the flagship step is bound by HBM
layout, not FLOPs: XLA tiles the two minor dims of every array to (8, 128),
so batch-leading workspace tensors like efc_J (B, 162, 27) are ~5x padded in
HBM (254MB physical for 53MB of data) and cinert (B, nbody, 6, 6) ~21x. Each
stage re-reads them, so the whole jit(vmap(scan(step))) pipeline runs at a
fraction of memory speed-of-light.

This module runs the ENTIRE step - FK, CoM/CRB/RNE, collision, constraint
assembly, the pyramidal Newton solve, Euler integration and the divergence
guard - for 128 environments at a time with every intermediate resident in
VMEM, and the nstep rollout scan INSIDE the kernel: HBM traffic for a whole
trajectory is one read and one write of the integration state.

Structure:
  _lane_step   pure-jnp step on (k, L) lane-layout values; traced both
               inside the Pallas kernel and directly in CPU tests, so the
               physics is testable without TPU hardware.
  _scan_kernel Pallas body: load state, lax.fori_loop(nstep) over
               _lane_step, store state.
  scan_batch   batch-leading Data API used by parallel.rollout.scan_steps.

Supported model class (supported(m)): free/hinge/slide joints;
plane-sphere, plane-capsule, plane-box, sphere-sphere, sphere-capsule,
sphere-box and capsule-capsule contacts with condim 3; joint limits; motor
actuators; joint springs/dampers; Newton + pyramidal with iterations <= 4;
Euler including implicit joint damping (eulerdamp); no tendons/sensors/
equality/flex/sleep/history; monolithic solve only (models the XLA path
would island-decompose stay on the XLA path — disable islands to opt in).
Models outside the class run the general XLA path unchanged.

Reference counterparts: mj_step (engine_forward.c:1849) stage for stage;
the solve is mj_solNewton (engine_solver.c:1975) in the static-unroll
regime; collision mjraw_PlaneSphere / mjc_PlaneCapsule / mjc_PlaneBox /
mjraw_SphereSphere / mjraw_CapsuleCapsule / mjraw_SphereBox
(engine_collision_primitive.c); assembly mj_instantiateContact /
mj_makeImpedance (engine_core_constraint.c); damped Euler
(engine_forward.c:1401).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (ConeType, DisableBit, EnableBit,
                                     GeomType, Integrator, JointType, Model,
                                     SolverType, TrnType)

_LANES = 128
_MINVAL = 1e-15
_MAXVAL = 1e10


def enabled() -> bool:
  return os.environ.get("MJTPU_MEGASTEP", "1") == "1"


# id(m) alone is unsafe as a cache key (a GC'd Model's id can be recycled by
# a different Model -> silently wrong physics), so the cache value carries a
# strong reference to the keying Model and lookups verify identity. The
# strong ref also pins the id, making reuse impossible while the entry lives.
_HOST_CACHE: dict = {}


def _host_model(m: Model) -> Model:
  """Numpy-leaf mirror of the model. Per-leaf np.asarray through the TPU
  tunnel costs ~1.4s of round-trip latency EACH (~150 leaves); issuing all
  the D2H copies asynchronously first brings the whole fetch to ~0.5s."""
  key = id(m)
  cached = _HOST_CACHE.get(key)
  if cached is not None and cached[0] is m:
    return cached[1]
  for x in jax.tree.leaves(m):
    if hasattr(x, "copy_to_host_async"):
      x.copy_to_host_async()
  host = jax.tree.map(np.asarray, m)
  _HOST_CACHE[key] = (m, host)
  return host


# ---------------------------------------------------------------------------
# static gate
# ---------------------------------------------------------------------------


def supported(m: Model) -> bool:
  """Static model-class check for the megakernel fast path."""
  try:
    m = _host_model(m)
    opt = m.opt
    if int(opt.solver) != int(SolverType.NEWTON):
      return False
    if int(opt.cone) != int(ConeType.PYRAMIDAL):
      return False
    if int(opt.iterations) > 4 or int(opt.integrator) != int(Integrator.EULER):
      return False
    if int(opt.noslip_iterations) > 0:
      return False
    if int(opt.enableflags) != 0:
      return False
    if m.disabled(DisableBit.CONSTRAINT) or m.disabled(DisableBit.REFSAFE):
      return False
    if float(opt.viscosity) != 0.0 or float(opt.density) != 0.0:
      return False
    if (m.nsensor or m.ntendon or m.neq or m.nmocap or m.nhistory
        or m.has_flex or m.na):
      return False
    # the kernel is the MONOLITHIC Newton solve; when the XLA path would
    # island-decompose (multi-tree scenes), linesearch differs per island
    # and trajectories diverge — keep the two dispatch paths equivalent.
    # Multi-tree models opt in by disabling islands (mjDSBL_ISLAND).
    from mujoco_tpu.ops import island as _island
    if _island.use_islands(m):
      return False
    if int(opt.enableflags) & int(EnableBit.SLEEP):
      return False
    jt = np.asarray(m.jnt_type)
    if not np.all(np.isin(jt, [int(JointType.FREE), int(JointType.HINGE),
                               int(JointType.SLIDE)])):
      return False
    # springs only on hinge/slide joints
    stiff = np.asarray(m.jnt_stiffness)
    if np.any((stiff != 0) & (jt == int(JointType.FREE))):
      return False
    if np.any(np.asarray(m.body_gravcomp) != 0):
      return False
    # efc layout: limits (hinge/slide, two-sided) + pyramidal contacts only
    meta = m.efc
    if meta.ne or meta.nf:
      return False
    if meta.nl:
      hs = (meta.limit_jnt >= 0) & (meta.limit_side != 0)
      if not np.all(hs):
        return False
    # contacts: static plane-sphere / plane-capsule slots, condim 3
    con = m.con
    if con.ncon:
      if len(con.dyngroups) or len(getattr(con, "sdfgroups", ())):
        return False
      if np.any(np.asarray(con.flex2) >= 0) or np.any(
          np.asarray(con.flex1) >= 0):
        return False
      if np.any(np.asarray(con.condim) != 3):
        return False
      ok_pairs = (
          (int(GeomType.PLANE), int(GeomType.SPHERE)),
          (int(GeomType.PLANE), int(GeomType.CAPSULE)),
          (int(GeomType.PLANE), int(GeomType.BOX)),
          (int(GeomType.SPHERE), int(GeomType.SPHERE)),
          (int(GeomType.SPHERE), int(GeomType.CAPSULE)),
          (int(GeomType.SPHERE), int(GeomType.BOX)),
          (int(GeomType.CAPSULE), int(GeomType.CAPSULE)),
      )
      for c in range(con.ncon):
        if not con.con_first[c]:
          continue
        t1, t2 = int(con.pair_type[c, 0]), int(con.pair_type[c, 1])
        if (t1, t2) not in ok_pairs:
          return False
    # actuators: plain joint motors
    for i in range(m.nu):
      if (int(m.actuator_trntype[i]) != int(TrnType.JOINT)
          or int(m.actuator_dyntype[i]) != 0
          or int(m.actuator_gaintype[i]) != 0
          or int(m.actuator_biastype[i]) != 0):
        return False
      if int(m.jnt_type[int(m.actuator_trnid[i, 0])]) not in (
          int(JointType.HINGE), int(JointType.SLIDE)):
        return False
      if float(m.actuator_delay[i]) != 0.0:
        return False
    return True
  except Exception:
    return False


# ---------------------------------------------------------------------------
# static metadata
# ---------------------------------------------------------------------------


class _Meta:
  """Numpy-only snapshot of everything the lane step needs statically."""

  def __init__(self, m: Model):
    m = _host_model(m)
    f = lambda x: np.asarray(x, dtype=np.float64)
    i = lambda x: np.asarray(x, dtype=np.int64)
    self.nq, self.nv, self.nu = int(m.nq), int(m.nv), int(m.nu)
    self.nbody = int(m.nbody)
    self.timestep = float(m.opt.timestep)
    self.gravity = f(m.opt.gravity)
    self.impratio = float(m.opt.impratio)
    self.iterations = int(m.opt.iterations)
    self.ls_iterations = int(m.opt.ls_iterations)
    self.meaninertia = float(m.stat_meaninertia)
    self.disableflags = int(m.opt.disableflags)

    self.body_parentid = i(m.body_parentid)
    self.body_pos = f(m.body_pos)
    self.body_quat = f(m.body_quat)
    self.body_mass = f(m.body_mass)
    self.body_inertia = f(m.body_inertia)
    self.body_ipos = f(m.body_ipos)
    self.body_iquat = f(m.body_iquat)
    self.body_rootid = i(m.body_rootid)
    self.body_subtreemass = f(m.body_subtreemass)
    self.body_jntadr = i(m.body_jntadr)
    self.body_jntnum = i(m.body_jntnum)
    self.body_invweight0 = f(m.body_invweight0)

    self.jnt_type = i(m.jnt_type)
    self.jnt_qposadr = i(m.jnt_qposadr)
    self.jnt_dofadr = i(m.jnt_dofadr)
    self.jnt_axis = f(m.jnt_axis)
    self.jnt_pos = f(m.jnt_pos)
    self.jnt_range = f(m.jnt_range)
    self.jnt_margin = f(m.jnt_margin)
    self.jnt_solref = f(m.jnt_solref)
    self.jnt_solimp = f(m.jnt_solimp)
    self.jnt_stiffness = f(m.jnt_stiffness)
    self.qpos0 = f(m.qpos0)
    self.qpos_spring = f(m.qpos_spring)

    self.dof_jntid = i(m.dof_jntid)
    self.dof_bodyid = i(m.dof_bodyid)
    self.dof_armature = f(m.dof_armature)
    self.dof_damping = f(m.dof_damping)
    self.has_damping = bool(np.any(self.dof_damping > 0))
    self.dof_invweight0 = f(m.dof_invweight0)

    self.anc_dof = np.asarray(m.tree.ancestor_mask, dtype=np.float64)
    # (nbody, nv)
    self.danc = np.asarray(m.tree.dof_ancestor_mask, dtype=bool)  # (nv, nv)
    self.cdofdot_mask = np.asarray(m.tree.cdofdot_mask, dtype=np.float64)

    self.geom_bodyid = i(m.geom_bodyid)
    self.geom_pos = f(m.geom_pos)
    self.geom_quat = f(m.geom_quat)
    self.geom_size = f(m.geom_size)

    self.actuator_trnid = i(m.actuator_trnid)
    self.actuator_gear0 = f(m.actuator_gear)[:, 0]
    self.actuator_gain0 = f(m.actuator_gainprm)[:, 0]
    self.actuator_ctrlrange = f(m.actuator_ctrlrange)
    self.actuator_ctrllimited = np.asarray(m.actuator_ctrllimited, bool)
    self.actuator_forcerange = f(m.actuator_forcerange)
    self.actuator_forcelimited = np.asarray(m.actuator_forcelimited, bool)
    grp = i(m.actuator_group)
    dis = int(m.opt.disableactuator)
    self.actuator_disabled = ((grp >= 0) & (grp <= 30)
                              & (((dis >> np.clip(grp, 0, 30)) & 1) > 0))

    self.efc_nl = int(m.efc.nl)
    self.nefc = int(m.efc.nefc)
    self.limit_jnt = i(m.efc.limit_jnt) if m.efc.nl else np.zeros(0, np.int64)
    self.limit_side = (i(m.efc.limit_side) if m.efc.nl
                       else np.zeros(0, np.int64))
    self.con_efcadr = i(m.efc.con_efcadr) if m.con.ncon else np.zeros(
        0, np.int64)

    self.ncon = int(m.con.ncon)
    self.con_geom1 = i(m.con.geom1) if self.ncon else np.zeros(0, np.int64)
    self.con_geom2 = i(m.con.geom2) if self.ncon else np.zeros(0, np.int64)
    self.con_first = (np.asarray(m.con.con_first, bool) if self.ncon
                      else np.zeros(0, bool))
    self.con_pair_type = (i(m.con.pair_type) if self.ncon
                          else np.zeros((0, 2), np.int64))
    if self.ncon:
      # numpy port of collision_driver._combine_params for plain geom pairs
      # (mj_contactParam, engine_collision_driver.c:1740): device ops here
      # would each be a tunnel round trip — keep _Meta device-free
      g1 = i(m.con.geom1)
      g2 = np.maximum(i(m.con.geom2), 0)
      pid = i(m.con.pairid)
      minval = 1e-15
      p1 = f(m.geom_priority)[g1]
      p2 = f(m.geom_priority)[g2]
      sm1 = f(m.geom_solmix)[g1]
      sm2 = f(m.geom_solmix)[g2]
      both = (sm1 >= minval) & (sm2 >= minval)
      neither = (sm1 < minval) & (sm2 < minval)
      mix = np.where(both, sm1 / np.maximum(sm1 + sm2, minval),
                     np.where(neither, 0.5, np.where(sm1 < minval, 0.0,
                                                     1.0)))[:, None]
      ref1, ref2 = f(m.geom_solref)[g1], f(m.geom_solref)[g2]
      imp1, imp2 = f(m.geom_solimp)[g1], f(m.geom_solimp)[g2]
      fri1, fri2 = f(m.geom_friction)[g1], f(m.geom_friction)[g2]
      std = (ref1[:, :1] > 0) & (ref2[:, :1] > 0)
      solref = np.where(std, mix * ref1 + (1 - mix) * ref2,
                        np.minimum(ref1, ref2))
      solimp = mix * imp1 + (1 - mix) * imp2
      fri = np.maximum(fri1, fri2)
      hi1 = (p1 > p2)[:, None]
      hi2 = (p2 > p1)[:, None]
      solref = np.where(hi1, ref1, np.where(hi2, ref2, solref))
      solimp = np.where(hi1, imp1, np.where(hi2, imp2, solimp))
      fri = np.where(hi1, fri1, np.where(hi2, fri2, fri))
      friction5 = np.maximum(
          np.stack([fri[:, 0], fri[:, 0], fri[:, 1], fri[:, 2], fri[:, 2]],
                   axis=-1), minval)
      margin = f(m.geom_margin)[g1] + f(m.geom_margin)[g2]
      has_pair = pid >= 0
      if has_pair.any():
        pidx = np.maximum(pid, 0)
        solref = np.where(has_pair[:, None], f(m.pair_solref)[pidx], solref)
        solimp = np.where(has_pair[:, None], f(m.pair_solimp)[pidx], solimp)
        friction5 = np.where(has_pair[:, None], f(m.pair_friction)[pidx],
                             friction5)
        margin = np.where(has_pair, f(m.pair_margin)[pidx], margin)
      self.con_includemargin = margin
      self.con_friction = friction5
      self.con_solref = solref
      self.con_solimp = solimp
    else:
      self.con_includemargin = np.zeros(0)
      self.con_friction = np.zeros((0, 5))
      self.con_solref = np.zeros((0, 2))
      self.con_solimp = np.zeros((0, 5))

    # fresh (reset) state (io.make_data: qpos = qpos0, rest zero — the
    # megastep class has no mocap/act/history)
    self.fresh_qpos = f(m.qpos0)
    self.fresh_qvel = np.zeros(self.nv)
    self.fresh_ctrl = np.zeros(max(self.nu, 1))

    # dof -> qpos linear map (hinge/slide/free-translation)
    mp = np.full(self.nv, -1, dtype=np.int64)
    for j in range(len(self.jnt_type)):
      jt, qa, da = (int(self.jnt_type[j]), int(self.jnt_qposadr[j]),
                    int(self.jnt_dofadr[j]))
      if jt in (int(JointType.HINGE), int(JointType.SLIDE)):
        mp[da] = qa
      elif jt == int(JointType.FREE):
        mp[da:da + 3] = np.arange(qa, qa + 3)
    self.dof_to_q = mp
    # free joints (quaternion spans)
    self.free_joints = [j for j in range(len(self.jnt_type))
                        if int(self.jnt_type[j]) == int(JointType.FREE)]
    # static tree-sparsity chain lists (replace masked dense sums in-kernel)
    self.chain_of_body = [list(np.nonzero(self.anc_dof[b])[0])
                          for b in range(self.nbody)]
    self.pred_of_dof = [list(np.nonzero(self.cdofdot_mask[v])[0])
                        for v in range(self.nv)]
    self.bodies_of_dof = [list(np.nonzero(self.anc_dof[:, v])[0])
                          for v in range(self.nv)]


# same identity-verified scheme as _HOST_CACHE (see note there)
_META_CACHE: dict = {}


def _meta(m: Model) -> _Meta:
  key = id(m)
  cached = _META_CACHE.get(key)
  if cached is not None and cached[0] is m:
    return cached[1]
  mt = _Meta(m)
  _META_CACHE[key] = (m, mt)
  return mt


# ---------------------------------------------------------------------------
# lane math: vectors are (3, L), quats (4, L); all ops elementwise over L
# ---------------------------------------------------------------------------


def _dot3(a, b):
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
  return [a[1] * b[2] - a[2] * b[1],
          a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]]


def _qmul(q, p):
  w1, x1, y1, z1 = q
  w2, x2, y2, z2 = p
  return [w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2]


def _qnorm(q):
  n = jnp.sqrt(jnp.maximum(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                           + q[3] * q[3], _MINVAL * _MINVAL))
  inv = 1.0 / n
  return [c * inv for c in q]


def _qrot(v, q):
  """Rotate vec3 v by quat q: v + 2 r x (r x v + w v)."""
  w = q[0]
  r = q[1:]
  c1 = _cross3(r, v)
  c1 = [c1[k] + w * v[k] for k in range(3)]
  c2 = _cross3(r, c1)
  return [v[k] + 2.0 * c2[k] for k in range(3)]


def _qmat(q):
  """Quat -> 3x3 rotation, returned as nested lists rows x cols of (L,)."""
  w, x, y, z = q
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return [[1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)],
          [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)],
          [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)]]


def _norm3(v):
  n = jnp.sqrt(jnp.maximum(_dot3(v, v), _MINVAL * _MINVAL))
  inv = 1.0 / n
  return [c * inv for c in v], n


def _c(x, like):
  """Constant broadcast to like's shape."""
  return jnp.full_like(like, x)


# vectorized (n, 3, L) helpers -----------------------------------------------


def _vcross(a, b):
  """Cross product over axis -2 of (..., 3, L) arrays."""
  ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
  bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
  return jnp.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx],
                   axis=-2)


# ---------------------------------------------------------------------------
# the lane step
# ---------------------------------------------------------------------------


def _impedance_lane(pos, margin, solimp):
  """getimpedance with static solimp (5 python floats)."""
  d0, dw, width, mid, power = [float(s) for s in solimp]
  # parameter hygiene (make_constraint clamps)
  d0 = min(max(d0, 0.0001), 0.9999)
  dw = min(max(dw, 0.0001), 0.9999)
  width = max(width, 0.0)
  mid = min(max(mid, 0.0001), 0.9999)
  power = max(power, 1.0)
  if d0 == dw or width <= _MINVAL:
    return jnp.full_like(pos, 0.5 * (d0 + dw))
  x_raw = (pos - margin) / width
  x = jnp.clip(jnp.abs(x_raw), 0.0, 1.0)
  def powp(v, p):
    # integer fast paths: Mosaic lacks a general pow; solimp powers are
    # almost always small integers
    if p == int(p) and 1 <= int(p) <= 4:
      out = v
      for _ in range(int(p) - 1):
        out = out * v
      return out
    return jnp.exp(p * jnp.log(jnp.maximum(v, _MINVAL)))

  if power == 1.0:
    y = x
  else:
    a = 1.0 / mid ** (power - 1)
    b = 1.0 / (1 - mid) ** (power - 1)
    y = jnp.where(x <= mid, a * powp(x, power), 1.0 - b * powp(1 - x, power))
  sat_hi = jnp.abs(x_raw) >= 1
  sat_lo = jnp.abs(x_raw) <= 0
  imp = d0 + y * (dw - d0)
  imp = jnp.where(sat_hi, dw, jnp.where(sat_lo, d0, imp))
  return imp


def _kb_static(solref, solimp, timestep, refsafe=True):
  """solref -> (K, B) python floats (static)."""
  dw = min(max(float(solimp[1]), 0.0001), 0.9999)
  ref0, ref1 = float(solref[0]), float(solref[1])
  if refsafe and ref0 > 0:
    ref0 = max(ref0, 2 * timestep)
  if ref0 > 0:
    k = 1.0 / max(_MINVAL, dw * dw * ref0 * ref0 * ref1 * ref1)
  else:
    k = -ref0 / max(_MINVAL, dw * dw)
  if ref1 > 0:
    b = 2.0 / max(_MINVAL, dw * ref0)
  else:
    b = -ref1 / max(_MINVAL, dw)
  return k, b


def _newton_core(J, aref, D, M, a_s, warm,
                 reg: float, iterations: int, ls_iter: int, use_warm: bool):
  """Pyramidal Newton solve on lane values (mirrors newton_tpu._newton_kernel
  but fully value-based so it composes into the step body). The megastep
  model class has no equality or friction rows, so every row is one-sided
  (limits + pyramidal contact edges): the constraint state machine reduces
  to the jar >= 0 saturation test.

  J (nefc, nv, L), aref/D (nefc, L), M (nv, nv, L), a_s/warm (nv, L).
  Returns x, force, qfrc.
  """
  nefc, nv, _ = J.shape
  dtype = J.dtype

  def jmul(x):
    return jnp.sum(J * x[None, :, :], axis=1)

  def jtmul(f):
    return jnp.sum(J * f[:, None, :], axis=0)

  def mmul(x):
    return jnp.sum(M * x[None, :, :], axis=1)

  def update(jar):
    sat = jar >= 0
    force = jnp.where(sat, 0.0, -D * jar)
    cost = jnp.where(sat, 0.0, 0.5 * D * jar * jar)
    w = jnp.where(sat, 0.0, D)
    return force, cost, w

  def cost_of(x, jar):
    _, cost, _ = update(jar)
    dx = x - a_s
    return jnp.sum(cost, axis=0) + 0.5 * jnp.sum(dx * mmul(dx), axis=0)

  if use_warm:
    jar_w = jmul(warm) - aref
    jar_s = jmul(a_s) - aref
    pick = cost_of(warm, jar_w) < cost_of(a_s, jar_s)
    x = jnp.where(pick[None, :], warm, a_s)
  else:
    x = a_s

  ii = jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
  jj = jax.lax.broadcasted_iota(jnp.int32, (1, nv, 1), 1)
  iv = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
  eye_reg = jnp.where(ii == jj, jnp.asarray(reg, dtype=dtype), 0.0)

  for _ in range(iterations):
    jar = jmul(x) - aref
    force, _, w = update(jar)
    mdx = mmul(x - a_s)
    grad = mdx - jtmul(force)

    # H = M + J^T W J + reg, accumulated in static row chunks (Mosaic has no
    # dynamic value indexing; a full (nefc, nv, nv, L) temp would blow VMEM)
    wj = w[:, None, :] * J
    h = M + eye_reg
    chunk = 8
    for c0 in range(0, nefc, chunk):
      c1 = min(c0 + chunk, nefc)
      # expand_dims AFTER slicing: a mixed slice+newaxis subscript lowers to
      # a >2D gather, which Mosaic rejects
      a = jnp.expand_dims(wj[c0:c1], 2)
      bb = jnp.expand_dims(J[c0:c1], 1)
      h = h + jnp.sum(a * bb, axis=0)

    # in-place-style LDL on the value
    for k in range(nv):
      inv = 1.0 / h[k, k, :]
      colk = h[:, k, :]
      rowk = h[k, :, :]
      mask = jnp.logical_and(ii > k, jj > k)
      upd = colk[:, None, :] * rowk[None, :, :] * inv[None, None, :]
      h = h - jnp.where(mask, upd, 0.0)

    y = -grad
    for k in range(nv):
      inv = 1.0 / h[k, k, :]
      lcol = h[:, k, :] * inv[None, :]
      y = y - jnp.where(iv > k, lcol * y[k, :][None, :], 0.0)
    dinv = jnp.stack([1.0 / h[k, k, :] for k in range(nv)], axis=0)
    y = y * dinv
    for k in range(nv - 1, -1, -1):
      inv = 1.0 / h[k, k, :]
      contrib = jnp.where(iv > k, h[k, :, :] * y, 0.0)
      s = jnp.sum(contrib, axis=0) * inv
      y = jnp.where(iv == k, y - s[None, :], y)
    p = y

    jp = jmul(p)
    gx0 = jnp.sum(p * mdx, axis=0)
    pmp = jnp.sum(p * mmul(p), axis=0)
    lo = jnp.zeros_like(gx0)
    hi = jnp.full_like(gx0, jnp.inf)
    has_hi = jnp.zeros(gx0.shape, dtype=bool)
    alpha = jnp.zeros_like(gx0)
    for _ in range(ls_iter):
      jar_a = jar + alpha[None, :] * jp
      force_a, _, w_a = update(jar_a)
      dphi = gx0 + alpha * pmp - jnp.sum(jp * force_a, axis=0)
      ddphi = pmp + jnp.sum(w_a * jp * jp, axis=0)
      neg = dphi < 0
      lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
      has_hi = has_hi | ~neg
      prop = alpha - dphi / jnp.maximum(ddphi, _MINVAL)
      mid = 0.5 * (lo + jnp.where(has_hi, hi, lo))
      ok = (prop >= lo) & (prop <= hi)
      alpha = jnp.where(ok, prop, jnp.where(has_hi, mid, prop))
    alpha = jnp.maximum(alpha, 0.0)
    x = x + alpha[None, :] * p

  jar = jmul(x) - aref
  force, _, _ = update(jar)
  return x, force, jtmul(force)


def _ldl_solve_value(M, g):
  """x = M^-1 g for SPD M (nv, nv, L), g (nv, L), value-based LDL."""
  nv = M.shape[0]
  ii = jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
  jj = jax.lax.broadcasted_iota(jnp.int32, (1, nv, 1), 1)
  iv = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
  h = M
  for k in range(nv):
    inv = 1.0 / h[k, k, :]
    colk = h[:, k, :]
    rowk = h[k, :, :]
    mask = jnp.logical_and(ii > k, jj > k)
    upd = colk[:, None, :] * rowk[None, :, :] * inv[None, None, :]
    h = h - jnp.where(mask, upd, 0.0)
  y = g
  for k in range(nv):
    inv = 1.0 / h[k, k, :]
    lcol = h[:, k, :] * inv[None, :]
    y = y - jnp.where(iv > k, lcol * y[k, :][None, :], 0.0)
  dinv = jnp.stack([1.0 / h[k, k, :] for k in range(nv)], axis=0)
  y = y * dinv
  for k in range(nv - 1, -1, -1):
    inv = 1.0 / h[k, k, :]
    contrib = jnp.where(iv > k, h[k, :, :] * y, 0.0)
    s = jnp.sum(contrib, axis=0) * inv
    y = jnp.where(iv == k, y - s[None, :], y)
  return y


def _make_frame_lane(n, t, t_given: bool):
  """Contact frame rows [n; y; z] from normal n (3,L) and tangent t."""
  n, _ = _norm3(n)
  if t_given:
    y = t
  else:
    ny_small = jnp.abs(n[1]) < 0.5
    y = [jnp.zeros_like(n[0]),
         jnp.where(ny_small, 1.0, 0.0),
         jnp.where(ny_small, 0.0, 1.0)]
  ndoty = _dot3(n, y)
  y = [y[k] - n[k] * ndoty for k in range(3)]
  y, _ = _norm3(y)
  z = _cross3(n, y)
  return n, y, z


def make_consts(mt: _Meta, dtype):
  """Constant tables the lane step needs as ARRAYS (Pallas kernels cannot
  capture array constants — these are passed as loop-invariant inputs)."""
  nv = mt.nv
  strict_t = mt.danc.T & ~np.eye(nv, dtype=bool)
  limitJ = np.zeros((max(mt.efc_nl, 1), nv))
  for r in range(mt.efc_nl):
    j = int(mt.limit_jnt[r])
    limitJ[r, int(mt.jnt_dofadr[j])] = -float(mt.limit_side[r])
  # per contact-GROUP body chain mask (anc[b2] - anc[b1]), first slots only
  cmasks = []
  for c in range(mt.ncon):
    if not mt.con_first[c]:
      continue
    b1 = int(mt.geom_bodyid[int(mt.con_geom1[c])])
    b2 = int(mt.geom_bodyid[int(mt.con_geom2[c])])
    cmasks.append(mt.anc_dof[b2] - mt.anc_dof[b1])
  conmask = (np.stack(cmasks, axis=0) if cmasks
             else np.zeros((1, nv)))
  # NOTE shapes: every array already carries the trailing singleton dims its
  # use site needs — Mosaic cannot relayout a 2D array's tiled dims with a
  # trailing-newaxis reshape, so the expansion happens here, not in-kernel.
  c = dict(
      danc=mt.danc.astype(np.float64)[:, :, None],
      stranc=strict_t.astype(np.float64)[:, :, None],
      armature=(np.eye(nv) * mt.dof_armature)[:, :, None],
      grav6=np.concatenate([np.zeros(3), -mt.gravity])[:, None],
      damping=mt.dof_damping[:, None],
      dampdiag=(np.eye(nv) * mt.dof_damping)[:, :, None],
      limitJ=limitJ[:, :, None],
      conmask=conmask[:, :, None],
      fresh_qpos=mt.fresh_qpos[:, None],
      fresh_qvel=mt.fresh_qvel[:, None],
      fresh_ctrl=(mt.fresh_ctrl if mt.nu else np.zeros(1))[:, None],
  )
  return {k: jnp.asarray(v, dtype=dtype) for k, v in c.items()}


_CONST_NAMES = ("danc", "stranc", "armature", "grav6", "damping", "dampdiag",
                "limitJ", "conmask", "fresh_qpos", "fresh_qvel", "fresh_ctrl")


def _lane_step(mt: _Meta, consts, qpos, qvel, ctrl, warm, qfrc_applied, xfrc,
               dtype):
  """One physics step on lane-layout values. Returns (qpos', qvel', warm',
  qacc)."""
  nv, nq, nb = mt.nv, mt.nq, mt.nbody
  h = mt.timestep
  dis = mt.disableflags

  def off(bit):
    return bool(dis & int(bit))

  # ---- normalize free-joint quaternions in qpos (mj_normalizeQuat)
  qrows = [qpos[k] for k in range(nq)]
  for j in mt.free_joints:
    qa = int(mt.jnt_qposadr[j]) + 3
    q = _qnorm([qrows[qa + k] for k in range(4)])
    for k in range(4):
      qrows[qa + k] = q[k]
  qpos = jnp.stack(qrows, axis=0)

  # ---- FK (bodies are topologically ordered: parent < child)
  L = qpos.shape[-1]
  zero = jnp.zeros((L,), dtype=dtype)
  one = jnp.ones((L,), dtype=dtype)
  xp = [[zero, zero, zero]]
  xq = [[one, zero, zero, zero]]
  xanchor = {}
  xaxis = {}
  for b in range(1, nb):
    pid = int(mt.body_parentid[b])
    pq, pp = xq[pid], xp[pid]
    bpc = mt.body_pos[b]
    bqc = mt.body_quat[b]
    bq = _qnorm(_qmul(pq, [_c(bqc[k], zero) for k in range(4)]))
    rot = _qrot([_c(bpc[k], zero) for k in range(3)], pq)
    bp = [pp[k] + rot[k] for k in range(3)]
    for kk in range(int(mt.body_jntnum[b])):
      j = int(mt.body_jntadr[b]) + kk
      jt = int(mt.jnt_type[j])
      qa = int(mt.jnt_qposadr[j])
      ax_c = mt.jnt_axis[j]
      jp_c = mt.jnt_pos[j]
      if jt == int(JointType.FREE):
        bp = [qpos[qa + k] for k in range(3)]
        bq = _qnorm([qpos[qa + 3 + k] for k in range(4)])
        xanchor[j] = bp
        xaxis[j] = [_c(ax_c[k], zero) for k in range(3)]
      else:
        axis_w = _qrot([_c(ax_c[k], zero) for k in range(3)], bq)
        jpos_w = _qrot([_c(jp_c[k], zero) for k in range(3)], bq)
        anchor = [bp[k] + jpos_w[k] for k in range(3)]
        if jt == int(JointType.SLIDE):
          tr = qpos[qa] - float(mt.qpos0[qa])
          bp = [bp[k] + axis_w[k] * tr for k in range(3)]
        else:  # HINGE
          half = 0.5 * (qpos[qa] - float(mt.qpos0[qa]))
          s = jnp.sin(half)
          cw = jnp.cos(half)
          qloc = [cw, _c(ax_c[0], zero) * s, _c(ax_c[1], zero) * s,
                  _c(ax_c[2], zero) * s]
          bq = _qmul(bq, qloc)
          jpos_new = _qrot([_c(jp_c[k], zero) for k in range(3)], bq)
          bp = [anchor[k] - jpos_new[k] for k in range(3)]
        xanchor[j] = anchor
        xaxis[j] = axis_w
    bq = _qnorm(bq)
    xp.append(bp)
    xq.append(bq)

  # inertial frames
  xipos = []
  ximat = []
  for b in range(nb):
    ip = mt.body_ipos[b]
    r = _qrot([_c(ip[k], zero) for k in range(3)], xq[b])
    xipos.append([xp[b][k] + r[k] for k in range(3)])
    iq = mt.body_iquat[b]
    ximat.append(_qmat(_qmul(xq[b], [_c(iq[k], zero) for k in range(4)])))

  # ---- subtree CoM (children have larger ids: reverse accumulate)
  msum = [[xipos[b][k] * float(mt.body_mass[b]) for k in range(3)]
          for b in range(nb)]
  mass_acc = list(msum)
  for b in range(nb - 1, 0, -1):
    pid = int(mt.body_parentid[b])
    mass_acc[pid] = [mass_acc[pid][k] + mass_acc[b][k] for k in range(3)]
  subtree_com = []
  for b in range(nb):
    sm = float(mt.body_subtreemass[b])
    if sm > _MINVAL:
      subtree_com.append([mass_acc[b][k] / sm for k in range(3)])
    else:
      subtree_com.append(xipos[b])

  # ---- cinert (6,6) per body, angular-first (mju_inertCom)
  cinert = [None] * nb
  for b in range(nb):
    if b == 0:
      cinert[b] = jnp.zeros((6, 6, L), dtype=dtype)
      continue
    R = ximat[b]
    Idiag = mt.body_inertia[b]
    mass = float(mt.body_mass[b])
    root = int(mt.body_rootid[b])
    offv = [xipos[b][k] - subtree_com[root][k] for k in range(3)]
    # icom = R diag(I) R^T
    icom = [[sum(R[a][k] * float(Idiag[k]) * R[c][k] for k in range(3))
             for c in range(3)] for a in range(3)]
    # cx = skew(off)
    cx = [[zero, -offv[2], offv[1]],
          [offv[2], zero, -offv[0]],
          [-offv[1], offv[0], zero]]
    # blocks
    tl = [[icom[a][c] + mass * sum(cx[a][k] * cx[c][k] for k in range(3))
           for c in range(3)] for a in range(3)]
    tr = [[mass * cx[a][c] for c in range(3)] for a in range(3)]
    bl = [[mass * cx[c][a] for c in range(3)] for a in range(3)]
    br = [[_c(mass, zero) if a == c else zero for c in range(3)]
          for a in range(3)]
    rows = []
    for a in range(3):
      rows.append(jnp.stack(tl[a] + tr[a], axis=0))
    for a in range(3):
      rows.append(jnp.stack(bl[a] + br[a], axis=0))
    cinert[b] = jnp.stack(rows, axis=0)          # (6, 6, L)

  # ---- cdof (nv, 6, L)
  cdof_rows = []
  for v in range(nv):
    j = int(mt.dof_jntid[v])
    b = int(mt.dof_bodyid[v])
    jt = int(mt.jnt_type[j])
    root = int(mt.body_rootid[b])
    din = v - int(mt.jnt_dofadr[j])
    if jt == int(JointType.SLIDE):
      ax = xaxis[j]
      row = [zero, zero, zero] + ax
    elif jt == int(JointType.HINGE):
      ax = xaxis[j]
      offca = [subtree_com[root][k] - xanchor[j][k] for k in range(3)]
      lin = _cross3(ax, offca)
      row = ax + lin
    elif din < 3:  # free translation
      e = [one if k == din else zero for k in range(3)]
      row = [zero, zero, zero] + e
    else:  # free rotation: axis = xmat column (din-3)
      Rb = _qmat(xq[b])
      col = din - 3
      ax = [Rb[0][col], Rb[1][col], Rb[2][col]]
      offca = [subtree_com[root][k] - xanchor[j][k] for k in range(3)]
      lin = _cross3(ax, offca)
      row = ax + lin
    cdof_rows.append(jnp.stack(row, axis=0))
  cdof = jnp.stack(cdof_rows, axis=0)            # (nv, 6, L)

  # ---- CRB -> qM
  crb = list(cinert)
  for b in range(nb - 1, 0, -1):
    pid = int(mt.body_parentid[b])
    if pid > 0:
      crb[pid] = crb[pid] + crb[b]
  crbdof = jnp.stack([crb[int(mt.dof_bodyid[v])] for v in range(nv)],
                     axis=0)                     # (nv, 6, 6, L)
  u = jnp.sum(crbdof * cdof[:, None, :, :], axis=2)          # (nv, 6, L)
  p_ = jnp.sum(u[:, None, :, :] * cdof[None, :, :, :], axis=2)  # (nv,nv,L)
  pT = jnp.sum(u[None, :, :, :] * cdof[:, None, :, :], axis=2)  # p_[j,i]
  qM = (jnp.where(consts["danc"] > 0, p_, 0.0)
        + jnp.where(consts["stranc"] > 0, pT, 0.0))
  qM = qM + consts["armature"]

  # ---- com_vel: cvel per body, cdof_dot per dof (static tree chains —
  # Mosaic cannot relayout a 2D mask into 4D, so the sparse sums unroll)
  qcd = cdof * qvel[:, None, :]                  # (nv, 6, L)
  z6 = jnp.zeros((6, L), dtype=dtype)

  def chain_sum(arr, idxs):
    acc = z6
    for v in idxs:
      acc = acc + arr[int(v)]
    return acc

  cvel = jnp.stack([chain_sum(qcd, mt.chain_of_body[b]) for b in range(nb)],
                   axis=0)                       # (nbody, 6, L)
  vpred = jnp.stack([chain_sum(qcd, mt.pred_of_dof[v]) for v in range(nv)],
                    axis=0)                      # (nv, 6, L)
  # motion cross: [w x mw ; w x mu + u x mw]
  wv, uv = vpred[:, 0:3, :], vpred[:, 3:6, :]
  mw, mu = cdof[:, 0:3, :], cdof[:, 3:6, :]
  cdof_dot = jnp.concatenate(
      [_vcross(wv, mw), _vcross(wv, mu) + _vcross(uv, mw)], axis=1)

  # ---- RNE (flg_acc=0) -> qfrc_bias
  qcdd = cdof_dot * qvel[:, None, :]
  gbase = (jnp.zeros_like(consts["grav6"]) if off(DisableBit.GRAVITY)
           else consts["grav6"])
  cacc = (jnp.stack([chain_sum(qcdd, mt.chain_of_body[b]) for b in range(nb)],
                    axis=0)
          + gbase[None, :, :])
  cinert_all = jnp.stack(cinert, axis=0)         # (nbody, 6, 6, L)
  icacc = jnp.sum(cinert_all * cacc[:, None, :, :], axis=2)
  icvel = jnp.sum(cinert_all * cvel[:, None, :, :], axis=2)
  # force cross: v x* f = [w x n + u x g ; w x g]
  wb, ub = cvel[:, 0:3, :], cvel[:, 3:6, :]
  nb_, gb_ = icvel[:, 0:3, :], icvel[:, 3:6, :]
  fcross = jnp.concatenate(
      [_vcross(wb, nb_) + _vcross(ub, gb_), _vcross(wb, gb_)], axis=1)
  fall = icacc + fcross                          # (nbody, 6, L)
  tmp = jnp.stack([chain_sum(fall, mt.bodies_of_dof[v]) for v in range(nv)],
                  axis=0)                        # (nv, 6, L)
  qfrc_bias = jnp.sum(tmp * cdof, axis=1)        # (nv, L)

  # ---- passive: joint springs (hinge/slide) + dof dampers
  qfrc_passive = jnp.zeros((nv, L), dtype=dtype)
  if not off(DisableBit.SPRING):
    vals = []
    rowids = []
    for j in range(len(mt.jnt_type)):
      k = float(mt.jnt_stiffness[j])
      if k == 0.0:
        continue
      jt = int(mt.jnt_type[j])
      if jt not in (int(JointType.HINGE), int(JointType.SLIDE)):
        continue
      qa, da = int(mt.jnt_qposadr[j]), int(mt.jnt_dofadr[j])
      vals.append(-k * (qpos[qa] - float(mt.qpos_spring[qa])))
      rowids.append(da)
    if vals:
      rows = [jnp.zeros((L,), dtype=dtype)] * nv
      for rid, val in zip(rowids, vals):
        rows[rid] = rows[rid] + val
      qfrc_passive = qfrc_passive + jnp.stack(rows, axis=0)
  if not off(DisableBit.DAMPER):
    qfrc_passive = qfrc_passive - consts["damping"] * qvel

  # ---- actuation: plain joint motors
  qfrc_actuator = jnp.zeros((nv, L), dtype=dtype)
  if mt.nu and not off(DisableBit.ACTUATION):
    crows = [ctrl[i] for i in range(mt.nu)]
    if not off(DisableBit.CLAMPCTRL):
      for i in range(mt.nu):
        if mt.actuator_ctrllimited[i]:
          lo, hi_ = mt.actuator_ctrlrange[i]
          crows[i] = jnp.clip(crows[i], float(lo), float(hi_))
    # bad-ctrl guard: any nan/huge zeroes all controls (mjWARN_BADCTRL)
    ctrl_stack = jnp.stack(crows, axis=0)
    bad = jnp.any((ctrl_stack != ctrl_stack)
                  | (jnp.abs(ctrl_stack) > _MAXVAL), axis=0)
    rows = [jnp.zeros((L,), dtype=dtype)] * nv
    for i in range(mt.nu):
      if mt.actuator_disabled[i]:
        continue
      force = float(mt.actuator_gain0[i]) * crows[i]
      if mt.actuator_forcelimited[i]:
        lo, hi_ = mt.actuator_forcerange[i]
        force = jnp.clip(force, float(lo), float(hi_))
      force = jnp.where(bad, 0.0, force)
      j = int(mt.actuator_trnid[i, 0])
      da = int(mt.jnt_dofadr[j])
      rows[da] = rows[da] + float(mt.actuator_gear0[i]) * force
    qfrc_actuator = jnp.stack(rows, axis=0)

  # ---- xfrc_applied accumulation (mj_xfrcAccumulate)
  qfrc_x = jnp.zeros((nv, L), dtype=dtype)
  if xfrc is not None:
    f6 = []
    for b in range(nb):
      fb = [xfrc[6 * b + k] for k in range(3)]
      tb = [xfrc[6 * b + 3 + k] for k in range(3)]
      root = int(mt.body_rootid[b])
      dp = [xipos[b][k] - subtree_com[root][k] for k in range(3)]
      to = _cross3(dp, fb)
      to = [tb[k] + to[k] for k in range(3)]
      f6.append(jnp.stack(to + fb, axis=0))
    f6 = jnp.stack(f6, axis=0)                   # (nbody, 6, L)
    tmpx = jnp.stack(
        [chain_sum(f6, mt.bodies_of_dof[v]) for v in range(nv)], axis=0)
    qfrc_x = jnp.sum(tmpx * cdof, axis=1)

  qfrc_smooth = qfrc_passive - qfrc_bias + qfrc_actuator + qfrc_applied \
      + qfrc_x
  a_s = _ldl_solve_value(qM, qfrc_smooth)

  # ---- collision + constraint assembly
  nefc = mt.nefc
  nl = mt.efc_nl
  if nefc:
    J_rows = []
    aref_rows = []
    D_rows = []
    R_rows = []
    limit_enabled = not off(DisableBit.LIMIT)
    # limit rows (hinge/slide): J constant one-hot, pos traced
    for r in range(nl):
      j = int(mt.limit_jnt[r])
      side = float(mt.limit_side[r])
      qa, da = int(mt.jnt_qposadr[j]), int(mt.jnt_dofadr[j])
      lim = (mt.jnt_range[j, 0] if side < 0 else mt.jnt_range[j, 1])
      dist = side * (float(lim) - qpos[qa])
      margin = float(mt.jnt_margin[j])
      active = (dist < margin) if limit_enabled else jnp.zeros(
          (L,), dtype=bool)
      J_rows.append(consts["limitJ"][r] * one[None, :])
      imp = _impedance_lane(dist, margin, mt.jnt_solimp[j])
      k_, b_ = _kb_static(mt.jnt_solref[j], mt.jnt_solimp[j], h)
      diaga = float(mt.dof_invweight0[da])
      r_row = jnp.maximum(_MINVAL, (1 - imp) * diaga / imp)
      jqvel = -side * qvel[da]
      aref_r = -b_ * jqvel - k_ * imp * (dist - margin)
      act_f = active.astype(dtype)
      aref_rows.append(aref_r * act_f)
      D_rows.append(act_f / r_row)
      R_rows.append(r_row)

    # contacts: per-pair-type lane narrowphase, replicating the XLA path's
    # ops/collision_primitive.py formulas exactly (the dispatch differential
    # test pins lane_step == forward.step at 1e-9)
    contact_enabled = not off(DisableBit.CONTACT)

    # per-dof root CoM for point Jacobians (the XLA path's
    # o = subtree_com[body_rootid[dof_bodyid]]): cross-tree contacts
    # (e.g. capsule-capsule between two free bodies) involve dofs of BOTH
    # trees, each measured about its OWN root com
    comdof = jnp.stack(
        [jnp.stack(subtree_com[int(mt.body_rootid[int(mt.dof_bodyid[v])])],
                   axis=0) for v in range(nv)], axis=0)      # (nv, 3, L)

    def sphere_sphere_lane(c1, r1, c2, r2, ax1, ax2):
      """(_sphere_sphere_pts): dist, pos, normal with coincident-center
      fallback normal = normalize(ax1 x ax2)."""
      dif = [c2[k] - c1[k] for k in range(3)]
      len_ = jnp.sqrt(jnp.maximum(_dot3(dif, dif), _MINVAL * _MINVAL))
      nrm = [dif[k] / len_ for k in range(3)]
      alt = _cross3(ax1, ax2)
      alt, _ = _norm3(alt)
      use_alt = len_ < 1e-9
      nrm = [jnp.where(use_alt, alt[k], nrm[k]) for k in range(3)]
      dist = len_ - r1 - r2
      pos = [c1[k] + nrm[k] * (r1 + dist / 2.0) for k in range(3)]
      return dist, pos, nrm

    slot = 0
    group = 0
    while slot < mt.ncon:
      g1 = int(mt.con_geom1[slot])
      g2 = int(mt.con_geom2[slot])
      t1 = int(mt.con_pair_type[slot, 0])
      t2 = int(mt.con_pair_type[slot, 1])
      b1 = int(mt.geom_bodyid[g1])
      b2 = int(mt.geom_bodyid[g2])
      # world poses of the two geoms
      gq1 = _qmul(xq[b1], [_c(mt.geom_quat[g1][k], zero) for k in range(4)])
      gq2 = _qmul(xq[b2], [_c(mt.geom_quat[g2][k], zero) for k in range(4)])
      gp1r = _qrot([_c(mt.geom_pos[g1][k], zero) for k in range(3)], xq[b1])
      gp2r = _qrot([_c(mt.geom_pos[g2][k], zero) for k in range(3)], xq[b2])
      p1 = [xp[b1][k] + gp1r[k] for k in range(3)]
      p2 = [xp[b2][k] + gp2r[k] for k in range(3)]
      size1 = mt.geom_size[g1]
      size2 = mt.geom_size[g2]
      SPH, CAP, BOX = (int(GeomType.SPHERE), int(GeomType.CAPSULE),
                       int(GeomType.BOX))
      # candidates: (dist, cpos, normal, tangent_or_None) per group slot
      if t1 == int(GeomType.PLANE):
        n_ = _qrot([zero, zero, one], gq1)       # plane normal (z col)
        if t2 == SPH or t2 == CAP:
          if t2 == SPH:
            pts = [(p2, float(size2[0]), None)]
          else:                                  # two end spheres
            axis = _qrot([zero, zero, one], gq2)
            seg = [axis[k] * float(size2[1]) for k in range(3)]
            pts = [([p2[k] + seg[k] for k in range(3)], float(size2[0]),
                    axis),
                   ([p2[k] - seg[k] for k in range(3)], float(size2[0]),
                    axis)]
          cand = []
          for center, radius, tangent in pts:
            cdist = _dot3([center[k] - p1[k] for k in range(3)], n_)
            dist = cdist - radius
            cpos = [center[k] + n_[k] * (-dist / 2.0 - radius)
                    for k in range(3)]
            cand.append((dist, cpos, n_, tangent))
        elif t2 == BOX:
          # all 8 corners, 4 deepest kept in stable-argsort order
          # (plane_box, collision_primitive.py:59)
          corners = []
          cdists = []
          for sx in (-1, 1):
            for sy in (-1, 1):
              for sz in (-1, 1):
                off_l = [sx * float(size2[0]), sy * float(size2[1]),
                         sz * float(size2[2])]
                offw = _qrot([_c(off_l[k], zero) for k in range(3)], gq2)
                corner = [p2[k] + offw[k] for k in range(3)]
                corners.append(corner)
                cdists.append(_dot3(
                    [corner[k] - p1[k] for k in range(3)], n_))
          # stable rank: rank_i = #{j: d_j < d_i or (d_j == d_i and j < i)}
          ranks = []
          for i in range(8):
            r_ = jnp.zeros_like(cdists[0])
            for j_ in range(8):
              if j_ < i:
                r_ = r_ + (cdists[j_] <= cdists[i]).astype(dtype)
              elif j_ > i:
                r_ = r_ + (cdists[j_] < cdists[i]).astype(dtype)
            ranks.append(r_)
          cand = []
          for s_ in range(4):
            dist = jnp.zeros_like(cdists[0])
            cpos = [jnp.zeros_like(cdists[0]) for _ in range(3)]
            for i in range(8):
              sel = (ranks[i] == float(s_)).astype(dtype)
              dist = dist + sel * cdists[i]
              for k in range(3):
                cpos[k] = cpos[k] + sel * (corners[i][k]
                                           - 0.5 * cdists[i] * n_[k])
            cand.append((dist, cpos, n_, None))
        else:
          raise NotImplementedError((t1, t2))
      elif (t1, t2) == (SPH, SPH):
        ax1 = _qrot([zero, zero, one], gq1)
        ax2 = _qrot([zero, zero, one], gq2)
        dist, cpos, n_ = sphere_sphere_lane(p1, float(size1[0]), p2,
                                            float(size2[0]), ax1, ax2)
        cand = [(dist, cpos, n_, None)]
      elif (t1, t2) == (SPH, CAP):
        ax1 = _qrot([zero, zero, one], gq1)
        axis = _qrot([zero, zero, one], gq2)
        x = jnp.clip(_dot3(axis, [p1[k] - p2[k] for k in range(3)]),
                     -float(size2[1]), float(size2[1]))
        nearest = [p2[k] + axis[k] * x for k in range(3)]
        dist, cpos, n_ = sphere_sphere_lane(p1, float(size1[0]), nearest,
                                            float(size2[0]), ax1, axis)
        cand = [(dist, cpos, n_, None)]
      elif (t1, t2) == (SPH, BOX):
        # closest point on box to sphere center; deep-penetration pushes
        # out along the shallowest face (sphere_box,
        # collision_primitive.py:180)
        r1f = float(size1[0])
        half = [float(size2[k]) for k in range(3)]
        dp = [p1[k] - p2[k] for k in range(3)]
        qc = [gq2[0], -gq2[1], -gq2[2], -gq2[3]]     # world -> box frame
        c = _qrot(dp, qc)
        cl = [jnp.clip(c[k], -half[k], half[k]) for k in range(3)]
        inside = ((jnp.abs(c[0]) < half[0]) & (jnp.abs(c[1]) < half[1])
                  & (jnp.abs(c[2]) < half[2]))
        dif = [c[k] - cl[k] for k in range(3)]
        len_out = jnp.sqrt(jnp.maximum(_dot3(dif, dif), _MINVAL * _MINVAL))
        n_out = [dif[k] / len_out for k in range(3)]
        dist_out = len_out - r1f
        fd = [half[k] - jnp.abs(c[k]) for k in range(3)]
        ax0 = (fd[0] <= fd[1]) & (fd[0] <= fd[2])    # argmin first-index
        ax1 = (~ax0) & (fd[1] <= fd[2])
        ax2 = (~ax0) & (~ax1)
        axm = [ax0, ax1, ax2]
        sgn = [jnp.sign(c[k]) for k in range(3)]
        n_in = [jnp.where(axm[k], sgn[k], 0.0) for k in range(3)]
        fd_min = jnp.where(ax0, fd[0], jnp.where(ax1, fd[1], fd[2]))
        dist_in = -(fd_min + r1f)
        pos_in = [jnp.where(axm[k], sgn[k] * half[k], c[k])
                  for k in range(3)]
        dist = jnp.where(inside, dist_in, dist_out)
        n_box = [jnp.where(inside, n_in[k], n_out[k]) for k in range(3)]
        pos_box = [jnp.where(inside, pos_in[k], cl[k]) for k in range(3)]
        nw = _qrot(n_box, gq2)
        n_c = [-nw[k] for k in range(3)]             # sphere -> box
        cpos = [p1[k] + n_c[k] * (r1f + dist / 2.0) for k in range(3)]
        cand = [(dist, cpos, n_c, None)]
      elif (t1, t2) == (CAP, CAP):
        # segment-segment closest points; parallel case emits 2 contacts
        # (capsule_capsule, collision_primitive.py:106)
        ax1 = _qrot([zero, zero, one], gq1)
        ax2 = _qrot([zero, zero, one], gq2)
        r1f, hl1 = float(size1[0]), float(size1[1])
        r2f, hl2 = float(size2[0]), float(size2[1])
        a1 = [ax1[k] * hl1 for k in range(3)]
        a2 = [ax2[k] * hl2 for k in range(3)]
        dif = [p1[k] - p2[k] for k in range(3)]
        ma = _dot3(a1, a1)
        mb = -_dot3(a1, a2)
        mc = _dot3(a2, a2)
        u_ = -_dot3(a1, dif)
        v_ = _dot3(a2, dif)
        det = ma * mc - mb * mb
        parallel = jnp.abs(det) < _MINVAL
        safe_det = jnp.where(parallel, 1.0, det)
        x1 = (mc * u_ - mb * v_) / safe_det
        x2 = (ma * v_ - mb * u_) / safe_det
        x2 = jnp.where(x1 > 1, (v_ - mb) / mc,
                       jnp.where(x1 < -1, (v_ + mb) / mc, x2))
        x1 = jnp.clip(x1, -1, 1)
        x1 = jnp.where(x2 > 1, jnp.clip((u_ - mb) / ma, -1, 1),
                       jnp.where(x2 < -1, jnp.clip((u_ + mb) / ma, -1, 1),
                                 x1))
        x2 = jnp.clip(x2, -1, 1)
        g_d, g_p, g_n = sphere_sphere_lane(
            [p1[k] + a1[k] * x1 for k in range(3)], r1f,
            [p2[k] + a2[k] * x2 for k in range(3)], r2f, ax1, ax2)
        # parallel candidates (reference early-exit emulation)
        x2a = jnp.clip((v_ - mb) / mc, -1, 1)
        x2b = jnp.clip((v_ + mb) / mc, -1, 1)
        x1c = jnp.clip((u_ - mb) / ma, -1, 1)
        x1d = jnp.clip((u_ + mb) / ma, -1, 1)
        cands4 = [
            sphere_sphere_lane([p1[k] + a1[k] for k in range(3)], r1f,
                               [p2[k] + a2[k] * x2a for k in range(3)],
                               r2f, ax1, ax2),
            sphere_sphere_lane([p1[k] - a1[k] for k in range(3)], r1f,
                               [p2[k] + a2[k] * x2b for k in range(3)],
                               r2f, ax1, ax2),
            sphere_sphere_lane([p1[k] + a1[k] * x1c for k in range(3)],
                               r1f, [p2[k] + a2[k] for k in range(3)],
                               r2f, ax1, ax2),
            sphere_sphere_lane([p1[k] + a1[k] * x1d for k in range(3)],
                               r1f, [p2[k] - a2[k] for k in range(3)],
                               r2f, ax1, ax2),
        ]
        acts = [(cd < 0).astype(dtype) for cd, _, _ in cands4]
        csum = []
        run = jnp.zeros_like(acts[0])
        for a_i in acts:
          run = run + a_i
          csum.append(run)  # cumulative count INCLUDING current
        big = jnp.full_like(acts[0], 1e10)
        par = [None, None]
        for s_ in range(2):
          dist_s = big if s_ == 1 else cands4[0][0]
          pos_s = [jnp.zeros_like(acts[0]) for _ in range(3)]
          nrm_s = [jnp.zeros_like(acts[0]) for _ in range(3)]
          got = jnp.zeros_like(acts[0])
          for ci, (cd, cp, cn) in enumerate(cands4):
            sel = ((acts[ci] > 0) & (csum[ci] == float(s_ + 1))
                   & (got == 0)).astype(dtype)
            got = got + sel
            dist_s = jnp.where(sel > 0, cd, dist_s)
            for k in range(3):
              pos_s[k] = pos_s[k] + sel * cp[k]
              nrm_s[k] = nrm_s[k] + sel * cn[k]
          # slots with no s_-th active candidate keep argmax-0 fallback
          # (XLA: pos/normal from candidate sel index, dist cd[0]/_BIG)
          for k in range(3):
            pos_s[k] = jnp.where(got > 0, pos_s[k], cands4[0][1][k])
            nrm_s[k] = jnp.where(got > 0, nrm_s[k], cands4[0][2][k])
          par[s_] = (dist_s, pos_s, nrm_s)
        cand = []
        for s_ in range(2):
          dist = jnp.where(parallel, par[s_][0], g_d if s_ == 0 else big)
          cpos = [jnp.where(parallel, par[s_][1][k], g_p[k])
                  for k in range(3)]
          nrm = [jnp.where(parallel, par[s_][2][k], g_n[k])
                 for k in range(3)]
          cand.append((dist, cpos, nrm, None))
      else:
        raise NotImplementedError((t1, t2))

      # contact params for this slot (static)
      incmargin = float(mt.con_includemargin[slot])
      fri = mt.con_friction[slot]
      solref = mt.con_solref[slot]
      solimp = mt.con_solimp[slot]
      k_, b_ = _kb_static(solref, solimp, h)
      tran = (float(mt.body_invweight0[b1, 0])
              + float(mt.body_invweight0[b2, 0]))
      mu = float(fri[0]) / np.sqrt(mt.impratio)
      # body chain mask: anc[b2] - anc[b1], applied to the REDUCED rows
      # (equivalent to masking jacp: the frame projection is per-dof linear)
      cmask2 = consts["conmask"][group]                          # (nv, 1)
      group += 1
      for dist, cpos, n_c, tangent in cand:
        fn, ft1, ft2 = _make_frame_lane(n_c, tangent, tangent is not None)
        active = (dist < incmargin) if contact_enabled else jnp.zeros(
            (L,), dtype=bool)
        act_f = active.astype(dtype)
        # jacp (nv, 3, L): lin + ang x (pos - com_root(dof)); chain mask
        # applied after the frame projection
        rel = (jnp.stack([cpos[k] for k in range(3)], axis=0)[None, :, :]
               - comdof)                          # (nv, 3, L)
        jacp = cdof[:, 3:6, :] + _vcross(cdof[:, 0:3, :], rel)
        fnj = jnp.stack(fn, axis=0)[None, :, :]
        ft1j = jnp.stack(ft1, axis=0)[None, :, :]
        ft2j = jnp.stack(ft2, axis=0)[None, :, :]
        jn = jnp.sum(jacp * fnj, axis=1) * cmask2   # (nv, L)
        jt1 = jnp.sum(jacp * ft1j, axis=1) * cmask2
        jt2 = jnp.sum(jacp * ft2j, axis=1) * cmask2
        # impedance + R for the first row (fdim=1)
        imp = _impedance_lane(dist, incmargin, solimp)
        diaga0 = tran + float(fri[0]) ** 2 * tran
        r0 = jnp.maximum(_MINVAL, (1 - imp) * diaga0 / imp)
        r_py = 2.0 * mu * mu * r0
        d_py = act_f / r_py
        # 4 pyramidal rows: jn +/- mu*jt1, jn +/- mu*jt2
        jqvel_n = jnp.sum(jn * qvel, axis=0)
        jqv_t1 = jnp.sum(jt1 * qvel, axis=0)
        jqv_t2 = jnp.sum(jt2 * qvel, axis=0)
        aref_base = -k_ * imp * (dist - incmargin)
        combos = [(jt1, jqv_t1, 1.0, float(fri[0])),
                  (jt1, jqv_t1, -1.0, float(fri[0])),
                  (jt2, jqv_t2, 1.0, float(fri[1])),
                  (jt2, jqv_t2, -1.0, float(fri[1]))]
        for jt_, jqv_t, sign, muk in combos:
          J_rows.append(jn + sign * muk * jt_)
          jqv = jqvel_n + sign * muk * jqv_t
          aref_rows.append((-b_ * jqv + aref_base) * act_f)
          D_rows.append(d_py)
          R_rows.append(r_py)
        slot += 1

    J = jnp.stack(J_rows, axis=0)                # (nefc, nv, L)
    aref = jnp.stack(aref_rows, axis=0)
    D = jnp.stack(D_rows, axis=0)
    reg_coef = 1e-12 if dtype == jnp.float64 else 1e-6
    reg = reg_coef * max(mt.meaninertia, _MINVAL)
    use_warm = not off(DisableBit.WARMSTART)
    x, force, qfrc_c = _newton_core(
        J, aref, D, qM, a_s, warm, reg,
        mt.iterations, mt.ls_iterations, use_warm)
    qacc = x
  else:
    qacc = a_s
    qfrc_c = jnp.zeros((nv, L), dtype=dtype)

  # ---- Euler advance; with dof damping the velocity update is implicit:
  # (M + h*diag(damping))^-1 (qfrc_smooth + qfrc_constraint)
  # (mj_Euler, engine_forward.c:1401). d.qacc / the warmstart keep the
  # constraint-solver acceleration, as in forward._advance.
  use_damp = (mt.has_damping and not off(DisableBit.EULERDAMP)
              and not off(DisableBit.DAMPER))
  if use_damp:
    qMd = qM + h * consts["dampdiag"]
    qacc_adv = _ldl_solve_value(qMd, qfrc_smooth + qfrc_c)
  else:
    qacc_adv = qacc
  qvel_new = qvel + h * qacc_adv
  # linear qpos rows
  qrows = [qpos[k] for k in range(nq)]
  for v in range(nv):
    qi = int(mt.dof_to_q[v])
    if qi >= 0:
      qrows[qi] = qrows[qi] + h * qvel_new[v]
  # free-joint quaternion integration (exp map)
  for j in mt.free_joints:
    qa = int(mt.jnt_qposadr[j]) + 3
    da = int(mt.jnt_dofadr[j]) + 3
    q = _qnorm([qrows[qa + k] for k in range(4)])
    w = [qvel_new[da + k] for k in range(3)]
    wn = jnp.sqrt(jnp.maximum(w[0] ** 2 + w[1] ** 2 + w[2] ** 2,
                              _MINVAL * _MINVAL))
    angle = wn * h
    axis = [w[k] / wn for k in range(3)]
    half = 0.5 * angle
    s = jnp.sin(half)
    dq = [jnp.cos(half)] + [axis[k] * s for k in range(3)]
    qn = _qnorm(_qmul(q, dq))
    for k in range(4):
      qrows[qa + k] = qn[k]
  qpos_new = jnp.stack(qrows, axis=0)
  return qpos_new, qvel_new, qacc, qacc


def _check_reset_lane(mt: _Meta, consts, qpos, qvel, ctrl, warm, qacc, time):
  """Per-env divergence guard (rollout.check_reset semantics)."""
  bad_q = jnp.any((qpos != qpos) | (jnp.abs(qpos) > _MAXVAL), axis=0)
  bad_v = jnp.any((qvel != qvel) | (jnp.abs(qvel) > _MAXVAL), axis=0)
  bad = bad_q | bad_v

  def pick(fresh, cur):
    return jnp.where(bad[None, :], fresh, cur)

  qpos = pick(consts["fresh_qpos"], qpos)
  qvel = pick(consts["fresh_qvel"], qvel)
  if ctrl is not None and mt.nu:
    ctrl = pick(consts["fresh_ctrl"], ctrl)
  warm = jnp.where(bad[None, :], 0.0, warm)
  qacc = jnp.where(bad[None, :], 0.0, qacc)
  time = jnp.where(bad[None, :], 0.0, time)
  return qpos, qvel, ctrl, warm, qacc, time


# ---------------------------------------------------------------------------
# Pallas wrapper
# ---------------------------------------------------------------------------


def _scan_kernel(*refs, mt: _Meta, nstep: int, check: bool, dtype):
  (qpos_ref, qvel_ref, ctrl_ref, warm_ref, qacc_ref, time_ref,
   qfrc_ref, xfrc_ref) = refs[:8]
  const_refs = refs[8:8 + len(_CONST_NAMES)]
  (qpos_o, qvel_o, ctrl_o, warm_o, qacc_o,
   time_o) = refs[8 + len(_CONST_NAMES):]
  qfrc_applied = qfrc_ref[:]
  xfrc = xfrc_ref[:]
  consts = {n: r[:] for n, r in zip(_CONST_NAMES, const_refs)}

  def body(_, carry):
    qpos, qvel, ctrl, warm, qacc, time = carry
    qpos, qvel, warm, qacc = _lane_step(mt, consts, qpos, qvel, ctrl, warm,
                                        qfrc_applied, xfrc, dtype)
    time = time + mt.timestep
    if check:
      qpos, qvel, ctrl, warm, qacc, time = _check_reset_lane(
          mt, consts, qpos, qvel, ctrl, warm, qacc, time)
    return (qpos, qvel, ctrl, warm, qacc, time)

  carry = (qpos_ref[:], qvel_ref[:], ctrl_ref[:], warm_ref[:], qacc_ref[:],
           time_ref[:])
  carry = jax.lax.fori_loop(0, nstep, body, carry)
  qpos_o[:], qvel_o[:], ctrl_o[:], warm_o[:], qacc_o[:], time_o[:] = carry


def scan_lanes(m: Model, qpos, qvel, ctrl, warm, qacc, time, qfrc_applied,
               xfrc, nstep: int, check: bool = True,
               interpret: bool = False, fresh=None):
  """Run nstep steps with state in (k, B) lane layout. B % 128 == 0.

  fresh: optional (qpos, qvel, ctrl) 1-D arrays overriding the divergence
  guard's reset target (defaults to make_data state). Matches
  rollout.check_reset resetting to the caller's d_fresh.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  mt = _meta(m)
  dtype = qpos.dtype
  b = qpos.shape[-1]
  assert b % _LANES == 0, b
  grid = (b // _LANES,)

  def col(k):
    return pl.BlockSpec((k, _LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

  def whole(arr):
    shape = arr.shape
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)

  nq, nv, nu, nb = mt.nq, mt.nv, max(mt.nu, 1), mt.nbody
  consts = make_consts(mt, dtype)
  if fresh is not None:
    fq, fv, fc = fresh
    consts["fresh_qpos"] = jnp.asarray(fq, dtype).reshape(nq, 1)
    consts["fresh_qvel"] = jnp.asarray(fv, dtype).reshape(nv, 1)
    if fc is not None and mt.nu:
      consts["fresh_ctrl"] = jnp.asarray(fc, dtype).reshape(nu, 1)
  const_args = [consts[n] for n in _CONST_NAMES]
  kernel = functools.partial(_scan_kernel, mt=mt, nstep=nstep, check=check,
                             dtype=dtype)
  outs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[col(nq), col(nv), col(nu), col(nv), col(nv), col(1),
                col(nv), col(nb * 6)] + [whole(a) for a in const_args],
      out_specs=[col(nq), col(nv), col(nu), col(nv), col(nv), col(1)],
      out_shape=[jax.ShapeDtypeStruct((nq, b), dtype),
                 jax.ShapeDtypeStruct((nv, b), dtype),
                 jax.ShapeDtypeStruct((nu, b), dtype),
                 jax.ShapeDtypeStruct((nv, b), dtype),
                 jax.ShapeDtypeStruct((nv, b), dtype),
                 jax.ShapeDtypeStruct((1, b), dtype)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(qpos, qvel, ctrl, warm, qacc, time, qfrc_applied, xfrc, *const_args)
  return outs


def scan_batch(m: Model, d, nstep: int, d_fresh=None, check: bool = True,
               interpret: bool = False):
  """Batch-leading Data API: run the in-kernel scan, return updated Data.

  d: batched Data (leading env axis). Returns a Data built from d_fresh
  (or make_data) with the integration state replaced — mirroring
  rollout.scan_steps' contract.
  """
  from mujoco_tpu.models import io

  mt = _meta(m)
  dtype = d.qpos.dtype
  b = d.qpos.shape[0]
  pad = (-b) % _LANES

  def t_in(x, k):
    x2 = jnp.transpose(x, (1, 0)) if x.ndim == 2 else x[None, :]
    if pad:
      x2 = jnp.concatenate(
          [x2, jnp.zeros((x2.shape[0], pad), dtype=x2.dtype)], axis=1)
    return x2.astype(dtype)

  nu = max(mt.nu, 1)
  ctrl = d.ctrl if mt.nu else jnp.zeros((b, 1), dtype=dtype)
  xfrc = d.xfrc_applied.reshape(b, -1)
  args = [t_in(d.qpos, mt.nq), t_in(d.qvel, mt.nv), t_in(ctrl, nu),
          t_in(d.qacc_warmstart, mt.nv), t_in(d.qacc, mt.nv),
          t_in(d.time[:, None] if d.time.ndim == 1 else d.time, 1),
          t_in(d.qfrc_applied, mt.nv), t_in(xfrc, mt.nbody * 6)]
  # the in-kernel divergence guard resets to the CALLER's fresh state
  # (rollout.check_reset contract), not make_data defaults
  fresh = None
  if d_fresh is not None:
    if d_fresh.qpos.ndim != 1:
      raise ValueError("megastep scan_batch needs an unbatched d_fresh; "
                       "use the XLA scan path for per-env fresh states")
    fresh = (d_fresh.qpos, d_fresh.qvel, d_fresh.ctrl if mt.nu else None)
  qpos, qvel, ctrl_o, warm, qacc, time = scan_lanes(
      m, *args, nstep=nstep, check=check, interpret=interpret, fresh=fresh)

  def t_out(x):
    x2 = x[:, :b] if pad else x
    return jnp.transpose(x2, (1, 0))

  if d_fresh is None:
    d_fresh = io.make_data(m, dtype=dtype)
  out = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), d_fresh)
  upd = dict(qpos=t_out(qpos), qvel=t_out(qvel), qacc_warmstart=t_out(warm),
             qacc=t_out(qacc), time=t_out(time)[:, 0],
             qfrc_applied=d.qfrc_applied, xfrc_applied=d.xfrc_applied)
  if mt.nu:
    upd["ctrl"] = t_out(ctrl_o)
  return out.replace(**upd)
