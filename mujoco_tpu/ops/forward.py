"""Forward dynamics pipeline and integrators.

Stage-for-stage counterpart of mj_step / mj_forward
(/root/reference/src/engine/engine_forward.c:1849,1843 and SURVEY.md §3.1),
as pure Data→Data transforms under jit:

  fwd_position:  FK → CoM frames → tendons → CRB → factor → collision →
                 constraint assembly → transmission
  fwd_velocity:  actuator/tendon velocities → com_vel → passive → RNE
  fwd_actuation: activation dynamics → gain/bias forces
  fwd_acceleration: qfrc_smooth → qacc_smooth
  fwd_constraint: solver → qacc
  integrators:   Euler (implicit joint damping), RK4, implicitfast
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_tpu.models.types import (Data, DisableBit, DynType, EnableBit,
                                     GainType, Integrator, JointType, Model)
from mujoco_tpu.ops import actuation, passive as passive_mod, smooth, support
from mujoco_tpu.utils import math as mjm


def fwd_position(m: Model, d: Data) -> Data:
  """Position-dependent computations (mj_fwdPosition, engine_forward.c:131)."""
  from mujoco_tpu.models.types import SolverType
  with jax.named_scope("kinematics"):
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.camlight(m, d)
  if m.has_flex:
    from mujoco_tpu.ops import flex as flex_mod
    with jax.named_scope("flex"):
      d = flex_mod.flex(m, d)
  with jax.named_scope("tendon"):
    d = smooth.tendon(m, d)
  with jax.named_scope("crb"):
    d = smooth.crb(m, d)
  # the tree factor is only consumed by the CG preconditioner and PGS's
  # multi-rhs M-solve; the Newton path solves M⁻¹f with the Pallas SPD
  # kernel directly, so skip the factorization there
  if int(m.opt.solver) == int(SolverType.CG):
    with jax.named_scope("factor_m"):
      d = smooth.factor_m(m, d)
  if m.con.ncon or m.efc.nefc:
    from mujoco_tpu.ops import collision_driver, constraint
    with jax.named_scope("collision"):
      d = collision_driver.collision(m, d)
    if _sleep_on(m):
      # wake pass (user perturbation / collision / equality / tendon;
      # engine_forward.c:125,150-156) before constraints see sleep state
      from mujoco_tpu.ops import sleep as sleep_mod
      d = sleep_mod.wake(m, d)
    with jax.named_scope("make_constraint"):
      d = constraint.make_constraint(m, d)
    if _sleep_on(m):
      from mujoco_tpu.ops import sleep as sleep_mod
      d = sleep_mod.mask_sleeping_rows(m, d)
  elif _sleep_on(m):
    from mujoco_tpu.ops import sleep as sleep_mod
    d = sleep_mod.wake(m, d)
  with jax.named_scope("transmission"):
    d = smooth.transmission(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  """Velocity-dependent computations (mj_fwdVelocity, engine_forward.c:181)."""
  d = d.replace(
      actuator_velocity=d.actuator_moment @ d.qvel,
      ten_velocity=d.ten_J @ d.qvel if m.ntendon else d.ten_velocity,
      flexedge_velocity=(d.flexedge_J @ d.qvel if m.has_flex
                         else d.flexedge_velocity),
  )
  d = smooth.com_vel(m, d)
  d = passive_mod.passive(m, d)
  qfrc_bias = smooth.rne(m, d)
  if m.has_tendon_armature:
    qfrc_bias = qfrc_bias + _tendon_bias(m, d)
  d = d.replace(qfrc_bias=qfrc_bias)
  if m.efc.nefc:
    from mujoco_tpu.ops import constraint
    d = constraint.reference_acceleration(m, d)
  return d


def _tendon_bias(m: Model, d: Data):
  """Tendon-armature bias (mj_tendonBias, engine_core_smooth.c:2606):
  qfrc += ten_J · armature · (d/dt ten_J)·qvel. The tendon-Jacobian time
  derivative contracted with qvel is a JVP of q ↦ J(q)·qvel along the
  manifold-aware position flow (mj_tendonDot analog by autodiff)."""
  from mujoco_tpu.ops import smooth as smooth_mod

  def jqv_of(eps):
    qpos = integrate_pos(m, d.qpos, d.qvel, eps)
    dd = smooth_mod.kinematics(m, d.replace(qpos=qpos))
    dd = smooth_mod.com_pos(m, dd)
    dd = smooth_mod.tendon(m, dd)
    return dd.ten_J @ d.qvel                    # (ntendon,)

  zero = jnp.zeros((), dtype=d.qpos.dtype)
  _, jdot_qvel = jax.jvp(jqv_of, (zero,), (jnp.ones((), dtype=d.qpos.dtype),))
  coef = m.tendon_armature * jdot_qvel          # (ntendon,)
  return d.ten_J.T @ coef


def fwd_actuation(m: Model, d: Data) -> Data:
  return actuation.fwd_actuation(m, d)


def fwd_acceleration(m: Model, d: Data) -> Data:
  """Smooth (unconstrained) acceleration (mj_fwdAcceleration,
  engine_forward.c:1010)."""
  from mujoco_tpu.models.types import SolverType
  qfrc = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator + d.qfrc_applied
          + support.xfrc_accumulate(m, d))
  if int(m.opt.solver) == int(SolverType.CG):
    qacc_smooth = smooth.solve_m(m, d, qfrc)     # tree factor already built
  else:
    from mujoco_tpu.ops import linalg_tpu
    qacc_smooth = linalg_tpu.spd_solve(d.qM, qfrc)
  return d.replace(qfrc_smooth=qfrc, qacc_smooth=qacc_smooth)


def _sleep_on(m: Model) -> bool:
  from mujoco_tpu.ops import sleep as sleep_mod
  return sleep_mod.sleep_active(m)


def fwd_constraint(m: Model, d: Data) -> Data:
  """Constraint solve → qacc (mj_fwdConstraint, engine_forward.c:1151)."""
  if not m.efc.nefc or m.disabled(DisableBit.CONSTRAINT):
    d = d.replace(qacc=d.qacc_smooth,
                  qfrc_constraint=jnp.zeros_like(d.qfrc_constraint),
                  efc_force=jnp.zeros_like(d.efc_force))
  else:
    from mujoco_tpu.ops import solver
    d = solver.solve(m, d)
  if _sleep_on(m):
    # sleeping dofs keep qacc == 0 (the reference updates awake dofs only,
    # mj_fwdAcceleration sleep_filter, engine_forward.c:1011)
    from mujoco_tpu.ops import sleep as sleep_mod
    mask = sleep_mod.dof_awake_mask(m, d)
    d = d.replace(qacc=d.qacc * mask)
  return d


def forward(m: Model, d: Data) -> Data:
  """Full forward dynamics (mj_forward, engine_forward.c:1843).

  Every stage runs under a jax.named_scope so profiler traces carry the
  reference's timer taxonomy (mjtTimer stage names, mjtype.h:563-588; MJX
  precedent mjx/_src/forward.py:59-66)."""
  energy_enabled = bool(m.opt.enableflags & EnableBit.ENERGY)
  with jax.named_scope("fwd_position"):
    d = fwd_position(m, d)
  if energy_enabled:
    from mujoco_tpu.ops import sensor
    d = sensor.energy_pos(m, d)
  with jax.named_scope("sensor_pos"):
    d = sensor_pos(m, d)
  with jax.named_scope("fwd_velocity"):
    d = fwd_velocity(m, d)
  if energy_enabled:
    from mujoco_tpu.ops import sensor
    d = sensor.energy_vel(m, d)
  with jax.named_scope("sensor_vel"):
    d = sensor_vel(m, d)
  with jax.named_scope("fwd_actuation"):
    d = fwd_actuation(m, d)
  with jax.named_scope("fwd_acceleration"):
    d = fwd_acceleration(m, d)
  with jax.named_scope("fwd_constraint"):
    d = fwd_constraint(m, d)
  with jax.named_scope("sensor_acc"):
    d = sensor_acc(m, d)
  return d


def sensor_pos(m: Model, d: Data) -> Data:
  if m.nsensor:
    from mujoco_tpu.ops import sensor
    return sensor.sensor_pos(m, d)
  return d


def sensor_vel(m: Model, d: Data) -> Data:
  if m.nsensor:
    from mujoco_tpu.ops import sensor
    return sensor.sensor_vel(m, d)
  return d


def sensor_acc(m: Model, d: Data) -> Data:
  if m.nsensor:
    from mujoco_tpu.ops import sensor
    return sensor.sensor_acc(m, d)
  return d


# ---------------------------------------------------------------------------
# Integration
# ---------------------------------------------------------------------------


def integrate_pos(m: Model, qpos, qvel, dt):
  """Manifold-aware position integration (mj_integratePos): quaternions via
  the exponential map, everything else linear. Scatter-free: static
  gather maps route velocities to qpos entries and batched quaternion
  integration covers all ball/free joints in one call."""
  dtype = qpos.dtype
  # linear part: qpos_i += dt · qvel[dof_of(i)] via a padded static gather
  dof_to_q = _dof_to_qpos_map(m)
  dof_of_q = np.full(m.nq, m.nv, dtype=np.int64)
  for v, qi in enumerate(dof_to_q):
    if qi >= 0:
      dof_of_q[qi] = v
  qvel_pad = jnp.concatenate([qvel, jnp.zeros((1,), dtype=dtype)])
  out = qpos + dt * qvel_pad[dof_of_q]

  # quaternion spans: grouped batched exponential-map integration
  qadrs, dadrs = [], []
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    if jt == JointType.BALL:
      qadrs.append(int(m.jnt_qposadr[j]))
      dadrs.append(int(m.jnt_dofadr[j]))
    elif jt == JointType.FREE:
      qadrs.append(int(m.jnt_qposadr[j]) + 3)
      dadrs.append(int(m.jnt_dofadr[j]) + 3)
  if qadrs:
    qadrs = np.array(qadrs)[:, None]
    dadrs = np.array(dadrs)[:, None]
    q = mjm.normalize(qpos[qadrs + np.arange(4)])
    w = qvel[dadrs + np.arange(3)]
    quats = mjm.quat_integrate(q, w, dt)                 # (njq, 4)
    flat = jnp.concatenate([quats.reshape(-1),
                            jnp.zeros((1,), dtype=dtype)])
    qmask = np.zeros(m.nq, dtype=bool)
    qmap = np.full(m.nq, len(qadrs) * 4, dtype=np.int64)
    for r, qa in enumerate(qadrs[:, 0]):
      qmask[qa:qa + 4] = True
      qmap[qa:qa + 4] = 4 * r + np.arange(4)
    out = jnp.where(jnp.asarray(qmask), flat[qmap], out)
  return out


def _dof_to_qpos_map(m: Model) -> np.ndarray:
  """dof index → qpos index for linear (non-quaternion) dofs, -1 otherwise."""
  mp = np.full(m.nv, -1, dtype=np.int64)
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr = int(m.jnt_qposadr[j])
    dadr = int(m.jnt_dofadr[j])
    if jt in (JointType.HINGE, JointType.SLIDE):
      mp[dadr] = qadr
    elif jt == JointType.FREE:
      mp[dadr:dadr + 3] = np.arange(qadr, qadr + 3)
  return mp


def next_activation(m: Model, d: Data, act_dot):
  """Advance activations one step (mj_nextActivation, engine_support.c:706):
  Euler except FILTEREXACT (exact exponential), DC-motor current (exact
  exponential) and bristle (exact ZOH); integral slots clamp to ±Imax; then
  actrange clamp (skipped for DC motors)."""
  if m.na == 0:
    return d.act
  h = m.opt.timestep
  act = d.act + h * act_dot
  for i in range(m.nu):
    adr, num = int(m.actuator_actadr[i]), int(m.actuator_actnum[i])
    if num == 0:
      continue
    last = adr + num - 1
    dyn = int(m.actuator_dyntype[i])
    if dyn == DynType.FILTEREXACT:
      tau = jnp.maximum(m.actuator_dynprm[i, 0], mjm.MINVAL)
      a = d.act[last] + act_dot[last] * tau * (1.0 - jnp.exp(-h / tau))
      act = act.at[last].set(a)
    elif dyn == DynType.DCMOTOR:
      slots = m.actuator_slots[i]
      dynprm = m.actuator_dynprm[i]
      cur_s, brist_s, integ_s = int(slots[4]), int(slots[3]), int(slots[1])
      if cur_s >= 0:
        # current filter: exact integration (engine_support.c:726)
        te = jnp.maximum(dynprm[0], mjm.MINVAL)
        a = d.act[adr + cur_s] + act_dot[adr + cur_s] * te * (
            1.0 - jnp.exp(-h / te))
        act = act.at[adr + cur_s].set(a)
      if brist_s >= 0:
        # LuGre bristle: exact ZOH (engine_support.c:732)
        from mujoco_tpu.ops import actuation as act_mod
        biasprm = m.actuator_biasprm[i]
        vel = d.actuator_velocity[int(m.actuator_outadr[i])]
        g = act_mod._lugre_stribeck(vel, biasprm[3], biasprm[4], biasprm[5])
        a_rate = -dynprm[5] * jnp.abs(vel) / jnp.maximum(mjm.MINVAL, g)
        exp_ah = jnp.exp(a_rate * h)
        int_h = jnp.where(jnp.abs(a_rate) > mjm.MINVAL,
                          (exp_ah - 1.0) / a_rate, h)
        act = act.at[adr + brist_s].set(
            exp_ah * d.act[adr + brist_s] + int_h * vel)
      if integ_s >= 0:
        # integral: Euler + anti-windup clamp (engine_support.c:750)
        imax = dynprm[8]
        a = act[adr + integ_s]
        act = act.at[adr + integ_s].set(
            jnp.where(imax > 0, jnp.clip(a, -imax, imax), a))
      continue  # no actrange clamp for DC motors (engine_support.c:770)
    if m.actuator_actlimited[i]:
      act = act.at[last].set(
          jnp.clip(act[last], m.actuator_actrange[i, 0],
                   m.actuator_actrange[i, 1]))
  return act


def _advance(m: Model, d: Data, act_dot, qacc, qvel_pos=None) -> Data:
  """State advance shared by all integrators (mj_advance,
  engine_forward.c:1264)."""
  if m.nhistory:
    d = _advance_history(m, d)
  act = next_activation(m, d, act_dot)
  if _sleep_on(m):
    # countdown + island sleep before integration (mj_advance,
    # engine_forward.c:1355): newly slept trees get qvel/qacc zeroed and do
    # not receive this step's velocity update
    from mujoco_tpu.ops import sleep as sleep_mod
    d, qacc = sleep_mod.sleep_step(m, d, qacc)
  # rotational INTEGRATOR servo setpoints: re-anchor to the representative
  # nearest the transmission length (engine_forward.c:1330-1353)
  for i in range(m.nu):
    if int(m.actuator_dyntype[i]) != DynType.INTEGRATOR:
      continue
    period = float(m.actuator_wrapprd[i])
    if period > 0:
      adr = int(m.actuator_actadr[i]) + int(m.actuator_actnum[i]) - 1
      from mujoco_tpu.ops import actuation as act_mod
      act = act.at[adr].set(
          act_mod._wrap_setpoint(
              act[adr], d.actuator_length[int(m.actuator_outadr[i])],
              period))
    elif int(m.actuator_gaintype[i]) == int(GainType.SO3):
      # SO3 integrator: re-anchor the expmap setpoint to the canonical
      # (|u| <= pi) representative (engine_forward.c:1342-1352)
      adr = int(m.actuator_actadr[i])
      u = act[adr:adr + 3]
      angle = mjm.norm_safe(u)
      scale = jnp.where(
          angle > jnp.pi,
          (angle - 2 * jnp.pi * jnp.round(angle / (2 * jnp.pi))) / angle,
          1.0)
      act = act.at[adr:adr + 3].set(u * scale)
  qvel = d.qvel + m.opt.timestep * qacc
  qpos = integrate_pos(m, d.qpos, qvel_pos if qvel_pos is not None else qvel,
                       m.opt.timestep)
  return d.replace(act=act, qvel=qvel, qpos=qpos,
                   time=d.time + m.opt.timestep,
                   qacc_warmstart=d.qacc)


def _advance_history(m: Model, d: Data) -> Data:
  """Insert ctrl and sensor samples into the history ring buffers
  (mj_advance history block, engine_forward.c:1271-1315). Runs at the
  pre-increment time; delayed sensors are recomputed from the current state
  because d.sensordata holds their delayed reads."""
  from mujoco_tpu.ops import history as hist
  from mujoco_tpu.ops import sensor as sensor_mod
  buf = d.history
  t = d.time

  for i in range(m.nu):
    n = int(m.actuator_history[i, 0])
    if n > 0:
      adr = int(m.actuator_historyadr[i])
      buf = hist.insert(buf, adr, n, 1, t,
                        d.ctrl[int(m.actuator_ctrladr[i])][None])

  need_raw = any(
      int(m.sensor_history[i, 0]) > 0 and float(m.sensor_delay[i]) > 0
      for i in range(m.nsensor))
  if need_raw:
    d2 = sensor_mod.sensor_pos(m, d, history_adjust=False)
    d2 = sensor_mod.sensor_vel(m, d2, history_adjust=False)
    d2 = sensor_mod.sensor_acc(m, d2, history_adjust=False)
    raw = d2.sensordata
  else:
    raw = d.sensordata

  for i in range(m.nsensor):
    n = int(m.sensor_history[i, 0])
    if n <= 0:
      continue
    adr = int(m.sensor_historyadr[i])
    adr_sd = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])
    delay = float(m.sensor_delay[i])
    period = float(m.sensor_interval[i, 0])
    val = (raw if delay > 0 else d.sensordata)[adr_sd:adr_sd + dim]
    if period > 0:
      # interval mode: insert only when the tick fires; the user slot
      # advances by the exact (continuous) period
      time_prev = buf[adr]
      fire = time_prev + period <= t
      nbuf = hist.insert(buf, adr, n, dim, t, val)
      nbuf = nbuf.at[adr].set(time_prev + period)
      buf = jnp.where(fire, nbuf, buf)
    else:
      buf = hist.insert(buf, adr, n, dim, t, val)
  return d.replace(history=buf)


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (mj_Euler,
  engine_forward.c:1401): with damping, integrate velocities with
  (M + h·diag(damping))⁻¹ (qfrc_smooth + qfrc_constraint)."""
  use_damp = (m.has_dof_damping
              and not m.disabled(DisableBit.EULERDAMP)
              and not m.disabled(DisableBit.DAMPER))
  if use_damp:
    qm = d.qM + m.opt.timestep * jnp.diag(m.dof_damping)
    lmat, dinv = smooth.factor_tree(m, qm)  # same tree sparsity as qM
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    qacc = smooth.solve_tree(m, lmat, dinv, qfrc)
  else:
    qacc = d.qacc
  return _advance(m, d, d.act_dot, qacc)


_RK4_A = np.array([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1.0]])
_RK4_B = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])


def rungekutta4(m: Model, d: Data) -> Data:
  """RK4 over (qpos, qvel, act) (mj_RungeKutta, engine_forward.c:1502).
  Stage derivatives are (qvel_stage, qacc_stage, act_dot_stage)."""
  d0 = d
  h = m.opt.timestep
  qpos0, qvel0, act0, time0 = d.qpos, d.qvel, d.act, d.time

  qvels = [d.qvel]
  qaccs = [d.qacc]
  adots = [d.act_dot]
  for i in range(3):
    a = _RK4_A[i]
    dqvel = sum(a[j] * qvels[j] for j in range(i + 1))
    dqacc = sum(a[j] * qaccs[j] for j in range(i + 1))
    dadot = sum(a[j] * adots[j] for j in range(i + 1))
    qpos_i = integrate_pos(m, qpos0, dqvel, h)
    qvel_i = qvel0 + h * dqacc
    act_i = act0 + h * dadot
    di = d0.replace(qpos=qpos_i, qvel=qvel_i, act=act_i,
                    time=time0 + h * float(np.sum(a)))
    di = forward(m, di)
    qvels.append(di.qvel)
    qaccs.append(di.qacc)
    adots.append(di.act_dot)

  dqvel = sum(_RK4_B[j] * qvels[j] for j in range(4))
  dqacc = sum(_RK4_B[j] * qaccs[j] for j in range(4))
  dadot = sum(_RK4_B[j] * adots[j] for j in range(4))
  qpos = integrate_pos(m, qpos0, dqvel, h)
  qvel = qvel0 + h * dqacc
  act = act0 + h * dadot if m.na else act0
  return d0.replace(qpos=qpos, qvel=qvel, act=act, time=time0 + h,
                    qacc_warmstart=d0.qacc)


def implicit(m: Model, d: Data) -> Data:
  """Implicit-in-velocity integrators (mj_implicitSkip,
  engine_forward.c:1652): solve (M − h·qDeriv) qacc = qfrc_smooth +
  qfrc_constraint, with qDeriv = ∂(actuator+passive[−bias])/∂qvel.

  IMPLICIT keeps the RNE bias derivative (unsymmetric → LU); IMPLICITFAST
  drops it from the global symmetric solve and restores it per standalone
  free body via a local 6×6 solve (mjd_freeMhat). qDeriv is masked to the
  tree-coupling sparsity, matching the reference's sparse D-pattern scatter.
  """
  from mujoco_tpu.ops import derivative
  dtype = d.qpos.dtype
  h = m.opt.timestep
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  sym = np.asarray(m.tree.dof_ancestor_mask)
  sym = jnp.asarray(sym | sym.T)

  if int(m.opt.integrator) == Integrator.IMPLICIT:
    qderiv = derivative.smooth_vel(m, d, flg_bias=True)
    qlu = d.qM - h * jnp.where(sym, qderiv, 0.0)
    qacc = jnp.linalg.solve(qlu, qfrc)
  else:  # IMPLICITFAST
    qderiv0 = jnp.where(sym, derivative.smooth_vel(m, d, flg_bias=False), 0.0)
    free_jnts = derivative.free_body_joints(m)
    # standalone free bodies: reset their rows to M in the global symmetric
    # factorization (their block is decoupled; handled locally below)
    qderiv = qderiv0
    for j in free_jnts:
      adr = int(m.jnt_dofadr[j])
      qderiv = qderiv.at[adr:adr + 6, :].set(0.0)
      qderiv = qderiv.at[:, adr:adr + 6].set(0.0)
    # qh has qM's tree sparsity (qDeriv was masked to it) → tree factor
    qh = d.qM - h * qderiv
    lmat, dinv = smooth.factor_tree(m, qh)
    qacc = smooth.solve_tree(m, lmat, dinv, qfrc)
    for j in free_jnts:
      adr = int(m.jnt_dofadr[j])
      a = derivative.free_mhat(m, d, j, qderiv0)
      qacc = qacc.at[adr:adr + 6].set(
          jnp.linalg.solve(a, qfrc[adr:adr + 6]))
  return _advance(m, d, d.act_dot, qacc)


def step(m: Model, d: Data) -> Data:
  """One physics step (mj_step, engine_forward.c:1849)."""
  d = forward(m, d)
  integ = int(m.opt.integrator)
  if integ == Integrator.EULER:
    return euler(m, d)
  if integ == Integrator.RK4:
    return rungekutta4(m, d)
  if integ in (Integrator.IMPLICIT, Integrator.IMPLICITFAST):
    return implicit(m, d)
  raise NotImplementedError(f"integrator {integ}")
