"""Quaternion and spatial (6D) algebra.

Conventions follow the reference engine so intermediate quantities can be
diff-tested against it (/root/reference/src/engine/engine_util_spatial.c):

  * quaternions are (w, x, y, z), unit norm;
  * spatial motion/force vectors are 6D with the ANGULAR part first:
    v = (omega; v_lin), f = (torque; force);
  * spatial inertia is a 6x6 symmetric matrix in the same ordering.

Everything is shape-polymorphic over leading batch dims where noted and works
under vmap. No data-dependent control flow anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Universal small-denominator clamp, mirroring mjMINVAL
# (/root/reference/include/mujoco/mjtype.h).
MINVAL = 1e-15


def norm_safe(x, axis=-1, keepdims=False):
  """L2 norm, safe to differentiate at 0."""
  sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
  return jnp.sqrt(jnp.maximum(sq, MINVAL * MINVAL))


def normalize(x, axis=-1):
  return x / norm_safe(x, axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def cos_accurate(x):
  """cos via 1 − 2·sin²(x/2).

  Works around an XLA CPU backend defect (jax 0.9.0): f64 cos on scalars /
  size-1 arrays goes through a path with only f32 accuracy (~1.5e-8 error),
  while sin is exact at every shape. The identity keeps full f64 precision
  and costs one extra multiply.
  """
  s = jnp.sin(0.5 * x)
  return 1.0 - 2.0 * s * s


def mul_quat(q1, q2):
  """Hamilton product q1 ⊗ q2 (mju_mulQuat)."""
  w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
  w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def conj_quat(q):
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rot_vec_quat(v, q):
  """Rotate 3-vector v by quaternion q (mju_rotVecQuat)."""
  # v' = v + 2*r x (r x v + w*v) with q = (w, r)
  w = q[..., :1]
  r = q[..., 1:]
  cross1 = jnp.cross(r, v) + w * v
  return v + 2.0 * jnp.cross(r, cross1)


def quat_to_mat(q):
  """Quaternion to 3x3 rotation matrix (mju_quat2Mat)."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
          2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
          2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(m.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis, angle):
  """Unit axis + angle to quaternion (mju_axisAngle2Quat)."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate(
      [cos_accurate(half)[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q, omega, dt):
  """Integrate quaternion by local-frame angular velocity over dt.

  Mirrors mju_quatIntegrate (/root/reference/src/engine/engine_util_spatial.c):
  q' = q ⊗ exp(omega * dt / 2), exact exponential map.
  """
  angle = norm_safe(omega) * dt
  axis = normalize(omega)
  dq = axis_angle_to_quat(axis, angle)
  return normalize(mul_quat(q, dq))


def expmap_to_quat(v):
  """Exponential-map (axis-angle) 3-vector to quaternion (expmap2Quat,
  engine_forward.c:281): zero maps to the identity."""
  angle = norm_safe(v)
  axis = normalize(v)
  q = axis_angle_to_quat(axis, angle)
  ident = jnp.concatenate([jnp.ones_like(angle)[..., None],
                           jnp.zeros_like(v)], axis=-1)
  return jnp.where(angle[..., None] < MINVAL, ident, q)


def quat_to_vel(q):
  """Quaternion → 3D rotation-vector (log map), mirroring mju_quat2Vel with
  dt=1: axis · angle, angle wrapped to (−π, π]."""
  sin_half = norm_safe(q[..., 1:])
  angle = 2.0 * jnp.arctan2(sin_half, q[..., 0])
  angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
  return normalize(q[..., 1:]) * angle[..., None]


def quat_sub(qa, qb):
  """Velocity-space difference: 3D rotation taking qb to qa (mju_subQuat)."""
  qd = mul_quat(conj_quat(qb), qa)
  # log map: axis * 2*atan2(|r|, w)
  sin_half = norm_safe(qd[..., 1:])
  angle = 2.0 * jnp.arctan2(sin_half, qd[..., 0])
  # wrap to [-pi, pi] branch of the exp map
  angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
  return normalize(qd[..., 1:]) * angle[..., None]


# ---------------------------------------------------------------------------
# Spatial algebra (angular-first 6D vectors)
# ---------------------------------------------------------------------------


def motion_cross(v, m):
  """Spatial cross product of motion vectors: v x m (mju_crossMotion)."""
  w, u = v[..., :3], v[..., 3:]
  mw, mu = m[..., :3], m[..., 3:]
  return jnp.concatenate(
      [jnp.cross(w, mw), jnp.cross(w, mu) + jnp.cross(u, mw)], axis=-1)


def force_cross(v, f):
  """Spatial cross product applied to a force: v x* f (mju_crossForce)."""
  w, u = v[..., :3], v[..., 3:]
  n, g = f[..., :3], f[..., 3:]
  return jnp.concatenate(
      [jnp.cross(w, n) + jnp.cross(u, g), jnp.cross(w, g)], axis=-1)


def skew(v):
  """3-vector to skew-symmetric matrix so that skew(a) @ b = a x b."""
  z = jnp.zeros_like(v[..., 0])
  m = jnp.stack(
      [z, -v[..., 2], v[..., 1],
       v[..., 2], z, -v[..., 0],
       -v[..., 1], v[..., 0], z], axis=-1)
  return m.reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass, inertia_diag, imat, offset):
  """6x6 spatial inertia of a body in a frame displaced by ``offset``.

  ``inertia_diag`` is the principal-axis diagonal inertia, ``imat`` the
  rotation from the inertia principal frame to the target frame orientation,
  ``offset`` the vector from the target frame origin to the body COM.

  I = [[ I_com + m CxCx^T,  m Cx ],
       [ m Cx^T,            m 1  ]]     (angular-first ordering)

  This is the frame MuJoCo's cinert lives in (mju_inertCom,
  /root/reference/src/engine/engine_core_smooth.c).
  """
  icom = imat @ (inertia_diag[..., None] * jnp.swapaxes(imat, -1, -2))
  cx = skew(offset)
  m = mass[..., None, None]
  eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
  top_left = icom + m * (cx @ jnp.swapaxes(cx, -1, -2))
  top_right = m * cx
  bot_left = m * jnp.swapaxes(cx, -1, -2)
  bot_right = m * eye
  top = jnp.concatenate([top_left, top_right], axis=-1)
  bot = jnp.concatenate([bot_left, bot_right], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


def transform_motion(v, offset):
  """Translate a motion vector to a frame displaced by ``offset``.

  new_lin = lin + omega x (-offset)? We use: moving the reference point from
  p to p' = p + offset: v_lin' = v_lin - offset x omega ... defined so that
  cdof-style vectors about different origins are related by
  v' = (w, u + w x r) with r = old_origin - new_origin.
  """
  w, u = v[..., :3], v[..., 3:]
  return jnp.concatenate([w, u + jnp.cross(w, offset)], axis=-1)


def transform_spatial(vec, flg_force, newpos, oldpos, rotnew2old=None):
  """Transform a spatial motion/force vector to a new frame
  (mju_transformSpatial, engine_util_spatial.c). vec is (..., 6) in
  [angular; linear] order; rotnew2old rotates new-frame coords to old."""
  dif = newpos - oldpos
  ang, lin = vec[..., :3], vec[..., 3:]
  if flg_force:
    ang = ang - jnp.cross(dif, lin)
  else:
    lin = lin - jnp.cross(dif, ang)
  if rotnew2old is not None:
    rt = jnp.swapaxes(rotnew2old, -1, -2)
    ang = (rt @ ang[..., None])[..., 0]
    lin = (rt @ lin[..., None])[..., 0]
  return jnp.concatenate([ang, lin], axis=-1)


def box_qp(h, g, lower, upper, x0=None, maxiter=100):
  """Box-constrained QP: minimize ½xᵀHx + gᵀx s.t. lower ≤ x ≤ upper.

  Projected-Newton counterpart of mju_boxQP
  (engine_util_solve.c:1435, Tassa's algorithm): clamp set from the
  gradient sign at the bounds, Newton step on the free subspace (masked
  solve instead of the reference's index compaction — fixed shapes for
  jit), Armijo backtracking on the projected path. H must be SPD on the
  free subspace. Returns (x, converged: bool).
  """
  import jax
  import jax.numpy as jnp
  n = h.shape[0]
  dtype = h.dtype
  lower = jnp.broadcast_to(jnp.asarray(lower, dtype=dtype), (n,))
  upper = jnp.broadcast_to(jnp.asarray(upper, dtype=dtype), (n,))
  x = jnp.clip(jnp.zeros(n, dtype=dtype) if x0 is None
               else jnp.asarray(x0, dtype=dtype), lower, upper)
  eye = jnp.eye(n, dtype=dtype)

  def body(_, carry):
    x, done = carry
    grad = h @ x + g
    at_lo = (x <= lower) & (grad > 0)
    at_hi = (x >= upper) & (grad < 0)
    clamped = at_lo | at_hi
    free = ~clamped
    gnorm = jnp.sum(jnp.where(free, grad, 0.0) ** 2)
    # masked Newton step: clamped rows/cols become identity
    fm = free.astype(dtype)
    hmask = h * fm[:, None] * fm[None, :] + eye * (1.0 - fm)
    dx = -jnp.linalg.solve(hmask, jnp.where(free, grad, 0.0))
    dx = jnp.where(free, dx, 0.0)
    sdotg = jnp.dot(dx, grad)
    # Armijo backtracking over the projected path (fixed 25 halvings)
    def cost(y):
      return 0.5 * jnp.dot(y, h @ y) + jnp.dot(y, g)
    c0 = cost(x)
    alphas = 0.5 ** jnp.arange(25, dtype=dtype)
    cand = jax.vmap(
        lambda a: jnp.clip(x + a * dx, lower, upper))(alphas)
    costs = jax.vmap(cost)(cand)
    ok = costs <= c0 + 0.1 * alphas * sdotg
    first = jnp.argmax(ok)
    x_new = jnp.where(ok.any(), cand[first], x)
    conv = (gnorm < 1e-16) | ~ok.any()
    x_out = jnp.where(done, x, x_new)
    return x_out, done | conv

  x, done = jax.lax.fori_loop(0, maxiter, body, (x, jnp.zeros((), bool)))
  return x, done


# ---------------------------------------------------------------------------
# banded linear algebra (mju_cholFactorBand / mju_cholSolveBand /
# mju_bandMulMatVec, engine_util_solve.c:487-700). Band-dense layout: the
# first (ntotal-ndense)*nband entries hold each banded row's in-band slice
# (left of and including the diagonal); the last ndense rows are stored
# dense. Fixed shapes, jit/vmap-safe.
# ---------------------------------------------------------------------------


def band_to_dense(mat, ntotal, nband, ndense, symmetric=True):
  """Band-dense → full dense (mju_band2Dense). With symmetric=True the
  strict upper triangle is mirrored from the lower."""
  import jax.numpy as jnp
  nb = ntotal - ndense
  dtype = mat.dtype
  band = mat[:nb * nband].reshape(nb, nband)
  out = jnp.zeros((ntotal, ntotal), dtype=dtype)
  for j in range(nband):                     # static band offsets
    off = nband - 1 - j                      # column i-off
    rows = jnp.arange(nb)
    cols = rows - off
    valid = cols >= 0
    out = out.at[rows, jnp.maximum(cols, 0)].add(
        jnp.where(valid, band[:, j], 0.0))
  if ndense:
    dense = mat[nb * nband:].reshape(ndense, ntotal)
    out = out.at[nb:].set(dense)
  if symmetric:
    out = jnp.tril(out) + jnp.tril(out, -1).T
  return out


def dense_to_band(dense, ntotal, nband, ndense):
  """Full dense → band-dense layout (mju_dense2Band); entries outside the
  band are dropped."""
  import jax.numpy as jnp
  nb = ntotal - ndense
  parts = []
  for i in range(nb):                        # static row loop
    lo = max(0, i - nband + 1)
    row = jnp.zeros(nband, dtype=dense.dtype)
    width = i - lo + 1
    row = row.at[nband - width:].set(dense[i, lo:i + 1])
    parts.append(row)
  flat = jnp.concatenate(parts) if parts else jnp.zeros(0, dense.dtype)
  if ndense:
    flat = jnp.concatenate([flat, dense[nb:].reshape(-1)])
  return flat


def chol_factor_band(mat, ntotal, nband, ndense, diagadd=0.0, diagmul=0.0):
  """Banded Cholesky in the band-dense layout (mju_cholFactorBand). Adds
  diagadd + diagmul*mat_ii to the diagonal first. Returns the factored
  band-dense array (lower factor). Dense path: converts, factors,
  converts back — the band is small by construction so this stays
  O(ntotal·nband²) after XLA fuses the static loops."""
  import jax.numpy as jnp
  a = band_to_dense(mat, ntotal, nband, ndense, symmetric=True)
  d = jnp.diagonal(a)
  a = a + jnp.diag(diagadd + diagmul * d)
  l = jnp.linalg.cholesky(a)
  out = dense_to_band(l, ntotal, nband, ndense)
  if ndense:
    # the reference factorizes in place: above-diagonal entries of the
    # dense rows keep their input values
    nb = ntotal - ndense
    fd = out[nb * nband:].reshape(ndense, ntotal)
    md = mat[nb * nband:].reshape(ndense, ntotal)
    cols = jnp.arange(ntotal)[None, :]
    rows = nb + jnp.arange(ndense)[:, None]
    fd = jnp.where(cols > rows, md, fd)
    out = jnp.concatenate([out[:nb * nband], fd.reshape(-1)])
  return out


def chol_solve_band(factor, vec, ntotal, nband, ndense):
  """Solve L Lᵀ x = vec with a band-dense factor (mju_cholSolveBand)."""
  import jax
  import jax.numpy as jnp
  l = band_to_dense(factor, ntotal, nband, ndense, symmetric=False)
  y = jax.scipy.linalg.solve_triangular(l, vec, lower=True)
  return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


def band_mul_vec(mat, vec, ntotal, nband, ndense, flg_sym=True):
  """Band-dense matrix × vector (mju_bandMulMatVec, symmetric fill)."""
  a = band_to_dense(mat, ntotal, nband, ndense, symmetric=flg_sym)
  return a @ vec


def mat_to_rot_quat(mat, iters: int = 128):
  """Extract the rotational part of a (possibly non-orthogonal) 3x3
  deformation matrix as a quaternion (mju_mat2Rot,
  engine_util_spatial.c:286; Müller et al. 2016): fixed-point iteration
  from the identity, fixed `iters` with a freeze-on-convergence mask
  replacing the reference's rotEPS break."""
  import jax
  import jax.numpy as jnp
  dtype = mat.dtype
  cols_m = mat.T                                    # (3, 3) rows = columns

  def body(_, carry):
    quat, done = carry
    rot = quat_to_mat(quat)
    cols_r = rot.T
    omega = (jnp.cross(cols_r[0], cols_m[0])
             + jnp.cross(cols_r[1], cols_m[1])
             + jnp.cross(cols_r[2], cols_m[2]))
    denom = jnp.abs(jnp.sum(cols_r * cols_m)) + MINVAL
    omega = omega / denom
    w = norm_safe(omega)
    axis = omega / w
    stop = w < 1e-9
    qrot = axis_angle_to_quat(axis, w)
    quat_new = normalize(mul_quat(qrot, quat))
    quat_out = jnp.where(done | stop, quat, quat_new)
    return quat_out, done | stop

  q0 = jnp.array([1.0, 0, 0, 0], dtype=dtype)
  quat, _ = jax.lax.fori_loop(0, iters, body,
                              (q0, jnp.zeros((), dtype=bool)))
  return quat
