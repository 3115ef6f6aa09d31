"""Differential tests: smooth dynamics vs the C oracle at f64.

Mirrors the reference's test strategy (SURVEY.md §4): same model through
both engines, per-stage allclose on FK, CoM frames, mass matrix, bias force.
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from mujoco_tpu.models import io
from mujoco_tpu.ops import smooth

from tests import models as zoo

MODELS = {
    "pendulum": zoo.PENDULUM,
    "cartpole": zoo.CARTPOLE,
    "chain3d": zoo.CHAIN_3D,
    "balls": zoo.BALLS,
}


def _randomize(mjm, seed):
  """Random but valid state on the oracle; returns (mjd, qpos, qvel)."""
  rng = np.random.RandomState(seed)
  mjd = mujoco.MjData(mjm)
  qpos = mjm.qpos0 + 0.3 * rng.randn(mjm.nq)
  # re-normalize quaternions
  for j in range(mjm.njnt):
    adr = mjm.jnt_qposadr[j]
    if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
      qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
    elif mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      qpos[adr + 3:adr + 7] /= np.linalg.norm(qpos[adr + 3:adr + 7])
  qvel = 0.5 * rng.randn(mjm.nv)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)
  return mjd, qpos, qvel


def _dense_m(mjm, mjd):
  out = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, out)
  return out


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_smooth_stages(name, seed):
  mjm = zoo.load(MODELS[name])
  mjd, qpos, qvel = _randomize(mjm, seed)

  m = io.put_model(mjm)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))

  d = smooth.kinematics(m, d)
  np.testing.assert_allclose(d.xpos, mjd.xpos, atol=1e-12, err_msg="xpos")
  # quaternions match up to sign
  qd = np.abs(np.sum(np.asarray(d.xquat) * mjd.xquat, axis=-1))
  np.testing.assert_allclose(qd, 1.0, atol=1e-12, err_msg="xquat")
  np.testing.assert_allclose(d.xipos, mjd.xipos, atol=1e-12, err_msg="xipos")
  np.testing.assert_allclose(
      np.asarray(d.ximat), mjd.ximat.reshape(-1, 3, 3), atol=1e-12)
  np.testing.assert_allclose(d.xanchor, mjd.xanchor, atol=1e-12)
  np.testing.assert_allclose(d.xaxis, mjd.xaxis, atol=1e-12)
  np.testing.assert_allclose(d.geom_xpos, mjd.geom_xpos, atol=1e-12)

  d = smooth.com_pos(m, d)
  np.testing.assert_allclose(d.subtree_com, mjd.subtree_com, atol=1e-12)
  np.testing.assert_allclose(d.cdof, mjd.cdof, atol=1e-12, err_msg="cdof")

  d = smooth.crb(m, d)
  np.testing.assert_allclose(np.asarray(d.qM), _dense_m(mjm, mjd),
                             atol=1e-10, err_msg="qM")

  d = smooth.com_vel(m, d)
  np.testing.assert_allclose(d.cvel, mjd.cvel, atol=1e-12, err_msg="cvel")
  np.testing.assert_allclose(d.cdof_dot, mjd.cdof_dot, atol=1e-12,
                             err_msg="cdof_dot")

  bias = smooth.rne(m, d)
  np.testing.assert_allclose(np.asarray(bias), mjd.qfrc_bias, atol=1e-10,
                             err_msg="qfrc_bias")

  # M-solve roundtrip
  d = smooth.factor_m(m, d)
  rng = np.random.RandomState(seed + 100)
  y = rng.randn(mjm.nv)
  x = smooth.solve_m(m, d, jnp.asarray(y))
  np.testing.assert_allclose(np.asarray(d.qM) @ np.asarray(x), y, atol=1e-9)


def test_box_qp_vs_oracle():
  """box_qp vs mju_boxQP (engine_util_solve.c:1435) on random SPD problems:
  the minimizer over the box is unique, so both must agree."""
  from mujoco_tpu.utils.math import box_qp
  rng = np.random.RandomState(0)
  for n in (3, 6, 10):
    for trial in range(4):
      a = rng.randn(n, n)
      h = a @ a.T + n * np.eye(n)
      g = 2.0 * rng.randn(n)
      lo = -np.abs(rng.randn(n)) * 0.5
      hi = np.abs(rng.randn(n)) * 0.5
      res = np.zeros(n)
      r = np.zeros((n, n + 7))
      index = np.zeros(n, dtype=np.int32)
      status = mujoco.mju_boxQP(res, r, index, h, g, lo, hi)
      assert status >= 1
      x, conv = box_qp(jnp.asarray(h), jnp.asarray(g), lo, hi)
      np.testing.assert_allclose(np.asarray(x), res, atol=1e-8,
                                 err_msg=f"n={n} trial={trial}")
  # unbounded: pure Newton point
  n = 5
  a = rng.randn(n, n)
  h = a @ a.T + n * np.eye(n)
  g = rng.randn(n)
  x, _ = box_qp(jnp.asarray(h), jnp.asarray(g),
                np.full(n, -1e10), np.full(n, 1e10))
  np.testing.assert_allclose(np.asarray(x), np.linalg.solve(h, -g),
                             atol=1e-8)


def test_banded_cholesky_vs_oracle():
  """Band-dense Cholesky/solve/mul vs mju_cholFactorBand /
  mju_cholSolveBand / mju_bandMulMatVec (engine_util_solve.c:487-700)."""
  from mujoco_tpu.utils.math import (band_mul_vec, band_to_dense,
                                     chol_factor_band, chol_solve_band)
  rng = np.random.RandomState(1)
  for ntotal, nband, ndense in ((8, 3, 0), (10, 4, 2), (6, 1, 1)):
    nb = ntotal - ndense
    # random SPD band-dense matrix: build dense SPD, crop to band layout
    a = rng.randn(ntotal, ntotal)
    spd = a @ a.T + ntotal * np.eye(ntotal)
    mat = np.zeros(nb * nband + ndense * ntotal)
    for i in range(nb):
      lo = max(0, i - nband + 1)
      w = i - lo + 1
      mat[i * nband + nband - w:(i + 1) * nband] = spd[i, lo:i + 1]
    if ndense:
      mat[nb * nband:] = spd[nb:].reshape(-1)
    vec = rng.randn(ntotal)

    # oracle
    omat = mat.copy()
    mujoco.mju_cholFactorBand(omat, ntotal, nband, ndense, 0.0, 0.0)
    ox = vec.copy()
    mujoco.mju_cholSolveBand(ox, omat, vec, ntotal, nband, ndense)
    omul = np.zeros(ntotal)
    mujoco.mju_bandMulMatVec(omul, mat, vec.reshape(ntotal, 1),
                             ntotal, nband, ndense, 1, 1)

    f = chol_factor_band(jnp.asarray(mat), ntotal, nband, ndense)
    np.testing.assert_allclose(np.asarray(f), omat, atol=1e-10)
    x = chol_solve_band(f, jnp.asarray(vec), ntotal, nband, ndense)
    np.testing.assert_allclose(np.asarray(x), ox, atol=1e-10)
    mul = band_mul_vec(jnp.asarray(mat), jnp.asarray(vec),
                       ntotal, nband, ndense)
    np.testing.assert_allclose(np.asarray(mul), omul, atol=1e-12)
    # band_to_dense round-trips against the reference layout
    dense = band_to_dense(jnp.asarray(mat), ntotal, nband, ndense)
    ref = np.zeros((ntotal, ntotal))
    mujoco.mju_band2Dense(ref, mat, ntotal, nband, ndense, 1)
    np.testing.assert_allclose(np.asarray(dense), ref, atol=0)
