#!/usr/bin/env python
"""Microbench the Newton solver's internal pieces, scan-amortized on chip.

Each piece runs under jit(scan(vmap(piece))) with a data-dependent carry so
XLA can't CSE/DCE across iterations; throughput differences give the cost
split inside the 59%-of-step constraint solve (tools/profile_ablate.py).
"""

import os
import time

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io, zoo
from mujoco_tpu.ops import forward
from mujoco_tpu.parallel import rollout as par


def timed(name, fn, carry0, nstep=200, reps=3):
  @jax.jit
  def run(c):
    def body(c, _):
      return fn(c), None
    c, _ = jax.lax.scan(body, c, None, length=nstep)
    return c

  c = run(carry0)
  jax.block_until_ready(jax.tree.leaves(c)[0])
  best = 1e9
  for _ in range(reps):
    t0 = time.perf_counter()
    c = run(carry0)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    best = min(best, time.perf_counter() - t0)
  per_step_ms = best / nstep * 1e3
  print(f"{name:<26s} {per_step_ms:8.3f} ms/batched-step", flush=True)
  return per_step_ms


def main():
  nbatch = int(os.environ.get("BENCH_BATCH", "3072"))
  m = zoo.humanoid(dtype=jnp.float32)
  d0 = par.make_batch(m, nbatch, dtype=jnp.float32)
  key = jax.random.PRNGKey(0)
  d0 = d0.replace(qpos=d0.qpos + 0.01 * jax.random.normal(
      key, d0.qpos.shape, dtype=d0.qpos.dtype))
  # run the pre-solver stages once to get representative J/M/aref
  pre = jax.jit(jax.vmap(
      lambda dd: forward.fwd_acceleration(m, forward.fwd_actuation(
          m, forward.fwd_velocity(m, forward.fwd_position(m, dd)))),
      in_axes=0), in_axes=0) if False else jax.jit(jax.vmap(
          lambda dd: forward.fwd_acceleration(m, forward.fwd_actuation(
              m, forward.fwd_velocity(m, forward.fwd_position(m, dd))))))
  d = pre(d0)
  jax.block_until_ready(d.qpos)

  from mujoco_tpu.ops import linalg_tpu, solver

  nv, nefc = m.nv, m.efc.nefc
  J = d.efc_J                      # (B, nefc, nv)
  M = d.qM                         # (B, nv, nv)
  aref = d.efc_aref
  a_s = d.qacc_smooth

  def w_of(dd, x):
    jar = (dd.efc_J @ x[..., None])[..., 0] - dd.efc_aref
    return jar

  eps = 1e-6

  # 1. whole constraint stage
  def full(c):
    dd = jax.vmap(lambda di, cx: forward.fwd_constraint(
        m, di.replace(qacc_smooth=di.qacc_smooth + eps * cx)))(d, c)
    return dd.qacc
  timed("fwd_constraint (full)", full, a_s * 0)

  # 2. one J @ x pass
  def jpass(c):
    x = a_s + eps * c
    return (J @ x[..., None])[..., 0][..., :nv] @ jnp.eye(nv, dtype=x.dtype)
  def jpass2(c):
    x = a_s + eps * c
    jar = (J @ x[..., None])[..., 0]
    return (jnp.swapaxes(J, -1, -2) @ jar[..., None])[..., 0]
  timed("J@x + Jt@y roundtrip", jpass2, a_s * 0)

  # 3. row update machinery (vmapped _update)
  def upd(c):
    x = a_s + eps * c
    jar = (J @ x[..., None])[..., 0]
    ctx = jax.vmap(lambda dd, jr: solver._update(m, dd, jr))(d, jar)
    return (jnp.swapaxes(J, -1, -2) @ ctx.force[..., None])[..., 0]
  timed("jar+update+Jt force", upd, a_s * 0)

  # 4. Hessian assembly
  def hasm(c):
    x = a_s + eps * c
    jar = (J @ x[..., None])[..., 0]
    ctx = jax.vmap(lambda dd, jr: solver._update(m, dd, jr))(d, jar)
    jw = J * ctx.quad_w[..., None]
    h = M + jnp.swapaxes(jw, -1, -2) @ J
    return h[..., 0]
  timed("update + H assembly", hasm, a_s * 0)

  # 5. H assembly + spd_solve
  def hsolve(c):
    x = a_s + eps * c
    jar = (J @ x[..., None])[..., 0]
    ctx = jax.vmap(lambda dd, jr: solver._update(m, dd, jr))(d, jar)
    jw = J * ctx.quad_w[..., None]
    h = M + jnp.swapaxes(jw, -1, -2) @ J
    h = h + jnp.eye(nv, dtype=h.dtype) * 1e-6
    g = (jnp.swapaxes(J, -1, -2) @ ctx.force[..., None])[..., 0]
    p = jax.vmap(linalg_tpu.spd_solve)(h, g)
    return p
  timed("update+H+spd_solve", hsolve, a_s * 0)

  # 6. linesearch alone (fixed jar0/jp)
  jar0 = (J @ a_s[..., None])[..., 0] - aref
  jp = (J @ (a_s * 0.9)[..., None])[..., 0]
  def ls(c):
    jp2 = jp + eps * (J @ c[..., None])[..., 0]
    al = jax.vmap(lambda dd, j0, jpp: solver._linesearch(
        m, dd, j0, jpp, jnp.float32(-1.0), jnp.float32(1.0)))(d, jar0, jp2)
    return a_s * 0 + al[..., None]
  timed("linesearch(4) + 1 Jpass", ls, a_s * 0)


if __name__ == "__main__":
  main()
