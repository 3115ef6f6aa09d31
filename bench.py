#!/usr/bin/env python
"""Benchmark: batched humanoid env-steps/s on one chip.

Protocol mirrors the reference's mjx benchmark (jit(vmap(scan(step))),
/root/reference/mjx/mujoco/mjx/_src/test_util.py:51-106) on our flagship
humanoid (BASELINE.md config 3). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s/chip", "vs_baseline": N}
vs_baseline is relative to MJX-JAX's published v5e per-chip humanoid number
(≈340K steps/s/chip, /root/reference/doc/mjx.rst:666-676).
"""

import json
import os
import sys
import time

BASELINE_PER_CHIP = 340_000.0


def main():
  nbatch = int(os.environ.get("BENCH_BATCH", "3072"))
  nstep = int(os.environ.get("BENCH_NSTEP", "200"))

  import jax
  import jax.numpy as jnp
  import numpy as np

  from mujoco_tpu.models import zoo
  from mujoco_tpu.ops import forward
  from mujoco_tpu.parallel import rollout as par

  m = zoo.humanoid(dtype=jnp.float32)
  d0 = par.make_batch(m, nbatch, dtype=jnp.float32)

  # randomize initial states slightly so envs don't march in lockstep
  key = jax.random.PRNGKey(0)
  qpos = d0.qpos + 0.01 * jax.random.normal(key, d0.qpos.shape,
                                            dtype=d0.qpos.dtype)
  d0 = d0.replace(qpos=qpos)

  step = jax.vmap(lambda dd: forward.step(m, dd))

  @jax.jit
  def run(d):
    def body(dd, _):
      return step(dd), ()
    d, _ = jax.lax.scan(body, d, None, length=nstep)
    return d

  t0 = time.perf_counter()
  d = run(d0)
  jax.block_until_ready(d.qpos)
  jit_time = time.perf_counter() - t0

  t0 = time.perf_counter()
  d = run(d)
  jax.block_until_ready(d.qpos)
  run_time = time.perf_counter() - t0

  steps = nbatch * nstep
  sps = steps / run_time
  finite = bool(jnp.isfinite(d.qpos).all())
  print(json.dumps({
      "metric": "env-steps/s/chip (batched humanoid, %d envs)" % nbatch,
      "value": round(sps, 1),
      "unit": "env-steps/s",
      "vs_baseline": round(sps / BASELINE_PER_CHIP, 4),
      "jit_time_s": round(jit_time, 2),
      "run_time_s": round(run_time, 3),
      "nstep": nstep,
      "finite": finite,
      "device": str(jax.devices()[0]),
  }))


if __name__ == "__main__":
  main()
