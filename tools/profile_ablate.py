#!/usr/bin/env python
"""Scan-amortized stage-cost ablation on the real chip.

Per CLAUDE.md, jit(stage) timings through the axon tunnel are misleading
(dispatch overhead + full-Data reads); the trustworthy signal is whole-scan
throughput. This tool re-times the flagship scan with stages statically
compiled out via Option.disableflags (a static field, so each variant is a
fresh trace) and reports the marginal cost of each stage.
"""

import os
import time

import jax
import jax.numpy as jnp

from mujoco_tpu.models import io, zoo
from mujoco_tpu.models.types import DisableBit
from mujoco_tpu.parallel import rollout as par


def measure(m, nbatch, nstep, label, reps=3):
  d0 = par.make_batch(m, nbatch, dtype=jnp.float32)
  key = jax.random.PRNGKey(0)
  d0 = d0.replace(qpos=d0.qpos + 0.01 * jax.random.normal(
      key, d0.qpos.shape, dtype=d0.qpos.dtype))
  d_fresh = io.make_data(m, dtype=jnp.float32)

  @jax.jit
  def run(d):
    return par.scan_steps(m, d, nstep, d_fresh=d_fresh, check=True)

  t0 = time.perf_counter()
  d = run(d0)
  jax.block_until_ready(d.qpos)
  jit_t = time.perf_counter() - t0
  best = 1e9
  for _ in range(reps):
    t0 = time.perf_counter()
    d = run(d)
    jax.block_until_ready(d.qpos)
    best = min(best, time.perf_counter() - t0)
  sps = nbatch * nstep / best
  print(f"{label:<28s} {sps/1e3:9.1f}K sps  run {best*1e3:7.1f} ms  "
        f"jit {jit_t:5.1f}s", flush=True)
  return best


def main():
  nbatch = int(os.environ.get("BENCH_BATCH", "3072"))
  nstep = int(os.environ.get("BENCH_NSTEP", "200"))
  m = zoo.humanoid(dtype=jnp.float32)

  base = measure(m, nbatch, nstep, "full step")

  variants = [
      ("no sensors", DisableBit.SENSOR),
      ("no contact (coll+rows)", DisableBit.CONTACT),
      ("no constraint solve", DisableBit.CONSTRAINT),
      ("no actuation", DisableBit.ACTUATION),
      ("no spring/damper", DisableBit.SPRING | DisableBit.DAMPER),
      ("no ctc+cst+sns", DisableBit.CONTACT | DisableBit.CONSTRAINT
       | DisableBit.SENSOR),
  ]
  for label, bit in variants:
    mv = m.replace(opt=m.opt.replace(disableflags=m.opt.disableflags | bit))
    t = measure(mv, nbatch, nstep, label)
    print(f"   -> marginal {label:<24s} {(base-t)/base*100:5.1f}% of step",
          flush=True)


if __name__ == "__main__":
  main()
