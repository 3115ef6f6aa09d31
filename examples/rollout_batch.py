"""Batched rollout on one chip: 4096 humanoids with auto-reset.

Run:  python examples/rollout_batch.py          (TPU or CPU)
"""

import os
import time

import jax
import jax.numpy as jnp
from mujoco_tpu.models import zoo
from mujoco_tpu.parallel import rollout

NBATCH = int(os.environ.get("EX_NBATCH", "1024"))
NSTEP = int(os.environ.get("EX_NSTEP", "100"))

m = zoo.humanoid(dtype=jnp.float32)
batch = rollout.make_batch(m, NBATCH, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
batch = batch.replace(qpos=batch.qpos + 0.01 * jax.random.normal(
    key, batch.qpos.shape, dtype=batch.qpos.dtype))

run = jax.jit(lambda d: rollout.scan_steps(m, d, NSTEP))
out = run(batch)                       # compile
jax.block_until_ready(out.qpos)
t0 = time.perf_counter()
out = run(out)
jax.block_until_ready(out.qpos)
dt = time.perf_counter() - t0
print(f"{NBATCH * NSTEP / dt:,.0f} env-steps/s "
      f"({NBATCH} envs x {NSTEP} steps in {dt:.3f}s)")
