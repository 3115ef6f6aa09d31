"""On-chip island-solve measurement (VERDICT r2/r5: islands must pay,
measurably): single-scene multi-humanoid stepping with the island solve
vs the monolithic solve, plus trajectory agreement.

Run on the real chip:  python tools/bench_island.py [n_robots] [nstep]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ["MJTPU_ISLAND_MIN_NV"] = "0"   # measure islands at any size


def main():
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
  nstep = int(sys.argv[2]) if len(sys.argv) > 2 else 100

  import jax
  import jax.numpy as jnp
  import numpy as np

  from mujoco_tpu.models import io, zoo
  from mujoco_tpu.models.types import DisableBit
  from mujoco_tpu.ops import forward, island

  m_isl = zoo.multi_humanoid(n, dtype=jnp.float32)
  # convergence-iteration budget so island and monolithic land on the same
  # trajectory (tolerance-terminated), making the timing apples-to-apples
  m_isl = m_isl.replace(opt=m_isl.opt.replace(iterations=20))
  m_mono = m_isl.replace(opt=m_isl.opt.replace(
      disableflags=int(m_isl.opt.disableflags) | int(DisableBit.ISLAND)))
  assert island.use_islands(m_isl)
  assert not island.use_islands(m_mono)

  out = {"metric": "island_speedup_multi_humanoid", "n_robots": n,
         "nstep": nstep, "ntree": int(m_isl.ntree), "nv": int(m_isl.nv)}

  def run(m):
    d = io.make_data(m, dtype=jnp.float32)
    # drop robots into contact
    d = d.replace(qvel=0.05 * jax.random.normal(
        jax.random.PRNGKey(0), d.qvel.shape, dtype=d.qvel.dtype))
    step = jax.jit(lambda dd: forward.step(m, dd))
    t0 = time.perf_counter()
    d1 = jax.block_until_ready(step(d))
    jit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    dd = d1
    for _ in range(nstep):
      dd = step(dd)
    jax.block_until_ready(dd.qpos)
    run_s = time.perf_counter() - t0
    return jit_s, run_s, np.asarray(dd.qpos)

  jit_i, run_i, q_i = run(m_isl)
  jit_m, run_m, q_m = run(m_mono)
  out["island_steps_s"] = round(nstep / run_i, 1)
  out["mono_steps_s"] = round(nstep / run_m, 1)
  out["island_speedup"] = round(run_m / run_i, 3)
  out["jit_island_s"] = round(jit_i, 2)
  out["jit_mono_s"] = round(jit_m, 2)
  drift = float(np.abs(q_i - q_m).max())
  out["traj_drift"] = drift
  out["finite"] = bool(np.isfinite(q_i).all() and np.isfinite(q_m).all())
  print(json.dumps(out))


if __name__ == "__main__":
  main()
