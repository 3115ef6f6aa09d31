"""Benchmark CLI: steps/s and realtime factor for any model.

Counterpart of the reference's two benchmark entry points —
sample/testspeed.cc (CPU engine: threads × steps) and mjx-testspeed
(jit(vmap(scan(step)))): run as

  python -m mujoco_tpu.testspeed <model.xml | zoo-name> [--nbatch N]
      [--nstep K] [--dtype f32|f64] [--unroll U]

Prints JIT time, run time, total env-steps/s and the realtime factor
(simulated seconds per wall second, aggregated over the batch).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("model", help="MJCF path or built-in zoo name")
  p.add_argument("--nbatch", type=int, default=4096)
  p.add_argument("--nstep", type=int, default=200)
  p.add_argument("--dtype", choices=("f32", "f64"), default="f32")
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args(argv)

  import jax
  import jax.numpy as jnp
  if args.dtype == "f64":
    jax.config.update("jax_enable_x64", True)

  from mujoco_tpu.models import io, zoo
  from mujoco_tpu.ops import forward
  from mujoco_tpu.parallel import rollout as par

  dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
  if os.path.exists(args.model):
    import mujoco
    mjm = mujoco.MjModel.from_xml_path(args.model)
    m = io.put_model(mjm, dtype=dtype)
  else:
    m = zoo.load(args.model, dtype=dtype)

  d0 = par.make_batch(m, args.nbatch, dtype=dtype)
  key = jax.random.PRNGKey(args.seed)
  d0 = d0.replace(qpos=d0.qpos + 0.01 * jax.random.normal(
      key, d0.qpos.shape, dtype=dtype))

  step = jax.vmap(lambda dd: forward.step(m, dd))

  @jax.jit
  def run(d):
    def body(dd, _):
      return step(dd), ()
    d, _ = jax.lax.scan(body, d, None, length=args.nstep)
    return d

  t0 = time.perf_counter()
  d = run(d0)
  jax.block_until_ready(d.qpos)
  jit_time = time.perf_counter() - t0

  t0 = time.perf_counter()
  d = run(d)
  jax.block_until_ready(d.qpos)
  run_time = time.perf_counter() - t0

  steps = args.nbatch * args.nstep
  sps = steps / run_time
  timestep = float(jax.device_get(m.opt.timestep))
  realtime = sps * timestep
  print(f"model          : {args.model}")
  print(f"device         : {jax.devices()[0]}")
  print(f"batch x steps  : {args.nbatch} x {args.nstep}")
  print(f"jit time       : {jit_time:.2f} s")
  print(f"run time       : {run_time:.3f} s")
  print(f"env-steps/s    : {sps:,.0f}")
  print(f"realtime factor: {realtime:,.0f}x")
  print(f"finite         : {bool(jnp.isfinite(d.qpos).all())}")


if __name__ == "__main__":
  main()
