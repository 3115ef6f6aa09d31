"""Test configuration: virtual 8-device CPU mesh + f64 for oracle matching.

Must set XLA/JAX env vars before jax is imported anywhere (see task spec and
SURVEY.md §4: differential testing vs the C engine at f64 is the reference's
single most important pattern).
"""

import os

# flex tests need a wider slot budget than the bench default
os.environ.setdefault("MJTPU_FLEX_BUDGET", "32")

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

# The environment's sitecustomize registers the TPU-tunnel PJRT plugin and
# pins jax_platforms via config, which silently overrides the env var above —
# re-pin to cpu at config level so tests stay local and fast.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
