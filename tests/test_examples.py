"""Every example in examples/ runs end-to-end (VERDICT r2: examples must be
exercised in CI, not just shipped as text)."""

import os
import subprocess
import sys

import pytest


_EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(os.path.dirname(__file__), "..",
                                       "examples"))
    if f.endswith(".py"))


@pytest.mark.parametrize("name", _EXAMPLES)
def test_example_runs(name):
  env = dict(os.environ)
  env.update(JAX_PLATFORMS="cpu", JAX_ENABLE_X64="0",
             EX_NBATCH="8", EX_NSTEP="10")
  path = os.path.join(os.path.dirname(__file__), "..", "examples", name)
  r = subprocess.run([sys.executable, path], env=env, capture_output=True,
                     text=True, timeout=1800)
  assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
  assert r.stdout.strip(), f"{name} produced no output"
