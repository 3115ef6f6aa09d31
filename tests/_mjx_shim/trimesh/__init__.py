"""Minimal stub of the `trimesh` package so the reference's MJX source tree
(/root/reference/mjx) can be imported for benchmarking on mesh-free models.
Any actual use raises."""


class Trimesh:  # noqa: D101
  def __init__(self, *a, **k):
    raise NotImplementedError("trimesh stub: mesh models unsupported in bench shim")


def __getattr__(name):
  raise NotImplementedError(f"trimesh stub: {name} unavailable")
