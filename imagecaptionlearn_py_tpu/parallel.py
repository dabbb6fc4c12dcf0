"""Distribution re-exports (implementation: icl.dist + icl.runtime)."""

from icl.dist import build_mesh, data_axis_size, replicate, shard_batch
from icl.runtime import Runtime, init

__all__ = ["build_mesh", "data_axis_size", "replicate", "shard_batch",
           "Runtime", "init"]
