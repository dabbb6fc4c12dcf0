from icl.dist.mesh import build_mesh, shard_batch, replicate, data_axis_size

__all__ = ["build_mesh", "shard_batch", "replicate", "data_axis_size"]
