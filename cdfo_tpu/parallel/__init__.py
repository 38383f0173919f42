from .mesh import initialize_distributed, make_mesh, replicate, shard_batch

__all__ = ["initialize_distributed", "make_mesh", "shard_batch",
           "replicate"]
