from .mesh import make_mesh, replicated, batch_sharded, host_shard_dataset

__all__ = ["make_mesh", "replicated", "batch_sharded", "host_shard_dataset"]
