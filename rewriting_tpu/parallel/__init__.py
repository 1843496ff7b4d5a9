from .mesh import (make_mesh, make_mesh_2d, shard_batch, replicate,
                   sharded_sampler, sharded_second_moment,
                   spatial_sharded_sampler, vmapped_multi_edit)

__all__ = ["make_mesh", "make_mesh_2d", "shard_batch", "replicate",
           "sharded_sampler", "sharded_second_moment",
           "spatial_sharded_sampler", "vmapped_multi_edit"]
