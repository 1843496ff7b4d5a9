from .mesh import (make_mesh, shard_batch, replicate, sharded_sampler,
                   sharded_second_moment, vmapped_multi_edit)

__all__ = ["make_mesh", "shard_batch", "replicate", "sharded_sampler",
           "sharded_second_moment", "vmapped_multi_edit"]
