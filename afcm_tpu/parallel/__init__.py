from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, local_batch_size,
                   make_mesh, make_mesh_for_batch, replicate_state,
                   replicated_sharding, shard_batch)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "local_batch_size",
           "make_mesh", "make_mesh_for_batch", "replicate_state",
           "replicated_sharding", "shard_batch"]
