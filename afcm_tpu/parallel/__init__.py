from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, collective_census,
                   format_census, infer_param_sharding, local_batch_size,
                   make_mesh, make_mesh_for_batch, replicate_state,
                   replicated_sharding, shard_batch, shard_params)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "collective_census",
           "format_census", "infer_param_sharding", "local_batch_size",
           "make_mesh", "make_mesh_for_batch", "replicate_state",
           "replicated_sharding", "shard_batch", "shard_params"]
