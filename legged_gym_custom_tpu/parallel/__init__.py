from .mesh import batch_sharding, make_mesh, replicated, shard_env_state, shard_params
