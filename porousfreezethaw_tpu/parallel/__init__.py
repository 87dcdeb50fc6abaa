from .sharding import make_mesh, shard_freezing_state, freezing_sharding
