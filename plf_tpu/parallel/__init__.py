from .sharding import make_mesh, shard_sites, plf_sharded, ShardedPLF
