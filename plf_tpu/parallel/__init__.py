from .sharding import make_mesh, shard_sites, plf_sharded, ShardedPLF
from .distributed import (initialize_distributed, global_site_mesh,
                          validate_site_workload, process_summary)
