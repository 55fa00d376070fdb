from .mesh import create_mesh, shard_batch, replicate, batch_sharding, local_batch_size
from .stats import StatsAccumulator, psum_dict
