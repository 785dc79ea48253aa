from .mesh import create_mesh, local_mesh
from .sharding import shard_params, replicate, logical_sharding
