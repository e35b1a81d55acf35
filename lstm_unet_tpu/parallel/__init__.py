from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch  # noqa: F401
from .distributed import initialize  # noqa: F401
