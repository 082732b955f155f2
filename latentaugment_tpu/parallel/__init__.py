from .mesh import get_mesh, batch_sharding, replicated, shard_batch  # noqa: F401
from . import stats  # noqa: F401
