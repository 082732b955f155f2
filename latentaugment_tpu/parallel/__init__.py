from .mesh import (get_mesh, batch_sharding, replicated, shard_batch,  # noqa: F401
                   tp_tree_shardings, model_axis_size)
from . import stats  # noqa: F401
