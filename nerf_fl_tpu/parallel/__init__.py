from . import multihost  # noqa: F401
from .mesh import (  # noqa: F401
    batch_sharding, make_mesh, param_shardings, place_params, replicated,
    shard_batch,
)
