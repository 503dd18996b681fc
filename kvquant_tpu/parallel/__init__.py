from .mesh import make_mesh, MeshConfig
from .shardings import (
    param_shardings,
    cache_shardings,
    quant_shardings,
    data_sharding,
    shard_params,
    shard_cache,
    shard_quant,
)

__all__ = [
    "make_mesh",
    "MeshConfig",
    "param_shardings",
    "cache_shardings",
    "quant_shardings",
    "data_sharding",
    "shard_params",
    "shard_cache",
    "shard_quant",
]
