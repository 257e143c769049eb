"""Multi-chip sharding over a jax.sharding.Mesh (dp x sp) with halo exchange."""

from .mesh import (
    ShardedPipeline,
    halo_exchange_rows,
    make_mesh,
    sharded_detect,
    sharded_detect_batch,
)

__all__ = [
    "ShardedPipeline",
    "halo_exchange_rows",
    "make_mesh",
    "sharded_detect",
    "sharded_detect_batch",
]
