"""Device mesh and sharding helpers (data x member axes over ICI), plus
multi-host (DCN) process scaffolding in :mod:`.distributed`."""

from .distributed import (
    global_batch,
    initialize_distributed,
    is_primary,
    loader_shard,
    process_info,
)
from .mesh import make_mesh, batch_sharding, replicated_sharding

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_distributed",
    "process_info",
    "loader_shard",
    "global_batch",
    "is_primary",
]
