"""Device mesh and sharding helpers (data x member axes over ICI)."""

from .mesh import make_mesh, batch_sharding, replicated_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding"]
