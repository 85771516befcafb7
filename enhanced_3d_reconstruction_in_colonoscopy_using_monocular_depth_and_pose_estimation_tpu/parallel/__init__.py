from .mesh import (
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
)

__all__ = [
    "MeshSpec",
    "build_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_shardings",
]
