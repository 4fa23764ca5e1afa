"""Parallelism layer: device mesh, shardings, multi-host init."""

from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
)

__all__ = [
    "data_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicated_sharding",
]
