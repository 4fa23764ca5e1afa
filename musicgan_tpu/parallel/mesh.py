"""Device mesh + sharding helpers: the communication layer.

The reference has no distributed support at all (SURVEY.md §2.4 — single
CUDA device, no torch.distributed).  Here, parallelism is expressed the
TPU-native way: a ``jax.sharding.Mesh`` over all devices, ``NamedSharding``
annotations on jitted programs, and XLA-inserted collectives riding ICI
(multi-host DCN via ``jax.distributed.initialize``).

Axes convention: ``data`` is the batch axis used for data-parallel training
(gradients all-reduce over it).  The networks are ~1M params, so tensor /
pipeline axes are unnecessary (SURVEY.md §2.4); ``time`` is used by the
long-clip generation path to shard the output time axis
(:mod:`musicgan_tpu.parallel.longclip`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "initialize_distributed",
]


def make_mesh(
    devices: Optional[Sequence] = None, axis: str = "data"
) -> Optional[Mesh]:
    """1-D mesh over all (or the given) devices; None for a single device.

    A single-device program skips sharding annotations entirely — XLA then
    compiles the exact same graph it would for the mesh size-1 case, minus
    partitioning overhead.
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) <= 1:
        return None
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``); no-op when the
    env provides no cluster (single-host runs, tests)."""
    if num_processes is None and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
