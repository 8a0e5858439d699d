"""Multi-host (multi-process) initialization helpers.

On multi-host TPU pods each host runs the same program; `initialize()` wires
up jax.distributed so `jax.devices()` spans the pod while data pipelines
shard per host (`GrainDataset` uses process_index/process_count). Collectives
ride ICI within a slice and DCN across slices — all inserted by XLA from the
mesh shardings; nothing here touches transport.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "is_primary", "local_batch_size"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on single-process setups where TPU
    environment variables already provide the topology)."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    if global_batch_size % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{jax.process_count()} processes")
    return global_batch_size // jax.process_count()
