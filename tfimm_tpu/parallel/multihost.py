"""Multi-host (multi-process) initialization helpers.

On multi-host TPU pods each host runs the same program; `initialize()` wires
up jax.distributed so `jax.devices()` spans the pod while data pipelines
shard per host (`GrainDataset` uses process_index/process_count). Collectives
ride ICI within a slice and DCN across slices — all inserted by XLA from the
mesh shardings; nothing here touches transport.

Ordering contract: `initialize()` must run before anything queries the JAX
backend (`jax.devices()`, `jax.process_count()`, `jax.local_devices()`, any
jitted call, ...). Once a backend exists, `jax.distributed.initialize` can no
longer take effect, so this module never queries the backend on the
initialize path.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "is_primary", "local_batch_size"]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-process runs.

    With explicit arguments, wires up the coordinator (CPU/GPU clusters or
    manual TPU setups). With no arguments this is a no-op: single-process
    runs need nothing, and Cloud TPU pod runtimes autodetect topology from
    environment variables the moment the backend initializes.

    Safe to call more than once; "already initialized" (by the runtime or a
    previous call) is not an error. Crucially, this function performs NO
    backend queries before `jax.distributed.initialize` — querying would
    initialize a single-process backend and silently defeat the whole call.
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None:
        if num_processes is not None or process_id is not None:
            # Explicit-but-incomplete wiring must fail loudly: silently
            # skipping jax.distributed here would launch N independent
            # single-process runs — every host thinks it is primary,
            # checkpoints overwrite each other, local_batch_size divides
            # by the wrong process_count.
            raise ValueError(
                "initialize(num_processes=..., process_id=...) requires "
                "coordinator_address; omit all three for single-process "
                "or autodetected TPU-pod runs")
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # jax.distributed.initialize raises if the distributed system is
        # already up (e.g. the TPU runtime initialized it). That is fine.
        if "already" not in str(e) and "once" not in str(e):
            raise
    _initialized = True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    if global_batch_size % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{jax.process_count()} processes")
    return global_batch_size // jax.process_count()
