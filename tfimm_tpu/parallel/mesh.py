"""Device-mesh construction.

The reference is single-GPU only (SURVEY.md §2.7); multi-chip execution here is
TPU-idiomatic by design: a ``jax.sharding.Mesh`` with named axes, sharding
annotations on params/batch, and XLA inserting the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["create_mesh"]


def create_mesh(shape: Optional[Tuple[int, ...]] = None,
                axis_names: Sequence[str] = ("data", "model"),
                devices=None) -> Mesh:
    """Create a mesh over all (or the given) devices.

    ``shape=None`` puts every device on the first axis (pure data parallel)
    with size-1 trailing axes. Axis names default to ("data", "model"):
    batch is sharded over "data"; tensor-parallel params over "model".
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"Mesh shape {shape} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
