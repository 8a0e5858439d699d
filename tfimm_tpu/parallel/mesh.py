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

__all__ = ["create_mesh", "parse_mesh_spec"]


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


def parse_mesh_spec(spec: str, devices=None) -> Optional[Mesh]:
    """Parse a mesh spec string into a Mesh; the config-file / CLI surface for
    multi-chip training (``ExperimentConfig.mesh``).

    Grammar: comma-separated ``name:size`` pairs, e.g. ``"data:8"``,
    ``"data:4,model:2"``. One size may be ``-1`` (or omitted, ``"data"``),
    meaning "all remaining devices". Empty string -> ``None`` (single-device).
    """
    if not spec:
        return None
    devices = list(devices if devices is not None else jax.devices())
    names, sizes = [], []
    for part in spec.split(","):
        name, _, size = part.strip().partition(":")
        if not name:
            raise ValueError(f"Bad mesh spec {spec!r}: empty axis name")
        names.append(name)
        sizes.append(int(size) if size else -1)
    if sizes.count(-1) > 1:
        raise ValueError(f"Bad mesh spec {spec!r}: at most one axis may be -1")
    n = len(devices)
    known = int(np.prod([s for s in sizes if s != -1], dtype=np.int64)) \
        if any(s != -1 for s in sizes) else 1
    if -1 in sizes:
        if known <= 0 or n % known != 0:
            raise ValueError(
                f"Mesh spec {spec!r}: {n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes, dtype=np.int64))
    if total > n:
        raise ValueError(f"Mesh spec {spec!r} needs {total} devices, have {n}")
    return create_mesh(tuple(sizes), tuple(names), devices=devices[:total])
