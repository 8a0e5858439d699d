"""Sharding rules: map parameter paths to PartitionSpecs.

Rules are (regex, PartitionSpec) pairs matched against flattened param paths.
DEFAULT_TP_RULES implements Megatron-style tensor parallelism for transformer
blocks (qkv/fc1 column-parallel, proj/fc2 row-parallel over the "model" axis);
everything else is replicated. With a size-1 "model" axis this degrades to pure
data parallelism. XLA inserts the all-reduces implied by the shardings.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfimm_tpu.utils.tree import flatten_params, unflatten_params

__all__ = ["DEFAULT_TP_RULES", "infer_param_sharding", "fsdp_param_sharding",
           "batch_sharding", "spatial_sharding", "replicated"]

# (path regex, spec builder). Specs reference the "model" axis for TP.
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    # Column parallel: shard the output features.
    (r"\.attn\.qkv\.kernel$", P(None, "model")),
    (r"\.attn\.qkv\.bias$", P("model")),
    (r"\.mlp\.fc1\.kernel$", P(None, "model")),
    (r"\.mlp\.fc1\.bias$", P("model")),
    # Row parallel: shard the input features; output is all-reduced by XLA.
    (r"\.attn\.proj\.kernel$", P("model", None)),
    (r"\.mlp\.fc2\.kernel$", P("model", None)),
]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, data_axis: str = "data",
                     spatial_axis: str = "seq") -> NamedSharding:
    """Shard NHWC inputs over batch AND image height (sequence/spatial
    parallelism). XLA's spatial partitioner propagates the H sharding
    through convs (inserting halo exchanges) and attention (inserting the
    k/v all-gathers) automatically — the TPU-classic recipe for images too
    large for one chip's HBM at batch 1. Use a mesh like
    ``create_mesh((d, s), ("data", "seq"))``."""
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def _divisible(shape, spec, mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        # A mesh without the axis (e.g. dp-only "data" mesh vs the TP rules'
        # "model") can't take the rule: fall back to replication.
        if axis not in mesh.shape or dim % mesh.shape[axis] != 0:
            return False
    return True


def infer_param_sharding(params, mesh: Mesh,
                         rules: Sequence[Tuple[str, P]] = None):
    """Return a pytree of NamedShardings matching ``params``.

    Falls back to replication when no rule matches or the dimension does not
    divide the mesh axis (e.g. tiny test models on an 8-way mesh).
    """
    rules = DEFAULT_TP_RULES if rules is None else rules
    flat = flatten_params(params)
    out = {}
    for path, leaf in flat.items():
        spec = P()
        for pattern, candidate in rules:
            if re.search(pattern, path):
                if _divisible(leaf.shape, candidate, mesh):
                    spec = candidate
                break
        out[path] = NamedSharding(mesh, spec)
    return unflatten_params(out)


def fsdp_param_sharding(params, mesh: Mesh, axis: str = "data",
                        rules: Sequence[Tuple[str, P]] = None,
                        min_leaf_size: int = 2 ** 14):
    """ZeRO-3-style param sharding: shard each large leaf over the data axis.

    Starts from the TP sharding (``rules``, Megatron over "model"), then for
    every leaf adds the ``axis`` ("data") mesh axis on the largest dimension
    that (a) isn't already sharded and (b) divides the axis size. Leaves
    smaller than ``min_leaf_size`` elements stay as the TP rule left them —
    sharding a LayerNorm bias buys nothing and costs an all-gather.

    With this as ``param_sharding`` (and the optimizer state following params,
    which ``make_train_step`` does automatically), XLA inserts the
    all-gathers before each use and reduce-scatters the gradients — the
    standard FSDP schedule, expressed purely through shardings.
    """
    base = infer_param_sharding(params, mesh, rules=rules)
    n_shard = mesh.shape[axis]
    flat_p = flatten_params(params)
    flat_s = flatten_params(base)
    out = {}
    for path, leaf in flat_p.items():
        spec = list(flat_s[path].spec)
        spec += [None] * (len(leaf.shape) - len(spec))
        if leaf.size >= min_leaf_size and n_shard > 1:
            # Largest free dimension divisible by the data-axis size.
            dims = sorted(range(len(leaf.shape)),
                          key=lambda d: leaf.shape[d], reverse=True)
            for d in dims:
                if spec[d] is None and leaf.shape[d] % n_shard == 0:
                    spec[d] = axis
                    break
        while spec and spec[-1] is None:
            spec.pop()
        out[path] = NamedSharding(mesh, P(*spec))
    return unflatten_params(out)
