"""Parameter-pytree utilities.

Params in tfimm_tpu are nested dicts of arrays whose dotted paths mirror the
timm/PyTorch module hierarchy (e.g. ``blocks.0.attn.qkv.kernel``). That naming
choice makes checkpoint conversion (utils/pt_convert.py) a mechanical leaf
rename + transpose, replacing the reference's name-translation grammar
(tfimm/utils/timm.py:39-106).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["flatten_params", "unflatten_params", "tree_cast", "count_params",
           "map_leaves_with_path"]


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, Any]:
    """Nested dict -> flat dict with '.'-joined keys."""
    out: Dict[str, Any] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else str(k))
        else:
            out[path] = node

    walk(tree, prefix)
    return out


def unflatten_params(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
    return out


def map_leaves_with_path(fn: Callable[[str, Any], Any], tree: Any) -> Any:
    flat = flatten_params(tree)
    return unflatten_params({k: fn(k, v) for k, v in flat.items()})


def tree_cast(tree: Any, dtype) -> Any:
    """Cast floating-point leaves to ``dtype``; leave integer leaves alone.

    Quantization scale leaves (``kernel_scale``, tfimm_tpu/quant.py) also
    stay float32: the int8 matmul reads them in float32 at every use, so
    casting them to bf16 would permanently destroy scale precision while
    saving nothing — ``model.cast(bf16)`` after ``quantize_int8`` must be
    lossless.
    """

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    def walk(node):
        if isinstance(node, dict):
            return {k: (v if k == "kernel_scale" else walk(v))
                    for k, v in node.items()}
        return jax.tree.map(cast, node)

    return walk(tree)


def count_params(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
