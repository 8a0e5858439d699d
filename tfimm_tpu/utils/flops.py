"""FLOPs and parameter counting (reference: tfimm/utils/flops.py:8-46).

Uses XLA's compiled-HLO cost analysis instead of the reference's frozen-graph
TF v1 profiler (and needs no empirical /2 correction: we report both raw
FLOPs and MACs = FLOPs / 2 so numbers are comparable with timm/tfimm tables).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from tfimm_tpu.utils.tree import count_params

__all__ = ["get_flops", "get_parameters"]


def get_flops(model, batch_size: int = 1) -> float:
    """Total forward-pass FLOPs per image from XLA cost analysis."""
    h, w = model.cfg.input_size
    x = jnp.zeros((batch_size, h, w, model.cfg.in_channels), jnp.float32)

    def forward(params, x):
        y = model.apply(params, x, training=False)
        return y[0] if isinstance(y, tuple) else y

    lowered = jax.jit(forward).lower(model.params, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) / batch_size


def get_parameters(model) -> int:
    return count_params(model.params)
