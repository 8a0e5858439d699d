"""Stochastic layers: Dropout and DropPath (stochastic depth).

RNGs come from the trace-time Context (deterministic fold_in stream), so block
stacks need no explicit key plumbing (reference: tfimm/layers/drop.py:10-37).
Both are identity when not training or when rate == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfimm_tpu.core import current_context

__all__ = ["Dropout", "DropPath", "dropout", "drop_path"]


def dropout(x, rate: float):
    ctx = current_context()
    if not ctx.training or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.make_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def drop_path(x, rate: float):
    """Per-sample residual-branch drop, rescaled by keep probability."""
    ctx = current_context()
    if not ctx.training or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(ctx.make_rng(), keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Dropout:
    def __init__(self, rate: float = 0.0):
        self.rate = rate

    def init(self, rng):
        return {}

    def __call__(self, p, x):
        return dropout(x, self.rate)


class DropPath:
    def __init__(self, rate: float = 0.0):
        self.rate = rate

    def init(self, rng):
        return {}

    def __call__(self, p, x):
        return drop_path(x, self.rate)
