"""Shared SAM pieces (reference: segment_anything/common.py)."""

from __future__ import annotations

import jax

from tfimm_tpu.ops import Dense, act_layer_factory
from tfimm_tpu.ops.stochastic import dropout

__all__ = ["MLPBlock"]


class MLPBlock:
    """MLP with Meta-SAM layer naming (lin1/lin2)."""

    def __init__(self, embed_dim, hidden_dim, act_layer="gelu", drop_rate=0.0):
        self.lin1 = Dense(embed_dim, hidden_dim)
        self.lin2 = Dense(hidden_dim, embed_dim)
        self.act = act_layer_factory(act_layer)
        self.drop_rate = drop_rate

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"lin1": self.lin1.init(r1), "lin2": self.lin2.init(r2)}

    def __call__(self, p, x):
        x = self.act(self.lin1(p["lin1"], x))
        x = dropout(x, self.drop_rate)
        x = self.lin2(p["lin2"], x)
        return dropout(x, self.drop_rate)
