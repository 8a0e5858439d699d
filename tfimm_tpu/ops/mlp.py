"""MLP family (reference: tfimm/layers/transformers.py MLP/ConvMLP/GluMLP and
mlp_mixer.py SpatialGatingUnit/GatedMLP)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.basic import Dense, act_layer_factory, trunc_normal
from tfimm_tpu.ops.conv import Conv2d
from tfimm_tpu.ops.norm import LayerNorm
from tfimm_tpu.ops.stochastic import dropout

__all__ = ["MLP", "ConvMLP", "GluMLP", "GatedMLP"]


class MLP:
    """fc1 -> act -> drop -> fc2 -> drop. Params: {"fc1": ..., "fc2": ...}."""

    def __init__(self, in_features, hidden_features, out_features=None,
                 act_layer="gelu", drop_rate=0.0, use_bias=True,
                 kernel_init=None):
        out_features = out_features or in_features
        self.fc1 = Dense(in_features, hidden_features, use_bias=use_bias,
                         kernel_init=kernel_init)
        self.fc2 = Dense(hidden_features, out_features, use_bias=use_bias,
                         kernel_init=kernel_init)
        self.act = act_layer_factory(act_layer)
        self.drop_rate = drop_rate

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"fc1": self.fc1.init(r1), "fc2": self.fc2.init(r2)}

    def __call__(self, p, x):
        x = self.fc1(p["fc1"], x)
        x = self.act(x)
        x = dropout(x, self.drop_rate)
        x = self.fc2(p["fc2"], x)
        x = dropout(x, self.drop_rate)
        return x


class ConvMLP:
    """MLP as 1x1 convs on NHWC maps (ConvNeXt conv-MLP blocks)."""

    def __init__(self, in_features, hidden_features, out_features=None,
                 act_layer="gelu", drop_rate=0.0, kernel_init=None):
        out_features = out_features or in_features
        self.fc1 = Conv2d(in_features, hidden_features, 1, kernel_init=kernel_init)
        self.fc2 = Conv2d(hidden_features, out_features, 1, kernel_init=kernel_init)
        self.act = act_layer_factory(act_layer)
        self.drop_rate = drop_rate

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"fc1": self.fc1.init(r1), "fc2": self.fc2.init(r2)}

    def __call__(self, p, x):
        x = self.fc1(p["fc1"], x)
        x = self.act(x)
        x = dropout(x, self.drop_rate)
        x = self.fc2(p["fc2"], x)
        x = dropout(x, self.drop_rate)
        return x


class GluMLP:
    """MLP with GLU gating on the hidden units: fc1 output split in half,
    second half gated by activation (gMLP paper's SiLU variant)."""

    def __init__(self, in_features, hidden_features, out_features=None,
                 act_layer="sigmoid", drop_rate=0.0):
        assert hidden_features % 2 == 0
        out_features = out_features or in_features
        self.fc1 = Dense(in_features, hidden_features)
        self.fc2 = Dense(hidden_features // 2, out_features)
        self.act = act_layer_factory(act_layer)
        self.drop_rate = drop_rate

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"fc1": self.fc1.init(r1), "fc2": self.fc2.init(r2)}

    def __call__(self, p, x):
        x = self.fc1(p["fc1"], x)
        x, gates = jnp.split(x, 2, axis=-1)
        x = x * self.act(gates)
        x = dropout(x, self.drop_rate)
        x = self.fc2(p["fc2"], x)
        x = dropout(x, self.drop_rate)
        return x


class SpatialGatingUnit:
    """gMLP spatial gating: split channels, LN + token-mixing Dense on one half,
    multiply (reference: tfimm/layers/transformers.py SpatialGatingUnit)."""

    def __init__(self, dim, seq_len):
        self.norm = LayerNorm(dim // 2, eps=1e-5)
        # Token-mixing projection initialized near-zero, bias ones (paper init).
        self.proj = Dense(seq_len, seq_len,
                          kernel_init=trunc_normal(1e-6),
                          bias_init=lambda rng, shape, dtype=jnp.float32:
                          jnp.ones(shape, dtype))

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"norm": self.norm.init(r1), "proj": self.proj.init(r2)}

    def __call__(self, p, x):
        u, v = jnp.split(x, 2, axis=-1)
        v = self.norm(p["norm"], v)
        v = jnp.swapaxes(v, -1, -2)
        v = self.proj(p["proj"], v)
        v = jnp.swapaxes(v, -1, -2)
        return u * v


class GatedMLP:
    """gMLP block MLP: fc1 -> act -> SGU -> fc2."""

    def __init__(self, in_features, hidden_features, seq_len, out_features=None,
                 act_layer="gelu", drop_rate=0.0):
        out_features = out_features or in_features
        self.fc1 = Dense(in_features, hidden_features)
        self.gate = SpatialGatingUnit(hidden_features, seq_len)
        self.fc2 = Dense(hidden_features // 2, out_features)
        self.act = act_layer_factory(act_layer)
        self.drop_rate = drop_rate

    def init(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        return {"fc1": self.fc1.init(r1), "gate": self.gate.init(r2),
                "fc2": self.fc2.init(r3)}

    def __call__(self, p, x):
        x = self.fc1(p["fc1"], x)
        x = self.act(x)
        x = dropout(x, self.drop_rate)
        x = self.gate(p["gate"], x)
        x = self.fc2(p["fc2"], x)
        x = dropout(x, self.drop_rate)
        return x
