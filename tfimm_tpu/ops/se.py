"""Channel-attention modules: squeeze-excite and ECA
(reference: tfimm/layers/attention.py:12-145)."""

from __future__ import annotations

import math

import jax

from tfimm_tpu.ops.basic import act_layer_factory
from tfimm_tpu.ops.conv import Conv2d
from tfimm_tpu.utils.etc import make_divisible

__all__ = ["SEModule", "EcaModule", "attn_layer_factory"]


class SEModule:
    """Squeeze-and-excitation with divisor-rounded reduction channels."""

    def __init__(self, in_channels, rd_ratio=1.0 / 16, rd_channels=None,
                 rd_divisor=8, act_layer="relu", gate_layer="sigmoid",
                 mlp_bias=True):
        if rd_channels is None:
            rd_channels = make_divisible(in_channels * rd_ratio, rd_divisor,
                                         round_limit=0.0)
        self.fc1 = Conv2d(in_channels, rd_channels, 1, use_bias=mlp_bias)
        self.fc2 = Conv2d(rd_channels, in_channels, 1, use_bias=mlp_bias)
        self.act = act_layer_factory(act_layer)
        self.gate = act_layer_factory(gate_layer)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"fc1": self.fc1.init(r1), "fc2": self.fc2.init(r2)}

    def __call__(self, p, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = self.fc1(p["fc1"], s)
        s = self.act(s)
        s = self.fc2(p["fc2"], s)
        return x * self.gate(s)


class EcaModule:
    """Efficient channel attention: 1D conv across channels with kernel size
    derived from log2(channels) (reference: tfimm/layers/attention.py:78-130)."""

    def __init__(self, in_channels, kernel_size=None, gamma=2, beta=1,
                 gate_layer="sigmoid"):
        if kernel_size is None:
            t = int(abs(math.log(in_channels, 2) + beta) / gamma)
            kernel_size = max(t if t % 2 else t + 1, 3)
        assert kernel_size % 2 == 1
        self.kernel_size = kernel_size
        self.gate = act_layer_factory(gate_layer)

    def init(self, rng):
        bound = 1.0 / math.sqrt(self.kernel_size)
        kernel = jax.random.uniform(rng, (self.kernel_size, 1, 1),
                                    minval=-bound, maxval=bound)
        return {"conv": {"kernel": kernel}}

    def __call__(self, p, x):
        s = x.mean(axis=(1, 2))  # (B, C)
        s = s[..., None]  # (B, C, 1) — channels as the "width" axis
        pad = (self.kernel_size - 1) // 2
        s = jax.lax.conv_general_dilated(
            s, p["conv"]["kernel"].astype(s.dtype),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        s = self.gate(s[..., 0])  # (B, C)
        return x * s[:, None, None, :]


def attn_layer_factory(attn_layer: str):
    """String -> channel-attention constructor (reference: attention.py:133-145)."""
    if attn_layer == "":
        return lambda channels, **kw: None
    if attn_layer == "se":
        return lambda channels, **kw: SEModule(channels, **kw)
    if attn_layer == "eca":
        return lambda channels, **kw: EcaModule(channels, **kw)
    raise ValueError(f"Unknown attention layer: {attn_layer}")
