"""LoRA layers (reference: tfimm/architectures/lora/layers.py:10-287).

In this functional framework a LoRA layer simply computes with the effective
kernel ``W + scaling * A @ B`` — there is no merged/unmerged mutable state.
Merging for export is a pure parameter-tree transformation
(factory.merge_lora_weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfimm_tpu.ops import Conv2d, Dense

__all__ = ["LoRADense", "LoRAConv2d", "convert_to_lora_layer",
           "LORA_WEIGHT_NAMES", "merge_kernel"]

# Leaf names holding low-rank factors (excluded from weight transfer).
LORA_WEIGHT_NAMES = ["kernel_lora_a", "kernel_lora_b"]


def merge_kernel(p, scaling):
    """Effective full-rank kernel: W + scaling * A @ B (works for Dense 2D and
    Conv 4D factors, where matmul batches over spatial dims)."""
    update = jnp.matmul(p["kernel_lora_a"], p["kernel_lora_b"])
    return p["kernel"] + scaling * update.astype(p["kernel"].dtype)


class LoRADense(Dense):
    is_lora_layer = True

    def __init__(self, in_features, out_features, use_bias=True,
                 lora_rank: int = 4, lora_alpha: float = 1.0, **kwargs):
        super().__init__(in_features, out_features, use_bias=use_bias, **kwargs)
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.scaling = lora_alpha / lora_rank

    def init(self, rng):
        p = super().init(rng)
        r = jax.random.fold_in(rng, 17)
        p["kernel_lora_a"] = jax.nn.initializers.glorot_uniform()(
            r, (self.in_features, self.lora_rank))
        p["kernel_lora_b"] = jnp.zeros((self.lora_rank, self.out_features))
        return p

    def __call__(self, p, x):
        kernel = merge_kernel(p, self.scaling).astype(x.dtype)
        y = jnp.dot(x, kernel)
        if self.use_bias:
            y = y + p["bias"].astype(y.dtype)
        return y


class LoRAConv2d(Conv2d):
    is_lora_layer = True

    def __init__(self, *args, lora_rank: int = 4, lora_alpha: float = 1.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.scaling = lora_alpha / lora_rank

    def init(self, rng):
        p = super().init(rng)
        r = jax.random.fold_in(rng, 17)
        kh, kw, in_ch, out_ch = self.kernel_shape
        p["kernel_lora_a"] = jax.nn.initializers.glorot_uniform()(
            r, (kh, kw, in_ch, self.lora_rank))
        p["kernel_lora_b"] = jnp.zeros((kh, kw, self.lora_rank, out_ch))
        return p

    def _kernel(self, p, dtype):
        return merge_kernel(p, self.scaling).astype(dtype)


def convert_to_lora_layer(layer, lora_rank: int = 4, lora_alpha: float = 1.0):
    """Dense/Conv2d layer object -> LoRA variant with identical hyperparams."""
    if isinstance(layer, Dense):
        return LoRADense(layer.in_features, layer.out_features,
                         use_bias=layer.use_bias,
                         kernel_init=layer.kernel_init,
                         bias_init=layer.bias_init,
                         lora_rank=lora_rank, lora_alpha=lora_alpha)
    if isinstance(layer, Conv2d):
        lora = LoRAConv2d(
            layer.in_channels, layer.out_channels, layer.kernel_size,
            stride=layer.stride, padding="valid", dilation=layer.dilation,
            groups=layer.groups, use_bias=layer.use_bias,
            kernel_init=layer.kernel_init, bias_init=layer.bias_init,
            lora_rank=lora_rank, lora_alpha=lora_alpha,
        )
        lora.padding = layer.padding  # preserve the resolved padding spec
        return lora
    raise ValueError(f"Cannot convert layer of type {type(layer)} to LoRA.")
