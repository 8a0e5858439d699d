"""Convolution layers (NHWC activations, HWIO kernels — TPU-native layouts).

Padding semantics (the parity trap called out in SURVEY.md §7):
- ``"same"``: TF-style asymmetric SAME padding (XLA 'SAME'), used by ``tf_``
  EfficientNet variants.
- ``"symmetric"`` or an int/tuple: PyTorch-style symmetric padding — an
  explicit pad of (k-1)//2 per side (with dilation), matching timm models
  (reference: tfimm/layers/conv.py:15-148).
- ``"valid"``: no padding.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.basic import pt_default_init
from tfimm_tpu.utils.etc import to_2tuple

__all__ = ["Conv2d", "DepthwiseConv2d", "StdConv2d", "FanoutInitializer",
           "resolve_padding"]


def resolve_padding(padding, kernel_size, dilation=(1, 1)):
    """Return a lax-compatible padding spec."""
    if padding == "same":
        return "SAME"
    if padding == "valid":
        return "VALID"
    if padding == "symmetric":
        pads = []
        for k, d in zip(kernel_size, dilation):
            p = (d * (k - 1)) // 2
            pads.append((p, p))
        return pads
    padding = to_2tuple(padding)
    return [(int(p), int(p)) for p in padding]


def FanoutInitializer(groups: int = 1) -> Callable:
    """EfficientNet fan-out normal init, depthwise/group aware
    (reference: tfimm/layers/initializers.py:6-32)."""

    def init(rng, shape, dtype=jnp.float32):
        kh, kw, _, out = shape
        fan_out = kh * kw * out // groups
        std = jnp.sqrt(2.0 / fan_out)
        return std * jax.random.normal(rng, shape, dtype)

    return init


class Conv2d:
    """2D convolution. Params: {"kernel": (kh, kw, in/groups, out), "bias"}."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, Tuple[int, int]],
        stride: Union[int, Tuple[int, int]] = 1,
        padding: Union[str, int, Tuple[int, int]] = "symmetric",
        dilation: Union[int, Tuple[int, int]] = 1,
        groups: int = 1,
        use_bias: bool = True,
        kernel_init: Optional[Callable] = None,
        bias_init: Optional[Callable] = None,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = to_2tuple(kernel_size)
        self.stride = to_2tuple(stride)
        self.dilation = to_2tuple(dilation)
        self.groups = groups
        self.use_bias = use_bias
        self.padding = resolve_padding(padding, self.kernel_size, self.dilation)
        self.kernel_init = kernel_init or pt_default_init()
        self.bias_init = bias_init

    @property
    def kernel_shape(self):
        kh, kw = self.kernel_size
        return (kh, kw, self.in_channels // self.groups, self.out_channels)

    def init(self, rng):
        k_rng, b_rng = jax.random.split(rng)
        p = {"kernel": self.kernel_init(k_rng, self.kernel_shape)}
        if self.use_bias:
            if self.bias_init is not None:
                p["bias"] = self.bias_init(b_rng, (self.out_channels,))
            else:
                fan_in = (self.kernel_size[0] * self.kernel_size[1]
                          * self.in_channels // self.groups)
                bound = 1.0 / jnp.sqrt(fan_in)
                p["bias"] = jax.random.uniform(
                    b_rng, (self.out_channels,), minval=-bound, maxval=bound
                )
        return p

    # Weight-standardized subclasses must see float weights at call time;
    # they clear this so a quantized kernel dequantizes via _kernel
    # instead of taking an int8 fast path (which would skip the
    # standardization).
    _INT8_CONV = True

    def _kernel(self, p, dtype):
        if "kernel_q" in p:
            # int8-quantized kernel (tfimm_tpu.quant) on a geometry the
            # fast paths below declined: dequantize and convolve normally.
            k = (p["kernel_q"].astype(jnp.float32)
                 * p["kernel_scale"].astype(jnp.float32))
            return k.reshape(self.kernel_shape).astype(dtype)
        return p["kernel"].astype(dtype)

    def _int8_matmul_ok(self) -> bool:
        """1x1/stride-1/ungrouped/undilated with no spatial padding — the
        conv is exactly a feature-axis matmul."""
        return (self.kernel_size == (1, 1) and self.stride == (1, 1)
                and self.dilation == (1, 1) and self.groups == 1
                and (self.padding in ("SAME", "VALID")
                     or all(tuple(pad) == (0, 0) for pad in self.padding)))

    def __call__(self, p, x):
        if "kernel_q" in p and self._INT8_CONV and self._int8_matmul_ok():
            # int8 MXU path (tfimm_tpu.quant.quantize_int8): dynamic
            # per-position activation quant + int8 matmul over channels.
            from tfimm_tpu.quant import int8_dense_matmul

            y = int8_dense_matmul(p, x)
            if self.use_bias:
                y = y + p["bias"].astype(y.dtype)
            return y
        if ("kernel_q" in p and p["kernel_q"].ndim == 4
                and self.groups == 1 and self._INT8_CONV):
            # int8 KxK conv (quantize_int8(convs=True)): per-tensor dynamic
            # activation quant + int8 conv with int32 MXU accumulation.
            from tfimm_tpu.quant import int8_conv

            pad = (self.padding if isinstance(self.padding, str)
                   else tuple(tuple(q) for q in self.padding))
            y = int8_conv(p, x, self.stride, pad, self.dilation)
            if self.use_bias:
                y = y + p["bias"].astype(y.dtype)
            return y
        y = jax.lax.conv_general_dilated(
            x,
            self._kernel(p, x.dtype),
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + p["bias"].astype(y.dtype)
        return y


class DepthwiseConv2d(Conv2d):
    """Depthwise conv: groups == in_channels, optional channel multiplier.
    Params kernel shape: (kh, kw, 1, in_channels * multiplier)."""

    def __init__(self, in_channels, kernel_size, stride=1, padding="symmetric",
                 dilation=1, channel_multiplier: int = 1, use_bias=True,
                 kernel_init=None, bias_init=None):
        super().__init__(
            in_channels,
            in_channels * channel_multiplier,
            kernel_size,
            stride=stride,
            padding=padding,
            dilation=dilation,
            groups=in_channels,
            use_bias=use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
        )


class StdConv2d(Conv2d):
    """Weight-standardized conv (BiT / ResNetV2; reference:
    tfimm/layers/conv.py:151-222). Kernel standardized over (H, W, I)."""

    # Standardization must see float weights — a quantized kernel
    # dequantizes (super()._kernel) before standardizing, and the int8
    # fast path is declined (no payback: the conv still runs float).
    _INT8_CONV = False

    def __init__(self, *args, eps: float = 1e-8, **kwargs):
        super().__init__(*args, **kwargs)
        self.eps = eps

    def _kernel(self, p, dtype):
        if "kernel_q" in p:
            k = super()._kernel(p, jnp.float32)
        else:
            k = p["kernel"].astype(jnp.float32)
        mean = k.mean(axis=(0, 1, 2), keepdims=True)
        var = k.var(axis=(0, 1, 2), keepdims=True)
        k = (k - mean) * jax.lax.rsqrt(var + self.eps)
        return k.astype(dtype)
