"""Post-training int8 quantization for inference.

v5e's MXU runs int8 matmuls at ~2x the bf16 rate (394 vs 197 TOPS).
``quantize_int8`` converts the 2-D ``Dense`` kernels of a parameter pytree
(and 1x1 ConvMLP kernels, which are matmuls in disguise) to symmetric
per-output-channel int8 (weights static) and ``Dense``/``Conv2d``
dispatch on the converted dict: activations are quantized dynamically
per token (symmetric absmax over the feature axis), the matmul runs
int8 x int8 -> int32 on the MXU, and the result is rescaled to the
activation dtype.  Measured at ViT-B bs128 shapes on v5e
(scripts/perf/exp_int8.py, results/int8_matmul.csv): qkv 2.2x, fc1 1.4x,
proj 1.3x, fc2 1.1x vs the shipping bf16 matmuls, including the dynamic
quantization overhead.

This is beyond-parity surface: the reference has no quantization story
(its closest knob is the mixed_float16 policy,
/root/reference/tfimm/train/problems/classification.py:42-47).

Design notes:

- Weights are quantized offline, once, per output channel; the classifier
  head (and other name-matched projections) stay in floating point by
  default — the head matmul is a negligible share of the FLOPs and the
  logit layer is the most accuracy-sensitive.
- Activation scales are computed on the fly (dynamic quantization), so no
  calibration data is needed and the scheme is shape/model agnostic.
- Kernels smaller than ``min_features`` on either axis are left alone:
  the dynamic-quant overhead only pays for itself on MXU-bound shapes.
- The converted pytree round-trips through ``save_model``/``load_model``
  (npz preserves dtypes), and ``tree_cast`` leaves both the int8 leaves
  AND the float32 ``kernel_scale`` leaves alone (utils/tree.py), so a
  ``model.cast(bf16)`` after quantization is lossless — the scales never
  pass through bf16.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["quantize_int8", "int8_dense_matmul", "int8_conv",
           "is_quantized", "any_quantized"]


def any_quantized(*param_dicts) -> bool:
    """True when any of the given param sub-dicts carries an int8 kernel.

    Gate helper for the fused Pallas block kernels: they read several
    sub-dicts' ``kernel`` leaves raw (e.g. the Swin block kernel reads
    attn.qkv AND attn.proj AND mlp.fc1 AND mlp.fc2), so a dispatch gate
    must check EVERY dict the kernel reads — checking only one admits a
    partially-quantized block (possible with a custom ``quantize_int8``
    ``skip`` list) and raises KeyError at trace time.
    """
    return any("kernel_q" in d for d in param_dicts)

# Substrings of parameter-tree keys whose Dense kernels are never
# quantized. Classifier heads are excluded for accuracy (and are a
# negligible share of model FLOPs).
DEFAULT_SKIP: Tuple[str, ...] = (
    "head", "pre_logits", "classifier", "fc_dist", "last_linear",
)


@jax.custom_vjp
def int8_dense_matmul(p, x):
    """Dynamic-activation int8 matmul for a quantized Dense param dict.

    ``x``: (..., in) float array. ``p["kernel_q"]``: (in, out) int8.
    ``p["kernel_scale"]``: (out,) per-channel weight scale. Returns
    (..., out) in ``x.dtype`` (no bias — the caller adds it).

    Differentiable via a straight-through estimator: ``round``/``clip``
    have zero gradient, so tracing the forward through AD would silently
    kill the activation gradient. The custom VJP backpropagates through
    the dequantized weights instead (standard QAT practice), so e.g.
    fine-tuning float layers on top of a frozen int8 backbone works.
    """
    wq = p["kernel_q"]
    ws = p["kernel_scale"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(s, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * s * ws).astype(x.dtype)


def _int8_fwd(p, x):
    return int8_dense_matmul(p, x), (p, x)


def _int8_bwd(res, g):
    p, x = res
    w = (p["kernel_q"].astype(jnp.float32)
         * p["kernel_scale"].astype(jnp.float32)).astype(g.dtype)
    gx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))).astype(x.dtype)
    # The int8 weights are frozen: int leaves take float0 cotangents,
    # the float scale a zero.
    gp = {k: (np.zeros(v.shape, jax.dtypes.float0)
              if not jnp.issubdtype(v.dtype, jnp.inexact)
              else jnp.zeros_like(v))
          for k, v in p.items()}
    return gp, gx


int8_dense_matmul.defvjp(_int8_fwd, _int8_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def int8_conv(p, x, strides, padding, dilation):
    """Dynamic-activation int8 KxK convolution for a quantized conv dict.

    ``x``: (B, H, W, Cin) float NHWC. ``p["kernel_q"]``: (kh, kw, Cin, Cout)
    int8 HWIO. ``p["kernel_scale"]``: (Cout,) per-output-channel weight
    scale. ``strides``/``padding``/``dilation`` are the layer's static conv
    spec (``padding`` as lax accepts it: "SAME"/"VALID" or a pad tuple-of-
    tuples). Returns (B, H', W', Cout) in ``x.dtype`` (no bias).

    The activation scale is a single per-tensor absmax: per-position scales
    are NOT sound for K>1 convs — one KxK window spans positions with
    different scales, so the rescale could not be factored out of the sum.
    (Zero padding is exact under the symmetric scheme: zero-point is 0.)
    Measured on v5e at ResNet-50 bottleneck shapes (results/int8_conv.csv):
    the dynamic pipeline wins 1.38-1.59x at 3x3/C>=128 and loses at C=64
    and at 1x1 reduce/expand positions — which is exactly the eligibility
    region ``quantize_int8(convs=True)`` converts.

    Differentiable via the same straight-through estimator as
    ``int8_dense_matmul``: the backward runs XLA's conv VJP against the
    dequantized weights; the int8 weights themselves are frozen.
    """
    wq = p["kernel_q"]
    ws = p["kernel_scale"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        q, wq, window_strides=strides, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (s * ws)).astype(x.dtype)


def _int8_conv_fwd(p, x, strides, padding, dilation):
    return int8_conv(p, x, strides, padding, dilation), (p, x)


def _int8_conv_bwd(strides, padding, dilation, res, g):
    p, x = res
    w = (p["kernel_q"].astype(jnp.float32)
         * p["kernel_scale"].astype(jnp.float32)).astype(g.dtype)

    def f(x_):
        return jax.lax.conv_general_dilated(
            x_, w, window_strides=strides, padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    gx = jax.vjp(f, x.astype(g.dtype))[1](g)[0].astype(x.dtype)
    gp = {k: (np.zeros(v.shape, jax.dtypes.float0)
              if not jnp.issubdtype(v.dtype, jnp.inexact)
              else jnp.zeros_like(v))
          for k, v in p.items()}
    return gp, gx


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


def is_quantized(params) -> bool:
    """True if any Dense kernel in the pytree has been int8-quantized."""
    found = [False]

    def walk(d):
        if isinstance(d, dict):
            if "kernel_q" in d:
                found[0] = True
            for v in d.values():
                walk(v)

    walk(params)
    return found[0]


def quantize_int8(params, *, min_features: int = 256,
                  skip: Tuple[str, ...] = DEFAULT_SKIP,
                  convs: bool = False, min_conv_features: int = 128):
    """Return a copy of ``params`` with eligible Dense kernels in int8.

    A param dict is eligible when it holds a 2-D ``kernel`` (Dense) — or a
    (1, 1, in, out) conv kernel at a ConvMLP position (path ends in
    ``fc1``/``fc2``; a 1x1 conv is a matmul) — whose channel dims are both
    >= ``min_features`` and no component of its tree path contains a
    substring from ``skip`` (plus one exact-match rule: a dict named
    exactly ``fc`` — timm's classic-CNN classifier-head name — is never
    converted; a substring entry can't express that without also matching
    the fc1/fc2 MLP positions). The kernel is replaced by ``kernel_q`` (int8,
    always stored (in, out)) + ``kernel_scale`` (float32, per output
    channel); biases and all other leaves are untouched. ``Dense.__call__``
    and ``Conv2d.__call__`` dispatch on ``kernel_q``.

    ``convs=True`` additionally converts KxK (K>1) ungrouped conv kernels
    whose channel dims are BOTH >= ``min_conv_features`` — the region where
    the dynamic-quant conv pipeline measures a win on the v5e MXU
    (1.38-1.59x at 3x3/C>=128; flat at C=64; results/int8_conv.csv — the
    per-tensor activation scale a K>1 conv requires amortizes worse than
    the Dense path's per-token scale, hence the separate opt-in and
    threshold). KxK kernels are stored as 4-D int8 HWIO ``kernel_q``;
    depthwise/grouped kernels (shape[2] == cin/groups < threshold) and
    small-C stems never qualify. Opt-in because it only pays for families
    whose hot convs are wide KxK (classic ResNet); weight-standardized
    convs (ResNetV2/BiT) accept the conversion but dequantize at call time
    (standardization must see float weights), so they gain nothing.
    """

    def eligible(d, path) -> bool:
        k = d.get("kernel")
        if k is None or not hasattr(k, "ndim"):
            return False
        if "kernel_lora_a" in d:
            # LoRA layers read p["kernel"] directly (the low-rank update
            # adds onto it); quantize after merge_lora_weights instead.
            return False
        if path and path[-1] == "fc":
            # timm names classic-CNN classifier heads exactly "fc"
            # (ResNet's top-level fc; ClassifierHead/ResNetV2/ConvNeXt
            # store theirs as head/fc, caught by "head" below). A
            # substring entry can't express this without also matching
            # fc1/fc2, so it's an exact-match rule. The only non-head
            # exact-"fc" dicts are PiT's 1-2-cls-token pooling Dense and
            # EmbeddingModel's metric-learning projection — both
            # accuracy-sensitive and negligible FLOPs, right to skip.
            return False
        if k.ndim == 4 and (k.shape[0] != 1 or k.shape[1] != 1):
            # KxK conv: opt-in, win-region thresholds (see docstring).
            return (convs
                    and min(k.shape[2], k.shape[3]) >= min_conv_features
                    and not any(s in comp for comp in path for s in skip))
        if k.ndim == 4:
            # 1x1 convs are matmuls; convert only ConvMLP positions (fc1/
            # fc2) — other 1x1s (SE gates, StdConv downsamples, patch
            # embeds) are read raw by specialised layers.
            if (k.shape[0] != 1 or k.shape[1] != 1
                    or not path or path[-1] not in ("fc1", "fc2")):
                return False
            # SEModule names its 1x1 gate convs fc1/fc2 too (ops/se.py:
            # 26-27). SE is a reduce->expand bottleneck driving a sigmoid
            # gate — accuracy-sensitive, batch-only row count, no MXU
            # payback — while a ConvMLP expands then contracts. Require
            # the MLP orientation so SE gates are never converted, even
            # when a huge SE bottleneck clears min_features.
            cin, cout = k.shape[2], k.shape[3]
            if path[-1] == "fc1" and cout < cin:
                return False
            if path[-1] == "fc2" and cin < cout:
                return False
        elif k.ndim != 2:
            return False
        if min(k.shape[-2:]) < min_features:
            return False
        return not any(s in comp for comp in path for s in skip)

    def convert_kernel(k):
        w = jnp.asarray(k, jnp.float32)
        if w.ndim == 4 and w.shape[0] == w.shape[1] == 1:
            # (1, 1, in, out) -> (in, out): dispatched as a matmul.
            w = w.reshape(w.shape[2], w.shape[3])
        if w.ndim == 4:  # KxK HWIO: per-output-channel over (H, W, I).
            scale = jnp.maximum(
                jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        else:
            scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)
        return wq, scale

    def walk(d, path):
        if not isinstance(d, dict):
            return d
        out = {key: walk(v, path + (key,)) for key, v in d.items()}
        if eligible(d, path):
            wq, scale = convert_kernel(out.pop("kernel"))
            out["kernel_q"] = wq
            out["kernel_scale"] = scale
        return out

    return walk(params, ())
