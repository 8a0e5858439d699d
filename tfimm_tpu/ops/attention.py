"""Multi-head attention.

``scaled_dot_product_attention`` is the single entry point for all attention
math in the framework (ViT/CaiT global, Swin windowed w/ relative-position
bias, SAM). It dispatches to the Pallas TPU flash-attention kernel when
available and falls back to a pure-JAX implementation (which is also the
parity oracle for the kernel). Softmax always runs in float32.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from tfimm_tpu.core import capture_feature, current_context
from tfimm_tpu.ops.basic import Dense, trunc_normal
from tfimm_tpu.ops.stochastic import dropout

__all__ = ["scaled_dot_product_attention", "MultiHeadAttention"]


def _attention_weights(q, k, bias=None, scale=None):
    """Softmax attention weights (f32). q, k: (..., N, D).

    The (N, N) score matrix is *stored* in the compute dtype (bf16 scores are
    already quantized at the matmul output, so this loses nothing and halves
    HBM traffic — measured +6% ViT-B/16 end to end); softmax math (max, exp,
    sum) runs in float32 regardless.
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    scores = jnp.einsum("...qd,...kd->...qk",
                        q * jnp.asarray(scale, q.dtype), k)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def _reference_attention(q, k, v, bias=None, scale=None):
    """Pure-JAX attention. q, k, v: (..., N, D). bias broadcastable to
    scores. See :func:`_attention_weights` for the score-dtype policy."""
    weights = _attention_weights(q, k, bias=bias, scale=scale)
    out = jnp.einsum("...qk,...kd->...qd", weights.astype(q.dtype), v)
    return out, weights


def scaled_dot_product_attention(q, k, v, bias=None, scale: Optional[float] = None,
                                 return_weights: bool = False):
    """Attention over (..., N, D) tensors; leading dims are batch/head.

    Uses the Pallas flash-attention kernel on TPU when shapes qualify, unless
    attention weights are requested (feature capture) or TFIMM_TPU_NO_FLASH=1.
    """
    if (not return_weights
            and os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"):
        # Differentiable: the kernel has a custom VJP (Pallas backward
        # kernels), so it serves training as well as inference.
        from tfimm_tpu.ops.pallas import flash_attention_or_none

        out = flash_attention_or_none(q, k, v, bias=bias, scale=scale)
        if out is not None:
            return out
    out, weights = _reference_attention(q, k, v, bias=bias, scale=scale)
    return (out, weights) if return_weights else out


class MultiHeadAttention:
    """ViT-style MHA with fused qkv projection
    (reference: tfimm/architectures/vit.py:122-172).

    Params: {"qkv": {kernel, bias}, "proj": {kernel, bias}} — mirrors timm's
    ``attn.qkv`` / ``attn.proj`` naming for mechanical weight conversion.
    """

    def __init__(self, dim: int, nb_heads: int, qkv_bias: bool = True,
                 attn_drop_rate: float = 0.0, proj_drop_rate: float = 0.0,
                 kernel_init=None):
        assert dim % nb_heads == 0
        self.dim = dim
        self.nb_heads = nb_heads
        self.head_dim = dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.attn_drop_rate = attn_drop_rate
        self.proj_drop_rate = proj_drop_rate
        kernel_init = kernel_init or trunc_normal(0.02)
        self.qkv = Dense(dim, dim * 3, use_bias=qkv_bias, kernel_init=kernel_init)
        self.proj = Dense(dim, dim, kernel_init=kernel_init)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"qkv": self.qkv.init(r1), "proj": self.proj.init(r2)}

    def __call__(self, p, x, feature_name: Optional[str] = None):
        b, n, _ = x.shape
        ctx = current_context()
        qkv = self.qkv(p["qkv"], x)

        want_weights = ctx.capture_features and feature_name is not None
        if (not want_weights
                and not (ctx.training and self.attn_drop_rate > 0.0)
                and os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"):
            # Fused kernel straight from the packed qkv: no head transposes,
            # scores never leave VMEM (1.5x over XLA at ViT-B shapes on
            # v5e). Differentiable (custom VJP with a Pallas backward), so
            # training uses it too unless attention dropout is on.
            from tfimm_tpu.ops.pallas.fused_mha import fused_mha_or_none

            out = fused_mha_or_none(qkv, self.nb_heads, self.scale)
            if out is not None:
                out = self.proj(p["proj"], out)
                return dropout(out, self.proj_drop_rate)

        qkv = qkv.reshape(b, n, 3, self.nb_heads, self.head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if want_weights or (ctx.training and self.attn_drop_rate > 0.0):
            # Weights-explicit path (feature capture and/or attention
            # dropout): ONE P@V einsum, after the capture and the drop —
            # going through return_weights=True here would compute the
            # attention output a second time just to discard it.
            weights = _attention_weights(q, k, scale=self.scale)
            if want_weights:
                capture_feature(feature_name, weights)
            if ctx.training and self.attn_drop_rate > 0.0:
                weights = dropout(weights, self.attn_drop_rate)
            out = jnp.einsum("...qk,...kd->...qd", weights.astype(v.dtype), v)
        else:
            out = scaled_dot_product_attention(q, k, v, scale=self.scale)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = self.proj(p["proj"], out)
        out = dropout(out, self.proj_drop_rate)
        return out
