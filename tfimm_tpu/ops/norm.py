"""Normalization layers and the string-driven norm factory.

Factory names and eps values mirror the reference (tfimm/layers/factory.py:16-60):
"" (identity), batch_norm (PT eps 1e-5, momentum 0.9), batch_norm_tf (eps 1e-3),
layer_norm (eps 1e-5), layer_norm_eps_1e-6, affine (ResMLP), group_norm,
group_norm_1grp (PoolFormer).

Normalization statistics are always computed in float32 regardless of input
dtype (bf16-safe), then the result is cast back.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from tfimm_tpu.core import current_context

__all__ = ["LayerNorm", "BatchNorm", "GroupNorm", "Affine", "RMSNorm",
           "norm_layer_factory", "Identity"]


class Identity:
    def init(self, rng):
        return {}

    def __call__(self, p, x):
        return x


class LayerNorm:
    """Normalize over the trailing channel axis. Params: scale, bias."""

    def __init__(self, dim: int, eps: float = 1e-5, use_scale: bool = True,
                 use_bias: bool = True):
        self.dim = dim
        self.eps = eps
        self.use_scale = use_scale
        self.use_bias = use_bias

    def init(self, rng):
        p = {}
        if self.use_scale:
            p["scale"] = jnp.ones((self.dim,))
        if self.use_bias:
            p["bias"] = jnp.zeros((self.dim,))
        return p

    def __call__(self, p, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        # One-pass variance (E[x^2] - E[x]^2): halves the reduction passes over
        # HBM vs the two-pass form; f32 accumulation keeps it stable for the
        # activation magnitudes seen in these models.
        mean = x32.mean(axis=-1, keepdims=True)
        mean2 = jnp.square(x32).mean(axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * p["scale"].astype(jnp.float32)
        if self.use_bias:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(dtype)


class RMSNorm:
    def __init__(self, dim: int, eps: float = 1e-6):
        self.dim = dim
        self.eps = eps

    def init(self, rng):
        return {"scale": jnp.ones((self.dim,))}

    def __call__(self, p, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.square(x32).mean(axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps) * p["scale"].astype(jnp.float32)
        return y.astype(dtype)


class BatchNorm:
    """Batch norm over all axes but the last (NHWC / NC).

    Params: scale, bias, mean, var. In training mode, batch statistics are used
    for normalization and updated running stats are recorded on the Context
    (PyTorch semantics: running_var updated with the unbiased estimator).
    """

    def __init__(self, dim: int, eps: float = 1e-5, momentum: float = 0.9,
                 use_scale: bool = True, use_bias: bool = True):
        self.dim = dim
        self.eps = eps
        self.momentum = momentum  # decay of the running statistic
        self.use_scale = use_scale
        self.use_bias = use_bias

    def init(self, rng):
        p = {"mean": jnp.zeros((self.dim,)), "var": jnp.ones((self.dim,))}
        if self.use_scale:
            p["scale"] = jnp.ones((self.dim,))
        if self.use_bias:
            p["bias"] = jnp.zeros((self.dim,))
        return p

    def __call__(self, p, x):
        ctx = current_context()
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if ctx.training:
            mean = x32.mean(axis=axes)
            var = jnp.square(x32 - mean).mean(axis=axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            ctx.record_update(p, {
                "mean": m * p["mean"] + (1 - m) * mean.astype(p["mean"].dtype),
                "var": m * p["var"] + (1 - m) * unbiased.astype(p["var"].dtype),
            })
        else:
            mean = p["mean"].astype(jnp.float32)
            var = p["var"].astype(jnp.float32)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * p["scale"].astype(jnp.float32)
        if self.use_bias:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(dtype)


class GroupNorm:
    """Group normalization over (spatial, channel-group) for NHWC inputs
    (reference: tfimm/layers/norm.py:37-165)."""

    def __init__(self, dim: int, nb_groups: int = 32, eps: float = 1e-5):
        if dim % nb_groups != 0:
            raise ValueError(f"Channels {dim} not divisible by groups {nb_groups}")
        self.dim = dim
        self.nb_groups = nb_groups
        self.eps = eps

    def init(self, rng):
        return {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}

    def __call__(self, p, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        shape = x.shape
        group_shape = shape[:-1] + (self.nb_groups, self.dim // self.nb_groups)
        xg = x32.reshape(group_shape)
        # Normalize over all axes except batch and group.
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = xg.mean(axis=axes, keepdims=True)
        var = jnp.square(xg - mean).mean(axis=axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = xg.reshape(shape)
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(dtype)


class Affine:
    """Per-channel alpha*x + beta (ResMLP; reference: tfimm/layers/norm.py:7-34)."""

    def __init__(self, dim: int):
        self.dim = dim

    def init(self, rng):
        return {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}

    def __call__(self, p, x):
        return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def norm_layer_factory(norm_layer: str):
    """String -> norm layer constructor taking (dim, **kwargs)."""
    if norm_layer == "":
        return lambda dim=None, **kw: Identity()
    if norm_layer == "batch_norm":
        return lambda dim, **kw: BatchNorm(dim, eps=1e-5, momentum=0.9, **kw)
    if norm_layer == "batch_norm_tf":
        return lambda dim, **kw: BatchNorm(dim, eps=1e-3, momentum=0.9, **kw)
    if norm_layer == "layer_norm":
        return lambda dim, **kw: LayerNorm(dim, eps=1e-5, **kw)
    if norm_layer == "layer_norm_eps_1e-6":
        return lambda dim, **kw: LayerNorm(dim, eps=1e-6, **kw)
    if norm_layer == "affine":
        return lambda dim, **kw: Affine(dim)
    if norm_layer == "group_norm":
        return lambda dim, **kw: GroupNorm(dim, **kw)
    if norm_layer == "group_norm_1grp":
        return lambda dim, **kw: GroupNorm(dim, nb_groups=1, **kw)
    raise ValueError(f"Unknown normalization layer: {norm_layer}")
