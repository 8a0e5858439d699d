"""Fused PoolFormer block kernel: norm1 + 3x3 exclude-pad avg-pool token
mixer + layer-scale residual + norm2 + conv-MLP + layer-scale residual, one
``pallas_call`` program per image with the whole (H, W, C) map VMEM-resident.

STATUS: MEASURED NEGATIVE on v5e — 0.5-0.6x vs XLA at every stage
(scripts/perf/exp_stage1.py, bs128 bf16 slope timing): XLA already fuses
the pool/norm/MLP chain into few passes and overlaps HBM streaming across
images, which the one-program-per-image kernel serializes. Kept as an
opt-in (TFIMM_TPU_FUSED_POOLFORMER=1) measurement vehicle.

Why: PoolFormer's early stages (s12 stage 1: C=64, 56x56) are pure
HBM-bandwidth — the block is ~10 elementwise/pool passes over a 400 KB map
plus two skinny matmuls (K=64), so XLA's fusion boundaries (pool, the two
norms' f32 casts, the 4C-wide MLP intermediate) cost several full-map HBM
round trips. Fused, the map is read once and written once per block
(reference role: tfimm/architectures/timm/poolformer.py PoolFormerBlock;
candidate named in round-2 TODO.md).

The pool is 9 roll+mask shifted adds on the VPU with the exclude-pad count
factored per-axis (count[i,j] = rc[i]*cc[j]); the MLP runs as two MXU
matmuls on the (H*W, C) view. Blocks are full-array in every dim, so Mosaic
tiling constraints are satisfied for any (H, W, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import interpret_forced, on_tpu

__all__ = ["poolformer_block_or_none"]

_VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def _group_norm1(x, scale, bias, eps):
    """GroupNorm(nb_groups=1) over the whole (H, W, C) map, f32 math."""
    mean = jnp.mean(x)
    var = jnp.mean(jnp.square(x - mean))
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _pool3x3_minus_x(y):
    """SAME 3x3 avg pool (count_include_pad=False) minus identity."""
    h, w, _ = y.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 1)
    acc = y
    for dh, dw in [(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)
                   if (a, b) != (0, 0)]:
        # Per-axis rolls: Mosaic rejects a multi-axis roll when one shift
        # component is 0 (it lowers to a 0-sized slice + concat).
        s = y
        if dh:
            s = jnp.roll(s, dh, axis=0)
        if dw:
            s = jnp.roll(s, dw, axis=1)
        valid = ((ri >= max(dh, 0)) & (ri < h + min(dh, 0))
                 & (ci >= max(dw, 0)) & (ci < w + min(dw, 0)))
        acc = acc + jnp.where(valid, s, 0.0)
    rc = (1 + (ri > 0) + (ri < h - 1)).astype(y.dtype)
    cc = (1 + (ci > 0) + (ci < w - 1)).astype(y.dtype)
    return acc / (rc * cc) - y


def _kernel(x_ref, n1_ref, n2_ref, ls_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref, *, eps: float):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)                       # (H, W, C)
    h, w, c = x.shape
    n1 = n1_ref[...].astype(f32)                   # (2, C): scale, bias
    n2 = n2_ref[...].astype(f32)
    ls = ls_ref[...].astype(f32)                   # (2, C): ls1, ls2

    y = _group_norm1(x, n1[0:1, :], n1[1:2, :], eps)
    x1 = x + _pool3x3_minus_x(y) * ls[0:1, :]

    y2 = _group_norm1(x1, n2[0:1, :], n2[1:2, :], eps)
    yr = y2.astype(o_ref.dtype).reshape(h * w, c)  # compute dtype for MXU
    h1 = jax.lax.dot_general(
        yr, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b1_ref[...]
    h1 = jax.nn.gelu(h1).astype(o_ref.dtype)
    out = jax.lax.dot_general(
        h1, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b2_ref[...]
    out = x1 + out.reshape(h, w, c) * ls[1:2, :]
    o_ref[0] = out.astype(o_ref.dtype)


def poolformer_block_or_none(p, x, *, mlp_ratio: float, eps: float = 1e-5):
    """Dispatch the fused block when it applies, else None.

    ``p``: PoolFormerBlock param dict ({norm1, norm2, mlp, layer_scale_*}).
    ``x``: (B, H, W, C) un-normalized map. Inference path (the caller gates
    on training); declines off-TPU or when the working set busts VMEM.
    """
    interpret = interpret_forced()
    if not (on_tpu() or interpret):
        return None
    b, h, w, c = x.shape
    c4 = int(c * mlp_ratio)
    # f32 map copies (x, y, acc/x1, y2) + MLP hidden + weights.
    vmem = 6 * h * w * c * 4 + h * w * c4 * 4 + 2 * c * c4 * x.dtype.itemsize
    if vmem > _VMEM_LIMIT_BYTES:
        return None
    k1 = p["mlp"]["fc1"]["kernel"]
    if k1.shape[:2] != (1, 1):
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch("poolformer_block")

    f32 = jnp.float32
    n1 = jnp.stack([p["norm1"]["scale"], p["norm1"]["bias"]]).astype(f32)
    n2 = jnp.stack([p["norm2"]["scale"], p["norm2"]["bias"]]).astype(f32)
    ls = jnp.stack([p["layer_scale_1"], p["layer_scale_2"]]).astype(f32)
    w1 = k1.reshape(c, c4).astype(x.dtype)
    w2 = p["mlp"]["fc2"]["kernel"].reshape(c4, c).astype(x.dtype)
    b1 = p["mlp"]["fc1"]["bias"].reshape(1, c4).astype(f32)
    b2 = p["mlp"]["fc2"]["bias"].reshape(1, c).astype(f32)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    img = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b,),
        in_specs=[img, full((2, c)), full((2, c)), full((2, c)),
                  full((c, c4)), full((1, c4)), full((c4, c)),
                  full((1, c))],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * w * c * c4,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=b * h * w * c4,
        ),
    )(x, n1, n2, ls, w1, b1, w2, b2)
