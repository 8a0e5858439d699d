"""Fused PVT spatial-reduction attention: q-projection + (N x S) scores +
softmax + value mix + output projection in one ``pallas_call`` per image.

STATUS: MEASURED NEGATIVE on v5e — 0.2-0.5x vs XLA
(scripts/perf/exp_stage1.py): the XLA path keeps the (N, S) scores fused
into the softmax chain and pipelines across images, so the kernel only
removes traffic XLA never paid. Kept as an opt-in
(TFIMM_TPU_FUSED_PVT_SRA=1) measurement vehicle.

PVT's early stages pair a huge query count with a tiny reduced key set
(stage 1 at 224²: N = 3136 queries, S = 49 keys after the sr_ratio=8 conv,
one head). The FLOPs are negligible — the XLA path's cost is HBM round
trips for q, the (N, S) score map, the softmax result, and the attention
output, each a full pass over an N-row tensor. Fused, x is read once and
the block writes only the projected output (reference role:
tfimm/architectures/pvt.py Attention; candidate named in round-2 TODO.md).

k and v stay outside (S tokens — the sr conv + LN + kv projection are
cheap and awkward to fuse); one program per image keeps every intermediate
VMEM-resident. Single-head only: multi-head stages have 4x fewer rows and
progressively less to gain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import interpret_forced, on_tpu

__all__ = ["sra_attention_or_none"]

_VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wp_ref, bp_ref, o_ref, *,
            scale: float):
    f32 = jnp.float32
    x = x_ref[0]                                   # (N, C) compute dtype
    k = k_ref[0]                                   # (S, C)
    v = v_ref[0]
    q = (jax.lax.dot_general(
        x, wq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bq_ref[...])
    q = (q * scale).astype(x.dtype)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                # (N, S)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).astype(x.dtype)
    y = (jax.lax.dot_general(
        out, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bp_ref[...])
    o_ref[0] = y.astype(o_ref.dtype)


def sra_attention_or_none(x, k, v, wq, bq, wp, bp, *, scale: float):
    """Dispatch the fused single-head SRA kernel, else None.

    ``x``: (B, N, C) normalized tokens; ``k``/``v``: (B, S, C) reduced
    keys/values; ``wq``/``wp``: (C, C) projections, ``bq``/``bp``: (C,) or
    None. Inference path (caller gates on training/dropout).
    """
    interpret = interpret_forced()
    if not (on_tpu() or interpret):
        return None
    b, n, c = x.shape
    s = k.shape[1]
    if s > 256:
        return None
    itemsize = jnp.dtype(x.dtype).itemsize
    # x + q(f32) + scores(f32) + p + out + y(f32)
    vmem = (2 * n * c * itemsize + 2 * n * c * 4 + n * s * 4 +
            n * s * itemsize + 2 * s * c * itemsize)
    if vmem > _VMEM_LIMIT_BYTES:
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch("pvt_sra")

    f32 = jnp.float32
    if bq is None:
        bq = jnp.zeros((c,), f32)
    if bp is None:
        bp = jnp.zeros((c,), f32)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    kv_row = pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b,),
        in_specs=[row, kv_row, kv_row, full((c, c)), full((1, c)),
                  full((c, c)), full((1, c))],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (2 * c + 2 * s),
            bytes_accessed=2 * b * n * c * itemsize,
            transcendentals=b * n * s,
        ),
    )(x, k, v, wq.astype(x.dtype), bq.astype(f32).reshape(1, c),
      wp.astype(x.dtype), bp.astype(f32).reshape(1, c))
