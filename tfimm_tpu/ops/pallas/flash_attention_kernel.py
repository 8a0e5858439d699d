"""Blockwise-softmax (flash) attention kernel for TPU.

One grid program computes a (BLOCK_Q, D) output tile for one batch*head slice,
streaming K/V in BLOCK_K chunks with the online-softmax recurrence, so the
(N, N) score matrix never materializes in HBM. Scores and the softmax
accumulator stay in float32; the P·V matmuls feed the MXU in the input dtype.

Numerics oracle: tfimm_tpu.ops.attention._reference_attention (tested to
~1e-3 bf16 / 1e-6 f32 agreement in tests/ops/test_flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, n_actual: int, block_k: int):
    q = q_ref[0].astype(jnp.float32)  # (block_q, d) — pre-scaled
    n_padded = k_ref.shape[1]
    nk = n_padded // block_k
    d = q.shape[-1]

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * block_k, block_k), :]
        vj = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kj.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < n_actual, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), vj,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((q.shape[0], 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), dtype=jnp.float32)
    acc0 = jnp.zeros((q.shape[0], d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(q, k, v, bias=None, scale: Optional[float] = None,
                    interpret: bool = False):
    """Flash attention over (..., N, D). bias is not yet fused (callers with a
    bias use the pure-JAX path via the dispatcher)."""
    if bias is not None:
        raise NotImplementedError("bias fusion not implemented; use fallback")
    orig_shape = q.shape
    n, d = q.shape[-2], q.shape[-1]
    b = 1
    for s in q.shape[:-2]:
        b *= s
    q = q.reshape(b, n, d)
    k = k.reshape(b, n, d)
    v = v.reshape(b, n, d)

    scale = scale if scale is not None else d ** -0.5
    q = q * jnp.asarray(scale, dtype=q.dtype)

    block_q = min(BLOCK_Q, _round_up(n, 128))
    block_k = min(BLOCK_K, _round_up(n, 128))
    n_pad = _round_up(n, max(block_q, block_k))
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, n_actual=n, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * n_pad * d,
            bytes_accessed=3 * b * n_pad * d * q.dtype.itemsize
            + b * n_pad * d * q.dtype.itemsize,
            transcendentals=b * n_pad * n_pad,
        ),
    )(q, k, v)
    return out[:, :n, :].reshape(orig_shape)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
