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
LANES = 128  # minor-dim replication for per-row scalars (lse, delta)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, n_actual: int,
                  block_k: int):
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
    # Log-sum-exp per row: the only residual the backward pass needs beyond
    # the inputs and the output (standard flash-attention recomputation).
    # Replicated across a 128-lane minor dim — Mosaic requires the last two
    # block dims to tile as (8, 128), so a bare (block_q,) vector won't lower.
    lse = m + jnp.log(jnp.maximum(l, 1e-30))  # (block_q, 1)
    lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], LANES))


def _flash_forward_call(q, k, v, n_actual, block_q, block_k, interpret):
    """Padded, pre-scaled (B, N_pad, D) inputs -> (out, lse)."""
    b, n_pad, d = q.shape
    grid = (b, n_pad // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, n_actual=n_actual, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, LANES), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * n_pad * d,
            bytes_accessed=3 * b * n_pad * d * q.dtype.itemsize
            + b * n_pad * d * q.dtype.itemsize,
            transcendentals=b * n_pad * n_pad,
        ),
    )(q, k, v)


# ---------------------------------------------------------------------------
# Backward kernels (standard flash-attention backward: recompute P from the
# saved log-sum-exp instead of storing the (N, N) score matrix).
#   delta = rowsum(dO * O);  p = exp(s - lse)
#   dV = P^T dO;  dS = P * (dO V^T - delta);  dK = dS^T Q;  dQ = dS K
# Q here is pre-scaled, so the chain rule for the scale factor happens in the
# (differentiable) outer code.
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, n_actual: int, block_k: int):
    q = q_ref[0].astype(jnp.float32)        # (block_q, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]                # (block_q, 1) from lane-replicated
    delta = delta_ref[0][:, 0:1]
    n_padded = k_ref.shape[1]
    nk = n_padded // block_k

    def body(j, dq):
        kj = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vj = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < n_actual, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, vj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, kj, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros_like(q)
    dq_ref[0] = jax.lax.fori_loop(0, nk, body, dq0).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          dk_ref, dv_ref, *, n_actual: int, block_q: int):
    k = k_ref[0].astype(jnp.float32)        # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    n_padded = q_ref.shape[1]
    nq = n_padded // block_q
    block_k = k.shape[0]
    j = pl.program_id(1)
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
           + j * block_k)                    # this program's key columns

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        doi = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0:1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0:1]
        s = jax.lax.dot_general(
            qi, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (block_q, block_k)
        s = jnp.where(col < n_actual, s, NEG_INF)
        p = jnp.exp(s - lse)
        # Padded q rows contribute nothing: their dO (and delta) are zero.
        dv_new = dv + jax.lax.dot_general(
            p, doi, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doi, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, qi, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    zeros = jnp.zeros_like(k)
    dk, dv = jax.lax.fori_loop(0, nq, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward_call(q, k, v, out, lse, do, n_actual, block_q, block_k,
                         interpret):
    b, n_pad, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (b, n_pad, LANES))  # lane-replicated

    full = pl.BlockSpec((1, n_pad, d), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    full_vec = pl.BlockSpec((1, n_pad, LANES), lambda bi, i: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    blk_q = pl.BlockSpec((1, block_q, d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
    blk_q_vec = pl.BlockSpec((1, block_q, LANES), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, n_actual=n_actual,
                          block_k=block_k),
        grid=(b, n_pad // block_q),
        in_specs=[full, full, blk_q, blk_q, blk_q_vec, blk_q_vec],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * n_pad * n_pad * d,
            bytes_accessed=4 * b * n_pad * d * q.dtype.itemsize,
            transcendentals=b * n_pad * n_pad,
        ),
    )(k, v, q, do, lse, delta)

    blk_k = pl.BlockSpec((1, block_k, d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, n_actual=n_actual,
                          block_q=block_q),
        grid=(b, n_pad // block_k),
        in_specs=[full, full, full_vec, full_vec, blk_k, blk_k],
        out_specs=[blk_k, blk_k],
        out_shape=[jax.ShapeDtypeStruct((b, n_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b, n_pad, d), v.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=7 * b * n_pad * n_pad * d,
            bytes_accessed=4 * b * n_pad * d * q.dtype.itemsize,
            transcendentals=b * n_pad * n_pad,
        ),
    )(q, do, lse, delta, k, v)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash3(q, k, v, n_actual, block_q, block_k, interpret):
    out, _ = _flash_forward_call(q, k, v, n_actual, block_q, block_k,
                                 interpret)
    return out


def _flash3_fwd(q, k, v, n_actual, block_q, block_k, interpret):
    out, lse = _flash_forward_call(q, k, v, n_actual, block_q, block_k,
                                   interpret)
    return out, (q, k, v, out, lse)


def _flash3_bwd(n_actual, block_q, block_k, interpret, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _flash_backward_call(
        q, k, v, out, lse, do, n_actual, block_q, block_k, interpret)
    return dq, dk, dv


_flash3.defvjp(_flash3_fwd, _flash3_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(q, k, v, bias=None, scale: Optional[float] = None,
                    interpret: bool = False):
    """Flash attention over (..., N, D), differentiable (custom VJP with
    Pallas backward kernels). bias is not yet fused (callers with a bias use
    the pure-JAX path via the dispatcher)."""
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
    # The scale multiply, padding, slicing and reshapes live outside the
    # custom-VJP core, so autodiff chains their gradients automatically.
    q = q * jnp.asarray(scale, dtype=q.dtype)

    block_q = min(BLOCK_Q, _round_up(n, 128))
    block_k = min(BLOCK_K, _round_up(n, 128))
    n_pad = _round_up(n, max(block_q, block_k))
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    out = _flash3(q, k, v, n, block_q, block_k, interpret)
    return out[:, :n, :].reshape(orig_shape)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
