"""Flash attention with fused decomposed relative-position bias (SAM/MViTv2).

SAM's global-attention blocks attend over N = gh*gw = 4096 tokens with bias
``b[q, k] = rel_h[q, kh(k)] + rel_w[q, kw(k)]`` (image_encoder.py's
add_decomposed_rel_pos). The XLA path materializes the (heads, N, N) score
matrix twice (scores + bias add) — ~0.4 GB per block in bf16. This kernel
streams K/V in blocks with the online-softmax recurrence and reconstructs the
bias tile inside VMEM from the two small precomputed terms
``rel_h_term = einsum(q, R_h) : (B, N, gh)`` and ``rel_w_term : (B, N, gw)``,
so nothing N^2-sized ever touches HBM.

Requires: N = gh * gw, gw divides block_k (key blocks cover whole key rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention_relpos"]

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, block_k: int,
            gw: int):
    """Grid: (B, N // block_q). Refs (block-local):
    q (1, bq, d) pre-scaled, k/v (1, N, d), rh (1, bq, gh), rw (1, bq, gw),
    o (1, bq, d)."""
    q = q_ref[0].astype(jnp.float32)             # (bq, d)
    rw = rw_ref[0].astype(jnp.float32)           # (bq, gw)
    rh = rh_ref[0].astype(jnp.float32)           # (bq, gh)
    gh = rh.shape[1]
    n = k_ref.shape[1]
    bq, d = q.shape
    rows_per_block = block_k // gw               # key-grid rows per k-block

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * block_k, block_k), :]
        vj = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kj.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, block_k)

        # Bias tile: key index k = kh * gw + kw. This block covers key rows
        # [j*rows_per_block, (j+1)*rows_per_block), each contributing gw cols.
        # rel_w part: the kw pattern (0..gw-1) repeats every gw columns.
        rw_tile = pltpu.repeat(rw, rows_per_block, axis=1)  # (bq, block_k)
        # rel_h part: column c belongs to key row kh0 + c // gw. Expand via a
        # one-hot selection matmul (Mosaic-friendly: iota compare + MXU dot,
        # no gathers or unaligned dynamic slices).
        kh0 = j * rows_per_block
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (gh, block_k), 0)
        col_kh = kh0 + jax.lax.broadcasted_iota(jnp.int32, (gh, block_k), 1) // gw
        sel = (row_ids == col_kh).astype(jnp.float32)       # (gh, block_k)
        rh_tile = jax.lax.dot_general(
            rh, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (bq, block_k)
        s = s + rw_tile + rh_tile

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), vj,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid_size", "scale", "block_q",
                                             "block_k", "interpret"))
def flash_attention_relpos(q, k, v, rel_h_term, rel_w_term, *, grid_size,
                           scale: float, block_q: int = 512,
                           block_k: int = 512, interpret: bool = False):
    """q, k, v: (B, N, D) with N = gh*gw; rel terms (B, N, gh)/(B, N, gw);
    bias applied to *unscaled-q* scores exactly like add_decomposed_rel_pos
    (callers pre-scale q and the rel terms consistently)."""
    gh, gw = grid_size
    b, n, d = q.shape
    assert n == gh * gw and n % block_k == 0 and n % block_q == 0
    assert block_k % gw == 0

    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, gw=gw),
        grid=(b, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, gh), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, gw), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * d,
            bytes_accessed=4 * b * n * d * q.dtype.itemsize,
            transcendentals=b * n * n,
        ),
    )(q * jnp.asarray(scale, q.dtype), k, v, rel_h_term, rel_w_term)
    return out
