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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention_relpos"]

NEG_INF = -1e30


LANES = 128  # minor-dim replication for per-row scalars (lse, delta)


def _paired_enabled() -> bool:
    """Head-pair lane packing, default-on for INFERENCE
    (TFIMM_TPU_RELPOS_PAIRED=0 opts out); training contexts stay unpaired.

    SAM's head width d=64 pads to the 128-lane MXU tile in EVERY attention
    matmul of the per-head layout — score/dp contract over 64 lanes,
    pv/dq/dk/dv emit 64 output lanes — so each runs at half the useful MXU
    rate. Packing head pairs into the 128 lanes (masked sublane-stacked
    queries, the fused_mha trick) makes all six matmuls full-width with the
    same useful FLOPs, and halves the program count.

    Measured on v5e (results/stacked_experiment.csv, round 4): SAM ViT-B
    encoder inference 37.7 -> 38.7 img/s (+2.7%) — default ON, matching
    the other stacked-body wins. The paired BACKWARD (with its 256-block
    clamp; 512 blocks bust scoped vmem) measured 16.8 vs 17.7 img/s on
    the encoder fine-tune step (-5%): the fwd gain does not survive the
    5-matmul backward's extra masking, so training contexts
    (tfimm_tpu.core.is_training) dispatch the per-head layout.
    """
    val = os.environ.get("TFIMM_TPU_RELPOS_PAIRED", "1")
    if val == "force":
        return True  # measurement escape: pair even under training
    if val != "1":
        return False
    from tfimm_tpu.core import is_training

    return not is_training()


def _pack_pairs(x):
    """(B, N, d) -> (B//2, N, 2d): consecutive B rows packed along lanes.

    Rows are independent attention problems, so any pairing is exact; the
    caller's (image, head) row-major order pairs heads (2h, 2h+1)."""
    b, n, d = x.shape
    return x.reshape(b // 2, 2, n, d).transpose(0, 2, 1, 3).reshape(
        b // 2, n, 2 * d)


def _unpack_pairs(x):
    b2, n, d2 = x.shape
    return x.reshape(b2, n, 2, d2 // 2).transpose(0, 2, 1, 3).reshape(
        2 * b2, n, d2 // 2)


def _h_selector(j: int, gh: int, block_k: int, gw: int):
    """One-hot (gh, block_k) matrix: sel[h, c] = 1 iff key column c of key
    block j lies in key-grid row h. Mosaic-friendly (iota compare + MXU dot;
    no gathers or unaligned dynamic slices)."""
    kh0 = j * (block_k // gw)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (gh, block_k), 0)
    col_kh = kh0 + jax.lax.broadcasted_iota(jnp.int32, (gh, block_k), 1) // gw
    return (row_ids == col_kh).astype(jnp.float32)


def _w_selector(block_k: int, gw: int):
    """One-hot (block_k, gw): sel[c, w] = 1 iff c % gw == w."""
    col = jax.lax.broadcasted_iota(jnp.int32, (block_k, gw), 0) % gw
    w = jax.lax.broadcasted_iota(jnp.int32, (block_k, gw), 1)
    return (col == w).astype(jnp.float32)


def _bias_tile(rh, rw, j, block_k: int, gw: int, rows_per_block: int):
    """(bq, block_k) bias tile for key block j from rh (bq, gh), rw (bq, gw).

    rel_w: the kw pattern (0..gw-1) repeats every gw columns. rel_h: column c
    belongs to key row kh0 + c // gw, expanded via one-hot selection matmul.
    """
    rw_tile = pltpu.repeat(rw, rows_per_block, axis=1)
    sel = _h_selector(j, rh.shape[1], block_k, gw)
    rh_tile = jax.lax.dot_general(
        rh, sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return rw_tile + rh_tile


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref, *,
            block_k: int, gw: int):
    """Grid: (B, N // block_q). Refs (block-local):
    q (1, bq, d) pre-scaled, k/v (1, N, d), rh (1, bq, gh), rw (1, bq, gw),
    o (1, bq, d), lse (1, bq, LANES)."""
    q = q_ref[0].astype(jnp.float32)             # (bq, d)
    rw = rw_ref[0].astype(jnp.float32)           # (bq, gw)
    rh = rh_ref[0].astype(jnp.float32)           # (bq, gh)
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
        s = s + _bias_tile(rh, rw, j, block_k, gw, rows_per_block)

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
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0] = jnp.broadcast_to(lse, (bq, LANES))


def _kernel_paired(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref, *,
                   block_k: int, gw: int, d: int):
    """Pair-packed twin of :func:`_kernel`: two heads share the 128 lanes.

    q/k/v refs hold head pairs packed along lanes ((1, bq, 2d)/(1, n, 2d));
    the two heads' lane-masked queries stack along sublanes so the score
    matmul contracts over the full 2d=128 lanes, and a single PV matmul
    fills both heads' output lanes (each head's valid half selected from
    its row block). rh/rw arrive with an explicit head-slot axis."""
    q = q_ref[0].astype(jnp.float32)             # (bq, 2d)
    bq, d2 = q.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, d2), 1)
    qc = jnp.concatenate([jnp.where(lane < d, q, 0),
                          jnp.where(lane >= d, q, 0)], axis=0)  # (2bq, 2d)
    rh0 = rh_ref[0, 0].astype(jnp.float32)       # (bq, gh)
    rh1 = rh_ref[0, 1].astype(jnp.float32)
    rw0 = rw_ref[0, 0].astype(jnp.float32)
    rw1 = rw_ref[0, 1].astype(jnp.float32)
    n = k_ref.shape[1]
    rows_per_block = block_k // gw

    def body(j, carry):
        m, l, acc = carry
        kj = k_ref[0, pl.ds(j * block_k, block_k), :]
        vj = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            qc, kj.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2bq, block_k)
        s = s + jnp.concatenate(
            [_bias_tile(rh0, rw0, j, block_k, gw, rows_per_block),
             _bias_tile(rh1, rw1, j, block_k, gw, rows_per_block)], axis=0)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), vj,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2bq, 2d): rows 0:bq valid on lanes <d, rows bq:2bq on >=d
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((2 * bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((2 * bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((2 * bq, d2), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n // block_k, body, (m0, l0, acc0))
    o = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = jnp.where(lane < d, o[:bq], o[bq:]).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0, 0] = jnp.broadcast_to(lse[:bq], (bq, LANES))
    lse_ref[0, 1] = jnp.broadcast_to(lse[bq:], (bq, LANES))


def _relpos_forward_call_paired(qs, k, v, rh2, rw2, gw, block_q, block_k,
                                interpret):
    b2, n, d2 = qs.shape
    gh = rh2.shape[-1]
    return pl.pallas_call(
        functools.partial(_kernel_paired, block_k=block_k, gw=gw, d=d2 // 2),
        grid=(b2, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d2), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d2), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d2), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_q, gh), lambda bi, qi: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_q, gw), lambda bi, qi: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d2), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_q, LANES),
                         lambda bi, qi: (bi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b2, n, d2), qs.dtype),
            jax.ShapeDtypeStruct((b2, 2, n, LANES), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b2 * n * n * d2,
            bytes_accessed=4 * b2 * n * d2 * qs.dtype.itemsize,
            transcendentals=2 * b2 * n * n,
        ),
    )(qs, k, v, rh2, rw2)


def _relpos_forward_call(qs, k, v, rh, rw, gw, block_q, block_k, interpret):
    b, n, d = qs.shape
    gh = rh.shape[-1]
    return pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), qs.dtype),
            jax.ShapeDtypeStruct((b, n, LANES), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * d,
            bytes_accessed=4 * b * n * d * qs.dtype.itemsize,
            transcendentals=b * n * n,
        ),
    )(qs, k, v, rh, rw)


# ---------------------------------------------------------------------------
# Backward. s = qs k^T + bias, p = exp(s - lse), so d_bias = dS; the rel-term
# gradients are blockwise reductions of dS through the same one-hot selection
# matmuls the forward uses to expand them:
#   d_rh[q, h] = sum_{c: kh(c)=h} dS[q, c] = dS @ sel^T
#   d_rw[q, w] = sum_{c: kw(c)=w} dS[q, c] = dS @ wsel
# ---------------------------------------------------------------------------

def _bwd_fused_kernel(qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      rh_ref, rw_ref, dq_ref, dk_ref, dv_ref, drh_ref,
                      drw_ref, *, gw: int):
    """Single-pass backward for window-sized N: one program per batch row
    computes every gradient with the (N, N) score matrix VMEM-resident.

    The streaming _bwd_dq/_bwd_dkv pair below amortizes at SAM-global sizes
    (N >= 1024) but loses 2.5x at N = window² = 196 — two pallas_calls that
    each re-read all operands and recompute p, for a score matrix that is
    only 154 KB. Here s/p/ds are computed once and every contraction is a
    full-size (N, N) x (N, d) MXU op."""
    q = qs_ref[0].astype(jnp.float32)          # (n, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    rh = rh_ref[0].astype(jnp.float32)
    rw = rw_ref[0].astype(jnp.float32)
    gh = rh.shape[1]
    n = q.shape[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + _bias_tile(rh, rw, 0, n, gw, n // gw)
    p = jnp.exp(s - lse)                       # (n, n)
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                      # (n, n) — also d_bias
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    drh = jax.lax.dot_general(
        ds, _h_selector(0, gh, n, gw),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    drw = jax.lax.dot_general(
        ds, _w_selector(n, gw), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    drh_ref[0] = drh.astype(drh_ref.dtype)
    drw_ref[0] = drw.astype(drw_ref.dtype)


def _bwd_fused_kernel_paired(qs_ref, k_ref, v_ref, do_ref, lse_ref,
                             delta_ref, rh_ref, rw_ref, dq_ref, dk_ref,
                             dv_ref, drh_ref, drw_ref, *, gw: int, d: int):
    """Pair-packed twin of :func:`_bwd_fused_kernel` (window-sized N).

    Same identities on the sublane-stacked (2n, n) score matrix; the dk/dv
    row contractions against the lane-masked stacked operands land each
    head's gradient on its own lane half (exact — masked rows contribute
    zero off their half), so both emerge pair-packed from single matmuls."""
    q = qs_ref[0].astype(jnp.float32)            # (n, 2d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    n, d2 = q.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, d2), 1)
    qc = jnp.concatenate([jnp.where(lane < d, q, 0),
                          jnp.where(lane >= d, q, 0)], axis=0)
    doc = jnp.concatenate([jnp.where(lane < d, do, 0),
                           jnp.where(lane >= d, do, 0)], axis=0)
    lse = jnp.concatenate([lse_ref[0, 0][:, 0:1], lse_ref[0, 1][:, 0:1]],
                          axis=0)                # (2n, 1)
    delta = jnp.concatenate([delta_ref[0, 0][:, 0:1],
                             delta_ref[0, 1][:, 0:1]], axis=0)
    rh0 = rh_ref[0, 0].astype(jnp.float32)
    rh1 = rh_ref[0, 1].astype(jnp.float32)
    rw0 = rw_ref[0, 0].astype(jnp.float32)
    rw1 = rw_ref[0, 1].astype(jnp.float32)
    gh = rh0.shape[1]

    s = jax.lax.dot_general(
        qc, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (2n, n)
    s = s + jnp.concatenate(
        [_bias_tile(rh0, rw0, 0, n, gw, n // gw),
         _bias_tile(rh1, rw1, 0, n, gw, n // gw)], axis=0)
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(
        p, doc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (n, 2d) pair-packed
    dp = jax.lax.dot_general(
        doc, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (2n, n)
    ds = p * (dp - delta)
    dqf = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (2n, 2d)
    dk = jax.lax.dot_general(
        ds, qc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (n, 2d) pair-packed
    drh = jax.lax.dot_general(
        ds, _h_selector(0, gh, n, gw),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (2n, gh)
    drw = jax.lax.dot_general(
        ds, _w_selector(n, gw), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (2n, gw)
    dq_ref[0] = jnp.where(lane < d, dqf[:n], dqf[n:]).astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    drh_ref[0, 0] = drh[:n].astype(drh_ref.dtype)
    drh_ref[0, 1] = drh[n:].astype(drh_ref.dtype)
    drw_ref[0, 0] = drw[:n].astype(drw_ref.dtype)
    drw_ref[0, 1] = drw[n:].astype(drw_ref.dtype)


def _bwd_dq_kernel_paired(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                          rh_ref, rw_ref, dq_ref, drh_ref, drw_ref, *,
                          block_k: int, gw: int, d: int):
    q = q_ref[0].astype(jnp.float32)             # (bq, 2d)
    do = do_ref[0].astype(jnp.float32)
    bq, d2 = q.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, d2), 1)
    qc = jnp.concatenate([jnp.where(lane < d, q, 0),
                          jnp.where(lane >= d, q, 0)], axis=0)
    doc = jnp.concatenate([jnp.where(lane < d, do, 0),
                           jnp.where(lane >= d, do, 0)], axis=0)
    lse = jnp.concatenate([lse_ref[0, 0][:, 0:1], lse_ref[0, 1][:, 0:1]],
                          axis=0)
    delta = jnp.concatenate([delta_ref[0, 0][:, 0:1],
                             delta_ref[0, 1][:, 0:1]], axis=0)
    rh0 = rh_ref[0, 0].astype(jnp.float32)
    rh1 = rh_ref[0, 1].astype(jnp.float32)
    rw0 = rw_ref[0, 0].astype(jnp.float32)
    rw1 = rw_ref[0, 1].astype(jnp.float32)
    gh = rh0.shape[1]
    n = k_ref.shape[1]
    rows_per_block = block_k // gw
    wsel = _w_selector(block_k, gw)

    def body(j, carry):
        dq, drh, drw = carry
        kj = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vj = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qc, kj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jnp.concatenate(
            [_bias_tile(rh0, rw0, j, block_k, gw, rows_per_block),
             _bias_tile(rh1, rw1, j, block_k, gw, rows_per_block)], axis=0)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            doc, vj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                    # (2bq, block_k)
        dq = dq + jax.lax.dot_general(
            ds, kj, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = _h_selector(j, gh, block_k, gw)
        drh = drh + jax.lax.dot_general(
            ds, sel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        drw = drw + jax.lax.dot_general(
            ds, wsel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq, drh, drw

    dq0 = jnp.zeros((2 * bq, d2), jnp.float32)
    drh0 = jnp.zeros((2 * bq, gh), jnp.float32)
    drw0 = jnp.zeros((2 * bq, gw), jnp.float32)
    dq, drh, drw = jax.lax.fori_loop(0, n // block_k, body,
                                     (dq0, drh0, drw0))
    dq_ref[0] = jnp.where(lane < d, dq[:bq], dq[bq:]).astype(dq_ref.dtype)
    drh_ref[0, 0] = drh[:bq].astype(drh_ref.dtype)
    drh_ref[0, 1] = drh[bq:].astype(drh_ref.dtype)
    drw_ref[0, 0] = drw[:bq].astype(drw_ref.dtype)
    drw_ref[0, 1] = drw[bq:].astype(drw_ref.dtype)


def _bwd_dkv_kernel_paired(q_ref, do_ref, lse_ref, delta_ref, rh_ref, rw_ref,
                           k_ref, v_ref, dk_ref, dv_ref, *, block_q: int,
                           gw: int, d: int):
    k = k_ref[0].astype(jnp.float32)             # (block_k, 2d)
    v = v_ref[0].astype(jnp.float32)
    n = q_ref.shape[1]
    block_k, d2 = k.shape
    gh = rh_ref.shape[-1]
    rows_per_block = block_k // gw
    j = pl.program_id(1)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (block_q, d2), 1)

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        doi = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        qc = jnp.concatenate([jnp.where(lane_q < d, qi, 0),
                              jnp.where(lane_q >= d, qi, 0)], axis=0)
        doc = jnp.concatenate([jnp.where(lane_q < d, doi, 0),
                               jnp.where(lane_q >= d, doi, 0)], axis=0)
        lse = jnp.concatenate(
            [lse_ref[0, 0, pl.ds(i * block_q, block_q), 0:1],
             lse_ref[0, 1, pl.ds(i * block_q, block_q), 0:1]], axis=0)
        delta = jnp.concatenate(
            [delta_ref[0, 0, pl.ds(i * block_q, block_q), 0:1],
             delta_ref[0, 1, pl.ds(i * block_q, block_q), 0:1]], axis=0)
        rh0 = rh_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        rh1 = rh_ref[0, 1, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        rw0 = rw_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        rw1 = rw_ref[0, 1, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qc, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jnp.concatenate(
            [_bias_tile(rh0, rw0, j, block_k, gw, rows_per_block),
             _bias_tile(rh1, rw1, j, block_k, gw, rows_per_block)], axis=0)
        p = jnp.exp(s - lse)
        dv_new = dv + jax.lax.dot_general(
            p, doc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doc, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, qc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    zeros = jnp.zeros((block_k, d2), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n // block_q, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, rh_ref,
                   rw_ref, dq_ref, drh_ref, drw_ref, *, block_k: int, gw: int):
    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    rh = rh_ref[0].astype(jnp.float32)
    rw = rw_ref[0].astype(jnp.float32)
    gh = rh.shape[1]
    n = k_ref.shape[1]
    bq, d = q.shape
    rows_per_block = block_k // gw
    wsel = _w_selector(block_k, gw)

    def body(j, carry):
        dq, drh, drw = carry
        kj = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vj = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + _bias_tile(rh, rw, j, block_k, gw, rows_per_block)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, vj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                  # (bq, block_k) — also d_bias
        dq = dq + jax.lax.dot_general(
            ds, kj, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = _h_selector(j, gh, block_k, gw)
        drh = drh + jax.lax.dot_general(
            ds, sel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        drw = drw + jax.lax.dot_general(
            ds, wsel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq, drh, drw

    dq0 = jnp.zeros((bq, d), jnp.float32)
    drh0 = jnp.zeros((bq, gh), jnp.float32)
    drw0 = jnp.zeros((bq, gw), jnp.float32)
    dq, drh, drw = jax.lax.fori_loop(0, n // block_k, body, (dq0, drh0, drw0))
    dq_ref[0] = dq.astype(dq_ref.dtype)
    drh_ref[0] = drh.astype(drh_ref.dtype)
    drw_ref[0] = drw.astype(drw_ref.dtype)


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, rh_ref, rw_ref, k_ref,
                    v_ref, dk_ref, dv_ref, *, block_q: int, gw: int):
    k = k_ref[0].astype(jnp.float32)           # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    n = q_ref.shape[1]
    block_k = k.shape[0]
    rows_per_block = block_k // gw
    j = pl.program_id(1)

    def body(i, carry):
        dk, dv = carry
        qi = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        doi = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0:1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0:1]
        rhi = rh_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        rwi = rw_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qi, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + _bias_tile(rhi, rwi, j, block_k, gw, rows_per_block)
        p = jnp.exp(s - lse)
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
    dk, dv = jax.lax.fori_loop(0, n // block_q, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _relpos_backward_call(qs, k, v, rh, rw, out, lse, do, gw, block_q,
                          block_k, interpret):
    b, n, d = qs.shape
    gh = rh.shape[-1]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (b, n, LANES))

    if block_q == block_k == n:
        # Window-sized N (SAM windowed blocks: N = 196): single fused pass,
        # one program per batch row (see _bwd_fused_kernel).
        full = pl.BlockSpec((1, n, d), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
        full_vec = pl.BlockSpec((1, n, LANES), lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM)
        full_rh = pl.BlockSpec((1, n, gh), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)
        full_rw = pl.BlockSpec((1, n, gw), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)
        dq, dk, dv, drh, drw = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, gw=gw),
            grid=(b,),
            in_specs=[full, full, full, full, full_vec, full_vec, full_rh,
                      full_rw],
            out_specs=[full, full, full, full_rh, full_rw],
            out_shape=[jax.ShapeDtypeStruct((b, n, d), qs.dtype),
                       jax.ShapeDtypeStruct((b, n, d), k.dtype),
                       jax.ShapeDtypeStruct((b, n, d), v.dtype),
                       jax.ShapeDtypeStruct((b, n, gh), rh.dtype),
                       jax.ShapeDtypeStruct((b, n, gw), rw.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=10 * b * n * n * d,
                bytes_accessed=9 * b * n * d * qs.dtype.itemsize,
                transcendentals=b * n * n,
            ),
        )(qs, k, v, do, lse, delta, rh, rw)
        return dq, dk, dv, drh, drw

    full = pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    full_vec = pl.BlockSpec((1, n, LANES), lambda bi, i: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    full_rh = pl.BlockSpec((1, n, gh), lambda bi, i: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    full_rw = pl.BlockSpec((1, n, gw), lambda bi, i: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_q = pl.BlockSpec((1, block_q, d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
    blk_q_vec = pl.BlockSpec((1, block_q, LANES), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM)
    blk_q_rh = pl.BlockSpec((1, block_q, gh), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    blk_q_rw = pl.BlockSpec((1, block_q, gw), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)

    dq, drh, drw = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, gw=gw),
        grid=(b, n // block_q),
        in_specs=[full, full, blk_q, blk_q, blk_q_vec, blk_q_vec, blk_q_rh,
                  blk_q_rw],
        out_specs=[blk_q, blk_q_rh, blk_q_rw],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), qs.dtype),
                   jax.ShapeDtypeStruct((b, n, gh), rh.dtype),
                   jax.ShapeDtypeStruct((b, n, gw), rw.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * n * d,
            bytes_accessed=5 * b * n * d * qs.dtype.itemsize,
            transcendentals=b * n * n,
        ),
    )(k, v, qs, do, lse, delta, rh, rw)

    blk_k = pl.BlockSpec((1, block_k, d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, gw=gw),
        grid=(b, n // block_k),
        in_specs=[full, full, full_vec, full_vec, full_rh, full_rw, blk_k,
                  blk_k],
        out_specs=[blk_k, blk_k],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), k.dtype),
                   jax.ShapeDtypeStruct((b, n, d), v.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=7 * b * n * n * d,
            bytes_accessed=5 * b * n * d * qs.dtype.itemsize,
            transcendentals=b * n * n,
        ),
    )(qs, do, lse, delta, rh, rw, k, v)
    return dq, dk, dv, drh, drw


def _relpos_backward_call_paired(qs, k, v, rh2, rw2, out, lse2, do, gw,
                                 block_q, block_k, interpret):
    b2, n, d2 = qs.shape
    d = d2 // 2
    gh = rh2.shape[-1]
    prod = do.astype(jnp.float32) * out.astype(jnp.float32)
    delta2 = jnp.stack([prod[..., :d].sum(-1), prod[..., d:].sum(-1)],
                       axis=1)                    # (b2, 2, n)
    delta2 = jnp.broadcast_to(delta2[..., None], (b2, 2, n, LANES))

    def slot(last):
        return pl.BlockSpec((1, 2, n, last), lambda *ix: (ix[0], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    if block_q == block_k == n:
        full = pl.BlockSpec((1, n, d2), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
        dq, dk, dv, drh2, drw2 = pl.pallas_call(
            functools.partial(_bwd_fused_kernel_paired, gw=gw, d=d),
            grid=(b2,),
            in_specs=[full, full, full, full, slot(LANES), slot(LANES),
                      slot(gh), slot(gw)],
            out_specs=[full, full, full, slot(gh), slot(gw)],
            out_shape=[jax.ShapeDtypeStruct((b2, n, d2), qs.dtype),
                       jax.ShapeDtypeStruct((b2, n, d2), k.dtype),
                       jax.ShapeDtypeStruct((b2, n, d2), v.dtype),
                       jax.ShapeDtypeStruct((b2, 2, n, gh), rh2.dtype),
                       jax.ShapeDtypeStruct((b2, 2, n, gw), rw2.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=10 * b2 * n * n * d2,
                bytes_accessed=9 * b2 * n * d2 * qs.dtype.itemsize,
                transcendentals=2 * b2 * n * n,
            ),
        )(qs, k, v, do, lse2, delta2, rh2, rw2)
        return dq, dk, dv, drh2, drw2

    # The paired layout doubles every block's lane width; at the SAM global
    # shape (N=4096, 512-wide blocks) the streaming dq kernel's Mosaic
    # stack temporaries exceed XLA:TPU's 16 MB scoped-vmem limit (measured
    # round 4: 16.66 MB on hardware via exp_stacked.py, reproduced by the
    # deviceless whole-encoder AOT probe). Halve the backward blocks to
    # 256: compiles with margin and satisfies gw | block_k and
    # n % block_q == 0 for every dispatched shape today (gw <= 64). If a
    # caller ever passes a grid wider than the clamp (gw > 256 is admitted
    # by image_encoder's 512 % w check), the clamped block_k would break
    # the bias-tiling invariant (rows_per_block = block_k // gw = 0 and
    # silently wrong rel-pos gradients) — keep the caller's blocks in that
    # case (a VMEM compile failure is loud; wrong gradients are not) and
    # re-assert the invariants against the values actually used.
    bq, bk = min(block_q, 256), min(block_k, 256)
    if bk % gw == 0 and n % bq == 0:
        block_q, block_k = bq, bk
    assert block_k % gw == 0 and n % block_q == 0 and n % block_k == 0

    full = pl.BlockSpec((1, n, d2), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    blk_q = pl.BlockSpec((1, block_q, d2), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)

    def blk_slot(last):
        return pl.BlockSpec((1, 2, block_q, last),
                            lambda bi, i: (bi, 0, i, 0),
                            memory_space=pltpu.VMEM)

    def full_slot(last):
        return pl.BlockSpec((1, 2, n, last), lambda bi, i: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dq, drh2, drw2 = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_paired, block_k=block_k, gw=gw,
                          d=d),
        grid=(b2, n // block_q),
        in_specs=[full, full, blk_q, blk_q, blk_slot(LANES), blk_slot(LANES),
                  blk_slot(gh), blk_slot(gw)],
        out_specs=[blk_q, blk_slot(gh), blk_slot(gw)],
        out_shape=[jax.ShapeDtypeStruct((b2, n, d2), qs.dtype),
                   jax.ShapeDtypeStruct((b2, 2, n, gh), rh2.dtype),
                   jax.ShapeDtypeStruct((b2, 2, n, gw), rw2.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b2 * n * n * d2,
            bytes_accessed=5 * b2 * n * d2 * qs.dtype.itemsize,
            transcendentals=2 * b2 * n * n,
        ),
    )(k, v, qs, do, lse2, delta2, rh2, rw2)

    blk_k = pl.BlockSpec((1, block_k, d2), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_paired, block_q=block_q, gw=gw,
                          d=d),
        grid=(b2, n // block_k),
        in_specs=[full, full, full_slot(LANES), full_slot(LANES),
                  full_slot(gh), full_slot(gw), blk_k, blk_k],
        out_specs=[blk_k, blk_k],
        out_shape=[jax.ShapeDtypeStruct((b2, n, d2), k.dtype),
                   jax.ShapeDtypeStruct((b2, n, d2), v.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=7 * b2 * n * n * d2,
            bytes_accessed=5 * b2 * n * d2 * qs.dtype.itemsize,
            transcendentals=2 * b2 * n * n,
        ),
    )(qs, do, lse2, delta2, rh2, rw2, k, v)
    return dq, dk, dv, drh2, drw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _relpos_core_paired(qs, k, v, rh2, rw2, gw, block_q, block_k, interpret):
    out, _ = _relpos_forward_call_paired(qs, k, v, rh2, rw2, gw, block_q,
                                         block_k, interpret)
    return out


def _relpos_core_paired_fwd(qs, k, v, rh2, rw2, gw, block_q, block_k,
                            interpret):
    out, lse2 = _relpos_forward_call_paired(qs, k, v, rh2, rw2, gw, block_q,
                                            block_k, interpret)
    return out, (qs, k, v, rh2, rw2, out, lse2)


def _relpos_core_paired_bwd(gw, block_q, block_k, interpret, res, do):
    qs, k, v, rh2, rw2, out, lse2 = res
    return _relpos_backward_call_paired(qs, k, v, rh2, rw2, out, lse2, do,
                                        gw, block_q, block_k, interpret)


_relpos_core_paired.defvjp(_relpos_core_paired_fwd, _relpos_core_paired_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _relpos_core(qs, k, v, rh, rw, gw, block_q, block_k, interpret):
    out, _ = _relpos_forward_call(qs, k, v, rh, rw, gw, block_q, block_k,
                                  interpret)
    return out


def _relpos_core_fwd(qs, k, v, rh, rw, gw, block_q, block_k, interpret):
    out, lse = _relpos_forward_call(qs, k, v, rh, rw, gw, block_q, block_k,
                                    interpret)
    return out, (qs, k, v, rh, rw, out, lse)


def _relpos_core_bwd(gw, block_q, block_k, interpret, res, do):
    qs, k, v, rh, rw, out, lse = res
    return _relpos_backward_call(qs, k, v, rh, rw, out, lse, do, gw, block_q,
                                 block_k, interpret)


_relpos_core.defvjp(_relpos_core_fwd, _relpos_core_bwd)


@functools.partial(jax.jit, static_argnames=("grid_size", "scale", "block_q",
                                             "block_k", "interpret",
                                             "paired"))
def _flash_attention_relpos_jit(q, k, v, rel_h_term, rel_w_term, *, grid_size,
                                scale: float, block_q: int, block_k: int,
                                interpret: bool, paired: bool):
    gh, gw = grid_size
    b, n, d = q.shape
    assert n == gh * gw and n % block_k == 0 and n % block_q == 0
    assert block_k % gw == 0

    # The q scaling lives outside the custom-VJP core so autodiff chains it.
    qs = q * jnp.asarray(scale, q.dtype)
    if paired:
        # Head-pair lane packing: pack/unpack are plain reshapes outside the
        # custom-VJP core, so autodiff chains them around the paired kernels.
        rh2 = rel_h_term.reshape(b // 2, 2, n, gh)
        rw2 = rel_w_term.reshape(b // 2, 2, n, gw)
        out2 = _relpos_core_paired(_pack_pairs(qs), _pack_pairs(k),
                                   _pack_pairs(v), rh2, rw2, gw, block_q,
                                   block_k, interpret)
        return _unpack_pairs(out2)
    return _relpos_core(qs, k, v, rel_h_term, rel_w_term, gw, block_q,
                        block_k, interpret)


def flash_attention_relpos(q, k, v, rel_h_term, rel_w_term, *, grid_size,
                           scale: float, block_q: int = 512,
                           block_k: int = 512, interpret: bool = False):
    """q, k, v: (B, N, D) with N = gh*gw; rel terms (B, N, gh)/(B, N, gw);
    bias applied to *unscaled-q* scores exactly like add_decomposed_rel_pos
    (callers pre-scale q and the rel terms consistently). Differentiable:
    custom VJP with Pallas backward kernels (incl. rel-term gradients).

    The TFIMM_TPU_RELPOS_PAIRED toggle is resolved HERE, outside the jit,
    and passed as a static argument: an env read inside the jitted body is
    baked into the first trace and silently ignores later in-process
    toggles (which made compile_probe's and the lowering tests' paired
    passes no-ops against the cached unpaired trace)."""
    b, _, d = q.shape
    paired = _paired_enabled() and b % 2 == 0 and 2 * d == LANES
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch(f"flash_attention_relpos[{'paired' if paired else 'perhead'}]")
    return _flash_attention_relpos_jit(
        q, k, v, rel_h_term, rel_w_term, grid_size=tuple(grid_size),
        scale=scale, block_q=block_q, block_k=block_k, interpret=interpret,
        paired=paired)
