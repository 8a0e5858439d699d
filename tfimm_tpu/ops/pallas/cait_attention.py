"""Fused talking-head attention kernel for CaiT-style models.

CaiT's main blocks use talking-head attention (reference for the role, not
the design: tfimm/architectures/cait.py:70-101): raw per-head scores are
mixed across the head axis by a learned (H, H) matrix (``proj_l``) before
softmax and by another (``proj_w``) after it. The XLA path materialises the
(B, H, N, N) score tensor in HBM several times (scores -> head mix ->
softmax -> head mix), with a head-axis transpose around each mix — for
cait_s24 at bs128 that is ~150 MB of f32 traffic per round trip per block,
and it is why the model measured ~19% of v5e roofline while its dense
matmuls run at 85%+.

Kernel strategy ("folded head mix"): both mixes are linear, so they fold
into lane scalings of Q and V — no explicit (H, N, N) tensor ever exists:

    s'_g  = (q . w_l~[g]) @ K^T + b_l[g]      # w_l~[g] repeats w_l[h, g]
                                              # over head h's d lanes
    p_g   = softmax(s'_g)
    out   = sum_g p_g @ (v . w_w~[g]) + b_w~ * colsum(v)

Each contraction runs over the FULL D = H*d lanes, so the MXU never sees
the d=48 head width that forces 128-lane padding waste in the per-head
formulation, and one grid program (one batch row) keeps everything — qkv
block, one (N, N) f32 score matrix at a time, the (N, D) f32 output
accumulator — resident in VMEM. The ``b_w~ * colsum(v)`` term is the
post-softmax mix's bias: rows of p sum to 1 pre-mix, so the bias becomes a
rank-1 correction from the column sums of V.

Cost: 2*H*N^2*D MACs per row — H/d * 128 the ideal per-head count, i.e.
the same MXU time a d->128 padded per-head formulation would spend, but
with zero score-tensor HBM traffic and no transposes.

Differentiation: a custom VJP pairs the forward with a Pallas backward
kernel (softmax recomputed per head — the flash trade; mix-matrix
gradients reduce over lane segments via a constant one-hot (D, H) matmul,
so no sub-128-lane slicing). b_l's gradient is identically zero by softmax
shift invariance and is returned as exact zeros.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import (softmax_nomax,
    softmax_clamp_grad_mask, interpret_forced, on_tpu)

__all__ = ["talking_head_attention", "talking_head_attention_or_none"]

_VMEM_LIMIT_BYTES = 10 * 2 ** 20


def _stacked_default() -> bool:
    """Default-on sublane-stacked head bodies (TFIMM_TPU_CAIT_STACKED=0
    opts out, restoring the per-head bodies).

    The published CaiT-S24 backprop decomposition (results/README.md) puts
    the talking-head kernel f+b at 59% of the whole step budget with every
    matmul at 79-91% of peak — the kernel's per-head loop of small-M
    matmuls is the lever. Stacking a chunk of heads' lane-scaled queries
    along sublanes turns the loop into 2 matmuls per chunk forward and 6
    backward (vs 2/5 PER HEAD), same useful FLOPs (+ one PV-recompute
    matmul in the backward for the dww reduction). Default-on; measured on
    v5e (results/stacked_experiment.csv): cait_s24 inference 4860 -> 5279
    img/s (+8.6%), backprop 1190 -> 1346 (+13.1%).
    TFIMM_TPU_CAIT_STACKED=0 restores the per-head bodies.
    """
    return os.environ.get("TFIMM_TPU_CAIT_STACKED", "1") == "1"


def _sublane_pad(n: int) -> int:
    return -(-n // 8) * 8


def _pick_chunk(h, per_block_bytes, persistent_bytes):
    """Largest head-chunk (divisor of H) whose stacked working set fits.

    Returns 0 when even chunk=1 busts the budget — callers must then
    degrade to the unstacked per-head body, whose own gates apply."""
    forced = os.environ.get("TFIMM_TPU_CAIT_STACK_CHUNK")
    if forced:
        return min(int(forced), h)
    for ch in (8, 4, 2, 1):
        if h % ch == 0 and persistent_bytes + ch * per_block_bytes \
                <= _VMEM_LIMIT_BYTES:
            return ch
    return 0


def talking_head_attention(qkv, w_l, b_l, w_w, b_w, *, nb_heads: int,
                           scale: float, interpret: bool = False):
    """Fused talking-head attention from the packed qkv projection.

    Args:
        qkv: (B, N, 3*D), last dim ordered (3, H, d) — the timm layout.
        w_l: (H, H) pre-softmax head-mix kernel (applied as ``s @ w_l``
            with the head axis last, i.e. output head g reads column g).
        b_l: (H,) pre-softmax bias or None.
        w_w: (H, H) post-softmax head-mix kernel.
        b_w: (H,) post-softmax bias or None.
        nb_heads: H.
        scale: 1/sqrt(d) applied to q.

    Returns:
        (B, N, D) attention output, heads re-concatenated, dtype of qkv.
    """
    b, n, three_d = qkv.shape
    dim = three_d // 3
    h = nb_heads
    d = dim // h
    if h * d != dim:
        raise ValueError(f"D={dim} not divisible by nb_heads={h}")

    f32 = jnp.float32
    if b_l is None:
        b_l = jnp.zeros((h,), f32)
    if b_w is None:
        b_w = jnp.zeros((h,), f32)
    # Lane-expanded mix rows: qs[g, h*d+j] = scale * w_l[h, g]
    #                         vs[g, h*d+j] = w_w[g, h]
    qs = jnp.repeat(w_l.astype(f32), d, axis=0).T * scale      # (H, D)
    vs = jnp.repeat(w_w.astype(f32), d, axis=1)                # (H, D)
    # Pre-softmax bias as a (H, N) broadcast tile (2-D VMEM-friendly; the
    # scalar value repeats over the key axis).
    blt = jnp.broadcast_to(b_l.astype(f32)[:, None], (h, n))   # (H, N)
    # Post-softmax bias expanded to lanes: bw_lanes[h*d+j] = b_w[h].
    bwl = jnp.repeat(b_w.astype(f32), d)[None, :]              # (1, D)

    def spec(part):
        return pl.BlockSpec(
            (1, n, dim), lambda i, part=part: (i, 0, part),
            memory_space=pltpu.VMEM,
        )

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, qs_ref, vs_ref, bl_ref, bw_ref, o_ref):
        q = q_ref[0]
        k32 = k_ref[0].astype(f32)
        v = v_ref[0]
        vsum = jnp.sum(v.astype(f32), axis=0, keepdims=True)    # (1, D)
        acc = jnp.broadcast_to(bw_ref[0:1, :] * vsum, (n, dim))
        for g in range(h):
            qg = q.astype(f32) * qs_ref[g:g + 1, :]             # (N, D)
            s = jax.lax.dot_general(
                qg, k32, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) + bl_ref[g:g + 1, :]
            p = softmax_nomax(s).astype(v.dtype)
            vg = (v.astype(f32) * vs_ref[g:g + 1, :]).astype(v.dtype)
            acc = acc + jax.lax.dot_general(
                p, vg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        o_ref[0] = acc.astype(o_ref.dtype)

    np_ = _sublane_pad(n)
    # Stacked working set per chunk-head: qc + o (N', D) f32 and s + p
    # (N', N) f32; persistent: qkv blocks, f32 accumulator, output.
    chunk = _pick_chunk(
        h, np_ * (2 * dim + 2 * n) * 4,
        3 * n * dim * jnp.dtype(qkv.dtype).itemsize + 2 * n * dim * 4)

    def kernel_stacked(q_ref, k_ref, v_ref, qs_ref, vs_ref, bl_ref, bw_ref,
                       o_ref):
        q32 = q_ref[0].astype(f32)
        k32 = k_ref[0].astype(f32)
        v = v_ref[0]
        vsum = jnp.sum(v.astype(f32), axis=0, keepdims=True)    # (1, D)
        acc = jnp.broadcast_to(bw_ref[0:1, :] * vsum, (n, dim))
        # Zero-pad the query rows to the sublane tile so per-head blocks of
        # the stacked score/output matrices start 8-aligned; the padded
        # rows' outputs are never read back.
        qpad = (q32 if np_ == n else jnp.concatenate(
            [q32, jnp.zeros((np_ - n, dim), f32)], axis=0))
        for c0 in range(0, h, chunk):
            gs = list(range(c0, min(c0 + chunk, h)))
            qc = jnp.concatenate(
                [qpad * qs_ref[g:g + 1, :] for g in gs], axis=0)
            s = jax.lax.dot_general(
                qc, k32, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) + jnp.concatenate(
                [jnp.broadcast_to(bl_ref[g:g + 1, :], (np_, n)) for g in gs],
                axis=0)
            p = softmax_nomax(s).astype(v.dtype)
            o = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            for i, g in enumerate(gs):
                acc = acc + vs_ref[g:g + 1, :] * o[i * np_:i * np_ + n]
        o_ref[0] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel_stacked if (_stacked_default() and chunk > 0) else kernel,
        grid=(b,),
        in_specs=[spec(0), spec(1), spec(2),
                  full((h, dim)), full((h, dim)), full((h, n)),
                  full((1, dim))],
        out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, qs, vs, blt, bwl)


def _reference(qkv, w_l, b_l, w_w, b_w, nb_heads, scale):
    """Pure-JAX twin of the XLA talking-head path from packed qkv
    (mirrors architectures/cait.py TalkingHeadAttention sans dropout)."""
    b, n, three_d = qkv.shape
    dim = three_d // 3
    h = nb_heads
    hd = dim // h
    dt = qkv.dtype
    q, k, v = (qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)[i]
               for i in range(3))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, dt), k)
    attn = jnp.einsum("bqkh,hg->bqkg", attn.transpose(0, 2, 3, 1),
                      w_l.astype(dt))
    if b_l is not None:
        attn = attn + b_l.astype(dt)
    attn = jax.nn.softmax(attn.transpose(0, 3, 1, 2).astype(jnp.float32),
                          axis=-1).astype(dt)
    attn = jnp.einsum("bqkh,hg->bqkg", attn.transpose(0, 2, 3, 1),
                      w_w.astype(dt))
    if b_w is not None:
        attn = attn + b_w.astype(dt)
    attn = attn.transpose(0, 3, 1, 2)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, dim)


def _thattn_bwd_call(qkv, w_l, b_l, w_w, b_w, dout, nb_heads, scale,
                     interpret=False):
    """Pallas backward: recompute each head's softmax (flash trade) and
    emit dqkv plus per-row mix-matrix gradients (summed over B outside).

    The mix gradients reduce over lane SEGMENTS (head h's d lanes): that is
    a (1, D) @ (D, H) matmul against a constant one-hot lane->head matrix,
    so no sub-128-lane slicing ever happens.
    """
    b, n, three_d = qkv.shape
    dim = three_d // 3
    h = nb_heads
    d = dim // h
    f32 = jnp.float32

    qs = jnp.repeat(w_l.astype(f32), d, axis=0).T * scale       # (H, D)
    vs = jnp.repeat(w_w.astype(f32), d, axis=1)                 # (H, D)
    blt = jnp.broadcast_to(b_l.astype(f32)[:, None], (h, n))    # (H, N)
    bwl = jnp.repeat(b_w.astype(f32), d)[None, :]               # (1, D)
    onehot = jnp.repeat(jnp.eye(h, dtype=f32), d, axis=0)       # (D, H)

    def spec(part):
        return pl.BlockSpec(
            (1, n, dim), lambda i, part=part: (i, 0, part),
            memory_space=pltpu.VMEM,
        )

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, g_ref, qs_ref, vs_ref, bl_ref, bw_ref,
               oh_ref, dqkv_ref, dl_ref, dw_ref):
        q32 = q_ref[0].astype(f32)
        k32 = k_ref[0].astype(f32)
        v32 = v_ref[0].astype(f32)
        do = g_ref[0].astype(f32)
        oh = oh_ref[...]
        vsum = jnp.sum(v32, axis=0, keepdims=True)              # (1, D)
        docol = jnp.sum(do, axis=0, keepdims=True)              # (1, D)
        qsc = q32 * scale

        # bias-of-proj_w term: out += bwl * vsum (broadcast over rows)
        dv = jnp.broadcast_to(bw_ref[0:1, :] * docol, (n, dim))
        dbw_row = jax.lax.dot_general(
            docol * vsum, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)                          # (1, H)
        dq = jnp.zeros((n, dim), f32)
        dk = jnp.zeros((n, dim), f32)
        dl_rows = []
        dw_rows = []
        for g in range(h):
            ag = qs_ref[g:g + 1, :]
            bg = vs_ref[g:g + 1, :]
            qg = q32 * ag
            s = jax.lax.dot_general(
                qg, k32, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32) + bl_ref[g:g + 1, :]
            p = softmax_nomax(s)
            # PV side
            dvg = jax.lax.dot_general(
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (N, D)
            dv = dv + bg * dvg
            dww_g = jax.lax.dot_general(
                jnp.sum(dvg * v32, axis=0, keepdims=True), oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (1, H)
            dp = jax.lax.dot_general(
                do, v32 * bg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)                      # (N, N)
            ds = softmax_clamp_grad_mask(s, p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)))
            t = jax.lax.dot_general(
                ds, k32, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (N, D)
            dq = dq + ag * t
            dwl_g = jax.lax.dot_general(
                jnp.sum(qsc * t, axis=0, keepdims=True), oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (1, H)
            dk = dk + jax.lax.dot_general(
                ds, qg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (N, D)
            dl_rows.append(
                jnp.concatenate([dwl_g, jnp.zeros((1, 1), f32)], axis=1))
            dw_rows.append(
                jnp.concatenate([dww_g, jnp.zeros((1, 1), f32)], axis=1))
        dl_rows.append(jnp.zeros((1, h + 1), f32))
        dw_rows.append(
            jnp.concatenate([dbw_row, jnp.zeros((1, 1), f32)], axis=1))
        dqkv_ref[0, :, 0:dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, dim:2 * dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * dim:] = dv.astype(dqkv_ref.dtype)
        dl_ref[0] = jnp.concatenate(dl_rows, axis=0)
        dw_ref[0] = jnp.concatenate(dw_rows, axis=0)

    np_ = _sublane_pad(n)
    # Stacked chunk working set: qc/doc/t/o (N', D) f32 + s/p/dp/ds (N', N)
    # f32 per chunk-head; persistent: four f32 input views, three f32
    # accumulators, the packed dqkv output.
    chunk = _pick_chunk(h, np_ * (4 * dim + 4 * n) * 4, 10 * n * dim * 4)

    def kernel_stacked(q_ref, k_ref, v_ref, g_ref, qs_ref, vs_ref, bl_ref,
                       bw_ref, oh_ref, dqkv_ref, dl_ref, dw_ref):
        q32 = q_ref[0].astype(f32)
        k32 = k_ref[0].astype(f32)
        v32 = v_ref[0].astype(f32)
        do = g_ref[0].astype(f32)
        oh = oh_ref[...]
        vsum = jnp.sum(v32, axis=0, keepdims=True)              # (1, D)
        docol = jnp.sum(do, axis=0, keepdims=True)              # (1, D)
        qsc = q32 * scale

        dv = jnp.broadcast_to(bw_ref[0:1, :] * docol, (n, dim))
        dbw_row = jax.lax.dot_general(
            docol * vsum, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)                          # (1, H)
        dq = jnp.zeros((n, dim), f32)
        dk = jnp.zeros((n, dim), f32)
        # Zero rows in the padded q/dout make every padded-row contribution
        # vanish exactly: ds rows are p*(0-0)=0, and the dk/dv stacked-row
        # contractions multiply p's (uniform, nonzero) padded rows by
        # doc's zero rows.
        qpad = (q32 if np_ == n else jnp.concatenate(
            [q32, jnp.zeros((np_ - n, dim), f32)], axis=0))
        dopad = (do if np_ == n else jnp.concatenate(
            [do, jnp.zeros((np_ - n, dim), f32)], axis=0))
        dl_rows = [None] * h
        dw_rows = [None] * h
        for c0 in range(0, h, chunk):
            gs = list(range(c0, min(c0 + chunk, h)))
            qc = jnp.concatenate(
                [qpad * qs_ref[g:g + 1, :] for g in gs], axis=0)
            doc = jnp.concatenate(
                [dopad * vs_ref[g:g + 1, :] for g in gs], axis=0)
            s = jax.lax.dot_general(
                qc, k32, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ) + jnp.concatenate(
                [jnp.broadcast_to(bl_ref[g:g + 1, :], (np_, n)) for g in gs],
                axis=0)
            p = softmax_nomax(s)
            dp = jax.lax.dot_general(
                doc, v32, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)                      # (N', N)
            ds = softmax_clamp_grad_mask(s, p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)))
            t = jax.lax.dot_general(
                ds, k32, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (N', D)
            dk = dk + jax.lax.dot_general(
                ds, qc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dv = dv + jax.lax.dot_general(
                p, doc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            # PV recompute feeds the dww reduction: sum_k dvg*v collapses to
            # sum_i do*(p@v) — one matmul for the whole chunk instead of a
            # per-head (N, N) @ (N, D).
            o = jax.lax.dot_general(
                p, v32, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (N', D)
            for i, g in enumerate(gs):
                tg = t[i * np_:i * np_ + n]
                dq = dq + qs_ref[g:g + 1, :] * tg
                dwl_g = jax.lax.dot_general(
                    jnp.sum(qsc * tg, axis=0, keepdims=True), oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)                  # (1, H)
                dww_g = jax.lax.dot_general(
                    jnp.sum(do * o[i * np_:i * np_ + n], axis=0,
                            keepdims=True), oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)                  # (1, H)
                dl_rows[g] = jnp.concatenate(
                    [dwl_g, jnp.zeros((1, 1), f32)], axis=1)
                dw_rows[g] = jnp.concatenate(
                    [dww_g, jnp.zeros((1, 1), f32)], axis=1)
        dl_rows.append(jnp.zeros((1, h + 1), f32))
        dw_rows.append(
            jnp.concatenate([dbw_row, jnp.zeros((1, 1), f32)], axis=1))
        dqkv_ref[0, :, 0:dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, dim:2 * dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * dim:] = dv.astype(dqkv_ref.dtype)
        dl_ref[0] = jnp.concatenate(dl_rows, axis=0)
        dw_ref[0] = jnp.concatenate(dw_rows, axis=0)

    dqkv, dl, dw = pl.pallas_call(
        kernel_stacked if (_stacked_default() and chunk > 0) else kernel,
        grid=(b,),
        in_specs=[spec(0), spec(1), spec(2),
                  pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  full((h, dim)), full((h, dim)), full((h, n)),
                  full((1, dim)), full((dim, h))],
        out_specs=[pl.BlockSpec((1, n, dim * 3), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, h + 1, h + 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, h + 1, h + 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, n, three_d), qkv.dtype),
                   jax.ShapeDtypeStruct((b, h + 1, h + 1), f32),
                   jax.ShapeDtypeStruct((b, h + 1, h + 1), f32)],
        interpret=interpret,
    )(qkv, qkv, qkv, dout, qs, vs, blt, bwl, onehot)

    dwl = dl[:, :h, :h].sum(axis=0).T.astype(w_l.dtype)
    # b_l shifts every key column of a head's scores equally, and softmax is
    # shift-invariant, so its true gradient is identically zero (autodiff of
    # the unfused path returns the same up to f32 noise).
    dbl = jnp.zeros_like(b_l)
    dww = dw[:, :h, :h].sum(axis=0).astype(w_w.dtype)
    dbw = dw[:, h, :h].sum(axis=0).astype(b_w.dtype)
    return dqkv, dwl, dbl, dww, dbw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def talking_head_diff(qkv, w_l, b_l, w_w, b_w, nb_heads, scale, interpret):
    return talking_head_attention(qkv, w_l, b_l, w_w, b_w,
                                  nb_heads=nb_heads, scale=scale,
                                  interpret=interpret)


def _th_fwd(qkv, w_l, b_l, w_w, b_w, nb_heads, scale, interpret):
    if b_l is None or b_w is None:
        # Rare path (CaiT always has mix biases): fall back to the AD twin
        # so cotangent structure matches the inputs.
        out = _reference(qkv, w_l, b_l, w_w, b_w, nb_heads, scale)
        return out, (qkv, w_l, b_l, w_w, b_w)
    out = talking_head_attention(qkv, w_l, b_l, w_w, b_w, nb_heads=nb_heads,
                                 scale=scale, interpret=interpret)
    return out, (qkv, w_l, b_l, w_w, b_w)


def _th_bwd(nb_heads, scale, interpret, res, g):
    qkv, w_l, b_l, w_w, b_w = res
    b, n, three_d = qkv.shape
    dim = three_d // 3
    # The backward kernel keeps ~10 (n, dim) f32 values plus several (n, n)
    # score matrices live per program; at cait_m36@384 (n=577, dim=768)
    # that is ~30 MB of scoped VMEM and Mosaic refuses the stack
    # allocation. Fall back to autodiff of the XLA twin there — the
    # forward kernel still serves, and training correctness is identical.
    # (The stacked backward body budgets its own per-chunk working set via
    # _pick_chunk and degrades to the unstacked body below when even
    # chunk=1 would not fit, so this gate is the floor for both bodies.)
    bwd_vmem = 10 * n * dim * 4 + 4 * n * n * 4
    if b_l is None or b_w is None or bwd_vmem > _VMEM_LIMIT_BYTES:
        _, vjp = jax.vjp(
            lambda qkv, wl, bl, ww, bw: _reference(qkv, wl, bl, ww, bw,
                                                   nb_heads, scale),
            qkv, w_l, b_l, w_w, b_w)
        return vjp(g)
    return _thattn_bwd_call(qkv, w_l, b_l, w_w, b_w, g, nb_heads, scale,
                            interpret=interpret)


talking_head_diff.defvjp(_th_fwd, _th_bwd)


def talking_head_attention_or_none(qkv, w_l, b_l, w_w, b_w, *,
                                   nb_heads: int, scale: float):
    """Dispatch: fused kernel when it applies, else None (caller falls back).

    Conditions: TPU backend (or forced interpret), one batch row's working
    set fits VMEM. Differentiable via the AD-twin custom VJP.
    """
    interpret = interpret_forced()
    if not (on_tpu() or interpret):
        return None
    b, n, three_d = qkv.shape
    dim = three_d // 3
    if dim % nb_heads:
        return None
    if dim % 128:
        # Mosaic requires the last block dim divisible by the 128-lane width
        # (the (1, N, dim) qkv blocks partition the packed 3*dim axis, so
        # "equal to the array dim" can't hold). cait_xxs* (dim=192) falls
        # back to XLA; cait_s/m (384/768) take the kernel.
        return None
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # qkv blocks + output + f32 accumulator + one f32 score matrix.
    vmem = 4 * n * dim * itemsize + n * dim * 4 + n * n * 4 + 2 * n * dim * 4
    # The 10 MB budget's boundary is MEASURED, not conservative: every
    # registered 577-token @384 CaiT fits it (s24@384 ~5.8 MB, m36@384
    # ~10.2 MB — verified by deviceless HLO diff), and the only shape the
    # round-3 TFIMM_TPU_CAIT_LARGE widened gate (32 MB) would have added —
    # cait_m48_448, 784 tokens, ~14.5 MB by this estimate — FAILS to
    # compile on hardware: XLA:TPU scoped-vmem OOM, 20.54 MB > 16 MB limit
    # (exp_stacked.py, round 4; the hand estimate omits Mosaic's stack
    # temporaries). The toggle is removed; m48@448 takes the XLA path
    # (measured there: 68.2 img/s inference / 23.7 backprop, bs8/4,
    # results/stacked_experiment.csv).
    if vmem > _VMEM_LIMIT_BYTES:
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch("cait_talking_head")
    return talking_head_diff(qkv, w_l, b_l, w_w, b_w, nb_heads, scale,
                             interpret)
