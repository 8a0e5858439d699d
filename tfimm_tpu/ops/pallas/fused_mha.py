"""Fused multi-head attention kernel for short-sequence ViT-style models.

Consumes the PACKED qkv projection output (B, N, 3*D) — timm layout, last dim
ordered (3, H, d) — and emits (B, N, D) with heads already re-concatenated.
Compared to the unfused path this removes (a) the (B,N,3,H,d)->(3,B,H,N,d)
and (B,H,N,d)->(B,N,D) transposes and (b) the HBM round-trip of the
(B, H, N, N) score tensor. Measured on v5e, ViT-B/16 shapes (B128 N197 d64):
0.77 ms vs 1.17 ms for XLA from the same packed input (1.5x), with
bit-identical f32 numerics vs the reference einsum formulation.

Kernel strategy ("masked pairs"): one grid program per batch row holds that
row's full qkv block in VMEM and loops over head PAIRS (2*d = 128 lanes).
For a pair packed as lanes [h0 | h1]:

    s_h0 = q_pair @ (k_pair * mask_lo)^T      # full 128-lane contraction
    s_h1 = q_pair @ (k_pair * mask_hi)^T
    out  = softmax(s_h0) @ (v_pair * mask_lo)
         + softmax(s_h1) @ (v_pair * mask_hi)

The lane masks zero the cross-head terms, so every matmul runs the MXU at
full 128 contraction width and no sub-128-lane slicing (vector relayouts)
ever happens; FLOP count equals what the MXU would spend padding d=64->128
anyway. Scores/softmax stay in float32; N is left unpadded (block dim ==
array dim is allowed, and softmax over the exact N lanes needs no masking).

Differentiable: a custom VJP pairs the forward with a Pallas backward
kernel (softmax recomputed, standard flash trade), so the dispatcher serves
training as well as inference. Reference for the role (not the design):
tfimm/architectures/vit.py:122-172 attention math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import softmax_nomax as _softmax_nomax
from tfimm_tpu.ops.pallas.dispatch import softmax_clamp_grad_mask as _grad_mask
from tfimm_tpu.ops.pallas.dispatch import log_dispatch as _log_dispatch

__all__ = ["fused_mha", "fused_mha_or_none"]


def _stacked_default() -> bool:
    """Default-on sublane-stacked pair bodies (see _pair_attention_stacked).

    Same FLOPs, half the matmul instructions per pair — attacks the per-pair
    MXU-pipeline serialization identified by the published roofline
    decomposition (results/README.md). Measured on v5e (bs128/64 bf16,
    results/stacked_experiment.csv): ViT-B inference 4517 -> 4621 img/s
    (+2.3%), backprop 1256 -> 1290 (+2.7%). TFIMM_TPU_MHA_STACKED=0 restores
    the per-pair bodies.
    """
    return os.environ.get("TFIMM_TPU_MHA_STACKED", "1") == "1"

# VMEM budget for one program: 4 blocks of (N, 3D|D) in the io dtype plus two
# f32 score matrices. Keep well under the ~16 MB/core VMEM.
_VMEM_LIMIT_BYTES = 12 * 2 ** 20


def _pair_attention(qp, kp, vp, scale):
    """qp/kp/vp: (N, 128) — two heads side by side. Returns (N, 128) f32."""
    n = qp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    out = None
    qf = qp.astype(jnp.float32) * scale
    for sel in (lane < 64, lane >= 64):
        km = jnp.where(sel, kp, 0)
        vm = jnp.where(sel, vp, 0)
        s = jax.lax.dot_general(
            qf, km.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = _softmax_nomax(s)
        o = jax.lax.dot_general(
            p.astype(vm.dtype), vm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
    return out


def _sublane_pad(n: int) -> int:
    """Rows per stacked half: next multiple of 8 (f32 sublane tile)."""
    return -(-n // 8) * 8


def _stack_masked(x0, x1, n8):
    """[x0; x1] along rows, each zero-padded to n8 rows (aligned halves)."""
    pad = n8 - x0.shape[0]
    if pad:
        cfg = ((0, pad), (0, 0))
        x0, x1 = jnp.pad(x0, cfg), jnp.pad(x1, cfg)
    return jnp.concatenate([x0, x1], axis=0)


def _pair_attention_stacked(qp, kp, vp, scale):
    """Sublane-stacked form of :func:`_pair_attention` — identical math,
    HALF the matmul instructions. The lane mask on the score contraction
    can sit on either operand (q @ (k*m)^T == (q*m) @ k^T), so both
    halves' scores become ONE matmul of the stacked masked queries
    [q*m_lo; q*m_hi] against unmasked k^T, the softmax runs uniformly over
    the stacked (2*n8, N) block, and ONE unmasked P @ v matmul yields both
    halves' outputs — each valid on its own 64 lanes, recombined with an
    elementwise lane select (no add, the halves own disjoint lanes).
    Halves are zero-padded to a sublane multiple so the final row slices
    stay aligned (pad rows contract against zeros or get sliced off).
    """
    n = qp.shape[0]
    n8 = _sublane_pad(n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    m0 = lane < 64
    qf = qp.astype(jnp.float32) * scale
    qc = _stack_masked(jnp.where(m0, qf, 0), jnp.where(m0, 0, qf), n8)
    s = jax.lax.dot_general(
        qc, kp.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = _softmax_nomax(s)
    o = jax.lax.dot_general(
        p.astype(vp.dtype), vp,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.where(m0, o[:n], o[n8:n8 + n])


def fused_mha(qkv, nb_heads: int, scale: float, interpret: bool = False,
              stacked: bool | None = None):
    """qkv: (B, N, 3*D), last dim layout (3, H, d). Returns (B, N, D)."""
    b, n, three_d = qkv.shape
    dim = three_d // 3
    d = dim // nb_heads
    if 2 * d != 128 or nb_heads % 2:
        raise ValueError(f"fused_mha requires head pairs of 128 lanes, got "
                         f"d={d}, nb_heads={nb_heads}")
    n_pairs = nb_heads // 2
    grid = (b,)
    if stacked is None:
        # Degrade per shape: when the stacked body's doubled score block
        # would bust VMEM (e.g. patch8 ViT, N=785), fall back to the
        # unstacked pair body instead of losing the kernel entirely.
        stacked = (_stacked_default()
                   and _fwd_kernel_fits(n, dim, jnp.dtype(qkv.dtype).itemsize,
                                        stacked=True))
    _log_dispatch(f"fused_mha[{'stacked' if stacked else 'pair'}]")
    pair_fn = _pair_attention_stacked if stacked else _pair_attention

    def spec(part):
        return pl.BlockSpec(
            (1, n, dim), lambda i, part=part: (i, 0, part),
            memory_space=pltpu.VMEM,
        )

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for pp in range(n_pairs):
            sl = slice(pp * 128, (pp + 1) * 128)
            o_ref[0, :, sl] = pair_fn(
                q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], scale
            ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec(
            (1, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _pair_attention_bwd(qp, kp, vp, gp, scale):
    """Backward for one head pair. Recomputes the softmax (standard
    flash-attention trade: N is short, so recompute beats storing p).

    Returns (dq_pair, dk_pair, dv_pair), each (N, 128) f32.
    """
    n = qp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    qf = qp.astype(jnp.float32) * scale
    dq = dk = dv = None
    for sel in (lane < 64, lane >= 64):
        km = jnp.where(sel, kp, 0).astype(jnp.float32)
        vm = jnp.where(sel, vp, 0).astype(jnp.float32)
        gm = jnp.where(sel, gp, 0).astype(jnp.float32)
        qm = jnp.where(sel, qp, 0).astype(jnp.float32)
        s = jax.lax.dot_general(qf, km,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = _softmax_nomax(s)
        # dv_h = p^T @ g_h   (lanes outside head h are zero in gm)
        dv_h = jax.lax.dot_general(p, gm,
                                   dimension_numbers=(((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        # dp_h = g_h @ v_h^T (both masked -> only head-h lanes contribute)
        dp = jax.lax.dot_general(gm, vm,
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = _grad_mask(s, p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)))
        dq_h = scale * jax.lax.dot_general(
            ds, km, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_h = scale * jax.lax.dot_general(
            ds, qm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq = dq_h if dq is None else dq + dq_h
        dk = dk_h if dk is None else dk + dk_h
        dv = dv_h if dv is None else dv + dv_h
    return dq, dk, dv


def _pair_attention_bwd_stacked(qp, kp, vp, gp, scale):
    """Sublane-stacked form of :func:`_pair_attention_bwd` — identical math,
    5 matmuls instead of 10. Same identity as the stacked forward: the lane
    masks ride the stacked operand of each contraction, so

        s  = [q*m_lo; q*m_hi]*scale @ k^T          (one matmul, both halves)
        dv = p^T-contract [g*m_lo; g*m_hi]          (stacked-row contraction)
        dp = [g*m_lo; g*m_hi] @ v^T
        dq = lane-select of (ds @ k)'s two halves   (mask applied post-hoc)
        dk = ds^T-contract [q*m_lo; q*m_hi]*scale   (scale already in qc)

    Pad rows are exact zeros through ds (dp's pad rows contract g-zeros),
    so the stacked-row contractions for dk/dv need no pad masking.
    """
    n = qp.shape[0]
    n8 = _sublane_pad(n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    m0 = lane < 64
    qf = qp.astype(jnp.float32) * scale
    gf = gp.astype(jnp.float32)
    qc = _stack_masked(jnp.where(m0, qf, 0), jnp.where(m0, 0, qf), n8)
    gc = _stack_masked(jnp.where(m0, gf, 0), jnp.where(m0, 0, gf), n8)
    kf = kp.astype(jnp.float32)
    vf = vp.astype(jnp.float32)
    s = jax.lax.dot_general(qc, kf,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = _softmax_nomax(s)
    dv = jax.lax.dot_general(p, gc,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gc, vf,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = _grad_mask(s, p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)))
    dq_cat = scale * jax.lax.dot_general(
        ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq = jnp.where(m0, dq_cat[:n], dq_cat[n8:n8 + n])
    dk = jax.lax.dot_general(ds, qc,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dq, dk, dv


def _fused_mha_bwd_call(qkv, g, nb_heads, scale, interpret=False,
                        stacked: bool | None = None):
    """dL/dqkv for fused_mha, same packed layout as the input."""
    b, n, three_d = qkv.shape
    dim = three_d // 3
    n_pairs = nb_heads // 2
    if stacked is None:
        stacked = _stacked_default()
    pair_bwd = _pair_attention_bwd_stacked if stacked else _pair_attention_bwd

    def spec(part):
        return pl.BlockSpec((1, n, dim), lambda i, part=part: (i, 0, part),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
        for pp in range(n_pairs):
            sl = slice(pp * 128, (pp + 1) * 128)
            dq, dk, dv = pair_bwd(
                q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl],
                g_ref[0, :, sl], scale,
            )
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)

    out_block = pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec(0), spec(1), spec(2),
                  pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_block, out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((b, n, dim), qkv.dtype)] * 3,
        interpret=interpret,
    )(qkv, qkv, qkv, g)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _reference_mha(qkv, nb_heads, scale):
    """XLA twin of fused_mha (same math incl. the clamped no-max softmax).
    Only used to derive the backward when the Pallas backward's VMEM
    footprint would not fit (see _fused_mha_bwd)."""
    b, n, three_d = qkv.shape
    dim = three_d // 3
    d = dim // nb_heads
    q, k, v = (qkv[..., i * dim:(i + 1) * dim]
               .reshape(b, n, nb_heads, d).transpose(0, 2, 1, 3)
               for i in range(3))
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    p = _softmax_nomax(s)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o.transpose(0, 2, 1, 3).reshape(b, n, dim).astype(qkv.dtype)


def _fwd_kernel_fits(n, dim, itemsize, stacked=False):
    """Forward program: 4 (n, dim) blocks plus two score-sized f32 live
    values (s and p); the stacked pair body doubles the score rows."""
    score_rows = 2 * _sublane_pad(n) if stacked else n
    return 4 * n * dim * itemsize + 2 * score_rows * n * 4 <= _VMEM_LIMIT_BYTES


def _bwd_kernel_fits(n, dim, itemsize, stacked=False):
    """The backward program holds 4 input + 3 output (n, dim) blocks plus
    four (n, n) f32 score-sized intermediates (s, p, dp, ds). The forward
    gate alone let vit_base_patch8_224 (N=785) through and its backward
    blew scoped VMEM by 10 MB (found by the zoo sweep). The stacked pair
    body keeps both halves' score blocks live at once (2*n8 rows), so its
    score term doubles."""
    score_rows = 2 * _sublane_pad(n) if stacked else n
    return 7 * n * dim * itemsize + 4 * score_rows * n * 4 <= _VMEM_LIMIT_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_mha_diff(qkv, nb_heads: int, scale: float, interpret: bool = False):
    """Differentiable fused MHA (custom VJP with a Pallas backward)."""
    return fused_mha(qkv, nb_heads, scale, interpret=interpret)


def _fused_mha_fwd(qkv, nb_heads, scale, interpret):
    return fused_mha(qkv, nb_heads, scale, interpret=interpret), (qkv,)


def _fused_mha_bwd(nb_heads, scale, interpret, res, g):
    (qkv,) = res
    b, n, three_d = qkv.shape
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # Degrade per shape: stacked pair backward -> unstacked pair backward
    # -> XLA twin, whichever is the richest that fits VMEM.
    stacked = (_stacked_default()
               and _bwd_kernel_fits(n, three_d // 3, itemsize, stacked=True))
    if not _bwd_kernel_fits(n, three_d // 3, itemsize, stacked=stacked):
        # Long sequences (e.g. patch8 ViT, N=785): keep the fused forward
        # (its smaller footprint fits) and take the gradient through the
        # XLA twin instead of the Pallas backward.
        _log_dispatch("fused_mha_bwd[xla-twin]")
        _, vjp = jax.vjp(lambda q: _reference_mha(q, nb_heads, scale), qkv)
        return vjp(g)
    _log_dispatch(f"fused_mha_bwd[{'stacked' if stacked else 'pair'}]")
    return (_fused_mha_bwd_call(qkv, g, nb_heads, scale, interpret=interpret,
                                stacked=stacked),)


fused_mha_diff.defvjp(_fused_mha_fwd, _fused_mha_bwd)


from tfimm_tpu.ops.pallas.dispatch import interpret_forced as _interpret_forced
from tfimm_tpu.ops.pallas.dispatch import on_tpu as _on_tpu


def fused_mha_or_none(qkv, nb_heads: int, scale: float):
    """Dispatch: run the fused kernel when it applies, else return None.

    Conditions: TPU backend, head pairs are exactly 128 lanes (d=64, even
    H), and one batch row's working set fits VMEM. Odd head counts were
    tried via a zero-padded 4th head and MEASURED NEGATIVE: vit_tiny
    (3 heads) dropped 28349 -> 23004 img/s inference / 8255 -> 7044
    backprop — the +1/3 score FLOPs and the pad/slice copies outweigh the
    fusion win at C=192, so odd H stays on XLA. Differentiable (custom VJP
    with a Pallas backward kernel), so it serves training as well.
    """
    interpret = _interpret_forced()
    if not (_on_tpu() or interpret):
        return None
    b, n, three_d = qkv.shape
    dim = three_d // 3
    d = dim // nb_heads
    if 2 * d != 128 or nb_heads % 2:
        return None
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # The unstacked footprint is the floor: fused_mha itself downgrades the
    # stacked body per shape, so stacking never costs kernel coverage.
    if not _fwd_kernel_fits(n, dim, itemsize, stacked=False):
        return None
    return fused_mha_diff(qkv, nb_heads, scale, interpret)
