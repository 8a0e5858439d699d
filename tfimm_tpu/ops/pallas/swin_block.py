"""Fused Swin transformer block: LN1 -> windowed MHA -> +res -> LN2 -> MLP
-> +res in ONE Pallas kernel (inference path).

Why: Swin's early stages are HBM-bound, not compute-bound. Measured at
bs128 (scripts/perf/exp_sam_window.py swin probe, slope timing): the
stage-1 block (C=96, 56x56) runs at 7.7% of v5e bf16 peak — its ~94 GFLOP
would take 0.48 ms at peak but costs ~6.3 ms, because every op in the
XLA path round-trips the (128, 3136, 96) activation through HBM (~77 MB
per read). Meanwhile ALL of a stage-1 block's weights are ~110K params
(~0.4 MB) — they trivially fit VMEM. So one kernel that reads the
activation once, keeps every intermediate in VMEM, and writes the output
once is bounded by ~2x77 MB of traffic (~0.2 ms) instead of ~10 round
trips. (Contrast: the ViT-B megablock experiment was a measured NEGATIVE
— that block is compute-bound at 76% peak, so fusion had nothing to win.
scripts/perf/exp_megablock.py.)

Structure per grid program (wb windows of N = window^2 tokens):

    X   = x_ref (wb*N, C)              # windows of the UN-normalized input
    H1  = LN1(X)                       # f32 stats over C lanes
    Q,K,V = H1 @ Wq/k/v + b            # one (wb*N, C) matmul each
    for each window pair: masked-head attention (window_mha's lane-group
        trick) with the pair-packed (H, 2N, 2N) bias [+ shift mask]
    A   = attn @ Wp + bp
    X2  = X + A                        # residual (drop_path = id, inference)
    OUT = X2 + gelu(LN2(X2) @ W1 + b1) @ W2 + b2

All weights are operands with constant index maps, so they stay resident
in VMEM across the (sequential) grid. The relative-position bias and the
shifted-window mask are pre-packed into pair (block-diagonal) form
outside (window_mha._pack_group), matching the kernel's pair iteration.

Training uses the unfused path (gated in swin.py). The kernel itself is
still differentiable: a custom VJP pairs the fused forward with the
backward of a pure-JAX twin (_reference_block), so jax.grad through an
inference-mode forward (saliency, probes) runs at XLA speed instead of
failing on a VJP-less pallas_call.

Reference for the role (not the design): tfimm/architectures/swin.py
SwinTransformerBlock (:214-263 in this repo's port).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import interpret_forced, on_tpu
from tfimm_tpu.ops.window_gather import padded_rows
from tfimm_tpu.ops.pallas.window_mha import (_MAX_UNROLL, _group_attention,
                                             _group_attention_stacked,
                                             _head_groups, _pack_group,
                                             _stacked_enabled)

__all__ = ["swin_block_fused", "swin_block_or_none",
           "swin_block_padded_or_none", "padded_block_applies"]

_VMEM_LIMIT_BYTES = 10 * 2 ** 20


def _layer_norm(x32, gamma, beta, eps=1e-5):
    """One-pass LN over the last axis, f32 in/out (matches ops/norm.py)."""
    mean = x32.mean(axis=-1, keepdims=True)
    mean2 = jnp.square(x32).mean(axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * gamma + beta


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no
    erf/erfc lowering, so the exact-gelu path must build its own."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_policy(x, out_dtype):
    """ops/basic.py _gelu: exact erf for f32, tanh approximation for bf16.
    The exact branch uses the polynomial erf above — jax.nn.gelu's erfc
    formulation does not lower on Mosaic (KernelType.TC)."""
    if out_dtype == jnp.float32:
        return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))
    return jax.nn.gelu(x, approximate=True)


def _pick_wb(bw_pairs: int, nb_heads: int, nb_win_pairs: int,
             has_mask: bool) -> int:
    """Window-pairs per program: bounded unroll, tiles batch and mask."""
    wb = max(1, _MAX_UNROLL // nb_heads)
    while wb > 1 and (bw_pairs % wb or (has_mask and nb_win_pairs % wb)):
        wb -= 1
    return wb


def swin_block_fused(x, params, bias, mask=None, *, nb_heads: int,
                     scale: float, interpret: bool = False,
                     stacked: "bool | None" = None):
    """x: (BW, N, C) window-partitioned tokens (pre-LN). params: dict with
    wq/wk/wv/bq/bk/bv/wp/bp/w1/b1/w2/b2/g1/be1/g2/be2 (all 2D, (1, ...) for
    vectors). bias: (H, N, N); mask: (nW, N, N) or None. Returns (BW, N, C).
    ``stacked=None`` resolves via ``_stacked_enabled``; an explicit False
    forces the per-head group bodies (the VMEM-degrade path).
    """
    bw0, n0, c = x.shape
    d = c // nb_heads
    nb_win = mask.shape[0] if mask is not None else 1
    # Pair windows for the attention loop (the matmuls batch over all rows
    # anyway). Requires even window counts — the dispatcher checks.
    q_dummy = x  # _pack_group packs q/k/v identically; we only need bias/mask
    _, _, _, bias_p, mask_p = _pack_group(q_dummy, q_dummy, q_dummy, bias,
                                          mask, 2)
    bw = bw0 // 2           # pairs
    n2 = 2 * n0
    nb_winp = max(1, nb_win // 2)
    wb = _pick_wb(bw, nb_heads, nb_winp, mask is not None)
    grid = (bw // wb,)
    use_stacked = (_stacked_enabled(n2) if stacked is None
                   else (stacked and n2 % 8 == 0))

    io_spec = pl.BlockSpec((wb, n2, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    x_pairs = x.reshape(bw, n2, c)
    w_names = ["wq", "wk", "wv", "wp", "w1", "w2"]
    v_names = ["bq", "bk", "bv", "bp", "b1", "b2", "g1", "be1", "g2", "be2"]
    operands = [x_pairs]
    in_specs = [io_spec]
    for name in w_names:
        wmat = params[name]
        operands.append(wmat)
        in_specs.append(const(*wmat.shape))
    for name in v_names:
        vec = params[name].astype(jnp.float32)
        operands.append(vec)
        in_specs.append(const(*vec.shape))
    operands.append(bias_p.astype(jnp.float32))
    in_specs.append(const(nb_heads, n2, n2))
    if mask is not None:
        # bf16: the shifted-window mask holds only {0, -100/-1e9}, all exact
        # in bf16, and it is streamed per program — half the HBM traffic.
        operands.append(mask_p.astype(jnp.bfloat16))
        in_specs.append(
            pl.BlockSpec((wb, n2, n2), lambda i: (i % (nb_winp // wb), 0, 0),
                         memory_space=pltpu.VMEM))

    dtype = x.dtype

    def kernel(x_ref, wq, wk, wv, wp, w1, w2, bq, bk, bv, bp, b1, b2,
               g1, be1, g2, be2, b_ref, *rest):
        m_ref, o_ref = (rest if mask is not None else (None,) + rest)
        X = x_ref[...].reshape(wb * n2, c)
        X32 = X.astype(jnp.float32)
        H1 = _layer_norm(X32, g1[0], be1[0]).astype(dtype)

        def dense(h, w, b):
            y = jax.lax.dot_general(
                h, w[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (y + b[0]).astype(dtype)

        Q = dense(H1, wq, bq)
        K = dense(H1, wk, bk)
        V = dense(H1, wv, bv)

        # Attention per window pair x lane group (window_mha's masked-head
        # trick: full-lane contraction, per-head lane masks, bias + mask on
        # the f32 scores in VMEM). The sublane-stacked group body is the
        # default (n2 = 2*52 is 8-aligned at Swin shapes);
        # TFIMM_TPU_WINDOW_STACKED=0 opts out, and the dispatcher forces
        # stacked=False when only the per-head budget fits VMEM.
        group_fn = _group_attention_stacked if use_stacked \
            else _group_attention
        row_blocks = []
        for w in range(wb):
            rows = slice(w * n2, (w + 1) * n2)
            mw = m_ref[w] if m_ref is not None else None
            parts = [
                group_fn(Q[rows, off:off + width],
                         K[rows, off:off + width],
                         V[rows, off:off + width],
                         b_ref, mw, off, d, scale)
                for off, width in _head_groups(c, d)
            ]
            row_blocks.append(
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=1))
        A = (row_blocks[0] if wb == 1
             else jnp.concatenate(row_blocks, axis=0))

        P = dense(A.astype(dtype), wp, bp)
        X2 = (X32 + P.astype(jnp.float32))
        H2 = _layer_norm(X2, g2[0], be2[0]).astype(dtype)
        M1 = jax.lax.dot_general(
            H2, w1[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1[0]
        M1 = _gelu_policy(M1.astype(dtype).astype(jnp.float32), dtype)
        M2 = jax.lax.dot_general(
            M1.astype(dtype), w2[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2[0]
        OUT = (X2 + M2).astype(dtype)
        o_ref[...] = OUT.reshape(wb, n2, c)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((bw, n2, c), dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(bw0, n0, c)


def _fused_gate(bw, n, c, nb_heads, nb_win, has_mask) -> bool:
    """Shape checks shared by every fused-block entry point."""
    if c % nb_heads:
        return False
    d = c // nb_heads
    if d not in (16, 32, 64) or c < d * 2:
        return False
    if bw % 2 or n > 128:
        return False
    if bw % nb_win or (has_mask and nb_win % 2):
        return False
    return True


def _vmem_plan(bw, n, c, hidden, nb_heads, nb_win, has_mask, dtype):
    """(fits, stacked): does a window-pair chunk fit VMEM, and with which
    group body? ``stacked`` is None (auto: the stacked budget fits) or False
    (degrade to the per-head bodies — same recipe as fused_mha — instead of
    dropping the fused kernel)."""
    nb_winp = max(1, nb_win // 2)
    wb = _pick_wb(bw // 2, nb_heads, nb_winp, has_mask)
    itemsize = jnp.dtype(dtype).itemsize
    rows = wb * 2 * n
    vmem = (
        2 * wb * 2 * n * c * itemsize          # x + out blocks
        + rows * c * (4 * itemsize + 8)        # H1,Q,K,V + X2,A f32
        + rows * hidden * 4                    # MLP intermediate f32
        + (c * (3 * c + c + hidden) + hidden * c) * itemsize  # weights
        + nb_heads * 4 * n * n * 4             # packed bias
        + (wb * 4 * n * n * 4 if has_mask else 0)
    )
    stacked = None
    if _stacked_enabled(2 * n):
        # Stacked group bodies keep J = min(128, C)//d score-sized blocks
        # (s/p) live at once instead of one (d = lane-group head width).
        extra = 2 * (min(128, c) // (c // nb_heads)) * 4 * n * n * 4
        if vmem + extra <= _VMEM_LIMIT_BYTES:
            vmem += extra
        else:
            stacked = False
    return vmem <= _VMEM_LIMIT_BYTES, stacked


def _vmem_ok(bw, n, c, hidden, nb_heads, nb_win, has_mask, dtype) -> bool:
    return _vmem_plan(bw, n, c, hidden, nb_heads, nb_win, has_mask, dtype)[0]


def _prep_params(p, c, dt):
    """Split the SwinTransformerBlock param dict into kernel operands.

    Assumes standard LayerNorm params (scale/bias; the kernel bakes in
    eps 1e-5) and the gelu policy — callers gate dispatch on
    ``cfg.norm_layer == "layer_norm" and cfg.act_layer == "gelu"``
    (SwinTransformerBlock.fused_block_ok)."""
    wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
    bqkv = p["attn"]["qkv"].get("bias")
    zeros_c = jnp.zeros((1, c), jnp.float32)
    return {
        "wq": wqkv[:, :c], "wk": wqkv[:, c:2 * c], "wv": wqkv[:, 2 * c:],
        "bq": bqkv[None, :c] if bqkv is not None else zeros_c,
        "bk": bqkv[None, c:2 * c] if bqkv is not None else zeros_c,
        "bv": bqkv[None, 2 * c:] if bqkv is not None else zeros_c,
        "wp": p["attn"]["proj"]["kernel"].astype(dt),
        "bp": p["attn"]["proj"]["bias"][None],
        "w1": p["mlp"]["fc1"]["kernel"].astype(dt),
        "b1": p["mlp"]["fc1"]["bias"][None],
        "w2": p["mlp"]["fc2"]["kernel"].astype(dt),
        "b2": p["mlp"]["fc2"]["bias"][None],
        "g1": p["norm1"]["scale"][None], "be1": p["norm1"]["bias"][None],
        "g2": p["norm2"]["scale"][None], "be2": p["norm2"]["bias"][None],
    }


def _pad_bias_mask(bias, mask, n0, n, nb_heads):
    """Extend (.., n0, n0) bias/mask to n rows: pad key columns get -1e9
    through the bias (so pad tokens never receive attention), pad query
    rows get zeros (their output is garbage and ignored)."""
    bias = jnp.pad(bias, ((0, 0), (0, n - n0), (0, 0)))
    bias = jnp.concatenate(
        [bias[:, :, :n0],
         jnp.full((nb_heads, n, n - n0), -1e9, bias.dtype)], axis=-1)
    if mask is not None:
        mask = jnp.pad(mask, ((0, 0), (0, n - n0), (0, n - n0)))
    return bias, mask


def swin_block_or_none(p, x_windows, bias, mask, *, nb_heads: int,
                       scale: float):
    """Dispatch the fused block kernel if it applies, else None.

    ``p``: the SwinTransformerBlock param dict ({norm1, attn, norm2, mlp}).
    ``x_windows``: (BW, N, C) un-normalized window tokens. Inference-only
    (the caller gates on training); declines off-TPU (unless interpret is
    forced), for head dims outside the lane-group scheme, odd window
    counts (pairing), or when the working set would bust VMEM.
    """
    interpret = interpret_forced()
    if not (on_tpu() or interpret):
        return None
    bw, n, c = x_windows.shape
    nb_win = mask.shape[0] if mask is not None else 1
    if not _fused_gate(bw, n, c, nb_heads, nb_win, mask is not None):
        return None
    # Sublane alignment: pair slices inside the kernel are 2n rows, and any
    # 2n % 8 != 0 forces Mosaic relayouts on every per-pair Q/K/V slice and
    # the output concatenate. Measured (scripts/perf/exp_swin_pad.py, bs128
    # bf16 slope timing): padding 49-token windows to 52 wins 1.47x at
    # C=96 shifted / 1.44x unshifted / 1.35x at C=192; padding further to
    # 64 gains nothing (alignment, not score FLOPs, was the cost). The
    # padded key columns get -1e9 via the bias; padded query rows are
    # garbage and sliced off. With this, fused also beats the unfused path
    # at C=96 UNSHIFTED (4.10 vs ~5.2 ms), which round-1 had gated to XLA.
    n0 = n
    n = padded_rows(n)
    if n != n0:
        x_windows = jnp.pad(x_windows, ((0, 0), (0, n - n0), (0, 0)))
        bias, mask = _pad_bias_mask(bias, mask, n0, n, nb_heads)
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]
    fits, stacked = _vmem_plan(bw, n, c, hidden, nb_heads, nb_win,
                               mask is not None, x_windows.dtype)
    if not fits:
        return None

    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch(f"swin_block[{'stacked' if stacked is None else 'group'}]")
    params = _prep_params(p, c, x_windows.dtype)
    out = swin_block_diff(x_windows, params, bias, mask, nb_heads, scale,
                          interpret, stacked)
    return out[:, :n0, :] if n != n0 else out


def padded_block_applies(bw, n_pad, c, nb_heads, nb_win, has_mask, hidden,
                         dtype) -> bool:
    """Static predicate: would swin_block_padded_or_none take the kernel?

    Lets callers (the stage's window-resident path) verify EVERY block
    qualifies before committing to the padded gather layout."""
    if not (on_tpu() or interpret_forced()):
        return False
    return (_fused_gate(bw, n_pad, c, nb_heads, nb_win, has_mask)
            and _vmem_ok(bw, n_pad, c, hidden, nb_heads, nb_win, has_mask,
                         dtype))


def swin_block_padded_or_none(p, x_padded, bias, mask, *, nb_heads: int,
                              scale: float, n_real: int):
    """Fused block on windows already in the padded gather layout.

    ``x_padded``: (BW, n_pad, C) windows whose rows beyond ``n_real`` are
    pad tokens (any finite values — they are masked out of attention via
    the -1e9 bias columns and their outputs are ignored). ``bias``/``mask``
    are given at the real token count and padded here. The result keeps the
    padded layout (pad rows carry garbage), so a whole stage can stay
    window-resident between single-gather re-windowings (see
    ops/window_gather.py). Returns None when the kernel does not apply —
    the caller must then fall back to the un-padded unfused path.
    """
    bw, n, c = x_padded.shape
    if n != padded_rows(n_real):
        return None
    nb_win = mask.shape[0] if mask is not None else 1
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]
    if not padded_block_applies(bw, n, c, nb_heads, nb_win, mask is not None,
                                hidden, x_padded.dtype):
        return None
    stacked = _vmem_plan(bw, n, c, hidden, nb_heads, nb_win, mask is not None,
                         x_padded.dtype)[1]
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch(
        f"swin_block_padded[{'stacked' if stacked is None else 'group'}]")
    if n != n_real:
        bias, mask = _pad_bias_mask(bias, mask, n_real, n, nb_heads)
    params = _prep_params(p, c, x_padded.dtype)
    return swin_block_diff(x_padded, params, bias, mask, nb_heads, scale,
                           interpret_forced(), stacked)


def _reference_block(x, params, bias, mask, nb_heads, scale):
    """Pure-JAX twin of the fused kernel (same math, XLA ops). Used only to
    derive the backward pass: the custom VJP below runs the kernel forward
    and this function's vjp backward, so jax.grad through an inference
    forward works at XLA speed instead of crashing on a VJP-less kernel."""
    bw, n, c = x.shape
    d = c // nb_heads
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    h1 = _layer_norm(x32, params["g1"][0], params["be1"][0]).astype(dt)

    def dense(h, w, b):
        y = jnp.einsum("bnc,cf->bnf", h, w.astype(dt),
                       preferred_element_type=jnp.float32)
        return (y + b[0]).astype(dt)

    q = dense(h1, params["wq"], params["bq"])
    k = dense(h1, params["wk"], params["bk"])
    v = dense(h1, params["wv"], params["bv"])
    # Attention via the window_mha kernel when it applies — its custom VJP
    # (Pallas backward) keeps gradient workloads at the unfused-path speed
    # (measured: einsum-backward here cost 910 vs 1211 img/s backprop).
    from tfimm_tpu.ops.pallas.window_mha import window_mha_or_none

    a = window_mha_or_none(q, k, v, bias, mask, nb_heads=nb_heads,
                           scale=scale)
    if a is None:
        qh = q.reshape(bw, n, nb_heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(bw, n, nb_heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(bw, n, nb_heads, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh.astype(jnp.float32) * scale,
                       kh.astype(jnp.float32))
        s = s + bias.astype(jnp.float32)[None]
        if mask is not None:
            nb_win = mask.shape[0]
            widx = jnp.arange(bw) % nb_win
            s = s + mask.astype(jnp.float32)[widx][:, None]
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh.astype(jnp.float32))
        a = o.transpose(0, 2, 1, 3).reshape(bw, n, c).astype(dt)
    proj = dense(a.astype(dt), params["wp"], params["bp"])
    x2 = x32 + proj.astype(jnp.float32)
    h2 = _layer_norm(x2, params["g2"][0], params["be2"][0]).astype(dt)
    m1 = jnp.einsum("bnc,cf->bnf", h2, params["w1"].astype(dt),
                    preferred_element_type=jnp.float32) + params["b1"][0]
    m1 = _gelu_policy(m1.astype(dt).astype(jnp.float32), dt)
    m2 = jnp.einsum("bnf,fc->bnc", m1.astype(dt), params["w2"].astype(dt),
                    preferred_element_type=jnp.float32) + params["b2"][0]
    return (x2 + m2).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def swin_block_diff(x, params, bias, mask, nb_heads, scale, interpret,
                    stacked=None):
    return swin_block_fused(x, params, bias, mask, nb_heads=nb_heads,
                            scale=scale, interpret=interpret, stacked=stacked)


def _swin_block_fwd(x, params, bias, mask, nb_heads, scale, interpret,
                    stacked):
    # Under differentiation, run the unfused twin for the PRIMAL too: the
    # fwd/bwd pair then both come from the same XLA+window_mha composition
    # (old-path speed for gradient workloads; measured 1059 vs 1211 img/s
    # backprop when the fused forward ran here and was recomputed anyway).
    out = _reference_block(x, params, bias, mask, nb_heads, scale)
    return out, (x, params, bias, mask)


def _swin_block_bwd(nb_heads, scale, interpret, stacked, res, g):
    x, params, bias, mask = res
    _, vjp = jax.vjp(
        lambda x, p, b, m: _reference_block(x, p, b, m, nb_heads, scale),
        x, params, bias, mask)
    return vjp(g)


swin_block_diff.defvjp(_swin_block_fwd, _swin_block_bwd)
