"""Fused windowed multi-head attention with relative-position bias (Swin).

Serves the short-window regime (N = window^2 = 49 or 144, head_dim 32) that
neither flash_attention (long sequences) nor fused_mha (d=64 pairs, no bias)
covers. Swin-T measured 6-24% of v5e peak per block on the XLA path — the
batched (B*nW, H, 49, 49) attention runs d=32-contraction matmuls (MXU 25%
lane occupancy at best) and round-trips the score tensor through HBM
(~470 MB per stage-1 block at bs128). Reference for the role (not the
design): tfimm/architectures/swin.py:111-200 (WindowAttention).

Kernel strategy ("masked heads"): one grid program holds a chunk of Wb
windows' q/k/v (N, C) blocks in VMEM. For head h the key/value lanes outside
[h*d, (h+1)*d) are zeroed, so

    s_h = q @ (k * mask_h)^T        # full-C-lane contraction on the MXU
    out += softmax(s_h + bias_h [+ shift_mask_w]) @ (v * mask_h)

contracts at full lane width (C >= 96) instead of d=32, and scores/softmax
never leave VMEM. The per-head output term is nonzero only on head-h lanes,
so the accumulated sum IS the concatenated multi-head output — no transposes
anywhere. When C is a multiple of 128, heads are processed inside statically
sliced 128-lane groups, which caps the masked-contraction overhead at
128/d regardless of C (stages 3/4 of Swin, C=384/768).

The relative-position bias (H, N, N) is broadcast to every program; the
shifted-window mask (nW, N, N) is indexed by window position within the
image. Both are added to the f32 scores before the in-VMEM softmax.

Adjacent windows are additionally packed g ∈ {2, 4} per matmul
(block-diagonal -1e9 bias between them): the (N, C) matmuls at N=49 are
MXU-weight-load-latency-bound, so g-fold longer M-streams amortize the
load — but the masked cross-window score work grows as g², and measured
g=4 loses to g=2 at Swin shapes, so the default cap is 2
(TFIMM_TPU_WINDOW_PACK overrides).

Differentiable via a custom VJP with a Pallas backward kernel (recomputes
the softmax; emits dq/dk/dv and the per-head score gradient reduced over
windows, which is the bias-table gradient before the index scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import softmax_nomax, softmax_clamp_grad_mask
from tfimm_tpu.ops.window_gather import padded_rows

__all__ = ["window_mha", "window_mha_or_none"]

_VMEM_LIMIT_BYTES = 10 * 2 ** 20
# Static unroll budget: windows-per-program * heads. Keeps Mosaic compile
# times and kernel code size bounded across stages (H = 3..48).
_MAX_UNROLL = 32


def _head_groups(c: int, d: int):
    """Static lane groups [(lane_offset, width), ...] covering C.

    Full 128-lane groups plus one head-aligned tail (e.g. C=192, d=32 ->
    [(0, 128), (128, 64)]), so the masked-contraction width never exceeds
    128 lanes. C < 128 is a single group.
    """
    groups = []
    off = 0
    while off < c:
        width = min(128, c - off)
        width -= width % d
        groups.append((off, width))
        off += width
    return groups


_NEG_INF = -1e9


def _pack_group(q, k, v, bias, mask, g: int):
    """Stack g adjacent windows along N (block-diagonal attention).

    Multiplies the MXU M-stream per weight load by g: at N=49 the (49, C)
    matmuls are latency-bound (cost ~max(M, K) cycles regardless of the
    tiny output), so g windows per matmul cut the per-window cost ~g-fold.
    The cross-window score blocks are suppressed with an additive -1e9 in
    the (f32) bias, which makes the per-window softmax exact.
    """
    bw, n, c = q.shape
    q, k, v = (t.reshape(bw // g, g * n, c) for t in (q, k, v))
    h = bias.shape[0]
    neg = jnp.full((h, n, n), _NEG_INF, jnp.float32)
    bias = bias.astype(jnp.float32)
    bias = jnp.concatenate([
        jnp.concatenate([bias if i == j else neg for j in range(g)], axis=2)
        for i in range(g)
    ], axis=1)
    if mask is not None:
        parts = [mask[i::g].astype(jnp.float32) for i in range(g)]
        zero = jnp.zeros_like(parts[0])
        mask = jnp.concatenate([
            jnp.concatenate([parts[i] if i == j else zero
                             for j in range(g)], axis=2)
            for i in range(g)
        ], axis=1)
    return q, k, v, bias, mask


def _pack_factor(bw, n, nb_win, mask) -> int:
    """Largest g in {4, 2, 1} that tiles the batch/windows and keeps the
    packed sequence g*n <= 256 (scores stay small in VMEM).

    Default cap 2: measured at Swin-T stage-1 shapes (N=49, C=96), g=4 is
    SLOWER than g=2 (2.68 vs 2.16 ms — the g² masked cross-window score
    FLOPs outgrow the per-matmul latency savings; exp_sam_window.py)."""
    import os

    cap = int(os.environ.get("TFIMM_TPU_WINDOW_PACK", "2"))
    for g in (4, 2):
        if (g <= cap and g * n <= 256 and bw % g == 0
                and (mask is None or nb_win % g == 0)):
            return g
    return 1


def _pick_wb(bw: int, nb_heads: int, nb_win: int, has_mask: bool) -> int:
    wb = max(1, _MAX_UNROLL // nb_heads)
    while wb > 1 and (bw % wb or (has_mask and nb_win % wb)):
        wb -= 1
    return wb


def _group_attention(qg, kg, vg, b_ref, mw, off: int, d: int, scale: float):
    """Attention for the heads living in one lane group.

    qg/kg/vg: (N, width) values; returns the (N, width) f32 output sum and
    the list of per-head f32 probability matrices is NOT kept (recomputed in
    the backward kernel).
    """
    n, width = qg.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    qf = qg.astype(jnp.float32) * scale
    acc = None
    for j in range(width // d):
        h = (off + j * d) // d
        sel = (lane >= j * d) & (lane < (j + 1) * d)
        km = jnp.where(sel, kg, 0)
        s = jax.lax.dot_general(
            qf, km.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + b_ref[h]
        if mw is not None:
            s = s + mw
        p = softmax_nomax(s)
        vm = jnp.where(sel, vg, 0)
        o = jax.lax.dot_general(
            p.astype(vm.dtype), vm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = o if acc is None else acc + o
    return acc


def _stacked_enabled(n: int) -> bool:
    """Default-on sublane-stacked group bodies (TFIMM_TPU_WINDOW_STACKED=0
    restores the per-head bodies).

    Stacks the J masked per-head queries of a lane group along rows so each
    group runs 2 matmuls instead of 2J (5 vs 5J in the backward) with J-fold
    longer M-streams — same FLOPs, unlike g-packing whose cross-window mask
    FLOPs grow as g². Requires n % 8 == 0 (f32 sublane tile) so the per-head
    row blocks of the stacked score/output slices stay aligned; g=2 packing
    already provides that at Swin shapes (52 -> 104). Measured on v5e
    (results/stacked_experiment.csv): swin_tiny inference 6555 -> 7424 img/s
    (+13.3%), backprop 1223 -> 1259 (+2.9%).
    """
    import os

    return (os.environ.get("TFIMM_TPU_WINDOW_STACKED", "1") == "1"
            and n % 8 == 0)


def _group_attention_stacked(qg, kg, vg, b_ref, mw, off: int, d: int,
                             scale: float):
    """Sublane-stacked twin of :func:`_group_attention` — identical math,
    2 matmuls per lane group. The lane mask of each head's score contraction
    moves onto the query operand (q @ (k*m)^T == (q*m) @ k^T), so the J
    masked queries stack along rows into ONE matmul against unmasked k^T;
    the per-head biases are the contiguous (J, n, n) block of the bias ref
    reshaped onto the stacked rows; ONE unmasked P @ v matmul yields every
    head's output block, each valid on its own d lanes, recombined with
    lane selects (disjoint lanes, so the accumulated sum is exact)."""
    n, width = qg.shape
    nheads = width // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    qf = qg.astype(jnp.float32) * scale
    sels = [(lane >= j * d) & (lane < (j + 1) * d) for j in range(nheads)]
    qc = jnp.concatenate([jnp.where(sel, qf, 0) for sel in sels], axis=0)
    s = jax.lax.dot_general(
        qc, kg.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h0 = off // d
    s = s + b_ref[h0:h0 + nheads].reshape(nheads * n, n)
    if mw is not None:
        s = s + jnp.concatenate([mw] * nheads, axis=0)
    p = softmax_nomax(s)
    o = jax.lax.dot_general(
        p.astype(vg.dtype), vg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = None
    for j, sel in enumerate(sels):
        term = jnp.where(sel, o[j * n:(j + 1) * n], 0)
        acc = term if acc is None else acc + term
    return acc


def window_mha(q, k, v, bias, mask=None, *, nb_heads: int, scale: float,
               interpret: bool = False, stacked: "bool | None" = None):
    """q, k, v: (BW, N, C) with BW = batch * nb_windows (window-major inner).

    bias: (H, N, N); mask: (nW, N, N) additive shift mask or None. Returns
    (BW, N, C) in the dtype of q. ``stacked=None`` resolves via
    ``_stacked_enabled``; an explicit False forces the per-head group bodies
    (the VMEM-degrade path used by window_mha_or_none).
    """
    bw0, n0, c = q.shape
    d = c // nb_heads
    nb_win = mask.shape[0] if mask is not None else 1
    g = _pack_factor(bw0, n0, nb_win, mask)
    if g > 1:
        q, k, v, bias, mask = _pack_group(q, k, v, bias, mask, g)
        nb_win = max(1, nb_win // g)
    bw, n, _ = q.shape
    wb = _pick_wb(bw, nb_heads, nb_win, mask is not None)
    grid = (bw // wb,)

    io_spec = pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [io_spec, io_spec, io_spec,
                pl.BlockSpec((nb_heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [q, k, v, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((wb, n, n), lambda i: (i % (nb_win // wb), 0, 0),
                         memory_space=pltpu.VMEM))
        # bf16: the mask holds only {0, -100/-1e9}, exact in bf16, and it
        # is streamed per program — half the HBM traffic.
        operands.append(mask.astype(jnp.bfloat16))

    use_stacked = (_stacked_enabled(n) if stacked is None
                   else (stacked and n % 8 == 0))
    group_fn = _group_attention_stacked if use_stacked else _group_attention

    def kernel(q_ref, k_ref, v_ref, b_ref, *rest):
        m_ref, o_ref = (rest if mask is not None else (None,) + rest)
        for w in range(wb):
            mw = m_ref[w] if m_ref is not None else None
            for off, width in _head_groups(c, d):
                out = group_fn(
                    q_ref[w, :, off:off + width],
                    k_ref[w, :, off:off + width],
                    v_ref[w, :, off:off + width],
                    b_ref, mw, off, d, scale,
                )
                o_ref[w, :, off:off + width] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(bw0, n0, c)


def _group_attention_bwd(qg, kg, vg, gg, b_ref, mw, off: int, d: int,
                         scale: float):
    """Backward for one lane group. Returns (dq, dk, dv) (N, width) f32 and
    the per-head score gradients [(h, ds), ...]."""
    n, width = qg.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    qf = qg.astype(jnp.float32) * scale
    dq = dk = dv = None
    ds_heads = []
    for j in range(width // d):
        h = (off + j * d) // d
        sel = (lane >= j * d) & (lane < (j + 1) * d)
        km = jnp.where(sel, kg, 0).astype(jnp.float32)
        vm = jnp.where(sel, vg, 0).astype(jnp.float32)
        gm = jnp.where(sel, gg, 0).astype(jnp.float32)
        qm = jnp.where(sel, qg, 0).astype(jnp.float32)
        s = jax.lax.dot_general(
            qf, km, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + b_ref[h]
        if mw is not None:
            s = s + mw
        p = softmax_nomax(s)
        dv_h = jax.lax.dot_general(
            p, gm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            gm, vm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = softmax_clamp_grad_mask(s, p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)))
        ds_heads.append((h, ds))
        dq_h = scale * jax.lax.dot_general(
            ds, km, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_h = scale * jax.lax.dot_general(
            ds, qm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq = dq_h if dq is None else dq + dq_h
        dk = dk_h if dk is None else dk + dk_h
        dv = dv_h if dv is None else dv + dv_h
    return dq, dk, dv, ds_heads


def _group_attention_bwd_stacked(qg, kg, vg, gg, b_ref, mw, off: int, d: int,
                                 scale: float):
    """Sublane-stacked twin of :func:`_group_attention_bwd` — 5 matmuls per
    lane group instead of 5J (same identities as the stacked forward; the
    stacked-row contractions for dk/dv sum the per-head terms directly,
    which is exact because each head's term lives on its own d lanes)."""
    n, width = qg.shape
    nheads = width // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    qf = qg.astype(jnp.float32) * scale
    gf = gg.astype(jnp.float32)
    kf = kg.astype(jnp.float32)
    vf = vg.astype(jnp.float32)
    sels = [(lane >= j * d) & (lane < (j + 1) * d) for j in range(nheads)]
    qc = jnp.concatenate([jnp.where(sel, qf, 0) for sel in sels], axis=0)
    gc = jnp.concatenate([jnp.where(sel, gf, 0) for sel in sels], axis=0)
    s = jax.lax.dot_general(qc, kf,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h0 = off // d
    s = s + b_ref[h0:h0 + nheads].reshape(nheads * n, n)
    if mw is not None:
        s = s + jnp.concatenate([mw] * nheads, axis=0)
    p = softmax_nomax(s)
    dv = jax.lax.dot_general(p, gc,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gc, vf,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = softmax_clamp_grad_mask(s, p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)))
    dq_cat = scale * jax.lax.dot_general(
        ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, qc,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq = None
    ds_heads = []
    for j, sel in enumerate(sels):
        term = jnp.where(sel, dq_cat[j * n:(j + 1) * n], 0)
        dq = term if dq is None else dq + term
        ds_heads.append((h0 + j, ds[j * n:(j + 1) * n]))
    return dq, dk, dv, ds_heads


def _reference_window_mha(q, k, v, bias, mask, nb_heads, scale):
    """XLA twin of window_mha (same math incl. the clamped no-max softmax).
    Only used to derive the backward when the Pallas backward's VMEM
    footprint would not fit (see _window_mha_bwd)."""
    bw, n, c = q.shape
    d = c // nb_heads
    qh, kh, vh = (t.reshape(bw, n, nb_heads, d).transpose(0, 2, 1, 3)
                  .astype(jnp.float32) for t in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh)
    s = s + bias.astype(jnp.float32)[None]
    if mask is not None:
        nb_win = mask.shape[0]
        # Row r of the (BW, ...) layout is window r % nb_win (window-major
        # inner) — the same indexing as the kernel's mask BlockSpec.
        s = (s.reshape(bw // nb_win, nb_win, nb_heads, n, n)
             + mask.astype(jnp.float32)[None, :, None])
        s = s.reshape(bw, nb_heads, n, n)
    p = softmax_nomax(s)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(bw, n, c).astype(q.dtype)


def _bwd_fits(wb, n, c, nb_heads, itemsize, has_mask, stacked) -> bool:
    """VMEM budget for ONE backward program: 7 window-chunk io blocks
    (q/k/v/g in, dq/dk/dv out), two bias-sized f32 blocks (bias + the
    resident dbias accumulator), the bf16 mask chunk, and the group body's
    live f32 intermediates — 4 score-sized (s/p/dp/ds; stacked bodies keep
    all J heads' score rows live at once) plus ~7 (n, lane-width) operand/
    accumulator rows. The forward gate alone does NOT cover this (~2x the
    forward footprint) — same failure class fused_mha hit at N=785."""
    d = c // nb_heads
    width = min(128, c)
    j = max(1, width // d) if stacked else 1
    vmem = (7 * wb * n * c * itemsize
            + 2 * nb_heads * n * n * 4
            + (wb * n * n * 2 if has_mask else 0)
            + 4 * j * n * n * 4
            + 7 * n * width * 4)
    return vmem <= _VMEM_LIMIT_BYTES


def _window_mha_bwd_call(q, k, v, bias, mask, g, nb_heads, scale,
                         stacked, interpret=False):
    bw0, n0, c = q.shape
    d = c // nb_heads
    nb_win = mask.shape[0] if mask is not None else 1
    pk = _pack_factor(bw0, n0, nb_win, mask)
    if pk > 1:
        q, k, v, bias, mask = _pack_group(q, k, v, bias, mask, pk)
        g = g.reshape(bw0 // pk, pk * n0, c)
        nb_win = max(1, nb_win // pk)
    bw, n, _ = q.shape
    wb = _pick_wb(bw, nb_heads, nb_win, mask is not None)
    grid = (bw // wb,)

    io_spec = pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nb_heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [io_spec, io_spec, io_spec, bias_spec]
    operands = [q, k, v, bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((wb, n, n), lambda i: (i % (nb_win // wb), 0, 0),
                         memory_space=pltpu.VMEM))
        # bf16: the mask holds only {0, -100/-1e9}, exact in bf16, and it
        # is streamed per program — half the HBM traffic.
        operands.append(mask.astype(jnp.bfloat16))
    in_specs.append(io_spec)
    operands.append(g)

    def kernel(q_ref, k_ref, v_ref, b_ref, *rest):
        if mask is not None:
            m_ref, g_ref, dq_ref, dk_ref, dv_ref, db_ref = rest
        else:
            g_ref, dq_ref, dk_ref, dv_ref, db_ref = rest
            m_ref = None

        # The dbias block has a constant index map, so it stays resident
        # across the (sequential) grid and accumulates; program 0 zeroes it.
        @pl.when(pl.program_id(0) == 0)
        def _():
            db_ref[...] = jnp.zeros_like(db_ref)

        group_bwd = (_group_attention_bwd_stacked if stacked
                     else _group_attention_bwd)
        for w in range(wb):
            mw = m_ref[w] if m_ref is not None else None
            for off, width in _head_groups(c, d):
                dq, dk, dv, ds_heads = group_bwd(
                    q_ref[w, :, off:off + width],
                    k_ref[w, :, off:off + width],
                    v_ref[w, :, off:off + width],
                    g_ref[w, :, off:off + width],
                    b_ref, mw, off, d, scale,
                )
                dq_ref[w, :, off:off + width] = dq.astype(dq_ref.dtype)
                dk_ref[w, :, off:off + width] = dk.astype(dk_ref.dtype)
                dv_ref[w, :, off:off + width] = dv.astype(dv_ref.dtype)
                for h, ds in ds_heads:
                    db_ref[h] += ds

    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[io_spec, io_spec, io_spec, bias_spec],
        out_shape=[jax.ShapeDtypeStruct((bw, n, c), q.dtype)] * 3
        + [jax.ShapeDtypeStruct((nb_heads, n, n), jnp.float32)],
        interpret=interpret,
    )(*operands)
    if pk > 1:
        dq, dk, dv = (t.reshape(bw0, n0, c) for t in (dq, dk, dv))
        # Fold the packed (H, g*N, g*N) bias gradient back onto the window
        # bias: every diagonal block saw the same bias table.
        dbias = sum(dbias[:, i * n0:(i + 1) * n0, i * n0:(i + 1) * n0]
                    for i in range(pk))
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def window_mha_diff(q, k, v, bias, mask, nb_heads: int, scale: float,
                    interpret: bool = False,
                    stacked: "bool | None" = None):
    """Differentiable fused windowed MHA (custom VJP, Pallas backward).

    Gradients flow to q/k/v and the bias table. The shift ``mask`` is
    treated as a structural constant: its cotangent is always zero
    (stop-gradient semantics) — it never differs between windows of the
    same model and is precomputed in numpy by every caller. When the
    Pallas backward's VMEM footprint would not fit, the gradient is taken
    through an XLA twin instead (the fused forward is kept either way).
    """
    return window_mha(q, k, v, bias, mask, nb_heads=nb_heads, scale=scale,
                      interpret=interpret, stacked=stacked)


def _window_mha_fwd(q, k, v, bias, mask, nb_heads, scale, interpret, stacked):
    out = window_mha(q, k, v, bias, mask, nb_heads=nb_heads, scale=scale,
                     interpret=interpret, stacked=stacked)
    return out, (q, k, v, bias, mask)


def _window_mha_bwd(nb_heads, scale, interpret, stacked_fwd, res, g):
    q, k, v, bias, mask = res
    bw0, n0, c = q.shape
    nb_win = mask.shape[0] if mask is not None else 1
    # Mirror the packing the backward call will apply, to budget its VMEM.
    pk = _pack_factor(bw0, n0, nb_win, mask)
    n = pk * n0
    wb = _pick_wb(bw0 // pk, nb_heads, max(1, nb_win // pk), mask is not None)
    itemsize = jnp.dtype(q.dtype).itemsize
    # Degrade per shape: stacked backward -> per-head backward -> XLA twin,
    # whichever is the richest that fits VMEM. An explicit stacked=False from
    # the forward dispatch (its VMEM degrade) is honored here too.
    want_stacked = (_stacked_enabled(n) if stacked_fwd is None
                    else bool(stacked_fwd))
    stacked = (want_stacked
               and _bwd_fits(wb, n, c, nb_heads, itemsize, mask is not None,
                             stacked=True))
    if not _bwd_fits(wb, n, c, nb_heads, itemsize, mask is not None,
                     stacked=stacked):
        _, vjp = jax.vjp(
            lambda qq, kk, vv, bb: _reference_window_mha(
                qq, kk, vv, bb, mask, nb_heads, scale), q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
        dmask = jnp.zeros_like(mask) if mask is not None else None
        return dq, dk, dv, dbias.astype(bias.dtype), dmask
    dq, dk, dv, dbias = _window_mha_bwd_call(
        q, k, v, bias, mask, g, nb_heads, scale, stacked,
        interpret=interpret)
    # The shift mask is a structural constant: its cotangent is defined as
    # zero (stop-gradient) on every path, kernel and twin alike.
    dmask = jnp.zeros_like(mask) if mask is not None else None
    return dq, dk, dv, dbias.astype(bias.dtype), dmask


window_mha_diff.defvjp(_window_mha_fwd, _window_mha_bwd)


from tfimm_tpu.ops.pallas.dispatch import interpret_forced as _interpret_forced
from tfimm_tpu.ops.pallas.dispatch import on_tpu as _on_tpu


def window_mha_or_none(q, k, v, bias, mask=None, *, nb_heads: int,
                       scale: float):
    """Dispatch: fused windowed-attention kernel when it applies, else None.

    Conditions: TPU backend, head dim in {16, 32, 64}, mask windows evenly
    tile the batch, and a window chunk's working set fits VMEM. The kernel
    is differentiable (bias gradient included), so training qualifies too.
    """
    interpret = _interpret_forced()
    if not (_on_tpu() or interpret):
        return None
    bw, n, c = q.shape
    if c % nb_heads:
        return None
    d = c // nb_heads
    if d not in (16, 32, 64) or c < d * 2:
        return None
    nb_win = mask.shape[0] if mask is not None else 1
    if bw % nb_win:
        return None
    # Sublane alignment (see swin_block.py): packed groups are g*n rows, and
    # 49-token windows leave them misaligned (98 % 8 != 0), which costs a
    # Mosaic relayout on every per-group slice — measured 1.35-1.47x on the
    # fused-block kernel that shares this structure. Pad windows to a
    # multiple of 4 tokens; padded key columns get -1e9 through the bias and
    # padded query rows are sliced off. The pad/slice sit OUTSIDE the custom
    # VJP, so autodiff (incl. the bias-table gradient) routes through them.
    n0 = n
    npad = padded_rows(n)
    if npad != n:
        pads = ((0, 0), (0, npad - n), (0, 0))
        q, k, v = jnp.pad(q, pads), jnp.pad(k, pads), jnp.pad(v, pads)
        bias = jnp.concatenate(
            [jnp.pad(bias, ((0, 0), (0, npad - n), (0, 0))),
             jnp.full((nb_heads, npad, npad - n), -1e9, bias.dtype)],
            axis=-1)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, npad - n), (0, npad - n)))
        n = npad
    g = _pack_factor(bw, n, nb_win, mask)
    if g > 1:
        n, bw, nb_win = g * n, bw // g, max(1, nb_win // g)
    wb = _pick_wb(bw, nb_heads, nb_win, mask is not None)
    itemsize = jnp.dtype(q.dtype).itemsize
    vmem = (4 * wb * n * c * itemsize + nb_heads * n * n * 4
            + (wb * n * n * 4 if mask is not None else 0))
    stacked = None  # auto (_stacked_enabled)
    if _stacked_enabled(n):
        # Stacked group bodies keep J = min(128, C)//d score-sized blocks
        # (s/p/dp/ds in the backward) live at once instead of one. When that
        # busts VMEM but the per-head budget fits, degrade to the unstacked
        # group bodies (same recipe as fused_mha) rather than dropping the
        # fused kernel entirely.
        stacked_extra = 4 * (min(128, c) // d) * n * n * 4
        if vmem + stacked_extra <= _VMEM_LIMIT_BYTES:
            vmem += stacked_extra
        else:
            stacked = False
    if vmem > _VMEM_LIMIT_BYTES:
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch(f"window_mha[g={g},{'stacked' if stacked is None else 'group'}]")
    out = window_mha_diff(q, k, v, bias, mask, nb_heads, scale, interpret,
                          stacked)
    return out[:, :n0, :] if npad != n0 else out
