"""Publishable per-op roofline decomposition for the north-star configs.

For ViT-B/16 and ConvNeXt-B @ bs128 bf16 this measures (slope timing) every
constituent op at the model's exact shapes, prints a markdown table
reconciling measured img/s with the 197 TFLOP/s v5e bf16 denominator, and
derives a `practical_ceiling_fraction`: the roofline fraction the model would
hit if every op ran at its own measured per-op best — i.e. what's left after
subtracting physics (VPU-bound dwconv, d=64 MXU padding) from the gap.

Output goes into results/README.md (VERDICT round-2 item 2); bench.py prints
the ceiling fraction next to roofline_fraction.

Usage: python scripts/perf/decompose_roofline.py [vit|convnext]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as PEAK  # noqa: E402


def timeit(fn, args, n1=10, n2=60, min_signal=0.4):
    """Differential on-device timing (see docs/profiling.md) with an
    adaptive second pass: sub-millisecond ops at the default iteration
    counts leave only a few ms of signal against ~5-10 ms of tunnel
    jitter (first cut of this table showed 130-290% "of peak" on the
    skinny matmuls and a negative head time). The re-measure sizes the
    long leg so the differential covers >= ``min_signal`` seconds."""

    @jax.jit
    def run(args, n):
        def body(_, c):
            out = fn(*c[1:], c[0])
            return (c[0] + (out.mean() * 0).astype(c[0].dtype),) + c[1:]
        return jax.lax.fori_loop(0, n, body, args)[0].mean()

    def t(n):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(run(args, n)))
        return time.perf_counter() - t0

    def slope(a, b):
        t1, t2 = t(a), t(b)
        for _ in range(3):
            if t2 > t1:
                break
            t1, t2 = t(a), t(b)
        return (t2 - t1) / (b - a)

    np.asarray(jax.block_until_ready(run(args, 2)))
    est = slope(n1, n2)
    need = int(min_signal / max(est, 1e-7))
    if need > (n2 - n1):
        est = slope(n1, min(n1 + need, 20000))
    return est


ROWS = []


def row(name, count, secs, flops, note=""):
    """One op: per-call seconds, per-call FLOPs, how many calls per image
    batch. Records and prints."""
    tfs = flops / secs / 1e12 if secs else 0.0
    ROWS.append((name, count, secs, flops, tfs, note))
    print(f"{name:34s} x{count:3d} {secs*1e3:8.3f} ms "
          f"{tfs:7.1f} TF/s ({100*tfs*1e12/PEAK:4.1f}% peak) {note}",
          flush=True)


def emit_markdown(model_name, batch, measured_img_s, flops_per_img):
    total_t = sum(c * s for _, c, s, _, _, _ in ROWS)
    total_fl = sum(c * f for _, c, _, f, _, _ in ROWS)
    print("\n### markdown ###\n")
    print("| op | calls | ms/call | ms total | GFLOP | TF/s | % peak | note |")
    print("|---|---|---|---|---|---|---|---|")
    for name, c, s, f, tfs, note in ROWS:
        print(f"| {name} | {c} | {s*1e3:.3f} | {c*s*1e3:.2f} | "
              f"{c*f/1e9:.1f} | {tfs:.1f} | {100*tfs*1e12/PEAK:.1f} | {note} |")
    sum_img_s = batch / total_t
    print(f"| **sum** | | | **{total_t*1e3:.2f}** | {total_fl/1e9:.1f} | "
          f"{total_fl/total_t/1e12:.1f} | "
          f"{100*(total_fl/total_t)/PEAK:.1f} | |")
    print()
    print(f"- op-sum throughput bound: {sum_img_s:.0f} img/s; measured "
          f"whole-model: {measured_img_s:.0f} img/s "
          f"({100*measured_img_s/sum_img_s:.0f}% of the op sum)")
    rf_meas = measured_img_s * flops_per_img / PEAK
    rf_sum = sum_img_s * flops_per_img / PEAK
    print(f"- roofline_fraction: measured {rf_meas:.3f}, op-sum bound "
          f"{rf_sum:.3f} (practical_ceiling_fraction)")
    return rf_sum


def decompose_vit():
    rng = np.random.default_rng(0)
    B, N, D, H, Dh = 128, 197, 768, 12, 3072
    d = D // H
    L = 12

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    # patch embed: 224x224 conv p16 = matmul (B*196, 768) x (768, 768)
    xp = mk(B * 196, 16 * 16 * 3)
    wp = mk(16 * 16 * 3, D)
    s = timeit(lambda w, a: jnp.dot(a, w), (xp, wp))
    row("patch embed (as matmul)", 1, s, 2 * B * 196 * 768 * D)

    x = mk(B * N, D)
    # LN (per block: 2)
    from tfimm_tpu.ops.norm import LayerNorm

    ln = LayerNorm(D, eps=1e-6)
    p_ln = ln.init(jax.random.PRNGKey(0))
    xb = mk(B, N, D)
    s = timeit(lambda p, a: ln(p, a), (xb, p_ln))
    row("LayerNorm(768)", 2 * L, s, 0, "HBM-bound: 2x r/w of (B,197,768)")

    # qkv matmul
    w = mk(D, 3 * D)
    s = timeit(lambda w_, a: jnp.dot(a, w_), (x, w))
    row("qkv matmul", L, s, 2 * B * N * D * 3 * D)

    # fused MHA kernel (the shipping path)
    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_or_none

    qkv = mk(B, N, 3 * D)
    out = fused_mha_or_none(qkv, nb_heads=H, scale=d ** -0.5)
    if out is None:
        print("fused_mha declined! (not on TPU?)")
    else:
        s = timeit(
            lambda q: fused_mha_or_none(q, nb_heads=H, scale=d ** -0.5),
            (qkv,))
        attn_flops = 2 * 2 * B * H * N * N * d
        row("fused MHA kernel", L, s, attn_flops,
            "d=64 pads to 128 MXU tiles: ~50% ceiling by construction")

    # proj matmul
    w = mk(D, D)
    s = timeit(lambda w_, a: jnp.dot(a, w_), (x, w))
    row("attn proj matmul", L, s, 2 * B * N * D * D)

    # MLP fc1+gelu+fc2 (fused by XLA; measure as one)
    from tfimm_tpu.ops.mlp import MLP

    mlp = MLP(D, Dh)
    p_mlp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         mlp.init(jax.random.PRNGKey(1)))
    s = timeit(lambda p, a: mlp(p, a), (xb, p_mlp))
    row("MLP (fc1+gelu+fc2)", L, s, 2 * 2 * B * N * D * Dh)

    # head: pool+fc1000
    wh = mk(D, 1000)
    xh = mk(B, D)
    s = timeit(lambda w_, a: jnp.dot(a, w_), (xh, wh))
    row("head fc(1000)", 1, s, 2 * B * D * 1000)

    # measured whole model for the reconciliation line
    from tfimm_tpu import create_model
    from tfimm_tpu.utils.profile import time_model

    img_s = time_model("vit_base_patch16_224", target="inference",
                       batch_size=B, nb_batches=5)
    return emit_markdown("vit_base_patch16_224", B, img_s, 2 * 17.84e9)


def decompose_convnext():
    rng = np.random.default_rng(0)
    B = 128
    stages = [(128, 56, 3), (256, 28, 3), (512, 14, 27), (1024, 7, 3)]

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    # stem: 4x4 s4 conv = matmul (B*56*56, 48)x(48,128)
    xs = mk(B * 56 * 56, 4 * 4 * 3)
    ws = mk(4 * 4 * 3, 128)
    s = timeit(lambda w, a: jnp.dot(a, w), (xs, ws))
    row("stem conv (as matmul)", 1, s, 2 * B * 56 * 56 * 48 * 128)

    from tfimm_tpu.ops.conv import DepthwiseConv2d
    from tfimm_tpu.ops.norm import LayerNorm

    for c, hw, depth in stages:
        x = mk(B, hw, hw, c)
        dw = DepthwiseConv2d(c, 7, padding=3)
        pdw = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                           dw.init(jax.random.PRNGKey(2)))
        s = timeit(lambda p, a: dw(p, a), (x, pdw))
        row(f"dwconv7x7 C={c}", depth, s, 2 * B * hw * hw * c * 49,
            "VPU-bound; no MXU formulation (measured exp_dwconv.py)")

        ln = LayerNorm(c, eps=1e-6)
        pln = ln.init(jax.random.PRNGKey(3))
        s = timeit(lambda p, a: ln(p, a), (x, pln))
        row(f"LayerNorm C={c}", depth, s, 0, "HBM-bound")

        # pointwise MLP: (B*hw*hw, C) x (C, 4C) and back
        xm = mk(B * hw * hw, c)
        w1 = mk(c, 4 * c)
        w2 = mk(4 * c, c)

        def pw(w1_, w2_, a):
            return jnp.dot(jax.nn.gelu(jnp.dot(a, w1_)), w2_)
        s = timeit(pw, (xm, w1, w2))
        row(f"pw MLP C={c}->4C->C", depth, s, 2 * 2 * B * hw * hw * c * 4 * c)

        if c != 1024:
            # downsample: LN + 2x2 s2 conv to 2C
            xd = mk(B * (hw // 2) * (hw // 2), 4 * c)
            wd = mk(4 * c, 2 * c)
            s = timeit(lambda w, a: jnp.dot(a, w), (xd, wd))
            row(f"downsample {c}->{2*c}", 1, s,
                2 * B * (hw // 2) ** 2 * 4 * c * 2 * c)

    wh = mk(1024, 1000)
    xh = mk(B, 1024)
    s = timeit(lambda w, a: jnp.dot(a, w), (xh, wh))
    row("head fc(1000)", 1, s, 2 * B * 1024 * 1000)

    from tfimm_tpu.utils.profile import time_model

    img_s = time_model("convnext_base", target="inference", batch_size=B,
                       nb_batches=5)
    return emit_markdown("convnext_base", B, img_s, 2 * 15.36e9)


def timeit_fb(fn, args, cot, n1=10, n2=60, min_signal=0.4):
    """Slope-time fwd+bwd of ``fn`` (vjp wrt every arg) with a carried
    cotangent. Same arg-rotation convention as ``timeit`` (args[0] is the
    carry array, passed to ``fn`` LAST).

    The naive "reuse timeit on a grad-summing wrapper" harness measures
    GARBAGE for linear ops: their input-gradients (dX = cot @ W^T) do not
    depend on the carried primal, so XLA hoists them out of the fori_loop
    (first cut printed a negative patch-embed time and qkv at 237% of
    peak). Here the COTANGENT is the carry: each iteration perturbs the
    primal carry arg with cot's leading element (times zero — a data
    dependency XLA cannot fold away, NaN semantics) and folds the gradient
    sum back into the next cotangent, so every vjp matmul depends on the
    previous iteration."""

    @jax.jit
    def run(state, n):
        def body(_, c):
            ct, rest = c[0], c[1:]
            lead = (ct.ravel()[0] * 0).astype(rest[0].dtype)
            out, vjp = jax.vjp(fn, *rest[1:], rest[0] + lead)
            g = vjp(ct)
            # The out.mean() term keeps the PRIMAL alive: for linear ops
            # the backward needs only (x, w), so an unused vjp primal lets
            # XLA elide the forward matmul (first fix of this harness
            # measured MLP f+b at exactly 5 of its 6 matmuls).
            s = sum(jnp.sum(t.astype(jnp.float32))
                    for t in jax.tree.leaves(g))
            s = s + sum(jnp.mean(t).astype(jnp.float32) * 0
                        for t in jax.tree.leaves(out))
            return (ct + (s * 0).astype(ct.dtype),) + rest
        return jax.lax.fori_loop(0, n, body, state)[0].mean()

    state = (cot,) + tuple(args)

    def t(n):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(run(state, n)))
        return time.perf_counter() - t0

    def slope(a, b):
        t1, t2 = t(a), t(b)
        for _ in range(3):
            if t2 > t1:
                break
            t1, t2 = t(a), t(b)
        return (t2 - t1) / (b - a)

    np.asarray(jax.block_until_ready(run(state, 2)))
    est = slope(n1, n2)
    need = int(min_signal / max(est, 1e-7))
    if need > (n2 - n1):
        est = slope(n1, min(n1 + need, 20000))
    return est


def decompose_vit_bwd():
    """Per-op fwd+bwd table for the ViT-B backprop row (bs64 bf16).

    Reconciles the measured backprop img/s with per-op vjp timings: each row
    is one op's forward + its VJP at the training shapes. FLOPs column uses
    3x the forward FLOPs for matmuls (dX and dW each cost a fwd-sized
    matmul) and 3.5x for the fused MHA (its backward recomputes scores and
    runs five matmuls against the forward's two)."""
    rng = np.random.default_rng(0)
    B, N, D, H, Dh = 64, 197, 768, 12, 3072
    d = D // H
    L = 12

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    # patch embed: image is the leaf input, only dW is computed in the model
    xp = mk(B * 196, 16 * 16 * 3)
    wp = mk(16 * 16 * 3, D)
    s = timeit_fb(lambda w: jnp.dot(xp, w), (wp,), mk(B * 196, D))
    row("patch embed f+b (dW only)", 1, s, 2 * 2 * B * 196 * 768 * D)

    from tfimm_tpu.ops.norm import LayerNorm

    ln = LayerNorm(D, eps=1e-6)
    p_ln = ln.init(jax.random.PRNGKey(0))
    xb = mk(B, N, D)
    s = timeit_fb(lambda p, a: ln(p, a), (xb, p_ln), mk(B, N, D))
    row("LayerNorm(768) f+b", 2 * L, s, 0, "HBM-bound both directions")

    x = mk(B * N, D)
    w = mk(D, 3 * D)
    s = timeit_fb(lambda w_, a: jnp.dot(a, w_), (x, w), mk(B * N, 3 * D))
    row("qkv matmul f+b", L, s, 3 * 2 * B * N * D * 3 * D)

    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_or_none

    qkv = mk(B, N, 3 * D)
    out = fused_mha_or_none(qkv, nb_heads=H, scale=d ** -0.5)
    if out is None:
        print("fused_mha declined! (not on TPU?)")
    else:
        s = timeit_fb(
            lambda q: fused_mha_or_none(q, nb_heads=H, scale=d ** -0.5),
            (qkv,), jnp.ones_like(out))
        attn_flops = 2 * 2 * B * H * N * N * d
        row("fused MHA kernel f+b", L, s, 3.5 * attn_flops,
            "Pallas custom VJP (score recompute + 5 matmuls)")

    w = mk(D, D)
    s = timeit_fb(lambda w_, a: jnp.dot(a, w_), (x, w), mk(B * N, D))
    row("attn proj matmul f+b", L, s, 3 * 2 * B * N * D * D)

    from tfimm_tpu.ops.mlp import MLP

    mlp = MLP(D, Dh)
    p_mlp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         mlp.init(jax.random.PRNGKey(1)))
    s = timeit_fb(lambda p, a: mlp(p, a), (xb, p_mlp), mk(B, N, D))
    row("MLP f+b", L, s, 3 * 2 * 2 * B * N * D * Dh)

    wh = mk(D, 1000)
    xh = mk(B, D)
    s = timeit_fb(lambda w_, a: jnp.dot(a, w_), (xh, wh), mk(B, 1000))
    row("head fc(1000) f+b", 1, s, 3 * 2 * B * D * 1000)

    from tfimm_tpu.utils.profile import time_model

    img_s = time_model("vit_base_patch16_224", target="backprop",
                       batch_size=B, nb_batches=5)
    # 3x forward FLOPs is the backprop roofline convention (BASELINE.md).
    return emit_markdown("vit_base_patch16_224 backprop", B, img_s,
                         3 * 2 * 17.84e9)


def decompose_cait_bwd():
    """Per-op fwd+bwd table for the CaiT-S24 backprop row (bs64 bf16) —
    the weakest transformer training row (0.354 roofline). Same harness
    and FLOPs conventions as decompose_vit_bwd; the talking-head kernel is
    credited 3.5x its useful forward FLOPs plus the two (H, H) head mixes
    (negligible FLOPs, but they ride the score tensor)."""
    rng = np.random.default_rng(0)
    B, N, D, H = 64, 196, 384, 8
    d = D // H
    L = 24
    scale = d ** -0.5

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    from tfimm_tpu.ops.norm import LayerNorm

    ln = LayerNorm(D, eps=1e-6)
    p_ln = ln.init(jax.random.PRNGKey(0))
    xb = mk(B, N, D)
    s = timeit_fb(lambda p, a: ln(p, a), (xb, p_ln), mk(B, N, D))
    row("LayerNorm(384) f+b", 2 * L, s, 0, "HBM-bound both directions")

    x = mk(B * N, D)
    w = mk(D, 3 * D)
    s = timeit_fb(lambda w_, a: jnp.dot(a, w_), (x, w), mk(B * N, 3 * D))
    row("qkv matmul f+b", L, s, 3 * 2 * B * N * D * 3 * D)

    from tfimm_tpu.ops.pallas.cait_attention import \
        talking_head_attention_or_none

    qkv = mk(B, N, 3 * D)
    wl, ww = mk(H, H), mk(H, H)
    bl = jnp.zeros((H,), jnp.bfloat16)

    def th(wl_, ww_, q):
        return talking_head_attention_or_none(q, wl_, bl, ww_, bl,
                                              nb_heads=H, scale=scale)

    out = th(wl, ww, qkv)
    if out is None:
        print("talking-head kernel declined! (not on TPU?)")
    else:
        s = timeit_fb(th, (qkv, wl, ww), jnp.ones_like(out))
        attn_flops = 2 * 2 * B * H * N * N * d
        row("talking-head kernel f+b", L, s, 3.5 * attn_flops,
            "Pallas fwd + Pallas bwd custom VJP")

    w = mk(D, D)
    s = timeit_fb(lambda w_, a: jnp.dot(a, w_), (x, w), mk(B * N, D))
    row("attn proj matmul f+b", L, s, 3 * 2 * B * N * D * D)

    from tfimm_tpu.ops.mlp import MLP

    mlp = MLP(D, 4 * D)
    p_mlp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         mlp.init(jax.random.PRNGKey(1)))
    s = timeit_fb(lambda p, a: mlp(p, a), (xb, p_mlp), mk(B, N, D))
    row("MLP f+b", L, s, 3 * 2 * 2 * B * N * D * 4 * D)

    from tfimm_tpu.utils.profile import time_model

    img_s = time_model("cait_s24_224", target="backprop",
                       batch_size=B, nb_batches=5)
    # flops.csv MACs for cait_s24_224; x2 FLOPs, x3 backprop convention.
    return emit_markdown("cait_s24_224 backprop", B, img_s, 3 * 2 * 9.6175e9)


def decompose_swin_bwd():
    """Per-block fwd+bwd table for the Swin-T backprop row (bs64 bf16, the
    zoo's backprop batch). Same pinned-cotangent harness as vit_bwd.

    Granularity note: gradient workloads run the per-block UNFUSED
    composition regardless of dispatch mode (the window-resident stage and
    the fused block both AD-swap to it — swin.py _window_resident_diff /
    swin_block_diff), with the window_mha kernel inside (it has a real
    Pallas backward and serves training). So the block IS the op row; a
    block is timed under a training Context to force exactly that path.
    FLOPs credit: 3x forward for the block's matmuls (qkv/proj/fc1/fc2),
    3.5x for the windowed attention (score recompute + 5 matmuls)."""
    from tfimm_tpu.architectures.swin import PatchMerging, SwinTransformerBlock
    from tfimm_tpu.core import Context
    from tfimm_tpu.models.registry import model_config

    rng = np.random.default_rng(0)
    B = 64
    cfg = model_config("swin_tiny_patch4_window7_224")

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    def bf16(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)

    # Stem: 4x4/4 patchify conv (3->96) as its matmul (dW only — the image
    # is a leaf input) + the embed LN is folded into the first LN rows.
    xp = mk(B * 56 * 56, 4 * 4 * 3)
    wp = mk(4 * 4 * 3, 96)
    s = timeit_fb(lambda w: jnp.dot(xp, w), (wp,), mk(B * 56 * 56, 96))
    row("patch embed f+b (dW only)", 1, s, 2 * 2 * B * 3136 * 48 * 96)

    stages = [  # (grid, C, heads, nb_blocks)
        (56, 96, 3, 2), (28, 192, 6, 2), (14, 384, 12, 6), (7, 768, 24, 2)]
    for grid, c, heads, nb in stages:
        t_img = grid * grid
        for shift, count in [(0, (nb + 1) // 2),
                             (cfg.window_size // 2, nb // 2)]:
            if count == 0:
                continue
            blk = SwinTransformerBlock(cfg, (grid, grid), c, heads,
                                       drop_path_rate=0.0, shift_size=shift)
            p = bf16(blk.init(jax.random.PRNGKey(c + shift)))
            x = mk(B, t_img, c)

            def fn(p, a, _blk=blk):
                with Context(training=True):
                    return _blk(p, a)

            s = timeit_fb(fn, (x, p), mk(B, t_img, c))
            ws = blk.window_size
            mm_flops = 2 * B * t_img * c * c * 12      # qkv+proj+mlp fwd
            at_flops = 4 * B * t_img * (ws * ws) * c   # scores + PV fwd
            label = f"block C={c} {'shifted' if shift else 'unshifted'} f+b"
            row(label, count, s, 3 * mm_flops + 3.5 * at_flops,
                f"grid {grid}x{grid}, win {ws}")

        if grid > 7:  # downsample after stages 1-3
            ds = PatchMerging(cfg, (grid, grid), c)
            pd = bf16(ds.init(jax.random.PRNGKey(2 * c)))
            xd = mk(B, t_img, c)

            def dfn(p, a, _ds=ds):
                with Context(training=True):
                    return _ds(p, a)

            s = timeit_fb(dfn, (xd, pd), mk(B, t_img // 4, 2 * c))
            row(f"downsample {grid}->{grid//2} f+b", 1, s,
                3 * 2 * B * (t_img // 4) * (4 * c) * (2 * c))

    # Final LN + head fc(1000) on pooled features.
    from tfimm_tpu.ops.norm import LayerNorm

    ln = LayerNorm(768, eps=1e-5)
    p_ln = ln.init(jax.random.PRNGKey(9))
    xf = mk(B, 49, 768)
    s = timeit_fb(lambda p, a: ln(p, a), (xf, p_ln), mk(B, 49, 768))
    row("final LayerNorm(768) f+b", 1, s, 0, "HBM-bound")
    wh = mk(768, 1000)
    xh = mk(B, 768)
    s = timeit_fb(lambda w_, a: jnp.dot(a, w_), (xh, wh), mk(B, 1000))
    row("head fc(1000) f+b", 1, s, 3 * 2 * B * 768 * 1000)

    from tfimm_tpu.utils.profile import time_model

    img_s = time_model("swin_tiny_patch4_window7_224", target="backprop",
                       batch_size=B, nb_batches=5, samples=3)
    # flops.csv MACs for swin_tiny (4.712 G); x2 FLOPs, x3 backprop.
    return emit_markdown("swin_tiny_patch4_window7_224 backprop", B, img_s,
                         3 * 2 * 4.712e9)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("vit", "both"):
        print("== ViT-B/16 bs128 bf16 ==")
        decompose_vit()
        ROWS.clear()
    if which in ("convnext", "both"):
        print("\n== ConvNeXt-B bs128 bf16 ==")
        decompose_convnext()
        ROWS.clear()
    if which == "vit_bwd":
        print("== ViT-B/16 backprop bs64 bf16 ==")
        decompose_vit_bwd()
        ROWS.clear()
    if which == "cait_bwd":
        print("== CaiT-S24 backprop bs64 bf16 ==")
        decompose_cait_bwd()
    if which == "swin_bwd":
        print("== Swin-T backprop bs64 bf16 ==")
        decompose_swin_bwd()


if __name__ == "__main__":
    main()
