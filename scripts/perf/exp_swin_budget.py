"""Swin-T stage-1 microsecond budget (VERDICT r2 item 3).

Stage 1 (C=96, 56x56, window 7->52 padded) measures ~3.9 ms/block fused vs
~0.65 ms of dense-matmul content. This decomposes the gap with slope-timed
pieces at bs128 bf16:

  1. fused swin_block total (shipping path)
  2. window_mha kernel alone (attention incl. softmax + packing)
  3. window_mha with softmax replaced by a flat scale (--with-nosoftmax:
     extra ~8 min compile) -> isolates the per-pair softmax VPU cost
  4. XLA qkv + proj matmuls at stage shapes (the MXU content)
  5. XLA LN + MLP at stage shapes
  6. window partition/reverse transposes + shift rolls (XLA)
  7. dense-equivalent matmul content (the 0.65 ms ceiling row)

Usage: python scripts/perf/exp_swin_budget.py [--with-nosoftmax]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, n1=5, n2=30):
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

    np.asarray(jax.block_until_ready(run(args, 2)))
    for _ in range(3):
        t1, t2 = t(n1), t(n2)
        if t2 > t1:
            return (t2 - t1) / (n2 - n1)
    raise RuntimeError("non-monotonic timing")


def main():
    from tfimm_tpu.architectures.swin import SwinTransformerBlock
    from tfimm_tpu.core import Context

    B, HW, C, WIN, HEADS = 128, 56, 96, 7, 3
    NW = (HW // WIN) ** 2          # 64 windows
    N = WIN * WIN                  # 49 tokens
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    # 1. fused block (shipping path; shift_size=0 block)
    from tfimm_tpu.models.registry import model_config

    cfg = model_config("swin_tiny_patch4_window7_224")
    blk = SwinTransformerBlock(cfg, (HW, HW), C, HEADS,
                               drop_path_rate=0.0, shift_size=0)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a,
                     blk.init(jax.random.PRNGKey(0)))
    x = mk(B, HW * HW, C)

    def fused(p, x):
        with Context(training=False):
            return blk(p, x)
    s_fused = timeit(fused, (x, p))
    print(f"fused swin_block stage-1 total : {s_fused*1e3:7.3f} ms",
          flush=True)

    # 2. window_mha alone
    from tfimm_tpu.ops.pallas.window_mha import window_mha

    qw = mk(B * NW, N, C)
    kw = mk(B * NW, N, C)
    vw = mk(B * NW, N, C)
    bias = mk(HEADS, N, N).astype(jnp.float32)

    def attn_only(k, v, bias, q):
        return window_mha(q, k, v, bias, None, nb_heads=HEADS,
                          scale=(C // HEADS) ** -0.5)
    s_attn = timeit(attn_only, (qw, kw, vw, bias))
    print(f"window_mha alone               : {s_attn*1e3:7.3f} ms",
          flush=True)

    # 3. optional: softmax ablation inside window_mha
    if "--with-nosoftmax" in sys.argv:
        import tfimm_tpu.ops.pallas.window_mha as wm

        orig = jax.nn.softmax
        try:
            jax.nn.softmax = lambda s, axis=-1: s * 0.02
            def attn_nosm(k, v, bias, q):
                return wm.window_mha(q, k, v, bias, None, nb_heads=HEADS,
                                     scale=(C // HEADS) ** -0.5)
            s_nosm = timeit(attn_nosm, (qw, kw, vw, bias))
            print(f"window_mha w/o softmax         : {s_nosm*1e3:7.3f} ms "
                  f"(softmax cost {1e3*(s_attn - s_nosm):.3f} ms)",
                  flush=True)
        finally:
            jax.nn.softmax = orig

    # 4. qkv + proj matmuls
    xt = mk(B * HW * HW, C)
    wqkv = mk(C, 3 * C)
    wp = mk(C, C)

    def mats(wqkv, wp, xt):
        return jnp.dot(jnp.dot(xt, wqkv)[:, :C], wp)
    s_mats = timeit(mats, (xt, wqkv, wp))
    print(f"qkv+proj matmuls (XLA)         : {s_mats*1e3:7.3f} ms",
          flush=True)

    # 5. LN + MLP
    from tfimm_tpu.ops.mlp import MLP
    from tfimm_tpu.ops.norm import LayerNorm

    ln = LayerNorm(C)
    mlp = MLP(C, 4 * C)
    pln = ln.init(jax.random.PRNGKey(1))
    pmlp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                        mlp.init(jax.random.PRNGKey(2)))
    xb = mk(B, HW * HW, C)

    def lnmlp(pln, pmlp, xb):
        return mlp(pmlp, ln(pln, xb))
    s_lnmlp = timeit(lnmlp, (xb, pln, pmlp))
    print(f"LN + MLP (XLA)                 : {s_lnmlp*1e3:7.3f} ms",
          flush=True)

    # 6. partition + reverse transposes (+ shift roll)
    xg = mk(B, HW, HW, C)

    def part_rev(xg):
        r = jnp.roll(xg, (-3, -3), axis=(1, 2))
        w = r.reshape(B, HW // WIN, WIN, HW // WIN, WIN, C)
        w = w.transpose(0, 1, 3, 2, 4, 5).reshape(B * NW, N, C)
        back = w.reshape(B, HW // WIN, HW // WIN, WIN, WIN, C)
        back = back.transpose(0, 1, 3, 2, 4, 5).reshape(B, HW, HW, C)
        return jnp.roll(back, (3, 3), axis=(1, 2))
    s_part = timeit(part_rev, (xg,))
    print(f"partition+reverse+rolls (XLA)  : {s_part*1e3:7.3f} ms",
          flush=True)

    # 7. dense matmul content: same score/value FLOPs as all windows
    #    (64 windows x H x (49x49x32 x2 matmuls) ~= one (3136, 96) x ...)
    a = mk(B * NW * HEADS, N, 32)
    bmat = mk(B * NW * HEADS, 32, N)

    def dense_eq(bm, a):
        return jax.lax.dot_general(
            a, bm, dimension_numbers=(((2,), (1,)), ((0,), (0,))))
    s_dense = timeit(dense_eq, (a, bmat))
    print(f"batched score matmul (XLA ref) : {s_dense*1e3:7.3f} ms",
          flush=True)

    print("\nbudget: fused total = attention + LN/MLP glue;"
          f" attention {s_attn*1e3:.3f}, fused-minus-attn "
          f"{(s_fused - s_attn)*1e3:.3f}, LN+MLP XLA {s_lnmlp*1e3:.3f}, "
          f"matmuls {s_mats*1e3:.3f}, transposes {s_part*1e3:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
