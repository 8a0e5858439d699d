"""Swin stage-1 time budget: fused kernel vs the XLA glue around it.

Decomposes the fused-block path at bs128, C=96, 56x56 (the dominant stage)
into: (a) full block via SwinTransformerBlock, (b) the pallas kernel alone
on pre-partitioned windows, (c) the roll/partition/reverse glue alone, and
(d) an MXU reference running the block's dense matmuls on flat tokens.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, n1=5, n2=30):
    @jax.jit
    def run(n):
        def body(_, c):
            return fn(c)
        out = jax.lax.fori_loop(0, n, body, fn(None))
        return jax.tree.leaves(out)[0].astype(jnp.float32).mean()

    def t(n):
        t0 = time.perf_counter()
        np.asarray(run(n))
        return time.perf_counter() - t0

    np.asarray(run(2))
    for _ in range(3):
        t1, t2 = t(n1), t(n2)
        if t2 > t1:
            return (t2 - t1) / (n2 - n1)
    raise RuntimeError("non-monotonic timing")


def main():
    from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                              SwinTransformerConfig,
                                              window_partition, window_reverse)
    from tfimm_tpu.core import Context
    from tfimm_tpu.ops.pallas.swin_block import swin_block_or_none

    B, C, HW, HEADS, WS = 128, 96, 56, 3, 7
    shift = 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(B, HW * HW, C)), jnp.bfloat16)

    cfg = SwinTransformerConfig(name="probe", window_size=WS)
    blk = SwinTransformerBlock(cfg, input_size=(HW, HW), embed_dim=C,
                               nb_heads=HEADS, drop_path_rate=0.0,
                               shift_size=shift)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a,
                     blk.init(jax.random.PRNGKey(0)))

    # (a) full block
    def full(args):
        if args is None:
            args = (x,)
        (xx,) = args
        with Context(training=False):
            y = blk(p, xx)
        return (xx + (y.mean() * 0).astype(xx.dtype),)

    ta = slope(full)
    print(f"(a) full fused block:   {ta*1e3:7.3f} ms", flush=True)

    # (b) kernel alone on pre-partitioned windows
    xg = x.reshape(B, HW, HW, C)
    xg = jnp.roll(xg, shift=(-shift, -shift), axis=(1, 2))
    wins = window_partition(xg, WS).reshape(-1, WS * WS, C)
    bias = p["attn"]["relative_position_bias_table"][
        blk.attn.rel_pos_index.reshape(-1)
    ].reshape(WS * WS, WS * WS, HEADS).transpose(2, 0, 1)

    def kern(args):
        if args is None:
            args = (wins,)
        (ww,) = args
        out = swin_block_or_none(p, ww, bias, blk.attn_mask,
                                 nb_heads=HEADS, scale=blk.attn.scale)
        return (ww + (out.mean() * 0).astype(ww.dtype),)

    tb = slope(kern)
    print(f"(b) kernel only:        {tb*1e3:7.3f} ms", flush=True)

    # (c) glue only: roll -> partition -> reverse -> unroll
    def glue(args):
        if args is None:
            args = (x,)
        (xx,) = args
        g = xx.reshape(B, HW, HW, C)
        g = jnp.roll(g, shift=(-shift, -shift), axis=(1, 2))
        w = window_partition(g, WS).reshape(-1, WS * WS, C)
        o = window_reverse(w.reshape(-1, WS, WS, C), WS, HW, HW)
        o = jnp.roll(o, shift=(shift, shift), axis=(1, 2)).reshape(B, HW * HW, C)
        return (xx + (o.mean() * 0).astype(xx.dtype),)

    tc = slope(glue)
    print(f"(c) glue only:          {tc*1e3:7.3f} ms", flush=True)

    # (d) MXU reference: the block's dense matmuls on flat tokens
    flat = x.reshape(B * HW * HW, C)
    wq = p["attn"]["qkv"]["kernel"].astype(jnp.bfloat16)      # (C, 3C)
    wp = p["attn"]["proj"]["kernel"].astype(jnp.bfloat16)     # (C, C)
    w1 = p["mlp"]["fc1"]["kernel"].astype(jnp.bfloat16)
    w2 = p["mlp"]["fc2"]["kernel"].astype(jnp.bfloat16)

    def mxu(args):
        if args is None:
            args = (flat,)
        (ff,) = args
        y = jnp.dot(ff, wq)
        y = jnp.dot(y[:, :C], wp)
        z = jnp.dot(y, w1)
        z = jnp.dot(z, w2)
        return (ff + (z.mean() * 0).astype(ff.dtype),)

    td = slope(mxu)
    print(f"(d) dense matmuls only: {td*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
