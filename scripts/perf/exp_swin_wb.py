"""Swin stage-1 fused block: does a larger window-pair batch (wb) pay now
that pair rows are sublane-aligned? Also measures the bf16 shift-mask
(halved streaming traffic) which is active in all variants.

wb is derived from _MAX_UNROLL // nb_heads then clipped to divisors; patch
the module constant to scan it.
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
    import tfimm_tpu.ops.pallas.swin_block as sb
    from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                              SwinTransformerConfig,
                                              window_partition)

    B, C, HW, HEADS, WS, shift = 128, 96, 56, 3, 7, 3
    N0 = WS * WS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(B, HW * HW, C)), jnp.bfloat16)

    cfg = SwinTransformerConfig(name="probe", window_size=WS)
    blk = SwinTransformerBlock(cfg, input_size=(HW, HW), embed_dim=C,
                               nb_heads=HEADS, drop_path_rate=0.0,
                               shift_size=shift)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a,
                     blk.init(jax.random.PRNGKey(0)))
    xg = jnp.roll(x.reshape(B, HW, HW, C), shift=(-shift, -shift),
                  axis=(1, 2))
    wins = window_partition(xg, WS).reshape(-1, N0, C)
    bias = p["attn"]["relative_position_bias_table"][
        blk.attn.rel_pos_index.reshape(-1)
    ].reshape(N0, N0, HEADS).transpose(2, 0, 1)

    for unroll in (32, 64, 128):
        sb._MAX_UNROLL = unroll

        def run1(args):
            if args is None:
                args = (wins,)
            (ww,) = args
            out = sb.swin_block_or_none(p, ww, bias, blk.attn_mask,
                                        nb_heads=HEADS, scale=blk.attn.scale)
            return (ww + (out.mean() * 0).astype(ww.dtype),)

        t = slope(run1)
        print(f"unroll={unroll:4d} (wb={max(1, unroll // HEADS)} pre-clip):"
              f" {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
