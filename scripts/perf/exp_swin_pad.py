"""Does sublane alignment explain the fused Swin block's 9x gap?

probe_swin2.py showed the stage-1 kernel alone costs 5.97 ms while its
dense matmuls cost 0.65 ms at XLA speed. Hypothesis: window pairs are 98
rows (not a multiple of 8), so every per-pair Q/K/V slice and the final
concatenate force Mosaic sublane relayouts. Test: pad windows 49 -> 52
(pairs 104, sublane-aligned, 1.13x score FLOPs) and 49 -> 64 (pairs 128,
fully tile-aligned, 1.7x score FLOPs) in the glue; -1e9 on padded key
columns via the bias.
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


def run_stage(B, C, HW, HEADS, shift, npads=(52, 64)):
    from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                              SwinTransformerConfig,
                                              window_partition)
    from tfimm_tpu.ops.pallas.swin_block import (swin_block_fused,
                                                 swin_block_or_none)

    WS = 7
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

    xg = x.reshape(B, HW, HW, C)
    if shift:
        xg = jnp.roll(xg, shift=(-shift, -shift), axis=(1, 2))
    wins = window_partition(xg, WS).reshape(-1, N0, C)
    bias = p["attn"]["relative_position_bias_table"][
        blk.attn.rel_pos_index.reshape(-1)
    ].reshape(N0, N0, HEADS).transpose(2, 0, 1)
    mask = blk.attn_mask

    def baseline(args):
        if args is None:
            args = (wins,)
        (ww,) = args
        out = swin_block_fused(ww, _params(p), bias, mask,
                               nb_heads=HEADS, scale=blk.attn.scale)
        return (ww + (out.mean() * 0).astype(ww.dtype),)

    t0 = slope(baseline)
    print(f"C={C} {HW}x{HW} shift={shift}  n=49 : {t0*1e3:7.3f} ms",
          flush=True)

    for npad in npads:
        winp = jnp.pad(wins, ((0, 0), (0, npad - N0), (0, 0)))
        biasp = jnp.pad(bias, ((0, 0), (0, npad - N0), (0, npad - N0)))
        # -1e9 on padded KEY columns so softmax ignores them (pad rows are
        # garbage queries, dropped on unpad).
        neg = jnp.full((HEADS, npad, npad - N0), -1e9, biasp.dtype)
        biasp = biasp.at[:, :, N0:].set(neg)
        maskp = (jnp.pad(mask, ((0, 0), (0, npad - N0), (0, npad - N0)))
                 if mask is not None else None)

        def padded(args, winp=winp, biasp=biasp, maskp=maskp, npad=npad):
            if args is None:
                args = (winp,)
            (ww,) = args
            out = swin_block_fused(ww, _params(p), biasp, maskp,
                                   nb_heads=HEADS, scale=blk.attn.scale)
            out = out[:, :N0, :]
            return (ww + (out.mean() * 0).astype(ww.dtype),)

        t1 = slope(padded)
        print(f"C={C} {HW}x{HW} shift={shift}  n={npad} : {t1*1e3:7.3f} ms "
              f"({t0/t1:.2f}x)", flush=True)


def _params(p):
    """Mirror swin_block_or_none's param flattening."""
    dt = jnp.bfloat16
    c = p["attn"]["proj"]["kernel"].shape[0]
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


if __name__ == "__main__":
    B = 128
    run_stage(B, 96, 56, 3, shift=3)
    run_stage(B, 96, 56, 3, shift=0, npads=(64,))
    run_stage(B, 192, 28, 6, shift=3, npads=(64,))
