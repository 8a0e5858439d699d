"""Swin-T perf probes (bs128 bf16): where does the time go?

Swin-T measured ~3050 img/s = 7% of v5e bf16 roofline — worse relative than
ViT-B pre-kernel. Candidates: windowed attention at N=49 with per-head bias
(tiny matmuls), the partition/reverse reshape-transposes every block, the
cyclic roll, or the MLPs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as PEAK  # noqa: E402


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
    t1, t2 = t(n1), t(n2)
    if t2 <= t1:
        t1, t2 = t(n1), t(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                              SwinTransformerConfig,
                                              window_partition, window_reverse)
    from tfimm_tpu.core import Context

    B = 128
    rng = np.random.default_rng(0)
    # Swin-T stages: (C, H, heads, depth)
    stages = [(96, 56, 3, 2), (192, 28, 6, 2), (384, 14, 12, 6), (768, 7, 24, 2)]
    ws = 7
    total = 0.0
    for c, hw, heads, depth in stages:
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw * hw, c)), jnp.bfloat16)

        cfg = SwinTransformerConfig(name="probe", window_size=ws)
        blk = SwinTransformerBlock(cfg, input_size=(hw, hw), embed_dim=c,
                                   nb_heads=heads, drop_path_rate=0.0,
                                   shift_size=0)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype ==
                         jnp.float32 else a, blk.init(jax.random.PRNGKey(0)))

        def block_fn(p, x):
            with Context(training=False):
                return blk(p, x)
        s = timeit(block_fn, (x, p))
        nw = (hw // ws) ** 2
        flops = (2 * B * hw * hw * c * 3 * c + 2 * B * hw * hw * c * c
                 + 2 * 2 * B * nw * heads * 49 * 49 * (c // heads)
                 + 2 * 2 * B * hw * hw * c * 4 * c)
        print(f"C={c:4d} {hw}x{hw} h={heads}: block {s*1e3:7.3f} ms "
              f"{flops/s/1e12:5.1f} TF/s ({100*flops/s/PEAK:4.1f}%) "
              f"x{depth}", flush=True)
        total += s * depth

        # partition+reverse alone
        xg = x.reshape(B, hw, hw, c)

        def part_fn(xg):
            w = window_partition(xg, ws)
            return window_reverse(w, ws, hw, hw)
        s2 = timeit(lambda xx: part_fn(xx), (xg,))
        print(f"    partition+reverse: {s2*1e3:.3f} ms", flush=True)

    print(f"\nSwin-T blocks total {total*1e3:.1f} ms -> "
          f"{B/total:.0f} img/s upper bound (ex patch embed/merge/head)",
          flush=True)


if __name__ == "__main__":
    main()
