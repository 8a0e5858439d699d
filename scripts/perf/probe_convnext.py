"""ConvNeXt-B perf probes (bs128 bf16, v5e): differential-timed components
per stage + XLA block vs the opt-in fused Pallas block. Round-1 judged the
fused kernel slower, but that measurement carried the fixed ~60 ms tunnel
dispatch overhead; re-decide with the slope method.
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
    from tfimm_tpu.architectures.convnext import ConvNeXtBlock
    from tfimm_tpu.core import Context

    B = 128
    rng = np.random.default_rng(0)
    # ConvNeXt-B stages: (C, H) pairs at 224 input
    stages = [(128, 56), (256, 28), (512, 14), (1024, 7)]
    depths = [3, 3, 27, 3]

    total_xla = total_fused = 0.0
    for (c, hw), depth in zip(stages, depths):
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw, hw, c)), jnp.bfloat16)
        blk = ConvNeXtBlock(c, 4.0, conv_mlp_block=False, drop_rate=0.0,
                            drop_path_rate=0.0, norm_layer="layer_norm_eps_1e-6",
                            act_layer="gelu", init_scale=1e-6)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         blk.init(jax.random.PRNGKey(0)))
        flops = (2 * B * hw * hw * c * 49          # dwconv
                 + 2 * 2 * B * hw * hw * c * 4 * c)  # mlp

        def xla_block(p, x):
            with Context(training=False):
                os.environ["TFIMM_TPU_FUSED_CONVNEXT"] = "0"
                return blk(p, x)
        s = timeit(xla_block, (x, p))
        print(f"stage C={c:4d} {hw}x{hw}: XLA   {s*1e3:7.3f} ms "
              f"{flops/s/1e12:6.1f} TF/s ({100*flops/s/PEAK:4.1f}%)", flush=True)
        total_xla += s * depth

        def fused_block(p, x):
            with Context(training=False):
                os.environ["TFIMM_TPU_FUSED_CONVNEXT"] = "1"
                return blk(p, x)
        try:
            s2 = timeit(fused_block, (x, p))
            print(f"stage C={c:4d} {hw}x{hw}: FUSED {s2*1e3:7.3f} ms "
                  f"{flops/s2/1e12:6.1f} TF/s ({100*flops/s2/PEAK:4.1f}%)",
                  flush=True)
            total_fused += s2 * depth
        except Exception as e:
            print(f"stage C={c:4d}: FUSED failed {type(e).__name__}: {e}",
                  flush=True)
            total_fused += s * depth

        # components at this shape
        from tfimm_tpu.ops.norm import LayerNorm
        ln = LayerNorm(c, eps=1e-6)
        pl_ = ln.init(jax.random.PRNGKey(1))
        s3 = timeit(lambda pp, xx: ln(pp, xx), (x, pl_))
        from tfimm_tpu.ops.conv import DepthwiseConv2d
        dw = DepthwiseConv2d(c, 7, padding=3)
        pdw = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                           dw.init(jax.random.PRNGKey(2)))
        s4 = timeit(lambda pp, xx: dw(pp, xx), (x, pdw))
        print(f"    LN {s3*1e3:.3f} ms | dwconv7 {s4*1e3:.3f} ms "
              f"({2*B*hw*hw*c*49/s4/1e12:.1f} TF/s)", flush=True)

    print(f"\nblocks total: XLA {total_xla*1e3:.1f} ms, "
          f"fused {total_fused*1e3:.1f} ms "
          f"-> {B/total_xla:.0f} vs {B/total_fused:.0f} img/s upper bound",
          flush=True)


if __name__ == "__main__":
    main()
