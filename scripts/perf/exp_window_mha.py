"""Experiment: fused windowed MHA (window_mha.py) vs XLA for Swin-T.

Per-stage block timing (shifted block, the expensive case), a bf16 numerics
check kernel-vs-XLA on identical inputs, and full swin_tiny throughput with
the kernel on/off. bs128 bf16, differential (slope) timing.
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
                                              SwinTransformerConfig)
    from tfimm_tpu.core import Context

    B = 128
    rng = np.random.default_rng(0)
    stages = [(96, 56, 3, 2), (192, 28, 6, 2), (384, 14, 12, 6),
              (768, 7, 24, 2)]
    total = {"xla": 0.0, "ker": 0.0}
    for c, hw, heads, depth in stages:
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw * hw, c)), jnp.bfloat16)
        cfg = SwinTransformerConfig(name="probe", window_size=7)
        # shift only exists when the window doesn't cover the input
        shift = 3 if hw > 7 else 0
        blk = SwinTransformerBlock(cfg, input_size=(hw, hw), embed_dim=c,
                                   nb_heads=heads, drop_path_rate=0.0,
                                   shift_size=shift)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), blk.init(
            jax.random.PRNGKey(0)))

        def run_block(p, x, flag):
            os.environ["TFIMM_TPU_NO_FLASH"] = flag
            with Context(training=False):
                return blk(p, x)

        # numerics: kernel vs XLA on the same bf16 inputs
        y_x = np.asarray(run_block(p, x, "1"), np.float32)
        y_k = np.asarray(run_block(p, x, "0"), np.float32)
        err = np.abs(y_x - y_k).max() / max(np.abs(y_x).max(), 1e-6)

        s_x = timeit(lambda pp, xx: run_block(pp, xx, "1"), (x, p))
        s_k = timeit(lambda pp, xx: run_block(pp, xx, "0"), (x, p))
        total["xla"] += s_x * depth
        total["ker"] += s_k * depth
        print(f"C={c:4d} {hw}x{hw} h={heads:2d} shift={shift}: "
              f"XLA {s_x*1e3:7.3f} ms | kernel {s_k*1e3:7.3f} ms "
              f"({s_x/s_k:4.2f}x) | rel err {err:.2e}", flush=True)

    print(f"\nblocks total: XLA {total['xla']*1e3:.1f} ms, kernel "
          f"{total['ker']*1e3:.1f} ms -> upper bounds "
          f"{B/total['xla']:.0f} vs {B/total['ker']:.0f} img/s", flush=True)

    # full model
    from tfimm_tpu import create_model
    model = create_model("swin_tiny_patch4_window7_224", dtype=jnp.bfloat16)
    img = jnp.asarray(rng.uniform(-1, 1, size=(B, 224, 224, 3)), jnp.bfloat16)
    params = jax.device_put(model.params)

    for flag, name in [("1", "XLA "), ("0", "kernel")]:
        os.environ["TFIMM_TPU_NO_FLASH"] = flag

        def fwd(p, x):
            return model.apply(p, x, training=False)
        s = timeit(fwd, (img, params))
        # 4.71 GMACs/img (results/flops.csv) -> 9.42 GFLOP true
        print(f"swin_tiny {name}: {s*1e3:.2f} ms -> {B/s:.0f} img/s "
              f"({100*B/s*9.42e9/PEAK:.1f}% roofline)", flush=True)


if __name__ == "__main__":
    main()
