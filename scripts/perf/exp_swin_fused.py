"""Measure the fused Swin block kernel vs the unfused (window_mha) path.

Per-stage block times at bs128 plus swin_tiny end to end. The fused
kernel's thesis: stage-1/2 blocks are HBM-bound (7.7%/14.8% of peak), so
keeping the whole block VMEM-resident beats XLA's per-op round trips.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as PEAK  # noqa: E402


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


def stage_blocks():
    from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                              SwinTransformerConfig)
    from tfimm_tpu.core import Context

    B = 128
    rng = np.random.default_rng(0)
    stages = [(96, 56, 3), (192, 28, 6), (384, 14, 12), (768, 7, 24)]
    for c, hw, heads in stages:
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw * hw, c)),
                        jnp.bfloat16)
        for shift in (0, 3):
            cfg = SwinTransformerConfig(name="probe", window_size=7)
            blk = SwinTransformerBlock(cfg, input_size=(hw, hw), embed_dim=c,
                                       nb_heads=heads, drop_path_rate=0.0,
                                       shift_size=shift)
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a,
                             blk.init(jax.random.PRNGKey(0)))

            def fwd(args, blk=blk, p=p, x=x):
                if args is None:
                    args = (x,)
                (xx,) = args
                with Context(training=False):
                    y = blk(p, xx)
                return (xx + (y.mean() * 0).astype(xx.dtype),)

            results = {}
            for mode, env in [("fused", {}),
                              ("window_mha",
                               {"TFIMM_TPU_NO_FUSED_BLOCK": "1"})]:
                for k, v in env.items():
                    os.environ[k] = v
                results[mode] = slope(fwd)
                for k in env:
                    os.environ.pop(k)
            f, u = results["fused"], results["window_mha"]
            print(f"C={c:4d} {hw}x{hw} shift={shift}: fused {f*1e3:7.3f} ms"
                  f" | window_mha {u*1e3:7.3f} ms ({u/f:.2f}x)", flush=True)
            if shift == 0 and hw == 7:
                break  # 7x7 stage has no shifted variant


def end_to_end():
    from tfimm_tpu import create_model

    model = create_model("swin_tiny_patch4_window7_224", dtype=jnp.bfloat16)
    params = jax.device_put(model.params)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(128, 224, 224, 3)), jnp.bfloat16)

    def fwd(args):
        if args is None:
            args = (x,)
        (xx,) = args
        y = model.apply(params, xx, training=False)
        return (xx + (y.mean() * 0).astype(xx.dtype),)

    for mode, env in [("fused", {}),
                      ("window_mha", {"TFIMM_TPU_NO_FUSED_BLOCK": "1"})]:
        for k, v in env.items():
            os.environ[k] = v
        s = slope(fwd)
        for k in env:
            os.environ.pop(k)
        print(f"swin_tiny e2e {mode:10s}: {s*1e3:7.3f} ms -> "
              f"{128/s:.0f} img/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["stages", "e2e"]
    if "stages" in which:
        stage_blocks()
    if "e2e" in which:
        end_to_end()
