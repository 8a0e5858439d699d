"""ResNet-50 per-component TPU probe (VERDICT r2 item 4).

54% inference roofline for a plain convnet suggests a localized sink, not a
hard ceiling. Slope-times at bs256 bf16: the full model, the stem
(7x7/2 conv + BN + relu + 3x3/2 maxpool), each stage's blocks at their
shapes, and candidate stem variants (space-to-depth reformulation of the 7x7
conv — the classic MLPerf trick for the 3-channel input that starves the
MXU's 128-deep contraction).

Usage: python scripts/perf/probe_resnet.py
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
    for _ in range(3):
        t1, t2 = t(n1), t(n2)
        if t2 > t1:
            return (t2 - t1) / (n2 - n1)
    raise RuntimeError("non-monotonic timing")


def report(name, secs, flops, note=""):
    tf = flops / secs / 1e12
    print(f"{name:40s} {secs*1e3:8.3f} ms {tf:7.1f} TF/s "
          f"({100*tf*1e12/PEAK:4.1f}% peak) {note}", flush=True)
    return secs


def main():
    rng = np.random.default_rng(0)
    B = 256

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    # --- whole model ---------------------------------------------------------
    from tfimm_tpu import create_model
    from tfimm_tpu.utils.profile import time_model

    ips = time_model("resnet50", target="inference", batch_size=B,
                     nb_batches=5)
    flops_img = 2 * 4.09e9
    print(f"resnet50 whole model: {ips:.0f} img/s "
          f"(roofline {ips*flops_img/PEAK:.3f})", flush=True)

    # --- stem ---------------------------------------------------------------
    x = mk(B, 224, 224, 3)
    w7 = mk(7, 7, 3, 64)

    def stem_conv(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s = report("stem conv 7x7/2 (3->64)",
               timeit(stem_conv, (x, w7)), 2 * B * 112 * 112 * 64 * 49 * 3)

    # space-to-depth variant: (B,224,224,3)->(B,56,56,48 via 4x4 patches);
    # 7x7/2 conv == 2x2/1 conv on the transformed input with rearranged
    # weights (here random: timing only). Output (B,56,56,256) = s2d of the
    # (B,112,112,64) map — downstream maxpool must be s2d-adapted to use it.
    xs2d = mk(B, 56, 56, 48)
    ws2d = mk(2, 2, 48, 256)

    def stem_s2d(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    report("stem as space-to-depth 2x2 (48->256)",
           timeit(stem_s2d, (xs2d, ws2d)), 2 * B * 112 * 112 * 64 * 49 * 3,
           "same math, MXU-shaped")

    # maxpool 3x3/2
    xp = mk(B, 112, 112, 64)

    def mp(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
    report("maxpool 3x3/2 @112x112x64", timeit(lambda x: mp(x), (xp,)), 0,
           "HBM-bound")

    # --- stage blocks --------------------------------------------------------
    from tfimm_tpu.architectures.resnet import Bottleneck
    from tfimm_tpu.models.registry import model_config
    from tfimm_tpu.core import Context

    cfg = model_config("resnet50")
    # (in_c, mid_c, hw, blocks): stride-1 residual blocks only (the bulk)
    stages = [(256, 64, 56, 3), (512, 128, 28, 4), (1024, 256, 14, 6),
              (2048, 512, 7, 3)]
    total = 0.0
    for cin, cmid, hw, depth in stages:
        blk = Bottleneck(cfg, cin, cmid, stride=1, drop_path_rate=0.0)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                         if a.dtype == jnp.float32 else a,
                         blk.init(jax.random.PRNGKey(0)))
        xb = mk(B, hw, hw, cin)

        def f(p, xb):
            with Context(training=False):
                return blk(p, xb)
        flops = 2 * B * hw * hw * (cin * cmid + cmid * cmid * 9 +
                                   cmid * cin)
        s = timeit(f, (xb, p))
        report(f"bottleneck C={cin}/{cmid} @{hw}", s, flops,
               f"x{depth}")
        total += s * depth
    print(f"\nstage blocks total {total*1e3:.2f} ms -> "
          f"{B/total:.0f} img/s bound (ex stem/head/downsample)", flush=True)


if __name__ == "__main__":
    main()
