"""EfficientNet-V2-S per-stage TPU probe.

The headline row sits at 0.369 roofline with no published decomposition
(every other weak row has one). Slope-times the whole model, the stem, each
stage (blocks grouped by stage index at their true shapes), and the head, at
bs64 bf16. Per-stage FLOPs come from XLA cost analysis so the table prints a
%-of-peak column like probe_resnet.py.

Usage: python scripts/perf/probe_effv2.py [model_name] [batch]
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


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        (a,) = c.cost_analysis() if isinstance(c.cost_analysis(), list) \
            else (c.cost_analysis(),)
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


def report(name, secs, flops, note=""):
    tf = flops / secs / 1e12 if flops else 0.0
    print(f"{name:44s} {secs*1e3:8.3f} ms {tf:7.1f} TF/s "
          f"({100*tf*1e12/PEAK:4.1f}% peak) {note}", flush=True)
    return secs


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "efficientnet_v2_s"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from tfimm_tpu import create_model
    from tfimm_tpu.core import Context
    from tfimm_tpu.utils.profile import time_model

    model = create_model(name, dtype=jnp.bfloat16)
    params = jax.device_put(model.params)

    ips = time_model(name, target="inference", batch_size=B, nb_batches=5,
                     model=model)
    size = model.cfg.input_size
    print(f"{name} whole model: {ips:.0f} img/s @bs{B} {size}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(B, size[0], size[1], 3)),
                    jnp.bfloat16)

    # --- stem ---------------------------------------------------------------
    def stem(p, x):
        with Context(training=False):
            return model.act(model.bn1(p["bn1"],
                                       model.conv_stem(p["conv_stem"], x)))

    total = report("stem", timeit(stem, (x, params)), flops_of(stem, params, x))
    with Context(training=False):
        cur = stem(params, x)

    # --- stages -------------------------------------------------------------
    stage_blocks = {}
    for key, block in model.blocks.items():
        stage, blk = key.split("/")
        s_idx, b_idx = stage.split("_")[1], blk.split("_")[1]
        stage_blocks.setdefault(s_idx, []).append((b_idx, block))

    for s_idx in sorted(stage_blocks, key=int):
        blocks = stage_blocks[s_idx]

        def stage_fn(p, xs, _blocks=blocks, _s=s_idx):
            with Context(training=False):
                for b_idx, block in _blocks:
                    xs = block(p["blocks"][_s][b_idx], xs)
                return xs

        secs = timeit(stage_fn, (cur, params))
        fl = flops_of(stage_fn, params, cur)
        report(f"stage {s_idx} x{len(blocks)} in={tuple(cur.shape[1:])}",
               secs, fl)
        total += secs
        with Context(training=False):
            cur = stage_fn(params, cur)

    # --- head ---------------------------------------------------------------
    def head(p, xs):
        with Context(training=False):
            h = model.act(model.bn2(p["bn2"], model.conv_head(p["conv_head"],
                                                              xs)))
            h = h.mean(axis=(1, 2))
            return model.classifier(p["classifier"], h)

    total += report("head", timeit(head, (cur, params)),
                    flops_of(head, params, cur))
    print(f"\ncomponent sum {total*1e3:.2f} ms -> {B/total:.0f} img/s bound "
          f"(whole model measured {ips:.0f})", flush=True)


if __name__ == "__main__":
    main()
