"""Measure the SAM ViT-L / ViT-H image encoders (bs1, 1024px, bf16) the same
way the headline sam_vit_b row was measured (exp_sam_window.py): slope-timed
fwd and grad-of-params. Appends rows to results/v5e_zoo.csv so
scripts/make_coverage.py can mark sam_vit_l / sam_vit_h measured.

Usage: python scripts/perf/sam_encoder_sweep.py [sam_vit_l sam_vit_h]
"""

import csv
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(ROOT, "results", "v5e_zoo.csv")


def slope(fn, args, n1=3, n2=10):
    # ``args`` (the full param tree) must be an explicit operand: a
    # closure-captured initial carry embeds every leaf as an HLO constant
    # and SAM-L's 608 MB proto blows the remote-compile tunnel's request
    # limit (HTTP 413). As an operand the proto is <1 MB.
    def run(n, a):
        def body(_, c):
            return fn(c)
        return jax.lax.fori_loop(0, n, body, a)

    run_j = jax.jit(run, static_argnums=0)
    # Warm BOTH loop lengths: each static n is its own executable, and a
    # first call pays a multi-minute remote compile — timing it poisons
    # the slope (observed: sam_vit_l "6390 ms/img").
    for n in (n1, n2):
        np.asarray(run_j(n, args)[0].mean())

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(run_j(n, args)[0].mean())
        return time.perf_counter() - t0

    t1, t2 = timed(n1), timed(n2)
    if t2 <= t1:
        t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def measure(name):
    import tfimm_tpu.architectures.segment_anything  # noqa: F401
    from tfimm_tpu import create_model
    from tfimm_tpu.core import Context

    model = create_model(name, dtype=jnp.bfloat16)
    enc = model.image_encoder
    p = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        model.params["image_encoder"]))
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(1, 1024, 1024, 3)), jnp.bfloat16)

    # Params ride in the fori_loop carry (returned unchanged) rather than
    # being closed over: closure-captured arrays embed as HLO constants,
    # and SAM-L's 608 MB proto blows the remote-compile tunnel's request
    # limit (HTTP 413). Explicit operands keep the proto at ~0.6 MB.
    # ``fn`` is only ever called inside jit: an eager call materializes
    # every intermediate at once and OOMs the chip on SAM-H's backward.
    def fwd(args):
        xx, pp = args
        with Context(training=False):
            y = enc(pp, xx)
        return (xx + (y.mean() * 0).astype(xx.dtype), pp)

    s_fwd = slope(fwd, (x, p))
    print(f"{name} encoder fwd: {s_fwd*1e3:.1f} ms/img "
          f"({1/s_fwd:.2f} img/s)", flush=True)

    def loss(pp, xx):
        with Context(training=True):
            return enc(pp, xx).astype(jnp.float32).mean()

    grad = jax.grad(loss)

    def bwd(args):
        xx, pp = args
        g = grad(pp, xx)
        leaf = jax.tree.leaves(g)[0]
        return (xx + (leaf.mean() * 0).astype(xx.dtype), pp)

    s_bwd = slope(bwd, (x, p), n1=2, n2=6)
    print(f"{name} encoder bwd: {s_bwd*1e3:.1f} ms/img "
          f"({1/s_bwd:.2f} img/s)", flush=True)
    return 1 / s_fwd, 1 / s_bwd


def main():
    names = sys.argv[1:] or ["sam_vit_l", "sam_vit_h"]
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {r["model"] for r in csv.DictReader(f)}
    for name in names:
        if name in done:
            print(f"skip {name} (done)")
            continue
        inf, bwd = measure(name)
        with open(OUT, "a", newline="") as f:
            csv.writer(f).writerow(
                [name, 1024, "bfloat16", 1, 1, round(inf, 2), round(bwd, 2)])


if __name__ == "__main__":
    main()
