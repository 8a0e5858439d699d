"""Diagnose the per-iteration floor seen in probe_vit: is the chip slow, or
is there fixed overhead per scan iteration / per readback?

Probes: big square matmuls (pure MXU ceiling), chained MLP-shaped matmuls
with NO mean-folding (data dependency through the activations themselves),
and iteration-count sensitivity.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0


def report(name, secs, flops):
    tf = flops / secs / 1e12
    print(f"{name:46s} {secs*1e3:8.3f} ms  {tf:7.1f} TF/s  "
          f"{100*tf/PEAK_TFLOPS:5.1f}% peak", flush=True)


def timed(run, args, iters):
    np.asarray(jax.block_until_ready(run(args)))
    t0 = time.perf_counter()
    np.asarray(jax.block_until_ready(run(args)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.uniform(-0.1, 0.1, size=shape), jnp.bfloat16)

    # -- square matmuls: chained, no mean ------------------------------------
    for n, iters in [(4096, 20), (8192, 10)]:
        x = mk(n, n)
        w = mk(n, n)

        @jax.jit
        def run(args, iters=iters):
            x, w = args
            def body(c, _):
                return jnp.dot(c, w), ()
            return jax.lax.scan(body, x, None, length=iters)[0].mean()

        secs = timed(run, (x, w), iters)
        report(f"square matmul {n}^3 chained", secs, 2 * n**3)

    # -- MLP-shaped chained matmuls (ViT-B bs128) ------------------------------
    B, N, D, Dh = 128, 197, 768, 3072
    x = mk(B * N, D)
    w1 = mk(D, Dh)
    w2 = mk(Dh, D)
    for iters in (20, 100):
        @jax.jit
        def run(args, iters=iters):
            x, w1, w2 = args
            def body(c, _):
                return jnp.dot(jnp.dot(c, w1), w2), ()
            return jax.lax.scan(body, x, None, length=iters)[0].mean()

        secs = timed(run, (x, w1, w2), iters)
        report(f"mlp chain 2x(25216,{D},{Dh}) iters={iters}", secs,
               2 * 2 * B * N * D * Dh)

    # -- same but f32 to compare ------------------------------------------------
    xf, w1f, w2f = (a.astype(jnp.float32) for a in (x, w1, w2))

    @jax.jit
    def runf(args):
        x, w1, w2 = args
        def body(c, _):
            return jnp.dot(jnp.dot(c, w1), w2), ()
        return jax.lax.scan(body, x, None, length=20)[0].mean()

    secs = timed(runf, (xf, w1f, w2f), 20)
    report("mlp chain f32 iters=20", secs, 2 * 2 * B * N * D * Dh)


if __name__ == "__main__":
    main()
