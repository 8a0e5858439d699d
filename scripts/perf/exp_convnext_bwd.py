"""Is there a ConvNeXt *training* win in fusing LN+MLP? Measure first.

The round-4 fused LN+MLP kernel (ops/pallas/convnext_mlp.py) is
inference-only: under AD the block runs the XLA composition. Before
building a Pallas backward (flash-style recompute of the GELU activations
from a saved h1, killing the (M, 4C) residual round-trips), this measures
what XLA's AD composition actually leaves on the table at the exact
ConvNeXt-B training shapes (bs64; reference anchor
/root/reference/tfimm/architectures/convnext.py:146):

  lnmlp_fb   : fwd+bwd of LN -> fc1 -> GELU -> fc2 -> layer-scale ->
               +residual (the shipping training composition)
  mlp_fb     : fwd+bwd of fc1 -> GELU -> fc2 alone (no LN/scale/residual)
  matmul_fb  : fwd+bwd of x@W1@W2 alone (pure matmul chain — the MXU
               floor for the 6-matmul f+b composition)

gap(lnmlp_fb - matmul_fb) summed over stages = the recoverable ceiling for
ANY fused treatment; if it is small vs the ~70 ms step there is no kernel
to build (record the negative in TODO.md). Appends results/convnext_bwd.csv.

Usage: python scripts/perf/exp_convnext_bwd.py
"""

import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

from decompose_roofline import timeit_fb  # noqa: E402

OUT = os.path.join(HERE, "..", "..", "results", "convnext_bwd.csv")

BS = 64
# (stage, C, spatial, blocks_in_stage) — ConvNeXt-B @224
STAGES = [
    (1, 128, 56, 3),
    (2, 256, 28, 3),
    (3, 512, 14, 27),
    (4, 1024, 7, 3),
]
EPS = 1e-6


def mk(key, *shape, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def main():
    rows = []
    total = {"lnmlp_fb": 0.0, "mlp_fb": 0.0, "matmul_fb": 0.0}
    for stage, c, s, nblk in STAGES:
        m = BS * s * s
        x = mk(stage, m, c)
        sc = mk(stage + 10, m, c)
        g = mk(stage + 20, m, c)
        w1, b1 = mk(31, c, 4 * c), mk(32, 4 * c)
        w2, b2 = mk(33, 4 * c, c), mk(34, c)
        lns, lnb = jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)
        gamma = jnp.full((c,), 1e-6, jnp.float32)

        def lnmlp(w1, b1, w2, b2, lns, lnb, gamma, sc, x):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            va = ((xf - mu) ** 2).mean(-1, keepdims=True)
            xn = ((xf - mu) * jax.lax.rsqrt(va + EPS)) * lns + lnb
            h = jax.nn.gelu(xn.astype(x.dtype) @ w1 + b1, approximate=True)
            out = (h @ w2 + b2) * gamma.astype(x.dtype)
            return sc + out

        def mlp(w1, b1, w2, b2, x):
            h = jax.nn.gelu(x @ w1 + b1, approximate=True)
            return h @ w2 + b2

        def mm(w1, w2, x):
            return (x @ w1) @ w2

        cells = [
            ("lnmlp_fb", lnmlp, (x, w1, b1, w2, b2, lns, lnb, gamma, sc)),
            ("mlp_fb", mlp, (x, w1, b1, w2, b2)),
            ("matmul_fb", mm, (x, w1, w2)),
        ]
        for name, fn, args in cells:
            t = timeit_fb(fn, args, g)
            rows.append((f"stage{stage}_C{c}", name, t))
            total[name] += t * nblk
            print(f"stage{stage} C={c:5d} {name:10s}: {t*1e3:7.3f} ms/block"
                  f"  (x{nblk})", flush=True)

    new = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["stage", "cell", "ms_per_block", "batch_size"])
        for st, name, t in rows:
            w.writerow([st, name, round(t * 1e3, 4), BS])

    gap_glue = total["lnmlp_fb"] - total["mlp_fb"]
    gap_all = total["lnmlp_fb"] - total["matmul_fb"]
    print(f"\nmodel totals (36 blocks, bs{BS}): lnmlp_fb "
          f"{total['lnmlp_fb']*1e3:.2f} ms, mlp_fb {total['mlp_fb']*1e3:.2f}"
          f" ms, matmul_fb {total['matmul_fb']*1e3:.2f} ms")
    print(f"LN/scale/residual AD overhead : {gap_glue*1e3:.2f} ms")
    print(f"total recoverable vs matmul   : {gap_all*1e3:.2f} ms "
          f"(vs ~70 ms measured step)", flush=True)


if __name__ == "__main__":
    main()
