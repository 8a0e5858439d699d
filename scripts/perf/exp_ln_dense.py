"""A/B: fused LN+Dense Pallas kernel (ops/pallas/ln_dense.py) vs XLA's
LN -> Dense composition, fwd-only and fwd+bwd, at ViT-B training shapes.

The named lever (VERDICT r4 item 4, results/README.md vit_bwd table): the
24 standalone LayerNorm f+b rows cost 1.98 ms of the 49.6 ms ViT-B bs64
step. Both ViT norms feed a Dense (LN1 -> qkv 768->2304, LN2 -> fc1
768->3072), so a fused kernel that normalizes in VMEM and feeds the MXU
deletes the LN's HBM round trips in BOTH directions — IF its matmul
throughput matches XLA's (the qkv/fc1 f+b compositions run at 91-93% of
peak; a 5% matmul regression eats the entire LN saving).

Timing: the pinned-cotangent fwd+bwd harness from decompose_roofline.py
(cotangent carried through the iteration chain, primal kept alive).

Usage (TPU): python scripts/perf/exp_ln_dense.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

from decompose_roofline import timeit, timeit_fb  # noqa: E402

from tfimm_tpu.ops.pallas.ln_dense import (  # noqa: E402
    _reference_ln_dense,
    ln_dense_diff,
)

EPS = 1e-6


def main():
    B, N, C = 64, 197, 768
    M = B * N
    rng = np.random.default_rng(0)

    def mk(*shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape) * 0.05, dt)

    for O, tag in [(2304, "qkv"), (3072, "fc1")]:
        x = mk(M, C)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        w = mk(C, O)
        b = jnp.zeros((O,), jnp.float32)
        cot = mk(M, O)

        def xla_fn(gamma, beta, w, b, x):
            return _reference_ln_dense(x, gamma, beta, w, b, EPS)

        def ker_fn(gamma, beta, w, b, x):
            return ln_dense_diff(x, gamma, beta, w, b, EPS, False)

        args = (x, gamma, beta, w, b)
        s_xla_f = timeit(xla_fn, args)
        s_ker_f = timeit(ker_fn, args)
        s_xla_fb = timeit_fb(xla_fn, args, cot)
        s_ker_fb = timeit_fb(ker_fn, args, cot)
        flops = 2 * M * C * O
        print(f"{tag} (768->{O}):", flush=True)
        print(f"  fwd : XLA {s_xla_f*1e3:6.3f} ms ({flops/s_xla_f/1e12:5.1f}"
              f" TF/s) | kernel {s_ker_f*1e3:6.3f} ms "
              f"({flops/s_ker_f/1e12:5.1f} TF/s) | {s_xla_f/s_ker_f:4.2f}x",
              flush=True)
        print(f"  f+b : XLA {s_xla_fb*1e3:6.3f} ms | kernel "
              f"{s_ker_fb*1e3:6.3f} ms | {s_xla_fb/s_ker_fb:4.2f}x",
              flush=True)
        print(f"  per-model bound (12 layers): "
              f"{12*(s_xla_fb - s_ker_fb)*1e3:+.2f} ms of the 49.6 ms step",
              flush=True)


if __name__ == "__main__":
    main()
