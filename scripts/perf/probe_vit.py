"""TPU microbenchmark probe for the ViT-B/16 hot path.

Measures on-device time (lax.scan with data dependency, same methodology as
bench.py) for the constituent pieces of a ViT block at bs128/N197/D768 bf16,
to locate where the roofline gap comes from. Prints one line per probe with
achieved TFLOP/s and fraction of v5e bf16 peak (~197 TFLOP/s).

Usage: python scripts/perf/probe_vit.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def timeit(fn, args, n1=10, n2=60):
    """Differential on-device timing: slope between two iteration counts of
    the SAME compiled fori_loop. Cancels the fixed ~60 ms dispatch/readback
    overhead of the axon tunnel. Only a scalar is fetched back."""

    @jax.jit
    def run(args, n):
        def body(_, carry):
            out = fn(*carry[1:], carry[0])
            c0 = carry[0] + (out.mean() * 0).astype(carry[0].dtype)
            return (c0,) + carry[1:]
        return jax.lax.fori_loop(0, n, body, args)[0].mean()

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(run(args, n)))
        return time.perf_counter() - t0

    np.asarray(jax.block_until_ready(run(args, 3)))  # compile+warmup
    t1, t2 = timed(n1), timed(n2)
    if t2 <= t1:
        t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def report(name, secs, flops):
    tf = flops / secs / 1e12
    print(f"{name:42s} {secs*1e3:8.3f} ms  {tf:7.1f} TF/s  "
          f"{100*tf/PEAK_TFLOPS:5.1f}% peak", flush=True)


def main():
    rng = np.random.default_rng(0)
    B, N, D, H = 128, 197, 768, 12
    d = D // H
    Dh = 3072

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    x = mk(B * N, D)

    # --- pure matmuls -------------------------------------------------------
    for (m, k, n_) in [(B * N, D, 3 * D), (B * N, D, D), (B * N, D, Dh),
                       (B * N, Dh, D)]:
        w = mk(k, n_)
        a = mk(m, k)
        def f(w, a):
            return jnp.dot(a, w)
        secs = timeit(f, (a, w))
        report(f"matmul {m}x{k}x{n_}", secs, 2 * m * k * n_)

    # --- attention math only (current reference implementation) ------------
    from tfimm_tpu.ops.attention import _reference_attention

    q = mk(B, H, N, d); k_ = mk(B, H, N, d); v = mk(B, H, N, d)

    def attn(k_, v, q):
        return _reference_attention(q, k_, v)[0]
    secs = timeit(attn, (q, k_, v))
    report("attention math (B,H,197,64)", secs, 2 * 2 * B * H * N * N * d)

    # --- attention with N padded to 256 -------------------------------------
    N2 = 256
    q2 = mk(B, H, N2, d); k2 = mk(B, H, N2, d); v2 = mk(B, H, N2, d)
    secs = timeit(attn, (q2, k2, v2))
    report("attention math (B,H,256,64)", secs, 2 * 2 * B * H * N2 * N2 * d)

    # --- full MHA incl. qkv/proj and transposes ------------------------------
    from tfimm_tpu.ops.attention import MultiHeadAttention

    mha = MultiHeadAttention(D, H)
    p_mha = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         mha.init(jax.random.PRNGKey(0)))
    xb = mk(B, N, D)

    def mha_f(p, xb):
        return mha(p, xb)
    secs = timeit(mha_f, (xb, p_mha))
    mha_flops = 2 * B * N * D * 3 * D + 2 * 2 * B * H * N * N * d + 2 * B * N * D * D
    report("MHA full (qkv+attn+proj)", secs, mha_flops)

    # --- MLP + LN -------------------------------------------------------------
    from tfimm_tpu.ops.mlp import MLP
    from tfimm_tpu.ops.norm import LayerNorm

    mlp = MLP(D, Dh)
    ln = LayerNorm(D, eps=1e-6)
    p_mlp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         mlp.init(jax.random.PRNGKey(1)))
    p_ln = ln.init(jax.random.PRNGKey(2))

    def mlp_f(p_ln_, p_mlp_, xb):
        return mlp(p_mlp_, ln(p_ln_, xb))
    secs = timeit(mlp_f, (xb, p_ln, p_mlp))
    report("LN+MLP", secs, 2 * 2 * B * N * D * Dh)

    # --- full ViT block --------------------------------------------------------
    from tfimm_tpu.architectures.vit import ViTBlock

    blk = ViTBlock(D, H)
    p_blk = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         blk.init(jax.random.PRNGKey(3)))

    def blk_f(p, xb):
        return blk(p, xb)
    secs = timeit(blk_f, (xb, p_blk))
    blk_flops = mha_flops + 2 * 2 * B * N * D * Dh
    report("ViT block (12x => model)", secs, blk_flops)
    print(f"  -> 12 blocks = {12*secs*1e3:.2f} ms; "
          f"bs{B} => {B/(12*secs):.0f} img/s upper bound (ex patch/head)",
          flush=True)


if __name__ == "__main__":
    main()
