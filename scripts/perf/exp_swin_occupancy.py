"""Measure (not infer) the window_mha standalone-call residue (VERDICT r4
item 5).

results/README.md's round-4 Swin table shows both kernel bodies sitting
28-49% above XLA's batched score-matmul floor on the ISOLATED stage-1
call and explains the residue as "per-pair pipeline occupancy" — an
inference, not a measurement. This pins it with ablations that keep the
IDENTICAL dispatcher, g-packing, padding, grid and lane-mask structure
(monkeypatched group bodies inside the real window_mha):

  full        : shipping kernel (score + bias/mask + softmax + PV)
  no-softmax  : softmax -> flat scale (keeps both matmuls + dependency)
  scores-only : score matmuls alone (drops softmax AND the dependent PV)
  xla floor   : batched (49, 49, 32) score matmuls (the README floor row)
  wb sweep    : windows-per-program 1/2/4/8 of the full kernel

Reading rules:
  - scores-only >> xla floor  -> the residue is per-program matmul issue
    structure (occupancy), independent of the softmax/PV chain;
  - scores-only ~= floor but full >> no-softmax ~= scores-only + PV ->
    the residue is the dependent softmax/PV chain stalling the MXU;
  - time/window falling with wb -> occupancy amortizes with more
    independent work per program (direct occupancy datum).

Run on TPU: python scripts/perf/exp_swin_occupancy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


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
    samples = []
    for _ in range(3):
        t1, t2 = t(n1), t(n2)
        if t2 > t1:
            samples.append((t2 - t1) / (n2 - n1))
    if not samples:
        raise RuntimeError("non-monotonic timing")
    return float(np.median(samples))


# Ablation bodies — SAME signature/packing as the real stacked body.
def no_softmax(qg, kg, vg, b_ref, mw, off, d, scale):
    n, width = qg.shape
    nheads = width // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    qf = qg.astype(jnp.float32) * scale
    sels = [(lane >= j * d) & (lane < (j + 1) * d) for j in range(nheads)]
    qc = jnp.concatenate([jnp.where(s, qf, 0) for s in sels], axis=0)
    s = jax.lax.dot_general(
        qc, kg.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h0 = off // d
    s = s + b_ref[h0:h0 + nheads].reshape(nheads * n, n)
    p = s * 0.02  # flat scale instead of softmax — keeps the dependency
    o = jax.lax.dot_general(
        p.astype(vg.dtype), vg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = None
    for j, sel in enumerate(sels):
        term = jnp.where(sel, o[j * n:(j + 1) * n], 0)
        acc = term if acc is None else acc + term
    return acc


def scores_only(qg, kg, vg, b_ref, mw, off, d, scale):
    n, width = qg.shape
    nheads = width // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    qf = qg.astype(jnp.float32) * scale
    sels = [(lane >= j * d) & (lane < (j + 1) * d) for j in range(nheads)]
    qc = jnp.concatenate([jnp.where(s, qf, 0) for s in sels], axis=0)
    s = jax.lax.dot_general(
        qc, kg.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h0 = off // d
    s = s + b_ref[h0:h0 + nheads].reshape(nheads * n, n)
    # Keep the output live without a PV matmul: a static slice.
    return s[0:n, 0:width]


def main():
    import tfimm_tpu.ops.pallas.window_mha as wm

    B, HW, C, WIN, HEADS = 128, 56, 96, 7, 3
    NW = (HW // WIN) ** 2
    N = WIN * WIN
    D = C // HEADS
    SCALE = D ** -0.5
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.bfloat16)

    qw, kw, vw = mk(B * NW, N, C), mk(B * NW, N, C), mk(B * NW, N, C)
    bias = mk(HEADS, N, N).astype(jnp.float32)

    def call(k, v, bias, q):
        return wm.window_mha(q, k, v, bias, None, nb_heads=HEADS, scale=SCALE)

    results = {}
    results["full (stacked)"] = timeit(call, (qw, kw, vw, bias))

    real_stacked = wm._group_attention_stacked

    for name, body in [("no-softmax", no_softmax),
                       ("scores-only", scores_only)]:
        wm._group_attention_stacked = body
        try:
            results[name] = timeit(call, (qw, kw, vw, bias))
        finally:
            wm._group_attention_stacked = real_stacked

    # XLA batched score-matmul floor (the README reference row).
    a = mk(B * NW * HEADS, N, D)
    bmat = mk(B * NW * HEADS, D, N)

    def dense_eq(bm, a):
        return jax.lax.dot_general(
            a, bm, dimension_numbers=(((2,), (1,)), ((0,), (0,))))
    results["xla score floor"] = timeit(dense_eq, (a, bmat))

    for name, s in results.items():
        print(f"{name:18s} {s*1e3:7.3f} ms", flush=True)

    # wb sweep of the full kernel: windows-per-program via _MAX_UNROLL.
    print("\nwb sweep (full kernel, stacked):", flush=True)
    orig_unroll = wm._MAX_UNROLL
    try:
        for unroll, wb in [(3, 1), (6, 2), (12, 4), (24, 8)]:
            wm._MAX_UNROLL = unroll
            s = timeit(call, (qw, kw, vw, bias))
            print(f"  wb={wb:2d}: {s*1e3:7.3f} ms "
                  f"({s*1e6/(B*NW):7.3f} us/window)", flush=True)
    finally:
        wm._MAX_UNROLL = orig_unroll


if __name__ == "__main__":
    main()
