"""Measure the ViT-B attention-kernel floor (VERDICT r3 item 3).

results/README.md's ViT-B decomposition attributes the last ~7% below the
0.90 practical ceiling to "the attention kernel's structure-bound floor"
without the measured-floor rigor the Swin stage-1 budget got (its 1.12 ms
XLA batched-score-matmul floor). This experiment produces that floor, at
the exact shipping shapes (reference workload anchor:
/root/reference/tfimm/architectures/vit.py:122 ViTMultiHeadAttention):

  kernel      : shipping fused_mha (stacked pair bodies, clamped softmax)
  kernel_nosm : same kernel, softmax ablated to ``s * 0.005`` — the
                kernel's own matmul-skeleton floor (any faster attention
                in this structure must beat THIS, softmax is free here)
  xla_full    : XLA dense attention (same clamped no-max softmax), d=64
  xla_mm      : XLA batched score+value matmuls only, no softmax — XLA's
                own floor for the useful-FLOPs structure (the Swin-1.12
                analog)

plus the fwd+bwd (training composition) versions of kernel / xla_full /
xla_mm with the pinned-cotangent harness from decompose_roofline.py.

Derived output: a cited practical-ceiling fraction for ViT-B inference
and backprop = measured model time with the attention cell replaced by
max(kernel_nosm, xla_mm) — i.e. the ceiling assuming softmax became free
AND the matmul skeleton stayed at its measured-best. Appends rows to
results/attn_floor.csv.

Usage: python scripts/perf/exp_attn_floor.py [inference|backprop|all]
"""

import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

from exp_fused_mha4 import timeit  # noqa: E402 (slope timing, adaptive)
from decompose_roofline import timeit_fb  # noqa: E402 (pinned cotangent)

import tfimm_tpu.ops.pallas.fused_mha as fm  # noqa: E402

OUT = os.path.join(HERE, "..", "..", "results", "attn_floor.csv")

B_INF, B_BWD = 128, 64
N, D, H = 197, 768, 12
SCALE = (D // H) ** -0.5

# Measured whole-model anchors (results/v5e_headline.csv, shipping kernels)
MODEL_INF_IMG_S, MODEL_INF_ROOFLINE = 4620.5, 0.836
MODEL_BWD_IMG_S, MODEL_BWD_ROOFLINE = 1290.2, 0.701
LAYERS = 12


def mk(key, *shape, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def xla_attention(qkv, softmax: bool):
    b, n, _ = qkv.shape
    q, k, v = (t.reshape(b, n, H, D // H).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, axis=-1))
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    if softmax:
        e = jnp.exp(jnp.minimum(s, 80.0))  # clamped no-max (kernel-exact)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
    else:
        p = s * 0.005
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(b, n, D).astype(qkv.dtype)


def cells_inference():
    qkv = mk(0, B_INF, N, 3 * D)
    rows = []

    t = timeit(lambda qkv: fm.fused_mha(qkv, H, SCALE), (qkv,))
    rows.append(("kernel", t))
    print(f"kernel       : {t*1e3:7.3f} ms/layer", flush=True)

    orig = fm._softmax_nomax
    try:
        fm._softmax_nomax = lambda s: s * 0.005
        t = timeit(lambda qkv: fm.fused_mha(qkv, H, SCALE), (qkv,))
    finally:
        fm._softmax_nomax = orig
    rows.append(("kernel_nosm", t))
    print(f"kernel_nosm  : {t*1e3:7.3f} ms/layer", flush=True)

    t = timeit(lambda qkv: xla_attention(qkv, True), (qkv,))
    rows.append(("xla_full", t))
    print(f"xla_full     : {t*1e3:7.3f} ms/layer", flush=True)

    t = timeit(lambda qkv: xla_attention(qkv, False), (qkv,))
    rows.append(("xla_mm", t))
    print(f"xla_mm       : {t*1e3:7.3f} ms/layer", flush=True)
    return rows


def cells_backprop():
    qkv = mk(1, B_BWD, N, 3 * D)
    cot = mk(2, B_BWD, N, D)
    rows = []

    t = timeit_fb(lambda qkv: fm.fused_mha_diff(qkv, H, SCALE), (qkv,), cot)
    rows.append(("kernel_fb", t))
    print(f"kernel_fb    : {t*1e3:7.3f} ms/layer", flush=True)

    t = timeit_fb(lambda qkv: xla_attention(qkv, True), (qkv,), cot)
    rows.append(("xla_full_fb", t))
    print(f"xla_full_fb  : {t*1e3:7.3f} ms/layer", flush=True)

    t = timeit_fb(lambda qkv: xla_attention(qkv, False), (qkv,), cot)
    rows.append(("xla_mm_fb", t))
    print(f"xla_mm_fb    : {t*1e3:7.3f} ms/layer", flush=True)
    return rows


def derived(rows, batch, img_s, roofline, kernel_cell, floor_cells, label):
    """Ceiling = model time with attention at its measured floor.

    The floor is the SMALLEST measured attention time: the kernel's own
    softmax-ablated skeleton when available, else the best full
    implementation — round-4 data has the shipping kernel BELOW XLA's
    matmuls-only floor (0.656 vs 0.913 fwd; 0.689 vs 0.719 fwd+bwd), so
    taking a max() of external floors would produce a "ceiling" under the
    measured roofline."""
    d = dict(rows)
    if kernel_cell not in d or not any(c in d for c in floor_cells):
        return
    t_model = batch / img_s
    floor = min(d[c] for c in floor_cells if c in d)
    floor = min(floor, d[kernel_cell])
    t_floor_model = t_model - LAYERS * (d[kernel_cell] - floor)
    ceiling = roofline * t_model / t_floor_model
    print(f"\n{label}: model {t_model*1e3:.2f} ms/batch, kernel "
          f"{d[kernel_cell]*1e3:.3f} ms/layer, floor "
          f"{floor*1e3:.3f} ms/layer (= min of "
          f"{', '.join(c for c in floor_cells if c in d)}, clamped at the "
          f"kernel) -> practical ceiling {ceiling:.3f} "
          f"(measured roofline {roofline})", flush=True)
    return ceiling


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rows = []
    if which in ("all", "inference"):
        rows += cells_inference()
    if which in ("all", "backprop"):
        rows += cells_backprop()

    new = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["cell", "ms_per_layer", "batch_size", "n", "dim",
                        "heads"])
        for cell, t in rows:
            b = B_BWD if cell.endswith("_fb") else B_INF
            w.writerow([cell, round(t * 1e3, 4), b, N, D, H])

    derived(rows, B_INF, MODEL_INF_IMG_S, MODEL_INF_ROOFLINE,
            "kernel", ["kernel_nosm"], "INFERENCE")
    derived(rows, B_BWD, MODEL_BWD_IMG_S, MODEL_BWD_ROOFLINE,
            "kernel_fb", ["xla_mm_fb"], "BACKPROP")


if __name__ == "__main__":
    main()
