"""Probe v5e's int8 MXU path at ViT-B shipping matmul shapes.

v5e's MXU runs int8 at ~2x the bf16 rate (394 vs 197 TOPS). If XLA:TPU
maps `lax.dot_general` on int8 operands with `preferred_element_type=
int32` onto that path, a quantized-inference mode (static int8 weights +
dynamic per-row activation quant) is a real headline lever beyond the
bf16 story — the reference has no quantization at all, so this is
beyond-parity territory (closest anchor: the reference's mixed_float16
policy, /root/reference/tfimm/train/problems/classification.py:45).

Cells, per ViT-B layer shape (bs128, N=197 -> M=25216 rows):
  <name>_bf16      : the shipping bf16 matmul
  <name>_i8        : int8 x int8 -> int32, operands pre-quantized
                     (the steady-state cost if activations stayed int8)
  <name>_i8dyn     : bf16 activation -> per-row absmax quant -> int8
                     matmul -> rescale to bf16 (the realistic composition
                     for dynamic activation quantization; weights static)

Shapes: qkv (768->2304), attn proj (768->768), fc1 (768->3072),
fc2 (3072->768). Appends rows to results/int8_matmul.csv.

Usage: python scripts/perf/exp_int8.py
"""

import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

from exp_fused_mha4 import timeit  # noqa: E402 (adaptive slope timing)

OUT = os.path.join(HERE, "..", "..", "results", "int8_matmul.csv")

M = 128 * 197  # bs128 x 197 tokens
SHAPES = [
    ("qkv", M, 768, 2304),
    ("proj", M, 768, 768),
    ("fc1", M, 768, 3072),
    ("fc2", M, 3072, 768),
]


def mk(key, *shape, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def quant_rows(x):
    """Per-row (token) symmetric absmax quantization to int8."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quant_cols(w):
    """Per-output-channel symmetric absmax quantization to int8."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s, 1e-6) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def main():
    rows = []
    for name, m, k, n in SHAPES:
        x = mk(0, m, k)
        w = mk(1, k, n)
        xq, xs = quant_rows(x)
        wq, ws = quant_cols(w)
        xq, xs, wq, ws = jax.device_put((xq, xs, wq, ws))
        flops = 2.0 * m * k * n

        # timeit carries args[0] through the fori_loop (single-arg
        # closures; weights close over — jit constants, recomputed matmul
        # every iteration because the activation carry changes).
        t = timeit(lambda x: jnp.dot(
            x, w, preferred_element_type=jnp.float32), (x,))
        rows.append((f"{name}_bf16", t, flops / t / 1e12))

        t = timeit(lambda xq: jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), (xq,))
        rows.append((f"{name}_i8", t, flops / t / 1e12))

        def dyn(x):
            q, s = quant_rows(x)
            acc = jax.lax.dot_general(
                q, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s * ws).astype(jnp.bfloat16)

        t = timeit(dyn, (x,))
        rows.append((f"{name}_i8dyn", t, flops / t / 1e12))

        for cell, tt, tf in rows[-3:]:
            print(f"{cell:12s}: {tt*1e3:7.3f} ms  {tf:6.1f} TF/s", flush=True)

    new = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["cell", "ms", "tf_per_s", "m", "note"])
        for cell, t, tf in rows:
            w.writerow([cell, round(t * 1e3, 4), round(tf, 1), M, ""])


if __name__ == "__main__":
    main()
