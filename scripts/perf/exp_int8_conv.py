"""Probe: is there an int8 story for CONV kernels (ResNet/EfficientNet)?

quantize_int8 covers 2-D Dense and 1x1 ConvMLP kernels — matmuls, where
the v5e MXU's 2x int8 rate is directly reachable (results/int8_matmul.csv).
VERDICT r4 item 6 asks for a conv answer: either extend the scheme to KxK
NHWC convs (per-output-channel weights + dynamically quantized
activations, int8 x int8 -> int32 conv) and show a ResNet-50 win, or
document a measured negative.

This measures, per ResNet-50 bottleneck shape at bs256:
  bf16    : the shipping conv
  i8-conv : int8 weights+activations, conv with preferred int32 accum,
            rescale to bf16 (weights quantized OFFLINE; the activation
            absmax/scale/round/cast passes are INCLUDED — that is what a
            dynamic-quant deployment pays)
  i8-static: int8 conv alone (activations pre-quantized, per-tensor scale
            known) — the upper bound if calibration removed the dynamic
            passes

The activation scale is per-tensor (one scalar per batch): per-pixel
scales are NOT sound for convs (a 3x3 window spans pixels with different
scales; rescaling cannot be factored out of the sum).
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

OUT = os.path.join(ROOT, "results", "int8_conv.csv")


def timeit(fn, args, n1=10, n2=60):
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
    return float(np.median(samples))


def conv_bf16(w, b, x):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def conv_i8_dyn(wq, wscale, b, x):
    """Dynamic per-tensor activation quant + int8 conv + rescale."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)))
    ascale = jnp.maximum(a, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * (ascale * wscale)).astype(x.dtype)
    return y + b.astype(y.dtype)


def conv_i8_static(wq, wscale, b, ascale, xq):
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * (ascale * wscale)).astype(jnp.bfloat16)
    return y + b.astype(y.dtype)


def main():
    B = 256
    rng = np.random.default_rng(0)
    # ResNet-50 bottleneck shapes (hw, cin, cout, k).
    shapes = [
        (56, 64, 64, 3), (28, 128, 128, 3), (14, 256, 256, 3),
        (7, 512, 512, 3), (56, 256, 64, 1), (14, 1024, 256, 1),
    ]
    rows = []
    for hw, cin, cout, k in shapes:
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw, hw, cin)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.02,
                        jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        wscale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                             1e-8) / 127.0
        wq = jnp.clip(jnp.round(w / wscale), -127, 127).astype(jnp.int8)
        ascale = jnp.float32(1.0 / 127.0)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                      -127, 127).astype(jnp.int8)

        flops = 2 * B * hw * hw * k * k * cin * cout
        try:
            s_bf = timeit(conv_bf16, (x, w.astype(jnp.bfloat16), b))
            s_dyn = timeit(conv_i8_dyn, (x, wq, wscale, b))
            s_st = timeit(lambda wq_, ws_, b_, a_, xq_:
                          conv_i8_static(wq_, ws_, b_, a_, xq_),
                          (xq, wq, wscale, b, ascale))
            print(f"{k}x{k} {hw:3d}x{hw:<3d} {cin:4d}->{cout:4d}: "
                  f"bf16 {s_bf*1e3:6.3f} ({flops/s_bf/1e12:5.1f} TF/s) | "
                  f"i8dyn {s_dyn*1e3:6.3f} ({s_bf/s_dyn:4.2f}x) | "
                  f"i8static {s_st*1e3:6.3f} ({s_bf/s_st:4.2f}x)",
                  flush=True)
            rows.append([f"{k}x{k}", hw, cin, cout,
                         round(s_bf * 1e3, 3), round(flops / s_bf / 1e12, 1),
                         round(s_dyn * 1e3, 3), round(s_bf / s_dyn, 2),
                         round(s_st * 1e3, 3), round(s_bf / s_st, 2)])
        except Exception as e:
            print(f"{k}x{k} {hw}x{hw} {cin}->{cout}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            rows.append([f"{k}x{k}", hw, cin, cout,
                         "", "", "", "", "", f"FAILED {type(e).__name__}"])
    with open(OUT, "w", newline="") as f:
        w_ = csv.writer(f)
        w_.writerow(["kernel", "hw", "cin", "cout", "bf16_ms", "bf16_tf_s",
                     "i8dyn_ms", "i8dyn_speedup", "i8static_ms",
                     "i8static_speedup"])
        w_.writerows(rows)


if __name__ == "__main__":
    main()
