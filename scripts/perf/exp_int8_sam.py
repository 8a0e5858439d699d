"""int8-quantized SAM image encoder vs the shipping bf16 path.

The SAM encoder is the framework's largest matmul consumer (ViT-B/L/H
trunks at 4096 tokens): qkv/proj/fc1/fc2 Dense layers all clear the
default min_features=256 gate, and the decomposed-rel-pos flash kernel
consumes projection *outputs*, so it composes with quantization unchanged.
Appends to results/int8_e2e.csv using the same slope harness as
sam_encoder_sweep.py (initial carry as jit operand; fn never called
eagerly; both loop lengths warmed).

Usage: python scripts/perf/exp_int8_sam.py [sam_vit_b ...]
"""

import csv
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from sam_encoder_sweep import slope  # noqa: E402  (same directory)

OUT = os.path.join(ROOT, "results", "int8_e2e.csv")


def measure(name):
    import tfimm_tpu.architectures.segment_anything  # noqa: F401
    from tfimm_tpu import create_model, quantize_int8
    from tfimm_tpu.core import Context
    from tfimm_tpu.quant import is_quantized

    model = create_model(name, dtype=jnp.bfloat16)
    enc = model.image_encoder
    p = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        model.params["image_encoder"]))
    pq = quantize_int8(p)
    assert is_quantized(pq), name
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(1, 1024, 1024, 3)), jnp.bfloat16)

    def fwd(args):
        xx, pp = args
        with Context(training=False):
            y = enc(pp, xx)
        return (xx + (y.mean() * 0).astype(xx.dtype), pp)

    # Numeric drift at the encoder output (bs1).
    with Context(training=False):
        ref = np.asarray(jax.jit(enc)(p, x), np.float32)
        out = np.asarray(jax.jit(enc)(pq, x), np.float32)
    drift = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))
    print(f"{name} encoder int8 drift: {drift:.4f}", flush=True)

    s_bf16 = slope(fwd, (x, p))
    print(f"{name} encoder bf16: {s_bf16*1e3:.1f} ms/img "
          f"({1/s_bf16:.2f} img/s)", flush=True)
    s_i8 = slope(fwd, (x, pq))
    print(f"{name} encoder int8: {s_i8*1e3:.1f} ms/img "
          f"({1/s_i8:.2f} img/s)", flush=True)
    return 1 / s_bf16, 1 / s_i8, drift


def main():
    names = sys.argv[1:] or ["sam_vit_b"]
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {r["model"] for r in csv.DictReader(f)}
    write_header = not os.path.exists(OUT)
    for name in names:
        row_name = f"{name}_image_encoder_1024"
        if row_name in done:
            print(f"skip {row_name} (done)", flush=True)
            continue
        bf16, i8, drift = measure(name)
        with open(OUT, "a", newline="") as f:
            w = csv.writer(f)
            if write_header:
                w.writerow(["model", "batch_size", "bf16_img_per_sec",
                            "int8_img_per_sec", "speedup",
                            "max_feature_drift_rel"])
                write_header = False
            w.writerow([row_name, 1, round(bf16, 2), round(i8, 2),
                        round(i8 / bf16, 3), round(drift, 4)])
    print("int8 sam done", flush=True)


if __name__ == "__main__":
    main()
