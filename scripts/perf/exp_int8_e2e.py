"""End-to-end int8 inference vs the shipping bf16 path -> results/int8_e2e.csv.

Per-matmul probes (exp_int8.py, results/int8_matmul.csv) showed the v5e MXU
at ViT-B bs128 shapes runs dynamic-quant int8 at 1.1-2.2x the bf16 matmuls.
This measures whole models: create bf16, slope-time inference, quantize_int8
the params (default min_features=256, classifier head stays float), time
again, and record the numeric drift at the logits.

Note the Swin row is an expected *regression* probe: quantized params make
every fused-window Pallas dispatch decline (they read ``kernel`` directly),
so Swin pays the XLA fallback on top of the quant overhead. Published
either way — the CSV is the evidence for when to recommend the mode.

Usage: python scripts/perf/exp_int8_e2e.py [model ...]
"""

import csv
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, ROOT)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(ROOT, "results", "int8_e2e.csv")

# (model, inference_bs) — headline shapes from resweep.py.
MODELS = [
    ("vit_base_patch16_224", 128),
    ("vit_large_patch16_224", 64),
    ("deit_base_patch16_224", 128),
    ("mixer_b16_224", 128),
    ("convnext_base", 128),
    ("cait_s24_224", 128),
    ("swin_base_patch4_window7_224", 64),
]


def logit_drift(model, params_q, batch=8):
    """Max |int8 - bf16| logit diff relative to the bf16 logit spread."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, size=(batch,) + model.cfg.input_size + (3,)), jnp.bfloat16)
    ref = np.asarray(model.apply(model.params, x, training=False),
                     np.float32)
    out = np.asarray(model.apply(params_q, x, training=False), np.float32)
    return float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))


def main():
    from tfimm_tpu import create_model, quantize_int8
    from tfimm_tpu.quant import is_quantized
    from tfimm_tpu.utils.profile import time_model

    names = sys.argv[1:]
    rows = [(m, b) for (m, b) in MODELS if not names or m in names]

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {r["model"] for r in csv.DictReader(f)}
    write_header = not os.path.exists(OUT)

    for name, bs in rows:
        if name in done:
            print(f"skip {name} (done)", flush=True)
            continue
        model = create_model(name, dtype=jnp.bfloat16)
        bf16 = time_model(name, target="inference", batch_size=bs,
                          nb_batches=5, model=model)
        params_q = quantize_int8(model.params)
        assert is_quantized(params_q), name
        drift = logit_drift(model, params_q)
        model.params = params_q
        i8 = time_model(name, target="inference", batch_size=bs,
                        nb_batches=5, model=model)
        row = [name, bs, round(bf16, 1), round(i8, 1),
               round(i8 / bf16, 3), round(drift, 4)]
        with open(OUT, "a", newline="") as f:
            w = csv.writer(f)
            if write_header:
                w.writerow(["model", "batch_size", "bf16_img_per_sec",
                            "int8_img_per_sec", "speedup",
                            "max_logit_drift_rel"])
                write_header = False
            w.writerow(row)
        print(row, flush=True)
    print("int8 e2e done", flush=True)


if __name__ == "__main__":
    main()
