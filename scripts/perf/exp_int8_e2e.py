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

# (model, inference_bs, quantize_int8 kwargs) — headline shapes from
# resweep.py. resnet50 is the convs=True probe: its hot kernels are wide
# 3x3s, exactly the measured win region of the int8 conv path
# (results/int8_conv.csv); default (Dense-only) quantization converts
# nothing in a classic ResNet.
MODELS = [
    ("vit_base_patch16_224", 128, {}),
    ("vit_large_patch16_224", 64, {}),
    ("deit_base_patch16_224", 128, {}),
    ("mixer_b16_224", 128, {}),
    ("convnext_base", 128, {}),
    ("cait_s24_224", 128, {}),
    ("swin_base_patch4_window7_224", 64, {}),
    ("resnet50", 256, {"convs": True}),
    # Second conv-path datapoint: 2x-wide 3x3s (128-1024) sit deeper in
    # the measured win region than resnet50's (128-512).
    ("wide_resnet50_2", 128, {"convs": True}),
    # Best-case conv family: nearly all of VGG's FLOPs are wide 3x3s
    # (10 of vgg16's 13 convs clear the threshold; no residual streams,
    # no BN-suppression caveat in the drift).
    ("vgg16", 128, {"convs": True}),
    # SE-composition probe: same 13 3x3s as resnet50 convert while the
    # SE fc1/fc2 sigmoid gates stay float (the orientation rule).
    ("seresnet50", 256, {"convs": True}),
]


_LAYER_SCALE_KEYS = ("gamma", "gamma_1", "gamma_2",
                     "layer_scale_1", "layer_scale_2")


def _unsuppress_layer_scale(tree):
    """Return a copy with error-suppressing scale leaves set to 1.0
    (both trees get the same treatment).

    Random-init layer-scale gammas are 1e-5/1e-6, which multiplies every
    block's contribution — and therefore the quantization error — by ~0:
    ConvNeXt/CaiT drift measured exactly 0.0000 with init gammas. The
    ResNet analog is zero-init of each block's LAST BN scale (the timm
    residual-stability convention): at random init every residual branch
    is multiplied by exactly 0, so a quantized bottleneck 3x3 leaves no
    trace at the features — resnet50's first drift pass also read 0.0.
    Setting those scales to 1.0 makes the drift an UPPER bound (trained
    gammas sit at ~1e-2..1e-1, trained BN scales at O(1)); the caveat is
    documented in docs/quantization.md."""

    def fix(k, v):
        if k in _LAYER_SCALE_KEYS:
            return jnp.ones_like(v)
        if k == "scale" and v.ndim == 1 and not bool(jnp.any(v)):
            return jnp.ones_like(v)  # zero-init last-BN scale
        return v

    def walk(d):
        if not isinstance(d, dict):
            return d
        return {k: (walk(v) if isinstance(v, dict) else fix(k, v))
                for k, v in d.items()}

    return walk(tree)


def feature_drift(model, params_q, batch=8):
    """Max |int8 - bf16| FEATURE diff relative to the bf16 feature spread.

    Measured at forward_features, not the logits: randomly-initialized
    models have zero-init classifier heads (timm convention), so logits
    are identically zero and logit drift degenerates to 0/eps. The head
    is excluded from quantization (DEFAULT_SKIP) and is identical float
    in both trees, so the feature drift IS the full quantization error.
    Layer-scale gammas are set to 1.0 in BOTH trees (see
    _unsuppress_layer_scale) or they'd multiply the error by init 1e-6."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, size=(batch,) + model.cfg.input_size + (3,)), jnp.bfloat16)
    p_ref = _unsuppress_layer_scale(model.params)
    p_q = _unsuppress_layer_scale(params_q)
    ref = np.asarray(model.apply(p_ref, x, training=False,
                                 features_only=True), np.float32)
    out = np.asarray(model.apply(p_q, x, training=False,
                                 features_only=True), np.float32)
    return float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6))


def remeasure_drift(names):
    """Recompute ONLY the drift column for existing CSV rows (in place).

    Exists because the first chip pass measured ConvNeXt/CaiT drift with
    init layer-scale gammas (1e-6) still in effect — exactly the
    suppression _unsuppress_layer_scale was later added to remove — so
    those committed rows read 0.0. Throughput columns are untouched."""
    from tfimm_tpu import create_model, quantize_int8

    with open(OUT) as f:
        reader = csv.DictReader(f)
        fields = reader.fieldnames
        rows = list(reader)
    qkwargs = {m: q for (m, _, q) in MODELS}
    for r in rows:
        if names and r["model"] not in names:
            continue
        model = create_model(r["model"], dtype=jnp.bfloat16)
        drift = feature_drift(
            model, quantize_int8(model.params, **qkwargs.get(r["model"], {})))
        r["max_feature_drift_rel"] = round(drift, 4)
        print("drift", r["model"], r["max_feature_drift_rel"], flush=True)
    with open(OUT, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def main():
    from tfimm_tpu import create_model, quantize_int8
    from tfimm_tpu.quant import is_quantized
    from tfimm_tpu.utils.profile import time_model

    names = sys.argv[1:]
    if names and names[0] == "--drift-only":
        remeasure_drift(names[1:])
        return
    rows = [(m, b, q) for (m, b, q) in MODELS if not names or m in names]

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {r["model"] for r in csv.DictReader(f)}
    write_header = not os.path.exists(OUT)

    for name, bs, qkw in rows:
        if name in done:
            print(f"skip {name} (done)", flush=True)
            continue
        model = create_model(name, dtype=jnp.bfloat16)
        bf16 = time_model(name, target="inference", batch_size=bs,
                          nb_batches=5, model=model, samples=3)
        params_q = quantize_int8(model.params, **qkw)
        assert is_quantized(params_q), name
        drift = feature_drift(model, params_q)
        model.params = params_q
        i8 = time_model(name, target="inference", batch_size=bs,
                        nb_batches=5, model=model, samples=3)
        row = [name, bs, round(bf16, 1), round(i8, 1),
               round(i8 / bf16, 3), round(drift, 4)]
        with open(OUT, "a", newline="") as f:
            w = csv.writer(f)
            if write_header:
                w.writerow(["model", "batch_size", "bf16_img_per_sec",
                            "int8_img_per_sec", "speedup",
                            "max_feature_drift_rel"])
                write_header = False
            w.writerow(row)
        print(row, flush=True)
    print("int8 e2e done", flush=True)


if __name__ == "__main__":
    main()
