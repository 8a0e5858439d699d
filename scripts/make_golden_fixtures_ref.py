#!/usr/bin/env python
"""Generate golden parity fixtures from the REFERENCE's own TF models.

Closes the remaining golden-fixture gap (CaiT, MLP-Mixer/gMLP, PiT, VGG,
ConvMixer, ViT-Hybrid): these families have no HuggingFace equivalent and no
vendored third-party PyTorch copy, but the reference checkout itself is a
complete, independently-authored TensorFlow implementation — and its
`convert_tf_weight_name_to_pt_weight_name` (reference tfimm/utils/timm.py:39)
defines the exact mechanical mapping between its TF variables and timm's
PyTorch state_dict keys (that mapping is how `load_timm_weights` works).

For each family this builds a tiny reference model (random weights, fixed
seed), runs fp32 eval, and inverts that mapping to emit a timm-style
state_dict — so the committed fixture exercises our full
create_model -> convert_pt_state_dict chain against ground truth produced by
code nobody in this repo wrote.

Run ONCE where /root/reference + tensorflow exist; only .npz files are
committed:  TF_USE_LEGACY_KERAS=1 python scripts/make_golden_fixtures_ref.py
"""

import json
import os
import sys

import numpy as np

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, "/root/reference")

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden")


def tf_weights_to_pt_state_dict(model):
    """Invert the reference's TF->PT weight-name/transpose conventions."""
    from tfimm.utils.timm import (
        TransposeType,
        convert_tf_weight_name_to_pt_weight_name,
    )

    sd = {}
    for w in model.trainable_weights + model.non_trainable_weights:
        name, transpose = convert_tf_weight_name_to_pt_weight_name(
            w.name, tf_weight_shape=w.shape)
        arr = w.numpy()
        if transpose is TransposeType.CONV2D:
            if w.name.split("/")[-1].startswith("depthwise_kernel"):
                # TF (kh, kw, C, mult) -> PT (C*mult, 1, kh, kw)
                kh, kw, c, m = arr.shape
                arr = arr.reshape(kh, kw, 1, c * m).transpose(3, 2, 0, 1)
            else:
                # TF (kh, kw, cin, cout) -> PT (cout, cin, kh, kw)
                arr = arr.transpose(3, 2, 0, 1)
        elif transpose is TransposeType.SIMPLE:
            arr = arr.T
        sd[name] = np.ascontiguousarray(arr)
    return sd


def save_fixture(name, model, inp, out, model_name, kwargs):
    os.makedirs(OUT_DIR, exist_ok=True)
    arrays = {f"sd::{k}": v for k, v in tf_weights_to_pt_state_dict(model).items()}
    arrays["input"] = inp
    arrays["output"] = out
    meta = {
        "model_name": model_name,
        "kwargs": kwargs,
        "source": "reference tfimm TensorFlow implementation "
                  f"({type(model).__name__}; TF vars inverted to timm keys "
                  "via reference tfimm/utils/timm.py:39)",
    }
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    kb = os.path.getsize(path) / 1024
    print(f"wrote {path} ({kb:.0f} KiB, output shape {out.shape})")


def fixed_image(seed, n, size):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, size, size, 3)).astype("float32")


def build_and_run(base_name, seed, size, **kwargs):
    import tensorflow as tf

    import tfimm

    tf.keras.utils.set_random_seed(seed)
    model = tfimm.create_model(base_name, **kwargs)
    inp = fixed_image(seed, 2, size)
    out = np.asarray(model(inp, training=False))
    return model, inp, out


# One tiny config per missing family. kwargs use the shared config schema
# (field names identical between the reference and tfimm_tpu by design).
SPECS = [
    ("ref_cait", "cait_xxs24_224", 300, 64, dict(
        input_size=(64, 64), patch_size=16, embed_dim=16, nb_blocks=2,
        nb_heads=2, mlp_ratio=2.0, nb_classes=7)),
    ("ref_mixer", "mixer_b16_224", 301, 64, dict(
        input_size=(64, 64), patch_size=16, embed_dim=32, nb_blocks=2,
        mlp_ratio=(0.5, 2.0), nb_classes=7)),
    ("ref_gmlp", "gmlp_s16_224", 302, 64, dict(
        input_size=(64, 64), patch_size=16, embed_dim=32, nb_blocks=2,
        mlp_ratio=(2.0, 2.0), nb_classes=7)),
    ("ref_pit", "pit_ti_224", 303, 64, dict(
        input_size=(64, 64), embed_dim=(16, 32, 64), nb_blocks=(1, 1, 1),
        nb_heads=(2, 4, 8), mlp_ratio=2.0, nb_classes=7)),
    ("ref_vgg", "vgg11", 304, 64, dict(
        input_size=(64, 64), layers=(8, "M", 16, "M"), nb_features=32,
        mlp_ratio=2.0, nb_classes=7)),
    ("ref_convmixer", "convmixer_768_32", 305, 56, dict(
        input_size=(56, 56), embed_dim=32, depth=2, kernel_size=5,
        nb_classes=7)),
    ("ref_vit_hybrid", "vit_tiny_r_s16_p8_224", 306, 64, dict(
        input_size=(64, 64), embed_dim=32, nb_blocks=2, nb_heads=2,
        mlp_ratio=2.0, nb_classes=7)),
]


def main():
    only = set(sys.argv[1:])
    for fix_name, base, seed, size, kwargs in SPECS:
        if only and fix_name not in only:
            continue
        try:
            model, inp, out = build_and_run(base, seed, size, **kwargs)
            # Fixture kwargs must reproduce the model on the tfimm_tpu side;
            # "layers" tuples may mix ints and "M" strings -> keep JSON-safe.
            save_fixture(fix_name, model, inp, out, base,
                         {k: (list(v) if isinstance(v, tuple) else v)
                          for k, v in kwargs.items()})
        except Exception as e:
            print(f"FAILED {fix_name}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
