"""Regenerate results/v5e_headline.csv and results/v5e_sweep.csv with
differential (slope) timing — the round-1 numbers carried a fixed ~60 ms
per-call dispatch overhead — and add a roofline_fraction column
(img/s x FLOPs/img / v5e bf16 peak) to the headline CSV.

Runs everything in ONE process so jit compiles amortize. ~30-60 min through
the remote tunnel.
"""

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


PEAK = 197e12

SWEEP = [
    # (model, inference_bs, backprop_bs)
    ("vit_tiny_patch16_224", 256, 128),
    ("vit_base_patch16_224", 128, 64),
    ("deit_base_patch16_224", 128, 64),
    ("swin_tiny_patch4_window7_224", 128, 64),
    ("convnext_tiny", 128, 64),
    ("convnext_base", 128, 64),
    ("resnet18", 256, 128),
    ("resnet50", 256, 128),
    ("efficientnet_b0", 256, 128),
    ("mixer_b16_224", 128, 64),
    ("poolformer_s12", 256, 128),
    ("pvt_v2_b0", 256, 128),
    ("cait_s24_224", 128, 64),
    ("resnetv2_50x1_bitm", 32, 16),
    ("vgg16", 128, 64),
]

HEADLINE = [
    ("vit_base_patch16_224", 128, "inference", 3865.84, 15613.26),
    ("vit_base_patch16_224", 64, "backprop", 92.36, 234.41),
    ("resnet50", 256, "inference", 47080.52, 32968.0),
    ("resnet50", 128, "backprop", 500.54, 869.97),
    ("swin_tiny_patch4_window7_224", 128, "inference", 6286.65, None),
    ("swin_base_patch4_window7_224", 128, "inference", 474.61, 1146.36),
    ("cait_s24_224", 128, "inference", 393.92, 945.15),
    ("cait_s24_224", 64, "backprop", 101.02, 196.05),
    ("convnext_base", 128, "inference", None, None),
    ("efficientnet_v2_s", 64, "inference", None, None),
]


def flops_table():
    out = {}
    path = os.path.join(os.path.dirname(__file__), "..", "..", "results",
                        "flops.csv")
    with open(path) as f:
        for row in csv.DictReader(f):
            out[row["model"]] = float(row["flops"])
    return out


def main():
    from tfimm_tpu.utils.profile import time_model

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    flops = flops_table()
    results_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                               "results")

    rows = []
    for name, bs, target, v100, v100m in (HEADLINE if which in ("both", "headline") else []):
        rate = time_model(name, target=target, batch_size=bs, nb_batches=5)
        # Backward+update costs ~3x the forward FLOPs (standard 1:2 fwd:bwd).
        mult = 3.0 if target == "backprop" else 1.0
        # flops.csv stores MACs (timm convention); true FLOPs = 2x.
        rf = (rate * mult * 2 * flops.get(name, 0) / PEAK
              if name in flops else "")
        rows.append([name, "bfloat16", bs, target, round(rate, 1),
                     v100 or "", v100m or "",
                     round(rf, 3) if rf != "" else ""])
        print(",".join(map(str, rows[-1])), flush=True)
    if which in ("both", "headline"):
        _write_headline(results_dir, rows)

    rows = []
    for name, ibs, bbs in (SWEEP if which in ("both", "sweep") else []):
        inf = time_model(name, target="inference", batch_size=ibs,
                         nb_batches=5)
        bp = time_model(name, target="backprop", batch_size=bbs, nb_batches=3)
        rows.append([name, "bfloat16", ibs, bbs, round(inf, 1), round(bp, 1)])
        print(",".join(map(str, rows[-1])), flush=True)
    if which in ("both", "sweep"):
        with open(os.path.join(results_dir, "v5e_sweep.csv"), "w") as f:
            w = csv.writer(f)
            w.writerow(["model", "dtype", "inference_batch_size",
                        "backprop_batch_size", "inference_img_per_sec",
                        "backprop_img_per_sec"])
            w.writerows(rows)
    print("done", flush=True)


def _write_headline(results_dir, rows):
    with open(os.path.join(results_dir, "v5e_headline.csv"), "w") as f:
        w = csv.writer(f)
        w.writerow(["model", "dtype", "batch_size", "target", "img_per_sec",
                    "v100_fp32_ref", "v100_mixed_ref", "roofline_fraction"])
        # keep the SAM rows (measured separately at 1024^2, no re-run here)
        w.writerows(rows)
        w.writerow(["sam_vit_b_image_encoder_1024", "bfloat16", 1,
                    "inference", 37.9, "", "", ""])
        w.writerow(["sam_vit_b_image_encoder_1024", "bfloat16", 1,
                    "backprop", 13.6, "", "", ""])


if __name__ == "__main__":
    main()
