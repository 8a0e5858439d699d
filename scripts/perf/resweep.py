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


from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as PEAK  # noqa: E402

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


HEADLINE_HEADER = ["model", "dtype", "batch_size", "target", "img_per_sec",
                   "v100_fp32_ref", "v100_mixed_ref", "roofline_fraction"]
SWEEP_HEADER = ["model", "dtype", "inference_batch_size",
                "backprop_batch_size", "inference_img_per_sec",
                "backprop_img_per_sec"]
# Measured separately at 1024^2 (exp_sam_window.py); seeded if absent.
# Seeded from the dedicated SAM measurements (exp_sam_window.py /
# exp_stacked.py — these shapes need their own slope harness): round-4
# values on the shipping defaults (RELPOS_PAIRED on for inference; the
# backprop row is the XLA-windowed + unpaired-global training path).
SAM_ROWS = [
    ["sam_vit_b_image_encoder_1024", "bfloat16", "1", "inference", "38.7",
     "", "", ""],
    ["sam_vit_b_image_encoder_1024", "bfloat16", "1", "backprop", "17.7",
     "", "", ""],
]


def _load(path, key):
    """Existing CSV rows as {key(row): row} (insertion-ordered)."""
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            rd = csv.reader(f)
            next(rd, None)
            for r in rd:
                out[key(r)] = r
    return out


def _write(path, header, rows_by_key):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows_by_key.values())


def main():
    """Each measurement merges into the CSV immediately: one tunnel flake
    or OOM costs only the failed cell, never the completed ones (a full
    loop here is 30-60 min of remote measurement), and rows not re-measured
    keep their previous values."""
    from tfimm_tpu.utils.profile import time_model

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    flops = flops_table()
    results_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                               "results")
    failures = []

    if which in ("both", "headline"):
        path = os.path.join(results_dir, "v5e_headline.csv")
        key = lambda r: (r[0], r[2], r[3])  # noqa: E731
        rows = _load(path, key)
        for row in SAM_ROWS:
            rows.setdefault(key(row), row)
        for name, bs, target, v100, v100m in HEADLINE:
            try:
                rate = time_model(name, target=target, batch_size=bs,
                                  nb_batches=5)
            except Exception as e:  # noqa: BLE001 — keep sweeping
                failures.append((name, target, str(e)[:200]))
                print(f"FAILED {name} {target}: {str(e)[:200]}", flush=True)
                continue
            # Backward+update costs ~3x the forward FLOPs (1:2 fwd:bwd);
            # flops.csv stores MACs (timm convention); true FLOPs = 2x.
            mult = 3.0 if target == "backprop" else 1.0
            rf = (round(rate * mult * 2 * flops[name] / PEAK, 3)
                  if name in flops else "")
            row = [name, "bfloat16", str(bs), target, str(round(rate, 1)),
                   str(v100 or ""), str(v100m or ""), str(rf)]
            rows[key(row)] = row
            _write(path, HEADLINE_HEADER, rows)
            print(",".join(row), flush=True)

    if which in ("both", "sweep"):
        path = os.path.join(results_dir, "v5e_sweep.csv")
        key = lambda r: r[0]  # noqa: E731
        rows = _load(path, key)
        for name, ibs, bbs in SWEEP:
            try:
                inf = time_model(name, target="inference", batch_size=ibs,
                                 nb_batches=5)
                bp = time_model(name, target="backprop", batch_size=bbs,
                                nb_batches=3)
            except Exception as e:  # noqa: BLE001 — keep sweeping
                failures.append((name, "sweep", str(e)[:200]))
                print(f"FAILED {name}: {str(e)[:200]}", flush=True)
                continue
            row = [name, "bfloat16", str(ibs), str(bbs),
                   str(round(inf, 1)), str(round(bp, 1))]
            rows[name] = row
            _write(path, SWEEP_HEADER, rows)
            print(",".join(row), flush=True)

    if failures:
        print(f"done with {len(failures)} failed cells: "
              + "; ".join(f"{n}/{t}" for n, t, _ in failures), flush=True)
    else:
        print("done", flush=True)


if __name__ == "__main__":
    main()
