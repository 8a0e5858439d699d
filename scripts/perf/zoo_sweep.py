"""Broad fixed-batch throughput sweep across the zoo -> results/v5e_zoo.csv.

The reference publishes ~181-model CSVs (results/profiling/v100.csv); the
15-model representative sweep (resweep.py) covers every family but not every
size. This measures inference + backprop img/s at fixed per-model batch
sizes (2 compiles per model instead of a max-batch search — the search is
unreliable through the remote-compile tunnel anyway) with differential
timing, appending to a resumable CSV.

Run:  python scripts/perf/zoo_sweep.py [--limit N]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# (model, inference_bs, backprop_bs); sizes chosen to fit v5e 16 GB with
# headroom at the model's native input size.
ZOO = [
    ("vit_tiny_patch16_224", 256, 128),
    ("vit_small_patch16_224", 256, 128),
    ("vit_base_patch16_224", 128, 64),
    ("vit_large_patch16_224", 64, 32),
    ("vit_base_patch16_384", 32, 16),
    ("deit_small_patch16_224", 256, 128),
    ("deit_base_distilled_patch16_224", 128, 64),
    ("vit_small_r26_s32_224", 128, 64),
    ("vit_base_r50_s16_384", 16, 8),
    ("cait_xxs24_224", 128, 64),
    ("cait_s24_224", 128, 64),
    ("cait_m36_384", 16, 8),
    ("swin_tiny_patch4_window7_224", 128, 64),
    ("swin_small_patch4_window7_224", 128, 64),
    ("swin_base_patch4_window7_224", 64, 32),
    ("swin_base_patch4_window12_384", 16, 8),
    ("mixer_b16_224", 128, 64),
    ("mixer_l16_224", 64, 32),
    ("resmlp_12_224", 256, 128),
    ("resmlp_36_224", 128, 64),
    ("gmlp_s16_224", 128, 64),
    ("convmixer_768_32", 64, 32),
    ("convmixer_1536_20", 32, 16),
    ("convnext_tiny", 128, 64),
    ("convnext_small", 128, 64),
    ("convnext_base", 128, 64),
    ("convnext_large", 64, 32),
    ("poolformer_s12", 256, 128),
    ("poolformer_m36", 64, 32),
    ("pvt_tiny", 256, 128),
    ("pvt_small", 128, 64),
    ("pvt_v2_b0", 256, 128),
    ("pvt_v2_b2", 128, 64),
    ("pit_ti_224", 256, 128),
    ("pit_s_224", 128, 64),
    ("resnet18", 256, 128),
    ("resnet34", 256, 128),
    ("resnet50", 256, 128),
    ("resnet101", 128, 64),
    ("resnet152", 128, 64),
    ("wide_resnet50_2", 128, 64),
    ("seresnet50", 256, 128),
    ("ecaresnet50d", 256, 128),
    ("resnetv2_50x1_bitm", 32, 16),
    ("resnetv2_101x1_bitm", 16, 8),
    ("vgg11", 128, 64),
    ("vgg16", 128, 64),
    ("vgg19", 128, 64),
    ("efficientnet_b0", 256, 128),
    ("efficientnet_b1", 192, 96),
    ("efficientnet_b2", 128, 64),
    ("efficientnet_b3", 96, 48),
    ("efficientnet_b4", 48, 24),
    ("efficientnet_b0_ap", 256, 128),
    ("efficientnet_lite0", 256, 128),
    ("efficientnet_v2_s", 64, 32),
    ("efficientnet_v2_m", 32, 16),
    # --- round-3 breadth extension (reference v100.csv has ~181 rows) ----
    ("vit_base_patch32_224", 256, 128),
    ("vit_base_patch8_224", 32, 16),
    ("vit_small_patch32_224", 256, 128),
    ("vit_large_patch32_224", 128, 64),
    ("vit_tiny_r_s16_p8_224", 256, 128),
    ("vit_base_patch16_sam_224", 128, 64),
    ("deit_tiny_patch16_224", 256, 128),
    ("deit_small_distilled_patch16_224", 256, 128),
    ("cait_xxs36_224", 128, 64),
    ("cait_s36_384", 16, 8),
    ("swin_large_patch4_window7_224", 32, 16),
    ("mixer_s16_224", 256, 128),
    ("mixer_s32_224", 256, 128),
    ("mixer_b32_224", 128, 64),
    ("gmixer_24_224", 128, 64),
    ("gmlp_ti16_224", 256, 128),
    ("gmlp_b16_224", 64, 32),
    ("resmlp_24_224", 128, 64),
    ("resmlp_big_24_224", 32, 16),
    ("convmixer_1024_20_ks9_p14", 64, 32),
    ("poolformer_s24", 128, 64),
    ("poolformer_s36", 128, 64),
    ("poolformer_m48", 32, 16),
    ("pvt_medium", 128, 64),
    ("pvt_large", 64, 32),
    ("pvt_v2_b1", 256, 128),
    ("pvt_v2_b3", 128, 64),
    ("pvt_v2_b4", 64, 32),
    ("pvt_v2_b5", 64, 32),
    ("pvt_v2_b2_linear", 128, 64),
    ("pit_xs_224", 256, 128),
    ("pit_b_224", 128, 64),
    ("resnet26", 256, 128),
    ("resnet34d", 256, 128),
    ("resnet50d", 256, 128),
    ("resnet101d", 128, 64),
    ("resnet152d", 64, 32),
    ("resnet200d", 64, 32),
    ("resnet50_gn", 256, 128),
    ("resnetblur50", 256, 128),
    ("resnetrs50", 128, 64),
    ("resnetrs101", 64, 32),
    ("resnetrs152", 32, 16),
    ("wide_resnet101_2", 64, 32),
    ("resnext50_32x4d", 256, 128),
    ("resnext101_32x8d", 64, 32),
    ("seresnext50_32x4d", 256, 128),
    ("seresnet152d", 32, 16),
    ("ecaresnet26t", 256, 128),
    ("ecaresnet101d", 128, 64),
    ("ecaresnetlight", 256, 128),
    ("resnetv2_50x3_bitm", 8, 4),
    ("vgg11_bn", 128, 64),
    ("vgg13", 128, 64),
    ("vgg16_bn", 128, 64),
    ("vgg19_bn", 128, 64),
    ("efficientnet_b5", 24, 12),
    ("efficientnet_b6", 16, 8),
    ("efficientnet_b7", 8, 4),
    ("efficientnet_es", 256, 128),
    ("efficientnet_em", 128, 64),
    ("efficientnet_el", 64, 32),
    ("efficientnet_lite1", 192, 96),
    ("efficientnet_lite2", 128, 64),
    ("efficientnet_lite3", 96, 48),
    ("efficientnet_lite4", 48, 24),
    ("efficientnet_v2_b0", 256, 128),
    ("efficientnet_v2_b1", 192, 96),
    ("efficientnet_v2_b2", 128, 64),
    ("efficientnet_v2_b3", 96, 48),
    ("efficientnet_v2_l", 16, 8),
    ("mobilenet_v2_050", 256, 128),
    ("mobilenet_v2_100", 256, 128),
    ("mobilenet_v2_140", 256, 128),
    ("mobilenet_v2_110d", 256, 128),
    ("mobilenet_v2_120d", 192, 96),
    # --- round-4 coverage closure: one representative per remaining trunk
    # group from results/coverage.csv (scripts/make_coverage.py); measuring
    # these collapses every UNEXPLAINED variant to measured/alias/alias-head.
    ("cait_xxs24_384", 32, 16),
    ("cait_xxs36_384", 32, 16),
    ("cait_xs24_384", 32, 16),
    ("cait_s24_384", 16, 8),
    ("cait_m48_448", 8, 4),
    ("convnext_tiny_384_in22ft1k", 32, 16),
    ("convnext_small_384_in22ft1k", 32, 16),
    ("convnext_base_384_in22ft1k", 32, 16),
    ("convnext_large_384_in22ft1k", 16, 8),
    ("convnext_xlarge_in22ft1k", 32, 16),
    ("convnext_xlarge_384_in22ft1k", 8, 4),
    ("deit_tiny_distilled_patch16_224", 256, 128),
    ("deit_base_distilled_patch16_384", 32, 16),
    ("ecaresnet50t", 256, 128),
    ("ecaresnet269d", 16, 8),
    ("efficientnet_b8", 4, 2),
    ("efficientnet_l2_ns_475", 4, 2),
    ("efficientnet_l2_ns", 2, 1),
    ("efficientnet_v2_xl_in21ft1k", 8, 4),
    ("gmixer_12_224", 256, 128),
    ("ig_resnext101_32x16d", 32, 16),
    ("ig_resnext101_32x32d", 16, 8),
    ("ig_resnext101_32x48d", 8, 4),
    ("mixer_l32_224", 128, 64),
    ("pit_ti_distilled_224", 256, 128),
    ("pit_xs_distilled_224", 256, 128),
    ("pit_s_distilled_224", 128, 64),
    ("pit_b_distilled_224", 128, 64),
    ("pt_efficientnet_b0", 256, 128),
    ("pt_efficientnet_b1", 128, 64),
    ("pt_efficientnet_b2", 128, 64),
    ("pt_efficientnet_b3", 96, 48),
    ("pt_efficientnet_b4", 48, 24),
    ("resnet18d", 256, 128),
    ("resnet26d", 256, 128),
    ("resnet26t", 192, 96),
    ("resnetrs200", 32, 16),
    ("resnetrs270", 32, 16),
    ("resnetrs350", 16, 8),
    ("resnetrs420", 8, 4),
    ("resnetv2_101x1_bitm_in21k", 32, 16),
    ("resnetv2_101x3_bitm", 2, 1),
    ("resnetv2_101x3_bitm_in21k", 8, 4),
    ("resnetv2_152x2_bit_teacher", 16, 8),
    ("resnetv2_152x2_bit_teacher_384", 4, 2),
    ("resnetv2_152x2_bitm", 2, 1),
    ("resnetv2_152x4_bitm", 1, 1),
    ("resnetv2_152x4_bitm_in21k", 4, 2),
    ("resnetv2_50x1_bit_distilled", 32, 16),
    ("resnetv2_50x3_bitm_in21k", 8, 4),
    ("resnext50d_32x4d", 256, 128),
    ("seresnext26d_32x4d", 256, 128),
    ("seresnext26t_32x4d", 256, 128),
    ("ssl_resnext101_32x4d", 128, 64),
    ("swin_large_patch4_window12_384", 8, 4),
    ("vgg13_bn", 128, 64),
    ("vit_base_patch16_224_miil", 128, 64),
    ("vit_base_patch32_384", 64, 32),
    ("vit_base_r50_s16_224_in21k", 64, 32),
    ("vit_huge_patch14_224_in21k", 16, 8),
    ("vit_large_patch16_384", 16, 8),
    ("vit_large_patch32_224_in21k", 128, 64),
    ("vit_large_patch32_384", 32, 16),
    ("vit_large_r50_s32_224", 64, 32),
    ("vit_large_r50_s32_384", 16, 8),
    ("vit_small_patch16_384", 64, 32),
    ("vit_small_patch32_384", 128, 64),
    ("vit_small_r26_s32_384", 32, 16),
    ("vit_tiny_patch16_384", 128, 64),
    ("vit_tiny_r_s16_p8_384", 64, 32),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results-file", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "results", "v5e_zoo.csv"))
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()

    from tfimm_tpu import list_models
    from tfimm_tpu.models.registry import model_config
    from tfimm_tpu.utils.profile import time_model

    known = set(list_models())
    done = set()
    if os.path.exists(args.results_file):
        with open(args.results_file) as f:
            done = {row["model"] for row in csv.DictReader(f)}
    write_header = not os.path.exists(args.results_file)

    fields = ["model", "image_size", "dtype", "inference_batch_size",
              "backprop_batch_size", "inference_img_per_sec",
              "backprop_img_per_sec"]
    n_done = 0
    for name, ibs, bbs in ZOO:
        if name in done:
            continue
        if name not in known:
            print(f"{name}: not registered, skipping", flush=True)
            continue
        if args.limit is not None and n_done >= args.limit:
            break
        try:
            inf = time_model(name, target="inference", batch_size=ibs,
                             nb_batches=5)
            bwd = time_model(name, target="backprop", batch_size=bbs,
                             nb_batches=3)
        except Exception as e:  # keep sweeping past tunnel hiccups
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        size = model_config(name).input_size[0]
        row = dict(zip(fields, [name, size, "bfloat16", ibs, bbs,
                                round(inf, 1), round(bwd, 1)]))
        with open(args.results_file, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            if write_header:
                w.writeheader()
                write_header = False
            w.writerow(row)
        print(row, flush=True)
        n_done += 1
    print("zoo sweep done", flush=True)


if __name__ == "__main__":
    main()
