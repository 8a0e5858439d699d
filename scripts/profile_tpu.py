#!/usr/bin/env python
"""Per-model TPU throughput sweep (reference: scripts/profile_gpu.py:21-105).

For each model: find max batch size and images/sec for inference and backprop;
append to a CSV (resumable across runs).

Usage: python scripts/profile_tpu.py --results-file results/tpu_v5e.csv \
           --name-filter 'vit_*' --dtype bfloat16
"""

import argparse
import os
import sys

# Allow running the script from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results-file", required=True)
    parser.add_argument("--name-filter", default="")
    parser.add_argument("--module", default="")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--start-batch-size", type=int, default=64)
    parser.add_argument("--max-batch-size", type=int, default=None,
                        help="cap the search (result becomes a lower bound); "
                             "recommended through remote-compile tunnels")
    args = parser.parse_args()

    import jax.numpy as jnp

    from tfimm_tpu import list_models
    from tfimm_tpu.models.registry import model_config
    from tfimm_tpu.utils.profile import find_max_batch_size

    dtype = jnp.dtype(args.dtype)
    done = set()
    if os.path.exists(args.results_file):
        with open(args.results_file) as f:
            done = {row["model"] for row in csv.DictReader(f)}

    fieldnames = ["model", "image_size", "inference_batch_size",
                  "backprop_batch_size", "inference_img_per_sec",
                  "backprop_img_per_sec"]
    write_header = not os.path.exists(args.results_file)
    os.makedirs(os.path.dirname(args.results_file) or ".", exist_ok=True)

    for name in list_models(args.name_filter, module=args.module):
        if name in done:
            print(f"{name}: already profiled, skipping")
            continue
        cfg = model_config(name)
        try:
            inf_bs, inf_rate = find_max_batch_size(
                name, "inference", start_batch_size=args.start_batch_size,
                dtype=dtype, max_batch_size=args.max_batch_size)
            bwd_bs, bwd_rate = find_max_batch_size(
                name, "backprop", start_batch_size=args.start_batch_size // 4,
                dtype=dtype,
                max_batch_size=(args.max_batch_size // 4
                                if args.max_batch_size else None))
        except Exception as e:
            print(f"{name}: FAILED ({e})")
            continue
        row = {"model": name, "image_size": cfg.input_size[0],
               "inference_batch_size": inf_bs,
               "backprop_batch_size": bwd_bs,
               "inference_img_per_sec": round(inf_rate, 2),
               "backprop_img_per_sec": round(bwd_rate, 2)}
        with open(args.results_file, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames)
            if write_header:
                writer.writeheader()
                write_header = False
            writer.writerow(row)
        print(row)


if __name__ == "__main__":
    main()
