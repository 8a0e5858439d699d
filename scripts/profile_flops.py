#!/usr/bin/env python
"""FLOPs + parameter sweep (reference: scripts/profile_flops.py:17-40).

Reports MACs (= FLOPs / 2) in the `flops` column for comparability with the
reference's corrected numbers.

Usage: python scripts/profile_flops.py --results-file results/flops.csv
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
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tfimm_tpu import create_model, list_models
    from tfimm_tpu.utils.flops import get_flops, get_parameters

    done = set()
    if os.path.exists(args.results_file):
        with open(args.results_file) as f:
            done = {row["model"] for row in csv.DictReader(f)}
    write_header = not os.path.exists(args.results_file)
    os.makedirs(os.path.dirname(args.results_file) or ".", exist_ok=True)

    for name in list_models(args.name_filter, module=args.module):
        if name in done:
            continue
        try:
            model = create_model(name)
            row = {
                "model": name,
                "flops": round(get_flops(model) / 2),  # MACs
                "parameters": get_parameters(model),
                "image_size": model.cfg.input_size[0],
            }
        except Exception as e:
            print(f"{name}: FAILED ({e})")
            continue
        with open(args.results_file, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row))
            if write_header:
                writer.writeheader()
                write_header = False
            writer.writerow(row)
        print(row)


if __name__ == "__main__":
    main()
