#!/usr/bin/env python
"""Single-image CPU inference latency sweep (reference: scripts/profile_cpu.py).

Usage: python scripts/profile_cpu.py --results-file results/cpu.csv
"""

import argparse
import os
import sys

# Allow running the script from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results-file", required=True)
    parser.add_argument("--name-filter", default="")
    parser.add_argument("--module", default="")
    parser.add_argument("--nb-runs", type=int, default=5)
    parser.add_argument("--zoo", action="store_true",
                        help="restrict to the zoo_sweep.py model list "
                             "(the set with published TPU numbers)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tfimm_tpu import create_model, list_models

    done = set()
    if os.path.exists(args.results_file):
        with open(args.results_file) as f:
            done = {row["model"] for row in csv.DictReader(f)}
    write_header = not os.path.exists(args.results_file)
    os.makedirs(os.path.dirname(args.results_file) or ".", exist_ok=True)

    names = list_models(args.name_filter, module=args.module)
    if args.zoo:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "perf"))
        from zoo_sweep import ZOO
        zoo_names = [n for n, _, _ in ZOO]
        names = [n for n in zoo_names if n in set(names)]
    for name in names:
        if name in done:
            continue
        try:
            model = create_model(name)
            x = jnp.asarray(np.random.default_rng(0).uniform(
                size=model.dummy_inputs.shape), jnp.float32)
            forward = jax.jit(lambda p, x: model.apply(p, x, training=False))
            np.asarray(forward(model.params, x))  # compile
            start = time.perf_counter()
            for _ in range(args.nb_runs):
                np.asarray(forward(model.params, x))
            latency = (time.perf_counter() - start) / args.nb_runs
        except Exception as e:
            print(f"{name}: FAILED ({e})")
            continue
        row = {"model": name, "inference_time": round(latency, 4),
               "inference_img_per_sec": round(1.0 / latency, 2)}
        with open(args.results_file, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row))
            if write_header:
                writer.writeheader()
                write_header = False
            writer.writerow(row)
        print(row)


if __name__ == "__main__":
    main()
