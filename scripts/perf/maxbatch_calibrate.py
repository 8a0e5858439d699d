"""Calibrate the compile-verified max-batch table against the runtime.

results/v5e_maxbatch_compile.csv bounds come from XLA memory analysis on a
deviceless topology, which ignores the ~0.75 GiB runtime HBM reserve — so
each bound is "the compiler accepts this", not "a chip ran it". This script
executes ONE real step per probe batch size (largest first, stepping down
until one runs), classifies failures (RESOURCE_EXHAUSTED = genuine OOM;
INTERNAL/HTTP 500 = the tunnel's masked OOM, recorded as oom-tunnel), and
writes a `runtime_verified` column back into the compile CSV.

Probes run with TFIMM_TPU_NO_FLASH=1 — the same program the compile bounds
describe (the round-2 search used it to bound Pallas compile costs; the
kernels only *lower* activation HBM, so NO_FLASH bounds are conservative
for the shipping path). Each probe runs in its own subprocess with a
timeout so a wedged remote compile cannot hang the queue.

Usage: python scripts/perf/maxbatch_calibrate.py [--probe MODEL:TARGET ...]
"""

import argparse
import csv
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
COMPILE_CSV = os.path.join(ROOT, "results", "v5e_maxbatch_compile.csv")
LOG_CSV = os.path.join(ROOT, "results", "maxbatch_calibration.csv")

# (model, target, descending probe ladder). Heads of the ladders are the
# compiler bounds; a ladder stops at its first runnable batch, which is
# recorded as the demonstrated (runtime_verified) lower bound.
#
# First-pass results (results/maxbatch_calibration.csv): resnet50 verified
# at inference 4864 (86% of the compile bound) and backprop 1232 — the
# FULL compile bound executes, validating the deviceless oracle head-on.
# vit_base's top rungs all fail with the tunnel's masked INTERNAL/500
# (large-literal transfers: bs 6784 inference is a 2.0 GB input buffer),
# so the second pass extends the ladders further down and adds the
# remaining compile-bounded models.
PROBES = [
    # Pass-4 ladders: every row still lacking a runtime_verified cell,
    # extended BELOW the rungs that hit the tunnel's masked INTERNAL/500
    # in passes 1-3 (those rungs are in maxbatch_calibration.csv; the
    # 2^31-score-buffer boundary caps vit/deit-class inference at
    # bs < 4542 regardless of memory). Goal: one demonstrated lower
    # bound per row, not the bound itself — write-up in results/README.
    ("vit_base_patch16_224", "backprop", [640, 512, 384]),
    ("vit_tiny_patch16_224", "inference", [4096, 3072]),
    ("vit_tiny_patch16_224", "backprop", [4376, 3072, 2048]),
    ("deit_base_patch16_224", "inference", [4096, 3072]),
    ("deit_base_patch16_224", "backprop", [1024, 640, 512]),
    ("swin_tiny_patch4_window7_224", "inference", [4096, 3072]),
    ("swin_tiny_patch4_window7_224", "backprop", [512, 384]),
    ("convnext_tiny", "inference", [3072, 2560]),
    ("convnext_tiny", "backprop", [1024, 768]),
    ("convnext_base", "backprop", [640, 512]),
    ("resnet18", "inference", [5120, 4096]),
    ("resnet18", "backprop", [3072, 2048]),
    # Verified in passes 1-3 (not re-probed; merge_runtime_column
    # preserves values): vit_base inference 4096, resnet50 4864/1232,
    # convnext_base inference 2816, efficientnet_b0 inference 4696.
    # Pass-3 ladders for reference: swin_tiny inf [6064, 5248],
    # convnext_tiny [3488]/[1400], convnext_base [2816]/[752],
    # resnet18 [7272, 6272]/[4088], vit_base bwd [896, 768].
]

WORKER = r"""
import sys
sys.path.insert(0, {root!r})
from tfimm_tpu.utils.profile import time_model
rate = time_model({model!r}, target={target!r}, batch_size={bs},
                  nb_batches=1)
print("PROBE_OK", rate)
"""


def run_probe(model, target, bs, timeout=1500):
    env = dict(os.environ)
    env["TFIMM_TPU_NO_FLASH"] = "1"
    code = WORKER.format(root=ROOT, model=model, target=target, bs=bs)
    try:
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return "timeout", ""
    out = p.stdout + p.stderr
    if "PROBE_OK" in p.stdout:
        return "ok", next(line for line in p.stdout.splitlines()
                          if line.startswith("PROBE_OK")).split()[1]
    if "RESOURCE_EXHAUSTED" in out:
        return "oom", ""
    if "INTERNAL" in out or "500" in out:
        return "oom-tunnel", ""  # the tunnel masks OOM as INTERNAL/HTTP 500
    return "fail", out[-300:].replace("\n", " ")


def merge_runtime_column(verified):
    with open(COMPILE_CSV) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        key = (r["model"], r["target"])
        if key in verified:
            r["runtime_verified"] = str(verified[key])
        else:
            r.setdefault("runtime_verified", "")
    fields = list(rows[0].keys())
    if "runtime_verified" not in fields:
        fields.append("runtime_verified")
    with open(COMPILE_CSV, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--probe", action="append", default=None,
                        help="MODEL:TARGET filter, repeatable")
    args = parser.parse_args()
    sel = {tuple(p.split(":")) for p in args.probe} if args.probe else None

    new_log = not os.path.exists(LOG_CSV)
    verified = {}
    with open(LOG_CSV, "a", newline="") as f:
        w = csv.writer(f)
        if new_log:
            w.writerow(["model", "target", "batch_size", "status", "note"])
        for model, target, ladder in PROBES:
            if sel and (model, target) not in sel:
                continue
            for bs in ladder:
                print(f"probe {model} {target} bs={bs} ...", flush=True)
                status, note = run_probe(model, target, bs)
                w.writerow([model, target, bs, status, note])
                f.flush()
                print(f"  {status} {note}", flush=True)
                if status == "ok":
                    verified[(model, target)] = bs
                    break
    if verified:
        merge_runtime_column(verified)
        print("runtime_verified column updated:", verified, flush=True)


if __name__ == "__main__":
    main()
